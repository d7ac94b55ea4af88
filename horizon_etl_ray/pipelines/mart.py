"""Incremental mart maintenance over a CDC lake — the downstream consumer
the change feed exists for.

The reference regenerates every analytics mart from the whole database on
each (weekly) run — ``InitiativeAnalyticsMartGenerator.generate`` driven by
/root/reference/src/flows/exports/initiatives_analytics_mart.py:11-37 and
knowledge_areas_mart.py — a full scan per refresh. At lake scale a full scan
per refresh is the thing a CDC engine exists to avoid, so this module keeps
an additive aggregate mart (group-by counts + sums) up to date from
``cdc.read_changes`` instead: a refresh reads ONLY the net per-key changes
of the epoch window (the feed already prunes to the partitions those epochs
touched) and folds signed per-group deltas into the stored mart — O(changes),
not O(lake).

Semantics: the maintained mart is always byte-identical (up to row order) to
re-aggregating the full lake state at the refreshed epoch — inserts add the
row's contribution, deletes subtract the before-payload's, updates subtract
the before- and add the after-contribution (which also moves rows between
groups when the update changes the group column). That equivalence is the
test AND the driver oracle (``engine_queries.cdc_incremental_mart_lineitem``).

Scale shape: the aggregate is additive by construction, so the refresh is a
map-only pass over the feed (per-block signed partials) plus a driver fold
bounded by |groups| — sized for dimension-bounded marts (flags, languages,
calendar buckets; the reference's marts group by knowledge area / initiative
type). ``MAX_GROUPS`` guards the driver fold; marts keyed by an unbounded
column belong in a lake of their own, not a driver-folded table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import (
    ManifestStore,
    atomic_write_json,
    atomic_write_table,
)

MAX_GROUPS = 1_000_000

_STATE_FILE = "mart.json"


@dataclass(frozen=True)
class MartSpec:
    """An additive group-by mart: ``group_by`` dimension columns, a row
    count (``rows_metric``) and any number of named column sums
    (``sum_metrics``: metric name → numeric lake column). Only additive
    metrics are maintainable from a change feed — min/max over deletes
    need the lake (use ``build_mart`` / the widen merge policy there)."""

    group_by: tuple[str, ...]
    sum_metrics: dict[str, str] = field(default_factory=dict)
    rows_metric: str = "n_rows"

    def metric_names(self) -> list[str]:
        return [self.rows_metric, *self.sum_metrics]

    def to_json(self) -> dict:
        return {"group_by": list(self.group_by),
                "sum_metrics": dict(self.sum_metrics),
                "rows_metric": self.rows_metric}

    @staticmethod
    def from_json(d: dict) -> "MartSpec":
        return MartSpec(group_by=tuple(d["group_by"]),
                        sum_metrics=dict(d["sum_metrics"]),
                        rows_metric=d["rows_metric"])


def _fold(parts: pd.DataFrame, spec: MartSpec) -> pd.DataFrame:
    """Driver fold of per-block partials. dropna=False: null group values
    are real groups (SQL GROUP BY keeps them; the oracle sees them)."""
    g = parts.groupby(list(spec.group_by), sort=False, dropna=False)
    out = g[spec.metric_names()].sum().reset_index()
    if len(out) > MAX_GROUPS:
        raise ValueError(
            f"mart has {len(out)} groups > MAX_GROUPS={MAX_GROUPS}: "
            "driver-folded marts are for dimension-bounded group domains")
    out[spec.rows_metric] = out[spec.rows_metric].astype(np.int64)
    return out


def _aggregate(ds, spec: MartSpec) -> pd.DataFrame:
    """Full aggregate of a lake Dataset: per-block signed=+1 partials,
    driver fold (blocks × |groups| rows cross the cluster, never the data)."""
    cols = list(dict.fromkeys(
        list(spec.group_by) + list(spec.sum_metrics.values())))
    ds = ds.select_columns(cols)  # drop payload before the partial pass

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        for m, src in spec.sum_metrics.items():
            df[m] = df[src]
        df[spec.rows_metric] = np.int64(1)
        g = df.groupby(list(spec.group_by), sort=False, dropna=False)
        return g[spec.metric_names()].sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return _fold(parts, spec)


def signed_delta_partial(df: pd.DataFrame, spec: MartSpec) -> pd.DataFrame:
    """Per-block kernel of the refresh: a change-feed frame → signed
    per-group deltas. The after-side of inserts/updates contributes
    +1/+value, the before-side of deletes/updates −1/−value — group-moving
    updates fall out for free (−old group, +new group). The algebra —
    aggregate(before) ⊕ deltas(diff) == aggregate(after) for ANY pair of
    states — is hypothesis-pinned in tests/test_properties.py."""
    def side_frame(side: str, sign: int) -> pd.DataFrame:
        sub = df.loc[df["op"] != ("delete" if side == "after_" else "insert")]
        out = {}
        for gcol in spec.group_by:
            src = f"{side}{gcol}"
            out[gcol] = sub[src if src in sub.columns else gcol]
        for m, src in spec.sum_metrics.items():
            scol = f"{side}{src}"
            vals = sub[scol if scol in sub.columns else src]
            out[m] = pd.to_numeric(vals).fillna(0) * sign
        out[spec.rows_metric] = np.int64(sign)
        return pd.DataFrame(out)

    both = pd.concat([side_frame("after_", 1), side_frame("before_", -1)],
                     ignore_index=True)
    g = both.groupby(list(spec.group_by), sort=False, dropna=False)
    return g[spec.metric_names()].sum().reset_index()


def _feed_deltas(feed, spec: MartSpec) -> pd.DataFrame:
    """Signed per-group deltas from a change-feed Dataset: vectorized per
    block (``signed_delta_partial``); driver fold is |groups|-bounded like
    the full build. The feed is PRUNED to op + the group/metric columns
    first — payload columns the mart never reads (including ragged vector
    columns, which Ray's pandas conversion rejects outright) must not ride
    the refresh."""
    names = feed.schema().names
    need = {"op"}
    for c in [*spec.group_by, *spec.sum_metrics.values()]:
        need.update(v for v in (c, f"before_{c}", f"after_{c}")
                    if v in names)
    feed = feed.select_columns([c for c in names if c in need])
    parts = feed.map_batches(lambda df: signed_delta_partial(df, spec),
                             batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=[*spec.group_by, *spec.metric_names()])
    return _fold(parts, spec)


def _write_state(mart_dir: str, spec: MartSpec, epoch: int,
                 table: pd.DataFrame, dtypes: dict[str, str]) -> None:
    """Commit = write an epoch-named data file, THEN swap the json pointer
    (the manifest's atomic-pointer discipline): a crash between the two
    leaves the pointer on the previous consistent (table, epoch) pair —
    never a new table with an old epoch, which a later refresh would
    double-apply. Superseded data files are swept after the commit."""
    os.makedirs(mart_dir, exist_ok=True)
    for m, dt in dtypes.items():
        table[m] = table[m].astype(dt)
    t = pa.Table.from_pandas(
        table.sort_values(list(spec.group_by)).reset_index(drop=True),
        preserve_index=False)
    data_file = f"mart_e{epoch}.parquet"
    atomic_write_table(os.path.join(mart_dir, data_file), t)
    atomic_write_json(os.path.join(mart_dir, _STATE_FILE),
                      {"epoch": epoch, "data_file": data_file,
                       "spec": spec.to_json(), "dtypes": dtypes,
                       "groups": len(table)})
    for f in os.listdir(mart_dir):  # sweep superseded/orphaned data files
        if f.startswith("mart_e") and f.endswith(".parquet") \
                and f != data_file:
            try:
                os.remove(os.path.join(mart_dir, f))
            except OSError:
                pass


def read_mart(mart_dir: str) -> pa.Table:
    state = mart_state(mart_dir)
    if state is None:
        raise FileNotFoundError(f"no mart committed at {mart_dir}")
    return pq.read_table(os.path.join(mart_dir, state["data_file"]))


def mart_state(mart_dir: str) -> dict | None:
    p = os.path.join(mart_dir, _STATE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def build_mart(lake_dir: str, mart_dir: str, spec: MartSpec,
               cfg=None, at_epoch: int | None = None) -> dict:
    """Full (re)build of the mart from the lake state — the reference's
    regenerate-everything path, kept for bootstrap and audit. ``at_epoch``
    builds from the time-travel state (so a refresh window can start
    anywhere in committed history)."""
    from .cdc import read_lake_at

    store = ManifestStore(lake_dir)
    committed = store.committed_epoch()
    if committed < 0:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    # clamp BEFORE recording: read_lake_at silently clamps its read to the
    # committed epoch, so recording an unclamped at_epoch would mislabel
    # the aggregated state and stall every refresh until the lake catches
    # up; always aggregating the time-travel state AT the recorded epoch
    # also closes the build-vs-record race (a commit landing between
    # committed_epoch() and a current-manifest read would otherwise put
    # newer rows in a mart labeled with the older epoch, double-applying
    # that window on the next refresh)
    epoch = committed if at_epoch is None else min(at_epoch, committed)
    mart = _aggregate(read_lake_at(lake_dir, epoch, cfg=cfg), spec)
    dtypes = {m: str(mart[m].dtype) for m in spec.metric_names()}
    _write_state(mart_dir, spec, epoch, mart, dtypes)
    return {"mode": "full", "epoch": epoch, "groups": len(mart)}


def refresh_mart(lake_dir: str, mart_dir: str, cfg=None,
                 to_epoch: int | None = None) -> dict:
    """Advance the stored mart to ``to_epoch`` (default: the lake's current
    committed epoch) by folding the change feed's signed deltas into it —
    no lake scan. Raises if the mart would go inconsistent (a group's row
    count below zero means mart and lake histories diverged; rebuild)."""
    from .cdc import read_changes

    state = mart_state(mart_dir)
    if state is None:
        raise FileNotFoundError(
            f"no mart at {mart_dir}: bootstrap with build_mart() first")
    spec = MartSpec.from_json(state["spec"])
    store = ManifestStore(lake_dir)
    cur = store.committed_epoch()
    to_eff = cur if to_epoch is None else min(to_epoch, cur)
    from_epoch = int(state["epoch"])
    if to_eff <= from_epoch:
        return {"mode": "noop", "epoch": from_epoch, "feed_rows": 0,
                "groups": int(state["groups"])}

    feed = read_changes(lake_dir, from_epoch, to_eff, cfg=cfg)
    deltas = _feed_deltas(feed, spec)
    feed_rows = (int(deltas[spec.rows_metric].abs().sum())
                 if len(deltas) else 0)

    mart = read_mart(mart_dir).to_pandas()
    merged = _fold(pd.concat([mart, deltas], ignore_index=True), spec)
    if (merged[spec.rows_metric] < 0).any():
        bad = merged.loc[merged[spec.rows_metric] < 0, list(spec.group_by)]
        raise ValueError(
            f"mart refresh drove {len(bad)} group(s) to negative row "
            f"counts (first: {bad.iloc[0].to_dict()}): the stored mart "
            "does not match the lake history — rebuild with build_mart()")
    merged = merged.loc[merged[spec.rows_metric] > 0].reset_index(drop=True)
    _write_state(mart_dir, spec, to_eff, merged, dict(state["dtypes"]))
    return {"mode": "incremental", "from_epoch": from_epoch,
            "epoch": to_eff, "feed_rows": feed_rows, "groups": len(merged)}
