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


def _commit_mart(mart_dir: str, data_file: str, t: pa.Table,
                 pointer: dict) -> None:
    """Atomic-pointer commit shared by both mart kinds: write the
    epoch-named data file, THEN swap the json pointer (the manifest's
    discipline) — a crash between the two leaves the pointer on the
    previous consistent (table, epoch) pair, never a new table with an old
    epoch that a later refresh would double-apply. Superseded data files
    of EITHER kind are swept after the commit (a rebuild may have switched
    the dir's kind)."""
    os.makedirs(mart_dir, exist_ok=True)
    atomic_write_table(os.path.join(mart_dir, data_file), t)
    atomic_write_json(os.path.join(mart_dir, _STATE_FILE), pointer)
    for f in os.listdir(mart_dir):
        if (f.startswith("mart_e") or f.startswith("partials_e")) \
                and f.endswith(".parquet") and f != data_file:
            try:
                os.remove(os.path.join(mart_dir, f))
            except OSError:
                pass


def _write_state(mart_dir: str, spec: MartSpec, epoch: int,
                 table: pd.DataFrame, dtypes: dict[str, str]) -> None:
    for m, dt in dtypes.items():
        table[m] = table[m].astype(dt)
    t = pa.Table.from_pandas(
        table.sort_values(list(spec.group_by)).reset_index(drop=True),
        preserve_index=False)
    _commit_mart(mart_dir, f"mart_e{epoch}.parquet", t,
                 {"epoch": epoch, "data_file": f"mart_e{epoch}.parquet",
                  "spec": spec.to_json(), "dtypes": dtypes,
                  "groups": len(table)})


def _additive_state(mart_dir: str) -> dict | None:
    state = mart_state(mart_dir)
    if state is not None and state.get("kind") == "partitioned":
        raise ValueError(
            f"{mart_dir} holds a partitioned mart — read it with "
            "read_partitioned_mart()/refresh_partitioned_mart()")
    return state


def read_mart(mart_dir: str) -> pa.Table:
    state = _additive_state(mart_dir)
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

    state = _additive_state(mart_dir)
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


# ---------------------------------------------------------------------------
# Partition-partial marts: non-additive aggregates (min/max) maintained in
# O(touched partitions) instead of O(lake).
#
# A min/max can't be folded from a change feed — deleting the row that held
# the minimum needs the remaining rows to find the new one — which is why
# ``MartSpec`` is additive-only. But it CAN be maintained without a full
# scan: keep one aggregate partial PER LAKE PARTITION, and on refresh
# recompute partials only for the partitions the epoch window rewrote (the
# manifest's lineage records name them — no file needs opening to learn
# this). Serving = fold of |partitions| × |groups| partial rows, the same
# driver-bounded shape as the additive mart. A refresh after an epoch that
# touched 3 of 10^4 partitions re-reads 3 partitions, not the 100 TB.
# ---------------------------------------------------------------------------

_PART_FOLDS = {"sum": "sum", "min": "min", "max": "max"}


@dataclass(frozen=True)
class PartitionedMartSpec:
    """A group-by mart with per-partition partials: ``metrics`` maps the
    output metric name to ``(func, lake_column)`` with func in
    ``{"sum", "min", "max"}``; a live-row count (``rows_metric``) is always
    maintained. Each func is its own fold across partitions (min of mins,
    max of maxes, sum of sums), so non-additive metrics stay exact under
    deletes — the partition that changed is recomputed from its live state,
    never incrementally patched."""

    group_by: tuple[str, ...]
    metrics: dict[str, tuple[str, str]] = field(default_factory=dict)
    rows_metric: str = "n_rows"

    def __post_init__(self):
        if self.rows_metric in self.metrics:
            raise ValueError(
                f"rows_metric {self.rows_metric!r} collides with a metric")
        reserved = {*self.group_by, "part_id"}
        if self.rows_metric in reserved:
            raise ValueError(
                f"rows_metric {self.rows_metric!r} collides with a "
                "group_by column or the reserved part_id column")
        for name, (fn, _src) in self.metrics.items():
            if name in reserved:
                raise ValueError(
                    f"metric name {name!r} collides with a group_by column "
                    "or the reserved part_id column")
            if fn not in _PART_FOLDS:
                raise ValueError(
                    f"metric {name!r}: unsupported func {fn!r} "
                    f"(supported: {sorted(_PART_FOLDS)})")

    def metric_names(self) -> list[str]:
        return [self.rows_metric, *self.metrics]

    def to_json(self) -> dict:
        return {"group_by": list(self.group_by),
                "metrics": {k: list(v) for k, v in self.metrics.items()},
                "rows_metric": self.rows_metric}

    @staticmethod
    def from_json(d: dict) -> "PartitionedMartSpec":
        return PartitionedMartSpec(
            group_by=tuple(d["group_by"]),
            metrics={k: (v[0], v[1]) for k, v in d["metrics"].items()},
            rows_metric=d["rows_metric"])


def _partial_agg(df: pd.DataFrame, spec: PartitionedMartSpec,
                 folds: bool = False) -> pd.DataFrame:
    """Group-by aggregate of one frame. ``folds=False``: leaf aggregate of
    live lake rows (each metric's own func). ``folds=True``: fold of partial
    rows (min of mins / max of maxes / sum of sums; row counts sum)."""
    g = df.groupby(list(spec.group_by), sort=False, dropna=False)
    named = {m: pd.NamedAgg(column=(m if folds else src),
                            aggfunc=_PART_FOLDS[fn])
             for m, (fn, src) in spec.metrics.items()}
    named[spec.rows_metric] = pd.NamedAgg(
        column=spec.rows_metric, aggfunc="sum") if folds else pd.NamedAgg(
        column=spec.group_by[0], aggfunc="size")
    out = g.agg(**named).reset_index()
    out[spec.rows_metric] = out[spec.rows_metric].astype(np.int64)
    if folds and len(out) > MAX_GROUPS:
        raise ValueError(
            f"mart has {len(out)} groups > MAX_GROUPS={MAX_GROUPS}: "
            "driver-folded marts are for dimension-bounded group domains")
    return out


def _recompute_partials(lake_dir: str, pids_states: list, spec, cfg,
                        script, version) -> pd.DataFrame:
    """One Ray task per partition: merge-on-read the partition's live state
    (the same ``_resolve_state_table`` kernel every lake reader uses), then
    aggregate to |groups| partial rows. Only the partial rows return to the
    driver — the partition's data never does."""
    import ray

    from .cdc import _resolve_state_table

    gcols = list(spec.group_by)
    srcs = list(dict.fromkeys(src for _, src in spec.metrics.values()))
    spec_json = spec.to_json()

    @ray.remote(num_cpus=1)
    def partial(pid: int, files: list[str]) -> pd.DataFrame:
        import pyarrow.compute as _pc
        import pyarrow.parquet as pq

        sp = PartitionedMartSpec.from_json(spec_json)
        t = pa.concat_tables([pq.read_table(f) for f in files],
                             promote_options="permissive")
        t = _resolve_state_table(t, cfg, script, version)
        t = t.filter(_pc.invert(_pc.fill_null(t["deleted"], False)))
        if len(t) == 0:
            out = pd.DataFrame(columns=[*gcols, *sp.metric_names()])
        else:
            out = _partial_agg(
                t.select(list(dict.fromkeys([*gcols, *srcs]))).to_pandas(),
                sp)
        out.insert(0, "part_id", np.int32(pid))
        return out

    store = ManifestStore(lake_dir)
    # preflight like read_lake_at: a time-travel bootstrap after gc() must
    # fail with the actionable message, not a raw error inside a Ray task
    missing = [f for _, ps in pids_states
               for f in store.partition_data_files(ps)
               if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"mart partials need {missing[0]} (+{len(missing) - 1} more), "
            "reclaimed by gc(); rerun gc with keep_epochs covering the "
            "bootstrap/refresh window")
    refs = [partial.remote(pid, store.partition_data_files(ps))
            for pid, ps in pids_states]
    frames = [f for f in ray.get(refs) if len(f)]
    if not frames:
        return pd.DataFrame(
            columns=["part_id", *spec.group_by, *spec.metric_names()])
    return pd.concat(frames, ignore_index=True)


def _metric_cast(s: pd.Series, dt: str) -> pd.Series:
    """Cast a metric column back to its recorded dtype, null-safely: a
    group whose values are ALL null aggregates to NaN (SQL's MIN/MAX over
    nulls), which a plain astype('int64') would crash on — store those as
    the pandas NULLABLE integer dtype instead (values stay exact integers,
    nulls stay null). int64 → Int64, uint32 → UInt32, etc."""
    if (pd.api.types.is_integer_dtype(np.dtype(dt))
            and bool(s.isna().any())):
        name = np.dtype(dt).name
        return s.astype(name.replace("uint", "UInt").replace("int", "Int"))
    return s.astype(dt)


def _write_partitioned_state(mart_dir: str, spec: PartitionedMartSpec,
                             epoch: int, partials: pd.DataFrame,
                             dtypes: dict[str, str]) -> None:
    if len(partials):
        # the serve-time MAX_GROUPS guard, enforced at COMMIT time too: an
        # unbounded group domain must be rejected before it is persisted,
        # not discovered on every read of a permanently-unreadable mart
        n_groups = partials.groupby(list(spec.group_by), sort=False,
                                    dropna=False).ngroups
        if n_groups > MAX_GROUPS:
            raise ValueError(
                f"mart has {n_groups} groups > MAX_GROUPS={MAX_GROUPS}: "
                "driver-folded marts are for dimension-bounded group "
                "domains")
        for m, dt in dtypes.items():
            partials[m] = _metric_cast(partials[m], dt)
    t = pa.Table.from_pandas(
        partials.sort_values(["part_id", *spec.group_by])
        .reset_index(drop=True),
        preserve_index=False)
    data_file = f"partials_e{epoch}.parquet"
    _commit_mart(mart_dir, data_file, t,
                 {"kind": "partitioned", "epoch": epoch,
                  "data_file": data_file, "spec": spec.to_json(),
                  "dtypes": dtypes, "partials": len(partials)})


def _partitioned_state(mart_dir: str) -> dict:
    state = mart_state(mart_dir)
    if state is None:
        raise FileNotFoundError(f"no mart committed at {mart_dir}")
    if state.get("kind") != "partitioned":
        raise ValueError(
            f"{mart_dir} holds an additive mart, not a partitioned one — "
            "read it with read_mart()/refresh_mart()")
    return state


def build_partitioned_mart(lake_dir: str, mart_dir: str,
                           spec: PartitionedMartSpec, cfg=None,
                           at_epoch: int | None = None) -> dict:
    """Bootstrap: one partial per committed partition, computed in parallel
    from the (time-travel) state at ``at_epoch`` (clamped to the committed
    epoch BEFORE recording, like ``build_mart``)."""
    from .cdc import CdcConfig, partition_states_at

    cfg_eff = cfg or CdcConfig()
    store = ManifestStore(lake_dir)
    m = store.load()
    if m.epoch < 0:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    epoch = m.epoch if at_epoch is None else min(at_epoch, m.epoch)
    parts = partition_states_at(store, epoch, m=m)
    partials = _recompute_partials(
        lake_dir, sorted(parts.items()), spec, cfg_eff,
        cfg_eff.schema_script, m.schema_version)
    # dtypes are recorded from DATA, never guessed: an empty bootstrap
    # state records nothing and the first non-empty refresh fills them in
    # (hardcoding int64 here would silently truncate a float metric later)
    dtypes = ({mt: str(partials[mt].dtype) for mt in spec.metric_names()}
              if len(partials) else {})
    _write_partitioned_state(mart_dir, spec, epoch, partials, dtypes)
    return {"mode": "full", "epoch": epoch,
            "partitions": len(parts), "partials": len(partials)}


def refresh_partitioned_mart(lake_dir: str, mart_dir: str, cfg=None,
                             to_epoch: int | None = None) -> dict:
    """Advance the mart: the manifest's lineage records name exactly which
    partitions the window (from, to] rewrote; ONLY those partials are
    recomputed (from their state at ``to_eff`` — time-travel clamped, so a
    commit racing the refresh can't leak newer rows into an older-labeled
    mart). Untouched partials are carried over byte-for-byte — their
    partition files are never opened. A record marks a partition touched
    only if its row was WRITTEN at that epoch (``d["epoch"] == record
    epoch``): compaction lists every partition but carries clean ones
    forward with their old epoch — pruning those keeps a routine
    compaction in the window from degrading the refresh back to O(lake)
    (rewritten partitions recompute; harmless — compaction never changes
    a live row)."""
    from .cdc import CdcConfig, partition_states_at

    state = _partitioned_state(mart_dir)
    spec = PartitionedMartSpec.from_json(state["spec"])
    cfg_eff = cfg or CdcConfig()
    store = ManifestStore(lake_dir)
    m = store.load()
    to_eff = m.epoch if to_epoch is None else min(to_epoch, m.epoch)
    from_epoch = int(state["epoch"])
    if to_eff <= from_epoch:
        return {"mode": "noop", "epoch": from_epoch,
                "touched_partitions": 0}

    recs = store.epoch_records()  # one listdir+parse pass feeds both uses
    touched = sorted({int(d["part_id"])
                      for r in recs
                      if from_epoch < r["epoch"] <= to_eff
                      for d in r["partitions"]
                      if int(d["epoch"]) == int(r["epoch"])})
    states = partition_states_at(store, to_eff, m=m, recs=recs)
    redone = _recompute_partials(
        lake_dir, [(pid, states[pid]) for pid in touched], spec, cfg_eff,
        cfg_eff.schema_script, m.schema_version)

    old = pq.read_table(
        os.path.join(mart_dir, state["data_file"])).to_pandas()
    kept = old.loc[~old["part_id"].isin(touched)]
    # never concat with an empty frame: its all-object columns would
    # poison the concat result's dtypes (and, after an empty bootstrap,
    # bake dtype 'object' into the recorded state forever)
    if not len(kept):
        merged = redone
    elif not len(redone):
        merged = kept.reset_index(drop=True)
    else:
        merged = pd.concat([kept, redone], ignore_index=True)
    dtypes = dict(state["dtypes"])
    if not dtypes and len(merged):  # empty bootstrap: record from data now
        dtypes = {mt: str(merged[mt].dtype) for mt in spec.metric_names()}
    _write_partitioned_state(mart_dir, spec, to_eff, merged, dtypes)
    return {"mode": "incremental", "from_epoch": from_epoch,
            "epoch": to_eff, "touched_partitions": len(touched),
            "partials": len(merged)}


def read_partitioned_mart(mart_dir: str) -> pa.Table:
    """Serve: fold the stored partials (min of mins / max of maxes / sum of
    sums, counts summed) — |partitions| × |groups| rows, never the lake."""
    state = _partitioned_state(mart_dir)
    spec = PartitionedMartSpec.from_json(state["spec"])
    partials = pq.read_table(
        os.path.join(mart_dir, state["data_file"])).to_pandas()
    if not len(partials):
        return pa.Table.from_pandas(
            pd.DataFrame(columns=[*spec.group_by, *spec.metric_names()]),
            preserve_index=False)
    out = _partial_agg(partials, spec, folds=True)
    for mt, dt in state["dtypes"].items():
        out[mt] = _metric_cast(out[mt], dt)
    return pa.Table.from_pandas(
        out.sort_values(list(spec.group_by)).reset_index(drop=True),
        preserve_index=False)
