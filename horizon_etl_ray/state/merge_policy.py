"""Pluggable merge/conflict-resolution policies for the CDC kernel (§2.11).

The reference exposes merge behavior through its strategy/handler registry
(/root/reference/src/core/logic/project_loader.py:67-73) — e.g. the parent
rollup's WIDEN-ONLY update, which only moves a start date earlier or an end
date later (/root/reference/src/core/logic/project_loader.py:229-237).
Round 1 hard-coded last-writer-wins; this module makes the policy a plain
callable plugged into ``CdcConfig.merge_policy``.

Contract — a policy is an object with::

    reduce(table: pa.Table) -> pa.Table

where ``table`` holds change events (and/or previously reduced rows) for
any subset of keys, and the result has EXACTLY ONE row per key. ``reduce``
MUST be associative + commutative + idempotent over event multisets (it is
used as both the per-block combiner and the per-partition final merge, and
prior state re-enters as rows), must preserve every input column (plus any
aggregate columns it adds on first reduction), keep the ``op`` column of
the winning row (tombstone semantics), and return rows sorted ascending by
the key columns (the digest is computed in row order).

Policies compose with BOTH write modes. ``write_mode='delta'`` keeps a
narrow per-partition index whose merge re-runs the policy across epochs —
so a policy must additionally declare ``index_columns()``: the payload
columns its ``reduce`` needs to re-reduce already-reduced rows (for
``WidenOnlyPolicy``: the widened column plus its ``_min``/``_max``
aggregates — min/max are as mergeable as LWW). A policy without
``index_columns`` support still works with ``write_mode='cow'``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa


@dataclass
class WidenOnlyPolicy:
    """LWW for the payload + widen-only aggregates for selected columns.

    The winning row is still the max-``seq`` event (so tombstones and the
    content sha invariant behave exactly like LWW), but for every column in
    ``widen_columns`` the policy also maintains ``<col>_min`` / ``<col>_max``
    over ALL events ever seen for the key — the project-rollup semantics of
    project_loader.py:229-237 (a re-run can only widen the range, never
    shrink it). min/max are associative+commutative+idempotent, so the
    policy is safe as a combiner and under replay.

    Delivery-order contract: the engine's exactly-once seq fence drops any
    event at or below a partition's committed offset BEFORE the policy
    sees it — a duplicate redelivery and a late lower-seq FIRST delivery
    are indistinguishable by seq, and exactly-once wins. So "ALL events
    ever seen" means all events whose seq was NEW when their epoch
    committed: feed each key's events with non-decreasing seq across
    epochs (the generator/binlog contract) or batch late data into the
    epoch where it arrives with a fresh seq. Within one epoch, order is
    irrelevant (the reduce is order-free). Pinned by
    tests/test_history.py::test_policy_aggregates_respect_the_seq_fence."""

    key_columns: tuple[str, ...]
    seq_column: str = "seq"
    op_column: str = "op"
    widen_columns: tuple[str, ...] = field(default_factory=tuple)

    def index_columns(self) -> list[str]:
        """Extra columns the delta-mode narrow index must carry so
        ``reduce`` can re-reduce index rows across epochs: the raw widened
        column (coalesce source) and its running min/max aggregates."""
        out: list[str] = []
        for c in self.widen_columns:
            out += [c, f"{c}_min", f"{c}_max"]
        return out

    def extend_schema(self, t: pa.Table) -> pa.Table:
        """Append the policy's aggregate columns (typed from their source
        column) to a table lacking them. The CDC combiner uses this to emit
        zero-row blocks in the REDUCED schema — without it, a fully
        fenced/quarantined block would inject a block missing ``<col>_min``/
        ``<col>_max`` into the ``groupby('part_id')`` exchange (ADVICE r3)."""
        for c in self.widen_columns:
            typ = t.schema.field(c).type
            for agg in (f"{c}_min", f"{c}_max"):
                if agg not in t.column_names:
                    t = t.append_column(agg, pa.nulls(len(t), typ))
        return t

    def reduce(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        keys = list(self.key_columns)
        df = t.to_pandas()
        work = df.copy()
        for c in self.widen_columns:
            lo, hi = f"{c}_min", f"{c}_max"
            # coalesce: raw events carry only c; reduced rows carry c_min/max
            work[lo] = (work[lo].fillna(work[c]) if lo in df.columns
                        else work[c])
            work[hi] = (work[hi].fillna(work[c]) if hi in df.columns
                        else work[c])
        g = work.groupby(keys, sort=False)
        aggs = {}
        for c in self.widen_columns:
            aggs[f"{c}_min"] = g[f"{c}_min"].min()
            aggs[f"{c}_max"] = g[f"{c}_max"].max()
        winners = (work.sort_values(keys + [self.seq_column],
                                    ascending=[True] * len(keys) + [False])
                   .drop_duplicates(subset=keys, keep="first"))
        for name, series in aggs.items():
            winners = winners.drop(columns=[name]).merge(
                series.reset_index(), on=keys, how="left")
        winners = winners.sort_values(keys).reset_index(drop=True)
        return pa.Table.from_pandas(winners, preserve_index=False)
