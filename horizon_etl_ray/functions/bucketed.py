"""Two-level bucketed groupby-aggregate — the repo's standard reduce for
HIGH-CARDINALITY keys.

``Dataset.groupby(key).aggregate(...)`` pays a per-GROUP overhead in the
sort-based aggregation (~35 µs/group measured on this host, key type
irrelevant): at group-cardinality ≈ row count that dominates the stage
(21.7 s vs 1.05 s at 1M distinct keys for a min-election; 9.1 s vs 0.96 s
for a 237k-window count — BASELINE.md round-4). This helper does the same
aggregation as per-block C-speed pandas partials routed by
``hash(key) % num_buckets``, then ONE vectorized pandas merge per physical
bucket — the exchange still moves one row per distinct-key-per-block, but
the distributed reduce only ever sees ``num_buckets`` groups.

Only MERGEABLE aggregates are supported: ``sum`` / ``min`` / ``max`` /
``count`` (count partials merge by sum). Low-cardinality groupbys (≤ a few
thousand groups) should keep the plain ``Dataset.groupby`` — the builtin is
simpler and the overhead is invisible there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bucketed_groupby_agg"]

_MERGE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def bucketed_groupby_agg(
    ds,
    key: str,
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
):
    """``ds.groupby(key).aggregate(...)`` for high-cardinality ``key``.

    ``aggs`` maps output column → ``(input column, op)`` with op in
    {sum, min, max, count} (count ignores the input column). Returns a
    Dataset with columns ``[key, *aggs]``. Key dtype (int64 or string) is
    preserved; partials are emitted as explicit Arrow types so string keys
    never ride pandas object blocks through the exchange."""
    for out_col, (_, op) in aggs.items():
        if op not in _MERGE_OP:
            raise ValueError(f"unsupported agg op {op!r} for {out_col!r}")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(key, sort=False)
        cols: dict[str, pd.Series] = {}
        for out_col, (in_col, op) in aggs.items():
            cols[out_col] = g.size() if op == "count" else g[in_col].agg(op)
        part = pd.DataFrame(cols).reset_index()
        kv = part[key].to_numpy()
        if kv.dtype == object or kv.dtype.kind in ("U", "S"):
            h = pd.util.hash_array(kv.astype(object))
            key_arr = pa.array(part[key].tolist(), pa.string())
        else:
            h = pd.util.hash_array(kv.astype(np.int64))
            key_arr = pa.array(kv.astype(np.int64), pa.int64())
        out: dict[str, pa.Array] = {key: key_arr}
        for out_col, (_, op) in aggs.items():
            v = part[out_col].to_numpy()
            out[out_col] = pa.array(
                v.astype(np.int64) if op == "count" else v)
        out["_b"] = pa.array((h % num_buckets).astype(np.int64), pa.int64())
        return pa.table(out)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(key, sort=False)
        cols = {out_col: gg[out_col].agg(_MERGE_OP[op])
                for out_col, (_, op) in aggs.items()}
        merged = pd.DataFrame(cols).reset_index()
        if merged[key].dtype == object:
            merged[key] = pd.Series(
                merged[key].to_numpy(dtype=object), dtype=object)
        return merged

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(reduce_bucket, batch_format="pandas"))
