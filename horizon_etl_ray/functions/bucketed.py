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

Sizing at scale: each physical bucket is reduced as ONE in-memory frame of
roughly ``distinct_keys / num_buckets × avg blocks-per-key`` partial rows,
so ``num_buckets`` must grow with key cardinality (rule of thumb:
``distinct_keys / num_buckets`` ≲ a few million; the default 64 suits up to
~10^8 keys). Hot keys are safe at ANY bucket count: a key contributes at
most one partial row per BLOCK, so its bucket sees ≤ #blocks rows for it —
the skew-bound test pins this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bucketed_groupby_agg", "bounded_groupby_fold"]

_MERGE_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _key_array(values: np.ndarray, col: str) -> pa.Array:
    """Explicit Arrow type for a key column so string keys never ride
    pandas object blocks through the exchange (measured ~8× exchange
    penalty for object-dtype keys, BASELINE.md round-4). Only integer and
    string keys are supported — a float key would be silently truncated by
    the int64 cast, so refuse it loudly."""
    if values.dtype == object or values.dtype.kind in ("U", "S"):
        return pa.array(list(values), pa.string())
    if values.dtype.kind not in ("i", "u", "b"):
        raise TypeError(
            f"bucketed_groupby_agg key {col!r} has dtype {values.dtype}; "
            "only integer and string keys are supported (a float key would "
            "be silently truncated)")
    return pa.array(values.astype(np.int64), pa.int64())


def bucketed_groupby_agg(
    ds,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    num_buckets: int = 64,
):
    """``ds.groupby(key).aggregate(...)`` for high-cardinality ``key``.

    ``key`` is a column name or a list of them (composite key — e.g. the
    distinct-pair reduce of the link consolidation). ``aggs`` maps output
    column → ``(input column, op)`` with op in {sum, min, max, count}
    (count ignores the input column). Returns a Dataset with columns
    ``[*keys, *aggs]``. Key dtypes (int64 or string) are preserved;
    partials are emitted as explicit Arrow types so string keys never ride
    pandas object blocks through the exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    for out_col, (_, op) in aggs.items():
        if op not in _MERGE_OP:
            raise ValueError(f"unsupported agg op {op!r} for {out_col!r}")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        for k in keys:  # pandas groupby DROPS null keys — refuse loudly
            if df[k].isna().any():
                raise ValueError(
                    f"bucketed_groupby_agg key {k!r} contains nulls; the "
                    "partial groupby would silently drop those rows "
                    "(filter or fill them upstream)")
        g = df.groupby(keys, sort=False)
        cols: dict[str, pd.Series] = {}
        for out_col, (in_col, op) in aggs.items():
            cols[out_col] = g.size() if op == "count" else g[in_col].agg(op)
        part = pd.DataFrame(cols).reset_index()
        # one row-hash across ALL key columns: a composite key lives in
        # exactly one bucket, so per-bucket merges stay disjoint
        h = pd.util.hash_pandas_object(part[keys], index=False).to_numpy()
        out: dict[str, pa.Array] = {
            k: _key_array(part[k].to_numpy(), k) for k in keys}
        for out_col, (_, op) in aggs.items():
            v = part[out_col].to_numpy()
            out[out_col] = pa.array(
                v.astype(np.int64) if op == "count" else v)
        out["_b"] = pa.array((h % num_buckets).astype(np.int64), pa.int64())
        return pa.table(out)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(keys, sort=False)
        cols = {out_col: gg[out_col].agg(_MERGE_OP[op])
                for out_col, (_, op) in aggs.items()}
        return pd.DataFrame(cols).reset_index()

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(reduce_bucket, batch_format="pandas"))


def bounded_groupby_fold(ds, key: str | list[str], sum_cols: list[str],
                         count_col: str | None = None) -> pd.DataFrame:
    """In-task partial + DRIVER fold, for group counts bounded by a small
    domain (priority flags, return-flag × status, calendar years): each
    block collapses to ≤|domain| partial rows in-task, and the driver folds
    only ``blocks × |domain|`` rows — no exchange at all. Returns a pandas
    DataFrame with ``[*keys, *sum_cols, count_col?]``. Use the bucketed
    reduce above when |groups| scales with the data instead."""
    keys = [key] if isinstance(key, str) else list(key)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby(keys, sort=False)
        out = g[sum_cols].sum()
        if count_col is not None:
            out[count_col] = g.size().astype(np.int64)
        return out.reset_index()

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cols = sum_cols + ([count_col] if count_col is not None else [])
    out = parts.groupby(keys, sort=False)[cols].sum().reset_index()
    if count_col is not None:
        out[count_col] = out[count_col].astype(np.int64)
    return out
