"""As-of join — a custom operator Ray Data lacks, composed per the engine's
standard recipe: hash-bucket both sides by the equality key, co-shuffle once
(as a union with a unified schema), and run a vectorized time-ordered merge
(``pandas.merge_asof``) inside each bucket group.

Partitioning assumption (documented per the repo's custom-operator rule):
all rows of one equality key land in one bucket (bucket = hash(key) % P), so
the per-bucket merge sees every candidate right-side row for its left rows.
Skewed keys cost only within-bucket sort time — the merge itself is O(n)
after the sort. At 100 TB, P scales with cluster cores and the two inputs
are column-pruned before the single co-shuffle.

Reference parity: the reference has no as-of join; this generalizes its
"latest file wins by mtime order" lookup semantics
(/root/reference/src/flows/sigpesq/advisorships.py:38-40) to per-key
point-in-time lookups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket(key: np.ndarray, P: int) -> np.ndarray:
    return (((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(32)) % np.uint64(P)).astype(np.int64)


def _placeholder_spec(arrow_type) -> tuple[object, object]:
    """(numpy dtype, fill value) for a typed placeholder column — the
    non-owning side of the union carries these so the unified schema keeps
    each value column's NATIVE type (int64 stays int64: no float64 carry, no
    2^53 ceiling; ``_side`` tells the merge which rows are real)."""
    if pa.types.is_integer(arrow_type):
        return np.int64, 0
    if pa.types.is_floating(arrow_type):
        return np.float64, 0.0
    if pa.types.is_boolean(arrow_type):
        return np.bool_, False
    if pa.types.is_timestamp(arrow_type):
        return "datetime64[us]", np.datetime64(0, "us")
    return object, ""


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    left_value_columns: list[str],
    right_value_columns: list[str],
    num_buckets: int = 16,
):
    """For every left row, attach the latest right row with
    ``right[on] <= left[on]`` and the same ``by`` key (backward as-of, exact
    matches allowed — DuckDB ``ASOF JOIN`` semantics). Inner join: left rows
    with no prior right row are dropped.

    Returns a Dataset with columns ``[by, on, *left_value_columns,
    *right_value_columns]``. Value columns keep their NATIVE dtypes through
    the unified-schema co-shuffle — the side that lacks a column carries a
    typed zero placeholder (never read: ``_side`` marks real rows), and
    integer right-side columns ride ``merge_asof`` as nullable ``Int64`` so
    unmatched rows never force a float64 upcast. Exact for int64 keys of any
    magnitude (incl. > 2^53).

    Unmatched left rows are detected with an explicit right-side row marker
    (``_matched``), never by nulls in the value columns — a genuine null in a
    matched right row survives the join.
    """
    cols = [by, on, *left_value_columns, *right_value_columns]
    l_schema, r_schema = left_ds.schema(), right_ds.schema()
    spec = {}
    for c in left_value_columns:
        spec[c] = _placeholder_spec(l_schema.base_schema.field(c).type)
    for c in right_value_columns:
        spec[c] = _placeholder_spec(r_schema.base_schema.field(c).type)

    def tag(side: int):
        mine = left_value_columns if side == 0 else right_value_columns

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            out = pd.DataFrame({by: df[by].to_numpy(), on: df[on].to_numpy()})
            for c in left_value_columns + right_value_columns:
                dtype, fill = spec[c]
                if c in mine:
                    out[c] = df[c].to_numpy()
                else:
                    out[c] = np.full(n, fill, dtype=dtype)
            out["_side"] = np.int8(side)
            out["_bucket"] = _bucket(df[by].to_numpy(), num_buckets)
            return out

        return fn

    left = left_ds.map_batches(tag(0), batch_format="pandas")  # pandas: tagged-union frame for the as-of co-shuffle
    right = right_ds.map_batches(tag(1), batch_format="pandas")  # pandas: tagged-union frame for the as-of co-shuffle

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = (g[g["_side"] == 0][[by, on, *left_value_columns]]
              .sort_values(on))
        rf = (g[g["_side"] == 1][[by, on, *right_value_columns]]
              .sort_values(on))
        # nullable Int64 ⇒ unmatched rows get pd.NA, ints stay exact
        int_right = [c for c in right_value_columns
                     if pd.api.types.is_integer_dtype(rf[c])]
        for c in int_right:
            rf[c] = rf[c].astype("Int64")
        rf = rf.assign(_matched=True)  # non-null row marker survives merge_asof
        out = pd.merge_asof(lf, rf, on=on, by=by, direction="backward",
                            allow_exact_matches=True)
        out = out[out["_matched"].notna()][cols]
        for c in int_right:
            out[c] = out[c].astype(np.int64)
        return out

    return left.union(right).groupby("_bucket").map_groups(
        merge, batch_format="pandas"  # pandas: per-key-range as-of merge
    )
