"""bucketed_groupby_agg must be a drop-in for Dataset.groupby().aggregate()
on mergeable aggs — same rows for int and string keys, any block split."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from horizon_etl_ray.functions.bucketed import bucketed_groupby_agg


def _flat(df: pd.DataFrame, key, aggs) -> pd.DataFrame:
    g = df.groupby(key, sort=False)
    cols = {}
    for out_col, (in_col, op) in aggs.items():
        cols[out_col] = g.size() if op == "count" else g[in_col].agg(op)
    return pd.DataFrame(cols).reset_index().sort_values(
        key if isinstance(key, str) else list(key)).reset_index(drop=True)


def _run(df: pd.DataFrame, key, aggs, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(7)  # force multi-block partials
    out = bucketed_groupby_agg(ds, key, aggs, **kw).to_pandas()
    return out.sort_values(
        key if isinstance(key, str) else list(key)).reset_index(drop=True)


def test_int_key_matches_flat_groupby():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 500, 2000),
        "v": rng.normal(size=2000),
    })
    aggs = {"s": ("v", "sum"), "lo": ("v", "min"),
            "hi": ("v", "max"), "n": ("v", "count")}
    got, want = _run(df, "k", aggs), _flat(df, "k", aggs)
    assert got["k"].dtype == np.int64
    assert got["n"].dtype == np.int64
    pd.testing.assert_frame_equal(
        got[["k", "s", "lo", "hi", "n"]].astype({"n": np.int64}),
        want, check_exact=False, rtol=1e-9)


def test_string_key_matches_flat_groupby():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": [f"key-{i:04d}" for i in rng.integers(0, 300, 1500)],
        "v": rng.integers(-50, 50, 1500),
    })
    aggs = {"s": ("v", "sum"), "n": ("v", "count")}
    got, want = _run(df, "k", aggs), _flat(df, "k", aggs)
    assert len(got) == df["k"].nunique()
    pd.testing.assert_frame_equal(
        got[["k", "s", "n"]].astype({"n": np.int64, "s": np.int64}),
        want.astype({"n": np.int64, "s": np.int64}))


def test_composite_key_matches_flat_groupby():
    """Pair keys: every distinct (a, b) lives in exactly one bucket, so
    per-bucket merges stay disjoint and the two-level result is exact."""
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.integers(0, 40, 3000),
        "b": rng.integers(0, 40, 3000),
        "v": rng.integers(0, 100, 3000),
    })
    aggs = {"s": ("v", "sum"), "n": ("v", "count")}
    got = _run(df, ["a", "b"], aggs)
    want = _flat(df, ["a", "b"], aggs)
    pd.testing.assert_frame_equal(
        got[["a", "b", "s", "n"]].astype({"n": np.int64, "s": np.int64}),
        want.astype({"n": np.int64, "s": np.int64}))


def test_bucket_count_invariance():
    """Result must not depend on num_buckets (routing is internal)."""
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 100, 800),
                       "v": rng.integers(0, 9, 800)})
    aggs = {"s": ("v", "sum")}
    a = _run(df, "k", aggs, num_buckets=2)
    b = _run(df, "k", aggs, num_buckets=97)
    pd.testing.assert_frame_equal(a, b)


def test_unsupported_op_raises():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="unsupported agg op"):
        bucketed_groupby_agg(ds, "k", {"m": ("v", "mean")})
