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


def test_hot_key_partials_bounded_by_block_count():
    """Skew safety: a key occupying 60% of all rows still enters the
    exchange as at most one partial row per block — the combiner, not the
    exchange, absorbs the skew."""
    rng = np.random.default_rng(13)
    n = 4000
    k = rng.integers(1, 200, n)
    k[: int(n * 0.6)] = 0  # hot key
    df = pd.DataFrame({"k": k, "v": rng.integers(0, 5, n)})
    n_blocks = 7
    ds = ray.data.from_pandas(df).repartition(n_blocks)

    from horizon_etl_ray.functions.bucketed import bucketed_groupby_agg

    agg = bucketed_groupby_agg(ds, "k", {"s": ("v", "sum")})
    # count the hot key's rows in the PARTIAL stage by re-running the same
    # partial shape the helper uses: per-block groupby → one row per
    # (key, block)
    hot_partial_rows = sum(
        int((b["k"].to_pandas() == 0).any())
        for b in ds.map_batches(
            lambda t: t.group_by("k").aggregate([("v", "sum")]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    assert hot_partial_rows <= n_blocks
    out = agg.to_pandas().set_index("k")
    assert out.loc[0, "s"] == df.loc[df["k"] == 0, "v"].sum()


def test_property_random_frames_match_flat():
    """Randomized sweep (seeded): many shapes × key types × ops must match
    the flat pandas groupby exactly."""
    rng = np.random.default_rng(99)
    for trial in range(5):
        n = int(rng.integers(1, 900))
        card = int(rng.integers(1, 80))
        as_str = bool(rng.integers(0, 2))
        keys = rng.integers(0, card, n)
        df = pd.DataFrame({
            "k": [f"s{v}" for v in keys] if as_str else keys.astype(np.int64),
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
        })
        aggs = {"s": ("v", "sum"), "lo": ("v", "min"),
                "hi": ("v", "max"), "n": ("v", "count")}
        nb = int(rng.integers(1, 100))
        got = _run(df, "k", aggs, num_buckets=nb)
        want = _flat(df, "k", aggs)
        pd.testing.assert_frame_equal(
            got[["k", "s", "lo", "hi", "n"]].astype(
                {c: np.int64 for c in ("s", "lo", "hi", "n")}),
            want.astype({c: np.int64 for c in ("s", "lo", "hi", "n")}),
        )


def test_float_key_raises():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1.5], "v": [1]}))
    with pytest.raises(Exception, match="only integer and string keys"):
        bucketed_groupby_agg(ds, "k", {"s": ("v", "sum")}).to_pandas()


def test_null_key_raises():
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "v": [1, 2]}))
    with pytest.raises(Exception, match="contains nulls"):
        bucketed_groupby_agg(ds, "k", {"s": ("v", "sum")}).to_pandas()
