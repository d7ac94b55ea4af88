"""HyperLogLog sketch: merge algebra, split invariance, error bounds, and
the profiler's approx path vs its exact twin (the properties the SQL
oracle can't hash-check)."""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.functions import sketches as sk
from horizon_etl_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def _regs(ids):
    return sk.hll_partial(sk.hash_values(np.asarray(ids, dtype=np.int64)))


def test_merge_algebra():
    """Union is elementwise max: associative, commutative, idempotent —
    the properties that make any fold order (and task retry) safe."""
    a, b, c = _regs(range(0, 400)), _regs(range(300, 900)), _regs(range(850, 2000))
    ab_c = sk.hll_merge(sk.hll_merge(a, b), c)
    a_bc = sk.hll_merge(a, sk.hll_merge(b, c))
    np.testing.assert_array_equal(ab_c, a_bc)
    np.testing.assert_array_equal(sk.hll_merge(a, b), sk.hll_merge(b, a))
    np.testing.assert_array_equal(sk.hll_merge(a, a), a)


def test_block_split_invariance():
    """The sketch of a stream equals the merge of ANY block decomposition
    of it — exactly (registers are max), not just statistically."""
    ids = np.arange(10_000, dtype=np.int64)
    whole = _regs(ids)
    rng = np.random.default_rng(7)
    perm = rng.permutation(ids)
    parts = np.array_split(perm, 13)
    merged = np.zeros_like(whole)
    for p in parts:
        merged = sk.hll_merge(merged, _regs(p))
    np.testing.assert_array_equal(whole, merged)


def test_error_bound_across_cardinalities():
    """Observed error well inside 3σ of the standard 1.04/√m (≈0.8% at
    p=14) across the linear-counting and raw-estimate regimes; duplicates
    never inflate the estimate."""
    for n in (100, 5_000, 200_000):
        ids = np.arange(n, dtype=np.int64)
        est = sk.hll_estimate(_regs(ids))
        assert abs(est - n) / n < 0.03, (n, est)
        dup = sk.hll_estimate(_regs(np.concatenate([ids, ids[: n // 2]])))
        assert abs(dup - n) / n < 0.03, (n, dup)


def test_rho_edges():
    """Register values cover the defined range: an all-zero remainder
    saturates at (64-p)+1 and no register exceeds it."""
    regs = _regs(np.arange(500_000, dtype=np.int64))
    assert regs.max() <= (64 - 14) + 1
    assert regs.min() >= 0


def test_string_and_int_hashing_disjoint_paths():
    """hash_values routes int64 through the engine md5 convention and
    strings through fixed-key siphash — both deterministic across calls."""
    ints = np.arange(64, dtype=np.int64)
    np.testing.assert_array_equal(sk.hash_values(ints), sk.hash_values(ints))
    strs = pd.array([f"s{i}" for i in range(64)], dtype=object)
    np.testing.assert_array_equal(sk.hash_values(strs), sk.hash_values(strs))


def test_profile_approx_matches_exact_within_2pct(ray_session):
    """The distributed approx profiler lands within 2% of the exact
    (oracle-gated) profile on every column, with identical row/null
    counts — the sketch only replaces the distinct exchange."""
    exact = corpus.profile_documents(SF)
    est = corpus.profile_documents(SF, approx=True)
    m = exact.merge(est, on="col_name", suffixes=("", "_hll"))
    pd.testing.assert_series_equal(m["n_rows"], m["n_rows_hll"],
                                   check_names=False)
    pd.testing.assert_series_equal(m["n_null"], m["n_null_hll"],
                                   check_names=False)
    rel = (m["n_distinct_hll"] - m["n_distinct"]).abs() / m["n_distinct"]
    assert (rel <= 0.02).all(), m


def test_profile_exact_bucket_invariance(ray_session):
    """The exact distinct count is invariant to the value-exchange bucket
    count — every (column, value) pair lands in exactly one bucket."""
    a = corpus.profile_documents(SF, num_buckets=3)
    b = corpus.profile_documents(SF, num_buckets=64)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# KLL float-quantile sketch
# ---------------------------------------------------------------------------

from horizon_etl_ray.functions.sketches import KllSketch, approx_quantiles


def _rank_err(data_sorted, est, q):
    """|true rank of the estimate - target rank| / n."""
    n = len(data_sorted)
    target = max(int(np.ceil(q * n)), 1)
    true = int(np.searchsorted(data_sorted, est, side="right"))
    return abs(true - target) / n


def test_kll_rank_error_uniform_and_skewed():
    """Estimated quantiles land within 3% rank error (k=200 ⇒ ε≈1%,
    asserted with margin) on uniform AND heavily skewed data — value-space
    closeness would be trivial on uniform, rank error is the real metric."""
    rng = np.random.default_rng(42)
    for data in (rng.uniform(0, 1, 100_000),
                 rng.lognormal(0.0, 3.0, 100_000)):
        sk = KllSketch(k=200).update_many(data)
        srt = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            assert _rank_err(srt, sk.quantile(q), q) < 0.03, q


def test_kll_merge_matches_single_stream_bound():
    """Partials over 23 arbitrary splits merge to estimates inside the same
    rank-error bound as one sketch over the whole stream — the property
    that makes per-block partials + driver fold correct."""
    rng = np.random.default_rng(7)
    data = rng.normal(10.0, 4.0, 120_000)
    merged = KllSketch(k=200)
    for i, chunk in enumerate(np.array_split(data, 23)):
        merged.merge(KllSketch(k=200, seed=i).update_many(chunk))
    assert merged.n == len(data)
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.95):
        assert _rank_err(srt, merged.quantile(q), q) < 0.03, q


def test_kll_deterministic_and_serializable():
    """Same input order → identical estimates; sketches survive the
    to_bytes/from_bytes task boundary unchanged."""
    data = np.random.default_rng(1).uniform(0, 1, 30_000)
    a = KllSketch(k=128).update_many(data)
    b = KllSketch(k=128).update_many(data)
    assert a.quantile(0.5) == b.quantile(0.5)
    c = KllSketch.from_bytes(a.to_bytes())
    assert c.n == a.n and c.quantile(0.9) == a.quantile(0.9)


def test_kll_nan_and_empty():
    sk = KllSketch()
    import pytest as _pt
    with _pt.raises(ValueError):
        sk.quantile(0.5)
    sk.update_many(np.array([np.nan, 1.0, np.nan, 3.0]))
    assert sk.n == 2 and sk.quantile(1.0) == 3.0


def test_approx_quantiles_grouped_dataset(ray_session):
    """Distributed per-language quality quantiles via KLL partials track
    the exact per-group quantiles within 5% rank error at corpus scale
    (small groups are near-exact: the sketch never compacts under k)."""
    import ray.data as rd

    from horizon_etl_ray.functions import text as tx

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "lang"])
    q = np.round(tx.quality_score(tx.quality_features(docs["text"])), 6)
    scored = pd.DataFrame({"lang": docs["lang"], "quality": q})
    got = approx_quantiles(rd.from_pandas(scored).repartition(9),
                           "quality", {"p50": 0.5, "p90": 0.9},
                           group_column="lang")
    for lang, g in scored.groupby("lang"):
        srt = np.sort(g["quality"].to_numpy())
        for name, frac in (("p50", 0.5), ("p90", 0.9)):
            assert _rank_err(srt, got[lang][name], frac) <= 0.05, (lang, name)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

from horizon_etl_ray.functions.sketches import (approx_heavy_hitters,
                                                mg_merge, mg_partial)


def _zipf_stream(n, rng):
    """Skewed item stream: a handful of heavy items over a long tail."""
    return np.where(rng.random(n) < 0.5,
                    rng.integers(0, 10, n),          # heavy items
                    rng.integers(10, 20_000, n))     # long tail


def test_mg_guarantees_on_merged_partials():
    """Deterministic MG bounds after an arbitrary 17-way merge: every item
    with true count > n/(k+1) is present, every reported count is a lower
    bound, and the truth sits inside [count, count + err]."""
    rng = np.random.default_rng(3)
    data = _zipf_stream(200_000, rng)
    k = 64
    acc = None
    for chunk in np.array_split(data, 17):
        p = mg_partial(chunk, k)
        acc = p if acc is None else mg_merge(acc, p, k)
    counters, n, err = acc
    assert n == len(data) and err <= n // (k + 1) + k  # prune budget
    true = pd.Series(data).value_counts()
    for item, c in counters.items():
        t = int(true.get(item, 0))
        assert c <= t <= c + err, (item, c, t, err)
    for item, t in true.items():
        if t > n / (k + 1):
            assert item in counters, (item, t)


def test_mg_partial_exact_when_under_k():
    """A block with ≤ k distinct items is summarized EXACTLY (err 0)."""
    counters, n, err = mg_partial(np.array([1, 1, 2, 3, 3, 3]), k=8)
    assert err == 0 and n == 6
    assert counters == {1: 2, 2: 1, 3: 3}


def test_approx_heavy_hitters_dataset_tokens(ray_session):
    """Distributed heavy hitters over exploded document tokens: the
    guaranteed-present set covers every token the exact count ranks above
    n/(k+1), and all reported intervals contain the exact counts."""
    import ray.data as rd

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])

    def explode(texts):
        return np.concatenate([t.split(" ") for t in texts])

    out = approx_heavy_hitters(
        rd.from_pandas(docs).repartition(7), "text", k=128, explode=explode)
    exact = pd.Series(explode(docs["text"].to_numpy())).value_counts()
    n = int(exact.sum())
    got = dict(zip(out["item"], zip(out["count_min"], out["count_max"])))
    for tok, t in exact.items():
        if t > n / 129:
            assert tok in got, tok
    for tok, (lo, hi) in got.items():
        assert lo <= int(exact.get(tok, 0)) <= hi, tok


def test_approx_distinct_wrapper(ray_session):
    """The single-column distributed wrapper tracks exact nunique within
    2% on int and string columns (and tolerates empty blocks)."""
    import ray.data as rd

    from horizon_etl_ray.functions.sketches import approx_distinct

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    ds = rd.from_pandas(docs).repartition(11)
    for col in ("doc_id", "source"):
        est = approx_distinct(ds, col)
        exact = docs[col].nunique()
        assert abs(est - exact) / exact <= 0.02, (col, est, exact)


# ---------------------------------------------------------------------------
# hypothesis: the sketch algebra under ARBITRARY stream splits
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

ids_strategy = st.lists(st.integers(-10_000, 10_000), min_size=1,
                        max_size=400)


@settings(max_examples=40, deadline=None)
@given(ids_strategy, st.integers(1, 7))
def test_hll_split_invariance_property(ids, n_parts):
    """For ANY id multiset and ANY split, merged HLL partials equal the
    whole-stream sketch exactly (registers are max)."""
    ids = np.asarray(ids, dtype=np.int64)
    whole = _regs(ids)
    merged = np.zeros_like(whole)
    for part in np.array_split(ids, n_parts):
        merged = sk.hll_merge(merged, _regs(part))
    np.testing.assert_array_equal(whole, merged)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=500),
       st.integers(1, 4), st.sampled_from([2, 8, 64]))
def test_mg_bounds_property(items, n_parts, k):
    """For ANY item stream, ANY split and ANY k: counts are lower bounds,
    truth ∈ [count, count+err], err within the prune budget, and every
    item above n/(k+1) survives the merge."""
    arr = np.asarray(items, dtype=np.int64)
    acc = None
    for part in np.array_split(arr, n_parts):
        if len(part) == 0:
            continue
        p = mg_partial(part, k)
        acc = p if acc is None else mg_merge(acc, p, k)
    counters, n, err = acc
    assert n == len(arr)
    true = pd.Series(arr).value_counts()
    for item, c in counters.items():
        assert c <= int(true[item]) <= c + err
    for item, t in true.items():
        if t > n / (k + 1):
            assert item in counters


def test_profile_null_handling_both_paths(ray_session, tmp_path):
    """Null semantics on a table that actually has them (documents does
    not): n_null counts per column, and nulls are EXCLUDED from distinct
    (SQL count(DISTINCT) semantics) in both the exact exchange and the
    HLL path."""
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [None if i % 4 == 0 else f"t{i % 7}" for i in range(40)],
        "lang": [None if i == 3 else "en" for i in range(40)],
        "source": ["s"] * 40,
        "n_chars": np.where(np.arange(40) % 2 == 0, 5, 9).astype(np.int64),
    })
    pq.write_table(pa_table := __import__("pyarrow").Table.from_pandas(
        df, preserve_index=False), f"{tmp_path}/documents.parquet")
    out = corpus.profile_documents(str(tmp_path)).set_index("col_name")
    assert out.loc["text", "n_null"] == 10
    assert out.loc["text", "n_distinct"] == 7      # t0..t6, null excluded
    assert out.loc["lang", "n_null"] == 1
    assert out.loc["lang", "n_distinct"] == 1
    assert out.loc["n_chars", "n_distinct"] == 2
    est = corpus.profile_documents(str(tmp_path),
                                   approx=True).set_index("col_name")
    pd.testing.assert_frame_equal(out, est)  # tiny cardinalities: HLL exact


def test_kll_rank_error_measures_distance_to_tie_interval():
    """A value carrying a fat tie occupies a rank INTERVAL; the bounds row
    must measure the estimate's error as distance to that interval — the
    upper endpoint alone would flag a perfectly correct p50 on a >5%-mass
    value as a bound violation (spurious red gate)."""
    import numpy as np

    from horizon_etl_ray.pipelines.corpus import _rank_interval_err

    vals = np.array([1.0, 5.0, 9.0])
    cum = np.array([40, 60, 100])  # value 5 spans ranks 41..60 (20% mass)
    err, lo, hi = _rank_interval_err(vals, cum, 5.0, 50)
    assert (err, lo, hi) == (0, 41, 60)  # exact p50 IS 5 → zero error
    err2, lo2, hi2 = _rank_interval_err(vals, cum, 1.0, 50)
    assert (err2, lo2, hi2) == (10, 1, 40)  # distance to [1, 40]
    err3, lo3, hi3 = _rank_interval_err(vals, cum, 0.5, 1)  # below all
    assert (err3, lo3, hi3) == (1, 0, 0)
    err4, *_ = _rank_interval_err(vals, cum, 9.0, 100)
    assert err4 == 0
