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
