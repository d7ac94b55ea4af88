"""Distributed Bloom filter: zero false negatives, bounded false positives."""

import numpy as np
import pandas as pd

from horizon_etl_ray.functions.bloom import bloom_contains, build_bloom


def test_bloom_membership_and_fp_rate():
    import ray.data as rd

    keys = np.arange(0, 200_000, 2, dtype=np.int64)  # 100k even keys
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    bloom = build_bloom(ds, "k", num_bits=1 << 21, num_hashes=5)

    # no false negatives
    assert bloom_contains(bloom, keys).all()
    # false-positive rate on disjoint (odd) keys stays small
    probe = np.arange(1, 200_001, 2, dtype=np.int64)
    fp = bloom_contains(bloom, probe).mean()
    assert fp < 0.02, fp
