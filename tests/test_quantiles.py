"""Exact histogram-combine quantiles vs a direct sorted-rank oracle,
including the rank-convention edges (q→rank max(ceil(q·n),1))."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from horizon_etl_ray.functions.quantiles import group_quantiles_histogram

QS = {"p0": 0.0, "p25": 0.25, "p50": 0.5, "p90": 0.9, "p100": 1.0}


def _oracle(vals, q):
    s = sorted(vals)
    return s[max(math.ceil(q * len(s)), 1) - 1]


def _run(df):
    out = group_quantiles_histogram(
        rd.from_pandas(df), value_column="v", group_column="g", qs=QS
    ).to_pandas().sort_values("g").reset_index(drop=True)
    return out


def test_randomized_groups_match_rank_oracle():
    rng = np.random.default_rng(11)
    frames = []
    for g, size in (("a", 1), ("b", 2), ("c", 97), ("d", 1000)):
        frames.append(pd.DataFrame(
            {"g": g, "v": rng.integers(0, 50, size=size)}))
    df = pd.concat(frames, ignore_index=True)
    out = _run(df)
    for _, row in out.iterrows():
        vals = df[df["g"] == row["g"]]["v"].to_list()
        assert row["n"] == len(vals)
        for name, q in QS.items():
            assert row[name] == _oracle(vals, q), (row["g"], name)


def test_ties_and_constant_groups():
    df = pd.DataFrame({"g": ["x"] * 6 + ["y"] * 4,
                       "v": [7, 7, 7, 7, 7, 7, 1, 1, 9, 9]})
    out = _run(df)
    x = out[out["g"] == "x"].iloc[0]
    assert (x["p0"], x["p50"], x["p100"]) == (7, 7, 7)
    y = out[out["g"] == "y"].iloc[0]
    # n=4: ranks for (0, .25, .5, .9, 1) → (1, 1, 2, 4, 4)
    assert (y["p0"], y["p25"], y["p50"], y["p90"], y["p100"]) == \
        (1, 1, 1, 9, 9)


def test_partials_merge_across_arbitrary_block_splits():
    # the histogram partial is mergeable: the result must be invariant to
    # how rows are split into blocks (each block contributes one partial)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], size=500),
                       "v": rng.integers(0, 30, size=500)})
    want = None
    for nblocks in (1, 3, 7, 16):
        out = group_quantiles_histogram(
            rd.from_pandas(df).repartition(nblocks),
            value_column="v", group_column="g", qs=QS,
        ).to_pandas().sort_values("g").reset_index(drop=True)
        if want is None:
            want = out
        else:
            pd.testing.assert_frame_equal(out, want)
