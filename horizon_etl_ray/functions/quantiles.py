"""Exact distributed quantiles over integer-valued columns — no global
sort, no sampling, no approximation.

The classic scale problem: percentiles normally need a full sort (an
all-to-all shuffle of EVERY row) or an approximate sketch (t-digest /
GK — mergeable but inexact). For integer-domain values (token counts,
sizes, degrees, latencies in ms) there is an exact mergeable summary: the
value histogram. Per-block partials count (group, value) occurrences —
the combiner, same discipline as the CDC LWW combiner — and the exchange
then carries only DISTINCT (group, value, count) rows, O(groups ×
distinct values), independent of row count. Rank selection on the merged
cumulative histogram is exact.

Quantile convention (matches the SQL twin exactly): the q-quantile of n
values is the r-th smallest with ``r = max(ceil(q·n), 1)`` — the inverse
CDF / "lower" discrete quantile, which is also what DuckDB's
``quantile_disc`` computes (probed: n=5 q∈{0,.25,.5,.9,1} → ranks
1,2,3,5,5). The oracle spells the rank arithmetic out with
``row_number`` + ``ceil`` rather than relying on ``quantile_disc``
internals, so both sides share the same IEEE double multiply."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def group_quantiles_histogram(ds, value_column: str, group_column: str,
                              qs: dict[str, float], num_buckets: int = 32):
    """Exact per-group quantiles of an integer column via mergeable
    histogram partials. Returns a Dataset with one row per group:
    ``(group_column, n, <one column per qs key>)``.

    qs: output-column-name → quantile fraction, e.g.
    ``{"p50": 0.5, "p90": 0.9, "p99": 0.99}``.

    Two-level reduce, both mergeable: per-block partials are first summed
    in a coarse-bucket exchange keyed on ``value % num_buckets`` so the
    second exchange carries GLOBALLY distinct (group, value) rows — without
    this, the per-group finish task would receive one partial row per
    (block, value) pair, i.e. O(block count) rows in a single task at
    10^6-block scale. With it, finish sees O(distinct values) regardless
    of corpus size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby([group_column, value_column], sort=False)
             .size().reset_index(name="_cnt"))
        g["_cnt"] = g["_cnt"].astype(np.int64)
        g["_qb"] = (g[value_column].to_numpy(dtype=np.int64)
                    % np.int64(num_buckets))
        return g

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([group_column, value_column], sort=False)["_cnt"]
               .sum().reset_index())
        out["_cnt"] = out["_cnt"].astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(value_column)["_cnt"].sum().sort_index()
        values = agg.index.to_numpy(dtype=np.int64)
        cum = agg.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        row: dict[str, object] = {group_column: g[group_column].iloc[0],
                                  "n": np.int64(n)}
        for name, q in qs.items():
            rank = max(math.ceil(q * n), 1)
            row[name] = values[int(np.searchsorted(cum, rank))]
        return pd.DataFrame([row])

    merged = (ds.map_batches(partial, batch_format="pandas")  # pandas: per-block value-count partial
              .groupby("_qb").map_groups(merge_counts,
                                         batch_format="pandas"))  # pandas: per-bucket count merge
    return merged.groupby(group_column).map_groups(
        finish, batch_format="pandas")  # pandas: rank-arithmetic finish
