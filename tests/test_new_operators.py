"""Oracle cross-checks for the resolution/consolidation/graph/join operators
(SURVEY §2 rows T6/J7, O4/D4, A8, A5/O2, J6-large): run each Ray pipeline at
sf0.001 and diff row-for-row against its DuckDB oracle_sql() twin — the same
comparison the driver's correctness gate performs at sf0.01."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "weighted_vote_resolution",
    "consolidate_winners",
    "evidence_flags",
    "graph_degree_stats",
    "dist_join_priority_revenue",
    "supplier_cograph",
    "asof_purchase_attribution",
    "range_join_ship_activity",
    "events_sliding_window",
    "sessionize_events",
    "topk_per_group",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_duckdb_oracle(ray_session, con, name):
    ray_df = entrymod.queries()[name](SF)
    if hasattr(ray_df, "to_pandas"):
        ray_df = ray_df.to_pandas()
    oracle_df = con.execute(entrymod.oracle_sql()[name]).df()
    a, b = _canon(ray_df), _canon(oracle_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_q3_bloom_path_matches_exact_path():
    """Forcing the bloom+join plan (threshold 0) must reproduce the exact
    broadcast plan's top-10 (bloom FPs removed by the aggregate-level
    Dataset.join)."""
    import pandas as pd

    from horizon_etl_ray.pipelines.analytics import q3_top_orders

    sf = "/root/testdata/sf0.001"
    fast = q3_top_orders(sf)
    bloom = q3_top_orders(sf, bloom_threshold=0)
    pd.testing.assert_frame_equal(fast, bloom)
