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


def test_asof_join_exact_above_2_53(ray_session, tmp_path):
    """Int64 ids far above 2^53 must round-trip the as-of co-shuffle exactly
    (the old float64 value carry collapsed adjacent huge ids)."""
    import pyarrow as pa
    import ray.data as rd

    B = 2**60
    # two purchases with ids B+1 / B+3 — indistinguishable in float64
    left = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([100, 200], pa.int64()),
        "event_id": pa.array([B + 1, B + 3], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([50, 150, 10], pa.int64()),
        "prior_click_id": pa.array([B + 5, B + 7, B + 9], pa.int64()),
    }))
    from horizon_etl_ray.functions.asof import asof_join

    out = asof_join(left, right, by="user_id", on="ts",
                    left_value_columns=["event_id"],
                    right_value_columns=["prior_click_id"]).to_pandas()
    out = out.sort_values("ts").reset_index(drop=True)
    assert out["event_id"].tolist() == [B + 1, B + 3]
    assert out["prior_click_id"].tolist() == [B + 5, B + 7]
    assert out["event_id"].dtype == np.int64


def test_range_join_exact_above_2_53(ray_session, tmp_path):
    """Order keys above 2^53 must survive the banded-range-join union
    exactly (native int64 carry, no NaN sentinel)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    B = 2**60
    d = tmp_path / "sf"
    d.mkdir()
    day = np.datetime64("2024-01-01", "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([B + 1, B + 3], pa.int64()),
        "o_orderdate": pa.array([day, day + np.timedelta64(30, "D")]),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "l_shipdate": pa.array([day + np.timedelta64(2, "D"),
                                day + np.timedelta64(3, "D"),
                                day + np.timedelta64(31, "D")]),
    }), str(d / "lineitem.parquet"))
    from horizon_etl_ray.pipelines.analytics import range_join_ship_activity

    out = range_join_ship_activity(str(d))
    assert out["o_orderkey"].tolist() == [B + 1, B + 3]
    assert out["n_shipped"].tolist() == [2, 1]


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


def test_repoint_links_unit(ray_session):
    """Link-table repoint kernel: losers rewrite to winners, unmapped ids
    (incl. winners and foreign keys outside the mapping) pass through,
    multiple FK columns rewrite independently, empty mapping is identity."""
    import pyarrow as pa
    import ray.data as rd

    from horizon_etl_ray.pipelines.analytics import repoint_links

    t = pa.table({
        "a": pa.array([1, 2, 3, 99, 5], pa.int64()),
        "b": pa.array([2, 2, 1, 1, 42], pa.int64()),
        "payload": ["p", "q", "r", "s", "t"],
    })
    mapping = {2: 1, 3: 1, 5: 4}
    out = repoint_links(rd.from_arrow(t), mapping, ["a", "b"]).to_pandas()
    assert out["a"].tolist() == [1, 1, 1, 99, 4]
    assert out["b"].tolist() == [1, 1, 1, 1, 42]
    assert out["payload"].tolist() == ["p", "q", "r", "s", "t"]
    # empty mapping: identity
    same = repoint_links(rd.from_arrow(t), {}, ["a"]).to_pandas()
    assert same["a"].tolist() == [1, 2, 3, 99, 5]
