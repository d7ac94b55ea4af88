"""Driver-table runs of the full CDC engine (engine_queries module):
4-epoch incremental replay, schema evolution, lineage readback — all are
oracle-checked by the driver at sf0.01; here we assert the engine-visible
invariants at sf0.001 (cheap)."""

import numpy as np

from horizon_etl_ray.pipelines import engine_queries as eq

SF = "/root/testdata/sf0.001"


def test_lineitem_epochs_replay_live_rows_match_lineage():
    out = eq.cdc_replay_lineitem_epochs(SF)
    lineage = eq.cdc_epoch_lineage_lineitem(SF)
    # final cumulative live rows == surviving lake rows
    assert int(lineage.iloc[-1]["live_rows"]) == len(out)
    # per-row sha invariant: 64-hex sha256 present on every row
    assert out["content_sha256"].str.len().eq(64).all()
    # keys unique after LWW
    assert not out.duplicated(subset=["l_partkey", "l_suppkey"]).any()


def test_lineitem_evolved_schema_and_sentinels():
    out = eq.cdc_replay_lineitem_evolved(SF)
    assert list(out.columns) == ["l_partkey", "l_suppkey", "status_flag",
                                 "size_bytes", "content_sha256"]
    # the rename landed (status_flag values are returnflag chars)
    assert set(out["status_flag"].unique()) <= {"A", "N", "R"}
    # both null-filled (-1, pre-epoch-2 winners) and carried sizes exist
    assert (out["size_bytes"] == -1).any()
    assert (out["size_bytes"] > 0).any()
    assert out["size_bytes"].dtype == np.int64


def test_lineage_monotone_epochs():
    lineage = eq.cdc_epoch_lineage_lineitem(SF)
    assert list(lineage["epoch"]) == sorted(lineage["epoch"])
    assert (lineage["live_rows"] > 0).all()


def test_widen_policy_incremental_equals_bulk(tmp_path):
    """The merge-policy contract (associative/commutative/idempotent) must
    make per-epoch application converge to the bulk result."""
    import pandas as pd
    import pytest

    from horizon_etl_ray.pipelines import engine_queries as eqm
    from horizon_etl_ray.pipelines.cdc import CdcConfig, read_lake, replay
    from horizon_etl_ray.state.merge_policy import WidenOnlyPolicy

    events_dir = str(tmp_path / "events")
    eqm._lineitem_events(SF, with_quantity=True).write_parquet(
        events_dir, partition_cols=["epoch"])
    keys = ("l_partkey", "l_suppkey")

    def run(mode, lake):
        cfg = CdcConfig(key_columns=keys, num_partitions=8,
                        merge_policy=WidenOnlyPolicy(
                            key_columns=keys, widen_columns=("l_quantity",)))
        replay(events_dir, str(tmp_path / lake), cfg, mode=mode)
        out = (read_lake(str(tmp_path / lake))
               .select_columns(["l_partkey", "l_suppkey", "seq",
                                "l_quantity", "l_quantity_min",
                                "l_quantity_max"]).to_pandas())
        return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)

    bulk = run("bulk", "bulk")
    inc = run("incremental", "inc")
    pd.testing.assert_frame_equal(bulk, inc)
    # aggregates genuinely widen beyond the winner value somewhere
    assert (bulk["l_quantity_min"] < bulk["l_quantity"]).any()
    assert (bulk["l_quantity_max"] > bulk["l_quantity"]).any()

    # delta mode composes with the policy: the narrow index carries the
    # policy's aggregate columns (index_columns()) and re-reduces per epoch —
    # merged read must equal the cow/bulk result exactly
    pol = WidenOnlyPolicy(key_columns=keys, widen_columns=("l_quantity",))
    cfg_d = CdcConfig(key_columns=keys, num_partitions=8, write_mode="delta",
                      merge_policy=pol)
    replay(events_dir, str(tmp_path / "delta"), cfg_d, mode="incremental")
    from horizon_etl_ray.state.manifest import ManifestStore

    m = ManifestStore(str(tmp_path / "delta")).load()
    assert any(ps.delta_epochs for ps in m.partitions.values())
    delta = (read_lake(str(tmp_path / "delta"), cfg=cfg_d)
             .select_columns(["l_partkey", "l_suppkey", "seq", "l_quantity",
                              "l_quantity_min", "l_quantity_max"]).to_pandas()
             .sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(bulk, delta)

    # a policy WITHOUT index_columns() still refuses delta mode up front
    class BarePolicy:
        def reduce(self, t):
            return t

    with pytest.raises(ValueError, match="index_columns"):
        cfg_bad = CdcConfig(key_columns=keys, num_partitions=8,
                            write_mode="delta", merge_policy=BarePolicy())
        replay(events_dir, str(tmp_path / "bad"), cfg_bad, mode="bulk")
