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
