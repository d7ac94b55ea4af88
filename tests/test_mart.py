"""Incremental mart maintenance (pipelines/mart.py): the maintained mart is
always equal to re-aggregating the lake state at the refreshed epoch —
inserts/deletes/group-moving updates, null groups, noop windows, and the
negative-rows inconsistency guard. Reference analog: the regenerate-from-
scratch mart flows of /root/reference/src/flows/exports/
initiatives_analytics_mart.py:11-37, made O(changes) via the change feed."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import CdcConfig, apply_epoch, replay
from horizon_etl_ray.pipelines.mart import (
    MartSpec,
    build_mart,
    mart_state,
    read_mart,
    refresh_mart,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(path, seq, op, grp, val):
    return {"repo": "r", "path": path, "seq": seq, "op": op,
            "content": f"{grp}|{val}", "grp": grp, "val": val}


CFG = CdcConfig(num_partitions=4,
                payload_columns=("repo", "path", "content", "grp", "val"))
SPEC = MartSpec(group_by=("grp",), sum_metrics={"sum_val": "val"})


def _mart_df(mart_dir, by="grp"):
    return (read_mart(mart_dir).to_pandas()
            .sort_values(by).reset_index(drop=True))


@pytest.fixture()
def lake(tmp_path):
    lake = str(tmp_path / "lake")
    apply_epoch(_ev([_row("A", 1, "update", "x", 10),
                     _row("B", 2, "update", "x", 20),
                     _row("C", 3, "update", "y", 5),
                     _row("N", 4, "update", None, 7)]), lake, 1, CFG)
    return lake


def test_incremental_equals_full_rebuild(lake, tmp_path):
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=CFG)
    # epoch 2: insert into y, delete from x, group-moving update x→y,
    # value-only update, and a null-group insert
    apply_epoch(_ev([_row("D", 10, "update", "y", 100),
                     _row("B", 11, "delete", None, None),
                     _row("A", 12, "update", "y", 10),
                     _row("C", 13, "update", "y", 6),
                     _row("M", 14, "update", None, 3)]), lake, 2, CFG)
    st = refresh_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 2

    rebuilt = str(tmp_path / "rebuilt")
    build_mart(lake, rebuilt, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt))
    by = _mart_df(mart).set_index("grp")
    assert "x" not in by.index  # x emptied out entirely → group dropped
    assert by.loc["y", "n_rows"] == 3 and by.loc["y", "sum_val"] == 116


def test_multi_epoch_window_and_noop(lake, tmp_path):
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=CFG)
    apply_epoch(_ev([_row("E", 20, "update", "z", 1)]), lake, 2, CFG)
    apply_epoch(_ev([_row("E", 30, "update", "z", 2),
                     _row("A", 31, "delete", None, None)]), lake, 3, CFG)
    st = refresh_mart(lake, mart, cfg=CFG)  # one feed over (1, 3]
    assert st["mode"] == "incremental" and st["epoch"] == 3
    assert refresh_mart(lake, mart, cfg=CFG)["mode"] == "noop"
    rebuilt = str(tmp_path / "rebuilt")
    build_mart(lake, rebuilt, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt))


def test_build_at_epoch_then_refresh_forward(tmp_path):
    """Bootstrap from time travel mid-history, then catch up via the feed —
    against a generator run with real deletes and re-asserts."""
    gen = EventGenConfig(n_keys=120, n_events=2000, seed=7, epoch_size=500,
                         p_delete=0.25, content_mean_bytes=48)
    events, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, events)
    cfg = CdcConfig(num_partitions=8)
    replay(events, lake, cfg, mode="incremental")
    final = ManifestStore(lake).committed_epoch()
    assert final >= 2
    spec = MartSpec(group_by=("repo",), sum_metrics={})
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, spec, cfg=cfg, at_epoch=1)
    assert mart_state(mart)["epoch"] == 1
    st = refresh_mart(lake, mart, cfg=cfg)
    assert st["mode"] == "incremental" and st["epoch"] == final
    rebuilt = str(tmp_path / "rebuilt")
    build_mart(lake, rebuilt, spec, cfg=cfg)
    pd.testing.assert_frame_equal(_mart_df(mart, by="repo"),
                                  _mart_df(rebuilt, by="repo"))


def test_inconsistent_mart_raises(lake, tmp_path):
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=CFG)
    # sabotage: rewind the recorded epoch so the same deletes replay twice
    apply_epoch(_ev([_row("A", 10, "delete", None, None),
                     _row("B", 11, "delete", None, None)]), lake, 2, CFG)
    refresh_mart(lake, mart, cfg=CFG)
    import json, os
    sp = os.path.join(mart, "mart.json")
    with open(sp) as fh:
        state = json.load(fh)
    state["epoch"] = 1
    with open(sp, "w") as fh:
        json.dump(state, fh)
    with pytest.raises(ValueError, match="negative row"):
        refresh_mart(lake, mart, cfg=CFG)


def test_crashed_commit_never_double_applies(lake, tmp_path):
    """A crash between the data-file write and the json pointer swap must
    leave the previous consistent (table, epoch) pair — the next refresh
    re-derives the new state from the pointer's epoch, not the orphan."""
    import os

    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=CFG)
    apply_epoch(_ev([_row("Z", 10, "update", "y", 9)]), lake, 2, CFG)
    # simulate the torn write: an epoch-2 data file exists, pointer still @1
    orphan = os.path.join(mart, "mart_e2.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"torn")
    st = refresh_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 2
    assert not os.path.exists(orphan) or \
        mart_state(mart)["data_file"] == "mart_e2.parquet"
    rebuilt = str(tmp_path / "rebuilt")
    build_mart(lake, rebuilt, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt))


def test_refresh_without_bootstrap_raises(lake, tmp_path):
    with pytest.raises(FileNotFoundError, match="build_mart"):
        refresh_mart(lake, str(tmp_path / "nope"), cfg=CFG)


def test_build_at_epoch_clamped_to_committed(lake, tmp_path):
    """at_epoch beyond the committed epoch must be clamped BEFORE being
    recorded: read_lake_at silently clamps its read, so an unclamped label
    would mark the epoch-1 aggregate as epoch-99 and every refresh until
    the lake reaches 99 would noop on stale data with no error."""
    mart = str(tmp_path / "mart")
    st = build_mart(lake, mart, SPEC, cfg=CFG, at_epoch=99)
    assert st["epoch"] == 1 and mart_state(mart)["epoch"] == 1
    apply_epoch(_ev([_row("Z", 10, "update", "x", 1)]), lake, 2, CFG)
    st2 = refresh_mart(lake, mart, cfg=CFG)
    assert st2["mode"] == "incremental" and st2["epoch"] == 2
    full = str(tmp_path / "full")
    build_mart(lake, full, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(full))


def test_refresh_over_empty_epoch_window_advances_pointer(lake, tmp_path):
    """A window of empty commits (zero-event micro-batches) must advance
    the mart pointer as a zero-delta incremental refresh, not crash —
    otherwise a mart behind an idle tail stalls forever."""
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=CFG)
    before = _mart_df(mart)
    empty = pa.Table.from_pylist(
        [_row("Z", 99, "update", "x", 1)]).slice(0, 0)
    apply_epoch(rd.from_arrow(empty), lake, 2, CFG)
    st = refresh_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 2
    assert st["feed_rows"] == 0
    pd.testing.assert_frame_equal(_mart_df(mart), before)
    assert mart_state(mart)["epoch"] == 2


def test_mart_over_lake_with_vector_payload(tmp_path):
    """A mart on scalar dimensions of a lake that ALSO carries a vector
    payload column: the build and the feed-driven refresh must prune to
    the group/metric columns (ragged list columns are rejected by Ray's
    pandas conversion and have no business riding a mart refresh)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=4,
                    payload_columns=("repo", "path", "content", "grp",
                                     "val", "emb"))

    def r(path, seq, op, grp, val, emb):
        return {"repo": "r", "path": path, "seq": seq, "op": op,
                "content": f"{grp}|{val}", "grp": grp, "val": val,
                "emb": emb}

    apply_epoch(_ev([r("A", 1, "update", "x", 10, [1.0, 2.0]),
                     r("B", 2, "update", "y", 5, None)]), lake, 1, cfg)
    mart = str(tmp_path / "mart")
    build_mart(lake, mart, SPEC, cfg=cfg)
    apply_epoch(_ev([r("A", 10, "update", "x", 11, [9.0]),  # val + emb
                     r("C", 11, "update", "y", 1, [1.0, 2.0, 3.0])]),
                lake, 2, cfg)
    st = refresh_mart(lake, mart, cfg=cfg)
    assert st["mode"] == "incremental" and st["epoch"] == 2
    full = str(tmp_path / "full")
    build_mart(lake, full, SPEC, cfg=cfg)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(full))
