"""Partition-partial marts (pipelines/mart.py): non-additive aggregates
(min/max) maintained in O(touched partitions). The maintained mart is always
equal to a full rebuild at the refreshed epoch — including deletes that evict
the row holding a group's current min/max (the case no feed-folded mart can
get right) — and a refresh provably never opens the data files of partitions
the epoch window didn't rewrite. Reference analog: the regenerate-everything
mart flows (/root/reference/src/flows/exports/initiatives_analytics_mart.py:
11-37), made O(changed partitions) for the non-additive aggregates the
additive MartSpec refuses."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import CdcConfig, apply_epoch, replay
from horizon_etl_ray.pipelines.mart import (
    MartSpec,
    PartitionedMartSpec,
    build_mart,
    build_partitioned_mart,
    mart_state,
    read_mart,
    read_partitioned_mart,
    refresh_mart,
    refresh_partitioned_mart,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(path, seq, op, grp, val):
    return {"repo": "r", "path": path, "seq": seq, "op": op,
            "content": f"{grp}|{val}", "grp": grp, "val": val}


CFG = CdcConfig(num_partitions=8,
                payload_columns=("repo", "path", "content", "grp", "val"))
SPEC = PartitionedMartSpec(
    group_by=("grp",),
    metrics={"min_val": ("min", "val"), "max_val": ("max", "val"),
             "sum_val": ("sum", "val")})


def _mart_df(mart_dir, by="grp"):
    return (read_partitioned_mart(mart_dir).to_pandas()
            .sort_values(by).reset_index(drop=True))


@pytest.fixture()
def lake(tmp_path):
    lake = str(tmp_path / "lake")
    apply_epoch(_ev([_row("A", 1, "update", "x", 10),
                     _row("B", 2, "update", "x", 20),
                     _row("C", 3, "update", "y", 5),
                     _row("D", 4, "update", "y", 50),
                     _row("N", 5, "update", None, 7)]), lake, 1, CFG)
    return lake


def test_min_evicted_by_delete_equals_full_rebuild(lake, tmp_path):
    """Delete the row holding x's min and y's max, move a row between
    groups, and insert fresh extremes — the refreshed mart must equal a
    from-scratch build (feed-folded marts cannot do this; that's the whole
    point of per-partition partials)."""
    mart = str(tmp_path / "mart")
    st = build_partitioned_mart(lake, mart, SPEC, cfg=CFG)
    assert st["mode"] == "full" and st["epoch"] == 1
    before = _mart_df(mart).set_index("grp")
    assert before.loc["x", "min_val"] == 10
    assert before.loc["y", "max_val"] == 50

    apply_epoch(_ev([_row("A", 10, "delete", None, None),   # x's min gone
                     _row("D", 11, "delete", None, None),   # y's max gone
                     _row("B", 12, "update", "y", 20),      # x → y move
                     _row("E", 13, "update", "y", 2)]), lake, 2, CFG)
    st = refresh_partitioned_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 2
    assert st["touched_partitions"] >= 1

    rebuilt = str(tmp_path / "rebuilt")
    build_partitioned_mart(lake, rebuilt, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt))
    by = _mart_df(mart).set_index("grp")
    assert "x" not in by.index  # emptied out entirely → group dropped
    assert by.loc["y", "min_val"] == 2 and by.loc["y", "max_val"] == 20
    assert by.loc["y", "n_rows"] == 3 and by.loc["y", "sum_val"] == 27


def test_untouched_partition_files_never_opened(lake, tmp_path):
    """The pruning claim, enforced: corrupt every data file of partitions
    the window did NOT rewrite — the refresh must still succeed and match
    the ground-truth rebuilt while the files were intact."""
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, SPEC, cfg=CFG)
    apply_epoch(_ev([_row("A", 10, "update", "x", 11)]), lake, 2, CFG)

    store = ManifestStore(lake)
    touched = {int(d["part_id"]) for r in store.epoch_records()
               if r["epoch"] == 2 for d in r["partitions"]}
    all_pids = {int(d["part_id"]) for r in store.epoch_records()
                for d in r["partitions"]}
    untouched = all_pids - touched
    assert untouched, "need ≥1 untouched partition for this test"

    truth = str(tmp_path / "truth")
    build_partitioned_mart(lake, truth, SPEC, cfg=CFG)  # files still intact

    m = store.load()
    for pid in untouched:
        for f in store.partition_data_files(m.partitions[pid]):
            with open(f, "wb") as fh:
                fh.write(b"unreadable")

    st = refresh_partitioned_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental"
    assert st["touched_partitions"] == len(touched)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(truth))


def test_noop_and_multi_epoch_window(lake, tmp_path):
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, SPEC, cfg=CFG)
    assert refresh_partitioned_mart(lake, mart, cfg=CFG)["mode"] == "noop"
    apply_epoch(_ev([_row("E", 20, "update", "z", 1)]), lake, 2, CFG)
    apply_epoch(_ev([_row("E", 30, "update", "z", 9),
                     _row("C", 31, "delete", None, None)]), lake, 3, CFG)
    st = refresh_partitioned_mart(lake, mart, cfg=CFG)  # (1, 3] in one go
    assert st["mode"] == "incremental" and st["epoch"] == 3
    rebuilt = str(tmp_path / "rebuilt")
    build_partitioned_mart(lake, rebuilt, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt))
    assert mart_state(mart)["epoch"] == 3


def test_bootstrap_at_epoch_then_refresh_forward(tmp_path):
    """Time-travel bootstrap mid-history, then catch up — against a
    generator run with real deletes and re-asserts, on every fold."""
    gen = EventGenConfig(n_keys=120, n_events=2000, seed=11, epoch_size=500,
                         p_delete=0.25, content_mean_bytes=48)
    events, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, events)
    cfg = CdcConfig(num_partitions=8)
    replay(events, lake, cfg, mode="incremental")
    final = ManifestStore(lake).committed_epoch()
    assert final >= 2
    spec = PartitionedMartSpec(group_by=("repo",),
                               metrics={"min_seq": ("min", "seq"),
                                        "max_seq": ("max", "seq")})
    mart = str(tmp_path / "mart")
    st = build_partitioned_mart(lake, mart, spec, cfg=cfg, at_epoch=1)
    assert st["epoch"] == 1 and mart_state(mart)["epoch"] == 1
    st = refresh_partitioned_mart(lake, mart, cfg=cfg)
    assert st["mode"] == "incremental" and st["epoch"] == final
    rebuilt = str(tmp_path / "rebuilt")
    build_partitioned_mart(lake, rebuilt, spec, cfg=cfg)
    pd.testing.assert_frame_equal(_mart_df(mart, by="repo"),
                                  _mart_df(rebuilt, by="repo"))


def test_at_epoch_clamped_before_recording(lake, tmp_path):
    mart = str(tmp_path / "mart")
    st = build_partitioned_mart(lake, mart, SPEC, cfg=CFG, at_epoch=99)
    assert st["epoch"] == 1 and mart_state(mart)["epoch"] == 1
    apply_epoch(_ev([_row("Z", 10, "update", "x", 1)]), lake, 2, CFG)
    st2 = refresh_partitioned_mart(lake, mart, cfg=CFG)
    assert st2["mode"] == "incremental" and st2["epoch"] == 2
    full = str(tmp_path / "full")
    build_partitioned_mart(lake, full, SPEC, cfg=CFG)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(full))


def test_kind_guards_both_directions(lake, tmp_path):
    add_dir, part_dir = str(tmp_path / "add"), str(tmp_path / "part")
    build_mart(lake, add_dir,
               MartSpec(group_by=("grp",), sum_metrics={"sum_val": "val"}),
               cfg=CFG)
    build_partitioned_mart(lake, part_dir, SPEC, cfg=CFG)
    with pytest.raises(ValueError, match="additive"):
        read_partitioned_mart(add_dir)
    with pytest.raises(ValueError, match="partitioned"):
        read_mart(part_dir)
    with pytest.raises(ValueError, match="partitioned"):
        refresh_mart(lake, part_dir, cfg=CFG)
    with pytest.raises(ValueError, match="additive"):
        refresh_partitioned_mart(lake, add_dir, cfg=CFG)


def test_spec_validation():
    with pytest.raises(ValueError, match="unsupported func"):
        PartitionedMartSpec(group_by=("g",), metrics={"m": ("avg", "v")})
    with pytest.raises(ValueError, match="collides"):
        PartitionedMartSpec(group_by=("g",), metrics={"n_rows": ("min", "v")})


def test_refresh_without_bootstrap_raises(lake, tmp_path):
    with pytest.raises(FileNotFoundError, match="no mart"):
        refresh_partitioned_mart(lake, str(tmp_path / "nope"), cfg=CFG)


def test_refresh_across_schema_evolution(tmp_path):
    """Bootstrap BEFORE a rename-DDL epoch, refresh across it: the partial
    task conforms every partition to the CURRENT schema (same kernel as
    read_lake_at), so a mart grouped by the renamed column must stay exact
    over a window that spans the DDL."""
    import pyarrow as pa_

    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    gen = EventGenConfig(n_keys=100, n_events=1600, seed=13, epoch_size=400,
                         content_mean_bytes=64)
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, ev)
    script = SchemaScript.from_json(
        [("repo", pa_.string()), ("path", pa_.string()),
         ("commit", pa_.string()), ("lang", pa_.string()),
         ("content", pa_.string())],
        [{"epoch": 3, "op": "rename_column", "from": "lang",
          "to": "language"}],
    )
    cfg = CdcConfig(num_partitions=8, schema_script=script)
    replay(ev, lake, cfg, mode="incremental")
    final = ManifestStore(lake).committed_epoch()
    assert final >= 3

    spec = PartitionedMartSpec(group_by=("language",),
                               metrics={"min_seq": ("min", "seq"),
                                        "max_seq": ("max", "seq")})
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, spec, cfg=cfg, at_epoch=2)  # pre-DDL
    st = refresh_partitioned_mart(lake, mart, cfg=cfg)
    assert st["mode"] == "incremental" and st["epoch"] == final
    rebuilt = str(tmp_path / "rebuilt")
    build_partitioned_mart(lake, rebuilt, spec, cfg=cfg)
    pd.testing.assert_frame_equal(_mart_df(mart, by="language"),
                                  _mart_df(rebuilt, by="language"))


def test_compaction_in_window_does_not_touch_partitions(lake, tmp_path):
    """compact() lists EVERY partition in its lineage record but is
    live-state-preserving by contract — a refresh over a window containing
    a compaction must stay O(actually-changed partitions). Proven the hard
    way: corrupt every partition file except the genuinely-touched ones;
    the refresh must still succeed and match the pre-corruption truth."""
    from horizon_etl_ray.pipelines.cdc import compact

    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, SPEC, cfg=CFG)
    apply_epoch(_ev([_row("A", 10, "update", "x", 11),
                     _row("C", 11, "delete", None, None)]), lake, 2, CFG)
    store = ManifestStore(lake)
    real_touched = {int(d["part_id"]) for r in store.epoch_records()
                    if r["epoch"] == 2 for d in r["partitions"]}
    compact(lake, cfg=CFG)  # epoch 3: rewrites dirty, carries clean
    assert ManifestStore(lake).committed_epoch() == 3

    truth = str(tmp_path / "truth")
    build_partitioned_mart(lake, truth, SPEC, cfg=CFG)

    m = store.load()
    for pid, ps in m.partitions.items():
        if pid in real_touched:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "wb") as fh:
                fh.write(b"unreadable")

    st = refresh_partitioned_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 3
    assert set(range(8)) - real_touched  # the corruption was non-trivial
    assert st["touched_partitions"] == len(real_touched)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(truth))


def test_change_feed_skips_compaction_partitions(lake, tmp_path):
    """Same guarantee for the raw feed: a compaction epoch inside the
    window must not force a full-lake diff (files of partitions no real
    epoch touched stay closed) and must not invent feed rows."""
    from horizon_etl_ray.pipelines.cdc import compact, read_changes

    apply_epoch(_ev([_row("A", 10, "update", "x", 11)]), lake, 2, CFG)
    store = ManifestStore(lake)
    real_touched = {int(d["part_id"]) for r in store.epoch_records()
                    if r["epoch"] == 2 for d in r["partitions"]}
    # keep history: the feed's FROM-state still reads epoch-1 files
    compact(lake, cfg=CFG, gc_old_epochs=False)  # epoch 3

    m = store.load()
    for pid, ps in m.partitions.items():
        if pid in real_touched:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "wb") as fh:
                fh.write(b"unreadable")

    feed = read_changes(lake, 1, 3, cfg=CFG).to_pandas()
    assert list(feed["op"]) == ["update"]
    assert feed.iloc[0]["path"] == "A" and feed.iloc[0]["after_val"] == 11


def test_refresh_survives_group_going_all_null(lake, tmp_path):
    """A delete/update can leave a group whose metric values are ALL null:
    the leaf partial aggregates to NaN, which must round-trip through the
    bootstrap-recorded int64 dtype as a nullable value, not crash the
    refresh (or the serve fold)."""
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, SPEC, cfg=CFG)  # dtypes: int64
    apply_epoch(_ev([_row("A", 10, "update", "x", None),
                     _row("B", 11, "update", "x", None)]), lake, 2, CFG)
    st = refresh_partitioned_mart(lake, mart, cfg=CFG)
    assert st["mode"] == "incremental" and st["epoch"] == 2
    by = _mart_df(mart).set_index("grp")
    assert by.loc["x", "n_rows"] == 2      # rows live, metric null
    assert pd.isna(by.loc["x", "min_val"])  # SQL MIN over nulls = NULL
    rebuilt = str(tmp_path / "rebuilt")
    build_partitioned_mart(lake, rebuilt, SPEC, cfg=CFG)
    # values equal; dtype may differ (maintained mart keeps the recorded
    # int64 as nullable Int64, a rebuild records float64 from the NaN)
    pd.testing.assert_frame_equal(_mart_df(mart), _mart_df(rebuilt),
                                  check_dtype=False)


def test_empty_bootstrap_records_dtypes_from_first_data(tmp_path):
    """Bootstrapping over an empty live state must not guess dtypes: the
    first non-empty refresh records them from data, so a float metric is
    never silently truncated to a hardcoded int64."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=4,
                    payload_columns=("repo", "path", "content", "grp", "val"))

    def fr(path, seq, op, grp, val):
        return {"repo": "r", "path": path, "seq": seq, "op": op,
                "content": f"{grp}", "grp": grp, "val": val}

    apply_epoch(_ev([fr("A", 1, "delete", None, None)]), lake, 1, cfg)
    spec = PartitionedMartSpec(group_by=("grp",),
                               metrics={"min_val": ("min", "val")})
    mart = str(tmp_path / "mart")
    st = build_partitioned_mart(lake, mart, spec, cfg=cfg)
    assert st["partials"] == 0
    assert mart_state(mart)["dtypes"] == {}
    apply_epoch(_ev([fr("B", 2, "update", "x", 2.5)]), lake, 2, cfg)
    refresh_partitioned_mart(lake, mart, cfg=cfg)
    by = _mart_df(mart).set_index("grp")
    assert by.loc["x", "min_val"] == 2.5  # float preserved, not int64(2)


def test_rebuild_as_other_kind_sweeps_old_data_file(lake, tmp_path):
    d = str(tmp_path / "mart")
    build_mart(lake, d,
               MartSpec(group_by=("grp",), sum_metrics={"sum_val": "val"}),
               cfg=CFG)
    assert any(f.startswith("mart_e") for f in os.listdir(d))
    build_partitioned_mart(lake, d, SPEC, cfg=CFG)
    assert not any(f.startswith("mart_e") for f in os.listdir(d))
    build_mart(lake, d,
               MartSpec(group_by=("grp",), sum_metrics={"sum_val": "val"}),
               cfg=CFG)
    assert not any(f.startswith("partials_e") for f in os.listdir(d))


def test_bootstrap_after_gc_raises_actionably(tmp_path):
    """Time-travel bootstrap to an epoch gc() reclaimed must fail with the
    reclaimed-file message, not a raw error inside a Ray task."""
    lake = str(tmp_path / "lake")
    apply_epoch(_ev([_row("A", 1, "update", "x", 1)]), lake, 1, CFG)
    apply_epoch(_ev([_row("A", 2, "update", "x", 2)]), lake, 2, CFG)
    ManifestStore(lake).gc(keep_epochs=0)
    with pytest.raises(FileNotFoundError, match="reclaimed by gc"):
        build_partitioned_mart(lake, str(tmp_path / "m"), SPEC, cfg=CFG,
                               at_epoch=1)


def test_metric_cast_handles_unsigned_and_nulls():
    from horizon_etl_ray.pipelines.mart import _metric_cast

    s = pd.Series([1.0, None, 3.0])
    for dt, want in (("int64", "Int64"), ("uint32", "UInt32"),
                     ("int16", "Int16")):
        out = _metric_cast(s, dt)
        assert str(out.dtype) == want and pd.isna(out[1])
    assert str(_metric_cast(pd.Series([1.0, 2.0]), "int64").dtype) == "int64"
    assert str(_metric_cast(s, "float64").dtype) == "float64"


def test_spec_rejects_reserved_name_collisions():
    with pytest.raises(ValueError, match="collides with a group_by"):
        PartitionedMartSpec(group_by=("grp",), metrics={"grp": ("min", "v")})
    with pytest.raises(ValueError, match="part_id"):
        PartitionedMartSpec(group_by=("g",),
                            metrics={"part_id": ("min", "v")})
    with pytest.raises(ValueError, match="rows_metric"):
        PartitionedMartSpec(group_by=("g",), metrics={}, rows_metric="g")


def test_unbounded_group_domain_rejected_at_commit(lake, tmp_path,
                                                   monkeypatch):
    """MAX_GROUPS must fire when the mart is BUILT, not leave a committed
    mart that every read rejects."""
    import horizon_etl_ray.pipelines.mart as mart_mod

    monkeypatch.setattr(mart_mod, "MAX_GROUPS", 2)
    spec = PartitionedMartSpec(group_by=("path",), metrics={})  # ~unbounded
    with pytest.raises(ValueError, match="MAX_GROUPS"):
        build_partitioned_mart(lake, str(tmp_path / "m"), spec, cfg=CFG)
    assert mart_state(str(tmp_path / "m")) is None  # nothing committed


def test_empty_bootstrap_dtypes_are_real_not_object(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=4,
                    payload_columns=("repo", "path", "content", "grp", "val"))
    apply_epoch(_ev([{"repo": "r", "path": "A", "seq": 1, "op": "delete",
                      "content": "x", "grp": None, "val": None}]),
                lake, 1, cfg)
    spec = PartitionedMartSpec(group_by=("grp",),
                               metrics={"min_val": ("min", "val")})
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, spec, cfg=cfg)
    apply_epoch(_ev([{"repo": "r", "path": "B", "seq": 2, "op": "update",
                      "content": "y", "grp": "x", "val": 7}]), lake, 2, cfg)
    refresh_partitioned_mart(lake, mart, cfg=cfg)
    dtypes = mart_state(mart)["dtypes"]
    assert dtypes["n_rows"] == "int64", dtypes
    assert "object" not in dtypes.values(), dtypes


def test_refresh_across_schema_evolution_delta_mode(tmp_path):
    """The delta-mode twin of the evolution test: pre-rename base + post-
    rename deltas concat into BOTH spellings inside one partition — the
    conform coalesce must keep pre-rename rows' values in the mart."""
    import pyarrow as pa_
    import ray.data as rd_

    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        [("repo", pa_.string()), ("path", pa_.string()),
         ("lang", pa_.string()), ("content", pa_.string())],
        [{"epoch": 2, "op": "rename_column", "from": "lang",
          "to": "language"}],
    )
    cfg = CdcConfig(num_partitions=1, write_mode="delta",
                    schema_script=script,
                    payload_columns=("repo", "path", "lang", "content"))
    lake = str(tmp_path / "lake")

    def ev(rows):
        return rd_.from_arrow(pa_.Table.from_pylist(rows))

    apply_epoch(ev([{"repo": "r", "path": "A", "seq": 1, "op": "update",
                     "lang": "py", "content": "a"}]), lake, 1, cfg)
    apply_epoch(ev([{"repo": "r", "path": "B", "seq": 2, "op": "update",
                     "language": "rs", "content": "b"}]), lake, 2, cfg)
    # bootstrap from the PRE-rename time-travel state (conformed to the
    # current schema, like read_lake_at), then refresh across the DDL
    spec = PartitionedMartSpec(group_by=("language",), metrics={})
    mart = str(tmp_path / "mart")
    build_partitioned_mart(lake, mart, spec, cfg=cfg, at_epoch=1)
    refresh_partitioned_mart(lake, mart, cfg=cfg)
    by = _mart_df(mart, by="language").set_index("language")
    assert by.loc["py", "n_rows"] == 1  # pre-rename row kept its value
    assert by.loc["rs", "n_rows"] == 1
    assert not by.index.isna().any()
