"""Materialized SCD-2 history (pipelines/history.py): bootstrap + refresh
== the on-demand full walk, O(touched-partitions) refresh (untouched lake
files never opened), gc survival, DDL windows, commit atomicity."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    apply_epoch,
    read_history,
    replay,
)
from horizon_etl_ray.pipelines.history import (
    build_history,
    history_state,
    read_history_table,
    refresh_history,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(path, seq, op, content):
    return {"repo": "r", "path": path, "seq": seq, "op": op,
            "content": content}


CFG = dict(num_partitions=4, payload_columns=("repo", "path", "content"))


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df[sorted(df.columns)]
            .sort_values(["repo", "path", "valid_from_epoch"])
            .reset_index(drop=True))


@pytest.mark.parametrize("mode", ["cow", "delta"])
def test_bootstrap_plus_refresh_equals_full_walk(tmp_path, mode):
    gen = EventGenConfig(n_keys=100, n_events=1600, seed=13, epoch_size=400,
                         p_delete=0.25, content_mean_bytes=32)
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, ev)
    cfg = CdcConfig(num_partitions=8, write_mode=mode)
    replay(ev, lake, cfg, mode="incremental")
    final = ManifestStore(lake).committed_epoch()
    assert final >= 2
    hist = str(tmp_path / "hist")
    st = build_history(lake, hist, cfg=cfg, to_epoch=1)
    assert st["mode"] == "bootstrap" and st["epoch"] == 1
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental" and st["epoch"] == final
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)),
        _canon(read_history(lake, cfg=cfg)))
    # already current → noop, view unchanged
    st2 = refresh_history(lake, hist, cfg=cfg)
    assert st2["mode"] == "noop"
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)),
        _canon(read_history(lake, cfg=cfg)))
    # pointer counts match the stored view
    stt = history_state(hist)
    df = read_history_table(hist, cfg=cfg).to_pandas()
    assert stt["open"] == int(df["is_current"].sum())
    assert stt["closed"] == int((~df["is_current"]).sum())


def test_refresh_opens_only_touched_partitions(tmp_path):
    """Epoch 2 touches ONE key → one partition; every other partition's
    LAKE files are corrupted after bootstrap, and refresh must still
    succeed and keep serving those partitions' versions from the carried
    history files."""
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row(f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(40)]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    apply_epoch(_ev([_row("k0", 100, "update", "v0-new")]), lake, 2, cfg)

    store = ManifestStore(lake)
    m = store.load()
    rec2 = [r for r in store.epoch_records() if r["epoch"] == 2]
    touched = {p["part_id"] for p in rec2[0]["partitions"]}
    assert len(touched) == 1
    for pid, ps in m.partitions.items():
        if pid in touched:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "wb") as fh:
                fh.write(b"corrupted")
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental" and st["touched_partitions"] == 1
    df = read_history_table(hist, cfg=cfg).to_pandas()
    assert len(df) == 41  # 40 originals + k0's new version
    k0 = df[df["path"] == "k0"].sort_values("valid_from_epoch")
    assert list(k0["content"]) == ["v0", "v0-new"]
    assert list(k0["is_current"]) == [False, True]
    others = df[df["path"] != "k0"]
    assert others["is_current"].all()  # carried untouched, still served


def test_materialized_history_survives_gc(tmp_path, scripted_rows=None):
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1"),
                     _row("B", 2, "update", "b1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 10, "update", "a2")]), lake, 2, cfg)
    build_history(lake, hist, cfg=cfg)
    full = _canon(read_history_table(hist, cfg=cfg))
    ManifestStore(lake).gc(keep_epochs=0)
    # the on-demand walk is dead…
    with pytest.raises(FileNotFoundError, match="reclaimed"):
        read_history(lake, cfg=cfg)
    # …the materialized table keeps serving the full interval record
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)), full)
    # and keeps rolling forward over NEW epochs
    apply_epoch(_ev([_row("A", 20, "delete", None)]), lake, 3, cfg)
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental"
    a = (read_history_table(hist, cfg=cfg).to_pandas()
         .sort_values(["path", "valid_from_epoch"]))
    a = a[a["path"] == "A"]
    assert list(a["valid_to_epoch"].fillna(-1)) == [2, 3]
    assert not a["is_current"].any()


def test_refresh_across_schema_evolution(tmp_path):
    """A DDL inside the refresh window: refreshed partitions write the new
    schema, untouched partitions carry old-schema files which conform at
    read — the table must still equal the full walk exactly."""
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("content", pa.string())],
        script=[{"epoch": 2, "op": "add_column", "name": "size",
                 "type": "int64"},
                {"epoch": 3, "op": "rename_column", "from": "content",
                 "to": "body"}])
    cfg = CdcConfig(num_partitions=4, schema_script=script)
    apply_epoch(_ev([_row(f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(20)]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    apply_epoch(_ev([{"repo": "r", "path": "k0", "seq": 100, "op": "update",
                      "content": "v0b", "size": 7}]), lake, 2, cfg)
    apply_epoch(_ev([{"repo": "r", "path": "k1", "seq": 200, "op": "update",
                      "body": "v1b", "size": 8}]), lake, 3, cfg)
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental"
    got = _canon(read_history_table(hist, cfg=cfg))
    assert "body" in got.columns and "content" not in got.columns
    pd.testing.assert_frame_equal(got, _canon(read_history(lake, cfg=cfg)))


def test_fences(tmp_path):
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    with pytest.raises(FileNotFoundError, match="build_history"):
        refresh_history(lake, hist, cfg=cfg)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    with pytest.raises(ValueError, match="built with keys"):
        refresh_history(lake, hist, cfg=CdcConfig(
            key_columns=("path",), num_partitions=4))
    # a DIFFERENT lake path is refused outright (review fix: the epoch
    # check alone missed wrong lakes that happened to be further ahead)
    lake2 = str(tmp_path / "lake2")
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake2, 0, cfg)
    with pytest.raises(ValueError, match="refusing to mix lakes"):
        refresh_history(lake2, hist, cfg=cfg)
    # same path, lake rolled back under the pointer → the epoch fence
    import json
    sp = os.path.join(hist, "history.json")
    st = json.load(open(sp))
    st["epoch"] = 99
    with open(sp, "w") as f:
        json.dump(st, f)
    with pytest.raises(ValueError, match="ahead of the lake"):
        refresh_history(lake, hist, cfg=cfg)


def test_orphaned_files_swept_on_next_commit(tmp_path):
    """A crash between data-file write and pointer swap leaves orphans;
    the next successful commit sweeps them and the view stays exact."""
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    orphan = os.path.join(hist, "closed_e99_p0.parquet")
    with open(orphan, "wb") as f:
        f.write(b"crashed-before-pointer-swap")
    apply_epoch(_ev([_row("A", 10, "update", "a2")]), lake, 2, cfg)
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental"
    assert not os.path.exists(orphan)
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)),
        _canon(read_history(lake, cfg=cfg)))


def test_read_history_keys_opens_only_owning_partitions(tmp_path):
    from horizon_etl_ray.pipelines.history import read_history_keys

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row(f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(40)]), lake, 1, cfg)
    apply_epoch(_ev([_row("k0", 100, "update", "v0-new"),
                     _row("k1", 101, "delete", None)]), lake, 2, cfg)
    build_history(lake, hist, cfg=cfg)
    st = history_state(hist)

    # absent key → empty result, not an error; mistyped key → TypeError
    # (before the corruption below: an absent key legitimately routes to
    # and reads its would-be owning partition)
    assert read_history_keys(hist, [("r", "nope")], cfg=cfg).count() == 0
    with pytest.raises(TypeError, match="routing would silently miss"):
        read_history_keys(hist, [("r", 7)], cfg=cfg)

    # route the probe keys, then corrupt every NON-owning partition's files
    from horizon_etl_ray.functions.hashing import partition_ids
    ktab = pa.Table.from_pylist([{"repo": "r", "path": "k0"},
                                 {"repo": "r", "path": "k1"}])
    owned = {str(int(p)) for p in partition_ids(
        ktab, ["repo", "path"], int(st["num_partitions"]))}
    for pid, fs in st["closed_files"].items():
        if pid in owned:
            continue
        for f in fs:
            with open(os.path.join(hist, f), "wb") as fh:
                fh.write(b"corrupted")
    for pid, f in st["open_files"].items():
        if pid in owned:
            continue
        with open(os.path.join(hist, f), "wb") as fh:
            fh.write(b"corrupted")

    df = (read_history_keys(hist, [("r", "k0"), ("r", "k1")], cfg=cfg)
          .to_pandas().sort_values(["path", "valid_from_epoch"])
          .reset_index(drop=True))
    k0 = df[df["path"] == "k0"]
    assert list(k0["content"]) == ["v0", "v0-new"]
    assert list(k0["is_current"]) == [False, True]
    k1 = df[df["path"] == "k1"]  # deleted: closed interval, none current
    assert list(k1["valid_to_epoch"]) == [2]
    assert not k1["is_current"].any()


def test_closed_files_stay_bounded_under_tail_follow(tmp_path):
    """A tail-follow refreshing every epoch must not accumulate one closed
    file per partition per refresh: past the compaction threshold the
    touched partition folds its closed history into ONE file, and the view
    stays exact."""
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 0, "update", "a0")]), lake, 0, cfg)
    build_history(lake, hist, cfg=cfg)
    for e in range(1, 25):  # every epoch updates A → closes a version
        apply_epoch(_ev([_row("A", 100 + e, "update", f"a{e}")]),
                    lake, e, cfg)
        st = refresh_history(lake, hist, cfg=cfg)
        assert st["mode"] == "incremental"
    stt = history_state(hist)
    per_part = [len(fs) for fs in stt["closed_files"].values()]
    assert max(per_part) <= 9  # compact_threshold=8 (+1 in-flight append)
    on_disk = [f for f in os.listdir(hist) if f.startswith("closed_e")]
    assert len(on_disk) == sum(per_part)  # superseded files swept
    df = (read_history_table(hist, cfg=cfg).to_pandas()
          .sort_values("valid_from_epoch").reset_index(drop=True))
    assert list(df["content"]) == [f"a{e}" for e in range(25)]
    assert list(df["valid_from_epoch"]) == list(range(25))
    assert list(df["valid_to_epoch"].fillna(-1)) == list(range(1, 25)) + [-1]
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)),
        _canon(read_history(lake, cfg=cfg)))


def test_forget_history_keys(tmp_path):
    """LGPD/right-to-be-forgotten on the AUDIT table: every version of the
    named keys is removed (closed and open), other keys' history is
    byte-identical, pointer counts stay consistent."""
    from horizon_etl_ray.pipelines.history import forget_history_keys

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row(f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(20)]), lake, 1, cfg)
    apply_epoch(_ev([_row("k0", 100, "update", "v0b"),
                     _row("k1", 101, "delete", None)]), lake, 2, cfg)
    build_history(lake, hist, cfg=cfg)
    before = read_history_table(hist, cfg=cfg).to_pandas()
    st = forget_history_keys(hist, [("r", "k0"), ("r", "k1")], cfg=cfg)
    # k0: two versions (one open), k1: one closed version
    assert st["removed_versions"] == 3
    after = read_history_table(hist, cfg=cfg).to_pandas()
    assert not set(after["path"]) & {"k0", "k1"}
    pd.testing.assert_frame_equal(
        _canon(rd.from_pandas(after)),
        _canon(rd.from_pandas(before[~before["path"].isin(["k0", "k1"])])))
    stt = history_state(hist)
    assert stt["open"] == int(after["is_current"].sum())
    assert stt["closed"] == int((~after["is_current"]).sum())
    # forgetting an absent key is a no-op, not an error
    assert forget_history_keys(hist, [("r", "nope")],
                               cfg=cfg)["removed_versions"] == 0


def test_prune_history_before(tmp_path):
    """Retention: closed versions ending at or before the cutoff drop;
    anything valid after the cutoff (and every open version) survives, so
    as-of queries past the cutoff stay exact."""
    from horizon_etl_ray.pipelines.history import prune_history_before
    from horizon_etl_ray.pipelines.cdc import read_lake_at

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1"),
                     _row("B", 2, "update", "b1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 10, "update", "a2")]), lake, 2, cfg)
    apply_epoch(_ev([_row("A", 20, "update", "a3"),
                     _row("B", 21, "delete", None)]), lake, 3, cfg)
    build_history(lake, hist, cfg=cfg)
    st = prune_history_before(hist, 2)
    # dropped: A's [1,2) version. kept: A [2,3) (ends after cutoff),
    # A [3,∞), B [1,3) (valid_to 3 > 2)
    assert st["removed_versions"] == 1
    df = read_history_table(hist, cfg=cfg).to_pandas()
    assert len(df) == 3
    # as-of 2 (after the cutoff) still reconstructs exactly
    e = 2
    cover = df[(df["valid_from_epoch"] <= e)
               & (df["valid_to_epoch"].isna() | (df["valid_to_epoch"] > e))]
    asof = (read_lake_at(lake, e, cfg=cfg)
            .select_columns(["repo", "path", "content"]).to_pandas())
    pd.testing.assert_frame_equal(
        cover[["repo", "path", "content"]].sort_values(["repo", "path"])
        .reset_index(drop=True),
        asof.sort_values(["repo", "path"]).reset_index(drop=True))
    stt = history_state(hist)
    assert stt["closed"] == int((~df["is_current"]).sum())


def test_forget_mistyped_key_raises(tmp_path):
    from horizon_etl_ray.pipelines.history import forget_history_keys

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    with pytest.raises(TypeError, match="silently match nothing"):
        forget_history_keys(hist, [("r", 7)], cfg=cfg)


def test_lake_compaction_in_refresh_window_is_a_noop_for_versions(tmp_path):
    """compact() commits an epoch that rewrites partitions without changing
    visible state; a refresh spanning it must carry every partition (no
    spurious versions) and later real changes must still version."""
    from horizon_etl_ray.pipelines.cdc import compact

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(write_mode="delta", **CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1"),
                     _row("B", 2, "update", "b1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("B", 10, "delete", None)]), lake, 2, cfg)
    build_history(lake, hist, cfg=cfg)
    before = _canon(read_history_table(hist, cfg=cfg))
    compact(lake, cfg, drop_tombstones=True, gc_old_epochs=False)
    st = refresh_history(lake, hist, cfg=cfg)
    assert st["mode"] == "incremental" and st["closed"] == 0
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)), before)
    # post-compaction changes still version (B's tombstone was dropped,
    # its reinsert is a NEW version; A updates normally)
    apply_epoch(_ev([_row("A", 20, "update", "a2"),
                     _row("B", 21, "update", "b2")]), lake, 4, cfg)
    refresh_history(lake, hist, cfg=cfg)
    df = read_history_table(hist, cfg=cfg).to_pandas()
    b = df[df["path"] == "B"].sort_values("valid_from_epoch")
    assert list(b["content"]) == ["b1", "b2"]
    assert list(b["valid_to_epoch"].fillna(-1)) == [2, -1]
    pd.testing.assert_frame_equal(
        _canon(read_history_table(hist, cfg=cfg)),
        _canon(read_history(lake, cfg=cfg)))


def test_concurrent_mutator_fence(tmp_path):
    """Two mutators racing on one pointer: the loser's commit must refuse
    (each commit's sweep deletes files only the other pointer references,
    so a lost update would corrupt both views)."""
    import json

    from horizon_etl_ray.pipelines.history import _commit

    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    build_history(lake, hist, cfg=cfg)
    st = history_state(hist)
    # another mutator commits in between (seq bumps)
    _commit(hist, st, expect_seq=int(st["commit_seq"]))
    with pytest.raises(RuntimeError, match="changed underneath"):
        _commit(hist, st, expect_seq=int(st["commit_seq"]))


def test_tombstones_only_lake_serves_typed_empty_history(tmp_path):
    """A lake whose only key was never live: build succeeds with zero
    files and read_history_table returns a TYPED empty view (consistent
    with cdc.read_history), from the schema the pointer records."""
    lake, hist = str(tmp_path / "lake"), str(tmp_path / "hist")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("Z", 1, "delete", None)]), lake, 1, cfg)
    st = build_history(lake, hist, cfg=cfg)
    assert st["closed"] == 0 and st["open"] == 0
    ds = read_history_table(hist, cfg=cfg)
    assert ds.count() == 0
    assert {"repo", "path", "seq", "valid_from_epoch", "valid_to_epoch",
            "is_current"} <= set(ds.schema().names)
    # and a later real row flows through refresh into the same table
    apply_epoch(_ev([_row("A", 2, "update", "a1")]), lake, 2, cfg)
    refresh_history(lake, hist, cfg=cfg)
    assert read_history_table(hist, cfg=cfg).count() == 1
