"""SCD-2 history view (cdc.read_history): version-interval semantics,
as-of consistency with time travel at EVERY epoch, cow/delta and
streaming-writer agreement, compaction/gc edges. Reference analog: the
per-entity change log of
/root/reference/src/tracking/entities/entity_change_log.py:8-40 read back
as validity intervals."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    apply_epoch,
    compact,
    read_history,
    read_lake_at,
    replay,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(path, seq, op, content):
    return {"repo": "r", "path": path, "seq": seq, "op": op,
            "content": content}


CFG = dict(num_partitions=4, payload_columns=("repo", "path", "content"))


@pytest.fixture()
def scripted_lake(tmp_path):
    """A: insert@1, update@2, delete@3, reinsert@4 (three versions).
    B: insert@1, never touched again (one open version).
    E: insert@1, re-asserted with IDENTICAL content at a higher seq @2
    (seq-only — must NOT open a version)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1"),
                     _row("B", 2, "update", "b1"),
                     _row("E", 3, "update", "e1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 10, "update", "a2"),
                     _row("E", 11, "update", "e1")]), lake, 2, cfg)
    apply_epoch(_ev([_row("A", 20, "delete", None)]), lake, 3, cfg)
    apply_epoch(_ev([_row("A", 30, "update", "a3")]), lake, 4, cfg)
    return lake, cfg


def _hist(lake, cfg, **kw) -> pd.DataFrame:
    return (read_history(lake, cfg=cfg, **kw).to_pandas()
            .sort_values(["path", "valid_from_epoch"])
            .reset_index(drop=True))


def test_version_intervals_basic(scripted_lake):
    lake, cfg = scripted_lake
    df = _hist(lake, cfg)
    a = df[df["path"] == "A"]
    assert list(a["content"]) == ["a1", "a2", "a3"]
    assert list(a["valid_from_epoch"]) == [1, 2, 4]
    # a1 closed by the a2 update, a2 closed by the DELETE at 3 (not by the
    # reinsert at 4), a3 open
    assert list(a["valid_to_epoch"].fillna(-1)) == [2, 3, -1]
    assert list(a["is_current"]) == [False, False, True]
    assert list(a["seq"]) == [1, 10, 30]
    b = df[df["path"] == "B"]
    assert len(b) == 1 and bool(b["is_current"].iloc[0])
    assert b["valid_to_epoch"].isna().all()
    # E's seq-only re-assertion opened nothing; the version keeps the
    # OPENING winner's seq
    e = df[df["path"] == "E"]
    assert len(e) == 1 and e["seq"].iloc[0] == 3
    assert bool(e["is_current"].iloc[0])


def test_currently_deleted_key_has_no_current_version(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 2, "delete", None)]), lake, 2, cfg)
    df = _hist(lake, cfg)
    assert len(df) == 1
    assert df["valid_to_epoch"].iloc[0] == 2
    assert not df["is_current"].any()
    # a key whose FIRST event is a delete never becomes visible at all
    apply_epoch(_ev([_row("Z", 3, "delete", None)]), lake, 3, cfg)
    assert "Z" not in set(_hist(lake, cfg)["path"])


def test_to_epoch_truncates_history(scripted_lake):
    lake, cfg = scripted_lake
    df = _hist(lake, cfg, to_epoch=2)
    a = df[df["path"] == "A"]
    # as of epoch 2 the delete/reinsert haven't happened: a2 is open
    assert list(a["content"]) == ["a1", "a2"]
    assert list(a["is_current"]) == [False, True]


def test_history_matches_time_travel_at_every_epoch(tmp_path):
    """The defining invariant: for every committed epoch E, the versions
    covering E (valid_from ≤ E < valid_to) are exactly read_lake_at(E)'s
    live state — same keys, same payload."""
    gen = EventGenConfig(n_keys=120, n_events=2000, seed=31, epoch_size=500,
                         p_delete=0.25, content_mean_bytes=48)
    events_dir, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake, cfg, mode="incremental")
    final = ManifestStore(lake).committed_epoch()
    assert final >= 2
    hist = read_history(lake, cfg=cfg).to_pandas()
    for e in range(final + 1):
        cover = hist[(hist["valid_from_epoch"] <= e)
                     & (hist["valid_to_epoch"].isna()
                        | (hist["valid_to_epoch"] > e))]
        asof = (read_lake_at(lake, e, cfg=cfg)
                .select_columns(["repo", "path", "content"]).to_pandas())
        left = cover[["repo", "path", "content"]].sort_values(
            ["repo", "path"]).reset_index(drop=True)
        right = asof.sort_values(["repo", "path"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(left, right)
    # intervals never overlap within a key, and at most one is current
    g = hist.groupby(["repo", "path"], sort=False)
    assert (g["is_current"].sum() <= 1).all()
    for _, sub in hist.groupby(["repo", "path"], sort=False):
        sub = sub.sort_values("valid_from_epoch")
        closes = sub["valid_to_epoch"].to_numpy()[:-1]
        opens = sub["valid_from_epoch"].to_numpy()[1:]
        assert (closes <= opens).all()


def test_cow_delta_and_streaming_writers_agree(tmp_path):
    from horizon_etl_ray.pipelines.streaming import StreamingUpserter

    gen = EventGenConfig(n_keys=80, n_events=900, seed=7, epoch_size=300,
                         p_delete=0.2, content_mean_bytes=32)
    ev = str(tmp_path / "ev")
    write_events(gen, ev)
    frames = {}
    for mode in ("cow", "delta"):
        lake = str(tmp_path / mode)
        cfg = CdcConfig(write_mode=mode, num_partitions=8)
        replay(ev, lake, cfg, mode="incremental")
        frames[mode] = (read_history(lake, cfg=cfg).to_pandas()
                        .sort_values(["repo", "path", "valid_from_epoch"])
                        .reset_index(drop=True))
    cfg = CdcConfig(num_partitions=8)
    lake_s = str(tmp_path / "s")
    up = StreamingUpserter(lake_s, cfg, num_shards=2)
    try:
        for e in range(3):
            files = [os.path.join(ev, f"epoch={e}", f)
                     for f in sorted(os.listdir(
                         os.path.join(ev, f"epoch={e}")))]
            up.apply_epoch(rd.read_parquet(files), e)
    finally:
        up.shutdown()
    frames["streaming"] = (read_history(lake_s, cfg=cfg).to_pandas()
                           .sort_values(["repo", "path", "valid_from_epoch"])
                           .reset_index(drop=True))
    cols = sorted(frames["cow"].columns)
    pd.testing.assert_frame_equal(frames["cow"][cols], frames["delta"][cols])
    pd.testing.assert_frame_equal(frames["cow"][cols],
                                  frames["streaming"][cols])


def test_compacted_tombstone_then_reinsert(tmp_path):
    """compact(drop_tombstones=True) removes the dead row from the state
    files; the reinsert must still read as a NEW version, not a
    continuation of the first interval."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1"),
                     _row("B", 2, "update", "b1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 10, "delete", None)]), lake, 2, cfg)
    compact(lake, cfg, drop_tombstones=True, gc_old_epochs=False)
    apply_epoch(_ev([_row("A", 20, "update", "a2")]), lake, 4, cfg)
    df = _hist(lake, cfg)
    a = df[df["path"] == "A"]
    assert list(a["content"]) == ["a1", "a2"]
    assert list(a["valid_to_epoch"].fillna(-1)) == [2, -1]
    assert list(a["is_current"]) == [False, True]


def test_compaction_alone_opens_no_versions(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(write_mode="delta", **CFG)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("A", 10, "update", "a2")]), lake, 2, cfg)
    before = _hist(lake, cfg)
    compact(lake, cfg, gc_old_epochs=False)
    after = _hist(lake, cfg)
    pd.testing.assert_frame_equal(before, after)


@pytest.mark.parametrize("mode", ["cow", "delta"])
def test_history_across_schema_evolution(tmp_path, mode):
    """DDL mid-history: versions are diffs of CONFORMED states, so an
    add_column shows as a real payload change (null→value opens a new
    version), a rename does NOT fabricate one (old spelling coalesces into
    the new name), and every version row carries the CURRENT schema."""
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    lake = str(tmp_path / "lake")
    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("content", pa.string())],
        script=[{"epoch": 2, "op": "add_column", "name": "size",
                 "type": "int64"},
                {"epoch": 3, "op": "rename_column", "from": "content",
                 "to": "body"}])
    cfg = CdcConfig(num_partitions=2, schema_script=script, write_mode=mode)
    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 1, "op": "update",
         "content": "a1"},
        {"repo": "r", "path": "B", "seq": 2, "op": "update",
         "content": "b1"}]), lake, 1, cfg)
    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 10, "op": "update",
         "content": "a2", "size": 5}]), lake, 2, cfg)
    # epoch 3: only a re-assertion of A's IDENTICAL visible state under the
    # renamed spelling — the rename itself must not open a version
    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 20, "op": "update",
         "body": "a2", "size": 5}]), lake, 3, cfg)
    df = _hist(lake, cfg)
    assert "body" in df.columns and "content" not in df.columns
    a = df[df["path"] == "A"]
    assert list(a["body"]) == ["a1", "a2"]  # epoch 3 opened nothing
    assert list(a["valid_from_epoch"]) == [1, 2]
    assert list(pd.isna(a["size"])) == [True, False]
    b = df[df["path"] == "B"]  # untouched by any DDL epoch: one version,
    assert len(b) == 1 and b["body"].iloc[0] == "b1"  # conformed via rename
    assert bool(b["is_current"].iloc[0]) and pd.isna(b["size"].iloc[0])


def test_gc_reclaimed_history_raises(scripted_lake):
    lake, cfg = scripted_lake
    ManifestStore(lake).gc(keep_epochs=0)
    with pytest.raises(FileNotFoundError, match="reclaimed"):
        read_history(lake, cfg=cfg)


def test_empty_and_missing_lakes(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_history(str(tmp_path / "nope"), cfg=CdcConfig(**CFG))
    # a history window holding only an empty micro-batch commit (epoch 1
    # empty, real data at 2, to_epoch=1): empty result, typed from the
    # later partition footers — same discipline as read_changes
    lake2 = str(tmp_path / "lake2")
    cfg = CdcConfig(**CFG)
    empty = pa.Table.from_pylist([_row("Z", 99, "update", "z")]).slice(0, 0)
    apply_epoch(rd.from_arrow(empty), lake2, 1, cfg)
    apply_epoch(_ev([_row("A", 1, "update", "a1")]), lake2, 2, cfg)
    ds = read_history(lake2, cfg=cfg, to_epoch=1)
    assert ds.count() == 0
    assert {"repo", "path", "seq", "valid_from_epoch", "valid_to_epoch",
            "is_current"} <= set(ds.schema().names)
    # and the full history still sees the real commit
    assert read_history(lake2, cfg=cfg).count() == 1


def test_vector_payload_versions(tmp_path):
    """Embeddings CDC lake: list-typed cells version elementwise (tuples
    inside the walk); an emb-only change opens a version, a re-asserted
    identical vector does not. Consumed as Arrow (to_pandas would hit
    Ray's tensor-extension cast on ragged nullable lists)."""
    import ray

    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=4,
                    payload_columns=("repo", "path", "content", "emb"))

    def r(p, s, op, c, emb):
        return {"repo": "r", "path": p, "seq": s, "op": op,
                "content": c, "emb": emb}

    apply_epoch(_ev([r("A", 1, "update", "a1", [1.0, 2.0]),
                     r("B", 2, "update", "b1", [3.0, 4.0])]), lake, 1, cfg)
    apply_epoch(_ev([r("A", 10, "update", "a1", [9.0, 9.0]),  # emb-only
                     r("B", 11, "update", "b1", [3.0, 4.0])]), lake, 2, cfg)
    t = pa.concat_tables(
        [__import__("ray").get(x)
         for x in read_history(lake, cfg=cfg).to_arrow_refs()])
    rows = sorted(t.to_pylist(),
                  key=lambda x: (x["path"], x["valid_from_epoch"]))
    a = [x for x in rows if x["path"] == "A"]
    assert [(x["valid_from_epoch"], list(x["emb"])) for x in a] == \
        [(1, [1.0, 2.0]), (2, [9.0, 9.0])]
    assert [x["is_current"] for x in a] == [False, True]
    b = [x for x in rows if x["path"] == "B"]  # identical re-assert
    assert len(b) == 1 and b[0]["is_current"]


def test_policy_aggregates_respect_the_seq_fence(tmp_path):
    """Merge-policy lakes under the exactly-once fence: an event at or
    below the partition's committed offset is dropped BEFORE the policy
    reduce (a duplicate redelivery and a late lower-seq first delivery are
    indistinguishable by seq — exactly-once wins, documented on
    WidenOnlyPolicy). A NEW-seq widening event versions normally, and the
    history view tracks the policy's derived columns."""
    from horizon_etl_ray.state.merge_policy import WidenOnlyPolicy

    lake = str(tmp_path / "lake")
    keys = ("repo", "path")
    cfg = CdcConfig(
        key_columns=keys, num_partitions=4,
        payload_columns=("repo", "path", "content", "qty"),
        merge_policy=WidenOnlyPolicy(key_columns=keys,
                                     widen_columns=("qty",)))

    def r(p, s, op, c, qty):
        return {"repo": "r", "path": p, "seq": s, "op": op,
                "content": c, "qty": qty}

    apply_epoch(_ev([r("A", 10, "update", "a1", 5)]), lake, 1, cfg)
    # lower seq than the committed offset: fenced as a duplicate — the
    # widen value is NOT folded and no version opens (the lake state is
    # unchanged, which the history faithfully reflects)
    apply_epoch(_ev([r("A", 3, "update", "a0", 9)]), lake, 2, cfg)
    df = _hist(lake, cfg)
    assert list(df["valid_from_epoch"]) == [1]
    assert list(df["qty_max"]) == [5]
    # a NEW-seq losing event widens: the winner row is unchanged but the
    # visible state (qty_max) changed → a new version opens
    apply_epoch(_ev([r("A", 11, "update", "a1", 9)]), lake, 3, cfg)
    df = _hist(lake, cfg)
    assert list(df["valid_from_epoch"]) == [1, 3]
    assert list(df["qty_max"]) == [5, 9]
    assert list(df["content"]) == ["a1", "a1"]  # same winner payload
    assert list(df["is_current"]) == [False, True]


def test_key_routed_point_history(tmp_path):
    """read_history(keys=...) — per-entity audit lookup without a
    materialized table: equals the full walk filtered to the keys and
    opens ONLY the owning partitions (poisoned-bystander proof)."""
    from horizon_etl_ray.functions.hashing import partition_ids

    gen = EventGenConfig(n_keys=80, n_events=1200, seed=31, epoch_size=400,
                         p_delete=0.2, content_mean_bytes=40)
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, ev)
    cfg = CdcConfig(num_partitions=8)
    replay(ev, lake, cfg, mode="incremental")

    full = (read_history(lake, cfg=cfg).to_pandas()
            .sort_values(["repo", "path", "valid_from_epoch"])
            .reset_index(drop=True))
    want_keys = [tuple(r) for r in full[["repo", "path"]]
                 .drop_duplicates().head(3).itertuples(index=False)]
    got = (read_history(lake, cfg=cfg, keys=want_keys).to_pandas()
           .sort_values(["repo", "path", "valid_from_epoch"])
           .reset_index(drop=True))
    exp = (full.merge(pd.DataFrame(want_keys, columns=["repo", "path"]),
                      on=["repo", "path"])
           .sort_values(["repo", "path", "valid_from_epoch"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    ktab = pa.table({"repo": [k[0] for k in want_keys],
                     "path": [k[1] for k in want_keys]})
    owners = {int(p) for p in partition_ids(ktab, ["repo", "path"], 8)}
    store = ManifestStore(lake)
    for pid, ps in store.load().partitions.items():
        if pid in owners:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "wb") as fh:
                fh.write(b"poisoned")
    got2 = (read_history(lake, cfg=cfg, keys=want_keys).to_pandas()
            .sort_values(["repo", "path", "valid_from_epoch"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, exp)
