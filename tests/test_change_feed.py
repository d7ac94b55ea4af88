"""Change-feed read API (cdc.read_changes): op/before/after/epoch semantics,
replayability (feed(0→E) re-materializes the live state digest), partition
pruning (untouched partitions are never opened), cow/delta agreement,
compaction and gc edges. Reference analog: the per-entity change log of
/root/reference/src/tracking/entities/entity_change_log.py:8-40."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    apply_epoch,
    compact,
    lake_global_digest,
    read_changes,
    replay,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(repo, path, seq, op, content):
    return {"repo": repo, "path": path, "seq": seq, "op": op,
            "content": content}


CFG = dict(num_partitions=4, payload_columns=("repo", "path", "content"))


@pytest.fixture()
def two_epoch_lake(tmp_path):
    """Epoch 1: A,B,D,E inserted. Epoch 2: A updated, B deleted, C inserted,
    E re-asserted with identical content at a higher seq (seq-only change —
    must NOT appear in the feed), D untouched."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([
        _row("r", "A", 1, "update", "a1"),
        _row("r", "B", 2, "update", "b1"),
        _row("r", "D", 3, "update", "d1"),
        _row("r", "E", 4, "update", "e1"),
    ]), lake, 1, cfg)
    apply_epoch(_ev([
        _row("r", "A", 10, "update", "a2"),
        _row("r", "B", 11, "delete", None),
        _row("r", "C", 12, "update", "c1"),
        _row("r", "E", 13, "update", "e1"),
    ]), lake, 2, cfg)
    return lake, cfg


def test_ops_epoch_seq_and_exclusions(two_epoch_lake):
    lake, cfg = two_epoch_lake
    df = (read_changes(lake, 1, 2, cfg=cfg).to_pandas()
          .sort_values("path").reset_index(drop=True))
    assert list(df["path"]) == ["A", "B", "C"]  # D unchanged, E seq-only
    by = df.set_index("path")
    assert by.loc["A", "op"] == "update"
    assert by.loc["A", "before_content"] == "a1"
    assert by.loc["A", "after_content"] == "a2"
    assert by.loc["B", "op"] == "delete"
    assert by.loc["B", "before_content"] == "b1"
    assert by.loc["B", "after_content"] is None
    assert by.loc["C", "op"] == "insert"
    assert by.loc["C", "before_content"] is None
    assert by.loc["C", "after_content"] == "c1"
    assert (df["epoch"] == 2).all()
    assert list(by["seq"]) == [10, 11, 12]


def test_from_zero_is_all_inserts_and_net_change_only(two_epoch_lake):
    lake, cfg = two_epoch_lake
    df = read_changes(lake, 0, cfg=cfg).to_pandas()
    # B was inserted then deleted inside the window: net zero, absent
    assert sorted(df["path"]) == ["A", "C", "D", "E"]
    assert (df["op"] == "insert").all()
    assert df["before_content"].isna().all()


def test_json_payload_shape(two_epoch_lake):
    lake, cfg = two_epoch_lake
    df = (read_changes(lake, 1, 2, cfg=cfg, json_payload=True).to_pandas()
          .sort_values("path").reset_index(drop=True))
    assert {"before", "after"} <= set(df.columns)
    assert not any(c.startswith(("before_", "after_")) for c in df.columns)
    a = df.set_index("path")
    after_a = json.loads(a.loc["A", "after"])
    assert after_a["content"] == "a2" and "content_sha256" in after_a
    assert a.loc["B", "after"] is None
    assert a.loc["C", "before"] is None


def test_changed_fields_column(tmp_path):
    """Opt-in ``changed_fields`` (reference: entity_change_log.py:35's
    changed_fields_json): updates list differing fields, inserts the
    populated fields, deletes the fields the removed row had — per-field
    attribution, not just row-level diff."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=4,
                    payload_columns=("repo", "path", "content", "size"))

    def _r(path, seq, op, content, size):
        return {"repo": "r", "path": path, "seq": seq, "op": op,
                "content": content, "size": size}

    apply_epoch(_ev([_r("A", 1, "update", "a1", 1),
                     _r("B", 2, "update", "b1", 2),
                     _r("D", 3, "update", "d1", 3)]), lake, 1, cfg)
    apply_epoch(_ev([_r("A", 10, "update", "a2", 1),      # content only
                     _r("B", 11, "update", "b1", 20),     # size only
                     _r("C", 12, "update", "c1", None),   # insert, size null
                     _r("D", 13, "delete", None, None)]), lake, 2, cfg)
    df = (read_changes(lake, 1, 2, cfg=cfg, changed_fields=True).to_pandas()
          .set_index("path"))
    fa = set(df.loc["A", "changed_fields"])
    fb = set(df.loc["B", "changed_fields"])
    assert "content" in fa and "size" not in fa
    assert "size" in fb and "content" not in fb
    # the sha hashes the content column only (cdc.add_sha), so it flips
    # with A's content change but not with B's size-only change
    assert "content_sha256" in fa and "content_sha256" not in fb
    fc = set(df.loc["C", "changed_fields"])  # insert: populated fields only
    assert "content" in fc and "size" not in fc
    fd = set(df.loc["D", "changed_fields"])  # delete: fields the row had
    assert {"content", "size"} <= fd
    # flag off → no column (existing consumers see the same schema)
    cols = read_changes(lake, 1, 2, cfg=cfg).schema().names
    assert "changed_fields" not in cols
    # and it composes with the reference-shaped JSON payload mode
    dj = (read_changes(lake, 1, 2, cfg=cfg, changed_fields=True,
                       json_payload=True).to_pandas().set_index("path"))
    assert set(dj.loc["B", "changed_fields"]) == fb


def test_feed_replayed_onto_empty_lake_reproduces_digest(tmp_path):
    """VERDICT r4 #3's done-bar: the feed IS a minimal re-materialization
    recipe. Two-stage replay exercises insert, update AND delete rows:
    feed(empty→mid) applied as epoch 1, then feed(mid→E) applied as epoch
    2 (the generator's epochs start at 0, so 'empty' is from_epoch=-1)."""
    gen = EventGenConfig(n_keys=150, n_events=2400, seed=23, epoch_size=600,
                         p_delete=0.2, content_mean_bytes=64)
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(gen, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake_dir, cfg, mode="incremental")
    mid = 1
    final = ManifestStore(lake_dir).committed_epoch()
    assert final > mid

    def feed_to_events(df: pd.DataFrame) -> pa.Table:
        pay = [c[len("after_"):] for c in df.columns
               if c.startswith("after_") and c != "after_content_sha256"]
        rows = []
        for r in df.to_dict("records"):
            side = "before_" if r["op"] == "delete" else "after_"
            ev = {c: r[side + c] for c in pay}  # tombstone payload may be null
            ev["repo"], ev["path"] = r["repo"], r["path"]
            ev["seq"] = r["seq"]
            ev["op"] = "delete" if r["op"] == "delete" else "update"
            rows.append(ev)
        return pa.Table.from_pylist(rows)

    replayed = str(tmp_path / "replayed")
    f1 = read_changes(lake_dir, -1, mid, cfg=cfg).to_pandas()
    assert (f1["op"] == "insert").all()
    apply_epoch(rd.from_arrow(feed_to_events(f1)), replayed, 1, cfg)
    f2 = read_changes(lake_dir, mid, final, cfg=cfg).to_pandas()
    assert set(f2["op"]) >= {"update"}  # the window carries real updates
    apply_epoch(rd.from_arrow(feed_to_events(f2)), replayed, 2, cfg)
    assert lake_global_digest(replayed) == lake_global_digest(lake_dir)


def test_untouched_partitions_never_opened(tmp_path):
    """Epoch 2 touches ONE key → one partition; every other partition's
    data files are corrupted on disk, and the feed must still succeed
    (the manifest's epoch records say which partitions the window touched)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(40)]), lake, 1, cfg)
    apply_epoch(_ev([_row("r", "k0", 100, "update", "v0-new")]), lake, 2, cfg)

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
    df = read_changes(lake, 1, 2, cfg=cfg).to_pandas()
    assert list(df["path"]) == ["k0"]
    assert df.loc[0, "op"] == "update"
    assert df.loc[0, "before_content"] == "v0"
    assert df.loc[0, "after_content"] == "v0-new"


def test_delta_mode_matches_cow(tmp_path):
    epochs = [
        [_row("r", "A", 1, "update", "a1"), _row("r", "B", 2, "update", "b1")],
        [_row("r", "A", 10, "update", "a2"), _row("r", "C", 11, "update", "c1")],
        [_row("r", "B", 20, "delete", None), _row("r", "A", 21, "update", "a3")],
    ]
    frames = {}
    for mode in ("cow", "delta"):
        lake = str(tmp_path / mode)
        cfg = CdcConfig(write_mode=mode, **CFG)
        for e, rows in enumerate(epochs, start=1):
            apply_epoch(_ev(rows), lake, e, cfg)
        frames[mode] = (read_changes(lake, 1, 3, cfg=cfg).to_pandas()
                        .sort_values("path").reset_index(drop=True))
    cols = sorted(frames["cow"].columns)
    pd.testing.assert_frame_equal(frames["cow"][cols], frames["delta"][cols])
    assert list(frames["cow"]["op"]) == ["update", "delete", "insert"]
    # A changed at 2 AND 3 → attributed to its winner's epoch, 3
    assert frames["cow"].set_index("path").loc["A", "epoch"] == 3


def test_compacted_tombstone_reads_as_delete_with_null_seq(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", "A", 1, "update", "a1"),
                     _row("r", "B", 2, "update", "b1")]), lake, 1, cfg)
    apply_epoch(_ev([_row("r", "A", 10, "delete", None)]), lake, 2, cfg)
    compact(lake, cfg, drop_tombstones=True, gc_old_epochs=False)
    df = read_changes(lake, 1, cfg=cfg).to_pandas()
    assert list(df["path"]) == ["A"]
    assert df.loc[0, "op"] == "delete"
    assert df.loc[0, "epoch"] == 2  # the delete, not the compaction commit
    assert pd.isna(df.loc[0, "seq"])  # tombstone row itself was compacted


def test_feed_over_streaming_lake_matches_batch(tmp_path):
    """The feed is a reader of the manifest's epoch records, so it must be
    writer-agnostic: a lake written by the streaming partition-owning
    actors yields the SAME change feed as a batch incremental replay of
    the same epochs."""
    from horizon_etl_ray.pipelines.streaming import StreamingUpserter
    from horizon_etl_ray.sources.generator import EventGenConfig, write_events

    gen = EventGenConfig(n_keys=100, n_events=1200, seed=11, epoch_size=400,
                         p_delete=0.2, content_mean_bytes=32)
    ev = str(tmp_path / "ev")
    write_events(gen, ev)
    cfg = CdcConfig(num_partitions=8)
    lake_s = str(tmp_path / "s")
    up = StreamingUpserter(lake_s, cfg, num_shards=2)
    try:
        for e in range(3):
            files = [os.path.join(ev, f"epoch={e}", f)
                     for f in sorted(os.listdir(os.path.join(ev, f"epoch={e}")))]
            up.apply_epoch(rd.read_parquet(files), e)
    finally:
        up.shutdown()
    lake_b = str(tmp_path / "b")
    replay(ev, lake_b, cfg, mode="incremental")

    for fr in (-1, 0, 1):
        fs = (read_changes(lake_s, fr, cfg=cfg).to_pandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
        fb = (read_changes(lake_b, fr, cfg=cfg).to_pandas()
              .sort_values(["repo", "path"]).reset_index(drop=True))
        cols = sorted(fs.columns)
        assert cols == sorted(fb.columns)
        pd.testing.assert_frame_equal(fs[cols], fb[cols])


def test_gc_reclaimed_history_raises(tmp_path, two_epoch_lake):
    lake, cfg = two_epoch_lake
    ManifestStore(lake).gc(keep_epochs=0)
    with pytest.raises(FileNotFoundError, match="reclaimed"):
        read_changes(lake, 1, 2, cfg=cfg)


def test_bad_windows_raise(two_epoch_lake):
    lake, cfg = two_epoch_lake
    with pytest.raises(ValueError, match="from_epoch"):
        read_changes(lake, 3, 2, cfg=cfg)
    with pytest.raises(ValueError, match="no epochs committed"):
        read_changes(lake, 2, 2, cfg=cfg)


def test_empty_epoch_window_yields_empty_typed_feed(two_epoch_lake):
    """apply_epoch on a zero-event micro-batch legally advances the
    committed epoch with no partition rows; the feed over such a window is
    EMPTY (typed from partition footers), not an error — refresh_mart and
    the CLI --changes path advance their pointer past it."""
    lake, cfg = two_epoch_lake
    empty = pa.Table.from_pylist([_row("r", "Z", 99, "update", "z")]
                                 ).slice(0, 0)
    apply_epoch(rd.from_arrow(empty), lake, 3, cfg)
    ds = read_changes(lake, 2, 3, cfg=cfg)
    assert ds.count() == 0
    # typed at the Dataset level (to_pandas of a 0-row dataset drops schema)
    assert {"repo", "path", "op", "epoch", "seq",
            "before_content", "after_content"} <= set(ds.schema().names)
    cf = read_changes(lake, 2, 3, cfg=cfg, changed_fields=True)
    assert cf.count() == 0 and "changed_fields" in cf.schema().names
    jf = read_changes(lake, 2, 3, cfg=cfg, json_payload=True).to_pandas()
    assert len(jf) == 0
    # a window with real changes plus a trailing empty epoch still works
    full = read_changes(lake, 1, 3, cfg=cfg).to_pandas()
    assert sorted(full["path"]) == ["A", "B", "C"]


def test_json_payload_nulls_are_strict_json(tmp_path):
    """Numeric nulls on live rows must serialize as JSON null — to_pandas
    turns them into float NaN and json.dumps would emit a literal NaN
    token that strict parsers (jq, JSON.parse, DuckDB json) reject."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=2,
                    payload_columns=("repo", "path", "content", "val"))

    def r(path, seq, content, val):
        return {"repo": "r", "path": path, "seq": seq, "op": "update",
                "content": content, "val": val}

    apply_epoch(_ev([r("A", 1, "a1", 5)]), lake, 1, cfg)
    apply_epoch(_ev([r("A", 10, "a2", None), r("B", 11, "b1", 7)]),
                lake, 2, cfg)
    df = (read_changes(lake, 1, 2, cfg=cfg, json_payload=True)
          .to_pandas().set_index("path"))

    def strict(s):  # reject NaN/Infinity tokens like RFC 8259 parsers do
        return json.loads(
            s, parse_constant=lambda c: (_ for _ in ()).throw(ValueError(c)))

    assert strict(df.loc["A", "after"])["val"] is None
    assert strict(df.loc["A", "before"])["val"] == 5
    assert strict(df.loc["B", "after"])["val"] == 7


def test_list_payload_columns_diff_correctly(tmp_path):
    """Vector payloads (e.g. embeddings CDC): list-typed cells must diff
    elementwise (canonicalized to tuples inside the diff task — numpy
    array cells would raise 'truth value is ambiguous'). Consumed as
    Arrow: Ray's to_pandas tensor-extension cast rejects ragged nullable
    list columns, which is a consumer-side conversion, not feed state."""
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
                     r("B", 11, "update", "b1", [3.0, 4.0]),  # re-assert
                     r("C", 12, "update", "c1", None)]), lake, 2, cfg)
    feed = read_changes(lake, 1, 2, cfg=cfg, changed_fields=True)
    t = pa.concat_tables([ray.get(x) for x in feed.to_arrow_refs()])
    rows = sorted(t.to_pylist(), key=lambda x: x["path"])
    assert [(x["path"], x["op"]) for x in rows] == [("A", "update"),
                                                    ("C", "insert")]
    a, c = rows
    assert a["before_emb"] == [1.0, 2.0] and a["after_emb"] == [9.0, 9.0]
    assert a["changed_fields"] == ["emb"]  # content/sha unchanged
    assert c["before_emb"] is None and c["after_emb"] is None
    assert "emb" not in c["changed_fields"]  # null field on an insert
    # json_payload serializes vectors as JSON arrays
    jf = (read_changes(lake, 1, 2, cfg=cfg, json_payload=True)
          .to_pandas().set_index("path"))
    assert json.loads(jf.loc["A", "after"])["emb"] == [9.0, 9.0]
    assert json.loads(jf.loc["C", "after"])["emb"] is None


def test_feed_across_schema_evolution_window(tmp_path):
    """A feed window spanning DDL events diffs both states CONFORMED to the
    lake's current schema version (like any read): an added column shows a
    null→value change, a renamed column appears under its NEW name on both
    sides, and a from-the-beginning feed emits the current schema."""
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    lake = str(tmp_path / "lake")
    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("content", pa.string())],
        script=[{"epoch": 2, "op": "add_column", "name": "size",
                 "type": "int64"},
                {"epoch": 3, "op": "rename_column", "from": "content",
                 "to": "body"}])
    cfg = CdcConfig(num_partitions=2, schema_script=script)
    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 1, "op": "update",
         "content": "a1"},
        {"repo": "r", "path": "B", "seq": 2, "op": "update",
         "content": "b1"}]), lake, 1, cfg)
    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 10, "op": "update",
         "content": "a2", "size": 5}]), lake, 2, cfg)
    df = (read_changes(lake, 1, 2, cfg=cfg, changed_fields=True)
          .to_pandas().set_index("path"))
    assert list(df.index) == ["A"]  # B untouched (size null on both sides)
    assert pd.isna(df.loc["A", "before_size"])
    assert df.loc["A", "after_size"] == 5
    assert {"content", "size"} <= set(df.loc["A", "changed_fields"])

    apply_epoch(_ev([
        {"repo": "r", "path": "A", "seq": 20, "op": "update",
         "body": "a3", "size": 5}]), lake, 3, cfg)
    df2 = (read_changes(lake, 2, 3, cfg=cfg, changed_fields=True)
           .to_pandas().set_index("path"))
    assert {"before_body", "after_body"} <= set(df2.columns)
    assert not any(c.endswith("_content") for c in df2.columns)
    assert (df2.loc["A", "before_body"], df2.loc["A", "after_body"]) \
        == ("a2", "a3")
    assert "body" in set(df2.loc["A", "changed_fields"])

    df3 = (read_changes(lake, -1, 3, cfg=cfg).to_pandas()
           .sort_values("path"))
    assert (df3["op"] == "insert").all()
    assert list(df3["after_body"]) == ["a3", "b1"]  # B conformed via rename


def test_key_routed_point_feed(tmp_path):
    """read_changes(keys=...) — the point feed: equals the full feed
    filtered to the keys, and diffs ONLY the owning partitions (proven by
    corrupting every other partition's files, footers included)."""
    gen = EventGenConfig(n_keys=120, n_events=1500, seed=29, epoch_size=500,
                         p_delete=0.2, content_mean_bytes=40)
    ev, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    write_events(gen, ev)
    cfg = CdcConfig(num_partitions=8)
    replay(ev, lake, cfg, mode="incremental")

    full = (read_changes(lake, 0, cfg=cfg).to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(full) > 10
    want_keys = [tuple(r) for r in
                 full[["repo", "path"]].head(3).itertuples(index=False)]
    got = (read_changes(lake, 0, cfg=cfg, keys=want_keys).to_pandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    exp = (full.merge(pd.DataFrame(want_keys, columns=["repo", "path"]),
                      on=["repo", "path"])
           .sort_values(["repo", "path"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)

    # pruning proof: poison every NON-owning partition wholesale — the
    # point feed must still answer
    from horizon_etl_ray.functions.hashing import partition_ids
    import pyarrow as pa

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
    got2 = (read_changes(lake, 0, cfg=cfg, keys=want_keys).to_pandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, exp)
    # an absent key routed to a poisoned partition still fails LOUDLY if
    # its owner's files are gone (never a silent empty): use a key owned
    # by a poisoned partition
    victim = next(iter(set(range(8)) - owners))
    for i in range(1000):
        kt = pa.table({"repo": [f"zz{i}"], "path": ["p"]})
        if int(partition_ids(kt, ["repo", "path"], 8)[0]) == victim:
            with pytest.raises(Exception):
                read_changes(lake, 0, cfg=cfg,
                             keys=[(f"zz{i}", "p")]).to_pandas()
            break
