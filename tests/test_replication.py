"""Change-feed consumption surfaces (pipelines/replication.py): the
checkpointed FeedCursor and lake→lake replicate(). Contracts pinned here:

  - the follower's visible rows are byte-identical to the source's live
    rows after every sync cadence (bulk, per-epoch, chunked), including
    ``seq`` (re-asserted seqs mirrored via include_seq_only) and the
    recomputed ``content_sha256`` invariant;
  - a delete whose tombstone was compacted away inside the window (null
    feed seq) still kills the follower's row;
  - crash at ANY point of a sync (before the apply, after the apply but
    before the ack) resumes exactly — the pending window is recorded
    before the apply and apply_epoch is idempotent;
  - source DDL (SchemaScript) is carried into the follower re-keyed at
    follower epochs, so mixed-version follower partitions conform on read;
  - fences: wrong source, foreign writer on the follower, cursor
    ack-before-poll / wrong-window ack / wrong lake.

Reference analog: the reference's change-log consumers rebuild derived
stores from scratch each run (canonical_exporter.py:1943-2001); this is
that surface made incremental and restartable."""

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
    read_changes,
    read_lake,
    replay,
)
from horizon_etl_ray.pipelines.replication import (
    FeedCursor,
    feed_to_events,
    read_replica,
    replicate,
)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore

CFG = dict(key_columns=("repo", "path"), num_partitions=4)


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _row(repo, path, seq, op, content):
    return {"repo": repo, "path": path, "seq": seq, "op": op,
            "content": content}


def _frame(ds, drop=("part_id",)):
    df = ds.to_pandas()
    df = df.drop(columns=[c for c in drop if c in df.columns])
    keys = [c for c in ("repo", "path", "l_partkey", "l_suppkey", "doc_id")
            if c in df.columns]
    return (df[sorted(df.columns)]
            .sort_values(keys).reset_index(drop=True))


def _assert_mirror(src, dst, cfg):
    a = _frame(read_lake(src, cfg=cfg))
    b = _frame(read_replica(dst))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


@pytest.fixture()
def gen_lake(tmp_path):
    """A multi-epoch generator lake with inserts, updates and deletes."""
    gen = EventGenConfig(n_keys=120, n_events=1500, seed=11, epoch_size=300,
                         p_delete=0.2, content_mean_bytes=48)
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(gen, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake_dir, cfg, mode="incremental")
    return lake_dir, cfg


# ---------------------------------------------------------------------------
# replicate()
# ---------------------------------------------------------------------------

def test_bootstrap_then_incremental_mirror(gen_lake, tmp_path):
    """Bootstrap in one sync, then every later epoch one sync at a time;
    the follower mirrors the source exactly after each cadence."""
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    head = ManifestStore(src).committed_epoch()
    st = replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    assert st["src_epoch"] == head and st["syncs"] >= 2
    n = _assert_mirror(src, dst, cfg)
    assert n > 50
    # pure no-op when the source hasn't moved
    assert replicate(src, dst, cfg=cfg)["syncs"] == 0


def test_bulk_and_per_epoch_cadence_agree(gen_lake, tmp_path):
    """One big window and per-epoch windows land the SAME visible follower
    state (different _replica_seq internals, identical read_replica)."""
    src, cfg = gen_lake
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    replicate(src, d1, cfg=cfg)  # single window
    replicate(src, d2, cfg=cfg, max_epochs_per_sync=1)
    pd.testing.assert_frame_equal(_frame(read_replica(d1)),
                                  _frame(read_replica(d2)))


def test_seq_only_reassert_is_mirrored(tmp_path):
    """A later writer re-asserting identical content advances only seq; the
    follower must follow it (include_seq_only feed rows)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(6)]), src, 1, cfg)
    replicate(src, dst, cfg=cfg)
    apply_epoch(_ev([_row("r", "k3", 50, "update", "v3")]), src, 2, cfg)
    replicate(src, dst, cfg=cfg)
    _assert_mirror(src, dst, cfg)
    b = read_replica(dst).to_pandas()
    assert b.loc[b.path == "k3", "seq"].item() == 50


def test_null_seq_compacted_tombstone_still_deletes(tmp_path):
    """Delete + compaction (tombstone dropped) inside ONE window: the feed's
    delete row has a null seq, and the follower must still kill the key."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(8)]), src, 1, cfg)
    replicate(src, dst, cfg=cfg)
    apply_epoch(_ev([_row("r", "k5", 200, "delete", None)]), src, 2, cfg)
    compact(src, cfg=cfg, gc_old_epochs=False)
    feed = read_changes(src, 1, cfg=cfg, include_seq_only=True).to_pandas()
    assert feed.loc[feed.path == "k5", "seq"].isna().all()
    replicate(src, dst, cfg=cfg)
    n = _assert_mirror(src, dst, cfg)
    assert n == 7


def test_crash_between_apply_and_ack_resumes_exactly(gen_lake, tmp_path,
                                                     monkeypatch):
    """Kill the sync right after apply_epoch commits the follower epoch but
    before the checkpoint advances; the retry must re-use the RECORDED
    pending window (even though the source has moved on) and end mirrored."""
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    head = ManifestStore(src).committed_epoch()
    assert head >= 3

    import horizon_etl_ray.pipelines.replication as repl

    real_apply = repl.apply_epoch
    calls = {"n": 0}

    def crashing_apply(ev, lake, epoch, cfg_):
        out = real_apply(ev, lake, epoch, cfg_)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after apply, before ack")
        return out

    monkeypatch.setattr(repl, "apply_epoch", crashing_apply)
    with pytest.raises(RuntimeError, match="injected"):
        replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    ck = json.load(open(os.path.join(dst, "_replication.json")))
    assert ck["pending"] is not None  # the in-flight window is on disk
    monkeypatch.setattr(repl, "apply_epoch", real_apply)
    st = replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    assert st["src_epoch"] == head
    _assert_mirror(src, dst, cfg)


def test_crash_before_apply_resumes_exactly(gen_lake, tmp_path, monkeypatch):
    """Kill the sync after the pending record is written but before any
    follower write; retry applies the recorded window once."""
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")

    import horizon_etl_ray.pipelines.replication as repl

    real_apply = repl.apply_epoch

    def refuse(ev, lake, epoch, cfg_):
        raise RuntimeError("injected crash before apply")

    monkeypatch.setattr(repl, "apply_epoch", refuse)
    with pytest.raises(RuntimeError, match="injected"):
        replicate(src, dst, cfg=cfg)
    monkeypatch.setattr(repl, "apply_epoch", real_apply)
    st = replicate(src, dst, cfg=cfg)
    assert st["syncs"] >= 1
    _assert_mirror(src, dst, cfg)


def test_wrong_source_and_foreign_writer_fences(gen_lake, tmp_path):
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    replicate(src, dst, cfg=cfg)
    # wrong source
    other = str(tmp_path / "other")
    apply_epoch(_ev([_row("r", "x", 1, "update", "v")]), other, 1,
                CdcConfig(**CFG))
    with pytest.raises(ValueError, match="refusing to mix sources"):
        replicate(other, dst, cfg=CdcConfig(**CFG))
    # foreign writer: someone applies an epoch to the follower directly
    de = ManifestStore(dst).committed_epoch()
    apply_epoch(
        rd.from_arrow(pa.Table.from_pylist(
            [{"repo": "r", "path": "zz", "_replica_seq": 999, "seq": 1,
              "op": "update", "content": "rogue"}])),
        dst, de + 1, CdcConfig(key_columns=("repo", "path"),
                               seq_column="_replica_seq", num_partitions=8))
    with pytest.raises(ValueError, match="outside replicate"):
        replicate(src, dst, cfg=cfg)


def test_follower_width_may_differ(gen_lake, tmp_path):
    """The follower is an independent lake: a different partition count
    still mirrors exactly (routing is per-lake, not imported)."""
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    replicate(src, dst, cfg=cfg, num_partitions=3)
    _assert_mirror(src, dst, cfg)
    assert ManifestStore(dst).load().partitions  # committed, narrow width


def test_schema_evolution_carries_to_follower(tmp_path):
    """Bootstrap BEFORE any DDL, then sync across an add_column and a
    rename_column epoch per window: the carried ops (re-keyed at follower
    epochs) make the follower's old partitions conform on read."""
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("content", pa.string()), ("flag", pa.string())],
        script=[{"epoch": 2, "op": "add_column", "name": "size_bytes",
                 "type": "int64"},
                {"epoch": 3, "op": "rename_column", "from": "flag",
                 "to": "status_flag"}])
    cfg = CdcConfig(key_columns=("repo", "path"), num_partitions=4,
                    schema_script=script)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    apply_epoch(_ev([{**_row("r", f"k{i}", i + 1, "update", f"v{i}"),
                      "flag": "a"} for i in range(8)]), src, 1, cfg)
    replicate(src, dst, cfg=cfg)
    apply_epoch(_ev([{**_row("r", "k1", 100, "update", "v1b"),
                      "flag": "b", "size_bytes": 11}]), src, 2, cfg)
    apply_epoch(_ev([{**_row("r", "k2", 101, "update", "v2b"),
                      "status_flag": "c", "size_bytes": 12}]), src, 3, cfg)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    _assert_mirror(src, dst, cfg)
    ck = json.load(open(os.path.join(dst, "_replication.json")))
    assert [o["op"] for o in ck["script_ops"]] == ["add_column",
                                                   "rename_column"]
    # ops re-keyed at the FOLLOWER epochs that shipped them
    assert [o["epoch"] for o in ck["script_ops"]] == [2, 3]


def test_vector_payload_replication(tmp_path):
    """List-typed payload (embeddings CDC lake): the op-split conversion
    never routes vectors through if_else, so they replicate typed."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(key_columns=("repo", "path"), num_partitions=2,
                    payload_columns=("repo", "path", "content", "emb"))
    rows = [{"repo": "r", "path": f"k{i}", "seq": i + 1, "op": "update",
             "content": f"v{i}", "emb": [float(i), float(i) + 0.5]}
            for i in range(6)]
    apply_epoch(_ev(rows), src, 1, cfg)
    apply_epoch(_ev([{"repo": "r", "path": "k2", "seq": 10, "op": "delete",
                      "content": None, "emb": None},
                     {"repo": "r", "path": "k0", "seq": 11, "op": "update",
                      "content": "v0b", "emb": [9.0, 9.5]}]), src, 2, cfg)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    import ray

    def rows_of(ds):
        out = []
        for ref in ds.to_arrow_refs():
            t = ray.get(ref)
            t = t.drop_columns([c for c in ("part_id",)
                                if c in t.column_names])
            out.extend(t.to_pylist())
        return out

    ia = rows_of(read_lake(src, cfg=cfg))
    ib = rows_of(read_replica(dst))
    key = lambda r: (r["repo"], r["path"])  # noqa: E731
    assert sorted(ia, key=key) == sorted(ib, key=key)
    assert len(ia) == 5


# ---------------------------------------------------------------------------
# FeedCursor
# ---------------------------------------------------------------------------

def test_cursor_poll_ack_redelivery(gen_lake, tmp_path):
    src, cfg = gen_lake
    ckpt = str(tmp_path / "cur.json")
    cur = FeedCursor(src, ckpt, cfg=cfg)
    assert cur.position() == -1
    got = cur.poll(max_epochs=1)
    assert got is not None
    ds1, fr1, to1 = got
    n1 = ds1.count()
    # unacked poll re-delivers the SAME window
    ds1b, fr1b, to1b = cur.poll(max_epochs=1)
    assert (fr1b, to1b) == (fr1, to1) and ds1b.count() == n1
    cur.ack(to1)
    # a fresh cursor on the same checkpoint resumes past the ack
    cur2 = FeedCursor(src, ckpt, cfg=cfg)
    assert cur2.position() == to1
    got2 = cur2.poll()
    assert got2 is not None and got2[1] == to1
    cur2.ack(got2[2])
    assert cur2.poll() is None


def test_cursor_chunked_consumption_equals_full_window(gen_lake, tmp_path):
    """Consuming the feed one epoch at a time and applying each chunk onto a
    consumer lake reproduces the state a single full-window consumer gets —
    the at-least-once/idempotence story end-to-end."""
    src, cfg = gen_lake
    ckpt = str(tmp_path / "cur.json")
    chunk_lake = str(tmp_path / "chunked")
    full_lake = str(tmp_path / "full")
    cur = FeedCursor(src, ckpt, cfg=cfg)
    e = 0
    while True:
        got = cur.poll(max_epochs=1, include_seq_only=True)
        if got is None:
            break
        ds, fr, to = got
        e += 1
        apply_epoch(feed_to_events(ds, cfg, allow_null_seq=True)
                    .map_batches(lambda t, _e=e: t.append_column(
                        "_replica_seq", pa.array([_e] * len(t), pa.int64())),
                        batch_format="pyarrow", batch_size=None),
                    chunk_lake, e,
                    CdcConfig(key_columns=cfg.key_columns,
                              seq_column="_replica_seq", num_partitions=4))
        cur.ack(to)
    assert e >= 3
    full = read_changes(src, -1, cfg=cfg, include_seq_only=True)
    apply_epoch(feed_to_events(full, cfg)
                .map_batches(lambda t: t.append_column(
                    "_replica_seq", pa.array([1] * len(t), pa.int64())),
                    batch_format="pyarrow", batch_size=None),
                full_lake, 1,
                CdcConfig(key_columns=cfg.key_columns,
                          seq_column="_replica_seq", num_partitions=4))
    ccfg = CdcConfig(key_columns=cfg.key_columns, seq_column="_replica_seq",
                     num_partitions=4)
    pd.testing.assert_frame_equal(
        _frame(read_lake(chunk_lake, cfg=ccfg), drop=("part_id",
                                                      "_replica_seq")),
        _frame(read_lake(full_lake, cfg=ccfg), drop=("part_id",
                                                     "_replica_seq")))


def test_cursor_fences(gen_lake, tmp_path):
    src, cfg = gen_lake
    ckpt = str(tmp_path / "cur.json")
    cur = FeedCursor(src, ckpt, cfg=cfg)
    with pytest.raises(ValueError, match="ack before poll"):
        cur.ack(1)
    ds, fr, to = cur.poll()
    with pytest.raises(ValueError, match="does not match"):
        cur.ack(to - 1)
    cur.ack(to)
    with pytest.raises(ValueError, match="backwards"):
        cur.ack(to)
    # wrong lake for an existing checkpoint
    other = str(tmp_path / "other")
    apply_epoch(_ev([_row("r", "x", 1, "update", "v")]), other, 1,
                CdcConfig(**CFG))
    with pytest.raises(ValueError, match="refusing to mix lakes"):
        FeedCursor(other, ckpt, cfg=CdcConfig(**CFG))


def test_feed_to_events_null_seq_fence(tmp_path):
    src = str(tmp_path / "src")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", "k", 1, "update", "v")]), src, 1, cfg)
    apply_epoch(_ev([_row("r", "k", 9, "delete", None)]), src, 2, cfg)
    compact(src, cfg=cfg, gc_old_epochs=False)
    feed = read_changes(src, 1, cfg=cfg)
    with pytest.raises(Exception, match="null seq"):
        feed_to_events(feed, cfg).take_all()
    # allow_null_seq lets the same rows through with the seq passed as-is
    out = feed_to_events(read_changes(src, 1, cfg=cfg), cfg,
                         allow_null_seq=True).to_pandas()
    assert out.loc[out.path == "k", "op"].item() == "delete"


def test_chain_replication_fenced(gen_lake, tmp_path):
    """A follower can't be a replication SOURCE (its seq column is the
    replica order column); the fence names the fix."""
    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    replicate(src, dst, cfg=cfg)
    from horizon_etl_ray.pipelines.replication import _dst_cfg, _load_ckpt

    with pytest.raises(ValueError, match="chain replication"):
        replicate(dst, str(tmp_path / "gc"), cfg=_dst_cfg(_load_ckpt(dst)))


def test_read_replica_keys_point_read(gen_lake, tmp_path):
    """Key-routed point reads work on the follower (it is a first-class
    lake with its own manifest routing width)."""
    from horizon_etl_ray.pipelines.replication import read_replica_keys

    src, cfg = gen_lake
    dst = str(tmp_path / "dst")
    replicate(src, dst, cfg=cfg, num_partitions=5)
    full = _frame(read_replica(dst))
    keys = [tuple(r) for r in
            full[["repo", "path"]].head(4).itertuples(index=False)]
    got = _frame(read_replica_keys(dst, keys))
    want = full.merge(pd.DataFrame(keys, columns=["repo", "path"]),
                      on=["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_follower_inherits_bloom_indexing(tmp_path):
    """Replicating a bloom-indexed lake produces a bloom-indexed follower:
    the checkpoint carries bloom_columns, so equality scans on the
    follower prune from footers too (proven with poisoned bystanders)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(key_columns=("repo", "path"), num_partitions=6,
                    bloom_columns=("content",))
    apply_epoch(_ev([_row("r", f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(40)]), src, 1, cfg)
    replicate(src, dst, cfg=cfg)
    got = read_replica(dst, filter=("content", "==", "v13")).to_pandas()
    assert got.content.tolist() == ["v13"]
    # pruning proof on the FOLLOWER: poison every non-owner body (footer
    # kept valid), the filtered read must still answer from footers
    owner = None
    store = ManifestStore(dst)
    m = store.load()
    import pyarrow.parquet as pq

    for pid, ps in m.partitions.items():
        for f in store.partition_data_files(ps):
            t = pq.read_table(f)
            if "v13" in t["content"].to_pylist():
                owner = pid
    assert owner is not None
    for pid, ps in m.partitions.items():
        if pid == owner:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "r+b") as fh:
                fh.seek(4)
                fh.write(b"\xde\xad\xbe\xef" * 16)
    got = read_replica(dst, filter=("content", "==", "v13")).to_pandas()
    assert got.content.tolist() == ["v13"]


def test_custom_seq_and_op_columns_mirror(tmp_path):
    """Review fix: feed_to_events read the literal \"seq\" and the follower
    cfg dropped op_column — a source with renamed engine columns must
    mirror exactly."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(key_columns=("repo", "path"), seq_column="version",
                    op_column="operation", num_partitions=4)
    rows = [{"repo": "r", "path": f"k{i}", "version": i + 1,
             "operation": "update", "content": f"v{i}"} for i in range(8)]
    apply_epoch(_ev(rows), src, 1, cfg)
    apply_epoch(_ev([{"repo": "r", "path": "k2", "version": 50,
                      "operation": "delete", "content": None}]), src, 2, cfg)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    a = _frame(read_lake(src, cfg=cfg))
    b = _frame(read_replica(dst))
    pd.testing.assert_frame_equal(a, b)
    assert "version" in b.columns and len(b) == 7


def test_lag_window_conforms_to_window_end_schema(tmp_path, monkeypatch):
    """Review fix: a sync window ending BEFORE a later-committed rename must
    ship the window-end schema (pre-rename), not the source's current one —
    the mid-catch-up follower serves exactly the source's as-of state."""
    from horizon_etl_ray.pipelines.cdc import read_lake_at
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("content", pa.string()), ("flag", pa.string())],
        script=[{"epoch": 3, "op": "rename_column", "from": "flag",
                 "to": "status_flag"}])
    cfg = CdcConfig(key_columns=("repo", "path"), num_partitions=4,
                    schema_script=script)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    apply_epoch(_ev([{**_row("r", f"k{i}", i + 1, "update", f"v{i}"),
                      "flag": "a"} for i in range(8)]), src, 1, cfg)
    replicate(src, dst, cfg=cfg)  # bootstrap at epoch 1 (pre-rename)
    apply_epoch(_ev([{**_row("r", "k1", 100, "update", "v1b"),
                      "flag": "b"}]), src, 2, cfg)
    apply_epoch(_ev([{**_row("r", "k2", 101, "update", "v2b"),
                      "status_flag": "c"}]), src, 3, cfg)  # rename epoch

    # crash after the FIRST of the two outstanding syncs: the follower has
    # applied exactly window (1, 2], whose end predates the rename
    import horizon_etl_ray.pipelines.replication as repl

    real_apply = repl.apply_epoch
    calls = {"n": 0}

    def crash_second(ev, lake, epoch, cfg_):
        calls["n"] += 1
        if calls["n"] == 2:  # BEFORE the second window touches the follower
            raise RuntimeError("injected")
        return real_apply(ev, lake, epoch, cfg_)

    monkeypatch.setattr(repl, "apply_epoch", crash_second)
    with pytest.raises(RuntimeError, match="injected"):
        replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    mid = _frame(read_replica(dst))
    # pre-rename spelling, matching the source AS OF epoch 2 exactly
    # (read_lake_at itself conforms to the source's CURRENT schema, so the
    # expectation maps the spelling back)
    assert "flag" in mid.columns and "status_flag" not in mid.columns
    want = _frame(read_lake_at(src, 2, cfg=cfg)
                  .map_batches(lambda t: t.rename_columns(
                      [c if c != "status_flag" else "flag"
                       for c in t.column_names]),
                      batch_format="pyarrow"))
    pd.testing.assert_frame_equal(mid, want)
    # resume ships the rename and converges on the live mirror
    monkeypatch.setattr(repl, "apply_epoch", real_apply)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1)
    pd.testing.assert_frame_equal(_frame(read_replica(dst)),
                                  _frame(read_lake(src, cfg=cfg)))


def test_zero_max_epochs_and_epoch0_foreign_lake_fences(gen_lake, tmp_path):
    src, cfg = gen_lake
    with pytest.raises(ValueError, match="max_epochs"):
        replicate(src, str(tmp_path / "d"), cfg=cfg, max_epochs_per_sync=0)
    cur = FeedCursor(src, str(tmp_path / "c.json"), cfg=cfg)
    with pytest.raises(ValueError, match="max_epochs"):
        cur.poll(max_epochs=0)
    # a foreign lake whose head is epoch 0 must be refused at bootstrap
    foreign = str(tmp_path / "foreign")
    apply_epoch(_ev([_row("r", "x", 1, "update", "v")]), foreign, 0,
                CdcConfig(**CFG))
    with pytest.raises(ValueError, match="foreign lake"):
        replicate(src, foreign, cfg=cfg)


def test_compact_follower_then_keep_syncing(tmp_path):
    """Follower maintenance: a delta follower accumulates per-sync files;
    compact_follower reconciles them THROUGH the checkpoint (the plain
    cdc.compact would advance the follower's epoch behind replicate's back
    and trip the foreign-writer fence), and replication continues."""
    from horizon_etl_ray.pipelines.cdc import compact
    from horizon_etl_ray.pipelines.replication import compact_follower

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev([_row("r", f"k{i}", i + 1, "update", f"v{i}")
                     for i in range(12)]), src, 1, cfg)
    apply_epoch(_ev([_row("r", "k1", 100, "update", "v1b"),
                     _row("r", "k2", 101, "delete", None)]), src, 2, cfg)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1, write_mode="delta")

    # plain compact breaks the ownership contract: the NEXT sync refuses
    compact(dst, cfg=CdcConfig(key_columns=("repo", "path"),
                               seq_column="_replica_seq", num_partitions=4),
            gc_old_epochs=False)
    apply_epoch(_ev([_row("r", "k3", 102, "update", "v3b")]), src, 3, cfg)
    with pytest.raises(ValueError, match="outside replicate"):
        replicate(src, dst, cfg=cfg)

    # rebuild and do it the supported way
    import shutil

    shutil.rmtree(dst)
    replicate(src, dst, cfg=cfg, max_epochs_per_sync=1, write_mode="delta")
    st = compact_follower(dst)
    assert st["tombstones_dropped"] >= 1
    st2 = replicate(src, dst, cfg=cfg)
    assert st2["syncs"] == 0  # already caught up through epoch 3
    apply_epoch(_ev([_row("r", "k4", 103, "update", "v4b")]), src, 4, cfg)
    replicate(src, dst, cfg=cfg)
    _assert_mirror(src, dst, cfg)


def test_replicate_streaming_written_source(tmp_path):
    """Replication is writer-agnostic like the feed it rides: a follower of
    a lake written by the streaming partition-owning actors mirrors it
    exactly, syncing epoch by epoch as the stream commits."""
    from horizon_etl_ray.pipelines.streaming import StreamingUpserter

    gen = EventGenConfig(n_keys=100, n_events=1200, seed=13, epoch_size=400,
                         p_delete=0.2, content_mean_bytes=32)
    ev = str(tmp_path / "ev")
    write_events(gen, ev)
    cfg = CdcConfig(num_partitions=8)
    lake_s, dst = str(tmp_path / "s"), str(tmp_path / "dst")
    up = StreamingUpserter(lake_s, cfg, num_shards=2)
    try:
        for e in range(3):
            files = [os.path.join(ev, f"epoch={e}", f)
                     for f in sorted(os.listdir(
                         os.path.join(ev, f"epoch={e}")))]
            up.apply_epoch(rd.read_parquet(files), e)
            # follower chases the live stream between commits
            replicate(lake_s, dst, cfg=cfg)
            _assert_mirror(lake_s, dst, cfg)
    finally:
        up.shutdown()
    _assert_mirror(lake_s, dst, cfg)


def test_cursor_refuses_key_filtered_polls(gen_lake, tmp_path):
    """Acking a key-filtered window would silently skip every other key's
    changes — the cursor refuses the composition outright."""
    src, cfg = gen_lake
    cur = FeedCursor(src, str(tmp_path / "c.json"), cfg=cfg)
    with pytest.raises(ValueError, match="key-filtered"):
        cur.poll(keys=[("repo1", "p1")])
