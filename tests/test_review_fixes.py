"""Regressions for the round-3 core-engine review findings: custom
op_column through every state↔event conversion, one partition function for
all paths, independent 128-bit hashes for numeric keys, compact row_count
semantics + clean-partition skip, gc of crash-orphaned temp files, and
schema-consistent empty combiner blocks."""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.functions.hashing import key_hash_pair, partition_ids
from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    compact,
    lake_global_digest,
    read_lake,
    replay,
)
from horizon_etl_ray.sources.generator import EventGenConfig, generate_events_table, write_events
from horizon_etl_ray.state.lww import content_digest, lww_partial_fast, oracle_reduce
from horizon_etl_ray.state.manifest import ManifestStore, PartitionState, atomic_write_table


GEN = EventGenConfig(n_keys=150, n_events=2000, seed=31, epoch_size=500,
                     p_delete=0.2, content_mean_bytes=64)


def _want():
    return content_digest(list(oracle_reduce(
        generate_events_table(GEN).to_pylist()).values()))


def test_custom_op_column_cow_and_delta(ray_session, tmp_path):
    """A renamed op column must survive every state→event re-conversion
    (prior-state reads, delta index merges, merge-on-read) — regression for
    two sites that hardcoded \"op\"."""
    import pyarrow.parquet as pq

    events_dir = str(tmp_path / "events")
    write_events(GEN, events_dir)
    # rewrite the tail with the op column renamed
    renamed_dir = str(tmp_path / "events_renamed")
    for root, _, files in os.walk(events_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f))
            t = t.rename_columns(
                ["operation" if c == "op" else c for c in t.column_names])
            rel = os.path.relpath(os.path.join(root, f), events_dir)
            dst = os.path.join(renamed_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            pq.write_table(t, dst)
    for write_mode in ("cow", "delta"):
        cfg = CdcConfig(num_partitions=8, op_column="operation",
                        write_mode=write_mode)
        lake = str(tmp_path / f"lake_{write_mode}")
        replay(renamed_dir, lake, cfg, mode="incremental")
        assert lake_global_digest(lake, cfg=cfg) == _want()


def test_partition_assignment_single_source(ray_session):
    """The policy branch and the LWW fast path must place every key in the
    same partition (the manifest keys on part_id)."""
    t = generate_events_table(GEN)
    keys = ["repo", "path"]
    pids = partition_ids(t, keys, 16)
    _, fast = lww_partial_fast(t, keys, "seq", 16)
    # fast path returns one pid per WINNER row; re-derive via hash equality:
    # partition_ids of the winners table must equal the fast path's pids
    winners, fast_pids = lww_partial_fast(t, keys, "seq", 16)
    np.testing.assert_array_equal(partition_ids(winners, keys, 16), fast_pids)
    # and int keys agree too
    ti = pa.table({"a": pa.array([1, 2, 3, 2**40], pa.int64()),
                   "seq": pa.array([1, 2, 3, 4], pa.int64())})
    w, p = lww_partial_fast(ti, ["a"], "seq", 8)
    np.testing.assert_array_equal(partition_ids(w, ["a"], 8), p)


def test_numeric_keys_get_two_independent_hashes():
    """pd.util.hash_array ignores hash_key for numeric dtypes; the pair must
    still be independent (h1 != h2) or the combiner's 128-bit collision
    margin silently halves."""
    t = pa.table({"k": pa.array(list(range(1000)), pa.int64())})
    h1, h2 = key_hash_pair(t, ["k"])
    assert (h1 != h2).any()
    assert (h1 != h2).mean() > 0.99
    # strings were always fine; make sure they still differ
    ts = pa.table({"k": pa.array([f"x{i}" for i in range(100)])})
    s1, s2 = key_hash_pair(ts, ["k"])
    assert (s1 != s2).all()


def test_compact_row_count_excludes_kept_tombstones(ray_session, tmp_path):
    events_dir = str(tmp_path / "ev")
    write_events(GEN, events_dir)
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=8, write_mode="delta")
    replay(events_dir, lake, cfg, mode="incremental")
    res = compact(lake, cfg, drop_tombstones=False)
    m = ManifestStore(lake).load()
    want = {r["repo"] + "|" + r["path"]: r for r in
            oracle_reduce(generate_events_table(GEN).to_pylist()).values()}
    live_expected = sum(1 for r in want.values() if r["op"] != "delete")
    assert sum(ps.row_count for ps in m.partitions.values()) == live_expected
    assert sum(ps.tombstones for ps in m.partitions.values()) > 0
    # digest unchanged by compaction
    assert lake_global_digest(lake, cfg=cfg) == _want()


def test_compact_skips_clean_partitions(ray_session, tmp_path):
    """Copy-on-write partitions with no deltas and no tombstones to drop are
    carried forward without a rewrite."""
    events_dir = str(tmp_path / "ev")
    write_events(GEN, events_dir)
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake, cfg, mode="bulk")
    # first compaction drops tombstones (dirty partitions get rewritten)
    compact(lake, cfg, drop_tombstones=True)
    files_before = {
        pid: os.path.getmtime(ManifestStore(lake).partition_file(
            pid, ps.resolved_base_epoch()))
        for pid, ps in ManifestStore(lake).load().partitions.items()
    }
    time.sleep(0.05)
    # second compaction: every partition is now clean → zero rewrites
    compact(lake, cfg, drop_tombstones=True)
    m = ManifestStore(lake).load()
    rec = ManifestStore(lake).epoch_records()[-1]
    assert rec["metrics"]["partitions_compacted"] == 0
    for pid, ps in m.partitions.items():
        f = ManifestStore(lake).partition_file(pid, ps.resolved_base_epoch())
        assert os.path.getmtime(f) == files_before[pid]
    assert lake_global_digest(lake, cfg=cfg) == _want()


def test_gc_removes_stale_tmp_orphans(tmp_path):
    lake = str(tmp_path / "lake")
    store = ManifestStore(lake)
    t = pa.table({"repo": ["r"], "path": ["p"], "seq": pa.array([1], pa.int64()),
                  "content_sha256": ["x"], "deleted": [False]})
    atomic_write_table(store.partition_file(0, 0), t)
    store.commit_epoch(0, [PartitionState(
        part_id=0, epoch=0, offset=1, row_count=1, tombstones=0,
        content_digest="d")])
    orphan = store.partition_file(0, 1) + ".tmp.999.123"
    with open(orphan, "wb") as f:
        f.write(b"partial")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    fresh = store.partition_file(0, 2) + ".tmp.999.456"
    with open(fresh, "wb") as f:
        f.write(b"inflight")
    removed = store.gc()
    assert not os.path.exists(orphan)      # stale orphan reclaimed
    assert os.path.exists(fresh)           # in-flight temp protected by grace
    assert removed >= 1


def test_fully_quarantined_block_groupby_mode(ray_session, tmp_path):
    """An epoch where one input file is 100% invalid must still apply via the
    Dataset groupby exchange (regression: raw-schema empty blocks used to
    enter the shuffle)."""
    import pyarrow.parquet as pq

    events_dir = str(tmp_path / "ev")
    write_events(GEN, events_dir)
    # append an all-invalid file to the first epoch dir
    ep_dirs = sorted(d for d in os.listdir(events_dir) if d.startswith("epoch"))
    bad = pa.table({
        "seq": pa.array([-5, -6], pa.int64()),
        "op": pa.array(["bogus", "bogus"]),
        "repo": pa.array([None, None], pa.string()),
        "path": pa.array(["a", "b"]),
        "commit": pa.array(["c", "c"]),
        "lang": pa.array(["x", "x"]),
        "content": pa.array(["y", "y"]),
    })
    pq.write_table(bad, os.path.join(events_dir, ep_dirs[0], "zz-bad.parquet"))
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=8, shuffle_mode="groupby")
    replay(events_dir, lake, cfg, mode="bulk")
    assert lake_global_digest(lake, cfg=cfg) == _want()


# ---------------------------------------------------------------------------
# round-2 review pass: validate / schema evolution / streaming findings
# ---------------------------------------------------------------------------


def test_validate_events_empty_batch():
    """Regression: pc.sum over a zero-length mask returns null; an empty
    block used to crash ValidateEvents with a TypeError."""
    from horizon_etl_ray.stages.validate import ValidateEvents

    v = ValidateEvents()
    empty = pa.table({
        "seq": pa.array([], pa.int64()), "op": pa.array([], pa.string()),
        "repo": pa.array([], pa.string()), "path": pa.array([], pa.string()),
        "commit": pa.array([], pa.string()), "lang": pa.array([], pa.string()),
        "content": pa.array([], pa.string()),
    })
    out = v(empty)
    assert len(out) == 0
    assert "content_sha256" in out.column_names


def test_rename_chain_keeps_intermediate_spellings():
    """Regression: a chain a→b→c must conform batches carrying ANY historical
    spelling; the collapsed map used to null-fill mid-chain batches."""
    from horizon_etl_ray.stages.schema_evolution import SchemaScript, conform_table

    script = SchemaScript.from_json(
        [("a", pa.int64()), ("x", pa.string())],
        [{"epoch": 1, "op": "rename_column", "from": "a", "to": "b"},
         {"epoch": 2, "op": "rename_column", "from": "b", "to": "c"}],
    )
    assert script.renames_at(2) == {"a": "c", "b": "c"}
    mid = pa.table({"b": pa.array([10, 20], pa.int64()),
                    "x": pa.array(["u", "v"])})
    out = conform_table(mid, script, 2)
    assert out["c"].to_pylist() == [10, 20]
    assert "b" not in out.column_names
    old = pa.table({"a": pa.array([7], pa.int64()), "x": pa.array(["w"])})
    assert conform_table(old, script, 2)["c"].to_pylist() == [7]


def test_upserter_shard_two_phase_commit(tmp_path):
    """Regression: snapshot bookkeeping must not advance before the manifest
    commit — a failed commit + retry used to stack a delta file on an
    uncommitted base (and KeyError in the coordinator)."""
    from horizon_etl_ray.pipelines.streaming import UpserterShard

    lake = str(tmp_path / "lake")
    shard = UpserterShard(lake, {"key_columns": ("repo", "path"),
                                 "seq_column": "seq", "op_column": "op",
                                 "write_mode": "delta"}, 0, 4)
    winners = pa.table({
        "repo": ["r"], "path": ["p"], "seq": pa.array([1], pa.int64()),
        "op": ["update"], "content": ["x"], "content_sha256": ["s1"],
        "part_id": pa.array([0], pa.int32()),
    })
    rows1 = shard.snapshot(1, 0) if not shard.apply(winners) else shard.snapshot(1, 0)
    assert rows1[0]["wrote_delta"] is False  # first touch → base file
    # commit FAILED (confirm never called) → retry of the same epoch must
    # write the base again, never a delta on an uncommitted base
    rows_retry = shard.snapshot(1, 0)
    assert rows_retry[0]["wrote_delta"] is False
    assert shard.confirm(1)
    # next epoch after a confirmed base → delta
    w2 = winners.set_column(2, "seq", pa.array([2], pa.int64()))
    shard.apply(w2)
    rows2 = shard.snapshot(2, 0)
    assert rows2[0]["wrote_delta"] is True
    assert shard.confirm(2)


def test_streaming_honors_schema_script(ray_session, tmp_path):
    """Streaming replay with a mid-stream payload-column rename must produce
    the same lake digest as the batch path under the same script (the
    streaming path used to silently ignore cfg.schema_script)."""
    import os

    import ray.data as rd

    from horizon_etl_ray.pipelines.streaming import StreamingUpserter
    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        [("repo", pa.string()), ("path", pa.string()),
         ("commit", pa.string()), ("lang", pa.string()),
         ("content", pa.string())],
        [{"epoch": 2, "op": "rename_column", "from": "lang",
          "to": "language"}],
    )
    ev = str(tmp_path / "ev")
    write_events(GEN, ev)
    cfg_s = CdcConfig(num_partitions=8, schema_script=script)
    lake_s = str(tmp_path / "lake_s")
    up = StreamingUpserter(lake_s, cfg_s, num_shards=2)
    try:
        eps = sorted(int(d.split("=")[1]) for d in os.listdir(ev)
                     if d.startswith("epoch="))
        for e in eps:
            files = [os.path.join(ev, f"epoch={e}", f)
                     for f in sorted(os.listdir(os.path.join(ev, f"epoch={e}")))]
            up.apply_epoch(rd.read_parquet(files), e)
    finally:
        up.shutdown()
    lake_b = str(tmp_path / "lake_b")
    replay(ev, lake_b, CdcConfig(num_partitions=8, schema_script=script),
           mode="incremental")
    assert lake_global_digest(lake_s) == lake_global_digest(lake_b) == _want()
    ms = ManifestStore(lake_s).load()
    assert ms.schema_version == 1  # stamped, not hardcoded 0


def test_hot_key_targets_hot_repo_for_tiny_fraction():
    """repo_of_key and plan_events must agree on the hot-key clamp."""
    from horizon_etl_ray.sources.generator import repo_of_key

    cfg = EventGenConfig(n_keys=500, n_events=100, seed=1,
                         hot_fraction=1e-9, hot_event_fraction=0.5)
    assert repo_of_key(cfg, 0).endswith("/repo0")


def test_fully_quarantined_block_under_widen_policy(ray_session, tmp_path):
    """ADVICE r3: under a merge policy that ADDS aggregate columns
    (WidenOnlyPolicy's <col>_min/<col>_max), a fully-invalid block's
    zero-row output must carry those columns too — otherwise the
    groupby('part_id') exchange mixes schemas, the exact failure empty_out
    exists to prevent. Digest must equal the same replay without the bad
    file (policy winners are LWW winners, so _want() still applies to the
    sha digest)."""
    import pyarrow.parquet as pq

    from horizon_etl_ray.state.merge_policy import WidenOnlyPolicy

    events_dir = str(tmp_path / "ev")
    write_events(GEN, events_dir)
    ep_dirs = sorted(d for d in os.listdir(events_dir) if d.startswith("epoch"))
    bad = pa.table({
        "seq": pa.array([-5, -6], pa.int64()),
        "op": pa.array(["bogus", "bogus"]),
        "repo": pa.array([None, None], pa.string()),
        "path": pa.array(["a", "b"]),
        "commit": pa.array(["c", "c"]),
        "lang": pa.array(["x", "x"]),
        "content": pa.array(["y", "y"]),
    })
    pq.write_table(bad, os.path.join(events_dir, ep_dirs[0], "zz-bad.parquet"))
    lake = str(tmp_path / "lake")
    pol = WidenOnlyPolicy(key_columns=("repo", "path"), widen_columns=("seq",))
    cfg = CdcConfig(num_partitions=8, shuffle_mode="groupby", merge_policy=pol)
    replay(events_dir, lake, cfg, mode="bulk")
    assert lake_global_digest(lake, cfg=cfg) == _want()
    got = read_lake(lake, cfg=cfg).to_pandas()
    assert {"seq_min", "seq_max"} <= set(got.columns)


def test_manifest_records_partition_hash_scheme_and_refuses_mismatch(tmp_path):
    """ADVICE r3: the manifest carries the key-to-partition hash scheme id;
    appending to a lake written under a different scheme is refused (it
    would split key histories across partitions and defeat the seq fence)."""
    import json

    from horizon_etl_ray.functions.hashing import PARTITION_HASH_SCHEME

    lake = str(tmp_path / "lake")
    store = ManifestStore(lake)
    t = pa.table({"repo": ["r"], "path": ["p"], "seq": pa.array([1], pa.int64()),
                  "content_sha256": ["x"], "deleted": [False]})
    atomic_write_table(store.partition_file(0, 0), t)
    store.commit_epoch(0, [PartitionState(
        part_id=0, epoch=0, offset=1, row_count=1, tombstones=0,
        content_digest="d")])
    with open(store.current_path) as f:
        assert json.load(f)["partition_hash"] == PARTITION_HASH_SCHEME
    # simulate a lake written under an older/different scheme
    with open(store.current_path) as f:
        obj = json.load(f)
    obj["partition_hash"] = "pandas-default-key/v0"
    with open(store.current_path, "w") as f:
        json.dump(obj, f)
    with pytest.raises(RuntimeError, match="partition-hash scheme mismatch"):
        store.commit_epoch(1, [PartitionState(
            part_id=0, epoch=1, offset=2, row_count=1, tombstones=0,
            content_digest="d2")])


def test_gc_sweeps_manifest_dir_tmp_orphans(tmp_path):
    """ADVICE r3: a writer dying mid atomic_write leaves current.json.tmp.*
    / epoch json temps in the manifest dir; gc() reclaims stale ones there
    too (same mtime grace as the partition sweep)."""
    lake = str(tmp_path / "lake")
    store = ManifestStore(lake)
    t = pa.table({"repo": ["r"], "path": ["p"], "seq": pa.array([1], pa.int64()),
                  "content_sha256": ["x"], "deleted": [False]})
    atomic_write_table(store.partition_file(0, 0), t)
    store.commit_epoch(0, [PartitionState(
        part_id=0, epoch=0, offset=1, row_count=1, tombstones=0,
        content_digest="d")])
    stale = os.path.join(store.manifest_dir, "current.json.tmp.999.1")
    fresh = os.path.join(store.manifest_dir, "epoch=7.json.tmp.999.2")
    for p in (stale, fresh):
        with open(p, "wb") as f:
            f.write(b"partial")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    store.gc()
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # grace protects in-flight temps


# ---------------------------------------------------------------------------
# Round-5 ADVICE fixes
# ---------------------------------------------------------------------------


def _tiny_lake(tmp_path, mode="cow"):
    import ray.data as rd

    from horizon_etl_ray.pipelines.cdc import apply_epoch

    lake = str(tmp_path / f"lake_{mode}")
    cfg = CdcConfig(num_partitions=8, write_mode=mode,
                    payload_columns=("repo", "path", "content"))
    rows = [{"repo": "r", "path": f"k{i}", "seq": i + 1, "op": "update",
             "content": f"v{i}"} for i in range(40)]
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), lake, 1, cfg)
    return lake, cfg


def test_absent_key_lookup_never_opens_partitions(tmp_path):
    """ADVICE r5 #1: a lookup of keys routed to never-written / non-owning
    partitions must come back as a typed EMPTY dataset without launching a
    read plan over the lake — proven by corrupting EVERY partition file and
    requiring the absent-key path to still answer (footers survive because
    corruption here truncates data pages, so instead corrupt fully and
    expect footer-skip + one readable partition to type the result)."""
    from horizon_etl_ray.pipelines.cdc import read_lake_keys
    from horizon_etl_ray.state.manifest import ManifestStore

    lake, cfg = _tiny_lake(tmp_path)
    store = ManifestStore(lake)
    m = store.load()
    # corrupt all but ONE partition; the absent-key fallback may open only
    # footers and must tolerate unreadable ones
    keep = sorted(m.partitions)[0]
    for pid, ps in m.partitions.items():
        if pid != keep:
            for f in store.partition_data_files(ps):
                with open(f, "wb") as fh:
                    fh.write(b"corrupted")
    # keys that exist nowhere: dict routing finds no committed partition
    # only when the partition was never written; with all partitions
    # committed, force the structural case by widening the key space until
    # one routes to a partition id outside the manifest — simpler: ask for
    # a key owned by the KEPT partition's absent twin via a fresh manifest
    # with that partition dropped
    del m.partitions[(keep + 1) % 8]
    import json as _json

    with open(store.current_path) as f:
        doc = _json.load(f)
    doc["partitions"].pop(str((keep + 1) % 8), None)
    from horizon_etl_ray.state.manifest import atomic_write_json

    atomic_write_json(store.current_path, doc)
    # find a key routing to the dropped partition
    target = (keep + 1) % 8
    key = None
    for i in range(2000):
        kt = pa.table({"repo": ["r"], "path": [f"probe{i}"]})
        if int(partition_ids(kt, ["repo", "path"], 8)[0]) == target:
            key = ("r", f"probe{i}")
            break
    assert key is not None
    out = read_lake_keys(lake, [key], cfg=cfg)
    assert out.count() == 0
    assert {"repo", "path", "seq", "deleted", "part_id"} <= set(
        out.schema().names)


def test_key_type_mismatch_raises_not_empty(tmp_path):
    """ADVICE r5 #2: an int passed for a string key column must raise, not
    route to the wrong partition and return silently empty."""
    from horizon_etl_ray.pipelines.cdc import read_lake_keys

    lake, cfg = _tiny_lake(tmp_path)
    with pytest.raises(TypeError, match="key column"):
        read_lake_keys(lake, [(b"r", 7)], cfg=cfg)
    # same-group width mismatch is cast, not refused: string keys passed as
    # plain python strings still hit
    out = read_lake_keys(lake, [("r", "k3")], cfg=cfg).to_pandas()
    assert list(out["path"]) == ["k3"]


def test_delta_full_scan_and_point_read_share_schema(tmp_path):
    """ADVICE r5 #5: read_lake on a delta lake now emits part_id like the
    hive-inferring cow scan and the key-routed point read."""
    from horizon_etl_ray.pipelines.cdc import read_lake_keys

    lake, cfg = _tiny_lake(tmp_path, mode="delta")
    full = read_lake(lake, cfg=cfg)
    point = read_lake_keys(lake, [("r", "k1")], cfg=cfg)
    assert set(full.schema().names) == set(point.schema().names)
    assert "part_id" in full.schema().names


def test_kll_roundtrip_preserves_rng_stream():
    """ADVICE r5 #3: serialize → deserialize → keep updating must compact
    with the same random stream as the never-serialized sketch."""
    from horizon_etl_ray.functions.sketches import KllSketch

    rng = np.random.default_rng(3)
    a_vals = rng.normal(size=5000)
    b_vals = rng.normal(size=5000)
    s1 = KllSketch(k=64, seed=17).update_many(a_vals)
    s2 = KllSketch.from_bytes(
        KllSketch(k=64, seed=17).update_many(a_vals).to_bytes())
    s1.update_many(b_vals)
    s2.update_many(b_vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert s1.quantile(q) == s2.quantile(q), q


def test_approx_quantiles_survives_extreme_floats():
    """ADVICE r5 #4: |v[0]| ≳ 1.8e302 overflowed the old seed derivation."""
    import ray.data as rd

    from horizon_etl_ray.functions.sketches import approx_quantiles

    vals = np.concatenate([[1.8e303, -2.5e305], np.arange(1000, dtype=float)])
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
    got = approx_quantiles(ds, "v", {"p50": 0.5})[None]
    assert np.isfinite(got["p50"])
