"""End-to-end CDC replay: sha256-exact final state vs the single-threaded
oracle reducer; resume-from-manifest; exactly-once under duplicate delivery;
idempotent re-runs; skew. (SURVEY.md §5 implication list.)"""

import hashlib

import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    apply_epoch,
    lake_global_digest,
    manifest_digest,
    read_lake,
    replay,
)
from horizon_etl_ray.sources.generator import (
    EventGenConfig,
    generate_events_table,
    write_events,
)
from horizon_etl_ray.state.lww import content_digest, oracle_reduce
from horizon_etl_ray.state.manifest import ManifestStore


def _oracle_digest(cfg: EventGenConfig) -> tuple[str, int]:
    events = generate_events_table(cfg).to_pylist()
    final = oracle_reduce(events)
    rows = list(final.values())
    return content_digest(rows), len(rows)


@pytest.fixture()
def small_cfg():
    return EventGenConfig(n_keys=200, n_events=3000, seed=11, epoch_size=600,
                          p_delete=0.15, content_mean_bytes=128)


def test_bulk_replay_matches_oracle(tmp_path, small_cfg):
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    replay(events_dir, lake_dir, CdcConfig(num_partitions=8), mode="bulk")

    want_digest, want_rows = _oracle_digest(small_cfg)
    assert read_lake(lake_dir).count() == want_rows
    assert lake_global_digest(lake_dir) == want_digest


def test_incremental_replay_matches_oracle_and_bulk(tmp_path, small_cfg):
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)

    lake_inc, lake_bulk = str(tmp_path / "inc"), str(tmp_path / "bulk")
    results = replay(events_dir, lake_inc, CdcConfig(num_partitions=8), mode="incremental")
    assert all(not r["skipped"] for r in results)
    replay(events_dir, lake_bulk, CdcConfig(num_partitions=8), mode="bulk")

    want_digest, want_rows = _oracle_digest(small_cfg)
    assert lake_global_digest(lake_inc) == want_digest
    assert lake_global_digest(lake_bulk) == want_digest
    assert read_lake(lake_inc).count() == want_rows
    # manifest-level digest agrees between the two replays (same P)
    assert manifest_digest(lake_inc) == manifest_digest(lake_bulk)


def test_resume_from_manifest(tmp_path, small_cfg):
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8)

    # "crash" after the first two epochs
    replay(events_dir, lake_dir, cfg, mode="incremental", epochs=[0, 1])
    assert ManifestStore(lake_dir).committed_epoch() == 1

    # resume over the FULL epoch list: committed epochs are skipped
    results = replay(events_dir, lake_dir, cfg, mode="incremental")
    assert [r["epoch"] for r in results if r["skipped"]] == [0, 1]

    want_digest, _ = _oracle_digest(small_cfg)
    assert lake_global_digest(lake_dir) == want_digest


def test_replay_is_idempotent(tmp_path, small_cfg):
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake_dir, cfg, mode="incremental")
    d1 = lake_global_digest(lake_dir)
    # replaying the whole tail again converges to the same state
    results = replay(events_dir, lake_dir, cfg, mode="incremental")
    assert all(r["skipped"] for r in results)
    assert lake_global_digest(lake_dir) == d1


def test_exactly_once_under_duplicate_delivery(tmp_path):
    cfg_ev = EventGenConfig(n_keys=150, n_events=2000, seed=5, epoch_size=500,
                            dup_fraction=0.15, content_mean_bytes=128)
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(cfg_ev, events_dir)
    replay(events_dir, lake_dir, CdcConfig(num_partitions=8), mode="incremental")

    # oracle over the DE-DUPed stream == engine state under duplicates
    want_digest, want_rows = _oracle_digest(cfg_ev)
    assert read_lake(lake_dir).count() == want_rows
    assert lake_global_digest(lake_dir) == want_digest


def test_hot_key_skew_correctness(tmp_path):
    cfg_ev = EventGenConfig(n_keys=100, n_events=4000, seed=9, epoch_size=1000,
                            hot_fraction=0.05, hot_event_fraction=0.6,
                            content_mean_bytes=128)
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(cfg_ev, events_dir)
    replay(events_dir, lake_dir, CdcConfig(num_partitions=8), mode="bulk")
    want_digest, _ = _oracle_digest(cfg_ev)
    assert lake_global_digest(lake_dir) == want_digest


def test_staged_shuffle_matches_groupby(tmp_path, small_cfg):
    """The storage-backed exchange must produce a byte-identical lake to the
    Dataset-native groupby exchange (same P → same manifest digest)."""
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)
    lake_g, lake_s = str(tmp_path / "g"), str(tmp_path / "s")
    replay(events_dir, lake_g, CdcConfig(num_partitions=8), mode="bulk")
    replay(events_dir, lake_s, CdcConfig(num_partitions=8, shuffle_mode="staged"),
           mode="bulk")
    assert manifest_digest(lake_s) == manifest_digest(lake_g)
    assert lake_global_digest(lake_s) == _oracle_digest(small_cfg)[0]
    import os

    assert not os.path.exists(os.path.join(lake_s, "_stage"))  # cleaned up


def test_staged_incremental_resume(tmp_path, small_cfg):
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=8, shuffle_mode="staged")
    replay(events_dir, lake, cfg, mode="incremental", epochs=[0, 1])
    results = replay(events_dir, lake, cfg, mode="incremental")
    assert [r["epoch"] for r in results if r["skipped"]] == [0, 1]
    assert lake_global_digest(lake) == _oracle_digest(small_cfg)[0]


def test_epoch_fence_refuses_stale_writer(tmp_path, small_cfg):
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake_dir, cfg, mode="incremental")
    committed = ManifestStore(lake_dir).committed_epoch()
    # a stale writer trying to re-commit an old epoch is refused at the
    # manifest (apply_epoch skips; direct commit raises)
    store = ManifestStore(lake_dir)
    with pytest.raises(RuntimeError, match="epoch fence"):
        store.commit_epoch(committed, [])
    res = apply_epoch(rd.range(0), lake_dir, committed, cfg)
    assert res["skipped"]


def test_per_row_sha_invariant(tmp_path, small_cfg):
    """Every surviving row's stored content_sha256 == sha256(content)."""
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    replay(events_dir, lake_dir, CdcConfig(num_partitions=4), mode="bulk")
    for row in read_lake(lake_dir).take_all():
        assert row["content_sha256"] == hashlib.sha256(
            row["content"].encode()
        ).hexdigest()


# --------------------------------------------------------------------------
# delta write mode (merge-on-read)
# --------------------------------------------------------------------------


def test_delta_mode_matches_cow_and_oracle(tmp_path, small_cfg):
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)
    lake_cow, lake_delta = str(tmp_path / "cow"), str(tmp_path / "delta")
    replay(events_dir, lake_cow, CdcConfig(num_partitions=8),
           mode="incremental")
    replay(events_dir, lake_delta,
           CdcConfig(num_partitions=8, write_mode="delta"), mode="incremental")

    want_digest, want_rows = _oracle_digest(small_cfg)
    assert lake_global_digest(lake_delta) == want_digest
    assert read_lake(lake_delta).count() == want_rows
    # per-partition digests identical → same manifest digest as cow
    assert manifest_digest(lake_delta) == manifest_digest(lake_cow)
    # deltas really exist (merge-on-read path exercised)
    m = ManifestStore(lake_delta).load()
    assert any(ps.delta_epochs for ps in m.partitions.values())


def test_delta_mode_resume_and_idempotence(tmp_path, small_cfg):
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8, write_mode="delta")
    replay(events_dir, lake_dir, cfg, mode="incremental", epochs=[0, 1])
    results = replay(events_dir, lake_dir, cfg, mode="incremental")
    assert [r["epoch"] for r in results if r["skipped"]] == [0, 1]
    want_digest, _ = _oracle_digest(small_cfg)
    assert lake_global_digest(lake_dir) == want_digest
    # full re-replay is a no-op
    again = replay(events_dir, lake_dir, cfg, mode="incremental")
    assert all(r["skipped"] for r in again)
    assert lake_global_digest(lake_dir) == want_digest


def test_delta_mode_compact_reconciles(tmp_path, small_cfg):
    from horizon_etl_ray.pipelines.cdc import compact

    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8, write_mode="delta")
    replay(events_dir, lake_dir, cfg, mode="incremental")
    want_digest, want_rows = _oracle_digest(small_cfg)

    res = compact(lake_dir, cfg)
    assert res["files_gc"] > 0
    m = ManifestStore(lake_dir).load()
    assert all(not ps.delta_epochs for ps in m.partitions.values())
    assert lake_global_digest(lake_dir) == want_digest
    assert read_lake(lake_dir).count() == want_rows
    # tombstones dropped, none left behind
    assert all(ps.tombstones == 0 for ps in m.partitions.values())


def test_delta_mode_write_amplification_bounded(tmp_path):
    """The wide payload is written once per event in delta mode: total
    payload bytes across base+delta files stay near the bulk single-write
    size, while cow rewrites full state per epoch (superseded files)."""
    import glob
    import os

    # many keys, few touched per epoch — the tail-follow shape where cow
    # write amplification hurts (each epoch rewrites the whole growing state)
    cfg_ev = EventGenConfig(n_keys=6000, n_events=8000, seed=3,
                            epoch_size=1000, content_mean_bytes=512)
    events_dir = str(tmp_path / "events")
    write_events(cfg_ev, events_dir)
    lake_cow, lake_delta = str(tmp_path / "cow"), str(tmp_path / "delta")
    replay(events_dir, lake_cow, CdcConfig(num_partitions=4),
           mode="incremental")
    replay(events_dir, lake_delta,
           CdcConfig(num_partitions=4, write_mode="delta"), mode="incremental")

    def du(d, pat):
        return sum(os.path.getsize(p) for p in glob.glob(f"{d}/part_id=*/{pat}"))

    cow_total = du(lake_cow, "epoch=*.parquet")  # all epochs incl. superseded
    delta_payload = (du(lake_delta, "epoch=*.parquet")
                     + du(lake_delta, "delta-*.parquet"))
    # cow rewrites the whole growing state every epoch (Σ state_e ≈ 4× the
    # final size here); delta writes each event's payload once
    assert delta_payload < cow_total / 2, (delta_payload, cow_total)


def test_partial_combiner_bounds_hot_key_shuffle(tmp_path):
    """Adversarial skew: ONE key receives 50% of all events. The per-block
    LWW combiner must collapse it to ≤ #read-blocks rows entering the
    exchange (the skew defence of SURVEY.md §7.5)."""
    import numpy as np

    from horizon_etl_ray.pipelines.cdc import CdcConfig, _partial_stage

    cfg_ev = EventGenConfig(n_keys=2000, n_events=40_000, seed=9,
                            epoch_size=40_000, hot_fraction=1e-9,
                            hot_event_fraction=0.5, content_mean_bytes=64)
    events_dir = str(tmp_path / "events")
    write_events(cfg_ev, events_dir)

    B = 8
    ds = rd.read_parquet(events_dir, override_num_blocks=B)
    cfg = CdcConfig(num_partitions=8)
    shuffled = ds.map_batches(
        _partial_stage(cfg, np.full(8, -1, dtype=np.int64)),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()

    per_key = shuffled.groupby(["repo", "path"]).size()
    hot_rows = int(per_key.max())
    assert hot_rows <= B, f"hot key shipped {hot_rows} rows > {B} blocks"
    # and the exchange as a whole is collapsed far below the input size
    assert len(shuffled) < 40_000 / 2


def test_orphan_epoch_files_invisible_until_committed(tmp_path, small_cfg):
    """A crash AFTER a partition data write but BEFORE the manifest commit
    leaves an orphan file: readers must not see it, and a retry must
    converge to the oracle digest."""
    import os

    import pyarrow as pa

    from horizon_etl_ray.state.manifest import atomic_write_table

    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(small_cfg, events_dir)
    cfg = CdcConfig(num_partitions=8)
    replay(events_dir, lake_dir, cfg, mode="incremental", epochs=[0, 1])
    d_before = lake_global_digest(lake_dir)

    # simulate the crashed epoch-2 writer: an orphan data file, no commit
    orphan = pa.table({
        "repo": ["evil"], "path": ["x"], "commit": ["c"], "lang": ["py"],
        "content": ["boom"], "seq": [10**9], "op": ["update"],
        "content_sha256": ["0" * 64], "deleted": [False]})
    atomic_write_table(
        os.path.join(lake_dir, "part_id=0", "epoch=2.parquet"), orphan)

    assert lake_global_digest(lake_dir) == d_before  # orphan invisible
    # resume overwrites the orphan and commits properly
    replay(events_dir, lake_dir, cfg, mode="incremental")
    assert lake_global_digest(lake_dir) == _oracle_digest(small_cfg)[0]


def test_staged_shuffle_composes_with_delta_mode(tmp_path, small_cfg):
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=8, shuffle_mode="staged",
                    write_mode="delta")
    replay(events_dir, lake, cfg, mode="incremental")
    assert lake_global_digest(lake) == _oracle_digest(small_cfg)[0]
    m = ManifestStore(lake).load()
    assert any(ps.delta_epochs for ps in m.partitions.values())


def test_delta_mode_with_add_column_evolution(tmp_path, small_cfg):
    """Schema evolution (add_column — the delta-safe class) composes with
    merge-on-read: old deltas conform on read, digests match cow."""
    import pyarrow as pa

    from horizon_etl_ray.stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("commit", pa.string()), ("lang", pa.string()),
                     ("content", pa.string())],
        script=[{"epoch": 2, "op": "add_column", "name": "size_bytes",
                 "type": "int64"}],
    )
    events_dir = str(tmp_path / "events")
    write_events(small_cfg, events_dir)
    lakes = {}
    for mode in ("cow", "delta"):
        lake = str(tmp_path / mode)
        cfg = CdcConfig(num_partitions=8, write_mode=mode,
                        schema_script=script)
        replay(events_dir, lake, cfg, mode="incremental")
        lakes[mode] = (lake, cfg)
    assert (lake_global_digest(lakes["cow"][0])
            == lake_global_digest(lakes["delta"][0])
            == _oracle_digest(small_cfg)[0])
    # evolved column present in the committed delta view
    cols = read_lake(*[lakes["delta"][0]], cfg=lakes["delta"][1]).schema().names
    assert "size_bytes" in cols


def test_wide_content_rows_replay(tmp_path):
    """SURVEY §7.5 hard part 5: multi-hundred-KB content strings flow
    through validate → combiner → exchange → merge intact (large payloads,
    digest-exact vs the oracle)."""
    cfg_ev = EventGenConfig(n_keys=60, n_events=400, seed=13, epoch_size=200,
                            content_mean_bytes=65_536,
                            content_max_bytes=262_144)
    events_dir, lake_dir = str(tmp_path / "events"), str(tmp_path / "lake")
    write_events(cfg_ev, events_dir)
    replay(events_dir, lake_dir, CdcConfig(num_partitions=4),
           mode="incremental")
    want_digest, want_rows = _oracle_digest(cfg_ev)
    assert read_lake(lake_dir).count() == want_rows
    assert lake_global_digest(lake_dir) == want_digest
    # the big payloads really are big
    sizes = [len(r["content"]) for r in read_lake(lake_dir).take(50)]
    assert max(sizes) > 100_000
