"""Key-routed point reads over the committed lake (read_lake_keys) and the
manifest's partition-width fence: lookups must see exactly the full-scan
state while opening ONLY the owning partitions."""

import glob
import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.functions.hashing import partition_ids
from horizon_etl_ray.pipelines.cdc import (CdcConfig, read_lake,
                                           read_lake_keys, replay)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore

KCOLS = ["repo", "path"]


def _build(tmp_path, write_mode):
    gen = EventGenConfig(n_keys=200, n_events=3000, seed=5, epoch_size=1000)
    events = str(tmp_path / "events")
    lake = str(tmp_path / f"lake_{write_mode}")
    write_events(gen, events)
    cfg = CdcConfig(num_partitions=8, write_mode=write_mode)
    replay(events, lake, cfg, mode="incremental")
    return lake, cfg


def _canon(df):
    # part_id is routing metadata, not state — drop it from state compares
    # (every read path emits it as int32; test_part_id_dtype_parity pins it)
    df = df.drop(columns=["part_id"], errors="ignore")
    return (df.sort_values(KCOLS).reset_index(drop=True)
            [sorted(df.columns)])


@pytest.mark.parametrize("write_mode", ["cow", "delta"])
def test_point_read_matches_full_scan(ray_session, tmp_path, write_mode):
    """Point read == full read filtered to the same keys, in both storage
    modes (cow direct, delta merge-on-read), absent keys included."""
    lake, cfg = _build(tmp_path, write_mode)
    full = read_lake(lake, cfg=cfg).to_pandas()
    want = [tuple(r) for r in full[KCOLS].head(7).itertuples(index=False)]
    want.append(("no-such-repo", "no/such/path"))
    got = read_lake_keys(lake, want, cfg=cfg).to_pandas()
    exp = full.merge(pd.DataFrame(want, columns=KCOLS), on=KCOLS)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_point_read_sees_tombstones_only_on_request(ray_session, tmp_path):
    """A deleted key is invisible to the default point read and visible
    (deleted=True) with include_tombstones — same semantics as read_lake."""
    lake, cfg = _build(tmp_path, "cow")
    ghosts = read_lake(lake, include_tombstones=True, cfg=cfg).to_pandas()
    ghosts = ghosts[ghosts["deleted"]]
    assert len(ghosts) > 0, "generator should produce deletes at this size"
    key = tuple(ghosts[KCOLS].iloc[0])
    assert len(read_lake_keys(lake, [key], cfg=cfg).to_pandas()) == 0
    withts = read_lake_keys(lake, [key], cfg=cfg,
                            include_tombstones=True).to_pandas()
    assert len(withts) == 1 and bool(withts["deleted"].iloc[0])


def test_point_read_opens_only_owning_partitions(ray_session, tmp_path):
    """Pruning proof: corrupt every data file OUTSIDE the owning partitions
    — the point read must still answer (it never opens them) while a full
    scan now fails."""
    lake, cfg = _build(tmp_path, "cow")
    full = read_lake(lake, cfg=cfg).to_pandas()
    key = tuple(full[KCOLS].iloc[0])
    ktab = pa.table({c: pa.array([key[i]]) for i, c in enumerate(KCOLS)})
    owner = int(partition_ids(ktab, KCOLS, cfg.num_partitions)[0])

    broken = str(tmp_path / "lake_broken")
    shutil.copytree(lake, broken)
    for f in glob.glob(os.path.join(broken, "part_id=*", "*.parquet")):
        if f"part_id={owner}" + os.sep not in f + os.sep or \
                os.path.basename(os.path.dirname(f)) != f"part_id={owner}":
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")

    got = read_lake_keys(broken, [key], cfg=cfg).to_pandas()
    exp = full.merge(pd.DataFrame([key], columns=KCOLS), on=KCOLS)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    with pytest.raises(Exception):
        read_lake(broken, cfg=cfg).to_pandas()


def test_partition_width_fence(ray_session, tmp_path):
    """A writer with a different routing width must be refused — same
    failure class as the partition-hash scheme fence."""
    lake, cfg = _build(tmp_path, "cow")
    store = ManifestStore(lake)
    m = store.load()
    assert m.num_partitions == 8  # recorded by the replay commits
    with pytest.raises(RuntimeError, match="partition-count mismatch"):
        store.commit_epoch(m.epoch + 1, [], num_partitions=16)
    # same width passes the fence (epoch advances normally)
    store.commit_epoch(m.epoch + 1, [], num_partitions=8)


def test_point_read_all_absent_keys(ray_session, tmp_path):
    """Keys routing to never-written partitions return an empty dataset
    with the lake's schema, not an error."""
    lake, cfg = _build(tmp_path, "cow")
    out = read_lake_keys(lake, [("ghost", "ghost/path")], cfg=cfg)
    assert len(out.to_pandas()) == 0


def test_legacy_manifest_width_stays_unverified(ray_session, tmp_path):
    """On a NON-empty manifest that predates the recorded width, a writer's
    claimed num_partitions must NOT be laundered into lake truth (it can't
    be checked against anything) — it stays None and the commit proceeds."""
    import json

    lake, cfg = _build(tmp_path, "cow")
    store = ManifestStore(lake)
    cur = store.load()
    raw = cur.to_json()
    del raw["num_partitions"]  # simulate a pre-width manifest
    with open(store.current_path, "w") as f:
        json.dump(raw, f)
    assert store.load().num_partitions is None
    store.commit_epoch(cur.epoch + 1, [], num_partitions=32)  # no fence hit
    assert store.load().num_partitions is None  # and no laundering


def test_part_id_dtype_parity(tmp_path):
    """Every read path serves the SAME schema for the same lake: the cow
    scan's hive-inferred part_id (a directory string) is normalized to the
    int32 the delta merge / point-read / time-travel paths emit."""
    from horizon_etl_ray.pipelines.cdc import read_lake_at

    lake, cfg = _build(tmp_path, "cow")
    want = pa.int32()
    key = tuple(read_lake(lake, cfg=cfg).to_pandas()[KCOLS].iloc[0])
    for ds in (read_lake(lake),
               read_lake_keys(lake, [key], cfg=cfg),
               read_lake_at(lake, 1, cfg=cfg)):
        s = ds.schema(fetch_if_missing=True)
        assert s.types[s.names.index("part_id")] == want
