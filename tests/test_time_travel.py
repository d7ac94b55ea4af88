"""Lake time travel (read_lake_at): the state AS OF epoch E, reconstructed
from the manifest's append-only per-epoch lineage records, must equal a
fresh prefix replay of exactly the epochs ≤ E — in both storage modes —
and must fail loudly (not serve mixed state) once gc() reclaimed history."""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.pipelines.cdc import (CdcConfig, read_lake,
                                           read_lake_at, replay)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events
from horizon_etl_ray.state.manifest import ManifestStore

KCOLS = ["repo", "path"]


def _canon(df):
    df = df.drop(columns=["part_id"], errors="ignore")
    return (df.sort_values(KCOLS).reset_index(drop=True)
            [sorted(df.columns)])


@pytest.fixture(scope="module")
def events(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tt") / "events")
    write_events(EventGenConfig(n_keys=150, n_events=4000, seed=11,
                                epoch_size=1000), d)
    return d


@pytest.mark.parametrize("write_mode", ["cow", "delta"])
def test_time_travel_equals_prefix_replay(ray_session, tmp_path, events,
                                          write_mode):
    cfg = CdcConfig(num_partitions=8, write_mode=write_mode)
    lake = str(tmp_path / f"lake_{write_mode}")
    replay(events, lake, cfg, mode="incremental")
    for e in (0, 2):
        prefix_lake = str(tmp_path / f"prefix_{write_mode}_{e}")
        replay(events, prefix_lake, cfg, mode="incremental",
               epochs=list(range(e + 1)))
        got = read_lake_at(lake, e, cfg=cfg).to_pandas()
        exp = read_lake(prefix_lake, cfg=cfg).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_time_travel_latest_equals_read_lake(ray_session, tmp_path, events):
    cfg = CdcConfig(num_partitions=8)
    lake = str(tmp_path / "lake")
    replay(events, lake, cfg, mode="incremental")
    cur = ManifestStore(lake).load().epoch
    got = read_lake_at(lake, cur, cfg=cfg).to_pandas()
    exp = read_lake(lake, cfg=cfg).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def test_time_travel_tombstones_as_of_epoch(ray_session, tmp_path, events):
    """A key deleted in a LATER epoch must still be visible as of the
    earlier epoch — and its tombstone row only shows with
    include_tombstones at the later epoch."""
    cfg = CdcConfig(num_partitions=8)
    lake = str(tmp_path / "lake")
    replay(events, lake, cfg, mode="incremental")
    cur = ManifestStore(lake).load().epoch
    early = read_lake_at(lake, 0, cfg=cfg).to_pandas()
    late_ts = read_lake_at(lake, cur, cfg=cfg,
                           include_tombstones=True).to_pandas()
    died = late_ts[late_ts["deleted"]].merge(early[KCOLS], on=KCOLS)
    assert len(died) > 0, "some epoch-0 key should be deleted later"
    # as of epoch 0 those keys are live rows, not tombstones
    alive0 = early.merge(died[KCOLS], on=KCOLS)
    assert len(alive0) == len(died[KCOLS].drop_duplicates())


def test_time_travel_after_gc_raises(ray_session, tmp_path, events):
    """gc(keep_epochs=0) reclaims superseded cow bases: travel to a
    reclaimed epoch raises (naming gc), the latest epoch still reads."""
    cfg = CdcConfig(num_partitions=8)
    lake = str(tmp_path / "lake")
    replay(events, lake, cfg, mode="incremental")
    store = ManifestStore(lake)
    removed = store.gc(keep_epochs=0)
    assert removed > 0
    with pytest.raises(FileNotFoundError, match="gc"):
        read_lake_at(lake, 0, cfg=cfg).to_pandas()
    cur = store.load().epoch
    got = read_lake_at(lake, cur, cfg=cfg).to_pandas()
    pd.testing.assert_frame_equal(
        _canon(got), _canon(read_lake(lake, cfg=cfg).to_pandas()))


def test_orphan_epoch_record_is_not_served(ray_session, tmp_path, events):
    """commit_epoch writes the lineage record first and current.json last —
    a writer crashing between the two leaves an orphan epoch=N.json.
    read_lake_at must clamp at the COMMITTED epoch and never fold it."""
    import json
    import os

    cfg = CdcConfig(num_partitions=8)
    lake = str(tmp_path / "lake")
    replay(events, lake, cfg, mode="incremental")
    store = ManifestStore(lake)
    cur = store.load().epoch
    recs = store.epoch_records()
    orphan = dict(recs[-1])
    orphan["epoch"] = cur + 1
    # fabricate a never-committed record claiming an empty partition 0
    orphan["partitions"] = [dict(recs[-1]["partitions"][0],
                                 row_count=0, tombstones=0)]
    with open(os.path.join(lake, "_manifest",
                           f"epoch={cur + 1}.json"), "w") as f:
        json.dump(orphan, f)
    got = read_lake_at(lake, cur + 1, cfg=cfg).to_pandas()
    exp = read_lake(lake, cfg=cfg).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
