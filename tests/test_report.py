"""Run-report writer: manifest → report.json + report.md readback
(reference: etl_flow_reporter.py — per-step durations, table deltas,
dead-letter counts)."""

import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.pipelines.cdc import CdcConfig, apply_epoch, read_lake, replay
from horizon_etl_ray.pipelines.report import (build_run_report,
                                              render_markdown,
                                              write_run_report)
from horizon_etl_ray.sources.generator import EventGenConfig, write_events


@pytest.fixture()
def lake3(tmp_path, ray_session):
    """A 3-epoch incremental replay (with one quarantined row fed through a
    4th apply) to report on."""
    gen = EventGenConfig(n_keys=150, n_events=1800, seed=7, epoch_size=600,
                         p_delete=0.15, content_mean_bytes=64)
    events = str(tmp_path / "events")
    lake = str(tmp_path / "lake")
    write_events(gen, events)
    replay(events, lake, CdcConfig(num_partitions=8), mode="incremental")
    # one malformed event (bad op) → dead-letter; one valid row applies
    bad = pa.table({
        "repo": ["r", "r"], "path": ["p", "q"], "seq": [10**9, 10**9 + 1],
        "op": ["frobnicate", "insert"], "content": ["x", "y"],
    })
    apply_epoch(rd.from_arrow(bad), lake, epoch=10**6,
                cfg=CdcConfig(num_partitions=8))
    return lake


def test_report_content_three_epoch_replay(lake3):
    report = build_run_report(lake3)
    assert report["committed_epoch"] == 10**6
    assert len(report["epochs"]) == 4
    # epoch rows carry durations and monotone commit order
    assert all(e["seconds"] is not None and e["seconds"] >= 0
               for e in report["epochs"])
    assert [e["epoch"] for e in report["epochs"]] == sorted(
        e["epoch"] for e in report["epochs"])
    # the folded after-state of the last epoch equals the manifest totals,
    # and the manifest totals equal what the lake actually serves
    last = report["epochs"][-1]
    assert last["live_rows_after"] == report["live_rows"]
    assert report["live_rows"] == read_lake(lake3).count()
    # first epoch starts from an empty lake
    assert report["epochs"][0]["live_rows_before"] == 0
    assert report["epochs"][0]["live_rows_delta"] == \
        report["epochs"][0]["live_rows_after"]
    # the malformed row is accounted as dead-letter, the valid one applied
    assert report["quarantine"]["rows"] == 1
    assert last["live_rows_delta"] >= 1


def test_report_files_written_and_rerenderable(lake3):
    json_path, md_path = write_run_report(lake3)
    with open(json_path) as f:
        on_disk = json.load(f)
    assert len(on_disk["epochs"]) == 4
    md = open(md_path).read()
    assert "# CDC run report" in md
    for e in on_disk["epochs"]:
        assert f"| {e['epoch']} |" in md
    assert f"live rows: **{on_disk['live_rows']}**" in md
    # pure readback: re-rendering is deterministic modulo the timestamp
    again = build_run_report(lake3)
    a, b = dict(on_disk), dict(again)
    a.pop("generated_at"), b.pop("generated_at")
    assert a == b
    assert render_markdown(again).splitlines()[0] == "# CDC run report"


def test_report_never_empty_guard(lake3, tmp_path):
    out = str(tmp_path / "reports")
    write_run_report(lake3, out_dir=out)
    # an empty lake's report must not clobber the non-empty one
    empty_lake = str(tmp_path / "empty_lake")
    os.makedirs(os.path.join(empty_lake))
    from horizon_etl_ray.state.manifest import ManifestStore

    ManifestStore(empty_lake)  # creates an empty manifest dir lazily on load
    with pytest.raises(RuntimeError, match="refusing to overwrite"):
        write_run_report(empty_lake, out_dir=out)
