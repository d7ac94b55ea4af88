"""Human-readable run reports rendered from the lake manifest.

Re-expresses the reference's ETL flow reporter
(`/root/reference/src/core/logic/etl_flow_reporter.py:439-557`): after a run
it writes a machine-readable JSON report plus a Markdown rendering with
per-step durations, table row-count deltas and duplicate/dead-letter counts.
Here the single source of truth is what the engine already records — the
manifest's append-only per-epoch lineage records (`state/manifest.py:225-233`,
each carrying the touched partitions' row/tombstone counts and the apply
metrics) and the dead-letter quarantine directory — so the report is a pure
READBACK: it can be (re)rendered at any time, for any lake, without having
observed the run (the reference reporter must wrap every step as it happens;
a crashed run loses its report).

Write discipline = K1: atomic temp+fsync+rename via the manifest helpers,
plus the never-empty guard — an empty report (no committed epochs) never
overwrites an existing non-empty one.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Any

from ..state.manifest import ManifestStore, atomic_write_bytes

__all__ = ["build_run_report", "render_markdown", "write_run_report"]


def _quarantine_summary(lake_dir: str) -> dict:
    qdir = os.path.join(lake_dir, "_quarantine")
    if not os.path.isdir(qdir):
        return {"files": 0, "rows": 0}
    import pyarrow.parquet as pq

    files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
    rows = 0
    for f in files:
        rows += pq.read_metadata(os.path.join(qdir, f)).num_rows
    return {"files": len(files), "rows": rows}


def build_run_report(lake_dir: str) -> dict:
    """Reconstruct the run history from the manifest: one row per committed
    epoch with its duration, touched partitions, and the GLOBAL live-row /
    tombstone totals before→after (the reference's table deltas — derived by
    folding each epoch's partition states over the running lake state, so no
    per-epoch full-lake scan is ever needed)."""
    store = ManifestStore(lake_dir)
    manifest = store.load()
    records = store.epoch_records()

    live: dict[int, int] = {}
    tomb: dict[int, int] = {}
    epochs: list[dict[str, Any]] = []
    for rec in sorted(records, key=lambda r: r["epoch"]):
        before_live, before_tomb = sum(live.values()), sum(tomb.values())
        for ps in rec.get("partitions", []):
            live[ps["part_id"]] = ps["row_count"]
            tomb[ps["part_id"]] = ps["tombstones"]
        after_live, after_tomb = sum(live.values()), sum(tomb.values())
        metrics = rec.get("metrics", {})
        epochs.append({
            "epoch": rec["epoch"],
            "committed_at": datetime.fromtimestamp(
                rec.get("committed_unix", 0), tz=timezone.utc
            ).isoformat(),
            "seconds": metrics.get("seconds"),
            "mode": metrics.get("mode", "apply"),
            "partitions_updated": len(rec.get("partitions", [])),
            "live_rows_before": before_live,
            "live_rows_after": after_live,
            "live_rows_delta": after_live - before_live,
            "tombstones_before": before_tomb,
            "tombstones_after": after_tomb,
            "tombstones_delta": after_tomb - before_tomb,
        })

    return {
        "lake_dir": os.path.abspath(lake_dir),
        "generated_at": datetime.now(tz=timezone.utc).isoformat(),
        "committed_epoch": manifest.epoch,
        "schema_version": manifest.schema_version,
        "partitions": len(manifest.partitions),
        "live_rows": sum(ps.row_count for ps in manifest.partitions.values()),
        "tombstones": sum(ps.tombstones for ps in manifest.partitions.values()),
        "quarantine": _quarantine_summary(lake_dir),
        "epochs": epochs,
    }


def render_markdown(report: dict) -> str:
    r = report
    lines = [
        "# CDC run report",
        "",
        f"- lake: `{r['lake_dir']}`",
        f"- generated: {r['generated_at']}",
        f"- committed epoch: **{r['committed_epoch']}** "
        f"(schema v{r['schema_version']})",
        f"- partitions: {r['partitions']}",
        f"- live rows: **{r['live_rows']}**, tombstones: {r['tombstones']}",
        f"- quarantined (dead-letter): {r['quarantine']['rows']} rows in "
        f"{r['quarantine']['files']} files",
        "",
        "| epoch | mode | committed at | sec | parts | live Δ | live after |"
        " tomb Δ |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for e in r["epochs"]:
        sec = "" if e["seconds"] is None else f"{e['seconds']:.2f}"
        lines.append(
            f"| {e['epoch']} | {e['mode']} | {e['committed_at']} | {sec} | "
            f"{e['partitions_updated']} | {e['live_rows_delta']:+d} | "
            f"{e['live_rows_after']} | {e['tombstones_delta']:+d} |"
        )
    lines.append("")
    return "\n".join(lines)


def write_run_report(lake_dir: str, out_dir: str | None = None
                     ) -> tuple[str, str]:
    """Render and atomically write ``report.json`` + ``report.md`` (default
    location: ``<lake>/_reports``). Never-empty guard: a report with zero
    epochs refuses to replace an existing non-empty report."""
    report = build_run_report(lake_dir)
    out_dir = out_dir or os.path.join(lake_dir, "_reports")
    os.makedirs(out_dir, exist_ok=True)
    json_path = os.path.join(out_dir, "report.json")
    md_path = os.path.join(out_dir, "report.md")
    if not report["epochs"] and os.path.exists(json_path):
        with open(json_path) as f:
            if json.load(f).get("epochs"):
                raise RuntimeError(
                    "refusing to overwrite a non-empty run report with an "
                    f"empty one ({json_path}); delete it explicitly if the "
                    "lake was reset"
                )
    atomic_write_bytes(
        json_path,
        json.dumps(report, indent=2, sort_keys=True).encode())
    atomic_write_bytes(md_path, render_markdown(report).encode())
    return json_path, md_path
