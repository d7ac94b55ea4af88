"""Multi-phase CDC pipeline driver — the reference's weekly entry
(`src/flows/pipelines/weekly_orchestrator.py`) over the Ray engine: a
declared phase list (replay → compact → report → export) run through
``pipelines/orchestrator.py`` with per-phase timeouts, critical flags and
manifest-based resume.

    python scripts/run_pipeline_job.py --events <dir> --lake <dir> \
        [--partitions 128] [--state-dir <dir>] [--compact-timeout 1800]

Re-running after any failure resumes: succeeded phases are skipped via the
phase checkpoint, and the replay phase itself is epoch-idempotent on top of
that. Exit code 0 = all critical phases green (report/export are
degradable, like the reference's non-critical analytics phases)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True)
    ap.add_argument("--lake", required=True)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--write-mode", choices=["cow", "delta"], default="cow")
    ap.add_argument("--state-dir", default=None,
                    help="phase-checkpoint dir (default <lake>/_orchestrator)")
    ap.add_argument("--replay-timeout", type=float, default=3600)
    ap.add_argument("--compact-timeout", type=float, default=1800)
    ap.add_argument("--export-dir", default=None,
                    help="also export the committed lake view as resumable "
                         "sharded parquet (skipped when omitted)")
    ap.add_argument("--export-shards", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from horizon_etl_ray.pipelines.cdc import (CdcConfig, compact, read_lake,
                                               replay)
    from horizon_etl_ray.pipelines.export import export_sharded_corpus
    from horizon_etl_ray.pipelines.orchestrator import (CallbackNotifier,
                                                        PhaseSpec, run_phases)
    from horizon_etl_ray.pipelines.report import write_run_report

    cfg = CdcConfig(num_partitions=args.partitions,
                    write_mode=args.write_mode)
    events = []  # phase-end log rendered into the job summary

    notifier = CallbackNotifier(
        on_phase_end=lambda r: events.append(
            {"phase": r.name, "status": r.status,
             "seconds": round(r.seconds, 2)}),
    )

    phases = [
        PhaseSpec("replay", lambda: replay(args.events, args.lake, cfg),
                  timeout_sec=args.replay_timeout, critical=True),
        PhaseSpec("compact", lambda: compact(args.lake, cfg),
                  timeout_sec=args.compact_timeout, critical=False),
        # report/export degrade like the reference's analytics phases
        PhaseSpec("report", lambda: write_run_report(args.lake),
                  timeout_sec=300, critical=False),
    ]
    if args.export_dir:
        key0 = cfg.key_columns[0]
        phases.append(PhaseSpec(
            "export",
            lambda: export_sharded_corpus(
                read_lake(args.lake, cfg=cfg), args.export_dir,
                id_column=key0, num_shards=args.export_shards),
            timeout_sec=1800, critical=False))
    rc, results = run_phases(
        phases,
        state_dir=args.state_dir or os.path.join(args.lake, "_orchestrator"),
        notifier=notifier,
    )
    print(json.dumps({
        "rc": rc,
        "phases": [r.to_json() for r in results],
        "events": events,
    }))
    ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
