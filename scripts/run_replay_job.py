"""CDC replay as a Ray job — the `ray job submit` entry point of the north
rule. On a cluster:

    ray job submit --working-dir . -- python scripts/run_replay_job.py \
        --events /mnt/shared/events --lake /mnt/shared/lake \
        --partitions 512 --mode incremental

Paths must be POSIX (a shared mount on a multi-node cluster): the staged
exchange and the manifest commit use local file APIs (os.replace rename
atomicity), so raw object-store URIs are rejected up front.

Locally (sandbox) it runs the same driver against local paths. The job is
idempotent and resumable: committed epochs are skipped via the manifest,
replayed events are dropped by the per-partition seq fence, so re-submitting
after any failure converges (SURVEY.md §7.5 hard part 1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fresh_export_dir(ap, path: str, flag: str) -> None:
    """Parquet exports append uniquely-named files, so re-running into a
    non-empty dir silently doubles the handoff (and the readback count);
    refuse instead — point each run at a fresh dir (review fix)."""
    if os.path.isdir(path) and os.listdir(path):
        ap.error(f"{flag} {path} already exists and is not empty; exports "
                 "append files, so a re-run would duplicate rows — pass a "
                 "fresh directory")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True, help="event-tail parquet dir")
    ap.add_argument("--lake", required=True, help="lake output dir")
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--mode", choices=["bulk", "incremental"], default="incremental")
    ap.add_argument("--shuffle", choices=["groupby", "staged"], default="staged")
    ap.add_argument("--write-mode", choices=["cow", "delta"], default="cow",
                    help="delta = per-epoch delta files + merge-on-read "
                         "(tail-follow deployments; run --compact to "
                         "reconcile)")
    ap.add_argument("--compact", action="store_true",
                    help="after the replay, reconcile deltas into single "
                         "bases, drop tombstones and GC superseded files")
    ap.add_argument("--read-blocks", type=int, default=None)
    ap.add_argument("--report", action="store_true",
                    help="after the replay, render report.json + report.md "
                         "under <lake>/_reports from the manifest lineage "
                         "(pipelines/report.py)")
    ap.add_argument("--read-key", action="append", default=None,
                    metavar="REPO,PATH",
                    help="after the replay, point-read these keys (repeat "
                         "the flag; opens only the owning partitions) and "
                         "print the rows as JSON")
    ap.add_argument("--as-of", type=int, default=None, metavar="EPOCH",
                    help="serve --read-key (or a row count) from the lake "
                         "AS OF this epoch (time travel) instead of the "
                         "latest commit")
    ap.add_argument("--changes", default=None, metavar="FROM[,TO]",
                    help="after the replay, read the change feed over the "
                         "(FROM, TO] epoch window (TO defaults to the "
                         "committed epoch) and print per-op counts")
    ap.add_argument("--changes-out", default=None, metavar="DIR",
                    help="with --changes: also write the feed as parquet "
                         "to DIR (the downstream-consumer handoff)")
    ap.add_argument("--changes-key", action="append", default=None,
                    metavar="REPO,PATH",
                    help="restrict --changes to these keys (repeatable): "
                         "the KEY-ROUTED point feed — only the owning "
                         "partitions are diffed")
    ap.add_argument("--changed-fields", action="store_true",
                    help="with --changes: include the per-field "
                         "attribution column in the feed")
    ap.add_argument("--history", action="store_true",
                    help="after the replay, read the SCD-2 history view "
                         "(per-key version intervals) and print version/"
                         "current counts")
    ap.add_argument("--history-key", action="append", default=None,
                    metavar="REPO,PATH",
                    help="restrict --history to these keys (repeatable): "
                         "the key-routed per-entity audit — only the "
                         "owning partitions are walked")
    ap.add_argument("--history-to", type=int, default=None, metavar="EPOCH",
                    help="with --history: truncate the view at this epoch "
                         "(default: the committed epoch)")
    ap.add_argument("--history-out", default=None, metavar="DIR",
                    help="with --history: also write the view as parquet "
                         "to DIR (the dimension-table handoff)")
    ap.add_argument("--history-table", default=None, metavar="DIR",
                    help="maintain a MATERIALIZED SCD-2 history at DIR: "
                         "bootstrap (full walk) when absent, else refresh "
                         "incrementally — only window-touched partitions "
                         "are opened, and the table survives gc of old "
                         "epochs")
    ap.add_argument("--history-forget", action="append", default=None,
                    metavar="REPO,PATH",
                    help="with --history-table: remove EVERY version of "
                         "these keys from the materialized history (LGPD "
                         "right-to-be-forgotten on the audit surface; "
                         "repeat the flag)")
    ap.add_argument("--history-prune", type=int, default=None,
                    metavar="EPOCH",
                    help="with --history-table: drop closed versions whose "
                         "interval ended at or before EPOCH (retention; "
                         "as-of queries past the cutoff stay exact)")
    ap.add_argument("--mart", default=None, metavar="DIR",
                    help="maintain an additive group-by mart at DIR: "
                         "bootstrap (full build) when absent, else refresh "
                         "incrementally from the change feed")
    ap.add_argument("--mart-group", default=None, metavar="COL[,COL...]",
                    help="mart dimension columns (bootstrap only)")
    ap.add_argument("--mart-sum", action="append", default=None,
                    metavar="NAME=COL",
                    help="named column sum metric (repeatable; bootstrap "
                         "only); a row count n_rows is always kept")
    ap.add_argument("--mart-agg", action="append", default=None,
                    metavar="NAME=FUNC:COL",
                    help="named min/max/sum metric (repeatable; bootstrap "
                         "only). Any --mart-agg switches the mart to the "
                         "partition-partial kind: non-additive aggregates "
                         "refreshed by recomputing only the partitions the "
                         "epoch window touched")
    ap.add_argument("--changes-cursor", default=None, metavar="CKPT",
                    help="checkpointed incremental feed consumption "
                         "(replication.FeedCursor): reads the net changes "
                         "since the checkpoint's acked position, writes "
                         "them under --changes-out/window=<from>-<to>/ "
                         "(if given), and acks ONLY after the write lands "
                         "— re-running after a crash re-delivers the same "
                         "window. No new epochs → mode=noop")
    ap.add_argument("--replicate-to", default=None, metavar="DIR",
                    help="mirror the lake into a follower lake at DIR "
                         "(pipelines/replication.py): bootstraps on first "
                         "run, then each run syncs the follower to the "
                         "source head one change-feed window per follower "
                         "epoch; crash-safe via the follower's two-phase "
                         "checkpoint. Re-running with no new source epochs "
                         "reports syncs=0")
    ap.add_argument("--replicate-window", type=int, default=None,
                    metavar="N", help="max committed source epochs per "
                                      "sync (default: all outstanding in "
                                      "one window)")
    args = ap.parse_args()

    if "://" in args.lake or "://" in args.events:
        # The staged exchange + manifest commit use POSIX-local file APIs;
        # an object-store URI would silently commit partial epochs. Require
        # a (shared-)POSIX path — mount the bucket (s3fs/NFS) instead.
        ap.error("--events/--lake must be POSIX paths (shared mount on a "
                 "cluster); object-store URIs are not supported")

    import ray

    if not ray.is_initialized():  # under `ray job submit` the cluster exists
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from horizon_etl_ray.pipelines.cdc import (CdcConfig, compact,
                                               manifest_digest, replay)

    cfg = CdcConfig(num_partitions=args.partitions,
                    shuffle_mode=args.shuffle, write_mode=args.write_mode)
    t0 = time.time()
    results = replay(
        args.events, args.lake, cfg,
        mode=args.mode, override_num_blocks=args.read_blocks,
    )
    applied = [r for r in results if not r.get("skipped")]
    out = {
        "epochs_total": len(results),
        "epochs_applied": len(applied),
        "epochs_skipped": len(results) - len(applied),
        "live_rows": sum(r.get("live_rows", 0) for r in applied),
        "wall_sec": round(time.time() - t0, 2),
        "manifest_digest16": manifest_digest(args.lake)[:16],
    }
    if args.compact:
        c = compact(args.lake, cfg)
        out["compacted_epoch"] = c["epoch"]
        out["tombstones_dropped"] = c["tombstones_dropped"]
        out["files_gc"] = c["files_gc"]
        out["manifest_digest16"] = manifest_digest(args.lake)[:16]
    if args.report:
        from horizon_etl_ray.pipelines.report import write_run_report

        out["report_json"], out["report_md"] = write_run_report(args.lake)
    if args.read_key:
        from horizon_etl_ray.pipelines.cdc import read_lake_at, read_lake_keys

        keys = [tuple(k.split(",", 1)) for k in args.read_key]
        if args.as_of is not None:
            # time travel first, then filter (point reads route via the
            # CURRENT manifest; historical partition files may differ)
            df = read_lake_at(args.lake, args.as_of, cfg=cfg).to_pandas()
            kc = list(cfg.key_columns)
            import pandas as pd

            df = df.merge(pd.DataFrame(keys, columns=kc), on=kc)
        else:
            df = read_lake_keys(args.lake, keys, cfg=cfg).to_pandas()
        out["rows"] = json.loads(
            df.drop(columns=["part_id"], errors="ignore")
            .to_json(orient="records"))
    elif args.as_of is not None:
        from horizon_etl_ray.pipelines.cdc import read_lake_at

        out["rows_as_of"] = int(
            read_lake_at(args.lake, args.as_of, cfg=cfg).count())
    if args.changes:
        from horizon_etl_ray.pipelines.cdc import read_changes

        win = args.changes.split(",")
        fr = int(win[0])
        to = int(win[1]) if len(win) > 1 else None
        fkeys = ([tuple(k.split(",", 1)) for k in args.changes_key]
                 if args.changes_key else None)
        feed = read_changes(args.lake, fr, to, cfg=cfg,
                            changed_fields=args.changed_fields, keys=fkeys)
        if args.changes_out:
            _fresh_export_dir(ap, args.changes_out, "--changes-out")
            feed.write_parquet(args.changes_out)
            out["changes_written"] = args.changes_out
            import ray.data as rd

            ops = rd.read_parquet(args.changes_out, columns=["op"])
        else:
            ops = feed.select_columns(["op"])
        from collections import Counter

        counts: Counter = Counter()
        for b in ops.iter_batches(batch_format="pandas"):
            counts.update(b["op"].value_counts().to_dict())
        out["changes"] = {"from_epoch": fr, "to_epoch": to,
                          **{k: int(v) for k, v in sorted(counts.items())}}
    if args.history:
        from horizon_etl_ray.pipelines.cdc import read_history

        hkeys = ([tuple(k.split(",", 1)) for k in args.history_key]
                 if args.history_key else None)
        hist = read_history(args.lake, to_epoch=args.history_to, cfg=cfg,
                            keys=hkeys)
        if args.history_out:
            _fresh_export_dir(ap, args.history_out, "--history-out")
            hist.write_parquet(args.history_out)
            out["history_written"] = args.history_out
            import ray.data as rd

            cur = rd.read_parquet(args.history_out, columns=["is_current"])
        else:
            cur = hist.select_columns(["is_current"])
        versions = current = 0
        for b in cur.iter_batches(batch_format="pandas"):
            versions += len(b)
            current += int(b["is_current"].sum())
        out["history"] = {"to_epoch": args.history_to, "versions": versions,
                          "current": current}
    if args.history_table:
        from horizon_etl_ray.pipelines.history import (
            build_history,
            history_state,
            refresh_history,
        )

        if history_state(args.history_table) is None:
            out["history_table"] = build_history(
                args.lake, args.history_table, cfg=cfg)
        else:
            out["history_table"] = refresh_history(
                args.lake, args.history_table, cfg=cfg)
        if args.history_forget:
            from horizon_etl_ray.pipelines.history import forget_history_keys

            keys = [tuple(k.split(",")) for k in args.history_forget]
            out["history_forget"] = forget_history_keys(
                args.history_table, keys, cfg=cfg)
        if args.history_prune is not None:
            from horizon_etl_ray.pipelines.history import (
                prune_history_before,
            )

            out["history_prune"] = prune_history_before(
                args.history_table, args.history_prune)
    if args.mart:
        from horizon_etl_ray.pipelines.mart import (
            MartSpec,
            PartitionedMartSpec,
            build_mart,
            build_partitioned_mart,
            mart_state,
            refresh_mart,
            refresh_partitioned_mart,
        )

        state = mart_state(args.mart)
        if state is None:
            if not args.mart_group:
                ap.error("--mart bootstrap needs --mart-group")
            group = tuple(args.mart_group.split(","))
            sums = dict(kv.split("=", 1) for kv in (args.mart_sum or []))
            if args.mart_agg:  # partition-partial kind (min/max capable)
                metrics = {}
                for kv in args.mart_agg:
                    name, spec_s = kv.split("=", 1)
                    fn, col = spec_s.split(":", 1)
                    metrics[name] = (fn, col)
                clash = sorted(set(metrics) & set(sums))
                if clash:
                    ap.error(f"--mart-sum and --mart-agg both define "
                             f"metric(s) {clash}; pick one per name")
                metrics.update({n: ("sum", c) for n, c in sums.items()})
                pspec = PartitionedMartSpec(group_by=group, metrics=metrics)
                out["mart"] = build_partitioned_mart(
                    args.lake, args.mart, pspec, cfg=cfg)
            else:
                out["mart"] = build_mart(
                    args.lake, args.mart,
                    MartSpec(group_by=group, sum_metrics=sums), cfg=cfg)
        elif state.get("kind") == "partitioned":
            out["mart"] = refresh_partitioned_mart(args.lake, args.mart,
                                                   cfg=cfg)
        else:
            out["mart"] = refresh_mart(args.lake, args.mart, cfg=cfg)
    if args.changes_cursor:
        from horizon_etl_ray.pipelines.replication import FeedCursor

        cur = FeedCursor(args.lake, args.changes_cursor, cfg=cfg)
        got = cur.poll(changed_fields=args.changed_fields)
        if got is None:
            out["changes_cursor"] = {"mode": "noop",
                                     "position": cur.position()}
        else:
            feed, fr, to = got
            rec = {"mode": "window", "from_epoch": fr, "to_epoch": to}
            if args.changes_out:
                dst = os.path.join(args.changes_out, f"window={fr}-{to}")
                _fresh_export_dir(ap, dst, "--changes-out window")
                feed.write_parquet(dst)
                rec["written"] = dst
                import ray.data as rd

                rec["rows"] = int(rd.read_parquet(
                    dst, columns=["op"]).count())
            else:
                rec["rows"] = int(feed.count())
            cur.ack(to)  # consumption is durable — advance the position
            out["changes_cursor"] = rec
    if args.replicate_to:
        from horizon_etl_ray.pipelines.replication import replicate
        from horizon_etl_ray.state.manifest import ManifestStore

        st = replicate(args.lake, args.replicate_to, cfg=cfg,
                       max_epochs_per_sync=args.replicate_window)
        # live-row count from the follower's manifest (maintained per
        # commit) — a read_replica().count() here would re-scan the whole
        # follower just for a status line (review finding)
        fm = ManifestStore(args.replicate_to).load()
        out["replicate"] = {**st,
                            "follower_rows": int(
                                sum(ps.row_count
                                    for ps in fm.partitions.values()))}
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
