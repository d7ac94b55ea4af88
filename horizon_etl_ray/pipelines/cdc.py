"""The CDC replay pipeline: binlog tail → validate → hash-partition →
LWW merge-upsert → epoch-fenced lake commit with manifest.

End-to-end dataflow (all Ray Data, streaming with backpressure):

    read_parquet(events epoch dir)                      # the tail micro-batch
      → map_batches(ValidateEvents)                     # zero-copy Arrow, sha256 invariant
      → map_batches(conform to schema version)          # in-flight schema rewrite
      → map_batches(partial LWW + part_id + seq fence)  # combiner before shuffle
      → groupby(part_id).map_groups(MergeWritePartition)# merge w/ prior state,
                                                        # atomic per-partition write
      → (tiny) manifest-row Dataset → ManifestStore.commit_epoch (driver)

Reference lifecycle parity: this is `ProjectLoader.process_records`'s
build-index → per-row upsert → record lineage loop
(/root/reference/src/core/logic/project_loader.py:95-133) re-expressed as a
partitioned bulk merge; the "weekly" re-runnable phase orchestration
(/root/reference/src/flows/pipelines/weekly_orchestrator.py:41-90) becomes
epoch-at-a-time `apply_epoch` calls that are individually idempotent and
resumable from the manifest.

Scale notes:
  - The only all-to-all exchange on the hot path is the single
    ``groupby(part_id)`` — events are pre-reduced per block first, so a hot
    key contributes ≤ 1 row per block to the shuffle (skew defence; the
    partial+final two-level reduce IS the salted-sub-partition +
    merge-reconcile design of SURVEY.md §7.5, with block boundaries as the
    implicit salt).
  - Partition count is configurable; size it so one partition's live state
    fits a worker's heap (copy-on-write per-partition files, Hudi/Delta
    style). Untouched partitions are NOT rewritten.
  - Content strings can be MBs; everything stays Arrow (`large_string`-safe),
    and verification paths compare digests, not contents.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import partition_ids
from ..stages.schema_evolution import SchemaScript, conform_table
from ..stages.validate import ValidateEvents
from ..state.lww import lww_partial_fast, lww_resolve_table
from ..state.manifest import ManifestStore, PartitionState, atomic_write_table

DEFAULT_KEYS = ("repo", "path")


@dataclass
class CdcConfig:
    key_columns: tuple[str, ...] = DEFAULT_KEYS
    seq_column: str = "seq"
    op_column: str = "op"
    content_column: str = "content"
    num_partitions: int = 32
    schema_script: SchemaScript | None = None
    payload_columns: tuple[str, ...] = ("repo", "path", "commit", "lang", "content")
    validate: bool = True
    quarantine: bool = True
    # "groupby": Dataset-native sort-shuffle exchange (canonical path).
    # "staged": map-side split to per-partition staging parquet + one merge
    # task per partition — a storage-backed shuffle. Measured on 20M events
    # (~4.5GB of winners): the sort-shuffle reduce dominates wall time moving
    # wide payload rows; the staged exchange cuts it (see bench history in
    # BASELINE.md). Retried map tasks just append duplicate winner files —
    # harmless, because the merge is the same idempotent argmax reduce.
    shuffle_mode: str = "groupby"
    # "cow": each touched partition's FULL state is rewritten per epoch
    #   (copy-on-write; simple reads, heavy write amplification under small
    #   epochs — the round-1 weakness).
    # "delta": each epoch appends only that epoch's winners as a
    #   delta-epoch file (merge-on-read, Hudi-style); the per-epoch digest /
    #   offset / counts come from a narrow per-partition INDEX file
    #   (keys + seq + content_sha256 + deleted) so the wide payload is
    #   written exactly once per event; ``compact()`` reconciles deltas back
    #   into a single base. Requires key columns stable across the schema
    #   script (run compact() before renaming a key column).
    write_mode: str = "cow"
    # Pluggable conflict resolution (§2.11): an object with
    # ``reduce(pa.Table) -> pa.Table`` used as BOTH the per-block combiner
    # and the per-partition merge (must be associative/commutative/
    # idempotent — see state/merge_policy.py). None = last-writer-wins.
    # Composes with write_mode='delta' too when the policy declares
    # ``index_columns()`` (the narrow-index merge re-runs the policy across
    # epochs); apply_epoch enforces this. Readers of a policy+delta lake must
    # pass cfg (read_lake/compact re-reduce with the policy).
    merge_policy: object | None = None
    # Columns to BLOOM-INDEX per partition data file (functions/bloom.py:
    # pack_column_bloom — int or string/binary columns). Zone maps prune
    # range-refutable predicates; these prune high-cardinality EQUALITY
    # predicates (content_sha256, a URL column) that min/max can't refute.
    # The bloom rides each data file's parquet FOOTER metadata — no new
    # files, no manifest growth — and read_lake(filter=("col", "==", v))
    # probes footers only for zone-admitted partitions, skipping every
    # partition whose files all PROVE absence. Sized ~10 bits/value (≈1%
    # fpp), capped at 1 MiB of bits per file; over-full blooms degrade to
    # admitting (pruning loss, never correctness loss). Opt-in: () writes
    # nothing and the read path never touches footers.
    bloom_columns: tuple[str, ...] = ()
    # Compression of the staged-exchange shuffle files. lz4 (default) is the
    # CPU-cheap choice when storage bandwidth is plentiful; zstd roughly
    # halves the bytes the exchange writes+reads — the right trade when the
    # shuffle tier is bandwidth-bound (object storage, shared filesystems,
    # or this sandbox's throttled tmpfs). Digest-invariant either way (the
    # merge reads whatever parquet says).
    stage_compression: str = "lz4"


def state_to_events(t: pa.Table, op_column: str) -> pa.Table:
    """Committed state rows → re-playable events: the ``deleted`` flag
    becomes a delete/update op under the CONFIGURED op column. Single source
    for a pattern that previously lived in five hand-rolled copies (two of
    which had drifted to a hardcoded \"op\")."""
    op = pc.if_else(t["deleted"], pa.scalar("delete"), pa.scalar("update"))
    return t.drop_columns(["deleted"]).append_column(op_column, op)


def flag_deleted(winners: pa.Table, op_column: str) -> pa.Table:
    """Resolved winners → state rows: drop the op column, derive ``deleted``."""
    deleted = pc.fill_null(pc.equal(winners[op_column], "delete"), False)
    return winners.drop_columns([op_column]).append_column("deleted", deleted)


# --------------------------------------------------------------------------
# merge + write (runs once per touched partition inside map_groups)
# --------------------------------------------------------------------------


class MergeWritePartition:
    """Final LWW reduce of one partition → atomic write → manifest row.

    ``cow`` mode: union(prior state, new winners) → argmax-by-seq → full
    rewrite of the partition at ``epoch=<e>.parquet``.
    ``delta`` mode: only this epoch's winners are written (first touch = the
    base file, later epochs = ``delta-epoch=<e>.parquet``); the digest /
    counts / offset come from merging the narrow per-partition INDEX
    (keys + seq + content_sha256 + deleted), so the wide payload is written
    once per event instead of once per epoch.

    Retried/duplicate executions rewrite identical bytes to the same
    deterministic paths (idempotent sink — the K1 atomic-write discipline,
    /root/reference/src/core/logic/atomic_io.py:16-41)."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        cfg: CdcConfig,
        prior: dict[int, dict],  # part_id -> asdict(PartitionState)
        schema_version: int,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.cfg = cfg
        self.prior = prior
        self.schema_version = schema_version

    def _store(self) -> ManifestStore:
        return ManifestStore(self.lake_dir)

    def _prior_files(self, ps: dict) -> list[str]:
        base = ps["epoch"] if ps.get("base_epoch", -1) < 0 else ps["base_epoch"]
        store = self._store()
        return [store.partition_file(ps["part_id"], base)] + [
            store.delta_file(ps["part_id"], e)
            for e in ps.get("delta_epochs", [])
        ]

    def _read_prior(self, pid: int) -> pa.Table | None:
        """Prior committed state (base + any deltas) as re-playable events."""
        ps = self.prior.get(pid)
        if ps is None:
            return None
        import pyarrow.parquet as pq

        tables = [pq.read_table(p) for p in self._prior_files(ps)]
        t = pa.concat_tables(tables, promote_options="permissive")
        if self.cfg.schema_script is not None:
            t = conform_table(t, self.cfg.schema_script, self.schema_version)
        # state rows as events: tombstones re-assert deletes
        return state_to_events(t, self.cfg.op_column)

    def _index_columns(self) -> list[str]:
        cols = list(self.cfg.key_columns) + [self.cfg.seq_column,
                                             "content_sha256"]
        pol = self.cfg.merge_policy
        if pol is not None:  # policy aggregates ride the narrow index
            cols += [c for c in pol.index_columns() if c not in cols]
        return cols

    def _resolve(self, ev: pa.Table) -> pa.Table:
        """Events (and/or reduced rows) → one winner row per key: the
        configured merge policy, or plain LWW."""
        if self.cfg.merge_policy is not None:
            return self.cfg.merge_policy.reduce(ev)
        return lww_resolve_table(ev, list(self.cfg.key_columns),
                                 self.cfg.seq_column, self.cfg.op_column,
                                 keep_tombstones=True)

    def _read_prior_index(self, pid: int) -> pa.Table | None:
        """Prior narrow index; falls back to rebuilding it from the payload
        files (covers cow→delta transitions and post-compaction reads)."""
        ps = self.prior.get(pid)
        if ps is None:
            return None
        import pyarrow.parquet as pq

        path = self._store().index_file(pid, ps["epoch"])
        want = self._index_columns() + ["deleted"]
        if os.path.exists(path):
            idx = pq.read_table(path)
            if all(c in idx.column_names for c in want):
                return idx.select(want)
        t = pa.concat_tables(
            [pq.read_table(p) for p in self._prior_files(ps)],
            promote_options="permissive",
        )
        if self.cfg.schema_script is not None:
            t = conform_table(t, self.cfg.schema_script, self.schema_version)
        # rebuilt payload may itself contain deltas → resolve to winners
        winners = self._resolve(state_to_events(t, self.cfg.op_column))
        return flag_deleted(winners, self.cfg.op_column).select(
            self._index_columns() + ["deleted"])

    def _stats_row(self, pid: int, lake_like: pa.Table) -> pa.Table:
        """Manifest row from a table carrying (keys, seq, content_sha256,
        deleted) sorted by key ascending (lww output order). Includes the
        partition ZONE MAP (per-column min/max over whatever columns the
        caller hands in: the full payload in cow mode, the narrow index in
        delta mode — see PartitionState.zone)."""
        import json as _json

        cfg = self.cfg
        deleted = lake_like["deleted"]
        if isinstance(deleted, pa.ChunkedArray):
            deleted = deleted.combine_chunks()
        live_mask = pc.invert(deleted)
        live_count = pc.sum(live_mask.cast(pa.int64())).as_py() or 0
        tomb_count = len(lake_like) - live_count
        from ..functions.hashing import sha_digest_of_column

        digest = sha_digest_of_column(
            lake_like.filter(live_mask)["content_sha256"])
        offset = (pc.max(lake_like[cfg.seq_column]).as_py()
                  if len(lake_like) else -1)
        return pa.table(
            {
                "part_id": pa.array([pid], type=pa.int32()),
                "epoch": pa.array([self.epoch], type=pa.int64()),
                "offset": pa.array([int(offset)], type=pa.int64()),
                "row_count": pa.array([int(live_count)], type=pa.int64()),
                "tombstones": pa.array([int(tomb_count)], type=pa.int64()),
                "content_digest": pa.array([digest]),
                "schema_version": pa.array([self.schema_version], type=pa.int64()),
                "zone_json": pa.array([_json.dumps(compute_zone(lake_like))]),
            }
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        pid = group["part_id"][0].as_py()
        group = group.drop_columns(["part_id"])
        if cfg.write_mode == "delta":
            return self._call_delta(pid, group)
        prior = self._read_prior(pid)
        if prior is not None:
            group = pa.concat_tables([prior, group], promote_options="permissive")
        if cfg.merge_policy is not None:
            # pluggable final merge: prior state re-enters as rows, so the
            # policy's associativity/idempotence contract carries the epoch
            winners = cfg.merge_policy.reduce(group)
        else:
            # lww_resolve_table sorts by (keys asc, seq desc) and filters —
            # its output is already key-ascending, so no second sort needed
            winners = lww_resolve_table(
                group,
                list(cfg.key_columns),
                cfg.seq_column,
                cfg.op_column,
                keep_tombstones=True,
            )
        deleted = pc.fill_null(pc.equal(winners[cfg.op_column], "delete"), False)
        lake = winners.drop_columns([cfg.op_column]).append_column("deleted", deleted)
        atomic_write_table(
            os.path.join(self.lake_dir, f"part_id={pid}", f"epoch={self.epoch}.parquet"),
            lake,
            metadata=_bloom_footer_meta(lake, cfg.bloom_columns),
        )
        return self._stats_row(pid, lake)

    def _call_delta(self, pid: int, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        store = self._store()
        # in-epoch winners only (the delta payload — written once per event);
        # policy mode: per-epoch reduce carries partial aggregates forward
        winners = self._resolve(group)
        deleted = pc.fill_null(pc.equal(winners[cfg.op_column], "delete"), False)
        delta_rows = winners.drop_columns([cfg.op_column]).append_column(
            "deleted", deleted)
        first_touch = pid not in self.prior
        path = (store.partition_file(pid, self.epoch) if first_touch
                else store.delta_file(pid, self.epoch))
        atomic_write_table(path, delta_rows,
                           metadata=_bloom_footer_meta(delta_rows,
                                                       cfg.bloom_columns))

        # merge the NARROW index (not the payload) for digest/counts/offset —
        # under a policy the index re-reduces across epochs, which the
        # policy's associativity/idempotence contract licenses
        new_idx = delta_rows.select(self._index_columns() + ["deleted"])
        prior_idx = self._read_prior_index(pid)
        if prior_idx is not None:
            both = pa.concat_tables([prior_idx, new_idx],
                                    promote_options="permissive")
            merged = self._resolve(state_to_events(both, cfg.op_column))
            merged_idx = flag_deleted(merged, cfg.op_column).select(
                new_idx.column_names)
        else:
            merged_idx = new_idx
        atomic_write_table(store.index_file(pid, self.epoch), merged_idx)
        # ADVICE fix: superseded index file is dead the moment the new one
        # commits — unlink it now so a never-compacting tail-follow doesn't
        # accumulate one stale index per partition per epoch (gc() remains
        # the backstop for crash windows)
        if not first_touch:
            ps_prev = self.prior.get(pid)
            if ps_prev is not None:
                old = store.index_file(pid, ps_prev["epoch"])
                if old != store.index_file(pid, self.epoch):
                    try:
                        os.unlink(old)
                    except OSError:
                        pass
        return self._stats_row(pid, merged_idx)


# --------------------------------------------------------------------------
# epoch application
# --------------------------------------------------------------------------


def _partial_stage(cfg: CdcConfig, offsets: np.ndarray):
    """Per-block combiner: LWW partial reduce, partition assignment, and the
    exactly-once seq fence (drop events at or below the partition's committed
    offset — replayed input is skipped, D2 parity)."""

    keys = list(cfg.key_columns)
    seq_col = cfg.seq_column

    # The content column's spelling HISTORY: a schema-script rename of the
    # content column means conformed batches carry it under a newer name —
    # hashing only cfg.content_column would silently write null shas for
    # every event after the rename (breaking the sha invariant and opening
    # spurious feed/history versions). Prefer the most-evolved spelling
    # present in the batch.
    content_spellings = [cfg.content_column]
    if cfg.schema_script is not None:
        cur = cfg.content_column
        for op in cfg.schema_script.ops:
            if op["op"] == "rename_column" and op["from"] == cur:
                cur = op["to"]
                content_spellings.append(cur)

    def add_sha(winners: pa.Table) -> pa.Table:
        """Deferred content sha (validate runs with compute_sha=False): only
        WINNER rows are hashed — the combiner's dedup ratio is a free sha
        speedup, extreme under hot-key skew."""
        from ..functions.hashing import sha256_column

        if "content_sha256" in winners.column_names:
            return winners
        present = [c for c in content_spellings
                   if c in winners.column_names]
        if present:
            # a mixed-version block can carry MORE THAN ONE spelling (each
            # row null in all but one — the case conform_table coalesces);
            # hash the coalesce newest←oldest, not just the newest column,
            # or the old-spelling rows would get null shas (review fix)
            col = winners[present[-1]]
            for c in reversed(present[:-1]):
                col = pc.coalesce(col, winners[c].cast(col.type))
            sha = sha256_column(col)
        else:
            sha = pa.nulls(len(winners), pa.string())
        return winners.append_column("content_sha256", sha)

    def empty_out(batch: pa.Table) -> pa.Table:
        """Zero-row block in the REDUCED schema (part_id + content_sha256
        appended, epoch dropped, policy aggregate columns added). Returning
        the raw batch instead would put schema-inconsistent blocks into the
        groupby('part_id') exchange whenever a block is empty or fully
        quarantined/fenced — including under a merge policy whose reduce
        adds aggregate columns (ADVICE r3: policies declare them via
        extend_schema)."""
        t = batch.slice(0, 0)
        for c in ("epoch", "part_id"):
            if c in t.column_names:
                t = t.drop_columns([c])
        if cfg.merge_policy is not None and hasattr(cfg.merge_policy,
                                                    "extend_schema"):
            t = cfg.merge_policy.extend_schema(t)
        return add_sha(t.append_column("part_id", pa.array([], pa.int32())))

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty_out(batch)
        if "epoch" in batch.column_names:
            batch = batch.drop_columns(["epoch"])  # partition col of the tail layout
        if cfg.merge_policy is not None:
            # policy combiner: fence raw rows first (the policy may keep
            # history aggregates, so the fence must see raw events), then
            # reduce; part_id rides the reduce (constant within a key).
            # MUST use the same keyed hash as lww_partial_fast — the manifest
            # keys on part_id, so the policy and LWW paths have to agree on
            # where a key lives (hashing.partition_ids is that single source)
            part = partition_ids(batch, keys, cfg.num_partitions)
            if "part_id" in batch.column_names:
                batch = batch.drop_columns(["part_id"])
            batch = batch.append_column("part_id", pa.array(part, type=pa.int32()))
            fence = offsets[part]
            keep = batch[seq_col].to_numpy(zero_copy_only=False) > fence
            if not keep.all():
                batch = batch.filter(pa.array(keep))
            if len(batch) == 0:
                return empty_out(batch)
            return add_sha(cfg.merge_policy.reduce(batch))
        out, part = lww_partial_fast(batch, keys, seq_col, cfg.num_partitions)
        if "part_id" in out.column_names:
            out = out.drop_columns(["part_id"])
        out = out.append_column("part_id", pa.array(part, type=pa.int32()))
        fence = offsets[part]  # vectorized lookup: committed offset per row
        keep = out[seq_col].to_numpy(zero_copy_only=False) > fence
        if not keep.all():
            out = out.filter(pa.array(keep))
        return add_sha(out)

    return partial


def _staged_partial_stage(cfg: CdcConfig, offsets: np.ndarray, stage_dir: str):
    """Staged-shuffle variant of the combiner: after the partial reduce,
    split the block by part_id (one argsort on int32 + contiguous slices)
    and write each slice to the partition's staging dir. Returns per-pid row
    counts (tiny) so the pipeline has something to consume."""
    inner = _partial_stage(cfg, offsets)

    def partial_staged(batch: pa.Table) -> pa.Table:
        import time

        import pyarrow.parquet as pq

        out = inner(batch)
        if len(out) == 0:
            return pa.table({"part_id": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64())})
        part = out["part_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        sorted_out = out.take(pa.array(order, type=pa.int64()))
        sp = part[order]
        bounds = np.flatnonzero(np.diff(sp)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sp)]])
        nonce = f"{os.getpid()}-{time.time_ns()}"
        pids, counts = [], []
        for s, e in zip(starts, ends):
            pid = int(sp[s])
            d = os.path.join(stage_dir, f"part_id={pid}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sorted_out.slice(s, e - s).drop_columns(["part_id"]),
                           os.path.join(d, f"w-{nonce}.parquet"),
                           compression=cfg.stage_compression)
            pids.append(pid)
            counts.append(int(e - s))
        return pa.table({"part_id": pa.array(pids, pa.int32()),
                         "rows": pa.array(counts, pa.int64())})

    return partial_staged


def apply_epoch(
    events_ds,
    lake_dir: str,
    epoch: int,
    cfg: CdcConfig | None = None,
) -> dict:
    """Apply one epoch (micro-batch of the tail) to the lake. Idempotent:
    re-applying a committed epoch is a no-op; a crash before the manifest
    commit leaves only invisible orphan files that get rewritten on retry."""
    import time as _time

    t_start = _time.time()
    cfg = cfg or CdcConfig()
    if (cfg.merge_policy is not None and cfg.write_mode == "delta"
            and not hasattr(cfg.merge_policy, "index_columns")):
        raise ValueError(
            "write_mode='delta' needs the merge policy to declare "
            "index_columns() — the columns its reduce() must see to "
            "re-reduce narrow index rows across epochs (see "
            "state/merge_policy.py)"
        )
    store = ManifestStore(lake_dir)
    manifest = store.load()
    if epoch <= manifest.epoch:
        return {"epoch": epoch, "skipped": True, "reason": "already committed"}

    schema_version = (
        cfg.schema_script.schema_version(epoch) if cfg.schema_script else 0
    )

    from dataclasses import asdict as _asdict

    prior = {pid: _asdict(ps) for pid, ps in manifest.partitions.items()}
    offsets = np.full(cfg.num_partitions, -1, dtype=np.int64)
    for pid, ps in manifest.partitions.items():
        offsets[pid] = ps.offset

    ds = events_ds
    if cfg.validate:
        validator = ValidateEvents(
            key_columns=list(cfg.key_columns),
            seq_column=cfg.seq_column,
            op_column=cfg.op_column,
            content_column=cfg.content_column,
            quarantine_dir=os.path.join(lake_dir, "_quarantine") if cfg.quarantine else None,
            compute_sha=False,  # deferred to post-combiner (winners only)
        )
        ds = ds.map_batches(validator, batch_format="pyarrow", batch_size=None)
    if cfg.schema_script is not None:
        script, ver = cfg.schema_script, schema_version
        ds = ds.map_batches(
            lambda t: conform_table(t, script, ver), batch_format="pyarrow",
            batch_size=None,
        )
    merger = MergeWritePartition(lake_dir, epoch, cfg, prior, schema_version)

    if cfg.shuffle_mode == "staged":
        # storage-backed exchange: map-side split to per-partition staging
        # files, one merge task per partition; no object-store sort of the
        # wide payload rows
        import shutil

        import ray
        import pyarrow.parquet as pq

        if "://" in lake_dir:
            # The staged exchange and the manifest use POSIX-local file APIs
            # (os.listdir / os.replace); on object storage or any non-shared
            # mount the driver would see no/partial staging dirs and silently
            # commit an epoch with missing partitions. Refuse up front.
            raise ValueError(
                "staged shuffle requires a shared-POSIX lake path, got URI "
                f"{lake_dir!r}; use shuffle_mode='groupby' for object storage"
            )
        stage_dir = os.path.join(lake_dir, "_stage", f"epoch={epoch}")
        shutil.rmtree(stage_dir, ignore_errors=True)
        staged = ds.map_batches(
            _staged_partial_stage(cfg, offsets, stage_dir),
            batch_format="pyarrow", batch_size=None,
        )
        # consume → stage written; keep the per-pid report (tiny: ≤ blocks×P
        # rows) so we can PROVE the merge saw every staged partition
        staged_rows = staged.take_all()
        staged_pids = {int(r["part_id"]) for r in staged_rows}

        @ray.remote(num_cpus=1)
        def merge_pid(pid: int, files: list[str]) -> dict:
            t = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="permissive"
            )
            t = t.append_column("part_id", pa.array([pid] * len(t), pa.int32()))
            return merger(t).to_pylist()[0]

        refs, merged_pids = [], set()
        if os.path.isdir(stage_dir):
            for d in sorted(os.listdir(stage_dir)):
                if not d.startswith("part_id="):
                    continue
                pid = int(d.split("=", 1)[1])
                pdir = os.path.join(stage_dir, d)
                files = [os.path.join(pdir, f) for f in sorted(os.listdir(pdir))]
                refs.append(merge_pid.remote(pid, files))
                merged_pids.add(pid)
        if staged_pids - merged_pids:
            # a staging dir the map tasks reported never reached the merge —
            # non-shared storage or concurrent deletion; committing would be
            # silent data loss
            raise RuntimeError(
                f"staged exchange lost partitions {sorted(staged_pids - merged_pids)}: "
                "map tasks staged rows but no staging directory was found "
                "(is the lake on shared POSIX storage?)"
            )
        rows = ray.get(refs)
        shutil.rmtree(stage_dir, ignore_errors=True)
        try:  # drop the _stage parent when no other epoch is staging
            os.rmdir(os.path.dirname(stage_dir))
        except OSError:
            pass
    else:
        # Dataset-native exchange: batch_size=None → whole blocks: less
        # per-batch overhead and a far better partial-reduce ratio
        # (block-level key dedup before the shuffle)
        ds = ds.map_batches(_partial_stage(cfg, offsets), batch_format="pyarrow",
                            batch_size=None)

        def merge_write(group: pa.Table) -> pa.Table:
            return merger(group)

        merged = ds.groupby("part_id").map_groups(merge_write, batch_format="pyarrow")
        rows = merged.take_all()  # tiny: one row per touched partition
        if os.environ.get("HORIZON_STATS"):
            import sys

            print(merged.stats(), file=sys.stderr)
    partition_rows = []
    for r in rows:
        pid = int(r["part_id"])
        base_epoch, delta_epochs = int(r["epoch"]), []
        if cfg.write_mode == "delta" and pid in prior:
            ps_prev = prior[pid]
            base_epoch = (ps_prev["epoch"] if ps_prev.get("base_epoch", -1) < 0
                          else ps_prev["base_epoch"])
            delta_epochs = list(ps_prev.get("delta_epochs", [])) + [epoch]
        import json as _json

        partition_rows.append(PartitionState(
            part_id=pid,
            epoch=int(r["epoch"]),
            offset=int(r["offset"]),
            row_count=int(r["row_count"]),
            tombstones=int(r["tombstones"]),
            content_digest=str(r["content_digest"]),
            schema_version=int(r["schema_version"]),
            base_epoch=base_epoch,
            delta_epochs=delta_epochs,
            zone=_json.loads(r["zone_json"]) if r.get("zone_json") else None,
        ))
    metrics = {
        "partitions_updated": len(partition_rows),
        "live_rows": sum(r.row_count for r in partition_rows),
        "tombstones": sum(r.tombstones for r in partition_rows),
        # wall-clock of this epoch apply — consumed by the run-report writer
        # (pipelines/report.py); NOT part of the manifest digest (that hashes
        # only partition content digests, cdc.manifest_digest)
        "seconds": round(_time.time() - t_start, 3),
    }
    store.commit_epoch(epoch, partition_rows, metrics=metrics,
                       schema_version=schema_version,
                       num_partitions=cfg.num_partitions)
    return {"epoch": epoch, "skipped": False, **metrics}


# --------------------------------------------------------------------------
# replay driver
# --------------------------------------------------------------------------


def list_event_epochs(events_dir: str) -> list[int]:
    out = []
    for name in os.listdir(events_dir):
        if name.startswith("epoch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _fire(notifier, hook: str, payload: dict) -> None:
    """Invoke a notifier hook, swallowing transport errors (a broken
    notifier must never change the run outcome — the reference's
    flow-state-handler discipline, weekly_orchestrator.py:173-176)."""
    if notifier is None:
        return
    fn = getattr(notifier, hook, None)
    if fn is None:
        return
    try:
        fn(payload)
    except Exception:  # noqa: BLE001
        pass


def replay(
    events_dir: str,
    lake_dir: str,
    cfg: CdcConfig | None = None,
    mode: str = "incremental",
    epochs: list[int] | None = None,
    override_num_blocks: int | None = None,
    notifier=None,
) -> list[dict]:
    """Replay an epoch-partitioned event log into the lake.

    ``incremental``: one ``apply_epoch`` per epoch directory (the tail-follow
    path; each epoch is an idempotent, resumable micro-batch).
    ``bulk``: the whole log as one logical epoch (max epoch id) — the
    full-replay/bootstrap path and the bench headline; correct because LWW is
    order-independent (argmax by seq).

    ``notifier``: object with optional ``on_epoch_commit(metrics: dict)`` /
    ``on_failure(payload: dict)`` methods — the reference's completion /
    failure notification hooks (`src/notifications/telegram.py`, wired at
    `src/flows/sigpesq/all.py:38`) as a transport-agnostic surface (the
    orchestrator's ``CallbackNotifier`` fits). Hook errors are swallowed;
    ``on_failure`` fires once for the failing epoch and the error re-raises.

    ``override_num_blocks``: read-side block count. COARSE blocks matter
    twice here: (1) per-block scheduling/shuffle overhead amortizes, and
    (2) the partial LWW combiner dedups within a block, so a block that
    covers a larger key sample ships fewer rows into the exchange (measured
    on 2M events / 32 cpus: 220 default blocks → 14-25 s; 16-32 blocks →
    1.5-2.8 s, ~1M events/s). Rule of thumb: ≈ cluster cores, with blocks
    ≥ 64 MB at real scale.
    """
    import ray.data as rd

    cfg = cfg or CdcConfig()
    all_epochs = epochs if epochs is not None else list_event_epochs(events_dir)
    results = []

    def _apply(ds, e):
        try:
            r = apply_epoch(ds, lake_dir, e, cfg)
        except Exception as exc:
            _fire(notifier, "on_failure",
                  {"epoch": e, "lake_dir": lake_dir,
                   "error": f"{type(exc).__name__}: {exc}"})
            raise
        if not r.get("skipped"):
            _fire(notifier, "on_epoch_commit", r)
        return r

    if mode == "bulk":
        e = max(all_epochs)
        ds = rd.read_parquet(events_dir, override_num_blocks=override_num_blocks)
        results.append(_apply(ds, e))
    else:
        committed = ManifestStore(lake_dir).committed_epoch()
        for e in all_epochs:
            if e <= committed:
                results.append({"epoch": e, "skipped": True, "reason": "manifest"})
                continue
            ds = rd.read_parquet(_epoch_files(events_dir, e),
                                 override_num_blocks=override_num_blocks)
            results.append(_apply(ds, e))
    return results


def _epoch_files(events_dir: str, epoch: int) -> list[str]:
    d = os.path.join(events_dir, f"epoch={epoch}")
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


# --------------------------------------------------------------------------
# read side + verification
# --------------------------------------------------------------------------


_ZONE_STR_PREFIX = 64  # max chars of a string bound stored in the manifest


def _zone_str_bounds(lo: str, hi: str) -> list:
    """Bounded string zone entries (Iceberg truncate(): the manifest rides
    the driver hot path — current.json is re-read on every read/commit and
    the prior dict ships into every merge task — so MB-scale ``content``
    values must never be embedded verbatim). The stored bounds only ever
    WIDEN the true range, so pruning stays a safe superset:

      - lo → its first ``_ZONE_STR_PREFIX`` chars (a prefix sorts ≤ the
        full string, so it is a valid lower bound);
      - hi → prefix with its last incrementable code point bumped (any
        string starting with the original prefix sorts < the bumped one);
        if every prefix char is already U+10FFFF, the upper bound is
        unknowable from a prefix → ``None`` (readers treat it as +∞)."""
    if len(lo) > _ZONE_STR_PREFIX:
        lo = lo[:_ZONE_STR_PREFIX]
    if len(hi) > _ZONE_STR_PREFIX:
        p = hi[:_ZONE_STR_PREFIX]
        hi = None
        for i in range(len(p) - 1, -1, -1):
            cp = ord(p[i])
            if cp >= 0x10FFFF:
                continue
            cp += 1
            if 0xD800 <= cp <= 0xDFFF:  # skip the surrogate gap
                cp = 0xE000
            hi = p[:i] + chr(cp)
            break
    return [lo, hi]


def compute_zone(t: pa.Table) -> dict:
    """Per-column [min, max] for a partition's committed rows — the zone
    map recorded in its manifest row. Only JSON-safe scalar types
    (int/float/string/bool); all-null and non-scalar columns are omitted,
    which readers must treat as 'may match'. String bounds are truncated
    to ``_ZONE_STR_PREFIX`` chars (safely widened — ``_zone_str_bounds``),
    a ``None`` upper bound meaning +∞."""
    zone: dict[str, list] = {}
    for name in t.column_names:
        if name in ("part_id", "deleted"):
            continue
        ty = t.schema.field(name).type
        if not (pa.types.is_integer(ty) or pa.types.is_floating(ty)
                or pa.types.is_string(ty) or pa.types.is_large_string(ty)
                or pa.types.is_boolean(ty)):
            continue
        mm = pc.min_max(t[name])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or hi is None:  # empty / all-null
            continue
        if isinstance(lo, str):
            zone[name] = _zone_str_bounds(lo, hi)
        else:
            zone[name] = [lo, hi]
    return zone


BLOOM_META_KEY = "horizon.bloom"


def _bloom_footer_meta(t: pa.Table, columns) -> dict | None:
    """Footer metadata carrying per-column blooms for a partition data file
    (CdcConfig.bloom_columns). Built over EVERY row (tombstones included —
    a superset only ever admits, never wrongly refutes); columns the file
    lacks or whose type the bloom can't hash are skipped (readers treat a
    missing bloom as admit)."""
    if not columns:
        return None
    import json as _json

    from ..functions.bloom import pack_column_bloom

    desc = {}
    for c in columns:
        if c not in t.column_names:
            continue
        try:
            d = pack_column_bloom(t[c])
        except TypeError:
            continue
        if d is not None:
            desc[c] = d
    return {BLOOM_META_KEY: _json.dumps(desc)} if desc else None


def _bloom_prune(store: "ManifestStore", parts, eq_preds):
    """Drop partitions whose data-file blooms PROVE no row satisfies the
    equality predicates. Footer-only: each probe task reads parquet schema
    metadata (tail KBs), never a row group; any doubt (file missing bloom /
    unreadable footer / value possibly present) admits. Fan-out in chunks
    so a 10^4-partition lake probes footers cluster-wide, not serially on
    the driver."""
    import json as _json

    import ray

    from ..functions.bloom import bloom_might_contain

    def admit(files: list[str]) -> bool:
        import pyarrow.parquet as pq

        for f in files:
            try:
                md = pq.read_schema(f).metadata or {}
                raw = md.get(BLOOM_META_KEY.encode())
            except Exception:
                return True  # unreadable footer: cannot prove absence
            if raw is None:
                return True  # pre-bloom file
            desc = _json.loads(raw)
            if any(p[0] not in desc for p in eq_preds):
                return True
            def pred_admits(p) -> bool:
                if p[1] == "in":
                    return any(bloom_might_contain(desc[p[0]], v)
                               for v in p[2])
                return bloom_might_contain(desc[p[0]], p[2])

            if all(pred_admits(p) for p in eq_preds):
                return True  # this file might hold a satisfying row
        return False  # every file refutes at least one predicate

    file_lists = [store.partition_data_files(ps) for _, ps in parts]
    if len(parts) <= 8:  # small lakes: not worth task overhead
        mask = [admit(fl) for fl in file_lists]
    else:
        @ray.remote(num_cpus=1)
        def admit_chunk(lists: list[list[str]]) -> list[bool]:
            return [admit(fl) for fl in lists]

        chunk = 64
        refs = [admit_chunk.remote(file_lists[i:i + chunk])
                for i in range(0, len(file_lists), chunk)]
        mask = [a for r in ray.get(refs) for a in r]
    return [pp for pp, ok in zip(parts, mask) if ok]


# filter ops accepted by read_lake(filter=...): (col, op, value) or
# (col, "between", lo, hi)
_ZONE_OPS = ("==", "<", "<=", ">", ">=", "between", "in")


def _zone_admits(zone: dict | None, filt: tuple) -> bool:
    """False only when the partition's zone PROVES no row can satisfy the
    filter; missing zone / missing column / unknown shape = may match."""
    if not zone or filt[0] not in zone:
        return True
    lo, hi = zone[filt[0]]
    op = filt[1]
    # a None bound means "unknown / ±∞" (truncated string max): any
    # predicate that would need that side of the range cannot refute
    try:
        if op == "==":
            return lo <= filt[2] and (hi is None or filt[2] <= hi)
        if op == "<":
            return lo < filt[2]
        if op == "<=":
            return lo <= filt[2]
        if op == ">":
            return hi is None or hi > filt[2]
        if op == ">=":
            return hi is None or hi >= filt[2]
        if op == "between":
            return not (filt[3] < lo or (hi is not None and filt[2] > hi))
        if op == "in":
            return any(lo <= v and (hi is None or v <= hi)
                       for v in filt[2])
    except TypeError:  # cross-type comparison: can't prove exclusion
        return True
    return True


def _filter_batch(t: pa.Table, filt: tuple) -> pa.Table:
    """Exact row-level application of a read_lake filter (pruning is only
    the partition-skip optimization; every surviving row is re-checked)."""
    col, op = filt[0], filt[1]
    c = t[col]
    if op == "==":
        mask = pc.equal(c, filt[2])
    elif op == "<":
        mask = pc.less(c, filt[2])
    elif op == "<=":
        mask = pc.less_equal(c, filt[2])
    elif op == ">":
        mask = pc.greater(c, filt[2])
    elif op == ">=":
        mask = pc.greater_equal(c, filt[2])
    elif op == "between":
        mask = pc.and_(pc.greater_equal(c, filt[2]),
                       pc.less_equal(c, filt[3]))
    elif op == "in":
        mask = pc.is_in(c, value_set=pa.array(list(filt[2])))
    else:
        raise ValueError(f"unknown filter op {op!r} (want one of {_ZONE_OPS})")
    return t.filter(pc.fill_null(mask, False))


def _as_filter_list(filt) -> list[tuple]:
    """Normalize read_lake's ``filter`` to a list of predicates (implicit
    AND): a single (col, op, ...) tuple, or a list/tuple of them."""
    if (isinstance(filt, (tuple, list)) and filt
            and isinstance(filt[0], (tuple, list))):
        preds = [tuple(p) for p in filt]
    else:
        preds = [tuple(filt) if isinstance(filt, (tuple, list)) else filt]
    for p in preds:
        if (not isinstance(p, tuple) or len(p) < 3
                or p[1] not in _ZONE_OPS
                or (p[1] == "between") != (len(p) == 4)
                or (p[1] == "in" and not isinstance(p[2], (list, tuple,
                                                           set, frozenset)))):
            raise ValueError(
                f"filter must be (col, op, value) with op in {_ZONE_OPS}, "
                f"(col, 'between', lo, hi), (col, 'in', [values...]), or a "
                f"list of those (AND); got {p!r}")
    return preds


def _empty_lake_table(store: ManifestStore, m, script, version) -> pa.Table:
    """A zero-row Table with the lake's reader schema, built from parquet
    FOOTERS only — never a full read plan (ADVICE r4: the old
    ``read_lake(...).limit(0)`` fallback instantiated a merge-on-read task
    per partition just to produce nothing, and failed outright on lakes
    with unreadable non-owning partitions). Unreadable footers are skipped;
    raises only when NO partition footer is readable."""
    import pyarrow.parquet as pq

    for _, ps in sorted(m.partitions.items()):
        for f in store.partition_data_files(ps):
            try:
                schema = pq.read_schema(f)
            except Exception:
                continue
            empty = schema.empty_table()
            if script is not None:
                empty = conform_table(empty, script, version)
            return empty
    raise FileNotFoundError(
        f"no readable partition footer in {store.lake_dir} to type the "
        "empty result")


def _empty_lake_dataset(store: ManifestStore, m, script, version):
    """``_empty_lake_table`` as a Dataset, with ``part_id`` appended for
    parity with every populated read path."""
    import ray.data as rd

    empty = _empty_lake_table(store, m, script, version)
    if "part_id" not in empty.column_names:
        empty = empty.append_column("part_id", pa.array([], pa.int32()))
    return rd.from_arrow(empty)


_TYPE_GROUPS = (
    ("string", lambda ty: pa.types.is_string(ty)
     or pa.types.is_large_string(ty)),
    ("binary", lambda ty: pa.types.is_binary(ty)
     or pa.types.is_large_binary(ty)),
    ("integer", pa.types.is_integer),
    ("floating", pa.types.is_floating),
    ("boolean", pa.types.is_boolean),
)


def _type_group(ty) -> str:
    for name, pred in _TYPE_GROUPS:
        if pred(ty):
            return name
    return str(ty)


def committed_files(lake_dir: str) -> list[str]:
    """All committed data files (base + deltas, manifest-selected)."""
    store = ManifestStore(lake_dir)
    m = store.load()
    out = []
    for _, ps in sorted(m.partitions.items()):
        out.extend(store.partition_data_files(ps))
    return out


def _resolve_state_table(t: pa.Table, cfg_eff: "CdcConfig", script,
                         version: int) -> pa.Table:
    """Shared merge-on-read kernel: conform → state-as-events → LWW or
    merge-policy reduce → tombstone flag. One partition's base+delta
    concat in, its resolved state out — used by read_lake, read_lake_keys
    and read_lake_at so all three see identical semantics."""
    if script is not None:
        t = conform_table(t, script, version)
    ev = state_to_events(t, cfg_eff.op_column)
    if cfg_eff.merge_policy is not None:
        winners = cfg_eff.merge_policy.reduce(ev)
    else:
        winners = lww_resolve_table(
            ev, list(cfg_eff.key_columns), cfg_eff.seq_column,
            cfg_eff.op_column, keep_tombstones=True)
    return flag_deleted(winners, cfg_eff.op_column)


def read_lake(lake_dir: str, include_tombstones: bool = False,
              cfg: CdcConfig | None = None, filter: tuple | None = None):
    """The committed view as a Dataset (manifest-selected files only —
    orphans from crashed epochs are invisible).

    Copy-on-write partitions stream straight from their base files. Delta
    partitions are MERGED ON READ: one Ray task per partition LWW-resolves
    base + deltas (Hudi merge-on-read semantics; block granularity = one
    partition, so the read stays streaming and parallel).

    ``filter``: ``(col, op, value)`` with op in ``== < <= > >=``,
    ``(col, "between", lo, hi)``, ``(col, "in", [values...])``, or a LIST
    of those (implicit AND — a
    partition is skipped when any predicate's zone refutes it, rows must
    satisfy all). Partitions whose manifest ZONE MAP
    (PartitionState.zone — per-column min/max recorded at write time)
    proves the predicate can't match are SKIPPED without opening their
    files (the non-key serving-scan pruning the key-routed
    ``read_lake_keys`` can't give you); surviving partitions re-check
    every row, so the result is exact. Partitions whose zone predates the
    field or lacks the column are conservatively read.

    When ``cfg.bloom_columns`` names the filtered column, ``==`` predicates
    get a second pruning pass zones can't provide: each zone-admitted
    partition's data-file FOOTERS carry per-column blooms
    (``_bloom_footer_meta``), and a partition is skipped when every file's
    bloom PROVES the value absent. Footer-only (tail KBs per file, fanned
    out in Ray tasks); files without blooms admit, so the pass is safe on
    mixed/pre-bloom lakes.

    Schema-version-aware: partitions last rewritten under an OLDER schema
    version are conformed to the manifest's current version in flight (the
    legacy-schema fallback reader of
    /root/reference/src/core/logic/canonical_exporter.py:163-228, done as a
    batch rewrite instead of a fallback query)."""
    import ray.data as rd

    store = ManifestStore(lake_dir)
    m = store.load()
    if not m.partitions:
        raise FileNotFoundError(f"no committed partitions in {lake_dir}")
    script = cfg.schema_script if cfg is not None else None
    version = m.schema_version

    parts = sorted(m.partitions.items())
    if filter is not None:
        preds = _as_filter_list(filter)
        # AND semantics: a partition is read only when EVERY predicate's
        # zone check admits it (any refuting zone proves no row matches)
        parts = [(pid, ps) for pid, ps in parts
                 if all(_zone_admits(ps.zone, p) for p in preds)]
        # bloom pass for EQUALITY predicates on bloom-indexed columns:
        # zones rarely refute high-cardinality equality, so probe the
        # zone-admitted partitions' data-file FOOTERS (never a row group)
        # and drop every partition whose files all prove absence
        # Sound for LWW only: the resolved row is some file's row verbatim,
        # so one file witnesses every predicate at once. A merge POLICY
        # synthesizes resolved values ACROSS files (widen min/max), which
        # no single file's bloom can witness — skip the pass entirely there
        # (zones still apply; they are recomputed over resolved rows).
        bloom_cols = (tuple(cfg.bloom_columns)
                      if cfg is not None and cfg.merge_policy is None else ())
        eq_preds = [p for p in preds
                    if p[1] in ("==", "in") and p[0] in bloom_cols]
        if eq_preds and parts:
            parts = _bloom_prune(store, parts, eq_preds)
        if not parts:
            # every partition pruned: an empty Dataset with the lake schema,
            # from footers only (never a full read plan — the read_lake_keys
            # ADVICE lesson); corrupt/reclaimed pruned files are tolerated
            return _empty_lake_dataset(store, m, script, version)

    if any(ps.delta_epochs for _, ps in parts):
        import ray

        cfg_eff = cfg or CdcConfig()

        @ray.remote(num_cpus=1)
        def merge_read(pid: int, files: list[str]) -> pa.Table:
            import pyarrow.parquet as pq

            t = pa.concat_tables([pq.read_table(f) for f in files],
                                 promote_options="permissive")
            t = _resolve_state_table(t, cfg_eff, script, version)
            # part_id parity with the hive-inferring cow scan and point
            # reads (ADVICE r4: per-file delta reads don't see the hive
            # directory column, so the two paths returned different schemas)
            return t.append_column("part_id",
                                   pa.array([pid] * len(t), pa.int32()))

        refs = [merge_read.remote(pid, store.partition_data_files(ps))
                for pid, ps in parts]
        ds = rd.from_arrow_refs(refs)
    else:
        ds = rd.read_parquet(
            [f for _, ps in parts for f in store.partition_data_files(ps)])

        def _norm(t: pa.Table) -> pa.Table:
            # hive inference types the part_id directory column as string;
            # the delta/point paths emit int32 — normalize so the same lake
            # reads with ONE schema whichever path serves it
            if "part_id" in t.column_names \
                    and t.schema.field("part_id").type != pa.int32():
                i = t.schema.get_field_index("part_id")
                t = t.set_column(i, "part_id",
                                 pc.cast(t["part_id"], pa.int32()))
            return conform_table(t, script, version) if script is not None \
                else t

        ds = ds.map_batches(_norm, batch_format="pyarrow")
    if filter is not None:
        def apply_all(t: pa.Table) -> pa.Table:
            for p in preds:
                t = _filter_batch(t, p)
            return t

        ds = ds.map_batches(apply_all, batch_format="pyarrow")
    if not include_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.fill_null(t["deleted"], False))),
            batch_format="pyarrow",
        )
    return ds


def _route_key_rows(store: "ManifestStore", m, cfg_eff: "CdcConfig", keys):
    """Normalize + dedupe caller keys, TYPE-FENCE them against the lake's
    stored key column types (ADVICE r4: a pa.array-inferred type that
    hashes differently would route to the wrong partition and come back
    silently empty — same-group mismatches cast, cross-group raise), and
    route each to its owning partition. Returns ``(rows, by_pid)``; shared
    by read_lake_keys and the key-routed change feed."""
    kcols = list(cfg_eff.key_columns)
    nparts = m.num_partitions or cfg_eff.num_partitions
    rows = [tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in keys]
    rows = list(dict.fromkeys(rows))  # dedupe, keep caller order
    if len(rows) == 0:
        raise ValueError("key-routed reads need at least one key")
    if any(len(r) != len(kcols) for r in rows):
        raise ValueError(f"keys must have {len(kcols)} parts ({kcols})")
    ktab = pa.table({c: pa.array([r[i] for r in rows])
                     for i, c in enumerate(kcols)})
    lake_schema = None
    for _, ps in sorted(m.partitions.items()):
        try:
            import pyarrow.parquet as pq

            lake_schema = pq.read_schema(
                store.partition_file(ps.part_id, ps.resolved_base_epoch()))
            break
        except Exception:
            continue
    if lake_schema is not None:
        cast_cols = {}
        for c in kcols:
            have, want = ktab[c].type, lake_schema.field(c).type
            if _type_group(have) != _type_group(want):
                raise TypeError(
                    f"key column {c!r}: caller passed {have} but the lake "
                    f"stores {want} — routing would silently miss; pass "
                    "keys with the stored types")
            cast_cols[c] = ktab[c].cast(want)
        ktab = pa.table(cast_cols)
    pids = partition_ids(ktab, kcols, nparts)
    by_pid: dict[int, list[tuple]] = {}
    for r, pid in zip(rows, pids):
        by_pid.setdefault(int(pid), []).append(r)
    return rows, by_pid


def read_lake_keys(lake_dir: str, keys, cfg: CdcConfig | None = None,
                   include_tombstones: bool = False):
    """Key-routed point read: the committed state of SPECIFIC keys, opening
    ONLY the partitions that own them.

    The lake is hash-partitioned (functions/hashing.py:partition_ids), so a
    key's owner is computable from the manifest's recorded routing width —
    a lookup touches O(|keys|) partitions instead of scanning the lake (at
    10^4 partitions a 3-key lookup reads 3 files, not the 100 TB). Inside a
    partition the scan is a parquet read with a first-key-column
    ``isin`` row-group predicate (a cheap superset), then an exact
    composite-key join; delta partitions merge-on-read exactly like
    ``read_lake`` before the join, so point reads see the same LWW /
    merge-policy semantics as full reads (digest-parity tested).

    ``keys``: iterable of scalars (single key column) or tuples in
    ``cfg.key_columns`` order. Returns a Dataset (one block per touched
    partition). Lakes whose manifest predates the recorded width fall back
    to ``cfg.num_partitions`` — correct only if the caller knows the width
    the lake was written with (every writer path now records it)."""
    import ray
    import ray.data as rd

    cfg_eff = cfg or CdcConfig()
    kcols = list(cfg_eff.key_columns)
    store = ManifestStore(lake_dir)
    m = store.load()
    if not m.partitions:
        raise FileNotFoundError(f"no committed partitions in {lake_dir}")

    rows, by_pid = _route_key_rows(store, m, cfg_eff, keys)

    script, version = cfg_eff.schema_script, m.schema_version

    @ray.remote(num_cpus=1)
    def point_read(pid: int, files: list[str], want: list[tuple],
                   has_deltas: bool) -> pa.Table:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        pred = pads.field(kcols[0]).isin([w[0] for w in want])
        t = pa.concat_tables(
            [pq.read_table(f, filters=pred) for f in files],
            promote_options="permissive")
        # part_id is a hive directory column — per-file reads don't see it;
        # restore it for schema parity with read_lake's cow path
        if "part_id" not in t.column_names:
            t = t.append_column("part_id",
                                pa.array([pid] * len(t), pa.int32()))
        if script is not None:
            t = conform_table(t, script, version)
        if has_deltas:  # merge-on-read, same kernel as read_lake
            # (conform already ran above, so script=None here; part_id is a
            # per-partition constant and rides the reduce like in apply)
            t = _resolve_state_table(t, cfg_eff, None, version)
        wt = pa.table({c: pa.array([w[i] for w in want]).cast(
            t.schema.field(c).type) for i, c in enumerate(kcols)})
        return t.join(wt, keys=kcols, join_type="inner")

    refs = [point_read.remote(pid,
                              store.partition_data_files(m.partitions[pid]),
                              want, bool(m.partitions[pid].delta_epochs))
            for pid, want in sorted(by_pid.items()) if pid in m.partitions]
    if not refs:  # every requested key routes to a never-written partition:
        # a typed empty from footers only (ADVICE r4 — the old
        # read_lake().limit(0) launched a merge task per partition and died
        # on lakes with unreadable non-owning partitions)
        return _empty_lake_dataset(store, m, script, version)
    ds = rd.from_arrow_refs(refs)
    if not include_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.fill_null(t["deleted"], False))),
            batch_format="pyarrow",
        )
    return ds


def partition_states_at(store: ManifestStore, epoch: int,
                        m=None, recs=None) -> dict[int, "PartitionState"]:
    """The lake's partition table AS OF ``epoch``: fold the append-only
    per-epoch lineage records (``_manifest/epoch=<e>.json``) in order, last
    write per partition wins. Clamped at the manifest's committed epoch:
    ``commit_epoch`` writes the lineage record FIRST and current.json last,
    so a writer crashing between the two leaves an orphan epoch=N.json that
    was never committed — folding it would serve exactly the mixed state
    time-travel readers promise never to serve (current.json is the commit
    point). Shared by ``read_lake_at`` and the partition-partial mart.
    ``recs``: pre-loaded ``store.epoch_records()`` to avoid a second
    listdir+parse pass when the caller already has them."""
    mm = store.load() if m is None else m
    recs = [r for r in (store.epoch_records() if recs is None else recs)
            if r["epoch"] <= min(epoch, mm.epoch)]
    if not recs:
        raise ValueError(f"no epoch ≤ {epoch} committed in {store.lake_dir}")
    parts: dict[int, PartitionState] = {}
    for rec in sorted(recs, key=lambda r: r["epoch"]):
        for d in rec["partitions"]:
            parts[int(d["part_id"])] = PartitionState(**d)
    if not parts:
        raise FileNotFoundError(f"no partitions as of epoch {epoch}")
    return parts


def read_lake_at(lake_dir: str, epoch: int, cfg: CdcConfig | None = None,
                 include_tombstones: bool = False):
    """TIME TRAVEL: the lake AS OF ``epoch`` — the state a reader would have
    seen right after that epoch's commit.

    The manifest's append-only per-epoch lineage records (K6/T8,
    ``_manifest/epoch=<e>.json``) each carry the partition rows that commit
    produced; folding records ≤ epoch in order reconstructs the historical
    partition table, and the referenced base/delta files are still on disk
    because writers never overwrite (cow writes a NEW epoch file, delta
    appends) — history only disappears when ``ManifestStore.gc()`` reclaims
    it, in which case this raises naming the reclaimed file rather than
    silently serving a mixed state. Reads go through the same per-partition
    merge-on-read kernel as ``read_lake`` (prefix-replay digest parity is
    the test), conformed to the CURRENT schema version like any
    older-schema partition."""
    import ray
    import ray.data as rd

    cfg_eff = cfg or CdcConfig()
    store = ManifestStore(lake_dir)
    m = store.load()
    parts = partition_states_at(store, epoch, m=m)
    missing = [f for ps in parts.values()
               for f in store.partition_data_files(ps)
               if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"time travel to epoch {epoch} needs {missing[0]} (+"
            f"{len(missing) - 1} more), reclaimed by gc(); rerun gc with "
            "keep_epochs covering the travel window")
    script, version = cfg_eff.schema_script, m.schema_version

    @ray.remote(num_cpus=1)
    def merge_read(pid: int, files: list[str]) -> pa.Table:
        import pyarrow.parquet as pq

        t = pa.concat_tables([pq.read_table(f) for f in files],
                             promote_options="permissive")
        t = _resolve_state_table(t, cfg_eff, script, version)
        # part_id parity with read_lake / point reads (ADVICE r4)
        return t.append_column("part_id",
                               pa.array([pid] * len(t), pa.int32()))

    refs = [merge_read.remote(pid, store.partition_data_files(ps))
            for pid, ps in sorted(parts.items())]
    ds = rd.from_arrow_refs(refs)
    if not include_tombstones:
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.fill_null(t["deleted"], False))),
            batch_format="pyarrow",
        )
    return ds


def read_changes(lake_dir: str, from_epoch: int, to_epoch: int | None = None,
                 cfg: CdcConfig | None = None, json_payload: bool = False,
                 changed_fields: bool = False, include_seq_only: bool = False,
                 conform_version: int | None = None, keys=None):
    """CHANGE FEED: the per-key NET changes between two committed epochs —
    what a downstream consumer (cache invalidation, incremental mart
    refresh) must apply to move from the state as of ``from_epoch`` to the
    state as of ``to_epoch`` (window ``(from_epoch, to_epoch]``; any
    ``from_epoch`` before the lake's first committed epoch diffs against
    the empty lake, ``to_epoch=None`` means the current committed epoch).

    Reference parity: the per-entity change log — operation, before/after
    payload, indexed by (entity, time) — of
    /root/reference/src/tracking/entities/entity_change_log.py:8-40 (recorded
    at src/tracking/recorder.py:132-279, exported at
    canonical_exporter.py:1943-2001), re-expressed as a COLUMNAR diff of the
    lake's own committed history instead of a row-store side table: the
    manifest's append-only epoch records say which partitions each commit
    touched, so the feed reads ONLY those partitions (untouched partitions
    cost nothing), and each touched partition is diffed independently in one
    Ray task (keys never change partitions — the width fence guarantees it).

    Returns a Dataset with one row per key whose LIVENESS or PAYLOAD differs
    between the two states:

      - ``op``: ``insert`` (not live before, live after), ``delete`` (live
        before, not live after), ``update`` (live at both, payload differs).
        Keys whose resolved row changed only in ``seq`` (a later writer
        re-asserting identical content) are NOT in the feed; neither are
        keys created and deleted entirely inside the window (net zero).
        ``include_seq_only=True`` adds those re-assertions as ``update``
        rows (before == after payload, new ``seq``) — consumers that must
        mirror the lake EXACTLY, seq included (``replication.replicate``),
        need them; cache-invalidation consumers don't.
        ``keys=[...]`` turns the feed into a KEY-ROUTED POINT FEED: only
        the partitions owning those keys are diffed (manifest-width
        routing + the read_lake_keys type fence), with an exact key filter
        on the result — "what changed for THESE entities" without paying
        for the window's other partitions.
      - ``epoch``: the window epoch whose commit produced the after-state —
        for an LWW lake this is exactly the epoch of the winning (max-seq)
        event, computed as the last window epoch at which the key's resolved
        row (including seq) changed.
      - ``seq``: the after-state winner's seq (null when the key's tombstone
        was itself compacted away inside the window).
      - ``before_<col>`` / ``after_<col>`` for every payload column: the
        reference stores before/after as JSON blobs; a columnar engine keeps
        them typed and flat (null side for insert/delete). Pass
        ``json_payload=True`` to get the reference-shaped ``before`` /
        ``after`` JSON string columns instead (a serialization stage, off
        the hot path).
      - ``changed_fields=True`` adds a ``list<string>`` column naming the
        payload fields each row touched, in schema order — the reference's
        ``changed_fields_json`` (entity_change_log.py:35, populated at
        recorder.py:252-275 and e.g. flows/lattes/projects.py:174-186):
        updates list the fields whose value differs (null-safe), inserts
        the populated (non-null) fields, deletes the fields the removed
        row had populated.

    Replayability: feeding ``read_changes(lake, -1)`` rows back through
    ``apply_epoch`` onto an empty lake reproduces the live state digest
    (tested) — the feed IS a minimal re-materialization recipe.

    Vector payloads (list-typed columns, e.g. an embeddings CDC lake) diff
    elementwise and land typed in ``before_``/``after_``; consume those
    feeds as Arrow (``iter_batches(batch_format="pyarrow")`` /
    ``to_arrow_refs``) — Ray's ``to_pandas`` tensor-extension cast rejects
    ragged nullable list columns on the driver. ``json_payload=True``
    serializes vectors as JSON arrays.

    Cost: each touched partition materializes one state per window epoch
    that rewrote it, but every file is READ once and every event reduced
    once per feed — delta-mode states roll forward incrementally
    (resolve(prev_state ∪ new_delta), the merge-on-read contract), so a
    W-epoch window costs O(base + deltas) reads, not O(W²). Cow epochs are
    one base file each. The per-epoch pandas frames still cost O(W · rows)
    memory in the diff — poll very long windows incrementally.
    A partition is window-touched by a record only if its row was WRITTEN
    at that record's epoch (``PartitionState.epoch == record epoch``):
    compaction lists every partition in its record but carries clean ones
    forward with their old epoch — those byte-identical states are pruned
    (diffing them provably emits nothing), so a routine compaction in the
    window costs O(partitions it rewrote), not a full-lake diff. Rewritten
    (dirty) partitions stay in the window, preserving the compacted-
    tombstone semantics below exactly.
    Raises FileNotFoundError when gc() has reclaimed a needed historical
    file (never silently serves a mixed state), like ``read_lake_at``."""
    import json as _json

    import pandas as pd

    import ray
    import ray.data as rd

    cfg_eff = cfg or CdcConfig()
    kcols = list(cfg_eff.key_columns)
    seq_col = cfg_eff.seq_column
    store = ManifestStore(lake_dir)
    m = store.load()
    if m.epoch < 0:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    to_eff = m.epoch if to_epoch is None else min(to_epoch, m.epoch)
    if from_epoch > to_eff:
        raise ValueError(f"from_epoch {from_epoch} > to_epoch {to_eff}")
    recs = sorted((r for r in store.epoch_records() if r["epoch"] <= to_eff),
                  key=lambda r: r["epoch"])
    from_ps: dict[int, PartitionState] = {}
    window: dict[int, list[tuple[int, PartitionState]]] = {}
    for rec in recs:
        e = int(rec["epoch"])
        for d in rec["partitions"]:
            ps = PartitionState(**d)
            if e <= from_epoch:
                # carried rows DO fold into the from-state: the partition
                # table as of from_epoch needs every record's rows
                from_ps[ps.part_id] = ps
            elif ps.epoch == e:  # written AT e; carried rows are pruned
                window.setdefault(ps.part_id, []).append((e, ps))
    # keys: the KEY-ROUTED point feed — "what changed for THESE keys in the
    # window". Routing restricts the diff to the partitions that own the
    # keys (same manifest-width hashing + type fence as read_lake_keys, so
    # a 3-key feed over a 10^4-partition lake diffs 3 partitions), then an
    # exact per-row key filter trims the owning partitions' other changes.
    key_rows = None
    if keys is not None:
        key_rows, by_pid_k = _route_key_rows(store, m, cfg_eff, keys)
        own = set(by_pid_k)
        window = {pid: evs for pid, evs in window.items() if pid in own}

    # conform_version: the schema version the before/after payload is
    # rewritten to. Default = the lake's CURRENT committed version (the
    # reader-facing convention everywhere else); consumers replaying a lag
    # window (replication) pass the version AS OF the window end so the
    # feed is a pure function of (from, to) — crash-retried syncs see
    # byte-identical rows even after later DDL commits.
    script = cfg_eff.schema_script
    version = (m.schema_version if conform_version is None
               else min(int(conform_version), m.schema_version))

    needed = [f for pid, evs in window.items()
              for ps in ([from_ps[pid]] if pid in from_ps else [])
              + [p for _, p in evs]
              for f in store.partition_data_files(ps)]
    missing = [f for f in needed if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"change feed ({from_epoch}, {to_eff}] needs {missing[0]} "
            f"(+{len(missing) - 1} more), reclaimed by gc(); rerun gc with "
            "keep_epochs covering the feed window")

    @ray.remote(num_cpus=1)
    def diff_partition(from_files: list[str] | None,
                       epoch_files: list[tuple[int, list[str]]]) -> pa.Table:
        import pyarrow.parquet as pq

        def canon_cell(v):
            # list-typed payload cells (e.g. embeddings) come back from
            # to_pandas as numpy arrays, whose elementwise == would raise
            # "truth value is ambiguous" in every comparison below; tuples
            # compare as scalars, hash, and round-trip through pa.array.
            # (NaN elements inside a vector compare unequal to themselves
            # across frames, so identical NaN-bearing vectors register as
            # an update — harmless: a no-op before==after delta.)
            if v is None:
                return None
            if isinstance(v, (list, np.ndarray)):
                return tuple(canon_cell(x) for x in v)
            return v

        # Incremental state roll: a delta partition's file list at epoch e
        # is base + deltas ≤ e — a strict PREFIX of the list at e+1 — and
        # resolve(resolved_state ∪ new_deltas) == resolve(all files) is the
        # merge-on-read contract itself (a compacted base IS a previously
        # resolved state; LWW/policy idempotence is hypothesis-pinned). So
        # each file is read and each event reduced ONCE per feed, O(E)
        # instead of O(E²) over a W-epoch window. A cow rewrite or
        # compaction changes the base → prefix miss → full (1-file) read.
        prev_state: tuple[list[str], pa.Table] | None = None

        def resolve(files: list[str]) -> pd.DataFrame:
            nonlocal prev_state
            if (prev_state is not None
                    and files[: len(prev_state[0])] == prev_state[0]
                    and len(files) > len(prev_state[0])):
                srcs = [prev_state[1]] + [
                    pq.read_table(f) for f in files[len(prev_state[0]):]]
            else:
                srcs = [pq.read_table(f) for f in files]
            t = pa.concat_tables(srcs, promote_options="permissive")
            t = _resolve_state_table(t, cfg_eff, script, version)
            prev_state = (files, t)
            if "part_id" in t.column_names:
                t = t.drop_columns(["part_id"])
            df = t.to_pandas()
            for c in t.column_names:
                ty = t.schema.field(c).type
                if (pa.types.is_list(ty) or pa.types.is_large_list(ty)
                        or pa.types.is_fixed_size_list(ty)):
                    df[c] = df[c].map(canon_cell)
            return t, df

        frames: list[tuple[int, pd.DataFrame]] = []
        schema_t = None
        if from_files:
            schema_t, df = resolve(from_files)
            frames.append((from_epoch, df))
        for e, files in epoch_files:
            schema_t, df = resolve(files)
            frames.append((e, df))

        payload_cols = [c for c in schema_t.column_names
                        if c not in (*kcols, seq_col, "deleted")]
        cmp_cols = [seq_col, "deleted", *payload_cols]

        parts = []
        for e, df in frames:
            df = df.copy()
            df["_epoch"] = np.int64(e)
            parts.append(df)
        big = pd.concat(parts, ignore_index=True)
        big = big.sort_values([*kcols, "_epoch"],
                              kind="mergesort").reset_index(drop=True)
        prev = big.shift(1)

        def _null_safe_eq(cols: list[str]) -> np.ndarray:
            eq = np.ones(len(big), dtype=bool)
            for c in cols:
                a, b = big[c], prev[c]
                both_null = a.isna().to_numpy() & b.isna().to_numpy()
                eq &= (a == b).to_numpy(dtype=bool, na_value=False) | both_null
            return eq

        same_key = _null_safe_eq(kcols) if len(big) else np.array([], bool)
        row_eq = _null_safe_eq(cmp_cols) if len(big) else np.array([], bool)
        in_window = (big["_epoch"] > from_epoch).to_numpy()
        changed = (~same_key | ~row_eq) & in_window
        big["_chg"] = np.where(changed, big["_epoch"].to_numpy(),
                               np.int64(-1))
        last_chg = big.groupby(kcols, sort=False)["_chg"].max()

        f_df = (frames[0][1] if from_files else big.iloc[0:0]
                ).set_index(kcols)
        t_df = frames[-1][1].set_index(kcols)
        keys_all = f_df.index.union(t_df.index)
        in_f = keys_all.isin(f_df.index)
        in_t = keys_all.isin(t_df.index)

        # absent = not live (a compacted-away tombstone is still dead)
        dead_f = f_df["deleted"].reindex(keys_all).to_numpy(
            dtype=object, na_value=True).astype(bool)
        dead_t = t_df["deleted"].reindex(keys_all).to_numpy(
            dtype=object, na_value=True).astype(bool)
        live_f, live_t = in_f & ~dead_f, in_t & ~dead_t

        pay_diff = np.zeros(len(keys_all), dtype=bool)
        for c in payload_cols:
            a = f_df[c].reindex(keys_all)
            b = t_df[c].reindex(keys_all)
            both_null = a.isna().to_numpy() & b.isna().to_numpy()
            pay_diff |= ~((a == b).to_numpy(dtype=bool, na_value=False)
                          | both_null)
        feed = (live_f != live_t) | (live_f & live_t & pay_diff)
        if include_seq_only:
            a = f_df[seq_col].reindex(keys_all)
            b = t_df[seq_col].reindex(keys_all)
            both_null = a.isna().to_numpy() & b.isna().to_numpy()
            seq_diff = ~((a == b).to_numpy(dtype=bool, na_value=False)
                         | both_null)
            feed |= live_f & live_t & seq_diff
        sel = keys_all[feed]
        lf, lt = live_f[feed], live_t[feed]
        op = np.where(~lf & lt, "insert", np.where(lf & ~lt, "delete",
                                                   "update"))

        chg = last_chg.reindex(sel).to_numpy()
        seq_after = t_df[seq_col].reindex(sel)

        cols: dict[str, pa.Array] = {}
        if len(kcols) == 1:
            key_vals = [(v,) for v in sel]
        else:
            key_vals = list(sel)
        for i, k in enumerate(kcols):
            ty = schema_t.schema.field(k).type
            cols[k] = pa.array([kv[i] for kv in key_vals], type=ty)
        cols["op"] = pa.array(op.tolist(), pa.string())
        cols["epoch"] = pa.array(
            [int(v) for v in chg], pa.int64())
        cols[seq_col] = pa.array(
            [None if pd.isna(v) else int(v) for v in seq_after], pa.int64())
        field_lists = ([[] for _ in range(len(sel))]
                       if changed_fields else None)
        for c in payload_cols:
            ty = schema_t.schema.field(c).type
            bvals = f_df[c].reindex(sel).where(pd.Series(lf, index=sel), None)
            avals = t_df[c].reindex(sel).where(pd.Series(lt, index=sel), None)
            if changed_fields and len(sel):
                bn, an = pd.notna(bvals).to_numpy(), pd.notna(avals).to_numpy()
                eq = ((bvals == avals).to_numpy(dtype=bool, na_value=False)
                      | (~bn & ~an))
                inc = np.where(op == "insert", an,
                               np.where(op == "delete", bn, ~eq))
                for i in np.flatnonzero(inc):
                    field_lists[i].append(c)
            def null_cell(v):
                # pd.isna broadcasts over tuple cells (canonicalized list
                # payloads) — treat any non-scalar as a present value
                if v is None:
                    return True
                if isinstance(v, tuple):
                    return False
                try:
                    return bool(pd.isna(v))
                except (TypeError, ValueError):
                    return False

            cols[f"before_{c}"] = pa.array(
                [None if null_cell(v) else v for v in bvals], type=ty)
            cols[f"after_{c}"] = pa.array(
                [None if null_cell(v) else v for v in avals], type=ty)
        if changed_fields:
            cols["changed_fields"] = pa.array(
                field_lists, type=pa.list_(pa.string()))
        return pa.table(cols)

    refs = [diff_partition.remote(
        (store.partition_data_files(from_ps[pid])
         if pid in from_ps else None),
        [(e, store.partition_data_files(ps)) for e, ps in evs])
        for pid, evs in sorted(window.items())]
    if not refs:
        # Every epoch in the window was an EMPTY commit (apply_epoch on a
        # zero-event micro-batch legally advances m.epoch with no partition
        # rows): the feed is empty, not an error — refresh_mart and the CLI
        # --changes path must advance their pointer past such windows. The
        # schema comes from partition footers only (same discipline as
        # _empty_lake_dataset); raise only if no record at all covers the
        # window (a hand-built manifest with missing lineage).
        if not any(int(r["epoch"]) > from_epoch for r in recs):
            raise ValueError(
                f"no epochs committed in ({from_epoch}, {to_eff}] of "
                f"{lake_dir}")
        lake_t = _empty_lake_table(store, m, script, version)
        cols: dict[str, pa.Array] = {}
        for k in kcols:
            cols[k] = pa.array([], lake_t.schema.field(k).type)
        cols["op"] = pa.array([], pa.string())
        cols["epoch"] = pa.array([], pa.int64())
        cols[seq_col] = pa.array([], pa.int64())
        pay = [c for c in lake_t.column_names
               if c not in (*kcols, seq_col, "deleted", "part_id")]
        for c in pay:
            ty = lake_t.schema.field(c).type
            cols[f"before_{c}"] = pa.array([], ty)
            cols[f"after_{c}"] = pa.array([], ty)
        if changed_fields:
            cols["changed_fields"] = pa.array([], pa.list_(pa.string()))
        refs = [ray.put(pa.table(cols))]
    ds = rd.from_arrow_refs(refs)
    if key_rows is not None:
        keyset = set(key_rows)

        def keep_keys(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            # exact tuple membership; batches here are the OWNING
            # partitions' window changes only (small by construction — the
            # routing above did the heavy pruning)
            vals = [t[c].to_numpy(zero_copy_only=False) for c in kcols]
            mask = np.fromiter((tup in keyset for tup in zip(*vals)),
                               dtype=bool, count=len(t))
            return t.filter(pa.array(mask))

        ds = ds.map_batches(keep_keys, batch_format="pyarrow",
                            batch_size=None)
    if json_payload:
        def to_json_cols(df: pd.DataFrame) -> pd.DataFrame:
            bcols = [c for c in df.columns if c.startswith("before_")]
            acols = [c for c in df.columns if c.startswith("after_")]
            # per-row dict→dumps is a Python loop by construction — this is
            # the opt-in reference-shaped serialization stage, not hot path
            def jval(v):
                # to_pandas turns numeric nulls into NaN / NaT / pd.NA;
                # json.dumps would emit a literal NaN token (not RFC JSON)
                # or stringify pd.NA via default=str — both break strict
                # downstream parsers, so nulls become JSON null here
                if v is None:
                    return None
                try:
                    if pd.isna(v):
                        return None
                except (TypeError, ValueError):  # list/array cell
                    pass
                if isinstance(v, np.ndarray):  # vector payload → JSON array
                    return v.tolist()
                if isinstance(v, np.generic):  # np.bool_ etc. → native
                    return v.item()
                return v

            def dump(sub: pd.DataFrame, names: list[str], live) -> list:
                recs = sub.to_dict("records")
                return [
                    _json.dumps({n: jval(r[n]) for n in names},
                                sort_keys=True, separators=(",", ":"),
                                default=str) if lv else None
                    for r, lv in zip(recs, live)]
            names_b = [c[len("before_"):] for c in bcols]
            names_a = [c[len("after_"):] for c in acols]
            out = df.drop(columns=bcols + acols).copy()
            out["before"] = dump(
                df[bcols].rename(columns=dict(zip(bcols, names_b))),
                names_b, (df["op"] != "insert"))
            out["after"] = dump(
                df[acols].rename(columns=dict(zip(acols, names_a))),
                names_a, (df["op"] != "delete"))
            return out

        ds = ds.map_batches(to_json_cols, batch_format="pandas")  # pandas: opt-in JSON serialization stage, per-row by design
    return ds


def read_history(lake_dir: str, to_epoch: int | None = None,
                 cfg: CdcConfig | None = None, keys=None):
    """SCD-2 HISTORY VIEW: one row per VERSION each key's visible state ever
    held, with its validity interval in commit epochs — the standard serving
    view downstream of a change feed (a dimension-table history a warehouse
    user would query with ``... WHERE e BETWEEN valid_from AND valid_to``).

    Reference parity: the per-entity change log
    (/root/reference/src/tracking/entities/entity_change_log.py:8-40) read
    back as intervals instead of point changes — what its exporter's
    "latest state + audit trail" consumers
    (canonical_exporter.py:1943-2001) reconstruct by hand.

    Semantics (merge-policy-agnostic — versions are diffs of RESOLVED lake
    states, so widen/custom policies version correctly too):

      - a version OPENS at epoch e when the key's visible state (liveness +
        payload) first becomes live, or changes payload while live;
      - a version CLOSES (``valid_to_epoch`` = e) when the next visible
        change commits at e — a payload change or a delete; the closing
        epoch is exclusive (the version was the state as of epochs
        ``[valid_from_epoch, valid_to_epoch)``);
      - ``valid_to_epoch`` is null and ``is_current`` true on each key's
        open (currently live) version; a currently-deleted key's last
        version is closed and no row is current;
      - seq-only re-assertions of identical content do NOT open a version
        (same rule as ``read_changes``); ``seq`` is the resolved winner's
        seq at the opening epoch.

    Output columns: key columns, every payload column (the version's typed
    values), ``seq``, ``valid_from_epoch``, ``valid_to_epoch`` (nullable),
    ``is_current``.

    Execution: keys never change partitions (width fence), so each
    partition's full history is assembled in ONE Ray task with no shuffle —
    the manifest's epoch records name which epochs wrote the partition
    (compaction-carried byte-identical states are pruned exactly like
    ``read_changes``), states roll forward incrementally (each delta file
    read once, O(E) not O(E²)), and the interval walk STREAMS: it holds
    only the previous resolved frame, the open versions and the closed
    output — O(rows + versions) memory per task regardless of epoch
    count, so a 1000-epoch partition walks in bounded space.
    Raises FileNotFoundError when gc() reclaimed a needed historical file
    (never silently serves a truncated history)."""
    import ray
    import ray.data as rd

    # window construction + gc check shared with the materialized history
    # (one copy of the carried-row pruning rule, not three — review fix)
    from .history import _check_files, _window_partitions

    cfg_eff = cfg or CdcConfig()
    kcols = list(cfg_eff.key_columns)
    seq_col = cfg_eff.seq_column
    store = ManifestStore(lake_dir)
    m = store.load()
    if m.epoch < 0:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    to_eff = m.epoch if to_epoch is None else min(to_epoch, m.epoch)
    window = _window_partitions(store, -1, to_eff)
    # keys: the KEY-ROUTED point history — walk only the partitions that
    # own the keys (same routing + type fence as read_lake_keys), exact
    # key filter on the version rows. A per-entity audit lookup on a lake
    # without a materialized history table (history.read_history_keys is
    # the equivalent on one).
    key_rows = None
    if keys is not None:
        key_rows, by_pid_k = _route_key_rows(store, m, cfg_eff, keys)
        own = set(by_pid_k)
        window = {pid: evs for pid, evs in window.items() if pid in own}
    _check_files(store, window, f"history to epoch {to_eff}")
    script, version = cfg_eff.schema_script, m.schema_version

    @ray.remote(num_cpus=1)
    def history_partition(epoch_files: list[tuple[int, list[str]]]
                          ) -> pa.Table:
        # the walk itself is shared with the MATERIALIZED history
        # (pipelines/history.py): streaming interval diff, O(rows +
        # versions) memory regardless of epoch count
        from .history import _versions_to_table, _walk_partition_history

        closed, open_, schema_t, keep_cols, _ = _walk_partition_history(
            epoch_files, cfg_eff, script, version)
        import pandas as pd

        parts = []
        if len(closed):
            parts.append(closed)
        if len(open_):
            op = open_.copy()
            op["_to"] = np.nan
            parts.append(op)
        if not parts:
            cols = {k: pa.array([], schema_t.schema.field(k).type)
                    for k in kcols}
            for c in (keep_cols or []):
                if c != seq_col:
                    cols[c] = pa.array([], schema_t.schema.field(c).type)
            cols[seq_col] = pa.array([], pa.int64())
            cols["valid_from_epoch"] = pa.array([], pa.int64())
            cols["valid_to_epoch"] = pa.array([], pa.int64())
            cols["is_current"] = pa.array([], pa.bool_())
            return pa.table(cols)
        return _versions_to_table(pd.concat(parts, ignore_index=True),
                                  schema_t, keep_cols, kcols, seq_col)

    refs = [history_partition.remote(
        [(e, store.partition_data_files(ps)) for e, ps in evs])
        for pid, evs in sorted(window.items())]
    if not refs:
        # every commit ≤ to_eff was an empty micro-batch: an empty history,
        # not an error (same discipline as read_changes' empty window)
        lake_t = _empty_lake_table(store, m, script, version)
        cols: dict[str, pa.Array] = {}
        for c in lake_t.column_names:
            if c in ("deleted", "part_id", seq_col):
                continue
            cols[c] = pa.array([], lake_t.schema.field(c).type)
        cols[seq_col] = pa.array([], pa.int64())
        cols["valid_from_epoch"] = pa.array([], pa.int64())
        cols["valid_to_epoch"] = pa.array([], pa.int64())
        cols["is_current"] = pa.array([], pa.bool_())
        refs = [ray.put(pa.table(cols))]
    ds = rd.from_arrow_refs(refs)
    if key_rows is not None:
        keyset = set(key_rows)

        def keep_keys(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            vals = [t[c].to_numpy(zero_copy_only=False) for c in kcols]
            mask = np.fromiter((tup in keyset for tup in zip(*vals)),
                               dtype=bool, count=len(t))
            return t.filter(pa.array(mask))

        ds = ds.map_batches(keep_keys, batch_format="pyarrow",
                            batch_size=None)
    return ds


def lake_global_digest(lake_dir: str, key_columns=DEFAULT_KEYS,
                       max_rows: int = 20_000_000,
                       cfg: CdcConfig | None = None) -> str:
    """FIXTURES.md §4 global digest: sha256 of newline-joined per-row content
    sha256s of live rows, sorted by key — partition-count invariant.

    Row-level and DRIVER-CONCATENATING by design (the verification oracle for
    test scales); it refuses lakes above ``max_rows`` so nobody points it at
    a production lake by accident — use ``manifest_digest`` there (combines
    the committed per-partition digests, O(partitions))."""
    m = ManifestStore(lake_dir).load()
    live = sum(ps.row_count for ps in m.partitions.values())
    if live > max_rows:
        raise ValueError(
            f"lake has {live} live rows > max_rows={max_rows}: "
            "lake_global_digest materializes row digests on the driver; "
            "use manifest_digest() at this scale"
        )
    # forward cfg so delta lakes with custom key/seq/op columns (or a merge
    # policy) resolve with THEIR config, not CdcConfig() defaults
    if cfg is not None and tuple(key_columns) == DEFAULT_KEYS:
        key_columns = cfg.key_columns
    ds = read_lake(lake_dir, cfg=cfg).select_columns(
        list(key_columns) + ["content_sha256"])
    t = ds.to_arrow_refs()
    import pyarrow as _pa
    import ray

    tables = [ray.get(r) for r in t]
    full = _pa.concat_tables([x for x in tables if len(x)]) if tables else None
    if full is None or len(full) == 0:
        return hashlib.sha256(b"").hexdigest()
    full = full.sort_by([(k, "ascending") for k in key_columns])
    blob = "\n".join(v.as_py() for v in full["content_sha256"])
    return hashlib.sha256(blob.encode()).hexdigest()


def compact(lake_dir: str, cfg: CdcConfig | None = None,
            drop_tombstones: bool = True, gc_old_epochs: bool = True) -> dict:
    """Compaction pass (the offline consolidation of the reference,
    /root/reference/src/core/logic/person_consolidator.py:25-113, as a lake
    maintenance op): merge each committed partition's base + deltas back
    into a single base file (the merge-on-read reconciler of delta mode),
    dropping tombstones, commit as a new epoch, then GC superseded files.

    Tombstones are only safe to drop once no event with seq ≤ the partition
    offset can still arrive — which the seq fence guarantees for this lake's
    own tail (any late replay ≤ offset is dropped before the merge)."""
    import pyarrow.parquet as pq

    import ray

    cfg = cfg or CdcConfig()
    store = ManifestStore(lake_dir)
    m = store.load()
    new_epoch = m.epoch + 1
    keys, seq_col, op_col = list(cfg.key_columns), cfg.seq_column, cfg.op_column

    policy = cfg.merge_policy
    bloom_cols = tuple(cfg.bloom_columns)

    @ray.remote(num_cpus=1)
    def compact_one(pid: int, srcs: list[str], dst: str, ps_dict: dict) -> dict:
        t = pa.concat_tables([pq.read_table(s) for s in srcs],
                             promote_options="permissive")
        if len(srcs) > 1:  # delta partition: reconcile base + deltas
            ev = state_to_events(t, op_col)
            if policy is not None:
                winners = policy.reduce(ev)
            else:
                winners = lww_resolve_table(ev, keys, seq_col, op_col,
                                            keep_tombstones=True)
            t = flag_deleted(winners, op_col)
        d = 0
        if drop_tombstones and ps_dict["tombstones"]:
            live = pc.invert(pc.fill_null(t["deleted"], False))
            d = len(t) - (pc.sum(live.cast(pa.int64())).as_py() or 0)
            t = t.filter(live)
        # like the write path, the compacted base carries per-column blooms
        # in its footer (a delta lake's blooms widen to the full payload
        # here, same as its zones)
        atomic_write_table(dst, t,
                           metadata=_bloom_footer_meta(t, bloom_cols))
        # row_count is documented as LIVE rows (tombstones excluded) — when
        # tombstones are kept, len(t) would overcount
        tombs = 0 if drop_tombstones else int(ps_dict["tombstones"])
        return dict(
            part_id=pid, epoch=new_epoch, offset=ps_dict["offset"],
            row_count=len(t) - tombs,
            tombstones=tombs,
            content_digest=ps_dict["content_digest"],
            schema_version=ps_dict["schema_version"], dropped=int(d),
            base_epoch=new_epoch, delta_epochs=[],
            # compaction sees the full reconciled payload, so even a delta
            # lake's zones widen to every payload column here
            zone=compute_zone(t),
        )

    from dataclasses import asdict

    # O(dirty partitions), not O(lake): a partition with a single base file
    # and no tombstones to drop is byte-identical after compaction — carry
    # its PartitionState forward instead of re-reading and re-writing the
    # full wide payload
    def _clean(ps) -> bool:
        return (not ps.delta_epochs
                and (ps.tombstones == 0 or not drop_tombstones))

    carried = [ps for _, ps in sorted(m.partitions.items()) if _clean(ps)]
    dirty = [(pid, ps) for pid, ps in sorted(m.partitions.items())
             if not _clean(ps)]
    refs = [
        compact_one.remote(
            pid, store.partition_data_files(ps),
            store.partition_file(pid, new_epoch), asdict(ps),
        )
        for pid, ps in dirty
    ]
    results = ray.get(refs)
    dropped = sum(r.pop("dropped") for r in results)
    rows = carried + [PartitionState(**r) for r in results]
    # num_partitions omitted: compaction rewrites files in place per
    # partition and never re-routes keys, so the recorded width carries
    store.commit_epoch(new_epoch, rows,
                       metrics={"mode": "compaction",
                                "tombstones_dropped": int(dropped),
                                "partitions_compacted": len(dirty),
                                "partitions_carried": len(carried)})
    removed = store.gc() if gc_old_epochs else 0
    return {"epoch": new_epoch, "tombstones_dropped": int(dropped),
            "files_gc": removed}


def manifest_digest(lake_dir: str) -> str:
    """Scale path: combine committed per-partition digests (deterministic for
    a fixed partition count)."""
    m = ManifestStore(lake_dir).load()
    blob = "\n".join(
        f"{pid}:{ps.content_digest}" for pid, ps in sorted(m.partitions.items())
    )
    return hashlib.sha256(blob.encode()).hexdigest()
