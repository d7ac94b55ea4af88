"""Checkpoint manifest + atomic file primitives (the exactly-once layer).

Parity targets:
  - atomic temp-file + fsync + rename writes that never leave a truncated
    file: /root/reference/src/core/logic/atomic_io.py:16-41
  - "never overwrite good data with empty" sink invariant:
    /root/reference/src/core/logic/canonical_exporter.py:970-992
  - replayed-input dedup via recorded lineage:
    /root/reference/src/tracking/entities/source_record.py:10-17
  - ingestion-run lineage rows: /root/reference/src/tracking/recorder.py:91-130

Protocol (per lake directory):

  lake/
    part_id=<pid>/epoch=<e>.parquet        # full partition state as of epoch e
    _manifest/current.json                 # atomic pointer: the committed view
    _manifest/epoch=<e>.json               # per-epoch commit record (lineage)
    _quarantine/...                        # dead-letter rows from validation

  * Data files are written ``<name>.tmp.<nonce>`` → fsync → ``os.replace``.
    File names are deterministic in (pid, epoch), so a retried/duplicate task
    re-writes the same bytes to the same name — duplicate execution is
    harmless (idempotent sink; Ray tasks are at-least-once).
  * ``current.json`` is the single commit point: a partition's new epoch file
    is INVISIBLE until current.json says so. Crash between data write and
    manifest write ⇒ the orphan epoch file is ignored and re-written on
    resume.
  * Epoch fencing: ``commit_epoch`` refuses to move a partition backwards
    (stale writer from an older epoch cannot clobber newer state).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Any


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write-temp + fsync + rename in the destination directory."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".tmp.")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        _fsync_dir(d)  # persist the rename itself
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True, indent=1).encode())


def _fsync_dir(d: str) -> None:
    try:
        fd = os.open(d, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass  # some filesystems refuse dir fsync; rename is still atomic
    finally:
        os.close(fd)


def atomic_write_table(path: str, table, compression: str = "zstd",
                       metadata: dict | None = None) -> None:
    """Atomically write a pyarrow table as one parquet file.

    fsyncs the data AND the directory entry before/after the rename — the
    manifest commit (current.json) must never point at a data file whose
    blocks a crash could still lose (the module-docstring protocol).

    ``metadata``: extra key→value pairs merged into the parquet FOOTER
    (schema metadata) — e.g. the per-file column blooms; footer-resident
    so they share the file's atomicity and gc lifetime."""
    import pyarrow.parquet as pq

    if metadata:
        merged = dict(table.schema.metadata or {})
        merged.update({
            (k.encode() if isinstance(k, str) else k):
            (v.encode() if isinstance(v, str) else v)
            for k, v in metadata.items()})
        table = table.replace_schema_metadata(merged)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}.{time.time_ns()}"
    pq.write_table(table, tmp, compression=compression)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    _fsync_dir(d)


@dataclass
class PartitionState:
    """One partition's committed checkpoint row (SURVEY.md §1.1 manifest).

    Copy-on-write partitions hold their full state in
    ``part_id=<pid>/epoch=<base_epoch>.parquet`` with ``delta_epochs`` empty.
    Delta-mode partitions (Hudi-style merge-on-read) hold a base file plus
    one ``delta-epoch=<e>.parquet`` per listed delta epoch; readers merge
    base+deltas with the LWW kernel, ``compact()`` reconciles them back into
    a single base."""

    part_id: int
    epoch: int
    offset: int  # max applied seq in this partition
    row_count: int  # live rows (tombstones excluded)
    tombstones: int
    content_digest: str  # sha256 of sorted per-row content sha256s
    schema_version: int = 0
    base_epoch: int = -1  # -1 ⇒ base is epoch (pure copy-on-write row)
    delta_epochs: list = field(default_factory=list)
    # ZONE MAP: {column: [min, max]} over the partition's committed rows
    # (tombstones included — a superset is always prune-safe), for
    # int/float/string/bool columns only. Consumed by
    # ``cdc.read_lake(filter=...)`` to skip partitions a non-key predicate
    # can't match without opening their files (the serving-scan analog of
    # the reference's hardened indexes,
    # /root/reference/src/scripts/maintenance/harden_db_indices.py:8-19).
    # Cow rows carry zones for every payload column; delta rows only for
    # the narrow index columns (keys, seq, content_sha256, policy
    # aggregates) — readers treat a missing column as "may match".
    # None on manifests predating this field.
    zone: dict | None = None

    def resolved_base_epoch(self) -> int:
        return self.epoch if self.base_epoch < 0 else self.base_epoch


@dataclass
class Manifest:
    """The committed view of a lake directory.

    ``partition_hash`` records the key→partition hash scheme the lake was
    written under (functions/hashing.py:PARTITION_HASH_SCHEME). Appending
    with a different scheme would place the same key in a different
    partition — splitting its history and defeating the per-partition seq
    fence — so ``commit_epoch`` refuses on mismatch (ADVICE r3). Manifests
    from before this field default to the current scheme (this repo's lakes
    are ephemeral test/bench artifacts; a deployment migrating schemes must
    re-replay or compact under the new one)."""

    epoch: int = -1  # latest fully-committed epoch
    schema_version: int = 0
    partitions: dict[int, PartitionState] = field(default_factory=dict)
    partition_hash: str | None = None
    # key → partition routing width the lake was written with. Same failure
    # class as partition_hash: a writer using a different width places the
    # same key in a different partition (splitting its history past the seq
    # fence), and a key-routed point read would look in the wrong partition.
    # None on pre-existing manifests: unknown, first commit records it.
    num_partitions: int | None = None

    def to_json(self) -> dict:
        from ..functions.hashing import PARTITION_HASH_SCHEME

        out = {
            "epoch": self.epoch,
            "schema_version": self.schema_version,
            "partition_hash": self.partition_hash or PARTITION_HASH_SCHEME,
            "partitions": {str(pid): asdict(ps) for pid, ps in self.partitions.items()},
        }
        if self.num_partitions is not None:
            out["num_partitions"] = self.num_partitions
        return out

    @classmethod
    def from_json(cls, obj: dict) -> "Manifest":
        m = cls(epoch=obj.get("epoch", -1), schema_version=obj.get("schema_version", 0),
                partition_hash=obj.get("partition_hash"),
                num_partitions=obj.get("num_partitions"))
        for pid, ps in obj.get("partitions", {}).items():
            m.partitions[int(pid)] = PartitionState(**ps)
        return m


class ManifestStore:
    """Reads/commits the manifest of one lake directory (driver-side)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.manifest_dir = os.path.join(lake_dir, "_manifest")
        self.current_path = os.path.join(self.manifest_dir, "current.json")

    # -- read side ----------------------------------------------------------

    def load(self) -> Manifest:
        if not os.path.exists(self.current_path):
            return Manifest()
        with open(self.current_path) as f:
            return Manifest.from_json(json.load(f))

    def committed_epoch(self) -> int:
        return self.load().epoch

    def partition_file(self, part_id: int, epoch: int) -> str:
        return os.path.join(self.lake_dir, f"part_id={part_id}", f"epoch={epoch}.parquet")

    def delta_file(self, part_id: int, epoch: int) -> str:
        return os.path.join(self.lake_dir, f"part_id={part_id}",
                            f"delta-epoch={epoch}.parquet")

    def index_file(self, part_id: int, epoch: int) -> str:
        return os.path.join(self.lake_dir, f"part_id={part_id}",
                            f"index-epoch={epoch}.parquet")

    def partition_data_files(self, ps: PartitionState) -> list[str]:
        """Base + delta files a reader must merge for one partition."""
        return [self.partition_file(ps.part_id, ps.resolved_base_epoch())] + [
            self.delta_file(ps.part_id, e) for e in ps.delta_epochs
        ]

    # -- write side ---------------------------------------------------------

    def commit_epoch(
        self,
        epoch: int,
        partition_rows: list[PartitionState],
        metrics: dict[str, Any] | None = None,
        schema_version: int | None = None,
        num_partitions: int | None = None,
    ) -> Manifest:
        """Merge updated partitions into current.json, atomically, with
        epoch fencing and the never-empty-over-nonempty guard."""
        from ..functions.hashing import PARTITION_HASH_SCHEME

        m = self.load()
        if epoch <= m.epoch:
            raise RuntimeError(
                f"epoch fence: epoch {epoch} already committed (current={m.epoch}); "
                "stale writer refused"
            )
        if (m.partitions and m.partition_hash is not None
                and m.partition_hash != PARTITION_HASH_SCHEME):
            raise RuntimeError(
                f"partition-hash scheme mismatch: lake written under "
                f"{m.partition_hash!r}, engine uses "
                f"{PARTITION_HASH_SCHEME!r}; appending would split key "
                "histories across partitions — re-replay or compact the lake "
                "under the current scheme first"
            )
        m.partition_hash = PARTITION_HASH_SCHEME
        if num_partitions is not None:
            if (m.partitions and m.num_partitions is not None
                    and m.num_partitions != num_partitions):
                raise RuntimeError(
                    f"partition-count mismatch: lake routed over "
                    f"{m.num_partitions} partitions, writer uses "
                    f"{num_partitions}; appending would split key histories "
                    "— re-replay or compact under the new width first")
            if not m.partitions or m.num_partitions is not None:
                # record only when verifiable: on a NON-empty legacy
                # manifest (width unknown) the writer's claim can't be
                # checked against anything — recording it would launder a
                # misconfigured width into lake truth that read_lake_keys
                # then silently trusts. Unknown stays unknown (point
                # readers fall back to the caller's cfg).
                m.num_partitions = num_partitions
        for ps in partition_rows:
            prev = m.partitions.get(ps.part_id)
            if prev is not None and ps.epoch < prev.epoch:
                raise RuntimeError(
                    f"epoch fence: partition {ps.part_id} at epoch {prev.epoch}, "
                    f"refusing stale epoch {ps.epoch}"
                )
            if (
                prev is not None
                and prev.row_count > 0
                and ps.row_count == 0
                and ps.tombstones == 0
            ):
                # F7 parity: an empty result never silently clobbers good
                # state — it must carry tombstones proving the deletes.
                raise RuntimeError(
                    f"refusing to commit empty partition {ps.part_id} over "
                    f"{prev.row_count} live rows without tombstones"
                )
            m.partitions[ps.part_id] = ps
        m.epoch = epoch
        if schema_version is not None:
            m.schema_version = schema_version
        # per-epoch lineage record first (append-only), pointer last
        record = {
            "epoch": epoch,
            "committed_unix": time.time(),
            "partitions": [asdict(ps) for ps in partition_rows],
            "metrics": metrics or {},
        }
        atomic_write_json(os.path.join(self.manifest_dir, f"epoch={epoch}.json"), record)
        atomic_write_json(self.current_path, m.to_json())
        return m

    def epoch_records(self) -> list[dict]:
        """All per-epoch lineage records (for metrics/lineage queries)."""
        out = []
        if not os.path.isdir(self.manifest_dir):
            return out
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith("epoch=") and name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def gc(self, keep_epochs: int = 1, tmp_grace_sec: float = 3600.0) -> int:
        """Delete partition data files the committed manifest no longer
        references (superseded copy-on-write bases, reconciled deltas, stale
        indexes), plus crash-orphaned ``*.tmp.*`` files older than
        ``tmp_grace_sec`` (a writer that died between write and rename leaves
        one; the grace period protects a concurrent writer's in-flight temp).
        ``keep_epochs`` additionally retains that many epochs of superseded
        base files for time-travel/debugging. Returns #files removed."""
        m = self.load()
        removed = 0
        cutoff = time.time() - tmp_grace_sec
        # crash-orphaned manifest temps too (ADVICE r3): a writer dying mid
        # atomic_write_bytes leaves current.json.tmp.* / epoch=N.json.tmp.*
        # in the manifest dir, where the part_id=* sweep below never looks
        if os.path.isdir(self.manifest_dir):
            for name in os.listdir(self.manifest_dir):
                if ".tmp." not in name:
                    continue
                full = os.path.join(self.manifest_dir, name)
                try:
                    if os.path.getmtime(full) < cutoff:
                        os.unlink(full)
                        removed += 1
                except OSError:
                    pass
        for pid, ps in m.partitions.items():
            pdir = os.path.join(self.lake_dir, f"part_id={pid}")
            if not os.path.isdir(pdir):
                continue
            keep = {os.path.basename(p) for p in self.partition_data_files(ps)}
            keep.add(os.path.basename(self.index_file(pid, ps.epoch)))
            for name in os.listdir(pdir):
                full = os.path.join(pdir, name)
                if ".tmp." in name:
                    try:
                        if os.path.getmtime(full) < cutoff:
                            os.unlink(full)
                            removed += 1
                    except OSError:
                        pass
                    continue
                if name in keep or not name.endswith(".parquet"):
                    continue
                if name.startswith("epoch="):
                    e = int(name[len("epoch="):-len(".parquet")])
                    if e >= ps.resolved_base_epoch() - (keep_epochs - 1):
                        continue
                elif not name.startswith(("delta-epoch=", "index-epoch=")):
                    continue
                os.unlink(full)
                removed += 1
        return removed
