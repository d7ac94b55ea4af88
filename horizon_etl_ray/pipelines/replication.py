"""Downstream change-feed consumption: checkpointed cursor + lake replication.

The change feed (``cdc.read_changes``) answers "what changed between two
epochs"; this module packages the two things every real CDC consumer builds
on top of it:

  - ``FeedCursor`` — at-least-once, checkpointed consumption of a lake's
    change feed. ``poll()`` returns the net changes since the last acked
    epoch; ``ack()`` atomically persists the new position (temp+fsync+rename,
    the manifest's own discipline). A crash between poll and ack re-delivers
    the same window — feed rows are per-key NET states, so re-applying them
    is idempotent for any consumer that upserts by key.
  - ``replicate()`` — an incremental lake→lake follower: each sync turns one
    feed window into one committed epoch on the follower, with a two-phase
    checkpoint (pending window recorded BEFORE the apply) so a crash at any
    point resumes exactly, never skipping or double-counting a window.
    Source DDL (``SchemaScript`` adds/renames) is carried across: ops the
    window applied on the source are re-keyed at the follower epoch that
    ships them, so the follower's own merge-on-read conform stage rewrites
    its older partitions the same way the source does.

Reference parity: the reference tails its own change log into derived
stores and rebuilds them from scratch each run
(/root/reference/src/tracking/recorder.py:132-279 records the log,
/root/reference/src/flows/exports/canonical_exporter.py:1943-2001 re-exports
it wholesale); this is that consumer surface made incremental and
restartable. The follower is a standard lake: every serving read (point
reads, zone scans, history, marts) works on it unchanged.

Ordering model — why the follower has its own seq column
--------------------------------------------------------
Feed rows carry the source winner's ``seq``, but the follower does NOT
resolve by it: (a) a delete whose tombstone was compacted away inside the
feed window arrives with a NULL seq — un-rankable under source order, yet
it must still kill the follower's live row; (b) the engine's late-event
seq fence is per-PARTITION (events with seq ≤ the partition offset drop
before the merge), and the follower's partitioning may differ from the
source's, so importing source seqs as the follower's fence values would
couple the two lakes' layouts. The follower instead orders by REPLICATION
APPLY ORDER — a ``_replica_seq`` column equal to the follower epoch that
shipped the row (each key appears at most once per window, and windows
are totally ordered) — while the source ``seq`` rides along as an
ordinary payload column, mirrored exactly (``include_seq_only`` feed rows
keep re-asserted seqs in step). ``read_replica`` drops ``_replica_seq``,
so the follower's visible rows are byte-identical to the source's live
rows (including the engine's recomputed ``content_sha256`` — the sha
invariant holds on both lakes).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.manifest import ManifestStore, atomic_write_json
from .cdc import CdcConfig, apply_epoch, read_changes, read_lake

REPLICA_SEQ = "_replica_seq"
SHA_COL = "content_sha256"
_CKPT = "_replication.json"


# ---------------------------------------------------------------------------
# feed → events
# ---------------------------------------------------------------------------

def feed_to_events(feed, cfg: CdcConfig | None = None, *,
                   allow_null_seq: bool = False):
    """Convert a ``read_changes`` Dataset into an apply-ready event Dataset:
    one upsert (op ``update``) per insert/update row carrying the AFTER
    payload, one tombstone (op ``delete``) per delete row carrying the
    BEFORE payload. ``content_sha256`` pairs are dropped (the engine
    recomputes the sha on the winners it commits — the invariant must hold
    on the target lake, not be smuggled in). The feed's ``epoch`` column
    (source-side attribution) is dropped; ``seq`` is the source winner's
    seq and passes through under the source's seq column name.

    This is the tested re-materialization recipe (a feed applied onto an
    empty lake reproduces the live-state digest) promoted from test code to
    the library, vectorized: rows split by op with two zero-copy filters —
    no per-row loop, and no ``if_else`` kernel, so list-typed (vector)
    payload columns convert fine.

    ``seq`` is null exactly when a delete's tombstone was itself compacted
    away inside the feed window. Replaying such a feed under the SOURCE seq
    order is ambiguous (nothing says how the tombstone ranks against later
    events), so by default this raises; ``replicate`` passes
    ``allow_null_seq=True`` because the follower orders by apply order and
    only needs the row's liveness."""
    cfg_eff = cfg or CdcConfig()
    kcols = list(cfg_eff.key_columns)
    seq_col = cfg_eff.seq_column
    op_col = cfg_eff.op_column

    def to_events(t: pa.Table) -> pa.Table:
        pay = [c[len("after_"):] for c in t.column_names
               if c.startswith("after_") and c[len("after_"):] != SHA_COL]
        if not pay and "after" in t.column_names:
            raise ValueError(
                "feed_to_events needs the TYPED feed (before_*/after_* "
                "columns); this feed was read with json_payload=True — "
                "re-read it without that flag")
        is_del = pc.fill_null(pc.equal(t["op"], "delete"), False)
        if not allow_null_seq:
            # the feed names its winner-seq column after cfg.seq_column
            bad = pc.sum(pc.and_(is_del,
                                 pc.is_null(t[seq_col]))).as_py() or 0
            if bad:
                raise ValueError(
                    f"{bad} delete row(s) carry a null seq (their tombstone "
                    "was compacted away inside the feed window) — the "
                    "source seq order cannot place them. Use narrower "
                    "windows that end before the compaction epoch, or "
                    "replicate(), which orders by apply order")

        def project(part: pa.Table, side: str) -> pa.Table:
            cols: dict[str, Any] = {k: part[k] for k in kcols}
            cols[seq_col] = part[seq_col]
            cols[op_col] = part["op"]
            for c in pay:
                cols[c] = part[side + c]
            return pa.table(cols)

        ups = project(t.filter(pc.invert(is_del)), "after_")
        # inserts/updates apply as plain upserts
        ups = ups.set_column(ups.schema.get_field_index(op_col), op_col,
                             pa.array(["update"] * len(ups), pa.string()))
        dels = project(t.filter(is_del), "before_")
        return pa.concat_tables([ups, dels])

    return feed.map_batches(to_events, batch_format="pyarrow",
                            batch_size=None)


# ---------------------------------------------------------------------------
# checkpointed feed consumption
# ---------------------------------------------------------------------------

class FeedCursor:
    """At-least-once checkpointed consumption of a lake's change feed.

    ``poll()`` reads the net changes ``(acked, to]`` without moving the
    checkpoint; ``ack(to)`` persists the position atomically AFTER the
    consumer has durably applied the window. Crash between the two →
    the next poll re-delivers the same window (feed rows are per-key net
    states: idempotent under key-upsert application).

    ``ack`` only accepts the ``to_epoch`` of a window polled BY THIS
    PROCESS: net windows do not decompose (a prefix of ``(a, c]`` is not
    derivable from its rows), so acking anything the consumer didn't see
    polled would silently skip changes. After a restart, poll before ack.
    """

    def __init__(self, lake_dir: str, checkpoint_path: str,
                 cfg: CdcConfig | None = None):
        self.lake_dir = os.path.abspath(lake_dir)
        self.checkpoint_path = checkpoint_path
        self.cfg = cfg or CdcConfig()
        self._last_polled_to: int | None = None
        st = self._load()
        if st is not None:
            if st["lake_dir"] != self.lake_dir:
                raise ValueError(
                    f"checkpoint {checkpoint_path} tracks {st['lake_dir']}, "
                    f"not {self.lake_dir}; refusing to mix lakes")
            if (st["key_columns"] != list(self.cfg.key_columns)
                    or st["seq_column"] != self.cfg.seq_column):
                raise ValueError(
                    f"checkpoint {checkpoint_path} was written with keys "
                    f"{st['key_columns']}/{st['seq_column']}, cfg has "
                    f"{list(self.cfg.key_columns)}/{self.cfg.seq_column}")

    def _load(self) -> dict | None:
        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as f:
            return json.load(f)

    def position(self) -> int:
        """Last acked epoch; -1 when nothing was ever consumed."""
        st = self._load()
        return -1 if st is None else int(st["acked_epoch"])

    def poll(self, to_epoch: int | None = None, max_epochs: int | None = None,
             **feed_kwargs):
        """Net changes since the last ack. Returns ``(ds, from_epoch,
        to_epoch)`` or ``None`` when no committed epoch is newer than the
        position. ``max_epochs`` bounds the window to that many COMMITTED
        epochs (sparse epoch numbering safe); extra kwargs pass through to
        ``read_changes`` (``json_payload``, ``changed_fields``, ...)."""
        if "keys" in feed_kwargs:
            raise ValueError(
                "FeedCursor.poll does not take keys: acking a key-filtered "
                "window would advance the position past every OTHER key's "
                "changes without delivering them. Use read_changes(keys=...)"
                " directly for point feeds, or a separate cursor per "
                "consumer")
        pos = self.position()
        to = _window_end(ManifestStore(self.lake_dir), pos, to_epoch,
                         max_epochs)
        if to is None:
            return None
        ds = read_changes(self.lake_dir, pos, to, cfg=self.cfg,
                          **feed_kwargs)
        self._last_polled_to = to
        return ds, pos, to

    def ack(self, to_epoch: int) -> None:
        if self._last_polled_to is None:
            raise ValueError("ack before poll: poll() the window first so "
                             "the position can only advance past rows this "
                             "process has seen")
        if to_epoch != self._last_polled_to:
            raise ValueError(
                f"ack({to_epoch}) does not match the last polled window end "
                f"{self._last_polled_to}; net windows do not decompose — "
                "ack exactly what you polled")
        if to_epoch <= self.position():
            raise ValueError(f"ack({to_epoch}) would move the checkpoint "
                             f"backwards from {self.position()}")
        atomic_write_json(self.checkpoint_path, {
            "lake_dir": self.lake_dir,
            "key_columns": list(self.cfg.key_columns),
            "seq_column": self.cfg.seq_column,
            "acked_epoch": int(to_epoch),
        })


def _window_end(store: ManifestStore, pos: int, to_epoch: int | None,
                max_epochs: int | None) -> int | None:
    """End of the next consumption window: the ``max_epochs``-th committed
    epoch past ``pos`` (clamped to ``to_epoch`` / the lake head). None when
    nothing new is committed."""
    if max_epochs is not None and max_epochs < 1:
        raise ValueError(
            f"max_epochs must be >= 1, got {max_epochs} (0 would silently "
            "return the FULL outstanding window, inverting the bound)")
    m = store.load()
    if m.epoch < 0:
        return None
    head = m.epoch if to_epoch is None else min(to_epoch, m.epoch)
    if head <= pos:
        return None
    if max_epochs is None:
        return head
    newer = sorted(int(r["epoch"]) for r in store.epoch_records()
                   if pos < int(r["epoch"]) <= head)
    if not newer:
        return None
    return newer[min(max_epochs, len(newer)) - 1]


# ---------------------------------------------------------------------------
# lake → lake replication
# ---------------------------------------------------------------------------

def _ckpt_path(dst_lake: str) -> str:
    return os.path.join(dst_lake, _CKPT)


def _load_ckpt(dst_lake: str) -> dict | None:
    p = _ckpt_path(dst_lake)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _serialize_base_fields(script) -> list[list[str]]:
    from ..stages.schema_evolution import _dtype

    out = []
    for name, typ in script.base_fields:
        s = str(typ)
        try:
            _dtype(s)
        except ValueError:
            raise ValueError(
                f"cannot replicate a schema-scripted lake whose base field "
                f"{name!r} has type {s!r}: the replication checkpoint can "
                "only round-trip the schema-evolution type registry") \
                from None
        out.append([name, s])
    return out


def _dst_script(ck: dict):
    """Rebuild the follower's SchemaScript from the checkpoint (ops re-keyed
    at follower epochs as syncs shipped them)."""
    if not ck.get("script_base_fields"):
        return None
    from ..stages.schema_evolution import SchemaScript, _dtype

    base = [(n, _dtype(t)) for n, t in ck["script_base_fields"]]
    # pending ops are IN FORCE: the in-flight window's data may already be
    # committed (crash between apply and ack), and declaring its renames a
    # sync early is harmless — conform's rename chain accepts either
    # spelling, and the epochs the ops key to don't exist until the apply
    all_ops = list(ck["script_ops"]) + list(
        (ck.get("pending") or {}).get("ops", []))
    ops = sorted(all_ops,
                 key=lambda o: (o["epoch"], o.get("name", o.get("from", ""))))
    return SchemaScript(base_fields=base, ops=ops)


def _dst_cfg(ck: dict) -> CdcConfig:
    return CdcConfig(
        key_columns=tuple(ck["key_columns"]),
        seq_column=REPLICA_SEQ,
        op_column=ck.get("op_column", "op"),
        content_column=ck["content_column"],
        num_partitions=int(ck["num_partitions"]),
        schema_script=_dst_script(ck),
        write_mode=ck.get("write_mode", "cow"),
        bloom_columns=tuple(ck.get("bloom_columns", ())),
    )


def replicate(src_lake: str, dst_lake: str, cfg: CdcConfig | None = None, *,
              max_epochs_per_sync: int | None = None,
              num_partitions: int | None = None,
              write_mode: str = "cow") -> dict:
    """Incrementally mirror ``src_lake`` into the follower lake
    ``dst_lake``. Each call catches the follower up to the source's
    committed head: every sync reads ONE change-feed window (``(applied,
    to]``, at most ``max_epochs_per_sync`` committed source epochs) and
    applies it as ONE follower epoch through the ordinary engine
    (validate → conform → partition → merge → manifest commit), so the
    follower is a first-class lake — point reads, zone maps, history and
    marts all work on it.

    Restartable by construction: the checkpoint (``_replication.json`` in
    the follower, written with the manifest's atomic rename) records the
    PENDING window before the apply and the applied position after it.
    Crash after the apply but before the ack → the retry re-applies the
    same recorded window, and ``apply_epoch``'s idempotence (an already
    committed follower epoch is a no-op) absorbs it. The feed window is a
    pure function of (from, to) over the source's immutable commit log, so
    the retry sees byte-identical input.

    Merge policies: the feed carries the source's RESOLVED states (a widen
    policy's min/max are ordinary payload columns there), so the follower
    always runs plain LWW over ``_replica_seq`` — replicating a policy
    lake mirrors its visible rows without re-running the policy.

    Fences: a checkpoint tracking a different source refuses; a follower
    whose manifest epoch disagrees with the checkpoint (someone else wrote
    to it) refuses; a source whose committed head moved BACKWARDS refuses.

    ``num_partitions`` / ``write_mode`` shape the follower at BOOTSTRAP
    only; later calls read them from the checkpoint (pass them again or
    not — they are ignored once the follower exists). The source's gc must
    keep epochs back to the follower's applied position: a reclaimed
    window file fails the sync loudly (read_changes' FileNotFoundError),
    never serves a mixed state.

    Returns ``{"syncs": n, "src_epoch": applied-through,
    "dst_epoch": follower head}``."""
    cfg_eff = cfg or CdcConfig()
    if cfg_eff.seq_column == REPLICA_SEQ:
        raise ValueError(
            "chain replication (a follower as the source) is not supported: "
            f"the source's seq column is already {REPLICA_SEQ!r}, which the "
            "follower needs for its own apply order. Replicate every "
            "follower from the ORIGINAL source — followers of one source "
            "are interchangeable by construction (same feed, same windows)")
    src_abs = os.path.abspath(src_lake)
    src_store = ManifestStore(src_lake)
    src_m = src_store.load()
    if src_m.epoch < 0:
        raise FileNotFoundError(f"no committed epochs in {src_lake}")

    ck = _load_ckpt(dst_lake)
    if ck is None:
        ck = {
            "src_lake": src_abs,
            "key_columns": list(cfg_eff.key_columns),
            "seq_column": cfg_eff.seq_column,
            "op_column": cfg_eff.op_column,
            "content_column": cfg_eff.content_column,
            "num_partitions": int(num_partitions
                                  or cfg_eff.num_partitions),
            "write_mode": write_mode,
            # the follower serves too: carry the source's bloom indexing so
            # replicated lakes answer equality scans with the same pruning
            "bloom_columns": list(cfg_eff.bloom_columns),
            "applied_src_epoch": -1,
            "dst_epoch": 0,
            "src_schema_version": 0,
            "script_base_fields": (
                _serialize_base_fields(cfg_eff.schema_script)
                if cfg_eff.schema_script else None),
            "script_ops": [],
            "pending": None,
        }
    else:
        if ck["src_lake"] != src_abs:
            raise ValueError(
                f"follower {dst_lake} replicates {ck['src_lake']}, not "
                f"{src_abs}; refusing to mix sources")
        if (ck["key_columns"] != list(cfg_eff.key_columns)
                or ck["seq_column"] != cfg_eff.seq_column
                or ck.get("op_column", cfg_eff.op_column)
                != cfg_eff.op_column):
            raise ValueError(
                f"follower {dst_lake} was built with keys "
                f"{ck['key_columns']}/{ck['seq_column']}/"
                f"{ck.get('op_column')}, cfg has "
                f"{list(cfg_eff.key_columns)}/{cfg_eff.seq_column}/"
                f"{cfg_eff.op_column}")
        if src_m.epoch < ck["applied_src_epoch"]:
            raise ValueError(
                f"source head {src_m.epoch} is behind the follower's "
                f"applied position {ck['applied_src_epoch']} — wrong "
                "source, or the source was rebuilt; rebuild the follower")
    # foreign-writer fence: the follower must be owned by replication.
    # replicate() commits follower epochs starting at 1, so "-1 committed"
    # (empty) is the only state equivalent to checkpoint position 0 — a
    # lake whose head is literally epoch 0 was written by someone else
    # (the old max(epoch, 0) clamp let such a lake slip through bootstrap
    # and get replicated ON TOP of, review finding).
    dst_m = ManifestStore(dst_lake).load()
    dst_committed = dst_m.epoch
    if dst_committed == -1:
        dst_committed = 0  # empty follower ≡ nothing applied yet
    elif dst_committed == 0:
        raise ValueError(
            f"{dst_lake} has a committed epoch 0, which replicate() never "
            "writes — it is a foreign lake; pick an empty directory")
    expected = {ck["dst_epoch"]}
    if ck.get("pending"):
        expected.add(ck["pending"]["dst_epoch"])  # crashed mid-apply
        expected.add(ck["pending"]["dst_epoch"] - 1)
    if dst_committed not in expected:
        raise ValueError(
            f"follower {dst_lake} is at epoch {dst_committed} but the "
            f"replication checkpoint expects {sorted(expected)} — it was "
            "written outside replicate(); rebuild the follower")

    syncs = 0
    while True:
        if ck.get("pending"):
            to = int(ck["pending"]["to_epoch"])
            de = int(ck["pending"]["dst_epoch"])
        else:
            to = _window_end(src_store, int(ck["applied_src_epoch"]),
                             None, max_epochs_per_sync)
            if to is None:
                break
            de = int(ck["dst_epoch"]) + 1
            # DDL the window ships, re-keyed at this follower epoch — into
            # the PENDING record, so a crash between the apply and the ack
            # never leaves committed follower data whose renames the
            # checkpoint doesn't yet declare (read_replica would serve a
            # both-spellings schema until the retry)
            ops = []
            if cfg_eff.schema_script is not None:
                old_v = int(ck["src_schema_version"])
                new_v = cfg_eff.schema_script.schema_version(to)
                ops = [{**op, "epoch": de}
                       for op in cfg_eff.schema_script.ops[old_v:new_v]]
            ck["pending"] = {"to_epoch": to, "dst_epoch": de, "ops": ops}
            atomic_write_json(_ckpt_path(dst_lake), ck)

        # include_seq_only: a later writer re-asserting identical content
        # advances the source winner's seq without a visible payload change
        # — an exact mirror must follow it, so those rows join the window.
        # conform_version pins the feed to the schema AS OF the window end:
        # the rows then match exactly the DDL ops this sync carries, and a
        # crash-retried window is byte-identical even if the source
        # committed further DDL in between.
        ver_to = (cfg_eff.schema_script.schema_version(to)
                  if cfg_eff.schema_script else None)
        feed = read_changes(src_lake, int(ck["applied_src_epoch"]), to,
                            cfg=cfg_eff, include_seq_only=True,
                            conform_version=ver_to)
        ev = feed_to_events(feed, cfg_eff, allow_null_seq=True)

        def add_rseq(t: pa.Table, _de=de) -> pa.Table:
            return t.append_column(
                REPLICA_SEQ, pa.array(np.full(len(t), _de, dtype=np.int64)))

        ev = ev.map_batches(add_rseq, batch_format="pyarrow",
                            batch_size=None)

        apply_epoch(ev, dst_lake, de, _dst_cfg(ck))

        ck["script_ops"].extend(ck["pending"].get("ops", []))
        if cfg_eff.schema_script is not None:
            ck["src_schema_version"] = \
                cfg_eff.schema_script.schema_version(to)
        ck["applied_src_epoch"] = to
        ck["dst_epoch"] = de
        ck["pending"] = None
        atomic_write_json(_ckpt_path(dst_lake), ck)
        syncs += 1

    return {"syncs": syncs, "src_epoch": int(ck["applied_src_epoch"]),
            "dst_epoch": int(ck["dst_epoch"])}


def read_replica(dst_lake: str, include_tombstones: bool = False, **kw):
    """Committed view of a replicated follower, shaped like the SOURCE: the
    follower's internal ``_replica_seq`` order column is dropped, leaving
    rows byte-identical to the source's live rows (keys, payload, source
    ``seq``, recomputed ``content_sha256``). Self-describing — key columns,
    width, write mode and carried DDL come from the replication checkpoint,
    so callers need no cfg. Extra kwargs pass through to ``read_lake``
    (``filter=...`` zone pruning etc.)."""
    ck = _load_ckpt(dst_lake)
    if ck is None:
        raise FileNotFoundError(f"{dst_lake} has no replication checkpoint "
                                "— not a replicate() follower")
    ds = read_lake(dst_lake, include_tombstones=include_tombstones,
                   cfg=_dst_cfg(ck), **kw)
    drop = [c for c in (REPLICA_SEQ, "part_id") if c in ds.schema().names]
    return ds.drop_columns(drop)


def compact_follower(dst_lake: str, **kw) -> dict:
    """Lake maintenance on a follower without tripping the foreign-writer
    fence: runs ``cdc.compact`` under the follower's own cfg (reconciling
    delta files, dropping tombstones, gc'ing superseded epochs) and then
    records the compaction epoch in the replication checkpoint — the next
    ``replicate()`` sees a follower exactly where the checkpoint says.
    Refuses while a sync is pending (the compaction epoch number would
    collide with the in-flight window's). Extra kwargs pass to ``compact``
    (``drop_tombstones``, ``gc_old_epochs``)."""
    from .cdc import compact

    ck = _load_ckpt(dst_lake)
    if ck is None:
        raise FileNotFoundError(f"{dst_lake} has no replication checkpoint "
                                "— not a replicate() follower")
    if ck.get("pending"):
        raise ValueError(
            f"follower {dst_lake} has a pending sync (window to "
            f"{ck['pending']['to_epoch']}); run replicate() to finish or "
            "retry it before compacting")
    out = compact(dst_lake, cfg=_dst_cfg(ck), **kw)
    ck["dst_epoch"] = int(out["epoch"])
    atomic_write_json(_ckpt_path(dst_lake), ck)
    return out


def read_replica_keys(dst_lake: str, keys):
    """Key-routed point read on a replicated follower (the follower is a
    first-class lake, so ``cdc.read_lake_keys``'s owning-partitions-only
    routing works unchanged — the follower's own manifest records its
    routing width). Output shaped like ``read_replica``."""
    from .cdc import read_lake_keys

    ck = _load_ckpt(dst_lake)
    if ck is None:
        raise FileNotFoundError(f"{dst_lake} has no replication checkpoint "
                                "— not a replicate() follower")
    ds = read_lake_keys(dst_lake, keys, cfg=_dst_cfg(ck))
    drop = [c for c in (REPLICA_SEQ, "part_id") if c in ds.schema().names]
    return ds.drop_columns(drop)
