"""Validation stage: stateless ``map_batches`` over zero-copy Arrow.

Re-expresses the reference's hexagonal validator ports / per-row guards as
vectorized batch predicates (SURVEY.md §2.4):
  - approval / required-field predicates:
    /root/reference/src/core/logic/project_loader.py:271-273,524-529
  - per-row try/except + skip-and-count with the run continuing:
    /root/reference/src/core/logic/project_loader.py:115-127 — here a
    **dead-letter quarantine**: invalid rows are routed to
    ``<lake>/_quarantine`` (at-least-once, like any DLQ) and counted, never
    crash the pipeline.

Also computes the per-row ``content_sha256`` invariant column
(/root/reference/src/tracking/recorder.py:36-40 discipline) — the dominant
useful compute of the stage and the value later verified against the oracle.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import sha256_column

VALID_OPS = ("insert", "update", "delete")


class ValidateEvents:
    """Callable batch validator. Stateless aside from config, so Ray runs it
    as cheap tasks; constructed once per pipeline (closure state = config).

    Adds ``content_sha256``; splits invalid rows to the quarantine dir.
    """

    def __init__(
        self,
        key_columns: list[str] = ("repo", "path"),
        seq_column: str = "seq",
        op_column: str = "op",
        content_column: str = "content",
        quarantine_dir: str | None = None,
        compute_sha: bool = True,
    ):
        self.key_columns = list(key_columns)
        self.seq_column = seq_column
        self.op_column = op_column
        self.content_column = content_column
        self.quarantine_dir = quarantine_dir
        # the CDC pipeline defers the sha to AFTER the partial LWW combiner
        # (compute_sha=False): only winner rows need hashing, which cuts the
        # dominant CPU item by the block dedup ratio (dramatic under skew —
        # a 10^7-event hot key hashes once per block instead of 10^7 times)
        self.compute_sha = compute_sha

    def _valid_mask(self, t: pa.Table) -> pa.ChunkedArray:
        mask = pc.is_in(t[self.op_column], value_set=pa.array(list(VALID_OPS)))
        mask = pc.fill_null(mask, False)
        for k in self.key_columns:
            col = t[k]
            ok = pc.is_valid(col)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                ok = pc.and_(ok, pc.greater(pc.utf8_length(pc.fill_null(col, "")), 0))
            mask = pc.and_(mask, ok)
        seq_ok = pc.and_(
            pc.is_valid(t[self.seq_column]),
            pc.greater_equal(pc.fill_null(t[self.seq_column], -1), 0),
        )
        mask = pc.and_(mask, seq_ok)
        # a non-delete must carry content (delete tombstones may be empty)
        if self.content_column in t.column_names:
            is_delete = pc.equal(t[self.op_column], "delete")
            has_content = pc.is_valid(t[self.content_column])
            mask = pc.and_(mask, pc.or_(pc.fill_null(is_delete, False), has_content))
        return mask

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = self._valid_mask(t)
        # `or 0`: pc.sum over a zero-length mask returns null, not 0
        bad_count = len(t) - (pc.sum(mask.cast(pa.int64())).as_py() or 0)
        if bad_count:
            bad = t.filter(pc.invert(mask))
            if self.quarantine_dir:
                os.makedirs(self.quarantine_dir, exist_ok=True)
                import pyarrow.parquet as pq

                # DLQ is at-least-once by design; unique name per flush
                name = f"bad-{os.getpid()}-{time.time_ns()}.parquet"
                pq.write_table(bad, os.path.join(self.quarantine_dir, name))
            t = t.filter(mask)
        if not self.compute_sha:
            return t
        if self.content_column in t.column_names:
            sha = sha256_column(t[self.content_column])
        else:
            sha = pa.nulls(len(t), pa.string())
        if "content_sha256" in t.column_names:
            t = t.drop_columns(["content_sha256"])
        return t.append_column("content_sha256", sha)
