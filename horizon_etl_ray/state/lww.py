"""Last-writer-wins merge semantics (the upsert kernel of the CDC engine).

Semantics parity with the reference's identity-key upsert path
(/root/reference/src/core/logic/project_loader.py:95-133,333-373 — build
state index, resolve by identity, last write wins) and its tombstone analog
(``cancelled`` advisorships,
/root/reference/src/core/logic/strategies/sigpesq_advisorships.py:43-57),
re-expressed as an **associative, commutative argmax-by-seq reduction**:

    final_state[key] = the event with the maximum ``seq`` for that key;
    if that event is a delete, the key is dead (tombstone).

Because argmax-by-seq is associative + commutative + idempotent, the engine
can reduce in any order and any grouping:

  1. ``lww_partial``   — per-batch combiner inside ``map_batches`` (collapses
     a hot key's events to one row per block BEFORE the shuffle; this is the
     skew defence: a key with 10^7 updates ships ~#blocks rows, not 10^7).
  2. ``groupby(part_id).map_groups`` — final reduce per hash partition.
  3. merging with prior lake state = reducing the union of (state-as-events,
     new events) with the same kernel.

Duplicate delivery (same ``seq`` re-emitted, the exactly-once test knob —
analog of the payload-hash UNIQUE at
/root/reference/src/tracking/entities/source_record.py:10-17) is absorbed:
duplicates are byte-identical, so whichever copy the argmax picks, the result
is the same. Delete-then-reinsert resolves correctly because the re-insert
carries a higher seq.

``oracle_reduce`` is the single-threaded reference reducer used by tests to
prove sha256-exact final state (FIXTURES.md §4).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.compute as pc

DELETE_OPS = frozenset({"delete"})


def _first_of_group_mask(sorted_table: pa.Table, key_columns: list[str]) -> pa.Array:
    """Boolean mask selecting the first row of each key group in a table
    already sorted by ``key_columns`` (keys are assumed non-null — the
    validate stage guarantees this before the merge)."""
    n = len(sorted_table)
    if n == 0:
        return pa.array([], type=pa.bool_())
    neq = None
    for k in key_columns:
        col = sorted_table[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        c = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        c = pc.fill_null(c, True)
        neq = c if neq is None else pc.or_(neq, c)
    if isinstance(neq, pa.ChunkedArray):
        neq = neq.combine_chunks()
    return pa.concat_arrays([pa.array([True]), neq])


def lww_partial(
    table: pa.Table,
    key_columns: list[str],
    seq_column: str = "seq",
) -> pa.Table:
    """Per-batch combiner: keep only the max-``seq`` row per key.

    Sort by (key asc, seq desc) then take each group's first row — fully
    vectorized (Arrow sort + boundary mask), no Python row loop.
    """
    if len(table) == 0:
        return table
    order = [(k, "ascending") for k in key_columns] + [(seq_column, "descending")]
    t = table.sort_by(order)
    return t.filter(_first_of_group_mask(t, key_columns))


def lww_partial_fast(
    table: pa.Table,
    key_columns: list[str],
    seq_column: str = "seq",
    num_partitions: int | None = None,
) -> tuple[pa.Table, "object"]:
    """Fast per-block combiner: select max-``seq`` row per key WITHOUT
    sorting the payload columns.

    Groups on a 128-bit siphash of the key (see
    ``functions.hashing.key_hash_pair`` for the collision argument — the
    final per-partition reduce re-compares real keys, the combiner must only
    avoid false merges within one block) via ``np.lexsort`` over three int64
    arrays, then gathers winners with one ``take``. On a 640k-row block of
    ~300B rows this replaces a ~2.9s multi-column Arrow string sort with
    ~0.7s of hashing + an O(n log n) lexsort on fixed-width ints.

    Returns ``(winners, part_ids or None)``; part ids are ``h1 % P`` so the
    hashing pass is shared with partition assignment.
    """
    import numpy as np

    from ..functions.hashing import key_hash_pair

    n = len(table)
    if n == 0:
        return table, None
    h1, h2 = key_hash_pair(table, key_columns)
    seq = table[seq_column].to_numpy(zero_copy_only=False)
    # lexsort: last key is primary → (h1 asc, h2 asc, seq desc)
    order = np.lexsort((-seq, h2, h1))
    s1, s2 = h1[order], h2[order]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    idx = order[first]
    winners = table.take(pa.array(idx, type=pa.int64()))
    parts = None
    if num_partitions is not None:
        parts = (h1[idx] % np.uint64(num_partitions)).astype(np.int32)
    return winners, parts


def lww_resolve_table(
    table: pa.Table,
    key_columns: list[str],
    seq_column: str = "seq",
    op_column: str = "op",
    delete_ops: frozenset[str] = DELETE_OPS,
    keep_tombstones: bool = False,
) -> pa.Table:
    """Full LWW resolution of one in-memory table (used as the final reduce
    inside ``groupby(part_id).map_groups`` and by unit tests).

    ``keep_tombstones=True`` keeps winning delete rows (marked by their op) so
    the lake can fence off late lower-seq events; ``False`` returns only
    surviving rows.
    """
    winners = lww_partial(table, key_columns, seq_column)
    if keep_tombstones or op_column not in winners.column_names:
        return winners
    alive = pc.invert(pc.is_in(winners[op_column], value_set=pa.array(list(delete_ops))))
    alive = pc.fill_null(alive, True)
    return winners.filter(alive)


def lww_resolve(
    ds,
    key_columns: list[str],
    seq_column: str = "seq",
    op_column: str = "op",
    num_partitions: int = 32,
    delete_ops: frozenset[str] = DELETE_OPS,
    keep_tombstones: bool = False,
):
    """Distributed LWW over a ``ray.data.Dataset``: partial combine per block
    → hash-partition by key → final reduce per partition.

    The shuffle moves at most (#distinct keys per block × #blocks) rows — the
    partial combine is the pre-aggregation that keeps hot keys from skewing
    the exchange.
    """
    from ..functions.hashing import assign_partition

    keys = list(key_columns)

    def partial(batch: pa.Table) -> pa.Table:
        out = lww_partial(batch, keys, seq_column)
        part = assign_partition(out, keys, num_partitions)
        if "part_id" in out.column_names:
            out = out.drop_columns(["part_id"])
        return out.append_column("part_id", pa.array(part, type=pa.int32()))

    def final(group: pa.Table) -> pa.Table:
        return lww_resolve_table(
            group, keys, seq_column, op_column, delete_ops, keep_tombstones
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("part_id").map_groups(final, batch_format="pyarrow")


# --- single-threaded oracle (FIXTURES.md §4) -------------------------------


def oracle_reduce(
    events: Iterable[dict[str, Any]],
    key_fields: tuple[str, ...] = ("repo", "path"),
    seq_field: str = "seq",
    op_field: str = "op",
) -> dict[tuple, dict[str, Any]]:
    """Apply events in ``seq`` order with a plain dict; return surviving rows
    keyed by the key tuple (tombstoned keys are absent)."""
    state: dict[tuple, dict[str, Any]] = {}
    seen_seq: dict[tuple, int] = {}
    for ev in sorted(events, key=lambda e: e[seq_field]):
        key = tuple(ev[f] for f in key_fields)
        # duplicate delivery of an already-applied seq is a no-op
        if seen_seq.get(key) == ev[seq_field]:
            continue
        seen_seq[key] = ev[seq_field]
        if ev[op_field] in DELETE_OPS:
            state.pop(key, None)
        else:
            state[key] = dict(ev)
    return state


def content_digest(rows: Iterable[dict[str, Any]], key_fields=("repo", "path"),
                   content_field: str = "content") -> str:
    """Global digest: sha256 of newline-joined per-row sha256(content), sorted
    by key — partition-count invariant (FIXTURES.md §4; sort-keys discipline
    of /root/reference/src/tracking/recorder.py:36-40)."""
    digests = []
    for row in rows:
        key = tuple(str(row[f]) for f in key_fields)
        c = row.get(content_field)
        sha = row.get("content_sha256") or hashlib.sha256(
            ("" if c is None else str(c)).encode()
        ).hexdigest()
        digests.append((key, sha))
    digests.sort()
    blob = "\n".join(d for _, d in digests)
    return hashlib.sha256(blob.encode()).hexdigest()
