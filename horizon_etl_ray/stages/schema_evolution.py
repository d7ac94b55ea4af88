"""Schema evolution: versioned Arrow schemas + in-flight batch rewrite.

The Arrow analog of the reference's dependency-free migration registry that
applies ``ALTER TABLE … ADD COLUMN`` at most once and tolerates columns that
already exist (/root/reference/src/db/migrations.py:19-58):

  - a ``SchemaScript`` is an ordered list of DDL events pinned to epochs
    (FIXTURES.md §3): ``add_column`` (null-filled for older rows) and
    ``rename_column`` (old and new spellings both accepted in flight).
  - ``schema_version(epoch)`` = number of DDL events with ``epoch <= e`` —
    the monotonic version recorded in the manifest (SURVEY.md §1.4).
  - ``conform_table`` rewrites any in-flight batch (pre- or post-DDL
    producer) to the target version's schema: renames applied, missing
    columns null-filled, extras preserved at the end (engine columns).

A tiny ``SchemaRegistry`` can be hosted as a named detached Ray actor when
multiple concurrent jobs must agree on the current version; within one job
the driver resolves the version per epoch and ships the (pure, picklable)
script into the stage closure — no per-batch actor round-trip.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

_TYPES = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
}


def _dtype(name: str) -> pa.DataType:
    try:
        return _TYPES[name]
    except KeyError:
        raise ValueError(f"unsupported schema-evolution type: {name!r}") from None


@dataclass
class SchemaScript:
    """Ordered DDL events; version N = first N ops applied to the base."""

    base_fields: list[tuple[str, pa.DataType]]
    ops: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def from_json(cls, base_fields, script: str | list[dict]) -> "SchemaScript":
        ops = json.loads(script) if isinstance(script, str) else list(script)
        ops.sort(key=lambda o: (o["epoch"], o.get("name", o.get("from", ""))))
        return cls(base_fields=list(base_fields), ops=ops)

    def schema_version(self, epoch: int) -> int:
        return sum(1 for o in self.ops if o["epoch"] <= epoch)

    def fields_at(self, version: int) -> list[tuple[str, pa.DataType]]:
        fields = list(self.base_fields)
        for op in self.ops[:version]:
            if op["op"] == "add_column":
                if all(n != op["name"] for n, _ in fields):
                    fields.append((op["name"], _dtype(op["type"])))
            elif op["op"] == "rename_column":
                fields = [
                    (op["to"] if n == op["from"] else n, t) for n, t in fields
                ]
            else:
                raise ValueError(f"unknown schema op {op['op']!r}")
        return fields

    def renames_at(self, version: int) -> dict[str, str]:
        """old→new map accumulated through version. EVERY historical spelling
        maps to the final name — a chain a→b→c yields {a: c, b: c}, so a
        batch produced under any intermediate version (carrying ``b``) still
        conforms; collapsing to only {a: c} silently null-filled mid-chain
        batches."""
        renames: dict[str, str] = {}
        for op in self.ops[:version]:
            if op["op"] == "rename_column":
                # repoint every spelling that currently resolves to `from`,
                # then record `from` itself as a historical spelling
                for k, v in renames.items():
                    if v == op["from"]:
                        renames[k] = op["to"]
                renames[op["from"]] = op["to"]
        return renames


def conform_table(t: pa.Table, script: SchemaScript, version: int) -> pa.Table:
    """Rewrite a batch to the target version's payload schema.

    Accepts batches produced under ANY version ≤ target: old column names are
    renamed, missing added columns are null-filled, types are cast. Columns
    not in the payload schema (engine columns: seq/op/epoch/part_id/
    content_sha256/…) pass through after the payload columns.
    """
    renames = script.renames_at(version)
    to_rename, to_coalesce = {}, {}
    for old, new in renames.items():
        if old not in t.column_names:
            continue
        if new in t.column_names:
            to_coalesce[old] = new
        else:
            to_rename[old] = new
    if to_rename:
        t = t.rename_columns([to_rename.get(c, c) for c in t.column_names])
    for old, new in to_coalesce.items():
        # BOTH spellings present: a permissive concat of mixed-version
        # blocks (old base + new deltas, or a resolved state + raw deltas)
        # carries both columns with each row null in exactly one — skipping
        # the rename here would silently null the old-name rows' values.
        # Coalesce new←old (new wins if a row somehow carries both), drop
        # the old spelling.
        import pyarrow.compute as _pc

        merged = _pc.coalesce(t[new], t[old].cast(t[new].type))
        t = t.set_column(t.column_names.index(new), new,
                         merged).drop_columns([old])
    target = script.fields_at(version)
    target_names = {n for n, _ in target}
    n = len(t)
    cols, names = [], []
    for name, typ in target:
        if name in t.column_names:
            col = t[name]
            if col.type != typ:
                col = col.cast(typ)
        else:
            col = pa.nulls(n, typ)
        cols.append(col)
        names.append(name)
    for name in t.column_names:
        if name not in target_names:
            cols.append(t[name])
            names.append(name)
    return pa.table(cols, names=names)


class SchemaRegistry:
    """Minimal registry service (host as ``ray.remote(SchemaRegistry)`` with
    ``.options(name='schema_registry', lifetime='detached')`` when several
    jobs share one lake). Versions are monotonic; registration is idempotent,
    mirroring the at-most-once migration registry semantics."""

    def __init__(self, script: SchemaScript):
        self.script = script

    def version_for_epoch(self, epoch: int) -> int:
        return self.script.schema_version(epoch)

    def fields_at(self, version: int) -> list[tuple[str, str]]:
        return [(n, str(t)) for n, t in self.script.fields_at(version)]

    def register_op(self, op: dict[str, Any]) -> int:
        if op not in self.script.ops:
            self.script.ops.append(op)
            self.script.ops.sort(key=lambda o: (o["epoch"], o.get("name", o.get("from", ""))))
        return len(self.script.ops)
