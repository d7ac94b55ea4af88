"""Export sinks: JSON artifacts + Parquet mirror (K2/K4/F7 parity).

- ``export_json``: streaming-collect a (small, final) Dataset into one JSON
  array file, written atomically (temp+fsync+rename,
  /root/reference/src/core/logic/atomic_io.py:16-41) with the
  never-overwrite-good-data-with-empty guard
  (/root/reference/src/core/logic/canonical_exporter.py:970-992).
- ``export_parquet_mirror``: zstd parquet + a ``.cols.json`` sidecar naming
  the columns (the reference's mirror records stringified nested columns the
  same way, /root/reference/src/scripts/export_parquet.py:44-61).

Only use ``export_json`` for result-sized data (marts, reports); the lake
itself stays partitioned parquet.
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime
from typing import Any

from ..state.manifest import atomic_write_bytes


def _json_default(o: Any):
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    return str(o)


def export_json(ds, out_path: str, allow_empty: bool = False) -> int:
    """Write a Dataset as one JSON array file. Returns row count."""
    rows: list[dict] = []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):  # pandas: JSON sink row iteration by design
        rows.extend(batch.to_dict("records"))
    if not rows and not allow_empty and os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
        if existing:
            raise RuntimeError(
                f"refusing to overwrite non-empty export {out_path} "
                f"({len(existing)} rows) with an empty result"
            )
    blob = json.dumps(rows, default=_json_default, ensure_ascii=False, indent=1)
    atomic_write_bytes(out_path, blob.encode())
    return len(rows)


def export_parquet_mirror(ds, out_dir: str, name: str) -> dict:
    """zstd parquet directory + .cols.json sidecar."""
    target = os.path.join(out_dir, name)
    ds.write_parquet(target, compression="zstd")
    cols = [f.name for f in (ds.schema().base_schema)]
    atomic_write_bytes(
        os.path.join(out_dir, f"{name}.cols.json"),
        json.dumps({"columns": cols}, indent=1).encode(),
    )
    return {"path": target, "columns": cols}


def export_sharded_corpus(ds, out_dir: str, id_column: str = "doc_id",
                          num_shards: int = 16) -> dict:
    """Resumable sharded Parquet export — the corpus-side analog of the
    lake's manifest resume: shard assignment is CONTENT-ADDRESSED
    (``hash(id) % num_shards`` with the engine's keyed partition hash), so
    a rerun maps every row to the same shard; each completed shard gets an
    atomically-written ``_shard_<k>.done`` marker and a rerun (a) removes
    unmarked partial shard directories from a crashed writer, (b) streams
    ONLY the rows of unfinished shards through ``write_parquet`` (the
    finished shards are filtered inside tasks — zero re-write, zero
    re-read of their data). At 100 TB this is how a multi-day export
    survives preemption: kill it anywhere, rerun the same command.
    Returns ``{"written": [...], "skipped": [...], "rows_written": n}``."""
    import shutil

    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import partition_ids

    os.makedirs(out_dir, exist_ok=True)
    # resume-config fence: a rerun with a different num_shards/id_column
    # would remap rows across shard boundaries while the old marked dirs
    # keep their copies → silent duplication on read-back. Refuse instead.
    meta_path = os.path.join(out_dir, "_export_meta.json")
    meta = {"num_shards": num_shards, "id_column": id_column}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != meta:
            raise ValueError(
                f"export config mismatch in {out_dir}: directory was "
                f"written with {prev}, rerun requested {meta} — resuming "
                "would duplicate rows across shard layouts; export to a "
                "fresh directory or delete the old one")
    else:
        atomic_write_bytes(meta_path, json.dumps(meta, indent=1).encode())
    done = {
        k for k in range(num_shards)
        if os.path.exists(os.path.join(out_dir, f"_shard_{k}.done"))
    }
    # crash hygiene: a shard dir without its marker is a partial write
    for k in range(num_shards):
        sdir = os.path.join(out_dir, f"shard={k}")
        if k not in done and os.path.isdir(sdir):
            shutil.rmtree(sdir)
    todo = sorted(set(range(num_shards)) - done)
    if not todo:
        return {"written": [], "skipped": sorted(done), "rows_written": 0}

    todo_arr = np.array(todo, dtype=np.int64)

    def assign_and_filter(t: pa.Table) -> pa.Table:
        shard = partition_ids(t, [id_column], num_shards).astype(np.int64)
        t = t.append_column("shard", pa.array(shard, pa.int64()))
        keep = np.isin(shard, todo_arr)
        return t if keep.all() else t.filter(pa.array(keep))

    pending = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    pending.write_parquet(out_dir, partition_cols=["shard"],
                          compression="zstd")
    # row count from the written files' parquet footers — counting the
    # Dataset instead would re-execute the whole upstream pipeline
    import pyarrow.parquet as pq

    rows = 0
    for k in todo:
        sdir = os.path.join(out_dir, f"shard={k}")
        if os.path.isdir(sdir):
            for f in os.listdir(sdir):
                if f.endswith(".parquet"):
                    rows += pq.read_metadata(os.path.join(sdir, f)).num_rows
    written = []
    for k in todo:
        # marker even for empty shards: "no rows hash here" is a completed
        # state — without it a rerun would re-scan forever
        atomic_write_bytes(os.path.join(out_dir, f"_shard_{k}.done"),
                           b"{}")
        written.append(k)
    return {"written": written, "skipped": sorted(done),
            "rows_written": int(rows)}


def _edge_checksum(edges_ds) -> str:
    """Order/partition-invariant content checksum of an edge Dataset:
    per-row siphash of (s1, s2, w) summed mod 2^64 — computed distributed
    (one map + a sum aggregate), never materializing edges on the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def row_hash(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="uint64")})
        mult = np.uint64(0x9E3779B97F4A7C15)
        acc = None
        for c in ("s1", "s2", "w"):
            h = pd.util.hash_array(
                np.ascontiguousarray(df[c].to_numpy())).astype(np.uint64)
            acc = h.copy() if acc is None else (acc * mult) ^ h
        # per-block partial sum (uint64 wraps) → one tiny row per block
        return pd.DataFrame({"h": [np.bitwise_and(
            np.add.reduce(acc, dtype=np.uint64), np.uint64(0xFFFFFFFFFFFFFFFF))]})

    total = np.uint64(0)
    for b in (edges_ds.map_batches(row_hash, batch_format="pandas")  # pandas: row-hash fold on tiny edge frames
              .iter_batches(batch_format="pandas")):  # pandas: driver fold of tiny hash partials
        for v in b["h"].to_numpy(dtype=np.uint64):
            total = np.uint64((int(total) + int(v)) % (1 << 64))
    return f"{int(total):016x}"


def export_graph_bundle(edges_ds, nodes_ds, out_dir: str,
                        classification_col: str = "classification") -> dict:
    """Graph export bundle (the reference's flagship export,
    /root/reference/src/core/logic/people_relationship_graph_generator.py:60-134:
    full graph + one filtered subgraph per classification + manifest + a
    directory alias): write ``nodes``/``edges`` parquet for the full graph,
    then for every distinct value of ``nodes[classification_col]`` the
    INDUCED subgraph (nodes of that class, edges with BOTH endpoints in it),
    and a ``manifest.json`` recording per-export node/edge counts and an
    order-invariant edge checksum.

    Inputs: ``edges_ds`` with (s1, s2, w); ``nodes_ds`` with (node,
    <classification_col>). Scale shape: the full graph streams through
    ``write_parquet``; each subgraph's edge filter runs as a broadcast
    membership test (a classification's node set is small by construction —
    it is one category of a dimension; for huge classes the same filter
    composes with the bucketed semi-join of functions/dedup.py). The alias
    symlink mirrors the reference's membership-graph alias."""
    import numpy as np
    import pyarrow as pa
    import ray

    os.makedirs(out_dir, exist_ok=True)
    edges = edges_ds.materialize()
    nodes = nodes_ds.materialize()

    edges.write_parquet(os.path.join(out_dir, "edges"), compression="zstd")
    nodes.write_parquet(os.path.join(out_dir, "nodes"), compression="zstd")
    manifest: dict = {
        "full_graph": {
            "nodes": nodes.count(),
            "edges": edges.count(),
            "edge_checksum": _edge_checksum(edges),
            "paths": {"nodes": "nodes", "edges": "edges"},
        },
        "classification_exports": [],
    }

    classes = sorted(
        r[classification_col]
        for r in nodes.groupby(classification_col).count().take_all()
    )
    for cls in classes:
        cls_nodes = nodes.map_batches(
            lambda t, _c=cls: t.filter(
                pa.compute.equal(t[classification_col], _c)),
            batch_format="pyarrow")
        members = np.sort(np.concatenate(
            [b["node"].to_numpy() for b in
             cls_nodes.select_columns(["node"]).iter_batches(
                 batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        mref = ray.put(members)

        def in_class(t: pa.Table) -> pa.Table:
            m = ray.get(mref)
            if len(m) == 0:
                return t.slice(0, 0)
            s1 = t["s1"].to_numpy(zero_copy_only=False)
            s2 = t["s2"].to_numpy(zero_copy_only=False)

            def _has(v):
                pos = np.searchsorted(m, v).clip(0, len(m) - 1)
                return m[pos] == v

            return t.filter(pa.array(_has(s1) & _has(s2)))

        sub_edges = edges.map_batches(
            in_class, batch_format="pyarrow").materialize()
        sub_dir = f"classification={cls}"
        cls_nodes.write_parquet(os.path.join(out_dir, sub_dir, "nodes"),
                                compression="zstd")
        sub_edges.write_parquet(os.path.join(out_dir, sub_dir, "edges"),
                                compression="zstd")
        manifest["classification_exports"].append({
            "classification": str(cls),
            "nodes": cls_nodes.count(),
            "edges": sub_edges.count(),
            "edge_checksum": _edge_checksum(sub_edges),
            "path": sub_dir,
        })

    alias = os.path.join(out_dir, "subgraphs")
    if os.path.islink(alias):
        os.unlink(alias)
    if not os.path.exists(alias) and classes:
        os.symlink(f"classification={classes[0]}", alias)
    atomic_write_bytes(os.path.join(out_dir, "manifest.json"),
                       json.dumps(manifest, indent=1, sort_keys=True).encode())
    return manifest


def bundle_zip(export_dir: str, zip_path: str,
               allow_empty: bool = False) -> dict:
    """K5 parity (/root/reference/src/scripts/zip_exports.py): zip an export
    directory for publication. DETERMINISTIC: members are added in sorted
    relative-path order with a fixed timestamp and no filesystem metadata,
    so the same export tree produces byte-identical archives on every node
    and rerun (idempotent re-publication). Symlink aliases are skipped
    (their targets are already members). The archive is written atomically
    (temp + rename) behind the same never-clobber-good-with-empty guard as
    ``export_json``."""
    import zipfile

    members = []
    for root, dirs, files in os.walk(export_dir):
        dirs[:] = sorted(d for d in dirs
                         if not os.path.islink(os.path.join(root, d)))
        for f in sorted(files):
            p = os.path.join(root, f)
            if os.path.islink(p):
                continue
            members.append((os.path.relpath(p, export_dir), p))
    members.sort()
    if not members and not allow_empty:
        raise ValueError(
            f"refusing to write empty bundle over {zip_path!r} "
            "(allow_empty=False)")
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, p in members:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(p, "rb") as fh:
                z.writestr(info, fh.read())
    os.replace(tmp, zip_path)
    return {"zip": zip_path, "members": len(members),
            "bytes": os.path.getsize(zip_path)}
