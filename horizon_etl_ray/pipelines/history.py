"""Materialized SCD-2 history table with INCREMENTAL refresh.

``cdc.read_history`` walks the lake's committed epochs on demand — right
for ad-hoc reads, but a serving dimension table wants the view
MATERIALIZED and kept fresh in O(changes), the same discipline as
``pipelines/mart.py``:

  - ``build_history``  : full walk (optionally as of an epoch), persisted as
    per-partition parquet under an atomic json pointer;
  - ``refresh_history``: rolls the stored view forward over the epoch
    window the lake committed since — ONLY the partitions the window's
    records wrote are opened (the manifest's lineage names them; untouched
    partitions carry their files forward by name), and each touched
    partition diffs the window's resolved states against its stored OPEN
    versions (which ARE the live state at the stored epoch), closing and
    opening intervals exactly as the full walk would;
  - ``read_history_table``: the stored view as a Dataset (closed ∪ open),
    conformed to the pointer's schema version.

Because refresh only reads the WINDOW's files, the materialized history
survives ``ManifestStore.gc()`` of older epochs — the on-demand walk
raises once history is reclaimed, the materialized table keeps serving
the full interval record (this is why a warehouse materializes SCD-2
instead of re-deriving it).

Reference parity: the reference regenerates its exports from the whole
DB each run (/root/reference/src/flows/exports/initiatives_analytics_mart.py:11-37)
and keeps the change log as a row-store side table
(src/tracking/entities/entity_change_log.py:8-40); this module is that
audit surface kept columnar, partitioned and incrementally maintained.

Storage layout (``hist_dir``)::

    history.json                  # atomic pointer: epoch, files, counts
    closed_e{E}_p{P}.parquet      # versions closed by refresh at epoch E
    open_e{E}_p{P}.parquet        # partition P's open versions as of E

Commit discipline (the manifest's): data files first, json pointer swap
second, sweep unreferenced files last — a crash between the two leaves
the pointer on the previous consistent view, and orphans are swept by
the next successful commit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import (
    ManifestStore,
    PartitionState,
    atomic_write_json,
    atomic_write_table,
)

_STATE_FILE = "history.json"


def _canon_cell(v):
    # list payload cells (vectors) → tuples: scalar-comparable and
    # hashable; identical rationale to read_changes.diff_partition
    if v is None:
        return None
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_frame(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    for c in t.column_names:
        ty = t.schema.field(c).type
        if (pa.types.is_list(ty) or pa.types.is_large_list(ty)
                or pa.types.is_fixed_size_list(ty)):
            df[c] = df[c].map(_canon_cell)
    return df


def _make_resolver(cfg_eff, script, version):
    """Prefix-cached merge-on-read resolve: a delta partition's file list
    at epoch e is a strict PREFIX of the list at e+1, and
    resolve(resolved_state ∪ new_deltas) == resolve(all files) is the
    merge-on-read contract itself — so each file is read and each event
    reduced ONCE per walk, O(E) not O(E²). A cow rewrite or compaction
    changes the base → prefix miss → full (1-file) read."""
    import pyarrow.parquet as pq

    from .cdc import _resolve_state_table

    prev: dict = {"files": None, "table": None}

    def resolve(files: list[str]) -> tuple[pa.Table, pd.DataFrame]:
        if (prev["files"] is not None
                and files[: len(prev["files"])] == prev["files"]
                and len(files) > len(prev["files"])):
            srcs = [prev["table"]] + [
                pq.read_table(f) for f in files[len(prev["files"]):]]
        else:
            srcs = [pq.read_table(f) for f in files]
        t = pa.concat_tables(srcs, promote_options="permissive")
        t = _resolve_state_table(t, cfg_eff, script, version)
        prev["files"], prev["table"] = files, t
        if "part_id" in t.column_names:
            t = t.drop_columns(["part_id"])
        return t, _canon_frame(t)

    return resolve


def _walk_partition_history(epoch_files, cfg_eff, script, version,
                            init_open: pd.DataFrame | None = None):
    """The streaming SCD-2 interval walk over one partition's written
    epochs. Holds only the previous resolved frame, the open versions and
    the closed output — O(rows + versions) memory regardless of epoch
    count. ``init_open``: key-indexed open versions at the window start
    (columns: payload + seq + ``_from``); they ARE the live state then, so
    the first window frame diffs against them. Returns
    ``(closed, open, schema_t, keep_cols, changed)`` with closed/open as
    reset-index frames (keys + payload + seq + ``_from`` [+ ``_to``])."""
    kcols = list(cfg_eff.key_columns)
    seq_col = cfg_eff.seq_column
    resolve = _make_resolver(cfg_eff, script, version)

    keep_cols: list[str] | None = None
    schema_t = None
    prev_df: pd.DataFrame | None = None   # previous frame, key-indexed
    open_v: pd.DataFrame | None = None    # open versions, key-indexed
    closed: list[pd.DataFrame] = []       # closed versions (have _to)
    changed = False

    def _dead(df: pd.DataFrame, idx) -> np.ndarray:
        # absent = not live (a compacted-away tombstone is still dead)
        return df["deleted"].reindex(idx).to_numpy(
            dtype=object, na_value=True).astype(bool)

    for e, files in epoch_files:
        schema_t, df = resolve(files)
        if keep_cols is None:
            keep_cols = [c for c in schema_t.column_names
                         if c not in (*kcols, "deleted")]
            if init_open is not None:
                open_v = init_open[[*keep_cols, "_from"]].copy()
                prev_df = init_open[keep_cols].copy()
                prev_df["deleted"] = False
        cur = df.set_index(kcols)
        if prev_df is None:
            live_c = ~_dead(cur, cur.index)
            open_v = cur.loc[live_c, keep_cols].copy()
            open_v["_from"] = np.int64(e)
            prev_df = cur
            changed = changed or bool(live_c.any())
            continue
        keys_all = prev_df.index.union(cur.index)
        live_p = keys_all.isin(prev_df.index) & ~_dead(prev_df, keys_all)
        live_c = keys_all.isin(cur.index) & ~_dead(cur, keys_all)
        pay_cols = [c for c in keep_cols if c != seq_col]
        pay_diff = np.zeros(len(keys_all), dtype=bool)
        for c in pay_cols:
            a = prev_df[c].reindex(keys_all)
            b = cur[c].reindex(keys_all)
            both_null = a.isna().to_numpy() & b.isna().to_numpy()
            pay_diff |= ~((a == b).to_numpy(dtype=bool, na_value=False)
                          | both_null)
        visible = (live_p != live_c) | (live_p & live_c & pay_diff)
        if not visible.any():
            prev_df = cur
            continue
        changed = True
        sel = keys_all[visible]
        to_close = sel[live_p[visible]]
        if len(to_close):
            cl = open_v.loc[to_close].copy()
            cl["_to"] = np.int64(e)
            closed.append(cl)
            open_v = open_v.drop(index=to_close)
        to_open = sel[live_c[visible]]
        if len(to_open):
            nv = cur.loc[to_open, keep_cols].copy()
            nv["_from"] = np.int64(e)
            open_v = pd.concat([open_v, nv])
        prev_df = cur

    closed_df = (pd.concat(closed).reset_index() if closed
                 else pd.DataFrame())
    open_df = (open_v.reset_index() if open_v is not None and len(open_v)
               else pd.DataFrame())
    return closed_df, open_df, schema_t, keep_cols, changed


def _versions_to_table(out: pd.DataFrame, schema_t, keep_cols, kcols,
                       seq_col) -> pa.Table:
    """Interval frame (keys + payload + seq + _from [+ _to]) → typed Arrow
    output (valid_from_epoch / valid_to_epoch / is_current)."""
    def null_cell(v):
        if v is None:
            return True
        if isinstance(v, tuple):
            return False
        try:
            return bool(pd.isna(v))
        except (TypeError, ValueError):
            return False

    if "_to" not in out.columns:
        out = out.copy()
        out["_to"] = np.nan
    cols: dict[str, pa.Array] = {}
    n = len(out)
    for c in (*kcols, *(c for c in (keep_cols or []) if c != seq_col)):
        ty = schema_t.schema.field(c).type
        vals = out[c] if n else []
        cols[c] = pa.array(
            [None if null_cell(v) else v for v in vals], type=ty)
    cols[seq_col] = pa.array(
        [None if pd.isna(v) else int(v) for v in (out[seq_col] if n else [])],
        pa.int64())
    cols["valid_from_epoch"] = pa.array(
        out["_from"].to_numpy(dtype=np.int64) if n else [], pa.int64())
    cols["valid_to_epoch"] = pa.array(
        [None if pd.isna(v) else int(v) for v in (out["_to"] if n else [])],
        pa.int64())
    cols["is_current"] = pa.array(
        out["_to"].isna().to_numpy(dtype=bool) if n else [], pa.bool_())
    return pa.table(cols)


def history_state(hist_dir: str) -> dict | None:
    import json

    p = os.path.join(hist_dir, _STATE_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _window_partitions(store: ManifestStore, from_epoch: int, to_epoch: int
                       ) -> dict[int, list[tuple[int, PartitionState]]]:
    """part_id → [(epoch, state)] for epochs in (from, to] that WROTE the
    partition (``ps.epoch == e``; compaction-carried byte-identical rows
    are pruned — diffing them provably emits nothing)."""
    window: dict[int, list[tuple[int, PartitionState]]] = {}
    for rec in sorted(store.epoch_records(), key=lambda r: r["epoch"]):
        e = int(rec["epoch"])
        if e <= from_epoch or e > to_epoch:
            continue
        for d in rec["partitions"]:
            ps = PartitionState(**d)
            if ps.epoch == e:
                window.setdefault(ps.part_id, []).append((e, ps))
    return window


def _check_files(store: ManifestStore, window, what: str) -> None:
    needed = [f for evs in window.values() for _, ps in evs
              for f in store.partition_data_files(ps)]
    missing = [f for f in needed if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"{what} needs {missing[0]} (+{len(missing) - 1} more), "
            "reclaimed by gc(); rerun gc with keep_epochs covering the "
            "window")


def _commit(hist_dir: str, pointer: dict,
            expect_seq: int | None = None) -> None:
    """Pointer swap + sweep. ``expect_seq`` is the optimistic-concurrency
    fence (review fix): mutators record the pointer's ``commit_seq`` when
    they read it, and the swap refuses if another mutator committed in
    between — each commit's sweep deletes files only the other pointer
    references, so a lost update would corrupt BOTH views. The check
    narrows the race to the final read-swap window; run one mutator at a
    time per hist_dir (same single-writer discipline as the lake)."""
    if expect_seq is not None:
        cur = history_state(hist_dir)
        cur_seq = int(cur.get("commit_seq", 0)) if cur else 0
        if cur_seq != expect_seq:
            raise RuntimeError(
                f"history pointer at {hist_dir} changed underneath this "
                f"operation (commit_seq {cur_seq} != {expect_seq}): another "
                "mutator committed concurrently; re-read and retry")
        pointer = {**pointer, "commit_seq": expect_seq + 1}
    else:
        prev = history_state(hist_dir)
        pointer = {**pointer,
                   "commit_seq": (int(prev.get("commit_seq", 0)) + 1
                                  if prev else 1)}
    atomic_write_json(os.path.join(hist_dir, _STATE_FILE), pointer)
    keep = {f for fs in pointer["closed_files"].values() for f in fs}
    keep |= set(pointer["open_files"].values())
    for f in os.listdir(hist_dir):
        if (f.startswith(("closed_e", "open_e")) and f.endswith(".parquet")
                and f not in keep):
            try:
                os.unlink(os.path.join(hist_dir, f))
            except OSError:
                pass


def _run_walk_tasks(lake_dir: str, hist_dir: str, cfg_eff, window,
                    to_eff: int, version: int,
                    init_files: dict[int, str | None],
                    prev_closed: dict[int, list[str]] | None = None,
                    compact_threshold: int = 8) -> list[dict]:
    """One Ray task per window-touched partition: walk, write this
    partition's closed/open files, return their names + counts. When a
    touched partition's closed-file count would exceed
    ``compact_threshold``, the task folds them into ONE file (conformed
    forward) — a tail-follow refreshing every epoch stays bounded at
    O(threshold) files per partition instead of one per refresh."""
    import ray

    store = ManifestStore(lake_dir)
    script = cfg_eff.schema_script
    kcols = list(cfg_eff.key_columns)
    seq_col = cfg_eff.seq_column
    prev_closed = prev_closed or {}

    @ray.remote(num_cpus=1)
    def walk_task(pid: int, epoch_files, init_file: str | None,
                  prev_closed_names: list[str]) -> dict:
        import pyarrow.parquet as pq

        from ..stages.schema_evolution import conform_table

        def load(name_or_path: str) -> pa.Table:
            t = pq.read_table(name_or_path)
            if script is not None:
                # stored under an older schema version: conform forward
                t = conform_table(t, script, version)
            return t

        init_open = None
        if init_file is not None:
            df = _canon_frame(load(init_file)).rename(
                columns={"valid_from_epoch": "_from"})
            init_open = df.drop(
                columns=["valid_to_epoch", "is_current"], errors="ignore"
            ).set_index(kcols)
        closed, open_, schema_t, keep_cols, changed = \
            _walk_partition_history(epoch_files, cfg_eff, script, version,
                                    init_open=init_open)
        # the typed OUTPUT schema, even when nothing changed — it lets an
        # all-carry (e.g. tombstones-only) build serve typed empty reads
        import base64

        out_schema = _versions_to_table(
            pd.DataFrame(), schema_t, keep_cols, kcols, seq_col).schema
        schema_b64 = base64.b64encode(
            out_schema.serialize().to_pybytes()).decode()
        if not changed and len(prev_closed_names) <= compact_threshold:
            return {"part_id": pid, "carry": True,
                    "closed": 0, "open": -1, "schema_b64": schema_b64}
        res = {"part_id": pid, "carry": not changed,
               "closed": len(closed), "open": len(open_),
               "schema_b64": schema_b64}
        n_closed_files = len(prev_closed_names) + (1 if len(closed) else 0)
        if n_closed_files > compact_threshold:
            # fold this partition's closed history into one file
            parts = [load(os.path.join(hist_dir, n))
                     for n in prev_closed_names]
            if len(closed):
                parts.append(_versions_to_table(closed, schema_t, keep_cols,
                                                kcols, seq_col))
            merged = pa.concat_tables(parts, promote_options="permissive")
            order = pa.compute.sort_indices(
                merged, sort_keys=[(c, "ascending") for c in
                                   (*kcols, "valid_from_epoch")])
            merged = merged.take(order)
            name = f"closed_e{to_eff}_p{pid}.parquet"
            atomic_write_table(os.path.join(hist_dir, name), merged)
            res["closed_files_replace"] = [name]
        elif len(closed):
            name = f"closed_e{to_eff}_p{pid}.parquet"
            atomic_write_table(
                os.path.join(hist_dir, name),
                _versions_to_table(closed, schema_t, keep_cols, kcols,
                                   seq_col))
            res["closed_file"] = name
        if res["carry"]:
            return res  # compact-only: the open file carries unchanged
        if len(open_):
            name = f"open_e{to_eff}_p{pid}.parquet"
            atomic_write_table(
                os.path.join(hist_dir, name),
                _versions_to_table(open_, schema_t, keep_cols, kcols,
                                   seq_col))
            res["open_file"] = name
        return res

    refs = [walk_task.remote(
        pid, [(e, store.partition_data_files(ps)) for e, ps in evs],
        init_files.get(pid), prev_closed.get(pid, []))
        for pid, evs in sorted(window.items())]
    return ray.get(refs)


def build_history(lake_dir: str, hist_dir: str, cfg=None,
                  to_epoch: int | None = None) -> dict:
    """Full SCD-2 walk of the lake (optionally AS OF ``to_epoch``),
    materialized under ``hist_dir``. Needs the full file history on disk
    (raises if gc() reclaimed it) — run it once, then ``refresh_history``
    forever after."""
    from .cdc import CdcConfig

    cfg_eff = cfg or CdcConfig()
    store = ManifestStore(lake_dir)
    m = store.load()
    if m.epoch < 0:
        raise FileNotFoundError(f"no committed epochs in {lake_dir}")
    to_eff = m.epoch if to_epoch is None else min(to_epoch, m.epoch)
    window = _window_partitions(store, -1, to_eff)
    _check_files(store, window, f"history build to epoch {to_eff}")
    os.makedirs(hist_dir, exist_ok=True)
    results = _run_walk_tasks(lake_dir, hist_dir, cfg_eff, window, to_eff,
                              m.schema_version, {})
    closed_files = {str(r["part_id"]): [r["closed_file"]]
                    for r in results if "closed_file" in r}
    open_files = {str(r["part_id"]): r["open_file"] for r in results
                  if "open_file" in r}
    pointer = {
        "epoch": to_eff, "schema_version": m.schema_version,
        "lake_dir": os.path.abspath(lake_dir),
        "key_columns": list(cfg_eff.key_columns),
        "seq_column": cfg_eff.seq_column,
        "num_partitions": int(m.num_partitions or cfg_eff.num_partitions),
        "closed_files": closed_files, "open_files": open_files,
        "closed": int(sum(r["closed"] for r in results)),
        "open": int(sum(max(r["open"], 0) for r in results)),
        "schema_b64": next((r["schema_b64"] for r in results
                            if r.get("schema_b64")), None),
    }
    _commit(hist_dir, pointer)
    return {"mode": "bootstrap", "epoch": to_eff,
            "touched_partitions": len(window),
            "closed": pointer["closed"], "open": pointer["open"]}


def refresh_history(lake_dir: str, hist_dir: str, cfg=None) -> dict:
    """Roll the materialized history forward over (stored, committed] —
    O(changes): only window-touched partitions are opened; their stored
    open versions seed the walk (they ARE the live state at the stored
    epoch). Untouched partitions carry their files forward by name,
    without being read."""
    from .cdc import CdcConfig

    cfg_eff = cfg or CdcConfig()
    st = history_state(hist_dir)
    if st is None:
        raise FileNotFoundError(
            f"no materialized history at {hist_dir}; run build_history "
            "first")
    if st["key_columns"] != list(cfg_eff.key_columns) \
            or st["seq_column"] != cfg_eff.seq_column:
        raise ValueError(
            f"history at {hist_dir} was built with keys "
            f"{st['key_columns']}/{st['seq_column']}, cfg has "
            f"{list(cfg_eff.key_columns)}/{cfg_eff.seq_column}")
    # wrong-lake fence (review fix): the epoch check alone misses every
    # wrong lake whose committed epoch is >= the stored one — diffing a
    # different dataset's states against these open versions would corrupt
    # the table silently. Moved lakes: rebuild, or update the pointer's
    # lake_dir deliberately.
    if os.path.abspath(lake_dir) != st.get("lake_dir",
                                           os.path.abspath(lake_dir)):
        raise ValueError(
            f"history at {hist_dir} was built from {st['lake_dir']}, not "
            f"{os.path.abspath(lake_dir)}; refusing to mix lakes — rebuild "
            "the history (or edit the pointer's lake_dir if the lake "
            "genuinely moved)")
    store = ManifestStore(lake_dir)
    m = store.load()
    from_e = int(st["epoch"])
    if m.epoch < from_e:
        raise ValueError(
            f"history at {hist_dir} is at epoch {from_e}, ahead of the "
            f"lake's committed {m.epoch} — wrong lake?")
    if m.epoch == from_e:
        return {"mode": "noop", "epoch": from_e, "touched_partitions": 0,
                "closed": 0, "open": st["open"]}
    to_eff = m.epoch
    window = _window_partitions(store, from_e, to_eff)
    _check_files(store, window, f"history refresh ({from_e}, {to_eff}]")
    init_files = {
        pid: (os.path.join(hist_dir, st["open_files"][str(pid)])
              if str(pid) in st["open_files"] else None)
        for pid in window
    }
    prev_closed = {pid: st["closed_files"].get(str(pid), [])
                   for pid in window}
    results = _run_walk_tasks(lake_dir, hist_dir, cfg_eff, window, to_eff,
                              m.schema_version, init_files,
                              prev_closed=prev_closed)
    closed_files = {pid: list(fs) for pid, fs in st["closed_files"].items()}
    open_files = dict(st["open_files"])
    n_open = int(st["open"])
    n_closed_total = int(st["closed"])
    for r in results:
        pid = str(r["part_id"])
        if "closed_files_replace" in r:  # compaction folded this
            closed_files[pid] = r["closed_files_replace"]  # partition's
        elif "closed_file" in r:  # closed files into one
            closed_files.setdefault(pid, []).append(r["closed_file"])
        if r["carry"]:
            continue
        n_closed_total += r["closed"]
        n_open -= _open_count(hist_dir, st, pid)
        if "open_file" in r:
            open_files[pid] = r["open_file"]
            n_open += r["open"]
        else:
            open_files.pop(pid, None)
    pointer = {**st, "epoch": to_eff, "schema_version": m.schema_version,
               "closed_files": closed_files,
               "open_files": open_files,
               "closed": n_closed_total, "open": n_open,
               "schema_b64": next(
                   (r["schema_b64"] for r in results if r.get("schema_b64")),
                   st.get("schema_b64"))}
    _commit(hist_dir, pointer, expect_seq=int(st.get("commit_seq", 0)))
    return {"mode": "incremental", "epoch": to_eff,
            "touched_partitions": len(window),
            "closed": int(sum(r["closed"] for r in results)),
            "open": n_open}


def _open_count(hist_dir: str, st: dict, pid: str) -> int:
    """Row count of a partition's previous open file (parquet footer only)."""
    name = st["open_files"].get(pid)
    if name is None:
        return 0
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(hist_dir, name)).num_rows


def read_history_table(hist_dir: str, cfg=None):
    """The materialized view as a Dataset (closed ∪ open versions),
    conformed to the pointer's schema version (files written before a
    DDL carry the old spelling until their partition is next touched)."""
    import ray.data as rd

    st = history_state(hist_dir)
    if st is None:
        raise FileNotFoundError(f"no materialized history at {hist_dir}")
    files = [os.path.join(hist_dir, f)
             for fs in st["closed_files"].values() for f in sorted(fs)]
    files += [os.path.join(hist_dir, f)
              for f in sorted(st["open_files"].values())]
    if not files:
        # a legitimately empty history (tombstones-only lake, or empty
        # commits): a typed empty view, consistent with cdc.read_history —
        # the pointer records the output schema at every build/refresh
        # (review fix)
        b64 = st.get("schema_b64")
        if not b64:
            raise ValueError(
                f"history at {hist_dir} is empty and records no schema "
                "(hand-built pointer?); nothing to read")
        import base64

        schema = pa.ipc.read_schema(
            pa.BufferReader(base64.b64decode(b64)))
        ds = rd.from_arrow(schema.empty_table())
    else:
        ds = rd.read_parquet(files)
    script = (cfg.schema_script if cfg is not None else None)
    if script is not None:
        from ..stages.schema_evolution import conform_table

        version = int(st["schema_version"])
        ds = ds.map_batches(lambda t: conform_table(t, script, version),
                            batch_format="pyarrow", batch_size=None)
    return ds


def read_history_keys(hist_dir: str, keys, cfg=None):
    """Key-routed point lookup into the MATERIALIZED history: the full
    version record of SPECIFIC keys, opening only the partitions that own
    them (the pointer records the lake's routing width — same scheme as
    ``cdc.read_lake_keys``, so a 3-key audit query reads 3 partitions'
    files, not the whole table). ``keys``: scalars (single key column) or
    tuples in ``key_columns`` order. Key python types must match the
    stored key columns (cast when same type group, raise when not —
    mistyped keys would hash to the wrong partition and come back silently
    empty)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..functions.hashing import partition_ids
    from .cdc import _type_group

    st = history_state(hist_dir)
    if st is None:
        raise FileNotFoundError(f"no materialized history at {hist_dir}")
    kcols = list(st["key_columns"])
    nparts = int(st["num_partitions"])

    rows = [tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in keys]
    rows = list(dict.fromkeys(rows))
    if len(rows) == 0:
        raise ValueError("read_history_keys needs at least one key")
    if any(len(r) != len(kcols) for r in rows):
        raise ValueError(f"keys must have {len(kcols)} parts ({kcols})")
    ktab = pa.table({c: pa.array([r[i] for r in rows])
                     for i, c in enumerate(kcols)})
    all_files = {pid: sorted(fs) for pid, fs in st["closed_files"].items()}
    for pid, f in st["open_files"].items():
        all_files.setdefault(pid, []).append(f)
    stored_schema = None
    for pid in sorted(all_files):
        try:
            stored_schema = pq.read_schema(
                os.path.join(hist_dir, all_files[pid][0]))
            break
        except Exception:
            continue
    if stored_schema is not None:
        cast_cols = {}
        for c in kcols:
            have, want = ktab[c].type, stored_schema.field(c).type
            if _type_group(have) != _type_group(want):
                raise TypeError(
                    f"key column {c!r}: caller passed {have} but the "
                    f"history stores {want} — routing would silently "
                    "miss; pass keys with the stored types")
            cast_cols[c] = ktab[c].cast(want)
        ktab = pa.table(cast_cols)
    pids = partition_ids(ktab, kcols, nparts)
    owned = sorted({str(int(p)) for p in pids} & set(all_files))
    kdf = ktab.to_pandas()

    def exact(t: pa.Table) -> pa.Table:
        # exact composite-key semi-join against the (small) key frame
        df = t.select(kcols).to_pandas().reset_index(drop=True)
        idx = df.reset_index().merge(kdf, on=kcols)["index"].to_numpy()
        return (t.take(pa.array(np.sort(idx))) if len(idx)
                else t.slice(0, 0))

    if not owned:
        # typed empty from any stored footer (absent keys are a result,
        # not an error), conformed like the read path
        if stored_schema is None:
            raise ValueError(f"history at {hist_dir} has no readable files")
        empty = stored_schema.empty_table()
        if cfg is not None and cfg.schema_script is not None:
            from ..stages.schema_evolution import conform_table

            empty = conform_table(empty, cfg.schema_script,
                                  int(st["schema_version"]))
        return rd.from_arrow(empty)
    files = [os.path.join(hist_dir, f) for pid in owned
             for f in all_files[pid]]
    ds = rd.read_parquet(files)
    script = (cfg.schema_script if cfg is not None else None)
    if script is not None:
        from ..stages.schema_evolution import conform_table

        version = int(st["schema_version"])
        ds = ds.map_batches(lambda t: conform_table(t, script, version),
                            batch_format="pyarrow", batch_size=None)
    return ds.map_batches(exact, batch_format="pyarrow")


def forget_history_keys(hist_dir: str, keys, cfg=None) -> dict:
    """RIGHT-TO-BE-FORGOTTEN on the audit table (the reference's LGPD
    hook — src/core/logic/lgpd.py — applied to HISTORY, not just live
    state): remove every version of the given keys from the materialized
    history. Routes to the owning partitions and rewrites only their
    files (same atomic commit as refresh); other partitions are never
    touched. Returns the number of versions removed.

    Note the live LAKE is governed separately (delete events / compaction
    drop the rows there); this scrubs the serving HISTORY, which otherwise
    retains the payload forever by design."""
    import pyarrow.parquet as pq

    from ..functions.hashing import partition_ids

    st = history_state(hist_dir)
    if st is None:
        raise FileNotFoundError(f"no materialized history at {hist_dir}")
    kcols = list(st["key_columns"])
    rows = [tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in keys]
    rows = list(dict.fromkeys(rows))
    if not rows:
        raise ValueError("forget_history_keys needs at least one key")
    if any(len(r) != len(kcols) for r in rows):
        raise ValueError(f"keys must have {len(kcols)} parts ({kcols})")
    ktab = pa.table({c: pa.array([r[i] for r in rows])
                     for i, c in enumerate(kcols)})
    # same type fence as read_history_keys: a mistyped key would silently
    # match nothing — for a forget operation that means claiming erasure
    # that never happened, so raise instead
    from .cdc import _type_group

    stored_schema = None
    for pid in sorted(set(st["closed_files"]) | set(st["open_files"])):
        name = (st["closed_files"].get(pid) or [st["open_files"].get(pid)])[0]
        if name is None:
            continue
        try:
            stored_schema = pq.read_schema(os.path.join(hist_dir, name))
            break
        except Exception:
            continue
    if stored_schema is not None:
        cast_cols = {}
        for c in kcols:
            have, want = ktab[c].type, stored_schema.field(c).type
            if _type_group(have) != _type_group(want):
                raise TypeError(
                    f"key column {c!r}: caller passed {have} but the "
                    f"history stores {want} — the scrub would silently "
                    "match nothing; pass keys with the stored types")
            cast_cols[c] = ktab[c].cast(want)
        ktab = pa.table(cast_cols)
    pids = {str(int(p)) for p in
            partition_ids(ktab, kcols, int(st["num_partitions"]))}
    kdf = ktab.to_pandas()

    def scrub(name: str) -> tuple[str | None, int]:
        """Rewrite one file without the keys; returns (new name or None if
        the file emptied, versions removed)."""
        path = os.path.join(hist_dir, name)
        t = pq.read_table(path)
        df = t.select(kcols).to_pandas().reset_index(drop=True)
        hit = df.reset_index().merge(kdf, on=kcols)["index"].to_numpy()
        if not len(hit):
            return name, 0
        keep = np.setdiff1d(np.arange(len(t)), hit)
        if not len(keep):
            return None, len(hit)
        new = name[: -len(".parquet")] + "_scrubbed.parquet"
        atomic_write_table(os.path.join(hist_dir, new),
                           t.take(pa.array(keep)))
        return new, len(hit)

    removed = 0
    closed_files = {pid: list(fs) for pid, fs in st["closed_files"].items()}
    open_files = dict(st["open_files"])
    n_open, n_closed = int(st["open"]), int(st["closed"])
    for pid in sorted(pids):
        for name in list(closed_files.get(pid, [])):
            new, n = scrub(name)
            removed += n
            n_closed -= n
            fs = closed_files[pid]
            if new is None:
                fs.remove(name)
                if not fs:
                    del closed_files[pid]
            elif new != name:
                fs[fs.index(name)] = new
        if pid in open_files:
            new, n = scrub(open_files[pid])
            removed += n
            n_open -= n
            if new is None:
                del open_files[pid]
            elif new != open_files[pid]:
                open_files[pid] = new
    pointer = {**st, "closed_files": closed_files, "open_files": open_files,
               "closed": n_closed, "open": n_open}
    _commit(hist_dir, pointer, expect_seq=int(st.get("commit_seq", 0)))
    return {"removed_versions": removed,
            "touched_partitions": len(pids & (set(st["closed_files"])
                                              | set(st["open_files"])))}


def prune_history_before(hist_dir: str, epoch: int) -> dict:
    """RETENTION: drop closed versions whose interval ended at or before
    ``epoch`` (``valid_to_epoch <= epoch``) — the audit-table analog of
    ``ManifestStore.gc``. Open versions and versions still valid after the
    cutoff are untouched, so as-of queries for any epoch > cutoff remain
    exact; older as-of queries become partial (that is the point of
    retention). Per-partition rewrite under the same atomic commit."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    st = history_state(hist_dir)
    if st is None:
        raise FileNotFoundError(f"no materialized history at {hist_dir}")
    removed = 0
    closed_files = {}
    n_closed = int(st["closed"])
    for pid, fs in st["closed_files"].items():
        kept_names = []
        for name in fs:
            path = os.path.join(hist_dir, name)
            t = pq.read_table(path)
            keep = pc.greater(t["valid_to_epoch"], epoch)
            n_drop = len(t) - int(pc.sum(keep).as_py() or 0)
            if n_drop == 0:
                kept_names.append(name)
                continue
            removed += n_drop
            n_closed -= n_drop
            kept = t.filter(keep)
            if len(kept):
                new = name[: -len(".parquet")] + f"_r{epoch}.parquet"
                atomic_write_table(os.path.join(hist_dir, new), kept)
                kept_names.append(new)
        if kept_names:
            closed_files[pid] = kept_names
    pointer = {**st, "closed_files": closed_files, "closed": n_closed}
    _commit(hist_dir, pointer, expect_seq=int(st.get("commit_seq", 0)))
    return {"removed_versions": removed, "retained_closed": n_closed,
            "cutoff_epoch": epoch}
