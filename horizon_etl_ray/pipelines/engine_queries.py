"""Driver-oracle-checkable runs of the FULL CDC engine over driver tables.

The flagship replay pipelines (`corpus.cdc_replay_*`) run on the synthetic
generator tail, which the DuckDB oracle cannot see — so round 1 left the
engine path itself with rows-only driver checks. These queries re-run the
SAME engine (epoch-partitioned tail → validate → partial LWW → exchange →
merge → manifest commit → committed read) over a change log derived from the
driver's ``lineitem`` table, making every stage SQL-verifiable end-to-end:

  - ``cdc_replay_lineitem_epochs``  — 4-epoch INCREMENTAL replay, final lake
    state vs a window-function oracle (incl. the sha256 content invariant).
  - ``cdc_replay_lineitem_evolved`` — same replay with a mid-stream schema
    script (add column @2, rename column @3) applied by the engine's
    conform stage; oracle is SQL over the projected rename.
  - ``cdc_epoch_lineage_lineitem``  — per-epoch lineage (cumulative live
    rows + tombstones) reconstructed from the manifest commit log vs a
    per-epoch-boundary SQL aggregate.

Event derivation (shared by Ray and SQL; same rule as
``analytics.cdc_lww_lineitem``): key = (l_partkey, l_suppkey), seq =
l_orderkey*8 + l_linenumber (globally unique), op = 'delete' when
l_returnflag = 'R', content = a deterministic ASCII rendering of the
payload. Epoch = 1 + (seq*4) // (max_seq+1) clamped to 4 — a pure function
of the data, so the oracle can reproduce the epoch boundaries.

Reference parity: the incremental path is the mtime-ordered multi-file
replay of /root/reference/src/flows/sigpesq/advisorships.py:29-40 (each file
an idempotent micro-batch), the lineage query is the ingestion-run /
reporter-delta readback of /root/reference/src/tracking/recorder.py:91-130
and etl_flow_reporter.py:439-520.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, table: str, columns=None, min_blocks: int = 8, **kw):
    """Pruned read with a DATA-SIZED block count (sources/reader.py:
    removes Ray's 200-block read floor; also keeps the epoch-partitioned
    event write from fanning into 200 tiny files per epoch)."""
    from ..sources.reader import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns,
                              min_blocks=min_blocks, **kw)


_EPOCHS = 4

# SQL fragment shared by all three oracles: lineitem → change events
_EV_SQL = """
        SELECT l_partkey, l_suppkey,
               l_orderkey * 8 + l_linenumber AS seq,
               CASE WHEN l_returnflag = 'R' THEN 'delete' ELSE 'update' END AS op,
               'q=' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) ||
               ';p=' || CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                             AS VARCHAR) ||
               ';f=' || l_returnflag AS content
        FROM lineitem
"""


def _lineitem_events(sf_dir: str, with_quantity: bool = False,
                     with_flag: bool = False):
    """lineitem → (l_partkey, l_suppkey, seq, op, content, epoch) Dataset
    (+ integer ``l_quantity`` payload when ``with_quantity``, + the
    ``l_returnflag`` dimension when ``with_flag``)."""
    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                      "l_returnflag", "l_quantity", "l_extendedprice"])
    # epoch boundary needs max(seq): distributed per-block partial max over
    # a 2-column pruned read (one row per block reaches the driver) — the
    # fact table itself never leaves the cluster
    def _block_max(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # sized reads can hand out empty blocks on tiny
            return pa.table({"m": pa.array([], pa.int64())})  # files (ADVICE)
        m = pc.max(pc.add(pc.multiply(t["l_orderkey"], pa.scalar(8, pa.int64())),
                          t["l_linenumber"].cast(pa.int64())))
        return pa.table({"m": pa.array([m.as_py()], pa.int64())})

    max_seq = max(
        int(r["m"]) for r in
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
        .map_batches(_block_max, batch_format="pyarrow", batch_size=None)
        .take_all()
    )

    def to_events(t: pa.Table) -> pa.Table:
        seq = pc.add(pc.multiply(t["l_orderkey"], pa.scalar(8, pa.int64())),
                     t["l_linenumber"].cast(pa.int64()))
        op = pc.if_else(pc.equal(t["l_returnflag"], "R"),
                        pa.scalar("delete"), pa.scalar("update"))
        q = t["l_quantity"].cast(pa.int64()).cast(pa.string())
        p = pc.floor(pc.add(pc.multiply(t["l_extendedprice"],
                                        pa.scalar(100.0)), pa.scalar(0.5)))
        p = p.cast(pa.int64()).cast(pa.string())
        # join(strings..., separator): the LAST arg is the separator
        content = pc.binary_join_element_wise(
            pa.scalar("q="), q, pa.scalar(";p="), p, pa.scalar(";f="),
            t["l_returnflag"], "")
        sq = seq.combine_chunks() if isinstance(seq, pa.ChunkedArray) else seq
        epoch = np.minimum(
            1 + (sq.to_numpy() * _EPOCHS) // (max_seq + 1), _EPOCHS
        ).astype(np.int64)
        cols = {
            "l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"],
            "seq": seq, "op": op, "content": content,
            "epoch": pa.array(epoch),
        }
        if with_quantity:
            cols["l_quantity"] = t["l_quantity"].cast(pa.int64())
        if with_flag:
            cols["l_returnflag"] = t["l_returnflag"]
        return pa.table(cols)

    return ds.map_batches(to_events, batch_format="pyarrow")


def _run_base(tag: str) -> str:
    """Per-RUN unique scratch dir (tempfile.mkdtemp): two concurrent
    invocations of the same query (driver gate + bench, parallel test
    workers) must never share — or rmtree — each other's in-flight
    lake/events. Callers clean up via ``_cleanup``."""
    import tempfile

    return tempfile.mkdtemp(prefix=f"horizon_cdc_li_{tag}_")


def _cleanup(base: str) -> None:
    shutil.rmtree(base, ignore_errors=True)


def _replay_lineitem(sf_dir: str, base: str, schema_script=None):
    """Write the epoch-partitioned tail under ``base`` and run the engine
    incrementally. Returns (lake_dir, cfg)."""
    from .cdc import CdcConfig, replay

    events_dir = os.path.join(base, "events")
    _lineitem_events(sf_dir).write_parquet(events_dir, partition_cols=["epoch"])
    cfg = CdcConfig(
        key_columns=("l_partkey", "l_suppkey"),
        num_partitions=16,
        schema_script=schema_script,
    )
    replay(events_dir, os.path.join(base, "lake"), cfg, mode="incremental")
    return os.path.join(base, "lake"), cfg


def cdc_replay_lineitem_epochs(sf_dir: str) -> pd.DataFrame:
    """Full-engine 4-epoch incremental LWW replay of the lineitem change log;
    final committed lake state (live rows, with the engine-computed
    content_sha256) — oracle-checked against a window-function SQL twin."""
    from .cdc import read_lake

    base = _run_base("epochs")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)
        out = (
            read_lake(lake_dir)
            .select_columns(["l_partkey", "l_suppkey", "seq", "content",
                             "content_sha256"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_replay_lineitem_evolved(sf_dir: str) -> pd.DataFrame:
    """Same engine replay with mid-stream schema evolution: add ``size_bytes``
    at epoch 2, rename ``content`` stays put but the auxiliary ``flag``
    column (seeded from l_returnflag) is renamed to ``status_flag`` at epoch
    3. The conform stage rewrites in-flight batches AND older committed
    partitions on read."""
    from .cdc import read_lake
    from ..stages.schema_evolution import SchemaScript

    script = SchemaScript.from_json(
        base_fields=[("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
                     ("content", pa.string()), ("flag", pa.string())],
        script=[
            {"epoch": 2, "op": "add_column", "name": "size_bytes",
             "type": "int64"},
            {"epoch": 3, "op": "rename_column", "from": "flag",
             "to": "status_flag"},
        ],
    )

    # the evolved run derives one extra payload column before the engine
    from .cdc import CdcConfig, replay

    base = _run_base("evolved")
    events_dir = os.path.join(base, "events")

    # flag = last char of content (the returnflag rendering); events arriving
    # at epoch ≥ 2 CARRY the evolved size_bytes column (value pass-through
    # through the conform stage), earlier events get it null-filled by the
    # engine — surfaced as the -1 sentinel in the output
    def add_evolved_cols(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["flag"] = df["content"].str[-1]
        size = df["content"].str.len().astype("int64")
        df["size_bytes"] = size.where(df["epoch"] >= 2, other=pd.NA).astype("Int64")
        return df

    try:
        _lineitem_events(sf_dir).map_batches(
            add_evolved_cols, batch_format="pandas"  # pandas: str kernel derives evolved cols
        ).write_parquet(events_dir, partition_cols=["epoch"])
        cfg = CdcConfig(key_columns=("l_partkey", "l_suppkey"),
                        num_partitions=16, schema_script=script)
        replay(events_dir, os.path.join(base, "lake"), cfg, mode="incremental")
        out = (
            read_lake(os.path.join(base, "lake"), cfg=cfg)
            .select_columns(["l_partkey", "l_suppkey", "status_flag",
                             "size_bytes", "content_sha256"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    # -1 = null-filled by the add_column migration (winner predates epoch 2)
    out["size_bytes"] = (pd.to_numeric(out["size_bytes"])
                         .fillna(-1).astype(np.int64))
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_point_read_lineitem(sf_dir: str) -> pd.DataFrame:
    """Full-engine replay, then a KEY-ROUTED POINT READ (cdc.read_lake_keys)
    of a deterministic key slice (l_partkey % 50 == 7): the serving-side
    lookup path — manifest width → owning partitions only → row-group
    predicate → exact key join — oracle-checked against the LWW window twin
    filtered to the same slice. Tombstoned keys must NOT reappear."""
    from .cdc import read_lake_keys

    base = _run_base("ptread")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)

        def pick(t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((pk % 50) == 7))

        kt = (_rp(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
              .map_batches(pick, batch_format="pyarrow")
              .to_pandas().drop_duplicates())
        keys = [tuple(r) for r in kt.itertuples(index=False)]
        out = (read_lake_keys(lake_dir, keys, cfg=cfg)
               .select_columns(["l_partkey", "l_suppkey", "seq",
                                "content_sha256"])
               .to_pandas())
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_replicate_lineitem(sf_dir: str) -> pd.DataFrame:
    """Lake→lake replication through the FULL engine (round 5, session 8):
    4-epoch incremental replay, then ``replication.replicate`` mirrors the
    lake into a follower in TWO syncs (bootstrap through epoch 2, then the
    (2, 4] window) — each sync one change-feed window applied as one
    follower epoch through the ordinary engine, with the two-phase
    checkpoint recording the window before the apply. The follower
    resolves by apply order (``_replica_seq``) and mirrors the source
    ``seq`` as payload. Returned: the follower's visible rows
    (``read_replica``), which must equal the source's final LWW state —
    the SAME window-function oracle as ``cdc_replay_lineitem_epochs``,
    so the row is green only if feed → convert → apply → serve loses
    nothing. Reference analog: the change-log consumers that rebuild
    derived stores wholesale (canonical_exporter.py:1943-2001), made
    incremental and restartable."""
    from .replication import read_replica, replicate

    base = _run_base("repl")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)
        dst = os.path.join(base, "follower")
        st = replicate(lake_dir, dst, cfg=cfg, max_epochs_per_sync=2)
        if st["syncs"] != 2 or st["src_epoch"] != _EPOCHS:
            # not assert: the gate must fail loudly even under python -O
            raise ValueError(
                f"replication did not take the two-sync path to epoch "
                f"{_EPOCHS}: {st}")
        out = (
            read_replica(dst)
            .select_columns(["l_partkey", "l_suppkey", "seq", "content",
                             "content_sha256"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_bloom_read_lineitem(sf_dir: str) -> pd.DataFrame:
    """Bloom-pruned equality serving scan through the FULL engine (round 5,
    session 8): replay with ``bloom_columns=("content",)`` — every
    partition data file carries a footer bloom over its content values —
    then ``read_lake(filter=("content", "==", v))`` for a deterministic
    high-cardinality value (the winner content of the smallest key, which
    the SQL twin derives identically). Zones can't refute equality on a
    string column whose values span the alphabet; the bloom pass skips
    every partition whose files prove absence (mechanics pinned by
    tests/test_bloom_index.py with poisoned non-matching bodies). Rides
    the tail like the zone/point-read rows: oracle-checked locally via
    scripts/check_parity.py."""
    from .cdc import CdcConfig, read_lake, replay

    base = _run_base("bloom")
    events_dir = os.path.join(base, "events")
    try:
        _lineitem_events(sf_dir).write_parquet(events_dir,
                                               partition_cols=["epoch"])
        cfg = CdcConfig(key_columns=("l_partkey", "l_suppkey"),
                        num_partitions=16, bloom_columns=("content",))
        lake_dir = os.path.join(base, "lake")
        replay(events_dir, lake_dir, cfg, mode="incremental")
        # the target value, derived the same way the SQL twin does: the
        # winner content of the first key in (l_partkey, l_suppkey) order —
        # fetched through a zone-pruned slice, not a full scan
        head = (read_lake(lake_dir, cfg=cfg,
                          filter=("l_partkey", "<=", 5)).to_pandas()
                .sort_values(["l_partkey", "l_suppkey"]))
        target = head["content"].iloc[0]
        out = (read_lake(lake_dir, cfg=cfg, filter=("content", "==", target))
               .select_columns(["l_partkey", "l_suppkey", "seq", "content",
                                "content_sha256"])
               .to_pandas())
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_epoch_lineage_lineitem(sf_dir: str) -> pd.DataFrame:
    """Per-epoch lineage readback: cumulative live rows + tombstones after
    each committed epoch, reconstructed from the manifest's append-only
    commit log (T8/A6 parity) — oracle = per-boundary SQL aggregates."""
    from ..state.manifest import ManifestStore

    base = _run_base("lineage")
    try:
        lake_dir, _ = _replay_lineitem(sf_dir, base)
        state: dict[int, tuple[int, int]] = {}  # pid -> (live, tombstones)
        rows = []
        for rec in ManifestStore(lake_dir).epoch_records():
            for ps in rec["partitions"]:
                state[ps["part_id"]] = (ps["row_count"], ps["tombstones"])
            rows.append({
                "epoch": int(rec["epoch"]),
                "live_rows": int(sum(v[0] for v in state.values())),
                "tombstones": int(sum(v[1] for v in state.values())),
            })
    finally:
        _cleanup(base)
    return pd.DataFrame(rows).sort_values("epoch").reset_index(drop=True)


def cdc_widen_merge_lineitem(sf_dir: str) -> pd.DataFrame:
    """The merge-policy plug point (§2.11) through the FULL engine: replay
    the lineitem change log in bulk under ``WidenOnlyPolicy`` — the winning
    row is still max-seq LWW (tombstones, sha invariant), but
    ``l_quantity_min`` / ``l_quantity_max`` aggregate over EVERY event the
    key ever saw (the widen-only rollup of
    /root/reference/src/core/logic/project_loader.py:229-237, now a policy
    callable instead of a kernel edit)."""
    from .cdc import CdcConfig, read_lake, replay
    from ..state.merge_policy import WidenOnlyPolicy

    base = _run_base("widen")
    events_dir = os.path.join(base, "events")
    try:
        _lineitem_events(sf_dir, with_quantity=True).write_parquet(
            events_dir, partition_cols=["epoch"])
        keys = ("l_partkey", "l_suppkey")
        cfg = CdcConfig(
            key_columns=keys, num_partitions=16,
            merge_policy=WidenOnlyPolicy(key_columns=keys,
                                         widen_columns=("l_quantity",)),
        )
        replay(events_dir, os.path.join(base, "lake"), cfg, mode="bulk")
        out = (
            read_lake(os.path.join(base, "lake"))
            .select_columns(["l_partkey", "l_suppkey", "seq", "l_quantity",
                             "l_quantity_min", "l_quantity_max",
                             "content_sha256"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    for c in ("l_quantity", "l_quantity_min", "l_quantity_max"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_change_feed_lineitem(sf_dir: str) -> pd.DataFrame:
    """Change-feed read API (VERDICT r4 missing #1) through the FULL engine:
    4-epoch incremental replay, then ``cdc.read_changes(lake, 2, 4)`` — the
    per-key net diff a downstream consumer applies to move a cache/mart from
    the epoch-2 state to the epoch-4 state. op ∈ {insert, update, delete},
    ``epoch`` = the window epoch whose commit produced the after-state (for
    LWW: the winning event's epoch), before/after payload typed and flat.
    Oracle: DuckDB computes both epoch-states from the raw events (LWW
    window) and diffs them."""
    from .cdc import read_changes

    base = _run_base("chfeed")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)
        out = (
            read_changes(lake_dir, 2, 4, cfg=cfg)
            .select_columns(["l_partkey", "l_suppkey", "op", "epoch", "seq",
                             "before_content", "after_content"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


def cdc_scd2_lineitem(sf_dir: str) -> pd.DataFrame:
    """SCD-2 history through the FULL engine (round 5, session 6): per-key
    VERSION intervals of the 4-epoch incremental lineitem replay — one row
    per visible state each key ever held, valid ``[valid_from_epoch,
    valid_to_epoch)``, ``is_current`` on the open version. Deletes close
    intervals without opening one; seq-only re-assertions of identical
    content open nothing. Like the mart rows, this gates the INCREMENTAL
    maintenance path: ``build_history`` bootstraps the materialized table
    AS OF epoch 2, ``refresh_history`` rolls it over (2, 4] touching only
    the partitions those epochs wrote — green only if bootstrap + pruned
    refresh reproduces the complete interval record (the same walk serves
    ``cdc.read_history``, and equality with it is test-pinned). Oracle:
    DuckDB reconstructs every version from the raw events with a
    running-max LWW window. Reference analog: the per-entity change log
    (entity_change_log.py:8-40) read back as intervals."""
    from .history import build_history, read_history_table, refresh_history

    base = _run_base("scd2")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)
        hist_dir = os.path.join(base, "hist")
        build_history(lake_dir, hist_dir, cfg=cfg, to_epoch=2)
        st = refresh_history(lake_dir, hist_dir, cfg=cfg)
        if st["mode"] != "incremental" or st["epoch"] != _EPOCHS:
            # not assert: the gate must fail loudly even under python -O
            raise ValueError(
                f"history refresh did not take the incremental path to "
                f"epoch {_EPOCHS}: {st}")
        out = (
            read_history_table(hist_dir, cfg=cfg)
            .select_columns(["l_partkey", "l_suppkey", "content", "seq",
                             "valid_from_epoch", "valid_to_epoch",
                             "is_current"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    return out.sort_values(
        ["l_partkey", "l_suppkey", "valid_from_epoch"]).reset_index(drop=True)


def cdc_incremental_mart_lineitem(sf_dir: str) -> pd.DataFrame:
    """Incremental mart maintenance through the FULL engine (round 5, the
    change feed's downstream consumer): 4-epoch incremental replay with an
    ``l_returnflag`` dimension + ``l_quantity`` metric payload, bootstrap the
    per-flag (count, sum) mart from the TIME-TRAVEL state at epoch 2, then
    ``refresh_mart`` folds the feed's signed deltas over (2, 4] — no lake
    scan. Oracle: DuckDB aggregates the FINAL LWW state directly, so the row
    is green only if bootstrap + incremental == truth. Reference analog:
    the regenerate-from-scratch mart flows
    (/root/reference/src/flows/exports/initiatives_analytics_mart.py:11-37),
    made O(changes)."""
    from .cdc import CdcConfig, replay
    from .mart import MartSpec, build_mart, read_mart, refresh_mart

    base = _run_base("mart")
    try:
        events_dir = os.path.join(base, "events")
        _lineitem_events(sf_dir, with_quantity=True, with_flag=True
                         ).write_parquet(events_dir, partition_cols=["epoch"])
        cfg = CdcConfig(key_columns=("l_partkey", "l_suppkey"),
                        num_partitions=16)
        lake_dir = os.path.join(base, "lake")
        replay(events_dir, lake_dir, cfg, mode="incremental")
        spec = MartSpec(group_by=("l_returnflag",),
                        sum_metrics={"sum_qty": "l_quantity"})
        mart_dir = os.path.join(base, "mart")
        build_mart(lake_dir, mart_dir, spec, cfg=cfg, at_epoch=2)
        st = refresh_mart(lake_dir, mart_dir, cfg=cfg)
        if st["mode"] != "incremental" or st["epoch"] != _EPOCHS:
            # not assert: the gate must fail loudly even under python -O
            raise ValueError(
                f"mart refresh did not take the incremental path to epoch "
                f"{_EPOCHS}: {st}")
        out = read_mart(mart_dir).to_pandas()
    finally:
        _cleanup(base)
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def cdc_minmax_mart_lineitem(sf_dir: str) -> pd.DataFrame:
    """Partition-partial mart through the FULL engine (round 5): NON-ADDITIVE
    aggregates (min/max — which no feed-folded mart can maintain, since a
    delete can evict the row holding the current extreme) kept fresh in
    O(touched partitions). 4-epoch incremental replay, bootstrap per-
    partition (count, min, max, sum) partials from the TIME-TRAVEL state at
    epoch 2, then ``refresh_partitioned_mart`` recomputes ONLY the
    partitions epochs (2, 4] rewrote (named by the manifest's lineage
    records — no file opened to learn it) and re-folds. Oracle: DuckDB
    aggregates the FINAL LWW state directly, so the row is green only if
    bootstrap + partition-pruned refresh == truth. Reference analog: the
    regenerate-from-scratch mart flows
    (/root/reference/src/flows/exports/initiatives_analytics_mart.py:11-37),
    made O(changed partitions) for the aggregates MartSpec refuses."""
    from .cdc import CdcConfig, replay
    from .mart import (
        PartitionedMartSpec,
        build_partitioned_mart,
        read_partitioned_mart,
        refresh_partitioned_mart,
    )

    base = _run_base("pmart")
    try:
        events_dir = os.path.join(base, "events")
        _lineitem_events(sf_dir, with_quantity=True, with_flag=True
                         ).write_parquet(events_dir, partition_cols=["epoch"])
        cfg = CdcConfig(key_columns=("l_partkey", "l_suppkey"),
                        num_partitions=16)
        lake_dir = os.path.join(base, "lake")
        replay(events_dir, lake_dir, cfg, mode="incremental")
        spec = PartitionedMartSpec(
            group_by=("l_returnflag",),
            metrics={"min_qty": ("min", "l_quantity"),
                     "max_qty": ("max", "l_quantity"),
                     "sum_qty": ("sum", "l_quantity")})
        mart_dir = os.path.join(base, "mart")
        build_partitioned_mart(lake_dir, mart_dir, spec, cfg=cfg, at_epoch=2)
        st = refresh_partitioned_mart(lake_dir, mart_dir, cfg=cfg)
        if st["mode"] != "incremental" or st["epoch"] != _EPOCHS:
            # not assert: the gate must fail loudly even under python -O
            raise ValueError(
                f"partitioned mart refresh did not take the incremental "
                f"path to epoch {_EPOCHS}: {st}")
        out = read_partitioned_mart(mart_dir).to_pandas()
    finally:
        _cleanup(base)
    for c in ("n_rows", "min_qty", "max_qty", "sum_qty"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def cdc_zone_read_lineitem(sf_dir: str) -> pd.DataFrame:
    """Zone-map filtered serving scan through the FULL engine (round 5):
    replay, then ``read_lake(filter=("l_partkey", "<=", 50))`` — partitions
    whose manifest zone refutes the predicate are skipped without opening
    files, surviving rows re-checked exactly. Oracle: the LWW window twin
    filtered to the same predicate (a key-column filter commutes with the
    per-key window)."""
    from .cdc import read_lake

    base = _run_base("zone")
    try:
        lake_dir, cfg = _replay_lineitem(sf_dir, base)
        out = (
            read_lake(lake_dir, cfg=cfg, filter=("l_partkey", "<=", 50))
            .select_columns(["l_partkey", "l_suppkey", "seq",
                             "content_sha256"])
            .to_pandas()
        )
    finally:
        _cleanup(base)
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


ORACLE_SQL: dict[str, str] = {
    # final LWW state aggregated directly — the Ray side must reach the
    # same numbers via bootstrap-at-2 + signed feed deltas over (2, 4]
    "cdc_incremental_mart_lineitem": f"""
        WITH ev AS ({_EV_SQL.replace(
            "FROM lineitem",
            ", CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag "
            "FROM lineitem")}),
        w AS (
            SELECT * FROM ev
            QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                       ORDER BY seq DESC) = 1
              AND op <> 'delete'
        )
        SELECT flag AS l_returnflag,
               count(*) AS n_rows,
               CAST(sum(qty) AS BIGINT) AS sum_qty
        FROM w GROUP BY flag ORDER BY l_returnflag
    """,
    # final LWW state aggregated directly with the NON-additive extremes —
    # the Ray side must reach the same numbers via per-partition partials
    # bootstrapped at epoch 2 and a partition-pruned refresh over (2, 4]
    "cdc_minmax_mart_lineitem": f"""
        WITH ev AS ({_EV_SQL.replace(
            "FROM lineitem",
            ", CAST(l_quantity AS BIGINT) AS qty, l_returnflag AS flag "
            "FROM lineitem")}),
        w AS (
            SELECT * FROM ev
            QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                       ORDER BY seq DESC) = 1
              AND op <> 'delete'
        )
        SELECT flag AS l_returnflag,
               count(*) AS n_rows,
               CAST(min(qty) AS BIGINT) AS min_qty,
               CAST(max(qty) AS BIGINT) AS max_qty,
               CAST(sum(qty) AS BIGINT) AS sum_qty
        FROM w GROUP BY flag ORDER BY l_returnflag
    """,
    "cdc_zone_read_lineitem": f"""
        WITH ev AS ({_EV_SQL})
        SELECT l_partkey, l_suppkey, seq, sha256(content) AS content_sha256
        FROM ev
        WHERE l_partkey <= 50
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
    # both epoch-states via the LWW window over the raw events, then a
    # liveness/payload diff: w_to ⊇ w_from keys (epoch ≤2 ⊆ ≤4), so a LEFT
    # JOIN from w_to covers the union; the winner-at-to's epoch is the
    # change-attribution epoch (matches read_changes' last-row-change walk)
    "cdc_change_feed_lineitem": f"""
        WITH ev0 AS ({_EV_SQL}),
        b AS (SELECT max(seq) AS max_seq FROM ev0),
        ev AS (
            SELECT ev0.*, least(1 + (seq * {_EPOCHS}) // (max_seq + 1),
                                {_EPOCHS}) AS epoch
            FROM ev0, b
        ),
        w_from AS (
            SELECT * FROM ev WHERE epoch <= 2
            QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                       ORDER BY seq DESC) = 1
        ),
        w_to AS (
            SELECT * FROM ev WHERE epoch <= {_EPOCHS}
            QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                       ORDER BY seq DESC) = 1
        ),
        j AS (
            SELECT t.l_partkey, t.l_suppkey,
                   f.content AS f_content, t.content AS t_content,
                   t.seq AS t_seq, t.epoch AS t_epoch,
                   (f.op IS NOT NULL AND f.op <> 'delete') AS live_f,
                   (t.op <> 'delete') AS live_t
            FROM w_to t LEFT JOIN w_from f
              ON f.l_partkey = t.l_partkey AND f.l_suppkey = t.l_suppkey
        )
        SELECT l_partkey, l_suppkey,
               CASE WHEN NOT live_f AND live_t THEN 'insert'
                    WHEN live_f AND NOT live_t THEN 'delete'
                    ELSE 'update' END AS op,
               t_epoch AS epoch, t_seq AS seq,
               CASE WHEN live_f THEN f_content END AS before_content,
               CASE WHEN live_t THEN t_content END AS after_content
        FROM j
        WHERE (live_f <> live_t)
           OR (live_f AND live_t AND f_content <> t_content)
        ORDER BY l_partkey, l_suppkey
    """,
    # SCD-2 versions from the raw events: per-(key, epoch) winner (arg_max
    # by seq), kept only where it beats the running max (the LWW resolved
    # state actually changed), then filtered to VISIBLE changes (liveness
    # edge or live payload change — seq-only re-assertions drop out), then
    # lead() closes each interval at the key's next visible change.
    "cdc_scd2_lineitem": f"""
        WITH ev0 AS ({_EV_SQL}),
        b AS (SELECT max(seq) AS max_seq FROM ev0),
        ev AS (
            SELECT ev0.*, least(1 + (seq * {_EPOCHS}) // (max_seq + 1),
                                {_EPOCHS}) AS epoch
            FROM ev0, b
        ),
        pe AS (
            SELECT l_partkey, l_suppkey, epoch,
                   arg_max(content, seq) AS content,
                   arg_max(op, seq) AS op,
                   max(seq) AS seq
            FROM ev GROUP BY l_partkey, l_suppkey, epoch
        ),
        ch AS (
            SELECT * FROM pe
            QUALIFY seq = max(seq) OVER (
                PARTITION BY l_partkey, l_suppkey ORDER BY epoch
                ROWS UNBOUNDED PRECEDING)
        ),
        vis0 AS (
            SELECT ch.*, (op <> 'delete') AS live,
                   lag(op <> 'delete') OVER (
                       PARTITION BY l_partkey, l_suppkey ORDER BY epoch
                   ) AS prev_live,
                   lag(content) OVER (
                       PARTITION BY l_partkey, l_suppkey ORDER BY epoch
                   ) AS prev_content
            FROM ch
        ),
        vis AS (
            SELECT * FROM vis0
            WHERE (COALESCE(prev_live, FALSE) <> live)
               OR (live AND prev_live AND content <> prev_content)
        ),
        iv AS (
            SELECT *, lead(epoch) OVER (
                PARTITION BY l_partkey, l_suppkey ORDER BY epoch
            ) AS valid_to_epoch
            FROM vis
        )
        SELECT l_partkey, l_suppkey, content, seq,
               epoch AS valid_from_epoch, valid_to_epoch,
               (valid_to_epoch IS NULL) AS is_current
        FROM iv WHERE live
        ORDER BY l_partkey, l_suppkey, valid_from_epoch
    """,
    "cdc_widen_merge_lineitem": f"""
        WITH ev AS ({_EV_SQL.replace("FROM lineitem",
                    ", CAST(l_quantity AS BIGINT) AS qty FROM lineitem")})
        SELECT l_partkey, l_suppkey, seq, qty AS l_quantity,
               min(qty) OVER (PARTITION BY l_partkey, l_suppkey)
                   AS l_quantity_min,
               max(qty) OVER (PARTITION BY l_partkey, l_suppkey)
                   AS l_quantity_max,
               sha256(content) AS content_sha256
        FROM ev
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
    "cdc_replay_lineitem_epochs": f"""
        WITH ev AS ({_EV_SQL})
        SELECT l_partkey, l_suppkey, seq, content,
               sha256(content) AS content_sha256
        FROM ev
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
    # the follower must serve EXACTLY the source's final LWW state — same
    # twin as the replay row, reached through feed → convert → apply
    "cdc_replicate_lineitem": f"""
        WITH ev AS ({_EV_SQL})
        SELECT l_partkey, l_suppkey, seq, content,
               sha256(content) AS content_sha256
        FROM ev
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
    "cdc_replay_lineitem_evolved": f"""
        WITH ev0 AS ({_EV_SQL}),
        b AS (SELECT max(seq) AS max_seq FROM ev0),
        ev AS (
            SELECT ev0.*, least(1 + (seq * {_EPOCHS}) // (max_seq + 1),
                                {_EPOCHS}) AS epoch
            FROM ev0, b
        )
        SELECT l_partkey, l_suppkey,
               substr(content, length(content), 1) AS status_flag,
               CASE WHEN epoch >= 2 THEN length(content) ELSE -1 END
                   AS size_bytes,
               sha256(content) AS content_sha256
        FROM ev
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
    "cdc_epoch_lineage_lineitem": f"""
        WITH ev AS ({_EV_SQL}),
        b AS (SELECT max(seq) AS max_seq FROM ev),
        e AS (
            SELECT ev.*, least(1 + (seq * {_EPOCHS}) // (max_seq + 1),
                               {_EPOCHS}) AS epoch
            FROM ev, b
        ),
        per AS (
            SELECT g.epoch,
                   count(*) FILTER (WHERE w.op <> 'delete') AS live_rows,
                   count(*) FILTER (WHERE w.op = 'delete') AS tombstones
            FROM (SELECT DISTINCT epoch FROM e) g,
            LATERAL (
                SELECT op FROM e
                WHERE e.epoch <= g.epoch
                QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                           ORDER BY seq DESC) = 1
            ) w
            GROUP BY g.epoch
        )
        SELECT epoch, live_rows, tombstones FROM per ORDER BY epoch
    """,
    # the bloom row's target value is data-derived BUT deterministic: the
    # winner content of the smallest key — both sides compute it from the
    # same final LWW state, then select every key sharing that content
    "cdc_bloom_read_lineitem": f"""
        WITH ev AS ({_EV_SQL}),
        w AS (
            SELECT * FROM ev
            QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                       ORDER BY seq DESC) = 1
              AND op <> 'delete'
        ),
        tgt AS (
            SELECT content FROM w
            ORDER BY l_partkey, l_suppkey LIMIT 1
        )
        SELECT l_partkey, l_suppkey, seq, content,
               sha256(content) AS content_sha256
        FROM w
        WHERE content = (SELECT content FROM tgt)
        ORDER BY l_partkey, l_suppkey
    """,
    # the key-level slice predicate commutes with the per-key LWW window
    # (all rows of a key share l_partkey), so WHERE-before-QUALIFY is the
    # exact semantics of point-reading those keys from the committed lake
    "cdc_point_read_lineitem": f"""
        WITH ev AS ({_EV_SQL})
        SELECT l_partkey, l_suppkey, seq, sha256(content) AS content_sha256
        FROM ev
        WHERE l_partkey % 50 = 7
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                   ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
}

QUERIES = {
    "cdc_widen_merge_lineitem": cdc_widen_merge_lineitem,
    "cdc_replay_lineitem_epochs": cdc_replay_lineitem_epochs,
    "cdc_replay_lineitem_evolved": cdc_replay_lineitem_evolved,
    "cdc_epoch_lineage_lineitem": cdc_epoch_lineage_lineitem,
    "cdc_point_read_lineitem": cdc_point_read_lineitem,
    "cdc_change_feed_lineitem": cdc_change_feed_lineitem,
    "cdc_replicate_lineitem": cdc_replicate_lineitem,
    "cdc_bloom_read_lineitem": cdc_bloom_read_lineitem,
    "cdc_scd2_lineitem": cdc_scd2_lineitem,
    "cdc_zone_read_lineitem": cdc_zone_read_lineitem,
    "cdc_incremental_mart_lineitem": cdc_incremental_mart_lineitem,
    "cdc_minmax_mart_lineitem": cdc_minmax_mart_lineitem,
}
