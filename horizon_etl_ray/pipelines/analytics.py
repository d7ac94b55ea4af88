"""Oracle-checked analytics pipelines over the TPC-H-ish test tables.

Each function takes ``sf_dir`` and returns a small pandas DataFrame (or
Dataset); ``ORACLE_SQL`` holds the DuckDB-equivalent SQL with IDENTICAL
column names, so the driver's row-count + schema + value-hash comparison
passes. Aggregate floats are rounded the same on both sides.

These re-express the reference's aggregation / join / sort / filter
operator inventory (SURVEY.md §2.4, §2.6-2.9) Ray-Data-first:
  - groupby aggregates (A1/A2/A3-family) with column pruning at the read
  - broadcast hash joins for dimension tables (ray.put once, lookup per
    batch — J4/J6/T2)
  - anti-join via broadcast key set (J8 semantics)
  - sort + limit top-k with full tiebreaks (O1/O2)
  - union + groupby (D7/A9)
  - tumbling-window aggregate over the events stream (§2.10 analog)
  - LWW argmax resolution (the CDC kernel) on the events table and on a
    change-log derived from lineitem (J1/T4)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.lww import lww_resolve

# ray / ray.data are imported lazily inside functions — the driver owns
# ray.init (see __ray_entry__.py).


def _rp(sf_dir: str, table: str, columns=None, min_blocks: int = 8, **kw):
    """Pruned read with a DATA-SIZED block count (sources/reader.py:
    removes Ray's 200-block read floor, which at toy scale turns every
    downstream exchange into ~200 task launches of overhead; the sizing
    converges to Ray's own bytes-per-block plan at real scale)."""
    from ..sources.reader import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns,
                              min_blocks=min_blocks, **kw)


def _round(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for c, nd in spec.items():
        df[c] = np.round(df[c].to_numpy(dtype=np.float64), nd)
    return df


# --------------------------------------------------------------------------
# grouped aggregates
# --------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped grouped aggregate (A2-family).

    Group cardinality is fixed at |returnflag|×|linestatus| = 6, so a flat
    ``groupby`` (which sorts EVERY row by the string keys) is the wrong
    shape — each block collapses to ≤6 partial rows in-task and the driver
    folds #blocks × 6 rows (the same bounded-reduce pattern as
    year_expansion_mart)."""
    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount"])

    from ..functions.bucketed import bounded_groupby_fold

    def project(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": t["l_quantity"],
            "sum_base_price": t["l_extendedprice"],
            "sum_disc_price": disc,
        })

    out = bounded_groupby_fold(
        ds.map_batches(project, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_price", "sum_disc_price"],
        count_col="count_order")
    out = _round(out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2})
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def parent_rollup(sf_dir: str) -> pd.DataFrame:
    """A1 parity: per-customer order-span rollup with derived status
    (min/max over a timestamp via int64 micros so Min/Max aggregate cleanly)."""
    ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def to_micros(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("o_orderdate"), "o_orderdate",
            t["o_orderdate"].cast(pa.int64()),
        )

    from ..functions.bucketed import bucketed_groupby_agg

    out = bucketed_groupby_agg(  # customer-cardinality keys (see bucketed.py)
        ds.map_batches(to_micros, batch_format="pyarrow"),
        "o_custkey",
        {"first_us": ("o_orderdate", "min"),
         "last_us": ("o_orderdate", "max"),
         "n_orders": ("o_orderdate", "count")},
    ).to_pandas()
    first = pd.to_datetime(out["first_us"], unit="us")
    last = pd.to_datetime(out["last_us"], unit="us")
    out["first_order"] = first.dt.strftime("%Y-%m-%d")
    out["last_order"] = last.dt.strftime("%Y-%m-%d")
    out["status"] = np.where(last >= pd.Timestamp("2000-01-01"), "Active", "Concluded")
    return (
        out[["o_custkey", "first_order", "last_order", "n_orders", "status"]]
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )


def part_minmax(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Max, Min

    out = (
        _rp(sf_dir, "part", columns=["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Min("p_retailprice", alias_name="min_price"),
            Max("p_retailprice", alias_name="max_price"),
        )
        .to_pandas()
    )
    out = _round(out, {"min_price": 2, "max_price": 2})
    return out.sort_values("p_brand").reset_index(drop=True)


def lang_stats(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Mean

    out = (
        _rp(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"))
        .to_pandas()
    )
    out = _round(out, {"avg_chars": 4})
    return out.sort_values("lang").reset_index(drop=True)


def dup_audit(sf_dir: str) -> pd.DataFrame:
    """A7 parity: GROUP BY key HAVING count > 1."""
    from ray.data.aggregate import Count

    out = (
        _rp(sf_dir, "documents", columns=["n_chars"])
        .groupby("n_chars")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
    )
    out = out[out["cnt"] > 1]
    return out.sort_values("n_chars").reset_index(drop=True)


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


def broadcast_region_join(sf_dir: str) -> pd.DataFrame:
    """J6/T2 parity: customer ⋈ nation ⋈ region with the dimension chain
    broadcast once (``ray.put``), looked up vectorized per batch. No shuffle
    join: the fact table streams, the dims are tiny."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Count, Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    # nationkey is dense/small → array lookup table
    lut = np.empty(dim["n_nationkey"].max() + 1, dtype=object)
    lut[dim["n_nationkey"].to_numpy()] = dim["r_name"].to_numpy()
    ref = ray.put(lut)

    def add_region(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        r = table[t["c_nationkey"].to_numpy(zero_copy_only=False)]
        return t.append_column("r_name", pa.array(r, type=pa.string()))

    out = (
        _rp(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
        .map_batches(add_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_acctbal"))
        .to_pandas()
    )
    out = _round(out, {"total_acctbal": 2})
    return out.sort_values("r_name").reset_index(drop=True)


def q3_top_orders(sf_dir: str, bloom_threshold: int = 10_000_000
                  ) -> pd.DataFrame:
    """J6+O1 parity: segment-filtered 3-way join, revenue per order, top-10
    with deterministic tiebreak.

    Both build sides come from DISTRIBUTED Dataset filters (no driver
    full-table reads — the round-1 nit), and BOTH semi-joins are hybrid on
    build-side cardinality:
      - customers⋉orders: ≤ ``bloom_threshold`` segment customers →
        broadcast the sorted key array once; above it the segment keys
        never touch the driver — an exact hash-shuffle ``Dataset.join``
        produces the segment orders.
      - orders⋉lineitem (same policy as ``exact_dedup``):
        ≤ ``bloom_threshold`` keys → broadcast; above it (the 10^10
        target) a fixed-size **Bloom filter built distributed**
        (functions/bloom.py) pre-filters lineitem, and bloom false
        positives are removed EXACTLY by a ``Dataset.join`` of the (tiny)
        per-order aggregate back to the filtered orders."""
    import ray

    from ..functions.bloom import bloom_contains, build_bloom
    from ..functions.bucketed import bucketed_groupby_agg

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
               filter=pc.field("c_mktsegment") == "BUILDING"
               ).select_columns(["c_custkey"]).materialize()

    if cust.count() <= bloom_threshold:
        # small segment: broadcast the sorted key array once
        ckeys = np.sort(np.concatenate(
            [b["c_custkey"].to_numpy() for b in
             cust.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        cref = ray.put(ckeys)

        def orders_of_segment(t: pa.Table) -> pa.Table:
            keys = ray.get(cref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ck).clip(0, max(len(keys) - 1, 0))
            mask = keys[pos] == ck if len(keys) else np.zeros(len(ck), bool)
            return pa.table(
                {"o_orderkey": t["o_orderkey"].filter(pa.array(mask))})

        seg_orders = _rp(sf_dir, "orders",
                         columns=["o_orderkey", "o_custkey"]).map_batches(
            orders_of_segment, batch_format="pyarrow").materialize()
    else:
        # billions of segment customers (the 100-TB shape): never collect
        # the keys on the driver — exact hash-shuffle semi-join instead
        cpus = int(ray.cluster_resources().get("CPU", 4))
        seg_orders = (_rp(sf_dir, "orders",
                          columns=["o_orderkey", "o_custkey"])
                      .join(cust, join_type="inner",
                            num_partitions=max(2, min(64, 2 * cpus)),
                            on=("o_custkey",), right_on=("c_custkey",))
                      .select_columns(["o_orderkey"]).materialize())
    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    if seg_orders.count() <= bloom_threshold:
        okeys = np.sort(np.concatenate(
            [b["o_orderkey"].to_numpy() for b in
             seg_orders.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        kref = ray.put(okeys)

        def exact_semi(t: pa.Table) -> pa.Table:
            keys = ray.get(kref)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ok).clip(0, max(len(keys) - 1, 0))
            mask = keys[pos] == ok if len(keys) else np.zeros(len(ok), bool)
            return revenue(t.filter(pa.array(mask)))

        # two-level reduce: order-cardinality groups pay the per-group
        # overhead flat groupby has (functions/bucketed.py)
        agg = bucketed_groupby_agg(
            li.map_batches(exact_semi, batch_format="pyarrow"),
            "l_orderkey", {"revenue": ("rev", "sum")})
        out = agg.to_pandas()
    else:
        bloom = build_bloom(seg_orders, "o_orderkey")
        bref = ray.put(bloom)

        def bloom_semi(t: pa.Table) -> pa.Table:
            bits = ray.get(bref)
            ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
            return revenue(t.filter(pa.array(bloom_contains(bits, ok))))

        agg = bucketed_groupby_agg(
            li.map_batches(bloom_semi, batch_format="pyarrow"),
            "l_orderkey", {"revenue": ("rev", "sum")})
        # exact FP removal on the (small) aggregate
        cpus = int(ray.cluster_resources().get("CPU", 4))
        exact = agg.join(seg_orders, join_type="inner",
                         num_partitions=max(2, min(8, 2 * cpus)),
                         on=("l_orderkey",), right_on=("o_orderkey",))
        out = exact.to_pandas()[["l_orderkey", "revenue"]]
    out = _round(out, {"revenue": 2})
    out = out.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def anti_join_customers(sf_dir: str, bloom_threshold: int = 10_000_000
                        ) -> pd.DataFrame:
    """J8 parity: customers with no big order (>300k). The build side is a
    DISTRIBUTED filtered read (keys only — never a driver full-table read),
    with the same hybrid policy as ``q3_top_orders``:

      - ≤ ``bloom_threshold`` build keys: broadcast the sorted key array once
        (``ray.put``) and anti-filter each customer batch vectorized.
      - above it (the 10^10 target): a fixed-size **Bloom filter built
        distributed** splits customers into definite-keeps (bloom negative ⇒
        provably no big order) and maybes (bloom positive); only the maybes —
        a small, FP-bounded slice — go through an exact hash-shuffle
        ``left_anti`` ``Dataset.join`` against the build keys. Join partition
        count is tied to cluster CPUs (same observed-deadlock guard as q3)."""
    import ray

    from ..functions.bloom import bloom_contains, build_bloom

    big = (_rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
               filter=pc.field("o_totalprice") > 300_000.0)
           .select_columns(["o_custkey"]).materialize())
    cust = _rp(sf_dir, "customer", columns=["c_custkey"])

    if big.count() <= bloom_threshold:
        okeys = np.unique(np.concatenate(
            [b["o_custkey"].to_numpy() for b in
             big.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        ref = ray.put(okeys)

        def anti(t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            ck = t["c_custkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ck).clip(0, max(len(keys) - 1, 0))
            has = keys[pos] == ck if len(keys) else np.zeros(len(ck), bool)
            return t.filter(pa.array(~has))

        out = cust.map_batches(anti, batch_format="pyarrow").to_pandas()
    else:
        bloom = build_bloom(big, "o_custkey")
        bref = ray.put(bloom)

        def bloom_split(keep_positive: bool):
            def fn(t: pa.Table) -> pa.Table:
                bits = ray.get(bref)
                ck = t["c_custkey"].to_numpy(zero_copy_only=False)
                hit = bloom_contains(bits, ck)
                return t.filter(pa.array(hit if keep_positive else ~hit))
            return fn

        definite = cust.map_batches(bloom_split(False), batch_format="pyarrow")
        maybe = cust.map_batches(bloom_split(True), batch_format="pyarrow")
        cpus = int(ray.cluster_resources().get("CPU", 4))
        exact = maybe.join(big, join_type="left_anti",
                           num_partitions=max(2, min(8, 2 * cpus)),
                           on=("c_custkey",), right_on=("o_custkey",))
        out = definite.union(exact).to_pandas()
    if out.empty:  # empty Dataset → pandas loses the schema
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64)})
    return out.sort_values("c_custkey").reset_index(drop=True)


# --------------------------------------------------------------------------
# set ops / sort-limit / filters
# --------------------------------------------------------------------------


def union_counts(sf_dir: str) -> pd.DataFrame:
    """D7/A9 parity: UNION ALL of two account tables → per-nation rollup."""
    from ray.data.aggregate import Count, Sum

    cust = _rp(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table({"nationkey": t["c_nationkey"], "bal": t["c_acctbal"]}),
        batch_format="pyarrow",
    )
    supp = _rp(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]).map_batches(
        lambda t: pa.table({"nationkey": t["s_nationkey"], "bal": t["s_acctbal"]}),
        batch_format="pyarrow",
    )
    out = (
        cust.union(supp)
        .groupby("nationkey")
        .aggregate(Count(alias_name="n_accounts"), Sum("bal", alias_name="total_bal"))
        .to_pandas()
    )
    out = _round(out, {"total_bal": 2})
    return out.sort_values("nationkey").reset_index(drop=True)


def top_event_users(sf_dir: str) -> pd.DataFrame:
    """O2 parity: top-20 users by total event value, (-value, id) tiebreak."""
    from ..functions.bucketed import bucketed_groupby_agg

    out = (
        bucketed_groupby_agg(  # user-cardinality keys (see bucketed.py)
            _rp(sf_dir, "events", columns=["user_id", "value"]),
            "user_id",
            {"total_value": ("value", "sum"),
             "n_events": ("value", "count")})
        .to_pandas()
    )
    out = _round(out, {"total_value": 2})
    out = out.sort_values(["total_value", "user_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def filter_orders(sf_dir: str) -> pd.DataFrame:
    """F-ops parity with predicate pushdown at the read (row-group pruning)."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(
        sf_dir,
        "orders",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        filter=(pc.field("o_orderstatus") == "F") & (pc.field("o_totalprice") > 1000.0),
    )
    out = (
        ds.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    out = _round(out, {"total": 2})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# --------------------------------------------------------------------------
# stream-shaped + CDC kernels
# --------------------------------------------------------------------------


def events_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-day window per event_type (§2.10: windows as grouped
    aggregation over an ordered, partitioned log)."""
    from ray.data.aggregate import Count, Sum

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"], unit="day"), format="%Y-%m-%d")
        return t.append_column("day", day)

    out = (
        _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
        .map_batches(add_day, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out = _round(out, {"total_value": 2})
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate (width 2 h, slide 1 h — each event lands in
    exactly two windows): flat window-replication inside ``map_batches`` with
    a per-batch partial aggregate (combiner), then a bucketed reduce. The
    tumbling case is ``events_window``; replication factor = width/slide, so
    the combiner keeps the exchange at one row per (window, batch)."""
    HOUR = np.int64(3_600 * 1_000_000)  # µs

    ds = _rp(sf_dir, "events", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        ws1 = (t // HOUR) * HOUR
        ws = np.concatenate([ws1, ws1 - HOUR])
        c2 = np.tile(cents, 2)
        agg = (pd.DataFrame({"ws": ws, "cents": c2})
               .groupby("ws", sort=False)
               .agg(n_events=("cents", "size"), cents=("cents", "sum"))
               .reset_index())
        agg["bucket"] = _hash_bucket(agg["ws"].to_numpy(), 8)
        return agg

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("ws", sort=False)
               .agg(n_events=("n_events", "sum"), cents=("cents", "sum"))
               .reset_index())
        return pd.DataFrame({
            "window_start": agg["ws"].to_numpy().astype("datetime64[us]"),
            "n_events": agg["n_events"].to_numpy().astype(np.int64),
            "total_value": np.round(agg["cents"].to_numpy() / 100.0, 2),
        })

    out = (
        ds.map_batches(partial, batch_format="pandas")  # pandas: per-block pandas-groupby partial
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("window_start").reset_index(drop=True)


def sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessionization (§2.10 streaming family): per user, events
    closer than 30 min belong to one session. Bucketed by user so each
    bucket holds complete user histories; inside, a vectorized
    lag-gap-cumsum assigns session ids — the same computation DuckDB
    expresses with window functions. Output: one row per session."""
    GAP = np.int64(30 * 60 * 1_000_000)  # 30 min in µs

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _hash_bucket(df["user_id"].to_numpy(), 16)
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[np.int64(0), t[1:] - t[:-1]]
        new_session = new_user | (gap > GAP)
        sid = np.cumsum(new_session) - 1
        agg = (pd.DataFrame({"user_id": u, "t": t, "sid": sid})
               .groupby("sid", sort=False)
               .agg(user_id=("user_id", "first"), start=("t", "min"),
                    n_events=("t", "size"))
               .reset_index(drop=True))
        return pd.DataFrame({
            "user_id": agg["user_id"].to_numpy(),
            "session_start": agg["start"].to_numpy().astype("datetime64[us]"),
            "n_events": agg["n_events"].to_numpy().astype(np.int64),
        })

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")  # pandas: tiny column-attach on partial rows
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "session_start"]).reset_index(drop=True)


def topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Per-group top-k (O1/O2 family generalized to a window function): the
    top-3 orders per customer by total price, deterministic tiebreak on
    order key. Bucketed by customer; vectorized sort + head per bucket."""
    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _hash_bucket(df["o_custkey"].to_numpy(), 16)
        return df

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True])
        out = g.groupby("o_custkey", sort=False).head(3).copy()
        out["rank"] = out.groupby("o_custkey", sort=False).cumcount() + 1
        return out[["o_custkey", "rank", "o_orderkey", "o_totalprice"]]

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")  # pandas: tiny column-attach on partial rows
        .groupby("bucket")
        .map_groups(top3, batch_format="pandas")
        .to_pandas()
    )
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


def lww_latest_event(sf_dir: str) -> pd.DataFrame:
    """The CDC LWW kernel on the events table: latest event per user by
    event_id (argmax reduce, distributed partial+final)."""
    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value", "props"])
    resolved = lww_resolve(ds, ["user_id"], seq_column="event_id", num_partitions=8)
    out = resolved.to_pandas().drop(columns=["part_id"])
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "event_id", "event_type", "value", "props"]
    ]


def cdc_lww_lineitem(sf_dir: str) -> pd.DataFrame:
    """Flagship oracle-checked CDC query: interpret lineitem rows as a
    change log — key (l_partkey, l_suppkey), seq = commit order
    (l_orderkey*8 + l_linenumber), deletes where l_returnflag='R' — and
    resolve final state with the engine's distributed LWW (tombstones drop).
    Mirrors the identity-key upsert of
    /root/reference/src/core/logic/project_loader.py:333-373 with the
    mtime-order rule of /root/reference/src/flows/sigpesq/advisorships.py:38-40
    made an explicit seq."""
    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                      "l_returnflag", "l_quantity", "l_extendedprice"])

    def to_events(t: pa.Table) -> pa.Table:
        seq = pc.add(pc.multiply(t["l_orderkey"], pa.scalar(8, pa.int64())),
                     t["l_linenumber"].cast(pa.int64()))
        op = pc.if_else(pc.equal(t["l_returnflag"], "R"),
                        pa.scalar("delete"), pa.scalar("update"))
        return pa.table({
            "l_partkey": t["l_partkey"], "l_suppkey": t["l_suppkey"],
            "seq": seq, "op": op,
            "l_quantity": t["l_quantity"], "l_extendedprice": t["l_extendedprice"],
        })

    resolved = lww_resolve(
        ds.map_batches(to_events, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        num_partitions=16,
    )
    out = resolved.to_pandas().drop(columns=["part_id", "op"])
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)[
        ["l_partkey", "l_suppkey", "seq", "l_quantity", "l_extendedprice"]
    ]


def pii_anonymize_customers(sf_dir: str) -> pd.DataFrame:
    """M16/M19 parity: PII anonymization-on-write as an explicit pipeline
    stage — salted-sha256 surrogate ids (idempotent under replay; the
    before-flush ORM hook of
    /root/reference/src/core/logic/pii_session_hook.py:21-43 made a visible
    stage instead of a side effect)."""
    from ..functions.scalars import anonymize_cpf

    ds = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def scrub(t):  # pyarrow in/out: no Arrow→pandas copy around the sha loop
        import pyarrow as pa

        names = t["c_name"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "anon_id": pa.array([anonymize_cpf(v) for v in names],
                                pa.string()),
        })

    out = ds.map_batches(scrub, batch_format="pyarrow").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def hash_join_revenue(sf_dir: str) -> pd.DataFrame:
    """Large-side hash join via ``Dataset.join`` (Ray ≥2.46 hash-partitioned
    join; J6 family when neither side is broadcastable): orders ⋈ customer
    on custkey → revenue per market segment."""
    from ray.data.aggregate import Count, Sum

    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=16,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
    )
    out = _round(out, {"revenue": 2})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def top_suppliers(sf_dir: str) -> pd.DataFrame:
    """O1 parity through the distributed sort operator: ds.sort + limit."""
    ds = _rp(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal"])
    # raw column values pass through unrounded: both engines read the same
    # doubles from parquet, so they hash identically without rounding
    out = (
        ds.sort(["s_acctbal", "s_suppkey"], descending=[True, False])
        .limit(5)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def _cooccurrence_edges(ds, group_key: str, item_key: str, P: int = 32):
    """Co-occurrence edge Dataset (s1, s2, w) from (group, item) rows — the
    pair-expansion → groupby-count core shared by the collaboration-graph
    queries. Bucketed expansion: groups are hash-bucketed into P buckets so
    the pair expansion runs as ~P vectorized calls (not one Python call per
    group), with a partial count inside each bucket before the small global
    sum — one wide exchange on the raw rows, one on the pre-aggregated
    edges."""

    def add_bucket(t: pa.Table) -> pa.Table:
        key = t.column(group_key).to_numpy(zero_copy_only=False)
        # cheap multiplicative hash; all rows of a group share a bucket
        bucket = ((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                  >> np.uint64(32)) % np.uint64(P)
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))

    def expand_count(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (group, item), contiguous per group
        g = g.drop_duplicates([group_key, item_key]).sort_values(
            [group_key, item_key])
        key = g[group_key].to_numpy()
        sup = g[item_key].to_numpy()
        if len(key) == 0:
            return pd.DataFrame({"s1": pd.Series([], dtype="int64"),
                                 "s2": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            a_parts.append(sup[s + i])
            b_parts.append(sup[s + j])
        if not a_parts:
            return pd.DataFrame({"s1": pd.Series([], dtype="int64"),
                                 "s2": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        edges = pd.DataFrame({"s1": np.concatenate(a_parts),
                              "s2": np.concatenate(b_parts)})
        part = (edges.groupby(["s1", "s2"], sort=False).size()
                .rename("w").reset_index())
        # route each edge to a reduce bucket (vectorized groupby-sum there
        # beats ray's per-group Aggregate for many small groups)
        eb = ((part["s1"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B1)
               + part["s2"].to_numpy().astype(np.uint64))
              * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)) % np.uint64(P)
        part["edge_bucket"] = eb.astype(np.int64)
        return part

    def sum_edges(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["s1", "s2"], sort=False)["w"].sum()
                .reset_index())

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand_count, batch_format="pandas")
        .groupby("edge_bucket")
        .map_groups(sum_edges, batch_format="pandas")
    )


def supplier_cograph(sf_dir: str) -> pd.DataFrame:
    """Collaboration-graph edges (A5/§1.1 parity: the people co-membership
    graph of /root/reference/src/core/logic/people_relationship_graph_generator.py:166-181
    as pair-expansion → groupby count): suppliers co-occurring in an order,
    edge weight = #orders shared."""
    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    out = _cooccurrence_edges(ds, "l_orderkey", "l_suppkey").to_pandas()
    return out.sort_values(["s1", "s2"]).reset_index(drop=True)


def _part_cograph(sf_dir: str):
    """(edges, nodes) of the part co-occurrence graph: parts sharing an order
    in ≥2 distinct orders (the weight threshold keeps the graph sparse).
    Edges are materialized once; both downstream labelers reuse them."""
    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = _cooccurrence_edges(li, "l_orderkey", "l_partkey").map_batches(
        lambda t: t.filter(pc.greater_equal(t["w"], 2)),
        batch_format="pyarrow").materialize()
    nodes = _rp(sf_dir, "part", columns=["p_partkey"]).map_batches(
        lambda t: pa.table({"node": t["p_partkey"]}), batch_format="pyarrow")
    return edges, nodes


def _driver_union_find(edges, deg: pd.DataFrame) -> pd.DataFrame:
    """Small-graph labeler: union-find with path compression over the
    contracted (thresholded) edge list, on the driver."""
    e = edges.select_columns(["s1", "s2"]).to_pandas()
    node_ids = np.sort(deg["node"].to_numpy(dtype=np.int64))
    pos = {int(n): i for i, n in enumerate(node_ids)}
    parent = np.arange(len(node_ids), dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    for a, b in zip(e["s1"].to_numpy(), e["s2"].to_numpy()):
        ra, rb = find(pos[int(a)]), find(pos[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root ⇒ min-id label

    comp = np.array([node_ids[find(i)] for i in range(len(node_ids))],
                    dtype=np.int64)
    return pd.DataFrame({"node": node_ids, "component": comp})


def connected_components(sf_dir: str, edge_threshold: int = 100_000
                         ) -> pd.DataFrame:
    """Connected components + isolation (A5 parity — the missing half of the
    graph stats, /root/reference/src/core/logic/
    people_relationship_graph_generator.py:436-510) over the part
    co-occurrence graph (129 components / 120 isolated at sf0.01).

    The HEAVY stage (pair expansion over all lineitems → weighted edges →
    threshold) is always distributed. Labeling ROUTES on the contracted
    graph's size: at or below ``edge_threshold`` surviving edges a driver
    union-find labels it (the contracted graph is tiny — no exchange
    rounds); above it the DISTRIBUTED min-label-propagation operator
    ``functions.graph.connected_components`` runs (iterative bucketed
    exchanges — the edge list never needs one machine), so a dense graph at
    100× never materializes its edges on the driver. Degrees always come
    from the distributed ``node_degrees`` reduce."""
    from ..functions.graph import connected_components as cc_labelprop
    from ..functions.graph import node_degrees

    edges, nodes = _part_cograph(sf_dir)
    # pinned: edges feed THREE consumers (degrees, the routing count, the
    # labeler/union-find) — unpinned, the lineitem pair expansion would
    # re-execute for each (at scale: write the edge list to a lake path
    # and read it back, same semantics)
    edges = edges.materialize()
    deg = node_degrees(edges, nodes).to_pandas()  # distributed reduce
    deg["degree"] = deg["degree"].astype(np.int64)
    if edges.count() <= edge_threshold:
        comp = _driver_union_find(edges, deg)
    else:
        comp = cc_labelprop(edges, nodes).to_pandas()
    out = comp.merge(deg, on="node")
    return out.sort_values("node").reset_index(drop=True)[
        ["node", "component", "degree"]]


def connected_components_labelprop(sf_dir: str) -> pd.DataFrame:
    """Same result as ``connected_components`` but FORCED through the
    distributed min-label-propagation operator (edge_threshold=0), so the
    driver gate oracle-checks the scale path itself — the iterative
    edges⋈labels co-shuffle + min-reduce of ``functions/graph.py``."""
    return connected_components(sf_dir, edge_threshold=0)


def classify_customers(sf_dir: str) -> pd.DataFrame:
    """Classification rule cascade parity
    (/root/reference/src/core/logic/canonical_exporter.py:597-685: a
    priority ladder over role-evidence signals deriving
    classification + confidence + note): per-customer signals come from a
    distributed orders aggregate (count / max price / urgent count),
    attached with a hash-shuffle left-outer ``Dataset.join``, then the
    ladder itself is one vectorized ``np.select`` — first rule wins, each
    rule sets its own confidence tier, edge rules attach a note (the
    reference's ``classification_note``)."""
    import ray

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_totalprice", "o_orderpriority"])

    def proj(t: pa.Table) -> pa.Table:
        urgent = pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"),
                         pa.int64())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_totalprice": t["o_totalprice"],
                         "urgent": urgent})

    from ..functions.bucketed import bucketed_groupby_agg

    agg = bucketed_groupby_agg(  # customer-cardinality keys (bucketed.py)
        orders.map_batches(proj, batch_format="pyarrow"),
        "o_custkey",
        {"n_orders": ("o_totalprice", "count"),
         "max_price": ("o_totalprice", "max"),
         "n_urgent": ("urgent", "sum")})
    # hybrid build side (same policy as q3_top_orders/anti_join): the
    # per-customer aggregate is the SMALL side — broadcast it below the
    # threshold (saves the join's aggregator-actor spin-up, ~3 s of fixed
    # cost at toy scale), fall back to the hash-shuffle Dataset.join above
    agg = agg.materialize()
    if agg.count() <= 1_000_000:
        at = pd.concat(
            [b for b in agg.iter_batches(batch_format="pandas")]  # pandas: bounded driver fold (thresholded above)
            or [pd.DataFrame({"o_custkey": pd.Series([], dtype=np.int64),
                              "n_orders": pd.Series([], dtype=np.int64),
                              "max_price": pd.Series([], dtype=np.float64),
                              "n_urgent": pd.Series([], dtype=np.int64)})],
            ignore_index=True).set_index("o_custkey")
        aref = ray.put(at)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(aref)
            j = lut.reindex(df["c_custkey"].to_numpy())
            df = df.copy()
            for c in ("n_orders", "max_price", "n_urgent"):
                df[c] = j[c].to_numpy()
            return df

        joined = cust.map_batches(attach, batch_format="pandas")  # pandas: broadcast small-dim pandas merge
    else:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        joined = cust.join(agg, join_type="left_outer",
                           num_partitions=max(2, min(8, 2 * cpus)),
                           on=("c_custkey",), right_on=("o_custkey",))

    def ladder(df: pd.DataFrame) -> pd.DataFrame:
        n_orders = df["n_orders"].fillna(0).to_numpy(dtype=np.int64)
        n_urgent = df["n_urgent"].fillna(0).to_numpy(dtype=np.int64)
        max_price = df["max_price"].fillna(0.0).to_numpy(dtype=np.float64)
        bal = df["c_acctbal"].to_numpy(dtype=np.float64)
        strong = max_price > 250_000.0
        active = n_orders > 0
        negative = bal < 0.0
        rules = [strong, active, negative]
        category = np.select(
            rules, ["key_account", "active", "delinquent"], "inactive")
        confidence = np.select(
            [strong & (n_urgent > 0), strong,
             active & (n_orders >= 10), active,
             negative],
            ["high", "medium", "high", "medium", "medium"], "low")
        note = np.select(
            [~strong & ~active & negative, ~strong & ~active & ~negative],
            ["negative_balance_no_orders", "no_signals"], "")
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(dtype=np.int64),
            "category": category, "confidence": confidence, "note": note,
        })

    out = joined.map_batches(ladder, batch_format="pandas").to_pandas()  # pandas: np.select ladder over broadcast dims
    return out.sort_values("c_custkey").reset_index(drop=True)


def asof_purchase_attribution(sf_dir: str) -> pd.DataFrame:
    """Point-in-time attribution via as-of join (custom operator per the
    engine brief; no Ray Data primitive exists): for every purchase event,
    the user's latest click at-or-before the purchase — backward as-of with
    exact matches, inner. See functions/asof.py for the bucketed
    co-shuffle + merge_asof composition and its partitioning assumption."""
    from ..functions.asof import asof_join

    ev = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"])
    clicks = (ev.filter(expr="event_type == 'click'")
              .drop_columns(["event_type"])
              .rename_columns({"event_id": "prior_click_id"}))
    out = asof_join(
        purchases, clicks, by="user_id", on="ts",
        left_value_columns=["event_id"],
        right_value_columns=["prior_click_id"],
    ).to_pandas()
    out = out.rename(columns={"event_id": "purchase_id"})
    out["purchase_id"] = out["purchase_id"].astype(np.int64)
    out["prior_click_id"] = out["prior_click_id"].astype(np.int64)
    out = out[["purchase_id", "user_id", "prior_click_id"]]
    return out.sort_values("purchase_id").reset_index(drop=True)


def range_join_ship_activity(sf_dir: str) -> pd.DataFrame:
    """Banded range join (custom operator per the engine brief; no Ray Data
    primitive): per order, the count of lineitems — across ALL orders —
    shipped inside [o_orderdate, o_orderdate + 7 days). No equality key, so
    the composition is band replication: time is binned at the window width
    W; a probe interval of width W can only span bins b and b+1, so each
    order is replicated into those two bins, each lineitem lands in exactly
    one bin, one co-shuffle groups them, and a vectorized searchsorted probe
    counts matches per bin; partial counts sum per order in a small bucketed
    reduce. Partitioning assumption: band width = window width (tighter
    windows → more bins → more parallelism, never more replication).
    The order key rides the unified-schema union as NATIVE int64 (the
    ``_side`` flag marks item rows; no NaN sentinel, no float64 carry) —
    exact for keys of any magnitude."""
    W = np.int64(7 * 86_400 * 1_000_000)  # 7 days in µs

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    items = _rp(sf_dir, "lineitem", columns=["l_shipdate"])

    def _us(col) -> np.ndarray:
        return col.to_numpy().astype("datetime64[us]").astype(np.int64)

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        t = _us(df["o_orderdate"])
        b = t // W
        out = pd.DataFrame({
            "key": np.tile(df["o_orderkey"].to_numpy().astype(np.int64), 2),
            "t": np.tile(t, 2),
            "_bin": np.concatenate([b, b + 1]),
        })
        out["_side"] = np.int8(0)
        return out

    def tag_items(df: pd.DataFrame) -> pd.DataFrame:
        t = _us(df["l_shipdate"])
        return pd.DataFrame({
            "key": np.zeros(len(df), dtype=np.int64),  # placeholder; _side=1
            "t": t,
            "_bin": t // W,
            "_side": np.int8(1),
        })

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["_side"] == 0]
        s = np.sort(g.loc[g["_side"] == 1, "t"].to_numpy())
        t0 = o["t"].to_numpy()
        n = (np.searchsorted(s, t0 + W, side="left")
             - np.searchsorted(s, t0, side="left"))
        out = pd.DataFrame({"o_orderkey": o["key"].to_numpy(dtype=np.int64),
                            "n": n})
        out = out[out["n"] > 0]
        out["bucket"] = _hash_bucket(out["o_orderkey"].to_numpy(), 16)
        return out

    def total(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("o_orderkey", sort=False)["n"].sum().reset_index()
               .rename(columns={"n": "n_shipped"}))
        agg["o_orderkey"] = agg["o_orderkey"].astype(np.int64)
        agg["n_shipped"] = agg["n_shipped"].astype(np.int64)
        return agg

    out = (
        orders.map_batches(tag_orders, batch_format="pandas")  # pandas: tagged-union frame build
        .union(items.map_batches(tag_items, batch_format="pandas"))  # pandas: tagged-union frame build
        .groupby("_bin")
        .map_groups(probe, batch_format="pandas")
        .groupby("bucket")
        .map_groups(total, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def dist_join_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Distributed hash join of two large tables (J6 parity: the multi-way
    denormalization joins of
    /root/reference/src/core/logic/canonical_exporter.py:231-316, here the
    large⋈large case where no side fits a broadcast): lineitem ⋈ orders on
    order key via ``Dataset.join`` (Ray's hash-shuffle join), then a grouped
    revenue rollup. Complements hash_join_revenue, which shows the
    broadcast-small-side plan."""
    o = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_col(t: pa.Table) -> pa.Table:
        # integer cents (the _cents convention): float64 summation order
        # differs between Ray and DuckDB, so a sum near a .005 boundary could
        # flip under round(2); int64 cents make the sum order-invariant
        rev = pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("rev_cents", _cents(rev)).drop_columns(
            ["l_extendedprice", "l_discount"])

    joined = li.map_batches(revenue_col, batch_format="pyarrow").join(
        o, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",))
    # |orderpriority| = 5: collapse each joined block to ≤5 partial rows
    # in-task and fold on the driver (bounded by blocks × 5) instead of
    # sorting the lineitem-scale join output by the string key
    from ..functions.bucketed import bounded_groupby_fold

    out = bounded_groupby_fold(
        joined.select_columns(["o_orderpriority", "rev_cents"]),
        "o_orderpriority", ["rev_cents"], count_col="n_items")
    out["revenue"] = np.round(
        out["rev_cents"].to_numpy(dtype=np.int64) / 100.0, 2)
    out = out.drop(columns=["rev_cents"])[
        ["o_orderpriority", "n_items", "revenue"]]
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def graph_degree_stats(sf_dir: str) -> pd.DataFrame:
    """Graph node statistics + top-k by weighted degree (A5/O2 parity: the
    degree / weighted-degree stats and top-20-people ranking of
    /root/reference/src/core/logic/people_relationship_graph_generator.py:436-480,
    sort by (-weighted_degree, node id)): built FROM the co-occurrence edge
    list, so edges Dataset → per-endpoint explode → bucketed degree reduce →
    sort + limit. The edge Dataset chains straight from the pair-expansion
    stage — no driver round-trip of the edge list."""
    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    edges = _cooccurrence_edges(li, "l_orderkey", "l_suppkey")

    def explode(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [t["s1"].combine_chunks(), t["s2"].combine_chunks()])
        w = pa.concat_arrays(
            [t["w"].combine_chunks(), t["w"].combine_chunks()])
        return pa.table({"node": node, "w": w})

    def degrees(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("node", sort=False)
               .agg(degree=("w", "size"), weighted_degree=("w", "sum"))
               .reset_index())
        agg["degree"] = agg["degree"].astype(np.int64)
        agg["weighted_degree"] = agg["weighted_degree"].astype(np.int64)
        return agg

    out = (
        edges.map_batches(explode, batch_format="pyarrow")
        .map_batches(
            lambda g: g.assign(bucket=_hash_bucket(g["node"].to_numpy(), 16)),
            batch_format="pandas")  # pandas: bucket attach inside relabel round
        .groupby("bucket")
        .map_groups(degrees, batch_format="pandas")
        .sort(["weighted_degree", "node"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def _hash_bucket(key: np.ndarray, P: int) -> np.ndarray:
    """Cheap multiplicative hash bucket for int64 keys (same pattern as the
    CDC partitioner): all rows of a key share a bucket, so a per-bucket
    vectorized pandas reduce replaces one Python call per key group."""
    return (((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(32)) % np.uint64(P)).astype(np.int64)


def _cents(col: pa.ChunkedArray) -> pa.Array:
    """Exact integer cents from a double column — sums become order-invariant
    integer arithmetic, so Ray and DuckDB hash-match. Round mode must be
    half-away-from-zero to match DuckDB's round() when the input has more
    than 2 decimals (pyarrow's default half_to_even flips exact .5 cents)."""
    return pc.cast(
        pc.round(pc.multiply(col, pa.scalar(100.0)),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )


def weighted_vote_resolution(sf_dir: str) -> pd.DataFrame:
    """Weighted-vote argmax resolution (T6/J7 parity: the campus resolver of
    /root/reference/src/core/logic/export_campus_resolver.py:20-100 — per
    entity, candidate votes weighted by evidence, winner = max weight with a
    deterministic tiebreak): per customer, the order priority weighted by
    total order value. Bucketed reduce — one exchange, vectorized argmax."""
    P = 32
    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderpriority", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column("cents", _cents(t["o_totalprice"]))
        key = t.column("o_custkey").to_numpy(zero_copy_only=False)
        t = t.append_column("bucket", pa.array(_hash_bucket(key, P)))
        return t.drop_columns(["o_totalprice"])

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        v = (g.groupby(["o_custkey", "o_orderpriority"], sort=False)["cents"]
             .sum().reset_index())
        v = v.sort_values(["o_custkey", "cents", "o_orderpriority"],
                          ascending=[True, False, True])
        w = v.drop_duplicates("o_custkey", keep="first")
        return pd.DataFrame(
            {"o_custkey": w["o_custkey"].to_numpy(),
             "best_priority": w["o_orderpriority"].to_numpy(),
             "weight": np.round(w["cents"].to_numpy() / 100.0, 2)})

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(vote, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


def consolidate_winners(sf_dir: str) -> pd.DataFrame:
    """Duplicate-group consolidation (O4/D4 parity: the ordered-group-winner
    pass of /root/reference/src/core/logic/person_consolidator.py:97-103 —
    group by canonical key, winner by quality score desc / id asc, merge the
    rest into a rollup): suppliers grouped by nation, winner = highest
    account balance (suppkey tiebreak), plus member count and merged
    balance."""
    ds = _rp(sf_dir, "supplier",
             columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("cents", _cents(t["s_acctbal"]))

    def consolidate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s_acctbal", "s_suppkey"], ascending=[False, True])
        return pd.DataFrame(
            {"s_nationkey": g["s_nationkey"].to_numpy()[:1],
             "winner_suppkey": g["s_suppkey"].to_numpy()[:1],
             "n_members": np.array([len(g)], dtype=np.int64),
             "total_bal": [round(int(g["cents"].sum()) / 100.0, 2)]})

    out = (
        ds.map_batches(add_cents, batch_format="pyarrow")
        .groupby("s_nationkey")
        .map_groups(consolidate, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("s_nationkey").reset_index(drop=True)


def repoint_links(links_ds, mapping: dict[int, int], fk_columns):
    """Link-table repointing — the fan-out half of the reference's
    consolidation (person_consolidator.py:151-264: after picking a winner
    per duplicate class, every link table's FK column is rewritten
    loser→winner and the link rows re-deduped). Ray-first shape: the
    mapping is the SMALL side (duplicate classes, not facts) — broadcast
    once via ``ray.put`` as two sorted arrays — and each link Dataset
    streams through a stateless vectorized ``searchsorted`` rewrite; the
    post-merge dedup is the caller's groupby on its link key (partition
    assumption: mapping fits one worker's heap; a consolidation map bigger
    than that should ship as a hash join instead)."""
    import ray

    if not mapping:
        return links_ds
    losers = np.array(sorted(mapping), dtype=np.int64)
    winners = np.array([mapping[k] for k in losers], dtype=np.int64)
    ref = ray.put((losers, winners))

    def rewrite(t: pa.Table) -> pa.Table:
        lo, wi = ray.get(ref)
        for col in fk_columns:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.minimum(np.searchsorted(lo, v), len(lo) - 1)
            hit = lo[idx] == v
            new = np.where(hit, wi[idx], v)
            t = t.set_column(t.column_names.index(col), col,
                             pa.array(new, pa.int64()))
        return t

    return links_ds.map_batches(rewrite, batch_format="pyarrow")


def consolidate_repoint_links(sf_dir: str) -> pd.DataFrame:
    """Consolidation + link repoint end-to-end over the driver tables:
    suppliers collapse into duplicate classes of four consecutive ids
    (winner = class head, the deterministic stand-in for a matcher's
    winner pick), the lineitem order↔supplier link table is repointed
    loser→winner, and the merged links are re-deduped — per winner: the
    distinct orders it now links to and the raw link rows it absorbed
    (person_consolidator.py:151-264's _merge_simple_link_table counts)."""
    from ..functions.bucketed import bucketed_groupby_agg

    sup = _rp(sf_dir, "supplier", columns=["s_suppkey"]).to_pandas()
    keys = sup["s_suppkey"].to_numpy(dtype=np.int64)
    winner = (keys // 4) * 4  # class head (keys are 0-based)
    mapping = {int(k): int(w) for k, w in zip(keys, winner) if k != w}

    links = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    repointed = repoint_links(links, mapping, ["l_suppkey"])
    # post-merge dedup: distinct (supplier, order) with multiplicity, then
    # the per-winner rollup (two-level aggregate — the distinct count never
    # materializes raw links on one node)
    per_pair = bucketed_groupby_agg(  # pair-cardinality keys (bucketed.py)
        repointed, ["l_suppkey", "l_orderkey"],
        {"n": ("l_orderkey", "count")})
    out = (
        bucketed_groupby_agg(  # supplier-cardinality second level
            per_pair, "l_suppkey",
            {"n_orders": ("n", "count"), "n_link_rows": ("n", "sum")})
        .to_pandas()
        .rename(columns={"l_suppkey": "supplier"})
    )
    out["n_link_rows"] = out["n_link_rows"].astype(np.int64)
    return (out.sort_values("supplier").reset_index(drop=True)
            [["supplier", "n_orders", "n_link_rows"]])


def evidence_flags(sf_dir: str) -> pd.DataFrame:
    """Per-entity any() evidence flags (A8 parity: the per-person email /
    identification evidence aggregation of
    /root/reference/src/core/logic/canonical_exporter.py:519-560): per
    customer — order count, any high-value order, any urgent order.
    Partial aggregate per batch (combiner), then one bucketed reduce."""
    P = 32
    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderpriority", "o_totalprice"])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            high=g["o_totalprice"].to_numpy() > 250_000.0,
            urgent=(g["o_orderpriority"] == "1-URGENT").to_numpy(),
        )
        agg = (g.groupby("o_custkey", sort=False)
               .agg(n_orders=("o_custkey", "size"),
                    has_high_value=("high", "any"),
                    has_urgent=("urgent", "any"))
               .reset_index())
        agg["bucket"] = _hash_bucket(agg["o_custkey"].to_numpy(), P)
        return agg

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("o_custkey", sort=False)
                .agg(n_orders=("n_orders", "sum"),
                     has_high_value=("has_high_value", "any"),
                     has_urgent=("has_urgent", "any"))
                .reset_index())

    out = (
        ds.map_batches(partial, batch_format="pandas")  # pandas: per-block pandas-groupby partial
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_custkey").reset_index(drop=True)


def entity_resolution_cascade(sf_dir: str) -> pd.DataFrame:
    """The exact→fuzzy entity-resolution cascade as ONE operator (J3/D3/J5
    parity — the missing composition flagged in round 1): registry =
    customers (name ⊕ market segment); incoming = deterministic planted
    variants exercising every tier:

      +100000  exact raw copies         → tier 'raw'
      +500000  DUPLICATE raw claims     → claim dedup: higher incoming_id loses
      +200000  uppercased               → tier 'normalized'
      +300000  middle-token insertion   → tier 'fuzzy' (blocked lev ratio ≥90)
      +400000  unknown names            → tier 'none', matched_id -1

    See functions/entity_resolution.py for the cascade + claim-resolution
    machinery and its broadcast-registry scale note."""
    from ..functions.entity_resolution import resolve_entities

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name",
                                            "c_mktsegment"])

    def registry(t: pa.Table) -> pa.Table:
        name = pc.binary_join_element_wise(t["c_name"], t["c_mktsegment"], " ")
        return pa.table({"rid": t["c_custkey"], "name": name})

    def incoming(df: pd.DataFrame) -> pd.DataFrame:
        full = df["c_name"] + " " + df["c_mktsegment"]
        k = df["c_custkey"]
        frames = [
            pd.DataFrame({"id": k[k < 40] + 100000,
                          "name": full[k < 40]}),
            pd.DataFrame({"id": k[k < 20] + 500000,
                          "name": full[k < 20]}),
            pd.DataFrame({"id": k[(k >= 40) & (k < 80)] + 200000,
                          "name": full[(k >= 40) & (k < 80)].str.upper()}),
            pd.DataFrame({"id": k[(k >= 80) & (k < 120)] + 300000,
                          "name": (df["c_name"] + " x " + df["c_mktsegment"])
                          [(k >= 80) & (k < 120)]}),
            pd.DataFrame({"id": k[(k >= 120) & (k < 140)] + 400000,
                          "name": "zz unknown " +
                          k[(k >= 120) & (k < 140)].astype(str)}),
        ]
        return pd.concat(frames, ignore_index=True)

    reg_ds = cust.map_batches(registry, batch_format="pyarrow")
    inc_ds = cust.map_batches(incoming, batch_format="pandas")  # pandas: tagged-union frame build
    out = resolve_entities(
        inc_ds, reg_ds, incoming_id="id", incoming_name="name",
        registry_id="rid", registry_name="name", fuzzy_threshold=90,
    ).to_pandas()
    out = out.rename(columns={"incoming_id": "incoming_id"})
    out["score"] = out["score"].astype(np.int64)
    return out.sort_values("incoming_id").reset_index(drop=True)[
        ["incoming_id", "matched_id", "tier", "score", "won"]
    ]


def nested_customer_mart(sf_dir: str) -> pd.DataFrame:
    """Nested mart with per-group collect_list (A3/A4 parity — the
    list-valued marts of /root/reference/src/core/logic/mart_generator.py:25-123):
    per nation — customer count, sorted distinct market segments, and the
    top-3 customers by account balance, both serialized as joined strings
    (the mart's nested JSON arrays, stringified for the driver's
    hash-compare). One bucketed exchange, vectorized list building."""
    P = 16
    ds = _rp(sf_dir, "customer",
             columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                      "c_mktsegment"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = _hash_bucket(df["c_nationkey"].to_numpy(), P)
        return df

    def mart(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, sub in g.groupby("c_nationkey", sort=False):
            segs = ",".join(sorted(sub["c_mktsegment"].unique()))
            top = sub.sort_values(["c_acctbal", "c_custkey"],
                                  ascending=[False, True]).head(3)
            rows.append((nk, len(sub), segs, "|".join(top["c_name"])))
        return pd.DataFrame(rows, columns=["c_nationkey", "n_customers",
                                           "segments", "top_customers"])

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")  # pandas: tiny column-attach on partial rows
        .groupby("bucket")
        .map_groups(mart, batch_format="pandas")
        .to_pandas()
    )
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out.sort_values("c_nationkey").reset_index(drop=True)


def year_expansion_mart(sf_dir: str) -> pd.DataFrame:
    """Year-range expansion mart (A4 parity — the per-year evolution mart of
    /root/reference/src/core/logic/mart_generator.py:137-420): each
    customer's [first order year, last order year] span is expanded with a
    flat_map, then a per-year active-customer count. Expansion factor is
    bounded by the year range, so the exchange stays linear."""
    ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def to_year(t: pa.Table) -> pa.Table:
        year = pc.year(t["o_orderdate"]).cast(pa.int64())
        return pa.table({"o_custkey": t["o_custkey"], "year": year})

    from ..functions.bucketed import bucketed_groupby_agg

    spans = bucketed_groupby_agg(  # customer-cardinality keys (bucketed.py)
        ds.map_batches(to_year, batch_format="pyarrow"),
        "o_custkey",
        {"y0": ("year", "min"), "y1": ("year", "max")})

    def expand_counts(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block (year, partial count): the span expansion is pure
        repeat/cumsum arithmetic (no per-customer loop) and collapses to a
        per-year count before leaving the block — the driver only ever sees
        #blocks × #distinct-years rows (years are calendar-bounded), so no
        sort exchange is needed for the final 7-row aggregate."""
        y0 = df["y0"].to_numpy(dtype=np.int64)
        y1 = df["y1"].to_numpy(dtype=np.int64)
        n = y1 - y0 + 1
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame({"year": np.array([], dtype=np.int64),
                                 "cnt": np.array([], dtype=np.int64)})
        years = np.repeat(y0, n) + (np.arange(total, dtype=np.int64)
                                    - np.repeat(np.cumsum(n) - n, n))
        u, c = np.unique(years, return_counts=True)
        return pd.DataFrame({"year": u, "cnt": c.astype(np.int64)})

    parts = spans.map_batches(expand_counts, batch_format="pandas").to_pandas()  # pandas: repeat/cumsum year-expansion partial
    out = (parts.groupby("year", sort=False)["cnt"].sum()
           .rename("active_customers").reset_index())
    out["active_customers"] = out["active_customers"].astype(np.int64)
    return out.sort_values("year").reset_index(drop=True)


def disambiguate_titles(sf_dir: str) -> pd.DataFrame:
    """Title-disambiguation rewrite (J2 parity — the suffix rewrite of
    colliding titles in /root/reference/src/core/logic/
    initiative_handlers.py:487-573): colliding part names keep the first
    occurrence (by part key) verbatim and rewrite later ones to
    ``name (n)``. Bucketed by name so every collision group is co-located;
    vectorized cumcount per bucket. Output titles are unique by
    construction (the unique-index invariant, D8)."""
    P = 16
    ds = _rp(sf_dir, "part", columns=["p_partkey", "p_name"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_array(df["p_name"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(P)).astype(np.int64)
        return df

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_name", "p_partkey"])
        rn = g.groupby("p_name", sort=False).cumcount() + 1
        title = np.where(rn == 1, g["p_name"],
                         g["p_name"] + " (" + rn.astype(str) + ")")
        return pd.DataFrame({"p_partkey": g["p_partkey"].to_numpy(),
                             "title": title})

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")  # pandas: tiny column-attach on partial rows
        .groupby("bucket")
        .map_groups(rewrite, batch_format="pandas")
        .to_pandas()
    )
    assert out["title"].is_unique  # D8 invariant
    return out.sort_values("p_partkey").reset_index(drop=True)


# --------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered by the driver)
# --------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                      AS sum_qty,
               round(sum(l_extendedprice), 2)                 AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*)                                       AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "parent_rollup": """
        SELECT o_custkey,
               strftime(min(o_orderdate), '%Y-%m-%d') AS first_order,
               strftime(max(o_orderdate), '%Y-%m-%d') AS last_order,
               count(*) AS n_orders,
               CASE WHEN max(o_orderdate) >= TIMESTAMP '2000-01-01'
                    THEN 'Active' ELSE 'Concluded' END AS status
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    "part_minmax": """
        SELECT p_brand, count(*) AS n_parts,
               round(min(p_retailprice), 2) AS min_price,
               round(max(p_retailprice), 2) AS max_price
        FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    "lang_stats": """
        SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "dup_audit": """
        SELECT n_chars, count(*) AS cnt FROM documents
        GROUP BY n_chars HAVING count(*) > 1 ORDER BY n_chars
    """,
    "broadcast_region_join": """
        SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "q3_top_orders": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "anti_join_customers": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey
    """,
    "union_counts": """
        WITH u AS (
            SELECT c_nationkey AS nationkey, c_acctbal AS bal FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, s_acctbal AS bal FROM supplier
        )
        SELECT nationkey, count(*) AS n_accounts, round(sum(bal), 2) AS total_bal
        FROM u GROUP BY nationkey ORDER BY nationkey
    """,
    "top_event_users": """
        SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 20
    """,
    "filter_orders": """
        SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "events_window": """
        SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type, day ORDER BY event_type, day
    """,
    "lww_latest_event": """
        SELECT user_id, event_id, event_type, value, props FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
        ORDER BY user_id
    """,
    "asof_purchase_attribution": """
        SELECT p.event_id AS purchase_id, p.user_id,
               c.event_id AS prior_click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        ORDER BY purchase_id
    """,
    "sessionize_events": """
        WITH x AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
            FROM x
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    "topk_per_group": """
        WITH r AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS rank
            FROM orders
        )
        SELECT o_custkey, rank, o_orderkey, o_totalprice
        FROM r WHERE rank <= 3 ORDER BY o_custkey, rank
    """,
    "events_sliding_window": """
        WITH x AS (
            SELECT date_trunc('hour', ts) AS ws,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
            UNION ALL
            SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT ws AS window_start, count(*) AS n_events,
               round(sum(cents) / 100.0, 2) AS total_value
        FROM x GROUP BY ws ORDER BY ws
    """,
    "range_join_ship_activity": """
        SELECT o_orderkey, count(*) AS n_shipped
        FROM orders o JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o_orderkey ORDER BY o_orderkey
    """,
    "dist_join_priority_revenue": """
        SELECT o_orderpriority, count(*) AS n_items,
               round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                              AS BIGINT)) / 100.0, 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "graph_degree_stats": """
        WITH s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        e AS (
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS w
            FROM s a JOIN s b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            GROUP BY s1, s2
        ), n AS (
            SELECT s1 AS node, w FROM e UNION ALL SELECT s2 AS node, w FROM e
        )
        SELECT node, count(*) AS degree,
               CAST(sum(w) AS BIGINT) AS weighted_degree
        FROM n GROUP BY node
        ORDER BY weighted_degree DESC, node LIMIT 20
    """,
    "weighted_vote_resolution": """
        WITH v AS (
            SELECT o_custkey, o_orderpriority,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey, o_orderpriority
        ), r AS (
            SELECT o_custkey, o_orderpriority, cents,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY cents DESC, o_orderpriority)
                       AS rn
            FROM v
        )
        SELECT o_custkey, o_orderpriority AS best_priority,
               round(cents / 100.0, 2) AS weight
        FROM r WHERE rn = 1 ORDER BY o_custkey
    """,
    "consolidate_winners": """
        WITH r AS (
            SELECT s_nationkey, s_suppkey,
                   row_number() OVER (PARTITION BY s_nationkey
                                      ORDER BY s_acctbal DESC, s_suppkey)
                       AS rn
            FROM supplier
        ), a AS (
            SELECT s_nationkey, count(*) AS n_members,
                   sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS cents
            FROM supplier GROUP BY s_nationkey
        )
        SELECT r.s_nationkey, r.s_suppkey AS winner_suppkey,
               a.n_members, round(a.cents / 100.0, 2) AS total_bal
        FROM r JOIN a USING (s_nationkey)
        WHERE rn = 1 ORDER BY s_nationkey
    """,
    "evidence_flags": """
        SELECT o_custkey, count(*) AS n_orders,
               max(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END) = 1
                   AS has_high_value,
               max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   = 1 AS has_urgent
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    "supplier_cograph": """
        WITH s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS w
        FROM s a JOIN s b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY s1, s2 ORDER BY s1, s2
    """,
    "pii_anonymize_customers": """
        SELECT c_custkey,
               'LGPD-' || substr(sha256('horizon-lgpd-salt:' || c_name), 1, 16)
                   AS anon_id
        FROM customer ORDER BY c_custkey
    """,
    "hash_join_revenue": """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "top_suppliers": """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 5
    """,
    "nested_customer_mart": """
        SELECT c_nationkey,
               count(*) AS n_customers,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                   AS segments,
               array_to_string(
                   (list(c_name ORDER BY c_acctbal DESC, c_custkey))[1:3],
                   '|') AS top_customers
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "year_expansion_mart": """
        WITH spans AS (
            SELECT o_custkey, min(year(o_orderdate)) AS y0,
                   max(year(o_orderdate)) AS y1
            FROM orders GROUP BY o_custkey
        ), expanded AS (
            SELECT unnest(range(y0, y1 + 1)) AS year FROM spans
        )
        SELECT year, count(*) AS active_customers
        FROM expanded GROUP BY year ORDER BY year
    """,
    "disambiguate_titles": """
        WITH r AS (
            SELECT p_partkey, p_name,
                   row_number() OVER (PARTITION BY p_name
                                      ORDER BY p_partkey) AS rn
            FROM part
        )
        SELECT p_partkey,
               CASE WHEN rn = 1 THEN p_name
                    ELSE p_name || ' (' || CAST(rn AS VARCHAR) || ')' END
                   AS title
        FROM r ORDER BY p_partkey
    """,
    "connected_components": """
        WITH RECURSIVE s AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e AS (
            SELECT a.l_partkey AS s1, b.l_partkey AS s2
            FROM s a JOIN s b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY s1, s2 HAVING count(*) >= 2
        ), es AS (
            SELECT s1 AS a, s2 AS b FROM e
            UNION ALL SELECT s2, s1 FROM e
        ), nodes AS (
            SELECT DISTINCT p_partkey AS node FROM part
        ), wr(node, reach) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT wr.node, es.b FROM wr JOIN es ON wr.reach = es.a
        ), comp AS (
            SELECT node, min(reach) AS component FROM wr GROUP BY node
        ), deg AS (
            SELECT a AS node, count(*) AS degree FROM es GROUP BY a
        )
        SELECT c.node, c.component,
               coalesce(d.degree, 0) AS degree
        FROM comp c LEFT JOIN deg d USING (node)
        ORDER BY c.node
    """,
    "entity_resolution_cascade": """
        WITH reg AS (
            SELECT c_custkey AS rid, c_name || ' ' || c_mktsegment AS rname
            FROM customer
        ), inc AS (
            SELECT c_custkey + 100000 AS incoming_id,
                   c_name || ' ' || c_mktsegment AS name
            FROM customer WHERE c_custkey < 40
            UNION ALL
            SELECT c_custkey + 500000, c_name || ' ' || c_mktsegment
            FROM customer WHERE c_custkey < 20
            UNION ALL
            SELECT c_custkey + 200000, upper(c_name || ' ' || c_mktsegment)
            FROM customer WHERE c_custkey >= 40 AND c_custkey < 80
            UNION ALL
            SELECT c_custkey + 300000, c_name || ' x ' || c_mktsegment
            FROM customer WHERE c_custkey >= 80 AND c_custkey < 120
            UNION ALL
            SELECT c_custkey + 400000,
                   'zz unknown ' || CAST(c_custkey AS VARCHAR)
            FROM customer WHERE c_custkey >= 120 AND c_custkey < 140
        ), regn AS (
            SELECT rid, rname,
                   trim(regexp_replace(lower(rname), '[^a-z0-9]+', ' ', 'g'))
                       AS rnorm
            FROM reg
        ), regt AS (
            SELECT rid, rname, rnorm,
                   array_to_string(list_sort(string_split(rnorm, ' ')), ' ')
                       AS rtsort,
                   string_split(rnorm, ' ')[1] || '|' ||
                   string_split(rnorm, ' ')[-1] AS rblock
            FROM regn
        ), incn AS (
            SELECT incoming_id, name,
                   trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g'))
                       AS inorm
            FROM inc
        ), inct AS (
            SELECT incoming_id, name, inorm,
                   array_to_string(list_sort(string_split(inorm, ' ')), ' ')
                       AS itsort,
                   string_split(inorm, ' ')[1] || '|' ||
                   string_split(inorm, ' ')[-1] AS iblock
            FROM incn
        ), raw_t AS (
            SELECT rname, min(rid) AS rid FROM reg GROUP BY rname
        ), norm_t AS (
            SELECT rnorm, min(rid) AS rid FROM regn GROUP BY rnorm
        ), fuzzy_t AS (
            SELECT incoming_id, rid, ratio FROM (
                SELECT i.incoming_id, r.rid,
                       CAST(floor(100 * (1 - levenshtein(i.itsort, r.rtsort)
                            * 1.0 / greatest(length(i.itsort),
                                             length(r.rtsort), 1)) + 0.5)
                            AS BIGINT) AS ratio,
                       row_number() OVER (PARTITION BY i.incoming_id
                                          ORDER BY CAST(floor(100 * (1 -
                                            levenshtein(i.itsort, r.rtsort)
                                            * 1.0 / greatest(length(i.itsort),
                                              length(r.rtsort), 1)) + 0.5)
                                            AS BIGINT) DESC, r.rid) AS rn
                FROM inct i JOIN regt r ON i.iblock = r.rblock
                WHERE floor(100 * (1 - levenshtein(i.itsort, r.rtsort) * 1.0 /
                      greatest(length(i.itsort), length(r.rtsort), 1)) + 0.5)
                      >= 90
            ) WHERE rn = 1
        ), cascade AS (
            SELECT i.incoming_id,
                   coalesce(rt.rid, nt.rid, ft.rid, -1) AS matched_id,
                   CASE WHEN rt.rid IS NOT NULL THEN 'raw'
                        WHEN nt.rid IS NOT NULL THEN 'normalized'
                        WHEN ft.rid IS NOT NULL THEN 'fuzzy'
                        ELSE 'none' END AS tier,
                   CASE WHEN rt.rid IS NOT NULL OR nt.rid IS NOT NULL THEN 100
                        WHEN ft.rid IS NOT NULL THEN ft.ratio
                        ELSE 0 END AS score
            FROM inct i
            LEFT JOIN raw_t rt ON i.name = rt.rname
            LEFT JOIN norm_t nt ON i.inorm = nt.rnorm
            LEFT JOIN fuzzy_t ft ON i.incoming_id = ft.incoming_id
        )
        SELECT incoming_id, matched_id, tier, score,
               (matched_id >= 0 AND
                row_number() OVER (PARTITION BY matched_id
                                   ORDER BY score DESC, incoming_id) = 1)
                   AS won
        FROM cascade ORDER BY incoming_id
    """,
    "cdc_lww_lineitem": """
        WITH ev AS (
            SELECT l_partkey, l_suppkey,
                   l_orderkey * 8 + l_linenumber AS seq,
                   CASE WHEN l_returnflag = 'R' THEN 'delete' ELSE 'update' END AS op,
                   l_quantity, l_extendedprice
            FROM lineitem
        )
        SELECT l_partkey, l_suppkey, seq, l_quantity, l_extendedprice
        FROM ev
        QUALIFY row_number() OVER (PARTITION BY l_partkey, l_suppkey ORDER BY seq DESC) = 1
          AND op <> 'delete'
        ORDER BY l_partkey, l_suppkey
    """,
}

# the forced-distributed labeler computes the same result as the routed query
ORACLE_SQL["connected_components_labelprop"] = ORACLE_SQL["connected_components"]

ORACLE_SQL["consolidate_repoint_links"] = """
    WITH m AS (
        SELECT s_suppkey, (s_suppkey // 4) * 4 AS winner
        FROM supplier
    ), r AS (
        SELECT l.l_orderkey, m.winner AS supplier
        FROM lineitem l JOIN m ON l.l_suppkey = m.s_suppkey
    )
    SELECT supplier,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_link_rows
    FROM r GROUP BY supplier ORDER BY supplier
"""

ORACLE_SQL["classify_customers"] = """
    WITH agg AS (
        SELECT o_custkey, count(*) AS n_orders,
               max(o_totalprice) AS max_price,
               sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS n_urgent
        FROM orders GROUP BY o_custkey
    ), j AS (
        SELECT c_custkey, c_acctbal,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(max_price, 0.0) AS max_price,
               coalesce(n_urgent, 0) AS n_urgent
        FROM customer LEFT JOIN agg ON c_custkey = o_custkey
    )
    SELECT c_custkey,
           CASE WHEN max_price > 250000.0 THEN 'key_account'
                WHEN n_orders > 0 THEN 'active'
                WHEN c_acctbal < 0.0 THEN 'delinquent'
                ELSE 'inactive' END AS category,
           CASE WHEN max_price > 250000.0 AND n_urgent > 0 THEN 'high'
                WHEN max_price > 250000.0 THEN 'medium'
                WHEN n_orders > 0 AND n_orders >= 10 THEN 'high'
                WHEN n_orders > 0 THEN 'medium'
                WHEN c_acctbal < 0.0 THEN 'medium'
                ELSE 'low' END AS confidence,
           CASE WHEN max_price <= 250000.0 AND n_orders = 0
                     AND c_acctbal < 0.0 THEN 'negative_balance_no_orders'
                WHEN max_price <= 250000.0 AND n_orders = 0
                     AND c_acctbal >= 0.0 THEN 'no_signals'
                ELSE '' END AS note
    FROM j ORDER BY c_custkey
"""

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "parent_rollup": parent_rollup,
    "part_minmax": part_minmax,
    "lang_stats": lang_stats,
    "dup_audit": dup_audit,
    "broadcast_region_join": broadcast_region_join,
    "q3_top_orders": q3_top_orders,
    "anti_join_customers": anti_join_customers,
    "union_counts": union_counts,
    "top_event_users": top_event_users,
    "filter_orders": filter_orders,
    "events_window": events_window,
    "events_sliding_window": events_sliding_window,
    "sessionize_events": sessionize_events,
    "topk_per_group": topk_per_group,
    "lww_latest_event": lww_latest_event,
    "cdc_lww_lineitem": cdc_lww_lineitem,
    "pii_anonymize_customers": pii_anonymize_customers,
    "hash_join_revenue": hash_join_revenue,
    "top_suppliers": top_suppliers,
    "supplier_cograph": supplier_cograph,
    "asof_purchase_attribution": asof_purchase_attribution,
    "range_join_ship_activity": range_join_ship_activity,
    "dist_join_priority_revenue": dist_join_priority_revenue,
    "graph_degree_stats": graph_degree_stats,
    "connected_components": connected_components,
    "connected_components_labelprop": connected_components_labelprop,
    "classify_customers": classify_customers,
    "nested_customer_mart": nested_customer_mart,
    "year_expansion_mart": year_expansion_mart,
    "disambiguate_titles": disambiguate_titles,
    "entity_resolution_cascade": entity_resolution_cascade,
    "weighted_vote_resolution": weighted_vote_resolution,
    "consolidate_winners": consolidate_winners,
    "consolidate_repoint_links": consolidate_repoint_links,
    "evidence_flags": evidence_flags,
}
