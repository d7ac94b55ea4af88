"""Deduplication operators for training-data pipelines, Ray-Data-first.

Exact dedup mirrors the reference's seen-set first-wins dedup
(/root/reference/src/flows/lattes/projects.py:201-209) and the payload-hash
UNIQUE (/root/reference/src/tracking/entities/source_record.py:10-17); the
near-dup family generalizes its fuzzy person dedup with blocking
(/root/reference/src/core/logic/person_matcher.py:161-259 — exact tiers then
fuzzy within a canonical-key block) to MinHash-LSH / SimHash banding:
hash-bucket (the "block"), then verify within bucket only.

Scale shape of every operator here:
    map_batches (vectorized signatures)  →  flat_map-style band explode
    →  groupby(bucket)                    →  verify inside the group only.
The only shuffle is the bucket groupby; signatures are fixed-width integers,
so the shuffle payload is tiny relative to the corpus.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _pair_bucket(id_a: np.ndarray, id_b: np.ndarray, P: int) -> np.ndarray:
    """Route a candidate pair to a reduce bucket (same multiplicative-hash
    family as the CDC partitioner)."""
    h = (id_a.astype(np.uint64) * np.uint64(0x9E3779B1)
         + id_b.astype(np.uint64)) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(P)).astype(np.int64)


def dedup_pairs(pairs_ds, num_buckets: int = 32):
    """Deduplicate an (id_a, id_b, ...) candidate-pair Dataset.

    One bucketed exchange + a vectorized ``drop_duplicates`` per bucket —
    replaces the per-pair ``groupby(id_a,id_b).map_groups(head(1))`` pattern
    (one Python call per pair group: millions of tiny groups at scale).
    Duplicate pairs from different LSH bands carry identical payload columns,
    so keeping any copy is correct.
    """

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pb"] = _pair_bucket(df["id_a"].to_numpy(), df["id_b"].to_numpy(),
                                 num_buckets)
        return df

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"]).drop(columns=["_pb"])

    return (pairs_ds.map_batches(route, batch_format="pandas")  # pandas: bucket-route column attach
            .groupby("_pb").map_groups(uniq, batch_format="pandas"))

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_column: str = "text",
                     out_column: str = "content_hash") -> pa.Table:
    """Vectorized-ish sha256 content hash column (the exact-dup key)."""
    from .hashing import sha256_column

    if out_column in batch.column_names:
        batch = batch.drop_columns([out_column])
    return batch.append_column(out_column, sha256_column(batch[text_column]))


# Measured crossover for the winner election (same warm session, round 5):
# flat Dataset.groupby.min wins at toy cardinality (0.54 s vs 0.85 s at 5k
# distinct, 0.70 vs 1.42 at 500) because the bucketed route pays a fixed
# partial-pass + 64-bucket exchange; bucketed wins 7x at 1M distinct
# (1.73 s vs 12.0 s — the ~35 us/group sort-agg overhead, see bucketed.py).
# Breakeven ~= 35 us x N = bucketed's fixed ~1 s -> N* ~ 3e4..6e4.
_FLAT_ELECTION_MAX_ROWS = 50_000


def exact_dedup(ds, text_column: str = "text", id_column: str = "doc_id",
                broadcast_threshold: int = 1_000_000, num_partitions: int = 32,
                keep_hash: bool = False, election: str = "auto",
                approx_rows: int | None = None):
    """Keep the minimum-id row per exact content hash.

    hash in map_batches → groupby(hash) shipping ONLY (hash, id) pairs (the
    payload never moves through the winner election) → semi-join survivors
    back onto the corpus:

      - ≤ ``broadcast_threshold`` winners: broadcast the sorted id array once
        (``ray.put``) and filter per batch — one shuffle total. The filter
        keys on the ID alone, so the output pass reads ``ds`` directly and
        SKIPS a second content-hash sweep over the corpus (the hash is an
        internal detail; pass ``keep_hash=True`` to get it back, at the cost
        of re-hashing the output pass).
      - above it: **distributed semi-join** — ``Dataset.join`` of the corpus
        with the winner (hash, min_id) table on the hash, then an equality
        filter, so nothing ever materializes on the driver (at 10^10 docs the
        id set alone would be ~80 GB). Here the output pass re-hashes by
        construction (the join needs the key on both sides).

    ``election`` picks the winner-election reduce: ``"bucketed"`` (the
    two-level bucketed reduce — the scale default), ``"flat"`` (the builtin
    ``groupby(hash).min``), or ``"auto"``: flat when ``approx_rows`` — a
    caller-supplied upper bound on distinct hashes, e.g. the table's parquet
    metadata row count — is ≤ ``_FLAT_ELECTION_MAX_ROWS``, else bucketed.
    With no hint auto stays bucketed: guessing small and being wrong costs
    ~35 µs/group (12 s at 1M groups); guessing big and being wrong costs a
    fixed ~0.5 s.
    """
    import ray
    import ray.data as rd  # noqa: F401

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_column), batch_format="pyarrow"
    )
    # the exchange ships only (hash, id) pairs — at scale via the TWO-LEVEL
    # bucketed reduce (per-block partial mins routed by hash(content_hash)
    # % B, one vectorized pandas min per physical bucket; flat builtin
    # measured 21.7 s vs 1.05 s at 1M distinct hashes), at toy cardinality
    # via the flat builtin (crossover note above _FLAT_ELECTION_MAX_ROWS).
    from .bucketed import bucketed_groupby_agg

    if election not in ("auto", "flat", "bucketed"):
        raise ValueError(f"unknown election strategy {election!r}")
    use_flat = election == "flat" or (
        election == "auto" and approx_rows is not None
        and approx_rows <= _FLAT_ELECTION_MAX_ROWS)

    minname = f"min({id_column})"
    pairs = hashed.select_columns(["content_hash", id_column])
    if use_flat:
        winners = pairs.groupby("content_hash").min(id_column).materialize()
    else:
        winners = bucketed_groupby_agg(
            pairs, "content_hash", {minname: (id_column, "min")}).materialize()

    if winners.count() <= broadcast_threshold:
        keep_ids = set(r[minname] for r in winners.take_all())
        keep_ref = ray.put(np.array(sorted(keep_ids), dtype=np.int64))

        def keep_only(t: pa.Table) -> pa.Table:
            keep = ray.get(keep_ref)
            ids = t[id_column].to_numpy(zero_copy_only=False)
            mask = np.isin(ids, keep)
            return t.filter(pa.array(mask))

        return (hashed if keep_hash else ds).map_batches(
            keep_only, batch_format="pyarrow")

    # distributed path: hash-shuffle join, equality filter, drop helper cols.
    # Join partitions are capped at 2×cluster CPUs: Dataset.join spawns one
    # HashShuffleAggregator actor per partition and a pool far wider than the
    # cluster deadlocks it (observed: 32 partitions on 4 CPUs).
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = max(2, min(num_partitions, 2 * cpus))
    wtab = winners.map_batches(
        lambda t: pa.table({"_h": t["content_hash"], "_min_id": t[minname]}),
        batch_format="pyarrow",
    )
    joined = hashed.join(
        wtab, join_type="inner", num_partitions=nparts,
        on=("content_hash",), right_on=("_h",),
    )

    def keep_winner(t: pa.Table) -> pa.Table:
        mask = pc.equal(t[id_column], t["_min_id"])
        drop = ["_min_id", "_h"] if keep_hash else ["_min_id", "_h",
                                                    "content_hash"]
        return t.filter(mask).drop_columns(
            [c for c in drop if c in t.column_names])

    return joined.map_batches(keep_winner, batch_format="pyarrow")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------


def _shingles(text: str, k: int = 5) -> set[bytes]:
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return {(" ".join(words)).encode()} if words else set()
    return {(" ".join(words[i : i + k])).encode() for i in range(len(words) - k + 1)}


class MinHasher:
    """Per-actor state: the permutation parameters (built once per actor —
    T1-style stateful stage)."""

    def __init__(self, num_perm: int = 64, seed: int = 42, k_shingle: int = 5):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.k_shingle = k_shingle
        mersenne = (1 << 61) - 1
        self.a = rng.integers(1, mersenne, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, mersenne, size=num_perm, dtype=np.uint64)
        self.mod = np.uint64(mersenne)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k_shingle)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        base = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big") for s in sh),
            dtype=np.uint64,
            count=len(sh),
        )
        # (a*x + b) % p for all perms × shingles, min over shingles
        prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.mod
        return prod.min(axis=1)


class MinHashStage:
    """map_batches actor stage: adds band-bucket ids per document."""

    def __init__(self, num_perm=64, bands=16, seed=42, k_shingle=5,
                 text_column="text", id_column="doc_id"):
        assert num_perm % bands == 0
        self.hasher = MinHasher(num_perm, seed, k_shingle)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [self.hasher.signature(t) for t in batch[self.text_column].fillna("")]
        )
        n = len(batch)
        out_id = np.repeat(batch[self.id_column].to_numpy(), self.bands)
        band_id = np.tile(np.arange(self.bands), n)
        grouped = sigs.reshape(n, self.bands, self.rows_per_band)
        # int64 bucket ids (blake2b-8 of the band slice): fixed-width shuffle
        # payload instead of a 16-char hex string per row
        bucket = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b(grouped[i, b].tobytes(),
                                digest_size=8).digest(), "big")
             for i in range(n) for b in range(self.bands)),
            dtype=np.uint64, count=n * self.bands).view(np.int64)
        return pd.DataFrame(
            {self.id_column: out_id, "band_id": band_id, "bucket": bucket}
        )


def minhash_lsh_groups(ds, text_column="text", id_column="doc_id",
                       num_perm=64, bands=16, seed=42, k_shingle=5,
                       concurrency=4, max_bucket=256, num_buckets=32):
    """shingle → minhash → band-bucket explode → coarse-bucket co-shuffle →
    per-(band,bucket) candidate pairs. Returns a Dataset of (id_a, id_b)
    candidate pairs (id_a < id_b), deduplicated.

    The exchange routes rows by ``hash(band, bucket) % num_buckets`` so the
    Ray groupby sees ~num_buckets groups (one vectorized pandas call each),
    not one Python ``map_groups`` dispatch per LSH bucket — with n·bands
    exploded rows the distinct (band, bucket) count approaches n·bands and
    per-group dispatch dominates otherwise (measured 36 s → 23 s on the
    sf0.1 near-dup query, remainder is the verify co-shuffles' fixed
    exchange cost; same fix as simhash_candidates).

    ``max_bucket`` caps pair expansion per bucket (standard LSH hot-bucket
    guard): a bucket with B > max_bucket members would emit O(B²) pairs —
    such buckets are low-signal (a band colliding for a large fraction of
    the corpus carries no near-dup evidence) and are truncated to the
    max_bucket smallest ids, keeping the shuffle bounded at scale."""

    exploded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, seed=seed, k_shingle=k_shingle,
            text_column=text_column, id_column=id_column,
        ),
        batch_format="pandas",  # pandas: band explode emits new frame
        concurrency=concurrency,
    )

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = _pair_bucket(df["band_id"].to_numpy(),
                                 df["bucket"].to_numpy(), num_buckets)
        return df

    def pairs_in_buckets(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in g.groupby(["band_id", "bucket"], sort=False):
            ids = np.unique(sub[id_column].to_numpy())[:max_bucket]
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            frames.append(pd.DataFrame({"id_a": ids[a], "id_b": ids[b]}))
        if not frames:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pairs = (exploded.map_batches(route, batch_format="pandas")  # pandas: bucket-route column attach
             .groupby("_cb")
             .map_groups(pairs_in_buckets, batch_format="pandas"))
    return dedup_pairs(pairs, num_buckets=num_buckets)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def attach_doc_column(pairs_ds, docs_ds, key_col: str, carry_cols: list[str],
                      out_col: str, id_column: str = "doc_id",
                      text_column: str = "text", num_buckets: int = 32,
                      carry_dtypes: dict[str, str] | None = None):
    """Bucketed hash-join: attach ``docs[text_column]`` to each pair row by
    ``pairs[key_col] == docs[id_column]``.

    Both sides are tagged and co-shuffled ONCE on ``hash(key) % num_buckets``
    (the union-tag co-shuffle recipe of functions/asof.py); inside each
    bucket a vectorized pandas merge does the lookup. Nothing materializes on
    the driver — this is the 100-TB-safe replacement for broadcasting a
    whole-corpus text dict. Placeholder dtypes for the docs-side rows come
    from the ACTUAL pairs-side column types (never a name convention):
    pass ``carry_dtypes`` (col → 'int'|'float'|'bool'|'str') when known, else
    they are read from ``pairs_ds.schema()`` (which may execute the upstream
    plan's first block — prefer the explicit map on derived pipelines)."""
    _FILLS = {"int": (np.int64, 0), "float": (np.float64, 0.0),
              "bool": (np.bool_, False), "str": (object, "")}
    spec: dict[str, tuple[object, object]] = {}
    if carry_dtypes is not None:
        for c in carry_cols:
            spec[c] = _FILLS[carry_dtypes[c]]
    else:
        import pyarrow as _pa

        pschema = pairs_ds.schema().base_schema
        for c in carry_cols:
            t = pschema.field(c).type
            if _pa.types.is_integer(t):
                spec[c] = _FILLS["int"]
            elif _pa.types.is_floating(t):
                spec[c] = _FILLS["float"]
            elif _pa.types.is_boolean(t):
                spec[c] = _FILLS["bool"]
            else:
                spec[c] = _FILLS["str"]

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[carry_cols].copy()
        out["_k"] = df[key_col].to_numpy(dtype=np.int64)
        out["_v"] = ""
        out["_side"] = np.int8(0)
        out["_jb"] = _pair_bucket(out["_k"].to_numpy(),
                                  np.zeros(len(out), dtype=np.int64),
                                  num_buckets)
        return out

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = pd.DataFrame(index=range(n))
        for c in carry_cols:  # typed placeholders so the union schema unifies
            dtype, fill = spec[c]
            out[c] = np.full(n, fill, dtype=dtype)
        out["_k"] = df[id_column].to_numpy(dtype=np.int64)
        out["_v"] = df[text_column].fillna("").to_numpy()
        out["_side"] = np.int8(1)
        out["_jb"] = _pair_bucket(out["_k"].to_numpy(),
                                  np.zeros(n, dtype=np.int64),
                                  num_buckets)
        return out

    left = pairs_ds.map_batches(tag_pairs, batch_format="pandas")  # pandas: tagged-union frame for the bucketed co-shuffle
    right = docs_ds.map_batches(tag_docs, batch_format="pandas")  # pandas: tagged-union frame for the bucketed co-shuffle

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lp = g[g["_side"] == 0][carry_cols + ["_k"]]
        if len(lp) == 0:  # typed empty frame (object cols confuse sizing)
            out = pd.DataFrame({
                c: np.array([], dtype=spec[c][0]) for c in carry_cols})
            out[out_col] = np.array([], dtype=str)
            return out
        rp = (g[g["_side"] == 1][["_k", "_v"]]
              .drop_duplicates(subset=["_k"]))
        m = lp.merge(rp, on="_k", how="left")
        out = m[carry_cols].copy()
        out[out_col] = m["_v"].fillna("")
        return out

    return left.union(right).groupby("_jb").map_groups(
        merge, batch_format="pandas")  # pandas: per-bucket vectorized merge


def anti_filter(ds, bad_ids_ds, id_column: str = "doc_id",
                bad_id_column: str = "id_b", num_buckets: int = 32):
    """Distributed anti-semi-join: drop rows of ``ds`` whose ``id_column``
    value appears in ``bad_ids_ds[bad_id_column]`` (int64 keys).

    This replaces ``Dataset.join(join_type="left_anti")`` when the bad-id
    side is SPARSE: Ray's hash-shuffle join materializes each right
    partition with an ArrowBlockBuilder, and a partition that received zero
    rows builds a schema-less empty table, so the per-partition pyarrow join
    dies with ``No match ... FieldRef.Name(<key>)`` whenever
    ``len(bad_ids) < num_partitions``-ish (observed on ray 2.49.2: 21 loser
    ids over 8 partitions). The union-tag bucket co-shuffle below has no
    empty-partition failure mode, does ONE exchange, ships only (id, tag)
    for the bad side, and needs no join aggregator actor pool.
    """
    schema = ds.schema().base_schema
    _FILLS = {"int": (np.int64, 0), "float": (np.float64, 0.0),
              "bool": (np.bool_, False), "str": (object, "")}
    spec: dict[str, tuple[object, object]] = {}
    for f in schema:
        if pa.types.is_integer(f.type):
            spec[f.name] = _FILLS["int"]
        elif pa.types.is_floating(f.type):
            spec[f.name] = _FILLS["float"]
        elif pa.types.is_boolean(f.type):
            spec[f.name] = _FILLS["bool"]
        else:
            spec[f.name] = _FILLS["str"]
    cols = list(schema.names)

    def tag_keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_side"] = np.int8(0)
        df["_ab"] = _pair_bucket(df[id_column].to_numpy(dtype=np.int64),
                                 np.zeros(len(df), dtype=np.int64),
                                 num_buckets)
        return df

    def tag_bad(df: pd.DataFrame) -> pd.DataFrame:
        # schema-less zero-row blocks can arrive without the key column
        ids = (df[bad_id_column].to_numpy(dtype=np.int64)
               if bad_id_column in df.columns
               else np.array([], dtype=np.int64))
        n = len(ids)
        out = pd.DataFrame(index=range(n))
        for c in cols:  # typed placeholders so the union schema unifies
            dtype, fill = spec[c]
            out[c] = np.full(n, fill, dtype=dtype)
        out[id_column] = ids
        out["_side"] = np.int8(1)
        out["_ab"] = _pair_bucket(ids, np.zeros(n, dtype=np.int64),
                                  num_buckets)
        return out

    keep = ds.map_batches(tag_keep, batch_format="pandas")  # pandas: tagged-union frame for the bucketed anti-join
    bad = bad_ids_ds.map_batches(tag_bad, batch_format="pandas")  # pandas: tagged-union frame for the bucketed anti-join

    def drop_bad(g: pd.DataFrame) -> pd.DataFrame:
        bad_ids = g.loc[g["_side"] == 1, id_column].unique()
        kept = g[(g["_side"] == 0) & (~g[id_column].isin(bad_ids))]
        return kept.drop(columns=["_side", "_ab"])

    return keep.union(bad).groupby("_ab").map_groups(
        drop_bad, batch_format="pandas")  # pandas: per-bucket anti-join reduce


def verify_pairs_jaccard(pairs_ds, docs_ds, threshold=0.8, text_column="text",
                         id_column="doc_id", k_shingle=5, num_buckets=32):
    """Verify candidate pairs with true n-gram Jaccard.

    Scale-safe: the pair→text lookup is TWO bucketed hash-joins (one per pair
    endpoint) via ``attach_doc_column`` — the corpus streams through the
    co-shuffles, never onto the driver (pattern precedent: the blocked fuzzy
    scan of /root/reference/src/core/logic/person_matcher.py:161-259 — score
    only within a co-located block). The per-pair set-intersection kernel is
    inherently per-row Python; it runs distributed, O(candidate pairs)."""
    docs = docs_ds.select_columns([id_column, text_column])
    with_a = attach_doc_column(
        pairs_ds, docs, key_col="id_a", carry_cols=["id_a", "id_b"],
        out_col="_ta", id_column=id_column, text_column=text_column,
        num_buckets=num_buckets, carry_dtypes={"id_a": "int", "id_b": "int"})
    with_ab = attach_doc_column(
        with_a, docs, key_col="id_b", carry_cols=["id_a", "id_b", "_ta"],
        out_col="_tb", id_column=id_column, text_column=text_column,
        num_buckets=num_buckets,
        carry_dtypes={"id_a": "int", "id_b": "int", "_ta": "str"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        sims = [
            jaccard(a, b, k_shingle)
            for a, b in zip(batch["_ta"], batch["_tb"])
        ]
        out = batch[["id_a", "id_b"]].copy()
        out["jaccard"] = np.array(sims, dtype=np.float64)
        return out[out["jaccard"] >= threshold]

    return with_ab.map_batches(verify, batch_format="pandas")  # pandas: pair-verify str kernel


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup (prefix filtering — exact, no false negatives)
# --------------------------------------------------------------------------


class ShinglePrefixStage:
    """Actor-pool stage: document → prefix-filter candidate rows
    ``(shingle hash, doc id)``.

    Prefix filtering (public algorithm: Bayardo, Ma & Srikant, "Scaling Up
    All Pairs Similarity Search", WWW'07; Chaudhuri et al.'s SSJoin): impose
    a global total order on shingles (here: the 64-bit shingle hash value),
    sort each document's distinct shingles by it, and emit only the first
    ``p = |S| - ceil(t·|S|) + 1`` of them. Any pair with Jaccard ≥ t must
    share at least one shingle inside BOTH prefixes, so grouping by emitted
    shingle generates an EXACT candidate set (no false negatives) while
    shipping only a (1-t)-fraction of each document's shingle set — at
    t=0.8 the exchange carries ~20% of the shingle rows a naive
    inverted-index join would.

    Same tokenization/hash family as ``MinHasher`` (word k-grams of
    ``\\w+``-lowercase tokens; blake2b-8 hashes) so ``verify_pairs_jaccard``
    verifies candidates under the identical shingle definition — required
    for the exactness argument to carry through to the final output."""

    def __init__(self, threshold: float = 0.5, k_shingle: int = 5,
                 text_column: str = "text", id_column: str = "doc_id"):
        assert 0.0 < threshold <= 1.0
        self.threshold = threshold
        self.k_shingle = k_shingle
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids_out: list[int] = []
        sh_out: list[np.ndarray] = []
        for doc_id, text in zip(batch[self.id_column],
                                batch[self.text_column].fillna("")):
            sh = _shingles(text, self.k_shingle)
            if not sh:
                continue  # no shingles → can't reach t>0 with anything
            hs = np.fromiter(
                (int.from_bytes(
                    hashlib.blake2b(s, digest_size=8).digest(), "big")
                 for s in sh),
                dtype=np.uint64, count=len(sh))
            hs.sort()
            p = len(hs) - int(np.ceil(self.threshold * len(hs))) + 1
            ids_out.append(np.full(p, doc_id, dtype=np.int64))
            sh_out.append(hs[:p])
        if not ids_out:
            return pd.DataFrame({"_id": pd.Series([], dtype="int64"),
                                 "_sh": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "_id": np.concatenate(ids_out),
            # int64 view keeps the exchange payload a plain Arrow int column
            "_sh": np.concatenate(sh_out).view(np.int64),
        })


def ngram_jaccard_pairs(ds, text_column="text", id_column="doc_id",
                        threshold=0.5, k_shingle=5, concurrency=(1, 4),
                        max_bucket=256, num_buckets=32):
    """All pairs with n-gram Jaccard ≥ ``threshold`` — exact (equal to the
    brute-force all-pairs scan), via prefix filtering:

      1. per-doc shingle prefix explode (actor pool; ships (hash, id) rows
         only — never text),
      2. coarse-bucket co-shuffle on ``hash(shingle) % num_buckets`` (one
         vectorized group call per physical bucket, not per shingle),
      3. per-shingle candidate pairs (``max_bucket`` hot-shingle guard: a
         shingle shared by >max_bucket docs is a stop-gram carrying no
         near-dup signal — truncated, documented scale knob),
      4. bucketed pair dedup, then exact Jaccard verify via the two
         bucketed text co-shuffles of ``verify_pairs_jaccard``.

    Complements MinHash-LSH: same output contract, but deterministic and
    exact at the cost of a larger candidate exchange for loose thresholds —
    the right tool when the dedup policy must be auditable (no probabilistic
    misses)."""
    prefixes = ds.map_batches(
        ShinglePrefixStage,
        fn_constructor_kwargs=dict(
            threshold=threshold, k_shingle=k_shingle,
            text_column=text_column, id_column=id_column),
        batch_format="pandas",  # pandas: prefix explode emits new frame
        concurrency=concurrency,
    )

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = _pair_bucket(df["_sh"].to_numpy(),
                                 np.zeros(len(df), dtype=np.int64),
                                 num_buckets)
        return df

    def pairs_in_buckets(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized pair expansion (was a per-shingle Python loop —
        # the measured hot stage of the operator): sort by (shingle, id),
        # derive per-shingle segments, cap each at max_bucket, then emit
        # every within-segment (a < b) pair with repeat/cumsum arithmetic
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        sub = g[["_sh", "_id"]].drop_duplicates().sort_values(["_sh", "_id"])
        sh = sub["_sh"].to_numpy()
        ids = sub["_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return empty
        new = np.concatenate(([True], sh[1:] != sh[:-1]))
        starts = np.flatnonzero(new)
        seg_of = np.cumsum(new) - 1
        rank = np.arange(len(ids)) - starts[seg_of]
        if (rank >= max_bucket).any():  # hot-shingle cap (stop-grams)
            keep = rank < max_bucket
            ids, seg_raw = ids[keep], seg_of[keep]
            new = np.concatenate(([True], seg_raw[1:] != seg_raw[:-1]))
            starts = np.flatnonzero(new)
            seg_of = np.cumsum(new) - 1
            rank = np.arange(len(ids)) - starts[seg_of]
        lens = np.diff(np.append(starts, len(ids)))
        counts = lens[seg_of] - 1 - rank  # per-element partner count
        total = int(counts.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(len(ids)), counts)
        excl = np.concatenate(([0], np.cumsum(counts)))[:-1]
        b_idx = a_idx + 1 + (np.arange(total) - np.repeat(excl, counts))
        return pd.DataFrame({"id_a": ids[a_idx], "id_b": ids[b_idx]})

    cands = dedup_pairs(
        (prefixes.map_batches(route, batch_format="pandas")  # pandas: bucket-route column attach
         .groupby("_cb").map_groups(pairs_in_buckets, batch_format="pandas")),
        num_buckets=num_buckets)
    return verify_pairs_jaccard(cands, ds, threshold=threshold,
                                text_column=text_column, id_column=id_column,
                                k_shingle=k_shingle, num_buckets=num_buckets)


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash over word features; near-dups share most bits. Banding
    into 4×16-bit chunks gives LSH buckets: by pigeonhole, hamming ≤ 3 < 4
    chunks ⇒ at least one chunk is equal, so the candidate set is EXACT for
    the ≤3 threshold (and the DuckDB oracle can verify it end-to-end).

    The per-word hash is the first 8 bytes of md5 (big-endian) — chosen over
    blake2b because DuckDB can reproduce it in SQL
    (``('0x' || substr(md5(w), 1, 16))::UBIGINT``), making the whole operator
    oracle-checkable."""

    def __init__(self, text_column="text", id_column="doc_id", chunks=4):
        self.text_column = text_column
        self.id_column = id_column
        self.chunks = chunks

    @staticmethod
    def simhash64(text: str) -> int:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in set(words):
            h = np.uint64(
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    @staticmethod
    def simhash64_batch(texts: pd.Series) -> np.ndarray:
        """Vectorized batch variant of :meth:`simhash64`: distinct
        (doc, word) pairs are built with C-speed pandas ops, every distinct
        word is hashed once by the vectorized single-block MD5
        (functions/hashing.py:md5_head64_of_strs), and the per-doc ±1 bit
        votes reduce with one ``np.add.reduceat`` — no per-row Python."""
        from .hashing import md5_head64_of_strs

        s = texts.fillna("").str.lower()
        words = s.str.findall(_WORD_RE)
        lens = words.str.len().to_numpy(dtype=np.int64)
        n = len(s)
        sig = np.zeros(n, dtype=np.uint64)
        if not int(lens.sum()):
            return sig
        flat = np.concatenate(words.to_numpy()).astype(object, copy=False)
        d = np.repeat(np.arange(n, dtype=np.int64), lens)
        # hash-based factorize (C hashtable, no object sort), then distinct
        # (doc, word-code) pairs as one int64 dedup
        codes, uw = pd.factorize(flat)
        pair_key = d * np.int64(len(uw)) + codes
        upairs = pd.unique(pair_key)
        upairs.sort()  # doc-major: pairs of one doc are contiguous
        dd_idx = upairs // np.int64(len(uw))
        h = md5_head64_of_strs(uw)[upairs % np.int64(len(uw))]
        shifts = np.arange(64, dtype=np.uint64)
        # ±1 bit votes per pair, reduced per doc; int32 accumulators (a doc
        # would need 2^31 distinct words to overflow)
        votes = (((h[:, None] >> shifts) & np.uint64(1))
                 .astype(np.int32) * 2 - 1)
        starts = np.flatnonzero(np.concatenate(
            ([True], dd_idx[1:] != dd_idx[:-1])))
        acc = np.add.reduceat(votes, starts, axis=0)
        bits = (acc > 0).astype(np.uint64)
        sig[dd_idx[starts]] = bits @ (np.uint64(1) << shifts)
        return sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = self.simhash64_batch(batch[self.text_column])
        batch = batch[[self.id_column]].copy()
        batch["simhash"] = sig
        return batch


def simhash_candidates(ds, text_column="text", id_column="doc_id", chunks=4,
                       concurrency=4, max_bucket=256, num_buckets=32):
    """simhash per doc → explode 16-bit chunks → coarse-bucket co-shuffle →
    per-(chunk,value) candidate pairs with vectorized hamming verify.
    ``max_bucket`` caps per-bucket pair expansion (see minhash_lsh_groups).

    The exchange routes rows by ``hash(chunk_id, value) % num_buckets`` so
    the Ray groupby sees ~num_buckets groups (one vectorized pandas call
    each), not one tiny Python call per LSH bucket — at corpus scale the
    distinct (chunk, value) count approaches 4×n and per-group dispatch
    dominates otherwise."""
    sigs = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pandas",  # pandas: chunk-LSH explode emits new frame
        concurrency=concurrency,
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sig = batch["simhash"].to_numpy(dtype=np.uint64)
        out_id = np.repeat(batch[id_column].to_numpy(), chunks)
        chunk_id = np.tile(np.arange(chunks), n)
        shift = (chunk_id * (64 // chunks)).astype(np.uint64)
        value = (np.repeat(sig, chunks) >> shift) & np.uint64((1 << (64 // chunks)) - 1)
        out = pd.DataFrame(
            {id_column: out_id, "chunk_id": chunk_id,
             "value": value.astype(np.int64),
             "simhash": np.repeat(sig, chunks)}
        )
        out["_cb"] = _pair_bucket(out["chunk_id"].to_numpy(),
                                  out["value"].to_numpy(), num_buckets)
        return out

    exploded = sigs.map_batches(explode, batch_format="pandas")  # pandas: signature explode emits new frame

    def pairs_in_buckets(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in g.groupby(["chunk_id", "value"], sort=False):
            sub = (sub.drop_duplicates(subset=[id_column])
                   .sort_values(id_column).head(max_bucket))
            ids = sub[id_column].to_numpy()
            if len(ids) < 2:
                continue
            sig = sub["simhash"].to_numpy(dtype=np.uint64)
            a, b = np.triu_indices(len(ids), k=1)
            # vectorized popcount via uint8 view + unpackbits
            x = (sig[a] ^ sig[b]).view(np.uint8).reshape(-1, 8)
            ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
            frames.append(pd.DataFrame(
                {"id_a": ids[a], "id_b": ids[b], "hamming": ham}))
        if not frames:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    pairs = exploded.groupby("_cb").map_groups(
        pairs_in_buckets, batch_format="pandas"  # pandas: per-bucket pair expansion
    )
    return dedup_pairs(pairs, num_buckets=num_buckets)


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


class SignLshStage:
    """Actor-pool stage: random-hyperplane sign-bit LSH bucket ids per vector.

    Hyperplanes are seeded and built once per actor (T1-style state; lazily
    on the first batch, when the dimensionality is known). Each vector is
    exploded into ``bands`` rows of (band_id, bucket value) — two vectors at
    cosine ≥ t agree on a sign bit with prob 1 - arccos(t)/π, so a true
    near-dup pair collides in ≥1 band with probability ≈ 1 for tight
    thresholds (e.g. t=0.999, 16 bands × 8 bits: miss prob ~1e-15)."""

    def __init__(self, bands: int = 16, band_bits: int = 8, seed: int = 42,
                 id_column: str = "vec_id", vec_column: str = "embedding"):
        self.bands = bands
        self.band_bits = band_bits
        self.seed = seed
        self.id_column = id_column
        self.vec_column = vec_column
        self._planes: np.ndarray | None = None

    def _planes_for(self, dim: int) -> np.ndarray:
        if self._planes is None:
            rng = np.random.default_rng(self.seed)
            self._planes = rng.standard_normal(
                (self.bands * self.band_bits, dim))
        return self._planes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = np.stack(batch[self.vec_column].to_numpy()).astype(np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        planes = self._planes_for(v.shape[1])
        bits = (v @ planes.T) > 0  # (n, bands*band_bits)
        n = len(batch)
        weights = (1 << np.arange(self.band_bits, dtype=np.int64))
        bvals = (bits.reshape(n, self.bands, self.band_bits) @ weights)
        # ids + bucket values only: the band explode must NOT replicate the
        # vector payload ``bands``× — vectors are re-attached to candidate
        # PAIRS later via a bucketed join (each vector ships once per pair
        # endpoint, not once per band)
        return pd.DataFrame({
            "_id": np.repeat(batch[self.id_column].to_numpy(), self.bands),
            "_band": np.tile(np.arange(self.bands, dtype=np.int64), n),
            "_bval": bvals.reshape(-1).astype(np.int64),
        })


def _attach_vec(pairs_ds, vecs_ds, key_col: str, carry_int: list[str],
                carry_vec: list[str], out_col: str, id_column: str,
                vec_column: str, num_buckets: int = 32):
    """Bucketed hash-join attaching a vector column to pair rows by
    ``pairs[key_col] == vecs[id_column]`` — the vector sibling of
    ``attach_doc_column`` (union-tag co-shuffle, vectorized merge per
    bucket; nothing materializes on the driver)."""

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[carry_int + carry_vec].copy()
        out["_k"] = df[key_col].to_numpy(dtype=np.int64)
        out["_v"] = [np.zeros(0)] * len(df)
        out["_side"] = np.int8(0)
        out["_jb"] = _pair_bucket(out["_k"].to_numpy(),
                                  np.zeros(len(out), dtype=np.int64),
                                  num_buckets)
        return out

    def tag_vecs(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = pd.DataFrame(index=range(n))
        for c in carry_int:
            out[c] = np.zeros(n, dtype=np.int64)
        for c in carry_vec:
            out[c] = [np.zeros(0)] * n
        out["_k"] = df[id_column].to_numpy(dtype=np.int64)
        out["_v"] = [np.asarray(v, dtype=np.float64)
                     for v in df[vec_column]]
        out["_side"] = np.int8(1)
        out["_jb"] = _pair_bucket(out["_k"].to_numpy(),
                                  np.zeros(n, dtype=np.int64), num_buckets)
        return out

    left = pairs_ds.map_batches(tag_pairs, batch_format="pandas")  # pandas: tagged-union frame for the vector co-shuffle
    right = vecs_ds.map_batches(tag_vecs, batch_format="pandas")  # pandas: tagged-union frame for the vector co-shuffle

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lp = g[g["_side"] == 0][carry_int + carry_vec + ["_k"]]
        if len(lp) == 0:
            out = pd.DataFrame({c: np.array([], dtype=np.int64)
                                for c in carry_int})
            for c in carry_vec + [out_col]:
                out[c] = pd.Series([], dtype=object)
            return out
        rp = g[g["_side"] == 1][["_k", "_v"]].drop_duplicates(subset=["_k"])
        m = lp.merge(rp, on="_k", how="left")
        out = m[carry_int + carry_vec].copy()
        out[out_col] = m["_v"]
        return out

    return left.union(right).groupby("_jb").map_groups(
        merge, batch_format="pandas")  # pandas: per-bucket vectorized merge


def embedding_near_dups(ds, id_column="vec_id", vec_column="embedding",
                        threshold=0.95, bands=16, band_bits=8, seed=42,
                        max_bucket=1024, num_buckets=32, concurrency=(1, 4)):
    """Near-duplicate pairs by embedding cosine ≥ threshold — LSH-bucketed,
    two-phase:

      1. sign-bit LSH explode (actor pool; ids + bucket values ONLY — the
         band explode never replicates vectors) → coarse-bucket co-shuffle →
         in-bucket candidate pairs (capped at ``max_bucket`` members — the
         hot-bucket guard) → bucketed pair dedup.
      2. vectors are attached to the DEDUPED pairs via two bucketed joins
         (each vector ships once per pair endpoint) and cosine is verified
         vectorized per batch.

    No driver materialization and no corpus×corpus matmul; the vector bytes
    moved are O(pair endpoints), not O(n × bands)."""

    exploded = ds.map_batches(
        SignLshStage,
        fn_constructor_kwargs=dict(bands=bands, band_bits=band_bits, seed=seed,
                                   id_column=id_column, vec_column=vec_column),
        batch_format="pandas",  # pandas: sign-bit LSH explode
        concurrency=concurrency,
    )

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cb"] = _pair_bucket(df["_band"].to_numpy(),
                                 df["_bval"].to_numpy(), num_buckets)
        return df

    def pairs_in_buckets(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, sub in g.groupby(["_band", "_bval"], sort=False):
            ids = np.unique(sub["_id"].to_numpy())[:max_bucket]
            if len(ids) < 2:
                continue
            i, j = np.triu_indices(len(ids), k=1)
            frames.append(pd.DataFrame({"id_a": ids[i], "id_b": ids[j]}))
        if not frames:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    cands = dedup_pairs(
        (exploded.map_batches(route, batch_format="pandas")  # pandas: bucket-route column attach
         .groupby("_cb")
         .map_groups(pairs_in_buckets, batch_format="pandas")),
        num_buckets=num_buckets)

    vecs = ds.select_columns([id_column, vec_column])
    with_a = _attach_vec(cands, vecs, key_col="id_a",
                         carry_int=["id_a", "id_b"], carry_vec=[],
                         out_col="_va", id_column=id_column,
                         vec_column=vec_column, num_buckets=num_buckets)
    with_ab = _attach_vec(with_a, vecs, key_col="id_b",
                          carry_int=["id_a", "id_b"], carry_vec=["_va"],
                          out_col="_vb", id_column=id_column,
                          vec_column=vec_column, num_buckets=num_buckets)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        va = np.stack([np.asarray(v, dtype=np.float64)
                       for v in batch["_va"]])
        vb = np.stack([np.asarray(v, dtype=np.float64)
                       for v in batch["_vb"]])
        va /= np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-12)
        vb /= np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-12)
        cos = np.einsum("ij,ij->i", va, vb)
        out = batch[["id_a", "id_b"]].copy()
        out["cosine"] = cos
        return out[out["cosine"] >= threshold]

    return with_ab.map_batches(verify, batch_format="pandas")  # pandas: pair-verify cosine kernel
