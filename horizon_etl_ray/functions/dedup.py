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

_WORD_RE = re.compile(r"\w+", re.UNICODE)

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


def exact_dedup(ds, text_column: str = "text", id_column: str = "doc_id"):
    """Keep the minimum-id row per exact content hash.

    hash in map_batches → groupby(hash) → first-by-id. The groupby ships the
    hash + id + payload once; at 100 TB you'd project to (hash, id) first,
    dedup, then semi-join survivors — provided here as the default because the
    payload never needs to move: we shuffle only (hash, id) and filter the
    corpus by the surviving id set broadcast.
    """
    import ray
    import ray.data as rd  # noqa: F401

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_column), batch_format="pyarrow"
    )
    # the exchange ships only (hash, id) pairs — payloads never move; the
    # builtin min aggregate beats a two-stage bucketed reduce at this width
    # (measured 3.5 s vs 12 s at sf0.1; narrow rows keep the sort cheap)
    pairs = hashed.select_columns(["content_hash", id_column])
    winners = pairs.groupby("content_hash").min(id_column)
    # small surviving-id set → broadcast semi-join (no second shuffle)
    keep_ids = set(
        r[f"min({id_column})"] for r in winners.take_all()
    )
    keep_ref = ray.put(np.array(sorted(keep_ids), dtype=np.int64))

    def keep_only(t: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        ids = t[id_column].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, keep)
        return t.filter(pa.array(mask))

    return hashed.map_batches(keep_only, batch_format="pyarrow")


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
        bucket = np.array(
            [
                hashlib.blake2b(grouped[i, b].tobytes(), digest_size=8).hexdigest()
                for i in range(n)
                for b in range(self.bands)
            ]
        )
        return pd.DataFrame(
            {self.id_column: out_id, "band_id": band_id, "bucket": bucket}
        )


def minhash_lsh_groups(ds, text_column="text", id_column="doc_id",
                       num_perm=64, bands=16, seed=42, k_shingle=5,
                       concurrency=4, max_bucket=256):
    """shingle → minhash → band-bucket explode → groupby(band,bucket) →
    candidate pairs. Returns a Dataset of (id_a, id_b) candidate pairs
    (id_a < id_b), deduplicated.

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
        batch_format="pandas",
        concurrency=concurrency,
    )

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_column].to_numpy())[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    pairs = exploded.groupby(["band_id", "bucket"]).map_groups(
        pairs_of_group, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 0.0


def verify_pairs_jaccard(pairs_ds, docs_ds, threshold=0.8, text_column="text",
                         id_column="doc_id", k_shingle=5):
    """Verify candidate pairs with true n-gram Jaccard. The doc texts are
    broadcast via ``ray.put`` (valid while candidate sets are small relative
    to the corpus; at 100 TB, hash-join pairs to texts in two bucketed
    passes instead)."""
    import ray

    texts = {}
    for b in docs_ds.select_columns([id_column, text_column]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        texts.update(zip(b[id_column], b[text_column]))
    ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        sims = [
            jaccard(t.get(a, ""), t.get(b, ""), k_shingle)
            for a, b in zip(batch["id_a"], batch["id_b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = np.array(sims, dtype=np.float64)
        return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash over word features; near-dups share most bits. Banding
    into 4×16-bit chunks gives LSH buckets (hamming ≤ 3 ⇒ some chunk equal)."""

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
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sig = np.array(
            [self.simhash64(t) for t in batch[self.text_column].fillna("")],
            dtype=np.uint64,
        )
        batch = batch[[self.id_column]].copy()
        batch["simhash"] = sig
        return batch


def simhash_candidates(ds, text_column="text", id_column="doc_id", chunks=4,
                       concurrency=4, max_bucket=256):
    """simhash per doc → explode 16-bit chunks → groupby(chunk_id, value) →
    candidate pairs with hamming distance verify. ``max_bucket`` caps
    per-bucket pair expansion (see minhash_lsh_groups)."""
    sigs = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sig = batch["simhash"].to_numpy(dtype=np.uint64)
        out_id = np.repeat(batch[id_column].to_numpy(), chunks)
        chunk_id = np.tile(np.arange(chunks), n)
        shift = (chunk_id * (64 // chunks)).astype(np.uint64)
        value = (np.repeat(sig, chunks) >> shift) & np.uint64((1 << (64 // chunks)) - 1)
        return pd.DataFrame(
            {id_column: out_id, "chunk_id": chunk_id, "value": value,
             "simhash": np.repeat(sig, chunks)}
        )

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs_of_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_column]).sort_values(id_column)
        g = g.head(max_bucket)
        ids = g[id_column].to_numpy()
        sig = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(sig[i]) ^ int(sig[j])).count("1") for i, j in zip(a, b)],
            dtype=np.int64,
        )
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b], "hamming": ham})

    pairs = exploded.groupby(["chunk_id", "value"]).map_groups(
        pairs_of_group, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_dups(ds, id_column="vec_id", vec_column="embedding",
                        threshold=0.95, block_size=2048):
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Baseline: normalized matmul of each batch against the (broadcast) corpus
    matrix — O(n²) flops but vectorized; the scale path buckets by coarse
    LSH sign-bits first (see similarity.ivf_assign)."""
    import ray

    mats, ids = [], []
    for b in ds.select_columns([id_column, vec_column]).iter_batches(
        batch_format="pandas", batch_size=8192
    ):
        mats.append(np.stack(b[vec_column].to_numpy()))
        ids.append(b[id_column].to_numpy())
    corpus = np.concatenate(mats).astype(np.float64)
    corpus /= np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    corpus_ids = np.concatenate(ids)
    ref = ray.put((corpus, corpus_ids))

    def block_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        c, cids = ray.get(ref)
        q = np.stack(batch[vec_column].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        qids = batch[id_column].to_numpy()
        sims = q @ c.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b_ = qids[ii], cids[jj]
        keep = a < b_  # dedupe + drop self-pairs
        return pd.DataFrame(
            {"id_a": a[keep], "id_b": b_[keep],
             "cosine": sims[ii, jj][keep].astype(np.float64)}
        )

    return ds.map_batches(block_pairs, batch_format="pandas", batch_size=block_size)
