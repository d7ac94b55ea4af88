"""Training-data corpus pipelines over ``documents`` / ``embeddings``:
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + IVF), text analysis (lang-id, quality,
token counts, fingerprints) and multimodal plumbing.

SQL-expressible ops carry entries in ``ORACLE_SQL`` (same column names);
the rest are rows-only checked by the driver and oracle-verified in
``tests/`` against local reference implementations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import dedup as dd
from ..functions import similarity as sim
from ..functions import text as tx


def _rp(sf_dir: str, table: str, columns=None, min_blocks: int = 4, **kw):
    """Pruned read with a DATA-SIZED block count (sources/reader.py:
    removes Ray's 200-block read floor, which at toy scale turns every
    downstream exchange into ~200 task launches of overhead; the sizing
    converges to Ray's own bytes-per-block plan at real scale)."""
    from ..sources.reader import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns,
                              min_blocks=min_blocks, **kw)


# --------------------------------------------------------------------------
# oracle-checked text ops
# --------------------------------------------------------------------------


def token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace token counting — zero-copy Arrow end to end (VERDICT r3
    #8: ``pc.count_substring`` on the object-store block, no pandas
    conversion; single-space split semantics = DuckDB
    ``string_split(text, ' ')``)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        n = pc.add(pc.count_substring(s, " "), pa.scalar(1, pa.int32()))
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    return (
        ds.map_batches(count, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def token_counts_bpeish(sf_dir: str) -> pd.DataFrame:
    """Regex tokenizer count (words + punctuation runs — the BPE-ish
    pre-tokenization pattern), Arrow-native via the RE2
    ``count_substring_regex`` kernel (same match semantics as the Python
    regex on this corpus; tests cross-check the kernels)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        # RE2 spelling of Python-re's unicode \w/\s — the shared constant
        # (functions/text.py BPEISH_RE2), cross-checked kernel-vs-kernel in
        # test_text incl. the Cc control-whitespace chars \p{Z} misses
        n = pc.count_substring_regex(s, tx.BPEISH_RE2)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    return (
        ds.map_batches(count, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def quality_stats(sf_dir: str) -> pd.DataFrame:
    """Quality-scoring features (length / token-shape ratios), Arrow-native:
    every feature is a pyarrow.compute expression over the zero-copy block.
    No rounding: both engines compute the identical float64 ratio from exact
    integer inputs (IEEE division is deterministic), and rounding would only
    introduce round-half-even vs half-away mismatches."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        n_chars = pc.cast(pc.utf8_length(s), pa.int64())
        n_tokens = pc.cast(
            pc.add(pc.count_substring(s, " "), pa.scalar(1, pa.int32())),
            pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(s, "[A-Za-z]"), pa.int64())
        denom_t = pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())
        denom_c = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
        mean_token_len = pc.divide(
            pc.cast(pc.subtract(n_chars,
                                pc.subtract(n_tokens, pa.scalar(1, pa.int64()))),
                    pa.float64()),
            denom_t)
        alpha_ratio = pc.divide(pc.cast(n_alpha, pa.float64()), denom_c)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": n_tokens,
            "mean_token_len": mean_token_len,
            "alpha_ratio": alpha_ratio,
        })

    return (
        ds.map_batches(feats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def exact_dedup_documents(sf_dir: str) -> pd.DataFrame:
    """D1/D2 parity: exact dedup by content hash, min-id wins. Duplicates are
    planted by unioning the corpus with an id-shifted copy of itself, so the
    operator provably removes them."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def shift(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], pa.scalar(10_000, pa.int64())),
                "text": t["text"],
                "n_chars": t["n_chars"],
            }
        )

    corpus = ds.union(ds.map_batches(shift, batch_format="pyarrow"))
    # distinct-hash upper bound from parquet footer metadata (free): the
    # planted-dup union doubles the rows — lets exact_dedup auto-pick the
    # flat election at toy cardinality (functions/dedup.py crossover note)
    n_meta = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    survivors = dd.exact_dedup(corpus, text_column="text", id_column="doc_id",
                               approx_rows=2 * n_meta)
    out = survivors.select_columns(["doc_id", "n_chars"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def multimodal_meta(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing, oracle-checkable half: treat each document body
    as an opaque binary payload column and extract typed metadata
    (size_bytes) vectorized. The decode stage itself is `DecodeStage` in
    stages/multimodal.py (stubbed: no image/audio libs in this env)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def meta(t: pa.Table) -> pa.Table:
        payload = t["text"].cast(pa.binary())
        return pa.table(
            {"doc_id": t["doc_id"], "size_bytes": pc.binary_length(payload).cast(pa.int64())}
        )

    return (
        ds.map_batches(meta, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def multimodal_byte_features(sf_dir: str) -> pd.DataFrame:
    """Feature extraction over binary payloads (the feature-extract member
    of the multimodal family — REAL, no codec needed): byte histogram stats
    + Shannon entropy per payload via the ``ByteFeatureStage`` actor pool.
    Oracle: DuckDB recomputes the character-level entropy — exact because
    the test corpus is pure ASCII (codepoint == byte; asserted here, same
    precondition as doc_fingerprints)."""
    from ..stages.multimodal import ByteFeatureStage, attach_payload

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def payloadize(t: pa.Table) -> pa.Table:
        # ASCII precondition for the SQL twin: total bytes == total chars
        # (byte count ≥ char count, equal iff every char is single-byte)
        assert pc.sum(pc.binary_length(t["text"].cast(pa.binary()))).as_py() \
            == pc.sum(pc.utf8_length(t["text"])).as_py(), \
            "non-ASCII text: SQL character-entropy twin no longer exact"
        return attach_payload(t).select(["doc_id", "payload"])

    out = (
        ds.map_batches(payloadize, batch_format="pyarrow")
        .map_batches(ByteFeatureStage, batch_format="pyarrow",
                     concurrency=(1, 4))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def multimodal_frames(sf_dir: str) -> pd.DataFrame:
    """Frame/chunk sampling over opaque payloads (the 1→N explode layout of
    stages/multimodal.py:FrameSampleStage, run as a real actor-pool stage):
    3 deterministic 32-byte frames per document. The sampler's byte
    arithmetic is SQL-expressible, so the whole stage is oracle-checked;
    frames are emitted as utf8 for the driver's hash compare (payloads here
    are ASCII text standing in for media bytes)."""
    from ..stages.multimodal import FrameSampleStage, attach_payload

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    framed = ds.map_batches(
        lambda t: attach_payload(t, "text"), batch_format="pyarrow"
    ).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(payload_column="payload",
                                   id_column="doc_id"),
        batch_format="pyarrow",
        batch_size=256,  # payloads are large in real deployments
        concurrency=(1, 4),
    )

    def to_utf8(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "frame_idx": t["frame_idx"].cast(pa.int64()),
            "frame": t["frame"].cast(pa.string()),
        })

    out = framed.map_batches(to_utf8, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


def _query_vectors(sf_dir: str, ids=(0, 1, 2)):
    """The handful of fixed query vectors, read with PREDICATE PUSHDOWN —
    only row groups containing the query ids leave storage (at the 100-TB
    shape a full-table driver read here would dwarf the search itself).
    Returns (queries ndarray sorted by id, qids ndarray)."""
    import pyarrow.parquet as pq

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in", list(ids))])
    order = np.argsort(qt["vec_id"].to_numpy(zero_copy_only=False))
    queries = np.stack(
        [np.asarray(v) for v in qt["embedding"].to_pylist()])[order]
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)[order]
    return queries, qids


def ann_cosine_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 for three fixed query vectors (vec_id 0/1/2)
    — numpy matmul per batch against the broadcast query matrix; rank
    tiebreak (cosine desc, vec_id asc) matches the SQL window order."""
    queries, qids = _query_vectors(sf_dir)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = sim.brute_force_topk(ds, queries, k=10, query_ids=qids)
    return out[["query_id", "rank", "vec_id"]].reset_index(drop=True)


# --------------------------------------------------------------------------
# rows-only ops (non-SQL-expressible; oracle-verified in tests instead)
# --------------------------------------------------------------------------


def _planted_near_dups(sf_dir: str, n_plant: int = 25):
    """documents ∪ near-duplicate copies (one word appended, id+50_000) —
    deterministic, so LSH recall is testable."""
    import ray.data as rd  # noqa: F401

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        mask = pc.less(t["doc_id"], pa.scalar(n_plant, pa.int64()))
        sel = t.filter(mask)
        new_text = pc.binary_join_element_wise(sel["text"], pa.scalar(" nearduplicate"), "")
        return pa.table(
            {"doc_id": pc.add(sel["doc_id"], pa.scalar(50_000, pa.int64())),
             "text": new_text}
        )

    return ds.union(ds.map_batches(plant, batch_format="pyarrow"))


def minhash_dedup_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup: shingle → minhash → band buckets → groupby →
    candidate pairs → Jaccard verify ≥ 0.5."""
    corpus = _planted_near_dups(sf_dir)
    cands = dd.minhash_lsh_groups(corpus, num_perm=64, bands=16, concurrency=(1, 4))
    verified = dd.verify_pairs_jaccard(cands, corpus, threshold=0.5)
    out = verified.to_pandas()
    out["jaccard"] = np.round(out["jaccard"].to_numpy(dtype=np.float64), 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """n-gram Jaccard near-dup via prefix filtering (exact — no
    probabilistic misses, unlike MinHash-LSH): the oracle is the same
    brute-force all-pairs Jaccard scan, and the outputs must coincide
    EXACTLY because prefix filtering has no false negatives (Bayardo et
    al., WWW'07)."""
    corpus = _planted_near_dups(sf_dir)
    verified = dd.ngram_jaccard_pairs(corpus, threshold=0.5,
                                      concurrency=(1, 4))
    out = verified.to_pandas()
    out["jaccard"] = np.round(out["jaccard"].to_numpy(dtype=np.float64), 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_dedup_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup: 64-bit signatures, 16-bit chunk LSH, hamming ≤ 3."""
    corpus = _planted_near_dups(sf_dir)
    pairs = dd.simhash_candidates(corpus, concurrency=(1, 4)).to_pandas()
    pairs = pairs[pairs["hamming"] <= 3]
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_near_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup (pairs with cosine ≥ 0.999 — planted by
    duplicating the first 20 vectors with shifted ids)."""
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["vec_id"], pa.scalar(20, pa.int64())))
        return pa.table(
            {"vec_id": pc.add(sel["vec_id"], pa.scalar(50_000, pa.int64())),
             "embedding": sel["embedding"]}
        )

    corpus = ds.union(ds.map_batches(plant, batch_format="pyarrow"))
    out = dd.embedding_near_dups(corpus, threshold=0.999).to_pandas()
    out = out.drop(columns=["cosine"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def near_dup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup CLUSTERING: pair emission → connected components → one
    canonical survivor per cluster — the cluster-then-keep-one step of
    web-corpus dedup pipelines (pairwise near-dup alone can't pick
    survivors consistently when A~B and B~C but A≁C; the component makes
    the keep decision transitive). Edges come from the EXACT n-gram
    Jaccard operator (prefix filtering, Bayardo et al. WWW'07 — no
    probabilistic misses), so the oracle can rebuild the identical edge
    set and label it with a recursive transitive closure.
    ``cluster_id`` = min doc_id reachable; ``is_canonical`` marks the
    cluster's survivor. Scale shape: the pair stage is the bucketed
    prefix-filter exchange (functions/dedup.py), the labeling is the same
    distributed min-label-propagation operator the part co-graph uses
    (functions/graph.py — iterative bucketed exchanges; the edge list
    never lands on one machine)."""
    from ..functions.graph import connected_components as cc_labelprop

    corpus = _planted_near_dups(sf_dir)
    pairs = dd.ngram_jaccard_pairs(corpus, threshold=0.5, concurrency=(1, 4))
    labels = cc_labelprop(
        pairs.select_columns(["id_a", "id_b"]),
        corpus.select_columns(["doc_id"]),
        src="id_a", dst="id_b", node_col="doc_id", num_buckets=8,
    )
    out = labels.to_pandas().rename(
        columns={"node": "doc_id", "component": "cluster_id"})
    out["is_canonical"] = (
        out["doc_id"] == out["cluster_id"]).astype(np.int64)
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "cluster_id", "is_canonical"]])


def dup_span_documents(sf_dir: str, w: int = 8,
                       broadcast_threshold: int = 2_000_000) -> pd.DataFrame:
    """Exact duplicate-SPAN detection (substring-level dedup à la Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better"):
    a document's ``w``-token window is a duplicate span iff the identical
    window occurs in ≥2 distinct documents — catching copied passages that
    whole-document near-dup misses. Returns per-document window totals and
    duplicate-window counts (the inputs of span-removal). Duplicate spans
    are planted by unioning exact copies of the first 25 docs (id+50_000).

    Stage shape: per-batch DISTINCT (doc, window) explode (the shared
    vectorized n-gram kernel — no per-row loop) → TWO-LEVEL count reduce
    (per-block ``value_counts`` partials routed by ``hash(window) % B``,
    one vectorized pandas sum per physical bucket — a flat
    ``groupby(window).count()`` pays per-group overhead, measured 9.1 s
    vs 0.96 s at 237k windows) → the (small) dup window set broadcasts
    once and the per-doc stats stream out of a second explode pass with a
    hash-set membership test; above the broadcast threshold a
    ``groupby(window).map_groups`` co-shuffle fallback stays correct at
    any dup-set size. The reduce keys on the exact window STRING (the
    bucket hash only routes), so the DuckDB twin is hash-free and
    collisions are impossible; tokenization is the \\w+ lowercase
    convention of the jaccard shingle CTE (ASCII corpus: Python-re and
    RE2 agree)."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["doc_id"], pa.scalar(25, pa.int64())))
        return pa.table(
            {"doc_id": pc.add(sel["doc_id"], pa.scalar(50_000, pa.int64())),
             "text": sel["text"]})

    corpus = docs.union(docs.map_batches(plant, batch_format="pyarrow"))

    def _explode_df(batch: pd.DataFrame) -> pd.DataFrame:
        # normalize (\w+ lowercase, the jaccard-CTE convention) then reuse
        # the shared vectorized n-gram explode kernel for full windows;
        # docs shorter than w contribute their whole text as one window
        # ('' when empty, matching the SQL branch)
        toks = batch["text"].fillna("").str.lower().str.findall(r"\w+")
        norm = toks.str.join(" ")
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        frames = []
        big = lens >= w
        if big.any():
            d, grams = tx.explode_word_ngrams(ids[big], norm[big], w)
            frames.append(pd.DataFrame({"doc_id": d, "window": grams}))
        small = ~big
        if small.any():
            frames.append(pd.DataFrame(
                {"doc_id": ids[small],
                 "window": norm[small].to_numpy(dtype=object)}))
        if not frames:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "window": pd.Series([], dtype=object)})
        df = pd.concat(frames, ignore_index=True)
        return df.drop_duplicates()  # distinct per doc (one row per doc/batch)

    def explode(t: pa.Table) -> pa.Table:
        # explicit Arrow string output: letting the pandas block conversion
        # pick the string layout made the downstream sort exchange ~8×
        # slower on this key (measured 12.8 s → 1.6 s at 25k windows)
        df = _explode_df(t.to_pandas())
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "window": pa.array(df["window"].tolist(), pa.string()),
        })

    # Stage A: TWO-LEVEL bucketed count reduce (the lang-confusion /
    # quantiles pattern): per-block value_counts partials routed by
    # hash(window) % B, then ONE vectorized pandas groupby per physical
    # bucket. A flat Dataset.groupby("window").count() pays per-GROUP
    # aggregation overhead — measured 9.1 s vs 0.96 s on the same 237k
    # distinct windows. Exact: partials sum across blocks in the reduce.
    B = 64

    def count_partial(t: pa.Table) -> pa.Table:
        vc = t["window"].value_counts()
        wcol = vc.field("values")
        h = pd.util.hash_array(np.asarray(wcol.to_pylist(), dtype=object))
        return pa.table({
            "window": wcol,
            "n": vc.field("counts").cast(pa.int64()),
            "_b": pa.array((h % B).astype(np.int64), pa.int64()),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("window", sort=False)["n"].sum()
        dup = s[s >= 2]
        return pd.DataFrame(
            {"window": pd.Series(dup.index.to_numpy(dtype=object),
                                 dtype=object)})

    exploded = corpus.map_batches(explode, batch_format="pyarrow")
    # materialize: count() and to_pandas() below would otherwise each
    # re-execute the explode + reduce from scratch (lazy lineage)
    dup_ds = (exploded.map_batches(count_partial, batch_format="pyarrow")
              .groupby("_b").map_groups(reduce_bucket, batch_format="pandas")
              ).materialize()
    n_dup_windows_total = dup_ds.count()

    if n_dup_windows_total <= broadcast_threshold:
        # hybrid fast path (same discipline as the join build sides): the
        # dup-window set is broadcast ONCE via the object store and the
        # final per-doc stats stream out of a second explode pass with a
        # hash-set membership test — total one exchange, no join.
        import ray

        dup_windows = pd.Index(
            dup_ds.to_pandas()["window"]) if n_dup_windows_total else pd.Index([])
        ref = ray.put(dup_windows)

        def finish(batch: pd.DataFrame) -> pd.DataFrame:
            df = _explode_df(batch)
            dups = ray.get(ref)
            isdup = df["window"].isin(dups).to_numpy()
            g = df.groupby("doc_id", sort=False)
            tot = g.size()
            dup_n = pd.Series(isdup, index=df.index).groupby(
                df["doc_id"], sort=False).sum()
            return pd.DataFrame({
                "doc_id": tot.index.to_numpy(dtype=np.int64),
                "n_windows": tot.to_numpy(dtype=np.int64),
                "n_dup_windows": dup_n.reindex(tot.index).to_numpy(
                    dtype=np.int64),
            })

        out = corpus.map_batches(finish, batch_format="pandas").to_pandas()  # pandas: vectorized str line-kernel emits new frame
    else:  # co-shuffle fallback: correct at ANY dup-set size
        def mark(g: pd.DataFrame) -> pd.DataFrame:
            # rows are distinct (doc, window): group size == distinct docs
            dup = np.int64(1 if len(g) >= 2 else 0)
            return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(),
                                 "dup": np.full(len(g), dup, dtype=np.int64)})

        from ray.data.aggregate import Count, Sum

        out = (
            exploded.groupby("window").map_groups(mark, batch_format="pandas")
            .groupby("doc_id").aggregate(Count(), Sum("dup"))
            .to_pandas()
            .rename(columns={"count()": "n_windows",
                             "sum(dup)": "n_dup_windows"})
        )
        out["n_dup_windows"] = out["n_dup_windows"].astype(np.int64)
        out["n_windows"] = out["n_windows"].astype(np.int64)
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_windows", "n_dup_windows"]])


def vocab_top_terms(sf_dir: str, k: int = 256) -> pd.DataFrame:
    """Distributed vocabulary construction (the count step of tokenizer
    training): corpus-wide token counts with per-block PARTIAL aggregation
    — each block contributes one (token, n) row per DISTINCT token
    (``value_counts`` on the exploded Arrow token column), so the groupby
    exchange moves distinct-per-block rows, not one row per occurrence;
    the global top-k is a distributed sort + limit with a deterministic
    tie-break (count DESC, token ASC) so the rank-k boundary is stable.
    Tokenization is the repo-wide single-space convention
    (functions/text.py count_tokens_whitespace) so the DuckDB twin
    reproduces it with ``string_split(text, ' ')``.

    The reduce is the two-level bucketed pattern (see
    ``dup_span_documents``: flat string groupbys pay ~35 µs/group):
    per-block ``value_counts`` partials route by ``hash(token) % B``; each
    physical bucket does ONE vectorized pandas sum and keeps its LOCAL
    top-k — exact, because buckets partition tokens, so the global top-k
    is a subset of the union of per-bucket top-k's. The driver merges only
    ``B × k`` rows; no global sort ever runs."""
    ds = _rp(sf_dir, "documents", columns=["text"])
    B = 32

    def partial(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        vc = pc.list_flatten(pc.split_pattern(s, " ")).value_counts()
        tok = vc.field("values")
        h = pd.util.hash_array(np.asarray(tok.to_pylist(), dtype=object))
        return pa.table({"token": tok,
                         "n": vc.field("counts").cast(pa.int64()),
                         "_b": pa.array((h % B).astype(np.int64),
                                        pa.int64())})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("token", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "token"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"token": s["token"].to_numpy(dtype=object),
                             "n": s["n"].to_numpy(dtype=np.int64)})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b").map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # ≤ B×k rows
    )
    out = (out.sort_values(["n", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["n"] = out["n"].astype(np.int64)
    return out


def lang_id_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID heuristic (stopword profiles, actor-pool stage) against
    the labeled lang column → confusion counts. The count is a DISTRIBUTED
    two-level reduce (per-batch partial crosstab, then a tiny
    |langs|²-group exchange) — per-doc rows never reach the driver (at
    10^10 docs the old ``to_pandas().groupby`` would have shipped them
    all)."""
    from ray.data.aggregate import Sum

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pred = ds.map_batches(
        tx.LangIdStage, batch_format="pandas", concurrency=(1, 4)  # pandas: actor-pool str inference stage
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby(["lang", "lang_pred"], as_index=False)
               .size().rename(columns={"size": "_n"}))
        out["_n"] = out["_n"].astype(np.int64)
        return out

    out = (
        pred.select_columns(["lang", "lang_pred"])
        .map_batches(partial, batch_format="pandas")  # pandas: crosstab partial (pandas groupby)
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("_n", alias_name="n"))
        .to_pandas()
    )
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowed rolling-hash fingerprints (actor-pool per-row kernel).

    Oracle note: the SQL twin recomputes the Rabin-Karp window hashes from
    codepoints, which equals the Python byte-level hash because the driver's
    documents are ASCII and all longer than the 8-byte window (both facts
    asserted against the data)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = (
        ds.map_batches(tx.FingerprintStage, batch_format="pandas", concurrency=(1, 4))  # pandas: actor-pool per-string winnowing kernel
        .select_columns(["doc_id", "fingerprint"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Composite quality score per document (rows-only; components are
    oracle-checked via quality_stats)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        f = tx.quality_features(batch["text"])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(),
             "quality": np.round(tx.quality_score(f), 6)}
        )

    return (
        ds.map_batches(score, batch_format="pandas")  # pandas: vectorized str quality kernel
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def domain_quality_filter(sf_dir: str,
                          threshold_micro: int = 500_000) -> pd.DataFrame:
    """Domain/source-REPUTATION filtering (the URL-level gate of C4 /
    RefinedWeb-family web pipelines — Raffel et al. 2020, Penedo et al.
    2023: judge the DOMAIN, not just the document, so a boilerplate farm's
    individually-plausible pages drop wholesale): pass 1 aggregates mean
    document quality per ``source``; a source whose mean falls below the
    threshold is dropped with every document it carries; pass 2 streams
    the corpus again and emits the survivors with their scores. A
    low-reputation source (``srcbad``: punctuation-only texts over the
    first 12 doc ids, id+70_000) is planted deterministically so the drop
    path is exercised and the oracle can reproduce it.

    Scale shape: the per-source aggregate is the two-level bucketed reduce
    on the source STRING key (functions/bucketed.py — at web scale
    ``source`` is millions of domains, far past flat-groupby territory);
    the driver folds one row per source only to build the drop set, which
    broadcasts once via ``ray.put`` (a drop set past broadcast size would
    use the anti_filter co-shuffle, the clean_corpus policy). The corpus
    is never pinned: pass 2 re-reads and re-scores (two streaming passes —
    at 100 TB re-scoring is cheaper than materializing the scored corpus).
    The mean-vs-threshold comparison is INTEGER (micro-quality sum vs
    count × threshold), so Ray's and DuckDB's float summation order can
    never flip a boundary source."""
    import ray

    from ..functions.bucketed import bucketed_groupby_agg

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["doc_id"], pa.scalar(12, pa.int64())))
        n = len(sel)
        return pa.table({
            "doc_id": pc.add(sel["doc_id"], pa.scalar(70_000, pa.int64())),
            "text": pa.array(["!!! ??? !!!"] * n, pa.string()),
            "source": pa.array(["srcbad"] * n, pa.string()),
        })

    corpus = docs.union(docs.map_batches(plant, batch_format="pyarrow"))

    def score(t: pa.Table) -> pa.Table:
        f = tx.quality_features(t["text"].to_pandas())
        q = np.round(tx.quality_score(f), 6)
        # integer micro-quality: q is already 6-dp rounded, so q*1e6 is
        # integral up to float eps and never near a .5 rounding boundary
        q6 = np.round(q * 1e6).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "quality": pa.array(q, pa.float64()),
            "q6": pa.array(q6, pa.int64()),
        })

    scored = corpus.map_batches(score, batch_format="pyarrow")
    stats = bucketed_groupby_agg(
        scored, "source",
        {"q6_sum": ("q6", "sum"), "n_docs": ("q6", "count")}).to_pandas()
    bad = stats.loc[stats["q6_sum"] < stats["n_docs"] * threshold_micro,
                    "source"]
    ref = ray.put(np.sort(bad.to_numpy(dtype=object)))

    def keep(t: pa.Table) -> pa.Table:
        bad_arr = ray.get(ref)
        t = t.drop_columns(["q6"])
        if len(bad_arr) == 0:
            return t
        src = t["source"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(src, bad_arr)))

    out = scored.map_batches(keep, batch_format="pyarrow").to_pandas()
    if out.empty:  # all sources dropped: to_pandas loses the schema
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "source": pd.Series([], dtype=str),
                            "quality": pd.Series([], dtype=np.float64)})
    return out.sort_values("doc_id").reset_index(drop=True)


def percentile_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Per-language percentile quality gate — keep documents whose quality
    score is at or above their OWN language's median (the "keep the best
    half per language" curation cut of web-corpus pipelines; language-aware
    so a high-resource language's score distribution doesn't set the bar
    for a low-resource one — a fixed global threshold would).

    Scale shape: pass 1 computes EXACT per-language medians with the
    mergeable histogram combiner (functions/quantiles.py — integer
    micro-quality domain, no global sort, no sketch; the exchange carries
    only distinct (lang, q6) rows). The per-language threshold table (one
    row per language) broadcasts once via ``ray.put``; pass 2 re-reads and
    re-scores the corpus and filters map-only — two streaming passes,
    nothing pinned (the ``domain_quality_filter`` policy: at 100 TB
    re-scoring is cheaper than materializing the scored corpus). The
    threshold comparison is INTEGER micro-quality (q6 = round(q·1e6)), so
    Ray's and DuckDB's float rounding can never flip a boundary document."""
    import ray

    from ..functions.quantiles import group_quantiles_histogram

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        f = tx.quality_features(t["text"].to_pandas())
        q = np.round(tx.quality_score(f), 6)
        q6 = np.round(q * 1e6).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "lang": t["lang"],
            "quality": pa.array(q, pa.float64()),
            "q6": pa.array(q6, pa.int64()),
        })

    scored = docs.map_batches(score, batch_format="pyarrow")
    med = (group_quantiles_histogram(
        scored.select_columns(["lang", "q6"]), value_column="q6",
        group_column="lang", qs={"p50": 0.5})
        .to_pandas().sort_values("lang"))
    ref = ray.put((med["lang"].to_numpy(dtype=object),
                   med["p50"].to_numpy(dtype=np.int64)))

    def keep(t: pa.Table) -> pa.Table:
        langs, p50 = ray.get(ref)
        lv = t["lang"].to_numpy(zero_copy_only=False)
        # every lang is present in the pass-1 table by construction
        thr = p50[np.searchsorted(langs, lv)]
        q6 = t["q6"].to_numpy(zero_copy_only=False)
        return t.drop_columns(["q6"]).filter(pa.array(q6 >= thr))

    out = scored.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def token_budget_sample(sf_dir: str, budget: int = 400,
                        hb_bits: int = 6) -> pd.DataFrame:
    """Per-source token-budget sampling — walk each source's documents in
    content-addressed md5(doc_id) order and keep every document that STARTS
    before the source's token budget is exhausted (the "N tokens per
    source/domain" cap of mixture construction; hash order makes the kept
    prefix deterministic, order-independent and extensible — raising the
    budget only ever ADDS documents).

    Scale shape — a distributed ORDERED prefix sum without a global sort:
    the uint64 hash key is cut into 2^hb_bits ORDER-PRESERVING coarse
    ranges (``hb = h >> (64-hb_bits)``), so per-(source, hb) token sums
    (one bucketed exchange, functions/bucketed.py) give the driver a tiny
    table — O(sources × 2^hb_bits) rows, the same driver-side bound as
    ``domain_quality_filter``'s per-source stats fold (a source universe
    past that bound would move the per-source scan into a
    ``groupby(source).map_groups``, each group ≤ 2^hb_bits rows). The
    exclusive scan over that table classifies every bucket as
    fully-kept / fully-dropped / BOUNDARY (≤1 per source), so the final
    pass filters map-only and only the boundary slice — ~2^-hb_bits of
    each source — pays a per-doc cumsum behind one small exchange. The
    narrow token table (4 fixed-width columns + source) is pinned once so
    tokenize+hash runs a single time (the ``pack_sequences`` policy).

    Ties: order is (h, doc_id) on both sides; the md5 convention is the
    engine-wide one DuckDB reproduces exactly (functions/hashing.py)."""
    import ray

    from ..functions.bucketed import bucketed_groupby_agg
    from ..functions.hashing import md5_of_ints

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    shift = np.uint64(64 - hb_bits)

    def tok(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        head, _ = md5_of_ints(ids)
        s = pc.fill_null(t["text"], "")
        n = pc.add(pc.count_substring(s, " "), pa.scalar(1, pa.int32()))
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "n_tokens": pc.cast(n, pa.int64()),
            "h": pa.array(head, pa.uint64()),
            "hb": pa.array((head >> shift).astype(np.int64), pa.int64()),
        })

    toks = docs.map_batches(tok, batch_format="pyarrow").materialize()

    per_bucket = (bucketed_groupby_agg(
        toks, ["source", "hb"], {"tok_sum": ("n_tokens", "sum")})
        .to_pandas().sort_values(["source", "hb"]))
    start = (per_bucket.groupby("source")["tok_sum"].cumsum()
             - per_bucket["tok_sum"])
    end = start + per_bucket["tok_sum"]
    # bucket classification: end<=budget → every doc starts before end≤B
    # (fully kept); the FIRST bucket with end>budget is the boundary (≤1
    # per source) and pays the per-doc cumsum; later buckets start ≥ its
    # end' ≥ … ≥ budget and are dropped map-only. "First end>budget"
    # rather than "start<budget<end": when a bucket ends EXACTLY at the
    # budget the crossing is empty, and the cut stage then correctly keeps
    # zero rows of a boundary bucket whose start is already ≥ budget.
    bnd = (per_bucket[(end > budget).to_numpy()]
           .groupby("source", sort=False).head(1))
    n_hb = 1 << hb_bits
    srcs = np.sort(per_bucket["source"].unique().astype(object))
    bnd_hb = np.full(len(srcs), n_hb, dtype=np.int64)  # no crossing: keep all
    bnd_start = np.zeros(len(srcs), dtype=np.int64)
    ix = np.searchsorted(srcs, bnd["source"].to_numpy(dtype=object))
    bnd_hb[ix] = bnd["hb"].to_numpy(dtype=np.int64)
    bnd_start[ix] = start[bnd.index].to_numpy(dtype=np.int64)
    ref = ray.put((srcs, bnd_hb, bnd_start))

    def full_keep(t: pa.Table) -> pa.Table:
        srcs_, bhb, _ = ray.get(ref)
        sv = t["source"].to_numpy(zero_copy_only=False)
        keep = t["hb"].to_numpy(zero_copy_only=False) < bhb[
            np.searchsorted(srcs_, sv)]
        return t.drop_columns(["h", "hb"]).filter(pa.array(keep))

    def boundary_only(t: pa.Table) -> pa.Table:
        srcs_, bhb, _ = ray.get(ref)
        sv = t["source"].to_numpy(zero_copy_only=False)
        keep = t["hb"].to_numpy(zero_copy_only=False) == bhb[
            np.searchsorted(srcs_, sv)]
        return t.filter(pa.array(keep))

    def cut(g: pd.DataFrame) -> pa.Table:
        srcs_, _, bstart = ray.get(ref)
        g = g.sort_values(["h", "doc_id"])
        nn = g["n_tokens"].to_numpy(dtype=np.int64)
        s0 = int(bstart[np.searchsorted(srcs_, g["source"].iloc[0])])
        prior = s0 + np.concatenate(([0], np.cumsum(nn[:-1])))
        k = g.loc[prior < budget]
        # explicit Arrow block: the union partner (full_keep) is Arrow, and
        # a pandas object-string block would re-type the merged stream
        return pa.table({"doc_id": pa.array(k["doc_id"], pa.int64()),
                         "source": pa.array(k["source"], pa.string()),
                         "n_tokens": pa.array(k["n_tokens"], pa.int64())})

    full = toks.map_batches(full_keep, batch_format="pyarrow")
    if len(bnd):
        edge = (toks.map_batches(boundary_only, batch_format="pyarrow")
                .groupby("source").map_groups(cut, batch_format="pandas"))
        out = full.union(edge).to_pandas()
    else:  # every bucket classified fully-kept/dropped: map-only plan
        out = full.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def profile_documents(sf_dir: str, approx: bool = False,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Column-statistics profiler (the "describe my table" first query of
    any ingest): one row per column with ``(col_name, n_rows, n_null,
    n_distinct)``.

    Scale shape: row/null counts are per-block partials folded on the
    driver (5 rows per block — ``bounded_groupby_fold`` discipline, no
    exchange). EXACT distinct counts route per-block-unique (column,
    value) pairs through ONE bucketed exchange keyed on hash(value) —
    every (column, value) pair lands in exactly one bucket, so per-bucket
    ``nunique`` partials sum to the global distinct count; the exchange
    carries distinct-per-block values only, Arrow-typed strings (the
    block-format rule). ``approx=True`` swaps the value exchange for
    HyperLogLog register partials (functions/sketches.py — 16 KiB per
    block REGARDLESS of cardinality, elementwise-max fold): at 10^10
    distinct values the exact path's exchange is the data itself, the
    sketch's is a constant — that variant is test-verified (≤2% observed
    error, merge algebra pinned) rather than oracle-hashed."""
    from ..functions import sketches as sk

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    docs = _rp(sf_dir, "documents", columns=cols)

    if approx:
        p = 14

        def regs_partial(t: pa.Table) -> pa.Table:
            # ONE pass: row/null counts ride alongside the HLL registers
            regs = [sk.hll_partial(sk.hash_values(
                pc.drop_null(t[c]).to_numpy(zero_copy_only=False)), p)
                for c in cols]
            return pa.table({
                "col_name": pa.array(cols, pa.string()),
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
                "n_rows": pa.array([len(t)] * len(cols), pa.int64()),
                "n_null": pa.array([t[c].null_count for c in cols],
                                   pa.int64()),
            })

        merged = {c: np.zeros(1 << p, dtype=np.uint8) for c in cols}
        counts = {c: [0, 0] for c in cols}
        for b in (docs.map_batches(regs_partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            for c, r, nr, nn in zip(b["col_name"].to_pylist(),
                                    b["regs"].to_pylist(),
                                    b["n_rows"].to_pylist(),
                                    b["n_null"].to_pylist()):
                merged[c] = sk.hll_merge(merged[c],
                                         np.frombuffer(r, dtype=np.uint8))
                counts[c][0] += nr
                counts[c][1] += nn
        out = pd.DataFrame({
            "col_name": cols,
            "n_rows": [np.int64(counts[c][0]) for c in cols],
            "n_null": [np.int64(counts[c][1]) for c in cols],
            "n_distinct": [np.int64(round(sk.hll_estimate(merged[c])))
                           for c in cols]})
    else:
        def partial(t: pa.Table) -> pa.Table:
            # ONE pass: per-block-unique value rows for the distinct
            # exchange, plus one count row per column on the reserved
            # bucket -1 (5 tiny rows per block riding the same exchange —
            # a second counts scan would double the read I/O of what is,
            # for a profiler, the dominant cost)
            names = [pa.array(cols, pa.string())]
            vals = [pa.nulls(len(cols), pa.string())]
            bks = [pa.array([-1] * len(cols), pa.int64())]
            nrs = [pa.array([len(t)] * len(cols), pa.int64())]
            nns = [pa.array([t[c].null_count for c in cols], pa.int64())]
            for c in cols:
                u = pc.unique(pc.drop_null(pc.cast(t[c], pa.string())))
                if isinstance(u, pa.ChunkedArray):
                    u = u.combine_chunks()
                names.append(pa.array([c] * len(u), pa.string()))
                vals.append(u)
                bk = (pd.util.hash_array(u.to_numpy(zero_copy_only=False),
                                         categorize=False)
                      % np.uint64(num_buckets)).astype(np.int64)
                bks.append(pa.array(bk, pa.int64()))
                nrs.append(pa.array(np.zeros(len(u), np.int64), pa.int64()))
                nns.append(pa.array(np.zeros(len(u), np.int64), pa.int64()))
            return pa.table({"col_name": pa.concat_arrays(names),
                             "val": pa.concat_arrays(vals),
                             "bucket": pa.concat_arrays(bks),
                             "n_rows": pa.concat_arrays(nrs),
                             "n_null": pa.concat_arrays(nns)})

        def bucket_fold(g: pd.DataFrame) -> pa.Table:
            if int(g["bucket"].iloc[0]) == -1:  # the count-partial group
                s = g.groupby("col_name", sort=False)[
                    ["n_rows", "n_null"]].sum()
                return pa.table({
                    "col_name": pa.array(s.index.to_numpy(dtype=object),
                                         pa.string()),
                    "n_rows": pa.array(s["n_rows"].to_numpy(np.int64)),
                    "n_null": pa.array(s["n_null"].to_numpy(np.int64)),
                    "nd": pa.array(np.zeros(len(s), np.int64))})
            n = g.groupby("col_name", sort=False)["val"].nunique()
            z = np.zeros(len(n), np.int64)
            return pa.table({
                "col_name": pa.array(n.index.to_numpy(dtype=object),
                                     pa.string()),
                "n_rows": pa.array(z), "n_null": pa.array(z),
                "nd": pa.array(n.to_numpy(dtype=np.int64), pa.int64())})

        out = (docs.map_batches(partial, batch_format="pyarrow")
               .groupby("bucket").map_groups(bucket_fold,
                                             batch_format="pandas")  # pandas: per-bucket pandas reduce
               .to_pandas().groupby("col_name", sort=False)
               [["n_rows", "n_null", "nd"]].sum().reset_index()
               .rename(columns={"nd": "n_distinct"}))
        for c in ("n_rows", "n_null", "n_distinct"):
            out[c] = out[c].astype(np.int64)

    return out.sort_values("col_name").reset_index(drop=True)


def split_documents(sf_dir: str, test_pct: int = 10,
                    val_pct: int = 10) -> pd.DataFrame:
    """Deterministic train/val/test assignment — the split every training
    run needs pinned BEFORE any curation: content-addressed md5 buckets
    (the engine convention DuckDB reproduces), so membership is a pure
    function of doc_id — stable across runs, machines and corpus growth
    (new docs never move old ones between splits). Returns the per-
    (lang, split) census, the stratification-balance audit: hash
    uniformity keeps each language's split ratios at the global ones
    without a per-group pass. Map-only, no shuffle; per-block partials
    collapse in-task so the driver folds only blocks × (lang × 3) partial
    rows (functions/bucketed.py:bounded_groupby_fold), never per-doc
    rows."""
    from ..functions.bucketed import bounded_groupby_fold

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang"])
    cut_test, cut_val = test_pct, test_pct + val_pct

    def assign(t: pa.Table) -> pa.Table:
        b = _md5_bucket(t["doc_id"].to_numpy(zero_copy_only=False), 100)
        split = np.where(b < cut_test, "test",
                         np.where(b < cut_val, "val", "train"))
        return pa.table({"lang": t["lang"],
                         "split": pa.array(split, pa.string())})

    out = bounded_groupby_fold(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["lang", "split"], [], count_col="n_docs")
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


def token_count_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-language token-count percentiles via mergeable histogram
    partials (functions/quantiles.py) — exact percentiles WITHOUT a global
    sort or a sketch: per-block (lang, n_tokens) count combiner, then one
    tiny exchange of distinct values. The oracle recomputes the identical
    rank arithmetic (r = max(ceil(q·n), 1)-th smallest) with row_number."""
    from ..functions.quantiles import group_quantiles_histogram

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": batch["lang"].to_numpy(),
            "n_tokens": tx.count_tokens_whitespace(batch["text"]),
        })

    out = group_quantiles_histogram(
        ds.map_batches(with_tokens, batch_format="pandas"),  # pandas: str tokenize kernel emits (lang, n_tokens)
        value_column="n_tokens", group_column="lang",
        qs={"p50": 0.5, "p90": 0.9, "p99": 0.99},
    ).to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def _rank_interval_err(vals: np.ndarray, cum: np.ndarray, estimate: float,
                       target: int) -> tuple[int, int, int]:
    """Rank error of a quantile ``estimate`` against an exact CDF given as
    sorted distinct ``vals`` with cumulative counts ``cum``. The estimate
    value OCCUPIES a rank interval [rank_lo, rank_hi] (token counts tie
    heavily — a single value can span >5% of total mass); the KLL guarantee
    is that SOME rank within ±εn resolves to the estimate, so the error is
    the distance from ``target`` to that interval — measuring to the upper
    endpoint alone would turn a perfectly correct answer on a fat tie into
    a spurious red row. Returns (err_in_ranks, rank_lo, rank_hi)."""
    ix = int(np.searchsorted(vals, estimate, side="right"))
    rank_hi = int(cum[ix - 1]) if ix > 0 else 0
    rank_lo = (int(cum[ix - 2]) + 1) if ix > 1 else (1 if ix > 0 else 0)
    if rank_lo <= target <= rank_hi:
        return 0, rank_lo, rank_hi
    return min(abs(rank_lo - target), abs(rank_hi - target)), rank_lo, rank_hi


def kll_quantile_bounds(sf_dir: str) -> pd.DataFrame:
    """Driver-gated KLL evidence row (VERDICT r4 #4): runs the DISTRIBUTED
    KLL quantile sketch (functions/sketches.py — one partial per block,
    driver merge) over the global token-count distribution and asserts its
    rank error ≤ 0.05 against the exact CDF (the same mergeable
    value-count partials the exact path uses; test_sketches pins 3%
    single-sketch / 5% corpus-merged, so a violation here means the sketch
    machinery broke — the row turns red by raising). RETURNS the exact
    per-language percentiles via the histogram path, so the SQL twin
    value-hash-checks the exact-quantile rank arithmetic at the same time
    (supersedes the demoted ``token_count_quantiles`` row — identical
    output contract)."""
    from ..functions import sketches as sk
    from ..functions.bucketed import bounded_groupby_fold
    from ..functions.quantiles import group_quantiles_histogram

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": batch["lang"].to_numpy(),
            "n_tokens": tx.count_tokens_whitespace(batch["text"]),
        })

    # pinned: three consumers (sketch partials, exact value counts, exact
    # per-lang quantiles) must not re-tokenize the corpus
    tok = ds.map_batches(with_tokens, batch_format="pandas").materialize()  # pandas: str tokenize kernel emits (lang, n_tokens)
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    est = sk.approx_quantiles(tok, "n_tokens", qs)[None]

    # exact CDF from domain-bounded value counts (token counts per doc are
    # a small domain; the fold ships blocks × |domain| rows, no exchange)
    vc = (bounded_groupby_fold(tok, "n_tokens", sum_cols=[], count_col="cnt")
          .sort_values("n_tokens"))
    vals = vc["n_tokens"].to_numpy(np.float64)
    cum = np.cumsum(vc["cnt"].to_numpy(np.int64))
    n = int(cum[-1])
    for name, q in qs.items():
        target = max(int(np.ceil(q * n)), 1)
        err, rank_lo, rank_hi = _rank_interval_err(vals, cum, est[name],
                                                   target)
        if err > 0.05 * n:
            raise ValueError(
                f"KLL rank-error bound violated: {name} estimate "
                f"{est[name]} spans ranks [{rank_lo}, {rank_hi}]/{n}, "
                f"target {target} (err {err / n:.4f} > 0.05)")

    out = group_quantiles_histogram(
        tok, value_column="n_tokens", group_column="lang", qs=qs).to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


_MG_K = 256


def mg_heavy_hitters_bounds(sf_dir: str) -> pd.DataFrame:
    """Driver-gated Misra-Gries evidence row (VERDICT r4 #4): runs the
    DISTRIBUTED MG frequent-items sketch (≤ k counters per block, driver
    fold) over the exploded token stream of the corpus and asserts its two
    DETERMINISTIC guarantees against exact counts from the bucketed
    reduce: (1) every reported item's true count sits inside
    [count_min, count_max]; (2) every token with true count > n/(k+1) is
    present in the sketch. A violation raises — the row turns red.
    RETURNS the exact counts of the guaranteed-present heavy hitters
    (count·(k+1) > n), which the SQL twin reproduces."""
    from ..functions import sketches as sk
    from ..functions.bucketed import bucketed_groupby_agg

    ds = _rp(sf_dir, "documents", columns=["text"])

    def explode(vals: np.ndarray) -> np.ndarray:
        # split on the literal single space to match the SQL twin's
        # string_split(text, ' ') exactly (the corpus is single-spaced)
        return pd.Series(vals).str.split(" ").explode().to_numpy()

    mg = sk.approx_heavy_hitters(ds, "text", k=_MG_K, explode=explode)

    def tok(t: pa.Table) -> pa.Table:
        s = (pd.Series(t["text"].to_numpy(zero_copy_only=False))
             .str.split(" ").explode())
        return pa.table({"item": pa.array(s.to_numpy(), pa.string())})

    counts = bucketed_groupby_agg(
        ds.map_batches(tok, batch_format="pyarrow"),
        "item", {"cnt": ("item", "count")}).materialize()
    n = sum(r["cnt"] for r in
            counts.map_batches(
                lambda t: pa.table(
                    {"cnt": pa.array([pc.sum(t["cnt"]).as_py() or 0],
                                     pa.int64())}),
                batch_format="pyarrow").take_all())

    # exact counts for the sketch's items (≤ k rows) and for everything
    # above the guarantee threshold — both tiny, both filtered distributed
    mg_items = set(mg["item"])

    def pick(t: pa.Table) -> pa.Table:
        items = t["item"].to_pylist()
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        in_mg = np.fromiter((i in mg_items for i in items), bool,
                            count=len(items))
        heavy = cnt * (_MG_K + 1) > n
        return t.filter(pa.array(in_mg | heavy))

    sub = counts.map_batches(pick, batch_format="pyarrow").to_pandas()
    exact = dict(zip(sub["item"], sub["cnt"].astype(np.int64)))
    for _, row in mg.iterrows():
        e = exact.get(row["item"], 0)
        if not (row["count_min"] <= e <= row["count_max"]):
            raise ValueError(
                f"MG bound violated for {row['item']!r}: exact {e} outside "
                f"[{row['count_min']}, {row['count_max']}]")
    heavy = sub[sub["cnt"].to_numpy() * (_MG_K + 1) > n]
    missing = [i for i in heavy["item"] if i not in mg_items]
    if missing:
        raise ValueError(
            f"MG guarantee violated: {missing[:5]} exceed n/(k+1)="
            f"{n / (_MG_K + 1):.1f} but are absent from the sketch")

    out = heavy.rename(columns={"cnt": "count"})[["item", "count"]]
    out["count"] = out["count"].astype(np.int64)
    return (out.sort_values(["count", "item"], ascending=[False, True])
            .reset_index(drop=True))


def clean_corpus(sf_dir: str, quality_min: float = 0.5,
                 jaccard_threshold: float = 0.5,
                 broadcast_threshold: int = 1_000_000) -> pd.DataFrame:
    """The composed training-data prep flagship — the four corpus operators
    chained as ONE pipeline (what a 100-TB pretraining-data run actually
    executes): language-ID (actor pool) → quality filter (vectorized) →
    exact dedup (min-id per content hash) → near-dup removal (exact n-gram
    Jaccard prefix filtering; every pair's higher id is dropped — a
    deterministic, auditable policy) → per-doc stats of the surviving
    corpus. Every stage reuses an operator with its own oracle row, and the
    SQL twin composes their oracle CTEs, so the END-TO-END composition is
    value-hash-checked, not just the parts.

    Scale notes: the deduped survivor set feeds two consumers (the pair
    generator and the final anti-filter), so it is pinned with
    ``materialize()`` — at 100 TB you would write survivors to a
    partitioned lake path and read it twice (same semantics, resumable).
    The loser-id removal is hybrid: broadcast below
    ``broadcast_threshold`` ids, hash-shuffle ``left_anti`` join above
    (the anti_join_customers policy)."""
    import ray

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def score_filter(batch: pd.DataFrame) -> pd.DataFrame:
        f = tx.quality_features(batch["text"])
        batch = batch.copy()
        batch["quality"] = np.round(tx.quality_score(f), 6)
        batch["n_tokens"] = f["n_tokens"].to_numpy()
        keep = (batch["lang_pred"] == "en") & (batch["quality"] >= quality_min)
        return batch[keep]

    # pinned: exact_dedup consumes its input TWICE (winner election +
    # survivor filter) — without the pin the lang-ID actor-pool inference
    # and the quality kernel would re-execute for the second pass (at
    # 100 TB: a duplicated model-inference sweep; like the survivor set
    # below, at that scale this pin is a partitioned lake write read twice)
    kept = (docs.map_batches(tx.LangIdStage, batch_format="pandas",  # pandas: actor-pool str inference stage
                             concurrency=(1, 4))
            .map_batches(score_filter, batch_format="pandas")).materialize()  # pandas: str quality kernel + row filter
    # kept is pinned, so count() is free metadata — it upper-bounds the
    # distinct-hash cardinality and lets exact_dedup auto-pick the flat vs
    # bucketed winner election (crossover note in functions/dedup.py)
    deduped = dd.exact_dedup(
        kept, broadcast_threshold=broadcast_threshold,
        approx_rows=kept.count()).materialize()

    pairs = dd.ngram_jaccard_pairs(deduped, threshold=jaccard_threshold,
                                   concurrency=(1, 4))
    losers = pairs.select_columns(["id_b"]).materialize()
    if losers.count() <= broadcast_threshold:
        loser_ids = np.unique(np.concatenate(
            [b["id_b"].to_numpy() for b in
             losers.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        ref = ray.put(loser_ids)

        def anti(t: pa.Table) -> pa.Table:
            ids = ray.get(ref)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return t
            pos = np.searchsorted(ids, d).clip(0, len(ids) - 1)
            return t.filter(pa.array(~(ids[pos] == d)))

        survived = deduped.map_batches(anti, batch_format="pyarrow")
    else:
        # union-tag bucketed anti-join: the loser set is sparse relative to
        # the corpus, and Ray's hash-shuffle left_anti join dies on
        # schema-less EMPTY right partitions when the right side doesn't
        # cover every partition (see functions/dedup.py:anti_filter)
        survived = dd.anti_filter(deduped, losers, id_column="doc_id",
                                  bad_id_column="id_b")

    out = (survived.select_columns(
        ["doc_id", "lang_pred", "quality", "n_tokens"]).to_pandas())
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "lang_pred": pd.Series([], dtype=str),
                            "quality": pd.Series([], dtype=np.float64),
                            "n_tokens": pd.Series([], dtype=np.int64)})
    return out.sort_values("doc_id").reset_index(drop=True)


def ivf_ann_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed ANN (scale path of ann_cosine_topk; approximate).
    Centroids come from the DISTRIBUTED full-corpus spherical k-means
    (``fit_distributed``: per-block sum/count partials, one streaming pass
    per Lloyd round) so this row exercises the iterated index build, not
    just the sample seeding."""
    queries, qids = _query_vectors(sf_dir)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    params = sim.IvfIndexParams.fit_distributed(ds, nlist=16, iters=2)
    out = sim.ivf_topk(ds, params, queries, k=10, nprobe=6, query_ids=qids)
    return out[["query_id", "rank", "vec_id"]].reset_index(drop=True)


def ivf_ann_exhaustive(sf_dir: str) -> pd.DataFrame:
    """IVF machinery with ``nprobe == nlist`` (every list probed): must
    reproduce the EXACT brute-force top-k, which gives the IVF code path a
    driver-oracle-checked row; the approximate operating point stays
    ``ivf_ann_topk`` (rows-only by design, recall-tested in
    tests/test_similarity.py)."""
    queries, qids = _query_vectors(sf_dir)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    params = sim.IvfIndexParams.fit(ds, nlist=16)
    out = sim.ivf_topk(ds, params, queries, k=10, nprobe=16, query_ids=qids)
    return out[["query_id", "rank", "vec_id"]].reset_index(drop=True)


def cdc_replay_synthetic(sf_dir: str) -> pd.DataFrame:
    """The full CDC engine on a deterministic synthetic tail sized by the
    scale factor: generate → validate → partition → LWW merge → manifest
    commit → read committed lake. Rows-only for the driver; sha256-exact
    equality vs the oracle reducer is asserted in tests/test_cdc_replay.py."""
    import shutil

    from ..pipelines.cdc import CdcConfig, read_lake, replay
    from ..sources.generator import EventGenConfig, write_events

    sf_tag = sf_dir.rstrip("/").split("/")[-1]
    scale = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(sf_tag, 5_000)
    base = f"/tmp/horizon_cdc/{sf_tag}"
    shutil.rmtree(base, ignore_errors=True)
    cfg = EventGenConfig(
        n_keys=max(scale // 10, 50), n_events=scale, seed=42,
        epoch_size=max(scale // 4, 1), dup_fraction=0.02, content_mean_bytes=200,
    )
    write_events(cfg, f"{base}/events")
    replay(f"{base}/events", f"{base}/lake", CdcConfig(num_partitions=16), mode="bulk")
    out = (
        read_lake(f"{base}/lake")
        .select_columns(["repo", "path", "commit", "lang", "seq", "content_sha256"])
        .to_pandas()
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def cdc_replay_evolved(sf_dir: str) -> pd.DataFrame:
    """CDC replay with mid-stream schema evolution (add size_bytes @ epoch 2,
    rename lang→language @ epoch 3) — FIXTURES.md §3 script."""
    import shutil

    from ..pipelines.cdc import CdcConfig, read_lake, replay
    from ..sources.generator import EventGenConfig, write_events
    from ..stages.schema_evolution import SchemaScript

    sf_tag = sf_dir.rstrip("/").split("/")[-1]
    base = f"/tmp/horizon_cdc_evo/{sf_tag}"
    shutil.rmtree(base, ignore_errors=True)
    cfg = EventGenConfig(n_keys=300, n_events=4000, seed=7, epoch_size=1000,
                         content_mean_bytes=160)
    write_events(cfg, f"{base}/events")
    script = SchemaScript.from_json(
        base_fields=[("repo", pa.string()), ("path", pa.string()),
                     ("commit", pa.string()), ("lang", pa.string()),
                     ("content", pa.string())],
        script=[
            {"epoch": 2, "op": "add_column", "name": "size_bytes", "type": "int64"},
            {"epoch": 3, "op": "rename_column", "from": "lang", "to": "language"},
        ],
    )
    cdc_cfg = CdcConfig(num_partitions=8, schema_script=script)
    replay(f"{base}/events", f"{base}/lake", cdc_cfg, mode="incremental")
    out = (
        read_lake(f"{base}/lake", cfg=cdc_cfg)
        .select_columns(["repo", "path", "language", "size_bytes", "content_sha256"])
        .to_pandas()
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def fuzzy_dup_parts(sf_dir: str) -> pd.DataFrame:
    """Blocked fuzzy near-dup names (T1/J3/D3 parity): part names + planted
    one-word-edited variants; ratio ≥ 90 within (first,last)-token blocks
    only. Uses the SQL-auditable ``lev_token_sort_ratio`` scorer so the
    whole blocked-fuzzy operator is oracle-checked (DuckDB ``levenshtein``
    over the same token-sorted normalized names + the same block join); the
    reference's difflib ``token_sort_ratio`` scorer stays the default for
    `fuzzy_match_pairs` and is pytest-verified in test_fuzzy_export."""
    from ..functions.fuzzy import fuzzy_match_pairs

    ds = _rp(sf_dir, "part", columns=["p_partkey", "p_name"])

    def plant(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.less(t["p_partkey"], pa.scalar(21, pa.int64())))
        edited = pc.binary_join_element_wise(sel["p_name"], pa.scalar("x"), " ")
        return pa.table(
            {"p_partkey": pc.add(sel["p_partkey"], pa.scalar(50_000, pa.int64())),
             "p_name": edited}
        )

    corpus = ds.union(ds.map_batches(plant, batch_format="pyarrow"))
    out = fuzzy_match_pairs(corpus, name_column="p_name", id_column="p_partkey",
                            threshold=90,
                            scorer="lev_token_sort_ratio").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def cdc_lineage_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-epoch lineage/metrics from the manifest (T8/A6 parity: the
    ingestion-run records and reporter deltas of
    /root/reference/src/tracking/recorder.py:91-130 and
    etl_flow_reporter.py:439-520, read back from the commit log)."""
    import shutil

    from ..pipelines.cdc import CdcConfig, replay
    from ..sources.generator import EventGenConfig, write_events
    from ..state.manifest import ManifestStore

    sf_tag = sf_dir.rstrip("/").split("/")[-1]
    base = f"/tmp/horizon_cdc_lineage/{sf_tag}"
    shutil.rmtree(base, ignore_errors=True)
    cfg = EventGenConfig(n_keys=200, n_events=3000, seed=23, epoch_size=750,
                         content_mean_bytes=120)
    write_events(cfg, f"{base}/events")
    replay(f"{base}/events", f"{base}/lake", CdcConfig(num_partitions=8),
           mode="incremental")
    records = ManifestStore(f"{base}/lake").epoch_records()
    rows = [
        {
            "epoch": r["epoch"],
            "partitions_updated": r["metrics"].get("partitions_updated", 0),
            "live_rows": r["metrics"].get("live_rows", 0),
            "tombstones": r["metrics"].get("tombstones", 0),
        }
        for r in records
    ]
    return pd.DataFrame(rows).sort_values("epoch").reset_index(drop=True)


def doc_sections(sf_dir: str) -> pd.DataFrame:
    """M6 parity — the multi-section document parser
    (/root/reference/src/adapters/sources/lattes_parser.py:41-601): each
    document becomes a CV-shaped JSON (deterministic render the DuckDB
    oracle reproduces with word arithmetic), then the actor-pool
    ``ParseDocSections`` stage flat-maps every JSON into typed rows for the
    10 list sections plus the scalar ``info`` section. The oracle checks the
    PARSER's full output — section routing, per-section ordering, the
    info-scalar row, and the lang carry."""
    from ..stages.doc_parser import ParseDocSections, render_doc_json

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def to_json(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "doc_json": [
                render_doc_json(int(i), t, l, s)
                for i, t, l, s in zip(batch["doc_id"], batch["text"],
                                      batch["lang"], batch["source"])
            ],
        })

    out = (
        ds.map_batches(to_json, batch_format="pandas")  # pandas: serialization stage, per-row JSON by design
        .map_batches(ParseDocSections, batch_format="pyarrow",
                     concurrency=(1, 4))
        .to_pandas()
    )
    return out.sort_values(["doc_id", "section", "idx"]).reset_index(drop=True)


def sample_documents_hash(sf_dir: str, pct: int = 10) -> pd.DataFrame:
    """Deterministic hash sample (the sampling operator a 100-TB corpus
    pipeline needs and the reference lacks — SURVEY §2.8 "sampling: none"):
    keep a document iff ``md5(doc_id) mod 100 < pct``. Content-addressed,
    so the sample is REPRODUCIBLE across runs/engines and composable
    (pct=10 ⊂ pct=20), unlike ``ds.random_sample``. Runs as a pruned-read
    stateless ``map_batches`` filter — no shuffle, no driver state.

    The md5-of-decimal-string hash is chosen (over the vectorized SipHash
    in functions/hashing.py a production sampler would use) so DuckDB
    reproduces the exact same sample: ``('0x' || substr(md5(CAST(doc_id AS
    VARCHAR)),1,16))::UBIGINT % 100`` — same convention as the simhash
    word hash (functions/dedup.py)."""
    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_md5_bucket(ids, 100) < pct))

    out = (_rp(sf_dir, "documents", columns=["doc_id", "lang"])
           .map_batches(keep, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def _md5_bucket(ids: np.ndarray, mod: int) -> np.ndarray:
    """Content-addressed bucket of an integer id: first 8 md5 bytes of its
    decimal string, mod ``mod`` — the convention DuckDB reproduces with
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT % mod``
    (same scheme as the simhash word hash in functions/dedup.py). Computed
    by the vectorized single-block MD5 kernel (functions/hashing.py:
    md5_of_ints) — bit-identical to hashlib, no per-row Python."""
    from ..functions.hashing import md5_of_ints

    head, _ = md5_of_ints(np.asarray(ids))
    return (head % np.uint64(mod)).astype(np.int64)


def _tag_bench(docs, bench_mod: int = 20):
    """Add the ``bench`` flag column (content-addressed md5 slice) — the
    single source of the benchmark-slice convention shared by
    decontaminate / LM scoring / the composed flagship."""

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        flag = pa.array(_md5_bucket(ids, bench_mod) == 0)
        if "bench" in t.column_names:
            t = t.drop_columns(["bench"])
        return t.append_column("bench", flag)

    return docs.map_batches(tag, batch_format="pyarrow")


def _bench_ngram_set(tagged, n: int = 8) -> tuple[np.ndarray, frozenset]:
    """Distinct word ``n``-grams of the benchmark slice: per-batch distinct
    → driver union, bounded by the eval-suite size and independent of
    corpus scale (THE broadcast-small-side precondition). Returns
    ``(sorted_rolling_hashes, string_set)`` — the corpus side does C-speed
    searchsorted membership on the hashes and exact-verifies only the
    candidates against the strings (byte-exact vs the SQL oracle)."""

    def bench_ngrams(batch: pd.DataFrame) -> pd.DataFrame:
        rows = batch.loc[batch["bench"]]
        _, grams = tx.explode_word_ngrams(rows["doc_id"].to_numpy(),
                                          rows["text"], n)
        return pd.DataFrame({"ng": pd.unique(grams)})

    vals = pd.unique(tagged.map_batches(bench_ngrams, batch_format="pandas")  # pandas: per-block distinct n-gram explode (str.split)
                     .to_pandas()["ng"].to_numpy())
    return np.sort(tx.hash_ngram_strings(vals, n)), frozenset(vals)


def decontaminate_documents(sf_dir: str, n: int = 8,
                            bench_mod: int = 20) -> pd.DataFrame:
    """Benchmark decontamination — the overlap audit every LLM training
    pipeline runs before training (public method: n-gram collision against
    the eval suite, as in the GPT-3 appendix / C4 / Dolma pipelines): a
    corpus document is contaminated iff it shares ≥1 word ``n``-gram with
    the benchmark set, and the query reports each contaminated doc with its
    count of distinct shared n-grams. The benchmark here is the
    content-addressed md5 slice (md5(doc_id) % 20 == 0) of ``documents`` so
    the DuckDB twin rebuilds it exactly, and guaranteed-contaminated rows
    are planted by unioning the benchmark docs back into the corpus side
    under NEGATED ids ``-(doc_id + 1)`` — a range disjoint from any real
    non-negative id at any corpus size (the former ``+100_000`` shift could
    collide with real ids once the corpus reached 100k docs; ADVICE r3).

    Scale shape: the benchmark side is FIXED SIZE (an eval suite, not a
    corpus), so its distinct n-grams are reduced per batch and broadcast
    once via ``ray.put``; the 100-TB corpus side then streams through a
    stateless membership filter — NO shuffle anywhere on the big side.
    Production would compact n-grams to u64 rolling hashes before broadcast
    (8× smaller); strings are kept here so the oracle matches byte-for-byte.
    """
    import ray

    tagged = _tag_bench(_rp(sf_dir, "documents", columns=["doc_id", "text"]),
                        bench_mod)
    ref = ray.put(_bench_ngram_set(tagged, n))

    def with_planted(batch: pd.DataFrame) -> pd.DataFrame:
        # append planted copies inside the same pass — a union-with-self
        # would re-execute the read+tag plan once per branch
        rows = batch.loc[batch["bench"]].copy()
        rows["doc_id"] = -(rows["doc_id"] + 1)
        rows["bench"] = False
        return pd.concat([batch, rows], ignore_index=True)

    corpus_side = tagged.map_batches(with_planted, batch_format="pandas")  # pandas: pd.concat planted-row append

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized membership (VERDICT r3 #2): every window is hashed with
        # a rolling polynomial over token hashes (no string allocation),
        # searchsorted against the broadcast sorted hash array, and only the
        # rare candidates are materialized + exact-verified against the
        # string set — then distinct-per-doc on that small hit frame
        ref_h, ref_s = ray.get(ref)
        rows = batch.loc[~batch["bench"]]
        d, h, flat, starts = tx.explode_word_ngrams_hashed(
            rows["doc_id"].to_numpy(), rows["text"], n)
        if len(h) and len(ref_h):
            idx = np.searchsorted(ref_h, h)
            cand = np.flatnonzero(
                ref_h[np.minimum(idx, len(ref_h) - 1)] == h)
            cstr = tx.join_ngrams(flat, starts[cand], n)
            exact = np.fromiter((c in ref_s for c in cstr), dtype=bool,
                                count=len(cand))
            hd = pd.DataFrame({"d": d[cand[exact]],
                               "g": cstr[exact]}).drop_duplicates()
            counts = hd.groupby("d", sort=False).size()
            return pd.DataFrame({
                "doc_id": counts.index.to_numpy(dtype=np.int64),
                "n_hits": counts.to_numpy(dtype=np.int64),
            })
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "n_hits": pd.Series([], dtype=np.int64)})

    out = corpus_side.map_batches(hits, batch_format="pandas").to_pandas()  # pandas: n-gram membership str kernel
    return out.sort_values("doc_id").reset_index(drop=True)


def pack_sequences(sf_dir: str, window: int = 256,
                   bucket_size: int = 64) -> pd.DataFrame:
    """Sequence packing for LLM training — concat-and-chunk: the corpus is
    one token stream in ``doc_id`` order, cut into fixed ``window``-token
    training sequences; each output row is one window with how many docs and
    tokens landed in it (docs may straddle window boundaries, as in standard
    packed-pretraining data loaders).

    The global token offset of every document comes from a TWO-LEVEL PREFIX
    SUM: per-bucket partial sums (one small exchange), a driver-side
    exclusive scan over the tiny bucket table (n_docs / bucket_size rows —
    10^4 rows at 10^10 docs), broadcast offsets, then per-bucket local
    cumsums inside ``groupby(bucket).map_groups``. No stage ever holds more
    than one bucket of rows and nothing global is materialized."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
            "n": tx.count_tokens_whitespace(batch["text"]),
        })

    return pack_token_stream(docs.map_batches(counts, batch_format="pandas"),  # pandas: str token-count kernel
                             window=window, bucket_size=bucket_size)


def pack_token_stream(toks, window: int = 256,
                      bucket_size: int = 64) -> pd.DataFrame:
    """Core of ``pack_sequences`` over any Dataset of (doc_id, n) token
    counts — reusable by composed pipelines. Two-level prefix sum as
    documented there."""
    from ray.data.aggregate import Max, Min, Sum

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = batch["doc_id"].to_numpy(dtype=np.int64) // bucket_size
        return batch

    # the token table feeds two consumers (per-bucket sums, then the packing
    # groupby); pin it so the upstream pipeline — in the flagship, LM
    # inference + n-gram scans over every doc — runs once, not twice. It is
    # three int64 columns, ~24 B/doc (doc-level, never token-level), so it
    # spills through the object store long before it pressures heap.
    toks = toks.map_batches(bucketize, batch_format="pandas").materialize()  # pandas: prefix-sum partial frame
    per_bucket = (
        toks.groupby("bucket")
        .aggregate(Sum("n", alias_name="bucket_tokens"))
        .to_pandas()
        .sort_values("bucket")
    )
    excl = per_bucket["bucket_tokens"].cumsum().shift(fill_value=0)
    offsets = dict(zip(per_bucket["bucket"].astype(int), excl.astype(int)))

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        nn = g["n"].to_numpy(dtype=np.int64)
        start = offsets[int(g["bucket"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(nn[:-1])))
        end = start + nn
        w0, w1 = start // window, (end - 1) // window
        reps = (w1 - w0 + 1).astype(np.int64)
        # vectorized explode of each doc to its covered window ids
        intra = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        wid = np.repeat(w0, reps) + intra
        d = np.repeat(g["doc_id"].to_numpy(dtype=np.int64), reps)
        s, e = np.repeat(start, reps), np.repeat(end, reps)
        ov = np.minimum((wid + 1) * window, e) - np.maximum(wid * window, s)
        part = pd.DataFrame({"window_id": wid, "doc_id": d, "ov": ov})
        return (
            part.groupby("window_id")
            .agg(n_docs=("doc_id", "size"), n_tokens=("ov", "sum"),
                 first_doc=("doc_id", "min"), last_doc=("doc_id", "max"))
            .reset_index()
        )

    partial = toks.groupby("bucket").map_groups(pack_group,
                                                batch_format="pandas")  # pandas: per-bucket pack reduce
    out = (
        partial.groupby("window_id")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_tokens", alias_name="n_tokens"),
                   Min("first_doc", alias_name="first_doc"),
                   Max("last_doc", alias_name="last_doc"))
        .to_pandas()
    )
    return out.sort_values("window_id").reset_index(drop=True)


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher-family repetition quality signals (Rae et al. 2021 §A1.1):
    per document the whitespace token count, distinct-token count and the
    occurrence count of its most repeated word bigram — the integer inputs
    of the duplicate-token / most-common-n-gram fraction filters. Stateless
    vectorized ``map_batches`` (one exploded frame + two C-speed groupbys
    per batch, functions/text.py:repetition_features); no shuffle."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        return tx.repetition_features(batch["doc_id"].to_numpy(),
                                      batch["text"])

    out = docs.map_batches(feats, batch_format="pandas").to_pandas()  # pandas: vectorized str feature kernel
    return out.sort_values("doc_id").reset_index(drop=True)


def c4_line_stats(sf_dir: str) -> pd.DataFrame:
    """C4-style line-level quality filtering (Raffel et al., JMLR 2020
    §2.2): keep a line iff it ends in terminal punctuation, has ≥5
    whitespace words, and contains none of the boilerplate markers
    (javascript / lorem ipsum / cookie, case-insensitive). Returns the
    per-document line audit (total lines, kept lines, kept chars) — the
    integer inputs of the keep-document decision. The synthetic corpus has
    single-line docs, so line structure is PLANTED with a deterministic
    string rewrite both engines reproduce exactly (replace " merge " →
    ".\\nmerge "), the same plant-then-check pattern decontamination uses.
    Fully vectorized: one line explode per batch (Arrow split + flatten),
    pyarrow.compute predicates, and per-document ``np.add.reduceat``
    segment sums — no Python loop, no shuffle."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = pc.replace_substring(
            pc.fill_null(t["text"], ""), " merge ", ".\nmerge ")
        lines_list = pc.split_pattern(text, "\n")
        n_lines = pc.list_value_length(lines_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines_list)
        low = pc.utf8_lower(flat)
        keep = pc.and_(
            pc.and_(
                pc.or_(pc.or_(pc.ends_with(flat, "."),
                              pc.ends_with(flat, "!")),
                       pc.ends_with(flat, "?")),
                pc.greater_equal(
                    pc.add(pc.count_substring(flat, " "),
                           pa.scalar(1, pa.int32())),
                    pa.scalar(5, pa.int32())),
            ),
            pc.invert(pc.or_(
                pc.or_(pc.match_substring(low, "javascript"),
                       pc.match_substring(low, "lorem ipsum")),
                pc.match_substring(low, "cookie"))),
        ).to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-document segment sums over the exploded line frame
        offsets = np.concatenate(([0], np.cumsum(n_lines)[:-1]))
        kept = np.add.reduceat(keep.astype(np.int64), offsets)
        kept_chars = np.add.reduceat(chars * keep, offsets)
        # reduceat on a zero-length segment returns the NEXT element — a
        # doc can't have 0 lines here (split of "" is [""]), so offsets are
        # strictly increasing and segments are non-empty
        return pa.table({
            "doc_id": t["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(kept, pa.int64()),
            "n_chars_kept": pa.array(kept_chars, pa.int64()),
        })

    out = docs.map_batches(stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def mixture_sample_documents(sf_dir: str) -> pd.DataFrame:
    """Data mixing — per-source sampling rates, the mixture-weighting step of
    LLM corpus assembly (public method: source-weighted sampling as in the
    Pile / Dolma mixture recipes). Each source ``src<i>`` gets a target rate
    of ``100 - 4*i`` percent and a document survives iff its
    content-addressed md5 bucket falls under its source's rate — so the
    mixture is REPRODUCIBLE (same doc set every run/engine) and composable
    with the plain hash sample (same bucket convention). Stateless pruned
    read + vectorized filter; no shuffle, no driver state."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "source"])

    def keep(t: pa.Table) -> pa.Table:  # Arrow-native filter (VERDICT r3 #8)
        rate = pc.subtract(
            pa.scalar(100, pa.int64()),
            pc.multiply(
                pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 64),
                        pa.int64()),
                pa.scalar(4, pa.int64())))
        bucket = _md5_bucket(t["doc_id"].to_numpy(zero_copy_only=False), 100)
        return t.filter(pc.less(pa.array(bucket), rate))

    out = docs.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def shuffled_head_documents(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Deterministic global shuffle for training export: order the corpus by
    the md5 of its doc_id (content-addressed ⇒ reproducible across engines
    and restarts, unlike ``random_shuffle``) and take the head. Runs as a
    distributed range-partition ``Dataset.sort`` on the hash key + streamed
    ``limit`` — at 100 TB this is exactly how the training-order shuffle
    ships (sort by hash, write in key ranges); rank is assigned to the tiny
    k-row result on the driver. The key stage uses the vectorized MD5
    kernel (functions/hashing.py:md5_hex_of_ints)."""
    from ..functions.hashing import md5_hex_of_ints

    docs = _rp(sf_dir, "documents", columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        # Arrow string key: the sort exchange on a pandas object column is
        # ~8× slower than on an Arrow string column (dup_span finding)
        ks = md5_hex_of_ints(t["doc_id"].to_numpy(zero_copy_only=False))
        # drop pandas schema metadata: its dict payload defeats Ray's
        # schema-dedup hashing in the sort exchange (warning noise)
        return t.replace_schema_metadata(None).append_column(
            "shuffle_key", pa.array(list(ks), pa.string()))

    head = (
        docs.map_batches(key, batch_format="pyarrow")
        .sort(["shuffle_key", "doc_id"])
        .limit(k)
        .to_pandas()
    )
    head = head.sort_values(["shuffle_key", "doc_id"]).reset_index(drop=True)
    head["rank"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head[["rank", "doc_id", "shuffle_key"]]


def _fit_bigram_lm(tagged) -> np.ndarray:
    """Fit the add-one-smoothed byte-bigram LM on the benchmark slice of a
    ``tagged`` Dataset (bench flag column): distributed per-batch
    ``np.bincount`` partials (≤65,536 cells regardless of corpus size)
    reduced on the driver. Returns the 65,536-entry log-prob table."""

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        pair_codes = []
        chars: set[int] = set()
        for t in batch.loc[batch["bench"], "text"].fillna(""):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            chars.update(np.unique(b).tolist())
            if len(b) >= 2:
                pair_codes.append(b[:-1].astype(np.int64) * 256 + b[1:])
        # chars must be emitted even when this block contributed no bigrams
        # (all its bench docs shorter than 2 bytes) — dropping them would
        # make the vocab, and thus the smoothing denominator, depend on
        # block boundaries and diverge from the SQL oracle
        ch = np.fromiter(chars, dtype=np.int64, count=len(chars))
        if pair_codes:
            counts = np.bincount(np.concatenate(pair_codes), minlength=0)
            nz = np.flatnonzero(counts)
        else:
            counts = np.zeros(0, dtype=np.int64)
            nz = np.zeros(0, dtype=np.int64)
        return pd.DataFrame({
            "pair": np.concatenate([nz, np.full(len(ch), -1)]),
            "n": np.concatenate([counts[nz] if len(nz) else nz,
                                 np.zeros(len(ch), np.int64)]),
            "ch": np.concatenate([np.full(len(nz), -1), ch]),
        })

    model_rows = (tagged.map_batches(partial_counts, batch_format="pandas")  # pandas: bincount partial frame
                  .to_pandas())
    return _reduce_lm(model_rows)


def _reduce_lm(model_rows: pd.DataFrame) -> np.ndarray:
    pairs = (model_rows[model_rows["pair"] >= 0]
             .groupby("pair")["n"].sum())
    vocab = int(model_rows.loc[model_rows["ch"] >= 0, "ch"].nunique())
    cnt = np.zeros(65536, dtype=np.int64)
    cnt[pairs.index.to_numpy()] = pairs.to_numpy()
    c1_tot = cnt.reshape(256, 256).sum(axis=1)  # total per first byte
    # vocab ≥ 1 so an empty benchmark slice degrades to the uniform model
    # instead of dividing by zero
    return np.log((cnt.reshape(256, 256) + 1.0)
                  / (c1_tot[:, None] + float(max(vocab, 1)))).reshape(-1)


def _fit_lm_and_ngrams(tagged, n: int = 8) -> tuple:
    """One fused pass over the benchmark slice producing BOTH broadcast
    artifacts of the composed flagship — the bigram-count partials and the
    distinct n-grams — so the corpus is scanned once, not twice, before the
    keep stage."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        bench_rows = batch.loc[batch["bench"]]
        pair_codes = []
        chars: set[int] = set()
        for t in bench_rows["text"].fillna(""):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            chars.update(np.unique(b).tolist())
            if len(b) >= 2:
                pair_codes.append(b[:-1].astype(np.int64) * 256 + b[1:])
        ch = np.fromiter(chars, dtype=np.int64, count=len(chars))
        if pair_codes:
            counts = np.bincount(np.concatenate(pair_codes), minlength=0)
            nz = np.flatnonzero(counts)
        else:
            nz = np.zeros(0, dtype=np.int64)
        _, grams = tx.explode_word_ngrams(bench_rows["doc_id"].to_numpy(),
                                          bench_rows["text"], n)
        ng_list = pd.unique(grams).tolist()
        m = len(nz) + len(ch)
        return pd.DataFrame({
            "pair": np.concatenate([nz, np.full(len(ch), -1),
                                    np.full(len(ng_list), -1)]),
            "n": np.concatenate([counts[nz] if len(nz) else nz,
                                 np.zeros(len(ch) + len(ng_list), np.int64)]),
            "ch": np.concatenate([np.full(len(nz), -1), ch,
                                  np.full(len(ng_list), -1)]),
            "ng": [None] * m + ng_list,
        })

    rows = tagged.map_batches(partials, batch_format="pandas").to_pandas()  # pandas: per-block count partials
    logp = _reduce_lm(rows)
    vals = pd.unique(rows.loc[rows["ng"].notna(), "ng"].to_numpy())
    return logp, np.sort(tx.hash_ngram_strings(vals, n)), frozenset(vals)


def bigram_lm_scores(sf_dir: str, bench_mod: int = 20) -> pd.DataFrame:
    """Model-based quality scoring — the train → broadcast → batched-infer
    shape of LM-likelihood corpus filtering (public method: KenLM-style
    perplexity filters as in CCNet/C4): fit a character-bigram language
    model on the content-addressed benchmark slice (md5(doc_id) % 20 == 0),
    then score every other document by its mean add-one-smoothed bigram log
    likelihood.

    Scale shape: TRAIN is a distributed count — per-batch partial
    ``np.bincount`` over byte-pair codes (≤65,536 cells regardless of corpus
    size) reduced by one tiny groupby; the fitted table (bounded: 64Ki
    floats) is broadcast ONCE via ``ray.put``; INFERENCE is a stateless
    vectorized ``map_batches`` (numpy gather + mean per doc). Exactly the
    batched-model-inference pattern, with the model small enough that the
    oracle can refit it in SQL.

    Byte=char precondition: the engine models BYTE bigrams, the SQL twin
    CHARACTER bigrams — identical on the pure-ASCII test corpus (the same
    precondition multimodal_byte_features and doc_fingerprints assert);
    production text would drop the SQL twin, not the byte model."""
    import ray

    tagged = _tag_bench(_rp(sf_dir, "documents", columns=["doc_id", "text"]),
                        bench_mod)
    ref = ray.put(_fit_bigram_lm(tagged))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized inference: one encoded byte stream + one groupby-mean
        # per batch (functions/text.py:byte_bigram_scores); docs <2 bytes
        # have no pairs and are omitted, matching the oracle's NOT-NULL join
        lp = ray.get(ref)
        rows = batch.loc[~batch["bench"]]
        return tx.byte_bigram_scores(rows["doc_id"].to_numpy(),
                                     rows["text"], lp)

    out = tagged.map_batches(score, batch_format="pandas").to_pandas()  # pandas: vectorized str log-prob kernel
    return out.sort_values("doc_id").reset_index(drop=True)


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Corpus-statistics operator: top-``k`` TF-IDF terms per document.
    Document frequency is a distributed aggregate over DISTINCT (doc,term)
    pairs — each document lives in exactly one row, so per-batch distinct
    pairs are globally distinct and the exchange carries one row per pair,
    pre-shrunk. The IDF table (vocabulary-sized, bounded) is broadcast once
    via ``ray.put``; scoring + ranking is then a stateless per-batch pandas
    groupby with a deterministic tiebreak (score desc, term asc).
    At 100 TB the DF exchange is the only wide step and it ships (term,1)
    partials; the per-doc ranking never shuffles."""
    import ray

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    B = 32

    def df_partial(t: pa.Table) -> pa.Table:
        # per-block PARTIAL document-frequency counts: each doc lives in
        # one row, so distinct (doc,term) within the block is globally
        # distinct and value_counts(term) is a mergeable DF partial.
        # Two-level bucketed reduce (the dup_span/vocab pattern — a flat
        # vocab-cardinality groupby pays per-group overhead).
        batch = t.to_pandas()
        toks = batch["text"].fillna("").str.split(" ")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        long = pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), lens),
            "term": np.concatenate(toks.to_numpy()),
        }).drop_duplicates()
        vc = long["term"].value_counts()
        terms = vc.index.to_numpy(dtype=object)
        h = pd.util.hash_array(terms)
        return pa.table({"term": pa.array(terms.tolist(), pa.string()),
                         "df": pa.array(vc.to_numpy(np.int64), pa.int64()),
                         "_b": pa.array((h % B).astype(np.int64),
                                        pa.int64())})

    def df_reduce(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("term", sort=False)["df"].sum()
        return pd.DataFrame({"term": s.index.to_numpy(dtype=object),
                             "df": s.to_numpy(np.int64)})

    df_tbl = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("_b").map_groups(df_reduce, batch_format="pandas")
              .to_pandas())
    idf = dict(zip(df_tbl["term"],
                   np.log(float(n_docs) / df_tbl["df"].to_numpy())))
    ref = ray.put(idf)

    def topk(batch: pd.DataFrame) -> pd.DataFrame:
        idf_map = ray.get(ref)
        toks = batch["text"].fillna("").str.split(" ")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        long = pd.DataFrame({
            "doc_id": np.repeat(batch["doc_id"].to_numpy(np.int64), lens),
            "term": np.concatenate(toks.to_numpy()),
        })
        tf = (long.groupby(["doc_id", "term"], sort=False)
              .size().rename("tf").reset_index())
        tf["score"] = np.round(
            tf["tf"].to_numpy(np.float64)
            * tf["term"].map(idf_map).to_numpy(np.float64), 6)
        tf = tf.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True])
        tf["rank"] = tf.groupby("doc_id", sort=False).cumcount() + 1
        out = tf[tf["rank"] <= k]
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(np.int64),
            "rank": out["rank"].to_numpy(np.int64),
            "term": out["term"].to_numpy(),
            "score": out["score"].to_numpy(np.float64),
        })

    out = docs.map_batches(topk, batch_format="pandas").to_pandas()  # pandas: per-doc TF-IDF top-k explode
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


def chunk_documents(sf_dir: str, window: int = 200,
                    stride: int = 150) -> pd.DataFrame:
    """RAG-style document chunking with overlap: each document becomes
    ceil-strided character windows (``window`` chars every ``stride``,
    final chunk truncated), the 1→N explode every retrieval pipeline runs
    before embedding. Stateless vectorized ``map_batches`` — the chunk
    table (ints only; the chunk TEXT would be sliced in the embed stage,
    zero-copy from the same block) never shuffles."""
    docs = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_chars"].to_numpy(dtype=np.int64)
        k = np.where(n <= window, 1,
                     1 + (n - window + stride - 1) // stride)
        ids = np.repeat(batch["doc_id"].to_numpy(np.int64), k)
        total = int(k.sum())
        idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(k)[:-1])), k)
        start = idx * stride
        length = np.minimum(window, np.repeat(n, k) - start)
        return pd.DataFrame({"doc_id": ids, "chunk_idx": idx,
                             "start": start, "chunk_len": length})

    out = docs.map_batches(chunks, batch_format="pandas").to_pandas()  # pandas: 1-to-N chunk explode
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def prepare_training_set(sf_dir: str, lm_min: float = -1.8,
                         ngram_n: int = 8, window: int = 256) -> pd.DataFrame:
    """The composed LLM data-prep flagship — the NEW operator family chained
    as one pipeline (what a pretraining-data run executes after cleaning):
    fit the bigram LM on the benchmark slice and score every corpus doc
    (``bigram_lm_scores``) → drop docs sharing an 8-gram with the benchmark
    (``decontaminate_documents``, natural contamination only — no planting
    here) → apply per-source mixture rates (``mixture_sample_documents``) →
    pack the survivors into fixed ``window``-token training sequences
    (``pack_sequences``). Every stage reuses an operator with its own
    oracle row and the SQL twin composes their CTEs, so the END-TO-END
    composition is value-hash-checked.

    Scale shape: ONE fused stateless filter stage computes all three keep
    signals per batch (model + benchmark n-grams broadcast once via
    ``ray.put``); the only exchanges are the two tiny aggregates of the
    pack's two-level prefix sum. Nothing global is materialized."""
    import ray

    tagged = _tag_bench(
        _rp(sf_dir, "documents", columns=["doc_id", "text", "source"]))
    ref = ray.put(_fit_lm_and_ngrams(tagged, ngram_n))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized keep (VERDICT r3 #2): cheap filters first
        # (mixture bucket), then one batched LM inference, then rolling-hash
        # n-gram membership with exact verify — no per-row Python anywhere
        lp, bng_h, bng_s = ray.get(ref)
        rows = batch.loc[~batch["bench"]]
        rate = 100 - rows["source"].str.slice(3).astype(np.int64) * 4
        mix_ok = _md5_bucket(rows["doc_id"].to_numpy(), 100) < rate.to_numpy()
        rows = rows.loc[mix_ok]
        sc = tx.byte_bigram_scores(rows["doc_id"].to_numpy(), rows["text"],
                                   lp)  # docs <2 bytes unscored → dropped
        good = sc.loc[sc["lm_score"] >= lm_min, "doc_id"].to_numpy()
        rows = rows.loc[rows["doc_id"].isin(good)]
        d, h, flat, starts = tx.explode_word_ngrams_hashed(
            rows["doc_id"].to_numpy(), rows["text"], ngram_n)
        if len(h) and len(bng_h):
            idx = np.searchsorted(bng_h, h)
            cand = np.flatnonzero(
                bng_h[np.minimum(idx, len(bng_h) - 1)] == h)
            cstr = tx.join_ngrams(flat, starts[cand], ngram_n)
            exact = np.fromiter((c in bng_s for c in cstr), dtype=bool,
                                count=len(cand))
            rows = rows.loc[~rows["doc_id"].isin(d[cand[exact]])]
        return pd.DataFrame({
            "doc_id": rows["doc_id"].to_numpy(dtype=np.int64),
            "n": tx.count_tokens_whitespace(rows["text"]),
        })

    return pack_token_stream(tagged.map_batches(keep, batch_format="pandas"),  # pandas: mixture keep + str token kernel
                             window=window)


ORACLE_SQL: dict[str, str] = {
    "chunk_documents": """
        WITH k AS (
            SELECT doc_id, n_chars,
                   CASE WHEN n_chars <= 200 THEN 1
                        ELSE 1 + (n_chars - 200 + 149) // 150 END AS k
            FROM documents
        )
        SELECT doc_id,
               unnest(generate_series(0, k - 1)) AS chunk_idx,
               unnest(generate_series(0, k - 1)) * 150 AS start,
               least(200, n_chars - unnest(generate_series(0, k - 1)) * 150)
                   AS chunk_len
        FROM k ORDER BY doc_id, chunk_idx
    """,
    "tfidf_top_terms": """
        WITH long AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM long GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM long GROUP BY term
        ), n AS (
            SELECT count(*) * 1.0 AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln((SELECT n_docs FROM n) / df.df), 6)
                       AS score
            FROM tf JOIN df USING (term)
        ), ranked AS (
            SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term) AS rank
            FROM scored
        )
        SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank
    """,
    "prepare_training_set": """
        WITH tagged AS (
            SELECT doc_id, text, source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       ::UBIGINT % 20 = 0 AS bench
            FROM documents
        ), bpairs AS (
            SELECT substr(text, i, 1) AS c1, substr(text, i + 1, 1) AS c2
            FROM (SELECT text,
                         unnest(generate_series(1, length(text) - 1)) AS i
                  FROM tagged WHERE bench)
        ), model AS (
            SELECT c1, c2, count(*) AS n FROM bpairs GROUP BY c1, c2
        ), c1tot AS (
            SELECT c1, sum(n) AS tot FROM model GROUP BY c1
        ), vocab AS (
            SELECT count(DISTINCT ch) AS v FROM (
                SELECT substr(text, i, 1) AS ch
                FROM (SELECT text,
                             unnest(generate_series(1, length(text))) AS i
                      FROM tagged WHERE bench))
        ), cpairs AS (
            SELECT doc_id, substr(text, i, 1) AS c1,
                   substr(text, i + 1, 1) AS c2
            FROM (SELECT doc_id, text,
                         unnest(generate_series(1, length(text) - 1)) AS i
                  FROM tagged WHERE NOT bench AND length(text) >= 2)
        ), scores AS (
            SELECT doc_id,
                   round(avg(ln((COALESCE(m.n, 0) + 1.0)
                       / (COALESCE(t.tot, 0) + (SELECT v FROM vocab)))),
                       6) AS lm_score
            FROM cpairs p
            LEFT JOIN model m ON p.c1 = m.c1 AND p.c2 = m.c2
            LEFT JOIN c1tot t ON p.c1 = t.c1
            GROUP BY doc_id
        ), bng AS (
            SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS ng
            FROM (SELECT string_split(text, ' ') AS w,
                         unnest(generate_series(
                             1, len(string_split(text, ' ')) - 7)) AS i
                  FROM tagged WHERE bench)
        ), contaminated AS (
            SELECT DISTINCT doc_id FROM (
                SELECT d.doc_id, array_to_string(w[i:i+7], ' ') AS ng
                FROM (SELECT doc_id, string_split(text, ' ') AS w,
                             unnest(generate_series(
                                 1, len(string_split(text, ' ')) - 7)) AS i
                      FROM tagged WHERE NOT bench) d)
            WHERE ng IN (SELECT ng FROM bng)
        ), kept AS (
            SELECT g.doc_id,
                   array_length(string_split(g.text, ' ')) AS n
            FROM tagged g JOIN scores s USING (doc_id)
            WHERE NOT g.bench
              AND ('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 16))
                  ::UBIGINT % 100
                  < 100 - CAST(substr(g.source, 4) AS BIGINT) * 4
              AND s.lm_score >= -1.8
              AND g.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), c AS (
            SELECT doc_id, n,
                   CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS s
            FROM kept
        ), p AS (
            SELECT doc_id, n, s,
                   unnest(generate_series(s // 256, (s + n - 1) // 256))
                       AS window_id
            FROM c
        )
        SELECT window_id, count(*) AS n_docs,
               CAST(sum(least((window_id + 1) * 256, s + n)
                        - greatest(window_id * 256, s)) AS BIGINT)
                   AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM p GROUP BY window_id ORDER BY window_id
    """,
    "bigram_lm_scores": """
        WITH tagged AS (
            SELECT doc_id, text,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       ::UBIGINT % 20 = 0 AS bench
            FROM documents
        ), bpairs AS (
            SELECT substr(text, i, 1) AS c1, substr(text, i + 1, 1) AS c2
            FROM (SELECT text,
                         unnest(generate_series(1, length(text) - 1)) AS i
                  FROM tagged WHERE bench)
        ), model AS (
            SELECT c1, c2, count(*) AS n FROM bpairs GROUP BY c1, c2
        ), c1tot AS (
            SELECT c1, sum(n) AS tot FROM model GROUP BY c1
        ), vocab AS (
            SELECT count(DISTINCT ch) AS v FROM (
                SELECT substr(text, i, 1) AS ch
                FROM (SELECT text,
                             unnest(generate_series(1, length(text))) AS i
                      FROM tagged WHERE bench))
        ), cpairs AS (
            SELECT doc_id, substr(text, i, 1) AS c1,
                   substr(text, i + 1, 1) AS c2
            FROM (SELECT doc_id, text,
                         unnest(generate_series(1, length(text) - 1)) AS i
                  FROM tagged WHERE NOT bench AND length(text) >= 2)
        )
        SELECT doc_id,
               round(avg(ln((COALESCE(m.n, 0) + 1.0)
                            / (COALESCE(t.tot, 0) + (SELECT v FROM vocab)))),
                     6) AS lm_score
        FROM cpairs p
        LEFT JOIN model m ON p.c1 = m.c1 AND p.c2 = m.c2
        LEFT JOIN c1tot t ON p.c1 = t.c1
        GROUP BY doc_id ORDER BY doc_id
    """,
    "mixture_sample_documents": """
        SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % 100 < 100 - CAST(substr(source, 4) AS BIGINT) * 4
        ORDER BY doc_id
    """,
    "shuffled_head_documents": """
        SELECT row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                  doc_id) AS rank,
               doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
        ORDER BY rank LIMIT 50
    """,
    "decontaminate_documents": """
        WITH b AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                  ::UBIGINT % 20 = 0
        ), corp AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                  ::UBIGINT % 20 <> 0
            UNION ALL
            SELECT -(doc_id + 1) AS doc_id, w FROM b
        ), bng AS (
            SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS ng
            FROM (SELECT w, unnest(generate_series(1, len(w) - 7)) AS i
                  FROM b)
        ), cng AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS ng
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 7)) AS i
                  FROM corp)
        )
        SELECT doc_id, count(*) AS n_hits
        FROM cng JOIN bng USING (ng)
        GROUP BY doc_id ORDER BY doc_id
    """,
    "pack_sequences": """
        WITH t AS (
            SELECT doc_id, array_length(string_split(text, ' ')) AS n
            FROM documents
        ), c AS (
            SELECT doc_id, n,
                   CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS s
            FROM t
        ), p AS (
            SELECT doc_id, n, s,
                   unnest(generate_series(s // 256, (s + n - 1) // 256))
                       AS window_id
            FROM c
        )
        SELECT window_id, count(*) AS n_docs,
               CAST(sum(least((window_id + 1) * 256, s + n)
                        - greatest(window_id * 256, s)) AS BIGINT)
                   AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM p GROUP BY window_id ORDER BY window_id
    """,
    "repetition_stats": """
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), tok AS (
            SELECT doc_id, unnest(w) AS t FROM ws
        ), dst AS (
            SELECT doc_id, count(DISTINCT t) AS n_distinct
            FROM tok GROUP BY doc_id
        ), bi AS (
            SELECT doc_id, w[i] || ' ' || w[i + 1] AS bg
            FROM (SELECT doc_id, w,
                         unnest(generate_series(1, len(w) - 1)) AS i
                  FROM ws)
        ), bc AS (
            SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg
        ), top AS (
            SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY doc_id
        )
        SELECT ws.doc_id, len(w) AS n_tokens, dst.n_distinct,
               COALESCE(top.top_bigram_n, 0) AS top_bigram_n
        FROM ws JOIN dst USING (doc_id) LEFT JOIN top USING (doc_id)
        ORDER BY doc_id
    """,
    "sample_documents_hash": """
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
              % 100 < 10
        ORDER BY doc_id
    """,
    "doc_sections": """
        WITH w AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) - 1 AS j
            FROM documents
        ), s(sid, section) AS (
            SELECT * FROM (VALUES (0, 'projects'), (1, 'research_projects'),
                                  (2, 'extension_projects'), (3, 'articles'),
                                  (4, 'conference_papers'), (5, 'education'),
                                  (6, 'awards'), (7, 'languages'),
                                  (8, 'professional_activities'),
                                  (9, 'technical_productions')) t(sid, section)
        ), items AS (
            SELECT w.doc_id, s.section, w.j // 12 AS idx, w.word AS title,
                   w.lang
            FROM w JOIN s ON w.j % 12 = s.sid
            WHERE w.j // 12 < 5
        ), info AS (
            SELECT doc_id, 'info' AS section, CAST(0 AS BIGINT) AS idx,
                   source AS title, lang
            FROM documents
        )
        SELECT doc_id, section, idx, title, lang FROM items
        UNION ALL SELECT doc_id, section, idx, title, lang FROM info
        ORDER BY doc_id, section, idx
    """,
    "token_counts": """
        SELECT doc_id, array_length(string_split(text, ' ')) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "token_counts_bpeish": """
        SELECT doc_id,
               len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "quality_stats": """
        WITH f AS (
            SELECT doc_id,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        )
        SELECT doc_id, n_tokens,
               (n_chars - (n_tokens - 1)) * 1.0 / greatest(n_tokens, 1)
                   AS mean_token_len,
               n_alpha * 1.0 / greatest(n_chars, 1) AS alpha_ratio
        FROM f ORDER BY doc_id
    """,
    "exact_dedup_documents": """
        WITH corpus AS (
            SELECT doc_id, text, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 10000, text, n_chars FROM documents
        )
        SELECT min(doc_id) AS doc_id, min(n_chars) AS n_chars
        FROM corpus GROUP BY text ORDER BY doc_id
    """,
    # character-level entropy == byte-level entropy on the pure-ASCII test
    # corpus (precondition asserted in the query, as for doc_fingerprints)
    "multimodal_byte_features": """
        WITH c AS (
            SELECT doc_id,
                   unnest([text[i]
                           for i in generate_series(1, length(text))]) AS ch
            FROM documents WHERE length(text) > 0
        ), h AS (
            SELECT doc_id, ch, count(*) * 1.0 AS n
            FROM c GROUP BY doc_id, ch
        ), t AS (
            SELECT doc_id, sum(n) AS total FROM h GROUP BY doc_id
        )
        SELECT h.doc_id,
               CAST(any_value(t.total) AS BIGINT) AS size_bytes,
               count(*) AS n_distinct_bytes,
               round(-sum((h.n / t.total) * log2(h.n / t.total)), 6)
                   AS entropy
        FROM h JOIN t ON h.doc_id = t.doc_id
        GROUP BY h.doc_id ORDER BY h.doc_id
    """,
    "multimodal_meta": """
        SELECT doc_id, octet_length(encode(text)) AS size_bytes
        FROM documents ORDER BY doc_id
    """,
    "quality_scores": """
        WITH f AS (
            SELECT doc_id,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   regexp_extract_all(lower(text), '\\w+') AS ws
            FROM documents
        ), r AS (
            SELECT doc_id,
                   least(n_tokens / 50.0, 1.0) AS length_ok,
                   least((n_alpha * 1.0 / greatest(n_chars, 1)) * 1.25, 1.0)
                       AS alpha,
                   least((len(list_filter(ws, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','are','this')))
                       * 1.0 / greatest(len(ws), 1)) * 4.0, 1.0) AS stop
            FROM f
        )
        SELECT doc_id,
               round(0.4 * length_ok + 0.3 * alpha + 0.3 * stop, 6) AS quality
        FROM r ORDER BY doc_id
    """,
    # per-language median gate: identical quality + q6 arithmetic as the
    # Ray side (6-dp round then integer micro-quality), identical rank
    # convention as token_count_quantiles (r = max(ceil(0.5·n), 1)).
    "percentile_quality_filter": """
        WITH f AS (
            SELECT doc_id, lang,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   regexp_extract_all(lower(text), '\\w+') AS ws
            FROM documents
        ), s AS (
            SELECT doc_id, lang,
                   round(0.4 * least(n_tokens / 50.0, 1.0)
                       + 0.3 * least((n_alpha * 1.0 / greatest(n_chars, 1))
                                     * 1.25, 1.0)
                       + 0.3 * least((len(list_filter(ws, x -> x IN
                           ('the','and','of','to','a','in','is','that','it',
                            'for','on','with','as','are','this')))
                           * 1.0 / greatest(len(ws), 1)) * 4.0, 1.0),
                       6) AS quality
            FROM f
        ), q AS (
            SELECT doc_id, lang, quality,
                   CAST(round(quality * 1000000) AS BIGINT) AS q6
            FROM s
        ), c AS (
            SELECT lang, count(*) AS n FROM q GROUP BY lang
        ), r AS (
            SELECT lang, q6,
                   row_number() OVER (PARTITION BY lang ORDER BY q6) AS rk
            FROM q
        ), m AS (
            SELECT r.lang, max(CASE WHEN rk = greatest(
                       CAST(ceil(0.5 * c.n) AS BIGINT), 1)
                       THEN q6 END) AS p50
            FROM r JOIN c USING (lang) GROUP BY r.lang
        )
        SELECT q.doc_id, q.lang, q.quality
        FROM q JOIN m ON q.lang = m.lang
        WHERE q.q6 >= m.p50
        ORDER BY doc_id
    """,
    # same md5 convention as the Ray side; split boundaries are integer
    # bucket comparisons so no float boundary can flip membership
    "split_documents": """
        WITH b AS (
            SELECT lang,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       ::UBIGINT % 100 AS bucket
            FROM documents
        )
        SELECT lang,
               CASE WHEN bucket < 10 THEN 'test'
                    WHEN bucket < 20 THEN 'val'
                    ELSE 'train' END AS split,
               count(*) AS n_docs
        FROM b GROUP BY 1, 2 ORDER BY lang, split
    """,
    # exact column profile; the Ray side counts distinct over the string
    # CAST of each column (injective, so counts match the native-type
    # count(DISTINCT)); nulls excluded from distinct per SQL semantics.
    "profile_documents": """
        SELECT 'doc_id' AS col_name, count(*) AS n_rows,
               count(*) - count(doc_id) AS n_null,
               count(DISTINCT doc_id) AS n_distinct FROM documents
        UNION ALL
        SELECT 'lang', count(*), count(*) - count(lang),
               count(DISTINCT lang) FROM documents
        UNION ALL
        SELECT 'n_chars', count(*), count(*) - count(n_chars),
               count(DISTINCT n_chars) FROM documents
        UNION ALL
        SELECT 'source', count(*), count(*) - count(source),
               count(DISTINCT source) FROM documents
        UNION ALL
        SELECT 'text', count(*), count(*) - count(text),
               count(DISTINCT text) FROM documents
        ORDER BY col_name
    """,
    # per-source budget cut in md5(doc_id) order: the window's exclusive
    # running sum is the Ray side's "prior tokens" prefix sum; same
    # (h, doc_id) tie order, same engine-wide md5 convention.
    "token_budget_sample": """
        WITH t AS (
            SELECT doc_id, source,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                       ::UBIGINT AS h
            FROM documents
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS prior
            FROM t
        )
        SELECT doc_id, source, n_tokens FROM c
        WHERE prior < 400 ORDER BY doc_id
    """,
    "domain_quality_filter": """
        WITH base AS (
            SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 70000 AS doc_id, '!!! ??? !!!' AS text,
                   'srcbad' AS source
            FROM documents WHERE doc_id < 12
        ), f AS (
            SELECT doc_id, source,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   regexp_extract_all(lower(text), '\\w+') AS ws
            FROM base
        ), r AS (
            SELECT doc_id, source,
                   least(n_tokens / 50.0, 1.0) AS length_ok,
                   least((n_alpha * 1.0 / greatest(n_chars, 1)) * 1.25, 1.0)
                       AS alpha,
                   least((len(list_filter(ws, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','are','this')))
                       * 1.0 / greatest(len(ws), 1)) * 4.0, 1.0) AS stop
            FROM f
        ), q AS (
            SELECT doc_id, source,
                   round(0.4 * length_ok + 0.3 * alpha + 0.3 * stop, 6)
                       AS quality
            FROM r
        ), scored AS (
            SELECT doc_id, source, quality,
                   CAST(round(quality * 1000000) AS BIGINT) AS q6
            FROM q
        ), good AS (
            SELECT source FROM scored GROUP BY source
            HAVING sum(q6) >= count(*) * 500000
        )
        SELECT doc_id, source, quality FROM scored
        WHERE source IN (SELECT source FROM good)
        ORDER BY doc_id
    """,
    "embedding_near_dup_pairs": """
        WITH base AS (SELECT vec_id, embedding FROM embeddings),
        planted AS (
            SELECT vec_id + 50000 AS vec_id, embedding FROM base
            WHERE vec_id < 20
        ),
        u AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM u a JOIN u b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.999
        ORDER BY id_a, id_b
    """,
    "lang_id_confusion": """
        WITH w AS (
            SELECT lang, regexp_extract_all(lower(text), '\\w+') AS ws
            FROM documents
        ), s AS (
            SELECT lang, greatest(len(ws), 1) AS nw,
                   len(list_filter(ws, x -> x IN
                       ('der','die','und','das','von','zu','den','mit','ist',
                        'im','für','auf','des','ein'))) * 1.0 AS c_de,
                   len(list_filter(ws, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','are','this'))) * 1.0 AS c_en,
                   len(list_filter(ws, x -> x IN
                       ('el','la','de','que','y','en','los','del','se','las',
                        'por','un','con','una','es','para'))) * 1.0 AS c_es,
                   len(list_filter(ws, x -> x IN
                       ('le','la','de','et','les','des','en','un','une','du',
                        'que','pour','dans','ce','il'))) * 1.0 AS c_fr,
                   len(list_filter(ws, x -> x IN
                       ('o','a','de','que','e','do','da','em','um','para',
                        'com','não','uma','os','no','se'))) * 1.0 AS c_pt
            FROM w
        ), p AS (
            SELECT lang,
                   CASE
                     WHEN greatest(c_de, c_en, c_es, c_fr, c_pt) = 0 THEN 'und'
                     WHEN c_de / nw >= c_en / nw AND c_de / nw >= c_es / nw
                      AND c_de / nw >= c_fr / nw AND c_de / nw >= c_pt / nw
                       THEN 'de'
                     WHEN c_en / nw >= c_es / nw AND c_en / nw >= c_fr / nw
                      AND c_en / nw >= c_pt / nw THEN 'en'
                     WHEN c_es / nw >= c_fr / nw AND c_es / nw >= c_pt / nw
                       THEN 'es'
                     WHEN c_fr / nw >= c_pt / nw THEN 'fr'
                     ELSE 'pt'
                   END AS lang_pred
            FROM s
        )
        SELECT lang, lang_pred, count(*) AS n FROM p
        GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
    # LSH near-dup: the banding parameters make the candidate sets exact for
    # these thresholds (simhash: hamming ≤ 3 < 4 chunks ⇒ pigeonhole; minhash:
    # verified-Jaccard output coincides with the brute-force pair scan on this
    # corpus — both checked end-to-end in tests), so a brute-force SQL oracle
    # reproduces the full operator output.
    "minhash_dedup_pairs": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 50000, text || ' nearduplicate' FROM documents
            WHERE doc_id < 25
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) < 5
                        THEN [array_to_string(ws, ' ')]
                        ELSE [array_to_string(ws[i:i+4], ' ')
                              for i in generate_series(1, len(ws) - 4)] END) AS s
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
                  FROM corpus)
        ), j AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s)) * 1.0 /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.5
        ORDER BY id_a, id_b
    """,
    # exact-quantile twin: same rank convention (r = max(ceil(q*n),1)-th
    # smallest) spelled out with row_number so the double multiply q*n is
    # the same IEEE operation on both sides (quantile_disc agrees on the
    # probed cases but its internals are not contractual).
    # exact heavy hitters above the MG guarantee threshold n/(k+1); the
    # engine row additionally asserts the sketch's deterministic bounds
    # against these exact counts before returning them
    "mg_heavy_hitters_bounds": f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS item FROM documents
        ), tot AS (
            SELECT count(*) AS n FROM toks
        ), c AS (
            SELECT item, count(*) AS count FROM toks GROUP BY item
        )
        SELECT item, count FROM c, tot
        WHERE count * {_MG_K + 1} > n
        ORDER BY count DESC, item
    """,
    # identical output contract to the demoted token_count_quantiles row
    # (exact per-lang rank arithmetic); the engine row additionally runs
    # the distributed KLL sketch and asserts its rank-error bound
    "kll_quantile_bounds": """
        WITH t AS (
            SELECT lang, array_length(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), c AS (
            SELECT lang, count(*) AS n FROM t GROUP BY lang
        ), r AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_tokens) AS rk
            FROM t
        )
        SELECT c.lang, any_value(c.n) AS n,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.5 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p50,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.9 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p90,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.99 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p99
        FROM r JOIN c USING (lang)
        GROUP BY c.lang ORDER BY c.lang
    """,
    "token_count_quantiles": """
        WITH t AS (
            SELECT lang, array_length(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), c AS (
            SELECT lang, count(*) AS n FROM t GROUP BY lang
        ), r AS (
            SELECT lang, n_tokens,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_tokens) AS rk
            FROM t
        )
        SELECT c.lang, any_value(c.n) AS n,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.5 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p50,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.9 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p90,
               max(CASE WHEN rk = greatest(
                   CAST(ceil(0.99 * c.n) AS BIGINT), 1)
                   THEN n_tokens END) AS p99
        FROM r JOIN c USING (lang)
        GROUP BY c.lang ORDER BY c.lang
    """,
    # blocked fuzzy dedup with the SQL-auditable Levenshtein-ratio scorer:
    # same (first,last)-token blocking, same token-sorted normalized form,
    # same floor(x+0.5) rounding as lev_token_sort_ratio.
    "fuzzy_dup_parts": """
        WITH corpus AS (
            SELECT p_partkey, p_name FROM part
            UNION ALL
            SELECT p_partkey + 50000, p_name || ' x' FROM part
            WHERE p_partkey < 21
        ), n AS (
            SELECT p_partkey AS id,
                   array_to_string(list_sort(
                       string_split(lower(p_name), ' ')), ' ') AS ts,
                   string_split(lower(p_name), ' ') AS toks
            FROM corpus
        ), b AS (
            SELECT id, ts, toks[1] || '|' || toks[len(toks)] AS block FROM n
        ), scored AS (
            SELECT a.id AS id_a, c.id AS id_b,
                   CAST(floor(100 * (1 - levenshtein(a.ts, c.ts) * 1.0 /
                        greatest(length(a.ts), length(c.ts), 1)) + 0.5)
                        AS BIGINT) AS ratio
            FROM b a JOIN b c ON a.block = c.block AND a.id < c.id
        )
        SELECT id_a, id_b, ratio FROM scored WHERE ratio >= 90
        ORDER BY id_a, id_b
    """,
    # the composed corpus-prep flagship: each CTE is the oracle of one
    # already-verified operator (lang_id_confusion's predictor keyed by doc,
    # quality_scores, exact-dedup min-id, the brute-force Jaccard twin) —
    # the composition itself is what this row checks end-to-end.
    "clean_corpus": """
        WITH w AS (
            SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
            FROM documents
        ), s AS (
            SELECT doc_id, greatest(len(ws), 1) AS nw,
                   len(list_filter(ws, x -> x IN
                       ('der','die','und','das','von','zu','den','mit','ist',
                        'im','für','auf','des','ein'))) * 1.0 AS c_de,
                   len(list_filter(ws, x -> x IN
                       ('the','and','of','to','a','in','is','that','it','for',
                        'on','with','as','are','this'))) * 1.0 AS c_en,
                   len(list_filter(ws, x -> x IN
                       ('el','la','de','que','y','en','los','del','se','las',
                        'por','un','con','una','es','para'))) * 1.0 AS c_es,
                   len(list_filter(ws, x -> x IN
                       ('le','la','de','et','les','des','en','un','une','du',
                        'que','pour','dans','ce','il'))) * 1.0 AS c_fr,
                   len(list_filter(ws, x -> x IN
                       ('o','a','de','que','e','do','da','em','um','para',
                        'com','não','uma','os','no','se'))) * 1.0 AS c_pt
            FROM w
        ), langp AS (
            SELECT doc_id,
                   CASE
                     WHEN greatest(c_de, c_en, c_es, c_fr, c_pt) = 0 THEN 'und'
                     WHEN c_de / nw >= c_en / nw AND c_de / nw >= c_es / nw
                      AND c_de / nw >= c_fr / nw AND c_de / nw >= c_pt / nw
                       THEN 'de'
                     WHEN c_en / nw >= c_es / nw AND c_en / nw >= c_fr / nw
                      AND c_en / nw >= c_pt / nw THEN 'en'
                     WHEN c_es / nw >= c_fr / nw AND c_es / nw >= c_pt / nw
                       THEN 'es'
                     WHEN c_fr / nw >= c_pt / nw THEN 'fr'
                     ELSE 'pt'
                   END AS lang_pred
            FROM s
        ), f AS (
            SELECT doc_id,
                   array_length(string_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                   regexp_extract_all(lower(text), '\\w+') AS ws
            FROM documents
        ), q AS (
            SELECT doc_id, n_tokens,
                   round(0.4 * least(n_tokens / 50.0, 1.0)
                       + 0.3 * least((n_alpha * 1.0 / greatest(n_chars, 1))
                                     * 1.25, 1.0)
                       + 0.3 * least((len(list_filter(ws, x -> x IN
                           ('the','and','of','to','a','in','is','that','it',
                            'for','on','with','as','are','this')))
                           * 1.0 / greatest(len(ws), 1)) * 4.0, 1.0),
                       6) AS quality
            FROM f
        ), s1 AS (
            SELECT d.doc_id, d.text, l.lang_pred, q.quality, q.n_tokens
            FROM documents d
            JOIN langp l USING (doc_id) JOIN q USING (doc_id)
            WHERE l.lang_pred = 'en' AND q.quality >= 0.5
        ), s2 AS (
            SELECT min(doc_id) AS doc_id FROM s1 GROUP BY text
        ), s2d AS (
            SELECT s1.* FROM s1 JOIN s2 USING (doc_id)
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) < 5
                        THEN [array_to_string(ws, ' ')]
                        ELSE [array_to_string(ws[i:i+4], ' ')
                              for i in generate_series(1, len(ws) - 4)] END) AS sg
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
                  FROM s2d)
        ), losers AS (
            SELECT DISTINCT b.doc_id
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sg, b.sg)) * 1.0 /
                  (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg)))
                  >= 0.5
        )
        SELECT doc_id, lang_pred, quality, n_tokens FROM s2d
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY doc_id
    """,
    # prefix filtering is exact (no false negatives — Bayardo et al. WWW'07),
    # so the n-gram Jaccard operator's output IS the brute-force pair scan.
    "ngram_jaccard_pairs": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 50000, text || ' nearduplicate' FROM documents
            WHERE doc_id < 25
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) < 5
                        THEN [array_to_string(ws, ' ')]
                        ELSE [array_to_string(ws[i:i+4], ' ')
                              for i in generate_series(1, len(ws) - 4)] END) AS s
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
                  FROM corpus)
        ), j AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s)) * 1.0 /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.5
        ORDER BY id_a, id_b
    """,
    "near_dup_clusters": """
        WITH RECURSIVE corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 50000, text || ' nearduplicate' FROM documents
            WHERE doc_id < 25
        ), sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) < 5
                        THEN [array_to_string(ws, ' ')]
                        ELSE [array_to_string(ws[i:i+4], ' ')
                              for i in generate_series(1, len(ws) - 4)] END) AS s
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
                  FROM corpus)
        ), j AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s)) * 1.0 /
                     (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ), edges AS (
            SELECT id_a AS a, id_b AS b FROM j WHERE jac >= 0.5
        ), sym AS (
            SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges
        ), reach(node, comp) AS (
            SELECT doc_id, doc_id FROM corpus
            UNION
            SELECT s.a, r.comp FROM sym s JOIN reach r ON r.node = s.b
        )
        SELECT node AS doc_id, min(comp) AS cluster_id,
               CAST(node = min(comp) AS BIGINT) AS is_canonical
        FROM reach GROUP BY node ORDER BY doc_id
    """,
    "dup_span_documents": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 50000, text FROM documents WHERE doc_id < 25
        ), tok AS (
            SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws
            FROM corpus
        ), wins AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(ws) < 8
                        THEN [array_to_string(ws, ' ')]
                        ELSE [array_to_string(ws[i:i+7], ' ')
                              for i in generate_series(1, len(ws) - 7)] END)
                       AS win
            FROM tok
        ), d AS (
            SELECT DISTINCT doc_id, win FROM wins
        ), c AS (
            SELECT win, count(*) AS n_docs FROM d GROUP BY win
        )
        SELECT d.doc_id,
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_dup_windows
        FROM d JOIN c USING (win)
        GROUP BY d.doc_id ORDER BY d.doc_id
    """,
    "c4_line_stats": """
        WITH c AS (
            SELECT doc_id,
                   replace(coalesce(text, ''), ' merge ',
                           '.' || chr(10) || 'merge ') AS text
            FROM documents
        ), lines AS (
            SELECT doc_id, unnest(string_split(text, chr(10))) AS line
            FROM c
        ), flags AS (
            SELECT doc_id, line,
                   ((line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?')
                    AND len(string_split(line, ' ')) >= 5
                    AND NOT contains(lower(line), 'javascript')
                    AND NOT contains(lower(line), 'lorem ipsum')
                    AND NOT contains(lower(line), 'cookie')) AS keep
            FROM lines
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(coalesce(sum(CASE WHEN keep THEN 1 END), 0) AS BIGINT)
                   AS n_kept,
               CAST(coalesce(sum(CASE WHEN keep THEN len(line) END), 0)
                   AS BIGINT) AS n_chars_kept
        FROM flags GROUP BY doc_id ORDER BY doc_id
    """,
    "vocab_top_terms": """
        WITH toks AS (
            SELECT unnest(string_split(coalesce(text, ''), ' ')) AS token
            FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY token
        ORDER BY n DESC, token LIMIT 256
    """,
    "simhash_dedup_pairs": """
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 50000, text || ' nearduplicate' FROM documents
            WHERE doc_id < 25
        ), words AS (
            SELECT doc_id,
                   unnest(list_distinct(regexp_extract_all(lower(text), '\\w+'))) AS w
            FROM corpus
        ), wh AS (
            SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
            FROM words
        ), bits AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS acc
            FROM wh CROSS JOIN (SELECT unnest(range(64)) AS bit) b
            GROUP BY doc_id, b.bit
        ), sig0 AS (
            SELECT doc_id,
                   sum(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)
                            ELSE 0::UBIGINT END) AS sh
            FROM bits GROUP BY doc_id
        ), sig AS (
            SELECT c.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh
            FROM corpus c LEFT JOIN sig0 s USING (doc_id)
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
        ORDER BY id_a, id_b
    """,
    "doc_fingerprints": """
        WITH c AS (
            SELECT doc_id,
                   [CAST(unicode(text[i]) AS HUGEINT)
                    for i in generate_series(1, length(text))] AS cs
            FROM documents
        ), w AS (
            SELECT doc_id,
                   [CAST(list_sum([cs[i+j] *
                        ([1,257,66049,16974593,4362470401,1121154893057,
                          288136807515649,74051159531521793]::HUGEINT[])[8-j]
                        for j in generate_series(0, 7)])
                        % 2305843009213693951 AS UBIGINT)
                    for i in generate_series(1, len(cs) - 7)] AS hs
            FROM c
        )
        SELECT doc_id,
               array_to_string([lower(lpad(to_hex(h), 16, '0'))
                                for h in list_sort(hs)[1:4]], '-') AS fingerprint
        FROM w ORDER BY doc_id
    """,
    "multimodal_frames": """
        WITH f AS (
            SELECT doc_id, text, octet_length(encode(text)) AS L,
                   unnest([0, 1, 2]) AS frame_idx
            FROM documents WHERE octet_length(encode(text)) > 0
        )
        SELECT doc_id, frame_idx,
               substr(text,
                      least(frame_idx * greatest(L // 3, 1),
                            greatest(L - 1, 0)) + 1,
                      32) AS frame
        FROM f ORDER BY doc_id, frame_idx
    """,
    "ivf_ann_exhaustive": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id IN (0, 1, 2)
        ), s AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(e.embedding, q.qv) AS sim
            FROM embeddings e CROSS JOIN q
        ), r AS (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM s
        )
        SELECT query_id, rank, vec_id FROM r WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    "ann_cosine_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id IN (0, 1, 2)
        ), s AS (
            SELECT q.query_id, e.vec_id,
                   list_cosine_similarity(e.embedding, q.qv) AS sim
            FROM embeddings e CROSS JOIN q
        ), r AS (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM s
        )
        SELECT query_id, rank, vec_id FROM r WHERE rank <= 10
        ORDER BY query_id, rank
    """,
}

QUERIES = {
    "doc_sections": doc_sections,
    "decontaminate_documents": decontaminate_documents,
    "pack_sequences": pack_sequences,
    "repetition_stats": repetition_stats,
    "mixture_sample_documents": mixture_sample_documents,
    "shuffled_head_documents": shuffled_head_documents,
    "bigram_lm_scores": bigram_lm_scores,
    "prepare_training_set": prepare_training_set,
    "tfidf_top_terms": tfidf_top_terms,
    "chunk_documents": chunk_documents,
    "sample_documents_hash": sample_documents_hash,
    "token_counts": token_counts,
    "token_count_quantiles": token_count_quantiles,
    "kll_quantile_bounds": kll_quantile_bounds,
    "mg_heavy_hitters_bounds": mg_heavy_hitters_bounds,
    "token_counts_bpeish": token_counts_bpeish,
    "quality_stats": quality_stats,
    "exact_dedup_documents": exact_dedup_documents,
    "multimodal_meta": multimodal_meta,
    "multimodal_byte_features": multimodal_byte_features,
    "multimodal_frames": multimodal_frames,
    "ann_cosine_topk": ann_cosine_topk,
    "quality_scores": quality_scores,
    "domain_quality_filter": domain_quality_filter,
    "percentile_quality_filter": percentile_quality_filter,
    "token_budget_sample": token_budget_sample,
    "profile_documents": profile_documents,
    "split_documents": split_documents,
    "embedding_near_dup_pairs": embedding_near_dup_pairs,
    "lang_id_confusion": lang_id_confusion,
    "clean_corpus": clean_corpus,
    "minhash_dedup_pairs": minhash_dedup_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "near_dup_clusters": near_dup_clusters,
    "vocab_top_terms": vocab_top_terms,
    "c4_line_stats": c4_line_stats,
    "dup_span_documents": dup_span_documents,
    "simhash_dedup_pairs": simhash_dedup_pairs,
    "doc_fingerprints": doc_fingerprints,
    "ivf_ann_exhaustive": ivf_ann_exhaustive,
    # rows-only (non-SQL-expressible: approximate by design)
    "ivf_ann_topk": ivf_ann_topk,
    "cdc_replay_synthetic": cdc_replay_synthetic,
    "cdc_replay_evolved": cdc_replay_evolved,
    "fuzzy_dup_parts": fuzzy_dup_parts,
    "cdc_lineage_metrics": cdc_lineage_metrics,
}
