"""Round-3 LLM-training-data operators: benchmark decontamination,
sequence packing (two-level prefix sum), Gopher repetition signals.

Each op is driver-oracle-gated (ORACLE_SQL twin, checked in
test_new_operators-style below); here we additionally pin the algebraic
invariants the SQL twin can't see — packing is bucket-split-invariant
(the two-level prefix sum gives the same windows for ANY bucket size),
planted contamination is always caught, and the repetition kernel matches
a naive per-row reference on literal rows."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.functions import text as tx
from horizon_etl_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


@pytest.mark.parametrize(
    "name",
    ["decontaminate_documents", "pack_sequences", "repetition_stats",
     "mixture_sample_documents", "shuffled_head_documents",
     "bigram_lm_scores", "prepare_training_set", "tfidf_top_terms",
     "chunk_documents", "domain_quality_filter",
     "percentile_quality_filter", "token_budget_sample"],
)
def test_matches_duckdb_oracle(ray_session, con, name):
    ray_df = corpus.QUERIES[name](SF)
    oracle_df = con.execute(corpus.ORACLE_SQL[name]).df()
    a, b = _canon(ray_df), _canon(oracle_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=True
    )


def test_pack_sequences_bucket_split_invariance(ray_session):
    """The two-level prefix sum must be invariant to how docs are bucketed —
    same windows for bucket_size 7 (many partial groups) and 64."""
    a = corpus.pack_sequences(SF, bucket_size=7)
    b = corpus.pack_sequences(SF, bucket_size=64)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_pack_sequences_conservation(ray_session):
    """Every token lands in exactly one window; windows are the contiguous
    range 0..total//W; every full window carries exactly W tokens."""
    import pyarrow.parquet as pq

    out = corpus.pack_sequences(SF, window=256)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    total = sum(len(t.split(" ")) for t in texts["text"].to_pylist())
    assert out["n_tokens"].sum() == total
    assert list(out["window_id"]) == list(range(len(out)))
    assert (out["n_tokens"].iloc[:-1] == 256).all()
    assert out["n_tokens"].iloc[-1] == total - 256 * (len(out) - 1)


def test_decontaminate_catches_planted_copies(ray_session):
    """Every benchmark doc with ≥8 tokens reappears planted at doc_id+100000
    and MUST be flagged with n_hits == its own distinct-8-gram count."""
    import pyarrow.parquet as pq

    out = corpus.decontaminate_documents(SF)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    bench_mask = corpus._md5_bucket(docs["doc_id"].to_numpy(), 20) == 0
    bench = docs[bench_mask]
    assert len(bench) > 0
    flagged = dict(zip(out["doc_id"], out["n_hits"]))
    for _, row in bench.iterrows():
        w = row["text"].split(" ")
        ngs = {" ".join(w[i:i + 8]) for i in range(len(w) - 7)}
        if ngs:
            # the planted copy's distinct 8-grams are ALL in the benchmark
            # set (they came from it), so n_hits is exactly len(ngs); the
            # planted id is the NEGATED id (disjoint from any real id)
            assert flagged.get(-(int(row["doc_id"]) + 1)) == len(ngs)
    # no benchmark doc ids themselves in the output (they're excluded)
    bench_ids = set(bench["doc_id"].astype(int))
    assert not (set(out["doc_id"].astype(int)) & bench_ids)


def test_mixture_rates_monotone_and_reproducible(ray_session):
    """Lower-rate sources keep fewer docs; the sample is a deterministic
    subset (content-addressed buckets), so two runs agree exactly and the
    kept set per source is a prefix of the hash-sample convention."""
    a = corpus.mixture_sample_documents(SF)
    b = corpus.mixture_sample_documents(SF)
    pd.testing.assert_frame_equal(a, b)
    kept = a.groupby("source").size()
    # src0 (rate 100%) keeps everything; src19 (rate 24%) keeps well less
    assert kept.get("src0", 0) == 25
    assert kept.get("src19", 0) < 25


def test_shuffled_head_is_prefix_of_full_order(ray_session):
    """The k=50 head must equal the first 50 of the k=120 head — the shuffle
    order is a single global order, not a per-run artifact."""
    h50 = corpus.shuffled_head_documents(SF, k=50)
    h120 = corpus.shuffled_head_documents(SF, k=120)
    pd.testing.assert_frame_equal(h50, h120.iloc[:50].reset_index(drop=True))


def test_bigram_lm_scores_sane(ray_session):
    """Log-likelihoods are negative, every non-benchmark doc is scored, no
    benchmark doc leaks into the output, and the fit is deterministic."""
    import pyarrow.parquet as pq

    out = corpus.bigram_lm_scores(SF)
    assert (out["lm_score"] < 0).all()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    bench = corpus._md5_bucket(docs["doc_id"].to_numpy(), 20) == 0
    assert len(out) == int((~bench).sum())
    assert not (set(out["doc_id"]) & set(docs.loc[bench, "doc_id"]))
    pd.testing.assert_frame_equal(out, corpus.bigram_lm_scores(SF))


def test_fit_bigram_lm_vocab_is_block_invariant(ray_session):
    """Regression: a block whose bench docs are all shorter than 2 bytes
    must still contribute its characters to the vocabulary — otherwise the
    smoothing denominator (and every score) depends on read-block
    boundaries and diverges from the SQL oracle."""
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a", "bc"],
                       "bench": [True, True]})
    ref = None
    for nb in (1, 2):  # nb=2 isolates the 1-byte doc in its own block
        logp = corpus._fit_bigram_lm(rd.from_pandas(df).repartition(nb))
        if ref is None:
            ref = logp
        np.testing.assert_array_equal(logp, ref)
    # vocab {a,b,c} = 3; count('bc')=1, total for first byte 'b' is 1
    assert np.isclose(ref[ord("b") * 256 + ord("c")],
                      np.log((1 + 1) / (1 + 3.0)))


def test_fused_fit_matches_separate_helpers(ray_session):
    """The flagship's one-pass _fit_lm_and_ngrams must produce exactly the
    model and n-gram set of the two standalone helpers."""
    import ray.data as rd

    docs = corpus._tag_bench(
        corpus._rp(SF, "documents", columns=["doc_id", "text"]))
    logp, bng_h, bng_s = corpus._fit_lm_and_ngrams(docs, 8)
    np.testing.assert_array_equal(logp, corpus._fit_bigram_lm(docs))
    ref_h, ref_s = corpus._bench_ngram_set(docs, 8)
    np.testing.assert_array_equal(bng_h, ref_h)
    assert bng_s == ref_s


def test_repetition_features_literal_rows():
    """Kernel vs naive reference on hand-written rows, incl. the edge cases:
    single token (no bigrams), all-repeated tokens, empty string."""
    texts = pd.Series(
        ["a b a b a", "x", "", "one two two two three", "z z z z"]
    )
    ids = np.arange(5)
    out = tx.repetition_features(ids, texts)
    # naive reference
    for i, t in enumerate(texts):
        w = t.split(" ")
        bigrams = [" ".join(w[j:j + 2]) for j in range(len(w) - 1)]
        top = max((bigrams.count(b) for b in set(bigrams)), default=0)
        row = out[out["doc_id"] == i].iloc[0]
        assert row["n_tokens"] == len(w)
        assert row["n_distinct"] == len(set(w))
        assert row["top_bigram_n"] == top


def test_domain_quality_filter_drops_planted_source(ray_session):
    """The planted punctuation-only source must drop wholesale (every
    srcbad doc gone) while every real source survives — i.e. the gate
    judges the DOMAIN: srcbad docs are absent even though the per-doc
    threshold never ran, and no real doc is lost to its source's mean."""
    out = corpus.domain_quality_filter(SF)
    assert not (out["source"] == "srcbad").any()
    assert not (out["doc_id"] >= 70_000).any()
    base = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(out) == len(base)  # all real sources above 0.5 at this SF


def test_domain_quality_filter_threshold_boundary(ray_session):
    """Threshold semantics are >= on the integer micro-mean: at
    threshold 0 every source (even srcbad) survives; at 1e6+1 none do."""
    keep_all = corpus.domain_quality_filter(SF, threshold_micro=0)
    assert (keep_all["source"] == "srcbad").sum() == 12
    none = corpus.domain_quality_filter(SF, threshold_micro=1_000_001)
    assert len(none) == 0


def test_percentile_quality_filter_keeps_at_least_half_per_lang(ray_session):
    """The gate is q6 >= per-lang lower-median, so every language keeps at
    least ceil(n/2) of its documents (values >= the r-th smallest number
    n - r + 1 with r = ceil(n/2)) — and never all of them unless the
    distribution is degenerate at this SF (it isn't: assert both bounds)."""
    out = corpus.percentile_quality_filter(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    n = docs.groupby("lang").size()
    k = out.groupby("lang").size().reindex(n.index, fill_value=0)
    assert (k * 2 >= n).all()
    assert (k < n).any()


def test_token_budget_sample_bucket_width_invariance(ray_session):
    """The two-level prefix sum must give the SAME kept set for any
    coarse-range width — hb_bits=2 (4 buckets, fat boundary slices) and
    hb_bits=6 (64 buckets) are different decompositions of one cumsum."""
    a = corpus.token_budget_sample(SF, hb_bits=2)
    b = corpus.token_budget_sample(SF, hb_bits=6)
    pd.testing.assert_frame_equal(a, b)


def test_token_budget_sample_monotone_in_budget(ray_session):
    """Raising the budget only ever ADDS documents (hash order is a fixed
    walk): kept(200) ⊂ kept(400), and every source stays under budget+max
    single-doc overshoot."""
    small = corpus.token_budget_sample(SF, budget=200)
    big = corpus.token_budget_sample(SF, budget=400)
    assert set(small["doc_id"]) < set(big["doc_id"])
    # each kept doc STARTS before the budget, so total ≤ budget + last doc
    tot = big.groupby("source")["n_tokens"].sum()
    assert (tot - big.groupby("source")["n_tokens"].max() < 400).all()


def test_token_budget_sample_hot_source(ray_session, tmp_path):
    """Adversarial skew: ONE source owns 90% of the corpus. The kept set is
    still exactly the hash-order prefix (vs a naive reference), and the
    boundary-bucket exchange only ever carries ~1/2^hb_bits of the hot
    source — the scale property the coarse ranges exist for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import numpy as np

    n = 4000
    src = np.where(np.arange(n) % 10 == 0,
                   [f"cold{i % 7}" for i in range(n)], "hot")
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [("w " * (5 + i % 9)).strip() for i in range(n)],
        "lang": "en",
        "source": src,
        "n_chars": np.int64(20),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    out = corpus.token_budget_sample(str(tmp_path), budget=500)
    # naive single-machine reference of the same rule
    from horizon_etl_ray.pipelines.corpus import _md5_bucket  # noqa: F401
    from horizon_etl_ray.functions.hashing import md5_of_ints

    h, _ = md5_of_ints(df["doc_id"].to_numpy())
    ref_rows = []
    toks = df["text"].str.split(" ").str.len().to_numpy()
    for s, g in pd.DataFrame({"doc_id": df["doc_id"], "source": df["source"],
                              "n": toks, "h": h}).groupby("source"):
        g = g.sort_values(["h", "doc_id"])
        prior = np.concatenate(([0], np.cumsum(g["n"].to_numpy())[:-1]))
        ref_rows.append(g[prior < 500])
    ref = pd.concat(ref_rows)
    assert set(out["doc_id"]) == set(ref["doc_id"])
    assert (out.groupby("source").size()["hot"]
            == ref.groupby("source").size()["hot"])
