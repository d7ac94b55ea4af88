"""n-gram Jaccard near-dup via prefix filtering: output must EQUAL the
brute-force all-pairs scan (prefix filtering has no false negatives —
Bayardo et al., WWW'07), including short-doc (<k words) and disjoint-doc
shapes."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from horizon_etl_ray.functions.dedup import (
    ShinglePrefixStage,
    _shingles,
    jaccard,
    ngram_jaccard_pairs,
)


def _brute(rows, threshold, k=5):
    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ja = jaccard(rows[i][1], rows[j][1], k)
            # brute-force universe: pairs sharing >= 1 shingle (Jaccard > 0)
            if ja >= threshold and ja > 0:
                out.append((rows[i][0], rows[j][0], round(ja, 6)))
    return sorted(out)


def _run(rows, threshold):
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}))
    got = ngram_jaccard_pairs(ds, threshold=threshold,
                              concurrency=(1, 2)).to_pandas()
    if len(got) == 0:
        return []
    return sorted(
        (int(a), int(b), round(float(j), 6))
        for a, b, j in zip(got["id_a"], got["id_b"], got["jaccard"]))


def test_matches_brute_force_exactly():
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " tail"),                       # near-dup of 1
        (3, base.replace("quick", "slow")),        # near-dup of 1
        (4, "completely different words entirely here now ok fine yes"),
        (5, "short doc"),                          # < k words → one shingle
        (6, "short doc"),                          # exact dup of 5
        (7, "the quick brown fox jumps"),          # exactly k words
    ]
    for t in (0.3, 0.5, 0.8):
        assert _run(rows, t) == _brute(rows, t), f"threshold {t}"


def test_randomized_no_false_negatives():
    # mutated copies of a few base docs → pairs spanning Jaccard 0..1, so
    # the threshold actually separates (empty output would be a vacuous test)
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    did = 0
    for _ in range(6):
        base = list(rng.choice(vocab, size=int(rng.integers(12, 30))))
        for _ in range(5):
            mut = list(base)
            for _ in range(int(rng.integers(0, 4))):  # 0-3 point mutations
                mut[int(rng.integers(0, len(mut)))] = str(rng.choice(vocab))
            rows.append((did, " ".join(mut)))
            did += 1
    expected = _brute(rows, 0.4)
    assert len(expected) > 10  # non-vacuous
    assert _run(rows, 0.4) == expected


def test_prefix_length_rule():
    # |S| shingles at threshold t must emit |S| - ceil(t|S|) + 1 rows
    text = " ".join(f"u{i}" for i in range(20))  # 16 distinct 5-gram shingles
    n_sh = len(_shingles(text, 5))
    stage = ShinglePrefixStage(threshold=0.8)
    out = stage(pd.DataFrame({"doc_id": [1], "text": [text]}))
    assert len(out) == n_sh - int(np.ceil(0.8 * n_sh)) + 1
    # emitted hashes are the globally-smallest ones (sorted prefix)
    assert list(out["_sh"]) == sorted(out["_sh"])


def test_empty_and_null_docs_yield_nothing():
    stage = ShinglePrefixStage(threshold=0.5)
    out = stage(pd.DataFrame({"doc_id": [1, 2], "text": ["", None]}))
    assert len(out) == 0


def test_minhash_lsh_agrees_with_exact_operator():
    """The LSH banding-exactness claim (corpus.py): on the planted corpus
    the MinHash-LSH candidate set loses no true pair. Proven here by
    comparing against the EXACT prefix-filtering operator end-to-end at
    sf0.001 — identical verified pair sets, not just identical counts."""
    from horizon_etl_ray.functions.dedup import minhash_lsh_groups
    from horizon_etl_ray.functions.dedup import verify_pairs_jaccard
    from horizon_etl_ray.pipelines.corpus import _planted_near_dups

    corpus = _planted_near_dups("/root/testdata/sf0.001")
    exact = _collect(ngram_jaccard_pairs(corpus, threshold=0.5,
                                         concurrency=(1, 2)))
    lsh_cands = minhash_lsh_groups(corpus, num_perm=64, bands=16,
                                   concurrency=(1, 2))
    lsh = _collect(verify_pairs_jaccard(lsh_cands, corpus, threshold=0.5))
    assert len(exact) > 0
    assert lsh == exact


def _collect(ds):
    got = ds.to_pandas()
    if len(got) == 0:
        return []
    return sorted((int(a), int(b), round(float(j), 6))
                  for a, b, j in zip(got["id_a"], got["id_b"],
                                     got["jaccard"]))


def test_hot_shingle_capped_but_real_dups_found():
    """A stop-gram shared by EVERY doc must not blow up the candidate set
    (max_bucket truncation), and true near-dups must still surface via
    their other, rarer shingles."""
    stop = "common prefix words here always"  # one shingle in every doc
    rows = [(i, f"{stop} unique{i} filler{i} extra{i} more{i}")
            for i in range(60)]
    rows.append((100, rows[7][1] + " tail"))  # true near-dup of doc 7
    got = _run_capped(rows, threshold=0.5, max_bucket=8)
    assert (7, 100) in {(a, b) for a, b, _ in got}
    # candidate expansion stayed bounded: the stop-gram bucket contributed
    # at most C(8,2) pairs, so the verified output is far below C(61,2)
    assert len(got) < 100


def _run_capped(rows, threshold, max_bucket):
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}))
    got = ngram_jaccard_pairs(ds, threshold=threshold, max_bucket=max_bucket,
                              concurrency=(1, 2)).to_pandas()
    if len(got) == 0:
        return []
    return sorted((int(a), int(b), round(float(j), 6))
                  for a, b, j in zip(got["id_a"], got["id_b"],
                                     got["jaccard"]))
