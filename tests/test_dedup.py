"""Dedup operators: exact (vs brute-force oracle), MinHash-LSH recall on
planted near-dups, SimHash, Jaccard verification, embedding near-dups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from horizon_etl_ray.functions import dedup as dd


def _docs():
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "pack my box with five dozen liquor jugs before noon every single day",
        "how vexingly quick daft zebras jump over fences in the summer heat",
        "sphinx of black quartz judge my vow said the old wise man slowly",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
        rows.append({"doc_id": 100 + i, "text": t})  # exact dup
        rows.append({"doc_id": 200 + i, "text": t + " nearduplicate"})  # near dup
    rows.append({"doc_id": 999, "text": "completely different content about ray data engines"})
    return rows


@pytest.fixture()
def docs_ds():
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_docs()))


def test_exact_dedup_min_id_wins(docs_ds):
    out = dd.exact_dedup(docs_ds).to_pandas()
    # oracle: min doc_id per exact text
    df = pd.DataFrame(_docs())
    want = set(df.groupby("text")["doc_id"].min())
    assert set(out["doc_id"]) == want
    assert len(out) == 9  # 4 base + 4 near-dups + 1 unique


def test_minhash_finds_planted_near_dups(docs_ds):
    pairs = dd.minhash_lsh_groups(docs_ds, num_perm=64, bands=16, concurrency=(1, 2))
    verified = dd.verify_pairs_jaccard(pairs, docs_ds, threshold=0.5).to_pandas()
    got = set(map(tuple, verified[["id_a", "id_b"]].to_numpy()))
    for i in range(4):
        assert (i, 100 + i) in got, f"exact dup pair {i} missed"
        assert (i, 200 + i) in got or (100 + i, 200 + i) in got, f"near dup {i} missed"
    # the unrelated doc pairs with nothing
    assert not any(999 in p for p in got)


def test_jaccard_values():
    assert dd.jaccard("a b c d e f", "a b c d e f") == 1.0
    assert dd.jaccard("", "") == 1.0
    assert dd.jaccard("a b c d e", "v w x y z") == 0.0


def test_simhash_near_dups(docs_ds):
    pairs = dd.simhash_candidates(docs_ds, concurrency=(1, 2)).to_pandas()
    exact = pairs[pairs["hamming"] == 0]
    got = set(map(tuple, exact[["id_a", "id_b"]].to_numpy()))
    for i in range(4):
        assert (i, 100 + i) in got
    near = pairs[pairs["hamming"] <= 8]
    gotn = set(map(tuple, near[["id_a", "id_b"]].to_numpy()))
    assert any((i, 200 + i) in gotn for i in range(4))


def test_simhash64_deterministic():
    s = dd.SimHashStage.simhash64
    assert s("hello world") == s("hello world")
    assert s("") == 0
    a, b = s("the quick brown fox"), s("the quick brown foxes")
    assert bin(a ^ b).count("1") < 20


def test_embedding_near_dups():
    import ray.data as rd

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(20)]
    rows += [{"vec_id": 100 + i, "embedding": vecs[i].tolist()} for i in range(5)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = dd.embedding_near_dups(ds, threshold=0.999).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert {(i, 100 + i) for i in range(5)} <= got


def test_exact_dedup_distributed_semi_join_matches_broadcast(docs_ds):
    """broadcast_threshold=0 forces the Dataset.join semi-join path; results
    must equal the broadcast path (same winners, payload intact)."""
    bcast = dd.exact_dedup(docs_ds).to_pandas()
    dist = dd.exact_dedup(docs_ds, broadcast_threshold=0).to_pandas()
    assert set(dist["doc_id"]) == set(bcast["doc_id"])
    a = bcast.sort_values("doc_id").reset_index(drop=True)
    b = dist.sort_values("doc_id").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_exact_dedup_election_strategies_agree(docs_ds):
    """flat / bucketed / auto(hinted-small) winner elections are the same
    reduce expressed two ways — identical survivors and payload. The auto
    rule (functions/dedup.py crossover note) picks flat under the hint and
    bucketed without one; both must produce the same frame."""
    flat = dd.exact_dedup(docs_ds, election="flat").to_pandas()
    buck = dd.exact_dedup(docs_ds, election="bucketed").to_pandas()
    auto = dd.exact_dedup(docs_ds, approx_rows=13).to_pandas()
    nohint = dd.exact_dedup(docs_ds).to_pandas()  # auto, no hint -> bucketed
    a = flat.sort_values("doc_id").reset_index(drop=True)
    for other in (buck, auto, nohint):
        b = other.sort_values("doc_id").reset_index(drop=True)[a.columns]
        pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError):
        dd.exact_dedup(docs_ds, election="fastest")


def test_verify_pairs_never_broadcasts_corpus(docs_ds, monkeypatch):
    """The round-1 implementation ray.put() a dict of every doc text; the
    bucketed-join rewrite must never place a driver-side corpus collection
    into the object store (O(pairs) driver state only)."""
    import ray

    offenders = []
    orig_put = ray.put

    def spy(obj, *a, **k):
        if isinstance(obj, dict) and len(obj) > 8:
            offenders.append(len(obj))
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(ray, "put", spy)
    pairs = dd.minhash_lsh_groups(docs_ds, num_perm=64, bands=16,
                                  concurrency=(1, 2))
    verified = dd.verify_pairs_jaccard(pairs, docs_ds, threshold=0.5).to_pandas()
    assert len(verified) > 0
    assert not offenders, f"corpus-sized dict broadcast detected: {offenders}"


def test_embedding_near_dups_no_corpus_matmul(monkeypatch):
    """The LSH-bucketed path must not broadcast the full embedding matrix
    (round-1 did ray.put((corpus, ids)))."""
    import ray
    import ray.data as rd

    offenders = []
    orig_put = ray.put

    def spy(obj, *a, **k):
        if isinstance(obj, tuple) and any(
            isinstance(x, np.ndarray) and x.ndim == 2 for x in obj
        ):
            offenders.append(True)
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(ray, "put", spy)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(30, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(30)]
    rows += [{"vec_id": 100 + i, "embedding": vecs[i].tolist()} for i in range(6)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = dd.embedding_near_dups(ds, threshold=0.999).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert {(i, 100 + i) for i in range(6)} <= got
    assert not offenders


def test_dedup_pairs_vectorized():
    import ray.data as rd

    df = pd.DataFrame({
        "id_a": [1, 1, 2, 1, 3], "id_b": [2, 2, 3, 2, 4],
        "score": [9, 9, 8, 9, 7]})
    out = dd.dedup_pairs(rd.from_pandas(df)).to_pandas()
    assert len(out) == 3
    assert set(map(tuple, out[["id_a", "id_b"]].to_numpy())) == {(1, 2), (2, 3), (3, 4)}


def test_md5_kernels_match_hashlib():
    """The vectorized single-block MD5 (ints + short strings) must be
    bit-identical to hashlib — it backs every content-addressed convention
    the DuckDB oracles reproduce."""
    import hashlib

    from horizon_etl_ray.functions.hashing import (md5_head64_of_strs,
                                                   md5_hex_of_ints,
                                                   md5_of_ints)

    ids = np.concatenate([
        np.array([0, 1, 9, 10, 99, 100, 12345, -1, -10, 2**62, -(2**62)]),
        np.random.default_rng(3).integers(-10**18, 10**18, 2000),
    ])
    head, _ = md5_of_ints(ids)
    hexes = md5_hex_of_ints(ids)
    for i, v in enumerate(ids):
        ref = hashlib.md5(str(int(v)).encode()).hexdigest()
        assert hexes[i] == ref
        assert int(head[i]) == int.from_bytes(bytes.fromhex(ref)[:8], "big")

    words = np.array(["", "a", "hello", "x" * 55, "y" * 56, "z" * 200,
                      "café", "word123", "UPPER", " spaces inside "],
                     dtype=object)
    out = md5_head64_of_strs(words)
    for w, v in zip(words, out):
        assert int(v) == int.from_bytes(
            hashlib.md5(w.encode()).digest()[:8], "big"), w


def test_simhash_batch_equals_scalar_reference():
    texts = pd.Series(["the cat sat on the mat", "", None, "a",
                       "scan filter order scan", "the CAT sat ON the mat",
                       "x y z w " * 30, "unique words only here now"])
    batch = dd.SimHashStage.simhash64_batch(texts)
    ref = np.array([dd.SimHashStage.simhash64(t) for t in texts.fillna("")],
                   dtype=np.uint64)
    np.testing.assert_array_equal(batch, ref)


def test_near_dup_clusters_are_transitive():
    """A~B and B~C but A≁C (a chain) must land in ONE cluster with the min
    id canonical — the property pairwise near-dup output alone can't give."""
    import ray.data as rd

    from horizon_etl_ray.functions.graph import connected_components as cc

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": 1, "text": base},  # 10 tokens → 6 shingles
        {"doc_id": 2, "text": base + " lambda"},  # 11 → 7; jac(1,2)=6/7
        # 17 tokens → 13 shingles: jac(2,3)=7/13≈0.54 ≥ 0.5 but
        # jac(1,3)=6/13≈0.46 < 0.5 — a TRUE chain, no direct 1–3 edge
        {"doc_id": 3, "text": base + " lambda mu nu xi omicron pi rho"},
        {"doc_id": 9, "text": "totally different words about engines and rays"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = dd.ngram_jaccard_pairs(ds, threshold=0.5, concurrency=(1, 2))
    pset = {(r["id_a"], r["id_b"]) for r in pairs.to_pandas().to_dict("records")}
    assert (1, 3) not in pset and {(1, 2), (2, 3)} <= pset  # chain premise
    labels = cc(pairs.select_columns(["id_a", "id_b"]),
                ds.select_columns(["doc_id"]),
                src="id_a", dst="id_b", node_col="doc_id",
                num_buckets=2).to_pandas()
    comp = dict(zip(labels["node"], labels["component"]))
    # the chain collapses to one cluster labeled by the min id
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[9] == 9  # isolated doc is its own (canonical) cluster


def _fake_sf_dir(tmp_path, rows):
    import pyarrow.parquet as pq

    d = tmp_path / "sf_fake"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_dup_span_matches_naive_on_edge_corpus(tmp_path, ray_session):
    """dup_span_documents vs a naive Python reference on an edge-shaped
    corpus: empty text, sub-window doc, a window repeated INSIDE one doc
    (not a dup — dup requires ≥2 distinct docs), and a copied passage
    across two docs. Ids ≥ 25 so the operator's plant branch stays empty
    and the corpus is exactly what the test constructs."""
    import re

    from horizon_etl_ray.pipelines.corpus import dup_span_documents

    passage = "one two three four five six seven eight nine ten"
    rows = [
        {"doc_id": 30, "text": "", "lang": "en", "source": "s", "n_chars": 0},
        {"doc_id": 31, "text": "short text", "lang": "en", "source": "s",
         "n_chars": 10},
        # the same 8-token window twice WITHIN one doc
        {"doc_id": 32, "text": passage + " " + passage, "lang": "en",
         "source": "s", "n_chars": 0},
        # copied passage across two docs
        {"doc_id": 33, "text": "prefix words here " + passage, "lang": "en",
         "source": "s", "n_chars": 0},
        {"doc_id": 34, "text": passage + " trailing words", "lang": "en",
         "source": "s", "n_chars": 0},
        {"doc_id": 35, "text": "completely unrelated content goes right "
                               "here with plenty of words", "lang": "en",
         "source": "s", "n_chars": 0},
    ]
    sf = _fake_sf_dir(tmp_path, rows)
    out = dup_span_documents(sf, w=8).set_index("doc_id")

    # naive reference
    def windows(text):
        ws = re.findall(r"\w+", (text or "").lower())
        if len(ws) < 8:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 8]) for i in range(len(ws) - 7)}

    per_doc = {r["doc_id"]: windows(r["text"]) for r in rows}
    from collections import Counter
    cnt = Counter(w for ws in per_doc.values() for w in ws)
    for did, ws in per_doc.items():
        assert out.loc[did, "n_windows"] == len(ws), did
        assert out.loc[did, "n_dup_windows"] == sum(
            1 for w in ws if cnt[w] >= 2), did
    # sanity on the shape the test claims to cover
    assert out.loc[32, "n_dup_windows"] < out.loc[32, "n_windows"]
    assert out.loc[33, "n_dup_windows"] > 0 and out.loc[34, "n_dup_windows"] > 0
    assert out.loc[35, "n_dup_windows"] == 0


def test_vocab_topk_tie_break_is_deterministic(tmp_path, ray_session):
    """Ties at the rank-k boundary must resolve lexicographically (count
    DESC, token ASC) — the property that makes the top-k reproducible
    across engines and block layouts."""
    from horizon_etl_ray.pipelines.corpus import vocab_top_terms

    rows = [
        # zz ×3; then six tokens all ×2: bb cc dd ee ff gg; aa ×1
        {"doc_id": 1, "text": "zz zz bb cc dd", "lang": "en", "source": "s",
         "n_chars": 0},
        {"doc_id": 2, "text": "zz bb cc dd aa", "lang": "en", "source": "s",
         "n_chars": 0},
        {"doc_id": 3, "text": "ee ff gg ee ff gg", "lang": "en",
         "source": "s", "n_chars": 0},
    ]
    sf = _fake_sf_dir(tmp_path, rows)
    out = vocab_top_terms(sf, k=4)
    assert out["token"].tolist() == ["zz", "bb", "cc", "dd"]
    assert out["n"].tolist() == [3, 2, 2, 2]


def test_dup_span_fallback_path_matches_broadcast(tmp_path, ray_session):
    """broadcast_threshold=0 forces the co-shuffle fallback; its output
    must equal the broadcast fast path (same policy as the exact-dedup
    semi-join parity test)."""
    import pandas as pd

    from horizon_etl_ray.pipelines.corpus import dup_span_documents

    passage = "one two three four five six seven eight nine ten"
    rows = [
        {"doc_id": 40 + i,
         "text": f"doc {i} prefix " + (passage if i % 2 == 0 else f"own words {i} " * 3),
         "lang": "en", "source": "s", "n_chars": 0}
        for i in range(8)
    ]
    sf = _fake_sf_dir(tmp_path, rows)
    fast = dup_span_documents(sf, w=8)
    slow = dup_span_documents(sf, w=8, broadcast_threshold=0)
    pd.testing.assert_frame_equal(fast, slow)
    assert fast["n_dup_windows"].sum() > 0  # the even docs share the passage
