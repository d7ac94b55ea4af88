"""ANN: brute-force top-k vs a numpy oracle; IVF recall against exact."""

import numpy as np
import pyarrow as pa
import pytest

from horizon_etl_ray.functions import similarity as sim


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(300, 32)).astype(np.float32)
    return vecs


@pytest.fixture()
def corpus_ds(corpus):
    import ray.data as rd

    rows = [{"vec_id": i, "embedding": corpus[i].tolist()} for i in range(len(corpus))]
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _exact_topk(corpus, q, k):
    c = corpus.astype(np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    qn = q.astype(np.float64) / np.linalg.norm(q)
    sims = c @ qn
    order = np.lexsort((np.arange(len(c)), -sims))
    return list(order[:k])


def test_brute_force_matches_numpy_oracle(corpus, corpus_ds):
    queries = corpus[[5, 17]]
    out = sim.brute_force_topk(corpus_ds, queries, k=8, query_ids=np.array([5, 17]))
    for qid, qvec in zip([5, 17], queries):
        got = out[out["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert got == _exact_topk(corpus, qvec, 8)
        # self-match is rank 1 with cosine ~1
        assert got[0] == qid


def test_ivf_recall(corpus, corpus_ds):
    queries = corpus[[0, 100, 250]]
    params = sim.IvfIndexParams.fit(corpus_ds, nlist=8)
    out = sim.ivf_topk(corpus_ds, params, queries, k=5, nprobe=4,
                       query_ids=np.array([0, 100, 250]))
    hits = 0
    for qid, qvec in zip([0, 100, 250], queries):
        exact = set(_exact_topk(corpus, qvec, 5))
        got = set(out[out["query_id"] == qid]["vec_id"])
        hits += len(exact & got)
    assert hits >= 9  # ≥60% recall@5 with half the cells probed
    # and the trivially-correct hit: the query vector itself is found
    for qid in [0, 100, 250]:
        top1 = out[(out["query_id"] == qid) & (out["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == qid


def _naive_spherical_kmeans(corpus, init, iters):
    """Serial reference of the distributed fit's per-round math."""
    m = corpus.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    c = init.copy()
    for _ in range(iters):
        a = (m @ c.T).argmax(axis=1)
        c = c.copy()
        for j in range(len(c)):
            members = m[a == j]
            if len(members):
                c[j] = members.sum(axis=0) / len(members)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c


def test_fit_distributed_matches_serial_lloyds(corpus, corpus_ds):
    """The distributed Lloyd's rounds (per-block sum/count partials folded
    on the driver) must equal a serial spherical k-means from the SAME
    init, up to float-sum reassociation across blocks."""
    init = sim.IvfIndexParams.fit(corpus_ds, nlist=8).centroids
    want = _naive_spherical_kmeans(corpus, init, iters=3)
    got = sim.IvfIndexParams.fit_distributed(corpus_ds, nlist=8,
                                             iters=3).centroids
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_ivf_recall_with_distributed_fit(corpus, corpus_ds):
    """Iterated centroids must not LOSE recall vs the quick sample fit on
    the same probe budget — and the self-match invariant holds."""
    queries = corpus[[0, 100, 250]]
    params = sim.IvfIndexParams.fit_distributed(corpus_ds, nlist=8, iters=3)
    out = sim.ivf_topk(corpus_ds, params, queries, k=5, nprobe=4,
                       query_ids=np.array([0, 100, 250]))
    hits = 0
    for qid, qvec in zip([0, 100, 250], queries):
        exact = set(_exact_topk(corpus, qvec, 5))
        got = set(out[out["query_id"] == qid]["vec_id"])
        hits += len(exact & got)
    assert hits >= 9
    for qid in [0, 100, 250]:
        top1 = out[(out["query_id"] == qid) & (out["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == qid
