"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
query matrix broadcast ONCE with ``ray.put`` (never re-shipped per batch).
Scale path: IVF — coarse-quantize the corpus into ``nlist`` buckets (seeded
k-means-style centroids), search only the ``nprobe`` closest buckets per
query. Both stream the corpus through ``map_batches``; nothing materializes
the full dataset.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64, copy=False)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v) for v in col])


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_ids: np.ndarray | None = None,
):
    """Exact cosine top-k of each query against the corpus Dataset.

    Per corpus batch: one matmul queries×batch → per-query local top-k rows;
    a final tiny groupby-per-query merge keeps the global top-k. Returns a
    pandas DataFrame (query_id, rank, vec_id, cosine) — small (Q×k rows).
    """
    import ray

    qm = _normalize(np.atleast_2d(queries))
    qids = query_ids if query_ids is not None else np.arange(len(qm))
    qref = ray.put((qm, np.asarray(qids)))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q, qi = ray.get(qref)
        c = _normalize(_stack(batch[vec_column].to_numpy()))
        ids = batch[id_column].to_numpy()
        sims = q @ c.T  # (Q, B)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = {
            "query_id": np.repeat(qi, kk),
            "vec_id": ids[part].ravel(),
            "cosine": np.take_along_axis(sims, part, axis=1).ravel(),
        }
        return pd.DataFrame(rows)

    local = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)  # pandas: per-block numpy matmul top-k partial

    # global merge: Q×k per block → driver-side heap (tiny)
    best: dict[int, list] = {}
    for b in local.iter_batches(batch_format="pandas", batch_size=65536):  # pandas: driver k-way merge of tiny top-k partials
        for q, v, s in zip(b["query_id"], b["vec_id"], b["cosine"]):
            h = best.setdefault(int(q), [])
            item = (float(s), -int(v))  # tiebreak: smaller vec_id wins
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    out = []
    for q, h in sorted(best.items()):
        ranked = sorted(h, reverse=True)
        for rank, (s, negv) in enumerate(ranked, start=1):
            out.append((q, rank, -negv, s))
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "cosine"])


# --------------------------------------------------------------------------
# IVF (coarse-quantized) variant — the scale path
# --------------------------------------------------------------------------


class IvfIndexParams:
    """Seeded coarse centroids learned from a sample (one pass, no iteration
    — 'k-means--' style seeding is enough for bucketing)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @classmethod
    def fit(cls, ds, nlist: int = 16, vec_column: str = "embedding",
            sample_rows: int = 4096, seed: int = 42) -> "IvfIndexParams":
        # seeded CORPUS-WIDE Bernoulli sample (ds.random_sample), never the
        # first blocks — a corpus sorted by anything meaningful would bias
        # limit()-style sampling and the buckets with it
        n = ds.count()
        if n > sample_rows:
            frac = min(1.0, (sample_rows * 1.2) / n)
            sample = ds.random_sample(frac, seed=seed).to_pandas()
            if len(sample) > sample_rows:  # trim overshoot, still seeded
                pick = np.random.default_rng(seed).choice(
                    len(sample), size=sample_rows, replace=False)
                sample = sample.iloc[np.sort(pick)]
        else:
            sample = ds.to_pandas()
        m = _normalize(_stack(sample[vec_column].to_numpy()))
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(m), size=min(nlist, len(m)), replace=False)
        centroids = m[idx]
        # one Lloyd refinement pass over the sample for stabler buckets
        assign = (m @ centroids.T).argmax(axis=1)
        for j in range(len(centroids)):
            members = m[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
        return cls(centroids)

    @classmethod
    def fit_distributed(cls, ds, nlist: int = 16,
                        vec_column: str = "embedding", iters: int = 4,
                        sample_rows: int = 4096,
                        seed: int = 42) -> "IvfIndexParams":
        """FULL-CORPUS spherical k-means (Lloyd's) — the scale path when
        the sample-seeded one-pass fit isn't enough (skewed corpora, large
        ``nlist``): init from :meth:`fit`, then ``iters`` rounds where each
        block emits per-centroid (vector sum, member count) partials —
        ONE streaming ``map_batches`` pass per round, no shuffle, and the
        driver folds only ``nlist × dim`` floats per block. Centroids are
        re-normalized each round (cosine/spherical variant, matching the
        dot-product assignment ``ivf_topk`` uses); empty clusters keep
        their previous centroid. Deterministic given the seed up to
        float-sum reassociation across blocks."""
        import ray

        cents = cls.fit(ds, nlist=nlist, vec_column=vec_column,
                        sample_rows=sample_rows, seed=seed).centroids
        k, dim = cents.shape
        for _ in range(iters):
            ref = ray.put(cents)

            def partial(batch: pd.DataFrame) -> pd.DataFrame:
                c = ray.get(ref)
                m = _normalize(_stack(batch[vec_column].to_numpy()))
                a = (m @ c.T).argmax(axis=1)
                rows = []
                for j in range(len(c)):
                    members = m[a == j]
                    if len(members):
                        rows.append({"j": j, "n": len(members),
                                     "s": members.sum(axis=0).tolist()})
                if not rows:
                    return pd.DataFrame({"j": pd.Series([], dtype=np.int64),
                                         "n": pd.Series([], dtype=np.int64),
                                         "s": pd.Series([], dtype=object)})
                return pd.DataFrame(rows)

            parts = ds.map_batches(partial,
                                   batch_format="pandas").to_pandas()  # pandas: IVF assign partial
            sums = np.zeros((k, dim))
            cnts = np.zeros(k, dtype=np.int64)
            for j, n, s in zip(parts["j"], parts["n"], parts["s"]):
                sums[int(j)] += np.asarray(s, dtype=np.float64)
                cnts[int(j)] += int(n)
            nz = cnts > 0
            cents = cents.copy()
            cents[nz] = sums[nz] / cnts[nz, None]
            cents = _normalize(cents)
        return cls(cents)


def ivf_topk(
    ds,
    params: IvfIndexParams,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    query_ids: np.ndarray | None = None,
):
    """ANN top-k: score only corpus rows whose nearest centroid is among each
    query's ``nprobe`` closest centroids. Same streaming shape as brute force
    with a vectorized bucket mask per batch (the 1/nlist×nprobe work saving
    is what survives at 10^10 rows)."""
    import ray

    qm = _normalize(np.atleast_2d(queries))
    qids = np.asarray(query_ids if query_ids is not None else np.arange(len(qm)))
    qprobe = np.argsort(-(qm @ params.centroids.T), axis=1)[:, :nprobe]
    qref = ray.put((qm, qids, qprobe, params.centroids))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        q, qi, probe, cent = ray.get(qref)
        c = _normalize(_stack(batch[vec_column].to_numpy()))
        ids = batch[id_column].to_numpy()
        cell = (c @ cent.T).argmax(axis=1)  # corpus row → bucket
        frames = []
        for row in range(len(q)):
            mask = np.isin(cell, probe[row])
            if not mask.any():
                continue
            sims = q[row] @ c[mask].T
            sel_ids = ids[mask]
            kk = min(k, len(sel_ids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(kk, qi[row]),
                        "vec_id": sel_ids[part],
                        "cosine": sims[part],
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    local = ds.map_batches(local_topk, batch_format="pandas", batch_size=4096)  # pandas: per-block numpy matmul top-k partial
    best: dict[int, list] = {}
    for b in local.iter_batches(batch_format="pandas", batch_size=65536):  # pandas: driver k-way merge of tiny top-k partials
        for q, v, s in zip(b["query_id"], b["vec_id"], b["cosine"]):
            h = best.setdefault(int(q), [])
            item = (float(s), -int(v))
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    out = []
    for q, h in sorted(best.items()):
        for rank, (s, negv) in enumerate(sorted(h, reverse=True), start=1):
            out.append((q, rank, -negv, s))
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "cosine"])
