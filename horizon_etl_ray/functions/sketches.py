"""Mergeable cardinality sketch: vectorized 64-bit HyperLogLog.

Exact distinct counting moves every distinct value through an exchange
(the `profile_documents` path); at 10^10+ distinct values a PROFILING
query shouldn't pay that. HLL is the standard answer: a fixed 2^p-byte
register array per stream, mergeable by elementwise max — exactly the
per-block partial → fold shape every combiner in this engine uses, with
an O(1) exchange no matter the cardinality (16 KiB per block at p=14,
standard error 1.04/√m ≈ 0.8%).

Public algorithm (Flajolet et al. 2007, AMD 2013 64-bit variant): index =
top p hash bits, rho = leading-zero count of the remainder + 1, register =
max(rho) per index; estimate = α·m²/Σ2^-reg with linear counting below
2.5·m (the 64-bit hash space needs no large-range correction). No
third-party code — numpy throughout, no per-row Python.

Hashing: int64 columns use the engine's vectorized md5 head64
(functions/hashing.py — the content-addressed convention); other dtypes
use ``pandas.util.hash_array`` (deterministic fixed-key siphash, C rate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of uint32 values (0 → 0). float64 represents
    every uint32 exactly, so frexp's exponent IS floor(log2(x))+1."""
    _, e = np.frexp(x.astype(np.float64))
    return e.astype(np.int64)


def _rho64(rem: np.ndarray) -> np.ndarray:
    """rho of a NONZERO remainder that has already been shifted so the
    hash window occupies the TOP bits: the full-word leading-zero count IS
    the window's (the vacated low bits are zero), so rho = 64 -
    bit_length + 1 with no window correction. Regression note: subtracting
    the window offset here once made rho negative and the uint8 cast
    wrapped it — linear counting masked the blow-up below ~2.5·m, so the
    error-bound test sweeps cardinalities on BOTH sides of that switch."""
    rem = rem.astype(np.uint64)
    hi = (rem >> np.uint64(32)).astype(np.uint32)
    lo = (rem & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl = np.where(hi > 0, 32 + _bit_length_u32(hi), _bit_length_u32(lo))
    return (64 - bl) + 1


def hash_values(values, dtype=None) -> np.ndarray:
    """uint64 hashes for a column of values: md5 head64 for int64 ids (the
    engine convention), fixed-key siphash for everything else. Nulls must
    be dropped by the caller (count(DISTINCT x) semantics ignore them)."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        from .hashing import md5_of_ints

        head, _ = md5_of_ints(arr.astype(np.int64))
        return head
    return pd.util.hash_array(arr.astype(object), categorize=False)


def hll_partial(hashes: np.ndarray, p: int = 14) -> np.ndarray:
    """Register array for one block of uint64 hashes — the mergeable
    partial. O(block) work, O(2^p) output regardless of block size."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)  # uint64 wrap drops the index bits
    rho = np.where(rem == 0, (64 - p) + 1, _rho64(rem))
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sketches = elementwise register max (associative,
    commutative, idempotent — safe under any fold order or task retry)."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected estimate with linear counting for the small range."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697,
                                                       64: 0.709}[m]
    est = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, column: str, p: int = 14) -> float:
    """Distributed approximate distinct count of one Dataset column: per-
    block register partials (16 KiB each), folded with elementwise max.
    The fold is a bounded driver fold — O(blocks) tiny arrays, never the
    values themselves."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        col = pc.drop_null(t[column])
        regs = hll_partial(hash_values(col.to_numpy(zero_copy_only=False)), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None).iter_batches(
                                    batch_format="pyarrow"):
        for r in batch["regs"].to_pylist():
            merged = hll_merge(merged, np.asarray(r, dtype=np.uint8))
    return hll_estimate(merged)


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016) — mergeable rank
# estimation for FLOAT domains. The engine's exact quantile path
# (functions/quantiles.py) is exact BECAUSE it histograms an integer
# domain; continuous values (quality scores, latencies, losses) have no
# finite histogram, so the scale path is a sketch: O(k·log(n/k)) space,
# mergeable (concatenate levels, re-compact), rank error O(1/k)·n.
# Randomized odd/even compaction uses a seeded Generator so a given input
# order reproduces exactly; merges of differently-split streams agree to
# within the error bound (pinned by tests), not bit-exactly.
# ---------------------------------------------------------------------------


class KllSketch:
    """Levels of buffers; level i items each stand for 2^i input values.
    ``k`` bounds the top-level buffer (total space ~2k·... geometric)."""

    def __init__(self, k: int = 200, seed: int = 0x5EED):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed)

    def _capacity(self, level: int, num_levels: int) -> int:
        # higher levels get the full k; lower (older) levels shrink by 2/3
        c = self.k * (2.0 / 3.0) ** (num_levels - 1 - level)
        return max(2, int(np.ceil(c)))

    def update_many(self, values: np.ndarray) -> "KllSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compress()
        return self

    def _compress(self) -> None:
        while True:
            num = len(self.levels)
            for i, buf in enumerate(self.levels):
                if len(buf) > self._capacity(i, num):
                    srt = np.sort(buf)
                    off = int(self._rng.integers(0, 2))
                    promoted = srt[off::2]
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], promoted])
                    break  # level count may have changed: recompute caps
            else:
                return

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([b for b in self.levels]) if any(
            len(b) for b in self.levels) else np.empty(0)
        wts = np.concatenate([
            np.full(len(b), 1 << i, dtype=np.int64)
            for i, b in enumerate(self.levels)]) if len(vals) else np.empty(
                0, dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        """Value whose estimated rank is max(ceil(q·n), 1) — the same lower
        discrete-quantile convention as functions/quantiles.py."""
        if self.n == 0:
            raise ValueError("empty sketch")
        vals, wts = self._weighted()
        cum = np.cumsum(wts)
        rank = max(int(np.ceil(q * self.n)), 1)
        return float(vals[min(int(np.searchsorted(cum, rank)),
                              len(vals) - 1)])

    # -- (de)serialization for crossing task boundaries as plain bytes ----
    def to_bytes(self) -> bytes:
        """Includes the RNG's bit-generator state (ADVICE r4): a sketch that
        round-trips and is then further updated/merged must compress with
        the SAME random stream the originating sketch would have — the
        module's 'a given input order reproduces exactly' claim holds
        across the to_bytes/from_bytes task boundary."""
        import pickle

        return pickle.dumps((self.k, self.n,
                             [b.tobytes() for b in self.levels],
                             self._rng.bit_generator.state))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KllSketch":
        import pickle

        payload = pickle.loads(raw)
        if len(payload) == 3:  # pre-r5 bytes: no RNG state recorded
            k, n, bufs = payload
            state = None
        else:
            k, n, bufs, state = payload
        s = cls(k=k)
        s.n = n
        s.levels = [np.frombuffer(b, dtype=np.float64).copy() for b in bufs]
        if state is not None:
            s._rng.bit_generator.state = state
        return s


def approx_quantiles(ds, value_column: str, qs: dict[str, float],
                     group_column: str | None = None, k: int = 200):
    """Distributed approximate quantiles of a FLOAT column: one KLL partial
    per block (per group when ``group_column`` is given), folded on the
    driver — the exchange carries O(k·log) sketch bytes per block, never
    the values. Returns {group: {name: value}} (group None when ungrouped).
    Partial seeds derive from content so retries reproduce exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    _UNGROUPED = "\x00all"  # cannot collide: real group keys are stringified

    def partial(t: pa.Table) -> pa.Table:
        out_g, out_s = [], []
        if group_column is None:
            groups = {_UNGROUPED: np.arange(len(t))}
            vals = t[value_column].to_numpy(zero_copy_only=False)
        else:
            gv = t[group_column].to_numpy(zero_copy_only=False)
            vals = t[value_column].to_numpy(zero_copy_only=False)
            groups = {str(g): np.flatnonzero(gv == g) for g in pd.unique(gv)}
        for g, ix in groups.items():
            v = vals[ix].astype(np.float64)
            v = v[np.isfinite(v)]  # NaN/inf: dropped BEFORE seed derivation
            if len(v) == 0:  # all-null group slice: contributes nothing
                continue
            # content-derived seed via a bounded integer hash (ADVICE r4:
            # the old float(v[0])*1e6 int cast overflowed to inf for
            # |v[0]| ≳ 1.8e302 and collided for blocks sharing length +
            # first value); retries still reproduce exactly
            seed = int(pd.util.hash_array(v).sum()) & 0x7FFFFFFF
            sk = KllSketch(k=k, seed=seed).update_many(v)
            out_g.append(g)
            out_s.append(sk.to_bytes())
        return pa.table({"g": pa.array(out_g, pa.string()),
                         "sk": pa.array(out_s, pa.binary())})

    merged: dict[str, KllSketch] = {}
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for g, raw in zip(b["g"].to_pylist(), b["sk"].to_pylist()):
            s = KllSketch.from_bytes(raw)
            if g in merged:
                merged[g].merge(s)
            else:
                merged[g] = s
    return {(None if g == _UNGROUPED else g):
            {name: s.quantile(q) for name, q in qs.items()}
            for g, s in merged.items()}


# ---------------------------------------------------------------------------
# Misra-Gries frequent-items sketch (heavy hitters) — the scale path where
# the exact top-K vocabulary (pipelines/corpus.py:vocab_top_terms) would
# exchange every distinct term: k counters per block, mergeable by
# pointwise sum + prune (Agarwal et al., "Mergeable Summaries", PODS'12),
# DETERMINISTIC error ≤ n/(k+1): every item with true count above that is
# guaranteed present, and every reported count is a lower bound within
# that error of the truth. Public algorithm; plain dict/numpy.
# ---------------------------------------------------------------------------


def mg_partial(values, k: int = 256) -> tuple[dict, int, int]:
    """MG summary of one block: exact value counts pruned to ≤ k counters.
    Returns (counters, n, err) — ``err`` is the total weight subtracted by
    prunes so far (the summary-wide error bound: true count ∈
    [counters[x], counters[x] + err])."""
    counts = pd.Series(values).value_counts()
    n = int(counts.sum())
    counters, err = _mg_prune(dict(counts.items()), k)
    return counters, n, err


def _mg_prune(counters: dict, k: int) -> tuple[dict, int]:
    """Subtract the (k+1)-th largest count from every counter and drop the
    non-positive — the smallest uniform subtraction leaving ≤ k counters."""
    if len(counters) <= k:
        return counters, 0
    vals = np.sort(np.fromiter(counters.values(), dtype=np.int64))[::-1]
    s = int(vals[k])  # (k+1)-th largest
    out = {key: c - s for key, c in counters.items() if c - s > 0}
    return out, s


def mg_merge(a: tuple[dict, int, int], b: tuple[dict, int, int],
             k: int = 256) -> tuple[dict, int, int]:
    """Pointwise-sum the counters, then one prune back to k. Error bounds
    add: the merged summary still satisfies err ≤ (n_a + n_b)/(k+1)."""
    ca, na, ea = a
    cb, nb, eb = b
    merged = dict(ca)
    for key, c in cb.items():
        merged[key] = merged.get(key, 0) + c
    merged, s = _mg_prune(merged, k)
    return merged, na + nb, ea + eb + s


def approx_heavy_hitters(ds, column: str, k: int = 256,
                         explode=None) -> pd.DataFrame:
    """Distributed frequent items of a Dataset column: one MG partial per
    block (optionally ``explode``-ing each value into items first, e.g. a
    tokenizer), folded on the driver — the exchange carries ≤ k counters
    per block regardless of the distinct universe. Returns a DataFrame
    (item, count_min, count_max) sorted by count_min desc: true count is
    GUARANTEED inside [count_min, count_max], and anything with true count
    > total/(k+1) is guaranteed present."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        import pickle

        vals = t[column].to_numpy(zero_copy_only=False)
        if explode is not None and len(vals):  # sized reads can hand out
            vals = explode(vals)               # empty blocks on tiny files
        return pa.table({"mg": pa.array(
            [pickle.dumps(mg_partial(vals, k))], pa.binary())})

    import pickle

    acc: tuple[dict, int, int] | None = None
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for raw in b["mg"].to_pylist():
            part = pickle.loads(raw)
            acc = part if acc is None else mg_merge(acc, part, k)
    if acc is None:
        return pd.DataFrame({"item": [], "count_min": [], "count_max": []})
    counters, n, err = acc
    out = pd.DataFrame({"item": list(counters.keys()),
                        "count_min": np.fromiter(counters.values(),
                                                 dtype=np.int64)})
    out["count_max"] = out["count_min"] + err
    return (out.sort_values(["count_min", "item"],
                            ascending=[False, True])
            .reset_index(drop=True))
