"""Distributed Bloom-filter build + vectorized membership filter.

The scale path for semi-joins whose build side is too large to broadcast as
an exact key set (the Bloom note in ``anti_join_customers`` /
``q3_top_orders``): each block of the build side hashes its keys into a
fixed-size bitmap (map_batches, vectorized double hashing), the driver ORs
the per-block bitmaps (fixed O(bits) work per block, independent of key
count), and the probe side filters batches against the broadcast bitmap.
False positives are expected — callers must re-verify survivors with an
exact join at the (much smaller) post-filter scale.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = keys.astype(np.uint64)
    h1 = (k * _M1) ^ (k >> np.uint64(29))
    h2 = (k * _M2) ^ (k >> np.uint64(31))
    return h1, h2 | np.uint64(1)  # odd step → full-cycle double hashing


def _positions(keys: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    h1, h2 = _h2(keys)
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(num_bits))


def build_bloom(ds, column: str, num_bits: int = 1 << 23,
                num_hashes: int = 5) -> np.ndarray:
    """Build the bitmap over ``ds[column]`` (int64 keys). Distributed: one
    bitmap per block (vectorized), OR-reduced on the driver — driver work is
    O(blocks × bits/8), never O(keys)."""
    import ray

    @ray.remote(num_cpus=1)
    def block_bitmap(t) -> np.ndarray:
        keys = t[column].to_numpy(zero_copy_only=False)
        bits = np.zeros(num_bits, dtype=bool)
        pos = _positions(keys, num_bits, num_hashes).reshape(-1)
        bits[pos] = True
        return np.packbits(bits)

    refs = [block_bitmap.remote(ref)
            for ref in ds.select_columns([column]).to_arrow_refs()]
    acc = np.zeros(num_bits // 8, dtype=np.uint8)
    for r in refs:
        acc |= ray.get(r)
    return acc


def bloom_contains(packed: np.ndarray, keys: np.ndarray,
                   num_hashes: int = 5) -> np.ndarray:
    """Vectorized membership mask for int64 ``keys`` against a packed
    bitmap (as returned by ``build_bloom``)."""
    num_bits = len(packed) * 8
    pos = _positions(keys, num_bits, num_hashes)
    byte_idx = (pos // 8).astype(np.int64)
    bit_idx = (7 - (pos % 8)).astype(np.uint8)  # packbits is MSB-first
    hits = (packed[byte_idx] >> bit_idx) & 1
    return hits.all(axis=0).astype(bool)
