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


# ---------------------------------------------------------------------------
# per-partition-FILE column blooms (serving-scan equality pruning)
# ---------------------------------------------------------------------------
# Zone maps (cdc.compute_zone) prune range-refutable predicates; a high-
# cardinality EQUALITY predicate on a non-key column (content_sha256, a URL,
# a user id) almost never falls outside a partition's [min, max]. These
# blooms ride each partition data file's parquet FOOTER metadata — no new
# files (the data file's atomic write and gc carry them for free), no
# manifest growth (the committed pointer stays O(partitions), not
# O(partitions × bloom bytes)) — and a filtered read probes FOOTERS only
# for partitions the zones already admitted. Per-file blooms OR-compose:
# a delta partition admits a value if ANY of its files might contain it.

def value_hash64(arr) -> np.ndarray:
    """Stable uint64 hash of an Arrow array's values (must agree between
    the writer and every future reader, so: ints are their own hash;
    strings hash through the vectorized single-block MD5 head —
    content-defined, process- and version-independent). Binary columns are
    NOT supported (md5_head64_of_strs encodes str values; a bytes cell
    would crash mid-write) — the writer skips them via this TypeError and
    the reader admits conservatively."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ty = arr.type
    if pa.types.is_integer(ty):
        return arr.cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        from .hashing import md5_head64_of_strs

        vals = arr.to_numpy(zero_copy_only=False)
        return md5_head64_of_strs(vals)
    raise TypeError(f"bloom-indexed column must be integer or string, "
                    f"got {ty}")


def pack_column_bloom(arr, bits_per_value: int = 10, min_bits: int = 1 << 12,
                      max_bits: int = 1 << 23,
                      num_hashes: int = 5) -> dict | None:
    """Bloom descriptor for one column of one partition file:
    ``{"b64": packed-bitmap, "bits": m, "k": h}``. Sized to the file's
    value count (~1% fpp at 10 bits/value), power-of-two clamped — an
    over-full bloom degrades to admitting everything (pruning loss, never
    a correctness loss). Null values don't enter the bloom (equality
    predicates never match null)."""
    import base64

    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    if len(arr) == 0:
        return {"b64": "", "bits": 0, "k": num_hashes}  # refutes everything
    bits = min_bits
    while bits < min(max_bits, len(arr) * bits_per_value):
        bits <<= 1
    keys = value_hash64(arr)
    bitmap = np.zeros(bits, dtype=bool)
    bitmap[_positions(keys, bits, num_hashes).reshape(-1)] = True
    return {"b64": base64.b64encode(np.packbits(bitmap)).decode("ascii"),
            "bits": int(bits), "k": int(num_hashes)}


def bloom_might_contain(desc: dict, value) -> bool:
    """Probe one value against a ``pack_column_bloom`` descriptor. True on
    any doubt (malformed descriptor included) — False is a PROOF of
    absence."""
    import base64

    import pyarrow as pa

    try:
        if int(desc["bits"]) == 0:
            return False  # written from an all-null/empty column
        packed = np.frombuffer(base64.b64decode(desc["b64"]), dtype=np.uint8)
        key = value_hash64(pa.array([value]))
        return bool(bloom_contains(packed, key, int(desc["k"]))[0])
    except Exception:
        return True
