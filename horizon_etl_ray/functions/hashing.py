"""Vectorized hashing kernels used on the hot path.

Design notes (scale):
  - Partition assignment must be deterministic across processes, Python
    versions and cluster nodes, because the checkpoint manifest keys on
    ``part_id`` — we use pandas' SipHash-1-3 (``pd.util.hash_array`` with its
    fixed default key), which is stable and vectorized, NOT Python's
    per-process-salted ``hash()``.
  - ``content_sha256`` is the per-row correctness invariant
    (/root/reference/src/tracking/recorder.py:36-40 discipline); sha256 has no
    pyarrow kernel, so it's a tight loop over the Arrow buffer views — this is
    the intended dominant compute of the validate stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_key_columns(table: pa.Table, key_columns: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of the composite key, vectorized.

    Multi-column keys are combined with a 64-bit mix (golden-ratio multiply +
    xor) instead of string concatenation, so no separator-collision and no
    per-row Python string building.
    """
    out: np.ndarray | None = None
    for col in key_columns:
        arr = table[col]
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            values = arr.to_numpy(zero_copy_only=False).astype(object)
            h = pd.util.hash_array(values)
        else:
            h = pd.util.hash_array(np.ascontiguousarray(arr.to_numpy(zero_copy_only=False)))
        h = h.astype(np.uint64, copy=False)
        if out is None:
            out = h.copy()
        else:
            out = (out * np.uint64(0x9E3779B97F4A7C15)) ^ h
    assert out is not None, "at least one key column required"
    return out


def assign_partition(
    table: pa.Table, key_columns: list[str], num_partitions: int
) -> np.ndarray:
    """``part_id = siphash(key) % P`` as int32."""
    return (hash_key_columns(table, key_columns) % np.uint64(num_partitions)).astype(
        np.int32
    )


def sha256_column(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 hex of a string/binary column; null/empty → ''.

    Loops over rows by necessity (no vectorized sha256 kernel); operates on
    Arrow buffer memoryviews to avoid building intermediate Python str objects
    where possible.
    """
    sha = hashlib.sha256
    out: list[str] = []
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    for chunk in chunks:
        if pa.types.is_string(chunk.type) or pa.types.is_large_string(chunk.type):
            chunk = chunk.cast(pa.large_binary())
        elif pa.types.is_binary(chunk.type):
            chunk = chunk.cast(pa.large_binary())
        for v in chunk:
            if not v.is_valid:
                out.append("")
            else:
                out.append(sha(v.as_buffer()).hexdigest())
    return pa.array(out, type=pa.string())
