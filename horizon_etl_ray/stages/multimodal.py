"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool ``map_batches`` stages.

The image/audio codecs are NOT available in this environment, so the decode
kernel is stubbed (clearly marked); everything Ray-side — schema, batch
sizing, actor signature, output layout — is real and tested
(tests/test_multimodal.py). Swap ``_decode_stub`` for PIL/torchaudio in a
real deployment; nothing else changes.

Scale notes: payloads can be MBs → small ``batch_size`` and
``batch_format="pyarrow"`` (binary columns do NOT round-trip pandas
cleanly); decode state (codec tables, model weights) loads once per actor in
``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def attach_payload(t: pa.Table, text_column: str = "text",
                   payload_column: str = "payload") -> pa.Table:
    """Wrap a column as an opaque binary payload + typed metadata columns
    (media_type, size_bytes) — the lake representation of multimodal data."""
    import pyarrow.compute as pc

    payload = t[text_column].cast(pa.binary())
    t = t.append_column(payload_column, payload)
    t = t.append_column("media_type", pa.array(["application/octet-stream"] * len(t)))
    t = t.append_column("size_bytes", pc.binary_length(payload).cast(pa.int64()))
    return t


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB — stands in for an image/audio decode (PIL.Image.open /
    torchaudio.load). Deterministic fake: 8 float32 'features' derived from
    the payload digest. Raise instead if a hard failure is preferred:
    ``raise NotImplementedError("no codec in this environment")``."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint32).astype(np.float32)[:8] / np.float32(2**32)


class DecodeStage:
    """Actor-pool decode/feature-extract stage.

    Use as::

        ds.map_batches(DecodeStage, batch_format="pyarrow",
                       batch_size=256,            # payloads are large
                       concurrency=(1, N), num_cpus=1)

    ``__init__`` is the once-per-actor codec/model load; ``__call__`` decodes
    a batch and emits fixed-width feature vectors + pass-through metadata.
    """

    def __init__(self, payload_column: str = "payload", id_column: str = "doc_id"):
        self.payload_column = payload_column
        self.id_column = id_column
        # real deployment: load codec / model weights here, once per actor
        self.decode = _decode_stub

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self.decode(v.as_py() or b"") for v in t[self.payload_column]]
        mat = np.stack(feats) if feats else np.zeros((0, 8), dtype=np.float32)
        return pa.table(
            {
                self.id_column: t[self.id_column],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), 8
                ),
                "size_bytes": t["size_bytes"],
            }
        )


class ResizeStage:
    """Actor-pool resize/transcode stage for image-shaped payloads:
    binary in → binary out (plus refreshed ``size_bytes`` and a
    ``resize_ratio`` metadata column), the layout a real
    PIL ``Image.resize`` + re-encode would produce.

    The resize KERNEL is a stub (no codecs in this environment,
    clearly marked): a deterministic byte subsample down to
    ``target_bytes``. Swap ``self.resize`` for a real decode→resize→encode
    in deployment; the Ray-side plumbing (actor signature, pyarrow-only
    batches, small ``batch_size`` for MB-scale payloads, output schema) is
    real and tested (tests/test_multimodal.py)."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "doc_id", target_bytes: int = 64):
        self.payload_column = payload_column
        self.id_column = id_column
        self.target_bytes = target_bytes
        # real deployment: load the codec here, once per actor
        self.resize = self._resize_stub

    def _resize_stub(self, payload: bytes) -> bytes:
        """STUB — stands in for decode→resize→re-encode. Deterministic:
        every k-th byte so the output is ≤ target_bytes."""
        if len(payload) <= self.target_bytes:
            return payload
        step = -(-len(payload) // self.target_bytes)  # ceil div
        return payload[::step]

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        resized = [self.resize(v.as_py() or b"")
                   for v in t[self.payload_column]]
        out = pa.array(resized, type=pa.binary())
        new_len = pc.binary_length(out).cast(pa.float64())
        old_len = pc.binary_length(
            t[self.payload_column].cast(pa.binary())).cast(pa.float64())
        ratio = pc.if_else(pc.greater(old_len, 0.0),
                           pc.divide(new_len, old_len), pa.scalar(1.0))
        return pa.table(
            {
                self.id_column: t[self.id_column],
                self.payload_column: out,
                "size_bytes": pc.binary_length(out).cast(pa.int64()),
                "resize_ratio": ratio,
            }
        )


class FrameSampleStage:
    """Actor-pool frame/chunk sampler for video/audio-shaped payloads:
    deterministically samples ``n_frames`` byte-chunks per payload (stub for
    a real frame extractor) and explodes one row per sampled frame —
    demonstrates the 1→N row layout (flat_map-shaped output from
    map_batches, which is how Ray Data expresses explode efficiently)."""

    def __init__(self, payload_column: str = "payload", id_column: str = "doc_id",
                 n_frames: int = 3, frame_bytes: int = 32):
        self.payload_column = payload_column
        self.id_column = id_column
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for rid, v in zip(t[self.id_column], t[self.payload_column]):
            data = v.as_py() or b""
            if not data:
                # contract: empty/null payloads produce NO frames (mirrors
                # the SQL twin's length(text) > 0 predicate); callers who
                # need every id use an outer join back to the id table
                continue
            stride = max(1, len(data) // self.n_frames)
            for i in range(self.n_frames):
                start = min(i * stride, max(len(data) - 1, 0))
                ids.append(rid.as_py())
                frame_idx.append(i)
                frames.append(data[start : start + self.frame_bytes])
        return pa.table(
            {
                self.id_column: pa.array(ids, type=t[self.id_column].type),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


class ByteFeatureStage:
    """Actor-pool feature-extract stage over opaque binary payloads — the
    feature-extraction member of the decode/resize/frame-sample family that
    needs NO codec, so it is fully REAL in this environment (not a stub):
    per payload, byte-histogram statistics (size, distinct byte count) and
    the Shannon entropy of the byte distribution — the standard cheap
    corpus-quality signals for binary media (compressed/encrypted payloads
    ≈ 8 bits/byte, text ≈ 4-5). A model-based extractor plugs in with the
    same signature (load in ``__init__``, batch in ``__call__``).

    Kernel: ``np.frombuffer`` + ``np.bincount`` per payload — zero-copy
    views, no Python byte loops."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "doc_id"):
        self.payload_column = payload_column
        self.id_column = id_column

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, sizes, distincts, entropies = [], [], [], []
        for rid, v in zip(t[self.id_column], t[self.payload_column]):
            data = v.as_py() or b""
            if not data:
                # contract: empty/null payloads emit no feature row (the
                # oracle's length(text) > 0 predicate) — NOT an implicit
                # drop; documented so it matches DecodeStage's keep-row
                # behavior intentionally differing for featureless inputs
                continue
            a = np.frombuffer(data, dtype=np.uint8)
            counts = np.bincount(a, minlength=256)
            p = counts[counts > 0] / len(a)
            ids.append(rid.as_py())
            sizes.append(len(data))
            distincts.append(int(len(p)))
            entropies.append(round(float(-(p * np.log2(p)).sum()), 6))
        return pa.table({
            self.id_column: pa.array(ids, type=t[self.id_column].type),
            "size_bytes": pa.array(sizes, pa.int64()),
            "n_distinct_bytes": pa.array(distincts, pa.int64()),
            "entropy": pa.array(entropies, pa.float64()),
        })
