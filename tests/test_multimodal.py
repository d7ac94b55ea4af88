"""Multimodal plumbing: binary payload columns + actor-pool decode stages
(decode kernel stubbed — schema, batch sizing and layout are real)."""

import numpy as np
import pyarrow as pa

from horizon_etl_ray.stages.multimodal import (
    DecodeStage,
    FrameSampleStage,
    attach_payload,
)


def _docs_table():
    return pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": ["hello world", "abc", "the quick brown fox"]})


def test_attach_payload_schema():
    t = attach_payload(_docs_table())
    assert t.schema.field("payload").type == pa.binary()
    assert t.schema.field("size_bytes").type == pa.int64()
    assert t["size_bytes"].to_pylist() == [11, 3, 19]


def test_decode_stage_fixed_width_features():
    t = attach_payload(_docs_table())
    out = DecodeStage()(t)
    assert out.column_names == ["doc_id", "features", "size_bytes"]
    feats = np.array(out["features"].to_pylist())
    assert feats.shape == (3, 8)
    # deterministic stub: same payload → same features
    again = np.array(DecodeStage()(t)["features"].to_pylist())
    assert np.array_equal(feats, again)
    assert ((feats >= 0) & (feats <= 1)).all()


def test_frame_sample_explodes_rows():
    t = attach_payload(_docs_table())
    out = FrameSampleStage(n_frames=3, frame_bytes=4)(t)
    assert out.column_names == ["doc_id", "frame_idx", "frame"]
    assert len(out) == 9  # 3 docs × 3 frames
    assert out["frame_idx"].to_pylist()[:3] == [0, 1, 2]


def test_decode_in_ray_pipeline():
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).map_batches(
        attach_payload, batch_format="pyarrow"
    ).map_batches(DecodeStage, batch_format="pyarrow", batch_size=2,
                  concurrency=(1, 2))
    out = ds.to_pandas()
    assert len(out) == 3
    assert len(out["features"][0]) == 8


def test_resize_stage_bounds_and_metadata():
    from horizon_etl_ray.stages.multimodal import ResizeStage

    t = attach_payload(_docs_table())
    out = ResizeStage(target_bytes=8)(t)
    assert out.column_names == ["doc_id", "payload", "size_bytes",
                                "resize_ratio"]
    sizes = out["size_bytes"].to_pylist()
    assert all(s <= 8 for s in sizes)
    # deterministic: same payload → same resized bytes
    again = ResizeStage(target_bytes=8)(t)
    assert out["payload"].to_pylist() == again["payload"].to_pylist()
    # already-small payloads pass through (ratio 1.0)
    small = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                      "text": pa.array(["hi"])})
    s_out = ResizeStage(target_bytes=8)(attach_payload(small))
    assert s_out["payload"].to_pylist() == [b"hi"]
    assert s_out["resize_ratio"].to_pylist() == [1.0]


def test_resize_in_ray_pipeline():
    import ray.data as rd

    from horizon_etl_ray.stages.multimodal import ResizeStage

    ds = rd.from_arrow(_docs_table()).map_batches(
        attach_payload, batch_format="pyarrow"
    ).map_batches(ResizeStage, batch_format="pyarrow", batch_size=2,
                  concurrency=(1, 2))
    out = ds.to_pandas()
    assert len(out) == 3
    assert (out["size_bytes"] <= 64).all()


def test_byte_features_known_entropy():
    import math

    import pyarrow as pa

    from horizon_etl_ray.stages.multimodal import ByteFeatureStage, attach_payload

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["aaaa",          # one symbol → entropy 0
                          "abab",          # two equiprobable → entropy 1
                          "abcd",          # four equiprobable → entropy 2
                          ""]),            # empty → dropped
    })
    out = ByteFeatureStage()(attach_payload(t)).to_pydict()
    assert out["doc_id"] == [1, 2, 3]
    assert out["size_bytes"] == [4, 4, 4]
    assert out["n_distinct_bytes"] == [1, 2, 4]
    assert out["entropy"] == [0.0, 1.0, 2.0]
    # non-uniform: 'aab' → -(2/3 log2 2/3 + 1/3 log2 1/3)
    t2 = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                   "text": pa.array(["aab"])})
    e = ByteFeatureStage()(attach_payload(t2))["entropy"].to_pylist()[0]
    want = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(e - round(want, 6)) < 1e-9
