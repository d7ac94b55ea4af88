"""sources/reader.py — data-sized read planning.

Pins the block math (max(min_blocks, bytes/32MiB)) and that the sized read
actually produces that many blocks, so a future Ray upgrade or refactor
can't silently reintroduce the 200-block fan-out that cost 12.8× on the
pair operators (see BASELINE.md round-3 notes)."""

import os
import sys

sys.path.insert(0, "/root/repo")

from horizon_etl_ray.sources.reader import TARGET_READ_BLOCK, read_parquet_sized

SF = "/root/testdata/sf0.001"


def test_small_table_reads_min_blocks(ray_session):
    path = f"{SF}/documents.parquet"
    assert os.path.getsize(path) < TARGET_READ_BLOCK
    ds = read_parquet_sized(path, columns=["doc_id"], min_blocks=4)
    mat = ds.materialize()
    assert mat.num_blocks() <= 4  # never the 200-block default fan-out
    assert mat.count() == 500


def test_explicit_override_wins(ray_session):
    ds = read_parquet_sized(f"{SF}/documents.parquet", columns=["doc_id"],
                            min_blocks=4, override_num_blocks=2)
    assert ds.materialize().num_blocks() <= 2


def test_block_math_scales_with_bytes():
    # pure arithmetic: a 100-GiB file must NOT be capped at min_blocks
    size = 100 << 30
    want = -(-size // TARGET_READ_BLOCK)
    assert want == 3200  # 100 GiB / 32 MiB
    assert max(4, want) == want
