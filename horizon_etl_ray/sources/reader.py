"""Data-sized parquet reads.

Ray's read planning applies a 200-block minimum (``read_op_min_num_blocks``)
sized for big clusters; on a sub-MB table it fans the read into hundreds of
few-row blocks, and every downstream map stage and sort exchange then pays
~200 task launches of pure overhead. Measured on the ngram-Jaccard pair
operator at sf0.01: 126.7 s with the default fan-out, 9.9 s with a
data-sized read (12.8×), byte-identical output.

``read_parquet_sized`` plans ``max(min_blocks, file_bytes / 32 MiB)``
blocks — at real scale this converges to Ray's own bytes-per-block sizing
(the 200-block floor is moot once the input exceeds ~6 GiB), so the knob
only removes toy-scale overhead, it never caps large reads.

Alternative considered: lowering
``DataContext.get_current().read_op_min_num_blocks`` once at init. Rejected
because the library does not own the Ray session (the driver calls
``ray.init`` and may rely on defaults elsewhere); a per-read override keeps
the change scoped to reads this engine plans. CDC replay reads pass their
own explicit ``override_num_blocks`` (pipelines/cdc.py) and are unaffected
either way.
"""

from __future__ import annotations

import os

TARGET_READ_BLOCK = 32 << 20  # bytes of parquet per read block


def read_parquet_sized(path: str, columns=None, min_blocks: int = 4, **kw):
    import ray.data as rd

    if "override_num_blocks" not in kw:
        kw["override_num_blocks"] = max(
            min_blocks, -(-os.path.getsize(path) // TARGET_READ_BLOCK))
    return rd.read_parquet(path, columns=columns, **kw)
