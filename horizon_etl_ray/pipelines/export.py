"""Export sinks: JSON artifacts + Parquet mirror (K2/K4/F7 parity).

- ``export_json``: streaming-collect a (small, final) Dataset into one JSON
  array file, written atomically (temp+fsync+rename,
  /root/reference/src/core/logic/atomic_io.py:16-41) with the
  never-overwrite-good-data-with-empty guard
  (/root/reference/src/core/logic/canonical_exporter.py:970-992).
- ``export_parquet_mirror``: zstd parquet + a ``.cols.json`` sidecar naming
  the columns (the reference's mirror records stringified nested columns the
  same way, /root/reference/src/scripts/export_parquet.py:44-61).

Only use ``export_json`` for result-sized data (marts, reports); the lake
itself stays partitioned parquet.
"""

from __future__ import annotations

import json
import os
from datetime import date, datetime
from typing import Any

from ..state.manifest import atomic_write_bytes


def _json_default(o: Any):
    if isinstance(o, (datetime, date)):
        return o.isoformat()
    return str(o)


def export_json(ds, out_path: str, allow_empty: bool = False) -> int:
    """Write a Dataset as one JSON array file. Returns row count."""
    rows: list[dict] = []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
        rows.extend(batch.to_dict("records"))
    if not rows and not allow_empty and os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
        if existing:
            raise RuntimeError(
                f"refusing to overwrite non-empty export {out_path} "
                f"({len(existing)} rows) with an empty result"
            )
    blob = json.dumps(rows, default=_json_default, ensure_ascii=False, indent=1)
    atomic_write_bytes(out_path, blob.encode())
    return len(rows)


def export_parquet_mirror(ds, out_dir: str, name: str) -> dict:
    """zstd parquet directory + .cols.json sidecar."""
    target = os.path.join(out_dir, name)
    ds.write_parquet(target, compression="zstd")
    cols = [f.name for f in (ds.schema().base_schema)]
    atomic_write_bytes(
        os.path.join(out_dir, f"{name}.cols.json"),
        json.dumps({"columns": cols}, indent=1).encode(),
    )
    return {"path": target, "columns": cols}
