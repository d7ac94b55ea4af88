"""Fuzzy matcher vectors (reference parity), JSON export guard, JSON tail
source parity."""

import json

import pyarrow as pa
import pytest

from horizon_etl_ray.functions.fuzzy import (
    block_key,
    fuzzy_match_pairs,
    token_sort_ratio,
)
from horizon_etl_ray.pipelines.export import export_json, export_parquet_mirror


def test_token_sort_ratio_vectors():
    assert token_sort_ratio("PAULO SERGIO JUNIOR", "JUNIOR PAULO SERGIO") == 100
    assert token_sort_ratio("", "") == 100
    assert token_sort_ratio("ANA MARIA SILVA", "ANA MARIA DA SILVA") >= 90
    assert token_sort_ratio("ANA SILVA", "PEDRO COSTA") < 60


def test_block_key():
    assert block_key("Pãulo Sérgio Junior") == "PAULO|JUNIOR"
    assert block_key("João de Souza") == "JOAO|SOUZA"  # particles excluded
    assert block_key("") == ""


def test_fuzzy_match_pairs_blocked():
    import ray.data as rd

    rows = [
        {"id": 1, "name": "Paulo Sergio Junior"},
        {"id": 2, "name": "Paulo Sérgio Junior"},   # accent variant → match
        {"id": 3, "name": "Paulo Roberto Junior"},  # same block, below 100
        {"id": 4, "name": "Maria Clara Souza"},     # different block
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = fuzzy_match_pairs(ds, threshold=90).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in got
    assert not any(4 in p for p in got)
    strict = fuzzy_match_pairs(ds, strict=True).to_pandas()
    sgot = set(map(tuple, strict[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in sgot and (1, 3) not in sgot


def test_export_json_atomic_and_guard(tmp_path):
    import ray.data as rd

    out = str(tmp_path / "mart.json")
    ds = rd.from_items([{"a": 1}, {"a": 2}])
    assert export_json(ds, out) == 2
    assert json.load(open(out)) == [{"a": 1}, {"a": 2}]

    empty = rd.from_items([{"a": 1}]).filter(lambda r: False)
    with pytest.raises(RuntimeError, match="refusing to overwrite"):
        export_json(empty, out)
    assert json.load(open(out)) == [{"a": 1}, {"a": 2}]  # untouched
    assert export_json(empty, out, allow_empty=True) == 0


def test_export_parquet_mirror(tmp_path):
    import ray.data as rd

    ds = rd.from_items([{"a": 1, "b": "x"}])
    info = export_parquet_mirror(ds, str(tmp_path), "mirror")
    assert info["columns"] == ["a", "b"]
    assert json.load(open(str(tmp_path / "mirror.cols.json")))["columns"] == ["a", "b"]
    assert rd.read_parquet(info["path"]).take_all() == [{"a": 1, "b": "x"}]


def test_json_tail_source_parity(tmp_path):
    """S2/S5 parity: the same change events delivered as JSON-lines replay to
    the same lake digest as the parquet tail."""
    import ray.data as rd

    from horizon_etl_ray.pipelines.cdc import CdcConfig, apply_epoch, lake_global_digest
    from horizon_etl_ray.sources.generator import EventGenConfig, generate_events_table

    cfg = EventGenConfig(n_keys=60, n_events=800, seed=19, content_mean_bytes=80)
    t = generate_events_table(cfg)
    jpath = str(tmp_path / "events.jsonl")
    with open(jpath, "w") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r) + "\n")

    lake_j, lake_p = str(tmp_path / "lj"), str(tmp_path / "lp")
    apply_epoch(rd.read_json(jpath), lake_j, 0, CdcConfig(num_partitions=4))
    apply_epoch(rd.from_arrow(t), lake_p, 0, CdcConfig(num_partitions=4))
    assert lake_global_digest(lake_j) == lake_global_digest(lake_p)


def test_sharded_corpus_export_resumes_and_skips_done(tmp_path, ray_session):
    """Resumable sharded export: a rerun (a) skips marker-complete shards
    without rewriting their files, (b) removes and rewrites a crashed
    (unmarked) shard, and the read-back equals the input either way."""
    import os
    import shutil
    import time

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from horizon_etl_ray.pipelines.export import export_sharded_corpus

    df = pd.DataFrame({"doc_id": range(200), "text": [f"t{i}" for i in range(200)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "corpus_out")

    m1 = export_sharded_corpus(ds, out, num_shards=4)
    assert sorted(m1["written"]) == [0, 1, 2, 3] and m1["rows_written"] == 200
    back = rd.read_parquet(out).to_pandas()
    assert sorted(back["doc_id"]) == list(range(200))

    # full rerun: everything marker-complete → nothing written
    mtimes = {}
    for k in range(4):
        sdir = os.path.join(out, f"shard={k}")
        mtimes[k] = {f: os.path.getmtime(os.path.join(sdir, f))
                     for f in os.listdir(sdir)}
    m2 = export_sharded_corpus(ds, out, num_shards=4)
    assert m2["written"] == [] and m2["skipped"] == [0, 1, 2, 3]
    assert m2["rows_written"] == 0
    for k in range(4):
        sdir = os.path.join(out, f"shard={k}")
        assert {f: os.path.getmtime(os.path.join(sdir, f))
                for f in os.listdir(sdir)} == mtimes[k]

    # crash simulation: shard 2's marker is gone and its dir is partial
    os.unlink(os.path.join(out, "_shard_2.done"))
    sdir2 = os.path.join(out, "shard=2")
    victim = os.path.join(sdir2, os.listdir(sdir2)[0])
    with open(victim, "ab") as f:
        f.write(b"CORRUPT PARTIAL WRITE")
    time.sleep(0.01)
    m3 = export_sharded_corpus(ds, out, num_shards=4)
    assert m3["written"] == [2] and sorted(m3["skipped"]) == [0, 1, 3]
    assert m3["rows_written"] > 0
    back3 = rd.read_parquet(out).to_pandas()
    assert sorted(back3["doc_id"]) == list(range(200))
    # untouched shards kept their original files
    for k in (0, 1, 3):
        sdir = os.path.join(out, f"shard={k}")
        assert {f: os.path.getmtime(os.path.join(sdir, f))
                for f in os.listdir(sdir)} == mtimes[k]


def test_sharded_export_refuses_resume_with_different_layout(tmp_path, ray_session):
    """Resuming with a different num_shards would remap rows across shard
    boundaries while old marked dirs keep their copies (silent duplication)
    — the exporter must refuse on a layout mismatch."""
    import pandas as pd
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from horizon_etl_ray.pipelines.export import export_sharded_corpus

    df = pd.DataFrame({"doc_id": range(50), "text": ["x"] * 50})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "layout_out")
    export_sharded_corpus(ds, out, num_shards=4)
    with _pytest.raises(ValueError, match="config mismatch"):
        export_sharded_corpus(ds, out, num_shards=8)
    with _pytest.raises(ValueError, match="config mismatch"):
        export_sharded_corpus(ds, out, id_column="text", num_shards=4)
