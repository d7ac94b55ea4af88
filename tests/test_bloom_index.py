"""Per-partition-file bloom indexes (CdcConfig.bloom_columns): equality
pruning on non-key columns that zone maps can't refute. The blooms live in
each data file's parquet FOOTER metadata (no new files, no manifest growth,
gc-free lifetime == the file's), and read_lake's filter path probes footers
only for zone-admitted partitions. Pruning is proven the zone-map way, made
sharper: the BODY of every non-matching partition's files is corrupted while
the footer stays intact — a filtered read succeeds iff pruning decided from
footers alone. Reference analog: the hardened serving indexes of
/root/reference/src/scripts/harden_db_indices.py:8-19."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from horizon_etl_ray.functions.bloom import (
    bloom_might_contain,
    pack_column_bloom,
)
from horizon_etl_ray.pipelines.cdc import (
    BLOOM_META_KEY,
    CdcConfig,
    apply_epoch,
    compact,
    read_lake,
)
from horizon_etl_ray.state.manifest import ManifestStore

CFG = dict(key_columns=("repo", "path"), num_partitions=6,
           bloom_columns=("content", "size"))


def _ev(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _rows(n, tag="v", seq0=1):
    return [{"repo": "r", "path": f"k{i}", "seq": seq0 + i, "op": "update",
             "content": f"{tag}{i}", "size": 1000 + i} for i in range(n)]


def _corrupt_bodies_except(lake, keep_pids):
    """Poison the DATA PAGES of every other partition's files while keeping
    the parquet footer (file tail) valid: pq.read_schema still works,
    pq.read_table cannot — so the test fails loudly if pruning ever opens a
    row group."""
    store = ManifestStore(lake)
    m = store.load()
    for pid, ps in m.partitions.items():
        if pid in keep_pids:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "r+b") as fh:
                fh.seek(4)  # past the magic, before the first data page
                fh.write(b"\xde\xad\xbe\xef" * 16)


def _owner_of(lake, cfg, content_value):
    full = read_lake(lake, cfg=cfg).to_pandas()
    row = full[full.content == content_value]
    assert len(row) == 1
    return int(row.part_id.iloc[0]) if "part_id" in row else None


def test_equality_prune_opens_only_matching_partitions(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev(_rows(60)), lake, 1, cfg)
    full = read_lake(lake, cfg=cfg).to_pandas()
    target = "v17"
    owner = int(full.loc[full.content == target, "part_id"].iloc[0])
    _corrupt_bodies_except(lake, {owner})
    got = (read_lake(lake, cfg=cfg, filter=("content", "==", target))
           .to_pandas())
    assert got.content.tolist() == [target]
    # the corruption is real: any non-owner body is unreadable (footers
    # stay valid — don't route this through Ray Data, whose IO retry loop
    # would spin on the poisoned pages)
    store = ManifestStore(lake)
    other = next(ps for pid, ps in store.load().partitions.items()
                 if pid != owner)
    with pytest.raises(Exception):
        pq.read_table(store.partition_data_files(other)[0])


def test_absent_value_prunes_everything_typed_empty(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev(_rows(40)), lake, 1, cfg)
    _corrupt_bodies_except(lake, set())  # every body poisoned
    out = read_lake(lake, cfg=cfg, filter=("content", "==", "no-such"))
    assert out.count() == 0
    assert "content" in out.schema().names  # typed empty, from footers


def test_int_column_bloom_and_and_composition(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev(_rows(50)), lake, 1, cfg)
    got = read_lake(lake, cfg=cfg,
                    filter=[("size", "==", 1031),
                            ("content", "==", "v31")]).to_pandas()
    assert got.path.tolist() == ["k31"]
    # AND semantics: contradictory pair yields nothing
    assert read_lake(lake, cfg=cfg,
                     filter=[("size", "==", 1031),
                             ("content", "==", "v30")]).count() == 0


def test_delta_mode_blooms_or_across_files(tmp_path):
    """A value written only in a LATER delta file must still be found: a
    partition admits when ANY of its files' blooms might contain it."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**{**CFG, "write_mode": "delta"})
    apply_epoch(_ev(_rows(30)), lake, 1, cfg)
    apply_epoch(_ev([{"repo": "r", "path": "k500", "seq": 999,
                      "op": "update", "content": "late-arrival",
                      "size": 7}]), lake, 2, cfg)
    got = read_lake(lake, cfg=cfg,
                    filter=("content", "==", "late-arrival")).to_pandas()
    assert got.path.tolist() == ["k500"]
    # and the updated value replaces the old one in the resolved view
    apply_epoch(_ev([{"repo": "r", "path": "k500", "seq": 1000,
                      "op": "update", "content": "late-v2",
                      "size": 8}]), lake, 3, cfg)
    assert read_lake(lake, cfg=cfg,
                     filter=("content", "==", "late-v2")
                     ).to_pandas().path.tolist() == ["k500"]


def test_compaction_preserves_blooms(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**{**CFG, "write_mode": "delta"})
    apply_epoch(_ev(_rows(40)), lake, 1, cfg)
    apply_epoch(_ev(_rows(40, tag="w", seq0=1000)), lake, 2, cfg)
    compact(lake, cfg=cfg)
    full = read_lake(lake, cfg=cfg).to_pandas()
    target = "w23"
    owner = int(full.loc[full.content == target, "part_id"].iloc[0])
    _corrupt_bodies_except(lake, {owner})
    got = read_lake(lake, cfg=cfg,
                    filter=("content", "==", target)).to_pandas()
    assert got.content.tolist() == [target]


def test_pre_bloom_files_admit_conservatively(tmp_path):
    """A lake written WITHOUT bloom_columns reads correctly when the reader
    cfg names them: footers without blooms admit everything."""
    lake = str(tmp_path / "lake")
    apply_epoch(_ev(_rows(30)),
                lake, 1, CdcConfig(**{**CFG, "bloom_columns": ()}))
    got = read_lake(lake, cfg=CdcConfig(**CFG),
                    filter=("content", "==", "v11")).to_pandas()
    assert got.content.tolist() == ["v11"]


def test_footer_metadata_shape(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev(_rows(20)), lake, 1, cfg)
    store = ManifestStore(lake)
    m = store.load()
    import json

    for pid, ps in m.partitions.items():
        for f in store.partition_data_files(ps):
            md = pq.read_schema(f).metadata
            desc = json.loads(md[BLOOM_META_KEY.encode()])
            assert set(desc) == {"content", "size"}
            # every live value of the file is claimed present
            t = pq.read_table(f)
            for v in t["content"].to_pylist():
                assert bloom_might_contain(desc["content"], v)


def test_bloom_kernel_edge_cases():
    # all-null column → zero-bit bloom that refutes everything
    d = pack_column_bloom(pa.array([None, None], pa.string()))
    assert d["bits"] == 0 and not bloom_might_contain(d, "x")
    # unsupported type raises (the writer skips such columns)
    with pytest.raises(TypeError):
        pack_column_bloom(pa.array([[1.0]], pa.list_(pa.float64())))
    # malformed descriptor admits (never wrongly refutes)
    assert bloom_might_contain({"bits": "junk"}, "x")


def test_in_predicate_row_zone_and_bloom(tmp_path):
    """(col, "in", [...]) composes through all three layers: exact row
    filtering, zone refutation, and bloom refutation (a partition admits
    when ANY listed value might be present in ANY of its files)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(**CFG)
    apply_epoch(_ev(_rows(60)), lake, 1, cfg)
    got = (read_lake(lake, cfg=cfg,
                     filter=("content", "in", ["v7", "v33", "no-such"]))
           .to_pandas())
    assert sorted(got.content) == ["v33", "v7"]
    # bloom pruning proof: only the owners of the two present values may
    # be opened
    full = read_lake(lake, cfg=cfg).to_pandas()
    # hive-inferred part_id is a string on the cow scan; manifest keys are
    # ints — normalize before matching
    owners = {int(p) for p in
              full.loc[full.content.isin(["v7", "v33"]), "part_id"]}
    _corrupt_bodies_except(lake, owners)
    got = (read_lake(lake, cfg=cfg,
                     filter=("content", "in", ["v7", "v33"])).to_pandas())
    assert sorted(got.content) == ["v33", "v7"]
    # an all-absent IN list prunes everything from footers alone
    assert read_lake(lake, cfg=cfg,
                     filter=("content", "in", ["x1", "x2"])).count() == 0
    # zone layer: an int IN list entirely above the lake's max refutes
    # without bloom help
    assert read_lake(lake, cfg=cfg,
                     filter=("size", "in", [10**9])).count() == 0


def test_prune_fanout_path_many_partitions(tmp_path):
    """Lakes wider than 8 partitions probe footers in Ray tasks (chunks of
    64) — same refutations as the driver path, proven with poisoned
    bystander bodies."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(key_columns=("repo", "path"), num_partitions=24,
                    bloom_columns=("content",))
    apply_epoch(_ev(_rows(200)), lake, 1, cfg)
    full = read_lake(lake, cfg=cfg).to_pandas()
    target = "v123"
    owner = int(full.loc[full.content == target, "part_id"].iloc[0])
    _corrupt_bodies_except(lake, {owner})
    got = read_lake(lake, cfg=cfg,
                    filter=("content", "==", target)).to_pandas()
    assert got.content.tolist() == [target]
    assert read_lake(lake, cfg=cfg,
                     filter=("content", "==", "absent")).count() == 0
