"""Graph export bundle (people_relationship_graph_generator.py:60-134
parity): full nodes/edges parquet + per-classification induced subgraphs +
manifest with counts and order-invariant edge checksums + alias symlink."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from horizon_etl_ray.pipelines.export import export_graph_bundle


def _inputs():
    #   class a: 1-2-3 triangle-ish; class b: 4-5; cross edge 3-4
    edges = rd.from_arrow(pa.table({
        "s1": pa.array([1, 2, 1, 3, 4], pa.int64()),
        "s2": pa.array([2, 3, 3, 4, 5], pa.int64()),
        "w": pa.array([2, 1, 1, 5, 3], pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table({
        "node": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "classification": ["a", "a", "a", "b", "b", "a"],
    }))
    return edges, nodes


def test_bundle_layout_counts_and_subgraph_induction(ray_session, tmp_path):
    edges, nodes = _inputs()
    out = str(tmp_path / "bundle")
    manifest = export_graph_bundle(edges, nodes, out)

    assert manifest["full_graph"]["nodes"] == 6
    assert manifest["full_graph"]["edges"] == 5
    by_cls = {e["classification"]: e
              for e in manifest["classification_exports"]}
    # induced subgraphs: cross edge 3-4 belongs to NEITHER class
    assert by_cls["a"]["nodes"] == 4 and by_cls["a"]["edges"] == 3
    assert by_cls["b"]["nodes"] == 2 and by_cls["b"]["edges"] == 1

    # on-disk layout + manifest agreement
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk["full_graph"]["edge_checksum"] == \
        manifest["full_graph"]["edge_checksum"]
    sub_edges = pq.read_table(
        os.path.join(out, "classification=b", "edges"))
    assert sub_edges.to_pydict()["s1"] == [4]
    assert os.path.islink(os.path.join(out, "subgraphs"))


def test_edge_checksum_is_order_and_partition_invariant(ray_session, tmp_path):
    edges, nodes = _inputs()
    out1, out2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    m1 = export_graph_bundle(edges, nodes, out1)
    # same edges, reversed row order and different block structure
    shuffled = rd.from_arrow(pa.table({
        "s1": pa.array([4, 3, 1, 2, 1], pa.int64()),
        "s2": pa.array([5, 4, 3, 3, 2], pa.int64()),
        "w": pa.array([3, 5, 1, 1, 2], pa.int64()),
    })).repartition(3)
    m2 = export_graph_bundle(shuffled, nodes, out2)
    assert m1["full_graph"]["edge_checksum"] == \
        m2["full_graph"]["edge_checksum"]
    # content change ⇒ checksum change
    bumped = rd.from_arrow(pa.table({
        "s1": pa.array([1, 2, 1, 3, 4], pa.int64()),
        "s2": pa.array([2, 3, 3, 4, 5], pa.int64()),
        "w": pa.array([2, 1, 1, 5, 99], pa.int64()),
    }))
    m3 = export_graph_bundle(bumped, nodes, str(tmp_path / "b3"))
    assert m3["full_graph"]["edge_checksum"] != \
        m1["full_graph"]["edge_checksum"]


def test_bundle_zip_deterministic_and_guarded(ray_session, tmp_path):
    """K5: zipping the same export tree twice gives byte-identical
    archives (sorted members, fixed timestamps); empty dir refuses unless
    allow_empty; symlink alias is skipped but its target is included."""
    import hashlib

    from horizon_etl_ray.pipelines.export import bundle_zip

    edges, nodes = _inputs()
    out = str(tmp_path / "bundle")
    export_graph_bundle(edges, nodes, out)

    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    m1 = bundle_zip(out, z1)
    m2 = bundle_zip(out, z2)
    assert m1["members"] == m2["members"] > 0
    d1 = hashlib.sha256(open(z1, "rb").read()).hexdigest()
    d2 = hashlib.sha256(open(z2, "rb").read()).hexdigest()
    assert d1 == d2

    import zipfile

    names = zipfile.ZipFile(z1).namelist()
    assert "manifest.json" in names
    assert not any(n.startswith("subgraphs") for n in names)  # alias skipped
    assert any(n.startswith("classification=") for n in names)

    import pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="empty bundle"):
        bundle_zip(str(empty), str(tmp_path / "c.zip"))
