"""Partition zone maps (VERDICT r4 #5): per-column min/max in the manifest
partition rows, consumed by read_lake(filter=...) to skip partitions a
non-key predicate can't match — proven by corrupting every non-matching
partition's files (the test_point_read discipline)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from horizon_etl_ray.functions.hashing import partition_ids
from horizon_etl_ray.pipelines.cdc import (
    CdcConfig,
    apply_epoch,
    compact,
    read_lake,
)
from horizon_etl_ray.state.manifest import ManifestStore

P = 8


def _events(n=64):
    """One event per key; payload column ``size`` equals the key's OWNING
    PARTITION id, so a size predicate is exactly partition-aligned and the
    zone map can prove exclusion."""
    keys = pa.table({"repo": ["r"] * n, "path": [f"k{i:03d}" for i in range(n)]})
    pids = partition_ids(keys, ["repo", "path"], P)
    return [{"repo": "r", "path": f"k{i:03d}", "seq": i + 1, "op": "update",
             "content": f"c{i}", "size": int(pids[i])} for i in range(n)]


def _corrupt_except(lake, keep_pids):
    store = ManifestStore(lake)
    m = store.load()
    for pid, ps in m.partitions.items():
        if pid in keep_pids:
            continue
        for f in store.partition_data_files(ps):
            with open(f, "wb") as fh:
                fh.write(b"corrupted")


def test_cow_zone_prunes_nonmatching_partitions(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    m = ManifestStore(lake).load()
    assert all(ps.zone and "size" in ps.zone and ps.zone["size"][0] == pid
               for pid, ps in m.partitions.items())
    want_pid = sorted(m.partitions)[3]
    _corrupt_except(lake, {want_pid})
    out = read_lake(lake, filter=("size", "==", want_pid)).to_pandas()
    assert len(out) > 0 and (out["size"] == want_pid).all()
    # exactness: surviving partitions re-check rows, and the result equals
    # the brute-force filter of the uncorrupted event set
    want = {r["path"] for r in _events() if r["size"] == want_pid}
    assert set(out["path"]) == want


def test_between_and_inequality_pruning(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    lo, hi = 2, 3
    _corrupt_except(lake, {lo, hi})
    out = read_lake(lake, filter=("size", "between", lo, hi)).to_pandas()
    assert set(out["size"]) == {lo, hi}
    # a predicate whose zone ADMITS a corrupted partition must fail loudly
    # (pruning never silently narrows the read)
    with pytest.raises(Exception):
        read_lake(lake, filter=("size", "<=", 3)).to_pandas()


def test_all_pruned_returns_typed_empty(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    out = read_lake(lake, filter=("size", ">", 10_000))
    # Dataset-level schema is typed even at zero rows (Ray's to_pandas drops
    # columns for empty datasets, so assert on the schema)
    assert {"repo", "path", "seq", "size", "deleted"} <= set(
        out.schema().names)
    assert out.count() == 0


def test_filter_is_exact_within_partitions(tmp_path):
    """A predicate NOT aligned with partitions: pruning can't skip anything,
    rows are filtered exactly (the zone map is an optimization only)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    out = read_lake(lake, filter=("path", ">=", "k050")).to_pandas()
    want = {f"k{i:03d}" for i in range(50, 64)}
    assert set(out["path"]) == want


def test_delta_mode_zones_cover_index_columns_only(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P, write_mode="delta")
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    m = ManifestStore(lake).load()
    ps = next(iter(m.partitions.values()))
    assert "seq" in ps.zone and "size" not in ps.zone  # narrow index only
    # a size filter can't prune on a delta lake — but stays EXACT
    out = read_lake(lake, filter=("size", "==", 3), cfg=cfg).to_pandas()
    assert (out["size"] == 3).all() and len(out) > 0
    # second epoch → every partition carries a delta; compaction reconciles
    # the payload → zones widen to every column
    ev2 = [{**r, "seq": r["seq"] + 1000} for r in _events()]
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(ev2)), lake, 2, cfg)
    compact(lake, cfg, gc_old_epochs=False)
    m2 = ManifestStore(lake).load()
    assert all("size" in ps.zone for ps in m2.partitions.values())
    keep = {pid for pid, ps in m2.partitions.items()
            if ps.zone["size"][0] <= 3 <= ps.zone["size"][1]}
    _corrupt_except(lake, keep)
    out2 = read_lake(lake, filter=("size", "==", 3), cfg=cfg).to_pandas()
    assert sorted(out2["path"]) == sorted(out["path"])


def test_filter_validation(tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events(8))), lake, 1, cfg)
    for bad in (("size",), ("size", "~", 1), ("size", "between", 1),
                ("size", "==", 1, 2)):
        with pytest.raises(ValueError, match="filter"):
            read_lake(lake, filter=bad)


def test_and_filter_list_prunes_and_is_exact(tmp_path):
    """A list of predicates is implicit AND: pruning uses every zone (any
    refuting predicate skips the partition), rows must satisfy all."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(_events())), lake, 1, cfg)
    _corrupt_except(lake, {4})
    out = read_lake(lake, filter=[("size", ">=", 4), ("size", "<=", 4),
                                  ("path", "<", "k900")]).to_pandas()
    want = {r["path"] for r in _events() if r["size"] == 4}
    assert set(out["path"]) == want
    with pytest.raises(ValueError, match="filter"):
        read_lake(lake, filter=[("size", ">=", 4), ("size", "~", 1)])


def test_string_zone_bounds_truncated_and_safe():
    """MB-scale string payloads must not land verbatim in the manifest
    (current.json rides the driver hot path and the prior dict ships into
    every merge task): bounds are Iceberg-style truncated — the stored
    range only ever WIDENS, so pruning stays a safe superset."""
    from horizon_etl_ray.pipelines.cdc import (
        _ZONE_STR_PREFIX,
        _zone_admits,
        compute_zone,
    )

    lo, hi = "a" * 200_000, "z" * 200_000
    t = pa.table({"content": pa.array([lo, "m" * 100, hi])})
    z = compute_zone(t)["content"]
    assert len(z[0]) <= _ZONE_STR_PREFIX and z[0] <= lo
    assert z[1] is not None and len(z[1]) <= _ZONE_STR_PREFIX and z[1] > hi
    zone = {"content": z}
    # every predicate a stored row satisfies is admitted
    for pred in [("content", "==", hi), ("content", ">=", "z" * 199),
                 ("content", "<", "b"), ("content", ">", lo),
                 ("content", "between", "y", "zz")]:
        assert _zone_admits(zone, pred)
    # refutation outside the (widened) range still proves exclusion
    assert not _zone_admits(zone, ("content", "<", "a"))
    assert not _zone_admits(zone, ("content", "==", "A"))


def test_string_zone_unbounded_max_admits_everything_above():
    """A max whose whole prefix is U+10FFFF has no finite prefix upper
    bound: stored as None (= +∞), which can never refute an upper-side
    predicate."""
    from horizon_etl_ray.pipelines.cdc import _zone_admits, compute_zone

    big = chr(0x10FFFF) * 100
    z = compute_zone(pa.table({"c": pa.array(["a", big])}))["c"]
    assert z[1] is None
    zone = {"c": z}
    assert _zone_admits(zone, ("c", ">", "zzz"))
    assert _zone_admits(zone, ("c", ">=", big))
    assert _zone_admits(zone, ("c", "==", big))
    assert _zone_admits(zone, ("c", "between", "z", big))
    assert not _zone_admits(zone, ("c", "<", "a"))  # lower side still exact


def test_long_string_filter_prunes_and_is_exact(tmp_path):
    """End-to-end: a lake whose content strings exceed the zone prefix
    still prunes on a content predicate AND returns exactly the right
    rows (the truncated zone admits a superset; the row-level re-check
    keeps the result exact)."""
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(num_partitions=P)
    rows = [{"repo": "r", "path": f"k{i:03d}", "seq": i + 1, "op": "update",
             "content": ("b" if i % 2 else "y") * 300 + f"{i:03d}",
             "size": i} for i in range(32)]
    apply_epoch(rd.from_arrow(pa.Table.from_pylist(rows)), lake, 1, cfg)
    m = ManifestStore(lake).load()
    assert all(len(ps.zone["content"][0]) <= 65 and
               (ps.zone["content"][1] is None or
                len(ps.zone["content"][1]) <= 65)
               for ps in m.partitions.values() if ps.zone)
    out = read_lake(lake, cfg=cfg, filter=("content", ">=", "y")).to_pandas()
    assert sorted(out["path"]) == [f"k{i:03d}" for i in range(32) if not i % 2]
