"""LWW merge kernel vectors (FIXTURES.md §6): out-of-order updates,
duplicate delivery, delete-then-reinsert."""

import numpy as np
import pyarrow as pa

from horizon_etl_ray.state.lww import (
    lww_partial,
    lww_partial_fast,
    lww_resolve_table,
    oracle_reduce,
)


def _events(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(cols)


BASE = [
    {"seq": 0, "op": "insert", "repo": "a", "path": "x", "content": "v0"},
    {"seq": 3, "op": "update", "repo": "a", "path": "x", "content": "v2"},
    {"seq": 1, "op": "update", "repo": "a", "path": "x", "content": "v1"},  # out of order
    {"seq": 2, "op": "insert", "repo": "b", "path": "y", "content": "w0"},
]


def test_lww_partial_keeps_max_seq():
    out = lww_partial(_events(BASE), ["repo", "path"])
    got = {(r["repo"], r["path"]): (r["seq"], r["content"]) for r in out.to_pylist()}
    assert got == {("a", "x"): (3, "v2"), ("b", "y"): (2, "w0")}


def test_duplicate_delivery_absorbed():
    rows = BASE + [dict(BASE[1])]  # same seq re-emitted, byte-identical
    out = lww_resolve_table(_events(rows), ["repo", "path"])
    got = {(r["repo"], r["path"]): r["content"] for r in out.to_pylist()}
    assert got == {("a", "x"): "v2", ("b", "y"): "w0"}


def test_delete_tombstone_and_reinsert():
    rows = BASE + [
        {"seq": 4, "op": "delete", "repo": "b", "path": "y", "content": ""},
        {"seq": 5, "op": "delete", "repo": "a", "path": "x", "content": ""},
        {"seq": 6, "op": "insert", "repo": "a", "path": "x", "content": "reborn"},
    ]
    out = lww_resolve_table(_events(rows), ["repo", "path"])
    got = {(r["repo"], r["path"]): r["content"] for r in out.to_pylist()}
    assert got == {("a", "x"): "reborn"}  # b/y dead, a/x resurrected

    with_tombs = lww_resolve_table(_events(rows), ["repo", "path"], keep_tombstones=True)
    ops = {(r["repo"], r["path"]): r["op"] for r in with_tombs.to_pylist()}
    assert ops == {("a", "x"): "insert", ("b", "y"): "delete"}


def test_late_lower_seq_event_cannot_resurrect():
    rows = [
        {"seq": 9, "op": "delete", "repo": "a", "path": "x", "content": ""},
        {"seq": 4, "op": "update", "repo": "a", "path": "x", "content": "late"},
    ]
    out = lww_resolve_table(_events(rows), ["repo", "path"])
    assert len(out) == 0


def test_matches_oracle_reduce():
    rows = BASE + [
        {"seq": 4, "op": "delete", "repo": "b", "path": "y", "content": ""},
        {"seq": 5, "op": "update", "repo": "a", "path": "x", "content": "v3"},
    ]
    out = lww_resolve_table(_events(rows), ["repo", "path"])
    got = {(r["repo"], r["path"]): r["content"] for r in out.to_pylist()}
    oracle = oracle_reduce(rows)
    assert got == {k: v["content"] for k, v in oracle.items()}


def test_fast_partial_matches_sort_partial():
    """The hash+lexsort combiner must select the same winners as the exact
    sort-based combiner (random workload, string and int keys)."""
    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table(
        {
            "repo": pa.array([f"org{i%7}/repo{i%23}" for i in rng.integers(0, 400, n)]),
            "path": pa.array([f"src/f{i}.py" for i in rng.integers(0, 50, n)]),
            "seq": pa.array(rng.permutation(n).astype(np.int64)),
            "content": pa.array([f"c{i}" for i in range(n)]),
        }
    )
    slow = lww_partial(t, ["repo", "path"]).to_pylist()
    fast, parts = lww_partial_fast(t, ["repo", "path"], num_partitions=16)
    fast = fast.to_pylist()
    key = lambda r: (r["repo"], r["path"])
    assert sorted(slow, key=key) == sorted(fast, key=key)
    assert parts is not None and len(parts) == len(fast)
    # partition assignment is a pure function of the key
    pid_by_key = {}
    for r, p in zip(fast, parts):
        assert pid_by_key.setdefault(key(r), p) == p


def test_fast_partial_int_keys():
    t = pa.table(
        {
            "a": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
            "b": pa.array([7, 7, 8, 8, 9], type=pa.int64()),
            "seq": pa.array([5, 9, 1, 0, 3], type=pa.int64()),
        }
    )
    fast, _ = lww_partial_fast(t, ["a", "b"])
    got = {(r["a"], r["b"]): r["seq"] for r in fast.to_pylist()}
    assert got == {(1, 7): 9, (2, 8): 1, (3, 9): 3}


def test_reduce_is_order_and_grouping_invariant():
    rows = BASE + [
        {"seq": 7, "op": "update", "repo": "b", "path": "y", "content": "w1"},
        {"seq": 8, "op": "delete", "repo": "a", "path": "x", "content": ""},
    ]
    whole = lww_resolve_table(_events(rows), ["repo", "path"]).to_pylist()
    # two-level reduce with an arbitrary split (simulates block boundaries)
    part1 = lww_partial(_events(rows[:3]), ["repo", "path"])
    part2 = lww_partial(_events(rows[3:]), ["repo", "path"])
    two_level = lww_resolve_table(
        pa.concat_tables([part1, part2]), ["repo", "path"]
    ).to_pylist()
    key = lambda r: (r["repo"], r["path"])
    assert sorted(whole, key=key) == sorted(two_level, key=key)
