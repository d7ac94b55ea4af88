"""Generator invariants (FIXTURES.md §2): determinism, per-key op legality,
duplicate-delivery knob."""

import numpy as np

from horizon_etl_ray.sources.generator import (
    EventGenConfig,
    generate_events_table,
    plan_events,
)


def test_deterministic():
    cfg = EventGenConfig(n_keys=50, n_events=400, seed=7)
    t1 = generate_events_table(cfg)
    t2 = generate_events_table(cfg)
    assert t1.equals(t2)


def test_op_state_machine_legal():
    cfg = EventGenConfig(n_keys=40, n_events=1000, seed=3, p_delete=0.25)
    t = generate_events_table(cfg)
    per_key: dict[tuple, list] = {}
    for r in sorted(t.to_pylist(), key=lambda r: r["seq"]):
        per_key.setdefault((r["repo"], r["path"]), []).append(r["op"])
    saw_resurrection = False
    for ops in per_key.values():
        assert ops[0] == "insert", "first op per key must be insert"
        for prev, cur in zip(ops, ops[1:]):
            if prev == "delete":
                assert cur == "insert", "only a re-insert may follow a delete"
                saw_resurrection = True
    assert saw_resurrection, "resurrection case should occur at this delete rate"


def test_delete_rows_have_empty_content():
    t = generate_events_table(EventGenConfig(n_keys=30, n_events=500, p_delete=0.3))
    for r in t.to_pylist():
        if r["op"] == "delete":
            assert r["content"] == ""
        else:
            assert r["content"].startswith("// ")


def test_duplicate_knob():
    cfg = EventGenConfig(n_keys=30, n_events=500, dup_fraction=0.1)
    plan = plan_events(cfg)
    assert plan.n_rows == 550
    seqs, counts = np.unique(plan.seq, return_counts=True)
    assert (counts >= 2).sum() == 50  # 50 duplicated seqs


def test_hot_key_skew_knob():
    cfg = EventGenConfig(
        n_keys=100, n_events=2000, hot_fraction=0.1, hot_event_fraction=0.5
    )
    plan = plan_events(cfg)
    hot = (plan.key < 10).mean()
    assert hot > 0.4  # ~10% baseline + 50% forced


def test_epoch_assignment():
    cfg = EventGenConfig(n_keys=10, n_events=100, epoch_size=30)
    t = generate_events_table(cfg)
    for r in t.to_pylist():
        assert r["epoch"] == r["seq"] // 30
