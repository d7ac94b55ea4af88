"""Driver-contract smoke: entry() returns rows, every queries() entry is
callable at smoke scale, oracle_sql() keys ⊆ queries() keys."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
    assert len(o) >= 18


def test_entry_smoke():
    out = entrymod.entry()
    assert len(out) > 0
    assert set(["repo", "path", "content_sha256"]) <= set(out.columns)


def test_a_few_queries_run():
    q = entrymod.queries()
    for name in ["q1_pricing_summary", "lww_latest_event", "token_counts"]:
        df = q[name](SF)
        assert len(df) > 0, name
