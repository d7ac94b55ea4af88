"""Property-based tests (hypothesis) for the merge kernels' algebra — the
correctness backbone the distributed engine leans on:

  - LWW is associative/commutative/idempotent over event multisets, so ANY
    grouping into blocks/partitions/epochs converges to the oracle.
  - WidenOnlyPolicy.reduce satisfies the same contract (used as combiner
    AND final merge).
No Ray involved: table-level kernels only.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from horizon_etl_ray.state.lww import lww_resolve_table, oracle_reduce
from horizon_etl_ray.state.merge_policy import WidenOnlyPolicy

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),           # key
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 40),          # quantity payload
    ),
    min_size=0, max_size=60,
)


def _table(events):
    # seq = position (unique, total order)
    return pa.table({
        "k": pa.array([e[0] for e in events], pa.int64()),
        "seq": pa.array(list(range(len(events))), pa.int64()),
        "op": pa.array([e[1] for e in events], pa.string()),
        "q": pa.array([e[2] for e in events], pa.int64()),
    })


def _winners_dict(t: pa.Table) -> dict:
    out = {}
    for row in t.to_pylist():
        out[row["k"]] = (row["seq"], row["op"], row["q"])
    return out


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.integers(1, 5))
def test_lww_any_grouping_matches_oracle(events, n_chunks):
    t = _table(events)
    # split into arbitrary chunks, reduce each, then reduce the union of
    # partial winners — must equal the one-shot reduce AND the oracle
    chunks = np.array_split(np.arange(len(t)), n_chunks)
    partials = [
        lww_resolve_table(t.take(pa.array(c, pa.int64())), ["k"], "seq", "op",
                          keep_tombstones=True)
        for c in chunks if len(c)
    ]
    two_level = lww_resolve_table(
        pa.concat_tables(partials) if partials else t,
        ["k"], "seq", "op", keep_tombstones=True)
    one_shot = lww_resolve_table(t, ["k"], "seq", "op", keep_tombstones=True)
    assert _winners_dict(two_level) == _winners_dict(one_shot)

    # survivors (tombstones dropped) match the sequential oracle reducer
    alive = lww_resolve_table(t, ["k"], "seq", "op", keep_tombstones=False)
    want = oracle_reduce(
        [{"k": e[0], "seq": i, "op": e[1], "q": e[2]}
         for i, e in enumerate(events)],
        key_fields=("k",), seq_field="seq", op_field="op")
    got = {row["k"]: row["seq"] for row in alive.to_pylist()}
    assert got == {k[0]: v["seq"] for k, v in want.items()}


@settings(max_examples=150, deadline=None)
@given(events_strategy, st.integers(1, 5))
def test_widen_policy_associative_and_idempotent(events, n_chunks):
    pol = WidenOnlyPolicy(key_columns=("k",), seq_column="seq",
                          op_column="op", widen_columns=("q",))
    t = _table(events)
    if len(t) == 0:
        return
    chunks = [c for c in np.array_split(np.arange(len(t)), n_chunks) if len(c)]
    partials = [pol.reduce(t.take(pa.array(c, pa.int64()))) for c in chunks]
    two_level = pol.reduce(pa.concat_tables(partials,
                                            promote_options="permissive"))
    one_shot = pol.reduce(t)

    def norm(x: pa.Table):
        df = x.to_pandas().sort_values("k").reset_index(drop=True)
        return df[["k", "seq", "op", "q", "q_min", "q_max"]]

    pd.testing.assert_frame_equal(norm(two_level), norm(one_shot))
    # idempotence: reducing the reduced output changes nothing
    pd.testing.assert_frame_equal(norm(pol.reduce(one_shot)), norm(one_shot))
    # widen semantics: q_min/q_max bound every event of the key
    df = norm(one_shot)
    ev = pd.DataFrame({"k": [e[0] for e in events],
                       "q": [e[2] for e in events]})
    for _, row in df.iterrows():
        qs = ev[ev["k"] == row["k"]]["q"]
        assert row["q_min"] == qs.min() and row["q_max"] == qs.max()
