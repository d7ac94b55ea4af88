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


# ---------------------------------------------------------------------------
# pack_token_stream: the two-level prefix-sum packer equals a single-threaded
# concat-and-chunk reference for ANY doc-id/token-count multiset and ANY
# bucket size (this needs Ray — few examples, end-to-end through the op).
# ---------------------------------------------------------------------------

pack_strategy = st.lists(
    st.tuples(
        st.integers(0, 400),      # sparse, unordered doc ids
        st.integers(1, 600),      # token counts, incl. >> window
    ),
    min_size=1, max_size=40, unique_by=lambda t: t[0],
)


def _naive_pack(rows, window):
    out = {}
    pos = 0
    for doc_id, n in sorted(rows):
        for w in range(pos // window, (pos + n - 1) // window + 1):
            e = out.setdefault(w, [0, 0, doc_id, doc_id])
            e[0] += 1
            e[1] += min((w + 1) * window, pos + n) - max(w * window, pos)
            e[2] = min(e[2], doc_id)
            e[3] = max(e[3], doc_id)
        pos += n
    return {w: tuple(v) for w, v in out.items()}


@settings(max_examples=8, deadline=None)
@given(rows=pack_strategy, bucket_size=st.sampled_from([1, 3, 64]),
       window=st.sampled_from([7, 256]))
def test_pack_token_stream_matches_naive(ray_session, rows, bucket_size,
                                         window):
    import ray.data as rd

    from horizon_etl_ray.pipelines.corpus import pack_token_stream

    toks = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([r[0] for r in rows], dtype=np.int64),
        "n": np.array([r[1] for r in rows], dtype=np.int64),
    }))
    got = pack_token_stream(toks, window=window, bucket_size=bucket_size)
    want = _naive_pack(rows, window)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[int(r["window_id"])] == (
            int(r["n_docs"]), int(r["n_tokens"]),
            int(r["first_doc"]), int(r["last_doc"]))


# ---------------------------------------------------------------------------
# Mart delta algebra: for ANY two states, folding the signed deltas of their
# change-feed diff onto aggregate(before) equals aggregate(after) — the
# invariant refresh_mart leans on. No Ray: pure frame kernels.
# ---------------------------------------------------------------------------

# a state maps key → (group, value); group None = a real (null) group
state_strategy = st.dictionaries(
    st.integers(0, 7),
    st.tuples(st.sampled_from(["x", "y", "z", None]), st.integers(-5, 50)),
    max_size=8,
)


def _mart_of(state, spec):
    from horizon_etl_ray.pipelines.mart import _fold

    rows = [{"grp": g, spec.rows_metric: np.int64(1), "sum_v": v}
            for g, v in state.values()]
    if not rows:
        return pd.DataFrame(columns=["grp", spec.rows_metric, "sum_v"])
    return _fold(pd.DataFrame(rows), spec)


def _feed_of(before, after):
    rows = []
    for k in sorted(set(before) | set(after)):
        in_b, in_a = k in before, k in after
        if in_b and in_a and before[k] == after[k]:
            continue  # unchanged keys are NOT in the feed
        op = "update" if (in_b and in_a) else ("insert" if in_a else "delete")
        bg, bv = before.get(k, (None, None))
        ag, av = after.get(k, (None, None))
        rows.append({"k": k, "op": op,
                     "before_grp": bg if in_b else None,
                     "before_v": bv if in_b else None,
                     "after_grp": ag if in_a else None,
                     "after_v": av if in_a else None})
    return pd.DataFrame(rows, columns=["k", "op", "before_grp", "before_v",
                                       "after_grp", "after_v"])


@settings(max_examples=200, deadline=None)
@given(state_strategy, state_strategy)
def test_mart_delta_algebra(before, after):
    from horizon_etl_ray.pipelines.mart import (MartSpec, _fold,
                                                signed_delta_partial)

    spec = MartSpec(group_by=("grp",), sum_metrics={"sum_v": "v"})
    feed = _feed_of(before, after)
    m_before = _mart_of(before, spec)
    if feed.empty:
        deltas = m_before.iloc[0:0]
    else:
        deltas = signed_delta_partial(feed, spec)
    merged = _fold(pd.concat([m_before, deltas], ignore_index=True), spec)
    merged = (merged.loc[merged[spec.rows_metric] > 0]
              .sort_values("grp", na_position="last")
              .reset_index(drop=True))
    expect = (_mart_of(after, spec)
              .sort_values("grp", na_position="last").reset_index(drop=True))
    assert (merged[spec.rows_metric] >= 0).all()
    if expect.empty:
        assert merged.empty
    else:
        pd.testing.assert_frame_equal(
            merged.astype({"sum_v": np.int64, "grp": object}),
            expect.astype({"sum_v": np.int64, "grp": object}))


# ---------------------------------------------------------------------------
# Partition-partial mart algebra: for ANY state and ANY assignment of keys
# to partitions, the fold of per-partition partials equals the aggregate of
# the whole state — AND a "refresh" that recomputes only the partitions
# whose rows changed (carrying the rest over untouched) equals a full
# rebuild of the new state. The invariant refresh_partitioned_mart leans
# on. No Ray: pure frame kernels.
# ---------------------------------------------------------------------------

# a state maps key → (partition 0-3, group, value); group None = null group
pstate_strategy = st.dictionaries(
    st.integers(0, 9),
    st.tuples(st.integers(0, 3),
              st.sampled_from(["x", "y", None]),
              st.integers(-5, 50)),
    max_size=10,
)


def _pmart_frame(state):
    rows = [{"pid": p, "grp": g, "v": v} for p, g, v in state.values()]
    return pd.DataFrame(rows, columns=["pid", "grp", "v"])


def _partials_of(state, spec, pids=None):
    from horizon_etl_ray.pipelines.mart import _partial_agg

    df = _pmart_frame(state)
    parts = []
    for pid, sub in df.groupby("pid", sort=True):
        if pids is not None and pid not in pids:
            continue
        p = _partial_agg(sub[["grp", "v"]], spec)
        p.insert(0, "part_id", np.int32(pid))
        parts.append(p)
    if not parts:
        return pd.DataFrame(
            columns=["part_id", "grp", *spec.metric_names()])
    return pd.concat(parts, ignore_index=True)


def _serve(partials, spec):
    from horizon_etl_ray.pipelines.mart import _partial_agg

    if partials.empty:
        return pd.DataFrame(columns=["grp", *spec.metric_names()])
    return (_partial_agg(partials, spec, folds=True)
            .sort_values("grp", na_position="last").reset_index(drop=True))


@settings(max_examples=200, deadline=None)
@given(pstate_strategy, pstate_strategy)
def test_partitioned_mart_fold_algebra(before, after):
    from horizon_etl_ray.pipelines.mart import (PartitionedMartSpec,
                                                _partial_agg)

    spec = PartitionedMartSpec(
        group_by=("grp",),
        metrics={"min_v": ("min", "v"), "max_v": ("max", "v"),
                 "sum_v": ("sum", "v")})

    # fold of partials == whole-state aggregate, for the before state
    whole = _pmart_frame(before)
    expect_b = (_partial_agg(whole[["grp", "v"]], spec)
                .sort_values("grp", na_position="last")
                .reset_index(drop=True)
                if len(whole) else
                pd.DataFrame(columns=["grp", *spec.metric_names()]))
    got_b = _serve(_partials_of(before, spec), spec)
    if expect_b.empty:
        assert got_b.empty
    else:
        pd.testing.assert_frame_equal(
            got_b.astype({"grp": object}), expect_b.astype({"grp": object}),
            check_dtype=False)

    # partition-pruned refresh == full rebuild of the after state
    def rows_of(state, pid):
        return sorted((k, g, v) for k, (p, g, v) in state.items()
                      if p == pid)

    touched = {p for p in range(4)
               if rows_of(before, p) != rows_of(after, p)}
    old = _partials_of(before, spec)
    kept = old.loc[~old["part_id"].isin(touched)]
    redone = _partials_of(after, spec, pids=touched)
    refreshed = _serve(pd.concat([kept, redone], ignore_index=True), spec)
    expect_a = _serve(_partials_of(after, spec), spec)
    if expect_a.empty:
        assert refreshed.empty
    else:
        pd.testing.assert_frame_equal(
            refreshed.astype({"grp": object}),
            expect_a.astype({"grp": object}), check_dtype=False)


# ---------------------------------------------------------------------------
# SCD-2 interval walk algebra (round 5 session 6): the streaming walk over
# per-epoch resolved states must equal a brute-force recompute of visible-
# state changes — versions open on live edges / live payload changes, close
# at the next visible change, seq-only re-assertions open nothing.
# ---------------------------------------------------------------------------

hist_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 4),                           # key
        st.sampled_from(["update", "delete"]),
        st.one_of(st.none(), st.integers(0, 9)),     # payload (nullable)
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(hist_events_strategy, st.integers(1, 4))
def test_history_walk_matches_bruteforce(events, n_epochs):
    import shutil
    import tempfile

    from horizon_etl_ray.pipelines.cdc import CdcConfig
    from horizon_etl_ray.pipelines.history import _walk_partition_history
    from horizon_etl_ray.state.manifest import atomic_write_table

    d = tempfile.mkdtemp(dir="/tmp", prefix="histprop_")
    try:
        chunks = np.array_split(np.arange(len(events)), n_epochs)
        cum: dict = {}          # k -> (seq, op, q): running LWW winner
        epoch_files = []
        resolved_at = {}
        for e, idxs in enumerate(chunks, start=1):
            for i in idxs:
                k, op, q = events[int(i)]
                cum[k] = (int(i), op, q)  # seq = position: last write wins
            if not len(idxs):
                continue  # empty epoch: the partition is not written
            items = sorted(cum.items())
            t = pa.table({
                "k": pa.array([k for k, _ in items], pa.int64()),
                "seq": pa.array([s for _, (s, _, _) in items], pa.int64()),
                "q": pa.array([q for _, (_, _, q) in items], pa.int64()),
                "deleted": pa.array([op == "delete"
                                     for _, (_, op, _) in items], pa.bool_()),
            })
            path = f"{d}/e{e}.parquet"
            atomic_write_table(path, t)
            epoch_files.append((e, [path]))
            resolved_at[e] = dict(cum)

        cfg = CdcConfig(key_columns=("k",), payload_columns=("k", "q"),
                        validate=False)
        closed, open_, _, _, _ = _walk_partition_history(
            epoch_files, cfg, None, 0)

        def norm(v):
            return None if v is None or (isinstance(v, float) and np.isnan(v)) \
                else int(v)

        got = set()
        for df, is_open in ((closed, False), (open_, True)):
            for r in (df.to_dict("records") if len(df) else []):
                got.add((int(r["k"]), norm(r["q"]), int(r["seq"]),
                         int(r["_from"]),
                         None if is_open else int(r["_to"])))

        # brute force over visible states
        want = set()
        open_map: dict = {}
        prev_vis: dict = {}
        for e, _files in epoch_files:
            vis = {k: (op != "delete", q)
                   for k, (s, op, q) in resolved_at[e].items()}
            for k in set(vis) | set(prev_vis):
                live_p, qp = prev_vis.get(k, (False, None))
                live_c, qc = vis.get(k, (False, None))
                if (live_p == live_c) and (not live_p or qp == qc):
                    continue  # no visible change
                if live_p:
                    q0, s0, f0 = open_map.pop(k)
                    want.add((k, q0, s0, f0, e))
                if live_c:
                    open_map[k] = (qc, resolved_at[e][k][0], e)
            prev_vis = vis
        for k, (q0, s0, f0) in open_map.items():
            want.add((k, q0, s0, f0, None))

        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# replication window algebra (pipelines/replication.py)
# ---------------------------------------------------------------------------

def _resolved(events):
    """LWW-resolved LIVE state after the prefix: key -> (seq, payload)."""
    rows = oracle_reduce([{"repo": "r", "path": str(k), "seq": s,
                           "op": op, "q": q}
                          for (k, op, q), s in
                          zip(events, range(len(events)))])
    return {key: (r["seq"], r["q"]) for key, r in rows.items()}


@settings(max_examples=200, deadline=None)
@given(events_strategy, st.integers(1, 6))
def test_replication_window_algebra(events, n_windows):
    """The contract replicate() leans on: for ANY split of the stream into
    consecutive windows, applying each window's NET state diff (insert/
    update -> upsert the after-row, delete -> drop the key) in window order
    reproduces the final resolved state exactly — seq included, because the
    feed carries seq-only re-assertions (include_seq_only). The follower
    never sees the events themselves, only boundary-state diffs."""
    bounds = sorted({min((i + 1) * max(1, len(events) // n_windows),
                         len(events)) for i in range(n_windows)} | {len(events)})
    follower: dict = {}
    prev = {}
    lo = 0
    for hi in bounds:
        cur = _resolved(events[:hi])
        # the net diff a feed window (lo, hi] would carry
        for key in set(prev) | set(cur):
            if key in cur and prev.get(key) != cur[key]:
                follower[key] = cur[key]          # insert/update (or seq-only)
            elif key in prev and key not in cur:
                follower.pop(key, None)           # delete
        prev = cur
        lo = hi
    assert follower == _resolved(events)


# ---------------------------------------------------------------------------
# partition-file bloom kernel (functions/bloom.py)
# ---------------------------------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-2**40, 2**40), min_size=0, max_size=200),
       st.integers(-2**40, 2**40))
def test_bloom_never_wrongly_refutes_ints(vals, probe):
    """The pruning contract is one-sided: every written value must probe
    True (False is a PROOF of absence used to skip partitions)."""
    from horizon_etl_ray.functions.bloom import (bloom_might_contain,
                                                 pack_column_bloom)

    d = pack_column_bloom(pa.array(vals, pa.int64()))
    for v in vals:
        assert bloom_might_contain(d, v)
    if probe in vals:
        assert bloom_might_contain(d, probe)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=0, max_size=120),
       st.text(max_size=24))
def test_bloom_never_wrongly_refutes_strings(vals, probe):
    from horizon_etl_ray.functions.bloom import (bloom_might_contain,
                                                 pack_column_bloom)

    d = pack_column_bloom(pa.array(vals, pa.string()))
    for v in vals:
        assert bloom_might_contain(d, v)
    if probe in vals:
        assert bloom_might_contain(d, probe)
