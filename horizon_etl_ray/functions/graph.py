"""Graph operators over an edges Dataset: connected components (distributed
min-label propagation) and node-degree/isolation stats.

Reference parity: the people-relationship graph stats of
/root/reference/src/core/logic/people_relationship_graph_generator.py:436-510
compute components and isolated nodes with networkx on the driver; here the
same results come from iterative min-label propagation expressed as Ray Data
exchanges, so the edge list never needs to fit one machine:

    labels ← node                             (each node its own label)
    repeat: label[n] ← min(label[n], min_{(m,n)∈E} label[m])
    until Σ labels stops changing             (monotone ⇒ convergence test)

Each round is two bucketed exchanges (edges⋈labels co-shuffle on the source
endpoint, then a min-reduce over the destination), and the label table —
2×int64 per node, the only state — is materialized per round to cut lineage
re-execution. Rounds needed = graph diameter (small for the co-occurrence
graphs this engine builds). For path-like graphs at extreme scale you'd
switch to pointer-doubling; documented, not needed here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket(key: np.ndarray, P: int) -> np.ndarray:
    return (((key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(32)) % np.uint64(P)).astype(np.int64)


def connected_components(edges_ds, nodes_ds, *, src="s1", dst="s2",
                         node_col="node", num_buckets=16, max_rounds=50):
    """(node, component) for every node in ``nodes_ds``; component = the
    minimum node id reachable (isolated nodes map to themselves).

    ``edges_ds`` is undirected input (each edge once); it is symmetrized
    internally."""
    import ray.data as rd

    def _snapshot(ds, nblocks=num_buckets):
        """Materialize AND cut lineage AND pin the block count.

        ``materialize()`` alone is not enough: a union over a materialized
        dataset re-plans from the logical root, so round k re-executes
        rounds 1..k-1. ``from_arrow_refs`` rebuilds the dataset from the
        concrete block refs, making each round O(round work).

        The ``repartition`` is equally load-bearing: each round's
        union(labels, proposals) → groupby emits roughly
        blocks(labels) + blocks(proposals) output blocks, so without a
        coalesce the label table's block count DOUBLES per round
        (measured: 48 → 112 → 240 → 496 blocks for 2k rows by round 4,
        wall time 2.5s → 84s — per-block task overhead, not data, is the
        cost). Labels are 2×int64 per node; ``num_buckets`` blocks keeps
        them at target block size at any scale."""
        return rd.from_arrow_refs(
            ds.repartition(nblocks).materialize().to_arrow_refs())

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy(dtype=np.int64)
        b = df[dst].to_numpy(dtype=np.int64)
        return pd.DataFrame({"a": np.concatenate([a, b]),
                             "b": np.concatenate([b, a])})

    edges = _snapshot(edges_ds.map_batches(sym, batch_format="pandas"))

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        n = df[node_col].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": n, "label": n})

    labels = _snapshot(nodes_ds.map_batches(init_labels, batch_format="pandas"))
    prev_sum = labels.sum("label")

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_k"] = out["a"]
        out["label"] = np.int64(0)
        out["_side"] = np.int8(0)
        out["_b"] = _bucket(out["_k"].to_numpy(), num_buckets)
        return out[["a", "b", "_k", "label", "_side", "_b"]]

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        out = pd.DataFrame({
            "a": np.zeros(n, dtype=np.int64),
            "b": np.zeros(n, dtype=np.int64),
            "_k": df["node"].to_numpy(dtype=np.int64),
            "label": df["label"].to_numpy(dtype=np.int64),
            "_side": np.full(n, 1, dtype=np.int8),
        })
        out["_b"] = _bucket(out["_k"].to_numpy(), num_buckets)
        return out

    def propose(g: pd.DataFrame) -> pd.DataFrame:
        """edges⋈labels on the source endpoint, then a LOCAL vectorized
        min-label fixpoint over this bucket's subgraph (several hops of
        propagation per global round — cuts global rounds from the graph
        diameter to roughly the cross-bucket diameter)."""
        e = g[g["_side"] == 0][["_k", "b"]]
        l = g[g["_side"] == 1][["_k", "label"]].drop_duplicates("_k")
        if len(e) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64")})
        src = e["_k"].to_numpy(dtype=np.int64)
        dst = e["b"].to_numpy(dtype=np.int64)
        nodes_loc, inv = np.unique(np.concatenate([src, dst]),
                                   return_inverse=True)
        si, di = inv[: len(src)], inv[len(src):]
        lab = nodes_loc.copy()  # own id as the starting label
        if len(l):
            lm = l.set_index("_k")["label"]
            known = lm.reindex(nodes_loc)
            mask = known.notna().to_numpy()
            lab[mask] = np.minimum(lab[mask],
                                   known[mask].to_numpy(dtype=np.int64))
        ea = np.concatenate([si, di])
        eb = np.concatenate([di, si])
        for _ in range(64):  # local diameter bound; each pass vectorized
            prop = np.full(len(nodes_loc), np.iinfo(np.int64).max)
            np.minimum.at(prop, eb, lab[ea])
            new = np.minimum(lab, prop)
            if np.array_equal(new, lab):
                break
            lab = new
        return pd.DataFrame({"node": nodes_loc, "label": lab})

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("node", sort=False)["label"].min().reset_index())

    import os
    import time as _time
    _dbg = bool(os.environ.get("GRAFT_GRAPH_DEBUG"))

    converged = False
    for _round in range(max_rounds):
        _t0 = _time.time()
        tagged = (edges.map_batches(tag_edges, batch_format="pandas")
                  .union(labels.map_batches(tag_labels, batch_format="pandas")))
        proposals = tagged.groupby("_b").map_groups(
            propose, batch_format="pandas")
        merged = (labels.union(proposals)
                  .map_batches(
                      lambda df: df.assign(
                          _mb=_bucket(df["node"].to_numpy(), num_buckets)),
                      batch_format="pandas")
                  .groupby("_mb")
                  .map_groups(lambda g: reduce_min(g.drop(columns=["_mb"])),
                              batch_format="pandas"))
        labels = _snapshot(merged)
        cur_sum = labels.sum("label")
        if _dbg:
            print(f"[graph.cc] round {_round}: {_time.time() - _t0:.1f}s "
                  f"sum={cur_sum} blocks={labels.num_blocks()} "
                  f"rows={labels.count()}", flush=True)
        if cur_sum == prev_sum:  # min-propagation is monotone non-increasing
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # silently-unconverged labels would be WRONG component ids, not just
        # slow — refuse rather than return them (raise, per review advice)
        raise RuntimeError(
            f"connected_components did not converge in max_rounds={max_rounds} "
            "global rounds (cross-bucket diameter too high for this budget); "
            "raise max_rounds or num_buckets"
        )

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"label": "component"})

    return labels.map_batches(rename, batch_format="pandas")


def node_degrees(edges_ds, nodes_ds, *, src="s1", dst="s2", node_col="node",
                 num_buckets=16):
    """(node, degree) over the full node universe (degree 0 = isolated)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy(dtype=np.int64)
        b = df[dst].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"node": np.concatenate([a, b])})
        out["d"] = np.int64(1)
        return out

    def zero(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df[node_col].to_numpy(dtype=np.int64)})
        out["d"] = np.int64(0)
        return out

    both = (edges_ds.map_batches(explode, batch_format="pandas")
            .union(nodes_ds.map_batches(zero, batch_format="pandas")))

    def reduce_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("node", sort=False)["d"].sum().reset_index()
               .rename(columns={"d": "degree"}))
        out["degree"] = out["degree"].astype(np.int64)
        return out

    return (both.map_batches(
        lambda df: df.assign(_b=_bucket(df["node"].to_numpy(), num_buckets)),
        batch_format="pandas")
        .groupby("_b")
        .map_groups(lambda g: reduce_sum(g.drop(columns=["_b"])),
                    batch_format="pandas"))
