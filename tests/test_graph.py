"""Graph operators: distributed min-label-propagation connected components
and full-universe node degrees (A5 parity)."""

import numpy as np
import pandas as pd

from horizon_etl_ray.functions import graph as G


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_connected_components_label_propagation():
    # two chains + a triangle + two isolated nodes
    edges = pd.DataFrame({
        "s1": [1, 2, 3, 10, 11, 20, 21, 22],
        "s2": [2, 3, 4, 11, 12, 21, 22, 20]})
    nodes = pd.DataFrame({"node": list(range(1, 5)) + [10, 11, 12,
                                                       20, 21, 22, 30, 31]})
    out = (G.connected_components(_ds(edges), _ds(nodes))
           .to_pandas().set_index("node")["component"])
    assert all(out[n] == 1 for n in [1, 2, 3, 4])
    assert all(out[n] == 10 for n in [10, 11, 12])
    assert all(out[n] == 20 for n in [20, 21, 22])
    assert out[30] == 30 and out[31] == 31  # isolated → own component


def test_node_degrees_includes_isolated():
    edges = pd.DataFrame({"s1": [1, 1], "s2": [2, 3]})
    nodes = pd.DataFrame({"node": [1, 2, 3, 4]})
    out = (G.node_degrees(_ds(edges), _ds(nodes))
           .to_pandas().set_index("node")["degree"])
    assert out[1] == 2 and out[2] == 1 and out[3] == 1 and out[4] == 0


def test_connected_components_path_graph_log_rounds(ray_session):
    """A 1,500-node PATH is the adversarial topology for plain min-label
    propagation (diameter ≈ n; neighbors hash into different buckets, so
    edge rounds alone move labels only a couple of hops per round and
    max_rounds would exhaust → raise). The pointer-jump exchange squares
    the reach each round, so the path must converge within O(log n)
    global rounds and label every node with the path's minimum id."""
    n = 1500
    ids = np.random.RandomState(7).permutation(n) + 10  # non-contiguous ids
    edges = pd.DataFrame({"s1": ids[:-1], "s2": ids[1:]})
    nodes = pd.DataFrame({"node": ids})
    out = (G.connected_components(_ds(edges), _ds(nodes), max_rounds=18)
           .to_pandas())
    assert len(out) == n
    assert (out["component"] == ids.min()).all()


def test_connected_components_random_graphs_vs_union_find(ray_session):
    """Contraction CC vs a union-find oracle on seeded random graphs of
    varying density (including many isolated nodes and multi-component
    shapes)."""
    for seed, nn, m in [(3, 300, 80), (4, 400, 400), (5, 250, 1200)]:
        rs = np.random.RandomState(seed)
        ea = rs.randint(0, nn, m)
        eb = rs.randint(0, nn, m)
        out = (G.connected_components(
            _ds(pd.DataFrame({"s1": ea, "s2": eb})),
            _ds(pd.DataFrame({"node": np.arange(nn)})),
            num_buckets=8)
            .to_pandas().set_index("node")["component"])

        parent = np.arange(nn)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(ea, eb):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        comp_min = {}
        for x in range(nn):
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        expect = np.array([comp_min[find(x)] for x in range(nn)])
        assert np.array_equal(out.sort_index().to_numpy(), expect), \
            f"seed={seed}"


def test_connected_components_both_relabel_paths_agree(ray_session):
    """The hybrid broadcast relabel (default) and the bucketed co-shuffle
    fallback (broadcast_m_threshold=0) must label identically — same
    union-find components on a seeded random graph."""
    rs = np.random.RandomState(11)
    nn, m = 350, 600
    ea, eb = rs.randint(0, nn, m), rs.randint(0, nn, m)
    edges = pd.DataFrame({"s1": ea, "s2": eb})
    nodes = pd.DataFrame({"node": np.arange(nn)})
    fast = (G.connected_components(_ds(edges), _ds(nodes), num_buckets=8)
            .to_pandas().sort_values("node").reset_index(drop=True))
    slow = (G.connected_components(_ds(edges), _ds(nodes), num_buckets=8,
                                   broadcast_m_threshold=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(fast, slow)
