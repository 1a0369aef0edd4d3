"""Cactus snarl machinery tests.

The 3-edge-connected-components pass is validated against a brute-force
max-flow oracle on random multigraphs — the same trick the reference's
snarl fuzzer uses (unittest/support/snarl_decomposition_fuzzer.cpp
validates decompositions on random graphs)."""
from collections import deque
from itertools import combinations

import numpy as np
import pytest

from vg_tpu.graph.cactus import (cut_pair_edges, find_bridges,
                                 three_edge_connected_components)


def _mincut_ge3(edges, s, t):
    cap = {}
    for (u, v) in edges:
        if u == v:
            continue
        cap.setdefault(u, {})
        cap.setdefault(v, {})
        cap[u][v] = cap[u].get(v, 0) + 1
        cap[v][u] = cap[v].get(u, 0) + 1
    flow = 0
    for _ in range(3):
        par = {s: None}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if x == t:
                break
            for y, c in cap.get(x, {}).items():
                if c > 0 and y not in par:
                    par[y] = x
                    dq.append(y)
        if t not in par:
            break
        y = t
        while par[y] is not None:
            x = par[y]
            cap[x][y] -= 1
            cap[y][x] = cap[y].get(x, 0) + 1
            y = x
        flow += 1
    return flow >= 3


def _brute_3ecc(n, edges):
    p = list(range(n))

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for u, v in combinations(range(n), 2):
        if find(u) != find(v) and _mincut_ge3(edges, u, v):
            p[find(u)] = find(v)
    return [find(v) for v in range(n)]


def _canon(labels):
    m = {}
    return [m.setdefault(l, len(m)) for l in labels]


def test_bridges_simple():
    # path a-b-c plus a cycle c-d-e-c: a-b and b-c are bridges
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 2)]
    assert find_bridges(5, edges) == {0, 1}


def test_cut_pairs_simple_cycle():
    edges = [(0, 1), (1, 2), (2, 0)]
    assert cut_pair_edges(3, edges) == {0, 1, 2}


def test_cut_pairs_theta_graph():
    # three parallel edges: no 2-cut separates the two vertices
    edges = [(0, 1), (0, 1), (0, 1)]
    assert cut_pair_edges(2, edges) == set()


def test_three_edge_connected_fuzz():
    rng = np.random.default_rng(1234)
    for _ in range(300):
        n = int(rng.integers(2, 11))
        m = int(rng.integers(1, 20))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        got = _canon(three_edge_connected_components(n, edges))
        want = _canon(_brute_3ecc(n, edges))
        assert got == want, (n, edges)


# ----------------------------------------------------- snarl decomposition

from vg_tpu.graph.arraygraph import GraphBuilder
from vg_tpu.graph.cactus import decompose


def _random_bidirected(rng, n_nodes, n_edges):
    b = GraphBuilder()
    for i in range(n_nodes):
        L = int(rng.integers(1, 8))
        b.add_node("ACGT"[int(rng.integers(0, 4))] * L, node_id=i + 1)
    for _ in range(n_edges):
        f = int(rng.integers(1, n_nodes + 1))
        t = int(rng.integers(1, n_nodes + 1))
        b.add_edge(f, t, bool(rng.integers(0, 2)), bool(rng.integers(0, 2)))
    return b.freeze()


def _check_decomposition(g, dec):
    problems = dec.validate()
    assert not problems, problems
    # snarl separation: any edge with exactly one endpoint inside a
    # snarl's content must touch that snarl's boundary nodes
    edges = set()
    for h in range(2 * g.node_count):
        for t in g.follow(h):
            edges.add((h >> 1, int(t) >> 1))
    for si in dec.real_snarls():
        sn = dec.snarls[si]
        content = set(dec.snarl_contents(si))
        if not content:
            continue
        boundary = {sn.start >> 1, sn.end >> 1}
        for (a, b) in edges:
            ina, inb = a in content, b in content
            if ina != inb:
                outside = b if ina else a
                assert outside in boundary, (
                    f"snarl {si} leaks: edge {a}-{b} crosses content "
                    f"without passing boundary {boundary}")
    # chain consistency: snarls sit between consecutive chain links
    for c in dec.chains:
        for i, si in enumerate(c.snarls):
            sn = dec.snarls[si]
            n_links = len(c.nodes)
            assert sn.start >> 1 == c.nodes[i] >> 1
            assert sn.end >> 1 == c.nodes[(i + 1) % n_links] >> 1


def test_decompose_reference_snarls_graph():
    """Golden from reference test/t/32_vg_snarls.t: the snarls.json graph
    decomposes into exactly 3 snarls with boundary node pairs (1,7),
    (3,6), (7,9) and contents {2..6}, {4,5}, {8}."""
    import json

    from vg_tpu.io.json_graph import graph_from_json

    g = graph_from_json(json.load(
        open("/root/reference/test/snarls/snarls.json")))
    dec = decompose(g)
    got = sorted(
        tuple(sorted((int(g.node_id[dec.snarls[si].start >> 1]),
                      int(g.node_id[dec.snarls[si].end >> 1]))))
        for si in dec.real_snarls())
    assert got == [(1, 7), (3, 6), (7, 9)], got
    contents = {tuple(sorted((int(g.node_id[dec.snarls[si].start >> 1]),
                              int(g.node_id[dec.snarls[si].end >> 1])))):
                sorted(int(g.node_id[x]) for x in dec.snarl_contents(si))
                for si in dec.real_snarls()}
    assert contents[(1, 7)] == [2, 3, 4, 5, 6]
    assert contents[(3, 6)] == [4, 5]
    assert contents[(7, 9)] == [8]
    _check_decomposition(g, dec)


def test_decompose_cyclic_graph():
    """Circular backbone with a bubble: cyclic chains must work."""
    b = GraphBuilder()
    for i, s in enumerate(["AAAA", "CCCC", "GGGG", "TT", "AG"], start=1):
        b.add_node(s, node_id=i)
    b.add_edge(1, 2)
    b.add_edge(2, 3)
    b.add_edge(3, 4)   # bubble allele 1
    b.add_edge(3, 5)   # bubble allele 2
    b.add_edge(4, 1)
    b.add_edge(5, 1)
    g = b.freeze()
    dec = decompose(g)
    _check_decomposition(g, dec)
    # the bubble must be found: some snarl has contents {4, 5}
    cont = [sorted(int(g.node_id[x]) for x in dec.snarl_contents(si))
            for si in dec.real_snarls()]
    assert [4, 5] in cont, cont
    assert any(c.is_cyclic for c in dec.chains)


def test_decompose_inversion_graph():
    """Inversion: node 2 can be traversed in either orientation between
    1 and 3 (1->2, 1->2rev via edge to 2's end, 2->3, 2rev->3)."""
    b = GraphBuilder()
    for i, s in enumerate(["AAAA", "CCCC", "GGGG"], start=1):
        b.add_node(s, node_id=i)
    b.add_edge(1, 2)
    b.add_edge(1, 2, False, True)    # 1 -> 2 reverse (to_end)
    b.add_edge(2, 3)
    b.add_edge(2, 3, True, False)    # 2 reverse -> 3 (from_start)
    g = b.freeze()
    dec = decompose(g)
    _check_decomposition(g, dec)
    cont = [sorted(int(g.node_id[x]) for x in dec.snarl_contents(si))
            for si in dec.real_snarls()]
    assert [2] in cont, cont


def test_decompose_fuzz_random_graphs():
    """1000 random bidirected graphs (random orientations, self loops,
    multi-edges, disconnected parts): decomposition must cover every
    node exactly once and every snarl must separate its contents
    (mirrors unittest/support/snarl_decomposition_fuzzer.cpp)."""
    rng = np.random.default_rng(99)
    for trial in range(1000):
        n = int(rng.integers(1, 12))
        m = int(rng.integers(0, 20))
        g = _random_bidirected(rng, n, m)
        dec = decompose(g)
        _check_decomposition(g, dec)
