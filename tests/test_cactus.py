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
