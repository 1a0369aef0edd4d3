"""Cactus-graph snarl decomposition for arbitrary bidirected graphs.

TPU-native re-think of the reference's IntegratedSnarlFinder
(/root/reference/src/integrated_snarl_finder.cpp, SnarlManager
src/snarls.hpp:408): the construction follows the ultrabubble/cactus
theory — biedged graph -> adjacency components -> 3-edge-connected
component merge -> cactus forest -> rooted snarl/chain tree — with host
numpy/union-find doing the graph contraction and a linear-time
cycle-equivalence pass (program-structure-tree bracket algorithm) doing
the 3ECC work the reference delegates to
src/algorithms/three_edge_connected_components.cpp.

Unlike the round-1 backbone superbubble finder (graph/snarls.py), this
handles cyclic graphs, inversions, and off-path bubbles, and produces
nested snarls organised into chains, which is what `call`, `snarls`, and
`simplify` need on real pangenome GFAs.

Conventions: a node side is ``node_idx * 2 + end`` (end 0 = left side of
the forward orientation, 1 = right side). A handle is ``node_idx * 2 +
orient``. A snarl's ``start`` is a handle whose forward traversal enters
the snarl, ``end`` a handle whose forward traversal exits it (same
convention as graph/snarls.py:Snarl).
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from .arraygraph import ArrayGraph


# --------------------------------------------------------------- union-find

class _UF:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        p = self.p
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


# ------------------------------------------------- cycle equivalence (PST)

class _Br:
    __slots__ = ("anc_dfs", "edge", "capping", "prev", "next",
                 "recent_size", "recent_class")

    def __init__(self, anc_dfs, edge, capping):
        self.anc_dfs = anc_dfs
        self.edge = edge            # edge id, or -1 for capping brackets
        self.capping = capping
        self.prev = None
        self.next = None
        self.recent_size = -1
        self.recent_class = -1


class _BList:
    __slots__ = ("head", "tail", "size")

    def __init__(self):
        self.head = None
        self.tail = None
        self.size = 0

    def push(self, b):
        b.next = self.head
        b.prev = None
        if self.head is not None:
            self.head.prev = b
        self.head = b
        if self.tail is None:
            self.tail = b
        self.size += 1

    def delete(self, b):
        if b.prev is not None:
            b.prev.next = b.next
        else:
            self.head = b.next
        if b.next is not None:
            b.next.prev = b.prev
        else:
            self.tail = b.prev
        b.prev = b.next = None
        self.size -= 1

    def concat_under(self, other):
        """Append other's brackets below self's."""
        if other.size == 0:
            return
        if self.size == 0:
            self.head, self.tail, self.size = (other.head, other.tail,
                                               other.size)
            return
        self.tail.next = other.head
        other.head.prev = self.tail
        self.tail = other.tail
        self.size += other.size


def cut_pair_edges(n: int, edges: Sequence[Tuple[int, int]]) -> Set[int]:
    """Edge indices participating in some 2-edge-cut of the undirected
    multigraph (bridges excluded — remove them first or filter after).

    Johnson–Pearson–Pingali cycle-equivalence ("The program structure
    tree", PLDI'94): two distinct edges form a 2-edge-cut iff they are
    cycle-equivalent; one DFS with bracket lists computes the classes.
    Self-loops are ignored (never separating). Bridges come out as
    singleton classes and are not returned."""
    edge_class = _cycle_classes(n, edges)
    counts = Counter(c for c in edge_class if c >= 0)
    return {ei for ei, c in enumerate(edge_class)
            if c >= 0 and counts[c] >= 2}


def _cycle_classes(n: int, edges: Sequence[Tuple[int, int]]) -> List[int]:
    """Cycle-equivalence class id per edge (-1 for self-loops/unreached);
    the JPP bracket-list pass behind cut_pair_edges and the cactus
    builder. Valid within 2-edge-connected components (run on a
    bridge-free graph when classes are interpreted as cut pairs)."""
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for ei, (u, v) in enumerate(edges):
        if u == v:
            continue
        adj[u].append((v, ei))
        adj[v].append((u, ei))

    NIL = 1 << 60
    dfsnum = [-1] * n
    parent = [-1] * n
    parent_edge = [-1] * n
    order: List[int] = []
    is_tree = [False] * len(edges)

    # true DFS with iterator stack
    for root in range(n):
        if dfsnum[root] != -1:
            continue
        dfsnum[root] = len(order)
        order.append(root)
        stack = [(root, iter(adj[root]))]
        while stack:
            v, it = stack[-1]
            advanced = False
            for (w, ei) in it:
                if dfsnum[w] == -1:
                    dfsnum[w] = len(order)
                    order.append(w)
                    parent[w] = v
                    parent_edge[w] = ei
                    is_tree[ei] = True
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    # backedges oriented descendant -> ancestor
    by_desc: Dict[int, List[Tuple[int, int]]] = {}   # v -> [(anc, edge id)]
    for ei, (u, v) in enumerate(edges):
        if u == v or is_tree[ei]:
            continue
        if dfsnum[u] < dfsnum[v]:
            u, v = v, u
        by_desc.setdefault(u, []).append((v, ei))

    children: Dict[int, List[int]] = {}
    for v in order:
        if parent[v] >= 0:
            children.setdefault(parent[v], []).append(v)

    n_classes = 0
    edge_class = [-1] * len(edges)
    blists: Dict[int, _BList] = {}
    hi: Dict[int, int] = {}
    ends_at: Dict[int, List[_Br]] = {}   # dfsnum of ancestor -> brackets

    for v in reversed(order):
        dv = dfsnum[v]
        my_back = by_desc.get(v, [])
        hi0 = min((dfsnum[a] for (a, ei) in my_back), default=NIL)
        kids = children.get(v, [])
        kid_his = sorted(hi[c] for c in kids) if kids else []
        hi1 = kid_his[0] if kid_his else NIL
        hi2 = kid_his[1] if len(kid_his) > 1 else NIL
        hi[v] = min(hi0, hi1)

        bl = _BList()
        for c in kids:
            bl.concat_under(blists.pop(c))
        for b in ends_at.pop(dv, ()):
            bl.delete(b)
            if not b.capping and edge_class[b.edge] == -1:
                edge_class[b.edge] = n_classes
                n_classes += 1
        # push backedge brackets (nearest ancestor pushed last = topmost)
        for (a, ei) in sorted(my_back, key=lambda t: dfsnum[t[0]]):
            b = _Br(dfsnum[a], ei, False)
            bl.push(b)
            ends_at.setdefault(dfsnum[a], []).append(b)
        if hi2 < hi0 and hi2 < dv:
            # capping bracket (hi2 == dv would be a bracket to v itself:
            # no constraint, and it could never be deleted again)
            b = _Br(hi2, -1, True)
            bl.push(b)
            ends_at.setdefault(hi2, []).append(b)

        pe = parent_edge[v]
        if pe >= 0:
            if bl.size == 0:
                edge_class[pe] = n_classes      # bridge: singleton class
                n_classes += 1
            else:
                b = bl.head
                if b.recent_size != bl.size:
                    b.recent_size = bl.size
                    b.recent_class = n_classes
                    n_classes += 1
                edge_class[pe] = b.recent_class
                if bl.size == 1 and not b.capping:
                    edge_class[b.edge] = edge_class[pe]
        blists[v] = bl

    return edge_class


def three_edge_connected_components(n: int,
                                    edges: Sequence[Tuple[int, int]]
                                    ) -> List[int]:
    """Component id per vertex such that two vertices share an id iff they
    are 3-edge-connected (same component after removing every bridge and
    every edge participating in a 2-edge-cut).

    Cycle equivalence == 2-cut only holds inside a 2-edge-connected
    graph, so bridges are removed first and the bracket pass runs on the
    bridge-free graph (whose components are exactly the 2ECCs). Each
    cut class then refines the partition independently: u,v are 3EC iff
    no single class's removal separates them (removing all classes at
    once over-separates — different classes can each cut a different
    one of three edge-disjoint paths)."""
    bridges = find_bridges(n, edges)
    kept = [e for ei, e in enumerate(edges)
            if ei not in bridges and e[0] != e[1]]
    classes = _cycle_classes(n, kept)
    by_class: Dict[int, List[int]] = {}
    for li, c in enumerate(classes):
        if c >= 0:
            by_class.setdefault(c, []).append(li)
    cut_classes = [v for v in by_class.values() if len(v) >= 2]

    # adjacency of the bridge-free graph, with local edge ids
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for li, (u, v) in enumerate(kept):
        adj[u].append((v, li))
        adj[v].append((u, li))

    # label = refined partition id; start with 2ECC (connected component
    # of the bridge-free graph)
    label = [-1] * n
    nl = 0
    for root in range(n):
        if label[root] != -1 or not adj[root]:
            continue
        stack = [root]
        label[root] = nl
        while stack:
            x = stack.pop()
            for (y, _) in adj[x]:
                if label[y] == -1:
                    label[y] = nl
                    stack.append(y)
        nl += 1
    for v in range(n):
        if label[v] == -1:
            label[v] = nl        # isolated vertices: own labels
            nl += 1

    for cls in cut_classes:
        removed = set(cls)
        # BFS the 2ECC containing this class with class edges removed;
        # each piece refines the labels of its vertices
        seeds: List[int] = []
        for li in cls:
            seeds.extend(kept[li])
        seen: Dict[int, int] = {}
        piece = 0
        for s in seeds:
            if s in seen:
                continue
            stack = [s]
            seen[s] = piece
            while stack:
                x = stack.pop()
                for (y, li) in adj[x]:
                    if li in removed or y in seen:
                        continue
                    seen[y] = piece
                    stack.append(y)
            piece += 1
        if piece <= 1:
            continue
        remap: Dict[Tuple[int, int], int] = {}
        for v, pc in seen.items():
            key = (label[v], pc)
            if key not in remap:
                remap[key] = nl
                nl += 1
            label[v] = remap[key]
    return label


def find_bridges(n: int, edges: Sequence[Tuple[int, int]]) -> Set[int]:
    """Bridge edge indices (undirected multigraph; parallel edges are
    never bridges, handled naturally by skipping the parent *edge id*,
    not the parent vertex)."""
    adj: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for ei, (u, v) in enumerate(edges):
        if u == v:
            continue
        adj[u].append((v, ei))
        adj[v].append((u, ei))
    disc = [-1] * n
    low = [0] * n
    bridges: Set[int] = set()
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        disc[root] = low[root] = timer
        timer += 1
        stack = [(root, -1, iter(adj[root]))]
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for (w, ei) in it:
                if ei == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, ei, iter(adj[w])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    u = stack[-1][0]
                    if low[v] > disc[u]:
                        bridges.add(pe)
                    low[u] = min(low[u], low[v])
    return bridges
