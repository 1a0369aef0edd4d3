"""Native dag_align (C++ POA fill+traceback) vs the numpy twin.

The graph-space fallback in giraffe's emit path runs _align_dag per
clipped/low-score winner; the native port must produce byte-identical
Alignment records (score, identity, full Path) in both local and global
modes, on DAGs and on dagified cyclic graphs.
"""
import numpy as np
import pytest

from vg_tpu.graph.arraygraph import GraphBuilder
from vg_tpu.native import lib
from vg_tpu.ops import graph_align as GA
from vg_tpu.ops.align import Scoring

pytestmark = pytest.mark.skipif(lib() is None,
                                reason="native lib unavailable")


def _rand_graph(rng, n_nodes, cyclic):
    b = GraphBuilder()
    ids = []
    for _ in range(n_nodes):
        n = int(rng.integers(1, 12))
        ids.append(b.add_node("".join("ACGT"[c]
                                      for c in rng.integers(0, 4, n))))
    for i in range(n_nodes):
        for j in range(i + 1, min(i + 4, n_nodes)):
            if rng.random() < 0.4:
                b.add_edge(ids[i], ids[j])
        if cyclic and i > 2 and rng.random() < 0.15:
            b.add_edge(ids[i], ids[int(rng.integers(0, i - 1))])
    return b.freeze()


def test_native_dag_align_fuzz_parity():
    rng = np.random.default_rng(7)
    sc = Scoring(1, 4, 6, 1, 5)
    n_checked = 0
    for trial in range(40):
        g = _rand_graph(rng, int(rng.integers(3, 12)),
                        cyclic=(trial % 3 == 0))
        L = int(rng.integers(5, 60))
        read = rng.integers(0, 4, L).astype(np.uint8)
        dag = GA._flatten_dagified(g, max_walk=L + 32)
        for mode in ("local", "global"):
            a_np = GA._align_dag_numpy(dag, g, read, sc, mode)
            a_nat = GA._align_dag_native(dag, g, read, sc, mode)
            assert a_nat is not NotImplemented
            assert (a_np is None) == (a_nat is None)
            if a_np is None:
                continue
            assert a_np.score == a_nat.score
            assert a_np.encode() == a_nat.encode()
            n_checked += 1
    assert n_checked > 30


def test_native_dag_align_mismatch_and_gap_edits():
    rng = np.random.default_rng(3)
    b = GraphBuilder()
    ids = [b.add_node("".join("ACGT"[c] for c in rng.integers(0, 4, 16)))
           for _ in range(12)]
    for i in range(11):
        b.add_edge(ids[i], ids[i + 1])
    g = b.freeze()
    # walk the single path, inject a mismatch, an insertion, a deletion
    walk = np.concatenate([g.handle_seq_codes(2 * g.idx(i)) for i in ids])
    read = walk[10:100].copy()
    read[20] = (read[20] + 1) % 4
    read = np.concatenate([read[:50], np.array([0, 1], np.uint8),
                           read[50:]])          # 2bp insertion
    read = np.concatenate([read[:70], read[73:]])   # 3bp deletion
    sc = Scoring(1, 4, 6, 1, 5)
    dag = GA._flatten_dagified(g, max_walk=len(read) + 32)
    a_np = GA._align_dag_numpy(dag, g, read, sc, "local")
    a_nat = GA._align_dag_native(dag, g, read, sc, "local")
    assert a_np is not None and a_nat is not None
    assert a_np.encode() == a_nat.encode()
    kinds = {GA._ekind(e) for m in a_nat.path.mappings for e in m.edits}
    assert {"X", "I", "D"} <= kinds
