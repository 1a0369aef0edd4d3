"""Flow (k-widest-paths) traversal finder — vg call's default allele
enumerator (reference traversal_finder.hpp:588, k_widest_paths.cpp)."""
import numpy as np
import pytest

from vg_tpu.graph.arraygraph import GraphBuilder
from vg_tpu.graph.flowtrav import (flow_traversals, widest_dijkstra,
                                   yens_k_widest)
from vg_tpu.graph.snarls import Snarl


def _dense_snarl(n_alts=20, allele_len=8, seed=0):
    """start --(n_alts parallel alt chains)-- end."""
    rng = np.random.default_rng(seed)
    b = GraphBuilder()
    bases = "ACGT"
    start_id = b.add_node("".join(bases[i] for i in
                                  rng.integers(0, 4, 12)))
    end_id = b.add_node("".join(bases[i] for i in rng.integers(0, 4, 12)))
    alt_ids = []
    for _ in range(n_alts):
        seq = "".join(bases[i] for i in rng.integers(0, 4, allele_len))
        a = b.add_node(seq)
        b.add_edge(start_id, a)
        b.add_edge(a, end_id)
        alt_ids.append(a)
    g = b.freeze()
    alts = [g.idx(a) for a in alt_ids]          # graph indices
    sn = Snarl(start=g.idx(start_id) * 2, end=g.idx(end_id) * 2,
               contents=list(alts))
    return g, sn, alts


class _FakePack:
    """Node/edge weights from dicts (Packer protocol subset)."""

    def __init__(self, graph, node_cov, edge_cov):
        self.graph = graph
        self._n = node_cov
        self._e = edge_cov

    def node_avg_all(self):
        n = self.graph.node_count
        out = np.zeros(n)
        for k, v in self._n.items():
            out[k] = v
        return out

    def edge_support(self, a, b):
        return self._e.get((a, b), self._e.get((b ^ 1, a ^ 1), 0))


def test_widest_dijkstra_prefers_covered_path():
    g, sn, alts = _dense_snarl(5)
    cov_n = {alts[3]: 30.0}
    cov_e = {(sn.start, alts[3] * 2): 30, (alts[3] * 2, sn.end): 30}
    pack = _FakePack(g, cov_n, cov_e)
    navg = pack.node_avg_all()
    w, walk = widest_dijkstra(
        g, sn.start, sn.end, set(sn.contents),
        lambda h: float(navg[h >> 1]),
        lambda a, b: float(pack.edge_support(a, b)))
    assert walk[0] == sn.start and walk[-1] == sn.end
    assert walk[1] >> 1 == alts[3]
    assert w == 30.0


def test_yens_k_widest_orders_by_width():
    g, sn, alts = _dense_snarl(6)
    widths = [5, 40, 12, 33, 1, 20]
    cov_n = {a: float(w) for a, w in zip(alts, widths)}
    cov_e = {}
    for a, w in zip(alts, widths):
        cov_e[(sn.start, a * 2)] = w
        cov_e[(a * 2, sn.end)] = w
    pack = _FakePack(g, cov_n, cov_e)
    navg = pack.node_avg_all()
    out = yens_k_widest(
        g, sn.start, sn.end, set(sn.contents), 4,
        lambda h: float(navg[h >> 1]),
        lambda a, b: float(pack.edge_support(a, b)))
    got = [(w, walk[1] >> 1) for w, walk in out]
    assert got == [(40.0, alts[1]), (33.0, alts[3]),
                   (20.0, alts[5]), (12.0, alts[2])]


def test_dense_snarl_flow_recovers_true_alleles():
    """The round-2 verdict's Done condition: a 20-allele snarl whose
    reads take exactly two alleles must call those two — the exhaustive
    finder capped below 20 can miss them, the flow finder cannot."""
    from vg_tpu.call.caller import CallParams, SnarlCaller
    from vg_tpu.call.pack import Packer
    from vg_tpu.graph.snarls import snarl_traversals
    from vg_tpu.io.gam import Alignment, Edit, Mapping, Path, Position

    g, sn, alts = _dense_snarl(20, seed=3)
    true_a, true_b = alts[17], alts[4]

    pack = Packer(g)
    # simulated read support: 15x across each true allele
    def walk_aln(alt):
        maps = []
        for nid, off in ((sn.start >> 1, 6), (alt, 0), (sn.end >> 1, 0)):
            ln = g.node_len(int(g.node_id[nid])) if off == 0 else 6
            maps.append(Mapping(
                position=Position(node_id=int(g.node_id[nid]), offset=off),
                edits=[Edit(from_length=ln, to_length=ln)],
                rank=len(maps) + 1))
        seq = "A" * sum(e.from_length for m in maps for e in m.edits)
        return Alignment(name="r", sequence=seq, path=Path(mappings=maps))

    for _ in range(15):
        pack.add(walk_aln(true_a))
        pack.add(walk_aln(true_b))

    travs = flow_traversals(g, pack, sn, 6)
    assert len(travs) >= 2
    top2 = {travs[0][1] >> 1, travs[1][1] >> 1}
    assert top2 == {true_a, true_b}

    # the exhaustive finder capped at 6 misses at least one true allele
    # on this 20-way snarl (it stops at the first 6 walks it reaches)
    ex = snarl_traversals(g, sn, 6)
    ex_alts = {t[1] >> 1 for t in ex}
    assert not {true_a, true_b} <= ex_alts
