import numpy as np
import pytest

from vg_tpu.graph.arraygraph import ArrayGraph, GraphBuilder, flip
from vg_tpu.io.gfa import parse_gfa, read_gfa, write_gfa
from vg_tpu.io.json_graph import graph_from_json, graph_to_json
from vg_tpu.io.vg_format import read_vg, write_vg


def make_tiny():
    b = GraphBuilder()
    b.add_node("GATT", node_id=1)
    b.add_node("ACA", node_id=2)
    b.add_node("T", node_id=3)
    b.add_edge(1, 2)
    b.add_edge(1, 3)
    b.add_edge(2, 3)
    b.add_edge(3, 1, False, True)  # 3+ -> 1- (inversion edge)
    b.add_path("ref", [(1, False), (2, False), (3, False)])
    return b.freeze()


def test_builder_basics():
    g = make_tiny()
    assert g.node_count == 3
    assert g.edge_count == 4
    assert g.node_seq(1) == "GATT"
    h1 = g.handle(1)
    assert g.handle_seq(h1) == "GATT"
    assert g.handle_seq(flip(h1)) == "AATC"
    # edge 3+ -> 1- symmetrically means 1+ -> 3-
    succ = set(int(x) for x in g.follow(h1))
    assert succ == {g.handle(2), g.handle(3), g.handle(3, True)}
    # symmetric: predecessors of 2+ include 1+
    assert g.handle(1) in set(int(x) for x in g.predecessors(g.handle(2)))
    # inversion edge: follow(3+) contains 1-
    assert g.handle(1, True) in set(int(x) for x in g.follow(g.handle(3)))
    assert g.path_seq("ref") == "GATTACAT"
    assert g.validate() == []


def test_path_offsets():
    g = make_tiny()
    offs = g.path_step_offsets("ref")
    assert list(offs) == [0, 4, 7, 8]


def test_gfa_roundtrip_tiny_fixture(ref_test_dir):
    g = read_gfa(str(ref_test_dir / "tiny" / "tiny.gfa"))
    assert g.node_count == 15
    assert g.edge_count == 20
    assert g.path_count == 1
    # the x path must spell the tiny reference
    from vg_tpu.io.fasta import read_fasta
    ref = read_fasta(str(ref_test_dir / "tiny" / "tiny.fa"))["x"]
    assert g.path_seq("x") == ref
    assert g.validate() == []
    # round-trip
    text = write_gfa(g, None)
    g2 = parse_gfa(text)
    assert g2.node_count == g.node_count
    assert g2.edge_count == g.edge_count
    assert g2.path_seq("x") == ref


def test_read_reference_vg(ref_test_dir):
    g = read_vg(str(ref_test_dir / "graphs" / "atgc.vg"))
    assert g.node_count == 5
    assert sorted(s for _, s in g.iter_nodes()) == ["A", "A", "C", "G", "T"]
    # an inverting graph parses and validates
    g2 = read_vg(str(ref_test_dir / "graphs" / "difficult-inv.vg"))
    assert g2.node_count > 0
    assert any(f_rev or t_rev for _, f_rev, _, t_rev in g2.iter_edges())


def test_vg_format_roundtrip(tmp_path):
    g = make_tiny()
    p = tmp_path / "t.vg"
    write_vg(g, str(p))
    g2 = read_vg(str(p))
    assert g2.node_count == g.node_count
    assert g2.edge_count == g.edge_count
    assert g2.path_seq("ref") == "GATTACAT"
    assert set(g2.iter_edges()) == set(g.iter_edges())


def test_json_graph_matches_reference(ref_test_dir):
    import json
    with open(str(ref_test_dir / "call" / "tiny.json")) as f:
        d = json.load(f)
    g = graph_from_json(d)
    assert g.node_count == 15
    assert g.edge_count == 20
    from vg_tpu.io.fasta import read_fasta
    ref = read_fasta(str(ref_test_dir / "tiny" / "tiny.fa"))["x"]
    assert g.path_seq("x") == ref
    # json round trip preserves structure
    g2 = graph_from_json(graph_to_json(g))
    assert g2.node_count == 15 and g2.edge_count == 20
    assert g2.path_seq("x") == ref


def test_big_reference_graph(ref_test_dir):
    g = read_vg(str(ref_test_dir / "graphs" / "snp1kg-brca2-unsorted.vg"))
    assert g.node_count > 1000
    assert g.validate() == []
