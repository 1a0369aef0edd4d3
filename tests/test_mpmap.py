"""Multipath (GAMP) mapper tests: within-alignment DAG factoring."""
import numpy as np
import pytest

from vg_tpu.graph.arraygraph import GraphBuilder, SENSE_HAPLOTYPE
from vg_tpu.index.haplotypes import haplotypes_from_paths
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fastq import Read
from vg_tpu.io.gamp import write_gamp, read_gamp
from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
from vg_tpu.map.mpmap import MultipathMapper
from vg_tpu.utils import dna


def test_multipath_dag_factors_snp_ambiguity(tmp_path):
    """A read over a bubble whose two alleles both exist on indexed
    haplotypes must come out as one DAG: shared prefix subpath ->
    two allele branches -> shared suffix subpath (the
    MultipathAlignmentGraph shape), not as two unrelated alignments."""
    rng = np.random.default_rng(2)
    seg = lambda n: dna.decode(rng.integers(0, 4, n).astype(np.uint8))
    A = seg(120)
    B = seg(120)
    b = GraphBuilder()
    na = b.add_node(A)
    nx = b.add_node("A")     # allele 1 (SNP)
    ny = b.add_node("C")     # allele 2
    nb = b.add_node(B)
    b.add_edge(na, nx)
    b.add_edge(na, ny)
    b.add_edge(nx, nb)
    b.add_edge(ny, nb)
    b.add_path("ref", [(na, False), (nx, False), (nb, False)])
    b.add_path("h1", [(na, False), (ny, False), (nb, False)],
               sense=SENSE_HAPLOTYPE)
    g = b.freeze()
    haps = haplotypes_from_paths(g)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64))
    mm = MultipathMapper(m)

    read_seq = A[40:] + "A" + B[:40]     # matches allele 1 exactly
    (mp,) = mm.map_batch([Read("snp", read_seq, None)])
    assert len(mp.subpaths) >= 3, [sp.to_json() for sp in mp.subpaths]
    # a shared prefix subpath with branches
    branching = [sp for sp in mp.subpaths if len(sp.next) >= 2]
    assert branching, "no branch point in the multipath DAG"
    # the branch targets differ at the allele node
    br = branching[0]
    allele_nodes = set()
    for nxt in br.next:
        sp = mp.subpaths[nxt]
        if sp.path and sp.path.mappings:
            allele_nodes.add(sp.path.mappings[0].position.node_id)
    assert len(allele_nodes) >= 2, allele_nodes
    # wire roundtrip
    fp = tmp_path / "x.gamp"
    with open(fp, "wb") as f:
        write_gamp(f, [mp])
    (mp2,) = list(read_gamp(str(fp)))
    assert len(mp2.subpaths) == len(mp.subpaths)
    assert mp2.subpaths[0].next == mp.subpaths[0].next
    # best_alignment still reconstructs a full-length path
    best = mp2.best_alignment()
    tos = sum(e.to_length for mpg in best.path.mappings for e in mpg.edits)
    assert tos == len(read_seq)
