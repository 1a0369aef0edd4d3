"""GBZ interchange tests against the reference's own fixture
(test/primers/y.giraffe.gbz built by the reference toolchain)."""
import numpy as np
import pytest

from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import Read
from vg_tpu.io.gbz import gbz_to_graph, read_gbz


@pytest.fixture(scope="module")
def y_gbz(ref_test_dir):
    p = ref_test_dir / "primers" / "y.giraffe.gbz"
    if not p.exists():
        pytest.skip("no GBZ fixture")
    return read_gbz(str(p))


def test_gbz_parse(y_gbz):
    assert y_gbz.tags["source"] == "jltsiren/gbwtgraph"
    g = y_gbz.gbwt
    assert g.sequences == 6
    assert g.alphabet_size == 134
    assert g.sample_names == ["1", "_gbwt_ref"]
    assert g.contig_names == ["y"]
    assert y_gbz.node_count == 66
    assert len(y_gbz.sequences) == 66


def test_gbz_graph_matches_reference(y_gbz, ref_test_dir):
    g, haps = gbz_to_graph(y_gbz)
    assert g.validate() == []
    assert g.node_count == 66
    ref = read_fasta(str(ref_test_dir / "small" / "y.fa"))
    # the embedded reference path spells y exactly
    assert g.path_seq("y") == ref["y"].upper()
    meta = g.path_meta[g.path_index("y")]
    from vg_tpu.graph.arraygraph import SENSE_REFERENCE

    assert meta.sense == SENSE_REFERENCE
    # sample haplotypes present
    names = [m.name for m in g.path_meta]
    assert "1#0#y" in names and "1#1#y" in names
    assert haps.count == 3


def test_map_against_gbz(y_gbz, ref_test_dir):
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper

    g, haps = gbz_to_graph(y_gbz)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx)
    ref = read_fasta(str(ref_test_dir / "small" / "y.fa"))["y"].upper()
    reads = [Read(f"r{i}", ref[i * 90 : i * 90 + 100], None)
             for i in range(9)]
    alns = m.map_batch(reads)
    for i, a in enumerate(alns):
        assert a.path is not None
        assert a.score == 110
        assert a.refpos and a.refpos[0].name == "y"
        assert abs(a.refpos[0].offset - i * 90) <= 2


def test_gbz_write_roundtrip_fixture(y_gbz, tmp_path):
    """Write the fixture's graph+haplotypes with our writer; read it back;
    everything must survive (reader and writer are mutually validating)."""
    from vg_tpu.io.gbz_write import write_gbz

    g, haps = gbz_to_graph(y_gbz)
    out = tmp_path / "y.rt.gbz"
    write_gbz(str(out), g, haps)
    gbz2 = read_gbz(str(out))
    g2, haps2 = gbz_to_graph(gbz2)
    assert dict(g.iter_nodes()) == dict(g2.iter_nodes())
    assert set(g.iter_edges()) == set(g2.iter_edges())
    for m in g.path_meta:
        assert g2.path_seq(m.name) == g.path_seq(m.name)
    assert np.array_equal(haps.text, haps2.text)


def test_gbz_write_constructed_graph(ref_test_dir, tmp_path):
    """Construct x from FASTA+VCF, export GBZ, reload, and map a read."""
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.gbz_write import write_gbz
    from vg_tpu.io.vcf import read_vcf
    from vg_tpu.map.giraffe import GiraffeMapper

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=32)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    out = tmp_path / "x.gbz"
    write_gbz(str(out), g, haps)
    g2, haps2 = gbz_to_graph(read_gbz(str(out)))
    assert dict(g.iter_nodes()) == dict(g2.iter_nodes())
    assert np.array_equal(np.sort(haps.text), np.sort(haps2.text))
    m = GiraffeMapper(haps2, MinimizerIndex.build(haps2))
    refseq = ref["x"].upper()
    (aln,) = m.map_batch([Read("t", refseq[100:200], None)])
    assert aln.score == 110
