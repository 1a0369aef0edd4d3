"""Novel splice junction discovery + spliced surjection."""
import numpy as np
import pytest

from vg_tpu.map.splice import (find_splice_left, find_splice_right,
                               intron_score)


def _text_with_intron(seed=0, T=20000, e1=1100, intron=5000):
    """Random text with a GT..AG intron planted at [e1, e1+intron)."""
    rng = np.random.default_rng(seed)
    text = rng.integers(0, 4, T).astype(np.uint8)
    text[e1] = 2       # G
    text[e1 + 1] = 3   # T
    text[e1 + intron - 2] = 0   # A
    text[e1 + intron - 1] = 2   # G
    return text


def test_find_splice_right_recovers_junction():
    e1, intron = 1100, 5000
    text = _text_with_intron(0, e1=e1, intron=intron)
    read = np.concatenate([text[e1 - 50 : e1],
                           text[e1 + intron : e1 + intron + 40]])
    hit = find_splice_right(text, donor_end=e1, clip=read[50:])
    assert hit is not None
    assert hit.donor_end == e1
    assert hit.acceptor == e1 + intron
    assert hit.intron_len == intron
    assert hit.tail_mism.sum() == 0
    assert hit.score_gain >= 40   # 40 matches + bonus + motif + length


def test_find_splice_right_requires_motif():
    e1, intron = 1100, 5000
    text = _text_with_intron(1, e1=e1, intron=intron)
    text[e1] = 1      # break the donor motif (C)
    text[e1 + 1] = 0
    read = np.concatenate([text[e1 - 50 : e1],
                           text[e1 + intron : e1 + intron + 40]])
    hit = find_splice_right(text, donor_end=e1, clip=read[50:])
    # no motif anywhere near the candidate -> rejected
    assert hit is None or hit.donor_end != e1


def test_find_splice_right_junction_shift():
    """The DP may absorb a few post-junction bases as chance matches;
    the shift scan recovers the motif-true junction."""
    e1, intron = 1100, 5000
    text = _text_with_intron(2, e1=e1, intron=intron)
    # make the 3 bases after the donor match the acceptor-side read so a
    # mapper would extend 3bp past the true junction
    text[e1 + intron : e1 + intron + 3] = text[e1 : e1 + 3]
    read = np.concatenate([text[e1 - 50 : e1],
                           text[e1 + intron : e1 + intron + 40]])
    # mapper reports donor_end 3bp too far right
    hit = find_splice_right(text, donor_end=e1 + 3, clip=read[53:])
    assert hit is not None
    assert hit.donor_end == e1
    assert hit.acceptor == e1 + intron
    assert hit.intron_len == intron


def test_find_splice_left_recovers_junction():
    e1, intron = 1100, 5000
    text = _text_with_intron(3, e1=e1, intron=intron)
    read = np.concatenate([text[e1 - 40 : e1],
                           text[e1 + intron : e1 + intron + 50]])
    hit = find_splice_left(text, acceptor_start=e1 + intron,
                           clip=read[:40])
    assert hit is not None
    assert hit.donor_end == e1 - 40        # tail segment start
    assert hit.acceptor == e1 + intron     # main segment resumes
    assert hit.intron_len == intron
    assert hit.tail_mism.sum() == 0


def test_intron_score_prefers_typical_lengths():
    assert intron_score(1400) >= intron_score(200000)
    assert intron_score(1400) >= intron_score(35)
    assert intron_score(1400) <= 0


@pytest.fixture(scope="module")
def intron_pangenome():
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.vcf import VcfFile
    from vg_tpu.utils import dna

    text = _text_with_intron(7, T=60000, e1=20000, intron=5000)
    ref = dna.decode(text)
    g, results = Constructor(ConstructorParams(max_node_size=64)
                             ).construct_graph(
        {"chr1": ref}, VcfFile(samples=[], records=[]))
    haps = thread_haplotypes(g, results, VcfFile(samples=[], records=[]))
    idx = MinimizerIndex.build(haps)
    return haps, idx, text


def test_mpmap_novel_junction_end_to_end(intron_pangenome):
    """Round-2 verdict item 6 Done condition: a simulated novel-junction
    read maps across the junction (GAMP connection) and surjects with an
    N CIGAR."""
    from vg_tpu.io.fastq import Read
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.mpmap import MultipathMapper
    from vg_tpu.surject.surjector import Surjector
    from vg_tpu.utils import dna

    haps, idx, text = intron_pangenome
    e1, intron = 20000, 5000
    read_codes = np.concatenate(
        [text[e1 - 80 : e1], text[e1 + intron : e1 + intron + 70]])
    read = Read("spliced1", dna.decode(read_codes), None)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64,
                                               graph_fallback=False))
    mm = MultipathMapper(m)

    # GAMP: two subpaths joined by a Connection
    (mp,) = mm.map_batch([read])
    assert len(mp.subpaths) == 2
    assert mp.subpaths[0].connection and \
        mp.subpaths[0].connection[0].next == 1
    # roundtrip the connection through the GAMP codec
    from vg_tpu.io.gamp import MultipathAlignment
    rt = MultipathAlignment.decode(mp.encode())
    assert rt.subpaths[0].connection[0].next == 1

    # GAM: stitched path surjects with an N of the intron length
    (aln,) = mm.map_batch_gam([read])
    assert aln.path is not None and len(aln.path.mappings) >= 2
    surj = Surjector(haps.graph)
    rec = surj.surject(aln)
    assert "N" in rec.cigar, rec.cigar
    import re

    n_ops = [int(x) for x in re.findall(r"(\d+)N", rec.cigar)]
    assert n_ops == [intron], rec.cigar
    assert rec.cigar.startswith("80M") and rec.cigar.endswith("70M"), \
        rec.cigar
    assert rec.pos == e1 - 80 + 1


def test_mpmap_reverse_spliced_read(intron_pangenome):
    """A reverse-strand novel-junction read: same junction, reverse
    orientation through the whole flow."""
    from vg_tpu.io.fastq import Read
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.mpmap import MultipathMapper
    from vg_tpu.surject.surjector import Surjector
    from vg_tpu.utils import dna

    haps, idx, text = intron_pangenome
    e1, intron = 20000, 5000
    fwd = np.concatenate(
        [text[e1 - 70 : e1], text[e1 + intron : e1 + intron + 80]])
    read = Read("spliced_rev", dna.decode(dna.revcomp_codes(fwd)), None)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64,
                                               graph_fallback=False))
    mm = MultipathMapper(m)
    (aln,) = mm.map_batch_gam([read])
    assert aln.path is not None and len(aln.path.mappings) >= 2
    rec = Surjector(haps.graph).surject(aln)
    import re

    n_ops = [int(x) for x in re.findall(r"(\d+)N", rec.cigar)]
    assert n_ops == [intron], rec.cigar
    assert rec.flag & 0x10     # reverse flag
    assert rec.pos == e1 - 70 + 1


def test_mpmap_paired_with_spliced_end(intron_pangenome):
    """Paired multipath mapping: pair selection drives the primary
    candidate, mates cross-link via paired_read_name, and a spliced end
    still gets its Connection subpaths."""
    from vg_tpu.io.fastq import Read
    from vg_tpu.io.gamp import MultipathAlignment
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.mpmap import MultipathMapper
    from vg_tpu.utils import dna

    haps, idx, text = intron_pangenome
    e1, intron = 20000, 5000
    rng = np.random.default_rng(3)
    pairs = []
    # ordinary pairs
    for i in range(31):
        s = int(rng.integers(0, len(text) - 500))
        c1 = text[s : s + 150]
        c2 = text[s + 300 : s + 450]
        pairs.append((Read(f"n{i}/1", dna.decode(c1), None),
                      Read(f"n{i}/2",
                           dna.decode(dna.revcomp_codes(c2)), None)))
    # one pair whose first end spans the novel junction
    c1 = np.concatenate([text[e1 - 80 : e1],
                         text[e1 + intron : e1 + intron + 70]])
    c2 = text[e1 + intron + 220 : e1 + intron + 370]
    pairs.append((Read("sp/1", dna.decode(c1), None),
                  Read("sp/2", dna.decode(dna.revcomp_codes(c2)), None)))

    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64,
                                               graph_fallback=False))
    out = MultipathMapper(m).map_pairs(pairs)
    assert len(out) == 32
    for mp1, mp2 in out:
        assert mp1.paired_read_name == mp2.name
        assert mp2.paired_read_name == mp1.name
        # codec roundtrip keeps the linkage
        assert MultipathAlignment.decode(
            mp1.encode()).paired_read_name == mp2.name
    sp1, sp2 = out[-1]
    assert len(sp1.subpaths) == 2 and sp1.subpaths[0].connection
    assert sp2.subpaths and not any(
        s.connection for s in sp2.subpaths)
    assert sp1.mapping_quality > 0


def test_spliced_paired_surjection(intron_pangenome):
    """A spliced read surjected as part of a PAIR keeps its N CIGAR and
    gets sane pair flags/TLEN (N counts toward the reference span)."""
    from vg_tpu.io.fastq import Read
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.mpmap import MultipathMapper
    from vg_tpu.surject.surjector import Surjector
    from vg_tpu.utils import dna

    haps, idx, text = intron_pangenome
    e1, intron = 20000, 5000
    c1 = np.concatenate([text[e1 - 80 : e1],
                         text[e1 + intron : e1 + intron + 70]])
    c2 = text[e1 + intron + 200 : e1 + intron + 350]
    r1 = Read("pp/1", dna.decode(c1), None)
    r2 = Read("pp/2", dna.decode(dna.revcomp_codes(c2)), None)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64,
                                               graph_fallback=False))
    mm = MultipathMapper(m)
    (a1,) = mm.map_batch_gam([r1])
    (a2,) = mm.map_batch_gam([r2])
    surj = Surjector(haps.graph)
    recs = surj.surject_pairs([(a1, a2)])
    s1, s2 = recs
    import re

    assert [int(x) for x in re.findall(r"(\d+)N", s1.cigar)] == [intron]
    assert s1.flag & 0x1 and s2.flag & 0x1          # paired
    assert s1.rnext in ("=", s2.rname)
    # TLEN spans from the spliced read's start to the mate's end,
    # crossing the intron
    assert abs(s1.tlen) > intron
