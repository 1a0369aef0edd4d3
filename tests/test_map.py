"""Giraffe-style mapper tests.

Oracles:
- golden score from reference test/t/50_vg_giraffe.t:49 (GAM score == 73
  for reads/small.middle.ref.fq on the small x graph)
- truth positions from reference simulated GAMs (gamcompare semantics:
  correct iff within 150bp of truth refpos; reference
  src/subcommand/gamcompare_main.cpp:26-31)
- device/host DP agreement (the device kernel scores, the host does
  traceback; they must agree exactly)
"""
import numpy as np
import pytest

from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import Read, iter_fastq
from vg_tpu.io.gam import read_gam
from vg_tpu.map.giraffe import GiraffeMapper
from vg_tpu.ops import align as align_ops
from vg_tpu.ops.traceback import banded_traceback
from vg_tpu.utils import dna


@pytest.fixture(scope="module")
def small_x(ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf_path = str(ref_test_dir / "small" / "x.vcf.gz")
    from vg_tpu.io.vcf import read_vcf

    vcf = read_vcf(vcf_path)
    g, results = Constructor(ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    return GiraffeMapper(haps, idx)


def _path_to_length(aln):
    return sum(e.to_length for m in aln.path.mappings for e in m.edits)


def test_perfect_read_score_73(small_x, ref_test_dir):
    """50_vg_giraffe.t:49 golden: score == 73, full identity."""
    reads = list(iter_fastq(str(ref_test_dir / "reads" / "small.middle.ref.fq")))
    (aln,) = small_x.map_batch(reads)
    assert aln.score == 73
    assert aln.identity == 1.0
    # the 63bp read carries q66 ('c') qualities and yields few minimizers,
    # so the explored-minimizer cap (map/mapqcap.py, reference
    # minimizer_mapper.cpp:1161-1172 faster_cap) binds below 60: the
    # posterior alone said 60, the cap says the handful of seeds could be
    # disrupted with ~10^-5.4 probability of base errors
    assert aln.mapping_quality == 54
    assert _path_to_length(aln) == len(aln.sequence)
    assert aln.refpos and aln.refpos[0].name == "x"
    # the read is a perfect ref substring: path must spell the read
    g = small_x.graph
    spelled = ""
    for m in aln.path.mappings:
        s = g.node_seq(m.position.node_id)
        if m.position.is_reverse:
            s = dna.revcomp_str(s)
        spelled += s[m.position.offset : m.position.offset
                     + sum(e.from_length for e in m.edits)]
    assert spelled == aln.sequence


def test_sim_reads_accuracy(small_x, ref_test_dir):
    """100 simulated reads (1% error): no wrong placements, >=85 correct
    within gamcompare's default 150bp range (wrong = mapped >150bp away)."""
    truth = list(read_gam(str(ref_test_dir / "small" / "x-s1337-n100-e0.01-i0.005.gam")))
    reads = [Read(t.name, t.sequence, None) for t in truth]
    alns = small_x.map_batch(reads)
    ppi = small_x.path_pos
    ok = wrong = unmapped = 0
    for t, a in zip(truth, alns):
        ppi.annotate_refpos(t)
        if a.path is None or not a.path.mappings:
            unmapped += 1
            continue
        assert _path_to_length(a) == len(a.sequence)
        if a.refpos and t.refpos and abs(a.refpos[0].offset - t.refpos[0].offset) <= 150:
            ok += 1
        else:
            wrong += 1
    assert wrong == 0, f"{wrong} misplaced reads"
    assert ok >= 85, f"only {ok} correct"


def test_reverse_strand_path_valid(small_x, ref_test_dir):
    """Reverse-strand alignments produce paths whose edges exist and whose
    match edits spell the read."""
    truth = list(read_gam(str(ref_test_dir / "small" / "x-s1337-n100-e0.01-i0.005.gam")))
    rev = [t for t in truth
           if t.path and t.path.mappings and t.path.mappings[0].position.is_reverse]
    assert rev
    reads = [Read(t.name, t.sequence, None) for t in rev[:10]]
    alns = small_x.map_batch(reads)
    g = small_x.graph
    n_rev = 0
    for a in alns:
        if a.path is None or not a.path.mappings:
            continue
        if a.path.mappings[0].position.is_reverse:
            n_rev += 1
        # consecutive mappings must be graph edges
        hs = [g.handle(m.position.node_id, m.position.is_reverse)
              for m in a.path.mappings]
        for h1, h2 in zip(hs[:-1], hs[1:]):
            assert g.has_edge(h1, h2)
        # match edits must spell the read exactly
        read_pos = 0
        for m in a.path.mappings:
            s = g.handle_seq(g.handle(m.position.node_id, m.position.is_reverse))
            gpos = m.position.offset
            for e in m.edits:
                if e.from_length == e.to_length and not e.sequence:  # match
                    assert s[gpos : gpos + e.from_length] == \
                        a.sequence[read_pos : read_pos + e.to_length]
                gpos += e.from_length
                read_pos += e.to_length
    assert n_rev >= 5


def test_device_host_dp_agreement():
    """banded_scores (device) and banded_traceback (host) implement the same
    objective: exact score agreement on random pairs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B = 8
    L = 50
    text = rng.integers(0, 4, size=2000).astype(np.uint8)
    starts, reads = [], []
    for i in range(16):
        s = int(rng.integers(0, 1800))
        read = text[s : s + L].copy()
        # mutations
        nmut = int(rng.integers(0, 6))
        for _ in range(nmut):
            p = int(rng.integers(0, L))
            read[p] = (read[p] + 1 + rng.integers(0, 3)) % 4
        # maybe an indel
        if rng.random() < 0.5:
            p = int(rng.integers(5, L - 5))
            n = int(rng.integers(1, 4))
            if rng.random() < 0.5:
                read = np.concatenate([read[:p], rng.integers(0, 4, n).astype(np.uint8), read[p:]])[:L]
            else:
                read = np.concatenate([read[:p], read[p + n :], text[s + L : s + L + n]])[:L]
        reads.append(read)
        starts.append(s - B)
    reads_arr = np.stack(reads)
    rc = np.stack([dna.revcomp_codes(r) for r in reads])
    rlen = np.full(16, L, np.int32)
    cand_start = np.array(starts, np.int32)[:, None]
    lo = np.zeros((16, 1), np.int32)
    hi = np.full((16, 1), len(text), np.int32)
    rev = np.zeros((16, 1), bool)
    valid = np.ones((16, 1), bool)
    dev = np.asarray(align_ops.banded_scores(
        jnp.asarray(text), reads_arr, rc, rlen, cand_start, lo, hi, rev, valid,
        band_radius=B))
    for i in range(16):
        TW = L + 2 * B
        pos = starts[i] + np.arange(TW)
        ok = (pos >= 0) & (pos < len(text))
        window = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                          align_ops.SENTINEL).astype(np.uint8)
        ta = banded_traceback(reads_arr[i], window, B)
        host = ta.score if ta else 0
        assert host == dev[i, 0], f"pair {i}: host {host} device {dev[i,0]}"


def test_pallas_kernel_parity_interpret():
    """Pallas DP kernel (interpret mode) matches the XLA scan exactly."""
    import jax.numpy as jnp

    from vg_tpu.ops.pallas_align import banded_scores_pallas

    rng = np.random.default_rng(9)
    B, RL, N = 12, 64, 128
    text = rng.integers(0, 4, 8000).astype(np.uint8)
    reads = np.full((N, RL), 5, np.uint8)
    rlen = np.zeros(N, np.int32)
    starts = np.zeros(N, np.int64)
    for i in range(N):
        L = int(rng.integers(35, RL + 1))
        s = int(rng.integers(0, 7000))
        r = text[s : s + L].copy()
        for _ in range(int(rng.integers(0, 5))):
            q = int(rng.integers(0, L))
            r[q] = (r[q] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.4:
            q = int(rng.integers(5, L - 5))
            r = np.concatenate([r[:q], r[q + 2 :], text[s + L : s + L + 2]])[:L]
        reads[i, :L] = r
        rlen[i] = L
        starts[i] = s - B
    TW = RL + 2 * B
    pos = starts[:, None] + np.arange(TW)
    ok = (pos >= 0) & (pos < len(text))
    windows = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                       align_ops.SENTINEL).astype(np.uint8)
    comp = np.array([3, 2, 1, 0, 4, 5], np.uint8)
    reads_rc = comp[reads][:, ::-1].copy()
    ref = np.asarray(align_ops.banded_scores(
        jnp.asarray(text), reads, reads_rc, rlen,
        starts[:, None].astype(np.int32), np.zeros((N, 1), np.int32),
        np.full((N, 1), len(text), np.int32), np.zeros((N, 1), bool),
        np.ones((N, 1), bool), band_radius=B))[:, 0]
    got = np.asarray(banded_scores_pallas(
        jnp.asarray(windows), jnp.asarray(reads), jnp.asarray(rlen),
        band_radius=B, interpret=True))
    assert np.array_equal(ref, got)


def test_wide_band_refinement(small_x):
    """A read with a 30bp deletion (beyond band radius 16) still aligns
    through the wide-band second pass."""
    haps = small_x.haps
    t0, t1 = haps.hap_text_range(0)
    s = t0 + 200
    left = haps.text[s : s + 60]
    right = haps.text[s + 90 : s + 150]       # skip 30bp
    codes = np.concatenate([left, right])
    (aln,) = small_x.map_batch([Read("bigdel", dna.decode(codes), None)])
    assert aln.path is not None
    froms = sum(e.from_length for mp in aln.path.mappings for e in mp.edits)
    tos = sum(e.to_length for mp in aln.path.mappings for e in mp.edits)
    assert tos == len(codes)
    assert froms >= len(codes) + 25           # the deletion is in the path
    assert aln.score >= 120 * 1 - (6 + 29) + 10 - 5


def test_multi_contig_construct_and_map(ref_test_dir):
    """Two-contig FASTA+VCF (xy fixtures): both ref paths embedded, reads
    from each contig map back to the right path."""
    from vg_tpu.io.vcf import read_vcf

    ref = read_fasta(str(ref_test_dir / "small" / "xy.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "xy2.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=32)).construct_graph(ref, vcf)
    assert g.has_path("x") and g.has_path("y")
    assert g.path_seq("x") == ref["x"].upper()
    assert g.path_seq("y") == ref["y"].upper()
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx)
    # x and y are identical sequences in this fixture: every read is
    # ambiguous between the two contigs, so placements must be correct in
    # offset and MAPQ must reflect the two-way ambiguity (low)
    reads = [Read("from_x", ref["x"].upper()[300:400], None),
             Read("from_y", ref["y"].upper()[500:600], None)]
    a1, a2 = m.map_batch(reads)
    assert a1.refpos and a1.refpos[0].name in ("x", "y")
    assert abs(a1.refpos[0].offset - 300) <= 5
    assert abs(a2.refpos[0].offset - 500) <= 5
    assert a1.mapping_quality <= 3 and a2.mapping_quality <= 3


def test_overhanging_read_at_haplotype_end(small_x):
    """A read overhanging its haplotype end must not take the gapless fast
    path (which would walk off the text); it clips via the DP traceback
    instead (regression: fast-path clamp in emit_chosen)."""
    haps = small_x.haps
    t0, t1 = haps.hap_text_range(0)
    # last 140 real bases + 10 bases that run off the end of the haplotype
    codes = np.concatenate([
        haps.text[t1 - 140 : t1],
        (haps.text[t0 : t0 + 10] + 1) % 4,    # junk tail
    ])
    reads = [Read("overhang", dna.decode(codes), None)]
    (aln,) = small_x.map_batch(reads)        # must not raise
    assert aln.path is not None
    tos = sum(e.to_length for mp in aln.path.mappings for e in mp.edits)
    assert tos == 150
    # graph positions in the path must all be in range
    g = small_x.graph
    for mp in aln.path.mappings:
        nlen = len(g.node_seq(mp.position.node_id))
        assert 0 <= mp.position.offset < nlen
    # encoded emission path handles it identically (no out-of-bounds read)
    sb = small_x.score_reads(reads)
    recs = small_x.emit_batch_encoded(sb)
    if recs is not None:
        assert len(recs) == 1 and len(bytes(recs[0])) > 0


def test_graph_fallback_recombinant_read():
    """A read spelling an allele combination present on NO indexed
    haplotype (recombinant across two big indel variants) cannot align
    well to any haplotype text window; the graph-space POA fallback must
    place it correctly (reference: dozeu/GSSW over extracted graph,
    src/minimizer_mapper.cpp:3319-3424)."""
    from vg_tpu.graph.arraygraph import SENSE_HAPLOTYPE, GraphBuilder
    from vg_tpu.index.haplotypes import haplotypes_from_paths
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    rng = np.random.default_rng(42)
    seg = lambda n: dna.decode(rng.integers(0, 4, n).astype(np.uint8))
    A1 = seg(80)       # anchor
    INS = seg(30)      # site 1: 30bp insertion allele
    MID = seg(60)      # middle anchor
    DEL = seg(30)      # site 2: 30bp segment deleted on alt
    A2 = seg(80)

    b = GraphBuilder()
    n_a1 = b.add_node(A1)
    n_ins = b.add_node(INS)
    n_mid = b.add_node(MID)
    n_del = b.add_node(DEL)
    n_a2 = b.add_node(A2)
    b.add_edge(n_a1, n_ins)
    b.add_edge(n_a1, n_mid)     # site 1 ref: skip INS
    b.add_edge(n_ins, n_mid)
    b.add_edge(n_mid, n_del)    # site 2 ref: through DEL
    b.add_edge(n_mid, n_a2)     # site 2 alt: skip DEL
    b.add_edge(n_del, n_a2)
    # indexed haplotypes: (INS, DEL-present) and (no-INS, DEL-absent)
    b.add_path("ref", [(n_a1, False), (n_mid, False), (n_del, False),
                       (n_a2, False)])
    b.add_path("hapA", [(n_a1, False), (n_ins, False), (n_mid, False),
                        (n_del, False), (n_a2, False)],
               sense=SENSE_HAPLOTYPE)
    g = b.freeze()
    haps = haplotypes_from_paths(g)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64))

    # the sample's haplotype: INS present AND DEL deleted — on no index
    # haplotype. Read spans both sites.
    sample = A1 + INS + MID + A2
    read_seq = sample[40 : 40 + 150]
    (aln,) = m.map_batch([Read("recomb", read_seq, None)])
    assert aln.path is not None and aln.path.mappings, "read unmapped"
    # a correct placement includes both the INS node and skips DEL
    ids = [mp.position.node_id for mp in aln.path.mappings]
    assert g.node_id[g.idx(n_ins)] in ids or n_ins in ids, ids
    assert n_del not in ids, ids
    # near-perfect score: both breakpoints crossed without penalty
    assert aln.score >= 150 - 10, aln.score
    tos = sum(e.to_length for mp in aln.path.mappings for e in mp.edits)
    assert tos == 150


def test_softclip_does_not_loop(small_x, ref_test_dir):
    """50_vg_giraffe.t: a read with a 48bp foreign prefix ahead of real
    graph sequence must not emit a path that revisits its first node
    (a softclip-looping artifact vg regression-tests against)."""
    from vg_tpu.io.fastq import Read

    with open(ref_test_dir / "small" / "x.fa") as f:
        f.readline()
        contig = f.readline().strip()
    junk = "GATTACATTAGGAGATAGCCATACGACGTAGCATCTAGCTCAGCCACA"
    read = Read("loopy", junk + contig, "")
    mapper = small_x
    aln = mapper.map_batch([read])[0]
    assert aln.path is not None and len(aln.path.mappings) >= 2
    m0 = aln.path.mappings[0].position.node_id
    m1 = aln.path.mappings[1].position.node_id
    assert m0 != m1, "softclipped read loops on its first node"
    # read bases fully accounted (softclip included)
    tl = sum(e.to_length for mp in aln.path.mappings for e in mp.edits)
    assert tl == len(read.sequence)


def test_encoded_indel_winner_parity(small_x):
    """Indel/overhang winners batched through native emit_runs_gam must
    be byte-identical to the object path (text_alignment_to_path +
    annotate_refpos + Alignment.encode). Covers: in-band del/ins,
    wide-band 30bp del, reverse strand, soft-clipped overhang, plus a
    clean gapless read riding the fast path in the same batch."""
    from vg_tpu.native import lib as native_lib

    if native_lib() is None:
        pytest.skip("native library unavailable")
    haps = small_x.haps
    t0h, t1h = haps.hap_text_range(0)
    s = t0h + 300
    txt = haps.text
    mk = lambda name, codes: Read(name, dna.decode(codes), None)
    reads = [
        # clean gapless (fast native path)
        mk("clean", txt[s : s + 120]),
        # 4bp deletion inside the band
        mk("del4", np.concatenate([txt[s : s + 60], txt[s + 64 : s + 124]])),
        # 4bp insertion inside the band
        mk("ins4", np.concatenate(
            [txt[s : s + 60], (txt[s : s + 4] + 1) % 4, txt[s + 60 : s + 120]])),
        # 30bp deletion -> wide-band retry
        mk("del30", np.concatenate([txt[s : s + 60], txt[s + 90 : s + 150]])),
        # reverse strand with a 4bp deletion
        Read("rcdel4", dna.decode(dna.revcomp_codes(
            np.concatenate([txt[s : s + 60], txt[s + 64 : s + 124]]))), None),
        # overhang off the haplotype end (sentinel-masked window)
        mk("overhang", np.concatenate(
            [txt[t1h - 140 : t1h], (txt[t0h : t0h + 10] + 1) % 4])),
    ]
    sb = small_x.score_reads(reads)
    objs = small_x.emit_batch(sb)
    recs = small_x.emit_batch_encoded(sb)
    assert recs is not None
    assert len(recs) == len(objs)
    for aln, rec, rd in zip(objs, recs, reads):
        assert bytes(rec) == aln.encode(), rd.name
    # sanity: the indel reads really exercised the slow path
    assert any("D" in "".join(
        ("D" if e.from_length and not e.to_length else "")
        for mp in a.path.mappings for e in mp.edits)
        for a in objs if a.path), "no deletion winner in batch"


def test_encoded_mapq_cap_parity(small_x, ref_test_dir):
    """Quality-carrying reads must get the explored-minimizer MAPQ cap on
    the encoded production path too (regression: _emit_batch_encoded_inner
    skipped apply_mapq_caps; golden read capped 60 -> 54)."""
    from vg_tpu.native import lib as native_lib

    if native_lib() is None:
        pytest.skip("native library unavailable")
    reads = list(iter_fastq(
        str(ref_test_dir / "reads" / "small.middle.ref.fq")))
    (aln,) = small_x.map_batch(reads)
    sb = small_x.score_reads(reads)
    recs = small_x.emit_batch_encoded(sb)
    assert recs is not None
    assert bytes(recs[0]) == aln.encode()
