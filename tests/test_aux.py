"""Auxiliary subsystem tests: distance oracle, funnel provenance,
watchdog, crash context, snarls CLI, graph-distance gamcompare."""
import json
import time

import numpy as np
import pytest

from vg_tpu.cli.main import main
from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.graph.arraygraph import GraphBuilder
from vg_tpu.graph.distance import min_distance, positions_within
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.vcf import read_vcf
from vg_tpu.utils.funnel import Funnel
from vg_tpu.utils.runtime import (Logger, Watchdog, crash_unless,
                                  set_crash_context)


def _bubble():
    b = GraphBuilder()
    n1 = b.add_node("ACGT")     # 4
    n2 = b.add_node("C")
    n3 = b.add_node("GGG")
    n4 = b.add_node("TTTT")
    b.add_edge(n1, n2)
    b.add_edge(n1, n3)
    b.add_edge(n2, n4)
    b.add_edge(n3, n4)
    return b.freeze(), n1, n2, n3, n4


def test_min_distance_same_node():
    g, n1, *_ = _bubble()
    assert min_distance(g, (n1, 1, False), (n1, 3, False)) == 2
    assert min_distance(g, (n1, 3, False), (n1, 1, False)) is None


def test_min_distance_across_bubble():
    g, n1, n2, n3, n4 = _bubble()
    # from n1 offset 2: 2 bases to end of n1, then short branch C (1bp)
    assert min_distance(g, (n1, 2, False), (n4, 0, False)) == 3
    assert min_distance(g, (n1, 2, False), (n4, 2, False)) == 5
    # via the 3bp branch when targeting it directly
    assert min_distance(g, (n1, 2, False), (n3, 1, False)) == 3
    # reverse orientations: 3 left on n4' + 1bp branch + offset 2 on n1'
    assert min_distance(g, (n4, 1, True), (n1, 2, True)) == 6
    # unreachable beyond limit
    assert min_distance(g, (n1, 0, False), (n4, 3, False), limit=3) is None


def test_positions_within():
    g, n1, n2, n3, n4 = _bubble()
    got = {(nid, rev): d for nid, rev, d in
           positions_within(g, (n1, 2, False), 10)}
    assert got[(n2, False)] == 2
    assert got[(n3, False)] == 2
    assert got[(n4, False)] == 3    # via the 1bp branch


def test_funnel_and_provenance(ref_test_dir):
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fastq import iter_fastq
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    m = GiraffeMapper(haps, MinimizerIndex.build(haps),
                      GiraffeParams(track_provenance=True))
    reads = list(iter_fastq(str(ref_test_dir / "reads" / "small.middle.ref.fq")))
    (aln,) = m.map_batch(reads)
    # 50_vg_giraffe.t:47 analog: time_used annotation exists
    assert aln.time_used > 0
    assert any(k.startswith("stage_") for k in aln.annotation)
    rep = m.funnel.report()
    assert "seed" in rep and "winner_emit" in rep


def test_watchdog_warns():
    logs = []

    class L(Logger):
        def warn(self, msg):
            logs.append(msg)

    wd = Watchdog(timeout_s=0.2, logger=L()).start()
    tid = wd.check_in("slow batch")
    time.sleep(0.6)
    wd.check_out(tid)
    wd.stop()
    assert wd.warnings >= 1
    assert "slow batch" in logs[0]


def test_crash_context():
    set_crash_context("read xyz")
    with pytest.raises(AssertionError, match="read xyz"):
        crash_unless(False, "score sanity")
    set_crash_context(None)
    crash_unless(True)


def test_snarls_cli(tmp_path, capsys, ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, _ = Constructor(ConstructorParams(max_node_size=32)).construct_graph(ref, vcf)
    from vg_tpu.io.native import save_graph

    gp = tmp_path / "x.npz"
    save_graph(str(gp), g)
    assert main(["snarls", "-x", str(gp), "-T"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert len(lines) >= 55
    assert all("start" in d and "end" in d for d in lines)
    assert any(len(d["traversals"]) >= 2 for d in lines)


def test_gamcompare_graph_distance(ref_test_dir, tmp_path, capsys):
    from vg_tpu.io.gam import read_gam
    from vg_tpu.map.gamcompare import compare_graph_distance

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    truth = list(read_gam(str(ref_test_dir / "small" /
                              "x-s1337-n100-e0.01-i0.005.gam")))
    stats = compare_graph_distance(g, truth, truth, range_bp=50)
    assert stats["total"] == 100
    assert stats["accuracy"] == 1.0      # identical alignments are correct


def test_native_kernels_parity():
    """Native C++ kernels agree exactly with the numpy implementations."""
    from vg_tpu.native import lib, native_banded_traceback, native_extract_minimizers

    if lib() is None:
        pytest.skip("no native toolchain")
    from vg_tpu.index.minimizer import _rolling_kmers, wang_hash_64
    from vg_tpu.ops.align import SENTINEL, Scoring
    from vg_tpu.ops.traceback import _banded_traceback_py

    rng = np.random.default_rng(1)
    # minimizers (python reference path computed inline)
    for _ in range(8):
        n = int(rng.integers(60, 1500))
        codes = rng.integers(0, 4, n).astype(np.uint8)
        codes[rng.integers(0, n, 5)] = 4
        o2, k2, r2 = native_extract_minimizers(codes, 29, 11)
        fwd, rev, valid = _rolling_kmers(codes, 29)
        canon = rev < fwd
        keys = np.where(canon, rev, fwd)
        h = np.where(valid, wang_hash_64(keys), np.uint64(~np.uint64(0)))
        m = len(h)
        nw = m - 11 + 1
        mins = h[:nw].copy()
        for j in range(1, 11):
            np.minimum(mins, h[j : j + nw], out=mins)
        chosen = np.zeros(m, bool)
        for j in range(11):
            chosen[j : j + nw] |= h[j : j + nw] == mins
        chosen &= valid
        offs = np.nonzero(chosen)[0]
        assert np.array_equal(o2, offs)
        assert np.array_equal(k2, keys[offs])
    # DP
    sc = Scoring()
    for _ in range(10):
        text = rng.integers(0, 4, 1000).astype(np.uint8)
        Lr, B = int(rng.integers(30, 120)), int(rng.integers(6, 20))
        s = int(rng.integers(0, 800))
        read = text[s : s + Lr].copy()
        for _ in range(int(rng.integers(0, 5))):
            q = int(rng.integers(0, Lr))
            read[q] = (read[q] + 1) % 4
        pos = s - B + np.arange(Lr + 2 * B)
        ok = (pos >= 0) & (pos < len(text))
        window = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                          SENTINEL).astype(np.uint8)
        a = _banded_traceback_py(read, window, B, sc)
        b = native_banded_traceback(read, window, B, sc)
        assert (a is None) == (b is None or b is False)
        if a and b:
            assert a.score == b.score and a.matches == b.matches


def test_ngs_error_model(ref_test_dir, tmp_path):
    from vg_tpu.sim.simulator import NGSErrorModel

    model = NGSErrorModel.train(str(ref_test_dir / "small" / "x.fa_1.fastq"))
    assert model.read_length == 100
    assert model.per_cycle_err is not None
    assert 0 <= model.per_cycle_err.mean() < 0.5
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    mutated, qual = model.mutate(codes, rng)
    assert len(qual) == 100
    assert len(mutated) == 100


def test_haplotype_sampling(ref_test_dir):
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.sampling import sample_haplotypes, score_haplotypes, read_minimizer_set
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=32)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    # reads drawn from haplotype 1 only
    rng = np.random.default_rng(4)
    t0, t1 = haps.hap_text_range(1)
    reads = []
    for i in range(80):
        s = int(rng.integers(t0, t1 - 100))
        reads.append(Read(f"r{i}", dna.decode(haps.text[s : s + 100]), None))
    keys = read_minimizer_set(reads)
    scores = score_haplotypes(haps, keys)
    assert scores[1] == scores.max()
    sampled = sample_haplotypes(haps, reads, num_haplotypes=1)
    names = [m.name for m in sampled.metas]
    assert haps.metas[1].name in names
    assert sampled.count <= 2      # chosen + ref


def test_index_registry_plan(tmp_path, ref_test_dir):
    from vg_tpu.index.registry import IndexRegistry

    reg = IndexRegistry(str(tmp_path / "x"))
    reg.provide("reference", str(ref_test_dir / "small" / "x.fa"))
    reg.provide("vcf", str(ref_test_dir / "small" / "x.vcf.gz"))
    plan = reg.plan(IndexRegistry.giraffe_targets())
    assert [r.output for r in plan] == ["graph", "haplotypes", "minimizer"]
    done = reg.make(IndexRegistry.giraffe_targets())
    assert len(done) == 3
    assert reg.available("minimizer")
    # resupplying intermediates skips recipes (resumability contract)
    reg2 = IndexRegistry(str(tmp_path / "x"))
    reg2.provide("reference", str(ref_test_dir / "small" / "x.fa"))
    reg2.provide("vcf", str(ref_test_dir / "small" / "x.vcf.gz"))
    assert reg2.plan(IndexRegistry.giraffe_targets()) == []


def test_benchmark_harness():
    from vg_tpu.utils.benchmark import run_benchmark

    r = run_benchmark("noop", lambda: None, iterations=50)
    assert r.iterations == 50
    assert r.normalized_score > 0
    assert "noop" in r.line()


def test_haplotype_recombination(ref_test_dir):
    """Recombinator role: reads from a mosaic (hap1 first half, hap2
    second half) yield a stitched haplotype that is a valid graph walk
    and better-supported than either source haplotype."""
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.sampling import (read_minimizer_set,
                                       recombine_haplotypes,
                                       score_haplotypes)
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(
        ConstructorParams(max_node_size=32)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    assert haps.count >= 2

    # mosaic read set: left half of hap 1, right half of hap 2
    rng = np.random.default_rng(11)
    reads = []
    for h, lo_frac, hi_frac in ((1, 0.0, 0.5), (2, 0.5, 1.0)):
        t0, t1 = haps.hap_text_range(h)
        span = t1 - t0
        lo = t0 + int(span * lo_frac)
        hi = t0 + int(span * hi_frac)
        for i in range(60):
            s = int(rng.integers(lo, max(hi - 100, lo + 1)))
            reads.append(Read(f"m{h}_{i}",
                              dna.decode(haps.text[s : s + 100]), None))

    rec = recombine_haplotypes(haps, reads, num_haplotypes=2,
                               subchain_len=150)
    assert rec.count >= 1
    # every recombined walk is a real walk: consecutive edges exist
    for h in range(rec.count):
        s0, s1 = int(rec.steps_start[h]), int(rec.steps_start[h + 1])
        wk = rec.steps[s0:s1]
        for a, b in zip(wk[:-1], wk[1:]):
            assert len(g.follow(int(a))) == 0 or \
                int(b) in {int(x) for x in g.follow(int(a))}

    # the top mosaic beats both sources on read support
    keys = read_minimizer_set(reads)
    src = score_haplotypes(haps, keys)
    got = score_haplotypes(rec, keys)
    best_rec = max(got[h] for h in range(rec.count)
                   if rec.metas[h].sample == "recomb")
    assert best_rec >= max(src[1], src[2]) - 1e-9


def test_funnel_filter_provenance(ref_test_dir):
    """--track-provenance records per-filter pass/fail counts (the
    giraffe-facts filter-loss table role, reference src/funnel.hpp:27-70,
    scripts/giraffe-facts.py)."""
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fasta import read_fasta
    from vg_tpu.io.fastq import iter_fastq_paired
    from vg_tpu.io.vcf import read_vcf
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(
        ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64,
                                               track_provenance=True))
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:32]
    m.map_batch([a for a, _ in pairs])
    f = m.funnel.filters
    assert "hard-hit-cap" in f and f["hard-hit-cap"].n_in > 0
    assert "soft-hit-cap" in f
    assert "top-C-candidates" in f
    assert "gapless-fast-path" in f
    # the report names each filter with its loss
    rep = m.funnel.filter_report()
    assert "hard-hit-cap" in rep and "loss%" in rep
    # per-read annotations still present
    alns = m.map_batch([a for a, _ in pairs])
    assert any("stage_seed_time" in a.annotation for a in alns)


def test_translate_block_substitution(ref_test_dir):
    """translate_path must preserve block-substitution edits (from != to,
    both > 0) across node splits instead of degrading them to deletions."""
    import numpy as np

    from vg_tpu.graph.arraygraph import GraphBuilder
    from vg_tpu.graph.augment import Translation, translate_path
    from vg_tpu.io.gam import Edit, Mapping, Path, Position

    # old node 1 (8bp) split into 1 (3bp) + 100 (5bp)
    b = GraphBuilder()
    b.add_node("ACG", node_id=1)
    b.add_node("TACGT", node_id=100)
    b.add_edge(1, 100)
    g2 = b.freeze()
    trans = Translation(pieces={1: [(1, 0), (100, 3)]})
    p = Path(mappings=[Mapping(position=Position(node_id=1, offset=1))])
    # block substitution: 4 ref bases -> 2 read bases, spans the split
    p.mappings[0].edits.append(Edit(from_length=4, to_length=2,
                                    sequence="TT"))
    out = translate_path(trans, g2, p)
    froms = sum(e.from_length for mp in out.mappings for e in mp.edits)
    tos = sum(e.to_length for mp in out.mappings for e in mp.edits)
    seqs = "".join(e.sequence for mp in out.mappings for e in mp.edits)
    assert froms == 4 and tos == 2 and seqs == "TT"
