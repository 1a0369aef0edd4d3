"""Paired-end mapping tests: fragment model, proper pairing, rescue."""
import numpy as np
import pytest

from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import Read, iter_fastq_paired
from vg_tpu.io.vcf import read_vcf
from vg_tpu.map.giraffe import GiraffeMapper
from vg_tpu.map.paired import FragmentLengthDistribution, PairedGiraffeMapper
from vg_tpu.utils import dna


@pytest.fixture(scope="module")
def paired_mapper(ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    return PairedGiraffeMapper(GiraffeMapper(haps, idx))


def test_fragment_distribution_robust():
    fd = FragmentLengthDistribution(maximum_sample_size=100)
    rng = np.random.default_rng(0)
    for x in rng.normal(400, 50, 96):
        fd.add(x)
    for x in (2, 3, 8000, 9000):  # tail outliers trimmed symmetrically
        fd.add(x)
    assert fd.finalized
    assert abs(fd.mean - 400) < 25
    assert abs(fd.stdev - 50) < 20


def test_paired_simulated(paired_mapper, ref_test_dir):
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:300]
    out = paired_mapper.map_pairs(pairs)
    out += paired_mapper.finish()        # EOF flush of warmup buffer
    assert len(out) == len(pairs)
    n_proper = sum(1 for a, b in out if a.annotation.get("proper_pair"))
    aligned = sum((a.path is not None) + (b.path is not None) for a, b in out)
    assert aligned == 2 * len(out)
    assert n_proper >= 0.95 * len(out)
    assert 500 < paired_mapper.fragdist.mean < 1500
    # pair linkage present
    a, b = out[0]
    assert a.fragment_next.name == b.name
    assert b.fragment_prev.name == a.name


def test_rescue_recovers_seedless_mate(paired_mapper):
    """A mate whose every minimizer is broken by errors must be rescued via
    the fragment window around its partner."""
    # fresh fragment model (the shared fixture already finalized on ~900bp
    # fragments; this test simulates 400bp fragments)
    paired_mapper = PairedGiraffeMapper(paired_mapper.mapper)
    haps = paired_mapper.mapper.haps
    rng = np.random.default_rng(3)
    t0, t1 = haps.hap_text_range(0)
    L = 100
    frag = 400
    pairs = []
    for i in range(50):
        s = int(rng.integers(t0, t1 - frag))
        c1 = haps.text[s : s + L].copy()
        c2 = haps.text[s + frag - L : s + frag].copy()
        # wreck every k-window of mate 2 with an error every 15bp
        for p in range(7, L, 15):
            c2[p] = (c2[p] + 1 + rng.integers(0, 3)) % 4
        pairs.append((Read(f"p{i}/1", dna.decode(c1), None),
                      Read(f"p{i}/2", dna.decode(dna.revcomp_codes(c2)), None)))
    # warm the fragment model with clean pairs
    clean = []
    for i in range(300):
        s = int(rng.integers(t0, t1 - frag))
        c1 = haps.text[s : s + L]
        c2 = haps.text[s + frag - L : s + frag]
        clean.append((Read(f"c{i}/1", dna.decode(c1), None),
                      Read(f"c{i}/2", dna.decode(dna.revcomp_codes(c2)), None)))
    paired_mapper.map_pairs(clean)
    paired_mapper.finish()               # force-finalize at "EOF"
    assert paired_mapper.fragdist.finalized

    out = paired_mapper.map_pairs(pairs)
    rescued = sum(1 for a, b in out if b.path is not None and b.path.mappings)
    assert rescued >= 45, f"only {rescued}/50 mates rescued"
    proper = sum(1 for a, b in out if a.annotation.get("proper_pair"))
    assert proper >= 45


def test_fragment_model_streaming_matches_batch(paired_mapper, ref_test_dir):
    """Streaming small batches must accumulate fragment samples across
    batches and produce the same fragment model as one big batch
    (reference contract: warmup until 1000 samples or EOF,
    src/minimizer_mapper.cpp:72, giraffe_main.cpp:2369-2379)."""
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:120]

    big = PairedGiraffeMapper(paired_mapper.mapper)
    out_big = big.map_pairs(pairs)
    out_big += big.finish()

    small = PairedGiraffeMapper(paired_mapper.mapper)
    out_small = []
    for i in range(0, len(pairs), 17):    # awkward batch size on purpose
        out_small += small.map_pairs(pairs[i : i + 17])
    out_small += small.finish()

    assert small.fragdist.finalized and big.fragdist.finalized
    assert abs(small.fragdist.mean - big.fragdist.mean) < 1e-6
    assert abs(small.fragdist.stdev - big.fragdist.stdev) < 1e-6
    assert len(out_small) == len(out_big) == len(pairs)
    # same reads end up properly paired either way
    prop_b = {a.name for a, b in out_big if a.annotation.get("proper_pair")}
    prop_s = {a.name for a, b in out_small if a.annotation.get("proper_pair")}
    assert prop_b == prop_s


def test_folded_dispatch_matches_separate(paired_mapper, ref_test_dir):
    """The folded 2R-read device dispatch (score_pairs) must score both
    mates identically to two separate dispatches."""
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:20]
    m = paired_mapper.mapper
    sb1, sb2 = m.score_reads(
        [a for a, _ in pairs] + [b for _, b in pairs]).split(len(pairs))
    ref1 = m.score_reads([a for a, _ in pairs])
    ref2 = m.score_reads([b for _, b in pairs])
    R = len(pairs)
    np.testing.assert_array_equal(sb1.scores[:R], ref1.scores[:R])
    np.testing.assert_array_equal(sb2.scores[:R], ref2.scores[:R])
    np.testing.assert_array_equal(sb1.cand_start, ref1.cand_start[:R])
    np.testing.assert_array_equal(sb2.cand_rev, ref2.cand_rev[:R])
    assert [r.name for r in sb2.reads] == [b.name for _, b in pairs]


def test_device_pair_selection_matches_host(paired_mapper, ref_test_dir):
    """score_pairs_device's on-device pair selection must agree with the
    host _pair_select on the same candidates (same winners, proper
    flags, fragment lengths; MAPQs within rounding)."""
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:64]
    pm = PairedGiraffeMapper(paired_mapper.mapper)
    # finalize the fragment model first (device path requires it)
    pm.map_pairs(pairs)
    pm.finish()
    assert pm.fragdist.finalized

    sb1d, sb2d, sel = pm.score_pairs_device(pairs)
    j1d, j2d, mq1d, mq2d, upd, frd = pm._force_device_sel(sel, len(pairs))

    sb1h, sb2h = pm.score_pairs(pairs)
    np.testing.assert_array_equal(sb1d.scores, sb1h.scores)
    np.testing.assert_array_equal(sb2d.scores, sb2h.scores)
    rs = pm._pair_select(sb1h, sb2h)
    j1h, j2h, mq1h, mq2h, any1, any2, uph, frh = rs
    np.testing.assert_array_equal(upd, uph)
    np.testing.assert_array_equal(j1d[uph], j1h[uph])
    np.testing.assert_array_equal(j2d[uph], j2h[uph])
    np.testing.assert_allclose(frd[uph], frh[uph], atol=0.5)
    assert (np.abs(mq1d.astype(int) - mq1h.astype(int)) <= 1).mean() > 0.95
    assert (np.abs(mq2d.astype(int) - mq2h.astype(int)) <= 1).mean() > 0.95


def test_pipeline_device_selection_end_to_end(paired_mapper, ref_test_dir):
    """The 3-stage pipeline with device pair selection produces the same
    records as the synchronous host path."""
    from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:120]
    pm1 = PairedGiraffeMapper(paired_mapper.mapper)
    pm1.map_pairs(pairs)        # warmup/finalize
    pm1.finish()
    recs_sync = pm1.map_pairs_encoded(pairs)

    pm2 = PairedGiraffeMapper(paired_mapper.mapper)
    pm2.map_pairs(pairs)
    pm2.finish()
    out = []
    for recs in map_pairs_encoded_mt(pm2, iter([pairs])):
        out.extend(recs)
    assert len(out) == len(recs_sync)
    same = sum(1 for a, b in zip(out, recs_sync) if bytes(a) == bytes(b))
    assert same >= 0.98 * len(out), f"{same}/{len(out)} records differ"


def test_pipeline_multi_seeder_order_and_parity(paired_mapper,
                                                ref_test_dir):
    """Multiple seeder threads must not change record bytes or order:
    batches are sequence-tagged at the source and the rescuer restores
    input order before dispatching rescue DP."""
    from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:120]
    batches = [pairs[i : i + 24] for i in range(0, len(pairs), 24)]

    def run(seeders):
        pm = PairedGiraffeMapper(paired_mapper.mapper)
        pm.map_pairs(pairs)      # warmup/finalize the fragment model
        pm.finish()
        out = []
        for recs in map_pairs_encoded_mt(pm, iter(batches),
                                         seeders=seeders):
            out.extend(bytes(r) for r in recs)
        return out

    base = run(1)
    multi = run(3)
    assert multi == base


def test_native_pair_finalize_byte_parity(paired_mapper, ref_test_dir,
                                          monkeypatch):
    """The native scatter-gather pair finalizer (concat_spans) must
    produce byte-identical records to the per-record Python
    concatenation loop it replaces — including mate-name linkage fields
    and proper/improper annotation suffixes."""
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:120]
    pm = PairedGiraffeMapper(paired_mapper.mapper)
    pm.map_pairs(pairs)
    pm.finish()
    assert pm.fragdist.finalized

    fast = pm.map_pairs_encoded(pairs)
    assert fast is not None
    # force the fallback loop by disabling the native finalizer
    monkeypatch.setattr(pm, "_finalize_pairs_native",
                        lambda *a, **k: None)
    slow = pm.map_pairs_encoded(pairs)
    assert slow is not None
    assert [bytes(a) for a in fast] == [bytes(b) for b in slow]
    # sanity: the fast path really took the native route (memoryviews
    # into one shared buffer, not per-record bytes)
    assert isinstance(fast[0], memoryview)


def test_device_winner_bitmap_matches_host(paired_mapper, ref_test_dir):
    """The packed step's winner mismatch bitmaps must equal the host
    text-window computation AND actually enable the gapless fast path —
    a silent fast-path collapse (e.g. gathering packed text as raw
    bytes) is a 4x emit regression that byte-parity tests cannot see."""
    from vg_tpu.ops import align as align_ops

    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:64]
    pm = PairedGiraffeMapper(paired_mapper.mapper)
    pm.map_pairs(pairs)
    pm.finish()
    assert pm.fragdist.finalized
    m = pm.mapper

    sb1, sb2, sel = pm.score_pairs_device(pairs)
    j1, j2, *_ = pm._force_device_sel(sel, len(pairs))
    assert sb1.winner_mism is not None

    for sb, j in ((sb1, j1), (sb2, j2)):
        dev_j, mm_dev, bits = sb.winner_mism
        np.testing.assert_array_equal(np.asarray(dev_j), np.asarray(j))
        R = len(sb.reads)
        ar = np.arange(R)
        bj = np.asarray(j).astype(np.int64)
        text = m.haps.text
        L_arr = np.array([len(c) for c in sb.codes])
        RL = int(L_arr.max())
        B = m.params.band_radius
        diag = sb.cand_start[ar, bj].astype(np.int64) + B
        lo = sb.cand_lo[ar, bj]
        hi = sb.cand_hi[ar, bj]
        rev = sb.cand_rev[ar, bj]
        pos = diag[:, None] + np.arange(RL)
        ok = ((pos >= lo[:, None]) & (pos < hi[:, None]) & (pos >= 0)
              & (pos < len(text)))
        tw = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                      align_ops.SENTINEL).astype(np.uint8)
        orr = np.full((R, RL), 5, np.uint8)
        for i in range(R):
            c = sb.codes_rc[i] if rev[i] else sb.codes[i]
            orr[i, : len(c)] = c
        inr = np.arange(RL)[None, :] < L_arr[:, None]
        mism = ((tw != orr) | (orr >= 4)) & inr
        np.testing.assert_array_equal(np.asarray(mm_dev)[:R], mism.sum(1))
        payload = np.asarray(bits)
        if payload.dtype == np.uint8:
            # position-list wire format (reads <= 255bp)
            from vg_tpu.ops.xfer import pos8_to_mism_rows

            mmr = mism.sum(1)
            rows = np.nonzero(mmr <= 8)[0]
            rec = pos8_to_mism_rows(payload[rows], mmr[rows], RL)
            np.testing.assert_array_equal(rec.astype(bool), mism[rows])
            assert len(rows) == R or (mmr > 8).any()
        else:
            bw = np.ascontiguousarray(payload[:R]).view(np.uint32)
            unp = np.unpackbits(bw.view(np.uint8).reshape(R, -1), axis=1,
                                bitorder="little")[:, :RL]
            np.testing.assert_array_equal(unp.astype(bool), mism)
        # the bitmaps must actually light up the gapless fast path
        scores = sb.scores
        best_s = scores[ar, bj]
        p = m.params
        mm = mism.sum(1)
        gl = (L_arr - mm) * p.match - mm * p.mismatch \
            + 2 * p.full_length_bonus
        fast = (gl == best_s) & (diag >= lo) & (diag + L_arr <= hi)
        assert fast.mean() > 0.5, f"fast path collapsed: {fast.mean():.2f}"


def test_device_selection_asymmetric_mate_lengths(paired_mapper,
                                                  ref_test_dir):
    """Wire-format choices (int8 scores, position payloads, bitmap
    widths) must hold when the two mates' padded read widths differ —
    mate 2 here is long enough to force bitmap mode for both."""
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:48]
    # stretch mate 2 beyond 255bp so pos_mode/int8 must switch off
    long_pairs = []
    for a, b in pairs:
        seq = (b.sequence * 3)[:280]
        long_pairs.append((a, Read(b.name, seq, "")))
    pm = PairedGiraffeMapper(paired_mapper.mapper)
    pm.map_pairs(long_pairs)
    pm.finish()
    assert pm.fragdist.finalized
    sb1d, sb2d, sel = pm.score_pairs_device(long_pairs)
    j1, j2, mq1, mq2, up, fr = pm._force_device_sel(sel, len(long_pairs))
    # decoded winner scores must equal a direct host DP over the same
    # windows (validates the int16 score path on >191bp reads; note
    # score_pairs seeds mates folded/ragged so its candidate TABLES can
    # differ — compare against the DP, not another seeding pass)
    m0 = paired_mapper.mapper
    from vg_tpu.ops.traceback import banded_traceback as _bt  # noqa: F401
    for sb, jj in ((sb1d, j1), (sb2d, j2)):
        got = sb.scores[np.arange(len(sb.reads)), np.asarray(jj)]
        rescored = m0.rescore_candidates(
            sb, sb.cand_start, sb.cand_lo, sb.cand_hi, sb.cand_rev,
            sb.cand_valid, force=True)
        want = np.asarray(rescored)[np.arange(len(sb.reads)),
                                    np.asarray(jj)]
        np.testing.assert_array_equal(got, want)
    # winner bitmaps decode against host recomputation for mate 2
    dev_j, mm_dev, payload = sb2d.winner_mism
    assert payload.dtype != np.uint8 or payload.shape[1] == 8
    m = paired_mapper.mapper
    R = len(sb2d.reads)
    bj = np.asarray(j2).astype(np.int64)
    text = m.haps.text
    L_arr = np.array([len(c) for c in sb2d.codes])
    RL = int(L_arr.max())
    B = m.params.band_radius
    ar = np.arange(R)
    diag = sb2d.cand_start[ar, bj].astype(np.int64) + B
    lo = sb2d.cand_lo[ar, bj]
    hi = sb2d.cand_hi[ar, bj]
    rev = sb2d.cand_rev[ar, bj]
    pos = diag[:, None] + np.arange(RL)
    ok = ((pos >= lo[:, None]) & (pos < hi[:, None]) & (pos >= 0)
          & (pos < len(text)))
    from vg_tpu.ops import align as align_ops

    tw = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                  align_ops.SENTINEL).astype(np.uint8)
    orr = np.full((R, RL), 5, np.uint8)
    for i in range(R):
        c = sb2d.codes_rc[i] if rev[i] else sb2d.codes[i]
        orr[i, : len(c)] = c
    inr = np.arange(RL)[None, :] < L_arr[:, None]
    mism = ((tw != orr) | (orr >= 4)) & inr
    np.testing.assert_array_equal(np.asarray(mm_dev)[:R], mism.sum(1))


@pytest.fixture(scope="module")
def small_index():
    import bench as B

    rng = np.random.default_rng(9)
    g, results, vcf = B.make_pangenome(rng, ref_len=120_000)
    haps = thread_haplotypes(g, results, vcf)
    return haps, MinimizerIndex.build(haps)


def test_wire2_n_exceptions(small_index):
    """The 2-bit read wire cannot carry N (4) codes: a few in-read Ns
    ride the fixed exception sidecar (scattered back to 4 on device);
    a batch with more than EXC_CAP Ns drops the mapper to the 4-bit
    layout for its lifetime. Both must score identically to the host
    path."""
    import numpy as np

    from vg_tpu.io.fastq import Read
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.ops.xfer import EXC_CAP
    from vg_tpu.utils import dna

    haps, idx = small_index
    rng = np.random.default_rng(8)

    def make_pairs(n, n_count):
        out = []
        for i in range(n):
            s = int(rng.integers(0, haps.total_len - 500))
            c1 = haps.text[s : s + 150].copy()
            c2 = dna.revcomp_codes(haps.text[s + 300 : s + 450].copy())
            s1 = list(dna.decode(c1))
            for q in rng.integers(10, 140, n_count):
                s1[int(q)] = "N"
            out.append((Read(f"n{i}/1", "".join(s1), None),
                        Read(f"n{i}/2", dna.decode(c2), None)))
        return out

    def run(pairs):
        m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=len(pairs)))
        pm = PairedGiraffeMapper(m)
        for _ in range(64):
            pm.fragdist.add(375.0)
        pm.fragdist.finalize()
        sb1, sb2, sel = pm.score_pairs_device(pairs)
        pm._force_device_sel(sel, len(pairs))
        return pm, np.array(sb1.scores), np.array(sb2.scores)

    # a) few Ns -> exception sidecar (2-bit layout)
    pairs = make_pairs(32, 1)
    pm, s1, s2 = run(pairs)
    assert not getattr(pm, "_wire4", False)
    # host oracle scores for the same candidates
    m2 = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=32))
    hb1, hb2 = PairedGiraffeMapper(m2).score_pairs(pairs)
    np.testing.assert_array_equal(s1, np.array(hb1.scores))
    np.testing.assert_array_equal(s2, np.array(hb2.scores))

    # b) many Ns -> sticky 4-bit fallback, same scores
    pairs = make_pairs(32, EXC_CAP // 8 + 4)   # 32 * 12 Ns >> EXC_CAP
    pm, s1, s2 = run(pairs)
    assert getattr(pm, "_wire4", False)
    m3 = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=32))
    hc1, hc2 = PairedGiraffeMapper(m3).score_pairs(pairs)
    np.testing.assert_array_equal(s1, np.array(hc1.scores))
    np.testing.assert_array_equal(s2, np.array(hc2.scores))


def test_slow_row_batch_traceback_parity(bench_like_fixture=None):
    """The batched native slow-row traceback (one OpenMP call for
    indel/overhang winners) must yield byte-identical GAM records to
    the per-row _traceback_ta path it replaces."""
    import numpy as np

    import bench as B
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper

    rng = np.random.default_rng(77)
    g, results, vcf = B.make_pangenome(rng, ref_len=120_000)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    bs = 256
    sts = B.make_sample_texts(rng, haps, novel_snp=0.001,
                              novel_indel=0.0005)   # dense indels
    pairs = B.simulate_pairs(rng, haps, 3 * bs, sample_texts=sts)

    def run(disable_batch):
        m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
        pm = PairedGiraffeMapper(m)
        if disable_batch:
            m._traceback_slow_batch = lambda *a, **k: {}
        recs = []
        for k in range(3):
            chunk = pairs[k * bs : (k + 1) * bs]
            out = pm.map_pairs_encoded(chunk)
            if out is None:
                out = [a.encode() for a in pm.map_pairs_flat(chunk)]
            recs.extend(bytes(r) for r in out)
        recs.extend(bytes(r) for r in pm.finish_encoded())
        return recs

    a = run(False)
    b = run(True)
    assert len(a) == len(b) and len(a) > 0
    diff = sum(1 for x, y in zip(a, b) if x != y)
    assert diff == 0, f"{diff}/{len(a)} records differ"
