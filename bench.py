"""Benchmark: giraffe-style 150bp paired-end mapping throughput
(reads/s/chip — the reference headline workload).

Baseline: reference vg giraffe short-read paired speed — 3520.61
reads/s/thread, ~56.3k reads/s at 16 threads (BASELINE.md,
scripts/giraffe-speed.sh). vs_baseline = our reads/s on one chip / 56330.

Workload: synthetic 1 Mbp pangenome (reference + 2 diploid samples at 0.1%
SNP + 0.01% indel rate), minimizer index, 150bp read pairs (450+-50bp
fragments) at 1% error, mapped in fixed-size batches (seed -> cluster ->
banded-DP on device -> pairing/rescue -> winner/mapq -> GAM records).

BENCH_MODE=single switches to the single-end pipeline.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_S = 56330.0


def _chip_holder_diagnostics():
    """List other live python processes (possible stale chip holders from
    earlier runs) — diagnostic only, never kills anything."""
    me = os.getpid()
    out = []
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().replace(b"\0", b" ").decode()[:160]
            except OSError:
                continue
            if "python" in cmd and ("bench" in cmd or "pytest" in cmd
                                    or "jax" in cmd or "vg_tpu" in cmd):
                out.append(f"  pid {pid}: {cmd}")
    except OSError:
        pass
    return out


def _probe_backend_subprocess(timeout_s):
    """First device contact in a THROWAWAY subprocess: backend init can
    hang (not just raise), and a hung init in-process poisons jax's
    backend lock for every later retry. A subprocess can be timed out
    and leaves the parent clean. Returns (ok, diag)."""
    import subprocess

    code = ("import jax, numpy as np; "
            "x = jax.device_put(np.arange(8, dtype=np.int32)); "
            "print('PROBE_OK', jax.devices(), np.asarray(x + 1)[0])")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        if r.returncode == 0 and "PROBE_OK" in r.stdout:
            return True, r.stdout.strip()[:200]
        return False, (r.stderr or r.stdout).strip()[-300:]
    except subprocess.TimeoutExpired:
        return False, f"probe hung > {timeout_s}s (killed)"
    except OSError as e:
        return False, f"probe spawn failed: {e}"


def init_backend(max_attempts=4):
    """First device contact, hardened (round-2 postmortem: the driver
    bench died with 'Unable to initialize backend axon: UNAVAILABLE'
    during its first device_put — a transient tunnel/init flake became
    the official round record). Probe in a subprocess (hang-safe) with
    retry/backoff; on success do the in-process init (tunnel now warm);
    after max_attempts fail over to CPU with a shrunken workload so ONE
    JSON line is always emitted. Returns (ok_on_tpu, note)."""
    import jax

    want_cpu = os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
    if want_cpu:
        # explicit CPU run (tests/dev): the axon sitecustomize re-pins
        # JAX_PLATFORMS=axon at interpreter start, so force through config
        jax.config.update("jax_platforms", "cpu")
        return True, None
    for attempt in range(max_attempts):
        timeout_s = 420 if attempt == 0 else 240   # first init compiles
        ok, diag = _probe_backend_subprocess(timeout_s)
        if ok:
            sys.stderr.write(f"[bench] backend probe ok: {diag}\n")
            try:
                jax.devices()
                np.asarray(jax.device_put(np.arange(4)) + 1)
                return True, None
            except Exception as e:  # probe ok but in-process flaked
                diag = f"in-process init failed after ok probe: {e}"
                try:
                    jax.extend.backend.clear_backends()
                except Exception:
                    pass
        sys.stderr.write(
            f"[bench] backend attempt {attempt + 1}/{max_attempts} "
            f"failed: {diag[:300]}\n")
        holders = _chip_holder_diagnostics()
        if holders:
            sys.stderr.write("[bench] other live python processes "
                             "(possible chip holders, NOT killed):\n"
                             + "\n".join(holders) + "\n")
        if attempt < max_attempts - 1:
            delay = min(15 * (2 ** attempt), 90)
            sys.stderr.write(f"[bench] retrying in {delay}s\n")
            time.sleep(delay)
    # unrecoverable: CPU fallback — a slow honest number beats a crash
    sys.stderr.write(
        f"[bench] TPU backend unrecoverable after {max_attempts} attempts; "
        "falling back to CPU with a reduced workload\n")
    try:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass
        jax.devices()
        return False, "cpu-fallback: axon backend unavailable"
    except Exception as e:
        # truly dead: emit the JSON here and exit 0 so the driver records
        # a diagnosed datum instead of a stack trace
        print(json.dumps({
            "metric": "giraffe_sr_paired_reads_per_s_per_chip",
            "value": 0.0, "unit": "reads/s", "vs_baseline": 0.0,
            "error": f"backend init failed: {str(e)[:200]}"}))
        sys.exit(0)


def make_pangenome(rng, ref_len=1_000_000, snp_rate=0.001, indel_rate=0.0001):
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.io.vcf import VcfFile, VcfRecord
    from vg_tpu.utils import dna

    ref_codes = rng.integers(0, 4, size=ref_len).astype(np.uint8)
    ref_seq = dna.decode(ref_codes)
    n_var = int(ref_len * (snp_rate + indel_rate))
    pos = np.sort(rng.choice(np.arange(100, ref_len - 100), size=n_var,
                             replace=False))
    # drop variants closer than 2bp to keep clumps simple
    keep = np.concatenate([[True], np.diff(pos) > 40])
    pos = pos[keep]
    records = []
    bases = "ACGT"
    for p in pos:
        p = int(p)
        r = ref_seq[p]
        if rng.random() < snp_rate / (snp_rate + indel_rate):
            alt = bases[(bases.index(r) + 1 + int(rng.integers(0, 3))) % 4]
            ref_a, alt_a = r, alt
        else:
            n = int(rng.integers(1, 6))
            if rng.random() < 0.5:
                ins = "".join(bases[int(b)] for b in rng.integers(0, 4, n))
                ref_a, alt_a = r, r + ins
            else:
                ref_a, alt_a = ref_seq[p : p + 1 + n], r
        gts = [((int(rng.integers(0, 2)), int(rng.integers(0, 2))), True)
               for _ in range(2)]
        records.append(VcfRecord(
            chrom="ref", pos=p + 1, id=".", ref=ref_a, alts=[alt_a],
            qual=".", filter=".", info={}, genotypes=gts))
    vcf = VcfFile(samples=["s1", "s2"], records=records)
    g, results = Constructor(ConstructorParams(max_node_size=32)).construct_graph(
        {"ref": ref_seq}, vcf)
    return g, results, vcf


def simulate_reads(rng, haps, n_reads, read_len=150, err=0.01):
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    T = haps.total_len
    reads = []
    for i in range(n_reads):
        start = int(rng.integers(0, T - read_len))
        codes = haps.text[start : start + read_len].copy()
        nerr = rng.binomial(read_len, err)
        for _ in range(nerr):
            p = int(rng.integers(0, read_len))
            codes[p] = (codes[p] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.5:
            codes = dna.revcomp_codes(codes)
        reads.append(Read(f"r{i}", dna.decode(codes), None))
    return reads


def make_sample_texts(rng, haps, novel_snp=0.0005, novel_indel=0.00005):
    """Held-out diploid: two mutated copies of indexed haplotypes with
    NOVEL variation (SNPs + small indels) the index has never seen — so
    bench reads are not substrings of the indexed text (the round-1
    verdict's circularity critique)."""
    out = []
    for _ in range(2):
        t = haps.text.copy()
        n_snp = rng.binomial(len(t), novel_snp)
        ps = rng.integers(0, len(t), n_snp)
        t[ps] = (t[ps] + 1 + rng.integers(0, 3, n_snp)) % 4
        parts = []
        # sample-pos -> original-pos anchors for truth evaluation
        anchors_s = [0]
        anchors_o = [0]
        cur = 0
        built = 0
        for p in np.sort(rng.integers(100, len(t) - 100,
                                      rng.binomial(len(t), novel_indel))):
            p = int(p)
            if p <= cur:
                continue
            parts.append(t[cur:p])
            built += p - cur
            if rng.random() < 0.5:
                ins = rng.integers(0, 4, int(rng.integers(1, 6)))
                parts.append(ins.astype(np.uint8))
                built += len(ins)
                cur = p
            else:
                cur = p + int(rng.integers(1, 6))
            anchors_s.append(built)
            anchors_o.append(cur)
        parts.append(t[cur:])
        out.append((np.concatenate(parts),
                    np.array(anchors_s, np.int64),
                    np.array(anchors_o, np.int64)))
    return out


def simulate_pairs(rng, haps, n_pairs, read_len=150, err=0.01,
                   frag_mean=450, frag_sd=50, sample_texts=None):
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    if sample_texts is not None:
        texts = sample_texts
    else:
        texts = [(haps.text, np.zeros(1, np.int64), np.zeros(1, np.int64))]
    out = []
    truth = []   # original-text coordinate of read 1's start
    for i in range(n_pairs):
        ti = int(rng.integers(0, len(texts)))
        t, anc_s, anc_o = texts[ti]
        frag = max(int(rng.normal(frag_mean, frag_sd)), read_len + 10)
        s = int(rng.integers(0, len(t) - frag))
        c1 = t[s : s + read_len].copy()
        c2 = t[s + frag - read_len : s + frag].copy()
        for c in (c1, c2):
            nerr = rng.binomial(read_len, err)
            for _ in range(nerr):
                p = int(rng.integers(0, read_len))
                c[p] = (c[p] + 1 + rng.integers(0, 3)) % 4
        a = int(np.searchsorted(anc_s, s, side="right")) - 1
        truth.append(s - int(anc_s[a]) + int(anc_o[a]))
        out.append((Read(f"p{i}/1", dna.decode(c1), None),
                    Read(f"p{i}/2", dna.decode(dna.revcomp_codes(c2)), None)))
    simulate_pairs.last_truth = truth
    return out


def scale_fixture(cache_dir=None, ref_mbp=50.0, n_samples=10):
    """Build (or load from a disk cache) the chromosome-scale fixture:
    ref_mbp reference x (2*n_samples + 1) haplotypes — the default is a
    1.05 Gbp haplotype text, the workload class the reference's 56.3k
    baseline was measured on (whole-human HGSVC graph,
    scripts/giraffe-speed.sh:42-76). Deterministic (seed 7), so the
    cache is safe to reuse across runs."""
    import time as _t

    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io import native as _io_native

    cache_dir = cache_dir or os.environ.get(
        "SCALE_CACHE", "/tmp/vg_tpu_scale_cache")
    tag = f"{ref_mbp:g}m{n_samples}"
    gp = f"{cache_dir}/{tag}.vgz.npz"
    hp = f"{cache_dir}/{tag}.hpt.npz"
    mp = f"{cache_dir}/{tag}.min.npz"
    if os.path.exists(mp):
        t0 = _t.time()
        g = _io_native.load_graph(gp)
        haps = _io_native.load_haplotypes(hp, g)
        idx = _io_native.load_minimizer(mp)
        sys.stderr.write(f"[bench] scale fixture loaded from cache in "
                         f"{_t.time()-t0:.0f}s\n")
        return haps, idx
    rng = np.random.default_rng(7)
    t0 = _t.time()
    g, results, vcf = make_pangenome(
        rng, ref_len=int(ref_mbp * 1e6), snp_rate=0.001, indel_rate=0.0001)
    vcf.samples = [f"s{i}" for i in range(n_samples)]
    for rec in vcf.records:
        rec.genotypes = [
            ((int(rng.integers(0, 2)), int(rng.integers(0, 2))), True)
            for _ in range(n_samples)]
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        _io_native.save_graph(gp, g)
        _io_native.save_haplotypes(hp, haps)
        _io_native.save_minimizer(mp, idx)
    except OSError as e:  # cache is best-effort
        sys.stderr.write(f"[bench] scale cache write failed: {e}\n")
    sys.stderr.write(f"[bench] scale fixture built in {_t.time()-t0:.0f}s\n")
    return haps, idx


def _recombinant_reads(rng, haps, n, read_len=150, spacing=24):
    """Reads spelling DENSE-NOVEL variation: a novel SNP every ~spacing
    bases, so (with spacing < k=29) most minimizer windows are broken
    and seeding must fall through to the MEM suffix-array path, while
    exact stretches stay >= the 19bp MEM floor. Truth = text start."""
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    T = len(haps.text)
    reads, truth = [], []
    for i in range(n):
        s = int(rng.integers(0, T - read_len - 8))
        c = haps.text[s : s + read_len].copy()
        p = int(rng.integers(4, 10))
        while p < read_len:
            c[p] = (c[p] + 1 + rng.integers(0, 3)) % 4
            p += spacing + int(rng.integers(-2, 3))
        reads.append(Read(f"rec{i}", dna.decode(c), None))
        truth.append(s)
    return reads, truth


def run_scale_sidecar(on_tpu):
    """Chromosome-scale throughput sidecar (round-3 verdict item 1): map
    fresh 150bp pairs (BENCH_SCALE_BATCHES x BENCH_SCALE_BATCH, default
    72 x 6144 = ~442k pairs) against a 1.05 Gbp haplotype text on the
    chip and report steady reads/s vs the same 56.3k baseline. Returns a
    dict for the result JSON, or None when skipped. MEM fallback is ON
    (round-4 verdict item 4): the sharded suffix array is pre-built
    (build time reported) and a dense-novel recombinant read gate runs
    after the timed loop with the fallback engaged."""
    mode = os.environ.get("BENCH_SCALE", "auto")
    if mode == "0":
        return None
    if not on_tpu and mode != "1":
        sys.stderr.write("[bench] scale sidecar skipped (CPU fallback)\n")
        return None
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.memmapper import MEMIndex
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

    haps, idx = scale_fixture()
    rng = np.random.default_rng(23)
    bs = int(os.environ.get("BENCH_SCALE_BATCH", "6144"))
    # 72 batches (~18-22 s timed): long enough that one degraded-tunnel
    # window cannot own the steady figure (measured waves last ~5 s;
    # scale runs this round ranged 0.77x-1.31x at 24-48 batches purely
    # on which windows a run straddled)
    nb = int(os.environ.get("BENCH_SCALE_BATCHES", "72"))
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
    t_sa = time.time()
    # SA shards cache beside the fixture: the reference's GCSA2 is a
    # prebuilt on-disk artifact too; the cold build time is what the
    # first run reports (sharded SA-IS, ~80 s at 1.05 Gbp on 4 cores)
    m._mem_fallback_index = MEMIndex(
        haps, max_mem_hits=max(64, 4 * haps.count),
        cache_dir=os.environ.get("SCALE_CACHE", "/tmp/vg_tpu_scale_cache"))
    sa_s = time.time() - t_sa
    n_chunks = len(m._mem_fallback_index.chunks or []) or 1
    sys.stderr.write(
        f"[bench] scale MEM-fallback SA built in {sa_s:.0f}s "
        f"({n_chunks} shards, {haps.total_len/1e9:.2f} Gbp)\n")
    pm = PairedGiraffeMapper(m)
    pairs = simulate_pairs(rng, haps, bs * (nb + 1))
    truth = simulate_pairs.last_truth
    pm.map_pairs(pairs[:bs])                 # warmup: compile + fragdist
    pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))
    # reach steady state BEFORE the timer by driving the actual
    # pipeline (tunnel transfer rate + host allocator/cache ramp over
    # the first seconds of sustained pipelined traffic; see main())
    for _ in map_pairs_encoded_mt(
            pm, (pairs[:bs] for _ in range(
                int(os.environ.get("BENCH_WARM_BATCHES", "24")))),
            seeders=int(os.environ.get("BENCH_SEEDERS", "1")),
            emitters=int(os.environ.get("BENCH_EMITTERS", "2"))):
        pass
    pm.stage_seconds = {k: 0.0 for k in pm.stage_seconds}
    pm.stage_reads = 0
    t0 = time.time()
    n = 0
    ticks = [t0]
    sizes = []
    sample = []
    for recs in map_pairs_encoded_mt(
            pm, (pairs[bs * (k + 1) : bs * (k + 2)] for k in range(nb)),
            seeders=int(os.environ.get("BENCH_SEEDERS", "1")),
            emitters=int(os.environ.get("BENCH_EMITTERS", "2"))):
        if not sample:
            sample = recs[:4096]
        n += len(recs)
        ticks.append(time.time())
        sizes.append(len(recs))
    dt = time.time() - t0
    overall = n / dt
    steady = ((n - sizes[0]) / (ticks[-1] - ticks[1])
              if len(ticks) >= 4 and ticks[-1] > ticks[1] else overall)
    # accuracy on the workload: decoded read1 refpos vs simulation truth
    acc = None
    try:
        from vg_tpu.io.gam import Alignment

        ok = tot = 0
        for kk in range(0, min(len(sample), 4096), 2):
            r1 = Alignment.decode(bytes(sample[kk]))
            t_text = truth[bs + kk // 2]
            want_rp, want_ro = m._diag_refproj(
                np.array([[t_text - m.params.band_radius]]),
                np.array([[True]]))
            tot += 1
            if r1.refpos and abs(int(r1.refpos[0].offset)
                                 - int(want_ro[0, 0])) <= 200:
                ok += 1
        acc = ok / max(tot, 1)
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"[bench] scale accuracy check failed: {e}\n")
    sys.stderr.write(
        f"[bench] scale (1.05 Gbp text): {n} reads in {dt:.2f}s; reads/s "
        f"steady={steady:.0f} overall={overall:.0f} "
        f"accuracy={acc if acc is None else round(acc, 4)}\n")
    # per-batch tick archive (round-4 verdict: the degraded-run
    # postmortem must be data, not conjecture)
    batch_rps = [round(nn / (b - a), 1) for nn, a, b in
                 zip(sizes, ticks[:-1], ticks[1:]) if b > a]
    st = pm.stage_seconds
    nr = max(pm.stage_reads, 1)
    stage_us = {k: round(1e6 * v / nr, 2) for k, v in st.items()}
    sys.stderr.write(f"[bench] scale stage split (us/read): {stage_us}; "
                     f"ticks {batch_rps}\n")
    # recombinant gate: dense-novel reads whose minimizer windows are
    # all broken — zero-candidate seeding must fall through to the
    # sharded MEM suffix array and still place the read (round-4
    # verdict item 4; reference analogue: GCSA2 MEM re-seeding,
    # src/mapper.hpp:210)
    rec_acc = None
    try:
        n_rec = 256
        rec_reads, rec_truth = _recombinant_reads(rng, haps, n_rec)
        # pad with ordinary indexed-text reads: padding with recombinant
        # copies would put EVERY padded row through the SA fallback
        from vg_tpu.io.fastq import Read as _Read
        from vg_tpu.utils import dna as _dna

        s0 = int(rng.integers(0, haps.total_len - 200))
        plain = _Read("pad", _dna.decode(haps.text[s0 : s0 + 150]), None)
        pad = rec_reads + [plain] * (bs - n_rec)
        t_rec = time.time()
        alns = m.map_batch(pad[:bs])
        rec_ok = 0
        for a, want_t in zip(alns[:n_rec], rec_truth):
            want_rp, want_ro = m._diag_refproj(
                np.array([[want_t - m.params.band_radius]]),
                np.array([[True]]))
            if a.refpos and abs(int(a.refpos[0].offset)
                                - int(want_ro[0, 0])) <= 200:
                rec_ok += 1
        rec_acc = rec_ok / n_rec
        sys.stderr.write(
            f"[bench] scale recombinant gate (MEM fallback engaged): "
            f"{rec_ok}/{n_rec} within 200bp "
            f"({time.time()-t_rec:.0f}s)\n")
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"[bench] scale recombinant gate failed: {e}\n")
    return {"text_bp": int(haps.total_len),
            "reads_per_s": round(steady, 1),
            "overall_reads_per_s": round(overall, 1),
            "vs_baseline": round(steady / BASELINE_READS_PER_S, 4),
            "accuracy": None if acc is None else round(acc, 4),
            "sa_build_s": round(sa_s, 1),
            "recombinant_accuracy": rec_acc,
            "stage_us_per_read": stage_us,
            "batch_ticks_reads_per_s": batch_rps}


def main():
    on_tpu, note = init_backend()

    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    if not on_tpu:
        # CPU fallback: keep it honest but finishable
        os.environ.setdefault("BENCH_BATCH", "2048")
        os.environ.setdefault("BENCH_READS", "8192")

    rng = np.random.default_rng(42)
    t0 = time.time()
    g, results, vcf = make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    sys.stderr.write(
        f"[bench] pangenome {g.node_count} nodes, {haps.count} haplotypes, "
        f"text {haps.total_len} bp, {idx.unique_count} minimizers "
        f"({time.time()-t0:.1f}s)\n")

    # 6144 pairs/batch measured fastest on the v5e through the tunnel
    # (4096-16384 all beat baseline; smaller batches pipeline better
    # against the 3-stage host overlap on this 4-vCPU host)
    bs = int(os.environ.get("BENCH_BATCH", "6144"))
    # pre-build the MEM-fallback suffix array with the other indexes so a
    # zero-candidate read in the timed loop doesn't pay the one-time cost
    from vg_tpu.map.memmapper import MEMIndex

    mem_idx = MEMIndex(haps)
    mode = os.environ.get("BENCH_MODE", "paired")
    # Device seeding is RETIRED as the production default (round-4
    # measurement, v5e via tunnel, 12288 reads/batch: rolling_minimizers
    # ~0 ms, lookup_ranges2 701 ms [19-step composite-key binary search =
    # ~230 MB of random HBM gathers], full seed_candidates_dev 1572 ms —
    # vs 117 ms for the ENTIRE fused DP+pair-selection step. Seeding on
    # device adds >10x the chip's DP time to the chip, the scarce
    # resource, to save host CPU that overlaps with the device anyway;
    # even a hash-table lookup [~5x fewer gathers] could not close a
    # 13x gap). BENCH_DEVSEED=probe restores the empirical probe,
    # BENCH_DEVSEED=1 forces device seeding.
    devseed_env = os.environ.get("BENCH_DEVSEED", "host")
    devseed = devseed_env == "1"
    if devseed_env == "probe" and on_tpu and mode == "paired":
        # pick the seeding engine empirically: time a few warm batches
        # host-seeded vs device-seeded (Pallas sort/segment kernels) and
        # keep the faster — chip generation and tunnel conditions decide
        from vg_tpu.map.paired import PairedGiraffeMapper

        probe_reads = simulate_pairs(rng, haps, 3 * bs // 2)
        times = {}
        for ds in (False, True):
            try:
                pm_p = PairedGiraffeMapper(GiraffeMapper(
                    haps, idx, GiraffeParams(batch_reads=bs,
                                             device_seed=ds)))
                pm_p.map_pairs(probe_reads[:bs])      # warm + fragdist
                pm_p.stage_emit(pm_p.stage_rescue(
                    pm_p.stage_score(probe_reads[:bs])))
                t0p = time.time()
                for _ in range(2):
                    pm_p.stage_emit(pm_p.stage_rescue(
                        pm_p.stage_score(probe_reads[bs // 2 : 3 * bs // 2])))
                times[ds] = time.time() - t0p
            except Exception as e:  # noqa: BLE001 — probe only
                sys.stderr.write(f"[bench] devseed={ds} probe failed: "
                                 f"{str(e)[:150]}\n")
                times[ds] = float("inf")
        devseed = times.get(True, float("inf")) < times.get(False,
                                                            float("inf"))
        sys.stderr.write(
            f"[bench] seeding probe: host={times.get(False, -1):.2f}s "
            f"device={times.get(True, -1):.2f}s -> "
            f"{'device' if devseed else 'host'} seeding\n")
    params = GiraffeParams(batch_reads=bs, device_seed=devseed)
    mapper = GiraffeMapper(haps, idx, params)
    mapper._mem_fallback_index = mem_idx
    # 524288 reads = ~43 timed batches at bs=6144 (~7 s on chip): long
    # enough that one co-tenant/tunnel stall cannot own the steady
    # figure, short enough to stay cheap next to the scale sidecar
    n_bench = int(os.environ.get("BENCH_READS", "524288"))

    if mode == "paired":
        from vg_tpu.map.paired import PairedGiraffeMapper

        import io as _io

        from vg_tpu.io.gam import write_messages

        pm = PairedGiraffeMapper(mapper)
        n_pairs = n_bench // 2
        sample_texts = make_sample_texts(rng, haps)
        pairs = simulate_pairs(rng, haps, n_pairs + bs,
                               sample_texts=sample_texts)
        pm.map_pairs(pairs[:bs])            # warmup: compile + fragdist
        # warm the finalized-path device step too (device pair selection
        # compiles lazily on its first use)
        pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))
        from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

        # reach steady state BEFORE the timer: drive the actual pipeline
        # for a few batches — transfer rate through the tunnel and
        # host-side allocator/cache behavior both ramp over the first
        # seconds of *sustained pipelined* traffic (measured: emit-stage
        # durations halve from batch ~1 to ~25; sequential warm cycles
        # do not reproduce the pattern). Same practice as the
        # reference's steady-state reads/s measurement
        # (scripts/giraffe-speed.sh).
        n_warm = int(os.environ.get("BENCH_WARM_BATCHES", "24"))
        for _ in map_pairs_encoded_mt(
                pm, (pairs[:bs] for _ in range(n_warm)),
                seeders=int(os.environ.get("BENCH_SEEDERS", "1")),
                emitters=int(os.environ.get("BENCH_EMITTERS", "2"))):
            pass
        # stage timers exclude warmup (compile time would swamp them)
        pm.stage_seconds = {k: 0.0 for k in pm.stage_seconds}
        pm.stage_reads = 0
        pm.stage_trace = []      # per-call trace -> result JSON archive

        out = _io.BytesIO()
        t0 = time.time()
        mapped = 0
        ticks = [t0]            # per-batch completion times (median-of-N:
        sizes = []              # round-2 verdict asked for median, not best)
        for recs in map_pairs_encoded_mt(
                pm, (pairs[i : i + bs] for i in range(bs, len(pairs), bs)),
                seeders=int(os.environ.get("BENCH_SEEDERS", "1")),
            emitters=int(os.environ.get("BENCH_EMITTERS", "2"))):
            mapped += len(recs)
            ticks.append(time.time())
            sizes.append(len(recs))
            write_messages(out, recs)
        dt = time.time() - t0
        rps_overall = mapped / dt
        batch_rps = [n / (b - a) for n, a, b in
                     zip(sizes, ticks[:-1], ticks[1:]) if b > a]
        # headline = steady-state aggregate: total reads over total time
        # excluding only the first batch (pipeline ramp). Per-batch tick
        # medians are distorted by queue bursts in the 3-stage pipeline
        # (a batch can be yielded microseconds after its predecessor),
        # so they are reported as diagnostics only.
        if len(ticks) >= 4 and ticks[-1] > ticks[1]:
            rps = (mapped - sizes[0]) / (ticks[-1] - ticks[1])
        else:
            rps = rps_overall
        sys.stderr.write(
            f"[bench] paired: {mapped} reads in {dt:.2f}s -> "
            f"{out.getbuffer().nbytes/1e6:.1f} MB GAM; reads/s "
            f"steady={rps:.0f} overall={rps_overall:.0f} "
            f"batch-ticks best={max(batch_rps):.0f} "
            f"worst={min(batch_rps):.0f} "
            f"median={float(np.median(batch_rps)):.0f} "
            f"(n={len(batch_rps)})\n")
        # per-stage time split — the TPU analogue of the reference's
        # M-instructions/read canary (giraffe_main.cpp:2116-2137,2552):
        # stage threads run concurrently, so the per-read numbers say
        # which stage bounds the pipeline, and dev_wait says how much of
        # stage R is blocked on the chip rather than host compute.
        st = pm.stage_seconds
        nr = max(pm.stage_reads, 1)
        host_s = st["score"] + st["rescue"] + st["emit"] - st["dev_wait"]
        ep = getattr(pm, "_emit_prof", None)
        if ep:
            sys.stderr.write("[bench] emit sub-stages (us/read): " + " ".join(
                f"{k}={1e6*v/nr:.2f}" for k, v in ep.items()) + "\n")
        ep2 = getattr(mapper, "_espans_prof", None)
        if ep2:
            sys.stderr.write("[bench] spans sub-stages (us/read): " + " ".join(
                f"{k}={1e6*v/nr:.2f}" for k, v in ep2.items()) + "\n")
        sys.stderr.write(
            f"[bench] stage split (us/read): score={1e6*st['score']/nr:.1f} "
            f"rescue={1e6*st['rescue']/nr:.1f} "
            f"emit={1e6*st['emit']/nr:.1f} "
            f"dev_wait={1e6*st['dev_wait']/nr:.1f} | "
            f"host={1e6*host_s/nr:.1f} us/read over {nr} reads\n")
        metric = "giraffe_sr_paired_reads_per_s_per_chip"
        # correctness ON THE BENCH WORKLOAD itself: decode a sample of
        # the emitted records and compare refpos to the held-out truth
        try:
            from vg_tpu.io.gam import Alignment, read_messages

            truth = simulate_pairs.last_truth
            n_eval = 2000
            main._gam_blob = out.getvalue()   # shared with the surject
            recs_it = read_messages(main._gam_blob)   # sidecar below
            got_ok = tot = 0
            misses = []
            for k in range(min(n_eval, n_pairs)):
                r1 = Alignment.decode(next(recs_it))
                next(recs_it)                      # skip mate
                t_text = truth[bs + k]
                want_rp, want_ro = mapper._diag_refproj(
                    np.array([[t_text - mapper.params.band_radius]]),
                    np.array([[True]]))
                tot += 1
                got = int(r1.refpos[0].offset) if r1.refpos else None
                want = int(want_ro[0, 0])
                # fwd reads anchor at the start; read1 may be the
                # reverse mate of the fragment in either orientation
                if got is not None and abs(got - want) <= 200:
                    got_ok += 1
                else:
                    misses.append((k, r1, want, got))
            sys.stderr.write(
                f"[bench] bench-workload accuracy: {got_ok/max(tot,1):.4f} "
                f"({got_ok}/{tot} read1 within 200bp of truth)\n")
            # per-miss diagnosis (round-4 verdict: the 2/2000 must be
            # explained, not shrugged at): truth vs mapped position,
            # score, mapq, proper-pair state for each evaluated miss
            for k, r1, want, got in misses[:16]:
                sys.stderr.write(
                    f"[bench]   miss pair {k}: truth_ref={want} "
                    f"mapped_ref={got} delta="
                    f"{'unmapped' if got is None else got - want} "
                    f"score={r1.score} mapq={r1.mapping_quality} "
                    f"proper={r1.annotation.get('proper_pair')} "
                    f"frag={r1.annotation.get('fragment_length')}\n")
        except Exception as e:
            sys.stderr.write(f"[bench] workload accuracy failed: {e}\n")
    else:
        import io as _io

        from vg_tpu.io.gam import write_messages

        reads = simulate_reads(rng, haps, n_bench + bs)
        # warm the packed single-end step (compile) + emit path
        sb_w = mapper.score_reads_packed(reads[:bs])
        recs_w = mapper.emit_batch_encoded(sb_w)
        if recs_w is None:
            mapper.map_batch(reads[:bs])
        from vg_tpu.parallel.pipeline import map_stream_encoded_mt

        out = _io.BytesIO()
        t0 = time.time()
        mapped = 0
        nbytes = 0
        batches = (reads[i : i + bs] for i in range(bs, len(reads), bs))
        for recs in map_stream_encoded_mt(mapper, batches):
            mapped += len(recs)
            write_messages(out, recs)
        dt = time.time() - t0
        nbytes = out.getbuffer().nbytes
        rps = mapped / dt
        sys.stderr.write(
            f"[bench] {mapped} reads in {dt:.2f}s -> "
            f"{nbytes/1e6:.1f} MB GAM\n")
        metric = "giraffe_sr_reads_per_s_per_chip"
    # accuracy sidecar (stderr): the same mapeval loop the tests gate on —
    # a throughput number without a correctness fraction is unshippable
    try:
        if os.environ.get("BENCH_ACC", "1") == "0":
            raise RuntimeError("skipped (BENCH_ACC=0)")
        from vg_tpu.eval.mapeval import run_mapeval

        # quality-carrying reads: errors drawn from synthetic per-base
        # phred qualities, and the quality string rides into mapping so
        # the explored-minimizer MAPQ cap engages (reference faster_cap,
        # minimizer_mapper.cpp:2940 — infinite cap without qualities);
        # this is what de-saturates the ROC below
        res = run_mapeval(mapper, n_reads=1000, with_quality=True, seed=17)
        res_i = run_mapeval(mapper, n_reads=500, error_rate=0.005,
                            indel_rate=0.01, seed=19)
        a30, n30 = res.accuracy_at_mapq(30)
        sys.stderr.write(
            f"[bench] accuracy (qual reads): {res.accuracy:.4f} overall, "
            f"{a30:.4f}@mapq30 (n={n30}), wrong@60={res.wrong_mapq60}; "
            f"indel reads: {res_i.accuracy:.4f} overall, "
            f"{res_i.accuracy_at_mapq(30)[0]:.4f}@mapq30\n")
        # ROC points (mapq threshold -> wrong/total), the reference CI's
        # accuracy-vs-confidence curve (vgci/vgci.py mapeval)
        roc = {str(t): [a, n] for t, a, n in res.roc}
        sys.stderr.write(f"[bench] roc ({len(res.roc)} strata): "
                         f"{json.dumps(roc)}\n")
        # HARD read tier (round-4 verdict: a ROC whose every stratum has
        # zero wrong reads cannot distinguish calibrated from
        # overconfident): short reads at high error rate produce genuine
        # multi-mapping ambiguity, so low-mapq strata must show wrongs
        # while wrong@60 stays 0 and the wrong fraction decreases with
        # mapq (the reference's mapeval ROC shape, vgci/vgci.py:1136)
        res_h = run_mapeval(mapper, n_reads=1000, read_length=60,
                            error_rate=0.05, with_quality=True, seed=31)
        roc_h = {str(t): [a, n] for t, a, n in res_h.roc}
        wrongs_h = sum(a for a, _ in roc_h.values())
        sys.stderr.write(
            f"[bench] hard-tier roc ({len(res_h.roc)} strata, "
            f"accuracy {res_h.accuracy:.4f}, wrong@60="
            f"{res_h.wrong_mapq60}): {json.dumps(roc_h)}\n")
        # calibration shape checks: cumulative wrong fraction must not
        # increase with the mapq threshold, and the top tier stays clean
        fr = [(t, (a / n if n else 0.0)) for t, (a, n) in
              sorted(((int(t), v) for t, v in roc_h.items()),
                     reverse=True)]
        mono_ok = all(fr[i][1] <= fr[i + 1][1] + 1e-9
                      for i in range(len(fr) - 1))
        sys.stderr.write(
            f"[bench] hard-tier calibration: nonzero-wrong strata="
            f"{sum(1 for t, v in roc_h.items() if v[0])} "
            f"monotone={mono_ok} wrong@60={res_h.wrong_mapq60}\n")
        # rolling accuracy-regression baseline (reference
        # vgci/vgci.py:56-59,70,153: every run diffs against a stored
        # baseline with drift thresholds — accuracy 0.005): the committed
        # ACCURACY_BASELINE.json pins the fixed-seed mapeval numbers;
        # drift beyond tolerance fails loudly in the result JSON.
        try:
            bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "ACCURACY_BASELINE.json")
            if os.path.exists(bp):
                with open(bp) as f:
                    base = json.load(f)
                acc_cmp = {
                    "accuracy_delta": round(
                        res.accuracy - base["accuracy"], 6),
                    "indel_accuracy_delta": round(
                        res_i.accuracy - base["indel_accuracy"], 6),
                    "hard_accuracy_delta": round(
                        res_h.accuracy - base["hard_accuracy"], 6),
                    "wrong_mapq60": res.wrong_mapq60 + res_h.wrong_mapq60,
                }
                acc_cmp["ok"] = bool(
                    acc_cmp["accuracy_delta"] >= -0.005
                    and acc_cmp["indel_accuracy_delta"] >= -0.005
                    and acc_cmp["hard_accuracy_delta"] >= -0.005
                    and acc_cmp["wrong_mapq60"]
                    <= base.get("wrong_mapq60", 0))
                main.vs_accuracy_baseline = acc_cmp
                if not acc_cmp["ok"]:
                    sys.stderr.write(
                        "[bench] ACCURACY REGRESSION vs committed "
                        f"baseline: {json.dumps(acc_cmp)}\n")
            else:
                sys.stderr.write(
                    "[bench] no ACCURACY_BASELINE.json committed — "
                    "baseline diff skipped\n")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"[bench] accuracy-baseline diff failed: "
                             f"{e}\n")
    except Exception as e:  # accuracy sidecar must never kill the bench
        sys.stderr.write(f"[bench] accuracy check failed: {e}\n")
    # surjection sidecar (driver workload #3: vg surject GAM -> SAM,
    # src/surjector.cpp): decode a sample of the just-emitted GAM and
    # surject it against the pangenome's reference paths — one native
    # OpenMP banded-realignment call for the whole batch
    surject_result = None
    try:
        if os.environ.get("BENCH_ACC", "1") == "0":
            raise RuntimeError("skipped (BENCH_ACC=0)")
        from vg_tpu.io.gam import Alignment as _Aln, read_messages
        from vg_tpu.surject.surjector import Surjector

        sj = Surjector(g)
        sample_alns = []
        blob = getattr(main, "_gam_blob", None) or out.getvalue()
        for msg in read_messages(blob):
            sample_alns.append(_Aln.decode(msg))
            if len(sample_alns) >= 8192:
                break
        sj.surject_batch(sample_alns[:256])          # warm native lib
        t0 = time.time()
        srecs = sj.surject_batch(sample_alns)
        sj_dt = time.time() - t0
        n_mapped = sum(1 for r in srecs if not (r.flag & 0x4))
        surject_result = {
            "alns_per_s": round(len(srecs) / sj_dt, 1),
            "n": len(srecs), "mapped": n_mapped}
        sys.stderr.write(
            f"[bench] surject: {len(srecs)} alns in {sj_dt:.2f}s = "
            f"{len(srecs)/sj_dt:.0f} alns/s ({n_mapped} mapped)\n")
        # pack ingestion on the same sample (driver workload #5 front
        # half; the calling half is exercised end-to-end on the real
        # HGSVC chr22 SV fixture in the test suite)
        from vg_tpu.call.pack import Packer

        pk = Packer(g)
        t0 = time.time()
        pk.add_batch(sample_alns)
        pk_dt = time.time() - t0
        surject_result["pack_alns_per_s"] = round(
            len(sample_alns) / max(pk_dt, 1e-9), 1)
        sys.stderr.write(
            f"[bench] pack: {len(sample_alns)} alns in {pk_dt:.2f}s = "
            f"{len(sample_alns)/max(pk_dt, 1e-9):.0f} alns/s\n")
    except Exception as e:
        sys.stderr.write(f"[bench] surject sidecar failed: {e}\n")
    # long-read sidecar (stderr): fused native hifi-style pipeline
    try:
        if os.environ.get("BENCH_ACC", "1") == "0":
            raise RuntimeError("skipped (BENCH_ACC=0)")
        from vg_tpu.map.longread import LongReadMapper

        lrm = LongReadMapper(haps, idx)
        lr_reads = []
        T = len(haps.text)
        for i in range(512):
            s = int(rng.integers(0, T - 10100))
            c = haps.text[s : s + 10000].copy()
            err = rng.random(len(c)) < 0.005
            c[err] = (c[err] + rng.integers(1, 4, int(err.sum()))) % 4
            from vg_tpu.io.fastq import Read as _Read
            from vg_tpu.utils import dna as _dna

            lr_reads.append(_Read(name=f"lr{i}",
                                  sequence=_dna.decode(c), quality=""))
        lrm.map_batch_encoded(lr_reads[:16])       # warm native build
        t0 = time.time()
        recs = lrm.map_batch_encoded(lr_reads[16:])
        lr_dt = time.time() - t0
        if recs is not None:
            sys.stderr.write(
                f"[bench] longread: {len(recs)} 10kb reads in "
                f"{lr_dt:.2f}s = {len(recs)/lr_dt:.0f} reads/s\n")
        # TPU link-engine probe (VERDICT r3 item 4): the slow-link DPs
        # batched through the device engine (ops/device_links.py,
        # byte-identical records). Through this ~20 MB/s tunnel the
        # transfer term (~6 MB/batch: read slices up, op streams down)
        # usually exceeds the host C++ link time it replaces, so
        # engine=native stays the default here — on a PCIe-attached
        # chip the same traffic costs <1 ms. Both numbers are recorded
        # every run so the decision stays evidence-backed.
        if on_tpu and os.environ.get("BENCH_LR_DEVPROBE", "1") != "0":
            from vg_tpu.map.longread import LongReadParams

            lrd = LongReadMapper(haps, idx,
                                 LongReadParams(engine="device"))
            # warm at FULL batch size: the engine compiles one XLA
            # program per (size bucket, power-of-two task grid), so a
            # small warm batch would leave the big grids compiling
            # inside the timed region (~40 s each through the tunnel)
            lrd.map_batch_encoded(lr_reads[16:])
            t0 = time.time()
            recs_d = lrd.map_batch_encoded(lr_reads[16:])
            dt_d = time.time() - t0
            ident = (recs_d is not None and recs is not None
                     and len(recs_d) == len(recs)
                     and all(bytes(x) == bytes(y)
                             for x, y in zip(recs[:64], recs_d[:64])))
            sys.stderr.write(
                f"[bench] longread device-link engine: "
                f"{len(recs_d)/dt_d:.0f} reads/s "
                f"(records identical: {ident}) vs host "
                f"{len(recs)/lr_dt:.0f} -> default "
                f"{'device' if dt_d < lr_dt else 'native'}\n")
    except Exception as e:
        sys.stderr.write(f"[bench] longread sidecar failed: {e}\n")
    result = {
        "metric": metric,
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 4),
    }
    if note:
        result["note"] = note
    if mode == "paired":
        # per-batch tick + stage-split archive: a degraded driver
        # capture must be diagnosable from the recorded JSON alone
        result["batch_ticks_reads_per_s"] = [round(x, 1)
                                             for x in batch_rps]
        nr_ = max(pm.stage_reads, 1)
        result["stage_us_per_read"] = {
            k: round(1e6 * v / nr_, 2)
            for k, v in pm.stage_seconds.items()}
        if pm.stage_trace:
            # per-stage call timeline (start offset ms, duration ms) in
            # call order: a slow tick is attributable to the stage that
            # stalled (score/rescue durations spiking = device/tunnel
            # wait; emit = host contention) straight from the JSON
            tb = pm.stage_trace[0][1]
            tl = {}
            for st, a, b in pm.stage_trace:
                tl.setdefault(st, []).append(
                    [round(1e3 * (a - tb), 1), round(1e3 * (b - a), 1)])
            result["stage_timeline_ms"] = tl
    if getattr(main, "vs_accuracy_baseline", None) is not None:
        result["vs_accuracy_baseline"] = main.vs_accuracy_baseline
    if surject_result is not None:
        result["surject"] = surject_result
    # chromosome-scale sidecar (1.05 Gbp text): the baseline's own
    # workload class — recorded in the same JSON line
    try:
        scale = run_scale_sidecar(on_tpu)
        if scale is not None:
            result["scale"] = scale
    except Exception as e:  # the sidecar must never kill the bench
        sys.stderr.write(f"[bench] scale sidecar failed: {e}\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
