"""Whole-chromosome-scale end-to-end test (VERDICT r1 item 9).

Synthesizes a chromosome-scale pangenome (default 50 Mbp reference x 20
haplotypes = 1 Gbp haplotype text; HPRC-class data is not available in
this environment), builds the full index, maps 1M simulated read pairs
end-to-end through the production pipeline, and reports reads/s, RSS,
and stage timings.

Run:  python scripts/scale_test.py [ref_mbp] [n_samples] [n_reads]

Known scale limit (by design, documented): device text positions are
int32, so one chip serves haplotype texts up to ~2.1 Gbp; larger
pangenomes shard the text across chips (parallel/mesh.py) or sample
haplotypes (vg_tpu haplotypes / index.sampling).
"""
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ref_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    import bench as B
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

    rng = np.random.default_rng(7)
    t0 = time.time()
    g, results, vcf = B.make_pangenome(
        rng, ref_len=int(ref_mbp * 1e6), snp_rate=0.001, indel_rate=0.0001)
    t_construct = time.time() - t0
    print(f"[scale] construct: {g.node_count} nodes in {t_construct:.0f}s "
          f"rss={rss_gb():.1f}G", flush=True)

    # widen the cohort: duplicate samples with fresh genotypes
    base = vcf.records
    vcf.samples = [f"s{i}" for i in range(n_samples)]
    for rec in base:
        rec.genotypes = [
            ((int(rng.integers(0, 2)), int(rng.integers(0, 2))), True)
            for _ in range(n_samples)]
    t0 = time.time()
    haps = thread_haplotypes(g, results, vcf)
    t_thread = time.time() - t0
    print(f"[scale] haplotypes: {haps.count} walks, "
          f"{haps.total_len/1e9:.2f} Gbp text in {t_thread:.0f}s "
          f"rss={rss_gb():.1f}G", flush=True)
    assert haps.total_len < (1 << 31), "int32 text-position limit"

    t0 = time.time()
    idx = MinimizerIndex.build(haps)
    t_index = time.time() - t0
    print(f"[scale] minimizer index: {idx.unique_count/1e6:.1f}M keys in "
          f"{t_index:.0f}s rss={rss_gb():.1f}G", flush=True)

    bs = 4096
    mapper = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
    pm = PairedGiraffeMapper(mapper)
    n_pairs = n_reads // 2

    def pair_batches():
        done = 0
        while done < n_pairs:
            take = min(bs, n_pairs - done)
            yield B.simulate_pairs(rng, haps, take)
            done += take

    # warmup (compile + fragment model)
    pm.map_pairs(B.simulate_pairs(rng, haps, bs))
    t0 = time.time()
    mapped = nbytes = 0
    for recs in map_pairs_encoded_mt(pm, pair_batches()):
        mapped += len(recs)
        nbytes += sum(len(r) for r in recs)
    dt = time.time() - t0
    print(f"[scale] mapped {mapped} reads in {dt:.0f}s = "
          f"{mapped/dt:.0f} reads/s ({nbytes/1e6:.0f} MB GAM) "
          f"rss={rss_gb():.1f}G", flush=True)
    print(f"[scale] SUMMARY construct={t_construct:.0f}s "
          f"thread={t_thread:.0f}s index={t_index:.0f}s "
          f"map={mapped/dt:.0f}r/s rss={rss_gb():.1f}G")


if __name__ == "__main__":
    main()
