"""Profile the chromosome-scale mapping path (the 1 Gbp throughput
collapse, VERDICT r2 item 4): build one big index, then isolate where
batch time goes — read generation, host seeding, device DP + fetch,
emission — and A/B the locality sort.

Run:  python scripts/profile_scale.py [ref_mbp] [n_samples]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ref_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax

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
    vcf.samples = [f"s{i}" for i in range(n_samples)]
    for rec in vcf.records:
        rec.genotypes = [
            ((int(rng.integers(0, 2)), int(rng.integers(0, 2))), True)
            for _ in range(n_samples)]
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    print(f"[prof] built: {haps.total_len/1e9:.2f} Gbp text, "
          f"{idx.unique_count/1e6:.1f}M keys ({time.time()-t0:.0f}s)",
          flush=True)

    bs = 4096
    for loc_sort in (True, False):
        m = GiraffeMapper(haps, idx, GiraffeParams(
            batch_reads=bs, locality_sort=loc_sort))
        pm = PairedGiraffeMapper(m)

        t0 = time.time()
        pairs = B.simulate_pairs(rng, haps, bs * 8)
        t_gen = (time.time() - t0) / 8
        pm.map_pairs(pairs[:bs])
        pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))

        for rep in (1, 2, 3):
            b = pairs[bs * rep : bs * (rep + 1)]
            t0 = time.time()
            it = pm.stage_score(b)
            t1 = time.time()
            if it[0] == "dev":                   # fragment model finalized
                jax.block_until_ready(it[2][2][1])   # packed device buffer
            t2 = time.time()
            it = pm.stage_rescue(it)
            t3 = time.time()
            recs = pm.stage_emit(it)
            t4 = time.time()
            print(f"[prof] loc={int(loc_sort)} gen={t_gen:.3f} "
                  f"score={t1-t0:.3f} dev_block={t2-t1:.3f} "
                  f"fetch+resc={t3-t2:.3f} emit={t4-t3:.3f} "
                  f"total(no gen)={t4-t0:.3f} "
                  f"({2*bs/(t4-t0):.0f} r/s serial)", flush=True)

        t0 = time.time()
        n = 0
        NB = 12
        for recs in map_pairs_encoded_mt(
                pm, (pairs[bs * (k % 7 + 1) : bs * (k % 7 + 2)]
                     for k in range(NB))):
            n += len(recs)
        dt = time.time() - t0
        print(f"[prof] loc={int(loc_sort)} pipelined(pre-gen): "
              f"{n/dt:.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
