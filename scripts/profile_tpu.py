"""Chip-day profiling checklist (run when the axon tunnel is back).

Round-3 left three measurements blocked on hardware; this script runs
them all and prints a decision summary:

1. DP gather locality at scale: the same batch shapes against a 5 Mbp
   vs a 420 Mbp resident text — isolates whether the 1 Gbp throughput
   collapse (README round-2: 8.6k reads/s) is the window gather
   scattering over HBM (if so, candidate sorting by text position is
   the fix; host seeding itself measured flat on CPU: 179k vs 165k
   reads/s seed-stage at 21 copies).
2. Seeding engine choice: host C++ + compressed candidate upload vs the
   Pallas device-seeded dispatch (ops/pallas_seed.py kernels). bench.py
   now auto-probes this too (BENCH_DEVSEED=auto); this gives the
   stand-alone numbers.
3. Batch-size sweep for the paired pipeline under current tunnel
   conditions.

Usage: python scripts/profile_tpu.py [quick]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    import jax

    print("backend:", jax.devices(), flush=True)
    import bench as B
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper

    bs = 2048 if quick else 16384

    # ---- experiment 1: gather locality ---------------------------------
    sizes = [(1.0, 2)] + ([] if quick else [(20.0, 10)])
    for ref_mbp, n_samples in sizes:
        rng = np.random.default_rng(7)
        g, results, vcf = B.make_pangenome(rng, ref_len=int(ref_mbp * 1e6))
        if n_samples > 2:
            for rec in vcf.records:
                rec.genotypes = [
                    ((int(rng.integers(0, 2)), int(rng.integers(0, 2))),
                     True) for _ in range(n_samples)]
            vcf.samples = [f"s{i}" for i in range(n_samples)]
        haps = thread_haplotypes(g, results, vcf)
        idx = MinimizerIndex.build(haps)
        m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
        pm = PairedGiraffeMapper(m)
        pairs = B.simulate_pairs(rng, haps, bs + bs // 2)
        pm.map_pairs(pairs[:bs])
        pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))
        reps = 2 if quick else 4
        t0 = time.time()
        for _ in range(reps):
            pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))
        dt = (time.time() - t0) / reps
        print(f"[locality] text={haps.total_len/1e6:.0f}Mbp: "
              f"{2*bs/dt:.0f} reads/s "
              f"({dt*1000:.0f} ms / {2*bs} reads)", flush=True)
        # gather-locality A/B: the DP window gather with candidate
        # starts as-is vs sorted by text position. If sorted wins big at
        # the large text, productionize a batch locality sort (candidates
        # permuted for the device call, unpermuted at fetch).
        import jax
        import jax.numpy as jnp

        rng2 = np.random.default_rng(3)
        T = haps.total_len
        N, TW = bs * 8, 182
        starts = rng2.integers(0, T - TW, N).astype(np.int32)
        text_dev = jax.device_put(jnp.asarray(haps.text))

        @jax.jit
        def gather(starts_d):
            pos = starts_d[:, None] + jnp.arange(TW, dtype=jnp.int32)
            return text_dev[pos].sum()

        for tag2, arr in (("unsorted", starts), ("sorted",
                                                 np.sort(starts))):
            arr_d = jax.device_put(jnp.asarray(arr))
            gather(arr_d).block_until_ready()
            t0 = time.time()
            for _ in range(8):
                gather(arr_d).block_until_ready()
            dt = (time.time() - t0) / 8
            gbps = N * TW / dt / 1e9
            print(f"[gather {haps.total_len/1e6:.0f}Mbp {tag2}] "
                  f"{dt*1000:.1f} ms = {gbps:.1f} GB/s", flush=True)

    # ---- experiments 2+3: seeding engines x batch sizes -----------------
    rng = np.random.default_rng(7)
    g, results, vcf = B.make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    for bs2 in ([2048] if quick else [8192, 16384, 32768]):
        for ds in (False, True):
            pm = PairedGiraffeMapper(GiraffeMapper(
                haps, idx, GiraffeParams(batch_reads=bs2, device_seed=ds)))
            pairs = B.simulate_pairs(rng, haps, bs2 + bs2 // 2)
            pm.map_pairs(pairs[:bs2])
            pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs2])))
            reps = 2 if quick else 4
            t0 = time.time()
            for _ in range(reps):
                pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs2])))
            dt = (time.time() - t0) / reps
            print(f"[engine] bs={bs2} device_seed={ds}: "
                  f"{2*bs2/dt:.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
