"""Profile the paired mapping stages on the real chip.

Times each pipeline stage (score / rescue / emit) per batch, plus the
device roundtrip in isolation, to show where a reads/s regression lives
(host compute vs tunnel latency vs emission).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench


def main():
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper

    rng = np.random.default_rng(42)
    g, results, vcf = bench.make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    bs = 8192
    mapper = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
    pm = PairedGiraffeMapper(mapper)
    pairs = bench.simulate_pairs(rng, haps, bs * 5)

    # warmup (compile + fragdist finalize)
    pm.map_pairs(pairs[:bs])
    pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))

    # raw device roundtrip: dispatch + block on one already-compiled step
    import jax
    item = pm.stage_score(pairs[:bs])
    if item[0] == "dev":
        sb1, sb2, sel = item[2]
        t0 = time.time()
        jax.block_until_ready(sel[0])
        print(f"device fetch (block on dispatched DP): {time.time()-t0:.3f}s")

    for rep in range(3):
        b = pairs[bs * (rep + 1) : bs * (rep + 2)]
        t0 = time.time()
        item = pm.stage_score(b)
        t1 = time.time()
        item = pm.stage_rescue(item)
        t2 = time.time()
        recs = pm.stage_emit(item)
        t3 = time.time()
        print(f"batch {rep}: score={t1-t0:.3f}s rescue(fetch)={t2-t1:.3f}s "
              f"emit={t3-t2:.3f}s total={t3-t0:.3f}s "
              f"({2*len(b)/(t3-t0):.0f} reads/s serial)")

    # seeding alone
    t0 = time.time()
    p1 = mapper.prepare_batch([a for a, _ in pairs[:bs]])
    p2 = mapper.prepare_batch([b for _, b in pairs[:bs]])
    print(f"prepare_batch both ends: {time.time()-t0:.3f}s")

    # device dispatch alone (no fetch)
    t0 = time.time()
    out = pm.score_pairs_device(pairs[:bs])
    t1 = time.time()
    jax.block_until_ready(out[2][0])
    t2 = time.time()
    print(f"score_pairs_device dispatch={t1-t0:.3f}s +block={t2-t1:.3f}s")

    # emission alone, second time (scores already fetched)
    item = ("dev", pairs[:bs], out)
    item = pm.stage_rescue(item)
    t0 = time.time()
    recs = pm.stage_emit(item)
    print(f"stage_emit alone: {time.time()-t0:.3f}s ({len(recs)} recs)")


if __name__ == "__main__":
    main()
