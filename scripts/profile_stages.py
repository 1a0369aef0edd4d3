"""cProfile the production pipeline stages (sequential, so attribution
is exact) on the bench workload. Run on the chip:

    python scripts/profile_stages.py [n_batches]
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B


def main():
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper

    rng = np.random.default_rng(42)
    t0 = time.time()
    g, results, vcf = B.make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    print(f"setup {time.time()-t0:.1f}s", file=sys.stderr)

    bs = int(os.environ.get("BENCH_BATCH", "6144"))
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    mapper = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))
    pm = PairedGiraffeMapper(mapper)
    pairs = B.simulate_pairs(rng, haps, bs * (nb + 1))
    pm.map_pairs(pairs[:bs])                    # warmup + fragdist
    pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))  # compile

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    for k in range(nb):
        batch = pairs[bs * (k + 1) : bs * (k + 2)]
        pm.stage_emit(pm.stage_rescue(pm.stage_score(batch)))
    prof.disable()
    dt = time.time() - t0
    n = 2 * bs * nb
    print(f"{n} reads in {dt:.2f}s sequential = {n/dt:.0f} reads/s "
          f"({1e6*dt/n:.1f} us/read)", file=sys.stderr)
    ss = pm.stage_seconds
    print("stage split us/read: " + " ".join(
        f"{k}={1e6*v/max(pm.stage_reads,1):.1f}" for k, v in ss.items()),
        file=sys.stderr)
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative").print_stats(45)
    print(s.getvalue())


if __name__ == "__main__":
    main()
