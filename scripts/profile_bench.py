"""Profile the paired mapping hot path stage-by-stage (no thread overlap,
so per-stage wall time is attributable)."""
import os
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

    bs = int(os.environ.get("BENCH_BATCH", "2048"))
    params = GiraffeParams(batch_reads=bs)
    mapper = GiraffeMapper(haps, idx, params)
    pm = PairedGiraffeMapper(mapper)
    n_pairs = int(os.environ.get("BENCH_READS", "16384")) // 2
    pairs = B.simulate_pairs(rng, haps, n_pairs + bs)
    pm.map_pairs(pairs[:bs])  # warmup

    # stage timing: manual decomposition of map_pairs_encoded
    T = {"seed1": 0.0, "seed2": 0.0, "fetch": 0.0, "rescue": 0.0,
         "pair_select": 0.0, "emit": 0.0, "link": 0.0}
    t_all = time.time()
    total = 0
    for off in range(bs, len(pairs), bs):
        batch = pairs[off:off + bs]
        m = pm.mapper
        t = time.time(); sb1 = m.score_reads([a for a, _ in batch]); T["seed1"] += time.time() - t
        t = time.time(); sb2 = m.score_reads([b for _, b in batch]); T["seed2"] += time.time() - t
        t = time.time(); _ = sb1.scores; _ = sb2.scores; T["fetch"] += time.time() - t
        t = time.time(); pm._rescue(sb1, sb2); pm._rescue(sb2, sb1); T["rescue"] += time.time() - t
        t = time.time(); sel = pm._pair_select(sb1, sb2); T["pair_select"] += time.time() - t
        j1, j2, mq1, mq2, any1, any2, use_pair, frags = sel
        t = time.time()
        recs1 = m.emit_chosen_encoded(sb1, j1, mq1, any1)
        recs2 = m.emit_chosen_encoded(sb2, j2, mq2, any2)
        T["emit"] += time.time() - t
        t = time.time()
        from vg_tpu.io.wire import field_bytes, field_str
        out = []
        for i in range(len(batch)):
            nm1 = field_bytes(12, field_str(3, batch[i][1].name))
            nm2 = field_bytes(11, field_str(3, batch[i][0].name))
            out.append(bytes(recs1[i]) + nm1)
            out.append(bytes(recs2[i]) + nm2)
        T["link"] += time.time() - t
        total += 2 * len(batch)
    dt = time.time() - t_all
    print(f"total {total} reads in {dt:.2f}s = {total/dt:.0f} reads/s (serial)",
          file=sys.stderr)
    for k, v in T.items():
        print(f"  {k:12s} {v:6.2f}s  {v/dt*100:5.1f}%", file=sys.stderr)
    # funnel detail on seeding
    print(mapper.funnel.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
