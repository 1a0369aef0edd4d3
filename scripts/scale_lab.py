"""Iterate on the 1 Gbp throughput collapse with a DISK-CACHED fixture.

First run builds the 50 Mbp x 21-haplotype pangenome (+ index) and saves
it under CACHE_DIR (~5 min); later runs load in seconds. Pairs are
pre-generated OUTSIDE all timers. Reports a fine-grained score-stage
split plus the pipelined rate.

Run:  python scripts/scale_lab.py [n_batches] [batch_pairs]
Env:  SCALE_CACHE=/tmp/scale_cache  SCALE_MBP=50  SCALE_SAMPLES=10
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("SCALE_CACHE", "/tmp/scale_cache")


def get_fixture():
    import bench as B

    return B.scale_fixture(
        cache_dir=CACHE,
        ref_mbp=float(os.environ.get("SCALE_MBP", "50")),
        n_samples=int(os.environ.get("SCALE_SAMPLES", "10")))


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax

    import bench as B
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.parallel.pipeline import map_pairs_encoded_mt

    haps, idx = get_fixture()
    rng = np.random.default_rng(11)
    m = GiraffeMapper(haps, idx, GiraffeParams(
        batch_reads=bs, mem_fallback=False))   # SA build excluded: lab
    pm = PairedGiraffeMapper(m)

    t0 = time.time()
    pairs = B.simulate_pairs(rng, haps, bs * 8)
    print(f"[lab] simulated {bs*8} pairs in {time.time()-t0:.1f}s",
          flush=True)
    pm.map_pairs(pairs[:bs])                       # warmup + fragdist
    pm.stage_emit(pm.stage_rescue(pm.stage_score(pairs[:bs])))

    # fine-grained score-stage split on 3 warm batches
    from vg_tpu.ops.xfer import pack_reads4, pack_wire

    for rep in (1, 2, 3):
        b = pairs[bs * rep : bs * (rep + 1)]
        t0 = time.time()
        p1 = m.prepare_batch([a for a, _ in b])
        t1 = time.time()
        p2 = m.prepare_batch([x for _, x in b])
        t2 = time.time()
        it = pm.stage_score(b)       # includes a redundant prepare; ok
        t3 = time.time()
        if it[0] == "dev":
            jax.block_until_ready(it[2][2][1])
        t4 = time.time()
        it = pm.stage_rescue(it)
        recs = pm.stage_emit(it)
        t5 = time.time()
        print(f"[lab] prep1={t1-t0:.3f} prep2={t2-t1:.3f} "
              f"score_full={t3-t2:.3f} dev_block={t4-t3:.3f} "
              f"resc+emit={t5-t4:.3f}", flush=True)

    # pipelined throughput on pre-generated pairs
    t0 = time.time()
    n = 0
    for recs in map_pairs_encoded_mt(
            pm, (pairs[bs * (k % 7 + 1) : bs * (k % 7 + 2)]
                 for k in range(n_batches))):
        n += len(recs)
    dt = time.time() - t0
    print(f"[lab] pipelined: {n} reads in {dt:.2f}s = {n/dt:.0f} reads/s",
          flush=True)
    st = pm.stage_seconds
    nr = max(pm.stage_reads, 1)
    print(f"[lab] stage us/read: score={1e6*st['score']/nr:.1f} "
          f"rescue={1e6*st['rescue']/nr:.1f} emit={1e6*st['emit']/nr:.1f} "
          f"dev_wait={1e6*st['dev_wait']/nr:.1f}", flush=True)


if __name__ == "__main__":
    main()
