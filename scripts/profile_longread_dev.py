"""Instrument the long-read TPU link engine: where does the device
path's time go (native chain/collect, host prep, device DP + transfer,
fallback, stitch) vs the fused host pipeline? Evidence base for the
engine default (VERDICT r4 item 3 / r5 writeup)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import bench

    on_tpu, _ = bench.init_backend()
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fastq import Read
    from vg_tpu.map.longread import LongReadMapper, LongReadParams
    from vg_tpu.utils import dna

    rng = np.random.default_rng(42)
    g, results, vcf = bench.make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    T = len(haps.text)
    reads = []
    for i in range(512):
        s = int(rng.integers(0, T - 10100))
        c = haps.text[s : s + 10000].copy()
        err = rng.random(len(c)) < 0.005
        c[err] = (c[err] + rng.integers(1, 4, int(err.sum()))) % 4
        reads.append(Read(name=f"lr{i}", sequence=dna.decode(c),
                          quality=""))

    host = LongReadMapper(haps, idx)
    host.map_batch_encoded(reads[:16])
    t0 = time.time()
    r_h = host.map_batch_encoded(reads[16:])
    t_host = time.time() - t0
    print(f"host fused pipeline: {len(r_h)/t_host:.0f} reads/s "
          f"({t_host:.2f}s)")

    dev = LongReadMapper(haps, idx, LongReadParams(engine="device"))
    codes_list = [dna.encode(r.sequence) for r in reads[16:]]
    dev.map_batch_encoded(reads[16:])       # warm compiles

    # instrumented replay of _device_batch
    from vg_tpu.native import (native_global_align_batch,
                               native_longread_chains,
                               native_longread_collect_links,
                               native_longread_stitch)

    p = dev.params
    t = {}
    tt = time.time()
    ch = native_longread_chains(codes_list, dev.index, p, p.chain)
    t["chains"] = time.time() - tt
    chain_read, chain_rev, anc_off, roffs, tposs = ch
    tt = time.time()
    cl = native_longread_collect_links(
        codes_list, chain_read, chain_rev, anc_off, roffs, tposs,
        dev.index.k, haps.text, haps.text_start, dev.scoring, p)
    t["collect"] = time.time() - tt
    chain_task_off, tasks = cl
    nt = len(tasks)
    dla = dev._device_aligner()
    tt = time.time()
    read_off = np.zeros(len(codes_list) + 1, np.int64)
    np.cumsum([len(c) for c in codes_list], out=read_off[1:])
    fwd_blob = np.concatenate(codes_list)
    rc_blob = np.concatenate([dna.revcomp_codes(c) for c in codes_list])
    nb = len(fwd_blob)
    task_ci = np.searchsorted(chain_task_off[1:], np.arange(nt),
                              side="right")
    task_ri = np.asarray(chain_read)[task_ci].astype(np.int64)
    task_rev = np.asarray(chain_rev)[task_ci].astype(bool)
    ra, la, ta, lb = (tasks[:, 0], tasks[:, 1], tasks[:, 2], tasks[:, 3])
    base = read_off[task_ri] + ra + np.where(task_rev, nb, 0)
    LAMAX = int(min(max(dla.buckets), max(int(la.max()), 1)))
    blob = np.concatenate([fwd_blob, rc_blob])
    idx2 = base[:, None] + np.arange(LAMAX, dtype=np.int64)[None]
    a_rows = blob[np.clip(idx2, 0, len(blob) - 1)]
    a_rows[np.arange(LAMAX)[None] >= la[:, None]] = 0
    t["hostprep"] = time.time() - tt

    # device call, split into dispatch vs fetch by doing it twice:
    # align_runs_arrays is sync (np.asarray inside), so time is
    # dispatch+transfer+compute+decode together; separate the pure
    # engine call (to np.asarray) from the run-length decode by timing
    # a raw engine invocation per bucket first
    import jax.numpy as jnp

    d = lb - la
    base_ok = (la > 0) & (lb > 0) & (np.abs(d) <= 2 * dla.B)
    assigned = np.zeros(nt, bool)
    nibs = np.arange(8, dtype=np.uint32) * 4
    from vg_tpu.ops.device_links import link_engine, _round_up

    for RMAX in dla.buckets:
        sel = np.nonzero(base_ok & ~assigned & (la <= RMAX))[0]
        assigned[base_ok & (la <= RMAX)] = True
        if not len(sel):
            continue
        N = max(1 << int(np.ceil(np.log2(max(len(sel), 1)))), 1024)
        WB = 4 * dla.B + 1
        a_pad = np.zeros((N, RMAX), np.uint8)
        w = min(RMAX, a_rows.shape[1])
        a_pad[: len(sel), :w] = a_rows[sel, :w]
        colm = np.arange(RMAX)[None, :] >= la[sel, None]
        a_pad[: len(sel)][colm[:, :RMAX]] = 0
        tt = time.time()
        a4 = (a_pad.reshape(N, RMAX // 8, 8).astype(np.uint32)
              << nibs[None, None]).sum(axis=2, dtype=np.uint32)
        t[f"pack{RMAX}"] = time.time() - tt
        la_a = np.zeros(N, np.int32)
        ta_a = np.zeros(N, np.int32)
        ba_a = np.zeros(N, np.int32)
        lb_a = np.ones(N, np.int32)
        la_a[: len(sel)] = la[sel]
        ta_a[: len(sel)] = ta[sel]
        lb_a[: len(sel)] = lb[sel]
        ba_a[: len(sel)] = np.minimum(0, d[sel]) - dla.B
        sc = dla.sc
        args = (jnp.asarray(a4.view(np.int32)), jnp.asarray(la_a),
                jnp.asarray(ta_a), jnp.asarray(ba_a), jnp.asarray(lb_a))
        kw = dict(RMAX=RMAX, WB=WB, T=dla.T, match=sc.match,
                  mismatch=sc.mismatch, gap_open=sc.gap_open,
                  gap_extend=sc.gap_extend)
        # dispatch only (async)
        tt = time.time()
        out = link_engine()(*args, dla.text_packed, **kw)
        t[f"dispatch{RMAX}_N{N}"] = time.time() - tt
        tt = time.time()
        outs = [np.asarray(x) for x in out]
        t[f"fetch{RMAX}"] = time.time() - tt
        STEPS = _round_up(RMAX + WB + 64, 8)
        up_mb = a4.nbytes / 1e6
        down_mb = sum(x.nbytes for x in outs) / 1e6
        print(f"bucket {RMAX}: {len(sel)} tasks (N={N}) "
              f"up={up_mb:.2f}MB down={down_mb:.2f}MB STEPS={STEPS}")

    tt = time.time()
    dres, dscores, druns, dcounts = dla.align_runs_arrays(
        a_rows, la, ta, lb)
    t["align_runs_total"] = time.time() - tt
    fb_idx = np.nonzero(~dres)[0]
    tt = time.time()
    if len(fb_idx):
        native_global_align_batch(
            [blob[int(base[k]) : int(base[k]) + int(la[k])]
             for k in fb_idx],
            [haps.text[int(ta[k]) : int(ta[k]) + int(lb[k])]
             for k in fb_idx],
            dev.scoring)
    t["fallback"] = time.time() - tt
    print(f"tasks={nt} resolved_dev={int(dres.sum())} "
          f"fallback={len(fb_idx)}")
    for k, v in t.items():
        print(f"  {k}: {v*1e3:.0f} ms")

    t0 = time.time()
    r_d = dev.map_batch_encoded(reads[16:])
    t_dev = time.time() - t0
    ident = all(bytes(x) == bytes(y) for x, y in zip(r_h, r_d))
    print(f"device end-to-end: {len(r_d)/t_dev:.0f} reads/s "
          f"({t_dev:.2f}s) identical={ident}")


if __name__ == "__main__":
    main()
