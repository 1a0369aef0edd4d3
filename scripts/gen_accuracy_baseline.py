"""Generate ACCURACY_BASELINE.json — the rolling accuracy-regression
baseline (reference analogue: vgci/vgci.py:56-59,70,153, which diffs
every CI run against an S3-hosted baseline with drift thresholds).

Reproduces exactly the three fixed-seed mapeval runs bench.py executes
(seeds 17 / 19 / 31 on the bench pangenome fixture) and pins their
accuracy numbers. bench.py then reports `vs_accuracy_baseline` deltas
in the result JSON and flags drift beyond tolerance (accuracy 0.005,
matching the reference's `worse_threshold`).

Run on the same backend the driver benches on (the TPU chip) so the
pinned numbers match driver conditions:

    python scripts/gen_accuracy_baseline.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import bench

    on_tpu, note = bench.init_backend()
    sys.stderr.write(f"[gen] backend: {'tpu' if on_tpu else 'cpu'}"
                     f"{' (' + note + ')' if note else ''}\n")
    from vg_tpu.eval.mapeval import run_mapeval
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    rng = np.random.default_rng(42)
    g, results, vcf = bench.make_pangenome(rng)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    bs = int(os.environ.get("BENCH_BATCH", "6144"))
    mapper = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs))

    res = run_mapeval(mapper, n_reads=1000, with_quality=True, seed=17)
    res_i = run_mapeval(mapper, n_reads=500, error_rate=0.005,
                        indel_rate=0.01, seed=19)
    res_h = run_mapeval(mapper, n_reads=1000, read_length=60,
                        error_rate=0.05, with_quality=True, seed=31)

    out = {
        "accuracy": round(res.accuracy, 6),
        "indel_accuracy": round(res_i.accuracy, 6),
        "hard_accuracy": round(res_h.accuracy, 6),
        "wrong_mapq60": res.wrong_mapq60 + res_h.wrong_mapq60,
        "roc": {str(t): [a, n] for t, a, n in res.roc},
        "hard_roc": {str(t): [a, n] for t, a, n in res_h.roc},
        "backend": "tpu" if on_tpu else "cpu",
        "fixture": "bench.make_pangenome(seed=42), seeds 17/19/31",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ACCURACY_BASELINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    sys.stderr.write(f"[gen] wrote {path}:\n")
    sys.stderr.write(json.dumps(
        {k: v for k, v in out.items() if k not in ("roc", "hard_roc")},
        indent=1) + "\n")


if __name__ == "__main__":
    main()
