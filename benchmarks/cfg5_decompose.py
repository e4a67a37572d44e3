"""Decompose config-5 (16^3 spin-glass) ms/sweep into sweep-kernel vs
overlap-event vs glue cost: times the same model with no overlap moves,
interval=100, and interval=10 (the driver config), interleaved in one
process.  The megapair kernel alone measures ~0.008 ms/sweep
(benchmarks/megapair_kernel_ab.py), so whatever remains is engine glue."""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build(overlap_interval, n_sweeps, seed=5):
    from peapods_tpu import Ising

    model = Ising((16, 16, 16), couplings="gaussian",
                  temperatures=np.geomspace(0.8, 2.0, 24), n_replicas=4,
                  n_disorder=8, seed=seed)
    kw = dict(pt_interval=1, pt_schedule="full_ladder")
    if overlap_interval:
        kw.update(overlap_cluster_update_interval=overlap_interval,
                  overlap_cluster_build_mode="jorg+cmr")
    return model, kw


def main():
    reps = int(os.environ.get("REPS", "3"))
    arms = {}
    specs = {"none": (None, 512), "i100": (100, 500), "i10": (10, 500)}
    for name, (interval, n_sweeps) in specs.items():
        model, kw = build(interval, n_sweeps)
        model.sample(n_sweeps, warmup_ratio=0.0, **kw)  # compile warm
        arms[name] = (model, kw, n_sweeps, [])
    for _ in range(reps):
        for name in specs:
            model, kw, n_sweeps, times = arms[name]
            t0 = time.perf_counter()
            model.sample(n_sweeps, warmup_ratio=0.0, **kw)
            times.append((time.perf_counter() - t0) / n_sweeps * 1e3)
    for name in specs:
        _, _, n_sweeps, times = arms[name]
        print(json.dumps({
            "arm": name, "ms_per_sweep_median": float(np.median(times)),
            "reps": [round(t, 4) for t in times],
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
