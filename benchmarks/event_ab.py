"""In-process A/B of the fused overlap-event kernel (ops/pallas_event.py).

Times driver configs 4 (8^3 Houdayer) and 5 (16^3 Jorg+CMR) with the event
kernel enabled vs disabled (PEAPODS_DISABLE_EVENTKERNEL), reps interleaved
in one process per CLAUDE.md's drift discipline.  Prints one JSON line per
(config, arm) with the median ms/sweep.

Run on the real TPU, serialized (no concurrent TPU processes).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build(config, seed):
    from peapods_tpu import Ising

    if config == 4:
        model = Ising((8, 8, 8), couplings="bimodal",
                      temperatures=np.geomspace(0.9, 2.2, 24), n_replicas=4,
                      n_disorder=8, seed=seed)
        kw = dict(pt_interval=1, overlap_cluster_update_interval=10,
                  overlap_cluster_build_mode="houdayer")
        n_sweeps = 1024
    else:
        model = Ising((16, 16, 16), couplings="gaussian",
                      temperatures=np.geomspace(0.8, 2.0, 24), n_replicas=4,
                      n_disorder=8, seed=seed)
        kw = dict(pt_interval=1, pt_schedule="full_ladder",
                  overlap_cluster_update_interval=10,
                  overlap_cluster_build_mode="jorg+cmr")
        n_sweeps = 256
    return model, kw, n_sweeps


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="4,5")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    for config in [int(c) for c in args.configs.split(",")]:
        arms = {}
        for arm, disable in (("fused", "0"), ("staged", "1")):
            os.environ["PEAPODS_DISABLE_EVENTKERNEL"] = disable
            model, kw, n_sweeps = build(config, seed=config)
            # warm compile at the timed sweep count (one scan program per
            # chunk length)
            model.sample(n_sweeps, warmup_ratio=0.0, **kw)
            arms[arm] = (model, kw, n_sweeps, [])
        for _ in range(args.reps):
            for arm in ("fused", "staged"):
                model, kw, n_sweeps, times = arms[arm]
                t0 = time.perf_counter()
                model.sample(n_sweeps, warmup_ratio=0.0, **kw)
                times.append((time.perf_counter() - t0) / n_sweeps * 1e3)
        for arm in ("fused", "staged"):
            _, _, n_sweeps, times = arms[arm]
            print(json.dumps({
                "config": config, "arm": arm,
                "ms_per_sweep_median": float(np.median(times)),
                "reps": [round(t, 4) for t in times],
            }))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
