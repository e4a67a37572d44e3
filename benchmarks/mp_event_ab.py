"""Interleaved A/B: in-kernel megapair overlap events vs the interleaved
path (kernel call A / fused event kernel / jnp PT mirror / call B).

Drives the full engine at the two spin-glass driver configs
(benchmarks/driver_configs.py 4 and 5) with ``PEAPODS_MP_EVENT`` flipped
per arm at model-construction time, arms alternating within one process so
chip drift cannot bias the comparison (CLAUDE.md).  Decides the default of
the PEAPODS_MP_EVENT kill switch.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5
QUICK = "--quick" in sys.argv


def build(mp_event, config):
    os.environ["PEAPODS_MP_EVENT"] = mp_event
    from peapods_tpu import Ising

    if config == 4:
        model = Ising((8, 8, 8), couplings="bimodal",
                      temperatures=np.geomspace(0.9, 2.2, 24), n_replicas=4,
                      n_disorder=8, seed=4)
        kw = dict(pt_interval=1, overlap_cluster_update_interval=10,
                  overlap_cluster_build_mode="houdayer")
        n_sweeps = 200 if QUICK else 1000
    else:
        model = Ising((16, 16, 16), couplings="gaussian",
                      temperatures=np.geomspace(0.8, 2.0, 24), n_replicas=4,
                      n_disorder=8, seed=5)
        kw = dict(pt_interval=1, pt_schedule="full_ladder",
                  overlap_cluster_update_interval=10,
                  overlap_cluster_build_mode="jorg+cmr")
        n_sweeps = 100 if QUICK else 500
    # warm = compile (same sweep count as the timed run, CLAUDE.md)
    model.sample(n_sweeps, warmup_ratio=0.0, **kw)
    return model, kw, n_sweeps


def bench(config):
    arm_on = build("1", config)
    arm_off = build("0", config)
    times = {"1": [], "0": []}
    for _ in range(REPS):
        for tag, (model, kw, n_sweeps) in (("1", arm_on), ("0", arm_off)):
            t0 = time.perf_counter()
            model.sample(n_sweeps, warmup_ratio=0.0, **kw)
            times[tag].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    on = np.median(times["1"])
    off = np.median(times["0"])
    print(f"config {config}: mp_event=1 {on:.3f} ms/sweep  "
          f"mp_event=0 {off:.3f} ms/sweep  ({off / on:.2f}x)  "
          f"raw_on={['%.2f' % x for x in times['1']]} "
          f"raw_off={['%.2f' % x for x in times['0']]}")


if __name__ == "__main__":
    import jax

    print("devices:", jax.devices())
    bench(4)
    bench(5)
