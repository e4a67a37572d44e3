"""In-process A/B of cluster-statistics collection cost on the fused paths.

Round-4 change: collect-stats runs no longer gate off the fused FK /
pair-event kernels — the kernels emit their resident CC labels and
CSD/top4 derive in jnp (the reference collects inline at modest cost,
fk.rs:86-142 / overlap.rs:146-339).  This measures what collection now
costs end-to-end:

  * config-3 class (256^2 SW every sweep) with collect on/off
  * config-5 class (16^3 jorg+cmr full-ladder) with collect on/off

Target (VERDICT r3 item 5): collect within ~2x of the no-stats path.
Arms are built and timed interleaved in one process per CLAUDE.md's chip
drift discipline.  Run on the real TPU, serialized.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5


def bench(tag, build, n_sweeps):
    arms = {c: build(c, n_sweeps) for c in (False, True)}
    plans = {}
    for c, (model, kw) in arms.items():
        prog = next(iter(model._sim._programs.values()))
        plans["collect" if c else "plain"] = prog.describe_plan()
    times = {False: [], True: []}
    for _ in range(REPS):
        for c, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[c].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    plain = float(np.median(times[False]))
    collect = float(np.median(times[True]))
    print(json.dumps({
        "section": "stats_ab", "case": tag,
        "collect_ms_per_sweep": round(collect, 3),
        "plain_ms_per_sweep": round(plain, 3),
        "overhead_x": round(collect / plain, 2),
        "plans": plans,
        "raw_collect": [round(x, 2) for x in times[True]],
        "raw_plain": [round(x, 2) for x in times[False]],
    }), flush=True)


def build_fk(collect, n_sweeps):
    from peapods_tpu import Ising

    model = Ising((256, 256), temperatures=np.array([2.269185]), seed=3)
    kw = dict(cluster_update_interval=1, cluster_mode="sw",
              collect_cluster_stats=collect, warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)  # warm = compile
    return model, kw


def build_cfg5(collect, n_sweeps):
    from peapods_tpu import Ising

    model = Ising((16, 16, 16), couplings="gaussian",
                  temperatures=np.geomspace(0.8, 2.0, 24), n_replicas=4,
                  n_disorder=8, seed=5)
    kw = dict(pt_interval=1, pt_schedule="full_ladder",
              overlap_cluster_update_interval=10,
              overlap_cluster_build_mode="jorg+cmr",
              collect_cluster_stats=collect, warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)
    return model, kw


def main():
    quick = "--quick" in sys.argv
    import jax

    print("devices:", jax.devices(), flush=True)
    bench("fk_256_sw", build_fk, 32 if quick else 128)
    bench("cfg5_16c_events", build_cfg5, 256 if quick else 1024)


if __name__ == "__main__":
    main()
