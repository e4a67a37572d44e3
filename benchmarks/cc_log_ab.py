"""In-process A/B of the log-doubling CC fixed-point body
(``PEAPODS_CC_LOG=1``, ops/pallas_cc_batch.py ``cc_fixed_point``) inside
the fused FK kernel and the fused overlap-event kernel.

The classic body propagates labels one hop per round (rounds ~ cluster
diameter); the log-doubling variant also pulls each site's label through
its current label's position, collapsing chains in O(log diameter)
rounds at the cost of a gather per round.  Labels are the same fixed
point bitwise (pinned by tests/test_cc_batch.py), so this is purely a
throughput decision.

Workloads: the FK-dominated harness rows (64^2, 16T, SW every sweep —
the CC fixed point is the measured remaining gap to the Metropolis row,
docs/performance.md round-4 decomposition) and the config-5 overlap mix
(16^3, Jorg+CMR events).  Arms are built and timed interleaved in one
process per CLAUDE.md's chip drift discipline.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5
SMOKE = "--smoke" in sys.argv  # tiny CPU-interpret pass: script validity


def _set(flag):
    # "0" must be set explicitly (the log body is the default now)
    os.environ["PEAPODS_CC_LOG"] = flag


def build_fk(flag, n_realizations, n_sweeps):
    _set(flag)
    from peapods_tpu import Ising

    model = Ising(
        (8, 24) if SMOKE else (64, 64),
        temperatures=np.geomspace(0.1, 10, 2 if SMOKE else 16),
        n_disorder=n_realizations,
        seed=3,
    )
    kw = dict(cluster_update_interval=1, cluster_mode="sw",
              warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)
    return model, kw


def build_fk_tc(flag, n_realizations, n_sweeps):
    """Config 3: 256^2 SW at T_c — spanning clusters, the most
    diameter-bound CC workload (single graph per sweep, kp=ks=1)."""
    _set(flag)
    from peapods_tpu import Ising

    t_c = 2.0 / np.log(1.0 + np.sqrt(2.0))
    model = Ising(
        (8, 128) if SMOKE else (256, 256),
        temperatures=np.array([t_c], np.float32),
        seed=3,
    )
    kw = dict(cluster_update_interval=1, cluster_mode="sw",
              warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)
    return model, kw


def build_event(flag, n_realizations, n_sweeps):
    _set(flag)
    from peapods_tpu import Ising

    model = Ising(
        (8, 8, 8) if SMOKE else (16, 16, 16),
        couplings="gaussian",
        temperatures=np.geomspace(0.8, 2.0, 4 if SMOKE else 24),
        n_replicas=4,
        n_disorder=n_realizations,
        seed=5,
    )
    kw = dict(pt_interval=1, pt_schedule="full_ladder",
              overlap_cluster_update_interval=10,
              overlap_cluster_build_mode="jorg+cmr",
              warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)
    return model, kw


ARMS = tuple(
    (os.environ.get("PEAPODS_CC_AB_ARMS") or "0,1,2,4").split(",")
)  # classic, log body at k rounds/check, and/or "mix" (hybrid)


def bench(section, builder, n_realizations, n_sweeps):
    arms = {f: builder(f, n_realizations, n_sweeps) for f in ARMS}
    _set("0")
    times = {f: [] for f in ARMS}
    for _ in range(REPS):
        for tag, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[tag].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    med = {f: float(np.median(times[f])) for f in ARMS}
    print(json.dumps({
        "section": "cc_log_ab", "case": section,
        "ms_per_sweep": {f: round(med[f], 3) for f in ARMS},
        "speedup_vs_classic": {
            f: round(med["0"] / med[f], 2) for f in ARMS if f != "0"
        },
        "raw": {f: [round(x, 3) for x in times[f]] for f in ARMS},
    }), flush=True)


def main():
    quick = "--quick" in sys.argv
    import jax

    if SMOKE:
        os.environ["PEAPODS_PALLAS_INTERPRET"] = "1"
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)
    if SMOKE:
        global REPS
        REPS = 1
        bench("fk_sw_64sq", build_fk, 2, 4)
        bench("fk_256_tc", build_fk_tc, 1, 2)
        bench("event_cfg5", build_event, 2, 4)
        return
    bench("fk_sw_64sq", build_fk, 32 if quick else 128,
          64 if quick else 256)
    bench("fk_256_tc", build_fk_tc, 1, 64 if quick else 256)
    bench("event_cfg5", build_event, 8, 100 if quick else 500)


if __name__ == "__main__":
    main()
