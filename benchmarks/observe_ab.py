"""In-process A/B of full observe mode on the fused kernels (round 5).

Round 5 put full observe (bond-fraction + winding) on the fused FK and
pair-event kernels: the kernel emits its resident CC labels AND bond masks,
the flipped spins are discarded, and the observables derive in jnp — the
observed graphs ride the production hardware-PRNG stream instead of the
staged path's threefry twin.  This measures the cost:

* ``fk``: 256^2 ferro SW at T_c (config 3's lattice) — observe every
  sweep; arms: no observer / fused observe / staged observe
  (``PEAPODS_DISABLE_FKKERNEL=1``).
* ``event``: 16^3 Gaussian glass, jorg+cmr events every 2 sweeps (config
  5's mix) — arms: no observer / fused observe / staged observe
  (``PEAPODS_DISABLE_EVENTKERNEL=1``).

Decision targets: fused observe <= ~2x the no-observer run (the round-4
collect bound), and fused observe faster than staged observe.  Arms build
first, then time interleaved (CLAUDE.md chip-drift discipline).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5
SMOKE = "--smoke" in sys.argv


def build_fk(arm, n_sweeps):
    os.environ.pop("PEAPODS_DISABLE_FKKERNEL", None)
    if arm == "staged":
        os.environ["PEAPODS_DISABLE_FKKERNEL"] = "1"
    from peapods_tpu import Ising

    t_c = 2.0 / np.log(1.0 + np.sqrt(2.0))
    model = Ising(
        (8, 128) if SMOKE else (256, 256),
        temperatures=np.array([t_c], np.float32),
        seed=3,
    )
    kw = dict(warmup_ratio=0.0)
    if arm != "none":
        kw.update(cluster_update_interval=1, cluster_mode="sw",
                  cluster_action="observe")
    model.sample(n_sweeps, "metropolis", **kw)
    os.environ.pop("PEAPODS_DISABLE_FKKERNEL", None)
    return model, kw


def build_event(arm, n_sweeps):
    os.environ.pop("PEAPODS_DISABLE_EVENTKERNEL", None)
    if arm == "staged":
        os.environ["PEAPODS_DISABLE_EVENTKERNEL"] = "1"
    from peapods_tpu import Ising

    model = Ising(
        (8, 8, 8) if SMOKE else (16, 16, 16),
        couplings="gaussian",
        temperatures=np.geomspace(0.8, 2.0, 4 if SMOKE else 24),
        n_replicas=4,
        n_disorder=2 if SMOKE else 8,
        seed=5,
    )
    kw = dict(pt_interval=1, pt_schedule="full_ladder", warmup_ratio=0.0)
    if arm != "none":
        kw.update(overlap_cluster_update_interval=2,
                  overlap_cluster_build_mode="jorg+cmr",
                  overlap_cluster_mode="sw",
                  overlap_cluster_action="observe")
    model.sample(n_sweeps, "metropolis", **kw)
    os.environ.pop("PEAPODS_DISABLE_EVENTKERNEL", None)
    return model, kw


ARMS = ("none", "fused", "staged")


def bench(section, builder, n_sweeps):
    # build all arms first (each with its env), then time interleaved;
    # sample() re-dispatches through the cached per-config program, so the
    # env at build time decides the path for the arm's lifetime
    arms = {}
    for arm in ARMS:
        arms[arm] = builder(arm, n_sweeps)
    times = {a: [] for a in ARMS}
    for _ in range(REPS):
        for arm, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[arm].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    med = {a: float(np.median(times[a])) for a in ARMS}
    print(json.dumps({
        "section": "observe_ab", "case": section,
        "ms_per_sweep": {a: round(med[a], 3) for a in ARMS},
        "fused_cost_x": round(med["fused"] / med["none"], 2),
        "fused_vs_staged": round(med["staged"] / med["fused"], 2),
        "raw": {a: [round(x, 3) for x in times[a]] for a in ARMS},
    }), flush=True)


def main():
    global REPS
    import jax

    if SMOKE:
        os.environ["PEAPODS_PALLAS_INTERPRET"] = "1"
        jax.config.update("jax_platforms", "cpu")
        REPS = 1
    print("devices:", jax.devices(), flush=True)
    quick = "--quick" in sys.argv
    if SMOKE:
        bench("fk_256_tc_observe", build_fk, 2)
        bench("event_cfg5_observe", build_event, 4)
        return
    bench("fk_256_tc_observe", build_fk, 64 if quick else 256)
    bench("event_cfg5_observe", build_event, 100 if quick else 300)


if __name__ == "__main__":
    main()
