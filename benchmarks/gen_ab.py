"""In-process A/B of the generic-offset sweep kernel (round 5,
``pallas_sweep_diag.sweep_gen*``) on the real chip.

Three measurements:

* ``nnn_64sq``: next-nearest-neighbor square (the custom-offset class the
  reference's ``with_offsets`` API advertises) — kernel vs jnp roll path
  (``PEAPODS_DISABLE_GEN=1``).
* ``knight_64sq``: knight-move offsets (multi-step shifts, 5-color
  period-8 table) — kernel vs jnp.
* ``gen_vs_fcc``: FCC 16^3 through the GENERIC kernel (dedicated kernel
  disabled) vs the dedicated FCC kernel — the generic machinery's
  overhead on a geometry with a specialized path (expect ~1x; the bodies
  are the same composed shifts).

Arms build first, then time interleaved (CLAUDE.md chip drift
discipline).
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

NNN = [[1, 0], [0, 1], [1, 1], [1, -1]]
KNIGHT = [[1, 2], [2, 1]]


def build(env, shape, offsets, n_sweeps, geometry=None):
    for k, v in env.items():
        os.environ[k] = v
    from peapods_tpu import Ising

    kw_model = dict(
        couplings="bimodal",
        temperatures=np.geomspace(1.5, 6.0, 8 if SMOKE else 16),
        seed=2,
    )
    if geometry is not None:
        model = Ising(shape, geometry=geometry, **kw_model)
    else:
        model = Ising(shape, neighbor_offsets=offsets, **kw_model)
    kw = dict(pt_interval=1, warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)  # warm = compile
    for k in env:
        os.environ.pop(k, None)
    plan = next(iter(model._sim._programs.values())).describe_plan()
    return model, kw, plan


def bench(tag, arms, n_sweeps):
    built = {}
    for name, spec in arms.items():
        env, shape, offsets = spec[0], spec[1], spec[2]
        geometry = spec[3] if len(spec) > 3 else None
        built[name] = build(env, shape, offsets, n_sweeps,
                            geometry=geometry)
    times = {name: [] for name in built}
    for _ in range(REPS):
        for name, (model, kw, _plan) in built.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[name].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    med = {n: float(np.median(times[n])) for n in built}
    names = list(built)
    print(json.dumps({
        "section": "gen_ab", "case": tag,
        "ms_per_sweep": {n: round(med[n], 4) for n in names},
        "speedup": round(med[names[1]] / med[names[0]], 2),
        "plans": {n: built[n][2] for n in names},
        "raw": {n: [round(x, 3) for x in times[n]] for n in names},
    }), flush=True)


def main():
    global REPS
    import jax

    if SMOKE:
        os.environ["PEAPODS_PALLAS_INTERPRET"] = "1"
        jax.config.update("jax_platforms", "cpu")
        REPS = 1
    print("devices:", jax.devices(), flush=True)
    n = 4 if SMOKE else 256
    sq = (8, 16) if SMOKE else (64, 64)
    bench("nnn_64sq", {
        "kernel": ({}, sq, NNN),
        "jnp": ({"PEAPODS_DISABLE_GEN": "1"}, sq, NNN),
    }, n)
    bench("knight_64sq", {
        "kernel": ({}, sq, KNIGHT),
        "jnp": ({"PEAPODS_DISABLE_GEN": "1"}, sq, KNIGHT),
    }, n)
    cube = (8, 8, 8) if SMOKE else (16, 16, 16)
    bench("gen_vs_fcc", {
        "generic": ({"PEAPODS_DISABLE_DIAG": "1"}, cube, None, "fcc"),
        "dedicated": ({}, cube, None, "fcc"),
    }, n)


if __name__ == "__main__":
    main()
