"""In-process A/B of the BCC/FCC sweep kernels (ops/pallas_sweep_diag.py)
against the jnp roll path (``PEAPODS_DISABLE_DIAG=1``) — the last named
geometries without a Pallas sweep path before late round 4.

Cases: 8^3 with a 16-temperature PT ladder for both geometries (the
validation scripts' lattice class; kp=2 lane packing), plus a 16^3 FCC
case (kp=1 — one system fills the lanes).  Arms are built and timed
interleaved in one process per CLAUDE.md's chip drift discipline.  Run on
the real TPU, serialized.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5


def build(disable, geometry, shape, n_sweeps):
    os.environ["PEAPODS_DISABLE_DIAG"] = disable
    from peapods_tpu import Ising

    model = Ising(shape, geometry=geometry, couplings="bimodal",
                  temperatures=np.geomspace(2.0, 10.0, 16), seed=2)
    kw = dict(pt_interval=1, warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)  # warm = compile
    return model, kw


def bench(tag, geometry, shape, n_sweeps):
    arms = {d: build(d, geometry, shape, n_sweeps) for d in ("0", "1")}
    plans = {}
    for d, (model, _kw) in arms.items():
        prog = next(iter(model._sim._programs.values()))
        plans[d] = prog.describe_plan()
    times = {"0": [], "1": []}
    for _ in range(REPS):
        for d, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[d].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    kern = float(np.median(times["0"]))
    jnp_ = float(np.median(times["1"]))
    print(json.dumps({
        "section": "diag_ab", "case": tag,
        "kernel_ms_per_sweep": round(kern, 4),
        "jnp_ms_per_sweep": round(jnp_, 4),
        "speedup": round(jnp_ / kern, 2),
        "plans": plans,
        "raw_kernel": [round(x, 3) for x in times["0"]],
        "raw_jnp": [round(x, 3) for x in times["1"]],
    }), flush=True)


def main():
    quick = "--quick" in sys.argv
    n_sweeps = 512 if quick else 2048
    import jax

    print("devices:", jax.devices(), flush=True)
    bench("bcc_8", "bcc", (8, 8, 8), n_sweeps)
    bench("fcc_8", "fcc", (8, 8, 8), n_sweeps)
    bench("fcc_16", "fcc", (16, 16, 16), n_sweeps)


if __name__ == "__main__":
    main()
