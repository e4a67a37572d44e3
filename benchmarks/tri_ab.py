"""In-process A/B of the triangular-lattice sweep kernel at BASELINE
config 2 (32^2 triangular, Wolff clusters — the one driver config that had
no Pallas sweep path before round 4).

Arms: default (lane-packed triangular kernel, ``pallas-tri-packed``) vs
``PEAPODS_DISABLE_TRI=1`` (the jnp roll path).  A pure-Metropolis case
isolates the sweep kernel itself; the config-2 Wolff mix shows the
end-to-end effect (the FK phase rides the staged jnp path on triangular
either way).  Arms are built and timed interleaved in one process per
CLAUDE.md's chip drift discipline.  Run on the real TPU, serialized.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5


def build(disable, with_wolff, n_sweeps):
    os.environ["PEAPODS_DISABLE_TRI"] = disable
    from peapods_tpu import Ising

    model = Ising((32, 32), geometry="triangular",
                  temperatures=np.geomspace(3.0, 4.4, 8), seed=2)
    kw = dict(warmup_ratio=0.0)
    if with_wolff:
        kw.update(cluster_update_interval=2, cluster_mode="wolff")
    model.sample(n_sweeps, "metropolis", **kw)  # warm = compile
    return model, kw


def bench(tag, with_wolff, n_sweeps):
    arms = {d: build(d, with_wolff, n_sweeps) for d in ("0", "1")}
    times = {"0": [], "1": []}
    for _ in range(REPS):
        for d, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[d].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    kern = float(np.median(times["0"]))
    jnp_ = float(np.median(times["1"]))
    print(json.dumps({
        "section": "tri_ab", "case": tag,
        "kernel_ms_per_sweep": round(kern, 4),
        "jnp_ms_per_sweep": round(jnp_, 4),
        "speedup": round(jnp_ / kern, 2),
        "raw_kernel": [round(x, 3) for x in times["0"]],
        "raw_jnp": [round(x, 3) for x in times["1"]],
    }), flush=True)


def main():
    quick = "--quick" in sys.argv
    n_sweeps = 1024 if quick else 8192
    import jax

    print("devices:", jax.devices(), flush=True)
    bench("metropolis", False, n_sweeps)
    bench("config2_wolff", True, n_sweeps)


if __name__ == "__main__":
    main()
