"""In-process A/B of the fused FK kernel (ops/pallas_event.py
``fk_update_batch``) on the 5-mode harness's cluster rows.

The target workload is the reference harness config (64^2, 16 temps, 128
disorder realizations, cluster update every sweep — the rows that went
108 -> 13.2 ms/sweep through the batched CC); this decides whether the
fused kernel (bond draws + CC + flips + post-update (e, m) in ONE
pallas_call) supersedes the staged bond-build -> batched-CC -> flip path
(``PEAPODS_DISABLE_FKKERNEL=1``) on hardware.

Arms are built and timed interleaved in one process per CLAUDE.md's chip
drift discipline.  Run on the real TPU, serialized.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REPS = 5


def build(disable, cmode, n_realizations, n_sweeps):
    os.environ["PEAPODS_DISABLE_FKKERNEL"] = disable
    from peapods_tpu import Ising

    model = Ising(
        (64, 64),
        temperatures=np.geomspace(0.1, 10, 16),
        n_disorder=n_realizations,
        seed=3,
    )
    kw = dict(cluster_update_interval=1, cluster_mode=cmode,
              warmup_ratio=0.0)
    model.sample(n_sweeps, "metropolis", **kw)  # warm = compile
    return model, kw


def bench(cmode, n_realizations, n_sweeps):
    arms = {d: build(d, cmode, n_realizations, n_sweeps) for d in ("0", "1")}
    times = {"0": [], "1": []}
    for _ in range(REPS):
        for tag, (model, kw) in arms.items():
            t0 = time.perf_counter()
            model.sample(n_sweeps, "metropolis", **kw)
            times[tag].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    fused = float(np.median(times["0"]))
    staged = float(np.median(times["1"]))
    print(json.dumps({
        "section": "fk_ab", "mode": cmode,
        "fused_ms_per_sweep": round(fused, 3),
        "staged_ms_per_sweep": round(staged, 3),
        "speedup": round(staged / fused, 2),
        "raw_fused": [round(x, 2) for x in times["0"]],
        "raw_staged": [round(x, 2) for x in times["1"]],
    }), flush=True)


def main():
    quick = "--quick" in sys.argv
    n_realizations = 32 if quick else 128
    n_sweeps = 64 if quick else 256
    import jax

    print("devices:", jax.devices(), flush=True)
    bench("sw", n_realizations, n_sweeps)
    bench("wolff", n_realizations, n_sweeps)


if __name__ == "__main__":
    main()
