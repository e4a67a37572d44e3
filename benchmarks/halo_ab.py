"""In-process A/B bounding the halo-exchange kernels' per-shard overhead.

Real multi-chip meshes aren't available here (one tunneled chip), so the
only measurable bound is space=1: a 1-device mesh with a ``space`` axis
runs the full halo machinery (two single-color kernel passes per sweep,
self-ppermute halo rows/planes, shard offset arithmetic) on the same
lattice the unsharded direct kernel sweeps in one pass.  The delta is the
per-shard structural overhead every real multi-chip run would pay — if
it's small, the decomposition structure is sound and the kernels win as
soon as a second chip shares the lattice.

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


def build(shape, n_temps, use_space_mesh):
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    coup = np.ones(tuple(shape) + (len(shape),), np.float32)
    temps = np.geomspace(1.8, 3.2, n_temps).astype(np.float32)
    mesh = make_mesh(1, ("space",)) if use_space_mesh else None
    sim = IsingSimulation(list(shape), coup, temps, 1, None, 3,
                          default_chunk=64, mesh=mesh)
    sim.sample(8, "metropolis", warmup_ratio=0.0)  # warm = compile
    return sim


def bench(tag, shape, n_temps, n_sweeps):
    arms = {
        "halo": build(shape, n_temps, True),
        "direct": build(shape, n_temps, False),
    }
    plans = {}
    for name, sim in arms.items():
        prog = next(iter(sim._programs.values()))
        plans[name] = prog.describe_plan()
    times = {"halo": [], "direct": []}
    for _ in range(REPS):
        for name, sim in arms.items():
            t0 = time.perf_counter()
            sim.sample(n_sweeps, "metropolis", warmup_ratio=0.0)
            times[name].append((time.perf_counter() - t0) / n_sweeps * 1e3)
    halo = float(np.median(times["halo"]))
    direct = float(np.median(times["direct"]))
    print(json.dumps({
        "section": "halo_ab", "case": tag,
        "halo_ms_per_sweep": round(halo, 3),
        "direct_ms_per_sweep": round(direct, 3),
        "overhead_x": round(halo / direct, 2),
        "plans": plans,
        "raw_halo": [round(x, 2) for x in times["halo"]],
        "raw_direct": [round(x, 2) for x in times["direct"]],
    }), flush=True)


def main():
    quick = "--quick" in sys.argv
    n_sweeps = 64 if quick else 256
    import jax

    print("devices:", jax.devices(), flush=True)
    bench("2d_256", (256, 256), 16, n_sweeps)
    bench("3d_16", (16, 16, 16), 16, n_sweeps)
    # lane-packed narrow lattice: halo arm = packed halo kernel (k=2),
    # direct arm = the unsharded lane-packed kernel
    bench("2d_64_packed", (256, 64), 16, n_sweeps)


if __name__ == "__main__":
    main()
