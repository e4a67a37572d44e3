"""Kernel-level in-process A/B: old vs new megapair/mega chunk kernels.

The round-3 megapair optimizations (singleton-middle-axis SMEM blocking,
combined full-ladder PT tile swaps, lane-sum+row-mask region reductions) are
structural, so the honest comparison imports the PRE-change module from a
side copy (``--old-dir``, extracted via ``git show``) and times both kernels
on identical inputs in ONE process with interleaved reps (CLAUDE.md drift
discipline).

Usage: python benchmarks/megapair_kernel_ab.py --old-dir /tmp/oldmods
"""

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def bench_megapair(mod, label, *, shape, n_replicas, n_temps, n_d, n_inner,
                   pt_full, reps, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    kp, rp = mod.supports_megapair(
        __import__("peapods_tpu.ops.lattice", fromlist=["Lattice"]).Lattice(
            list(shape)
        ),
        n_replicas, n_temps,
    )
    rows, lanes = rp * l0, kp * block
    n_slots = n_replicas * n_temps
    n_edges = n_temps - 1
    n_grids = 4 if len(shape) == 2 else 6
    tiles = jnp.asarray(
        rng.choice(np.int8([-1, 1]), size=(n_d, n_temps, rows, lanes))
    )
    jg = jnp.asarray(
        rng.choice(np.float32([-1, 1]), size=(n_d, n_grids, rows, lanes))
    )
    temps = jnp.asarray(
        np.geomspace(0.8, 2.0, n_temps, dtype=np.float32)[None, :]
    )
    seeds = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(n_d, 2 * n_inner), dtype=np.int64)
        .astype(np.int32)
    )
    ptw = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(n_d, 2 * n_inner), dtype=np.int64)
        .astype(np.int32)
    )
    meta = jnp.broadcast_to(
        jnp.asarray([0, n_inner], jnp.int32)[None, :], (n_d, 2)
    )
    sid = jnp.broadcast_to(jnp.arange(n_slots, dtype=jnp.int32), (n_d, n_slots))
    ea = jnp.zeros((n_d, max(n_edges, 1)), jnp.int32)
    ec = jnp.zeros((n_d, max(n_edges, 1)), jnp.int32)
    rtr = jnp.zeros((n_d, n_slots), jnp.int32)
    ts = jnp.zeros((n_d, n_slots), jnp.int32)
    par = jnp.zeros((n_d, 1), jnp.int32)

    kw = dict(
        shape=tuple(shape), gibbs=False, n_inner=n_inner, n_temps=n_temps,
        n_replicas=n_replicas, kp=kp, rp=rp, pt_interval=1, pt_full=pt_full,
        hot_slot=0, cold_slot=n_temps - 1,
    )

    def run():
        out = mod.megapair_chunk(
            tiles, jg, temps, seeds, ptw, meta, sid, ea, ec, rtr, ts, par,
            **kw,
        )
        jax.block_until_ready(out[0])
        return out

    run()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) / n_inner * 1e3)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-dir", default="/tmp/oldmods")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import peapods_tpu.ops.pallas_megapair as new_mp

    old_mp = load_module(
        Path(args.old_dir) / "old_megapair.py", "old_megapair"
    )

    cases = [
        dict(name="cfg5-like 16^3 R4 T24 full-ladder", shape=(16, 16, 16),
             n_replicas=4, n_temps=24, n_d=8, n_inner=10, pt_full=True),
        dict(name="cfg4-like 8^3 R4 T24 rand-edge", shape=(8, 8, 8),
             n_replicas=4, n_temps=24, n_d=8, n_inner=10, pt_full=False),
    ]
    for case in cases:
        name = case.pop("name")
        arms = {"old": old_mp, "new": new_mp}
        results = {k: [] for k in arms}
        # compile both first, then interleave timed reps
        for k, mod in arms.items():
            results[k] = bench_megapair(mod, k, reps=0, **case)
        for _ in range(args.reps):
            for k, mod in arms.items():
                results[k] += bench_megapair(mod, k, reps=1, **case)
        print(json.dumps({
            "case": name,
            "old_ms_per_sweep_median": float(np.median(results["old"])),
            "new_ms_per_sweep_median": float(np.median(results["new"])),
            "old_reps": [round(t, 4) for t in results["old"]],
            "new_reps": [round(t, 4) for t in results["new"]],
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
