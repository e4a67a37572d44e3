"""Interleaved A/B: per-temperature tiles (tg=1) vs temp-grouped megapair
sweep tiles (tg=auto), via the kernel's tg override.

Times the standalone kernel at the config-4 (8^3) and config-5 (16^3)
shapes with n_inner=64, alternating variants within one process so chip
drift cannot bias the comparison (CLAUDE.md).  Decides the default of
the PEAPODS_MP_TG1 kill switch.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from peapods_tpu.ops import pallas_megapair as mp
from peapods_tpu.ops.lattice import Lattice

N_INNER = 64
REPS = 6


def make_args(shape, n_temps, n_replicas, n_d, pt_full, seed):
    rng = np.random.default_rng(seed)
    l0 = shape[0]
    lat = Lattice(list(shape))
    kp, rp = mp.supports_megapair(lat, n_replicas, n_temps)
    block = int(np.prod(shape[1:]))
    rows, lanes = rp * l0, kp * block
    n_spins = l0 * block
    n_slots = n_replicas * n_temps
    n_edges = n_temps - 1
    coup = rng.normal(size=(n_d, n_spins, len(shape))).astype(np.float32)
    jg = jnp.stack([
        mp.pack_coupling_grids_mp(jnp.asarray(coup[d]), shape, kp, rp)
        for d in range(n_d)
    ])
    spins = jnp.asarray(
        rng.choice(np.array([-1, 1], np.int8), size=(n_d, n_temps, rows, lanes))
    )
    temps = jnp.asarray(
        np.geomspace(0.9, 2.2, n_temps, dtype=np.float32)
    ).reshape(1, n_temps)
    seeds = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(n_d, 2 * N_INNER), dtype=np.int32)
    )
    ptw = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(n_d, 2 * N_INNER), dtype=np.int32)
    )
    meta = jnp.tile(jnp.array([[0, N_INNER]], jnp.int32), (n_d, 1))
    sid = jnp.tile(jnp.arange(n_slots, dtype=jnp.int32)[None], (n_d, 1))
    ea = jnp.zeros((n_d, max(n_edges, 1)), jnp.int32)
    ec = jnp.zeros((n_d, max(n_edges, 1)), jnp.int32)
    rt = jnp.zeros((n_d, n_slots), jnp.int32)
    ts = jnp.zeros((n_d, n_slots), jnp.int32)
    par = jnp.zeros((n_d, 1), jnp.int32)
    kw = dict(
        shape=tuple(shape), gibbs=False, n_inner=N_INNER, n_temps=n_temps,
        n_replicas=n_replicas, kp=kp, rp=rp, pt_interval=1,
        pt_full=pt_full, hot_slot=n_temps - 1, cold_slot=0,
    )
    args = (spins, jg, temps, seeds, ptw, meta, sid, ea, ec, rt, ts, par)
    n_grids = 4 if len(shape) == 2 else 6
    tg_auto = mp._temp_group(n_temps, rows, lanes, n_grids)
    return args, kw, tg_auto


def run_once(args, kw, tg):
    out = mp.megapair_chunk(*args, **kw, tg=tg)
    jax.block_until_ready(out)
    return out


def bench(label, shape, n_temps, n_replicas, n_d, pt_full):
    args, kw, tg_auto = make_args(shape, n_temps, n_replicas, n_d, pt_full,
                                  seed=7)
    if tg_auto == 1:
        print(f"{label}: tg_auto == 1, nothing to compare")
        return
    for tg in (1, tg_auto):  # compile both
        run_once(args, kw, tg)
    t1s, tgs = [], []
    for _ in range(REPS):
        for tg, acc in ((1, t1s), (tg_auto, tgs)):
            t0 = time.perf_counter()
            run_once(args, kw, tg)
            acc.append(time.perf_counter() - t0)
    o = np.median(t1s) / N_INNER * 1e3
    n = np.median(tgs) / N_INNER * 1e3
    print(f"{label}: tg=1 {o:.3f} ms/sweep  tg={tg_auto} {n:.3f} ms/sweep  "
          f"({o / n:.2f}x)  raw_tg1={['%.1f' % (x*1e3) for x in t1s]} "
          f"raw_tg={['%.1f' % (x*1e3) for x in tgs]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench("8^3  24T 4R 8d rand-edge", (8, 8, 8), 24, 4, 8, False)
    bench("16^3 24T 4R 8d full-ladder", (16, 16, 16), 24, 4, 8, True)
