"""Primitive-cost probe for the boundary-contraction CC design (round-5).

Context (STATUS.md round-5 feasibility notes, docs/performance.md): the one
workload where every CC body is diameter-bound and the log ladder LOSES is
the 256^2 single-graph SW at T_c (config 3, ~0.73 ms/sweep CC budget).  The
only untried lever is shrinking the DATA for the long-range phase: run a
bounded block-local fixed point, extract the block boundary sites (1/4 of
the lattice at 32-wide blocks), and solve the contracted graph on a small
tile.  The contraction's intra-block "same local label" join is a
scatter-min into a per-block label table followed by a gather back — so the
build/no-build decision hangs on what gathers, scatter-mins and sorts cost
at SMALL tile sizes.  The only recorded number (~0.7 ms/gather) was taken
at FULL [64, 1024] tiles (ops/cluster.py header), and nothing says how that
scales down.

This probe times, per tile size n in {64k, 16k, 8k, 4k, 2k}:

- ``gather``: y = x[idx] (data-chained so rounds cannot fuse away),
- ``scatter_min``: t = t.at[idx].min(v),
- ``sort_kv``: lax.sort_key_val (the sort-based segment-min alternative),
- ``roll_round``: one classic CC propagation round (4 seam-corrected rolls
  + mins) on a grid of the same element count — the unit the contracted
  phase must beat per round.

All ops run K iterations inside one jitted fori_loop (dispatch amortized),
median of REPS timed calls, arms interleaved.  Each timed call syncs by
fetching a scalar to the host (``block_until_ready`` alone returned in
~30 us against the tunneled backend — it does not await the remote
computation), and a null arm (the chain-only loop) is timed alongside so
the per-call dispatch + host-fetch overhead can be subtracted.  Output
feeds the round-5 build/no-build decision recorded in docs/performance.md.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SMOKE = "--smoke" in sys.argv
K = 4 if SMOKE else 2000  # inner iterations per timed call
REPS = 2 if SMOKE else 7

# (n, grid shape for the roll round)
SIZES = [
    (65536, (256, 256)),
    (16384, (128, 128)),
    (8192, (64, 128)),
    (4096, (32, 128)),
    (2048, (16, 128)),
]


def _chain(y, n):
    """Derive the next round's indices from this round's values so the
    compiler cannot hoist or collapse the K iterations."""
    import jax.numpy as jnp

    return (y + jnp.arange(n, dtype=jnp.int32)) % n


def make_ops(n, grid):
    import jax
    import jax.numpy as jnp

    idx0 = np.random.RandomState(0).permutation(n).astype(np.int32)
    x0 = np.random.RandomState(1).permutation(n).astype(np.int32)

    @jax.jit
    def gather(x, idx):
        def body(_, carry):
            x, idx = carry
            y = x[idx]
            return y, _chain(y, n)

        return jax.lax.fori_loop(0, K, body, (x, idx))

    @jax.jit
    def scatter_min(x, idx):
        def body(_, carry):
            x, idx = carry
            t = jnp.full((n,), jnp.int32(n)).at[idx].min(x)
            return t, _chain(t, n)

        return jax.lax.fori_loop(0, K, body, (x, idx))

    @jax.jit
    def sort_kv(x, idx):
        def body(_, carry):
            x, idx = carry
            k, v = jax.lax.sort_key_val(x, idx)
            return v, _chain(k, n)

        return jax.lax.fori_loop(0, K, body, (x, idx))

    @jax.jit
    def roll_round(x, idx):
        def body(_, carry):
            x, idx = carry
            g = x.reshape(grid)
            new = g
            for ax in (0, 1):
                for s in (1, -1):
                    new = jnp.minimum(new, jnp.roll(g, s, axis=ax))
            y = new.reshape(-1)
            return y, _chain(y, n)

        return jax.lax.fori_loop(0, K, body, (x, idx))

    @jax.jit
    def null(x, idx):
        def body(_, carry):
            x, idx = carry
            return idx, _chain(x, n)

        return jax.lax.fori_loop(0, K, body, (x, idx))

    return {
        "null": null,
        "gather": gather,
        "scatter_min": scatter_min,
        "sort_kv": sort_kv,
        "roll_round": roll_round,
    }, (jnp.asarray(x0), jnp.asarray(idx0))


def main():
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print("devices:", jax.devices(), flush=True)

    def run_sync(f, args):
        out = f(*args)
        return int(np.asarray(out[0][:1])[0])  # host fetch = real sync

    built = []
    for n, grid in SIZES:
        ops, args = make_ops(n, grid)
        for f in ops.values():  # compile + warm
            run_sync(f, args)
        built.append((n, ops, args))

    results = {}
    times = {}
    sink = 0
    for _ in range(REPS):
        for n, ops, args in built:  # interleaved arms (chip drift)
            for name, f in ops.items():
                t0 = time.perf_counter()
                sink ^= run_sync(f, args)
                dt = (time.perf_counter() - t0) / K * 1e6  # us/op
                times.setdefault((n, name), []).append(dt)
    for (n, name), ts in times.items():
        med = float(np.median(ts))
        d = results.setdefault(str(n), {})
        d[name] = round(med, 2)
    for n_key, d in results.items():
        base = d.get("null", 0.0)
        d_net = {k: round(max(v - base, 0.0), 2)
                 for k, v in d.items() if k != "null"}
        d["net"] = d_net
    print(json.dumps({"section": "cc_contract_probe", "K": K,
                      "us_per_op": results}), flush=True)


if __name__ == "__main__":
    main()
