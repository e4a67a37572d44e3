"""In-process A/B of the Pallas band-local CC body (round 5).

``connected_components_banded`` (space-mesh CC) got a Pallas inner body
(ops/pallas_cc_band.py): band + halo rows as one packed tile, in-kernel
min-label fixed point.  This measures the op-level cost on one chip at
space=1 (the per-shard work is identical at any shard count; only the
ppermute ring adds on a real multi-chip ring):

arms per case: plain unsharded jnp CC (the no-mesh bar) / banded jnp inner
body / banded Pallas inner body.  Cases: 256^2 FK graphs at T_c density
(the config-3 workload a space mesh would serve) and FCC 32^3 (the lattice
class beyond one chip's HBM the band body exists for, scaled to fit one).

Timing: jit-compiled closures over fixed bond masks, host-fetch synced,
median of REPS interleaved calls.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SMOKE = "--smoke" in sys.argv
REPS = 2 if SMOKE else 7


def main():
    import jax

    if SMOKE:
        os.environ["PEAPODS_PALLAS_INTERPRET"] = "1"
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 2)
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops.lattice import Lattice

    print("devices:", jax.devices(), flush=True)
    interp = os.environ.get("PEAPODS_PALLAS_INTERPRET") == "1"
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("space",))

    cases = [
        ("sw_256sq_tc", [16, 32] if SMOKE else [256, 256], None, 0.55),
        ("fcc_32cube", [8, 8, 8] if SMOKE else [32, 32, 32],
         [[1, 1, 0], [1, 0, 1], [0, 1, 1],
          [1, -1, 0], [1, 0, -1], [0, 1, -1]], 0.25),
    ]
    for name, shape, offs, p in cases:
        lat = Lattice(shape, offs) if offs else Lattice(shape)
        geom = GridOps.from_lattice(lat)
        rng = np.random.default_rng(7)
        act = jnp.asarray(
            rng.random((1, lat.n_spins, lat.n_neighbors)) < p
        )

        plain = jax.jit(jax.vmap(
            lambda a: cl.connected_components(a, geom)
        ))

        def banded(pallas):
            return jax.jit(jax.shard_map(
                lambda a: cl.connected_components_banded(
                    a, geom, axis="space", pallas=pallas,
                    interpret=interp,
                ),
                mesh=mesh, in_specs=P(None, "space", None),
                out_specs=P(None, "space"), check_vma=False,
            ))

        arms = {"plain": plain, "jnp_band": banded(False),
                "pallas_band": banded(True)}
        # warm + reference equality
        ref = None
        for arm, f in arms.items():
            out = np.asarray(f(act))
            if ref is None:
                ref = out
            else:
                np.testing.assert_array_equal(out, ref, err_msg=arm)
        times = {a: [] for a in arms}
        for _ in range(REPS):
            for arm, f in arms.items():
                t0 = time.perf_counter()
                np.asarray(f(act)[0, :1])  # host fetch = sync
                times[arm].append((time.perf_counter() - t0) * 1e3)
        med = {a: round(float(np.median(times[a])), 3) for a in arms}
        print(json.dumps({
            "section": "band_cc_ab", "case": name, "ms_per_cc": med,
            "pallas_vs_jnp_band": round(
                med["jnp_band"] / med["pallas_band"], 2
            ),
            "pallas_vs_plain": round(med["plain"] / med["pallas_band"], 2),
            "raw": {a: [round(x, 3) for x in times[a]] for a in arms},
        }), flush=True)


if __name__ == "__main__":
    main()
