"""Pallas sweep kernel: decision-level equivalence with the jnp path.

Both kernels are driven with the same injected acceptance uniforms; every
flip decision (field computation, lazy-Metropolis / Gibbs threshold,
checkerboard masking) must then agree bitwise.  Runs in interpret mode on
CPU; the hardware-PRNG path is exercised statistically on TPU by
bench/physics runs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import Lattice
from peapods_tpu.ops import pallas_sweep as ps
from peapods_tpu.ops.sweep import mc_sweep


@pytest.mark.parametrize("gibbs", [False, True])
def test_pallas_matches_jnp_with_shared_uniforms(gibbs):
    L, n_sys = 8, 3
    lat = Lattice([L, L])
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(5)
    coup = rng.choice([-1.0, 1.0], size=(lat.n_spins, 2)).astype(np.float32)
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.stack(
        [geom.shift_bwd(coup_j[:, d], d) for d in range(2)], axis=-1
    )
    jg = ps.pack_coupling_grids(coup_j, (L, L))
    temps = jnp.asarray([1.5, 2.269, 4.0], jnp.float32)
    cm = jnp.asarray(lat.color_masks())
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )

    for step in range(5):
        u = jnp.asarray(
            rng.random((2, n_sys, lat.n_spins), dtype=np.float32)
        )
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        # pallas layout: [n_systems, n_colors, H, W]
        u_pl = jnp.swapaxes(u, 0, 1).reshape(n_sys, 2, L, L)
        with pltpu.force_tpu_interpret_mode():
            got = ps.sweep_2d_injected(
                spins, jg, temps, u_pl, shape=(L, L), gibbs=gibbs
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"step {step}"
        )
        spins = ref
