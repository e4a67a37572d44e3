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


def test_fused_measurement_matches_recompute():
    """sweep_2d_fused's (e, m) must equal recomputation from its own output."""
    from peapods_tpu.ops.energy import energies_and_mags

    L, n_sys = 8, 2
    lat = Lattice([L, L])
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(11)
    coup = rng.standard_normal((lat.n_spins, 2)).astype(np.float32)
    jg = ps.pack_coupling_grids(jnp.asarray(coup), (L, L))
    temps = jnp.asarray([1.2, 3.0], jnp.float32)
    spins = jnp.asarray(rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8))
    seeds = jnp.asarray([3, 9], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out, e, m = ps.sweep_2d_fused(spins, jg, temps, seeds, shape=(L, L))
    e_ref, m_ref = energies_and_mags(out, jnp.asarray(coup), geom)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m_ref))
