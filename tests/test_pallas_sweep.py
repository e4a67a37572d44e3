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


@pytest.mark.parametrize("gibbs", [False, True])
def test_two_sub_matches_jnp_with_shared_uniforms(gibbs):
    """Two-sublattice layout: same flip decisions as the jnp multicolor path
    when fed the same uniforms (gathered at each color's sites)."""
    H, W, n_sys = 8, 16, 3
    lat = Lattice([H, W])
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(17)
    coup = rng.standard_normal((lat.n_spins, 2)).astype(np.float32)
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.stack(
        [geom.shift_bwd(coup_j[:, d], d) for d in range(2)], axis=-1
    )
    jg = ps.pack_coupling_grids(coup_j, (H, W))
    temps = jnp.asarray([1.5, 2.269, 4.0], jnp.float32)
    cm = jnp.asarray(lat.color_masks())
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )

    for step in range(5):
        u = jnp.asarray(rng.random((2, n_sys, lat.n_spins), dtype=np.float32))
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        # per color, gather the uniforms at that color's sublattice sites
        u_grids = ps.pack_two_sub(u.reshape(2, n_sys, H, W))  # [2, n_sys, 2, H, W/2]
        u_2sub = jnp.stack([u_grids[0, :, 0], u_grids[1, :, 1]], axis=1)
        got = ps.sweep_2d_two_sub_injected(
            spins, jg, temps, u_2sub, shape=(H, W), gibbs=gibbs,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"step {step}"
        )
        spins = ref


def test_two_sub_pack_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(-128, 128, size=(3, 8, 12)).astype(np.int8))
    p = ps.pack_two_sub(x)
    assert p.shape == (3, 2, 8, 6)
    np.testing.assert_array_equal(np.asarray(ps.unpack_two_sub(p)), np.asarray(x))
    # even sublattice holds the (row+col) % 2 == 0 sites
    full = np.asarray(x)
    e = np.asarray(p[:, 0])
    for i in range(8):
        np.testing.assert_array_equal(e[:, i], full[:, i, (i % 2)::2])


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
    seeds = jnp.asarray([3, 1, 9, 2], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out, e, m = ps.sweep_2d_fused(
            spins[None], jg[None], temps[None], seeds[None], shape=(L, L)
        )
    e_ref, m_ref = energies_and_mags(out[0], jnp.asarray(coup), geom)
    np.testing.assert_allclose(np.asarray(e[0]), np.asarray(e_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(m_ref))


def test_pack_unpack_roundtrip_and_layout():
    L, k = 8, 16
    n_sys = 32
    rng = np.random.default_rng(0)
    spins = jnp.asarray(rng.choice([-1, 1], size=(n_sys, L * L)).astype(np.int8))
    packed = ps.pack_spins(spins, (L, L), k)
    assert packed.shape == (n_sys // k, L, k * L)
    # column block j of group g is system g*k + j
    p = np.asarray(packed)
    s = np.asarray(spins).reshape(n_sys, L, L)
    for g in range(n_sys // k):
        for j in range(k):
            np.testing.assert_array_equal(
                p[g, :, j * L : (j + 1) * L], s[g * k + j]
            )
    np.testing.assert_array_equal(
        np.asarray(ps.unpack_spins(packed, (L, L), k)), np.asarray(spins)
    )


def test_packed_coupling_grids_tile_per_system():
    L, k = 8, 4
    rng = np.random.default_rng(1)
    coup = jnp.asarray(rng.standard_normal((L * L, 2)).astype(np.float32))
    base = np.asarray(ps.pack_coupling_grids(coup, (L, L)))
    tiled = np.asarray(ps.pack_coupling_grids_packed(coup, (L, L), k))
    assert tiled.shape == (4, L, k * L)
    for j in range(k):
        np.testing.assert_array_equal(tiled[:, :, j * L : (j + 1) * L], base)


def test_pack_factor_rules():
    from peapods_tpu.ops.lattice import Lattice

    assert ps.pack_factor(Lattice([8, 8]), 16) == 16
    assert ps.pack_factor(Lattice([8, 8]), 17) == 0  # not divisible
    assert ps.pack_factor(Lattice([64, 64]), 32) == 2
    assert ps.pack_factor(Lattice([256, 256]), 24) == 0  # wide enough already
    assert ps.pack_factor(Lattice([8, 8, 8]), 16) == 0  # not 2D
    assert ps.pack_factor(Lattice([8, 48]), 16) == 0  # 128 % 48 != 0


def test_make_seeds_unique_across_systems_and_sweeps():
    """Seed words must be distinct per (realization, instance, sweep) by
    construction (no 32-bit birthday collisions over long runs)."""
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    s1 = np.asarray(ps.make_seeds(keys, 6))
    assert s1.shape == (4, 12)
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    s2 = np.asarray(ps.make_seeds(keys2, 6))
    rows = {tuple(r) for r in s1.reshape(-1, 2)} | {
        tuple(r) for r in s2.reshape(-1, 2)
    }
    assert len(rows) == 2 * 4 * 6  # all distinct
