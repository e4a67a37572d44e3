"""3D Pallas sweep kernel: decision-level equivalence with the jnp path.

Same house style as test_pallas_sweep.py (reference mcmc/sweep.rs:292-343
tests its fast path bitwise against the generic path): both kernels get the
same injected acceptance uniforms, so every flip decision — 6-bond field,
seam-corrected lane rolls, 3D checkerboard parity, lane packing — must
agree bitwise with the roll-based multicolor path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import Lattice
from peapods_tpu.ops import pallas_sweep as ps
from peapods_tpu.ops import pallas_sweep3d as ps3
from peapods_tpu.ops.sweep import mc_sweep


def _pack_uniforms(u, shape, kp, ks=1):
    """``[2, n_sys, n_spins] -> [g, 2, ks*L0, kp*L1*L2]`` packed layout."""
    l0, l1, l2 = shape
    per_color = [
        ps3.pack_rows_3d(u[c], l0, l1 * l2, kp, ks) for c in range(u.shape[0])
    ]
    return jnp.stack(per_color, axis=1)


@pytest.mark.parametrize("gibbs", [False, True])
@pytest.mark.parametrize("kp,ks", [(1, 1), (2, 1), (1, 2), (2, 2)])
def test_3d_kernel_matches_jnp_with_shared_uniforms(gibbs, kp, ks):
    shape = (8, 4, 4)
    n_sys = 4
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(13)
    coup = rng.choice([-1.0, 1.0], size=(lat.n_spins, 3)).astype(np.float32)
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.stack(
        [geom.shift_bwd(coup_j[:, d], d) for d in range(3)], axis=-1
    )
    jg = ps3.pack_coupling_grids_3d(coup_j, shape, kp)
    temps = jnp.asarray([1.0, 1.4, 2.2, 4.0], jnp.float32)
    cm = jnp.asarray(lat.color_masks())
    assert cm.shape[0] == 2
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )

    for step in range(4):
        u = jnp.asarray(rng.random((2, n_sys, lat.n_spins), dtype=np.float32))
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        with pltpu.force_tpu_interpret_mode():
            got = ps3.sweep_3d_injected(
                spins, jg, temps, _pack_uniforms(u, shape, kp, ks),
                shape=shape, kp=kp, ks=ks, gibbs=gibbs,
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"kp={kp} ks={ks} step {step}",
        )
        spins = ref


def test_pack_factor_3d():
    assert ps3.pack_factor_3d(Lattice([8, 8, 8]), 96) == 2   # 64 cols -> 2
    assert ps3.pack_factor_3d(Lattice([16, 16, 16]), 48) == 1
    assert ps3.pack_factor_3d(Lattice([8, 8, 8]), 3) == 0    # 3 % 2 != 0
    assert ps3.pack_factor_3d(Lattice([7, 8, 8]), 4) == 0    # L0 % 8 != 0
    assert ps3.pack_factor_3d(Lattice([8, 8]), 4) == 0       # not 3D
    tri3 = Lattice([8, 8, 8], [[1, 0, 0], [0, 1, 0], [1, 1, 0]])
    assert ps3.pack_factor_3d(tri3, 4) == 0                  # not hypercubic


@pytest.mark.parametrize("kp,ks", [(1, 1), (2, 1), (2, 4)])
def test_fused_3d_measurement_matches_recompute(kp, ks):
    """sweep_3d_fused's per-system (e, m) must equal recomputation from its
    own output spins (the energy falls out of the odd pass's field)."""
    from peapods_tpu.ops.energy import energies_and_mags

    shape = (8, 4, 4)
    n_sys = 2 * kp * ks
    n_d = 2
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(23)
    coup = rng.standard_normal((n_d, lat.n_spins, 3)).astype(np.float32)
    jg = jnp.stack([
        ps3.pack_coupling_grids_3d(jnp.asarray(c), shape, kp, ks)
        for c in coup
    ])
    temps = jnp.asarray(
        rng.uniform(1.0, 4.0, size=(n_d, n_sys)).astype(np.float32)
    )
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_d, n_sys, lat.n_spins)).astype(np.int8)
    )
    seeds = jnp.asarray(
        rng.integers(0, 2**31, size=(n_d, 2 * (n_sys // (kp * ks)))).astype(np.int32)
    )
    with pltpu.force_tpu_interpret_mode():
        out, e, m = ps3.sweep_3d_fused(
            spins, jg, temps, seeds, shape=shape, kp=kp, ks=ks,
        )
    for d in range(n_d):
        e_ref, m_ref = energies_and_mags(out[d], jnp.asarray(coup[d]), geom)
        np.testing.assert_allclose(
            np.asarray(e[d]), np.asarray(e_ref), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(m[d]), np.asarray(m_ref))


def test_row_pack_3d():
    assert ps3.row_pack_3d(Lattice([8, 8, 8]), 96, 2) == 16   # 48 groups
    assert ps3.row_pack_3d(Lattice([16, 16, 16]), 96, 1) == 1  # wide tiles
    assert ps3.row_pack_3d(Lattice([8, 8, 8]), 2, 2) == 1
    assert ps3.row_pack_3d(Lattice([8, 8, 8]), 96, 0) == 0
    assert ps3.row_pack_3d(Lattice([8, 4, 4]), 96, 8) == 12   # 12 groups


def test_engine_uses_3d_kernel(monkeypatch):
    """8^3 spin glass must take the 3D kernel path (kp=2) end to end."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    rng = np.random.default_rng(3)
    coup = rng.choice([-1.0, 1.0], size=(2, 8, 8, 8, 3)).astype(np.float32)
    temps = np.geomspace(0.9, 2.0, 4).astype(np.float32)
    sim = IsingSimulation([8, 8, 8], coup, temps, 4, None, 5, mesh=None)
    assert sim.rt.kernel3d == 2
    r = sim.sample(4, "metropolis", pt_interval=1,
                   overlap_cluster_update_interval=2, warmup_ratio=0)
    assert np.isfinite(r["mags2"]).all() and np.isfinite(r["overlap2"]).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_3d_kernel_under_mesh_matches_unsharded(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    coup = rng.choice([-1.0, 1.0], size=(8, 8, 8, 8, 3)).astype(np.float32)
    temps = np.geomspace(0.9, 2.0, 2).astype(np.float32)
    sharded = IsingSimulation([8, 8, 8], coup, temps, 2, None, 5,
                              mesh=make_mesh(8))
    assert sharded.rt.kernel3d == 2
    r_sh = sharded.sample(3, "metropolis", pt_interval=1, warmup_ratio=0)
    plain = IsingSimulation([8, 8, 8], coup, temps, 2, None, 5, mesh=None)
    r_pl = plain.sample(3, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(sharded.state["spins"]), np.asarray(plain.state["spins"])
    )
    np.testing.assert_array_equal(r_sh["energies"], r_pl["energies"])
