"""Triangular Pallas sweep kernel: decision-level equivalence with the jnp
multicolor path (shared injected uniforms; flip decisions must agree
bitwise), fused-measurement consistency, and applicability rules.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice
from peapods_tpu.ops import pallas_sweep as ps
from peapods_tpu.ops import pallas_sweep_tri as pst
from peapods_tpu.ops.sweep import mc_sweep

TRI = GEOMETRY_OFFSETS["triangular"]


def _tri_setup(h, w, n_sys, seed):
    lat = Lattice([h, w], TRI)
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(seed)
    coup = rng.choice([-1.0, 1.0], size=(lat.n_spins, 3)).astype(np.float32)
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.asarray(coup[lat.bwd, np.arange(3)[None, :]])
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )
    return lat, geom, rng, coup_j, coup_bwd, spins


@pytest.mark.parametrize("gibbs", [False, True])
def test_tri_matches_jnp_with_shared_uniforms(gibbs):
    H = W = 8
    n_sys = 3
    lat, geom, rng, coup_j, coup_bwd, spins = _tri_setup(H, W, n_sys, 5)
    jg = pst.pack_coupling_grids_tri(coup_j, (H, W))
    temps = jnp.asarray([1.5, 3.641, 6.0], jnp.float32)
    cm = jnp.asarray(lat.color_masks())

    for step in range(5):
        u = jnp.asarray(rng.random((4, n_sys, lat.n_spins), dtype=np.float32))
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        u_pl = jnp.swapaxes(u, 0, 1).reshape(n_sys, 4, H, W)
        with pltpu.force_tpu_interpret_mode():
            got = pst.sweep_tri_injected(
                spins, jg, temps, u_pl, shape=(H, W), gibbs=gibbs
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"step {step}"
        )
        spins = ref


@pytest.mark.parametrize("gibbs", [False, True])
def test_tri_packed_matches_jnp_with_shared_uniforms(gibbs):
    """Lane-packed layout: same flip decisions as the jnp path when each
    packed system's uniforms land on its lane block (seam wraps for the
    left/right AND diagonal neighbors must resolve within-system)."""
    H = W = 8
    k, n_sys = 4, 8
    lat, geom, rng, coup_j, coup_bwd, spins = _tri_setup(H, W, n_sys, 11)
    jg = pst.pack_coupling_grids_tri_packed(coup_j, (H, W), k)
    temps = jnp.asarray(np.linspace(1.2, 6.0, n_sys), jnp.float32)
    cm = jnp.asarray(lat.color_masks())

    for step in range(3):
        u = jnp.asarray(rng.random((4, n_sys, lat.n_spins), dtype=np.float32))
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        # pack each color's per-system uniform grids like the spins
        u_pk = jnp.stack(
            [ps.pack_spins(u[c], (H, W), k) for c in range(4)], axis=1
        )  # [g, 4, H, k*W]
        with pltpu.force_tpu_interpret_mode():
            got = pst.sweep_tri_packed_injected(
                spins, jg, temps, u_pk, shape=(H, W), k=k, gibbs=gibbs
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"step {step}"
        )
        spins = ref


def test_tri_fused_measurement_matches_recompute():
    """sweep_tri_fused's (e, m) must equal recomputation from its output."""
    from peapods_tpu.ops.energy import energies_and_mags

    H = W = 8
    n_sys = 2
    lat, geom, rng, coup_j, _, spins = _tri_setup(H, W, n_sys, 7)
    jg = pst.pack_coupling_grids_tri(coup_j, (H, W))
    temps = jnp.asarray([1.2, 4.0], jnp.float32)
    seeds = jnp.asarray([3, 1, 9, 2], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out, e, m = pst.sweep_tri_fused(
            spins[None], jg[None], temps[None], seeds[None], shape=(H, W)
        )
    e_ref, m_ref = energies_and_mags(out[0], coup_j, geom)
    np.testing.assert_allclose(np.asarray(e[0]), np.asarray(e_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(m_ref))


def test_engine_tri_packed_path(monkeypatch):
    """A narrow triangular model must activate the lane-packed triangular
    kernel (BASELINE config 2's lattice class), stay deterministic across
    chunkings, and interoperate with the staged (jnp) Wolff FK update."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    rng = np.random.default_rng(3)
    coup = rng.choice([-1.0, 1.0], size=(8, 16, 3)).astype(np.float32)
    temps = np.geomspace(2.0, 5.0, 4).astype(np.float32)

    def sim(seed):
        return IsingSimulation(
            [8, 16], coup, temps, 2, TRI, seed, default_chunk=4, mesh=None
        )

    a = sim(9)
    ra = a.sample(4, "metropolis", pt_interval=2, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.tri_pack == 8
    assert "pallas-tri-packed(k=8)" in prog.describe_plan()
    assert np.isfinite(ra["energies"]).all()

    b = sim(9)
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )

    # Wolff cluster updates ride the FUSED FK kernel on triangular lattices
    # too (the third bond direction composes from the axis shifts) while
    # the sweep stays on the packed kernel — config 2's full mix
    c = sim(11)
    rc = c.sample(
        4, "metropolis", cluster_update_interval=2, cluster_mode="wolff",
        warmup_ratio=0,
    )
    progc = next(iter(c._programs.values()))
    assert "pallas-tri-packed(k=8)" in progc.describe_plan()
    assert progc.fk_kernel, progc.describe_plan()
    assert np.isfinite(rc["energies"]).all()


def test_engine_tri_direct_path(monkeypatch):
    """A full-lane-width triangular model activates the direct kernel with
    fused (e, m) measurement."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    coup = np.ones((8, 128, 3), np.float32)
    temps = np.asarray([3.0, 4.0], np.float32)
    s = IsingSimulation([8, 128], coup, temps, 1, TRI, 7, default_chunk=2,
                        mesh=None)
    r = s.sample(2, "metropolis", warmup_ratio=0)
    prog = next(iter(s._programs.values()))
    assert s.rt.tri and "sweep=pallas-tri" in prog.describe_plan()
    assert prog.fuse_measure
    assert np.isfinite(r["energies"]).all()


def test_tri_support_rules():
    assert pst.supports_tri(Lattice([8, 128], TRI))
    assert not pst.supports_tri(Lattice([8, 64], TRI))  # narrow -> packed
    assert not pst.supports_tri(Lattice([8, 128]))  # square lattice
    assert not pst.supports_tri(Lattice([7, 128], TRI))  # odd rows: no 4-color

    assert pst.pack_factor_tri(Lattice([32, 32], TRI), 16) == 4
    assert pst.pack_factor_tri(Lattice([32, 32], TRI), 18) == 0  # indivisible
    assert pst.pack_factor_tri(Lattice([8, 128], TRI), 16) == 0  # wide enough
    assert pst.pack_factor_tri(Lattice([8, 48], TRI), 16) == 0  # 128 % 48
    assert pst.pack_factor_tri(Lattice([8, 8]), 16) == 0  # not triangular
