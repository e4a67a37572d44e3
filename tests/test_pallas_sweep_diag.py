"""BCC/FCC Pallas sweep kernels: decision-level equivalence with the jnp
multicolor path (shared injected uniforms; flip decisions must agree
bitwise), fused-measurement consistency, engine activation, and
applicability rules.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice
from peapods_tpu.ops import pallas_sweep3d
from peapods_tpu.ops import pallas_sweep_diag as psd
from peapods_tpu.ops.sweep import mc_sweep


def _setup(kind, shape, n_sys, seed):
    lat = Lattice(list(shape), GEOMETRY_OFFSETS[kind])
    geom = GridOps.from_lattice(lat)
    n_nb = lat.n_neighbors
    rng = np.random.default_rng(seed)
    coup = rng.choice([-1.0, 1.0], size=(lat.n_spins, n_nb)).astype(
        np.float32
    )
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.asarray(coup[lat.bwd, np.arange(n_nb)[None, :]])
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )
    return lat, geom, rng, coup_j, coup_bwd, spins


@pytest.mark.parametrize("gibbs", [False, True])
@pytest.mark.parametrize(
    "kind,shape", [("bcc", (8, 8, 8)), ("fcc", (8, 8, 8)),
                   ("bcc", (8, 4, 8)), ("fcc", (8, 8, 4))]
)
def test_diag_matches_jnp_with_shared_uniforms(kind, shape, gibbs):
    """Kernel flip decisions == the jnp multicolor path's, bitwise, for
    several chained sweeps (diagonal seam wraps must resolve within each
    packed system)."""
    n_sys = 4
    lat, geom, rng, coup_j, coup_bwd, spins = _setup(kind, shape, n_sys, 5)
    kp = psd.pack_factor_diag(lat, n_sys)
    assert kp >= 1
    jg = psd.pack_coupling_grids_diag(coup_j, shape, kind, kp)
    temps = jnp.asarray(np.linspace(1.5, 8.0, n_sys), jnp.float32)
    cm = jnp.asarray(lat.color_masks())
    nc = psd.N_COLORS_DIAG[kind]
    l0, l1, l2 = shape
    block = l1 * l2

    for step in range(3):
        u = jnp.asarray(rng.random((nc, n_sys, lat.n_spins), dtype=np.float32))
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        u_pk = jnp.stack(
            [pallas_sweep3d.pack_rows_3d(u[c], l0, block, kp, 1)
             for c in range(nc)],
            axis=1,
        )  # [g, nc, L0, kp*block]
        with pltpu.force_tpu_interpret_mode():
            got = psd.sweep_diag_injected(
                spins, jg, temps, u_pk, shape=shape, kind=kind, kp=kp,
                gibbs=gibbs,
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"{kind} step {step}"
        )
        spins = ref


@pytest.mark.parametrize("kind", ["bcc", "fcc"])
def test_diag_fused_measurement_matches_recompute(kind):
    """sweep_diag_fused's (e, m) must equal recomputation from its output."""
    from peapods_tpu.ops.energy import energies_and_mags

    shape = (8, 8, 8)
    n_sys = 4
    lat, geom, rng, coup_j, _, spins = _setup(kind, shape, n_sys, 7)
    kp = psd.pack_factor_diag(lat, n_sys)
    jg = psd.pack_coupling_grids_diag(coup_j, shape, kind, kp)[None]
    temps = jnp.asarray(np.linspace(1.5, 8.0, n_sys), jnp.float32)[None]
    seeds = jnp.asarray(
        rng.integers(1, 2**30, (1, 2 * (n_sys // kp))), jnp.int32
    )

    with pltpu.force_tpu_interpret_mode():
        out, e, m = psd.sweep_diag_fused(
            spins[None], jg, temps, seeds, shape=shape, kind=kind, kp=kp
        )
    e_ref, m_ref = energies_and_mags(out[0], coup_j, geom)
    np.testing.assert_allclose(np.asarray(e[0]), np.asarray(e_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(m_ref))


@pytest.mark.parametrize("kind", ["bcc", "fcc"])
def test_engine_diag_path(monkeypatch, kind):
    """A BCC/FCC model activates the kernel (with fused measurement at
    small instance counts), stays deterministic across chunkings, and
    interoperates with the jnp cluster phases."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    offs = GEOMETRY_OFFSETS[kind]
    rng = np.random.default_rng(3)
    coup = rng.choice(np.float32([-1, 1]), size=(8, 8, 8, len(offs)))
    temps = np.geomspace(2.0, 8.0, 4).astype(np.float32)

    def sim(seed):
        return IsingSimulation([8, 8, 8], coup, temps, 1, offs, seed,
                               default_chunk=4, mesh=None)

    a = sim(9)
    ra = a.sample(4, "metropolis", pt_interval=2, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.diag == 2 and a.rt.diag_kind == kind
    assert f"pallas-{kind}(kp=2)" in prog.describe_plan()
    assert prog.fuse_measure
    assert np.isfinite(ra["energies"]).all()

    b = sim(9)
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )

    # SW cluster updates ride the jnp FK path (the packed-tile CC kernels
    # serve hypercubic/triangular bonds) while the sweep keeps the kernel
    c = sim(11)
    rc = c.sample(
        4, "metropolis", cluster_update_interval=2, cluster_mode="sw",
        warmup_ratio=0,
    )
    progc = next(iter(c._programs.values()))
    assert f"pallas-{kind}(kp=2)" in progc.describe_plan()
    assert np.isfinite(rc["energies"]).all()

    # kill switch
    monkeypatch.setenv("PEAPODS_DISABLE_DIAG", "1")
    d = sim(9)
    d.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    assert d.rt.diag == 0
    monkeypatch.delenv("PEAPODS_DISABLE_DIAG")


def test_diag_support_rules():
    BCC, FCC = GEOMETRY_OFFSETS["bcc"], GEOMETRY_OFFSETS["fcc"]
    assert psd.diag_kind(Lattice([8, 8, 8], BCC)) == "bcc"
    assert psd.diag_kind(Lattice([8, 8, 8], FCC)) == "fcc"
    assert psd.diag_kind(Lattice([8, 8, 8])) is None  # hypercubic
    assert psd.diag_kind(Lattice([7, 8, 8], BCC)) is None  # L0 % 8
    # odd extents break the periodic coloring formula -> greedy deviates
    assert psd.diag_kind(Lattice([8, 7, 8], FCC)) is None

    assert psd.pack_factor_diag(Lattice([8, 8, 8], BCC), 4) == 2
    assert psd.pack_factor_diag(Lattice([8, 8, 8], BCC), 3) == 0  # 3 % 2
    assert psd.pack_factor_diag(Lattice([16, 16, 16], FCC), 4) == 1
    assert psd.pack_factor_diag(Lattice([8, 8, 8]), 4) == 0  # hypercubic
