"""Generic-offset Pallas sweep kernel (pallas_sweep_diag.sweep_gen*).

The reference runs ANY ``with_offsets`` lattice through one flat
neighbor-table sweep at native speed (geometry/lattice.rs:44,
mcmc/sweep.rs:51-97); the generic kernel is the packed-tile counterpart:
arbitrary offset tables with a periodic greedy coloring, each direction
composed from seam-corrected stride-1 axis shifts.  Pins:

* flip decisions bitwise vs the jnp multicolor path under shared uniforms
  (2D NNN, 2D stride-2, 3D cubic+diagonal, 2D knight-move — multi-step
  shifts, >4 colors, period-8 color tables);
* a named geometry expressed as raw offsets (FCC) runs the generic kernel
  on the SAME trajectory as its dedicated kernel (same seeds, bitwise);
* fused (e, m) equals recomputation;
* engine activation: a custom-offset lattice takes the kernel (plan says
  pallas-gen) and stays chunk-deterministic.
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

CASES = [
    ("nnn_square", (8, 16), [[1, 0], [0, 1], [1, 1], [1, -1]]),
    ("stride2", (8, 16), [[2, 0], [0, 1]]),
    ("cubic_diag", (8, 8, 8), [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]),
    ("knight", (8, 16), [[1, 2], [2, 1]]),
]


def _setup(shape, offsets, n_sys, seed):
    lat = Lattice(list(shape), offsets)
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
@pytest.mark.parametrize("name,shape,offsets", CASES)
def test_gen_matches_jnp_with_shared_uniforms(name, shape, offsets, gibbs):
    """Kernel flip decisions == the jnp multicolor path's, bitwise, for
    chained sweeps (multi-step seam wraps must resolve per packed
    system)."""
    n_sys = 8 if len(shape) == 2 else 4  # kp lanes must divide n_systems
    lat, geom, rng, coup_j, coup_bwd, spins = _setup(shape, offsets, n_sys, 5)
    kp = psd.pack_factor_gen(lat, n_sys)
    assert kp >= 1, name
    meta = psd.gen_meta(lat)
    shape3, gen = meta[0], tuple(meta[1:])
    jg = psd.pack_coupling_grids_gen(coup_j, lat, kp)
    temps = jnp.asarray(np.linspace(1.5, 8.0, n_sys), jnp.float32)
    cm = jnp.asarray(lat.color_masks())
    nc = gen[3]
    l0 = shape3[0]
    block = shape3[1] * shape3[2]

    for step in range(2):
        u = jnp.asarray(
            rng.random((nc, n_sys, lat.n_spins), dtype=np.float32)
        )
        ref = mc_sweep(
            spins, coup_j, coup_bwd, geom, cm, temps,
            jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
        )
        u_pk = jnp.stack(
            [pallas_sweep3d.pack_rows_3d(u[c], l0, block, kp, 1)
             for c in range(nc)],
            axis=1,
        )
        with pltpu.force_tpu_interpret_mode():
            got = psd.sweep_gen_injected(
                spins, jg, temps, u_pk, shape=shape3, gen=gen, kp=kp,
                gibbs=gibbs,
            )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"{name} step {step}"
        )
        spins = ref


def test_gen_fcc_matches_diag_trajectory():
    """FCC expressed as a raw offset table through the generic kernel runs
    the SAME trajectory as the dedicated FCC kernel (same seeds, same
    hardware-PRNG draw schedule -> bitwise)."""
    shape = (8, 8, 8)
    n_sys = 4
    lat, geom, rng, coup_j, _, spins = _setup(
        shape, GEOMETRY_OFFSETS["fcc"], n_sys, 7
    )
    kp_d = psd.pack_factor_diag(lat, n_sys)
    kp_g = psd.pack_factor_gen(lat, n_sys)
    assert kp_d == kp_g >= 1
    meta = psd.gen_meta(lat)
    shape3, gen = meta[0], tuple(meta[1:])
    # the generic color table must reproduce the FCC parity formula
    assert gen[1] == (2, 2, 1) and gen[2] == (0, 1, 2, 3) and gen[3] == 4
    jg_d = psd.pack_coupling_grids_diag(coup_j, shape, "fcc", kp_d)[None]
    jg_g = psd.pack_coupling_grids_gen(coup_j, lat, kp_g)[None]
    np.testing.assert_array_equal(np.asarray(jg_d), np.asarray(jg_g))
    temps = jnp.asarray(np.linspace(1.5, 8.0, n_sys), jnp.float32)[None]
    seeds = jnp.asarray(
        rng.integers(1, 2**30, (1, 2 * (n_sys // kp_d))), jnp.int32
    )
    with pltpu.force_tpu_interpret_mode():
        out_d = psd.sweep_diag(
            spins[None], jg_d, temps, seeds, shape=shape, kind="fcc",
            kp=kp_d,
        )
        out_g = psd.sweep_gen(
            spins[None], jg_g, temps, seeds, shape=shape3, gen=gen, kp=kp_g,
        )
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_g))


def test_gen_fused_measurement_matches_recompute():
    """sweep_gen_fused's (e, m) must equal recomputation from its output."""
    from peapods_tpu.ops.energy import energies_and_mags

    name, shape, offsets = CASES[0]
    n_sys = 8
    lat, geom, rng, coup_j, _, spins = _setup(shape, offsets, n_sys, 9)
    kp = psd.pack_factor_gen(lat, n_sys)
    meta = psd.gen_meta(lat)
    shape3, gen = meta[0], tuple(meta[1:])
    jg = psd.pack_coupling_grids_gen(coup_j, lat, kp)[None]
    temps = jnp.asarray(np.linspace(1.5, 8.0, n_sys), jnp.float32)[None]
    seeds = jnp.asarray(
        rng.integers(1, 2**30, (1, 2 * (n_sys // kp))), jnp.int32
    )
    with pltpu.force_tpu_interpret_mode():
        out, e, m = psd.sweep_gen_fused(
            spins[None], jg, temps, seeds, shape=shape3, gen=gen, kp=kp
        )
    e_ref, m_ref = energies_and_mags(out[0], coup_j, geom)
    np.testing.assert_allclose(np.asarray(e[0]), np.asarray(e_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(m[0]), np.asarray(m_ref))


def test_engine_gen_path(monkeypatch):
    """A custom-offset (NNN square) model activates the generic kernel
    (plan says pallas-gen, fused measurement at small instance counts),
    stays deterministic across chunkings, and the kill switch reverts to
    the jnp path."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    offs = [[1, 0], [0, 1], [1, 1], [1, -1]]
    shape = [8, 16]
    rng = np.random.default_rng(3)
    coup = rng.choice(np.float32([-1, 1]), size=tuple(shape) + (4,))
    temps = np.geomspace(1.5, 4.0, 4).astype(np.float32)

    def build():
        return IsingSimulation(shape, coup, temps, 2, offs, 11,
                               default_chunk=4, mesh=None)

    a = build()
    a.sample(6, "metropolis", pt_interval=2, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.gen >= 1
    assert "pallas-gen" in prog.describe_plan()
    assert prog.fuse_measure

    b = build()
    b.sample(3, "metropolis", pt_interval=2, warmup_ratio=0)
    b.sample(3, "metropolis", pt_interval=2, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )

    monkeypatch.setenv("PEAPODS_DISABLE_GEN", "1")
    c = build()
    c.sample(6, "metropolis", pt_interval=2, warmup_ratio=0)
    assert c.rt.gen == 0
    assert "sweep=jnp" in next(iter(c._programs.values())).describe_plan()
    monkeypatch.delenv("PEAPODS_DISABLE_GEN")
