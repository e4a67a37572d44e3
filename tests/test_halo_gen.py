"""Generic halo-exchange sweep kernel under the space mesh
(pallas_sweep_diag.sweep_gen_halo_color): triangular / BCC / FCC / custom
offset tables keep a Pallas fast path when the lattice is row-band sharded
(the round-4 verdict's item 6).

Kernel pin: a full sweep emulated shard-by-shard (halos sliced from the
global state before every color pass, exactly the engine's ppermute
schedule) must equal the full-lattice jnp multicolor path bitwise under
shared uniforms.  Engine pins: activation + plan string + chunk
determinism on a real virtual space mesh, for a triangular and an FCC
lattice.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice
from peapods_tpu.ops import pallas_sweep_diag as psd
from peapods_tpu.ops.sweep import mc_sweep

KCASES = [
    ("tri", (16, 128), GEOMETRY_OFFSETS["triangular"]),
    ("fcc", (16, 16, 8), GEOMETRY_OFFSETS["fcc"]),
    ("nnn", (16, 128), [[1, 0], [0, 1], [1, 1], [1, -1]]),
]


@pytest.mark.parametrize("name,shape,offsets", KCASES)
@pytest.mark.parametrize("gibbs", [False])
def test_gen_halo_matches_jnp_with_shared_uniforms(name, shape, offsets,
                                                   gibbs):
    ns = 2
    n_sys = 2
    lat = Lattice(list(shape), offsets)
    geom = GridOps.from_lattice(lat)
    n_nb = lat.n_neighbors
    rng = np.random.default_rng(11)
    coup = rng.choice([-1.0, 1.0], size=(lat.n_spins, n_nb)).astype(
        np.float32
    )
    coup_j = jnp.asarray(coup)
    coup_bwd = jnp.asarray(coup[lat.bwd, np.arange(n_nb)[None, :]])
    spins = jnp.asarray(
        rng.choice([-1, 1], size=(n_sys, lat.n_spins)).astype(np.int8)
    )
    hg = psd.halo_gen_meta(lat, n_sys, ns)
    assert hg is not None, name
    meta, m = hg
    shape3, offs3, periods, table, n_colors = meta
    gen = (offs3, periods, table, n_colors)
    l0, l1, l2 = shape3
    block = l1 * l2
    hl = l0 // ns
    jg = psd.pack_coupling_grids_gen(coup_j, lat, 1)  # [2n_nb, L0, block]
    temps = jnp.asarray(np.linspace(1.5, 6.0, n_sys), jnp.float32)
    cm = jnp.asarray(lat.color_masks())

    u = jnp.asarray(
        rng.random((n_colors, n_sys, lat.n_spins), dtype=np.float32)
    )
    ref = mc_sweep(
        spins, coup_j, coup_bwd, geom, cm, temps,
        jax.random.PRNGKey(0), gibbs=gibbs, uniforms=u,
    )

    # emulate the engine: global grid state, per color pass slice each
    # shard's extended band (with wrap-around halos) and run the kernel
    g_state = np.asarray(spins).reshape(n_sys, l0, block)
    u_grid = np.asarray(u).reshape(n_colors, n_sys, l0, block)
    for c in range(n_colors):
        new_rows = np.empty_like(g_state)
        for s_i in range(ns):
            r0 = s_i * hl
            rows = np.arange(r0 - m, r0 + hl + m) % l0
            sext = jnp.asarray(g_state[:, rows])
            u_ext = jnp.asarray(u_grid[c][:, rows])
            # the engine's shard-local coupling slice, zero-padded halos
            jg_ext = jnp.pad(
                jg[:, r0:r0 + hl], ((0, 0), (m, m), (0, 0))
            )
            off = np.full((1, 1), r0, np.int32)
            out = psd.sweep_gen_halo_color_injected(
                sext, jg_ext, temps, u_ext, jnp.asarray(off),
                shape_local=(hl, l0, l1, l2), gen=gen, color=c, m=m,
                gibbs=gibbs, interpret=True,
            )
            new_rows[:, r0:r0 + hl] = np.asarray(out)[:, m:m + hl]
        g_state = new_rows
    np.testing.assert_array_equal(
        g_state.reshape(n_sys, lat.n_spins), np.asarray(ref),
        err_msg=name,
    )


@pytest.mark.parametrize(
    "name,shape,offsets",
    [("tri", [16, 128], GEOMETRY_OFFSETS["triangular"]),
     ("fcc", [16, 16, 8], GEOMETRY_OFFSETS["fcc"])],
)
def test_engine_gen_halo_path(monkeypatch, name, shape, offsets):
    """Space-mesh tri/FCC models activate the generic halo kernel (plan
    says pallas-gen-halo), stay chunk-deterministic, and the kill switch
    reverts to the jnp path."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    coup = rng.choice(
        np.float32([-1, 1]), size=tuple(shape) + (len(offsets),)
    )
    temps = np.geomspace(2.0, 6.0, 2).astype(np.float32)
    mesh = make_mesh(2, ("space",))

    def build():
        return IsingSimulation(shape, coup, temps, 1, offsets, 13,
                               default_chunk=2, mesh=make_mesh(2, ("space",)))

    a = build()
    a.sample(4, "metropolis", pt_interval=2, warmup_ratio=0)
    assert a.rt.halo_gen == 1
    prog = next(iter(a._programs.values()))
    assert "pallas-gen-halo" in prog.describe_plan()

    b = build()
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    b.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )

    monkeypatch.setenv("PEAPODS_DISABLE_GEN", "1")
    c = build()
    c.sample(2, "metropolis", pt_interval=2, warmup_ratio=0)
    assert c.rt.halo_gen == 0
    assert "sweep=jnp" in next(iter(c._programs.values())).describe_plan()
    monkeypatch.delenv("PEAPODS_DISABLE_GEN")


def test_engine_gen_halo_systems_x_space(monkeypatch):
    """systems x space composition: the halo ring runs per systems-shard
    and the per-(shard, color) PRNG streams depend only on the space
    index, so the trajectory is bitwise the space-only run's."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 4:
        _pytest.skip("needs 4 virtual devices")
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    offs = [[1, 0], [0, 1], [1, -1]]
    shape = [16, 128]
    rng = np.random.default_rng(9)
    coup = rng.choice(np.float32([-1, 1]), size=tuple(shape) + (3,))
    temps = np.geomspace(2.0, 6.0, 2).astype(np.float32)

    a = IsingSimulation(shape, coup, temps, 2, offs, 13, default_chunk=2,
                        mesh=make_mesh(4, ("systems", "space")))
    a.sample(3, "metropolis", pt_interval=2, warmup_ratio=0)
    assert a.rt.halo_gen == 1

    b = IsingSimulation(shape, coup, temps, 2, offs, 13, default_chunk=2,
                        mesh=make_mesh(2, ("space",)))
    b.sample(3, "metropolis", pt_interval=2, warmup_ratio=0)
    assert b.rt.halo_gen == 1
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
