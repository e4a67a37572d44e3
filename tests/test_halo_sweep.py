"""Halo-exchange 2D sweep kernel under the `space` mesh axis.

The kernel updates one checkerboard color of one row band per call, with
the vertical band-edge neighbors supplied as halo rows.  Correctness is
pinned two ways: (1) the injected-uniform kernel, run shard-by-shard with
hand-carried halos, reproduces a full-lattice jnp single-color update
bitwise; (2) the engine path activates under a `space` mesh in interpret
mode and keeps the simulation contract (determinism, finite stats, PT
permutation integrity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _jnp_color_pass(s, jg, inv_half_t, u, color):
    """Full-lattice single-color reference (lazy Metropolis, ops/sweep.py)."""
    from peapods_tpu.ops.sweep import METROPOLIS_LAZINESS

    h, w = s.shape
    row, col = np.indices((h, w))
    parity = (row + col) & 1
    field = (
        np.roll(s, 1, 0) * jg[0]
        + np.roll(s, -1, 0) * jg[1]
        + np.roll(s, 1, 1) * jg[2]
        + np.roll(s, -1, 1) * jg[3]
    )
    p = (1.0 - METROPOLIS_LAZINESS) * np.exp(
        np.minimum(-s * field * inv_half_t, 0.0)
    )
    flip = (u < p) & (parity == color)
    return np.where(flip, -s, s)


@pytest.mark.parametrize("color", [0, 1])
def test_injected_kernel_matches_full_lattice_reference(color):
    """Shard-by-shard halo kernel == full-lattice single-color pass."""
    from peapods_tpu.ops.pallas_sweep import (
        pack_coupling_grids,
        sweep_2d_halo_color_injected,
    )

    h, w, ns = 16, 128, 4
    hl = h // ns
    rng = np.random.default_rng(3)
    s = rng.choice(np.int8([-1, 1]), size=(h, w))
    coup = rng.choice(np.float32([-1, 1]), size=(h * w, 2))
    jg = np.asarray(pack_coupling_grids(jnp.asarray(coup), (h, w)))
    u = rng.random((h, w)).astype(np.float32)
    temp = np.float32(1.7)

    expected = _jnp_color_pass(
        s.astype(np.float64), jg, 1.0 / (0.5 * temp), u, color
    ).astype(np.int8)

    out = np.empty_like(s)
    for shard in range(ns):
        band = slice(shard * hl, (shard + 1) * hl)
        hup = s[(shard * hl - 1) % h][None, None]           # row above band
        hdn = s[((shard + 1) * hl) % h][None, None]         # row below band
        res = sweep_2d_halo_color_injected(
            jnp.asarray(s[band])[None],
            jnp.asarray(jg[:, band]),
            jnp.asarray([temp]),
            jnp.asarray(u[band])[None],
            jnp.asarray(hup),
            jnp.asarray(hdn),
            jnp.full((1, 1), shard * hl, jnp.int32),
            shape_local=(hl, w),
            color=color,
            interpret=True,
        )
        out[band] = np.asarray(res[0])
    np.testing.assert_array_equal(out, expected)


@pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)
def test_engine_halo_path_under_space_mesh(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    def sim(seed):
        coup = np.ones((32, 128, 2), np.float32)
        temps = np.geomspace(1.8, 3.2, 3).astype(np.float32)
        return IsingSimulation(
            [32, 128], coup, temps, 1, None, seed, default_chunk=8,
            mesh=make_mesh(4, ("space",)),
        )

    a = sim(5)
    ra = a.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.halo2d and "pallas-2d-halo" in prog.describe_plan()
    assert np.isfinite(ra["mags2"]).all()
    sid = np.asarray(a.state["system_ids"]).reshape(-1)
    assert sorted(sid.tolist()) == list(range(3))

    # determinism across chunkings
    b = sim(5)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )


def _jnp_color_pass3d(s, coup_fwd, inv_half_t, u, color):
    """Full-lattice 3D single-color reference (lazy Metropolis)."""
    from peapods_tpu.ops.sweep import METROPOLIS_LAZINESS

    l0, l1, l2 = s.shape
    i, j, k = np.indices((l0, l1, l2))
    parity = (i + j + k) & 1
    field = np.zeros_like(s)
    for d in range(3):
        fwd = coup_fwd[:, d].reshape(l0, l1, l2)
        field += np.roll(s, 1, d) * np.roll(fwd, 1, d) + np.roll(s, -1, d) * fwd
    p = (1.0 - METROPOLIS_LAZINESS) * np.exp(
        np.minimum(-s * field * inv_half_t, 0.0)
    )
    flip = (u < p) & (parity == color)
    return np.where(flip, -s, s)


@pytest.mark.parametrize(
    "shape,kp,n_systems",
    [((16, 8, 16), 1, 1), ((16, 8, 8), 2, 2)],
)
@pytest.mark.parametrize("color", [0, 1])
def test_injected_kernel3d_matches_full_lattice_reference(
    shape, kp, n_systems, color
):
    """Shard-by-shard 3D halo kernel == full-lattice single-color pass,
    including the lane-packed (kp=2) layout where two systems share one
    tile and each needs its own halo planes."""
    from peapods_tpu.ops.pallas_sweep3d import (
        pack_coupling_grids_3d,
        pack_rows_3d,
        sweep_3d_halo_color_injected,
        unpack_rows_3d,
    )

    l0, l1, l2 = shape
    block = l1 * l2
    ns = 2
    l0l = l0 // ns
    rng = np.random.default_rng(11)
    s = rng.choice(np.int8([-1, 1]), size=(n_systems, l0, l1, l2))
    coup = rng.choice(np.float32([-1, 1]), size=(l0 * l1 * l2, 3))
    u = rng.random((n_systems, l0, l1, l2)).astype(np.float32)
    temps = np.linspace(1.5, 2.1, n_systems).astype(np.float32)

    expected = np.stack([
        _jnp_color_pass3d(
            s[c].astype(np.float64), coup, 1.0 / (0.5 * temps[c]), u[c],
            color,
        ).astype(np.int8)
        for c in range(n_systems)
    ])

    jg = np.asarray(
        pack_coupling_grids_3d(jnp.asarray(coup), shape, kp, 1)
    )  # [6, L0, kp*block]
    out = np.empty_like(s)
    for shard in range(ns):
        band = slice(shard * l0l, (shard + 1) * l0l)
        sp = jnp.asarray(
            pack_rows_3d(
                jnp.asarray(s[:, band].reshape(n_systems, l0l * block)),
                l0l, block, kp, 1,
            )
        )  # [g, l0l, kp*block]
        packed_plane = lambda i_glob: pack_rows_3d(
            jnp.asarray(s[:, i_glob].reshape(n_systems, block)),
            1, block, kp, 1,
        )  # [g, 1, kp*block]
        hup = packed_plane((shard * l0l - 1) % l0)
        hdn = packed_plane(((shard + 1) * l0l) % l0)
        up = pack_rows_3d(
            jnp.asarray(u[:, band].reshape(n_systems, l0l * block)),
            l0l, block, kp, 1,
        ).astype(jnp.float32)
        res = sweep_3d_halo_color_injected(
            sp, jnp.asarray(jg[:, band]), jnp.asarray(temps), up,
            hup, hdn, jnp.full((1, 1), shard * l0l, jnp.int32),
            shape_local=(l0l, l1, l2), kp=kp, color=color, interpret=True,
        )
        out[:, band] = np.asarray(
            unpack_rows_3d(res, l0l, block, kp, 1)
        ).reshape(n_systems, l0l, l1, l2)
    np.testing.assert_array_equal(out, expected)


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs 2 virtual devices"
)
def test_engine_halo3d_path_under_space_mesh(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    def sim(seed):
        rng = np.random.default_rng(23)
        coup = rng.choice(
            np.float32([-1, 1]), size=(1, 16, 8, 16, 3)
        )
        temps = np.geomspace(1.2, 2.4, 3).astype(np.float32)
        return IsingSimulation(
            [16, 8, 16], coup, temps, 1, None, seed, default_chunk=8,
            mesh=make_mesh(2, ("space",)),
        )

    a = sim(5)
    ra = a.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.halo3d == 1 and "pallas-3d-halo" in prog.describe_plan()
    assert np.isfinite(ra["mags2"]).all()
    sid = np.asarray(a.state["system_ids"]).reshape(-1)
    assert sorted(sid.tolist()) == list(range(3))

    # determinism across chunkings
    b = sim(5)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("dim", ["2d", "2dp", "3d"])
def test_halo_fused_measure_matches_jnp_recompute(monkeypatch, dim):
    """Under fuse_measure the halo kernels emit per-shard raw (e, m) sums
    psum'd over 'space'; with PT off the trajectory is identical to the
    unfused run (spins never depend on the measured energy), so recorded
    energies/magnetizations must agree with the jnp recompute up to f32
    summation order."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(31)
    if dim == "2d":
        shape, ns = [32, 128], 4
        coup = rng.choice(np.float32([-1, 1]), size=(1, 32, 128, 2))
    elif dim == "2dp":  # lane-packed narrow lattice (halo2d_k = 2)
        shape, ns = [32, 64], 2
        coup = rng.choice(np.float32([-1, 1]), size=(1, 32, 64, 2))
    else:
        shape, ns = [16, 8, 16], 2
        coup = rng.choice(np.float32([-1, 1]), size=(1, 16, 8, 16, 3))
    # the packed case needs an even system count (pack groups of k=2)
    temps = np.geomspace(1.4, 2.6, 4 if dim == "2dp" else 3).astype(
        np.float32
    )

    def run(fuse):
        if not fuse:
            monkeypatch.setenv("PEAPODS_DISABLE_FUSE", "1")
        else:
            monkeypatch.delenv("PEAPODS_DISABLE_FUSE", raising=False)
        sim = IsingSimulation(
            shape, coup, temps, 1, None, 11, default_chunk=8,
            mesh=make_mesh(ns, ("space",)),
        )
        r = sim.sample(6, "metropolis", pt_interval=None, warmup_ratio=0)
        prog = next(iter(sim._programs.values()))
        assert prog.fuse_measure == fuse, prog.describe_plan()
        return r, np.asarray(sim.state["spins"])

    r_f, spins_f = run(True)
    r_j, spins_j = run(False)
    np.testing.assert_array_equal(spins_f, spins_j)
    np.testing.assert_allclose(r_f["energies"], r_j["energies"], rtol=3e-5,
                               atol=1e-6)
    np.testing.assert_allclose(r_f["mags2"], r_j["mags2"], rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.parametrize("dim", ["2d", "2dp", "3d"])
def test_engine_halo_under_systems_x_space_mesh(monkeypatch, dim):
    """A 'systems' axis composes with 'space': the halo ring runs per
    systems-shard and the seed words are a sharded lookup table, so the
    systems x space trajectory must be BITWISE the space-only one (same
    global seeds, same space-shard folds — the systems split changes no
    PRNG stream and no per-system reduction)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    if dim == "2d":
        shape = [32, 128]
        rng = np.random.default_rng(31)
        coup = rng.choice(np.float32([-1, 1]), size=(1, 32, 128, 2))
    elif dim == "2dp":  # lane-packed narrow lattice (halo2d_k = 2)
        shape = [32, 64]
        rng = np.random.default_rng(43)
        coup = rng.choice(np.float32([-1, 1]), size=(1, 32, 64, 2))
    else:
        shape = [16, 8, 16]
        rng = np.random.default_rng(37)
        coup = rng.choice(np.float32([-1, 1]), size=(1, 16, 8, 16, 3))
    temps = np.geomspace(1.2, 2.8, 2).astype(np.float32)

    def run(mesh):
        sim = IsingSimulation(shape, coup, temps, 2, None, 5,
                              default_chunk=8, mesh=mesh)
        sim.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
        prog = next(iter(sim._programs.values()))
        return sim, prog

    a, prog_a = run(make_mesh(4, ("systems", "space")))
    want = {
        "2d": "pallas-2d-halo",
        "2dp": "pallas-2d-halo-packed(k=2)",
        "3d": "pallas-3d-halo",
    }[dim]
    assert want in prog_a.describe_plan(), prog_a.describe_plan()
    b, prog_b = run(make_mesh(2, ("space",)))
    assert want in prog_b.describe_plan()
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]), np.asarray(b.state["system_ids"])
    )


@pytest.mark.parametrize("color", [0, 1])
def test_injected_packed_kernel_matches_full_lattice_reference(color):
    """Shard-by-shard lane-packed halo kernel == full-lattice single-color
    pass, per packed system (narrow W < 128 lattices under the space
    mesh; seam-corrected rolls + packed halo rows)."""
    from peapods_tpu.ops.pallas_sweep import (
        pack_coupling_grids,
        pack_coupling_grids_packed,
        pack_spins,
        unpack_spins,
        sweep_2d_halo_color_packed_injected,
    )

    h, w, k, ns = 16, 64, 2, 2
    hl = h // ns
    rng = np.random.default_rng(9)
    s = rng.choice(np.int8([-1, 1]), size=(k, h, w))
    coup = rng.choice(np.float32([-1, 1]), size=(h * w, 2))
    jg1 = np.asarray(pack_coupling_grids(jnp.asarray(coup), (h, w)))
    jgp = np.asarray(
        pack_coupling_grids_packed(jnp.asarray(coup), (h, w), k)
    )
    u = rng.random((k, h, w)).astype(np.float32)
    temps = np.float32([1.3, 2.1])

    expected = np.stack([
        _jnp_color_pass(
            s[j].astype(np.float64), jg1, 1.0 / (0.5 * temps[j]), u[j],
            color,
        ).astype(np.int8)
        for j in range(k)
    ])

    out = np.empty_like(s)
    for shard in range(ns):
        band = slice(shard * hl, (shard + 1) * hl)
        packed = np.asarray(pack_spins(
            jnp.asarray(s[:, band].reshape(k, hl * w)), (hl, w), k
        ))  # [1, hl, k*w]
        u_packed = np.asarray(pack_spins(
            jnp.asarray(u[:, band].reshape(k, hl * w)), (hl, w), k
        ))
        hup = np.concatenate(
            [s[j, (shard * hl - 1) % h] for j in range(k)]
        )[None, None]  # [1, 1, k*w] packed halo row
        hdn = np.concatenate(
            [s[j, ((shard + 1) * hl) % h] for j in range(k)]
        )[None, None]
        res = sweep_2d_halo_color_packed_injected(
            jnp.asarray(packed),
            jnp.asarray(jgp[:, band]),
            jnp.asarray(temps),
            jnp.asarray(u_packed),
            jnp.asarray(hup),
            jnp.asarray(hdn),
            jnp.full((1, 1), shard * hl, jnp.int32),
            shape_local=(hl, w),
            k=k,
            color=color,
            interpret=True,
        )
        out[:, band] = np.asarray(unpack_spins(
            jnp.asarray(res), (hl, w), k
        )).reshape(k, hl, w)
    np.testing.assert_array_equal(out, expected)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_engine_packed_halo_under_space_mesh(monkeypatch):
    """Narrow (W < 128) lattices keep a Pallas fast path under the space
    mesh via the lane-packed halo kernel."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    def sim(seed):
        rng = np.random.default_rng(41)
        coup = rng.choice(np.float32([-1, 1]), size=(1, 32, 64, 2))
        temps = np.geomspace(1.5, 3.0, 2).astype(np.float32)
        return IsingSimulation(
            [32, 64], coup, temps, 1, None, seed, default_chunk=8,
            mesh=make_mesh(2, ("space",)),
        )

    a = sim(5)
    ra = a.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert a.rt.halo2d_k == 2
    assert "pallas-2d-halo-packed(k=2)" in prog.describe_plan()
    assert np.isfinite(ra["mags2"]).all()
    sid = np.asarray(a.state["system_ids"]).reshape(-1)
    assert sorted(sid.tolist()) == list(range(2))

    # determinism across chunkings
    b = sim(5)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    b.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
