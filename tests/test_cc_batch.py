"""Batched connected-components kernel (ops/pallas_cc_batch.py).

The kernel must be bitwise-equal per graph to the jnp min-label fixed point
(itself union-find-oracle-tested in tests/test_cluster.py), across every
packing layout; and the engine's FK phase must produce bitwise-identical
trajectories whether CC runs through the batch kernel or the jnp loop
(interpret mode pins the mechanics; throughput is measured on real TPU).
"""

import numpy as np
import pytest


@pytest.mark.parametrize(
    "shape", [(8, 8), (8, 8, 8), (16, 16, 16), (8, 128), (8, 24)]
)
def test_kernel_matches_jnp_fixed_point(shape):
    import jax
    import jax.numpy as jnp

    from peapods_tpu.ops.lattice import Lattice
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.pallas_cc_batch import (
        cc_batch_factors,
        connected_components_batch,
        supports_cc_batch,
    )

    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    assert supports_cc_batch(lat)
    kp, ks = cc_batch_factors(lat, 16)
    b = ((16 + kp * ks - 1) // (kp * ks)) * (kp * ks)
    rng = np.random.default_rng(hash(shape) % 2**32)
    # mixed densities: sub/percolating/supercritical plus empty + full
    dens = np.linspace(0.0, 1.0, b)[:, None, None]
    active = rng.random((b, lat.n_spins, lat.n_dims)) < dens
    lab_k = connected_components_batch(
        jnp.asarray(active), shape=shape, kp=kp, ks=ks, interpret=True
    )
    lab_j = jax.vmap(lambda a: cl.connected_components(a, geom))(
        jnp.asarray(active)
    )
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_j))


@pytest.mark.parametrize(
    "shape,tri", [((8, 8), False), ((8, 8, 8), False),
                  ((8, 24), True), ((8, 128), True)]
)
def test_log_doubling_matches_classic(shape, tri):
    """The log-doubling fixed-point body (PEAPODS_CC_LOG=1) must produce
    the SAME labels bitwise as the classic stride-1 body — it only adds
    monotone min moves along precomputed straight bond runs, so the fixed
    point is identical; only the round count changes."""
    import jax
    import jax.numpy as jnp

    from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.pallas_cc_batch import (
        cc_batch_factors,
        connected_components_batch,
        supports_cc_batch,
    )

    offs = GEOMETRY_OFFSETS["triangular"] if tri else None
    lat = Lattice(list(shape), offs)
    geom = GridOps.from_lattice(lat)
    assert supports_cc_batch(lat)
    kp, ks = cc_batch_factors(lat, 16)
    b = ((16 + kp * ks - 1) // (kp * ks)) * (kp * ks)
    rng = np.random.default_rng((hash(shape) + tri) % 2**32)
    dens = np.linspace(0.0, 1.0, b)[:, None, None]
    active = jnp.asarray(
        rng.random((b, lat.n_spins, lat.n_neighbors)) < dens
    )
    kw = dict(shape=shape, kp=kp, ks=ks, interpret=True, tri=tri)
    lab_log = connected_components_batch(active, log_cc=1, **kw)
    lab_classic = connected_components_batch(active, log_cc=0, **kw)
    np.testing.assert_array_equal(
        np.asarray(lab_log), np.asarray(lab_classic)
    )
    # k super rounds per convergence check: same fixed point bitwise
    lab_log4 = connected_components_batch(active, log_cc=4, **kw)
    np.testing.assert_array_equal(
        np.asarray(lab_log4), np.asarray(lab_classic)
    )
    # hybrid (classic rounds + one super round per check): same fixed point
    lab_mix = connected_components_batch(active, log_cc=-1, **kw)
    np.testing.assert_array_equal(
        np.asarray(lab_mix), np.asarray(lab_classic)
    )
    lab_j = jax.vmap(lambda a: cl.connected_components(a, geom))(active)
    np.testing.assert_array_equal(np.asarray(lab_log), np.asarray(lab_j))


def test_engine_fk_bitwise_vs_jnp_cc(monkeypatch):
    """SW every sweep on a 64^2-class lattice batch: trajectories must be
    bitwise identical with the batch kernel on and off (labels are equal,
    so flips, stats, and spins all follow).  The fused FK kernel is
    disabled so both arms actually exercise the STAGED path whose CC body
    this test compares (collect runs default to the fused kernel now)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PEAPODS_DISABLE_FKKERNEL", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    def sim(seed):
        coup = np.ones((2, 8, 24, 2), np.float32)
        temps = np.geomspace(1.8, 3.2, 3).astype(np.float32)
        return IsingSimulation([8, 24], coup, temps, 2, None, seed,
                               default_chunk=8, mesh=None)

    kw = dict(cluster_update_interval=1, cluster_mode="sw",
              collect_cluster_stats=True, pt_interval=1, warmup_ratio=0)
    a = sim(5)
    ra = a.sample(8, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.cc_batch and not prog.cc_pallas and not prog.fk_kernel

    monkeypatch.setenv("PEAPODS_DISABLE_CCBATCH", "1")
    b = sim(5)
    rb = b.sample(8, "metropolis", **kw)
    assert not next(iter(b._programs.values())).cc_batch
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(ra["fk_csd"], rb["fk_csd"])
    np.testing.assert_array_equal(ra["mags2"], rb["mags2"])


def test_engine_overlap_bitwise_vs_jnp_cc(monkeypatch):
    """Jorg+CMR overlap moves (two CC rounds per CMR event) routed through
    the batch kernel must reproduce the jnp-CC trajectory bitwise — labels
    are equal, and the staged task kernels draw identically to the
    monolithic ones.  The fused event kernel is disabled so both arms
    exercise the STAGED path whose CC body this test compares."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    def sim(seed):
        rng = np.random.default_rng(seed)
        coup = rng.choice(
            np.float32([-1, 1]), size=(2, 8, 8, 8, 3)
        )
        temps = np.geomspace(0.9, 2.2, 3).astype(np.float32)
        return IsingSimulation([8, 8, 8], coup, temps, 4, None, seed,
                               default_chunk=10, mesh=None)

    kw = dict(pt_interval=1, overlap_cluster_update_interval=5,
              overlap_cluster_build_mode="jorg+cmr",
              collect_cluster_stats=True, warmup_ratio=0)
    a = sim(7)
    ra = a.sample(20, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.cc_batch and not prog.event_kernel

    monkeypatch.setenv("PEAPODS_DISABLE_CCBATCH", "1")
    b = sim(7)
    rb = b.sample(20, "metropolis", **kw)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]), np.asarray(b.state["system_ids"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["overlap_csd"]), np.asarray(rb["overlap_csd"])
    )
    np.testing.assert_array_equal(ra["overlap2"], rb["overlap2"])


def test_cc_log_auto_and_parse():
    """Env parsing and the extent-gated auto default (chip rpc sweep
    2026-08-19: log wins on small-extent packed tiles, loses on 256^2
    single-graph tiles)."""
    from peapods_tpu.ops.pallas_cc_batch import auto_cc_log, parse_cc_log

    assert parse_cc_log(None) is None and parse_cc_log("auto") is None
    assert parse_cc_log("0") == 0
    assert parse_cc_log("1") == 1 and parse_cc_log("4") == 4
    assert parse_cc_log("mix") == -1 and parse_cc_log("-1") == -1
    assert parse_cc_log("yes") == 1
    assert auto_cc_log((64, 64)) == 1 and auto_cc_log((8, 128)) == 1
    assert auto_cc_log((256, 256)) == 0 and auto_cc_log((16, 16, 16)) == 1


def test_engine_log_cc_trajectory_invariant(monkeypatch):
    """PEAPODS_CC_LOG toggles the CC fixed-point body inside the fused FK
    kernel, the fused event kernel, and the batched CC (log-doubling is
    the default; ``0`` reverts) — labels are the same fixed point bitwise
    and the body consumes no randomness, so the whole trajectory (spins,
    CSDs) must be unchanged."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("PEAPODS_CC_LOG", "0")
    from peapods_tpu.engine.simulation import IsingSimulation

    def run(shape, kw, seed, n_sweeps):
        rng = np.random.default_rng(seed)
        coup = rng.choice(
            np.float32([-1, 1]), size=(2,) + shape + (len(shape),)
        )
        temps = np.geomspace(1.0, 2.4, 2).astype(np.float32)
        sim = IsingSimulation(list(shape), coup, temps, 2, None, seed,
                              default_chunk=8, mesh=None)
        r = sim.sample(n_sweeps, "metropolis", **kw)
        prog = next(iter(sim._programs.values()))
        return np.asarray(sim.state["spins"]), r, prog

    fk_kw = dict(cluster_update_interval=2, cluster_mode="sw",
                 collect_cluster_stats=True, pt_interval=1, warmup_ratio=0)
    ev_kw = dict(pt_interval=1, overlap_cluster_update_interval=2,
                 overlap_cluster_build_mode="houdayer",
                 collect_cluster_stats=True, warmup_ratio=0)

    sp_a, ra, prog_a = run((8, 24), fk_kw, 11, 4)
    ev_a, rea, eprog_a = run((8, 24), ev_kw, 13, 4)
    assert prog_a.fk_kernel and eprog_a.event_kernel
    assert "+log" not in prog_a.describe_plan()

    monkeypatch.setenv("PEAPODS_CC_LOG", "1")
    sp_b, rb, prog_b = run((8, 24), fk_kw, 11, 4)
    ev_b, reb, eprog_b = run((8, 24), ev_kw, 13, 4)
    assert prog_b.cc_log and "+log" in prog_b.describe_plan()
    assert "+log" in eprog_b.describe_plan()

    np.testing.assert_array_equal(sp_a, sp_b)
    np.testing.assert_array_equal(ev_a, ev_b)
    np.testing.assert_array_equal(ra["fk_csd"], rb["fk_csd"])
    np.testing.assert_array_equal(rea["overlap_csd"], reb["overlap_csd"])


def test_engine_fk_observe_bitwise(monkeypatch):
    """Observe-mode FK with the batch kernel: graph observations flow and
    spins still match an observer-free run bitwise."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    def sim(seed):
        coup = np.ones((8, 24, 2), np.float32)
        temps = np.array([2.0, 2.6], np.float32)
        return IsingSimulation([8, 24], coup, temps, 1, None, seed,
                               default_chunk=4, mesh=None)

    plain = sim(9)
    plain.sample(4, "metropolis", pt_interval=1, warmup_ratio=0)
    expected = np.asarray(plain.state["spins"])

    obs = sim(9)
    r = obs.sample(4, "metropolis", pt_interval=1, cluster_update_interval=2,
                   cluster_mode="sw", cluster_action="observe",
                   warmup_ratio=0)
    assert next(iter(obs._programs.values())).cc_batch
    np.testing.assert_array_equal(np.asarray(obs.state["spins"]), expected)
    fk = r["per_disorder"]["cluster_observations"]["fk"]
    assert fk["observation_count"].sum() > 0


@pytest.mark.parametrize(
    "shape,offsets",
    [
        ((8, 16), [[1, 0], [0, 1], [1, 1], [1, -1]]),   # NNN square
        ((8, 16), [[1, 2], [2, 1]]),                    # knight moves
        ((8, 8, 8), [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]),
    ],
)
def test_kernel_matches_jnp_fixed_point_custom_offsets(shape, offsets):
    """Custom offset tables through the generic packed-tile CC
    (cc_gen_offsets + the offset-closure fixed point, round 5): labels
    must be bitwise the jnp fixed point's — the unique per-graph minimum
    labeling — across densities."""
    import jax
    import jax.numpy as jnp

    from peapods_tpu.ops.lattice import Lattice
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.pallas_cc_batch import (
        cc_batch_factors,
        cc_gen_offsets,
        connected_components_batch,
        supports_cc_batch,
    )

    lat = Lattice(list(shape), offsets)
    geom = GridOps.from_lattice(lat)
    assert not supports_cc_batch(lat)
    offs = cc_gen_offsets(lat)
    assert offs is not None
    kp, ks = cc_batch_factors(lat, 8)
    b = ((8 + kp * ks - 1) // (kp * ks)) * (kp * ks)
    rng = np.random.default_rng(3)
    dens = np.linspace(0.0, 1.0, b)[:, None, None]
    active = rng.random((b, lat.n_spins, lat.n_neighbors)) < dens
    lab_k = connected_components_batch(
        jnp.asarray(active), shape=shape, kp=kp, ks=ks, interpret=True,
        offsets=offs,
    )
    lab_j = jax.vmap(lambda a: cl.connected_components(a, geom))(
        jnp.asarray(active)
    )
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_j))


def test_engine_custom_offsets_cc_batch(monkeypatch):
    """A custom-offset lattice's SW phase rides the batched CC kernel
    (plan says cc=pallas-batch) with a trajectory bitwise the jnp-CC
    run's."""
    import jax  # noqa: F401
    import numpy as np

    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    offs = [[1, 0], [0, 1], [1, 1], [1, -1]]
    rng = np.random.default_rng(5)
    coup = rng.choice(np.float32([-1, 1]), size=(2, 8, 16, 4))
    temps = np.geomspace(2.0, 6.0, 4).astype(np.float32)

    def build():
        return IsingSimulation([8, 16], coup, temps, 2, offs, 21,
                               default_chunk=4, mesh=None)

    a = build()
    ra = a.sample(6, "metropolis", cluster_update_interval=2,
                  cluster_mode="sw", collect_cluster_stats=True,
                  warmup_ratio=0)
    prog = next(iter(a._programs.values()))
    assert prog.cc_batch
    assert "cc=pallas-batch" in prog.describe_plan()

    monkeypatch.setenv("PEAPODS_DISABLE_CCBATCH", "1")
    b = build()
    rb = b.sample(6, "metropolis", cluster_update_interval=2,
                  cluster_mode="sw", collect_cluster_stats=True,
                  warmup_ratio=0)
    assert not next(iter(b._programs.values())).cc_batch
    monkeypatch.delenv("PEAPODS_DISABLE_CCBATCH")
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["fk_csd"]), np.asarray(rb["fk_csd"])
    )


@pytest.mark.parametrize("shape", [(8, 8), (8, 128), (16, 16)])
def test_winding_kernel_matches_jnp_flags(shape):
    """The batched winding kernel's (wx, wy) flags equal the jnp BFS
    (winding_flags) per graph — flags are settle-order-independent (a
    spanning-tree potential violates on a chord iff that chord's
    fundamental cycle winds), so any valid settle schedule marks exactly
    the winding components."""
    import jax
    import jax.numpy as jnp

    from peapods_tpu.ops.lattice import Lattice
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.pallas_cc_batch import (
        cc_batch_factors,
        connected_components_batch,
        supports_winding_batch,
        winding_batch,
    )

    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    assert supports_winding_batch(lat)
    kp, ks = cc_batch_factors(lat, 12)
    b = ((12 + kp * ks - 1) // (kp * ks)) * (kp * ks)
    rng = np.random.default_rng(hash(("wind",) + shape) % 2**32)
    # densities straddling the wrapping transition, plus deterministic
    # extremes: empty (no winding), full (winds both ways), a single
    # straight line around x only
    dens = np.linspace(0.3, 0.75, b)[:, None, None]
    active = rng.random((b, lat.n_spins, 2)) < dens
    active[0] = False
    active[1] = True
    active[2] = False
    row0 = np.arange(shape[1])  # sites of grid row 0, y-bonds wrap a ring
    active[2, row0, 1] = True
    labels = connected_components_batch(
        jnp.asarray(active), shape=shape, kp=kp, ks=ks, interpret=True
    )
    wx_k, wy_k = winding_batch(
        jnp.asarray(active), labels, shape=shape, kp=kp, ks=ks,
        interpret=True,
    )
    wf = jax.vmap(lambda a, l: cl.winding_flags(a, l, geom))(
        jnp.asarray(active), labels
    )
    np.testing.assert_array_equal(np.asarray(wx_k), np.asarray(wf[0]))
    np.testing.assert_array_equal(np.asarray(wy_k), np.asarray(wf[1]))
    assert not np.asarray(wx_k)[0] and not np.asarray(wy_k)[0]
    assert np.asarray(wx_k)[1] and np.asarray(wy_k)[1]
