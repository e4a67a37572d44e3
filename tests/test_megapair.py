"""Pairs-megakernel path (ops/pallas_megapair.py): mechanics on the CPU
interpreter.

Like tests/test_mega.py, the Mosaic interpreter stubs the hardware PRNG, so
these tests pin the machinery: eligibility, in-kernel measurement identities,
determinism, chunk invariance, PT bookkeeping, results-schema parity with the
scan path, and the bitwise observe-invariance contract through the jnp PT
mirror (pt_event_jnp draws the kernel's exact murmur-mixed uniforms).
Statistical equivalence with the scan path runs on real TPU
(tests/mega_equivalence.py).
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")


def glass(seed, shape=(8, 8, 8), n_replicas=4, n_temps=4, chunk=256,
          n_disorder=1, mesh=None):
    """Bimodal spin glass on the engine directly (chunk/mesh control)."""
    from peapods_tpu.engine.simulation import IsingSimulation

    rng = np.random.default_rng(seed)
    n_nb = len(shape)
    coup = rng.choice(
        np.float32([-1, 1]), size=(n_disorder,) + tuple(shape) + (n_nb,)
    )
    if n_disorder == 1:
        coup = coup[0]
    temps = np.geomspace(0.9, 2.2, n_temps).astype(np.float32)
    return IsingSimulation(
        list(shape), coup, temps, n_replicas, None, seed,
        default_chunk=chunk, mesh=mesh,
    )


def _prog(sim):
    return next(iter(sim._programs.values()))


def test_eligibility():
    from peapods_tpu.ops.pallas_megapair import supports_megapair
    from peapods_tpu.ops.lattice import Lattice

    # 8^3: 64-lane block -> kp=2 lane groups, R=4 -> rp=2
    assert supports_megapair(Lattice([8, 8, 8]), 4, 24) == (2, 2)
    # 16^3: full 256 lanes -> kp=1, replicas stack on rows
    assert supports_megapair(Lattice([16, 16, 16]), 2, 12) == (1, 2)
    # 2D with 128-multiple width
    assert supports_megapair(Lattice([8, 128]), 2, 4) == (1, 2)
    # kp must divide n_replicas (8^3 needs kp=2)
    assert supports_megapair(Lattice([8, 8, 8]), 3, 4) is None
    # single replica -> no pairs (the 2D megakernel's domain)
    assert supports_megapair(Lattice([8, 128]), 1, 4) is None
    # triangular offsets unsupported
    assert (
        supports_megapair(Lattice([8, 8], [[1, 0], [0, 1], [1, -1]]), 2, 4)
        is None
    )


def test_engine_gating():
    m = glass(3)
    m.sample(1, "metropolis", warmup_ratio=0)
    assert _prog(m).megapair
    m2 = glass(3)
    m2.sample(1, "metropolis", cluster_update_interval=2, warmup_ratio=0)
    assert not _prog(m2).megapair  # FK phase needs per-sweep spins
    m3 = glass(3)
    m3.sample(
        2,
        "metropolis",
        overlap_cluster_update_interval=1,
        overlap_cluster_build_mode="houdayer",
        snapshot_interval=1,
        collect_cluster_stats=True,
        warmup_ratio=0,
    )
    assert not _prog(m3).megapair  # snapshots ride the scan path


@pytest.mark.parametrize(
    "shape,n_replicas",
    [((8, 8, 8), 4), ((16, 16, 16), 2), ((8, 128), 2)],
)
def test_measurement_identities(shape, n_replicas):
    """One recorded sweep, no PT: every in-kernel record (e, m, q, q_l)
    must match a direct recompute from the final spins — pinning the
    energy-from-field trick, the region reductions, and the pair-partner
    layout on all three packings (kp=2 lane groups, kp=1 row blocks, 2D)."""
    from peapods_tpu.ops.energy import energies_and_mags
    from peapods_tpu.ops.measure import overlap_dots

    m = glass(5, shape=shape, n_replicas=n_replicas, n_temps=3)
    r = m.sample(1, "metropolis", warmup_ratio=0)
    assert _prog(m).megapair
    rt = m.rt
    spins = m.state["spins"][0]
    sid = m.state["system_ids"][0]
    e_ref, msum = energies_and_mags(spins, rt.couplings[0], rt.geom)
    e_rt = np.asarray(e_ref)[np.asarray(sid)]
    m_rt = np.asarray(msum)[np.asarray(sid)].astype(np.float64) / rt.n_spins
    np.testing.assert_allclose(
        np.asarray(r["mags"]), m_rt.sum(0) / n_replicas, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(r["energies"]), e_rt.sum(0) / n_replicas, rtol=2e-5
    )
    ds, dl = overlap_dots(spins, sid, rt.geom)
    n_pairs = n_replicas // 2
    q = np.asarray(ds).astype(np.float64) / rt.n_spins
    ql = np.asarray(dl).astype(np.float64) / (
        rt.n_spins * rt.lattice.n_neighbors
    )
    np.testing.assert_allclose(
        np.asarray(r["overlap"]), q.sum(0) / n_pairs, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(r["link_overlap"]), ql.sum(0) / n_pairs, rtol=1e-5,
        atol=1e-7,
    )


def test_determinism_and_chunk_invariance():
    kw = dict(
        pt_interval=1,
        overlap_cluster_update_interval=5,
        overlap_cluster_build_mode="houdayer",
        warmup_ratio=0,
    )
    a = glass(13, chunk=20)
    ra = a.sample(20, "metropolis", **kw)
    b = glass(13, chunk=10)
    rb1 = b.sample(10, "metropolis", **kw)
    rb2 = b.sample(10, "metropolis", **kw)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]), np.asarray(b.state["system_ids"])
    )
    np.testing.assert_allclose(
        ra["mags2"], (rb1["mags2"] + rb2["mags2"]) / 2, rtol=1e-6
    )
    np.testing.assert_allclose(
        ra["overlap2"], (rb1["overlap2"] + rb2["overlap2"]) / 2, rtol=1e-6
    )


@pytest.mark.parametrize("sched", ["single_random_edge", "full_ladder"])
def test_observe_invariance_through_pt_mirror(sched):
    """Overlap-observe run bitwise equals an overlap-free run: the event
    sweeps' PT runs in jnp (pt_event_jnp) with the kernel's exact draws, and
    the non-event sweeps re-enter the kernel — spins, system_ids, and every
    PT diagnostic must agree bitwise across the different call partitions."""
    plain = glass(91)
    plain.sample(12, "metropolis", pt_interval=1, pt_schedule=sched,
                 warmup_ratio=0)
    keys = ("spins", "system_ids", "pt_edge_attempts",
            "pt_edge_acceptances", "pt_round_trips", "pt_trip_state")
    exp = {k: np.asarray(plain.state[k]) for k in keys}
    obs = glass(91)
    obs.sample(
        12,
        "metropolis",
        pt_interval=1,
        pt_schedule=sched,
        overlap_cluster_update_interval=3,
        overlap_cluster_build_mode="houdayer",
        overlap_cluster_mode="sw",
        overlap_cluster_action="observe",
        warmup_ratio=0,
    )
    assert _prog(obs).megapair
    for k in keys:
        np.testing.assert_array_equal(np.asarray(obs.state[k]), exp[k], k)


@pytest.mark.parametrize("case", range(6))
def test_observe_invariance_pt_mirror_property(case):
    """Randomized hardening of the PT-mirror contract: pt_event_jnp must
    reproduce the kernel's murmur-mixed PT draws for ANY configuration, so
    a future kernel PT change that isn't hand-mirrored fails here rather
    than silently skewing observe-mode runs.  Each case draws a random
    temperature ladder, schedule, replica count, lattice (kp 1 and 2
    layouts), overlap build mode, and event cadence, then requires the
    observe run to match the overlap-free run bitwise on spins,
    system_ids, and every PT diagnostic."""
    from peapods_tpu.engine.simulation import IsingSimulation

    rng = np.random.default_rng(4200 + case)
    shape = [(8, 128), (8, 8, 8)][case % 2]
    n_replicas = int(rng.choice([2, 4]))
    n_temps = int(rng.integers(2, 5))
    t_lo = float(rng.uniform(0.6, 1.2))
    temps = (t_lo * np.cumprod(
        1.0 + rng.uniform(0.05, 0.6, size=n_temps)
    )).astype(np.float32)
    sched = str(rng.choice(["single_random_edge", "full_ladder"]))
    build = str(rng.choice(["houdayer", "jorg", "cmr", "jorg+cmr"]))
    interval = int(rng.choice([2, 3]))
    seed = int(rng.integers(0, 2**31))
    coup = rng.choice(
        np.float32([-1, 1]), size=tuple(shape) + (len(shape),)
    )

    def run(observe):
        sim = IsingSimulation(list(shape), coup, temps, n_replicas, None,
                              seed, default_chunk=16, mesh=None)
        kw = dict(pt_interval=1, pt_schedule=sched, warmup_ratio=0)
        if observe:
            kw.update(
                overlap_cluster_update_interval=interval,
                overlap_cluster_build_mode=build,
                overlap_cluster_mode="sw",
                overlap_cluster_action="observe",
            )
        sim.sample(8, "metropolis", **kw)
        return sim

    plain = run(False)
    assert _prog(plain).megapair, _prog(plain).describe_plan()
    obs = run(True)
    assert _prog(obs).megapair
    for k in ("spins", "system_ids", "pt_edge_attempts",
              "pt_edge_acceptances", "pt_round_trips", "pt_trip_state"):
        np.testing.assert_array_equal(
            np.asarray(obs.state[k]), np.asarray(plain.state[k]),
            err_msg=f"case {case} ({shape}, R={n_replicas}, T={n_temps}, "
                    f"{sched}, {build}, interval={interval}): {k}",
        )


def test_pt_bookkeeping():
    m = glass(7, n_temps=4)
    n_sweeps = 20
    r = m.sample(n_sweeps, "metropolis", pt_interval=1, warmup_ratio=0)
    pt = r["per_disorder"]["parallel_tempering"]
    # single random edge: one attempt per replica per sweep over 3 edges
    assert pt["edge_attempts"].sum() == n_sweeps * 4
    assert (pt["edge_acceptances"] <= pt["edge_attempts"]).all()
    sid = np.asarray(m.state["system_ids"]).reshape(-1)
    assert sorted(sid.tolist()) == list(range(16))
    r2 = m.sample(n_sweeps, "metropolis", pt_interval=1, warmup_ratio=0)
    pt2 = r2["per_disorder"]["parallel_tempering"]
    assert pt2["edge_attempts"].sum() == 2 * n_sweeps * 4


def test_full_ladder_attempts():
    m = glass(8, n_temps=5)
    n_sweeps = 8
    r = m.sample(
        n_sweeps, "metropolis", pt_interval=1, pt_schedule="full_ladder",
        warmup_ratio=0,
    )
    pt = r["per_disorder"]["parallel_tempering"]
    np.testing.assert_array_equal(
        pt["edge_attempts"][0], np.full(4, n_sweeps * 4, np.uint64)
    )


def test_schema_matches_scan_path(monkeypatch):
    kw = dict(
        pt_interval=1,
        pt_schedule="full_ladder",
        overlap_cluster_update_interval=5,
        overlap_cluster_build_mode="jorg+cmr",
        collect_cluster_stats=True,
        warmup_ratio=0.25,
        equilibration_diagnostic=True,
        autocorrelation_max_lag=4,
    )
    mp = glass(9, n_disorder=2).sample(20, "metropolis", **kw)

    monkeypatch.setenv("PEAPODS_DISABLE_MEGAPAIR", "1")
    scan = glass(9, n_disorder=2).sample(20, "metropolis", **kw)
    assert set(mp.keys()) == set(scan.keys())

    def check(a, b, path):
        if isinstance(b, dict):
            assert set(a.keys()) == set(b.keys()), path
            for k in b:
                check(a[k], b[k], path + (k,))
        elif isinstance(b, list):
            assert len(a) == len(b), path
            for i, (x, y) in enumerate(zip(a, b)):
                check(x, y, path + (i,))
        else:
            x, y = np.asarray(a), np.asarray(b)
            assert x.shape == y.shape and x.dtype == y.dtype, path

    check(mp, scan, ())


def test_equilibration_sees_warmup_sweeps():
    """The equilibration diagnostic consumes every sweep including warmup
    (reference mod.rs:511,531) — the warmup gate must not zero the emitted
    series.  Warmup only gates recording, never the trajectory, so the
    equilibration arrays of warmup=0 and warmup=0.5 runs are identical."""
    r0 = glass(23).sample(
        16, "metropolis", pt_interval=1, equilibration_diagnostic=True,
        warmup_ratio=0,
    )
    r5 = glass(23).sample(
        16, "metropolis", pt_interval=1, equilibration_diagnostic=True,
        warmup_ratio=0.5,
    )
    np.testing.assert_array_equal(r0["equil_sweeps"], r5["equil_sweeps"])
    np.testing.assert_array_equal(
        r0["equil_energy_avg"], r5["equil_energy_avg"]
    )
    np.testing.assert_array_equal(
        r0["equil_link_overlap_avg"], r5["equil_link_overlap_avg"]
    )


def test_update_mode_runs_and_counts_events():
    """Jorg+CMR round-robin with updates completes on the megapair path
    (call A -> jnp move -> mirrored PT -> call B) and collects overlap CSD
    statistics for both modes."""
    m = glass(17, n_temps=3)
    r = m.sample(
        30,
        "metropolis",
        pt_interval=1,
        overlap_cluster_update_interval=5,
        overlap_cluster_build_mode="jorg+cmr",
        collect_cluster_stats=True,
        warmup_ratio=0,
    )
    assert _prog(m).megapair
    csd = np.asarray(r["overlap_csd"])
    assert csd.shape[0] == 2  # two modes, round-robin
    assert (csd.sum(axis=tuple(range(1, csd.ndim))) > 0).all()


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_megapair_under_disorder_mesh_matches_unsharded():
    from peapods_tpu.parallel.mesh import make_mesh

    kw = dict(
        pt_interval=1,
        overlap_cluster_update_interval=4,
        overlap_cluster_build_mode="houdayer",
        warmup_ratio=0,
    )
    sharded = glass(21, n_disorder=8, mesh=make_mesh(8), chunk=8)
    r_sh = sharded.sample(8, "metropolis", **kw)
    assert _prog(sharded).megapair
    plain = glass(21, n_disorder=8, mesh=None, chunk=8)
    r_pl = plain.sample(8, "metropolis", **kw)
    np.testing.assert_array_equal(
        np.asarray(sharded.state["spins"]), np.asarray(plain.state["spins"])
    )
    np.testing.assert_array_equal(r_sh["mags2"], r_pl["mags2"])
    np.testing.assert_array_equal(r_sh["overlap2"], r_pl["overlap2"])
    np.testing.assert_array_equal(
        r_sh["per_disorder"]["parallel_tempering"]["edge_attempts"],
        r_pl["per_disorder"]["parallel_tempering"]["edge_attempts"],
    )


@pytest.mark.parametrize(
    "shape,n_replicas,pt_full",
    [((8, 64), 2, True), ((8, 128), 2, False)],
)
def test_temp_group_trajectory_invariance(shape, n_replicas, pt_full):
    """tg=2 (two temperature slabs flattened per sweep tile) must be bitwise
    identical to tg=1: under the interpreter the sweep uniforms are zeros
    (every active-color site flips deterministically) and the PT draws are
    in-kernel arithmetic, so any difference is a flattened-geometry bug
    (seam rolls, partner mapping, per-slot reduction windows, inv-T rows).
    Covers both partner layouts: kp=2 lane groups and kp=1 row blocks.
    ``e`` is compared with tolerance: the per-slot f32 energy reduction
    reassociates with the tile shape (last-ulp), while the int-exact
    m/q/q_l sums and the spin trajectory must match bitwise."""
    import jax
    import jax.numpy as jnp
    from peapods_tpu.ops import pallas_megapair as mp
    from peapods_tpu.ops.lattice import Lattice

    rng = np.random.default_rng(3)
    n_temps, n_inner, n_d = 4, 4, 2
    l0, block = shape[0], int(np.prod(shape[1:]))
    kp, rp = mp.supports_megapair(Lattice(list(shape)), n_replicas, n_temps)
    rows, lanes = rp * l0, kp * block
    n_spins = l0 * block
    n_slots = n_replicas * n_temps
    n_edges = n_temps - 1
    coup = rng.normal(size=(n_d, n_spins, len(shape))).astype(np.float32)
    jg = jnp.stack([
        mp.pack_coupling_grids_mp(jnp.asarray(coup[d]), shape, kp, rp)
        for d in range(n_d)
    ])
    args = (
        jnp.asarray(rng.choice(
            np.array([-1, 1], np.int8), size=(n_d, n_temps, rows, lanes)
        )),
        jg,
        jnp.asarray(np.geomspace(0.9, 2.2, n_temps, dtype=np.float32)
                    ).reshape(1, n_temps),
        jnp.asarray(rng.integers(0, 2**31 - 1, size=(n_d, 2 * n_inner),
                                 dtype=np.int32)),
        jnp.asarray(rng.integers(0, 2**31 - 1, size=(n_d, 2 * n_inner),
                                 dtype=np.int32)),
        jnp.tile(jnp.array([[0, 3]], jnp.int32), (n_d, 1)),  # 1 padded sweep
        jnp.tile(jnp.arange(n_slots, dtype=jnp.int32)[None], (n_d, 1)),
        jnp.zeros((n_d, n_edges), jnp.int32),
        jnp.zeros((n_d, n_edges), jnp.int32),
        jnp.zeros((n_d, n_slots), jnp.int32),
        jnp.zeros((n_d, n_slots), jnp.int32),
        jnp.zeros((n_d, 1), jnp.int32),
    )
    kw = dict(
        shape=tuple(shape), gibbs=False, n_inner=n_inner, n_temps=n_temps,
        n_replicas=n_replicas, kp=kp, rp=rp, pt_interval=1, pt_full=pt_full,
        hot_slot=n_temps - 1, cold_slot=0, interpret=True,
    )
    out1 = jax.block_until_ready(mp.megapair_chunk(*args, **kw, tg=1))
    out2 = jax.block_until_ready(mp.megapair_chunk(*args, **kw, tg=2))
    names = ("spins", "e", "m", "qs", "ql", "sid", "ea", "ec", "rtrips",
             "tstate", "parity")
    for nm, a, b in zip(names, out1, out2):
        if nm == "e":
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=nm,
            )
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), nm)


def test_eligibility_not_shrunk_by_temp_grouping():
    """Temperature grouping must never price a config out of the megapair
    path: eligibility is judged at the base tg=1 footprint, and _temp_group
    caps tg against the VMEM budget (a 32^3 24T 2R config was eligible
    before grouping existed and must stay so)."""
    from peapods_tpu.ops.pallas_megapair import (
        _VMEM_BUDGET, _temp_group, supports_megapair,
    )
    from peapods_tpu.ops.lattice import Lattice

    assert supports_megapair(Lattice([32, 32, 32]), 2, 24) is not None
    # and the tg it would pick keeps the tiled grids inside the budget
    rows, lanes = 2 * 32, 32 * 32
    tg = _temp_group(24, rows, lanes, 6)
    assert 24 * rows * lanes * 2 + 6 * tg * rows * lanes * 4 <= _VMEM_BUDGET
