"""Megakernel path (ops/pallas_mega.py): mechanics on the CPU interpreter.

The Mosaic interpreter stubs the hardware PRNG (spin dynamics degenerate to
deterministic parity flips), so these tests pin the *machinery*: eligibility
gating, determinism, chunk invariance, PT bookkeeping invariants, and
results-dict schema parity with the per-sweep scan path.  Statistical
equivalence with the jnp path runs on real TPU (benchmarks / physics
scripts).
"""

import numpy as np
import pytest

L = 8  # 8 x 128 lattice -> direct 2D kernel shape


def _sim(n_temps=4, seed=7, chunk=16):
    from peapods_tpu.engine.simulation import IsingSimulation

    coup = np.ones((L, 128, 2), np.float32)
    temps = np.geomspace(1.8, 3.2, n_temps).astype(np.float32)
    return IsingSimulation([L, 128], coup, temps, 1, None, seed,
                           default_chunk=chunk, mesh=None)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")


def _program(sim, **kw):
    before = set(sim._programs)
    sim.sample(1, "metropolis", warmup_ratio=0, **kw)
    new = [k for k in sim._programs if k not in before]
    return sim._programs[new[0]]


def test_eligibility_gating():
    sim = _sim()
    assert _program(sim, pt_interval=1).mega
    assert not _program(sim, cluster_update_interval=2).mega

    from peapods_tpu.engine.simulation import IsingSimulation

    coup2 = np.ones((2, L, 128, 2), np.float32)
    two_rep = IsingSimulation([L, 128], coup2[0:1].reshape(L, 128, 2),
                              np.array([2.0, 3.0], np.float32), 2, None, 1,
                              mesh=None)
    assert not _program(two_rep).mega  # pairs need per-sweep spins


def test_determinism_and_chunk_invariance():
    a = _sim(seed=3, chunk=32)
    ra = a.sample(32, "metropolis", pt_interval=1, warmup_ratio=0)
    b = _sim(seed=3, chunk=8)
    rb1 = b.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    rb2 = b.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]), np.asarray(b.state["system_ids"])
    )
    # recorded means over the same trajectory agree: 32-sweep mean equals
    # the average of the two 16-sweep means
    np.testing.assert_allclose(
        ra["mags2"], (rb1["mags2"] + rb2["mags2"]) / 2, rtol=1e-6
    )


def test_two_sub_mega_mechanics():
    """W % 256 == 0 lattices take the two-sublattice megakernel layout:
    same determinism/chunk-invariance contract, and the energy record must
    equal a direct recompute from the final spins (the layout's measurement
    path re-derives e from packed sublattices)."""
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.ops.energy import energies_and_mags
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops.lattice import Lattice

    import jax.numpy as jnp

    def sim(chunk):
        coup = np.ones((8, 256, 2), np.float32)
        temps = np.geomspace(1.8, 3.2, 3).astype(np.float32)
        return IsingSimulation([8, 256], coup, temps, 1, None, 13,
                               default_chunk=chunk, mesh=None)

    a = sim(32)
    a.sample(32, "metropolis", pt_interval=1, warmup_ratio=0)
    b = sim(8)
    b.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    b.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    assert next(iter(a._programs.values())).mega

    # measurement identity: a single recorded sweep's per-temp energies must
    # equal a direct recompute from the resulting spins (no PT, so slot ==
    # system and the means average exactly one sweep)
    c = sim(8)
    rc = c.sample(1, "metropolis", warmup_ratio=0)
    lat = Lattice([8, 256])
    geom = GridOps.from_lattice(lat)
    coup = jnp.ones((lat.n_spins, 2), jnp.float32)
    e_ref, _ = energies_and_mags(c.state["spins"][0], coup, geom)
    np.testing.assert_allclose(
        np.asarray(rc["energies"]), np.asarray(e_ref), rtol=1e-5
    )


def test_pt_bookkeeping_invariants():
    sim = _sim(n_temps=4, seed=5)
    n_sweeps = 40
    r = sim.sample(n_sweeps, "metropolis", pt_interval=1, warmup_ratio=0)
    pt = r["per_disorder"]["parallel_tempering"]
    # single random edge: one attempt per sweep, spread over 3 edges
    assert pt["edge_attempts"].sum() == n_sweeps
    assert (pt["edge_acceptances"] <= pt["edge_attempts"]).all()
    # system_ids stays a permutation
    sid = np.asarray(sim.state["system_ids"]).reshape(-1)
    assert sorted(sid.tolist()) == list(range(4))
    # counters accumulate across sample() calls (reference contract)
    r2 = sim.sample(n_sweeps, "metropolis", pt_interval=1, warmup_ratio=0)
    pt2 = r2["per_disorder"]["parallel_tempering"]
    assert pt2["edge_attempts"].sum() == 2 * n_sweeps


def test_full_ladder_attempts():
    sim = _sim(n_temps=5, seed=6)
    n_sweeps = 12
    r = sim.sample(n_sweeps, "metropolis", pt_interval=1,
                   pt_schedule="full_ladder", warmup_ratio=0)
    pt = r["per_disorder"]["parallel_tempering"]
    # every edge attempted once per event (both parity passes cover all)
    np.testing.assert_array_equal(
        pt["edge_attempts"][0], np.full(4, n_sweeps, np.uint64)
    )


def test_schema_matches_scan_path(monkeypatch):
    kw = dict(pt_interval=2, warmup_ratio=0.25,
              equilibration_diagnostic=True, autocorrelation_max_lag=4)
    mega = _sim(seed=9).sample(16, "metropolis", **kw)

    monkeypatch.setenv("PEAPODS_DISABLE_MEGA", "1")
    scan = _sim(seed=9).sample(16, "metropolis", **kw)
    assert set(mega.keys()) == set(scan.keys())
    for k in ("mags2", "energies", "mags2_tau", "equil_energy_avg"):
        assert np.asarray(mega[k]).shape == np.asarray(scan[k]).shape, k
    pt_m = mega["per_disorder"]["parallel_tempering"]
    pt_s = scan["per_disorder"]["parallel_tempering"]
    for k in pt_s:
        assert pt_m[k].shape == pt_s[k].shape and pt_m[k].dtype == pt_s[k].dtype


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_mega_under_disorder_mesh_matches_unsharded():
    """Megakernel over a disorder mesh (shard_map): bitwise vs unsharded."""
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    coup = np.ones((8, L, 128, 2), np.float32)
    temps = np.geomspace(2.0, 3.0, 4).astype(np.float32)
    sharded = IsingSimulation([L, 128], coup, temps, 1, None, 21,
                              mesh=make_mesh(8), default_chunk=16)
    r_sh = sharded.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    prog = next(iter(sharded._programs.values()))
    assert prog.mega
    plain = IsingSimulation([L, 128], coup, temps, 1, None, 21, mesh=None,
                            default_chunk=16)
    r_pl = plain.sample(16, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(sharded.state["spins"]), np.asarray(plain.state["spins"])
    )
    np.testing.assert_array_equal(r_sh["mags2"], r_pl["mags2"])
    np.testing.assert_array_equal(
        r_sh["per_disorder"]["parallel_tempering"]["edge_attempts"],
        r_pl["per_disorder"]["parallel_tempering"]["edge_attempts"],
    )


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices"
)
def test_two_sub_mega_under_disorder_mesh_matches_unsharded():
    """The two-sublattice mega layout (W % 256 == 0) under shard_map:
    bitwise vs unsharded (pack/unpack happens per shard inside mega_chunk)."""
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.parallel.mesh import make_mesh

    coup = np.ones((8, 8, 256, 2), np.float32)
    temps = np.geomspace(2.0, 3.0, 3).astype(np.float32)
    sharded = IsingSimulation([8, 256], coup, temps, 1, None, 31,
                              mesh=make_mesh(8), default_chunk=8)
    r_sh = sharded.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
    assert next(iter(sharded._programs.values())).mega
    plain = IsingSimulation([8, 256], coup, temps, 1, None, 31, mesh=None,
                            default_chunk=8)
    r_pl = plain.sample(8, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(sharded.state["spins"]), np.asarray(plain.state["spins"])
    )
    np.testing.assert_array_equal(r_sh["energies"], r_pl["energies"])
