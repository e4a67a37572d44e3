"""In-kernel megapair overlap events (ops/pallas_megapair.py ``ev_*``).

The whole per-interval block — event sweep, pair overlap move, PT, remaining
sweeps — runs in ONE ``pallas_call`` when ``prog.mp_event`` gates on
(reference sweep order ``simulation/mod.rs:405-796``; per-task moves
``clusters/overlap.rs:64-144``).  Oracle: the interleaved megapair path
(``PEAPODS_MP_EVENT=0`` — kernel call A / fused-event kernel / jnp PT mirror
/ call B), which carries the staged-path physics record.  On the CPU
interpreter both paths draw identical per-bond uniforms (the stubbed
hardware PRNG), so trajectories must match BITWISE for every mode:
houdayer's bonds are deterministic (bitwise on hardware too), jorg/cmr
differ on-chip only in the hardware PRNG stream (statistical equivalence,
like the sweep kernels).  The pairing permutation, per-task scalars, and
Wolff ``find_seed`` probe indices are drawn outside the kernel from the
exact staged-path key splits (``mp_event_scalars``), so per-task draws are
bitwise everywhere.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")


def _run(monkeypatch, mp_event, shape, n_replicas, n_temps, modes, cmode,
         pt_full, n_disorder=1, sweeps=4, interval=2, seed=11):
    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", mp_event)
    rng = np.random.default_rng(7)
    coup = rng.choice(
        np.float32([-1, 1]), size=(n_disorder,) + shape + (len(shape),)
    )
    if n_disorder == 1:
        coup = coup[0]
    temps = np.geomspace(0.9, 2.2, n_temps).astype(np.float32)
    sim = IsingSimulation(list(shape), coup, temps, n_replicas, None, seed,
                          default_chunk=sweeps)
    res = sim.sample(
        sweeps, "metropolis", warmup_ratio=0.0, pt_interval=1,
        pt_schedule="full_ladder" if pt_full else "single_random_edge",
        overlap_cluster_update_interval=interval,
        overlap_cluster_build_mode=modes,
        overlap_cluster_mode=cmode,
    )
    prog = next(iter(sim._programs.values()))
    return np.asarray(sim.get_spins()), res, prog


@pytest.mark.parametrize(
    "shape,n_replicas,modes,cmode,pt_full",
    [
        # kp=1: pairs are adjacent row blocks
        ((8, 128), 2, "houdayer", "wolff", False),
        ((8, 128), 2, "houdayer", "sw", False),
        ((8, 128), 2, "jorg", "wolff", False),
        ((8, 128), 2, "cmr", "sw", True),
        # kp=2: pairs are adjacent lane groups; mode round-robin; find_seed
        ((8, 8, 8), 4, "jorg+cmr", "wolff", True),
    ],
)
def test_fused_event_matches_interleaved_path(
    monkeypatch, shape, n_replicas, modes, cmode, pt_full
):
    s1, r1, p1 = _run(monkeypatch, "1", shape, n_replicas, 2, modes, cmode,
                      pt_full)
    assert p1.mp_event
    assert "+event" in p1.describe_plan()
    s0, r0, p0 = _run(monkeypatch, "0", shape, n_replicas, 2, modes, cmode,
                      pt_full)
    assert not p0.mp_event
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(r1["energies"], r0["energies"])
    np.testing.assert_array_equal(r1["overlap2"], r0["overlap2"])
    np.testing.assert_array_equal(
        r1["per_disorder"]["parallel_tempering"]["edge_attempts"],
        r0["per_disorder"]["parallel_tempering"]["edge_attempts"],
    )
    np.testing.assert_array_equal(
        r1["per_disorder"]["parallel_tempering"]["edge_acceptances"],
        r0["per_disorder"]["parallel_tempering"]["edge_acceptances"],
    )


def test_fused_event_under_disorder_mesh(monkeypatch):
    """jorg+cmr event operands (scalars, probes, rank tiles, words) shard
    over the disorder mesh; sharded == unsharded bitwise."""
    from peapods_tpu.parallel.mesh import make_mesh
    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", "1")
    shape, n_d = (8, 128), 2
    rng = np.random.default_rng(9)
    coup = rng.choice(np.float32([-1, 1]), size=(n_d,) + shape + (2,))
    temps = np.geomspace(0.9, 2.2, 2).astype(np.float32)
    kw = dict(
        warmup_ratio=0.0, pt_interval=1,
        overlap_cluster_update_interval=2,
        overlap_cluster_build_mode="jorg+cmr",
        overlap_cluster_mode="wolff",
    )
    runs = []
    for mesh in (make_mesh(2), None):
        sim = IsingSimulation([8, 128], coup, temps, 2, None, 5,
                              default_chunk=4, mesh=mesh)
        sim.sample(4, "metropolis", **kw)
        assert next(iter(sim._programs.values())).mp_event
        runs.append(np.asarray(sim.state["spins"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_gate_excludes_stats_and_observe(monkeypatch):
    """Label-consuming configs stay on the interleaved path (the fused
    event returns no labels), exactly like the task-kernel gate."""
    s, r, prog = _run(monkeypatch, "1", (8, 128), 2, 2, "houdayer", "wolff",
                      False)
    assert prog.mp_event

    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", "1")
    rng = np.random.default_rng(7)
    coup = rng.choice(np.float32([-1, 1]), size=(8, 128, 2))
    sim = IsingSimulation([8, 128], coup, np.float32([1.5, 2.0]), 2, None, 3,
                          default_chunk=2)
    sim.sample(
        2, "metropolis", warmup_ratio=0.0,
        overlap_cluster_update_interval=1,
        overlap_cluster_build_mode="houdayer",
        collect_cluster_stats=True,
    )
    assert not next(iter(sim._programs.values())).mp_event
