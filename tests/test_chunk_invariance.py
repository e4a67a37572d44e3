"""Trajectories must be independent of host-side chunking decisions."""

import numpy as np

from peapods_tpu.engine.simulation import IsingSimulation


def make(chunk):
    coup = np.ones((4, 4, 2), np.float32)
    temps = np.array([1.0, 2.5], np.float32)
    return IsingSimulation([4, 4], coup, temps, 2, None, 11,
                           default_chunk=chunk, mesh=None)


def test_chunk_size_does_not_change_trajectory():
    runs = {}
    for chunk in (2, 4, 64):
        sim = make(chunk)
        r = sim.sample(
            13,  # odd length: exercises sentinel padding
            "metropolis",
            cluster_update_interval=2,
            cluster_mode="sw",
            pt_interval=3,
            warmup_ratio=0.25,
        )
        runs[chunk] = (sim.state["spins"], r["mags2"], r["energies"])
    base = runs[2]
    for chunk in (4, 64):
        np.testing.assert_array_equal(
            np.asarray(runs[chunk][0]), np.asarray(base[0])
        )
        np.testing.assert_allclose(runs[chunk][1], base[1], rtol=1e-6)
        np.testing.assert_allclose(runs[chunk][2], base[2], rtol=1e-6)


def test_split_calls_reach_same_state_as_one_call():
    """With warmup 0 and no interval phases, sample(4)+sample(4) walks the
    same counter-indexed RNG path as sample(8)."""
    a, b = make(64), make(64)
    a.sample(4, "metropolis", warmup_ratio=0)
    a.sample(4, "metropolis", warmup_ratio=0)
    b.sample(8, "metropolis", warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
