"""Checkpoint/resume: durable state round-trips exactly."""

import numpy as np

from peapods_tpu import Ising


def test_checkpoint_roundtrip_continues_identically(tmp_path):
    kw = dict(
        lattice_shape=(4, 4),
        couplings="bimodal",
        temperatures=np.array([1.0, 2.0], dtype=np.float32),
        n_replicas=2,
        seed=19,
    )
    a = Ising(**kw)
    a.sample(6, pt_interval=1, warmup_ratio=0)
    path = tmp_path / "state.npz"
    a.save_checkpoint(path)
    a.sample(6, pt_interval=1, warmup_ratio=0)
    final = a._sim.get_spins().copy()
    final_pt = a._sim.state["pt_edge_attempts"]

    b = Ising(**kw)
    b.load_checkpoint(path)
    b.sample(6, pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(b._sim.get_spins(), final)
    np.testing.assert_array_equal(
        np.asarray(b._sim.state["pt_edge_attempts"]), np.asarray(final_pt)
    )


def test_checkpoint_seed_mismatch_rejected(tmp_path):
    import pytest

    a = Ising((4, 4), temperatures=np.array([1.0]), seed=1)
    path = tmp_path / "s.npz"
    a.save_checkpoint(path)
    b = Ising((4, 4), temperatures=np.array([1.0]), seed=2)
    with pytest.raises(ValueError, match="constructor seed"):
        b.load_checkpoint(path)
