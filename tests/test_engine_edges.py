"""Engine edge cases."""

import numpy as np
import pytest

from peapods_tpu import Ising


def test_single_temperature_pt_is_noop():
    model = Ising((4, 4), temperatures=np.array([2.0]), seed=1)
    r = model.sample(4, pt_interval=1, warmup_ratio=0)
    assert r["per_disorder"]["parallel_tempering"]["edge_attempts"].shape == (1, 0)


def test_all_warmup_returns_nan_means():
    model = Ising((4, 4), temperatures=np.array([2.0]), seed=1)
    r = model.sample(4, warmup_ratio=1.0)
    assert np.isnan(r["mags2"]).all()


def test_list_temperatures_accepted():
    model = Ising((4, 4), temperatures=np.array([1.0, 2.0]), seed=1)
    model.sample(2, warmup_ratio=0)


def test_1d_and_3d_lattices():
    Ising((8,), temperatures=np.array([1.0]), seed=1).sample(2, warmup_ratio=0)
    Ising((3, 3, 3), temperatures=np.array([3.0]), seed=1).sample(
        2, cluster_update_interval=1, warmup_ratio=0
    )


def test_odd_extent_lattice_uses_more_colors():
    m = Ising((5, 5), temperatures=np.array([2.0]), seed=2)
    assert m._sim.lattice.n_colors >= 3
    m.sample(2, warmup_ratio=0)


def test_explicit_coupling_array_with_disorder_axis():
    rng = np.random.default_rng(0)
    coup = rng.standard_normal((3, 4, 4, 2)).astype(np.float32)
    m = Ising((4, 4), couplings=coup, temperatures=np.array([1.5]), seed=1,
              n_disorder=3)
    m.sample(2, warmup_ratio=0)


def test_bad_coupling_shape_rejected():
    with pytest.raises(ValueError, match="does not match"):
        Ising((4, 4), couplings=np.ones((4, 4, 3), np.float32),
              temperatures=np.array([1.0]))


def test_interrupt_between_chunks_leaves_object_usable():
    # Reference contract (src/lib.rs:304-333): Ctrl-C surfaces
    # KeyboardInterrupt and the simulation object stays consistent.  The
    # chunk runner donates self.state's buffers, so this pins that the
    # eager state re-point keeps get_spins/sample working after an
    # interrupt raised between chunks.
    from peapods_tpu.engine.simulation import IsingSimulation

    coup = np.ones((4, 4, 2), np.float32)
    sim = IsingSimulation((4, 4), coup, np.array([2.0, 3.0], np.float32),
                          n_replicas=2, seed=9, default_chunk=4)
    calls = []

    def boom(done, total):
        calls.append(done)
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        sim.sample(16, "metropolis", pt_interval=1, progress=boom)
    assert calls == [4]  # one chunk dispatched before the interrupt

    spins = sim.get_spins()  # donated-buffer hazard: this used to crash
    assert spins.shape == (64,)  # n_systems * n_spins
    r = sim.sample(8, "metropolis", pt_interval=1, progress=lambda *a: None)
    assert np.isfinite(r["mags2"]).all()
    assert int(sim.state["counter"]) == 12  # 4 interrupted + 8 completed


def test_sigint_during_dispatch_is_deferred():
    import signal

    from peapods_tpu.engine.simulation import _defer_sigint

    reached_end = []
    with pytest.raises(KeyboardInterrupt):
        with _defer_sigint():
            signal.raise_signal(signal.SIGINT)
            reached_end.append(True)  # body must finish before the raise
    assert reached_end == [True]
