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
