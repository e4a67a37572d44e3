"""Pallas connected-components kernel: bitwise equivalence with the jnp path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from peapods_tpu.ops import cluster as cl
from peapods_tpu.ops import pallas_cc
from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import Lattice


@pytest.mark.parametrize("density", [0.2, 0.5, 0.8])
def test_cc_kernel_matches_jnp(density):
    H, W = 8, 128
    lat = Lattice([H, W])
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(int(density * 10))
    active = jnp.asarray(rng.random((lat.n_spins, 2)) < density)
    ref = cl.connected_components(active, geom)
    got = pallas_cc.connected_components_2d(
        active, shape=(H, W), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_cc_kernel_under_vmap():
    H, W = 8, 128
    lat = Lattice([H, W])
    geom = GridOps.from_lattice(lat)
    rng = np.random.default_rng(3)
    active = jnp.asarray(rng.random((4, lat.n_spins, 2)) < 0.55)
    ref = jax.vmap(lambda a: cl.connected_components(a, geom))(active)
    got = jax.vmap(
        lambda a: pallas_cc.connected_components_2d(
            a, shape=(H, W), interpret=True
        )
    )(active)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_supports_gate():
    assert pallas_cc.supports_cc(Lattice([8, 128]))
    assert pallas_cc.supports_cc(Lattice([256, 256]))
    assert not pallas_cc.supports_cc(Lattice([8, 64]))
    assert not pallas_cc.supports_cc(Lattice([6, 128]))
    assert not pallas_cc.supports_cc(Lattice([8, 8, 8]))
    assert not pallas_cc.supports_cc(
        Lattice([8, 128], [[1, 0], [0, 1], [1, -1]])
    )
