"""GridOps roll-based addressing must agree with the neighbor index tables."""

import jax.numpy as jnp
import numpy as np
import pytest

from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice

CASES = [
    ([6], None),
    ([5, 7], None),
    ([4, 4], GEOMETRY_OFFSETS["triangular"]),
    ([3, 4, 5], None),
    ([4, 4, 4], GEOMETRY_OFFSETS["bcc"]),
    ([4, 4, 4], GEOMETRY_OFFSETS["fcc"]),
    ([2, 3], None),  # extent-2 axis: fwd == bwd neighbor
]


@pytest.mark.parametrize("shape,offsets", CASES)
def test_shifts_match_tables(shape, offsets):
    lat = Lattice(shape, offsets)
    geom = GridOps.from_lattice(lat)
    x = jnp.arange(lat.n_spins, dtype=jnp.int32)
    for d in range(lat.n_neighbors):
        np.testing.assert_array_equal(
            np.asarray(geom.shift_fwd(x, d)), x[np.asarray(lat.fwd[:, d])]
        )
        np.testing.assert_array_equal(
            np.asarray(geom.shift_bwd(x, d)), x[np.asarray(lat.bwd[:, d])]
        )


def test_shifts_preserve_batch_axes():
    lat = Lattice([4, 4])
    geom = GridOps.from_lattice(lat)
    x = jnp.arange(3 * 2 * 16, dtype=jnp.int32).reshape(3, 2, 16)
    out = geom.shift_fwd(x, 0)
    assert out.shape == x.shape
    for i in range(3):
        for j in range(2):
            np.testing.assert_array_equal(
                np.asarray(out[i, j]), np.asarray(x[i, j])[np.asarray(lat.fwd[:, 0])]
            )


def test_neighbor_sum_fwd():
    lat = Lattice([4, 4])
    geom = GridOps.from_lattice(lat)
    x = jnp.arange(16, dtype=jnp.int32)
    expect = sum(np.asarray(x)[np.asarray(lat.fwd[:, d])] for d in range(2))
    np.testing.assert_array_equal(np.asarray(geom.neighbor_sum_fwd(x)), expect)
