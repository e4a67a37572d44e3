"""Native C++ helpers agree with the python fallbacks."""

import os

import numpy as np
import pytest

from peapods_tpu.utils import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@requires_native
def test_neighbor_tables_match_python():
    os.environ.pop("PEAPODS_NO_NATIVE", None)
    from peapods_tpu.ops.lattice import Lattice

    for shape, offsets in [
        ([5, 7], None),
        ([4, 4], [[1, 0], [0, 1], [1, -1]]),
        ([3, 4, 5], None),
        ([4, 4, 4], [[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1]]),
    ]:
        lat = Lattice(shape, offsets)  # native path
        os.environ["PEAPODS_NO_NATIVE"] = "1"
        native._LIB = None
        try:
            ref = Lattice(shape, offsets)  # python path
        finally:
            os.environ.pop("PEAPODS_NO_NATIVE")
            native._LIB = None
        np.testing.assert_array_equal(lat.fwd, ref.fwd)
        np.testing.assert_array_equal(lat.bwd, ref.bwd)
        np.testing.assert_array_equal(lat.colors, ref.colors)
        assert lat.n_colors == ref.n_colors


@requires_native
def test_union_find_labels_match_device_convention():
    from peapods_tpu.ops.lattice import Lattice
    from peapods_tpu.ops.geometry import GridOps
    from peapods_tpu.ops import cluster as cl
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    lat = Lattice([8, 8])
    active = rng.random((lat.n_spins, 2)) < 0.45
    host = native.union_find_labels(active, lat.fwd)
    dev = np.asarray(
        cl.connected_components(jnp.asarray(active), GridOps.from_lattice(lat))
    )
    np.testing.assert_array_equal(host, dev)
