"""Lattice geometry tests (reference: geometry/lattice.rs:111-196 test module)."""

import numpy as np

from peapods_tpu.ops.lattice import GEOMETRY_OFFSETS, Lattice


def assert_proper_coloring(lat):
    nb = np.concatenate([lat.fwd, lat.bwd], axis=1)
    for i in range(lat.n_spins):
        for j in nb[i]:
            if int(j) != i:
                assert lat.colors[i] != lat.colors[int(j)], (i, int(j))


def test_2d_neighbors_and_strides():
    lat = Lattice([3, 4])
    assert lat.n_spins == 12
    assert list(lat.strides) == [4, 1]
    assert lat.fwd[0, 0] == 4 and lat.bwd[0, 0] == 8  # wrap along dim 0
    assert lat.fwd[0, 1] == 1 and lat.bwd[0, 1] == 3  # wrap along dim 1
    assert lat.fwd[11, 1] == 8  # last site wraps right


def test_3d_neighbors():
    lat = Lattice([2, 3, 4])
    assert lat.n_spins == 24
    assert list(lat.strides) == [12, 4, 1]
    # site 0 forward in each dim
    assert lat.fwd[0, 0] == 12 and lat.fwd[0, 1] == 4 and lat.fwd[0, 2] == 1


def test_triangular_offsets():
    lat = Lattice([4, 4], GEOMETRY_OFFSETS["triangular"])
    assert lat.n_neighbors == 3
    # [1, -1] offset from site (0,0) -> (1,3) = 4+3
    assert lat.fwd[0, 2] == 7
    assert_proper_coloring(lat)


def test_canonical_square_shape_is_construction_time():
    assert Lattice([5, 7]).canonical_square_shape == (5, 7)
    assert Lattice([4, 4], [[1, 0], [0, 1]]).canonical_square_shape is None
    assert Lattice([4, 4, 4]).canonical_square_shape is None


def test_coloring_even_and_odd():
    assert Lattice([4, 4]).n_colors == 2
    assert_proper_coloring(Lattice([4, 4]))
    # odd extents create odd cycles -> need >2 colors, still proper
    lat = Lattice([3, 5])
    assert lat.n_colors >= 3
    assert_proper_coloring(lat)
    assert_proper_coloring(Lattice([2, 2]))
    assert_proper_coloring(Lattice([4, 4, 4], GEOMETRY_OFFSETS["fcc"]))


def test_bcc_fcc_neighbor_counts():
    assert Lattice([4, 4, 4], GEOMETRY_OFFSETS["bcc"]).n_neighbors == 4
    assert Lattice([4, 4, 4], GEOMETRY_OFFSETS["fcc"]).n_neighbors == 6
