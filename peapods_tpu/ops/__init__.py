from . import cluster, energy, lattice, measure, overlap, sweep, tempering  # noqa: F401
