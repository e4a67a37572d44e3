"""Energy kernel equivalences (reference: spins/energy.rs:112-148)."""

import jax.numpy as jnp
import numpy as np

from peapods_tpu.ops.energy import bond_interactions, energies, energies_and_mags
from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import Lattice


def test_energy_paths_agree_and_match_brute_force():
    lat = Lattice([2, 3])
    geom = GridOps.from_lattice(lat)
    coup = jnp.ones((lat.n_spins, 2), jnp.float32)
    spins = jnp.asarray(
        [[1, 1, 1, 1, 1, 1], [1, -1, 1, -1, 1, -1]], jnp.int8
    )

    e = np.asarray(energies(spins, coup, geom))
    e2, msum = energies_and_mags(spins, coup, geom)
    np.testing.assert_array_equal(e, np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(msum), [6, 0])

    inter = np.asarray(bond_interactions(spins.astype(jnp.float32), coup, geom))
    np.testing.assert_allclose(inter.sum((-1, -2)) / lat.n_spins, e)

    # brute force over the neighbor table
    for r in range(2):
        total = 0.0
        s = np.asarray(spins[r])
        for i in range(lat.n_spins):
            for d in range(2):
                total += s[i] * s[lat.fwd[i, d]]
        np.testing.assert_allclose(e[r], total / lat.n_spins, rtol=1e-6)
