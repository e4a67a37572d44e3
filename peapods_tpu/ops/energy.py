"""Per-system energy and magnetization reductions (roll-based).

Counterpart of ``/root/reference/spin-sim/src/spins/energy.rs:14-110``.
The reference's (deliberate) sign convention is kept: the reported "energy"
is the **positive** sum of forward-bond interactions per spin,
``e = +sum_{i,d} J[i,d] s_i s_{fwd(i,d)} / n_spins`` (energy.rs:92-109; noted
in the reference Python docstring spin_models.py:343-349).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["energies", "energies_and_mags", "bond_interactions"]


def bond_interactions(spins_f, coup_fwd, geom):
    """``f32 [..., n_spins, n_neighbors]``: ``J[i,d] s_i s_fwd``."""
    return jnp.stack(
        [
            spins_f * geom.shift_fwd(spins_f, d) * coup_fwd[:, d]
            for d in range(geom.n_neighbors)
        ],
        axis=-1,
    )


def energies(spins, coup_fwd, geom):
    """Mean energy per spin, per system: ``f32 [n_systems]``."""
    s = spins.astype(jnp.float32)
    tot = jnp.zeros(spins.shape[:-1], jnp.float32)
    for d in range(geom.n_neighbors):
        tot += (s * geom.shift_fwd(s, d) * coup_fwd[:, d]).sum(-1)
    return tot / geom.n_spins


def energies_and_mags(spins, coup_fwd, geom):
    """(energy per spin ``f32 [n_systems]``, magnetization sum ``int32``)."""
    e = energies(spins, coup_fwd, geom)
    m = spins.astype(jnp.int32).sum(-1)
    return e, m
