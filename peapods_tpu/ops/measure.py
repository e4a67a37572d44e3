"""On-device measurement kernels: magnetization/energy records and overlaps.

Counterpart of the reference's per-sweep recording
(``/root/reference/spin-sim/src/simulation/mod.rs:543-595``) and the
``OverlapAccum.collect`` dot products
(``statistics/overlap.rs:251-333``): per replica pair (2p, 2p+1) and
temperature, the spin overlap ``sum_i s^a_i s^b_i`` and the link overlap
``sum_{i,d} (s^a s^b)_i (s^a s^b)_{fwd(i,d)}`` over forward bonds.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["slot_temps_for_systems", "per_slot_values", "overlap_dots"]


def slot_temps_for_systems(system_ids, temps):
    """``f32 [n_systems]``: temperature currently assigned to each system.

    ``system_ids [n_replicas, n_temps]`` maps slots to systems; each replica's
    ladder carries the same ``temps`` (realization.rs:166).
    """
    n_replicas, n_temps = system_ids.shape
    tiled = jnp.tile(temps, n_replicas)
    return jnp.zeros(n_replicas * n_temps, temps.dtype).at[
        system_ids.reshape(-1)
    ].set(tiled)


def per_slot_values(values_by_system, system_ids):
    """Gather per-system values into ``[n_replicas, n_temps]`` slot layout."""
    return values_by_system[system_ids]


def overlap_dots(spins, system_ids, geom):
    """Spin and link overlap dot products for all (pair, temp) combinations.

    Args:
        spins: ``int8 [n_systems, n_spins]``.
        system_ids: ``int32 [n_replicas, n_temps]``.
        geom: :class:`~peapods_tpu.ops.geometry.GridOps`.

    Returns:
        ``(dot_spin, dot_link)``, each ``int32 [n_pairs, n_temps]``.
    """
    a = spins[system_ids[0::2]]  # [n_pairs, n_temps, n_spins]
    b = spins[system_ids[1::2]]
    q_site = (a * b).astype(jnp.int32)
    dot_spin = q_site.sum(-1)
    nbr_sum = geom.neighbor_sum_fwd(q_site)
    dot_link = (q_site * nbr_sum).sum(-1)
    return dot_spin, dot_link
