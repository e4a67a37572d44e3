"""Parallel tempering: vectorized replica-exchange over the temperature ladder.

Counterpart of ``/root/reference/spin-sim/src/mcmc/tempering.rs:20-102`` and
the round-trip diagnostics of ``simulation/realization.rs:21-121``.

Swap rule on edge ``(t, t+1)`` of a replica's ladder (tempering.rs:73-102):

    delta = n_spins * (e_right - e_left) * (1/T_left - 1/T_right)
    accept iff delta >= ln(u)

A swap permutes ``system_ids`` (which system sits at which temperature slot);
spins are never copied.  Schedules:

* ``single_random_edge``: one uniformly random edge per replica per event.
* ``full_ladder``: all even-parity edges then all odd-parity edges (parity
  order alternating between events) — edges within a parity are disjoint, so
  they vectorize into one masked update.

Diagnostics: per-edge attempt/acceptance counters and the hot->cold->hot
round-trip state machine (trip_state 0/1/2 per system, realization.rs:109-120).
Arrival events only matter at the hottest and coldest slots, so they are
detected by comparing those two columns of ``system_ids`` before/after.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pt_full_ladder", "pt_single_random_edge", "init_trip_state"]


def init_trip_state(system_ids, hot_slot):
    """Systems starting at the hot slot get trip_state=1 (realization.rs:66-70)."""
    n_systems = system_ids.size
    ts = jnp.zeros(n_systems, dtype=jnp.int32)
    return ts.at[system_ids[:, hot_slot]].set(1)


def _record_arrivals(sid_old, sid_new, round_trips, trip_state, hot_slot, cold_slot):
    """Update trip state for systems newly arriving at the hot/cold slots.

    Within one vectorized swap pass each system moves at most once, and the
    system sets of different replicas are disjoint, so the scatters below have
    unique indices.
    """
    hot_sys = sid_new[:, hot_slot]
    hot_arrived = sid_new[:, hot_slot] != sid_old[:, hot_slot]
    inc = hot_arrived & (trip_state[hot_sys] == 2)
    round_trips = round_trips.at[hot_sys].add(inc.astype(jnp.int32))
    trip_state = trip_state.at[hot_sys].set(
        jnp.where(hot_arrived, 1, trip_state[hot_sys])
    )

    cold_sys = sid_new[:, cold_slot]
    cold_arrived = sid_new[:, cold_slot] != sid_old[:, cold_slot]
    promote = cold_arrived & (trip_state[cold_sys] == 1)
    trip_state = trip_state.at[cold_sys].set(
        jnp.where(promote, 2, trip_state[cold_sys])
    )
    return round_trips, trip_state


def _edge_deltas(energies_sys, system_ids, temps, n_spins):
    """Metropolis log-acceptance ``delta`` for every adjacent edge, per replica."""
    e_left = energies_sys[system_ids[:, :-1]]
    e_right = energies_sys[system_ids[:, 1:]]
    inv_t = 1.0 / temps
    return n_spins * (e_right - e_left) * (inv_t[:-1] - inv_t[1:])[None, :]


def _apply_edge_swaps(system_ids, accept):
    """Swap slots (e, e+1) wherever ``accept[:, e]``; edges must be disjoint."""
    a_left = jnp.pad(accept, ((0, 0), (0, 1)))  # slot is left end of accepted edge
    a_right = jnp.pad(accept, ((0, 0), (1, 0)))  # slot is right end
    sid_r = jnp.roll(system_ids, -1, axis=1)
    sid_l = jnp.roll(system_ids, 1, axis=1)
    return jnp.where(a_left, sid_r, jnp.where(a_right, sid_l, system_ids))


def pt_full_ladder(
    energies_sys,
    system_ids,
    temps,
    key,
    n_spins,
    first_parity,
    edge_attempts,
    edge_acceptances,
    round_trips,
    trip_state,
    hot_slot,
    cold_slot,
):
    """Full-ladder PT event (tempering.rs:45-71). Returns updated state tuple."""
    n_replicas, n_temps = system_ids.shape
    n_edges = n_temps - 1
    edge_idx = jnp.arange(n_edges)

    def one_parity(i, carry):
        sid, ea, eacc, rt, ts = carry
        parity = jax.lax.select(i == 0, first_parity, 1 - first_parity)
        pk = jax.random.fold_in(key, i)
        u = jax.random.uniform(pk, (n_replicas, n_edges), dtype=jnp.float32)
        delta = _edge_deltas(energies_sys, sid, temps, n_spins)
        pmask = (edge_idx % 2) == parity
        accept = (delta >= jnp.log(u)) & pmask[None, :]
        new_sid = _apply_edge_swaps(sid, accept)
        ea = ea + jnp.where(pmask, n_replicas, 0).astype(ea.dtype)
        eacc = eacc + accept.sum(0).astype(eacc.dtype)
        rt, ts = _record_arrivals(sid, new_sid, rt, ts, hot_slot, cold_slot)
        return new_sid, ea, eacc, rt, ts

    carry = (system_ids, edge_attempts, edge_acceptances, round_trips, trip_state)
    carry = jax.lax.fori_loop(0, 2, one_parity, carry)
    return carry


def pt_single_random_edge(
    energies_sys,
    system_ids,
    temps,
    key,
    n_spins,
    edge_attempts,
    edge_acceptances,
    round_trips,
    trip_state,
    hot_slot,
    cold_slot,
):
    """One random-edge PT attempt per replica (tempering.rs:20-42)."""
    n_replicas, n_temps = system_ids.shape
    n_edges = n_temps - 1
    k_edge, k_u = jax.random.split(key)
    edges = jax.random.randint(k_edge, (n_replicas,), 0, n_edges)
    u = jax.random.uniform(k_u, (n_replicas,), dtype=jnp.float32)

    rows = jnp.arange(n_replicas)
    left = system_ids[rows, edges]
    right = system_ids[rows, edges + 1]
    t1 = temps[edges]
    t2 = temps[edges + 1]
    delta = n_spins * (energies_sys[right] - energies_sys[left]) * (1.0 / t1 - 1.0 / t2)
    accept = delta >= jnp.log(u)

    new_sid = system_ids.at[rows, edges].set(jnp.where(accept, right, left))
    new_sid = new_sid.at[rows, edges + 1].set(jnp.where(accept, left, right))

    edge_attempts = edge_attempts.at[edges].add(1)
    edge_acceptances = edge_acceptances.at[edges].add(accept.astype(jnp.int32))
    round_trips, trip_state = _record_arrivals(
        system_ids, new_sid, round_trips, trip_state, hot_slot, cold_slot
    )
    return new_sid, edge_attempts, edge_acceptances, round_trips, trip_state
