"""Cluster machinery: bond activation, connected components, flips, graph stats.

TPU-native counterpart of the reference union-find / DFS cluster layer
(``/root/reference/spin-sim/src/clusters/utils.rs`` and ``clusters/fk.rs``).

Design (SURVEY.md section 7): the sequential union-find becomes a fixed-point
**min-label propagation** connected-components kernel — iterate

    label[i] <- min(label[i], min over active-bond neighbors of their label)

interleaved with pointer jumping (``label <- label[label]``), inside a
``lax.while_loop`` until convergence.  Labels converge to the minimum site
index of each component, so every site of a component carries the same id
(the role of the reference's flattened union-find parent array).

Cluster-level randomness (SW coin flips, CMR's k in {0..3}) is realized by
drawing one uniform per *site* and reading it at the component label: all
sites of a cluster see the same draw, clusters see i.i.d. draws — the
vectorized form of "one coin per union-find root" (fk.rs:153-162).

All functions here operate on a single bond graph (one system / one replica
pair); callers ``vmap`` over systems, tasks, and disorder realizations.

FK bond rule (fk.rs:74,113): a forward bond (i, d) with interaction
``w = s_i * s_j * J[i,d] > 0`` activates with ``p = 1 - exp(-2 w / T)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "active_bwd_from_fwd",
    "connected_components",
    "component_counts",
    "csd_histogram",
    "top4_sizes",
    "find_seed",
    "cluster_coin_flip_mask",
    "wolff_flip_mask",
    "fk_bond_activation",
    "GraphObservation",
    "graph_observation",
    "winding_flags",
]

_NO_WINDING = (jnp.array(False), jnp.array(False))


def active_bwd_from_fwd(active_fwd, bwd):
    """``active_bwd[i, d] = active_fwd[bwd[i, d], d]`` — the bond into ``i``."""
    n_nb = bwd.shape[1]
    return active_fwd[bwd, jnp.arange(n_nb)[None, :]]


def connected_components(active_fwd, fwd, bwd):
    """Labels of the bond graph's connected components.

    Args:
        active_fwd: ``bool [n_spins, n_neighbors]`` — forward-bond activation.
        fwd, bwd: ``int32 [n_spins, n_neighbors]`` neighbor tables.

    Returns:
        ``int32 [n_spins]`` labels; ``label[i]`` is the minimum site index of
        ``i``'s component.
    """
    n_spins = fwd.shape[0]
    big = jnp.int32(n_spins)
    active_bwd = active_bwd_from_fwd(active_fwd, bwd)
    init = jnp.arange(n_spins, dtype=jnp.int32)

    def propagate(labels):
        lf = jnp.where(active_fwd, labels[fwd], big).min(-1)
        lb = jnp.where(active_bwd, labels[bwd], big).min(-1)
        new = jnp.minimum(labels, jnp.minimum(lf, lb))
        # Pointer jumping: label values are site indices with label[j] <= j,
        # so this halves chain depths while staying within the component.
        new = new[new]
        new = new[new]
        return new

    def cond(carry):
        labels, changed = carry
        return changed

    def body(carry):
        labels, _ = carry
        new = propagate(labels)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.array(True)))
    return labels


def component_counts(labels):
    """``int32 [n_spins]``: ``counts[x]`` = size of the component labeled x (0 elsewhere)."""
    n = labels.shape[0]
    return jnp.zeros(n, dtype=jnp.int32).at[labels].add(1)


def csd_histogram(counts):
    """Cluster-size histogram ``hist[s] = #clusters of size s``; ``int32 [n_spins+1]``.

    Matches the reference's ``uf_histogram`` (clusters/utils.rs:297-303).
    """
    n = counts.shape[0]
    return jnp.zeros(n + 1, dtype=jnp.int32).at[counts].add(
        (counts > 0).astype(jnp.int32)
    )


def top4_sizes(counts):
    """Four largest component sizes, descending (clusters/utils.rs:305-315)."""
    top, _ = jax.lax.top_k(counts, 4)
    return top


def find_seed(key, eligible, n_probes: int = 64):
    """Probabilistic seed search: 64 random probes (clusters/utils.rs:107-119).

    Returns ``(seed_index, found)``; when not found the caller must mask the
    move off (the reference returns ``None`` and skips the task).
    """
    n = eligible.shape[0]
    probes = jax.random.randint(key, (n_probes,), 0, n)
    hits = eligible[probes]
    first = jnp.argmax(hits)  # first True (argmax returns lowest index of max)
    return probes[first], hits.any()


def cluster_coin_flip_mask(key, labels, counts, *, prob=0.5, nonsingleton=False):
    """SW-style per-cluster coin: flip each cluster with probability ``prob``.

    ``nonsingleton=True`` restricts to clusters of size > 1 (the overlap-move
    convention, clusters/overlap.rs:296-309); FK/SW flips singletons too
    (fk.rs:153-162).
    """
    n = labels.shape[0]
    u = jax.random.uniform(key, (n,), dtype=jnp.float32)
    flip = u[labels] < prob
    if nonsingleton:
        flip &= counts[labels] > 1
    return flip


def wolff_flip_mask(labels, seed):
    """Mask of the component containing ``seed``."""
    return labels == labels[seed]


def fk_bond_activation(spins, coup_fwd, fwd, temp, key, *, factor=2.0):
    """FK forward-bond activation for one system (fk.rs:74,106-114).

    ``factor`` is the exponent multiplier: 2 for FK, 4 for the Joerg move's
    pair bonds (overlap.rs:424-436).
    """
    s = spins.astype(jnp.float32)
    inter = s[:, None] * s[fwd] * coup_fwd
    p = 1.0 - jnp.exp(-factor * inter / temp)
    u = jax.random.uniform(key, inter.shape, dtype=jnp.float32)
    return (inter > 0.0) & (u < p)


class GraphObservation(NamedTuple):
    """Per-graph observation slot (clusters/utils.rs:317-325)."""

    top4: jax.Array  # int32 [4]
    active_bonds: jax.Array  # int32 scalar
    winding_x: jax.Array  # bool scalar
    winding_y: jax.Array  # bool scalar
    large_components: jax.Array  # int32 scalar


def graph_observation(active_fwd, counts, labels, fwd, bwd, offsets, with_winding):
    """Graph observables for one bond graph (clusters/utils.rs:334-368).

    ``with_winding`` must be a static bool (canonical 2D lattices only);
    ``offsets`` is the static ``int [n_neighbors, n_dims]`` offset table.
    """
    n_spins = counts.shape[0]
    threshold = jnp.int32(-(-n_spins * 5 // 100))  # ceil(0.05 * n)
    if with_winding:
        wx, wy = winding_flags(active_fwd, labels, fwd, bwd, offsets)
    else:
        wx, wy = _NO_WINDING
    return GraphObservation(
        top4=top4_sizes(counts),
        active_bonds=active_fwd.sum().astype(jnp.int32),
        winding_x=wx,
        winding_y=wy,
        large_components=(counts >= threshold).sum().astype(jnp.int32),
    )


def winding_flags(active_fwd, labels, fwd, bwd, offsets):
    """Detect components wrapping the torus along each of the two axes.

    TPU-native replacement of the reference's displacement-tracking union-find
    (``WindingUf``, clusters/utils.rs:371-455).  We BFS-settle an *unwrapped*
    displacement potential ``d[i]`` from each component's root (its min-label
    site) along active bonds; a component winds along axis ``a`` iff some
    active bond violates the potential, i.e. ``d[j] - d[i] != offset`` in that
    axis (any violation is a nonzero multiple of the lattice extent, exactly
    the noncontractible-cycle criterion).

    Args:
        active_fwd: ``bool [n_spins, n_neighbors]``.
        labels: converged component labels (min site index per component).
        offsets: ``int32 [n_neighbors, n_dims]`` (n_dims == 2).

    Returns:
        ``(winding_x, winding_y)`` bool scalars: does *any* component wind?
    """
    n_spins, n_nb = active_fwd.shape
    offsets = jnp.asarray(offsets, dtype=jnp.int32)
    active_bwd = active_bwd_from_fwd(active_fwd, bwd)
    site_idx = jnp.arange(n_spins, dtype=jnp.int32)

    settled0 = labels == site_idx
    disp0 = jnp.zeros((n_spins, 2), dtype=jnp.int32)

    def cond(carry):
        settled, _ = carry
        return ~settled.all()

    def body(carry):
        settled, disp = carry
        new_settled = settled
        new_disp = disp
        for d in range(n_nb):
            j = fwd[:, d]
            ok = active_fwd[:, d] & settled[j] & ~new_settled
            new_disp = jnp.where(ok[:, None], disp[j] - offsets[d][None, :], new_disp)
            new_settled |= ok
            jb = bwd[:, d]
            ok = active_bwd[:, d] & settled[jb] & ~new_settled
            new_disp = jnp.where(ok[:, None], disp[jb] + offsets[d][None, :], new_disp)
            new_settled |= ok
        return new_settled, new_disp

    _, disp = jax.lax.while_loop(cond, body, (settled0, disp0))

    viol = disp[fwd] - disp[:, None, :] - offsets[None, :, :]  # [n, n_nb, 2]
    viol = jnp.where(active_fwd[:, :, None], viol, 0)
    return (viol[..., 0] != 0).any(), (viol[..., 1] != 0).any()
