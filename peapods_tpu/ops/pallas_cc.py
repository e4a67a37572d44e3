"""Pallas TPU kernel: min-label connected components for 2D bond graphs.

The jnp label-propagation loop (ops/cluster.py) pays XLA op-dispatch
overhead on every round plus a device-sync ``any()`` per check block; at
criticality a 256^2 graph needs O(L) rounds, ~6 ms per call.  This kernel
runs the whole fixed-point loop on-chip — each round is a handful of VMEM
roll/min ops and the convergence check is an on-chip reduction — for ~10x
on the single-system Swendsen-Wang stress config (BASELINE config 3).

It computes exactly the same fixed point as the jnp path (labels = minimum
site index of each component), so results are interchangeable bitwise.

Dispatch note: under ``vmap`` the kernel becomes a grid of *sequential*
instances, each paying its own round count, while the jnp path vectorizes
the batch and pays only the max round count — so callers route through the
kernel only for small batches (engine/loop.py gates on
``n_disorder * n_systems``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _interp

__all__ = ["supports_cc", "connected_components_2d"]

_ROUNDS_PER_CHECK = 16


def supports_cc(lattice) -> bool:
    return (
        lattice.n_dims == 2
        and lattice.n_neighbors == 2
        and np.array_equal(lattice.offsets, [[1, 0], [0, 1]])
        and lattice.shape[0] % 8 == 0
        and lattice.shape[1] % 128 == 0
    )


def _cc_kernel(active_ref, out_ref):
    h, w = out_ref.shape[1], out_ref.shape[2]
    big = jnp.int32(h * w)
    # rolls need 32-bit data on this hardware; mask comparisons come after
    a0i = active_ref[0, 0].astype(jnp.int32)  # fwd bond i -> i+1 along dim 0
    a1i = active_ref[0, 1].astype(jnp.int32)  # fwd bond along dim 1
    a0 = a0i != 0
    a1 = a1i != 0
    a0b = pltpu.roll(a0i, 1, 0) != 0  # bond arriving from the row above
    a1b = pltpu.roll(a1i, 1, 1) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    init = row * w + col

    def propagate(lab):
        lf0 = jnp.where(a0, pltpu.roll(lab, h - 1, 0), big)
        lb0 = jnp.where(a0b, pltpu.roll(lab, 1, 0), big)
        lf1 = jnp.where(a1, pltpu.roll(lab, w - 1, 1), big)
        lb1 = jnp.where(a1b, pltpu.roll(lab, 1, 1), big)
        return jnp.minimum(
            jnp.minimum(lab, jnp.minimum(lf0, lb0)), jnp.minimum(lf1, lb1)
        )

    def body(carry):
        lab, _ = carry
        new = lab
        for _ in range(_ROUNDS_PER_CHECK):
            new = propagate(new)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], body, (init, jnp.bool_(True))
    )
    out_ref[0] = labels


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def connected_components_2d(active_fwd, *, shape, interpret=False):
    """Component labels (min site index) of one 2D bond graph.

    Args:
        active_fwd: ``bool [n_spins, 2]`` forward-bond activation.
        shape: static ``(H, W)``.

    Returns ``int32 [n_spins]``, bitwise equal to
    :func:`peapods_tpu.ops.cluster.connected_components`.
    """
    h, w = shape
    a = active_fwd.astype(jnp.int8).T.reshape(2, h, w)
    labels = pl.pallas_call(
        _cc_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        interpret=_interp(interpret),
    )(a[None])
    return labels.reshape(h * w)
