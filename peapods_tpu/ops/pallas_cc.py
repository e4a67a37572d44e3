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


def _cc_kernel(active_ref, out_ref, *, log_cc=False):
    h, w = out_ref.shape[1], out_ref.shape[2]
    big = jnp.int32(h * w)
    # the single full-tile graph is the degenerate kp=ks=1 packed layout,
    # so the shared fixed-point body (and its log-doubling variant) applies
    from .pallas_megapair import _mp_geometry
    from .pallas_cc_batch import cc_fixed_point

    bonds = [active_ref[0, d] != 0 for d in range(2)]
    shifts, _parity, row, col = _mp_geometry(h, w, h, w, 1)
    init = row * np.int32(w) + col
    out_ref[0] = cc_fixed_point(
        bonds, init, big, (h, w, h, w, 1, row, col, shifts),
        n_dirs=2, tri=False, log_cc=log_cc,
        rounds_per_check=_ROUNDS_PER_CHECK,
    )


@functools.partial(jax.jit, static_argnames=("shape", "interpret", "log_cc"))
def connected_components_2d(active_fwd, *, shape, interpret=False,
                            log_cc=False):
    """Component labels (min site index) of one 2D bond graph.

    Args:
        active_fwd: ``bool [n_spins, 2]`` forward-bond activation.
        shape: static ``(H, W)``.
        log_cc: log-doubling fixed-point body (same labels bitwise).

    Returns ``int32 [n_spins]``, bitwise equal to
    :func:`peapods_tpu.ops.cluster.connected_components`.
    """
    h, w = shape
    a = active_fwd.astype(jnp.int8).T.reshape(2, h, w)
    labels = pl.pallas_call(
        functools.partial(_cc_kernel, log_cc=log_cc),
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
