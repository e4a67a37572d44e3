"""Pallas TPU kernel: batched min-label connected components.

The jnp label-propagation loop (ops/cluster.py) vectorizes a graph batch but
pays per-round HBM traffic over the whole batch and runs every graph for the
batch-MAX round count (the ``while_loop`` converges when the slowest graph
does); the single-graph kernel (ops/pallas_cc.py) keeps the fixed point in
VMEM but serializes ``vmap`` instances, so it is gated to tiny batches.  This
kernel covers the many-small-graphs regime the reference serves with
per-graph union-find over rayon (``clusters/utils.rs:155-238``,
``clusters/fk.rs:28-171``) — e.g. the 5-mode harness's 2,048 FK graphs per
sweep, or the overlap moves' (temps x groups x disorder) task batches:

* graphs are lane-packed (kp per 128-lane group) and sublane-stacked (ks row
  blocks) into fat ``[ks*L0, kp*block]`` tiles — the same packing as the
  sweep kernels — so each grid step holds kp*ks graphs resident in VMEM;
* every propagation round is pure VMEM roll/min work (no HBM traffic, no
  XLA dispatch, no device-sync convergence check);
* each grid step exits at ITS graphs' convergence, so the batch pays the
  sum of per-tile round counts instead of batch-max times batch-size.

Labels are the minimum LOCAL site index of each component (identical to
``cluster.connected_components`` per graph, bitwise).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _interp
from .pallas_megapair import _dims_of, _mp_geometry

__all__ = ["supports_cc_batch", "cc_batch_factors", "connected_components_batch"]

_ROUNDS_PER_CHECK = 16
# Max sublane rows per packed tile: fatter tiles amortize per-grid-step
# overhead, but every graph in a tile pays the tile-max round count, so
# over-packing regresses heavy-tailed batches.
_MAX_ROWS = 256


def supports_cc_batch(lattice) -> bool:
    dims = _dims_of(lattice)
    if dims is None:
        return False
    l0, l1, l2 = dims
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    return l0 >= 2 and l1 >= 2 and (kp * block) % 128 == 0 and l0 % 8 == 0


def cc_batch_factors(lattice, n_graphs):
    """(kp, ks): lane- and sublane-pack factors; the caller pads the batch
    to a multiple of kp*ks."""
    l0, l1, l2 = _dims_of(lattice)
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    ks = max(1, _MAX_ROWS // l0)
    while ks > 1 and kp * ks > max(1, n_graphs):
        ks -= 1
    return kp, ks


def _pack(x, l0, block, kp, ks):
    """``[B, l0*block] -> [B/(kp*ks), ks*l0, kp*block]`` (graph ``g*kp*ks +
    b*kp + c`` at row block b, lane group c — pack_rows_3d layout)."""
    g = x.shape[0] // (kp * ks)
    return (
        x.reshape(g, ks, kp, l0, block)
        .transpose(0, 1, 3, 2, 4)
        .reshape(g, ks * l0, kp * block)
    )


def _unpack(x, l0, block, kp, ks):
    g = x.shape[0]
    return (
        x.reshape(g, ks, l0, kp, block)
        .transpose(0, 1, 3, 2, 4)
        .reshape(g * ks * kp, l0 * block)
    )


def _cc_batch_kernel(a_ref, out_ref, *, l0, l1, l2, kp, ks, n_dims):
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    big = jnp.int32(l0 * block)
    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    im, ip, jm, jp, km, kp_ = shifts
    # local site index within each packed graph
    init = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    # per-dim (fwd-gate, fwd-neighbor-shift, bwd-gate, bwd-neighbor-shift):
    # bond (i, d) connects i and i + e_d; the bond arriving at i from its
    # -d neighbor is that neighbor's forward bond (a shifted mask).
    a = [a_ref[0, d] != 0 for d in range(n_dims)]
    fwd_shift = [ip, jp, kp_][:n_dims]
    bwd_shift = [im, jm, km][:n_dims]
    ab = [bwd_shift[d](a_ref[0, d].astype(jnp.int32)) != 0 for d in range(n_dims)]

    def propagate(lab):
        new = lab
        for d in range(n_dims):
            lf = jnp.where(a[d], fwd_shift[d](lab), big)
            lb = jnp.where(ab[d], bwd_shift[d](lab), big)
            new = jnp.minimum(new, jnp.minimum(lf, lb))
        return new

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


@functools.partial(
    jax.jit, static_argnames=("shape", "kp", "ks", "interpret")
)
def connected_components_batch(active_fwd, *, shape, kp, ks, interpret=False):
    """Component labels for a batch of bond graphs.

    Args:
        active_fwd: ``bool [B, n_spins, n_dims]`` forward-bond activation
            per graph (B divisible by kp*ks — pad with all-False graphs).
        shape: static lattice shape (2D or 3D hypercubic).
        kp / ks: packing factors from :func:`cc_batch_factors`.

    Returns ``int32 [B, n_spins]``, bitwise equal per graph to
    :func:`peapods_tpu.ops.cluster.connected_components`.
    """
    shape = tuple(shape)
    n_dims = len(shape)
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    l1 = shape[1]
    l2 = shape[2] if n_dims == 3 else 1
    rows, lanes = ks * l0, kp * block
    b = active_fwd.shape[0]
    g = b // (kp * ks)
    # [B, n, nd] -> [nd, B, n] -> packed [nd, G, rows, lanes] -> [G, nd, ...]
    a = jnp.moveaxis(active_fwd.astype(jnp.int8), -1, 0)
    packed = jnp.stack(
        [_pack(a[d], l0, block, kp, ks) for d in range(n_dims)], axis=1
    )
    kernel = functools.partial(
        _cc_batch_kernel, l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, n_dims=n_dims
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_dims, rows, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        interpret=_interp(interpret),
    )(packed)
    return _unpack(out, l0, block, kp, ks)
