"""Pallas band-local connected-components body for space-sharded lattices.

:func:`peapods_tpu.ops.cluster.connected_components_banded` keeps the CC
fixed point shard-local under a ``space`` mesh and exchanges two halo label
rows per outer round — minimal collectives, but its per-band inner fixed
point is plain jnp, losing the packed-tile kernel speed the unsharded paths
enjoy (round-4 verdict item).  This module supplies the Pallas inner body:

* the shard's row band is EXTENDED by its two halo rows (one per side) and
  treated as one packed graph tile of ``l0e = hl + 2`` rows (padded up to a
  sublane multiple with bond-free rows);
* dim-0 torus wrap inside the tile is masked off by construction (the halo
  rows' outward bonds are zeroed), so the packed-tile seam machinery
  (:func:`peapods_tpu.ops.pallas_cc_batch.make_k_shifts`) applies whole;
* labels are GLOBAL site indices (the banded convention) and the halo rows
  participate in the min-label fixed point: every update still moves labels
  only along genuine bonds, so the outer ppermute + psum loop converges to
  exactly the unsharded labeling, bitwise (the fixed point is unique —
  see the monotonicity argument in ``cluster.connected_components_banded``).

Hypercubic 2D/3D and triangular bands reuse the proven
:func:`~peapods_tpu.ops.pallas_cc_batch.cc_fixed_point` body (classic or
log-doubling); any other offset table with ``|offset[0]| <= 1`` (BCC, FCC,
user offsets — :func:`peapods_tpu.ops.cluster.banded_supports`) runs the
same classic fixed point through :func:`offset_closures`, which composes
each bond direction from seam-corrected per-axis shifts (the
``pallas_sweep_diag`` construction).

Reference anchor: the reference never shards one lattice (its union-find is
sequential, clusters/utils.rs); this is the SURVEY §5 long-context analog.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_cc_batch import (
    _ROUNDS_PER_CHECK,
    _pack,
    _unpack,
    cc_fixed_point,
    make_k_shifts,
)
from .pallas_megapair import _mp_geometry

__all__ = [
    "band_supports_pallas",
    "band_factors",
    "band_cc_batch",
    "offset_closures",
]

_TRI = ((1, 0), (0, 1), (1, -1))
_UNITS = {
    2: ((1, 0), (0, 1)),
    3: ((1, 0, 0), (0, 1, 0), (0, 0, 1)),
}


def _body_kind(offsets, n_dims):
    """("hyper", n_dirs, tri) when the proven cc_fixed_point body applies,
    ("generic", n_dirs, False) otherwise."""
    offs = tuple(tuple(int(c) for c in o) for o in offsets)
    if offs == _UNITS.get(n_dims):
        return "hyper", n_dims, False
    if n_dims == 2 and offs == _TRI:
        return "hyper", 3, True
    return "generic", len(offs), False


def band_supports_pallas(geom) -> bool:
    """The kernel serves any banded-supported offset table whose band tiles
    pack into (rows, lanes) Mosaic tiles: lane axis a 128-multiple after
    kp-packing and at least two rows per band grid row axis."""
    shape = tuple(geom.shape)
    if len(shape) < 2:
        return False
    if any(abs(int(o[0])) > 1 for o in geom.offsets):
        return False
    rest = int(np.prod(shape[1:], dtype=np.int64))
    kp = 128 // math.gcd(128, rest)
    # packed lanes must be a lane multiple; row extents must cover the
    # largest per-axis step the offset table takes
    if (kp * rest) % 128 != 0:
        return False
    for o in geom.offsets:
        for a, c in enumerate(o):
            if abs(int(c)) >= shape[a]:
                return False
    return True


def band_factors(geom, n_graphs, l0e):
    """(kp, ks) pack factors for extended band tiles of ``l0e`` rows.
    Bands are few and fat, so only lane packing (kp) applies;
    sublane-stacking (ks) buys nothing here.  ``n_graphs``/``l0e`` are
    accepted for signature parity with ``cc_batch_factors``."""
    del n_graphs, l0e
    rest = int(np.prod(geom.shape[1:], dtype=np.int64))
    return 128 // math.gcd(128, rest), 1


def offset_closures(shifts_info, offsets):
    """Per-direction ``(fwd, bwd)`` neighbor-shift closures for an
    arbitrary offset table, composed from the seam-corrected per-axis
    stride-k shifts (each axis wraps its own extent independently inside
    every packed graph region, so compositions stay graph-local — the
    ``pallas_sweep_diag`` construction, validated there against an
    exact-enumeration geometry oracle)."""
    rows, lanes, l0, l1, l2, row, col, _shifts = shifts_info
    fwd_k, bwd_k = make_k_shifts(rows, lanes, l0, l1, l2, row, col)
    extents = (l0, l1, l2)

    def mk(off, sign):
        steps = []
        for axis, c in enumerate(off):
            c = int(c) * sign
            k = c % extents[axis] if c > 0 else (-c) % extents[axis]
            if c != 0 and k != 0:
                steps.append((axis, k, c > 0))
        def f(x):
            for axis, k, forward in steps:
                x = fwd_k(x, axis, k) if forward else bwd_k(x, axis, k)
            return x
        return f

    return (
        [mk(o, 1) for o in offsets],
        [mk(o, -1) for o in offsets],
    )


def _generic_fixed_point(bonds, init, big, shifts_info, offsets,
                         rounds_per_check=_ROUNDS_PER_CHECK):
    """Classic min-label fixed point with arbitrary-offset closures (the
    cc_fixed_point classic body, direction shifts generalized)."""
    fwd, bwd = offset_closures(shifts_info, offsets)
    n_dirs = len(offsets)
    ab = [bwd[d](bonds[d].astype(jnp.int32)) != 0 for d in range(n_dirs)]

    def propagate(lab):
        new = lab
        for d in range(n_dirs):
            lf = jnp.where(bonds[d], fwd[d](lab), big)
            lb = jnp.where(ab[d], bwd[d](lab), big)
            new = jnp.minimum(new, jnp.minimum(lf, lb))
        return new

    def body(carry):
        lab, _ = carry
        new = lab
        for _ in range(rounds_per_check):
            new = propagate(new)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], body, (init, jnp.bool_(True))
    )
    return labels


def _band_kernel(b_ref, l_ref, out_ref, *, l0, l1, l2, kp, ks, offsets,
                 big, log_cc):
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    kind, n_dirs, tri = _body_kind(offsets, 2 if l2 == 1 else 3)
    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    shifts_info = (rows, lanes, l0, l1, l2, row, col, shifts)
    # masks ride as int32 (Mosaic rejects packed-i8 vector compares on
    # hardware, and widen-then-compare folds back — CLAUDE.md)
    bonds = [b_ref[0, d] != 0 for d in range(b_ref.shape[1])]
    init = l_ref[0]
    if kind == "hyper":
        out = cc_fixed_point(
            bonds, init, jnp.int32(big), shifts_info,
            n_dirs=n_dirs, tri=tri, log_cc=log_cc,
        )
    else:
        out = _generic_fixed_point(
            bonds, init, jnp.int32(big), shifts_info, offsets
        )
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape_ext", "kp", "ks", "offsets", "big", "log_cc", "interpret",
    ),
)
def band_cc_batch(bonds_i32, labels, *, shape_ext, kp, ks, offsets, big,
                  log_cc=0, interpret=False):
    """Run the band-local fixed point on packed extended-band tiles.

    Args:
        bonds_i32: ``int32 [G, n_dirs, rows, lanes]`` packed extended-band
            forward bond masks (0/1; halo-row outward bonds pre-zeroed).
        labels: ``int32 [G, rows, lanes]`` packed labels (global site
            indices; bond-free pad rows carry ``big``).
        shape_ext: extended band grid shape ``(l0e_padded, *rest)``.
        big: global ``n_spins`` sentinel (labels are global indices).

    Returns packed converged labels ``int32 [G, rows, lanes]``.
    """
    shape_ext = tuple(shape_ext)
    n_dims = len(shape_ext)
    l0 = shape_ext[0]
    l1 = shape_ext[1]
    l2 = shape_ext[2] if n_dims == 3 else 1
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    g = labels.shape[0]
    n_dirs = bonds_i32.shape[1]
    kernel = functools.partial(
        _band_kernel,
        l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, offsets=offsets, big=big,
        log_cc=log_cc,
    )
    tile = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    from .pallas_cc_batch import _interp as _cc_interp

    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[tile(n_dirs, rows, lanes), tile(rows, lanes)],
        out_specs=tile(rows, lanes),
        out_shape=jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        interpret=_cc_interp(interpret),
    )(bonds_i32, labels)
