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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _interp
from .pallas_megapair import _dims_of, _mp_geometry

__all__ = [
    "supports_cc_batch",
    "cc_batch_factors",
    "connected_components_batch",
    "grid_dims",
    "dir_shifts",
    "supports_winding_batch",
    "winding_batch",
]

def parse_cc_log(v):
    """``PEAPODS_CC_LOG`` -> int or None: 0 = classic stride-1 body,
    k >= 1 = log-doubling body with k super rounds per convergence
    check, -1 (``mix``) = classic rounds with one super round per check
    block, None = auto (unset/``auto``: pick by lattice extent,
    :func:`auto_cc_log`)."""
    v = (v or "").strip()
    if v in ("", "auto"):
        return None
    if v in ("mix", "-1"):
        return -1
    if v == "0":
        return 0
    return max(1, int(v)) if v.isdigit() else 1


def auto_cc_log(shape):
    """Auto body choice by lattice extent (2026-08-19 chip rpc sweep):
    log-doubling wins on small-extent packed graph tiles (64^2 FK batch
    1.11x) but LOSES on large single-graph tiles (256^2 SW at T_c
    0.86x — super rounds cost ~log2(extent) masked mins each, and the
    percolation-threshold clusters are winding, not straight), so the
    default is log (k=1) iff the longest lattice extent fits 128."""
    return 1 if max(shape) <= 128 else 0


_ROUNDS_PER_CHECK = 16
# Max sublane rows per packed tile: fatter tiles amortize per-grid-step
# overhead, but every graph in a tile pays the tile-max round count, so
# over-packing regresses heavy-tailed batches.
_MAX_ROWS = 256

_TRI_2D = np.asarray([[1, 0], [0, 1], [1, -1]], dtype=np.int64)


def grid_dims(lattice):
    """``(l0, l1, l2, n_dirs, tri)`` for kernel-packable lattices, else None.

    Hypercubic 2D/3D map offsets one-to-one onto grid axes; the triangular
    lattice adds a third bond direction ``[1, -1]`` on the same 2D grid —
    its neighbor shifts are compositions of the axis shifts
    (:func:`dir_shifts`), so the packed-tile machinery carries over whole.
    """
    dims = _dims_of(lattice)
    if dims is not None:
        return dims + (lattice.n_dims, False)
    if (
        lattice.n_dims == 2
        and lattice.offsets.shape == _TRI_2D.shape
        and np.array_equal(lattice.offsets, _TRI_2D)
    ):
        return (lattice.shape[0], lattice.shape[1], 1, 3, True)
    return None


def dir_shifts(shifts, n_dirs, tri):
    """Per-bond-direction ``(fwd, bwd)`` neighbor-shift closures.

    ``shifts``: the six axis shifts from ``_mp_geometry``.  For the
    triangular third direction (offset ``[1, -1]``) the forward neighbor of
    ``(i, j)`` is ``(i+1, j-1)`` — the composition ``jm(ip(x))`` of the
    wrap-correct axis closures (each wraps its own axis independently, so
    the composition stays graph-local)."""
    im, ip, jm, jp, km, kp_ = shifts
    if tri:
        return (
            [ip, jp, lambda x: jm(ip(x))],
            [im, jm, lambda x: jp(im(x))],
        )
    return [ip, jp, kp_][:n_dirs], [im, jm, km][:n_dirs]


def make_k_shifts(rows, lanes, l0, l1, l2, row, col):
    """Seam-corrected shift-by-k closures for the packed-tile layout.

    ``fwd_k(x, axis, k)`` returns the value k steps FORWARD along the grid
    axis (periodic within each packed graph region); ``bwd_k`` the reverse.
    Generalizes the stride-1 helpers in ``pallas_megapair`` — each axis
    wraps independently, so direction shifts (including the triangular
    diagonal) compose from these.
    """
    block = l1 * l2
    i_coord = jax.lax.rem(row, np.int32(l0))
    jb = jax.lax.rem(col, np.int32(block))
    j_coord = jb // np.int32(l2)
    k_coord = jax.lax.rem(jb, np.int32(l2))

    def fwd_k(x, axis, k):
        if axis == 0:
            wrap = i_coord >= np.int32(l0 - k)
            a = pltpu.roll(x, (rows - k) % rows, 0)
            b = pltpu.roll(x, (l0 - k) % rows, 0)
        elif axis == 1:
            t = k * l2
            wrap = j_coord >= np.int32(l1 - k)
            a = pltpu.roll(x, (lanes - t) % lanes, 1)
            b = pltpu.roll(x, (block - t) % lanes, 1)
        else:
            wrap = k_coord >= np.int32(l2 - k)
            a = pltpu.roll(x, (lanes - k) % lanes, 1)
            b = pltpu.roll(x, (l2 - k) % lanes, 1)
        return jnp.where(wrap, b, a)

    def bwd_k(x, axis, k):
        if axis == 0:
            wrap = i_coord < np.int32(k)
            a = pltpu.roll(x, k % rows, 0)
            b = pltpu.roll(x, (rows + k - l0) % rows, 0)
        elif axis == 1:
            t = k * l2
            wrap = j_coord < np.int32(k)
            a = pltpu.roll(x, t % lanes, 1)
            b = pltpu.roll(x, (lanes + t - block) % lanes, 1)
        else:
            wrap = k_coord < np.int32(k)
            a = pltpu.roll(x, k % lanes, 1)
            b = pltpu.roll(x, (lanes + k - l2) % lanes, 1)
        return jnp.where(wrap, b, a)

    return fwd_k, bwd_k


def _log_strides(l0, l1, l2, n_dirs, tri):
    """Per-direction power-of-two stride lists for the log-doubling body."""
    def caps(extent):
        out = []
        k = 1
        while k < extent:
            out.append(k)
            k *= 2
        return out or [1]

    if tri:
        diag = caps(max(l0, l1))
        return [caps(l0), caps(l1), diag]
    return [caps(l0), caps(l1), caps(l2)][:n_dirs]


def cc_fixed_point(bonds, init, big, shifts_info, *, n_dirs, tri, log_cc,
                   rounds_per_check=_ROUNDS_PER_CHECK):
    """Min-label fixed point over packed graph tiles.

    ``bonds``: per-direction bool forward-bond masks; ``init``: int32 start
    labels (may carry a -1 Wolff seed flood); ``shifts_info`` =
    ``(rows, lanes, l0, l1, l2, row, col, shifts)`` with ``shifts`` the six
    stride-1 closures from ``_mp_geometry``.

    ``log_cc=False``: the classic stride-1 propagation,
    ``rounds_per_check`` rounds per convergence check.

    ``log_cc`` truthy (int k >= 1): log-doubling run propagation, k super
    rounds per convergence check — per direction, a
    precomputed ladder of run-connectivity masks ``conn_k`` (site connected
    to its ``+k``-step neighbor through k consecutive active bonds,
    ``conn_2k = conn_k & shift_k(conn_k)``) lets one pass pull labels
    across entire straight bond runs in ``log2(extent)`` masked-min steps.
    Monotone min updates that include the stride-1 move => the SAME fixed
    point, bitwise, as the classic body; only the round count changes.
    Wins when runs are long (cold / dense FK graphs, whose diameter-bound
    round counts dominate mixed-temperature ladders).

    ``log_cc = -1`` ("mix"): hybrid — each check block runs
    ``rounds_per_check - 1`` classic stride-1 rounds plus ONE super round,
    so long straight runs still collapse every block at ~1/16th the
    super-round spend.  Every body is a monotone min schedule containing
    the stride-1 move, so all three converge to the identical fixed point.
    """
    rows, lanes, l0, l1, l2, row, col, shifts = shifts_info
    fwd1, bwd1 = dir_shifts(shifts, n_dirs, tri)

    def shift_mask(f, m):
        return f(m.astype(jnp.int32)) != 0

    if not log_cc:
        ab = [shift_mask(bwd1[d], bonds[d]) for d in range(n_dirs)]

        def propagate(lab):
            new = lab
            for d in range(n_dirs):
                lf = jnp.where(bonds[d], fwd1[d](lab), big)
                lb = jnp.where(ab[d], bwd1[d](lab), big)
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

    fwd_k, bwd_k = make_k_shifts(rows, lanes, l0, l1, l2, row, col)

    def dfwd(x, d, k):
        if tri and d == 2:
            # k steps along the diagonal land at (i+k mod l0, j-k mod l1):
            # reduce per axis — the stride-k helpers only correct a single
            # wrap, and diagonal strides can exceed the smaller extent
            return bwd_k(fwd_k(x, 0, k % l0), 1, k % l1)
        return fwd_k(x, d, k)

    def dbwd(x, d, k):
        if tri and d == 2:
            return fwd_k(bwd_k(x, 0, k % l0), 1, k % l1)
        return bwd_k(x, d, k)

    strides = _log_strides(l0, l1, l2, n_dirs, tri)
    # run-connectivity ladders (loop-invariant; built once)
    conn = []
    for d in range(n_dirs):
        ladder = []
        c = bonds[d].astype(jnp.int32)
        k = 1
        for s in strides[d]:
            if s > k:  # double up to this stride
                c = c & dfwd(c, d, k)
                k = s
            ladder.append((s, c != 0, dbwd(c, d, s) != 0))
        conn.append(ladder)

    def super_round(lab):
        new = lab
        for d in range(n_dirs):
            for s, cf, cb in conn[d]:
                lf = jnp.where(cf, dfwd(new, d, s), big)
                lb = jnp.where(cb, dbwd(new, d, s), big)
                new = jnp.minimum(new, jnp.minimum(lf, lb))
        return new

    if int(log_cc) < 0:
        # hybrid: classic rounds with one super round per check block
        ab = [shift_mask(bwd1[d], bonds[d]) for d in range(n_dirs)]

        def propagate(lab):
            new = lab
            for d in range(n_dirs):
                lf = jnp.where(bonds[d], fwd1[d](lab), big)
                lb = jnp.where(ab[d], bwd1[d](lab), big)
                new = jnp.minimum(new, jnp.minimum(lf, lb))
            return new

        def body(carry):
            lab, _ = carry
            new = super_round(lab)
            for _ in range(rounds_per_check - 1):
                new = propagate(new)
            return new, jnp.any(new != lab)

    else:

        def body(carry):
            lab, _ = carry
            new = lab
            # int-valued log_cc = super-rounds per convergence check (the
            # any() reduction forces a pipeline sync, same economics as the
            # classic body's 16-round amortization, but each super round is
            # ~log2(extent) x costlier, so the sweet spot is small)
            for _ in range(max(1, int(log_cc))):
                new = super_round(new)
            return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], body, (init, jnp.bool_(True))
    )
    return labels


def supports_cc_batch(lattice) -> bool:
    g = grid_dims(lattice)
    if g is None:
        return False
    l0, l1, l2, _, _ = g
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    return l0 >= 2 and l1 >= 2 and (kp * block) % 128 == 0 and l0 % 8 == 0


def cc_gen_offsets(lattice):
    """Lifted offsets tuple when the GENERIC packed-tile CC serves this
    lattice — custom offset tables outside the dedicated hypercubic /
    triangular shift machinery (which named lattices keep), with the same
    packing constraints.  The generic fixed point is a monotone min over
    genuine bonds, so labels converge to the same unique per-graph fixed
    point bitwise.  Returns None when the dedicated kernel applies or the
    lattice cannot pack."""
    if grid_dims(lattice) is not None:
        return None
    from .pallas_sweep_diag import gen_meta

    meta = gen_meta(lattice)
    if meta is None:
        return None
    (l0, l1, l2), offs = meta[0], meta[1]
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    if (kp * block) % 128 or l0 % 8 or l0 < 2 or l1 < 2:
        return None
    return offs


def cc_batch_factors(lattice, n_graphs):
    """(kp, ks): lane- and sublane-pack factors; the caller pads the batch
    to a multiple of kp*ks."""
    g = grid_dims(lattice)
    if g is None:  # generic-offset lattices (cc_gen_offsets path)
        shape3 = tuple(int(x) for x in lattice.shape) + (1,) * (
            3 - lattice.n_dims
        )
        l0, l1, l2 = shape3
    else:
        l0, l1, l2, _, _ = g
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


def _cc_batch_kernel(a_ref, out_ref, *, l0, l1, l2, kp, ks, n_dirs, tri,
                     log_cc, offsets=None):
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    big = jnp.int32(l0 * block)
    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    # local site index within each packed graph
    init = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    bonds = [a_ref[0, d] != 0 for d in range(n_dirs)]
    shifts_info = (rows, lanes, l0, l1, l2, row, col, shifts)
    if offsets is not None:
        # custom offset tables: the classic fixed point with per-direction
        # closures composed from seam-corrected per-axis strides (the
        # pallas_cc_band construction; runtime import avoids the cycle)
        from .pallas_cc_band import _generic_fixed_point

        out_ref[0] = _generic_fixed_point(
            bonds, init, big, shifts_info, offsets
        )
        return
    out_ref[0] = cc_fixed_point(
        bonds, init, big, shifts_info,
        n_dirs=n_dirs, tri=tri, log_cc=log_cc,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "kp", "ks", "interpret", "tri", "log_cc", "offsets",
    ),
)
def connected_components_batch(active_fwd, *, shape, kp, ks, interpret=False,
                               tri=False, log_cc=None, offsets=None):
    """Component labels for a batch of bond graphs.

    Args:
        active_fwd: ``bool [B, n_spins, n_dirs]`` forward-bond activation
            per graph (B divisible by kp*ks — pad with all-False graphs).
        shape: static lattice shape (2D or 3D).
        kp / ks: packing factors from :func:`cc_batch_factors`.
        tri: 2D triangular offsets (n_dirs = 3, third direction ``[1, -1]``).
        log_cc: int k — use the log-doubling fixed-point body with k
            super rounds per convergence check (:func:`cc_fixed_point`);
            0 reverts to the classic stride-1 body; None reads
            ``PEAPODS_CC_LOG`` (default: auto by lattice extent,
            :func:`auto_cc_log`).  Same labels bitwise either way —
            only the round count changes.

    Returns ``int32 [B, n_spins]``, bitwise equal per graph to
    :func:`peapods_tpu.ops.cluster.connected_components`.
    """
    if log_cc is None:
        log_cc = parse_cc_log(os.environ.get("PEAPODS_CC_LOG"))
        if log_cc is None:
            log_cc = auto_cc_log(shape)
    shape = tuple(shape)
    n_dims = len(shape)
    n_dirs = len(offsets) if offsets is not None else (3 if tri else n_dims)
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
        [_pack(a[d], l0, block, kp, ks) for d in range(n_dirs)], axis=1
    )
    kernel = functools.partial(
        _cc_batch_kernel, l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, n_dirs=n_dirs,
        tri=tri, log_cc=int(log_cc), offsets=offsets,
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_dirs, rows, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        interpret=_interp(interpret),
    )(packed)
    return _unpack(out, l0, block, kp, ks)


# --------------------------------------------------------------- winding

def supports_winding_batch(lattice) -> bool:
    """The batched winding kernel serves canonical 2D square lattices that
    the packed-tile machinery can tile (winding observation is 2D-only,
    clusters/utils.rs:371-455)."""
    g = grid_dims(lattice)
    return (
        g is not None
        and not g[4]  # not triangular
        and g[2] == 1  # 2D
        and supports_cc_batch(lattice)
    )


def _winding_kernel(a_ref, l_ref, out_ref, *, l0, l1, kp, ks,
                    rounds_per_check=_ROUNDS_PER_CHECK):
    """Per-site winding-violation bits for packed 2D square graph tiles.

    In-kernel form of :func:`peapods_tpu.ops.cluster.winding_flags`: settle
    an unwrapped displacement potential from each component's root (its
    min-label site) along active bonds, then flag active bonds whose
    displacement difference disagrees with their offset.  The potential
    depends on the settle order, but the FLAGS do not: a spanning-tree
    potential violates on a chord iff that chord's fundamental cycle has
    nonzero winding, so any settle schedule marks exactly the winding
    components (the jnp path's flags are identical).  The jnp BFS pays
    O(chemical diameter) full-tile XLA rounds (~10 ms of a 12 ms observe
    sweep at 256^2 T_c); here the rounds are VMEM roll/select work with the
    convergence check amortized per block, like the CC fixed point.
    """
    block = l1
    rows, lanes = ks * l0, kp * block
    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, 1)
    fwd1, bwd1 = dir_shifts(shifts, 2, False)
    bonds = [a_ref[0, d] != 0 for d in range(2)]
    ab = [bwd1[d](bonds[d].astype(jnp.int32)) != 0 for d in range(2)]
    lab = l_ref[0]
    site = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    st0 = (lab == site).astype(jnp.int32)
    z = jnp.zeros_like(lab)

    # Mosaic layout discipline (learned on hardware): never REDUCE an i1
    # mask born from a vector-vs-scalar compare — `jnp.any(st == 0)`
    # triggers "Invalid relayout ... replicated in destination" on the
    # v5e compiler.  Settled-ness stays an int32 0/1 plane: masks feed
    # selects only, the loop condition reduces the i32 plane with `min`,
    # and the violation bits combine arithmetically.

    def settle_round(st, d0, d1):
        for d in range(2):
            ok = bonds[d] & (fwd1[d](st) != 0) & (st == 0)
            d0 = jnp.where(ok, fwd1[d](d0) - (1 if d == 0 else 0), d0)
            d1 = jnp.where(ok, fwd1[d](d1) - (1 if d == 1 else 0), d1)
            st = st | ok.astype(jnp.int32)
            ok = ab[d] & (bwd1[d](st) != 0) & (st == 0)
            d0 = jnp.where(ok, bwd1[d](d0) + (1 if d == 0 else 0), d0)
            d1 = jnp.where(ok, bwd1[d](d1) + (1 if d == 1 else 0), d1)
            st = st | ok.astype(jnp.int32)
        return st, d0, d1

    def body(carry):
        st, d0, d1, _ = carry
        for _ in range(rounds_per_check):
            st, d0, d1 = settle_round(st, d0, d1)
        return st, d0, d1, jnp.min(st) == 0

    st, d0, d1, _ = jax.lax.while_loop(
        lambda c: c[3], body, (st0, z, z, jnp.bool_(True))
    )

    viol = z
    for d in range(2):
        off0 = 1 if d == 0 else 0
        off1 = 1 if d == 1 else 0
        vx = bonds[d] & (fwd1[d](d0) - d0 - off0 != 0)
        vy = bonds[d] & (fwd1[d](d1) - d1 - off1 != 0)
        viol = viol | vx.astype(jnp.int32) | (vy.astype(jnp.int32) * 2)
    out_ref[0] = viol


@functools.partial(
    jax.jit, static_argnames=("shape", "kp", "ks", "interpret")
)
def winding_batch(active_fwd, labels, *, shape, kp, ks, interpret=False):
    """Torus-wrapping flags for a batch of 2D square bond graphs.

    Args:
        active_fwd: ``bool [B, n_spins, 2]`` forward-bond activations
            (B divisible by kp*ks — pad with all-False graphs).
        labels: ``int32 [B, n_spins]`` min-label component ids
            (:func:`connected_components_batch` output).

    Returns ``(wx, wy)`` bool ``[B]`` — does ANY component of graph b wind
    around the torus along that axis; equal to
    :func:`peapods_tpu.ops.cluster.winding_flags` per graph.
    """
    shape = tuple(shape)
    l0, l1 = shape
    block = l1
    rows, lanes = ks * l0, kp * block
    b = active_fwd.shape[0]
    g = b // (kp * ks)
    a = jnp.moveaxis(active_fwd.astype(jnp.int8), -1, 0)
    packed = jnp.stack(
        [_pack(a[d], l0, block, kp, ks) for d in range(2)], axis=1
    )
    lab_p = _pack(labels, l0, block, kp, ks)
    kernel = functools.partial(_winding_kernel, l0=l0, l1=l1, kp=kp, ks=ks)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 2, rows, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        interpret=_interp(interpret),
    )(packed, lab_p)
    flat = _unpack(out, l0, block, kp, ks)
    return (flat & 1).any(-1), (flat & 2).any(-1)
