"""Pallas TPU kernel: fused multicolor Metropolis/Gibbs sweep, BCC/FCC lattices.

The reference runs every named geometry through the same flat
neighbor-table sweep at native speed (``/root/reference/spin-sim/src/mcmc/
sweep.rs:51-97`` with the BCC/FCC offsets from ``geometry/offsets.rs:
4-20``); this module closes the last geometries without a TPU kernel the
same way :mod:`.pallas_sweep_tri` closed triangular: the 3D packed-tile
layout of :mod:`.pallas_sweep3d` (``[L0, kp*L1*L2]`` — i on sublanes, the
(j, k) plane j-major on lanes, kp systems lane-packed) with each DIAGONAL
forward offset composed from the existing seam-corrected axis shifts.

Offsets (cubic coordinates; see ``ops/lattice.py GEOMETRY_OFFSETS``):

    BCC: (1,1,1) (1,1,-1) (1,-1,1) (1,-1,-1)     -> 8 neighbors
    FCC: (1,1,0) (1,0,1) (0,1,1) (1,-1,0) (1,0,-1) (0,1,-1) -> 12

Coloring: every BCC offset flips i-parity and nothing else reaches inside
an i-plane, so the greedy coloring is ``color = i % 2`` (2 colors);
every FCC offset flips i-parity or j-parity, giving
``color = 2*(i % 2) + j % 2`` (4 colors).  Both formulas are asserted
against the lattice's actual greedy coloring (a lattice that deviates —
odd extents — simply skips this kernel), so the site schedule matches
:func:`peapods_tpu.ops.sweep.mc_sweep` exactly: one masked pass per color
with a fresh uniform grid each pass, lazy-Metropolis/Gibbs acceptance.

Couplings arrive as ``2 * n_nb`` pre-shifted grids — for each forward
offset ``o_d``: ``g[2d][p] = J_d[p - o_d]`` (the bond arriving from the
backward neighbor) and ``g[2d+1][p] = J_d[p]`` (the own forward bond) — so
the field is pure elementwise work against the composed-shift neighbor
values, and the fused post-sweep energy sums each forward bond once at its
owner site.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import METROPOLIS_LAZINESS
from .pallas_sweep import _hw_uniform, _interp, _seed_prng
from .pallas_sweep3d import (
    _lane_shift_fns,
    _packed_inv_half_t,
    _per_system_sums,
    pack_rows_3d,
    unpack_rows_3d,
)

__all__ = [
    "diag_kind",
    "pack_factor_diag",
    "pack_coupling_grids_diag",
    "sweep_diag",
    "sweep_diag_fused",
    "sweep_diag_injected",
    "N_COLORS_DIAG",
    "gen_meta",
    "pack_factor_gen",
    "pack_coupling_grids_gen",
    "sweep_gen",
    "sweep_gen_fused",
    "sweep_gen_injected",
    "sweep_gen_halo_color",
    "sweep_gen_halo_color_injected",
    "halo_gen_meta",
]

_BCC = np.array([[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1]])
_FCC = np.array(
    [[1, 1, 0], [1, 0, 1], [0, 1, 1], [1, -1, 0], [1, 0, -1], [0, 1, -1]]
)
N_COLORS_DIAG = {"bcc": 2, "fcc": 4}
_OFFSETS = {"bcc": _BCC, "fcc": _FCC}


def _color_formula(kind, shape):
    i, j, _k = np.indices(shape)
    if kind == "bcc":
        return (i % 2).astype(np.int32)
    return (2 * (i % 2) + j % 2).astype(np.int32)


def diag_kind(lattice):
    """``"bcc"`` / ``"fcc"`` when this kernel family serves the lattice
    (3D, matching named offsets, 8-divisible L0, and a greedy coloring
    equal to the periodic formula the kernel rebuilds from iotas), else
    ``None``."""
    if lattice.n_dims != 3 or lattice.shape[0] % 8:
        return None
    for kind, offs in _OFFSETS.items():
        if lattice.offsets.shape == offs.shape and np.array_equal(
            lattice.offsets, offs
        ):
            break
    else:
        return None
    if lattice.n_colors != N_COLORS_DIAG[kind]:
        return None
    formula = _color_formula(kind, tuple(lattice.shape))
    if not np.array_equal(lattice.colors.reshape(lattice.shape), formula):
        return None
    return kind


def pack_factor_diag(lattice, n_systems) -> int:
    """Lane-pack factor kp >= 1 (0 = kernel unsupported); the
    :func:`.pallas_sweep3d.pack_factor_3d` rules on the BCC/FCC offsets."""
    if diag_kind(lattice) is None:
        return 0
    block = lattice.shape[1] * lattice.shape[2]
    if block < 8:
        return 0
    kp = 128 // math.gcd(128, block)
    return kp if n_systems % kp == 0 else 0


def gen_meta(lattice, max_table=16):
    """Generic-offset kernel metadata, or ``None`` when unsupported.

    The reference runs ANY ``with_offsets`` lattice through one flat
    neighbor-table sweep (geometry/lattice.rs:44, mcmc/sweep.rs:51-97);
    this is the packed-tile counterpart: 2D/3D lattices whose greedy
    coloring is PERIODIC with a small cell (checked against the actual
    greedy coloring, so the kernel's site schedule matches
    :func:`peapods_tpu.ops.sweep.mc_sweep` exactly) and whose offsets fit
    inside the extents.  Named geometries with dedicated kernels take
    precedence in the engine; this is the fallback that keeps custom
    offset tables (e.g. next-nearest-neighbor square) off the jnp path.

    Returns ``(shape3, offsets3, periods, table, n_colors)`` — everything
    static and hashable; 2D lattices are lifted to ``l2 = 1``.
    """
    nd = lattice.n_dims
    if nd not in (2, 3):
        return None
    shape3 = tuple(int(x) for x in lattice.shape) + (1,) * (3 - nd)
    l0, l1, l2 = shape3
    if l0 % 8 or l0 < 2 or l1 < 2 or l1 * l2 < 8:
        return None
    offs = [tuple(int(c) for c in o) + (0,) * (3 - nd)
            for o in lattice.offsets]
    for o in offs:
        if all(c == 0 for c in o):
            return None
        for a, c in enumerate(o):
            # each axis step must stay short of a full wrap, and the
            # repeated stride-1 composition should stay cheap
            if abs(c) >= shape3[a] or abs(c) > 4:
                return None
    cg = np.asarray(lattice.colors).reshape(lattice.shape)
    if nd == 2:
        cg = cg[:, :, None]
    periods = []
    for a in range(3):
        ext = cg.shape[a]
        for p in (1, 2, 3, 4, 8):
            if p <= ext and ext % p == 0 and np.array_equal(
                cg, np.roll(cg, p, axis=a)
            ):
                periods.append(p)
                break
        else:
            return None
    p0, p1, p2 = periods
    if p0 * p1 * p2 > max_table:
        return None
    table = cg[:p0, :p1, :p2]
    n_colors = int(lattice.n_colors)
    if n_colors > max_table:
        return None
    return (
        shape3,
        tuple(offs),
        (p0, p1, p2),
        tuple(int(v) for v in table.reshape(-1)),
        n_colors,
    )


def pack_factor_gen(lattice, n_systems) -> int:
    """Lane-pack factor kp >= 1 for the generic-offset kernel (0 =
    unsupported)."""
    meta = gen_meta(lattice)
    if meta is None:
        return 0
    l0, l1, l2 = meta[0]
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    return kp if n_systems % kp == 0 else 0


def pack_coupling_grids_gen(coup_fwd, lattice, kp):
    """Pre-shifted coupling grids for the generic kernel (the
    :func:`pack_coupling_grids_diag` construction on arbitrary offsets)."""
    meta = gen_meta(lattice)
    (l0, l1, l2), offs = meta[0], meta[1]
    grids = []
    for d, o in enumerate(offs):
        jd = coup_fwd[:, d].reshape(l0, l1, l2)
        bwd = jnp.roll(jd, o, axis=(0, 1, 2))
        grids.append(bwd.reshape(l0, l1 * l2))
        grids.append(jd.reshape(l0, l1 * l2))
    return jnp.tile(jnp.stack(grids), (1, 1, kp))


def pack_coupling_grids_diag(coup_fwd, shape, kind, kp):
    """``f32 [2*n_nb, L0, kp*L1*L2]`` pre-shifted coupling grids.

    ``g[2d][p] = J_d[p - o_d]`` (arriving bond), ``g[2d+1][p] = J_d[p]``
    (own forward bond); lane-packed systems of one realization share the
    couplings, so the grids tile along the lane axis.
    """
    l0, l1, l2 = shape
    offs = _OFFSETS[kind]
    grids = []
    for d in range(offs.shape[0]):
        jd = coup_fwd[:, d].reshape(l0, l1, l2)
        bwd = jnp.roll(jd, tuple(int(x) for x in offs[d]), axis=(0, 1, 2))
        grids.append(bwd.reshape(l0, l1 * l2))
        grids.append(jd.reshape(l0, l1 * l2))
    return jnp.tile(jnp.stack(grids), (1, 1, kp))


def _neighbor_fns(l0, l1, l2, col, block, offsets):
    """Per-offset (fwd, bwd) neighbor-value closures on the packed tile,
    composed from the seam-corrected axis shifts.  ``offsets`` rows are
    ``(di, dj, dk)`` with arbitrary small components: each axis step is the
    stride-1 seam-corrected closure applied ``|c|`` times (each application
    wraps its own axis independently, so compositions stay graph-local)."""
    (jm, jp, km, kp_), _ = _lane_shift_fns(col, block, l1, l2)

    def im(x):  # x[i-1, ...]
        return pltpu.roll(x, 1, 0)

    def ip(x):  # x[i+1, ...]
        return pltpu.roll(x, l0 - 1, 0)

    steps = [(im, ip), (jm, jp), (km, kp_)]

    def axis_step(x, axis, c):
        neg, pos = steps[axis]
        f = pos if c > 0 else neg
        for _ in range(abs(int(c))):
            x = f(x)
        return x

    fns = []
    for off in offsets:
        def make(off=tuple(int(c) for c in off)):
            def fwd(x):  # value at p + o
                for a, c in enumerate(off):
                    if c:
                        x = axis_step(x, a, c)
                return x

            def bwd(x):  # value at p - o
                for a, c in enumerate(off):
                    if c:
                        x = axis_step(x, a, -c)
                return x

            return fwd, bwd

        fns.append(make())
    return fns


def _color_tile(periods, table, row, j_coord, k_coord, l0):
    """Per-site color tile from a periodic color table: ``color[p] =
    table[i % p0, j % p1, k % p2]`` rebuilt from iotas (the generic form of
    the BCC/FCC parity formulas)."""
    p0, p1, p2 = periods
    i_m = jax.lax.rem(jax.lax.rem(row, np.int32(l0)), np.int32(p0))
    j_m = jax.lax.rem(j_coord, np.int32(p1))
    k_m = jax.lax.rem(k_coord, np.int32(p2))
    color = jnp.zeros_like(row)
    for idx, val in enumerate(table):
        a = idx // (p1 * p2)
        b = (idx // p2) % p1
        c = idx % p2
        if val:
            color = jnp.where(
                (i_m == a) & (j_m == b) & (k_m == c), np.int32(val), color
            )
    return color


def _body_diag(s, jg, inv_half_t, uniform_for_color, *, gibbs, kind, l0, l1,
               l2, with_energy=False, offsets=None, periods=None,
               table=None, n_colors=None):
    """Multicolor update of one ``[L0, kp*L1*L2]`` tile.

    ``with_energy=True`` additionally returns the per-site positive
    forward-bond energy contributions of the post-sweep state (each
    forward bond counted once at its owner site), which the caller
    reduces per packed system.

    ``kind`` is ``"bcc"``/``"fcc"`` (named offsets + parity-formula
    colors) or ``"gen"`` (arbitrary ``offsets`` with the periodic color
    ``table`` of period ``periods`` — the reference's generic table-lookup
    sweep, mcmc/sweep.rs:51-97, as composed seam-corrected shifts).
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    rows, lanes = s.shape
    block = l1 * l2
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    cb = col % block
    j_coord = cb // l2
    if kind == "bcc":
        color = row & 1
        offsets = _OFFSETS[kind]
        n_colors = N_COLORS_DIAG[kind]
    elif kind == "fcc":
        color = 2 * (row & 1) + (j_coord & 1)
        offsets = _OFFSETS[kind]
        n_colors = N_COLORS_DIAG[kind]
    else:
        k_coord = cb % l2
        color = _color_tile(periods, table, row, j_coord, k_coord, l0)
    fns = _neighbor_fns(l0, l1, l2, col, block, offsets)

    for c in range(n_colors):
        field = jnp.zeros_like(s)
        for d, (fwd, bwd) in enumerate(fns):
            field = field + bwd(s) * jg[2 * d] + fwd(s) * jg[2 * d + 1]
        x = -s * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (color == c)
        s = jnp.where(flip, -s, s)
    if with_energy:
        e_site = jnp.zeros_like(s)
        for d, (fwd, _bwd) in enumerate(fns):
            e_site = e_site + fwd(s) * jg[2 * d + 1]
        return s, s * e_site
    return s


def _kernel_diag(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *,
                 gibbs, kind, l0, l1, l2, kp, gen=None):
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, grp)
    s = spins_ref[0, 0].astype(jnp.float32)
    rows, lanes = s.shape
    block = l1 * l2
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[d_idx, grp * kp + c],
        rows, lanes, l0, block, kp, 1,
    )
    gen_kw = {} if gen is None else dict(
        offsets=gen[0], periods=gen[1], table=gen[2], n_colors=gen[3]
    )
    out_ref[0, 0] = _body_diag(
        s, jgrids_ref[0], inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, kind=kind, l0=l0, l1=l1, l2=l2, **gen_kw,
    ).astype(jnp.int8)


def _kernel_diag_fused(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref,
                       e_ref, m_ref, *, gibbs, kind, l0, l1, l2, kp,
                       n_spins, gen=None):
    """Sweep + fused per-system energy/magnetization (same contract as the
    other fused sweep kernels: no cluster update between sweep and
    measurement)."""
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, grp)
    s = spins_ref[0, 0].astype(jnp.float32)
    rows, lanes = s.shape
    block = l1 * l2
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[d_idx, grp * kp + c],
        rows, lanes, l0, block, kp, 1,
    )
    gen_kw = {} if gen is None else dict(
        offsets=gen[0], periods=gen[1], table=gen[2], n_colors=gen[3]
    )
    s, e_site = _body_diag(
        s, jgrids_ref[0], inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, kind=kind, l0=l0, l1=l1, l2=l2, with_energy=True,
        **gen_kw,
    )
    out_ref[0, 0] = s.astype(jnp.int8)
    e_sys = _per_system_sums(e_site, l0, block, kp, 1)
    m_sys = _per_system_sums(s, l0, block, kp, 1)
    for c in range(kp):
        e_ref[d_idx, grp * kp + c] = e_sys[c] / np.float32(n_spins)
        m_ref[d_idx, grp * kp + c] = m_sys[c].astype(jnp.int32)


def _diag_call(kernel, spins, jgrids, sys_temps, seeds, shape, kp,
               extra_out=(), interpret=False):
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    n_d, n_systems = spins.shape[:2]
    g = n_systems // kp
    n_grids = jgrids.shape[1]
    packed = jax.vmap(lambda s: pack_rows_3d(s, l0, block, kp, 1))(spins)
    out_specs = pl.BlockSpec((1, 1, l0, lanes), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_d, g, l0, lanes), jnp.int8)
    if extra_out:
        out_specs = (out_specs,) + tuple(
            pl.BlockSpec(memory_space=pltpu.SMEM) for _ in extra_out
        )
        out_shape = (out_shape,) + tuple(extra_out)
    out = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, l0, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_grids, l0, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(seeds, sys_temps, packed, jgrids)
    unpack = lambda o: jax.vmap(
        lambda x: unpack_rows_3d(x, l0, block, kp, 1)
    )(o)
    if extra_out:
        return (unpack(out[0]),) + tuple(out[1:])
    return unpack(out)


@functools.partial(
    jax.jit, static_argnames=("shape", "kind", "kp", "gibbs", "interpret")
)
def sweep_diag(spins, jgrids, sys_temps, seeds, *, shape, kind, kp,
               gibbs=False, interpret=False):
    """Full multicolor BCC/FCC sweep of every (realization, system).

    Args:
        spins: ``int8 [n_disorder, n_systems, n_spins]`` (n_systems % kp
            == 0).
        jgrids: ``f32 [n_disorder, 2*n_nb, L0, kp*L1*L2]``
            (:func:`pack_coupling_grids_diag`).
        sys_temps: ``f32 [n_disorder, n_systems]``.
        seeds: ``int32 [n_disorder, 2*n_groups]``
            (:func:`.pallas_sweep.make_seeds`).
        shape: static ``(L0, L1, L2)``; kind: ``"bcc"`` / ``"fcc"``.
    """
    l0, l1, l2 = shape
    kernel = functools.partial(
        _kernel_diag, gibbs=gibbs, kind=kind, l0=l0, l1=l1, l2=l2, kp=kp
    )
    return _diag_call(kernel, spins, jgrids, sys_temps, seeds, shape, kp,
                      interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("shape", "kind", "kp", "gibbs", "interpret")
)
def sweep_diag_fused(spins, jgrids, sys_temps, seeds, *, shape, kind, kp,
                     gibbs=False, interpret=False):
    """Sweep + measurement in one kernel; returns ``(spins, e, m)`` like
    the other fused sweep kernels (e normalized per spin)."""
    l0, l1, l2 = shape
    n_d, n_systems = spins.shape[:2]
    kernel = functools.partial(
        _kernel_diag_fused, gibbs=gibbs, kind=kind, l0=l0, l1=l1, l2=l2,
        kp=kp, n_spins=l0 * l1 * l2,
    )
    extra = (
        jax.ShapeDtypeStruct((n_d, n_systems), jnp.float32),
        jax.ShapeDtypeStruct((n_d, n_systems), jnp.int32),
    )
    return _diag_call(kernel, spins, jgrids, sys_temps, seeds, shape, kp,
                      extra_out=extra, interpret=interpret)


def sweep_diag_injected(spins, jgrids, sys_temps, uniforms, *, shape, kind,
                        kp, gibbs=False, interpret=False):
    """Test-only variant with caller-supplied uniforms (``f32 [g, n_colors,
    L0, kp*block]`` packed like the spins); single realization."""
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    n_systems = spins.shape[0]
    g = n_systems // kp
    n_colors = N_COLORS_DIAG[kind]
    n_grids = jgrids.shape[0]

    def kernel(temp_ref, spins_ref, jg_ref, u_ref, out_ref):
        grp = pl.program_id(1)
        s = spins_ref[0, 0].astype(jnp.float32)
        inv_half_t = _packed_inv_half_t(
            lambda c: temp_ref[0, grp * kp + c],
            l0, lanes, l0, block, kp, 1,
        )
        out_ref[0, 0] = _body_diag(
            s, jg_ref[0], inv_half_t, lambda c: u_ref[0, 0, c],
            gibbs=gibbs, kind=kind, l0=l0, l1=l1, l2=l2,
        ).astype(jnp.int8)

    packed = pack_rows_3d(spins, l0, block, kp, 1)[None]
    band = pl.BlockSpec((1, 1, l0, lanes), lambda d, i: (d, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(1, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band,
            pl.BlockSpec((1, n_grids, l0, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_colors, l0, lanes),
                         lambda d, i: (d, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((1, g, l0, lanes), jnp.int8),
        interpret=_interp(interpret),
    )(sys_temps[None], packed, jgrids[None], uniforms[None])
    return unpack_rows_3d(out[0], l0, block, kp, 1)


# ------------------------------------------------- generic-offset kernel

@functools.partial(
    jax.jit,
    static_argnames=("shape", "gen", "kp", "gibbs", "interpret"),
)
def sweep_gen(spins, jgrids, sys_temps, seeds, *, shape, gen, kp,
              gibbs=False, interpret=False):
    """Full multicolor sweep for an ARBITRARY offset table (the reference's
    generic neighbor-table sweep, mcmc/sweep.rs:51-97).

    ``gen`` = ``(offsets3, periods, table, n_colors)`` from
    :func:`gen_meta` (items 1-4); ``shape`` the lifted 3-axis shape.
    Everything else matches :func:`sweep_diag`.
    """
    l0, l1, l2 = shape
    kernel = functools.partial(
        _kernel_diag, gibbs=gibbs, kind="gen", l0=l0, l1=l1, l2=l2, kp=kp,
        gen=gen,
    )
    return _diag_call(kernel, spins, jgrids, sys_temps, seeds, shape, kp,
                      interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("shape", "gen", "kp", "gibbs", "interpret"),
)
def sweep_gen_fused(spins, jgrids, sys_temps, seeds, *, shape, gen, kp,
                    gibbs=False, interpret=False):
    """Generic-offset sweep + fused (e, m); returns ``(spins, e, m)``."""
    l0, l1, l2 = shape
    n_d, n_systems = spins.shape[:2]
    kernel = functools.partial(
        _kernel_diag_fused, gibbs=gibbs, kind="gen", l0=l0, l1=l1, l2=l2,
        kp=kp, n_spins=l0 * l1 * l2, gen=gen,
    )
    extra = (
        jax.ShapeDtypeStruct((n_d, n_systems), jnp.float32),
        jax.ShapeDtypeStruct((n_d, n_systems), jnp.int32),
    )
    return _diag_call(kernel, spins, jgrids, sys_temps, seeds, shape, kp,
                      extra_out=extra, interpret=interpret)


def sweep_gen_injected(spins, jgrids, sys_temps, uniforms, *, shape, gen,
                       kp, gibbs=False, interpret=False):
    """Test-only generic-offset variant with caller-supplied uniforms
    (``f32 [g, n_colors, L0, kp*block]`` packed like the spins); single
    realization."""
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    n_systems = spins.shape[0]
    g = n_systems // kp
    n_colors = gen[3]
    n_grids = jgrids.shape[0]

    def kernel(temp_ref, spins_ref, jg_ref, u_ref, out_ref):
        grp = pl.program_id(1)
        s = spins_ref[0, 0].astype(jnp.float32)
        inv_half_t = _packed_inv_half_t(
            lambda c: temp_ref[0, grp * kp + c],
            l0, lanes, l0, block, kp, 1,
        )
        out_ref[0, 0] = _body_diag(
            s, jg_ref[0], inv_half_t, lambda c: u_ref[0, 0, c],
            gibbs=gibbs, kind="gen", l0=l0, l1=l1, l2=l2,
            offsets=gen[0], periods=gen[1], table=gen[2], n_colors=gen[3],
        ).astype(jnp.int8)

    packed = pack_rows_3d(spins, l0, block, kp, 1)[None]
    band = pl.BlockSpec((1, 1, l0, lanes), lambda d, i: (d, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(1, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band,
            pl.BlockSpec((1, n_grids, l0, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_colors, l0, lanes),
                         lambda d, i: (d, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((1, g, l0, lanes), jnp.int8),
        interpret=_interp(interpret),
    )(sys_temps[None], packed, jgrids[None], uniforms[None])
    return unpack_rows_3d(out[0], l0, block, kp, 1)


# ----------------------------------------- generic halo (space-mesh) kernel

def halo_gen_meta(lattice, n_systems, n_shards):
    """Generic halo-kernel metadata ``(meta, m)`` or ``None``: serves ANY
    gen_meta-supported lattice under a ``space`` mesh (triangular, BCC,
    FCC, custom offsets) when the band tiles need no lane packing
    (``block % 128 == 0``), rows split into whole 8-aligned bands, and the
    halo depth ``m = max |offset[0]|`` stays within one neighbor band."""
    meta = gen_meta(lattice)
    if meta is None:
        return None
    (l0, l1, l2), offs = meta[0], meta[1]
    block = l1 * l2
    if block % 128:
        return None  # lane-packed halo variant not built (kp must be 1)
    if l0 % n_shards:
        return None
    hl = l0 // n_shards
    m = max(abs(o[0]) for o in offs)
    if m == 0:
        return None  # no cross-band offsets: the plain gen kernel serves
    if hl % 8 or hl < m:
        return None
    del n_systems
    return meta, m


def _kernel_gen_halo(seed_ref, temp_ref, off_ref, sext_ref, jg_ref, out_ref,
                     *, gibbs, gen, color, m, hl, l0, l1, l2,
                     u_injected=False, u_ref=None):
    """Single-color pass over one system's EXTENDED row band (band + m halo
    rows per side, concatenated by the engine after its ``ppermute`` ring).

    Row steps are plain rolls — the extended tile is a contiguous global
    row window, so a roll only wraps garbage into the halo rows, whose
    coupling grids are zero-padded and whose output rows the engine
    discards.  Lane steps are the seam-corrected stride-1 closures applied
    ``|c|`` times (the generic-offset composition).  The color table is
    evaluated at GLOBAL row indices (``off`` = the band's first global
    row), so the multicolor schedule is globally consistent — the
    space-mesh counterpart of :func:`sweep_gen` (one color per call; later
    colors must see earlier colors' cross-shard updates via fresh halos).
    """
    offsets, periods, table, _n_colors = gen
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    if not u_injected:
        _seed_prng(seed_ref, d_idx, sys_idx)
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = sext_ref[0, 0].astype(jnp.float32)  # [hl + 2m, block]
    jg = jg_ref[0]  # [2*n_nb, hl + 2m, block] (halo rows zero)
    rows_e, block = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows_e, block), 1)
    (jm, jp, km, kp_) , _ = _lane_shift_fns(col, block, l1, l2)

    def axis_step(x, axis, c):
        if axis == 0:
            return pltpu.roll(x, (-c) % rows_e, 0)
        fns = [(jm, jp), (km, kp_)][axis - 1]
        f = fns[1] if c > 0 else fns[0]
        for _ in range(abs(int(c))):
            x = f(x)
        return x

    def shift(x, off, sign):
        for a, c in enumerate(off):
            if c:
                x = axis_step(x, a, sign * int(c))
        return x

    field = jnp.zeros_like(s)
    for d, o in enumerate(offsets):
        field = field + shift(s, o, -1) * jg[2 * d] + shift(s, o, 1) * jg[
            2 * d + 1
        ]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows_e, block), 0)
    i_glob = row - np.int32(m) + off_ref[0, 0]
    # halo rows see i_glob in [-m, 0) / [L0_band, ...): wrap into [0, L0)
    i_glob = jax.lax.rem(i_glob + np.int32(l0), np.int32(l0))
    cb = col % np.int32(block)
    j_coord = cb // np.int32(l2)
    k_coord = jax.lax.rem(cb, np.int32(l2))
    ctile = _color_tile(periods, table, i_glob, j_coord, k_coord, l0)
    x = -s * field * inv_half_t
    u = u_ref[0, 0] if u_injected else _hw_uniform(s.shape)
    if gibbs:
        p = jax.nn.sigmoid(x)
    else:
        p = keep * jnp.exp(jnp.minimum(x, 0.0))
    flip = (u < p) & (ctile == color)
    out_ref[0, 0] = jnp.where(flip, -s, s).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape_local", "gen", "color", "m", "gibbs", "interpret"
    ),
)
def sweep_gen_halo_color(sext, jgrids_ext, sys_temps, seeds, off, *,
                         shape_local, gen, color, m, gibbs=False,
                         interpret=False):
    """One generic-offset color pass over every (realization, system)'s
    extended local row band.

    Args:
        sext: ``int8 [n_d, n_systems, Hl + 2m, block]`` extended band.
        jgrids_ext: ``f32 [n_d, 2*n_nb, Hl + 2m, block]`` local pre-shifted
            coupling grids, zero at the halo rows.
        off: ``int32 [1, 1]`` global first-row index of the band.
        shape_local: ``(Hl, l0_global, l1, l2)``.
        gen: ``(offsets3, periods, table, n_colors)`` from
            :func:`gen_meta`.
    """
    hl, l0, l1, l2 = shape_local
    block = l1 * l2
    rows_e = hl + 2 * m
    n_d, n_systems = sext.shape[:2]
    kernel = functools.partial(
        _kernel_gen_halo, gibbs=gibbs, gen=gen, color=color, m=m, hl=hl,
        l0=l0, l1=l1, l2=l2,
    )
    band_spec = pl.BlockSpec((1, 1, rows_e, block), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    n_grids = jgrids_ext.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band_spec,
            pl.BlockSpec((1, n_grids, rows_e, block),
                         lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_d, n_systems, rows_e, block), jnp.int8
        ),
        interpret=_interp(interpret),
    )(seeds, sys_temps, off, sext, jgrids_ext)


def sweep_gen_halo_color_injected(sext, jgrids_ext, sys_temps, uniforms,
                                  off, *, shape_local, gen, color, m,
                                  gibbs=False, interpret=False):
    """Test-only halo-color pass with caller-supplied uniforms
    (``f32 [n_systems, Hl + 2m, block]``); single realization."""
    hl, l0, l1, l2 = shape_local
    block = l1 * l2
    rows_e = hl + 2 * m
    n_systems = sext.shape[0]
    kernel = functools.partial(
        _kernel_gen_halo, gibbs=gibbs, gen=gen, color=color, m=m, hl=hl,
        l0=l0, l1=l1, l2=l2, u_injected=True,
    )

    def wrapped(seed_ref, temp_ref, off_ref, sext_ref, jg_ref, u_ref,
                out_ref):
        kernel(seed_ref, temp_ref, off_ref, sext_ref, jg_ref, out_ref,
               u_ref=u_ref)

    band_spec = pl.BlockSpec((1, 1, rows_e, block), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    n_grids = jgrids_ext.shape[0]
    out = pl.pallas_call(
        wrapped,
        grid=(1, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band_spec,
            pl.BlockSpec((1, n_grids, rows_e, block),
                         lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            band_spec,
        ],
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct(
            (1, n_systems, rows_e, block), jnp.int8
        ),
        interpret=_interp(interpret),
    )(
        jnp.zeros((1, 2 * n_systems), jnp.int32),
        sys_temps[None],
        off,
        sext[None],
        jgrids_ext[None],
        uniforms[None],
    )
    return out[0]
