"""Pallas TPU kernel: fused 4-color Metropolis/Gibbs sweep (triangular lattices).

The reference runs its generic-lattice sweep at native speed through flat
neighbor-table lookups (``/root/reference/spin-sim/src/mcmc/sweep.rs:51-97``
with the triangular offsets from ``geometry/offsets.rs:4-20``); the TPU
answer keeps the roll-stencil kernel design of :mod:`.pallas_sweep` and adds
the one diagonal neighbor the triangular offsets ``[[1,0],[0,1],[1,-1]]``
introduce.  Six pre-shifted coupling grids make the body pure elementwise
work over ``[H, W]`` tiles:

    g0[i,j] = J0[i-1,j]    (bond arriving from above)
    g1[i,j] = J0[i,j]      (forward bond down)
    g2[i,j] = J1[i,j-1]    (from the left)
    g3[i,j] = J1[i,j]      (forward right)
    g4[i,j] = J2[i-1,j+1]  (from the upper-right: that site's forward [1,-1])
    g5[i,j] = J2[i,j]      (forward down-left)

The site schedule matches :func:`peapods_tpu.ops.sweep.mc_sweep` exactly: the
greedy coloring of the triangular bond graph on even extents is the periodic
4-coloring ``color = 2*(row % 2) + col % 2`` (asserted in :func:`_is_tri`, so
a lattice whose greedy coloring ever deviates simply skips this kernel), and
one sweep is one masked pass per color with a fresh uniform grid each pass.
Acceptance is the shared lazy-Metropolis / Gibbs rule (see
:mod:`peapods_tpu.ops.sweep` for the laziness proof).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import METROPOLIS_LAZINESS
from .pallas_sweep import _hw_uniform, _interp, _seed_prng

__all__ = [
    "supports_tri",
    "pack_factor_tri",
    "pack_coupling_grids_tri",
    "pack_coupling_grids_tri_packed",
    "sweep_tri",
    "sweep_tri_fused",
    "sweep_tri_packed",
    "sweep_tri_injected",
    "sweep_tri_packed_injected",
    "N_COLORS_TRI",
]

N_COLORS_TRI = 4

_TRI_OFFSETS = np.asarray([[1, 0], [0, 1], [1, -1]], dtype=np.int64)


def _is_tri(lattice) -> bool:
    """2D triangular (offsets ``[[1,0],[0,1],[1,-1]]``) with even, TPU-tileable
    extents whose greedy coloring is the periodic 4-coloring the kernel
    rebuilds from iotas."""
    if not (
        lattice.n_dims == 2
        and lattice.n_neighbors == 3
        and lattice.offsets.shape == _TRI_OFFSETS.shape
        and np.array_equal(lattice.offsets, _TRI_OFFSETS)
        and lattice.shape[0] % 8 == 0
        and lattice.shape[0] % 2 == 0
        and lattice.shape[1] % 2 == 0
    ):
        return False
    if lattice.n_colors != N_COLORS_TRI:
        return False
    h, w = lattice.shape
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    formula = (2 * (rows % 2) + cols % 2).astype(np.int32)
    return np.array_equal(lattice.colors.reshape(h, w), formula)


def supports_tri(lattice) -> bool:
    """Direct-kernel applicability: triangular with full-lane width."""
    return _is_tri(lattice) and lattice.shape[1] % 128 == 0


def pack_factor_tri(lattice, n_systems) -> int:
    """Systems packed per lane group for narrow triangular lattices
    (0 = unsupported); same rules as :func:`.pallas_sweep.pack_factor`."""
    if not _is_tri(lattice):
        return 0
    w = lattice.shape[1]
    if w >= 128 or w < 8 or 128 % w != 0:
        return 0
    k = 128 // w
    return k if n_systems % k == 0 else 0


def pack_coupling_grids_tri(coup_fwd, shape):
    """``[6, H, W]`` pre-shifted coupling grids from ``coup_fwd
    [n_spins, 3]`` (module docstring layout)."""
    h, w = shape
    j0 = coup_fwd[:, 0].reshape(h, w)
    j1 = coup_fwd[:, 1].reshape(h, w)
    j2 = coup_fwd[:, 2].reshape(h, w)
    return jnp.stack(
        [
            jnp.roll(j0, 1, axis=0),
            j0,
            jnp.roll(j1, 1, axis=1),
            j1,
            jnp.roll(jnp.roll(j2, 1, axis=0), -1, axis=1),
            j2,
        ]
    )


def pack_coupling_grids_tri_packed(coup_fwd, shape, k):
    """``f32 [6, H, k*W]``: tiled per-system pre-shifted coupling grids."""
    return jnp.tile(pack_coupling_grids_tri(coup_fwd, shape), (1, 1, k))


def _kernel_body_tri(s, jg, inv_half_t, uniform_for_color, *, gibbs,
                     with_energy=False):
    """Shared 4-color update; ``uniform_for_color(c)`` supplies u per pass.

    ``with_energy=True`` additionally returns the positive forward-bond
    energy sum of the post-sweep state (three extra rolls over the final
    spins: every site owns its down / right / down-left forward bonds, so
    summing ``s * (down*g1 + right*g3 + dl*g5)`` counts each bond once).
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    h_dim, w_dim = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 1)
    color = 2 * (row & 1) + (col & 1)

    for c in range(N_COLORS_TRI):
        up = pltpu.roll(s, 1, 0)
        down = pltpu.roll(s, h_dim - 1, 0)
        field = (
            up * jg[0]
            + down * jg[1]
            + pltpu.roll(s, 1, 1) * jg[2]
            + pltpu.roll(s, w_dim - 1, 1) * jg[3]
            + pltpu.roll(up, w_dim - 1, 1) * jg[4]
            + pltpu.roll(down, 1, 1) * jg[5]
        )
        x = -s * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (color == c)
        s = jnp.where(flip, -s, s)
    if with_energy:
        down = pltpu.roll(s, h_dim - 1, 0)
        e_tot = (
            s
            * (
                down * jg[1]
                + pltpu.roll(s, w_dim - 1, 1) * jg[3]
                + pltpu.roll(down, 1, 1) * jg[5]
            )
        ).sum()
        return s, e_tot
    return s


def _kernel_tri(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *, gibbs):
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, sys_idx)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = spins_ref[0, 0].astype(jnp.float32)
    out_ref[0, 0] = _kernel_body_tri(
        s, jgrids_ref[0], inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs,
    ).astype(jnp.int8)


def _kernel_tri_fused(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref,
                      e_ref, m_ref, *, gibbs):
    """Sweep + fused energy/magnetization (same contract as
    :func:`.pallas_sweep._kernel_fused`: only valid when no cluster update
    runs between sweep and measurement)."""
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, sys_idx)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = spins_ref[0, 0].astype(jnp.float32)
    h_dim, w_dim = s.shape
    s, e_tot = _kernel_body_tri(
        s, jgrids_ref[0], inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, with_energy=True,
    )
    out_ref[0, 0] = s.astype(jnp.int8)
    e_ref[d_idx, sys_idx] = e_tot / (h_dim * w_dim)
    m_ref[d_idx, sys_idx] = s.sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("shape", "gibbs", "interpret"))
def sweep_tri(spins, jgrids, sys_temps, seeds, *, shape, gibbs=False,
              interpret=False):
    """Full 4-color sweep of every (realization, system).

    Args:
        spins: ``int8 [n_disorder, n_systems, n_spins]``.
        jgrids: ``f32 [n_disorder, 6, H, W]`` (:func:`pack_coupling_grids_tri`).
        sys_temps: ``f32 [n_disorder, n_systems]``.
        seeds: ``int32 [n_disorder, 2*n_systems]``
            (:func:`.pallas_sweep.make_seeds`).
        shape: static ``(H, W)``.
    """
    h, w = shape
    n_d, n_systems = spins.shape[:2]
    s4 = spins.reshape(n_d, n_systems, h, w)
    out = pl.pallas_call(
        functools.partial(_kernel_tri, gibbs=gibbs),
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, h, w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_d, n_systems, h, w), jnp.int8),
        interpret=_interp(interpret),
    )(seeds, sys_temps, s4, jgrids)
    return out.reshape(n_d, n_systems, h * w)


@functools.partial(jax.jit, static_argnames=("shape", "gibbs", "interpret"))
def sweep_tri_fused(spins, jgrids, sys_temps, seeds, *, shape, gibbs=False,
                    interpret=False):
    """Sweep + measurement in one kernel; returns ``(spins, e, m)`` like
    :func:`.pallas_sweep.sweep_2d_fused`."""
    h, w = shape
    n_d, n_systems = spins.shape[:2]
    s4 = spins.reshape(n_d, n_systems, h, w)
    out, e, m = pl.pallas_call(
        functools.partial(_kernel_tri_fused, gibbs=gibbs),
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, h, w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_d, n_systems, h, w), jnp.int8),
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.float32),
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.int32),
        ),
        interpret=_interp(interpret),
    )(seeds, sys_temps, s4, jgrids)
    return out.reshape(n_d, n_systems, h * w), e, m


def _packed_body_tri(s, jg, inv_half_t, uniform_for_color, *, gibbs, w):
    """4-color update over k lane-packed systems (column c belongs to system
    ``g*k + c // w`` at lattice column ``c % w``); the left/right and
    diagonal rolls correct the periodic wrap at the internal seams."""
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    h_dim, kw = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 1)
    color = 2 * (row & 1) + ((col % w) & 1)
    at_left_edge = (col % w) == 0
    at_right_edge = (col % w) == (w - 1)

    def lane_left(x):
        base = pltpu.roll(x, 1, 1)
        wrap = pltpu.roll(x, kw - (w - 1), 1)
        return jnp.where(at_left_edge, wrap, base)

    def lane_right(x):
        base = pltpu.roll(x, kw - 1, 1)
        wrap = pltpu.roll(x, w - 1, 1)
        return jnp.where(at_right_edge, wrap, base)

    for c in range(N_COLORS_TRI):
        up = pltpu.roll(s, 1, 0)
        down = pltpu.roll(s, h_dim - 1, 0)
        field = (
            up * jg[0]
            + down * jg[1]
            + lane_left(s) * jg[2]
            + lane_right(s) * jg[3]
            + lane_right(up) * jg[4]
            + lane_left(down) * jg[5]
        )
        x = -s * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (color == c)
        s = jnp.where(flip, -s, s)
    return s


def _packed_kernel_tri(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *,
                       gibbs, w, k):
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    # the k packed systems of one group share this stream (lanes still draw
    # i.i.d. uniforms; packed-vs-unpacked equivalence is statistical, like
    # .pallas_sweep._packed_kernel)
    _seed_prng(seed_ref, d_idx, grp)
    s = spins_ref[0, 0].astype(jnp.float32)  # [H, k*w]
    h_dim, kw = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 1)
    inv_half_t = jnp.zeros((h_dim, kw), jnp.float32)
    for j in range(k):
        t_j = temp_ref[d_idx, grp * k + j]
        inv_half_t = jnp.where((col // w) == j, 1.0 / (0.5 * t_j), inv_half_t)
    out_ref[0, 0] = _packed_body_tri(
        s, jgrids_ref[0], inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, w=w,
    ).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("shape", "k", "gibbs", "interpret"))
def sweep_tri_packed(spins, jgrids, sys_temps, seeds, *, shape, k,
                     gibbs=False, interpret=False):
    """4-color sweep with ``k`` systems lane-packed per kernel instance
    (layout contract identical to :func:`.pallas_sweep.sweep_2d_packed`)."""
    from .pallas_sweep import pack_spins, unpack_spins

    h, w = shape
    n_d, n_systems = spins.shape[:2]
    g = n_systems // k
    packed = jax.vmap(lambda s: pack_spins(s, shape, k))(spins)
    out = pl.pallas_call(
        functools.partial(_packed_kernel_tri, gibbs=gibbs, w=w, k=k),
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, h, k * w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, k * w), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_d, g, h, k * w), jnp.int8),
        interpret=_interp(interpret),
    )(seeds, sys_temps, packed, jgrids)
    return jax.vmap(lambda o: unpack_spins(o, shape, k))(out)


def _kernel_tri_injected(temp_ref, spins_ref, jgrids_ref, u_ref, out_ref, *,
                         gibbs):
    """Test-only variant: acceptance uniforms supplied by the caller."""
    sys_idx = pl.program_id(0)
    inv_half_t = 1.0 / (0.5 * temp_ref[sys_idx])
    s = spins_ref[0].astype(jnp.float32)
    out_ref[0] = _kernel_body_tri(
        s, jgrids_ref, inv_half_t, lambda c: u_ref[0, c], gibbs=gibbs
    ).astype(jnp.int8)


def sweep_tri_injected(spins, jgrids, sys_temps, uniforms, *, shape,
                       gibbs=False, interpret=False):
    """Kernel-equivalence entry: uniforms ``f32 [n_systems, 4, H, W]``."""
    h, w = shape
    n_systems = spins.shape[0]
    s3 = spins.reshape(n_systems, h, w)
    out = pl.pallas_call(
        functools.partial(_kernel_tri_injected, gibbs=gibbs),
        grid=(n_systems,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, h, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_COLORS_TRI, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_systems, h, w), jnp.int8),
        interpret=interpret,
    )(sys_temps, s3, jgrids, uniforms)
    return out.reshape(n_systems, h * w)


def _packed_kernel_tri_injected(temp_ref, spins_ref, jgrids_ref, u_ref,
                                out_ref, *, gibbs, w, k):
    grp = pl.program_id(0)
    s = spins_ref[0].astype(jnp.float32)
    h_dim, kw = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 1)
    inv_half_t = jnp.zeros((h_dim, kw), jnp.float32)
    for j in range(k):
        t_j = temp_ref[grp * k + j]
        inv_half_t = jnp.where((col // w) == j, 1.0 / (0.5 * t_j), inv_half_t)
    out_ref[0] = _packed_body_tri(
        s, jgrids_ref, inv_half_t, lambda c: u_ref[0, c], gibbs=gibbs, w=w
    ).astype(jnp.int8)


def sweep_tri_packed_injected(spins, jgrids, sys_temps, uniforms, *, shape, k,
                              gibbs=False, interpret=False):
    """Test-only packed entry: uniforms ``f32 [n_groups, 4, H, k*W]`` in the
    PACKED layout (the caller packs its per-system uniform grids with
    :func:`.pallas_sweep.pack_spins`-style tiling); single realization."""
    from .pallas_sweep import pack_spins, unpack_spins

    h, w = shape
    n_systems = spins.shape[0]
    g = n_systems // k
    packed = pack_spins(spins, shape, k)
    out = pl.pallas_call(
        functools.partial(_packed_kernel_tri_injected, gibbs=gibbs, w=w, k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, k * w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, h, k * w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_COLORS_TRI, h, k * w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, k * w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, h, k * w), jnp.int8),
        interpret=interpret,
    )(sys_temps, packed, jgrids, uniforms)
    return unpack_spins(out, shape, k)
