"""Pallas TPU kernel: fused checkerboard Metropolis/Gibbs sweep, 3D lattices.

Gives the spin-glass flagship configs (8^3 +-J, 16^3 Gaussian — the
reference's main workload, tests/spin_glass_crossings.py and
overlap_histogram.py) a dedicated fast path, like the reference gives its
dominant workload the square-lattice fast path (mcmc/sweep.rs:22-97).

Layout: a ``[L0, L1, L2]`` lattice maps to a ``[L0, kp*L1*L2]`` tile — the
first axis on sublanes, the (j, k) plane flattened j-major onto lanes, and
``kp`` systems lane-packed side by side when one system cannot fill the
128-lane requirement (8^3 has 64 lane columns -> kp = 2).  Neighbor fields
are lane rolls with seam corrections:

    i +- 1: sublane roll (always periodic — the sublane axis is one system's
            full i extent)
    j +- 1: lane roll by L2; at j-extremes the roll crosses a block seam, so
            the wrapped value is taken from a (L1-1)*L2 roll instead
    k +- 1: lane roll by 1; at k-extremes the wrap comes from a (L2-1) roll

Couplings arrive as six pre-shifted grids (bond from the -d neighbor, own
forward bond, for d = i, j, k); acceptance matches
:mod:`peapods_tpu.ops.sweep` exactly (lazy Metropolis / Gibbs on 24-bit
hardware-PRNG uniforms).
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

__all__ = [
    "supports_3d",
    "pack_factor_3d",
    "row_pack_3d",
    "pack_coupling_grids_3d",
    "sweep_3d",
    "sweep_3d_fused",
    "sweep_3d_injected",
    "halo_pack_3d",
    "sweep_3d_halo_color",
    "sweep_3d_halo_color_injected",
]

_HYPERCUBIC_3D = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]])


def supports_3d(lattice) -> bool:
    return (
        lattice.n_dims == 3
        and lattice.n_neighbors == 3
        and np.array_equal(lattice.offsets, _HYPERCUBIC_3D)
        and lattice.shape[0] % 8 == 0
    )


def pack_factor_3d(lattice, n_systems) -> int:
    """Lane-pack factor kp >= 1 (0 = kernel unsupported).

    kp is the smallest count making ``kp * L1 * L2`` a multiple of 128 lanes;
    the system count must split into kp-groups.
    """
    if not supports_3d(lattice):
        return 0
    block = lattice.shape[1] * lattice.shape[2]
    if block < 8:
        return 0
    kp = 128 // math.gcd(128, block)
    return kp if n_systems % kp == 0 else 0


def row_pack_3d(lattice, n_systems, kp) -> int:
    """Sublane-pack factor ks >= 1: systems stacked vertically per instance.

    Small lattices leave each kernel-grid step with tiny tiles (8^3 -> one
    [8, 128] tile per 2 systems), so per-step pipeline overhead dominates
    the sweep.  Stacking ks lane-groups on the sublane axis (seam-corrected
    i rolls) fattens the tile to [ks*L0, kp*L1*L2] and divides the grid
    step count by ks.

    Only applied when one system occupies a single 128-lane tile: wider
    lattices (16^3 -> [16, 256] tiles) are already pipeline-efficient, and
    the per-sweep pack/unpack transposes the row stacking needs cost more
    than the kernel saves (measured: 16^3 config 4.43 -> 6.43 ms/sweep).
    """
    if kp == 0:
        return 0
    if kp * lattice.shape[1] * lattice.shape[2] != 128:
        return 1
    groups = n_systems // kp
    ks = max(1, 128 // lattice.shape[0])
    while ks > 1 and groups % ks:
        ks -= 1
    return ks


def pack_rows_3d(spins, l0, block, kp, ks):
    """``int8 [S, n_spins] -> [S/(kp*ks), ks*L0, kp*block]``: lane-pack kp
    systems, then stack ks lane-groups vertically (system ``g*kp*ks + b*kp
    + c`` sits at rows ``[b*L0, (b+1)*L0)``, lanes ``[c*block, (c+1)*block)``)."""
    g = spins.shape[0] // (kp * ks)
    return (
        spins.reshape(g, ks, kp, l0, block)
        .transpose(0, 1, 3, 2, 4)
        .reshape(g, ks * l0, kp * block)
    )


def unpack_rows_3d(packed, l0, block, kp, ks):
    g = packed.shape[0]
    return (
        packed.reshape(g, ks, l0, kp, block)
        .transpose(0, 1, 3, 2, 4)
        .reshape(g * ks * kp, l0 * block)
    )


def pack_coupling_grids_3d(coup_fwd, shape, kp, ks=1):
    """``f32 [6, ks*L0, kp*L1*L2]`` pre-shifted coupling grids.

    Order: (i-from-above, i-forward, j-from-left, j-forward, k-from-left,
    k-forward) — for each dim the bond arriving from the -d neighbor is that
    neighbor's forward coupling (reference ``local_field``,
    mcmc/sweep.rs:8-19).  The grids are tiled across the kp lane-packed and
    ks sublane-packed system blocks ONCE here (all systems of one disorder
    realization share couplings); tiling per sweep would re-materialize
    megabytes inside the scan.
    """
    l0, l1, l2 = shape
    grids = []
    for d in range(3):
        fwd = coup_fwd[:, d].reshape(l0, l1, l2)
        grids.append(jnp.roll(fwd, 1, axis=d))
        grids.append(fwd)
    g = jnp.stack([x.reshape(l0, l1 * l2) for x in grids])
    return jnp.tile(g, (1, ks, kp))


def _lane_shift_fns(col, block, l1, l2):
    """Neighbor-value helpers on the packed lane axis.

    Each returns, per lane, the spin value of the named lattice neighbor,
    correcting the block/system seams that a plain roll would cross.
    """
    cb = col % block
    j = cb // l2
    k = cb % l2
    at_j0 = j == 0
    at_jl = j == (l1 - 1)
    at_k0 = k == 0
    at_kl = k == (l2 - 1)

    def jm(x):
        n = x.shape[1]
        return jnp.where(
            at_j0, pltpu.roll(x, n - (l1 - 1) * l2, 1), pltpu.roll(x, l2, 1)
        )

    def jp(x):
        n = x.shape[1]
        return jnp.where(
            at_jl, pltpu.roll(x, (l1 - 1) * l2, 1), pltpu.roll(x, n - l2, 1)
        )

    def km(x):
        n = x.shape[1]
        return jnp.where(
            at_k0, pltpu.roll(x, n - (l2 - 1), 1), pltpu.roll(x, 1, 1)
        )

    def kp_(x):
        n = x.shape[1]
        return jnp.where(
            at_kl, pltpu.roll(x, l2 - 1, 1), pltpu.roll(x, n - 1, 1)
        )

    parity_jk = (j + k) & 1
    return (jm, jp, km, kp_), parity_jk


def _body_3d(s, jg, inv_half_t, uniform_for_color, *, gibbs, l0, l1, l2,
             with_energy=False):
    """Both-color update of one ``[ks*L0, kp*L1*L2]`` tile.

    The sublane axis may stack ks systems (:func:`pack_rows_3d`); the i +- 1
    rolls then get the same seam treatment as the lane packing: at a
    system's top/bottom row the periodic wrap must come from that system's
    own block, not the vertically adjacent one.

    ``with_energy=True`` additionally returns the per-site positive
    forward-bond energy contributions (nonzero at odd-parity sites only) of
    the post-sweep state, which the caller reduces per packed system.
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    rows, lanes = s.shape
    block = l1 * l2
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    (jm, jp, km, kp_), parity_jk = _lane_shift_fns(col, block, l1, l2)
    i_coord = jax.lax.rem(row, np.int32(l0))
    parity = (i_coord + parity_jk) & 1
    if rows == l0:
        def im(x):
            return pltpu.roll(x, 1, 0)

        def ip(x):
            return pltpu.roll(x, l0 - 1, 0)
    else:
        at_i0 = i_coord == 0
        at_il = i_coord == (l0 - 1)

        def im(x):
            return jnp.where(
                at_i0, pltpu.roll(x, rows - (l0 - 1), 0), pltpu.roll(x, 1, 0)
            )

        def ip(x):
            return jnp.where(
                at_il, pltpu.roll(x, l0 - 1, 0), pltpu.roll(x, rows - 1, 0)
            )

    e_site = None
    for c in range(2):
        field = (
            im(s) * jg[0]
            + ip(s) * jg[1]
            + jm(s) * jg[2]
            + jp(s) * jg[3]
            + km(s) * jg[4]
            + kp_(s) * jg[5]
        )
        x = -s * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (parity == c)
        s = jnp.where(flip, -s, s)
        if with_energy and c == 1:
            # odd sites' field is evaluated on the final even sublattice
            # (unchanged by odd flips) and every bond joins one even and
            # one odd site, so summing s_final * h over odd sites counts
            # each bond exactly once (same trick as the 2D kernels).
            e_site = jnp.where(parity == 1, s * field, 0.0)
    if with_energy:
        return s, e_site
    return s


def _packed_sub_index(rows, lanes, l0, block, kp):
    """Packed-system index per site of a ``[ks*L0, kp*block]`` tile: system
    ``b*kp + c`` occupies rows ``[b*L0, (b+1)*L0)`` and lanes ``[c*block,
    (c+1)*block)`` (must stay consistent with :func:`pack_rows_3d`)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    return (row // l0) * kp + col // block


def _packed_inv_half_t(get_temp, rows, lanes, l0, block, kp, ks):
    """Per-site ``1/(T/2)`` from the packed systems' temperature scalars;
    ``get_temp(c)`` loads packed system c's temperature from SMEM."""
    if kp == 1 and ks == 1:
        return 1.0 / (0.5 * get_temp(0))
    sub = _packed_sub_index(rows, lanes, l0, block, kp)
    out = jnp.zeros((rows, lanes), jnp.float32)
    for c in range(kp * ks):
        out = jnp.where(sub == c, 1.0 / (0.5 * get_temp(c)), out)
    return out


def _kernel_3d(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *,
               gibbs, l0, l1, l2, kp, ks):
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    # the kp*ks packed systems share this stream (see
    # pallas_sweep._packed_kernel: every lane/sublane still draws an
    # independent uniform, only the packed-vs-unpacked trajectory differs).
    _seed_prng(seed_ref, d_idx, grp)
    s = spins_ref[0, 0].astype(jnp.float32)  # [ks*L0, kp*L1*L2]
    jg = jgrids_ref[0]
    rows, lanes = s.shape
    block = l1 * l2
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[d_idx, grp * kp * ks + c],
        rows, lanes, l0, block, kp, ks,
    )

    out_ref[0, 0] = _body_3d(
        s, jg, inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, l0=l0, l1=l1, l2=l2,
    ).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("shape", "kp", "ks", "gibbs", "interpret")
)
def sweep_3d(spins, jgrids, sys_temps, seeds, *, shape, kp, ks=1, gibbs=False,
             interpret=False):
    """Full 3D checkerboard sweep of every (realization, system).

    Args:
        spins: ``int8 [n_disorder, n_systems, n_spins]``
            (n_systems % (kp*ks) == 0).
        jgrids: ``f32 [n_disorder, 6, ks*L0, kp*L1*L2]``
            from :func:`pack_coupling_grids_3d` (pre-tiled for ks).
        sys_temps: ``f32 [n_disorder, n_systems]``.
        seeds: ``int32 [n_disorder, 2*n_groups]`` from
            :func:`peapods_tpu.ops.pallas_sweep.make_seeds`.
        shape: static ``(L0, L1, L2)``.
        kp / ks: lane- / sublane-pack factors (:func:`pack_factor_3d`,
            :func:`row_pack_3d`).
    """
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    rows = ks * l0
    n_d, n_systems = spins.shape[:2]
    g = n_systems // (kp * ks)
    packed = jax.vmap(lambda s: pack_rows_3d(s, l0, block, kp, ks))(spins)
    kernel = functools.partial(
        _kernel_3d, gibbs=gibbs, l0=l0, l1=l1, l2=l2, kp=kp, ks=ks
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, rows, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, lanes), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_d, g, rows, lanes), jnp.int8),
        interpret=_interp(interpret),
    )(seeds, sys_temps, packed, jgrids)
    return jax.vmap(lambda o: unpack_rows_3d(o, l0, block, kp, ks))(out)


def _per_system_sums(x, l0, block, kp, ks):
    """Scalar sums per packed system from a ``[ks*L0, kp*block]`` tile
    (system ``b*kp + c`` at rows ``[b*L0, (b+1)*L0)``, lanes ``[c*block,
    (c+1)*block)``), via masked full-tile reductions — Mosaic does not
    support lane-dimension reshapes."""
    rows, lanes = x.shape
    if kp * ks == 1:
        return [x.sum()]
    sub = _packed_sub_index(rows, lanes, l0, block, kp)
    return [jnp.where(sub == i, x, 0.0).sum() for i in range(kp * ks)]


def _kernel_3d_fused(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref,
                     e_ref, m_ref, *, gibbs, l0, l1, l2, kp, ks, n_spins):
    """Sweep + fused per-system energy/magnetization measurement."""
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, grp)
    s = spins_ref[0, 0].astype(jnp.float32)
    jg = jgrids_ref[0]
    rows, lanes = s.shape
    block = l1 * l2
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[d_idx, grp * kp * ks + c],
        rows, lanes, l0, block, kp, ks,
    )

    s, e_site = _body_3d(
        s, jg, inv_half_t, lambda c: _hw_uniform(s.shape),
        gibbs=gibbs, l0=l0, l1=l1, l2=l2, with_energy=True,
    )
    out_ref[0, 0] = s.astype(jnp.int8)
    e_sys = _per_system_sums(e_site, l0, block, kp, ks)
    m_sys = _per_system_sums(s, l0, block, kp, ks)
    for i in range(kp * ks):
        e_ref[d_idx, grp * kp * ks + i] = e_sys[i] / np.float32(n_spins)
        m_ref[d_idx, grp * kp * ks + i] = m_sys[i].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("shape", "kp", "ks", "gibbs", "interpret")
)
def sweep_3d_fused(spins, jgrids, sys_temps, seeds, *, shape, kp, ks=1,
                   gibbs=False, interpret=False):
    """Sweep + measurement in one kernel (3D counterpart of
    :func:`peapods_tpu.ops.pallas_sweep.sweep_2d_fused`).

    Returns ``(spins int8 [n_d, n_systems, n_spins], energies
    f32 [n_d, n_systems], mag_sums int32 [n_d, n_systems])``.
    """
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    rows = ks * l0
    n_d, n_systems = spins.shape[:2]
    g = n_systems // (kp * ks)
    packed = jax.vmap(lambda s: pack_rows_3d(s, l0, block, kp, ks))(spins)
    kernel = functools.partial(
        _kernel_3d_fused, gibbs=gibbs, l0=l0, l1=l1, l2=l2, kp=kp, ks=ks,
        n_spins=l0 * block,
    )
    out, e, m = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, rows, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rows, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_d, g, rows, lanes), jnp.int8),
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.float32),
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.int32),
        ),
        interpret=_interp(interpret),
    )(seeds, sys_temps, packed, jgrids)
    return (
        jax.vmap(lambda o: unpack_rows_3d(o, l0, block, kp, ks))(out), e, m
    )


def _kernel_3d_injected(temp_ref, spins_ref, jgrids_ref, u_ref, out_ref, *,
                        gibbs, l0, l1, l2, kp, ks):
    """Test-only variant: caller supplies the acceptance uniforms."""
    grp = pl.program_id(0)
    s = spins_ref[0].astype(jnp.float32)
    rows, lanes = s.shape
    block = l1 * l2
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[grp * kp * ks + c],
        rows, lanes, l0, block, kp, ks,
    )
    out_ref[0] = _body_3d(
        s, jgrids_ref, inv_half_t, lambda c: u_ref[0, c],
        gibbs=gibbs, l0=l0, l1=l1, l2=l2,
    ).astype(jnp.int8)


def sweep_3d_injected(spins, jgrids, sys_temps, uniforms, *, shape, kp,
                      ks=1, gibbs=False):
    """Kernel-equivalence entry.

    uniforms: ``f32 [n_groups, 2, ks*L0, kp*L1*L2]`` in packed layout.
    spins: ``int8 [n_systems, n_spins]``.
    """
    l0, l1, l2 = shape
    block = l1 * l2
    lanes = kp * block
    rows = ks * l0
    n_systems = spins.shape[0]
    g = n_systems // (kp * ks)
    packed = pack_rows_3d(spins, l0, block, kp, ks)
    jg_tiled = jnp.tile(jgrids, (1, ks, 1)) if ks > 1 else jgrids
    kernel = functools.partial(
        _kernel_3d_injected, gibbs=gibbs, l0=l0, l1=l1, l2=l2, kp=kp, ks=ks
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, rows, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, rows, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, rows, lanes), jnp.int8),
    )(sys_temps, packed, jg_tiled, uniforms)
    return unpack_rows_3d(out, l0, block, kp, ks)


def halo_pack_3d(lattice, n_systems, n_shards) -> int:
    """Lane-pack factor kp for the space-mesh halo kernel (0 = unsupported).

    The ``space`` mesh axis shards the i (sublane) axis into contiguous
    slabs of ``L0 / n_shards`` planes; each slab must keep 8-row sublane
    tiling, and the lane packing is the unsharded kernel's
    (:func:`pack_factor_3d`).  Sublane system-stacking (``ks``) is not
    offered here: the configs the ``space`` axis exists for are lattices too
    big for one chip, where one system already fills the lanes.
    """
    kp = pack_factor_3d(lattice, n_systems)
    if not kp:
        return 0
    l0 = lattice.shape[0]
    if l0 % n_shards or (l0 // n_shards) % 8:
        return 0
    return kp


def _kernel_color_halo3d(seed_ref, temp_ref, off_ref, spins_ref, jgrids_ref,
                         hup_ref, hdn_ref, out_ref, *rest, gibbs, color, l1,
                         l2, kp, u_injected=False, u_ref=None,
                         with_measure=False):
    """Single-color checkerboard update of one PLANE SLAB with explicit
    halos — the 3D analog of ``pallas_sweep._kernel_color_halo``.

    Each shard owns ``[L0l, kp*L1*L2]`` packed rows of the lattice (the i
    axis sharded into contiguous slabs); the i +- 1 neighbors at the slab
    edges arrive as halo planes (``hup`` = global plane above, ``hdn`` =
    global plane below), fetched by the engine's ``ppermute`` ring before
    each color pass.  ``off_ref`` carries the slab's global first-plane
    index so checkerboard parity stays globally consistent; j/k neighbors
    are unsharded and ride the seam-corrected lane rolls.  One color per
    call — the second color's halo planes depend on the first color's
    updates in the neighboring shards.

    ``with_measure`` (color-1 pass only): additionally emit the slab's RAW
    positive forward-bond energy sum and spin sum per packed system
    (``rest`` = ``(e_ref, m_ref)``) — each bond counted once at its odd
    endpoint, exact globally after the engine's psum over ``space`` (the
    caller normalizes by the GLOBAL spin count).
    """
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    if not u_injected:
        _seed_prng(seed_ref, d_idx, grp)
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    s = spins_ref[0, 0].astype(jnp.float32)  # [L0l, kp*block]
    jg = jgrids_ref[0]
    hup = hup_ref[0, 0].astype(jnp.float32)  # [1, kp*block]
    hdn = hdn_ref[0, 0].astype(jnp.float32)
    rows, lanes = s.shape
    block = l1 * l2
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    (jm, jp, km, kp_), parity_jk = _lane_shift_fns(col, block, l1, l2)
    parity = (row + off_ref[0, 0] + parity_jk) & 1
    inv_half_t = _packed_inv_half_t(
        lambda c: temp_ref[d_idx, grp * kp + c],
        rows, lanes, rows, block, kp, 1,
    )
    up = jnp.where(row == 0, hup, pltpu.roll(s, 1, 0))
    down = jnp.where(row == rows - 1, hdn, pltpu.roll(s, rows - 1, 0))
    field = (
        up * jg[0]
        + down * jg[1]
        + jm(s) * jg[2]
        + jp(s) * jg[3]
        + km(s) * jg[4]
        + kp_(s) * jg[5]
    )
    x = -s * field * inv_half_t
    u = u_ref[0, 0] if u_injected else _hw_uniform(s.shape)
    if gibbs:
        p = jax.nn.sigmoid(x)
    else:
        p = keep * jnp.exp(jnp.minimum(x, 0.0))
    flip = (u < p) & (parity == color)
    s_new = jnp.where(flip, -s, s)
    out_ref[0, 0] = s_new.astype(jnp.int8)
    if with_measure:
        e_ref, m_ref = rest
        # odd flips leave the odd sites' field (all-even neighbors) intact
        e_site = jnp.where(parity == 1, s_new * field, 0.0)
        e_sys = _per_system_sums(e_site, rows, block, kp, 1)
        m_sys = _per_system_sums(s_new, rows, block, kp, 1)
        grp = pl.program_id(1)
        for c in range(kp):
            e_ref[pl.program_id(0), grp * kp + c] = e_sys[c]
            m_ref[pl.program_id(0), grp * kp + c] = m_sys[c].astype(
                jnp.int32
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape_local", "kp", "color", "gibbs", "with_measure", "interpret"
    ),
)
def sweep_3d_halo_color(spins, jgrids, sys_temps, seeds, hup, hdn, off, *,
                        shape_local, kp, color, gibbs=False,
                        with_measure=False, interpret=False):
    """One color pass over every (realization, lane-group)'s local slab.

    Args:
        spins: ``int8 [n_d, g, L0l, kp*block]`` packed local slabs
            (:func:`pack_rows_3d` with ``ks=1`` on the local spin slice).
        jgrids: ``f32 [n_d, 6, L0l, kp*block]`` local rows of the
            full-lattice grids (:func:`pack_coupling_grids_3d`, the i axis
            sharded with the spins).
        sys_temps: ``f32 [n_d, n_systems]``.
        seeds: ``int32 [n_d, 2*g]`` (fold the shard index and the color in
            before calling — each (shard, color) pass must draw an
            independent stream).
        hup/hdn: ``int8 [n_d, g, 1, kp*block]`` halo planes (global plane
            above / below the slab, post previous color pass).
        off: ``int32 [1, 1]`` global first-plane index of this slab.
        with_measure: color-1 only; additionally return the slab's RAW
            per-system energy/spin sums ``(e f32 [n_d, n_systems],
            m int32 [n_d, n_systems])`` for the engine to psum over the
            ``space`` axis.
    """
    l0l, l1, l2 = shape_local
    lanes = kp * l1 * l2
    n_d, g = spins.shape[:2]
    assert not (with_measure and color != 1)
    kernel = functools.partial(
        _kernel_color_halo3d, gibbs=gibbs, color=color, l1=l1, l2=l2, kp=kp,
        with_measure=with_measure,
    )
    slab_spec = pl.BlockSpec((1, 1, l0l, lanes), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = slab_spec
    out_shape = jax.ShapeDtypeStruct((n_d, g, l0l, lanes), jnp.int8)
    if with_measure:
        out_specs = (
            slab_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_d, g * kp), jnp.float32),
            jax.ShapeDtypeStruct((n_d, g * kp), jnp.int32),
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            slab_spec,
            pl.BlockSpec((1, 6, l0l, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(seeds, sys_temps, off, spins, jgrids, hup, hdn)
    return out


def sweep_3d_halo_color_injected(spins, jgrids, sys_temps, uniforms, hup,
                                 hdn, off, *, shape_local, kp, color,
                                 gibbs=False, interpret=False):
    """Test-only halo-color pass with caller-supplied uniforms
    (``f32 [g, L0l, kp*block]``); single realization."""
    l0l, l1, l2 = shape_local
    lanes = kp * l1 * l2
    g = spins.shape[0]
    kernel = functools.partial(
        _kernel_color_halo3d, gibbs=gibbs, color=color, l1=l1, l2=l2, kp=kp,
        u_injected=True,
    )

    def wrapped(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
                hdn_ref, u_ref, out_ref):
        kernel(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
               hdn_ref, out_ref, u_ref=u_ref)

    out = pl.pallas_call(
        wrapped,
        grid=(1, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, l0l, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, l0l, lanes), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l0l, lanes), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, l0l, lanes), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, g, l0l, lanes), jnp.int8),
        interpret=_interp(interpret),
    )(
        jnp.zeros((1, 2 * g), jnp.int32),
        sys_temps[None],
        off,
        spins[None],
        jgrids[None],
        hup[None],
        hdn[None],
        uniforms[None],
    )
    return out[0]
