"""Pallas TPU kernel: fused checkerboard Metropolis/Gibbs sweep (2D lattices).

The hot path of the whole framework (SURVEY.md section 7, stage 9).  One
kernel invocation performs a complete sweep of one system: both checkerboard
colors, local fields via in-VMEM rolls, acceptance tests against hardware
PRNG bits — no HBM round-trips between colors and no host-visible
intermediates.  Couplings are passed as four pre-shifted grids so the kernel
body is pure elementwise work over ``[H, W]`` tiles:

    ju[i,j] = J0[i-1,j]   (bond arriving from above; couplings own forward
    jd[i,j] = J0[i,j]      bonds, reference mcmc/sweep.rs:22-32)
    jl[i,j] = J1[i,j-1]
    jr[i,j] = J1[i,j]

Acceptance matches :mod:`peapods_tpu.ops.sweep` exactly: lazy Metropolis
``p = (1-eps) * min(1, exp(2*eng/T))`` (see the ergodicity discussion there)
and Gibbs ``p = sigmoid(2*eng/T)``; uniforms are built from the top 24 bits
of ``pltpu.prng_random_bits`` like the reference's 24-bit uniform grid
(mcmc/sweep.rs:99-100).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sweep import METROPOLIS_LAZINESS

__all__ = [
    "sweep_2d",
    "sweep_2d_fused",
    "sweep_2d_halo_color",
    "sweep_2d_halo_color_injected",
    "sweep_2d_halo_color_packed",
    "sweep_2d_halo_color_packed_injected",
    "sweep_2d_injected",
    "sweep_2d_packed",
    "sweep_2d_two_sub_injected",
    "pack_coupling_grids",
    "pack_coupling_grids_packed",
    "pack_coupling_grids_two_sub",
    "pack_factor",
    "pack_two_sub",
    "unpack_two_sub",
    "make_seeds",
    "supports",
    "supports_two_sub",
]

_INV24 = np.float32(1.0 / (1 << 24))

# Hardware-PRNG seeds are two 32-bit words (Mosaic's maximum): word 0 is the
# per-(realization, sweep) threefry key's first word; word 1 is its second
# word plus the kernel-grid instance index.  Streams within one sweep are
# therefore distinct by construction (the advisor-flagged failure mode —
# two replicas sharing a sweep's acceptance field — cannot occur), and a
# cross-(realization, sweep) collision needs both 32-bit words to match,
# ~2^-64 per pair instead of the old single-word birthday bound.
N_SEED_WORDS = 2


def make_seeds(skeys, n_instances):
    """``int32 [n_disorder, 2 * n_instances]`` interleaved seed words from
    per-realization sweep keys (one key per disorder, already folded with the
    sweep counter).  Kept 2-D because SMEM pads the trailing dimension to 128
    words — a ``[d, g, 2]`` layout would blow the 1 MB SMEM budget at large
    disorder counts.
    """
    kd = jax.lax.bitcast_convert_type(
        jax.random.key_data(skeys).astype(jnp.uint32), jnp.int32
    )  # [n_disorder, 2]
    n_d = kd.shape[0]
    inst = jnp.arange(n_instances, dtype=jnp.int32)
    w0 = jnp.broadcast_to(kd[:, None, 0], (n_d, n_instances))
    w1 = kd[:, None, 1] + inst[None, :]
    return jnp.stack([w0, w1], axis=-1).reshape(n_d, 2 * n_instances)


def _interp(flag):
    """Interpret-mode selector: the Mosaic TPU interpreter (InterpretParams)
    emulates pltpu primitives (prng_seed/prng_random_bits) under jit and
    shard_map on CPU; the generic pallas interpreter does not.  Note the
    emulated prng_random_bits returns ZEROS — CPU interpret runs validate
    kernel mechanics and sharding only, never statistics.
    """
    return pltpu.InterpretParams() if flag else False


def _seed_prng(seed_ref, d_idx, i_idx):
    pltpu.prng_seed(
        *(seed_ref[d_idx, N_SEED_WORDS * i_idx + w] for w in range(N_SEED_WORDS))
    )


def _is_2d_hypercubic(lattice) -> bool:
    return (
        lattice.n_dims == 2
        and lattice.n_neighbors == 2
        and np.array_equal(lattice.offsets, [[1, 0], [0, 1]])
        and lattice.shape[0] % 8 == 0
    )


def supports(lattice) -> bool:
    """Direct-kernel applicability: 2D hypercubic with TPU-tileable extents."""
    return _is_2d_hypercubic(lattice) and lattice.shape[1] % 128 == 0


def supports_two_sub(lattice) -> bool:
    """Two-sublattice layout applicability: both dense [H, W/2] sublattice
    arrays must still fill the 128 lanes."""
    return _is_2d_hypercubic(lattice) and lattice.shape[1] % 256 == 0


def pack_two_sub(x):
    """``[..., H, W] -> [..., 2, H, W/2]`` checkerboard sublattices.

    ``out[..., 0, i, j'] = x[..., i, 2j' + (i & 1)]`` (the even sublattice,
    sites with ``(row + col) % 2 == 0``); index 1 is the odd sublattice.
    Each sublattice is a *dense* array: a checkerboard color pass touches
    every element, so the kernel wastes no lanes on the inactive parity and
    draws half the PRNG bits per pass.
    """
    h, w = x.shape[-2:]
    pairs = x.reshape(*x.shape[:-1], w // 2, 2)
    odd = ((jnp.arange(h) & 1) == 1)[:, None]
    even_sub = jnp.where(odd, pairs[..., 1], pairs[..., 0])
    odd_sub = jnp.where(odd, pairs[..., 0], pairs[..., 1])
    return jnp.stack([even_sub, odd_sub], axis=-3)


def unpack_two_sub(p):
    """Inverse of :func:`pack_two_sub`: ``[..., 2, H, W/2] -> [..., H, W]``."""
    e = p[..., 0, :, :]
    o = p[..., 1, :, :]
    h, wh = e.shape[-2:]
    odd = ((jnp.arange(h) & 1) == 1)[:, None]
    col_even = jnp.where(odd, o, e)
    col_odd = jnp.where(odd, e, o)
    return jnp.stack([col_even, col_odd], axis=-1).reshape(*e.shape[:-1], 2 * wh)


def pack_coupling_grids_two_sub(jgrids):
    """``[..., 4, H, W] -> [..., 2, 4, H, W/2]``: the pre-shifted coupling
    grids gathered at each sublattice's sites (index 0 = grids used when
    updating/measuring even sites)."""
    return jnp.swapaxes(pack_two_sub(jgrids), -4, -3)


def _two_sub_lr(s_nb):
    """Within-row neighbor values for two-sublattice fields: returns
    ``(prev, next)`` where ``prev[i, j'] = s_nb[i, j'-1]`` and
    ``next[i, j'] = s_nb[i, j'+1]`` (periodic); the caller resolves row
    parity."""
    wh = s_nb.shape[-1]
    return pltpu.roll(s_nb, 1, 1), pltpu.roll(s_nb, wh - 1, 1)


def _kernel_body_2sub(sE, sO, jgE, jgO, inv_half_t, uniform_for_color, *,
                      gibbs, with_energy=False):
    """Two-sublattice checkerboard update (even sites = color 0, then odd).

    ``sE``/``sO``: f32 ``[H, W/2]`` dense sublattices (:func:`pack_two_sub`);
    ``jgE``/``jgO``: the ``[4, H, W/2]`` coupling grids gathered at the
    corresponding sites.  Same acceptance math as :func:`_kernel_body`, but
    fields are computed only for the sites being updated: with column
    ``j = 2j' + parity(i)`` for an even site, its left/right neighbors sit
    at odd-sublattice columns ``j' - 1 + parity(i)`` / ``j' + parity(i)``,
    which a roll plus a row-parity select resolves.

    ``with_energy=True`` additionally returns the positive forward-bond
    energy sum of the post-sweep state, for free: every bond joins an even
    and an odd site, so the odd pass's local field (evaluated on the final
    even sublattice, unchanged by odd flips) gives
    ``E = sum_O s_O_final * h_O`` with each bond counted exactly once.
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    h_dim, wh = sE.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, wh), 0)
    odd = (row & 1) == 1

    e_tot = None
    for c in range(2):
        s_upd, s_nb = (sE, sO) if c == 0 else (sO, sE)
        jg = jgE if c == 0 else jgO
        prev, nxt = _two_sub_lr(s_nb)
        if c == 0:
            left = jnp.where(odd, s_nb, prev)
            right = jnp.where(odd, nxt, s_nb)
        else:
            left = jnp.where(odd, prev, s_nb)
            right = jnp.where(odd, s_nb, nxt)
        field = (
            pltpu.roll(s_nb, 1, 0) * jg[0]
            + pltpu.roll(s_nb, h_dim - 1, 0) * jg[1]
            + left * jg[2]
            + right * jg[3]
        )
        x = -s_upd * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        s_upd = jnp.where(u < p, -s_upd, s_upd)
        if c == 0:
            sE = s_upd
        else:
            sO = s_upd
            if with_energy:
                e_tot = (s_upd * field).sum()
    if with_energy:
        return sE, sO, e_tot
    return sE, sO


def pack_factor(lattice, n_systems) -> int:
    """Systems packed per lane group for narrow lattices (0 = unsupported).

    Lattices with W < 128 cannot fill TPU lanes one system at a time; when
    128 % W == 0 and the system count divides evenly, k = 128 / W systems are
    packed side-by-side along the lane dimension and the kernel corrects the
    periodic wrap at the internal seams.
    """
    if not _is_2d_hypercubic(lattice):
        return 0
    w = lattice.shape[1]
    if w >= 128 or w < 8 or 128 % w != 0:
        return 0
    k = 128 // w
    return k if n_systems % k == 0 else 0


def pack_coupling_grids(coup_fwd, shape):
    """``[4, H, W]`` pre-shifted coupling grids (ju, jd, jl, jr) from
    ``coup_fwd [n_spins, 2]``."""
    h, w = shape
    j0 = coup_fwd[:, 0].reshape(h, w)
    j1 = coup_fwd[:, 1].reshape(h, w)
    return jnp.stack(
        [jnp.roll(j0, 1, axis=0), j0, jnp.roll(j1, 1, axis=1), j1]
    )


def _kernel_body(s, jgrids_ref, inv_half_t, uniform_for_color, *, gibbs,
                 with_energy=False):
    """Shared both-color update; ``uniform_for_color(c)`` supplies u.

    ``with_energy=True`` additionally returns the positive forward-bond
    energy sum of the post-sweep state at no extra roll cost: the second
    (odd) pass's field at odd sites is evaluated on the final even spins
    and every bond joins one even and one odd site, so
    ``E = sum_{odd sites} s_final * field`` counts each bond exactly once.
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    ju = jgrids_ref[0]
    jd = jgrids_ref[1]
    jl = jgrids_ref[2]
    jr = jgrids_ref[3]
    h_dim, w_dim = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 1)
    parity = (row + col) & 1

    e_tot = None
    for c in range(2):
        field = (
            pltpu.roll(s, 1, 0) * ju
            + pltpu.roll(s, h_dim - 1, 0) * jd
            + pltpu.roll(s, 1, 1) * jl
            + pltpu.roll(s, w_dim - 1, 1) * jr
        )
        eng = -s * field
        x = eng * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (parity == c)
        s = jnp.where(flip, -s, s)
        if with_energy and c == 1:
            e_tot = jnp.where(parity == 1, s * field, 0.0).sum()
    if with_energy:
        return s, e_tot
    return s


def _hw_uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return (
        jax.lax.shift_right_logical(bits, 8) & 0xFFFFFF
    ).astype(jnp.float32) * _INV24


def _kernel(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *, gibbs):
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, sys_idx)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = spins_ref[0, 0].astype(jnp.float32)  # [H, W]
    jg = jgrids_ref[0]
    out_ref[0, 0] = _kernel_body(
        s, jg, inv_half_t, lambda c: _hw_uniform(s.shape), gibbs=gibbs
    ).astype(jnp.int8)


def _kernel_fused(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, e_ref,
                  m_ref, *, gibbs):
    """Sweep + fused energy/magnetization measurement.

    Valid only when no cluster update runs between the sweep and the
    measurement (the engine gates on that).  Energy uses the positive
    forward-bond sum convention (ops/energy.py) computed from the already
    resident post-sweep spins and coupling grids — the separate measurement
    pass over HBM disappears.
    """
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    _seed_prng(seed_ref, d_idx, sys_idx)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = spins_ref[0, 0].astype(jnp.float32)
    jg = jgrids_ref[0]
    h_dim, w_dim = s.shape
    s, e_tot = _kernel_body(
        s, jg, inv_half_t, lambda c: _hw_uniform(s.shape), gibbs=gibbs,
        with_energy=True,
    )
    out_ref[0, 0] = s.astype(jnp.int8)
    e_ref[d_idx, sys_idx] = e_tot / (h_dim * w_dim)
    m_ref[d_idx, sys_idx] = s.sum().astype(jnp.int32)


def _kernel_color_halo(seed_ref, temp_ref, off_ref, spins_ref, jgrids_ref,
                       hup_ref, hdn_ref, out_ref, *rest, gibbs, color,
                       u_injected=False, u_ref=None, with_measure=False):
    """Single-color checkerboard update of one ROW BAND with explicit halos.

    Spatial decomposition (SURVEY.md section 5 long-context analog): each
    shard owns ``[Hl, W]`` rows of the lattice; the vertical neighbors at
    the band edges arrive as halo rows (``hup`` = global row above the band,
    ``hdn`` = global row below), fetched by the engine's ``ppermute`` ring
    before each color pass.  ``off_ref`` carries the band's global first-row
    index, so checkerboard parity stays globally consistent.  One color per
    call — the second color's halo rows depend on the first color's updates
    in the neighboring shards.

    ``with_measure`` (color-1 pass only): additionally emit the band's RAW
    positive forward-bond energy sum and spin sum per system (``rest`` =
    ``(e_ref, m_ref)``).  Every bond joins one even and one odd site and
    this pass's field at odd sites is evaluated on the final even
    sublattice (cross-band bonds via the post-color-0 halo rows), so
    ``sum_odd s_final * h`` counts each bond once — globally, after the
    engine's psum over the ``space`` axis (the caller normalizes by the
    GLOBAL spin count).
    """
    d_idx = pl.program_id(0)
    sys_idx = pl.program_id(1)
    if not u_injected:
        _seed_prng(seed_ref, d_idx, sys_idx)
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    inv_half_t = 1.0 / (0.5 * temp_ref[d_idx, sys_idx])
    s = spins_ref[0, 0].astype(jnp.float32)  # [Hl, W]
    jg = jgrids_ref[0]
    hup = hup_ref[0, 0].astype(jnp.float32)  # [1, W]
    hdn = hdn_ref[0, 0].astype(jnp.float32)
    h_dim, w_dim = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, w_dim), 1)
    parity = (row + off_ref[0, 0] + col) & 1
    up = jnp.where(row == 0, hup, pltpu.roll(s, 1, 0))
    down = jnp.where(row == h_dim - 1, hdn, pltpu.roll(s, h_dim - 1, 0))
    field = (
        up * jg[0]
        + down * jg[1]
        + pltpu.roll(s, 1, 1) * jg[2]
        + pltpu.roll(s, w_dim - 1, 1) * jg[3]
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
        e_ref[d_idx, sys_idx] = jnp.where(
            parity == 1, s_new * field, 0.0
        ).sum()
        m_ref[d_idx, sys_idx] = s_new.sum().astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape_local", "color", "gibbs", "with_measure", "interpret"
    ),
)
def sweep_2d_halo_color(spins, jgrids, sys_temps, seeds, hup, hdn, off, *,
                        shape_local, color, gibbs=False, with_measure=False,
                        interpret=False):
    """One color pass over every (realization, system)'s local row band.

    Args:
        spins: ``int8 [n_d, n_systems, Hl, W]`` local band.
        jgrids: ``f32 [n_d, 4, Hl, W]`` local pre-shifted coupling grids.
        hup/hdn: ``int8 [n_d, n_systems, 1, W]`` halo rows (global row above
            / below the band, post previous color pass).
        off: ``int32 [1, 1]`` global first-row index of this band.
        seeds: ``int32 [n_d, 2*n_systems]`` (fold the shard index and the
            color in before calling — each (shard, color) pass must draw an
            independent stream).
        with_measure: color-1 only; additionally return the band's RAW
            per-system energy/spin sums ``(e f32 [n_d, n_systems],
            m int32 [n_d, n_systems])`` for the engine to psum over the
            ``space`` axis.
    """
    hl, w = shape_local
    n_d, n_systems = spins.shape[:2]
    assert not (with_measure and color != 1)
    kernel = functools.partial(
        _kernel_color_halo, gibbs=gibbs, color=color,
        with_measure=with_measure,
    )
    band_spec = pl.BlockSpec((1, 1, hl, w), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = band_spec
    out_shape = jax.ShapeDtypeStruct((n_d, n_systems, hl, w), jnp.int8)
    if with_measure:
        out_specs = (
            band_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.float32),
            jax.ShapeDtypeStruct((n_d, n_systems), jnp.int32),
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band_spec,
            pl.BlockSpec((1, 4, hl, w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(seeds, sys_temps, off, spins, jgrids, hup, hdn)
    return out


def sweep_2d_halo_color_injected(spins, jgrids, sys_temps, uniforms, hup,
                                 hdn, off, *, shape_local, color,
                                 gibbs=False, interpret=False):
    """Test-only halo-color pass with caller-supplied uniforms
    (``f32 [n_systems, Hl, W]``); single realization."""
    hl, w = shape_local
    n_systems = spins.shape[0]
    kernel = functools.partial(
        _kernel_color_halo, gibbs=gibbs, color=color, u_injected=True
    )

    def wrapped(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
                hdn_ref, u_ref, out_ref):
        kernel(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
               hdn_ref, out_ref, u_ref=u_ref)

    out = pl.pallas_call(
        wrapped,
        grid=(1, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, hl, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, hl, w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hl, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hl, w), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_systems, hl, w), jnp.int8),
        interpret=_interp(interpret),
    )(
        jnp.zeros((1, 2 * n_systems), jnp.int32),
        sys_temps[None],
        off,
        spins[None],
        jgrids[None],
        hup[None],
        hdn[None],
        uniforms[None],
    )
    return out[0]


def _kernel_color_halo_packed(seed_ref, temp_ref, off_ref, spins_ref,
                              jgrids_ref, hup_ref, hdn_ref, out_ref, *rest,
                              gibbs, color, w, k, u_injected=False,
                              u_ref=None, with_measure=False):
    """Lane-packed variant of ``_kernel_color_halo``: k narrow (W < 128)
    systems side-by-side per kernel instance, each owning a [Hl, W] row
    band.  Vertical neighbors at the band edges arrive as PACKED halo rows
    (packing is column-only, so the neighbor shard's edge row of the same
    group is exactly this group's halo); horizontal neighbors are the
    packed kernel's seam-corrected within-system rolls.  One color per
    call, global parity via the band's first-row offset.

    ``with_measure`` (color-1 pass only): additionally emit the band's RAW
    per-system positive forward-bond energy / spin sums (``rest`` =
    ``(e_ref, m_ref)``, lane-group masked reductions) — each bond counted
    once at its odd endpoint, exact globally after the engine's psum over
    ``space``."""
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    if not u_injected:
        _seed_prng(seed_ref, d_idx, grp)
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    s = spins_ref[0, 0].astype(jnp.float32)  # [Hl, k*w]
    jg = jgrids_ref[0]
    hup = hup_ref[0, 0].astype(jnp.float32)  # [1, k*w]
    hdn = hdn_ref[0, 0].astype(jnp.float32)
    h_dim, kw = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 1)
    parity = (row + off_ref[0, 0] + col % w) & 1
    at_left_edge = (col % w) == 0
    at_right_edge = (col % w) == (w - 1)

    inv_half_t = jnp.zeros((h_dim, kw), jnp.float32)
    for j in range(k):
        t_j = temp_ref[d_idx, grp * k + j]
        inv_half_t = jnp.where((col // w) == j, 1.0 / (0.5 * t_j), inv_half_t)

    def lane_left(x):
        base = pltpu.roll(x, 1, 1)
        wrap = pltpu.roll(x, kw - (w - 1), 1)
        return jnp.where(at_left_edge, wrap, base)

    def lane_right(x):
        base = pltpu.roll(x, kw - 1, 1)
        wrap = pltpu.roll(x, w - 1, 1)
        return jnp.where(at_right_edge, wrap, base)

    up = jnp.where(row == 0, hup, pltpu.roll(s, 1, 0))
    down = jnp.where(row == h_dim - 1, hdn, pltpu.roll(s, h_dim - 1, 0))
    field = (
        up * jg[0]
        + down * jg[1]
        + lane_left(s) * jg[2]
        + lane_right(s) * jg[3]
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
        for j in range(k):
            msk = (col // w) == j
            e_ref[d_idx, grp * k + j] = jnp.where(msk, e_site, 0.0).sum()
            m_ref[d_idx, grp * k + j] = (
                jnp.where(msk, s_new, 0.0).sum().astype(jnp.int32)
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape_local", "k", "color", "gibbs", "with_measure", "interpret"
    ),
)
def sweep_2d_halo_color_packed(spins, jgrids, sys_temps, seeds, hup, hdn,
                               off, *, shape_local, k, color, gibbs=False,
                               with_measure=False, interpret=False):
    """One color pass over lane-packed local row bands.

    Args:
        spins: ``int8 [n_d, g, Hl, k*W]`` packed local bands
            (:func:`pack_spins` applied per disorder to the band).
        jgrids: ``f32 [n_d, 4, Hl, k*W]`` local rows of the TILED
            per-system grids (:func:`pack_coupling_grids_packed`).
        sys_temps: ``f32 [n_d, n_systems]``; system ``g*k + j`` sits at
            columns ``[j*W, (j+1)*W)`` of group g.
        seeds: ``int32 [n_d, 2*g]`` (fold shard index and color in before
            calling).
        hup/hdn: ``int8 [n_d, g, 1, k*W]`` packed halo rows.
        off: ``int32 [1, 1]`` global first-row index of this band.
    """
    hl, w = shape_local
    n_d, g = spins.shape[:2]
    assert not (with_measure and color != 1)
    kernel = functools.partial(
        _kernel_color_halo_packed, gibbs=gibbs, color=color, w=w, k=k,
        with_measure=with_measure,
    )
    band_spec = pl.BlockSpec((1, 1, hl, k * w), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = band_spec
    out_shape = jax.ShapeDtypeStruct((n_d, g, hl, k * w), jnp.int8)
    if with_measure:
        out_specs = (
            band_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((n_d, g * k), jnp.float32),
            jax.ShapeDtypeStruct((n_d, g * k), jnp.int32),
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band_spec,
            pl.BlockSpec((1, 4, hl, k * w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(seeds, sys_temps, off, spins, jgrids, hup, hdn)
    return out


def sweep_2d_halo_color_packed_injected(spins, jgrids, sys_temps, uniforms,
                                        hup, hdn, off, *, shape_local, k,
                                        color, gibbs=False, interpret=False):
    """Test-only packed halo-color pass with caller-supplied uniforms
    (``f32 [g, Hl, k*W]``); single realization."""
    hl, w = shape_local
    g = spins.shape[0]
    kernel = functools.partial(
        _kernel_color_halo_packed, gibbs=gibbs, color=color, w=w, k=k,
        u_injected=True,
    )

    def wrapped(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
                hdn_ref, u_ref, out_ref):
        kernel(seed_ref, temp_ref, off_ref, spins_ref, jg_ref, hup_ref,
               hdn_ref, out_ref, u_ref=u_ref)

    band_spec = pl.BlockSpec((1, 1, hl, k * w), lambda d, i: (d, i, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        wrapped,
        grid=(1, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            band_spec,
            pl.BlockSpec((1, 4, hl, k * w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            band_spec,
        ],
        out_specs=band_spec,
        out_shape=jax.ShapeDtypeStruct((1, g, hl, k * w), jnp.int8),
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


def _kernel_injected(temp_ref, spins_ref, jgrids_ref, u_ref, out_ref, *, gibbs):
    """Test-only variant: acceptance uniforms supplied by the caller."""
    sys_idx = pl.program_id(0)
    inv_half_t = 1.0 / (0.5 * temp_ref[sys_idx])
    s = spins_ref[0].astype(jnp.float32)
    out_ref[0] = _kernel_body(
        s, jgrids_ref, inv_half_t, lambda c: u_ref[0, c], gibbs=gibbs
    ).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("shape", "gibbs", "interpret"))
def sweep_2d(spins, jgrids, sys_temps, seeds, *, shape, gibbs=False, interpret=False):
    """Full checkerboard sweep of every (realization, system).

    Args:
        spins: ``int8 [n_disorder, n_systems, n_spins]``.
        jgrids: ``f32 [n_disorder, 4, H, W]`` from :func:`pack_coupling_grids`.
        sys_temps: ``f32 [n_disorder, n_systems]`` per-system temperatures.
        seeds: ``int32 [n_disorder, 2*n_systems]`` from :func:`make_seeds`.
        shape: static ``(H, W)``.

    Returns:
        ``int8 [n_disorder, n_systems, n_spins]``.
    """
    h, w = shape
    n_d, n_systems = spins.shape[:2]
    s4 = spins.reshape(n_d, n_systems, h, w)
    kernel = functools.partial(_kernel, gibbs=gibbs)
    out = pl.pallas_call(
        kernel,
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_d, n_systems, h, w), jnp.int8),
        interpret=_interp(interpret),
    )(seeds, sys_temps, s4, jgrids)
    return out.reshape(n_d, n_systems, h * w)


def _packed_kernel(seed_ref, temp_ref, spins_ref, jgrids_ref, out_ref, *,
                   gibbs, w, k):
    """Checkerboard sweep over k lane-packed systems (column c belongs to
    system ``g*k + c // w`` at lattice column ``c % w``)."""
    d_idx = pl.program_id(0)
    grp = pl.program_id(1)
    # the k packed systems of one group share this stream: every lane still
    # draws an independent uniform from prng_random_bits, so acceptance is
    # i.i.d. per site; only the unpacked-vs-packed trajectory differs
    # (equivalence is statistical, tested at the energy level).
    _seed_prng(seed_ref, d_idx, grp)
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)

    s = spins_ref[0, 0].astype(jnp.float32)  # [H, k*w]
    jg = jgrids_ref[0]
    ju = jg[0]
    jd = jg[1]
    jl = jg[2]
    jr = jg[3]
    h_dim, kw = s.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h_dim, kw), 1)
    # parity of the LATTICE coordinates (row, col % w)
    parity = (row + col % w) & 1
    at_left_edge = (col % w) == 0
    at_right_edge = (col % w) == (w - 1)

    # per-column inverse half temperature from the k per-system scalars
    inv_half_t = jnp.zeros((h_dim, kw), jnp.float32)
    for j in range(k):
        t_j = temp_ref[d_idx, grp * k + j]
        inv_half_t = jnp.where((col // w) == j, 1.0 / (0.5 * t_j), inv_half_t)

    def lane_left(x):
        # value of the within-system left neighbor (periodic in w)
        base = pltpu.roll(x, 1, 1)
        wrap = pltpu.roll(x, kw - (w - 1), 1)
        return jnp.where(at_left_edge, wrap, base)

    def lane_right(x):
        base = pltpu.roll(x, kw - 1, 1)
        wrap = pltpu.roll(x, w - 1, 1)
        return jnp.where(at_right_edge, wrap, base)

    for c in range(2):
        field = (
            pltpu.roll(s, 1, 0) * ju
            + pltpu.roll(s, h_dim - 1, 0) * jd
            + lane_left(s) * jl
            + lane_right(s) * jr
        )
        eng = -s * field
        x = eng * inv_half_t
        u = _hw_uniform(s.shape)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (parity == c)
        s = jnp.where(flip, -s, s)

    out_ref[0, 0] = s.astype(jnp.int8)


def pack_spins(spins, shape, k):
    """``int8 [S, n_spins] -> [S//k, H, k*W]`` lane-packed groups."""
    h, w = shape
    n_sys = spins.shape[0]
    g = n_sys // k
    return (
        spins.reshape(g, k, h, w).transpose(0, 2, 1, 3).reshape(g, h, k * w)
    )


def unpack_spins(packed, shape, k):
    h, w = shape
    g = packed.shape[0]
    return (
        packed.reshape(g, h, k, w).transpose(0, 2, 1, 3).reshape(g * k, h * w)
    )


@functools.partial(jax.jit, static_argnames=("shape", "k", "gibbs", "interpret"))
def sweep_2d_packed(spins, jgrids, sys_temps, seeds, *, shape, k, gibbs=False,
                    interpret=False):
    """Checkerboard sweep with ``k`` systems lane-packed per kernel instance.

    Args:
        spins: ``int8 [n_disorder, n_systems, n_spins]`` (n_systems
            divisible by k).
        jgrids: ``f32 [n_disorder, 4, H, k*W]`` per-group coupling grids —
            tiles of the per-system pre-shifted grids (couplings are shared
            by the packed systems of one realization).
        sys_temps: ``f32 [n_disorder, n_systems]``; system ``g*k + j`` sits
            at lattice columns ``[j*W, (j+1)*W)`` of group g.
        seeds: ``int32 [n_disorder, 2*n_groups]`` from :func:`make_seeds`.
    """
    h, w = shape
    n_d, n_systems = spins.shape[:2]
    g = n_systems // k
    packed = jax.vmap(lambda s: pack_spins(s, shape, k))(spins)
    kernel = functools.partial(_packed_kernel, gibbs=gibbs, w=w, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(n_d, g),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, k * w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, k * w), lambda d, i: (d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, k * w), lambda d, i: (d, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_d, g, h, k * w), jnp.int8),
        interpret=_interp(interpret),
    )(seeds, sys_temps, packed, jgrids)
    return jax.vmap(lambda o: unpack_spins(o, shape, k))(out)


def pack_coupling_grids_packed(coup_fwd, shape, k):
    """``f32 [4, H, k*W]``: tiled per-system pre-shifted coupling grids."""
    base = pack_coupling_grids(coup_fwd, shape)  # [4, H, W]
    return jnp.tile(base, (1, 1, k))


@functools.partial(jax.jit, static_argnames=("shape", "gibbs", "interpret"))
def sweep_2d_fused(spins, jgrids, sys_temps, seeds, *, shape, gibbs=False,
                   interpret=False):
    """Sweep + measurement in one kernel (disorder-batched).

    Returns ``(spins int8 [n_d, n_systems, n_spins], energies
    f32 [n_d, n_systems], mag_sums int32 [n_d, n_systems])``.
    """
    h, w = shape
    n_d, n_systems = spins.shape[:2]
    s4 = spins.reshape(n_d, n_systems, h, w)
    kernel = functools.partial(_kernel_fused, gibbs=gibbs)
    out, e, m = pl.pallas_call(
        kernel,
        grid=(n_d, n_systems),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda d, i: (d, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, h, w), lambda d, i: (d, 0, 0, 0),
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


def _kernel_2sub_injected(temp_ref, spins_ref, jge_ref, jgo_ref, u_ref,
                          out_ref, *, gibbs):
    """Test-only two-sublattice variant: caller supplies the uniforms
    (``u_ref[0, c]`` = color c's sublattice-gathered uniforms)."""
    sys_idx = pl.program_id(0)
    inv_half_t = 1.0 / (0.5 * temp_ref[sys_idx])
    sE = spins_ref[0, 0].astype(jnp.float32)
    sO = spins_ref[0, 1].astype(jnp.float32)
    sE, sO = _kernel_body_2sub(
        sE, sO, jge_ref, jgo_ref, inv_half_t, lambda c: u_ref[0, c],
        gibbs=gibbs,
    )
    out_ref[0, 0] = sE.astype(jnp.int8)
    out_ref[0, 1] = sO.astype(jnp.int8)


def sweep_2d_two_sub_injected(spins, jgrids, sys_temps, uniforms, *, shape,
                              gibbs=False, interpret=False):
    """Two-sublattice kernel-equivalence entry.

    uniforms: ``f32 [n_systems, 2, H, W/2]`` — per color, the uniforms
    gathered at that color's sublattice sites (``pack_two_sub`` of the full
    per-color grid, slice 0 for color 0 / slice 1 for color 1).
    """
    h, w = shape
    wh = w // 2
    n_systems = spins.shape[0]
    s2 = pack_two_sub(spins.reshape(n_systems, h, w))
    jg2 = pack_coupling_grids_two_sub(jgrids)  # [2, 4, H, W/2]
    kernel = functools.partial(_kernel_2sub_injected, gibbs=gibbs)
    out = pl.pallas_call(
        kernel,
        grid=(n_systems,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, h, wh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h, wh), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h, wh), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, wh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, h, wh), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_systems, 2, h, wh), jnp.int8),
        interpret=interpret,
    )(sys_temps, s2, jg2[0], jg2[1], uniforms)
    return unpack_two_sub(out).reshape(n_systems, h * w)


def sweep_2d_injected(spins, jgrids, sys_temps, uniforms, *, shape, gibbs=False,
                      interpret=False):
    """Kernel-equivalence entry: uniforms ``f32 [n_systems, 2, H, W]``."""
    h, w = shape
    n_systems = spins.shape[0]
    s3 = spins.reshape(n_systems, h, w)
    kernel = functools.partial(_kernel_injected, gibbs=gibbs)
    out = pl.pallas_call(
        kernel,
        grid=(n_systems,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, h, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_systems, h, w), jnp.int8),
        interpret=interpret,
    )(sys_temps, s3, jgrids, uniforms)
    return out.reshape(n_systems, h * w)
