"""Pairs megakernel: N sweeps + pair measurement + PT on-chip, for replica
workloads (the spin-glass configs).

The 2D megakernel (:mod:`peapods_tpu.ops.pallas_mega`) excludes every config
with ``n_replicas >= 2`` because pair statistics need per-sweep spin access.
This kernel removes that exclusion the TPU way: *all* systems of one disorder
realization stay resident in VMEM, tiled per temperature with replicas packed
inside the tile at statically-known offsets, so the per-sweep overlap dot
products (q, q_l) are in-kernel elementwise products + masked reductions
between resident regions — no spins ever leave the chip between sweeps.
Overlap cluster moves (every ``interval`` sweeps) run *outside* between kernel
calls, which amortizes the per-sweep dispatch glue by ``interval`` (the
profiled dominant cost of the 8^3/16^3 driver configs; docs/performance.md).

This is the TPU analog of the reference's hot loop serving its dominant
spin-glass workload at full speed (``simulation/mod.rs:405-796`` with the
``UnitCouplingMetropolisLookup`` fast path, ``mcmc/sweep.rs:102-185``).

Layout
------

One kernel instance per disorder realization (grid = n_d).  Spins are stored
by slot ``(replica r, temperature t)``:

    spins_ref: i8 [1, n_temps, rp*L0, kp*block]     (block = L1*L2; 2D: W)

Replica ``r = b*kp + c`` occupies rows ``[b*L0, (b+1)*L0)`` and lanes
``[c*block, (c+1)*block)`` of its temperature's tile.  Pair partners
``(2p, 2p+1)`` are therefore adjacent lane groups (kp >= 2) or adjacent row
blocks (kp == 1) at static offsets.  A PT swap on edge ``(t, t+1)`` of
replica r's ladder exchanges region r of two adjacent tiles (dynamic
first-axis indices — supported), with sid/diagnostics bookkeeping exactly
like the 2D megakernel.  All replicas in one tile share that tile's
temperature, so ``inv_half_t`` is a per-tile scalar.

The per-sweep acceptance uniforms come from the hardware PRNG
(:func:`peapods_tpu.ops.pallas_sweep._hw_uniform`); PT's handful of scalar
draws per sweep use the murmur3-finalizer mix of the per-sweep threefry key
words (:func:`peapods_tpu.ops.pallas_mega._scalar_uniform`).  The engine
re-creates the *same* PT draws in jnp for event sweeps
(:func:`pt_event_jnp`), so interleaving overlap moves does not change the PT
trajectory — the observe-mode bitwise-invariance contract
(tests/test_sampling_interfaces.py) holds through this path.
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
from .pallas_sweep import _hw_uniform, _interp
from .pallas_mega import _scalar_randint, _scalar_uniform
from .pallas_sweep3d import _lane_shift_fns

__all__ = [
    "supports_megapair",
    "megapair_chunk",
    "pack_coupling_grids_mp",
    "pack_slots",
    "unpack_slots",
    "slots_to_tiles",
    "tiles_to_slots",
    "pt_event_jnp",
]


def _i32c(c):
    return np.uint32(c).astype(np.int32)


def _salted_uniform_i32(labels, s0, s1):
    """int32 re-expression of :func:`peapods_tpu.ops.cluster.salted_uniform`
    (bitwise identical; two's-complement mul/xor match uint32)."""
    srl = jax.lax.shift_right_logical
    x = labels ^ s0
    x = (x ^ srl(x, 16)) * _i32c(0x85EBCA6B)
    x = (x ^ srl(x, 13)) * _i32c(0xC2B2AE35)
    x = x ^ srl(x, 16) ^ s1
    x = (x ^ srl(x, 16)) * _i32c(0x7FEB352D)
    x = (x ^ srl(x, 15)) * _i32c(0x846CA68B)
    x = x ^ srl(x, 16)
    return srl(x, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


_EV_ROUNDS_PER_CHECK = 16

# event scalar columns (shared with ops.pallas_event)
_EV_S0, _EV_S1, _EV_S2, _EV_S3, _EV_SEED, _EV_K = range(6)

_HYPERCUBIC_2D = np.array([[1, 0], [0, 1]])
_HYPERCUBIC_3D = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]])

# VMEM budget for resident state (spins in+out, coupling grids, scratch);
# v5e has 16 MB more is risky with double-buffered pipelines.
_VMEM_BUDGET = 10 * 2**20


def _dims_of(lattice):
    """``(l0, l1, l2)`` with l2 == 1 encoding a 2D lattice, or None."""
    if lattice.n_dims == 2 and np.array_equal(lattice.offsets, _HYPERCUBIC_2D):
        return (lattice.shape[0], lattice.shape[1], 1)
    if lattice.n_dims == 3 and np.array_equal(lattice.offsets, _HYPERCUBIC_3D):
        return tuple(lattice.shape)
    return None


def supports_megapair(lattice, n_replicas, n_temps):
    """Eligibility: returns ``(kp, rp)`` (lane / row replica-pack factors,
    ``kp * rp == n_replicas``) or ``None``.

    Requirements: hypercubic 2D/3D; replicas divide into kp lane groups
    (kp = smallest count filling 128 lanes); the packed tile is 8-sublane
    aligned; everything fits the VMEM budget.
    """
    dims = _dims_of(lattice)
    if dims is None or n_replicas < 2:
        return None
    l0, l1, l2 = dims
    if l0 < 2 or l1 < 2:
        return None
    block = l1 * l2
    kp = 128 // math.gcd(128, block)
    if n_replicas % kp:
        return None
    rp = n_replicas // kp
    rows, lanes = rp * l0, kp * block
    if rows % 8:
        return None
    n_grids = 2 * (2 if l2 == 1 else 3)
    # _temp_group only ever picks a tg whose tiled grids fit the budget
    # (tg=1 included), so eligibility reduces to the base tg=1 footprint —
    # grouping must never shrink the supported config set.
    vmem = n_temps * rows * lanes * 2 + n_grids * rows * lanes * 4
    if vmem > _VMEM_BUDGET:
        return None
    return kp, rp


def pack_coupling_grids_mp(coup_fwd, shape, kp, rp):
    """``f32 [n_grids, rp*L0, kp*block]`` pre-shifted coupling grids.

    Per dimension: (bond arriving from the -d neighbor, own forward bond) —
    reference ``local_field`` (mcmc/sweep.rs:8-19).  Tiled across the kp lane
    and rp row replica regions once (all replicas of a realization share
    couplings).  2D lattices produce 4 grids, 3D lattices 6.
    """
    shape = tuple(shape)
    n_dims = len(shape)
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    grids = []
    for d in range(n_dims):
        fwd = coup_fwd[:, d].reshape(shape)
        grids.append(jnp.roll(fwd, 1, axis=d))
        grids.append(fwd)
    g = jnp.stack([x.reshape(l0, block) for x in grids])
    return jnp.tile(g, (1, rp, kp))


# ------------------------------------------------------------------ layout

def slots_to_tiles(slot_flat, l0, block, kp, rp):
    """``[..., R, T, n_spins] -> [..., T, rp*L0, kp*block]`` (pure reshape).

    Replica ``r = b*kp + c`` lands at row block b, lane group c.
    """
    lead = slot_flat.shape[:-3]
    n_temps = slot_flat.shape[-2]
    x = slot_flat.reshape(lead + (rp, kp, n_temps, l0, block))
    x = jnp.moveaxis(x, (-5, -4), (-4, -2))  # [..., T, rp, L0, kp, block]
    return x.reshape(lead + (n_temps, rp * l0, kp * block))


def tiles_to_slots(tiles, l0, block, kp, rp):
    """Inverse of :func:`slots_to_tiles`."""
    lead = tiles.shape[:-3]
    n_temps = tiles.shape[-3]
    x = tiles.reshape(lead + (n_temps, rp, l0, kp, block))
    x = jnp.moveaxis(x, (-4, -2), (-5, -4))  # [..., rp, kp, T, L0, block]
    return x.reshape(lead + (rp * kp, n_temps, l0 * block))


def pack_slots(spins, sid, l0, block, kp, rp):
    """By-system ``int8 [n_d, S, n_spins]`` + ``sid [n_d, R, T]`` -> slot
    tiles ``[n_d, T, rp*L0, kp*block]``."""
    slot_flat = jnp.take_along_axis(
        spins, sid.reshape(sid.shape[0], -1)[..., None], axis=1
    ).reshape(sid.shape + (spins.shape[-1],))
    return slots_to_tiles(slot_flat, l0, block, kp, rp)


def unpack_slots(tiles, sid, l0, block, kp, rp):
    """Slot tiles + final ``sid`` -> by-system ``int8 [n_d, S, n_spins]``."""
    slot_flat = tiles_to_slots(tiles, l0, block, kp, rp)
    n_d = tiles.shape[0]
    flat_sid = sid.reshape(n_d, -1)
    n_sp = slot_flat.shape[-1]
    out = jnp.zeros((n_d, flat_sid.shape[1], n_sp), slot_flat.dtype)
    return out.at[jnp.arange(n_d)[:, None], flat_sid].set(
        slot_flat.reshape(n_d, -1, n_sp)
    )


# ------------------------------------------------------------------- body

def _row_shift_fns(rows, l0, row):
    """Seam-corrected i +- 1 neighbor-value helpers (rp row blocks stack
    independent systems; the periodic wrap must stay within a block)."""
    if rows == l0:
        return (lambda x: pltpu.roll(x, 1, 0),
                lambda x: pltpu.roll(x, l0 - 1, 0))
    i_coord = jax.lax.rem(row, np.int32(l0))
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

    return im, ip


def _mp_geometry(rows, lanes, l0, l1, l2):
    """Shift helpers + checkerboard parity for one packed tile."""
    block = l1 * l2
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    (jm, jp, km, kp_), parity_jk = _lane_shift_fns(col, block, l1, l2)
    im, ip = _row_shift_fns(rows, l0, row)
    parity = (jax.lax.rem(row, np.int32(l0)) + parity_jk) & 1
    return (im, ip, jm, jp, km, kp_), parity, row, col


def _mp_body(s, jg, inv_half_t, uniform_for_color, shifts, parity, *,
             gibbs, two_dim, with_energy=False):
    """Both-color update of one packed tile; mirrors
    :func:`peapods_tpu.ops.pallas_sweep3d._body_3d` (2D skips the k terms).

    ``with_energy=True`` also returns the per-site positive forward-bond
    energy contributions of the post-sweep state (nonzero at odd-parity
    sites only — every bond joins one even and one odd site, so summing
    ``s_final * field`` over odd sites counts each bond exactly once).
    """
    keep = np.float32(1.0 - METROPOLIS_LAZINESS)
    im, ip, jm, jp, km, kp_ = shifts
    e_site = None
    for c in range(2):
        field = (
            im(s) * jg[0]
            + ip(s) * jg[1]
            + jm(s) * jg[2]
            + jp(s) * jg[3]
        )
        if not two_dim:
            field = field + km(s) * jg[4] + kp_(s) * jg[5]
        x = -s * field * inv_half_t
        u = uniform_for_color(c)
        if gibbs:
            p = jax.nn.sigmoid(x)
        else:
            p = keep * jnp.exp(jnp.minimum(x, 0.0))
        flip = (u < p) & (parity == c)
        s = jnp.where(flip, -s, s)
        if with_energy and c == 1:
            e_site = jnp.where(parity == 1, s * field, 0.0)
    if with_energy:
        return s, e_site
    return s


def _region_index(row, col, l0, block, kp):
    """Replica index ``b*kp + c`` per site of a packed tile."""
    return (row // l0) * kp + col // block


def _temp_group(n_temps, rows, lanes, n_grids, ev_tiles=0):
    """Static count of temperature slabs flattened into one sweep tile.

    Per-temperature [rows, lanes] tiles are tiny for small lattices (8^3:
    4 vregs) and their serial roll->mul->add chains leave the VPU latency-
    bound — measured 0.67 ms/sweep at 8^3 vs 0.73 at 16^3 despite 8x fewer
    sites.  Flattening ``tg`` slabs into one [tg*rows, lanes] tile amortizes
    the chain latency; the row cap bounds live f32 temporaries, and the
    VMEM-budget cap keeps the tg-tiled coupling grids from pricing large
    lattices out of megapair eligibility (tg=1 must stay exactly as
    eligible as before grouping existed).

    ``ev_tiles``: extra live [tg*rows, lanes] 4-byte tiles the in-kernel
    event path holds per temperature group (the hoisted per-mode draw
    streams plus the shared spin tile and the CC/flip temporaries) — the
    round-5 masked event design keeps every mode's draws live across the
    branch chain, and an un-charged tg=8 at the 16^3 full-ladder config
    overflowed the 16 MB scoped VMEM stack by 0.5 MB.  Charging them here
    picks the largest tg whose event stack still fits (tg=4 there).
    """
    spins_vmem = n_temps * rows * lanes * 2
    tg = 1
    for cand in range(1, n_temps + 1):
        if (
            n_temps % cand == 0
            and cand * rows <= 512
            and spins_vmem
            + (n_grids + ev_tiles) * cand * rows * lanes * 4
            <= _VMEM_BUDGET
        ):
            tg = cand
    return tg


# ------------------------------------------------------------------ kernel

def _mp_kernel(
    # SMEM operands (per-disorder arrays ride a singleton middle axis so the
    # grid can block them: block (1, 1, X) has last-two dims equal to the
    # array's (1, X), which Mosaic accepts — whole-array SMEM would multiply
    # every instance's SMEM footprint by n_d and throttle n_inner)
    seeds_ref,      # i32 [1, 1, 2*n_inner]   sweep PRNG words
    ptw_ref,        # i32 [1, 1, 2*n_inner]   PT mixer words
    temps_ref,      # f32 [1, n_temps]        (shared, whole-array)
    meta_ref,       # i32 [1, 1, 2]           (sweep_base, n_active)
    sid_in_ref,     # i32 [1, 1, n_slots]     system at slot r*n_temps + t
    ea_in_ref,      # i32 [1, 1, n_edges_pad]
    ec_in_ref,      # i32 [1, 1, n_edges_pad]
    rt_in_ref,      # i32 [1, 1, n_systems]   round trips (by system)
    ts_in_ref,      # i32 [1, 1, n_systems]   trip state (by system)
    par_in_ref,     # i32 [1, 1, 1]
    # VMEM
    spins_ref,      # i8 [1, n_temps, rows, lanes]
    jg_ref,         # f32 [1, n_grids, rows, lanes]
    # event operands (present iff ev_kinds), then outputs — see below
    *rest,
    gibbs, n_inner, n_temps, n_replicas, n_pairs, n_edges, l0, l1, l2,
    kp, rp, tg, pt_interval, pt_full, hot_slot, cold_slot, n_systems,
    ev_kinds=None, ev_wolff=False, ev_inject=False,
):
    block = l1 * l2
    rows, lanes = rp * l0, kp * block
    n_slots = n_replicas * n_temps
    n_spins = l0 * block
    two_dim = l2 == 1

    refs = list(rest)
    ev_needs_words = (
        bool(ev_kinds)
        and not ev_inject
        and any(k != "houdayer" for k in ev_kinds)
    )
    ev_probes_on = (
        bool(ev_kinds)
        and ev_wolff
        and any(k in ("houdayer", "jorg") for k in ev_kinds)
    )
    if ev_kinds:
        ev_mode_ref = refs.pop(0)    # i32 [1, 1, 1]
        ev_perm_ref = refs.pop(0)    # i32 [1, 1, T*R]   canonical pos -> replica
        ev_iperm_ref = refs.pop(0)   # i32 [1, 1, T*R]   replica -> canonical pos
        ev_scal_ref = refs.pop(0)    # i32 [1, 1, T*n_pairs*6]
        ev_words_ref = refs.pop(0) if ev_needs_words else None
        if ev_probes_on:
            ev_probes_ref = refs.pop(0)  # i32 [1, 1, T*n_pairs*64]
            ev_rank_ref = refs.pop(0)    # i8  [1, n_temps, rows, lanes]
        if ev_inject:
            ev_u_ref = refs.pop(0)   # f32 [1, n_u, n_temps, rows, lanes]
    (spins_out_ref,
     e_out_ref,      # f32 [1, n_inner, n_slots]  SMEM
     m_out_ref,      # i32 [1, n_inner, n_slots]  SMEM
     qs_out_ref,     # i32 [1, n_inner, n_pairs*n_temps]  SMEM
     ql_out_ref,     # i32 [1, n_inner, n_pairs*n_temps]  SMEM
     sid_out_ref, ea_out_ref, ec_out_ref, rt_out_ref, ts_out_ref,
     par_out_ref) = refs

    def body(es_ref):
        # State flows by explicit copy-in (inputs are NOT aliased to the
        # outputs: alias + lax.scan iteration deadlocks on hardware, see the
        # pallas_call note below).
        spins_out_ref[...] = spins_ref[...]

        def _copy_smem(dst, src, n):
            def cp(i, _):
                dst[0, 0, i] = src[0, 0, i]
                return 0

            jax.lax.fori_loop(0, n, cp, 0)

        _copy_smem(sid_out_ref, sid_in_ref, n_slots)
        _copy_smem(ea_out_ref, ea_in_ref, max(n_edges, 1))
        _copy_smem(ec_out_ref, ec_in_ref, max(n_edges, 1))
        _copy_smem(rt_out_ref, rt_in_ref, n_systems)
        _copy_smem(ts_out_ref, ts_in_ref, n_systems)
        par_out_ref[0, 0, 0] = par_in_ref[0, 0, 0]
        sweep_base = meta_ref[0, 0, 0]
        n_active = meta_ref[0, 0, 1]

        shifts, parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
        sub = _region_index(row, col, l0, block, kp)
        region_masks = [sub == r for r in range(n_replicas)]

        def record_arrival_hot(sys):
            prev = ts_out_ref[0, 0, sys]

            @pl.when(prev == 2)
            def _():
                rt_out_ref[0, 0, sys] = rt_out_ref[0, 0, sys] + 1

            ts_out_ref[0, 0, sys] = 1

        def record_arrival_cold(sys):
            prev = ts_out_ref[0, 0, sys]

            @pl.when(prev == 1)
            def _():
                ts_out_ref[0, 0, sys] = 2

        def _edge_scalars(r, e, w0, w1, salt):
            """Scalar half of a PT attempt on replica r's ladder edge e
            (tempering.rs:73-102): counters, es/sid swaps, arrivals.
            Returns the accept scalar; the caller swaps spin regions."""
            u = _scalar_uniform(w0, w1, salt)
            t1 = temps_ref[0, e]
            t2 = temps_ref[0, e + 1]
            sl = r * n_temps + e
            delta = (
                np.float32(n_spins)
                * (es_ref[0, sl + 1] - es_ref[0, sl])
                * (1.0 / t1 - 1.0 / t2)
            )
            ea_out_ref[0, 0, e] = ea_out_ref[0, 0, e] + 1
            accept = delta >= jnp.log(u)

            @pl.when(accept)
            def _():
                ec_out_ref[0, 0, e] = ec_out_ref[0, 0, e] + 1
                el = es_ref[0, sl]
                es_ref[0, sl] = es_ref[0, sl + 1]
                es_ref[0, sl + 1] = el
                sv = sid_out_ref[0, 0, sl]
                sid_out_ref[0, 0, sl] = sid_out_ref[0, 0, sl + 1]
                sid_out_ref[0, 0, sl + 1] = sv

                @pl.when((e == hot_slot) | (e + 1 == hot_slot))
                def _():
                    record_arrival_hot(
                        sid_out_ref[0, 0, r * n_temps + hot_slot]
                    )

                @pl.when((e == cold_slot) | (e + 1 == cold_slot))
                def _():
                    record_arrival_cold(
                        sid_out_ref[0, 0, r * n_temps + cold_slot]
                    )

            return accept

        def try_edge_all_r(e, w0, w1, salt_of_r):
            """All replicas' PT attempts on edge e, then ONE masked region
            exchange of tiles e / e+1 (regions are disjoint, so deferring
            the spin swap past the scalar loop is exact) — R tile-pair
            writes per accepted edge become one."""
            # accumulate in i32 — Mosaic has no select on i1 vectors
            mask = jnp.zeros((rows, lanes), jnp.int32)
            any_acc = jnp.bool_(False)
            for r in range(n_replicas):
                accept = _edge_scalars(r, e, w0, w1, salt_of_r(r))
                mask = mask | (
                    region_masks[r].astype(jnp.int32) * accept.astype(jnp.int32)
                )
                any_acc = any_acc | accept

            @pl.when(any_acc)
            def _():
                swap = mask != 0
                tl = spins_out_ref[0, e]
                tr = spins_out_ref[0, e + 1]
                spins_out_ref[0, e] = jnp.where(swap, tr, tl)
                spins_out_ref[0, e + 1] = jnp.where(swap, tl, tr)

        def try_edge(r, e, w0, w1, salt):
            """Single replica PT attempt + its own region swap (the
            random-edge schedule: replicas may draw the SAME edge, so the
            swap cannot be deferred across replicas)."""
            accept = _edge_scalars(r, e, w0, w1, salt)

            @pl.when(accept)
            def _():
                mask = region_masks[r]
                tl = spins_out_ref[0, e]
                tr = spins_out_ref[0, e + 1]
                spins_out_ref[0, e] = jnp.where(mask, tr, tl)
                spins_out_ref[0, e + 1] = jnp.where(mask, tl, tr)

        # --- temp-batched sweep geometry: tg temperature slabs flattened
        # into ONE [tg*rows, lanes] tile per color pass.  Per-temperature
        # tiles are latency-bound for small lattices (see _temp_group); the
        # i-shift seam helpers already handle arbitrary stacked l0-blocks,
        # so the flattened view reuses them unchanged.  Everything here is
        # static: group offsets, slot indices, and the per-slot row windows.
        gN = tg * rows
        n_tgroups = n_temps // tg
        shifts_g, parity_g, row_g, col_g = _mp_geometry(gN, lanes, l0, l1, l2)
        lane_group_g = col_g // np.int32(block)
        slab_g1 = row_g[:, :1] // np.int32(rows)

        def inv_tile(g0):
            """[gN, 1] per-row 1/(T/2) for slabs g0..g0+tg-1 (hoisted)."""
            inv = jnp.zeros((gN, 1), jnp.float32)
            for tl in range(tg):
                inv = jnp.where(
                    slab_g1 == tl, 1.0 / (0.5 * temps_ref[0, g0 + tl]), inv
                )
            return inv

        inv_tiles = [inv_tile(g * tg) for g in range(n_tgroups)]

        def partner_flat(s):
            """Pair-partner values on the flattened tile: replica 2p reads
            2p+1 and vice versa.  Partner regions are adjacent lane groups
            (kp >= 2) or adjacent l0-row blocks within a slab (kp == 1) —
            the selected global rolls never cross slab boundaries because
            even b reads b+1 and odd b reads b-1."""
            if kp >= 2:
                c_even = (lane_group_g & 1) == 0
                return jnp.where(
                    c_even,
                    pltpu.roll(s, lanes - block, 1),
                    pltpu.roll(s, block, 1),
                )
            b_local = jax.lax.rem(row_g, np.int32(rows)) // np.int32(l0)
            return jnp.where(
                (b_local & 1) == 0,
                pltpu.roll(s, gN - l0, 0),
                pltpu.roll(s, l0, 0),
            )

        def slot_sums_g(x, even_only=False):
            """{(t_local, r): scalar sum} over replica regions of a
            flattened group tile: kp masked lane reductions to [gN, 1],
            then static [l0, 1] row-window sums per slot."""
            out = {}
            for c in range(kp):
                if even_only and kp > 1 and all(
                    (b * kp + c) % 2 for b in range(rp)
                ):
                    continue
                part = x if kp == 1 else jnp.where(lane_group_g == c, x, 0.0)
                part = part.sum(axis=1, keepdims=True)  # [gN, 1]
                for tl in range(tg):
                    for b in range(rp):
                        r = b * kp + c
                        if even_only and r % 2:
                            continue
                        s0 = tl * rows + b * l0
                        out[(tl, r)] = part[s0:s0 + l0].sum()
            return out

        def sweep_and_measure(t):
            pltpu.prng_seed(seeds_ref[0, 0, 2 * t], seeds_ref[0, 0, 2 * t + 1])

            for g in range(n_tgroups):
                g0 = g * tg
                s = (
                    spins_out_ref[0, g0:g0 + tg]
                    .reshape(gN, lanes)
                    .astype(jnp.float32)
                )
                s, e_site = _mp_body(
                    s, jg_ref[0], inv_tiles[g],
                    lambda c: _hw_uniform((gN, lanes)),
                    shifts_g, parity_g, gibbs=gibbs, two_dim=two_dim,
                    with_energy=True,
                )
                spins_out_ref[0, g0:g0 + tg] = s.astype(jnp.int8).reshape(
                    tg, rows, lanes
                )
                e_sums = slot_sums_g(e_site)
                m_sums = slot_sums_g(s)
                for tl in range(tg):
                    for r in range(n_replicas):
                        slot = r * n_temps + g0 + tl
                        ev = e_sums[(tl, r)] / np.float32(n_spins)
                        es_ref[0, slot] = ev
                        e_out_ref[0, t, slot] = ev
                        m_out_ref[0, t, slot] = m_sums[(tl, r)].astype(
                            jnp.int32
                        )

                # pair measurement (overlap.rs:251-333): q and q_l between
                # resident partner regions; q_site is symmetric within a
                # pair, so only the even replica's region is summed.
                partner = partner_flat(s)
                q_site = s * partner
                im, ip, jm, jp, km, kp_ = shifts_g
                nbr_q = ip(q_site) + jp(q_site)
                if not two_dim:
                    nbr_q = nbr_q + kp_(q_site)
                l_site = q_site * nbr_q
                q_sums = slot_sums_g(q_site, even_only=True)
                l_sums = slot_sums_g(l_site, even_only=True)
                for tl in range(tg):
                    for p in range(n_pairs):
                        col_i = p * n_temps + g0 + tl
                        qs_out_ref[0, t, col_i] = q_sums[(tl, 2 * p)].astype(
                            jnp.int32
                        )
                        ql_out_ref[0, t, col_i] = l_sums[(tl, 2 * p)].astype(
                            jnp.int32
                        )

        def pt_at(t):
            if pt_interval is not None:
                w0 = ptw_ref[0, 0, 2 * t]
                w1 = ptw_ref[0, 0, 2 * t + 1]

                @pl.when(
                    jax.lax.rem(sweep_base + t, np.int32(pt_interval)) == 0
                )
                def _():
                    if pt_full:
                        parity_pt = par_out_ref[0, 0, 0]

                        def one_pass(i, _):
                            p = jax.lax.select(i == 0, parity_pt,
                                               1 - parity_pt)

                            def one_edge(e, _):
                                @pl.when(jax.lax.rem(e, 2) == p)
                                def _():
                                    try_edge_all_r(
                                        e, w0, w1,
                                        lambda r: (
                                            i * n_edges + e
                                        ) * n_replicas + r,
                                    )

                                return 0

                            jax.lax.fori_loop(0, n_edges, one_edge, 0)
                            return 0

                        jax.lax.fori_loop(0, 2, one_pass, 0)
                        par_out_ref[0, 0, 0] = 1 - parity_pt
                    else:
                        for r in range(n_replicas):
                            e = _scalar_randint(w0, w1, r, n_edges)
                            try_edge(r, e, w0, w1, n_replicas + r)

        def sweep_t(t, _):
            sweep_and_measure(t)
            pt_at(t)
            return 0

        # ---------------------------------------------- in-kernel overlap
        # event (ev_kinds set): the whole per-interval block — sweep 0 ->
        # pair overlap move -> PT -> remaining sweeps — runs in ONE kernel,
        # the TPU counterpart of the reference sweep order
        # (simulation/mod.rs:405-796 with the overlap move at
        # sweep % interval == 0, clusters/overlap.rs:64-144).  The random
        # per-temperature pairing is canonicalized by a masked region
        # permutation (positions (2p, 2p+1) are the static partner layout),
        # the move runs on resident tiles, and the inverse permutation
        # restores replica order.  Mode selection is maskless control flow:
        # every mode body always runs its elementwise work (so the uniform
        # draw streams are identical whichever mode is selected) and only
        # the selected mode's flips apply — no lax.cond around the CC
        # while_loops.  The expensive part IS gated: each mode's CC
        # while_loop seeds its continue flag with the mode-select scalar,
        # so an unselected mode's fixed point runs zero rounds (see ev_cc).
        if ev_kinds:
            b_local_g = (
                jax.lax.rem(row_g, np.int32(rows)) // np.int32(l0)
            )
            pos_tile = b_local_g * np.int32(kp) + lane_group_g
            pair_tile = pos_tile // 2
            if kp >= 2:
                even_mask = (lane_group_g & 1) == 0
            else:
                even_mask = (b_local_g & 1) == 0
            local_site = jax.lax.rem(row_g, np.int32(l0)) * np.int32(
                block
            ) + jax.lax.rem(col_g, np.int32(block))
            im_g, ip_g, jm_g, jp_g, km_g, kpf_g = shifts_g
            n_dims = 2 if two_dim else 3
            ev_fwd = [ip_g, jp_g, kpf_g][:n_dims]
            ev_bwd = [im_g, jm_g, km_g][:n_dims]
            big = jnp.int32(n_spins)

            def shift_mask(f, m):
                return f(m.astype(jnp.int32)) != 0

            def pmate(m):
                """Partner-region copy of a (bool) mask tile."""
                return partner_flat(m.astype(jnp.int32)) != 0

            def ev_apply(s, flip, gate):
                """Masked flip: ``gate`` is a scalar bool (mode select +
                sentinel-block guard) — scalar*vector i32, the kernel's
                select-free masking pattern (Mosaic has no scalar-bool
                select on vectors)."""
                m = flip.astype(jnp.int32) * gate.astype(jnp.int32)
                return jnp.where(m != 0, -s, s)

            def pbcast(g0, col_i):
                """Per-pair event scalar broadcast to a group tile."""
                v = jnp.zeros((gN, lanes), jnp.int32)
                for tl in range(tg):
                    for p in range(n_pairs):
                        off = ((g0 + tl) * n_pairs + p) * 6 + col_i
                        v = jnp.where(
                            (slab_g1 == tl) & (pair_tile == p),
                            ev_scal_ref[0, 0, off], v,
                        )
                return v

            def pair_mins(g0, x):
                """{(tl, p): scalar} min over pair p's even region."""
                out = {}
                for p in range(n_pairs):
                    je = 2 * p
                    be, ce = je // kp, je % kp
                    part = x if kp == 1 else jnp.where(
                        lane_group_g == ce, x, jnp.int32(127)
                    )
                    part = part.min(axis=1, keepdims=True)
                    for tl in range(tg):
                        s0_ = tl * rows + be * l0
                        out[(tl, p)] = part[s0_:s0_ + l0].min()
                return out

            def wolff_seed_tile(g0, active_even):
                """First-active-probe Wolff seed per pair, bitwise the staged
                find_seed (clusters/utils.rs:107-119): the 64 probe indices
                were drawn outside from the task key; the rank tile holds
                min{p: probes[p] == site}, so the per-pair min of ranks over
                active sites IS the first hitting probe."""
                rank = ev_rank_ref[0, g0:g0 + tg].reshape(gN, lanes).astype(
                    jnp.int32
                )
                prio = jnp.where(active_even, rank, jnp.int32(127))
                mins = pair_mins(g0, prio)
                st = jnp.full((gN, lanes), big, jnp.int32)
                for tl in range(tg):
                    for p in range(n_pairs):
                        toff = ((g0 + tl) * n_pairs + p) * 64
                        pstar = mins[(tl, p)]
                        idx = toff + jnp.minimum(pstar, jnp.int32(63))
                        sd = jnp.where(
                            pstar < 127, ev_probes_ref[0, 0, idx], big
                        )
                        st = jnp.where(
                            (slab_g1 == tl) & (pair_tile == p), sd, st
                        )
                return st

            def ev_cc(bonds, seed_tile, gate):
                """Min-label fixed point over the even pair regions (rolls
                are region-confined by the seam-corrected shift helpers).

                ``gate`` (scalar bool: this mode is the round-robin
                selection) seeds the while_loop's continue flag, so an
                UNSELECTED mode's fixed point starts converged and its body
                never runs — the mode's uniform draws (which precede CC)
                still happen, keeping every draw stream identical, and its
                labels feed only flips that ``ev_apply`` nulls, so the
                selected trajectory is bitwise unchanged."""
                ab = [shift_mask(ev_bwd[d], bonds[d]) for d in range(n_dims)]
                if seed_tile is None:
                    init = local_site
                else:
                    init = jnp.where(
                        even_mask & (local_site == seed_tile),
                        jnp.int32(-1), local_site,
                    )

                def propagate(lab):
                    new = lab
                    for d in range(n_dims):
                        lf = jnp.where(bonds[d], ev_fwd[d](lab), big)
                        lb = jnp.where(ab[d], ev_bwd[d](lab), big)
                        new = jnp.minimum(new, jnp.minimum(lf, lb))
                    return new

                def cc_body(carry):
                    lab, _ = carry
                    new = lab
                    for _ in range(_EV_ROUNDS_PER_CHECK):
                        new = propagate(new)
                    return new, jnp.any(new != lab)

                labels, _ = jax.lax.while_loop(
                    lambda c: c[1], cc_body, (init, gate)
                )
                return labels

            def ev_nonsingleton(bonds):
                inc = bonds[0]
                for d in range(1, n_dims):
                    inc = inc | bonds[d]
                for d in range(n_dims):
                    inc = inc | shift_mask(ev_bwd[d], bonds[d])
                return inc

            def make_ev_uniform(g0):
                """Per-group draw stream: hardware PRNG, or (tests) injected
                uniforms in spins-tile layout — slot i, slabs g0..g0+tg-1.
                Injected counters reset per group (the same logical per-task
                fields serve every temperature group)."""
                if not ev_inject:
                    return lambda: _hw_uniform((gN, lanes))
                ctr = [0]

                def u():
                    i = ctr[0]
                    ctr[0] += 1
                    return ev_u_ref[0, i, g0:g0 + tg].reshape(gN, lanes)

                return u

            def ev_jt(g0):
                """Per-site J/T grids (forward bonds) of a group tile."""
                return [
                    jg_ref[0, 2 * d + 1] * (0.5 * inv_tiles[g0 // tg])
                    for d in range(n_dims)
                ]

            def ev_permute(s, table_ref, g0):
                """Masked region permutation: target position j reads the
                region ``table[t, j]`` of its own temperature slab."""
                out = jnp.zeros_like(s)
                rolled = {}
                for j in range(n_replicas):
                    bj, cj = j // kp, j % kp
                    for src in range(n_replicas):
                        bs, cs = src // kp, src % kp
                        sr = ((bj - bs) * l0) % gN
                        sl = ((cj - cs) * block) % lanes
                        if (sr, sl) not in rolled:
                            v = s
                            if sr:
                                v = pltpu.roll(v, sr, 0)
                            if sl:
                                v = pltpu.roll(v, sl, 1)
                            rolled[(sr, sl)] = v
                        cond_col = jnp.zeros((gN, 1), jnp.int32)
                        for tl in range(tg):
                            cnd = (
                                table_ref[0, 0, (g0 + tl) * n_replicas + j]
                                == src
                            )
                            cond_col = jnp.where(
                                slab_g1 == tl, cnd.astype(jnp.int32),
                                cond_col,
                            )
                        m = (pos_tile == j) & (cond_col != 0)
                        out = jnp.where(m, rolled[(sr, sl)], out)
                return out

            def ev_houdayer(s, g0, gate, uni):
                """Houdayer pair move (overlap.rs:146-339, g=2): active
                sites sigma != tau, deterministic bonds — bitwise the
                staged path end-to-end."""
                b_vals = partner_flat(s)
                active = ((s * b_vals) < 0) & even_mask
                bonds = [
                    active & shift_mask(ev_fwd[d], active)
                    for d in range(n_dims)
                ]
                if ev_wolff:
                    labels = ev_cc(bonds, wolff_seed_tile(g0, active), gate)
                    flip = labels == -1
                else:
                    labels = ev_cc(bonds, None, gate)
                    coin = _salted_uniform_i32(
                        labels, pbcast(g0, _EV_S0), pbcast(g0, _EV_S1)
                    ) < 0.5
                    flip = coin & ev_nonsingleton(bonds) & even_mask
                return ev_apply(s, flip | pmate(flip), gate)

            def ev_jorg(s, g0, gate, uni):
                """Joerg pair move (overlap.rs:341-553): stochastic bonds
                p = 1 - exp(-4 J sigma_i sigma_j / T) on satisfied active
                bonds (hardware-PRNG uniforms, like ops.pallas_event)."""
                b_vals = partner_flat(s)
                active = ((s * b_vals) < 0) & even_mask
                jt = ev_jt(g0)
                sf = s.astype(jnp.float32)
                bonds = []
                for d in range(n_dims):
                    inter = sf * ev_fwd[d](sf) * jt[d]
                    p = 1.0 - jnp.exp(-4.0 * inter)
                    bonds.append(
                        (inter > 0.0)
                        & (uni() < p)
                        & active
                        & shift_mask(ev_fwd[d], active)
                    )
                if ev_wolff:
                    labels = ev_cc(bonds, wolff_seed_tile(g0, active), gate)
                    flip = labels == -1
                else:
                    labels = ev_cc(bonds, None, gate)
                    coin = _salted_uniform_i32(
                        labels, pbcast(g0, _EV_S0), pbcast(g0, _EV_S1)
                    ) < 0.5
                    flip = coin & ev_nonsingleton(bonds) & even_mask
                return ev_apply(s, flip | pmate(flip), gate)

            def ev_cmr(s, g0, gate, uni):
                """CMR two-phase move (overlap.rs:555-963): blue bonds on
                doubly-satisfied edges w.p. 1-r^2, joint blue flip, red
                extension w.p. 1-r post-flip, grey k-flips."""
                jt = ev_jt(g0)
                r_d = [jnp.exp(-2.0 * jnp.abs(jt[d])) for d in range(n_dims)]

                def sats(av, bv):
                    a_s, b_s = [], []
                    for d in range(n_dims):
                        a_s.append(av * ev_fwd[d](av) * jt[d] > 0.0)
                        b_s.append(bv * ev_fwd[d](bv) * jt[d] > 0.0)
                    return a_s, b_s

                af = s.astype(jnp.float32)
                bf = partner_flat(s).astype(jnp.float32)
                a_sat, b_sat = sats(af, bf)
                blue = [
                    a_sat[d] & b_sat[d]
                    & (uni() < 1.0 - r_d[d] * r_d[d])
                    & even_mask
                    for d in range(n_dims)
                ]
                seed_tile = pbcast(g0, _EV_SEED) if ev_wolff else None
                if ev_wolff:
                    blue_labels = ev_cc(blue, seed_tile, gate)
                    bflip = (blue_labels == -1) & even_mask
                else:
                    blue_labels = ev_cc(blue, None, gate)
                    coin = _salted_uniform_i32(
                        blue_labels, pbcast(g0, _EV_S0), pbcast(g0, _EV_S1)
                    ) < 0.5
                    bflip = coin & ev_nonsingleton(blue) & even_mask
                s = ev_apply(s, bflip | pmate(bflip), gate)

                af = s.astype(jnp.float32)
                bf = partner_flat(s).astype(jnp.float32)
                a_sat, b_sat = sats(af, bf)
                grey = [
                    blue[d]
                    | (
                        (a_sat[d] != b_sat[d])
                        & (uni() < 1.0 - r_d[d])
                        & even_mask
                    )
                    for d in range(n_dims)
                ]
                if ev_wolff:
                    grey_labels = ev_cc(grey, seed_tile, gate)
                    in_grey = (grey_labels == -1) & even_mask
                    kq = pbcast(g0, _EV_K)
                    flip_a = in_grey & ((kq & 1) != 0)
                    flip_b = in_grey & ((kq & 2) != 0)
                else:
                    grey_labels = ev_cc(grey, None, gate)
                    u = _salted_uniform_i32(
                        grey_labels, pbcast(g0, _EV_S2), pbcast(g0, _EV_S3)
                    )
                    kq = (u * 4.0).astype(jnp.int32)
                    ns = ev_nonsingleton(grey) & even_mask
                    flip_a = ns & ((kq & 1) != 0)
                    flip_b = ns & ((kq & 2) != 0)
                return ev_apply(s, flip_a | pmate(flip_b), gate)

            ev_bodies = {
                "houdayer": ev_houdayer, "jorg": ev_jorg, "cmr": ev_cmr,
            }

            def run_overlap_event():
                if ev_needs_words:
                    pltpu.prng_seed(
                        ev_words_ref[0, 0, 0], ev_words_ref[0, 0, 1]
                    )
                mode_scal = ev_mode_ref[0, 0, 0]
                ev_on = n_active > 0
                n_u = {"houdayer": 0, "jorg": n_dims, "cmr": 2 * n_dims}
                for g in range(n_tgroups):
                    g0 = g * tg
                    uni = make_ev_uniform(g0)
                    # Per-mode masking (round 5): the draw stream is
                    # hoisted — every mode's uniforms are drawn whether
                    # selected or not, in the exact body order of the old
                    # maskless design (bitwise-identical streams) — and
                    # each mode's BODY (permute, bonds, CC, flips,
                    # inverse permute) runs under pl.when on its
                    # mode-select scalar, so unselected round-robin modes
                    # cost only their draws.  No mode selected (sentinel
                    # blocks / ev_on false): the ref is never written, the
                    # identity the old permute+inverse pair computed.
                    drawn = {
                        kind: [uni() for _ in range(n_u[kind])]
                        for kind in ev_kinds
                    }
                    # the spin-tile read is shared by every mode branch
                    # (hoisting it shaved the kernel's VMEM stack back
                    # under the 16M scoped limit at the full-ladder 16^3
                    # config, where per-branch copies overflowed by 4K)
                    s0 = (
                        spins_out_ref[0, g0:g0 + tg]
                        .reshape(gN, lanes)
                        .astype(jnp.int32)
                    )
                    for ki, kind in enumerate(ev_kinds):

                        @pl.when(ev_on & (mode_scal == ki))
                        def _(ki=ki, kind=kind, g0=g0):
                            tiles = iter(drawn[kind])
                            s = ev_permute(s0, ev_perm_ref, g0)
                            s = ev_bodies[kind](
                                s, g0, jnp.bool_(True),
                                lambda: next(tiles),
                            )
                            s = ev_permute(s, ev_iperm_ref, g0)
                            spins_out_ref[0, g0:g0 + tg] = s.astype(
                                jnp.int8
                            ).reshape(tg, rows, lanes)

            def recompute_es():
                """Post-event per-slot energies (the move mutated spins, so
                PT must re-derive them — mod.rs:748-754)."""
                for g in range(n_tgroups):
                    g0 = g * tg
                    s = (
                        spins_out_ref[0, g0:g0 + tg]
                        .reshape(gN, lanes)
                        .astype(jnp.float32)
                    )
                    e_site = s * ev_fwd[0](s) * jg_ref[0, 1]
                    for d in range(1, n_dims):
                        e_site = e_site + s * ev_fwd[d](s) * jg_ref[
                            0, 2 * d + 1
                        ]
                    e_sums = slot_sums_g(e_site)
                    for tl in range(tg):
                        for r in range(n_replicas):
                            slot = r * n_temps + g0 + tl
                            es_ref[0, slot] = e_sums[(tl, r)] / np.float32(
                                n_spins
                            )

        if ev_kinds:
            @pl.when(n_active > 0)
            def _():
                sweep_and_measure(0)

            run_overlap_event()
            if pt_interval is not None:
                # the move mutated spins; PT must re-derive energies
                # (mod.rs:748-754) — skipped entirely when PT is off, and
                # for sentinel-padded blocks (PT only reads es under
                # n_active > 0, so gating is output-neutral)
                @pl.when(n_active > 0)
                def _():
                    recompute_es()

            @pl.when(n_active > 0)
            def _():
                pt_at(0)

            jax.lax.fori_loop(1, n_active, sweep_t, 0)
        else:
            jax.lax.fori_loop(0, n_active, sweep_t, 0)

        # zero the output rows of inactive (sentinel-padded) sweeps
        def zero_t(t, _):
            def zero_slot(i, _):
                e_out_ref[0, t, i] = 0.0
                m_out_ref[0, t, i] = 0
                return 0

            def zero_pair(i, _):
                qs_out_ref[0, t, i] = 0
                ql_out_ref[0, t, i] = 0
                return 0

            jax.lax.fori_loop(0, n_slots, zero_slot, 0)
            jax.lax.fori_loop(0, n_pairs * n_temps, zero_pair, 0)
            return 0

        jax.lax.fori_loop(n_active, n_inner, zero_t, 0)

    pl.run_scoped(body, es_ref=pltpu.SMEM((1, n_slots), jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "gibbs", "n_inner", "n_temps", "n_replicas", "kp", "rp",
        "pt_interval", "pt_full", "hot_slot", "cold_slot", "interpret", "tg",
        "ev_kinds", "ev_wolff",
    ),
)
def megapair_chunk(
    spins_tiles, jgrids, temps, seeds, pt_words, meta,
    sid, ea, ec, rtrips, tstate, parity,
    ev_mode=None, ev_perm=None, ev_iperm=None, ev_scal=None, ev_words=None,
    ev_probes=None, ev_rank=None, ev_u=None,
    *,
    shape, gibbs, n_inner, n_temps, n_replicas, kp, rp, pt_interval,
    pt_full, hot_slot, cold_slot, interpret=False, tg=None,
    ev_kinds=None, ev_wolff=False,
):
    """Run ``n_inner`` sweeps (+ fused pair measurement + PT) per realization.

    All array args carry a leading disorder axis (the kernel grid).
    ``spins_tiles``: int8 ``[n_d, n_temps, rp*L0, kp*block]`` slot tiles
    (:func:`pack_slots`); ``sid``: int32 ``[n_d, n_slots]`` flattened r-major.
    ``pt_interval=None`` disables in-kernel PT entirely (the engine's
    pre-overlap-event call runs PT outside via :func:`pt_event_jnp`).

    With ``ev_kinds`` (tuple of overlap build-mode kinds, e.g.
    ``("jorg", "cmr")``), the block's overlap event runs IN-KERNEL after the
    first sweep: ``ev_mode`` ``i32 [n_d, 1]`` selects the round-robin kind,
    ``ev_perm``/``ev_iperm`` ``i32 [n_d, T*R]`` hold the per-temperature
    pairing permutation and its inverse, ``ev_scal`` ``i32
    [n_d, T*(R//2)*6]`` the per-task scalars (:func:`ops.pallas_event`
    column layout), ``ev_words`` ``i32 [n_d, 2]`` the hardware-PRNG bond
    seed, and (Wolff houdayer/jorg) ``ev_probes`` ``i32 [n_d, T*(R//2)*64]``
    + ``ev_rank`` ``i8 [n_d, n_temps, rows, lanes]`` the find_seed probe
    data.

    Returns ``(spins_tiles, e [n_d, n_inner, n_slots], m [.., i32],
    qs [n_d, n_inner, n_pairs*n_temps], ql [..], sid, ea, ec, rtrips,
    tstate, parity)``.
    """
    l0 = shape[0]
    l1 = shape[1]
    l2 = shape[2] if len(shape) == 3 else 1
    block = l1 * l2
    rows, lanes = rp * l0, kp * block
    n_d = spins_tiles.shape[0]
    n_slots = n_replicas * n_temps
    n_pairs = n_replicas // 2
    n_edges = n_temps - 1
    n_grids = 4 if l2 == 1 else 6
    # coupling grids ride pre-tiled across the temp-group rows (the sweep
    # operates on [tg*rows, lanes] flattened slabs; couplings repeat per
    # slab).  Interpret mode pins tg=1 (overridable for tests): the Mosaic
    # interpreter's per-element emulation makes the flattened tiles and their
    # per-slot reduction loops minutes-slow (CLAUDE.md), and CPU runs
    # validate mechanics only.  PEAPODS_MP_TG1=1 forces per-temperature
    # tiles on hardware (A/B kill switch).
    if tg is None:
        import os as _os

        if interpret or _os.environ.get("PEAPODS_MP_TG1") == "1":
            tg = 1
        else:
            # in-kernel events: charge the event path's live tiles (all
            # modes' hoisted draw streams + shared spin tile + CC/flip
            # temporaries) so the chosen tg keeps the kernel inside the
            # 16 MB scoped VMEM stack
            n_dims = 2 if l2 == 1 else 3
            ev_k = ev_kinds or ()  # None on the interleaved-event path
            ev_draws = (n_dims if "jorg" in ev_k else 0) + (
                2 * n_dims if "cmr" in ev_k else 0
            )
            ev_tiles = (ev_draws + 8) if ev_k else 0
            tg = _temp_group(n_temps, rows, lanes, n_grids, ev_tiles)
    jgrids = jnp.tile(jgrids, (1, 1, tg, 1))
    kernel = functools.partial(
        _mp_kernel,
        gibbs=gibbs,
        n_inner=n_inner,
        n_temps=n_temps,
        n_replicas=n_replicas,
        n_pairs=n_pairs,
        n_edges=n_edges,
        l0=l0, l1=l1, l2=l2, kp=kp, rp=rp, tg=tg,
        pt_interval=pt_interval,
        pt_full=pt_full,
        hot_slot=hot_slot,
        cold_slot=cold_slot,
        n_systems=n_slots,
        ev_kinds=ev_kinds,
        ev_wolff=ev_wolff,
        ev_inject=ev_u is not None,
    )
    spins_spec = pl.BlockSpec(
        (1, n_temps, rows, lanes), lambda d: (d, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    jg_spec = pl.BlockSpec(
        (1, n_grids, tg * rows, lanes), lambda d: (d, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    # Per-disorder SMEM arrays are blocked with a singleton middle axis —
    # block (1, 1, X) has last-two dims equal to the reshaped array's
    # (1, X), which Mosaic accepts — so each grid instance maps only its own
    # row.  Whole-array SMEM operands would be mapped per instance,
    # multiplying the footprint by n_d (the old _mp_inner_cap throttle).
    grid_smem = lambda n: pl.BlockSpec(
        (1, 1, n), lambda d: (d, 0, 0), memory_space=pltpu.SMEM
    )
    sweep_smem = lambda n: pl.BlockSpec(
        (1, n_inner, n), lambda d: (d, 0, 0), memory_space=pltpu.SMEM
    )
    mid = lambda x: x.reshape(x.shape[0], 1, -1)
    # NOTE: no input_output_aliases — an aliased whole-array-SMEM
    # kernel deadlocks on hardware when iterated inside lax.scan
    # (in-place reuse across iterations wedges the DMA pipeline;
    # reproduced on v5e).  The kernel copies state in explicitly, so
    # aliasing was only an allocation optimization.
    in_specs = [
        grid_smem(2 * n_inner),             # seeds
        grid_smem(2 * n_inner),             # pt words
        smem(),                             # temps (shared)
        grid_smem(2),                       # meta
        grid_smem(n_slots),                 # sid
        grid_smem(max(n_edges, 1)),         # ea
        grid_smem(max(n_edges, 1)),         # ec
        grid_smem(n_slots),                 # rtrips
        grid_smem(n_slots),                 # tstate
        grid_smem(1),                       # parity
        spins_spec,
        jg_spec,
    ]
    operands = [
        mid(seeds), mid(pt_words), temps, mid(meta), mid(sid), mid(ea),
        mid(ec), mid(rtrips), mid(tstate), mid(parity),
        spins_tiles, jgrids,
    ]
    if ev_kinds:
        ev_needs_words = ev_u is None and any(
            k != "houdayer" for k in ev_kinds
        )
        ev_probes_on = ev_wolff and any(
            k in ("houdayer", "jorg") for k in ev_kinds
        )
        in_specs += [
            grid_smem(1),                         # ev_mode
            grid_smem(n_temps * n_replicas),      # ev_perm
            grid_smem(n_temps * n_replicas),      # ev_iperm
            grid_smem(n_temps * n_pairs * 6),     # ev_scal
        ]
        operands += [mid(ev_mode), mid(ev_perm), mid(ev_iperm), mid(ev_scal)]
        if ev_needs_words:
            in_specs.append(grid_smem(2))         # ev_words
            operands.append(mid(ev_words))
        if ev_probes_on:
            in_specs.append(grid_smem(n_temps * n_pairs * 64))  # ev_probes
            operands.append(mid(ev_probes))
            in_specs.append(spins_spec)           # ev_rank (i8, spins layout)
            operands.append(ev_rank)
        if ev_u is not None:
            n_u = ev_u.shape[1]
            in_specs.append(pl.BlockSpec(
                (1, n_u, n_temps, rows, lanes),
                lambda d: (d, 0, 0, 0, 0), memory_space=pltpu.VMEM,
            ))                                    # ev_u (injected, tests)
            operands.append(ev_u)
    out = pl.pallas_call(
        kernel,
        grid=(n_d,),
        in_specs=in_specs,
        out_specs=(
            spins_spec,
            sweep_smem(n_slots),
            sweep_smem(n_slots),
            sweep_smem(max(n_pairs, 1) * n_temps),
            sweep_smem(max(n_pairs, 1) * n_temps),
            grid_smem(n_slots),
            grid_smem(max(n_edges, 1)),
            grid_smem(max(n_edges, 1)),
            grid_smem(n_slots),
            grid_smem(n_slots),
            grid_smem(1),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_d, n_temps, rows, lanes), jnp.int8),
            jax.ShapeDtypeStruct((n_d, n_inner, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((n_d, n_inner, n_slots), jnp.int32),
            jax.ShapeDtypeStruct(
                (n_d, n_inner, max(n_pairs, 1) * n_temps), jnp.int32
            ),
            jax.ShapeDtypeStruct(
                (n_d, n_inner, max(n_pairs, 1) * n_temps), jnp.int32
            ),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, max(n_edges, 1)), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, max(n_edges, 1)), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, 1), jnp.int32),
        ),
        interpret=_interp(interpret),
    )(*operands)
    # squeeze the singleton middle axis back out of the grid-state outputs
    sq = lambda x: x.reshape(x.shape[0], x.shape[2])
    return out[:5] + tuple(sq(x) for x in out[5:])


# -------------------------------------------------------------- jnp mirror

def pt_event_jnp(
    slot_flat, es, sid, temps, w0, w1, ea, ec, rtrips, tstate, parity,
    *, n_spins, pt_full, hot_slot, cold_slot,
):
    """jnp mirror of the kernel's PT event for ONE realization, drawing the
    *same* murmur-mixed uniforms from the same per-sweep words — so an
    engine-side PT event (run between kernel calls around an overlap move)
    is bitwise identical to the in-kernel PT the no-event path would run.

    Args:
        slot_flat: ``int8 [R, T, n_spins]`` slot-ordered spins.
        es: ``f32 [R, T]`` per-slot energies (kernel convention).
        sid: ``int32 [R, T]``.
        w0/w1: the event sweep's PT mixer words (scalars).
        rtrips/tstate: ``int32 [n_systems]`` by system.

    Returns ``(slot_flat, es, sid, ea, ec, rtrips, tstate, parity)``.
    """
    n_replicas, n_temps = sid.shape
    n_edges = n_temps - 1
    if n_edges < 1:
        return slot_flat, es, sid, ea, ec, rtrips, tstate, parity

    def arrivals(sid_old, sid_new, rtr, ts):
        hot_sys = sid_new[:, hot_slot]
        hot_arr = sid_new[:, hot_slot] != sid_old[:, hot_slot]
        inc = hot_arr & (ts[hot_sys] == 2)
        rtr = rtr.at[hot_sys].add(inc.astype(jnp.int32))
        ts = ts.at[hot_sys].set(jnp.where(hot_arr, 1, ts[hot_sys]))
        cold_sys = sid_new[:, cold_slot]
        cold_arr = sid_new[:, cold_slot] != sid_old[:, cold_slot]
        promote = cold_arr & (ts[cold_sys] == 1)
        ts = ts.at[cold_sys].set(jnp.where(promote, 2, ts[cold_sys]))
        return rtr, ts

    def swap_t_axis(x, accept):
        """Swap entries (r, e) <-> (r, e+1) along the temp axis wherever
        ``accept [R, n_edges]``; accepted edges are disjoint per replica."""
        a_left = jnp.pad(accept, ((0, 0), (0, 1)))
        a_right = jnp.pad(accept, ((0, 0), (1, 0)))
        x_r = jnp.roll(x, -1, axis=1)
        x_l = jnp.roll(x, 1, axis=1)
        cond_shape = a_left.shape + (1,) * (x.ndim - 2)
        return jnp.where(
            a_left.reshape(cond_shape), x_r,
            jnp.where(a_right.reshape(cond_shape), x_l, x),
        )

    edge_idx = jnp.arange(n_edges)
    inv_t = 1.0 / temps

    if pt_full:
        r_idx = jnp.arange(n_replicas)[:, None]

        def one_pass(i, carry):
            slot_flat, es, sid, ea, ec, rtr, ts = carry
            p = jax.lax.select(i == 0, parity, 1 - parity)
            # same salts as the kernel: (i*n_edges + e)*R + r
            salt = (i * n_edges + edge_idx[None, :]) * n_replicas + r_idx
            u = _scalar_uniform(w0, w1, salt)
            delta = (
                np.float32(n_spins)
                * (es[:, 1:] - es[:, :-1])
                * (inv_t[:-1] - inv_t[1:])[None, :]
            )
            pmask = (edge_idx % 2) == p
            accept = (delta >= jnp.log(u)) & pmask[None, :]
            new_sid = swap_t_axis(sid, accept)
            new_es = swap_t_axis(es, accept)
            new_sf = swap_t_axis(slot_flat, accept)
            ea = ea + jnp.where(pmask, n_replicas, 0).astype(ea.dtype)
            ec = ec + accept.sum(0).astype(ec.dtype)
            rtr, ts = arrivals(sid, new_sid, rtr, ts)
            return new_sf, new_es, new_sid, ea, ec, rtr, ts

        carry = (slot_flat, es, sid, ea, ec, rtrips, tstate)
        carry = jax.lax.fori_loop(0, 2, one_pass, carry)
        slot_flat, es, sid, ea, ec, rtrips, tstate = carry
        parity = 1 - parity
    else:
        r_idx = jnp.arange(n_replicas)
        edges = _scalar_randint(w0, w1, r_idx, n_edges)
        u = _scalar_uniform(w0, w1, n_replicas + r_idx)
        el = es[r_idx, edges]
        er = es[r_idx, edges + 1]
        t1 = temps[edges]
        t2 = temps[edges + 1]
        delta = np.float32(n_spins) * (er - el) * (1.0 / t1 - 1.0 / t2)
        accept = delta >= jnp.log(u)
        acc_mask = jnp.zeros((n_replicas, n_edges), bool).at[
            r_idx, edges
        ].set(accept)
        new_sid = swap_t_axis(sid, acc_mask)
        slot_flat = swap_t_axis(slot_flat, acc_mask)
        es = swap_t_axis(es, acc_mask)
        ea = ea.at[edges].add(1)
        ec = ec.at[edges].add(accept.astype(jnp.int32))
        rtrips, tstate = arrivals(sid, new_sid, rtrips, tstate)
        sid = new_sid
    return slot_flat, es, sid, ea, ec, rtrips, tstate, parity
