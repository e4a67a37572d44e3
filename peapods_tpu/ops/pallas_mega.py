"""Megakernel: N sweeps + measurement + parallel tempering in one Pallas call.

The per-sweep scan step costs ~0.13 ms of glue (dozens of small XLA ops for
records and PT) while the fused sweep kernel itself takes ~0.02 ms at
256^2 x 24 systems — the hot loop is launch-overhead-bound, not compute
bound.  This kernel keeps the spins resident in VMEM for ``n_inner`` sweeps
and runs the whole sweep -> measure -> PT cycle on-chip, so the per-sweep
glue disappears; host-visible outputs are per-sweep (e, m) scalars and the
PT diagnostics.  The TPU analog of the reference's dedicated fast path for
its dominant workload (``UnitCouplingMetropolisLookup`` + square interior
path, mcmc/sweep.rs:22-185).

Eligible configs (gated by the engine): 2D direct-kernel lattices, plain
Metropolis/Gibbs, optional PT (both schedules), no cluster phases, no
replica pairs.  That covers the driver's flagship bench (256^2, 24-temp PT).

Design notes:

* Spins are stored **by slot** (temperature ladder position), not by system:
  each slot's temperature is then a compile-time-fixed SMEM scalar and a PT
  swap becomes an exchange of two VMEM spin tiles plus scalar bookkeeping of
  which *system* sits where (``sid``, for the round-trip diagnostics).  The
  reference swaps ``system_ids`` and never copies spins; here the in-VMEM
  copy of two [H, W] int8 tiles is ~zero-cost next to a sweep.
* Lattices with W % 256 == 0 use the two-sublattice layout
  (:func:`peapods_tpu.ops.pallas_sweep.pack_two_sub`): dense even/odd site
  arrays halve the per-pass elementwise work and PRNG draws, and the
  per-sweep energy falls out of the odd pass's local field for free.
* The sweep acceptance uniforms come from the hardware PRNG exactly like
  :mod:`peapods_tpu.ops.pallas_sweep` (same ``_kernel_body`` math).  The PT
  edge/acceptance draws are a handful of *scalars* per sweep; hardware PRNG
  bits are vector-only, so they come from a counter-based murmur3-finalizer
  mix of the per-sweep threefry key words (statistically far stronger than
  needed for ~one draw per sweep; the billions of spin-flip draws stay on
  the hardware PRNG).  Trajectories therefore differ from the jnp path —
  equivalence is statistical, as between the other kernel choices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import (
    _hw_uniform,
    _interp,
    _kernel_body,
    _kernel_body_2sub,
    pack_coupling_grids_two_sub,
    pack_two_sub,
    unpack_two_sub,
)

__all__ = ["mega_chunk", "supports_mega"]

_INV24 = np.float32(1.0 / (1 << 24))


def supports_mega(lattice, n_replicas) -> bool:
    """Direct 2D kernel shape and no replica pairs (pair statistics need
    per-sweep spin access the megakernel does not export)."""
    from .pallas_sweep import supports

    return supports(lattice) and n_replicas == 1


def _mix32(x):
    """murmur3 finalizer: bijective avalanche mix of one int32 word."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * np.int32(-2048144789)  # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * np.int32(-1028477387)  # 0xC2B2AE35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _scalar_uniform(w0, w1, salt):
    """f32 uniform in [0, 1) from two key words + a draw index (traced ok)."""
    salt = jnp.asarray(salt, jnp.int32)
    h = _mix32(w0 ^ _mix32(w1 + salt * np.int32(-1640531527)))
    bits = jax.lax.shift_right_logical(h, 8) & np.int32(0xFFFFFF)
    return bits.astype(jnp.float32) * _INV24


def _scalar_randint(w0, w1, salt, n):
    salt = jnp.asarray(salt, jnp.int32)
    h = _mix32(w1 ^ _mix32(w0 + salt * np.int32(-1640531527)))
    return jax.lax.rem(jax.lax.shift_right_logical(h, 4), np.int32(n))


def _mega_kernel(
    # SMEM operands (per-disorder arrays ride a singleton middle axis so the
    # grid can block them: block (1, 1, X) has last-two dims equal to the
    # reshaped array's (1, X), which Mosaic accepts — whole-array SMEM would
    # multiply every instance's footprint by n_d and throttle n_inner)
    seeds_ref,      # i32 [1, 1, 2*n_inner]   sweep PRNG words (per sweep)
    ptw_ref,        # i32 [1, 1, 2*n_inner]   PT mixer words (per sweep)
    temps_ref,      # f32 [1, n_temps]        (shared, whole-array)
    meta_ref,       # i32 [1, 2]              (sweep_base, n_active; shared)
    sid_in_ref,     # i32 [1, 1, n_slots]     system at each slot
    ea_in_ref,      # i32 [1, 1, n_edges_pad] PT edge attempts
    ec_in_ref,      # i32 [1, 1, n_edges_pad] PT edge acceptances
    rt_in_ref,      # i32 [1, 1, n_slots]     round trips (by system index)
    ts_in_ref,      # i32 [1, 1, n_slots]     trip state (by system index)
    par_in_ref,     # i32 [1, 1, 1]           full-ladder parity
    # VMEM operands
    spins_ref,      # i8 [1, n_slots, H, W]  (by slot)
    jgrids_ref,     # f32 [1, 4, H, W]
    # outputs
    spins_out_ref,  # i8 [1, n_slots, H, W]
    e_out_ref,      # f32 [1, n_inner, n_slots]  (SMEM)
    m_out_ref,      # i32 [1, n_inner, n_slots]  (SMEM)
    sid_out_ref, ea_out_ref, ec_out_ref, rt_out_ref, ts_out_ref, par_out_ref,
    *,
    gibbs, n_inner, n_slots, n_temps, n_edges, pt_interval, pt_full,
    hot_slot, cold_slot, n_spins, two_sub,
):
    # two_sub: spins_ref is [1, n_slots, 2, H, W/2] (pack_two_sub layout —
    # halves the sweep's elementwise work and PRNG draws); otherwise
    # [1, n_slots, H, W]

    # slot ordering: slot = r * n_temps + t  (n_replicas == 1 -> slot == t)
    def slot_temp(slot):
        return temps_ref[0, jax.lax.rem(slot, np.int32(n_temps))]

    def body(es_ref, tmp_ref):
        # State flows by explicit copy-in (inputs are NOT aliased to
        # the outputs: alias + lax.scan iteration deadlocks on hardware,
        # see the pallas_call note below).

        def _copy_smem(dst, src, n):
            def cp(i, _):
                dst[0, 0, i] = src[0, 0, i]
                return 0

            jax.lax.fori_loop(0, n, cp, 0)

        spins_out_ref[...] = spins_ref[...]
        _copy_smem(sid_out_ref, sid_in_ref, n_slots)
        _copy_smem(ea_out_ref, ea_in_ref, max(n_edges, 1))
        _copy_smem(ec_out_ref, ec_in_ref, max(n_edges, 1))
        _copy_smem(rt_out_ref, rt_in_ref, n_slots)
        _copy_smem(ts_out_ref, ts_in_ref, n_slots)
        par_out_ref[0, 0, 0] = par_in_ref[0, 0, 0]
        sweep_base = meta_ref[0, 0]
        n_active = meta_ref[0, 1]

        def record_arrival_hot(slot_sys):
            # system arriving at the hot slot: 2 -> round trip++, state -> 1
            prev = ts_out_ref[0, 0, slot_sys]

            @pl.when(prev == 2)
            def _():
                rt_out_ref[0, 0, slot_sys] = rt_out_ref[0, 0, slot_sys] + 1

            ts_out_ref[0, 0, slot_sys] = 1

        def record_arrival_cold(slot_sys):
            prev = ts_out_ref[0, 0, slot_sys]

            @pl.when(prev == 1)
            def _():
                ts_out_ref[0, 0, slot_sys] = 2

        def try_edge(e, w0, w1, salt):
            """Metropolis swap attempt on ladder edge e (tempering.rs:73-102);
            updates slots, energies, sid, counters, trip state."""
            u = _scalar_uniform(w0, w1, salt)
            t1 = temps_ref[0, e]
            t2 = temps_ref[0, e + 1]
            delta = (
                np.float32(n_spins)
                * (es_ref[0, e + 1] - es_ref[0, e])
                * (1.0 / t1 - 1.0 / t2)
            )
            ea_out_ref[0, 0, e] = ea_out_ref[0, 0, e] + 1
            accept = delta >= jnp.log(u)

            @pl.when(accept)
            def _():
                ec_out_ref[0, 0, e] = ec_out_ref[0, 0, e] + 1
                # swap spin tiles of the two slots via scratch
                tmp_ref[...] = spins_out_ref[0, e]
                spins_out_ref[0, e] = spins_out_ref[0, e + 1]
                spins_out_ref[0, e + 1] = tmp_ref[...]
                el = es_ref[0, e]
                es_ref[0, e] = es_ref[0, e + 1]
                es_ref[0, e + 1] = el
                sl = sid_out_ref[0, 0, e]
                sid_out_ref[0, 0, e] = sid_out_ref[0, 0, e + 1]
                sid_out_ref[0, 0, e + 1] = sl
                # arrivals (tempering.py _record_arrivals): only the hot and
                # cold slots matter; a swap touches them iff e borders them

                @pl.when((e == hot_slot) | (e + 1 == hot_slot))
                def _():
                    record_arrival_hot(sid_out_ref[0, 0, hot_slot])

                @pl.when((e == cold_slot) | (e + 1 == cold_slot))
                def _():
                    record_arrival_cold(sid_out_ref[0, 0, cold_slot])

        def sweep_t(t, _):
            pltpu.prng_seed(seeds_ref[0, 0, 2 * t], seeds_ref[0, 0, 2 * t + 1])

            def one_slot(slot, _):
                inv_half_t = 1.0 / (0.5 * slot_temp(slot))
                if two_sub:
                    s_e = spins_out_ref[0, slot, 0].astype(jnp.float32)
                    s_o = spins_out_ref[0, slot, 1].astype(jnp.float32)
                    jg_e = jgrids_ref[0, 0]
                    jg_o = jgrids_ref[0, 1]
                    s_e, s_o, e_tot = _kernel_body_2sub(
                        s_e, s_o, jg_e, jg_o, inv_half_t,
                        lambda c: _hw_uniform(s_e.shape), gibbs=gibbs,
                        with_energy=True,
                    )
                    spins_out_ref[0, slot, 0] = s_e.astype(jnp.int8)
                    spins_out_ref[0, slot, 1] = s_o.astype(jnp.int8)
                    m_sum = s_e.sum() + s_o.sum()
                else:
                    s = spins_out_ref[0, slot].astype(jnp.float32)
                    jg = jgrids_ref[0]
                    s, e_tot = _kernel_body(
                        s, jg, inv_half_t, lambda c: _hw_uniform(s.shape),
                        gibbs=gibbs, with_energy=True,
                    )
                    spins_out_ref[0, slot] = s.astype(jnp.int8)
                    m_sum = s.sum()
                es_ref[0, slot] = e_tot / np.float32(n_spins)
                e_out_ref[0, t, slot] = e_tot / np.float32(n_spins)
                m_out_ref[0, t, slot] = m_sum.astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, n_slots, one_slot, 0)

            if pt_interval is not None:
                w0 = ptw_ref[0, 0, 2 * t]
                w1 = ptw_ref[0, 0, 2 * t + 1]

                @pl.when(jax.lax.rem(sweep_base + t, np.int32(pt_interval)) == 0)
                def _():
                    if pt_full:
                        parity = par_out_ref[0, 0, 0]

                        def one_pass(i, _):
                            p = jax.lax.select(
                                i == 0, parity, 1 - parity
                            )

                            def one_edge(e, _):
                                @pl.when(jax.lax.rem(e, 2) == p)
                                def _():
                                    try_edge(e, w0, w1, 2 * n_edges * i + e)

                                return 0

                            jax.lax.fori_loop(0, n_edges, one_edge, 0)
                            return 0

                        jax.lax.fori_loop(0, 2, one_pass, 0)
                        par_out_ref[0, 0, 0] = 1 - parity
                    else:
                        e = _scalar_randint(w0, w1, 0, n_edges)
                        try_edge(e, w0, w1, 1)

            return 0

        jax.lax.fori_loop(0, n_active, sweep_t, 0)

        # zero the e/m rows of inactive (sentinel-padded) sweeps
        def zero_t(t, _):
            def zero_slot(slot, _):
                e_out_ref[0, t, slot] = 0.0
                m_out_ref[0, t, slot] = 0
                return 0

            jax.lax.fori_loop(0, n_slots, zero_slot, 0)
            return 0

        jax.lax.fori_loop(n_active, n_inner, zero_t, 0)

    pl.run_scoped(
        body,
        es_ref=pltpu.SMEM((1, n_slots), jnp.float32),
        tmp_ref=pltpu.VMEM(tuple(spins_ref.shape[2:]), jnp.int8),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "gibbs", "n_inner", "n_temps", "pt_interval", "pt_full",
        "hot_slot", "cold_slot", "interpret",
    ),
)
def mega_chunk(
    spins_slot, jgrids, temps, seeds, pt_words, meta,
    sid, ea, ec, rtrips, tstate, parity,
    *,
    shape, gibbs, n_inner, n_temps, pt_interval, pt_full, hot_slot,
    cold_slot, interpret=False,
):
    """Run ``n_inner`` sweeps (+ fused measurement + PT) on one realization.

    All array args carry a leading disorder axis (the kernel grid).
    ``spins_slot``: int8 [n_d, n_slots, H, W] in slot order.  Returns
    ``(spins_slot, e [n_d, n_inner, n_slots], m [.., i32], sid, ea, ec,
    rtrips, tstate, parity)``.
    """
    h, w = shape
    n_d, n_slots = spins_slot.shape[:2]
    n_edges = n_temps - 1
    # two-sublattice layout whenever both dense [H, W/2] sublattices still
    # fill the 128 lanes: halves the sweep work and PRNG draws per sweep
    two_sub = w % 256 == 0
    kernel = functools.partial(
        _mega_kernel,
        gibbs=gibbs,
        n_inner=n_inner,
        n_slots=n_slots,
        n_temps=n_temps,
        n_edges=n_edges,
        pt_interval=pt_interval,
        pt_full=pt_full,
        hot_slot=hot_slot,
        cold_slot=cold_slot,
        n_spins=h * w,
        two_sub=two_sub,
    )
    if two_sub:
        spins_dev = pack_two_sub(spins_slot)  # [n_d, n_slots, 2, h, w//2]
        jgrids_dev = pack_coupling_grids_two_sub(jgrids)  # [n_d, 2, 4, h, w//2]
        spins_spec = pl.BlockSpec(
            (1, n_slots, 2, h, w // 2), lambda d: (d, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        jg_spec = pl.BlockSpec(
            (1, 2, 4, h, w // 2), lambda d: (d, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        spins_out_shape = jax.ShapeDtypeStruct(
            (n_d, n_slots, 2, h, w // 2), jnp.int8
        )
    else:
        spins_dev = spins_slot
        jgrids_dev = jgrids
        spins_spec = pl.BlockSpec(
            (1, n_slots, h, w), lambda d: (d, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        jg_spec = pl.BlockSpec(
            (1, 4, h, w), lambda d: (d, 0, 0, 0), memory_space=pltpu.VMEM
        )
        spins_out_shape = jax.ShapeDtypeStruct((n_d, n_slots, h, w), jnp.int8)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    # Per-disorder SMEM arrays are blocked with a singleton middle axis —
    # block (1, 1, X) has last-two dims equal to the reshaped array's
    # (1, X), which Mosaic accepts — so each grid instance maps only its own
    # row instead of the whole [n_d, ...] array (which would multiply the
    # footprint by n_d and throttle n_inner).
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
    out = pl.pallas_call(
        kernel,
        grid=(n_d,),
        in_specs=[
            grid_smem(2 * n_inner),             # seeds
            grid_smem(2 * n_inner),             # pt words
            smem(),                             # temps (shared)
            smem(),                             # meta (shared)
            grid_smem(n_slots),                 # sid
            grid_smem(max(n_edges, 1)),         # ea
            grid_smem(max(n_edges, 1)),         # ec
            grid_smem(n_slots),                 # rtrips
            grid_smem(n_slots),                 # tstate
            grid_smem(1),                       # parity
            spins_spec,
            jg_spec,
        ],
        out_specs=(
            spins_spec,
            sweep_smem(n_slots),
            sweep_smem(n_slots),
            grid_smem(n_slots),
            grid_smem(max(n_edges, 1)),
            grid_smem(max(n_edges, 1)),
            grid_smem(n_slots),
            grid_smem(n_slots),
            grid_smem(1),
        ),
        out_shape=(
            spins_out_shape,
            jax.ShapeDtypeStruct((n_d, n_inner, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((n_d, n_inner, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, max(n_edges, 1)), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, max(n_edges, 1)), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, n_slots), jnp.int32),
            jax.ShapeDtypeStruct((n_d, 1, 1), jnp.int32),
        ),
        interpret=_interp(interpret),
    )(
        mid(seeds), mid(pt_words), temps, meta, mid(sid), mid(ea), mid(ec),
        mid(rtrips), mid(tstate), mid(parity),
        spins_dev, jgrids_dev,
    )
    if two_sub:
        out = (unpack_two_sub(out[0]),) + out[1:]
    # squeeze the singleton middle axis back out of the grid-state outputs
    sq = lambda x: x.reshape(x.shape[0], x.shape[2])
    return out[:3] + tuple(sq(x) for x in out[3:])
