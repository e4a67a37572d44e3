"""Pallas TPU kernel: fused overlap-cluster event (bonds + CC + flips).

The staged overlap event (engine ``_run_tasks_batched``) runs bond build,
connected components, and the cluster flips as separate XLA/Pallas programs
with HBM round-trips of ``[B, n_spins, n_dims]`` bond tensors between them;
profiling the 16^3 spin-glass configs showed the event cost sits in that
surrounding elementwise work and dispatch glue, not the CC fixed point
(docs/performance.md round 3).  This kernel runs the ENTIRE per-task move —
active-site masks, stochastic bond draws, the min-label fixed point, and the
per-cluster flip decisions — on resident VMEM tiles, one ``pallas_call`` per
event (two CC phases fused for CMR).  It is the TPU counterpart of the
reference's per-task DFS/union-find move kernels
(``/root/reference/spin-sim/src/clusters/overlap.rs:64-144``), which touch
each task's memory once per event.

Batch layout is shared with :mod:`peapods_tpu.ops.pallas_cc_batch`: tasks
(graphs) are lane-packed (kp per 128-lane group) and sublane-stacked (ks row
blocks) into fat ``[ks*L0, kp*block]`` tiles; per-graph scalars (Wolff seed,
coin salts, CMR's k) ride SMEM with a singleton-middle-axis block so each
grid step maps only its own tile's scalars.

RNG contract (matching the staged path where draws are deterministic):

* Per-graph scalars — the Wolff seed (64-probe ``find_seed``), the SW coin
  salts, CMR's grey ``k`` — are drawn OUTSIDE from the same task-key splits
  as the staged kernels (:func:`event_scalars`), so they are bitwise the
  staged path's draws.
* Per-CLUSTER coins hash the component label with the passed-in salt using
  the exact :func:`peapods_tpu.ops.cluster.salted_uniform` avalanche, so
  they too match bitwise given equal labels.
* Per-BOND uniforms (Joerg's stochastic pair bonds, CMR's blue/red draws)
  come from the hardware PRNG — a different stream than the staged path's
  threefry, exactly like the sweep kernels vs the jnp sweep (statistical
  equivalence; the injected-uniform entry point pins the decision logic
  bitwise against the staged functions).  Houdayer bonds are deterministic,
  so the fused Houdayer event is bitwise identical to the staged path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cluster as cl
from .pallas_sweep import _hw_uniform, _interp
from .pallas_cc_batch import _pack, _unpack, supports_cc_batch
from .pallas_megapair import _mp_geometry

__all__ = [
    "supports_event",
    "supports_event_houdn",
    "event_scalars",
    "mp_event_scalars",
    "mp_event_rank_tiles",
    "houdn_scalars",
    "pack_event_jt",
    "overlap_event_batch",
    "houdn_event_batch",
    "fk_scalars",
    "pack_fk_j",
    "fk_update_batch",
]

_ROUNDS_PER_CHECK = 16

# gscal column layout (int32 [B, 6] per task)
_S0, _S1, _S2, _S3, _SEED, _K = range(6)


def supports_event(lattice, group_size: int) -> bool:
    """Fused-event applicability: pair tasks on cc_batch-packable lattices."""
    return group_size == 2 and supports_cc_batch(lattice)


def _i32(c):
    return np.uint32(c).astype(np.int32)


def event_scalars(kind: str, wolff: bool, a, b, tkeys, n_spins: int):
    """Per-task scalar draws, bitwise the staged path's.

    Key split order per mode matches :mod:`peapods_tpu.ops.overlap`
    (houdayer_bonds / jorg_bonds / cmr_blue_bonds + cmr_mid/cmr_finish).
    A Wolff seed of ``n_spins`` encodes "no eligible seed found" — no site
    matches it, so the kernel's seeded component is empty and the move is a
    no-op, the reference's task skip (clusters/utils.rs:107-119).

    Args:
        a / b: ``int8 [B, n_spins]`` task spin pairs.
        tkeys: ``[B]`` task keys.

    Returns ``int32 [B, 6]`` rows ``(salt0, salt1, salt2, salt3, seed, k)``.
    """
    z = jnp.int32(0)
    none = jnp.int32(n_spins)

    def one(av, bv, key):
        if kind == "houdayer":
            k_seed, k_coin = jax.random.split(key)
            if wolff:
                seed, found = cl.find_seed(k_seed, av != bv)
                seed = jnp.where(found, seed, none).astype(jnp.int32)
                return jnp.stack([z, z, z, z, seed, z])
            s = cl.coin_salt(k_coin)
            return jnp.stack([s[0], s[1], z, z, none, z])
        if kind == "jorg":
            _k_bond, k_seed, k_coin = jax.random.split(key, 3)
            if wolff:
                seed, found = cl.find_seed(k_seed, av != bv)
                seed = jnp.where(found, seed, none).astype(jnp.int32)
                return jnp.stack([z, z, z, z, seed, z])
            s = cl.coin_salt(k_coin)
            return jnp.stack([s[0], s[1], z, z, none, z])
        # cmr: blue seed is a plain randint (overlap.rs / ops.overlap.cmr_mid)
        _k_blue, _k_red, k_seed, k_bcoin, k_gcoin = jax.random.split(key, 5)
        seed = jax.random.randint(k_seed, (), 0, n_spins, dtype=jnp.int32)
        if wolff:
            kq = jax.random.randint(k_gcoin, (), 1, 4, dtype=jnp.int32)
            return jnp.stack([z, z, z, z, seed, kq])
        bs = cl.coin_salt(k_bcoin)
        gs = cl.coin_salt(k_gcoin)
        return jnp.stack([bs[0], bs[1], gs[0], gs[1], seed, z])

    return jax.vmap(one)(a, b, tkeys)


def mp_event_scalars(kind: str, wolff: bool, tkeys, n_spins: int):
    """Spins-free per-task draws for the in-megapair event
    (:func:`peapods_tpu.ops.pallas_megapair.megapair_chunk` ``ev_*``
    operands): same key-split order as :func:`event_scalars`, but the Wolff
    houdayer/jorg seed SELECTION moves in-kernel — only the 64 ``find_seed``
    probe indices (which are spin-independent, clusters/utils.rs:107-119)
    are drawn here, bitwise the staged path's.

    Returns ``(scal int32 [B, 6], probes int32 [B, 64])`` (probes zero for
    kinds/modes that need none).
    """
    z = jnp.int32(0)
    zp = jnp.zeros((64,), jnp.int32)
    none = jnp.int32(n_spins)

    def one(key):
        if kind == "houdayer":
            k_seed, k_coin = jax.random.split(key)
            if wolff:
                probes = jax.random.randint(k_seed, (64,), 0, n_spins)
                return (
                    jnp.stack([z, z, z, z, none, z]),
                    probes.astype(jnp.int32),
                )
            s = cl.coin_salt(k_coin)
            return jnp.stack([s[0], s[1], z, z, none, z]), zp
        if kind == "jorg":
            _k_bond, k_seed, k_coin = jax.random.split(key, 3)
            if wolff:
                probes = jax.random.randint(k_seed, (64,), 0, n_spins)
                return (
                    jnp.stack([z, z, z, z, none, z]),
                    probes.astype(jnp.int32),
                )
            s = cl.coin_salt(k_coin)
            return jnp.stack([s[0], s[1], z, z, none, z]), zp
        _k_blue, _k_red, k_seed, k_bcoin, k_gcoin = jax.random.split(key, 5)
        seed = jax.random.randint(k_seed, (), 0, n_spins, dtype=jnp.int32)
        if wolff:
            kq = jax.random.randint(k_gcoin, (), 1, 4, dtype=jnp.int32)
            return jnp.stack([z, z, z, z, seed, kq]), zp
        bs = cl.coin_salt(k_bcoin)
        gs = cl.coin_salt(k_gcoin)
        return jnp.stack([bs[0], bs[1], gs[0], gs[1], seed, z]), zp

    return jax.vmap(one)(tkeys)


def mp_event_rank_tiles(probes, n_replicas, n_temps, shape, kp, rp):
    """Per-site first-probe ranks in megapair tile layout.

    ``probes``: int32 ``[d, T*(R//2), 64]`` (temp-major tasks).  Each task's
    64 probe indices become a per-site rank ``min{p: probes[p] == site}``
    (127 = never probed), placed at the task's EVEN canonical position
    ``2p`` so the kernel's per-pair min over active sites recovers the
    staged ``find_seed`` selection bitwise.  Returns int8
    ``[d, n_temps, rp*L0, kp*block]``.
    """
    from .pallas_megapair import slots_to_tiles

    d = probes.shape[0]
    shape = tuple(shape)
    l0 = shape[0]
    n_spins = int(np.prod(shape))
    block = n_spins // l0
    n_pairs = n_replicas // 2

    def rank_of(pr):
        return jnp.full((n_spins,), 127, jnp.int8).at[pr].min(
            jnp.arange(64, dtype=jnp.int8)
        )

    ranks = jax.vmap(jax.vmap(rank_of))(probes)  # [d, T*P, n]
    rs = ranks.reshape(d, n_temps, n_pairs, n_spins).transpose(0, 2, 1, 3)
    rank_slot = jnp.zeros(
        (d, n_replicas, n_temps, n_spins), jnp.int8
    ).at[:, ::2].set(rs)
    return slots_to_tiles(rank_slot, l0, block, kp, rp)


def pack_event_jt(couplings, temps, n_groups: int, shape, kp: int, ks: int,
                  n_chunks: int = 1):
    """Packed per-task ``J/T`` grids, ``f32 [G, n_dims, rows, lanes]``.

    Task order is the engine's flat (disorder-major, temperature-major)
    layout, which is STATIC across events — the engine computes this once
    per program and reuses it every event.  Padding tasks get ``J/T = 0``
    (no satisfied bonds ever).

    ``n_chunks``: pack the flat task batch in that many equal contiguous
    chunks, each tile-padded independently — matches the fused event
    kernel's per-shard pad/pack under a mesh (disorder-only meshes get the
    per-disorder-shard layout; disorder x systems meshes may split one
    disorder's tasks across chunks, which is fine because tasks are whole
    rows).
    """
    shape = tuple(shape)
    d, n, nd = couplings.shape
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    n_temps = temps.shape[0]
    task_temps = jnp.repeat(temps, n_groups)  # [n_tasks]
    jt = (
        couplings[:, None, :, :] / task_temps[None, :, None, None]
    ).reshape(d * n_temps * n_groups, n, nd)
    assert jt.shape[0] % n_chunks == 0, (jt.shape, n_chunks)
    c = jt.shape[0] // n_chunks
    tile = kp * ks

    def pack_chunk(jc):
        pad = (-jc.shape[0]) % tile
        if pad:
            jc = jnp.concatenate(
                [jc, jnp.zeros((pad, n, nd), jc.dtype)], axis=0
            )
        return jnp.stack(
            [_pack(jc[..., dd], l0, block, kp, ks) for dd in range(nd)],
            axis=1,
        )

    return jnp.concatenate(
        [pack_chunk(jt[i * c:(i + 1) * c]) for i in range(n_chunks)], axis=0
    )


# ------------------------------------------------------------------ kernel


def _salted_uniform_i32(labels, s0, s1):
    """int32 re-expression of :func:`peapods_tpu.ops.cluster.salted_uniform`
    (bitwise identical; two's-complement mul/xor match uint32)."""
    srl = jax.lax.shift_right_logical
    x = labels ^ s0
    x = (x ^ srl(x, 16)) * _i32(0x85EBCA6B)
    x = (x ^ srl(x, 13)) * _i32(0xC2B2AE35)
    x = x ^ srl(x, 16) ^ s1
    x = (x ^ srl(x, 16)) * _i32(0x7FEB352D)
    x = (x ^ srl(x, 15)) * _i32(0x846CA68B)
    x = x ^ srl(x, 16)
    return srl(x, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _event_kernel(
    gscal_ref, a_ref, b_ref, *rest,
    kind, wolff, injected, with_labels, with_masks, l0, l1, l2, kp, ks,
    n_dims, tri=False, log_cc=False,
):
    """``with_labels`` additionally writes the STATS-graph CC labels tile —
    the move's labels for houdayer/jorg, the BLUE labels for CMR (the
    reference collects CSD/top4 on the blue graph, overlap.rs:146-339; see
    :func:`peapods_tpu.ops.overlap.cmr_mid`).  Raw: the Wolff seed cluster
    carries -1 (the engine rewrites it to that cluster's min site index).

    ``with_masks`` additionally writes the stats-graph bond-activation
    tiles (``int8 [n_dirs, rows, lanes]``, same graph as ``with_labels``):
    full observe mode derives bond-fraction and winding from them in jnp
    while the graph build stays on this kernel's hardware-PRNG stream — the
    observed graphs are drawn by the production mechanism, not a threefry
    twin (the observe action mutates nothing, overlap.rs:146-339)."""
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    n_spins = l0 * block
    n_g = kp * ks
    big = jnp.int32(n_spins)
    refs = list(rest)
    words_ref = refs.pop(0) if (kind != "houdayer" and not injected) else None
    jt_ref = refs.pop(0) if kind != "houdayer" else None
    u_ref = refs.pop(0) if (injected and kind != "houdayer") else None
    mask_out = refs.pop() if with_masks else None
    lab_out = refs.pop() if with_labels else None
    a_out, b_out = refs

    def write_masks(bonds):
        if mask_out is not None:
            for d, bd in enumerate(bonds):
                mask_out[0, d] = bd.astype(jnp.int8)

    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    n_dirs = 3 if tri else n_dims
    from .pallas_cc_batch import dir_shifts

    fwd, bwd = dir_shifts(shifts, n_dirs, tri)
    local_idx = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    gi_tile = (row // np.int32(l0)) * np.int32(kp) + col // np.int32(block)

    def gval(j):
        """Broadcast per-graph SMEM scalar j to a per-site tile."""
        v = jnp.zeros((rows, lanes), jnp.int32)
        for gi in range(n_g):
            v = jnp.where(gi_tile == gi, gscal_ref[0, gi, j], v)
        return v

    if words_ref is not None:
        pltpu.prng_seed(words_ref[0, 0, 0], words_ref[0, 0, 1])

    u_slot = [0]

    def uniform():
        if injected:
            u = u_ref[0, u_slot[0]]
            u_slot[0] += 1
            return u
        return _hw_uniform((rows, lanes))

    def shift_mask(f, m):
        return f(m.astype(jnp.int32)) != 0

    def cc(bonds, seed_tile):
        """Min-label fixed point (shared body, pallas_cc_batch); ``seed_tile``
        (or None) floods -1 from the per-graph Wolff seed so the seeded
        component is ``labels == -1``."""
        from .pallas_cc_batch import cc_fixed_point

        if seed_tile is None:
            init = local_idx
        else:
            init = jnp.where(local_idx == seed_tile, jnp.int32(-1), local_idx)
        return cc_fixed_point(
            bonds, init, big, (rows, lanes, l0, l1, l2, row, col, shifts),
            n_dirs=n_dirs, tri=tri, log_cc=log_cc,
            rounds_per_check=_ROUNDS_PER_CHECK,
        )

    def nonsingleton(bonds):
        inc = bonds[0]
        for d in range(1, n_dirs):
            inc = inc | bonds[d]
        for d in range(n_dirs):
            inc = inc | shift_mask(bwd[d], bonds[d])
        return inc

    # Mosaic rejects comparisons on packed-i8 vectors on hardware ("Target
    # does not support this comparison"), and widening alone does not help:
    # the canonicalizer folds ``extsi(a) != extsi(b)`` straight back to the
    # i8 compare.  Spins are +-1, so express inequality as a product sign
    # test in i32 — ``muli`` cannot be narrowed to i8 (overflow semantics
    # differ), so the compare stays 32-bit.
    a = a_ref[0].astype(jnp.int32)
    b = b_ref[0].astype(jnp.int32)

    if kind in ("houdayer", "jorg"):
        active = (a * b) < 0
        if kind == "houdayer":
            bonds = [active & shift_mask(fwd[d], active) for d in range(n_dirs)]
        else:
            af = a.astype(jnp.float32)
            bonds = []
            for d in range(n_dirs):
                inter = af * fwd[d](af) * jt_ref[0, d]
                p = 1.0 - jnp.exp(-4.0 * inter)
                bonds.append(
                    (inter > 0.0)
                    & (uniform() < p)
                    & active
                    & shift_mask(fwd[d], active)
                )
        if wolff:
            labels = cc(bonds, gval(_SEED))
            flip = labels == -1
        else:
            labels = cc(bonds, None)
            coin = _salted_uniform_i32(labels, gval(_S0), gval(_S1)) < 0.5
            flip = coin & nonsingleton(bonds)
        if with_labels:
            lab_out[0] = labels
        write_masks(bonds)
        a_out[0] = jnp.where(flip, -a, a).astype(jnp.int8)
        b_out[0] = jnp.where(flip, -b, b).astype(jnp.int8)
        return

    # ---- cmr: blue phase -> joint flip -> red extension -> grey flips
    def sats(av, bv):
        a_s, b_s = [], []
        for d in range(n_dirs):
            a_s.append(av * fwd[d](av) * jt_ref[0, d] > 0.0)
            b_s.append(bv * fwd[d](bv) * jt_ref[0, d] > 0.0)
        return a_s, b_s

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    r = [jnp.exp(-2.0 * jnp.abs(jt_ref[0, d])) for d in range(n_dirs)]
    a_sat, b_sat = sats(af, bf)
    blue = [
        a_sat[d] & b_sat[d] & (uniform() < 1.0 - r[d] * r[d])
        for d in range(n_dirs)
    ]
    seed_tile = gval(_SEED)
    if wolff:
        blue_labels = cc(blue, seed_tile)
        blue_flip = blue_labels == -1
    else:
        blue_labels = cc(blue, None)
        coin = _salted_uniform_i32(blue_labels, gval(_S0), gval(_S1)) < 0.5
        blue_flip = coin & nonsingleton(blue)
    if with_labels:
        lab_out[0] = blue_labels
    write_masks(blue)
    af = jnp.where(blue_flip, -af, af)
    bf = jnp.where(blue_flip, -bf, bf)

    a_sat, b_sat = sats(af, bf)
    grey = [
        blue[d] | ((a_sat[d] != b_sat[d]) & (uniform() < 1.0 - r[d]))
        for d in range(n_dirs)
    ]
    if wolff:
        grey_labels = cc(grey, seed_tile)
        in_grey = grey_labels == -1
        k = gval(_K)
        flip_a = in_grey & ((k & 1) != 0)
        flip_b = in_grey & ((k & 2) != 0)
    else:
        grey_labels = cc(grey, None)
        u = _salted_uniform_i32(grey_labels, gval(_S2), gval(_S3))
        k = (u * 4.0).astype(jnp.int32)
        ns = nonsingleton(grey)
        flip_a = ns & ((k & 1) != 0)
        flip_b = ns & ((k & 2) != 0)
    a_out[0] = jnp.where(flip_a, -af, af).astype(jnp.int8)
    b_out[0] = jnp.where(flip_b, -bf, bf).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kind", "wolff", "shape", "kp", "ks", "interpret", "with_labels",
        "with_masks", "tri", "log_cc",
    ),
)
def overlap_event_batch(
    a_pack, b_pack, gscal, words, jt=None, u=None, *,
    kind, wolff, shape, kp, ks, interpret=False, with_labels=False,
    with_masks=False, tri=False, log_cc=False,
):
    """One fused overlap event over a packed task batch.

    Args:
        a_pack / b_pack: ``int8 [G, rows, lanes]`` packed replica pairs
            (:func:`peapods_tpu.ops.pallas_cc_batch._pack` layout).
        gscal: ``int32 [G, kp*ks, 6]`` per-graph scalars
            (:func:`event_scalars`, reshaped to tiles).
        words: ``int32 [G, 1, 2]`` per-tile hardware-PRNG seed words
            (ignored for houdayer / injected mode).
        jt: ``f32 [G, n_dims, rows, lanes]`` packed J/T (jorg/cmr only).
        u: injected per-bond uniforms ``f32 [G, n_u*n_dims, rows, lanes]``
            (n_u = 1 for jorg, 2 for cmr: blue then red, dim-major within).
        with_labels: additionally return the packed stats-graph CC labels
            (``int32 [G, rows, lanes]``; blue labels for CMR, raw Wolff -1
            seed-cluster marker).
        with_masks: additionally return the packed stats-graph bond masks
            (``int8 [G, n_dirs, rows, lanes]``; blue bonds for CMR) — the
            full-observe path derives bond-fraction/winding from them.

    Returns ``(a_pack, b_pack)`` post-move (plus packed labels, then packed
    masks, with ``with_labels`` / ``with_masks``).
    """
    shape = tuple(shape)
    n_dims = len(shape)
    n_dirs = 3 if tri else n_dims
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    l1 = shape[1]
    l2 = shape[2] if n_dims == 3 else 1
    rows, lanes = ks * l0, kp * block
    g = a_pack.shape[0]
    injected = u is not None
    kernel = functools.partial(
        _event_kernel,
        kind=kind, wolff=wolff, injected=injected, with_labels=with_labels,
        with_masks=with_masks,
        l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, n_dims=n_dims, tri=tri,
        log_cc=log_cc,
    )
    tile = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    smem = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.SMEM,
    )
    in_specs = [smem(kp * ks, 6), tile(rows, lanes), tile(rows, lanes)]
    operands = [gscal, a_pack, b_pack]
    if kind != "houdayer" and not injected:
        in_specs.append(smem(1, 2))
        operands.append(words)
    if kind != "houdayer":
        in_specs.append(tile(n_dirs, rows, lanes))
        operands.append(jt)
    if injected and kind != "houdayer":
        n_u = u.shape[1]
        in_specs.append(tile(n_u, rows, lanes))
        operands.append(u)
    out_specs = (tile(rows, lanes), tile(rows, lanes))
    out_shape = (
        jax.ShapeDtypeStruct((g, rows, lanes), jnp.int8),
        jax.ShapeDtypeStruct((g, rows, lanes), jnp.int8),
    )
    if with_labels:
        out_specs = out_specs + (tile(rows, lanes),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        )
    if with_masks:
        out_specs = out_specs + (tile(n_dirs, rows, lanes),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((g, n_dirs, rows, lanes), jnp.int8),
        )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(*operands)
    return out


# ---------------------------------------------------------------- FK update

def fk_scalars(wolff: bool, keys, n_spins: int):
    """Per-graph FK flip scalars, bitwise the staged path's draws.

    The staged FK phase splits each system's phase key into ``(kb, kf)``
    and draws the flip decision inputs from ``kf`` (engine
    ``_fk_phase_batched``): the SW coin salts via :func:`cluster.coin_salt`,
    or the Wolff seed via a plain ``randint`` (fk.rs:153-162 flips
    singletons too, so there is no eligibility probe).  ``keys``: the
    ``kf`` keys, ``[B]``.  Returns ``int32 [B, 3]`` rows
    ``(salt0, salt1, seed)``.
    """
    z = jnp.int32(0)

    def one(key):
        if wolff:
            seed = jax.random.randint(key, (), 0, n_spins, dtype=jnp.int32)
            return jnp.stack([z, z, seed])
        s = cl.coin_salt(key)
        return jnp.stack([s[0], s[1], z])

    return jax.vmap(one)(keys)


def pack_fk_j(couplings, n_rep: int, shape, kp: int, ks: int,
              n_chunks: int = 1):
    """Packed per-graph forward couplings ``f32 [G, n_dims, rows, lanes]``.

    Graph order is the engine's flat (disorder-major, system) FK batch:
    every disorder's coupling grid repeats for its ``n_rep`` systems (the
    temperature enters separately as a per-graph scalar — unlike the
    overlap events' J/T grids, the FK system->temperature map changes with
    every PT swap).  Padding graphs get ``J = 0`` (no bond ever activates,
    and the all-false graph's flip mask never reaches real spins).

    ``n_chunks``: pack the flat batch in that many equal contiguous chunks,
    each tile-padded independently — matches the fused kernel's per-shard
    pad/pack under a mesh (disorder-only meshes get the same layout as
    per-disorder-shard packing; disorder x systems meshes may split one
    disorder's systems across chunks, which is fine because graphs are
    whole rows).
    """
    shape = tuple(shape)
    d, n, nd = couplings.shape
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    j = jnp.repeat(couplings, n_rep, axis=0)  # [d*n_rep, n, nd]
    assert j.shape[0] % n_chunks == 0, (j.shape, n_chunks)
    c = j.shape[0] // n_chunks
    tile = kp * ks

    def pack_chunk(jc):
        pad = (-jc.shape[0]) % tile
        if pad:
            jc = jnp.concatenate(
                [jc, jnp.zeros((pad, n, nd), jc.dtype)], axis=0
            )
        return jnp.stack(
            [_pack(jc[..., dd], l0, block, kp, ks) for dd in range(nd)],
            axis=1,
        )

    return jnp.concatenate(
        [pack_chunk(j[i * c:(i + 1) * c]) for i in range(n_chunks)], axis=0
    )


def _fk_kernel(
    gscal_ref, gtemp_ref, s_ref, *rest,
    wolff, injected, with_measure, with_labels, with_masks, l0, l1, l2,
    kp, ks, n_dims, tri=False, log_cc=False,
):
    """Fused FK update: bond draws + CC fixed point + cluster flips on one
    resident tile (fk.rs:28-171 in one pass).  Mirrors ``_event_kernel``'s
    tile machinery for the single-system case (the small geometry/CC
    closures are intentionally repeated rather than threaded through the
    validated event kernel).

    ``with_labels`` additionally writes the CC labels tile (the already
    resident fixed-point result, raw: the Wolff seed cluster carries -1)
    so collect-stats runs can derive CSD/top4 without leaving this kernel
    for the staged path (fk.rs:86-142 collects stats inline).

    ``with_masks`` additionally writes the FK bond-activation tiles
    (``int8 [n_dirs, rows, lanes]``): full observe mode derives
    bond-fraction and winding from them in jnp while the bond draws stay on
    this kernel's hardware-PRNG stream (fk.rs:140-142 — observe builds the
    graph on the production stream and mutates nothing)."""
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    n_spins = l0 * block
    n_g = kp * ks
    big = jnp.int32(n_spins)
    refs = list(rest)
    words_ref = refs.pop(0) if not injected else None
    j_ref = refs.pop(0)
    u_ref = refs.pop(0) if injected else None
    mask_out = refs.pop() if with_masks else None
    lab_out = refs.pop() if with_labels else None
    if with_measure:
        s_out, e_out, m_out = refs
    else:
        (s_out,) = refs

    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    n_dirs = 3 if tri else n_dims
    from .pallas_cc_batch import dir_shifts

    fwd, bwd = dir_shifts(shifts, n_dirs, tri)
    local_idx = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    gi_tile = (row // np.int32(l0)) * np.int32(kp) + col // np.int32(block)

    def gval(j):
        v = jnp.zeros((rows, lanes), jnp.int32)
        for gi in range(n_g):
            v = jnp.where(gi_tile == gi, gscal_ref[0, gi, j], v)
        return v

    def gtemp():
        v = jnp.zeros((rows, lanes), jnp.float32)
        for gi in range(n_g):
            v = jnp.where(gi_tile == gi, gtemp_ref[0, gi, 0], v)
        return v

    if words_ref is not None:
        pltpu.prng_seed(words_ref[0, 0, 0], words_ref[0, 0, 1])

    u_slot = [0]

    def uniform():
        if injected:
            u = u_ref[0, u_slot[0]]
            u_slot[0] += 1
            return u
        return _hw_uniform((rows, lanes))

    def cc(bonds, seed_tile):
        from .pallas_cc_batch import cc_fixed_point

        if seed_tile is None:
            init = local_idx
        else:
            init = jnp.where(local_idx == seed_tile, jnp.int32(-1), local_idx)
        return cc_fixed_point(
            bonds, init, big, (rows, lanes, l0, l1, l2, row, col, shifts),
            n_dirs=n_dirs, tri=tri, log_cc=log_cc,
            rounds_per_check=_ROUNDS_PER_CHECK,
        )

    sf = s_ref[0].astype(jnp.float32)
    temp = gtemp()
    bonds = []
    for d in range(n_dirs):
        inter = sf * fwd[d](sf) * j_ref[0, d]
        # expression form mirrors cluster.fk_bond_activation exactly so the
        # injected-uniform comparison is bitwise (-2*inter then /T)
        p = 1.0 - jnp.exp(-2.0 * inter / temp)
        bonds.append((inter > 0.0) & (uniform() < p))

    if wolff:
        labels = cc(bonds, gval(2))
        flip = labels == -1
    else:
        labels = cc(bonds, None)
        # FK/SW flips singletons too (fk.rs:153-162) — no incident-bond gate
        flip = _salted_uniform_i32(labels, gval(0), gval(1)) < 0.5
    if with_labels:
        lab_out[0] = labels
    if with_masks:
        for d, bd in enumerate(bonds):
            mask_out[0, d] = bd.astype(jnp.int8)
    sf = jnp.where(flip, -sf, sf)
    s_out[0] = sf.astype(jnp.int8)

    if with_measure:
        # fused post-update measurement (positive-sum convention,
        # energy.rs:92-109): reference order is sweep -> FK -> measure, so
        # the engine can skip its jnp recompute on FK sweeps.
        e_site = sf * fwd[0](sf) * j_ref[0, 0]
        for d in range(1, n_dirs):
            e_site = e_site + sf * fwd[d](sf) * j_ref[0, d]
        lane_group = col // np.int32(block)
        for c in range(kp):
            pe_ = e_site if kp == 1 else jnp.where(
                lane_group == c, e_site, 0.0
            )
            pm_ = sf if kp == 1 else jnp.where(lane_group == c, sf, 0.0)
            pe_ = pe_.sum(axis=1, keepdims=True)  # [rows, 1]
            pm_ = pm_.sum(axis=1, keepdims=True)
            for b in range(ks):
                gi = b * kp + c
                win = slice(b * l0, (b + 1) * l0)
                e_out[0, 0, gi] = pe_[win].sum() / np.float32(n_spins)
                m_out[0, 0, gi] = pm_[win].sum().astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "wolff", "shape", "kp", "ks", "interpret", "with_measure",
        "with_labels", "with_masks", "tri", "log_cc",
    ),
)
def fk_update_batch(
    s_pack, gscal, gtemp, words, j, u=None, *,
    wolff, shape, kp, ks, interpret=False, with_measure=False,
    with_labels=False, with_masks=False, tri=False, log_cc=False,
):
    """One fused FK cluster update over a packed system batch.

    Args:
        s_pack: ``int8 [G, rows, lanes]`` packed spins
            (:func:`peapods_tpu.ops.pallas_cc_batch._pack` layout).
        gscal: ``int32 [G, kp*ks, 3]`` per-graph ``(salt0, salt1, seed)``
            (:func:`fk_scalars`, reshaped to tiles).
        gtemp: ``f32 [G, kp*ks, 1]`` per-graph temperature.
        words: ``int32 [G, 1, 2]`` per-tile hardware-PRNG seed words
            (ignored in injected mode).
        j: ``f32 [G, n_dims, rows, lanes]`` packed couplings
            (:func:`pack_fk_j`).
        u: injected per-bond uniforms ``f32 [G, n_dims, rows, lanes]``.
        with_labels: additionally return the packed CC labels
            (``int32 [G, rows, lanes]``, raw: the Wolff seed cluster is -1;
            labels are graph-local min site indices otherwise).
        with_masks: additionally return the packed FK bond masks
            (``int8 [G, n_dirs, rows, lanes]``) for the full-observe path.

    Returns post-update ``s_pack`` (plus ``(e, m)`` with ``with_measure``,
    plus packed labels, then packed masks, with ``with_labels`` /
    ``with_masks``).
    """
    shape = tuple(shape)
    n_dims = len(shape)
    n_dirs = 3 if tri else n_dims
    l0 = shape[0]
    block = int(np.prod(shape[1:]))
    l1 = shape[1]
    l2 = shape[2] if n_dims == 3 else 1
    rows, lanes = ks * l0, kp * block
    g = s_pack.shape[0]
    injected = u is not None
    kernel = functools.partial(
        _fk_kernel,
        wolff=wolff, injected=injected, with_measure=with_measure,
        with_labels=with_labels, with_masks=with_masks,
        l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, n_dims=n_dims, tri=tri,
        log_cc=log_cc,
    )
    tile = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.VMEM,
    )
    smem = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (0,) * len(dims),
        memory_space=pltpu.SMEM,
    )
    in_specs = [smem(kp * ks, 3), smem(kp * ks, 1), tile(rows, lanes)]
    operands = [gscal, gtemp, s_pack]
    if not injected:
        in_specs.append(smem(1, 2))
        operands.append(words)
    in_specs.append(tile(n_dirs, rows, lanes))
    operands.append(j)
    if injected:
        in_specs.append(tile(n_dirs, rows, lanes))
        operands.append(u)
    out_specs = tile(rows, lanes)
    out_shape = jax.ShapeDtypeStruct((g, rows, lanes), jnp.int8)
    if with_measure:
        # singleton middle axis so the grid-blocked SMEM outputs' last-two
        # dims equal the array's (the Mosaic blocking rule — CLAUDE.md)
        out_specs = (
            out_specs, smem(1, kp * ks), smem(1, kp * ks),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((g, 1, kp * ks), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, kp * ks), jnp.int32),
        )
    if with_labels or with_masks:
        if not isinstance(out_specs, tuple):
            out_specs = (out_specs,)
            out_shape = (out_shape,)
    if with_labels:
        out_specs = out_specs + (tile(rows, lanes),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        )
    if with_masks:
        out_specs = out_specs + (tile(n_dirs, rows, lanes),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((g, n_dirs, rows, lanes), jnp.int8),
        )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(*operands)
    if with_measure:
        out = list(out)
        out[1] = out[1].reshape(g, kp * ks)
        out[2] = out[2].reshape(g, kp * ks)
        return tuple(out)
    return out  # s_pack, or a tuple ending (labels?, masks?)


# ------------------------------------------------------- Houdayer-N events

def supports_event_houdn(lattice, group_size: int) -> bool:
    """Fused Houdayer(N) applicability: even groups (balanced sites need
    them) on cc_batch-packable lattices; pair tasks ride the pair kernel."""
    return (
        group_size >= 2
        and group_size % 2 == 0
        and supports_cc_batch(lattice)
    )


def houdn_scalars(wolff: bool, tspins, tkeys, n_spins: int):
    """Per-task scalars for Houdayer(N), bitwise the staged path's draws.

    ``tspins``: ``int8 [B, g, n_spins]``.  Same key-split order as
    :func:`peapods_tpu.ops.overlap.houdayer_bonds` (k_seed, k_coin); for
    g=2 this reproduces :func:`event_scalars`'s houdayer rows exactly
    (``a != b`` == balanced for two replicas).
    """
    z = jnp.int32(0)
    none = jnp.int32(n_spins)

    def one(ts, key):
        k_seed, k_coin = jax.random.split(key)
        if wolff:
            active = ts.astype(jnp.int32).sum(0) == 0
            seed, found = cl.find_seed(k_seed, active)
            seed = jnp.where(found, seed, none).astype(jnp.int32)
            return jnp.stack([z, z, z, z, seed, z])
        s = cl.coin_salt(k_coin)
        return jnp.stack([s[0], s[1], z, z, none, z])

    return jax.vmap(one)(tspins, tkeys)


def _houdn_kernel(
    gscal_ref, *rest, wolff, g_size, with_labels, l0, l1, l2, kp, ks,
    n_dims, tri=False, log_cc=False,
):
    """Fused Houdayer(N) move: balanced-site mask -> deterministic bonds ->
    CC -> flip ALL group members on the chosen clusters.  Bonds carry no
    randomness, so this kernel is bitwise the staged path end-to-end.

    ``with_labels`` additionally writes the CC labels tile (raw Wolff -1
    marker) so collect-stats houdN runs derive CSD/top4 in jnp without
    leaving the fused kernel (the g=2 collect path's round-4 mechanism).
    Bond masks are recomputable in jnp from the spins (deterministic
    balanced-site bonds), so no mask output is needed."""
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    n_spins = l0 * block
    n_g = kp * ks
    big = jnp.int32(n_spins)
    s_refs = rest[:g_size]
    outs = rest[g_size:]
    lab_out = None
    if with_labels:
        outs, lab_out = outs[:-1], outs[-1]

    shifts, _parity, row, col = _mp_geometry(rows, lanes, l0, l1, l2)
    n_dirs = 3 if tri else n_dims
    from .pallas_cc_batch import dir_shifts

    fwd, bwd = dir_shifts(shifts, n_dirs, tri)
    local_idx = jax.lax.rem(row, np.int32(l0)) * np.int32(block) + jax.lax.rem(
        col, np.int32(block)
    )
    gi_tile = (row // np.int32(l0)) * np.int32(kp) + col // np.int32(block)

    def gval(j):
        v = jnp.zeros((rows, lanes), jnp.int32)
        for gi in range(n_g):
            v = jnp.where(gi_tile == gi, gscal_ref[0, gi, j], v)
        return v

    def shift_mask(f, m):
        return f(m.astype(jnp.int32)) != 0

    s = [r[0].astype(jnp.int32) for r in s_refs]
    tot = s[0]
    for x in s[1:]:
        tot = tot + x
    active = tot == 0
    bonds = [active & shift_mask(fwd[d], active) for d in range(n_dirs)]
    ab = [shift_mask(bwd[d], bonds[d]) for d in range(n_dirs)]

    if wolff:
        seed_tile = gval(_SEED)
        init = jnp.where(local_idx == seed_tile, jnp.int32(-1), local_idx)
    else:
        init = local_idx

    from .pallas_cc_batch import cc_fixed_point

    labels = cc_fixed_point(
        bonds, init, big, (rows, lanes, l0, l1, l2, row, col, shifts),
        n_dirs=n_dirs, tri=tri, log_cc=log_cc,
        rounds_per_check=_ROUNDS_PER_CHECK,
    )

    if wolff:
        flip = labels == -1
    else:
        inc = bonds[0]
        for d in range(1, n_dirs):
            inc = inc | bonds[d]
        for d in range(n_dirs):
            inc = inc | ab[d]
        coin = _salted_uniform_i32(labels, gval(_S0), gval(_S1)) < 0.5
        flip = coin & inc
    if lab_out is not None:
        lab_out[0] = labels
    for i in range(g_size):
        outs[i][0] = jnp.where(flip, -s[i], s[i]).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "wolff", "shape", "kp", "ks", "interpret", "with_labels", "tri",
        "log_cc",
    ),
)
def houdn_event_batch(s_packs, gscal, *, wolff, shape, kp, ks,
                      interpret=False, with_labels=False, tri=False,
                      log_cc=False):
    """One fused Houdayer(N) event over a packed task batch.

    ``s_packs``: tuple of g ``int8 [G, rows, lanes]`` packed replica slots;
    ``gscal``: ``int32 [G, kp*ks, 6]`` (:func:`houdn_scalars` rows).
    Returns the g post-move packs (plus packed CC labels last with
    ``with_labels``).
    """
    shape = tuple(shape)
    n_dims = len(shape)
    l0 = shape[0]
    l1 = shape[1]
    l2 = shape[2] if n_dims == 3 else 1
    block = l1 * l2
    rows, lanes = ks * l0, kp * block
    g = s_packs[0].shape[0]
    g_size = len(s_packs)
    kernel = functools.partial(
        _houdn_kernel,
        wolff=wolff, g_size=g_size, with_labels=with_labels,
        l0=l0, l1=l1, l2=l2, kp=kp, ks=ks, n_dims=n_dims, tri=tri,
        log_cc=log_cc,
    )
    tile = pl.BlockSpec(
        (1, rows, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(
        (1, kp * ks, 6), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    out_specs = (tile,) * g_size
    out_shape = tuple(
        jax.ShapeDtypeStruct((g, rows, lanes), jnp.int8)
        for _ in range(g_size)
    )
    if with_labels:
        out_specs = out_specs + (tile,)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((g, rows, lanes), jnp.int32),
        )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[smem] + [tile] * g_size,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interp(interpret),
    )(gscal, *s_packs)
