"""In-kernel megapair overlap events (ops/pallas_megapair.py ``ev_*``).

The whole per-interval block — event sweep, pair overlap move, PT, remaining
sweeps — runs in ONE ``pallas_call`` when ``prog.mp_event`` gates on
(reference sweep order ``simulation/mod.rs:405-796``; per-task moves
``clusters/overlap.rs:64-144``).  Opt-in via ``PEAPODS_MP_EVENT=1`` (the
on-chip A/B measured it slower than the interleaved path, which is the
default).  Oracle: the interleaved megapair path (kernel call A /
fused-event kernel / jnp PT mirror / call B), which carries the
staged-path physics record.  On the CPU
interpreter both paths draw identical per-bond uniforms (the stubbed
hardware PRNG), so trajectories must match BITWISE for every mode:
houdayer's bonds are deterministic (bitwise on hardware too), jorg/cmr
differ on-chip only in the hardware PRNG stream (statistical equivalence,
like the sweep kernels).  The pairing permutation, per-task scalars, and
Wolff ``find_seed`` probe indices are drawn outside the kernel from the
exact staged-path key splits (``mp_event_scalars``), so per-task draws are
bitwise everywhere.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")


def _run(monkeypatch, mp_event, shape, n_replicas, n_temps, modes, cmode,
         pt_full, n_disorder=1, sweeps=4, interval=2, seed=11, temps=None):
    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", mp_event)
    rng = np.random.default_rng(7)
    coup = rng.choice(
        np.float32([-1, 1]), size=(n_disorder,) + shape + (len(shape),)
    )
    if n_disorder == 1:
        coup = coup[0]
    if temps is None:
        temps = np.geomspace(0.9, 2.2, n_temps).astype(np.float32)
    sim = IsingSimulation(list(shape), coup, temps, n_replicas, None, seed,
                          default_chunk=sweeps)
    res = sim.sample(
        sweeps, "metropolis", warmup_ratio=0.0, pt_interval=1,
        pt_schedule="full_ladder" if pt_full else "single_random_edge",
        overlap_cluster_update_interval=interval,
        overlap_cluster_build_mode=modes,
        overlap_cluster_mode=cmode,
    )
    prog = next(iter(sim._programs.values()))
    return np.asarray(sim.get_spins()), res, prog


@pytest.mark.parametrize(
    "shape,n_replicas,modes,cmode,pt_full",
    [
        # kp=1: pairs are adjacent row blocks
        ((8, 128), 2, "houdayer", "wolff", False),
        ((8, 128), 2, "houdayer", "sw", False),
        ((8, 128), 2, "jorg", "wolff", False),
        ((8, 128), 2, "cmr", "sw", True),
        # kp=2: pairs are adjacent lane groups; mode round-robin; find_seed
        ((8, 8, 8), 4, "jorg+cmr", "wolff", True),
    ],
)
def test_fused_event_matches_interleaved_path(
    monkeypatch, shape, n_replicas, modes, cmode, pt_full
):
    s1, r1, p1 = _run(monkeypatch, "1", shape, n_replicas, 2, modes, cmode,
                      pt_full)
    assert p1.mp_event
    assert "+event" in p1.describe_plan()
    s0, r0, p0 = _run(monkeypatch, "0", shape, n_replicas, 2, modes, cmode,
                      pt_full)
    assert not p0.mp_event
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(r1["energies"], r0["energies"])
    np.testing.assert_array_equal(r1["overlap2"], r0["overlap2"])
    np.testing.assert_array_equal(
        r1["per_disorder"]["parallel_tempering"]["edge_attempts"],
        r0["per_disorder"]["parallel_tempering"]["edge_attempts"],
    )
    np.testing.assert_array_equal(
        r1["per_disorder"]["parallel_tempering"]["edge_acceptances"],
        r0["per_disorder"]["parallel_tempering"]["edge_acceptances"],
    )


@pytest.mark.parametrize("case", range(4))
def test_pt_mirror_property(monkeypatch, case):
    """Randomized de-risk of the hand-mirrored PT salts: the in-kernel PT
    (mp_event=1 runs PT inside the megapair kernel around the event) and
    the jnp mirror (mp_event=0 runs ``pt_event_jnp`` between kernel calls)
    must stay bitwise-equal for RANDOM temperature ladders, both PT
    schedules, and R in {2, 4} — the kernel scalar path and the mirror
    each hard-code the salt formula ``(pass*n_edges + e)*R + r``, so any
    future kernel PT change that is not hand-mirrored diverges here
    within a few sweeps (draws feed accept/reject at every edge)."""
    rng = np.random.default_rng(1000 + case)
    n_replicas = int(rng.choice([2, 4]))
    n_temps = int(rng.choice([2, 3]))
    pt_full = bool(case % 2)
    temps = np.sort(rng.uniform(0.5, 3.0, n_temps)).astype(np.float32)
    seed = int(rng.integers(1, 2**30))
    kw = dict(shape=(8, 128), n_replicas=n_replicas, n_temps=n_temps,
              modes="houdayer", cmode="wolff", pt_full=pt_full,
              temps=temps, seed=seed, sweeps=4, interval=2)
    s1, r1, p1 = _run(monkeypatch, "1", **kw)
    assert p1.mp_event
    s0, r0, p0 = _run(monkeypatch, "0", **kw)
    assert not p0.mp_event
    np.testing.assert_array_equal(s1, s0)
    pt1 = r1["per_disorder"]["parallel_tempering"]
    pt0 = r0["per_disorder"]["parallel_tempering"]
    for k in ("edge_attempts", "edge_acceptances", "round_trips"):
        np.testing.assert_array_equal(pt1[k], pt0[k])


def test_fused_event_under_disorder_mesh(monkeypatch):
    """jorg+cmr event operands (scalars, probes, rank tiles, words) shard
    over the disorder mesh; sharded == unsharded bitwise."""
    from peapods_tpu.parallel.mesh import make_mesh
    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", "1")
    shape, n_d = (8, 128), 2
    rng = np.random.default_rng(9)
    coup = rng.choice(np.float32([-1, 1]), size=(n_d,) + shape + (2,))
    temps = np.geomspace(0.9, 2.2, 2).astype(np.float32)
    kw = dict(
        warmup_ratio=0.0, pt_interval=1,
        overlap_cluster_update_interval=2,
        overlap_cluster_build_mode="jorg+cmr",
        overlap_cluster_mode="wolff",
    )
    runs = []
    for mesh in (make_mesh(2), None):
        sim = IsingSimulation([8, 128], coup, temps, 2, None, 5,
                              default_chunk=4, mesh=mesh)
        sim.sample(4, "metropolis", **kw)
        assert next(iter(sim._programs.values())).mp_event
        runs.append(np.asarray(sim.state["spins"]))
    np.testing.assert_array_equal(runs[0], runs[1])


def test_gate_excludes_stats_and_observe(monkeypatch):
    """Label-consuming configs stay on the interleaved path (the fused
    event returns no labels), exactly like the task-kernel gate."""
    s, r, prog = _run(monkeypatch, "1", (8, 128), 2, 2, "houdayer", "wolff",
                      False)
    assert prog.mp_event

    from peapods_tpu.engine.simulation import IsingSimulation

    monkeypatch.setenv("PEAPODS_MP_EVENT", "1")
    rng = np.random.default_rng(7)
    coup = rng.choice(np.float32([-1, 1]), size=(8, 128, 2))
    sim = IsingSimulation([8, 128], coup, np.float32([1.5, 2.0]), 2, None, 3,
                          default_chunk=2)
    sim.sample(
        2, "metropolis", warmup_ratio=0.0,
        overlap_cluster_update_interval=1,
        overlap_cluster_build_mode="houdayer",
        collect_cluster_stats=True,
    )
    assert not next(iter(sim._programs.values())).mp_event


@pytest.mark.parametrize(
    "shape,n_replicas,kind,wolff",
    [
        ((8, 128), 2, "jorg", True),
        ((8, 128), 2, "jorg", False),
        ((8, 8, 8), 4, "cmr", True),
        ((8, 8, 8), 4, "cmr", False),
    ],
)
def test_injected_event_matches_staged(monkeypatch, shape, n_replicas, kind,
                                       wolff):
    """Per-bond uniforms injected into the in-kernel event and the staged
    jnp move => bitwise-equal spins — pins the NONZERO-uniform bond logic
    (stochastic probabilities, J/T slab mapping) the zero-PRNG interpreter
    path cannot see.  Power-of-two temperatures make the kernel's
    ``J * 0.5 * (1/(T/2))`` exactly ``J/T``, so no last-ulp slack is
    needed."""
    import jax
    import jax.numpy as jnp
    from peapods_tpu.ops import pallas_megapair as mp
    from peapods_tpu.ops import pallas_event as pe
    from peapods_tpu.ops import overlap as ov
    from peapods_tpu.ops import cluster as cl
    from peapods_tpu.ops.lattice import Lattice
    from peapods_tpu.ops.geometry import GridOps

    n_temps = 2
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    kp, rp = mp.supports_megapair(lat, n_replicas, n_temps)
    l0 = shape[0]
    n = lat.n_spins
    block = n // l0
    rows, lanes = rp * l0, kp * block
    n_pairs = n_replicas // 2
    nd = len(shape)
    rng = np.random.default_rng(31 + len(shape))

    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.float32([1.0, 2.0]))
    jg = mp.pack_coupling_grids_mp(coup, shape, kp, rp)[None]
    slot_flat = jnp.asarray(rng.choice(
        np.array([-1, 1], np.int8), size=(1, n_replicas, n_temps, n)
    ))
    tiles = mp.slots_to_tiles(slot_flat, l0, block, kp, rp)

    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, (1, 2), np.int32))
    ptw = jnp.zeros((1, 2), jnp.int32)
    meta = jnp.array([[0, 1]], jnp.int32)
    sid = jnp.arange(n_replicas * n_temps, dtype=jnp.int32)[None]
    ea = jnp.zeros((1, 1), jnp.int32)
    ec = jnp.zeros((1, 1), jnp.int32)
    rtr = jnp.zeros((1, n_replicas * n_temps), jnp.int32)
    tst = jnp.zeros((1, n_replicas * n_temps), jnp.int32)
    par = jnp.zeros((1, 1), jnp.int32)
    kw = dict(
        shape=tuple(shape), gibbs=False, n_inner=1, n_temps=n_temps,
        n_replicas=n_replicas, kp=kp, rp=rp, pt_interval=None,
        pt_full=False, hot_slot=n_temps - 1, cold_slot=0, interpret=True,
    )
    base = (tiles, jg, temps[None], seeds, ptw, meta, sid, ea, ec, rtr,
            tst, par)

    # pairing permutation + task keys/scalars (the engine's draw shapes)
    perm = jnp.asarray(
        np.stack([rng.permutation(n_replicas) for _ in range(n_temps)])
    ).astype(jnp.int32)[None]
    iperm = jnp.argsort(perm, axis=-1).astype(jnp.int32)
    tkeys = jax.random.split(jax.random.key(17), n_temps * n_pairs)
    scal, probes = pe.mp_event_scalars(kind, wolff, tkeys, n)
    ev_args = [
        jnp.zeros((1, 1), jnp.int32),                # mode 0
        perm.reshape(1, -1),
        iperm.reshape(1, -1),
        scal.reshape(1, -1),
        jnp.zeros((1, 2), jnp.int32),                # words (unused: inject)
    ]
    probes_on = wolff and kind in ("houdayer", "jorg")
    if probes_on:
        ev_args += [
            probes.reshape(1, -1),
            pe.mp_event_rank_tiles(probes[None], n_replicas, n_temps,
                                   shape, kp, rp),
        ]

    # per-task per-dimension uniform fields, mapped to even canonical
    # positions; slot order matches the kernel's draw order (phase-major,
    # dimension-minor: jorg d0..dN; cmr blue d0..dN then red d0..dN)
    n_phase = 1 if kind == "jorg" else 2
    u_dims = jnp.asarray(
        rng.random((n_phase, nd, n_temps, n_pairs, n), np.float32)
    )

    def u_tile_pd(phase, d):
        us = jnp.zeros((1, n_replicas, n_temps, n), jnp.float32)
        us = us.at[:, ::2].set(u_dims[phase, d].swapaxes(0, 1)[None])
        return mp.slots_to_tiles(us, l0, block, kp, rp)[0]

    ev_u = jnp.stack(
        [u_tile_pd(p, d) for p in range(n_phase) for d in range(nd)]
    )[None]

    # --- kernel: sweep 0 (zero-PRNG on the interpreter) + in-kernel event
    out_ev = mp.megapair_chunk(
        *base, *ev_args, ev_u=ev_u, **kw, ev_kinds=(kind,),
        ev_wolff=wolff,
    )
    # --- reference: same sweep without the event, then the staged jnp move
    out_sw = mp.megapair_chunk(*base, **kw)
    sf = mp.tiles_to_slots(out_sw[0], l0, block, kp, rp)[0]  # [R, T, n]

    t_idx = jnp.arange(n_temps)[:, None]
    p_idx = jnp.arange(n_pairs)[None, :]
    a = sf[perm[0, t_idx, 2 * p_idx], t_idx]      # [T, P, n]
    b = sf[perm[0, t_idx, 2 * p_idx + 1], t_idx]
    tk = tkeys.reshape(n_temps, n_pairs)

    def staged_one(av, bv, k, t, uu):
        ts = jnp.stack([av, bv])
        if kind == "jorg":
            bonds, aux = ov.jorg_bonds(ts, k, coup, t, geom, u_bond=uu[0])
            labels = cl.connected_components(bonds, geom)
            return ov.jorg_finish(
                ts, labels, bonds, aux, geom, wolff=wolff, update=True,
                with_winding=False, with_stats=False,
            ).spins
        blue, aux = ov.cmr_blue_bonds(ts, k, coup, t, geom, u_blue=uu[0])
        blue_labels = cl.connected_components(blue, geom)
        ts2, grey, carry = ov.cmr_mid(
            ts, blue_labels, blue, aux, coup, geom, wolff=wolff,
            update=True, with_winding=False, with_stats=False, u_red=uu[1],
        )
        grey_labels = cl.connected_components(grey, geom)
        return ov.cmr_finish(
            ts2, grey_labels, grey, blue_labels, carry, geom,
            wolff=wolff, update=True,
        ).spins

    u_by_task = u_dims.transpose(2, 3, 0, 4, 1)   # [T, P, phase, n, nd]
    moved = jax.vmap(jax.vmap(staged_one))(
        a, b, tk, jnp.broadcast_to(temps[:, None], (n_temps, n_pairs)),
        u_by_task,
    )  # [T, P, 2, n]
    sf_exp = sf.at[perm[0, t_idx, 2 * p_idx], t_idx].set(moved[:, :, 0])
    sf_exp = sf_exp.at[perm[0, t_idx, 2 * p_idx + 1], t_idx].set(
        moved[:, :, 1]
    )
    exp_tiles = mp.slots_to_tiles(sf_exp[None], l0, block, kp, rp)
    np.testing.assert_array_equal(
        np.asarray(out_ev[0]), np.asarray(exp_tiles)
    )
