"""Fused overlap-event kernel (ops/pallas_event.py).

The kernel runs bond build + CC + cluster flips in one pallas_call.  Its
decision logic must match the staged task kernels bitwise:

* Houdayer bonds are deterministic, so the fused event must equal the staged
  path bitwise end-to-end (both SW and Wolff, 2D and 3D).
* Joerg/CMR draw per-bond uniforms from the hardware PRNG; the injected-
  uniform entry point pins everything downstream of the draws bitwise
  against the staged stage functions fed the same uniforms.
* In the engine, a Houdayer update run with the fused kernel must be
  bitwise identical to the staged path, and the Joerg/CMR fused path must
  integrate (valid spins, schema) — their statistics are covered by the
  on-TPU suite (tests/tpu_stats_ci.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peapods_tpu.ops import cluster as cl
from peapods_tpu.ops import overlap as ov
from peapods_tpu.ops import pallas_event as pe
from peapods_tpu.ops import pallas_cc_batch as ccb
from peapods_tpu.ops.geometry import GridOps
from peapods_tpu.ops.lattice import Lattice


def _task_batch(shape, n_tasks, seed):
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n = lat.n_spins
    key = jax.random.key(seed)
    ka, kb, kt = jax.random.split(key, 3)
    a = jax.random.bernoulli(ka, 0.5, (n_tasks, n)).astype(jnp.int8) * 2 - 1
    b = jax.random.bernoulli(kb, 0.5, (n_tasks, n)).astype(jnp.int8) * 2 - 1
    tkeys = jax.random.split(kt, n_tasks)
    return lat, geom, a, b, tkeys


def _run_fused(lat, a, b, tkeys, kind, wolff, jt=None, u_slots=None,
               with_labels=False, with_masks=False):
    """Pack a flat task batch and run the fused event kernel on it."""
    shape = tuple(lat.shape)
    n = lat.n_spins
    n_tasks = a.shape[0]
    kp, ks = ccb.cc_batch_factors(lat, n_tasks)
    tile = kp * ks
    l0, block = shape[0], n // shape[0]
    gscal = pe.event_scalars(kind, wolff, a, b, tkeys, n)
    words = jax.lax.bitcast_convert_type(
        jax.random.key_data(tkeys).astype(jnp.uint32), jnp.int32
    )
    pad = (-n_tasks) % tile
    if pad:
        zrow = lambda x: jnp.zeros((pad,) + x.shape[1:], x.dtype)
        a = jnp.concatenate([a, zrow(a)], 0)
        b = jnp.concatenate([b, zrow(b)], 0)
        gscal = jnp.concatenate(
            [gscal, jnp.zeros((pad, 6), jnp.int32).at[:, 4].set(n)], 0
        )
        words = jnp.concatenate([words, zrow(words)], 0)
        if u_slots is not None:
            u_slots = [jnp.concatenate([u, zrow(u)], 0) for u in u_slots]
    g = (n_tasks + pad) // tile
    a_p = ccb._pack(a, l0, block, kp, ks)
    b_p = ccb._pack(b, l0, block, kp, ks)
    u = (
        jnp.stack([ccb._pack(s, l0, block, kp, ks) for s in u_slots], axis=1)
        if u_slots is not None
        else None
    )
    out = pe.overlap_event_batch(
        a_p, b_p, gscal.reshape(g, tile, 6),
        words.reshape(g, tile, 2)[:, :1, :], jt, u,
        kind=kind, wolff=wolff, shape=shape, kp=kp, ks=ks, interpret=True,
        with_labels=with_labels, with_masks=with_masks,
        tri=bool(ccb.grid_dims(lat)[4]),
    )
    a2 = ccb._unpack(out[0], l0, block, kp, ks)[:n_tasks]
    b2 = ccb._unpack(out[1], l0, block, kp, ks)[:n_tasks]
    spins = jnp.stack([a2, b2], axis=1)
    ret = (spins,)
    if with_labels:
        ret = ret + (ccb._unpack(out[2], l0, block, kp, ks)[:n_tasks],)
    if with_masks:
        m = out[-1]  # int8 [g, n_dirs, rows, lanes]
        ret = ret + (jnp.stack(
            [
                ccb._unpack(m[:, d], l0, block, kp, ks)[:n_tasks]
                for d in range(m.shape[1])
            ],
            axis=-1,
        ) != 0,)
    return ret if len(ret) > 1 else spins


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_houdayer_fused_bitwise(shape, wolff):
    """Deterministic bonds: the fused event equals the staged task bitwise."""
    lat, geom, a, b, tkeys = _task_batch(shape, 4, seed=len(shape))
    staged = jax.vmap(
        lambda av, bv, k: ov.houdayer_task(
            jnp.stack([av, bv]), k, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins
    )(a, b, tkeys)
    fused = _run_fused(lat, a, b, tkeys, "houdayer", wolff)
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))


def _jt_for(lat, coup, temps):
    """Per-task packed J/T via pack_event_jt's (d=1, groups=1) layout."""
    kp, ks = ccb.cc_batch_factors(lat, temps.shape[0])
    return pe.pack_event_jt(
        coup[None], temps, 1, tuple(lat.shape), kp, ks
    )


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_jorg_fused_injected_bitwise(shape, wolff):
    """Same per-bond uniforms into both paths => bitwise-equal spins."""
    lat, geom, a, b, tkeys = _task_batch(shape, 4, seed=10 + len(shape))
    n, nd = lat.n_spins, lat.n_dims
    rng = np.random.default_rng(5)
    coup = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(n, nd)).astype(np.float32)
    )
    temps = jnp.asarray(
        np.linspace(0.8, 1.6, a.shape[0]).astype(np.float32)
    )
    u = jnp.asarray(rng.random((a.shape[0], n, nd)).astype(np.float32))

    def staged_one(av, bv, k, t, uu):
        ts = jnp.stack([av, bv])
        bonds, aux = ov.jorg_bonds(ts, k, coup, t, geom, u_bond=uu)
        labels = cl.connected_components(bonds, geom)
        return ov.jorg_finish(
            ts, labels, bonds, aux, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins

    staged = jax.vmap(staged_one)(a, b, tkeys, temps, u)
    fused = _run_fused(
        lat, a, b, tkeys, "jorg", wolff,
        jt=_jt_for(lat, coup, temps),
        u_slots=[u[..., d] for d in range(nd)],
    )
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_cmr_fused_injected_bitwise(shape, wolff):
    """Blue + red uniforms injected into both paths => bitwise equality
    through both CC phases and the grey k-flips."""
    lat, geom, a, b, tkeys = _task_batch(shape, 4, seed=20 + len(shape))
    n, nd = lat.n_spins, lat.n_dims
    rng = np.random.default_rng(6)
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(
        np.linspace(0.8, 1.6, a.shape[0]).astype(np.float32)
    )
    u_blue = jnp.asarray(rng.random((a.shape[0], n, nd)).astype(np.float32))
    u_red = jnp.asarray(rng.random((a.shape[0], n, nd)).astype(np.float32))

    def staged_one(av, bv, k, t, ub, ur):
        ts = jnp.stack([av, bv])
        blue, aux = ov.cmr_blue_bonds(ts, k, coup, t, geom, u_blue=ub)
        blue_labels = cl.connected_components(blue, geom)
        ts, grey_bonds, carry = ov.cmr_mid(
            ts, blue_labels, blue, aux, coup, geom, wolff=wolff,
            update=True, with_winding=False, with_stats=False, u_red=ur,
        )
        grey_labels = cl.connected_components(grey_bonds, geom)
        return ov.cmr_finish(
            ts, grey_labels, grey_bonds, blue_labels, carry, geom,
            wolff=wolff, update=True,
        ).spins

    staged = jax.vmap(staged_one)(a, b, tkeys, temps, u_blue, u_red)
    fused = _run_fused(
        lat, a, b, tkeys, "cmr", wolff,
        jt=_jt_for(lat, coup, temps),
        u_slots=[u_blue[..., d] for d in range(nd)]
        + [u_red[..., d] for d in range(nd)],
    )
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))


@pytest.mark.parametrize("kind", ["houdayer", "jorg", "cmr"])
@pytest.mark.parametrize("wolff", [False, True])
def test_event_fused_labels_bitwise(kind, wolff):
    """with_labels must (a) leave the move untouched and (b) emit the
    stats-graph CC labels (the blue graph for CMR — overlap.rs collects
    CSD/top4 there) bitwise-equal to the staged jnp CC on the same bonds
    after the engine's Wolff -1 cleaning."""
    shape = (8, 16)
    lat, geom, a, b, tkeys = _task_batch(shape, 4, seed=40 + len(kind))
    n, nd = lat.n_spins, lat.n_dims
    rng = np.random.default_rng(41 + len(kind))
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.8, 1.6, a.shape[0]).astype(np.float32))
    kw = {}
    if kind == "houdayer":
        def staged_labels(av, bv, k):
            bonds, _ = ov.houdayer_bonds(jnp.stack([av, bv]), k, geom)
            return cl.connected_components(bonds, geom)

        exp = jax.vmap(staged_labels)(a, b, tkeys)
    elif kind == "jorg":
        u = jnp.asarray(rng.random((a.shape[0], n, nd)).astype(np.float32))

        def staged_labels(av, bv, k, t, uu):
            bonds, _ = ov.jorg_bonds(
                jnp.stack([av, bv]), k, coup, t, geom, u_bond=uu
            )
            return cl.connected_components(bonds, geom)

        exp = jax.vmap(staged_labels)(a, b, tkeys, temps, u)
        kw = dict(jt=_jt_for(lat, coup, temps),
                  u_slots=[u[..., d] for d in range(nd)])
    else:
        u_blue = jnp.asarray(
            rng.random((a.shape[0], n, nd)).astype(np.float32)
        )
        u_red = jnp.asarray(
            rng.random((a.shape[0], n, nd)).astype(np.float32)
        )

        def staged_labels(av, bv, k, t, ub):
            blue, _ = ov.cmr_blue_bonds(
                jnp.stack([av, bv]), k, coup, t, geom, u_blue=ub
            )
            return cl.connected_components(blue, geom)

        exp = jax.vmap(staged_labels)(a, b, tkeys, temps, u_blue)
        kw = dict(jt=_jt_for(lat, coup, temps),
                  u_slots=[u_blue[..., d] for d in range(nd)]
                  + [u_red[..., d] for d in range(nd)])

    plain = _run_fused(lat, a, b, tkeys, kind, wolff, **kw)
    fused, lab = _run_fused(lat, a, b, tkeys, kind, wolff,
                            with_labels=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fused))
    lab = np.array(lab)
    if wolff:
        for t in range(lab.shape[0]):
            neg = lab[t] == -1
            if neg.any():
                lab[t][neg] = np.flatnonzero(neg).min()
    np.testing.assert_array_equal(lab, np.asarray(exp))


@pytest.mark.parametrize("kind", ["houdayer", "jorg", "cmr"])
def test_event_fused_masks_bitwise(kind):
    """with_masks must (a) leave the move and labels untouched and (b) emit
    the stats-graph bond activations (blue bonds for CMR) bitwise-equal to
    the staged bond build on the same uniforms — the full-observe path
    derives bond-fraction/winding from exactly these masks."""
    shape = (8, 16)
    lat, geom, a, b, tkeys = _task_batch(shape, 4, seed=60 + len(kind))
    n, nd = lat.n_spins, lat.n_dims
    rng = np.random.default_rng(61 + len(kind))
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.8, 1.6, a.shape[0]).astype(np.float32))
    kw = {}
    if kind == "houdayer":
        exp = jax.vmap(
            lambda av, bv, k: ov.houdayer_bonds(jnp.stack([av, bv]), k,
                                                geom)[0]
        )(a, b, tkeys)
    elif kind == "jorg":
        u = jnp.asarray(rng.random((a.shape[0], n, nd)).astype(np.float32))
        exp = jax.vmap(
            lambda av, bv, k, t, uu: ov.jorg_bonds(
                jnp.stack([av, bv]), k, coup, t, geom, u_bond=uu
            )[0]
        )(a, b, tkeys, temps, u)
        kw = dict(jt=_jt_for(lat, coup, temps),
                  u_slots=[u[..., d] for d in range(nd)])
    else:
        u_blue = jnp.asarray(
            rng.random((a.shape[0], n, nd)).astype(np.float32)
        )
        u_red = jnp.asarray(
            rng.random((a.shape[0], n, nd)).astype(np.float32)
        )
        exp = jax.vmap(
            lambda av, bv, k, t, ub: ov.cmr_blue_bonds(
                jnp.stack([av, bv]), k, coup, t, geom, u_blue=ub
            )[0]
        )(a, b, tkeys, temps, u_blue)
        kw = dict(jt=_jt_for(lat, coup, temps),
                  u_slots=[u_blue[..., d] for d in range(nd)]
                  + [u_red[..., d] for d in range(nd)])

    plain = _run_fused(lat, a, b, tkeys, kind, False, **kw)
    with_lab, lab = _run_fused(lat, a, b, tkeys, kind, False,
                               with_labels=True, **kw)
    fused, lab2, masks = _run_fused(lat, a, b, tkeys, kind, False,
                                    with_labels=True, with_masks=True, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fused))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab2))
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(exp))


TRI = [[1, 0], [0, 1], [1, -1]]


@pytest.mark.parametrize("wolff", [False, True])
def test_triangular_kernels_bitwise(wolff):
    """Triangular offsets through the packed-tile kernels (the third bond
    direction ``[1, -1]`` is a composition of the axis shifts): batched CC,
    the fused FK update (injected uniforms), and the fused Houdayer event
    (deterministic bonds) must each be bitwise the staged jnp path."""
    lat = Lattice([8, 16], TRI)
    geom = GridOps.from_lattice(lat)
    n = lat.n_spins
    assert ccb.supports_cc_batch(lat) and ccb.grid_dims(lat)[4]
    rng = np.random.default_rng(77)
    B = 6

    # batched CC over random 3-direction bond graphs
    active = jnp.asarray(rng.random((B, n, 3)) < 0.4)
    kp, ks = ccb.cc_batch_factors(lat, B)
    pad = (-B) % (kp * ks)
    a_pad = jnp.concatenate(
        [active, jnp.zeros((pad, n, 3), bool)], 0
    )
    lab = ccb.connected_components_batch(
        a_pad, shape=(8, 16), kp=kp, ks=ks, interpret=True, tri=True
    )[:B]
    exp = jax.vmap(lambda a: cl.connected_components(a, geom))(active)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(exp))

    # fused FK update with injected per-bond uniforms
    spins = jnp.asarray(rng.choice(np.array([-1, 1], np.int8), size=(B, n)))
    coup = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.9, 2.4, B).astype(np.float32))
    u = jnp.asarray(rng.random((B, n, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(7), B)
    kf = jax.vmap(jax.random.split)(keys)[:, 1]

    def staged_fk(s, t, k, uu):
        kbv, kfv = jax.random.split(k)
        act = cl.fk_bond_activation(s, coup, geom, t, kbv, u=uu)
        labels = cl.connected_components(act, geom)
        if wolff:
            seed = jax.random.randint(kfv, (), 0, n)
            flip = cl.wolff_flip_mask(labels, seed)
        else:
            flip = cl.cluster_coin_flip_mask(kfv, labels)
        return jnp.where(flip, -s, s)

    staged = jax.vmap(staged_fk)(spins, temps, keys, u)
    fused = _fk_fused(lat, spins, kf, temps, coup, u, wolff)
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))

    # fused Houdayer pair event (deterministic bonds -> bitwise everywhere)
    a = jnp.asarray(rng.choice(np.array([-1, 1], np.int8), size=(B, n)))
    b = jnp.asarray(rng.choice(np.array([-1, 1], np.int8), size=(B, n)))
    tkeys = jax.random.split(jax.random.key(9), B)
    staged_ev = jax.vmap(
        lambda av, bv, k: ov.houdayer_task(
            jnp.stack([av, bv]), k, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins
    )(a, b, tkeys)
    fused_ev = _run_fused(lat, a, b, tkeys, "houdayer", wolff)
    np.testing.assert_array_equal(
        np.asarray(staged_ev), np.asarray(fused_ev)
    )

    # fused Joerg pair event with injected per-bond uniforms
    u2 = jnp.asarray(rng.random((B, n, 3)).astype(np.float32))

    def staged_jorg(av, bv, k, t, uu):
        ts = jnp.stack([av, bv])
        bonds, aux = ov.jorg_bonds(ts, k, coup, t, geom, u_bond=uu)
        labels = cl.connected_components(bonds, geom)
        return ov.jorg_finish(
            ts, labels, bonds, aux, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins

    staged_j = jax.vmap(staged_jorg)(a, b, tkeys, temps, u2)
    fused_j = _run_fused(
        lat, a, b, tkeys, "jorg", wolff,
        jt=_jt_for(lat, coup, temps),
        u_slots=[u2[..., d] for d in range(3)],
    )
    np.testing.assert_array_equal(np.asarray(staged_j), np.asarray(fused_j))


def test_salted_uniform_i32_matches_cluster():
    """The kernel's int32 re-expression of the label hash is bitwise the
    uint32 original for every label/salt combination it will see."""
    rng = np.random.default_rng(9)
    labels = jnp.asarray(
        np.concatenate([[-1], np.arange(512), rng.integers(0, 2**20, 64)])
        .astype(np.int32)
    )
    for _ in range(4):
        salt = jnp.asarray(rng.integers(-(2**31), 2**31, 2, dtype=np.int64)
                           .astype(np.int32))
        ref = cl.salted_uniform(labels, salt)
        got = pe._salted_uniform_i32(labels, salt[0], salt[1])
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _sim(shape, seed, n_disorder=2, n_replicas=4):
    from peapods_tpu.engine.simulation import IsingSimulation

    rng = np.random.default_rng(seed)
    nd = len(shape)
    coup = rng.choice(
        np.float32([-1, 1]), size=(n_disorder,) + tuple(shape) + (nd,)
    )
    temps = np.geomspace(0.9, 2.0, 3).astype(np.float32)
    return IsingSimulation(list(shape), coup, temps, n_replicas, None, seed,
                           default_chunk=8, mesh=None)


def test_engine_houdayer_event_bitwise(monkeypatch):
    """Engine trajectories must be identical with the fused event kernel on
    and off for Houdayer (deterministic bonds)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="houdayer", warmup_ratio=0)
    a = _sim((8, 8, 8), 11)
    ra = a.sample(9, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel

    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    b = _sim((8, 8, 8), 11)
    rb = b.sample(9, "metropolis", **kw)
    assert not next(iter(b._programs.values())).event_kernel
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]), np.asarray(b.state["system_ids"])
    )
    np.testing.assert_array_equal(ra["overlap2"], rb["overlap2"])


def test_engine_event_kernel_collects_stats(monkeypatch):
    """collect_cluster_stats keeps the fused pair-event kernel (labels-out
    CSD/top4); for Houdayer (deterministic bonds) the collected statistics
    must be BITWISE the staged path's, and collecting must not perturb the
    trajectory."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="houdayer",
              collect_cluster_stats=True, warmup_ratio=0)
    a = _sim((8, 8, 8), 13)
    ra = a.sample(9, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel and "event=fused" in prog.describe_plan()
    assert "+stats" in prog.describe_plan()

    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    b = _sim((8, 8, 8), 13)
    rb = b.sample(9, "metropolis", **kw)
    assert not next(iter(b._programs.values())).event_kernel
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["overlap_csd"]), np.asarray(rb["overlap_csd"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["top_cluster_sizes"]),
        np.asarray(rb["top_cluster_sizes"]),
    )
    monkeypatch.delenv("PEAPODS_DISABLE_EVENTKERNEL")

    # collecting must not change the trajectory (labels-out is pure)
    kw2 = dict(kw)
    kw2.pop("collect_cluster_stats")
    c = _sim((8, 8, 8), 13)
    c.sample(9, "metropolis", **kw2)
    assert next(iter(c._programs.values())).event_kernel
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(c.state["spins"])
    )

    # jorg+cmr: fused+stats integrates (hw-PRNG bonds: statistical parity
    # rides the on-TPU suite); full ladder + both modes like config 5
    d = _sim((8, 8), 17)
    rd = d.sample(8, "metropolis", pt_interval=1, pt_schedule="full_ladder",
                  overlap_cluster_update_interval=2,
                  overlap_cluster_build_mode="jorg+cmr",
                  collect_cluster_stats=True, warmup_ratio=0)
    progd = next(iter(d._programs.values()))
    assert progd.event_kernel and "+stats" in progd.describe_plan()
    assert np.isfinite(rd["overlap2"]).all()


def test_engine_jorg_cmr_event_runs(monkeypatch):
    """Joerg+CMR through the fused kernel: integrates, spins stay valid.
    (Interpret-mode hardware PRNG is degenerate, so only mechanics here;
    statistics are pinned by the injected tests + the on-TPU suite.)"""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="jorg+cmr", warmup_ratio=0)
    s = _sim((8, 16), 13)
    r = s.sample(9, "metropolis", **kw)
    prog = next(iter(s._programs.values()))
    assert prog.event_kernel
    spins = np.asarray(s.state["spins"])
    assert set(np.unique(spins)) <= {-1, 1}
    assert np.isfinite(r["energies"]).all()


def test_engine_event_kernel_observes(monkeypatch):
    """Full observe mode keeps the fused pair-event kernel: the kernel
    emits its resident labels AND bond masks, bond-fraction/winding derive
    in jnp, and the flipped spins are discarded (observe mutates nothing,
    overlap.rs:146-339).  For Houdayer (deterministic bonds) every
    observation must be BITWISE the staged observe path's — including the
    winding flags on the canonical 2D lattice — and the trajectory must be
    bitwise an observer-free run's."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="houdayer",
              overlap_cluster_mode="sw",
              overlap_cluster_action="observe", warmup_ratio=0)
    a = _sim((8, 16), 17)
    ra = a.sample(6, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel and "event=fused" in prog.describe_plan()
    assert "+obs" in prog.describe_plan()
    assert "overlap_csd" in ra

    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    b = _sim((8, 16), 17)
    rb = b.sample(6, "metropolis", **kw)
    assert not next(iter(b._programs.values())).event_kernel
    monkeypatch.delenv("PEAPODS_DISABLE_EVENTKERNEL")
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    obs_a = ra["per_disorder"]["cluster_observations"]["houdayer"]
    obs_b = rb["per_disorder"]["cluster_observations"]["houdayer"]
    assert set(obs_a) == set(obs_b)
    assert "winding_x" in obs_a  # canonical 2D lattice
    for k in obs_a:
        np.testing.assert_array_equal(
            np.asarray(obs_a[k]), np.asarray(obs_b[k]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(ra["overlap_csd"]), np.asarray(rb["overlap_csd"])
    )

    # observing must not perturb the trajectory (observer-free run)
    c = _sim((8, 16), 17)
    c.sample(6, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(c.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]),
        np.asarray(c.state["system_ids"]),
    )


def test_engine_jorg_cmr_observe_fused_runs(monkeypatch):
    """Joerg/CMR full observe on the fused kernel: the observed graphs ride
    the hardware-PRNG production stream (statistical parity rides the
    on-TPU suite), the schema is complete, and the trajectory stays
    bitwise an observer-free run's."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, pt_schedule="full_ladder",
              overlap_cluster_update_interval=2,
              overlap_cluster_build_mode="jorg+cmr",
              overlap_cluster_mode="sw",
              overlap_cluster_action="observe", warmup_ratio=0)
    a = _sim((8, 16), 23)
    ra = a.sample(4, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel and "+obs" in prog.describe_plan()
    for kind in ("jorg", "cmr_blue"):
        obs = ra["per_disorder"]["cluster_observations"][kind]
        assert obs["observation_count"].sum() > 0
        assert np.all(obs["active_bond_density"] >= 0.0)
        assert np.all(obs["active_bond_density"] <= 1.0)
        assert "winding_x" in obs

    c = _sim((8, 16), 23)
    c.sample(4, "metropolis", pt_interval=1, pt_schedule="full_ladder",
             warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(c.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]),
        np.asarray(c.state["system_ids"]),
    )


def _fk_fused(lat, spins, kf_keys, temps, coup, u, wolff, with_labels=False,
              with_masks=False):
    """Pack a flat FK system batch and run the fused FK kernel on it."""
    shape = tuple(lat.shape)
    n, nd = lat.n_spins, lat.n_neighbors
    tri = bool(ccb.grid_dims(lat)[4])
    B = spins.shape[0]
    kp, ks = ccb.cc_batch_factors(lat, B)
    tile = kp * ks
    l0, block = shape[0], n // shape[0]
    gscal = pe.fk_scalars(wolff, kf_keys, n)
    gtemp = temps[:, None].astype(jnp.float32)
    pad = (-B) % tile
    if pad:
        zrow = lambda x: jnp.zeros((pad,) + x.shape[1:], x.dtype)
        spins = jnp.concatenate([spins, zrow(spins)], 0)
        gscal = jnp.concatenate([gscal, jnp.zeros((pad, 3), jnp.int32)], 0)
        gtemp = jnp.concatenate([gtemp, jnp.ones((pad, 1), jnp.float32)], 0)
        u = jnp.concatenate([u, zrow(u)], 0)
    g = (B + pad) // tile
    s_p = ccb._pack(spins, l0, block, kp, ks)
    u_p = jnp.stack(
        [ccb._pack(u[..., d], l0, block, kp, ks) for d in range(nd)], axis=1
    )
    j = pe.pack_fk_j(coup[None], B, shape, kp, ks)
    words = jnp.zeros((g, 1, 2), jnp.int32)
    out = pe.fk_update_batch(
        s_p, gscal.reshape(g, tile, 3), gtemp.reshape(g, tile, 1),
        words, j, u_p,
        wolff=wolff, shape=shape, kp=kp, ks=ks, interpret=True,
        with_labels=with_labels, with_masks=with_masks, tri=tri,
    )
    if not isinstance(out, tuple):
        return ccb._unpack(out, l0, block, kp, ks)[:B]
    out = list(out)
    ret = [ccb._unpack(out.pop(0), l0, block, kp, ks)[:B]]
    if with_labels:
        ret.append(ccb._unpack(out.pop(0), l0, block, kp, ks)[:B])
    if with_masks:
        m = out.pop(0)
        ret.append(jnp.stack(
            [
                ccb._unpack(m[:, d], l0, block, kp, ks)[:B]
                for d in range(m.shape[1])
            ],
            axis=-1,
        ) != 0)
    return tuple(ret)


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_fk_fused_injected_bitwise(shape, wolff):
    """Same per-bond uniforms into the staged FK stages (bond activation ->
    jnp CC -> coin/Wolff flips) and the fused kernel => bitwise-equal spins,
    including the per-graph key-split discipline (kb for bonds, kf for the
    flip draws) the engine uses."""
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n, nd = lat.n_spins, lat.n_dims
    B = 6
    rng = np.random.default_rng(30 + len(shape))
    spins = jnp.asarray(
        rng.choice(np.array([-1, 1], np.int8), size=(B, n))
    )
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.9, 2.4, B).astype(np.float32))
    u = jnp.asarray(rng.random((B, n, nd)).astype(np.float32))
    keys = jax.random.split(jax.random.key(7), B)
    kb_kf = jax.vmap(jax.random.split)(keys)
    kf = kb_kf[:, 1]

    def staged_one(s, t, k, uu):
        kbv, kfv = jax.random.split(k)
        active = cl.fk_bond_activation(s, coup, geom, t, kbv, u=uu)
        labels = cl.connected_components(active, geom)
        if wolff:
            seed = jax.random.randint(kfv, (), 0, n)
            flip = cl.wolff_flip_mask(labels, seed)
        else:
            flip = cl.cluster_coin_flip_mask(kfv, labels)
        return jnp.where(flip, -s, s)

    staged = jax.vmap(staged_one)(spins, temps, keys, u)
    fused = _fk_fused(lat, spins, kf, temps, coup, u, wolff)
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_fk_fused_labels_bitwise(shape, wolff):
    """with_labels must (a) leave the update trajectory untouched and
    (b) emit labels bitwise-equal to the staged jnp CC on the same bonds
    once the Wolff -1 seed-cluster marker is rewritten to that cluster's
    min site index (the engine's cleaning step)."""
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n, nd = lat.n_spins, lat.n_dims
    B = 6
    rng = np.random.default_rng(60 + len(shape))
    spins = jnp.asarray(
        rng.choice(np.array([-1, 1], np.int8), size=(B, n))
    )
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.9, 2.4, B).astype(np.float32))
    u = jnp.asarray(rng.random((B, n, nd)).astype(np.float32))
    keys = jax.random.split(jax.random.key(7), B)
    kf = jax.vmap(jax.random.split)(keys)[:, 1]

    def staged_labels(s, t, k, uu):
        kbv, _ = jax.random.split(k)
        active = cl.fk_bond_activation(s, coup, geom, t, kbv, u=uu)
        return cl.connected_components(active, geom)

    exp_lab = jax.vmap(staged_labels)(spins, temps, keys, u)
    plain = _fk_fused(lat, spins, kf, temps, coup, u, wolff)
    fused, lab = _fk_fused(lat, spins, kf, temps, coup, u, wolff,
                           with_labels=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fused))
    lab = np.array(lab)
    if wolff:
        for b in range(B):
            neg = lab[b] == -1
            assert neg.any()
            lab[b][neg] = np.flatnonzero(neg).min()
    np.testing.assert_array_equal(lab, np.asarray(exp_lab))


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
def test_fk_fused_masks_bitwise(shape):
    """with_masks must (a) leave the update and labels untouched and
    (b) emit the FK bond activations bitwise-equal to
    cluster.fk_bond_activation on the same uniforms — the full-observe
    path derives bond-fraction/winding from exactly these masks."""
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n, nd = lat.n_spins, lat.n_dims
    B = 6
    rng = np.random.default_rng(80 + len(shape))
    spins = jnp.asarray(
        rng.choice(np.array([-1, 1], np.int8), size=(B, n))
    )
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.9, 2.4, B).astype(np.float32))
    u = jnp.asarray(rng.random((B, n, nd)).astype(np.float32))
    keys = jax.random.split(jax.random.key(9), B)
    kf = jax.vmap(jax.random.split)(keys)[:, 1]

    def staged_bonds(s, t, k, uu):
        kbv, _ = jax.random.split(k)
        return cl.fk_bond_activation(s, coup, geom, t, kbv, u=uu)

    exp = jax.vmap(staged_bonds)(spins, temps, keys, u)
    plain = _fk_fused(lat, spins, kf, temps, coup, u, False)
    _, lab = _fk_fused(lat, spins, kf, temps, coup, u, False,
                       with_labels=True)
    fused, lab2, masks = _fk_fused(lat, spins, kf, temps, coup, u, False,
                                   with_labels=True, with_masks=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fused))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab2))
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(exp))


def test_engine_fk_kernel_observes(monkeypatch):
    """FK full observe keeps the fused kernel (labels + bond masks out,
    flips discarded — fk.rs:140-142 observe mutates nothing): the plan
    advertises fk=fused+obs, the observation schema is complete (incl.
    winding on the canonical 2D lattice), and the trajectory is bitwise an
    observer-free run's."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, cluster_update_interval=2, cluster_mode="sw",
              cluster_action="observe", warmup_ratio=0)
    a = _sim((8, 16), 29)
    ra = a.sample(6, "metropolis", **kw)
    prog = next(
        p for p in a._programs.values() if p.cfg.cluster_update is not None
    )
    assert prog.fk_kernel_obs and not prog.fk_kernel
    assert "fk=fused" in prog.describe_plan()
    assert "+obs" in prog.describe_plan()
    fk = ra["per_disorder"]["cluster_observations"]["fk"]
    assert fk["observation_count"].sum() > 0
    assert np.all(fk["active_bond_density"] >= 0.0)
    assert np.all(fk["active_bond_density"] <= 1.0)
    assert "winding_x" in fk

    b = _sim((8, 16), 29)
    b.sample(6, "metropolis", pt_interval=1, warmup_ratio=0)
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(a.state["system_ids"]),
        np.asarray(b.state["system_ids"]),
    )

    # kill switch: the staged observe path remains reachable
    monkeypatch.setenv("PEAPODS_DISABLE_FKKERNEL", "1")
    c = _sim((8, 16), 29)
    rc = c.sample(6, "metropolis", **kw)
    progc = next(
        p for p in c._programs.values() if p.cfg.cluster_update is not None
    )
    assert not progc.fk_kernel_obs
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(c.state["spins"])
    )
    fkc = rc["per_disorder"]["cluster_observations"]["fk"]
    assert set(fkc) == set(fk)
    monkeypatch.delenv("PEAPODS_DISABLE_FKKERNEL")


def test_engine_fk_fused_runs(monkeypatch):
    """SW/Wolff updates through the fused FK kernel: integrates, spins stay
    valid, kill switch routes back to the staged path.  (Interpret-mode
    hardware PRNG is degenerate, so mechanics only; the injected test above
    pins the decision logic and the on-TPU suite the statistics.)"""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    coup = np.ones((2, 8, 8, 2), np.float32)
    temps = np.array([2.269185, 2.6], np.float32)
    for mode in ("sw", "wolff"):
        s = IsingSimulation([8, 8], coup, temps, 1, None, 3, default_chunk=8)
        r = s.sample(8, "metropolis", cluster_update_interval=2,
                     cluster_mode=mode, warmup_ratio=0)
        prog = next(iter(s._programs.values()))
        assert prog.fk_kernel, prog.describe_plan()
        spins = np.asarray(s.state["spins"])
        assert set(np.unique(spins)) <= {-1, 1}
        assert np.isfinite(r["energies"]).all()

    monkeypatch.setenv("PEAPODS_DISABLE_FKKERNEL", "1")
    s = IsingSimulation([8, 8], coup, temps, 1, None, 3, default_chunk=8)
    s.sample(4, "metropolis", cluster_update_interval=2, cluster_mode="sw",
             warmup_ratio=0)
    assert not next(iter(s._programs.values())).fk_kernel


def test_engine_fk_kernel_collects_stats(monkeypatch):
    """collect_cluster_stats keeps the fused FK kernel (labels-out CSD,
    fk.rs:86-142 collects inline) WITHOUT perturbing the trajectory; full
    observe mode still routes to the staged path (it needs the bond
    masks)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation

    coup = np.ones((2, 8, 8, 2), np.float32)
    temps = np.array([2.269185], np.float32)

    def run(collect):
        s = IsingSimulation([8, 8], coup, temps, 1, None, 5, default_chunk=8)
        r = s.sample(6, "metropolis", cluster_update_interval=2,
                     cluster_mode="sw", collect_cluster_stats=collect,
                     warmup_ratio=0)
        return s, r, next(iter(s._programs.values()))

    s1, r1, p1 = run(True)
    assert p1.fk_kernel and "+stats" in p1.describe_plan()
    assert "fk_csd" in r1
    csd = np.asarray(r1["fk_csd"])
    # every update contributes exactly its cluster decomposition: sizes sum
    # to n_spins per recorded update, identically across disorder/temps
    totals = (csd * np.arange(csd.shape[-1])).sum(-1)
    assert totals.min() == totals.max() > 0 and totals.max() % 64 == 0

    s0, r0, p0 = run(False)
    assert p0.fk_kernel and "+stats" not in p0.describe_plan()
    np.testing.assert_array_equal(
        np.asarray(s1.state["spins"]), np.asarray(s0.state["spins"])
    )
    np.testing.assert_array_equal(r1["energies"], r0["energies"])

    # observe action: staged path (winding/bond observables need bonds)
    s2 = IsingSimulation([8, 8], coup, temps, 1, None, 5, default_chunk=8)
    r2 = s2.sample(6, "metropolis", cluster_update_interval=2,
                   cluster_mode="sw", cluster_action="observe",
                   warmup_ratio=0)
    assert not next(iter(s2._programs.values())).fk_kernel
    assert "fk_csd" in r2


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
def test_fk_fused_measurement_identities(shape):
    """with_measure outputs must equal a direct recompute from the kernel's
    own post-update spins (positive-sum convention; m exactly, e to f32
    reduction-order tolerance)."""
    from peapods_tpu.ops.energy import energies_and_mags

    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n, nd = lat.n_spins, lat.n_dims
    B = 6
    rng = np.random.default_rng(41)
    spins = jnp.asarray(rng.choice(np.array([-1, 1], np.int8), size=(B, n)))
    coup = jnp.asarray(rng.normal(size=(n, nd)).astype(np.float32))
    temps = jnp.asarray(np.linspace(0.9, 2.4, B).astype(np.float32))
    u = jnp.asarray(rng.random((B, n, nd)).astype(np.float32))
    kf = jax.random.split(jax.random.key(3), B)

    kp, ks = ccb.cc_batch_factors(lat, B)
    tile = kp * ks
    l0, block = shape[0], n // shape[0]
    gscal = pe.fk_scalars(False, kf, n)
    gtemp = temps[:, None].astype(jnp.float32)
    pad = (-B) % tile
    if pad:
        zrow = lambda x: jnp.zeros((pad,) + x.shape[1:], x.dtype)
        spins_p = jnp.concatenate([spins, zrow(spins)], 0)
        gscal = jnp.concatenate([gscal, jnp.zeros((pad, 3), jnp.int32)], 0)
        gtemp = jnp.concatenate([gtemp, jnp.ones((pad, 1), jnp.float32)], 0)
        u_p = jnp.concatenate([u, zrow(u)], 0)
    else:
        spins_p, u_p = spins, u
    g = (B + pad) // tile
    out, e, m = pe.fk_update_batch(
        ccb._pack(spins_p, l0, block, kp, ks),
        gscal.reshape(g, tile, 3), gtemp.reshape(g, tile, 1),
        jnp.zeros((g, 1, 2), jnp.int32),
        pe.pack_fk_j(coup[None], B, shape, kp, ks),
        jnp.stack([ccb._pack(u_p[..., d], l0, block, kp, ks)
                   for d in range(nd)], axis=1),
        wolff=False, shape=tuple(shape), kp=kp, ks=ks, interpret=True,
        with_measure=True,
    )
    new_spins = ccb._unpack(out, l0, block, kp, ks)[:B]
    e_ref, m_ref = energies_and_mags(new_spins, coup, geom)
    np.testing.assert_array_equal(
        np.asarray(m).reshape(-1)[:B], np.asarray(m_ref)
    )
    np.testing.assert_allclose(
        np.asarray(e).reshape(-1)[:B], np.asarray(e_ref), rtol=2e-5,
        atol=1e-6,
    )


def test_engine_fk_fused_measurement_identity(monkeypatch):
    """One recorded sweep with FK every sweep: the records built from the
    FK kernel's fused (e, m) must match a direct recompute from the final
    spins (the staged path's single source of truth)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    from peapods_tpu.engine.simulation import IsingSimulation
    from peapods_tpu.ops.energy import energies_and_mags

    rng = np.random.default_rng(51)
    coup = rng.choice(np.float32([-1, 1]), size=(2, 8, 8, 2))
    temps = np.geomspace(1.2, 2.6, 3).astype(np.float32)
    sim = IsingSimulation([8, 8], coup, temps, 2, None, 7, default_chunk=4)
    r = sim.sample(1, "metropolis", cluster_update_interval=1,
                   cluster_mode="sw", warmup_ratio=0)
    prog = next(iter(sim._programs.values()))
    assert prog.fk_kernel
    rt = prog.rt
    spins = np.asarray(sim.state["spins"])
    sid = np.asarray(sim.state["system_ids"])
    e_all, m_all = [], []
    for d in range(2):
        e_d, m_d = energies_and_mags(
            jnp.asarray(spins[d]), rt.couplings[d], rt.geom
        )
        e_all.append(np.asarray(e_d)[sid[d]])
        m_all.append(np.asarray(m_d)[sid[d]].astype(np.float64) / rt.n_spins)
    e_rt = np.stack(e_all)  # [d, R, T]
    m_rt = np.stack(m_all)
    # engine reports plain means over replicas, averaged over disorder
    np.testing.assert_allclose(
        np.asarray(r["energies"]), e_rt.mean(1).mean(0), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(r["mags"]), m_rt.mean(1).mean(0), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("shape", [(8, 16), (8, 8, 8)])
@pytest.mark.parametrize("wolff", [False, True])
def test_houd4_fused_bitwise(shape, wolff):
    """Houdayer(4): deterministic balanced-site bonds, so the fused N-group
    kernel must equal the staged task bitwise (all four replicas flip on
    the chosen clusters)."""
    lat = Lattice(list(shape))
    geom = GridOps.from_lattice(lat)
    n = lat.n_spins
    B, g = 5, 4
    rng = np.random.default_rng(60 + len(shape))
    tspins = jnp.asarray(
        rng.choice(np.array([-1, 1], np.int8), size=(B, g, n))
    )
    tkeys = jax.random.split(jax.random.key(8), B)
    staged = jax.vmap(
        lambda ts, k: ov.houdayer_task(
            ts, k, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins
    )(tspins, tkeys)

    kp, ks = ccb.cc_batch_factors(lat, B)
    tile = kp * ks
    l0, block = shape[0], n // shape[0]
    gscal = pe.houdn_scalars(wolff, tspins, tkeys, n)
    pad = (-B) % tile
    slots = [tspins[:, i] for i in range(g)]
    if pad:
        zrow = lambda x: jnp.zeros((pad,) + x.shape[1:], x.dtype)
        slots = [jnp.concatenate([s, zrow(s)], 0) for s in slots]
        gscal = jnp.concatenate(
            [gscal, jnp.zeros((pad, 6), jnp.int32).at[:, 4].set(n)], 0
        )
    gt = (B + pad) // tile
    packs = tuple(ccb._pack(s, l0, block, kp, ks) for s in slots)
    outs = pe.houdn_event_batch(
        packs, gscal.reshape(gt, tile, 6),
        wolff=wolff, shape=tuple(shape), kp=kp, ks=ks, interpret=True,
    )
    fused = jnp.stack(
        [ccb._unpack(o, l0, block, kp, ks)[:B] for o in outs], axis=1
    )
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))


def test_engine_houd4_event_bitwise(monkeypatch):
    """Engine trajectories identical with the fused Houdayer(4) kernel on
    and off (deterministic bonds)."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="houd4", warmup_ratio=0)
    a = _sim((8, 8, 8), 31, n_replicas=4)
    ra = a.sample(9, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel, prog.describe_plan()

    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    b = _sim((8, 8, 8), 31, n_replicas=4)
    rb = b.sample(9, "metropolis", **kw)
    assert not next(iter(b._programs.values())).event_kernel
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(ra["overlap2"], rb["overlap2"])


def test_engine_houd4_collect_stats_bitwise(monkeypatch):
    """collect_cluster_stats keeps the fused Houdayer(4) kernel (labels
    out, CSD/top4 in jnp — round 5); deterministic bonds make the
    collected statistics AND the trajectory bitwise the staged path's."""
    monkeypatch.setenv("PEAPODS_PALLAS_INTERPRET", "1")
    kw = dict(pt_interval=1, overlap_cluster_update_interval=3,
              overlap_cluster_build_mode="houd4",
              collect_cluster_stats=True, warmup_ratio=0)
    a = _sim((8, 8, 8), 37, n_replicas=4)
    ra = a.sample(9, "metropolis", **kw)
    prog = next(iter(a._programs.values()))
    assert prog.event_kernel, prog.describe_plan()

    monkeypatch.setenv("PEAPODS_DISABLE_EVENTKERNEL", "1")
    b = _sim((8, 8, 8), 37, n_replicas=4)
    rb = b.sample(9, "metropolis", **kw)
    assert not next(iter(b._programs.values())).event_kernel
    monkeypatch.delenv("PEAPODS_DISABLE_EVENTKERNEL")
    np.testing.assert_array_equal(
        np.asarray(a.state["spins"]), np.asarray(b.state["spins"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["overlap_csd"]), np.asarray(rb["overlap_csd"])
    )
    np.testing.assert_array_equal(
        np.asarray(ra["top_cluster_sizes"]),
        np.asarray(rb["top_cluster_sizes"]),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("wolff", [False, True])
def test_jorg_fused_sharded_injected_bitwise(wolff):
    """The fused event under a shard_mapped flat task split (the engine's
    mesh layout: whole tasks per device, per-shard tile packing, J/T grids
    chunk-packed with ``n_chunks``) equals the staged path bitwise when both
    draw the same injected per-bond uniforms — pinning the disorder x
    systems mesh routing independent of any PRNG stream."""
    from jax.sharding import PartitionSpec as P

    from peapods_tpu.parallel.mesh import make_mesh

    shape = (8, 16)
    n_tasks = 16
    lat, geom, a, b, tkeys = _task_batch(shape, n_tasks, seed=77)
    n, nd = lat.n_spins, lat.n_dims
    rng = np.random.default_rng(13)
    coup = jnp.asarray(
        rng.choice([-1.0, 1.0], size=(n, nd)).astype(np.float32)
    )
    temps = jnp.asarray(
        np.linspace(0.8, 1.6, n_tasks).astype(np.float32)
    )
    u = jnp.asarray(rng.random((n_tasks, n, nd)).astype(np.float32))

    def staged_one(av, bv, k, t, uu):
        ts = jnp.stack([av, bv])
        bonds, aux = ov.jorg_bonds(ts, k, coup, t, geom, u_bond=uu)
        labels = cl.connected_components(bonds, geom)
        return ov.jorg_finish(
            ts, labels, bonds, aux, geom, wolff=wolff, update=True,
            with_winding=False, with_stats=False,
        ).spins

    staged = jax.vmap(staged_one)(a, b, tkeys, temps, u)

    mesh = make_mesh(8)
    n_mesh = mesh.devices.size
    kp, ks = ccb.cc_batch_factors(lat, n_tasks // n_mesh)
    tile = kp * ks
    l0, block = shape[0], n // shape[0]
    # like the engine: scalars on the full batch, jt chunk-packed per shard
    gscal = pe.event_scalars("jorg", wolff, a, b, tkeys, n)
    words = jax.lax.bitcast_convert_type(
        jax.random.key_data(tkeys).astype(jnp.uint32), jnp.int32
    )
    jt = pe.pack_event_jt(
        coup[None], temps, 1, shape, kp, ks, n_chunks=n_mesh
    )
    u_slots = [u[..., d] for d in range(nd)]

    def run_local(a, b, gscal, words, jt, *u_slots):
        nloc = a.shape[0]
        pad = (-nloc) % tile
        if pad:  # per-shard tile padding, like the engine's run_local
            zrow = lambda x: jnp.zeros((pad,) + x.shape[1:], x.dtype)
            a = jnp.concatenate([a, zrow(a)], 0)
            b = jnp.concatenate([b, zrow(b)], 0)
            gscal = jnp.concatenate(
                [gscal, jnp.zeros((pad, 6), jnp.int32).at[:, 4].set(n)], 0
            )
            words = jnp.concatenate([words, zrow(words)], 0)
            u_slots = [jnp.concatenate([s, zrow(s)], 0) for s in u_slots]
        g_tiles = (nloc + pad) // tile
        a_p = ccb._pack(a, l0, block, kp, ks)
        b_p = ccb._pack(b, l0, block, kp, ks)
        u_p = jnp.stack(
            [ccb._pack(s, l0, block, kp, ks) for s in u_slots], axis=1
        )
        a2, b2 = pe.overlap_event_batch(
            a_p, b_p, gscal.reshape(g_tiles, tile, 6),
            words.reshape(g_tiles, tile, 2)[:, :1, :], jt, u_p,
            kind="jorg", wolff=wolff, shape=shape, kp=kp, ks=ks,
            interpret=True,
        )
        return (
            ccb._unpack(a2, l0, block, kp, ks)[:nloc],
            ccb._unpack(b2, l0, block, kp, ks)[:nloc],
        )

    spec = P("disorder")
    sharded = jax.shard_map(
        run_local, mesh=mesh, in_specs=(spec,) * (5 + nd),
        out_specs=(spec, spec), check_vma=False,
    )
    a2, b2 = sharded(a, b, gscal, words, jt, *u_slots)
    fused = jnp.stack([a2, b2], axis=1)
    np.testing.assert_array_equal(np.asarray(staged), np.asarray(fused))
