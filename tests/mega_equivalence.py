"""Megakernel statistical validation on real TPU.

The megakernel (``ops/pallas_mega.py``) runs sweep + measurement + PT
on-chip for a whole block of sweeps; its PT draws come from a counter-based
scalar mix instead of the jnp path's threefry stream, so trajectories differ
from the per-sweep scan path and equivalence is *statistical* (see the
module docstring).  ``tests/test_mega.py`` pins the machinery on the CPU
interpreter; this script pins the physics on the real chip:

1. **Two-sample z-test vs the per-sweep path**: identical 64x128 ferro
   config (16-temp PT ladder straddling T_c) run through the megakernel and
   through the scan path (``PEAPODS_DISABLE_MEGA=1`` semantics via config),
   many independent seeds each; per-temperature <E> and <m^2> must agree
   within combined standard errors (max |z| < 4.5 over the 16x2
   comparisons; the expected max of 32 standard normals is ~2.2).
2. **Binder cumulant at T_c through the mega path only**: 128x128 and
   256x256 square ferro (the mega kernel needs W % 128 == 0) with a PT
   ladder straddling T_c, Metropolis-only dynamics; the Binder cumulant
   interpolated at the exact T_c must land on the universal 2D torus value
   (~0.611) for both sizes (spread < tol and absolute window), mirroring
   ``binder_crossings.py`` which exercises the cluster kernels (reference
   anchor: tests/binder_crossings.py:65-107).

3. **Fused-kernel z-tests** (``--only fk`` / ``--only event``): the fused
   FK cluster kernel and the fused overlap-event kernel draw per-bond
   uniforms from the hardware PRNG while the staged paths use threefry, so
   the fused runs are statistical (not bitwise) twins; a two-sample z-test
   over independent seeds with the kill switch flipped per arm
   (``PEAPODS_DISABLE_FKKERNEL`` / ``PEAPODS_DISABLE_EVENTKERNEL``) pins
   <E> and <m^2>/<q^2> per temperature.

Run:  python tests/mega_equivalence.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from utils import TC_SQUARE  # noqa: E402


def _moments(results):
    """Per-temperature <E>/spin (already per-spin in the results dict,
    reference convention spins/energy.rs:92-109) and <m^2>."""
    e = np.asarray(results["energies"], np.float64)
    m2 = np.asarray(results["mags2"], np.float64)
    return e, m2


def run_ztest(quick):
    from peapods_tpu.models.ising import Ising

    n_seeds = 8 if quick else 24
    n_sweeps = 2000 if quick else 8000
    temps = np.geomspace(1.9, 3.1, 16).astype(np.float32)
    shape = (64, 128)

    acc = {}
    for mega in (True, False):
        os.environ["PEAPODS_DISABLE_MEGA"] = "" if mega else "1"
        es, m2s = [], []
        for s in range(n_seeds):
            model = Ising(shape, "ferro", temps, seed=1000 + s + (0 if mega else 500))
            r = model.sample(n_sweeps, "metropolis", pt_interval=1)
            e, m2 = _moments(r)
            es.append(e)
            m2s.append(m2)
        acc[mega] = (np.stack(es), np.stack(m2s))
    os.environ.pop("PEAPODS_DISABLE_MEGA", None)

    worst = 0.0
    for name, idx in (("<E>/N", 0), ("<m^2>", 1)):
        a, b = acc[True][idx], acc[False][idx]
        ma, mb = a.mean(0), b.mean(0)
        se = np.sqrt(a.var(0, ddof=1) / len(a) + b.var(0, ddof=1) / len(b))
        z = np.abs(ma - mb) / np.where(se > 0, se, 1)
        print(f"  {name}: max|z| = {z.max():.2f} "
              f"(mega {ma[z.argmax()]:.5f} vs scan {mb[z.argmax()]:.5f} "
              f"at T={temps[z.argmax()]:.3f})")
        worst = max(worst, float(z.max()))
    limit = 4.5
    status = "PASSED" if worst < limit else "FAILED"
    print(f"mega-vs-scan z-test: max|z| {worst:.2f} < {limit} ... {status}")
    return worst < limit


def run_pairs_ztest(quick):
    """Megapair-vs-scan z-test on a spin glass: identical 8^3 bimodal
    config (PT + Houdayer/5), many independent disorder seeds per arm;
    per-temperature <E> and <q^2> must agree within combined standard
    errors.  Pins the pairs megakernel's sweep, in-kernel measurement, PT,
    and the kernel-call/jnp-overlap interleaving against the scan path."""
    from peapods_tpu.models.ising import Ising

    n_seeds = 8 if quick else 24
    n_sweeps = 2000 if quick else 6000
    temps = np.geomspace(1.2, 3.0, 8).astype(np.float32)
    shape = (8, 8, 8)

    acc = {}
    for mp in (True, False):
        os.environ["PEAPODS_DISABLE_MEGAPAIR"] = "" if mp else "1"
        es, q2s = [], []
        for s in range(n_seeds):
            model = Ising(shape, "bimodal", temps, n_replicas=4,
                          seed=3000 + s)
            r = model.sample(
                n_sweeps, "metropolis", pt_interval=1,
                overlap_cluster_update_interval=5,
                overlap_cluster_build_mode="houdayer",
            )
            es.append(np.asarray(r["energies"], np.float64))
            q2s.append(np.asarray(r["overlap2"], np.float64))
        acc[mp] = (np.stack(es), np.stack(q2s))
    os.environ.pop("PEAPODS_DISABLE_MEGAPAIR", None)

    worst = 0.0
    for name, idx in (("<E>/N", 0), ("<q^2>", 1)):
        a, b = acc[True][idx], acc[False][idx]
        ma, mb = a.mean(0), b.mean(0)
        se = np.sqrt(a.var(0, ddof=1) / len(a) + b.var(0, ddof=1) / len(b))
        z = np.abs(ma - mb) / np.where(se > 0, se, 1)
        print(f"  {name}: max|z| = {z.max():.2f} "
              f"(megapair {ma[z.argmax()]:.5f} vs scan {mb[z.argmax()]:.5f} "
              f"at T={temps[z.argmax()]:.3f})")
        worst = max(worst, float(z.max()))
    limit = 4.5
    status = "PASSED" if worst < limit else "FAILED"
    print(f"megapair-vs-scan z-test: max|z| {worst:.2f} < {limit} ... {status}")
    return worst < limit


def _two_arm_ztest(tag, build_and_sample, env_var, n_seeds, temps,
                   names=("<E>/N", "<m^2>")):
    """Two-sample z-test over independent seeds with ``env_var`` flipped
    per arm.  ``build_and_sample(seed) -> (moment0, moment1)`` per-temp
    f64 arrays; returns True when max |z| stays under the limit."""
    acc = {}
    for fused in (True, False):
        os.environ[env_var] = "" if fused else "1"
        m0s, m1s = [], []
        for s in range(n_seeds):
            a, b = build_and_sample(s)
            m0s.append(a)
            m1s.append(b)
        acc[fused] = (np.stack(m0s), np.stack(m1s))
    os.environ.pop(env_var, None)

    worst = 0.0
    for idx, name in enumerate(names):
        a, b = acc[True][idx], acc[False][idx]
        ma, mb = a.mean(0), b.mean(0)
        se = np.sqrt(a.var(0, ddof=1) / len(a) + b.var(0, ddof=1) / len(b))
        z = np.abs(ma - mb) / np.where(se > 0, se, 1)
        print(f"  {name}: max|z| = {z.max():.2f} "
              f"(fused {ma[z.argmax()]:.5f} vs staged {mb[z.argmax()]:.5f} "
              f"at T={temps[z.argmax()]:.3f})")
        worst = max(worst, float(z.max()))
    limit = 4.5
    status = "PASSED" if worst < limit else "FAILED"
    print(f"{tag} z-test: max|z| {worst:.2f} < {limit} ... {status}")
    return worst < limit


def run_fk_ztest(quick):
    """Fused-FK-kernel-vs-staged z-test: 2D ferro straddling T_c with a
    SW update every sweep (the fused kernel's target case — nothing
    collects labels), <E> and <m^2> per temperature.  The staged arm
    (``PEAPODS_DISABLE_FKKERNEL=1``) builds bonds with threefry draws, so
    agreement validates the kernel's hardware-PRNG bond/flip sampling."""
    from peapods_tpu.models.ising import Ising

    n_seeds = 8 if quick else 24
    n_sweeps = 512 if quick else 2048
    temps = np.linspace(TC_SQUARE - 0.25, TC_SQUARE + 0.25, 8).astype(
        np.float32
    )

    def build_and_sample(s):
        model = Ising((32, 32), temperatures=temps, seed=5000 + s)
        prog_env = os.environ.get("PEAPODS_DISABLE_FKKERNEL")
        r = model.sample(
            n_sweeps, "metropolis", cluster_update_interval=1,
            cluster_mode="sw", pt_interval=2,
        )
        if prog_env != "1" and s == 0:
            prog = next(iter(model._sim._programs.values()))
            assert prog.fk_kernel, prog.describe_plan()
        return _moments(r)

    return _two_arm_ztest(
        "fused-FK-vs-staged", build_and_sample, "PEAPODS_DISABLE_FKKERNEL",
        n_seeds, temps,
    )


def run_event_ztest(quick):
    """Fused-event-kernel-vs-staged z-test: 8^3 bimodal glass with a Jorg
    overlap move every 5 sweeps (per-bond draws are hardware-PRNG in the
    kernel, threefry staged), megapair disabled in BOTH arms so the
    interleaved fused event (not the in-megapair event) is what differs;
    <E> and <q^2> per temperature."""
    from peapods_tpu.models.ising import Ising

    n_seeds = 8 if quick else 24
    n_sweeps = 2000 if quick else 6000
    temps = np.geomspace(1.2, 3.0, 8).astype(np.float32)

    os.environ["PEAPODS_DISABLE_MEGAPAIR"] = "1"

    def build_and_sample(s):
        model = Ising((8, 8, 8), "bimodal", temps, n_replicas=4,
                      seed=7000 + s)
        prog_env = os.environ.get("PEAPODS_DISABLE_EVENTKERNEL")
        r = model.sample(
            n_sweeps, "metropolis", pt_interval=1,
            overlap_cluster_update_interval=5,
            overlap_cluster_build_mode="jorg",
        )
        if prog_env != "1" and s == 0:
            prog = next(iter(model._sim._programs.values()))
            assert prog.event_kernel, prog.describe_plan()
        e = np.asarray(r["energies"], np.float64)
        q2 = np.asarray(r["overlap2"], np.float64)
        return e, q2

    try:
        return _two_arm_ztest(
            "fused-event-vs-staged", build_and_sample,
            "PEAPODS_DISABLE_EVENTKERNEL", n_seeds, temps,
            names=("<E>/N", "<q^2>"),
        )
    finally:
        os.environ.pop("PEAPODS_DISABLE_MEGAPAIR", None)


def run_observe_ztest(quick):
    """Fused-observe-vs-staged-observe z-test (round 5): FK observe mode
    keeps the fused kernel and draws its observed bond graph from the
    hardware PRNG; the staged arm draws threefry bonds on the SAME
    (bitwise-identical) trajectory, so any statistical difference in the
    observed bond density / large-component count is exactly a
    hardware-PRNG bond-stream defect."""
    from peapods_tpu.models.ising import Ising

    n_seeds = 8 if quick else 24
    n_sweeps = 512 if quick else 2048
    temps = np.linspace(TC_SQUARE - 0.25, TC_SQUARE + 0.25, 8).astype(
        np.float32
    )

    def build_and_sample(s):
        model = Ising((32, 32), temperatures=temps, seed=9000 + s)
        prog_env = os.environ.get("PEAPODS_DISABLE_FKKERNEL")
        r = model.sample(
            n_sweeps, "metropolis", cluster_update_interval=1,
            cluster_mode="sw", cluster_action="observe", pt_interval=2,
        )
        if prog_env != "1" and s == 0:
            prog = next(
                p for p in model._sim._programs.values()
                if p.cfg.cluster_update is not None
            )
            assert prog.fk_kernel_obs, prog.describe_plan()
        fk = r["per_disorder"]["cluster_observations"]["fk"]
        return (
            np.asarray(fk["active_bond_density"][0], np.float64),
            np.asarray(fk["large_component_count"][0], np.float64),
        )

    return _two_arm_ztest(
        "fused-observe-vs-staged", build_and_sample,
        "PEAPODS_DISABLE_FKKERNEL", n_seeds, temps,
        names=("bond density", "large components"),
    )


def run_binder(quick):
    from peapods_tpu.models.ising import Ising

    # PT swap acceptance scales as exp(-dbeta * sigma_E) with
    # sigma_E ~ sqrt(N c_v) T, so the ladder must densify with lattice size;
    # likewise the coarsening/equilibration budget grows with L.
    budgets = (
        {128: (40000, 32), 256: (150000, 64)}
        if not quick
        else {128: (8000, 32), 256: (40000, 64)}
    )
    at_tc = {}
    for L, (n_sweeps, n_temps) in budgets.items():
        temps = np.linspace(2.05, 2.75, n_temps).astype(np.float32)
        t0 = time.time()
        model = Ising((L, L), "ferro", temps, seed=7)
        model.sample(n_sweeps, "metropolis", pt_interval=1, warmup_ratio=0.5)
        binder = np.asarray(model.binder_cumulant, np.float64)
        at_tc[L] = float(np.interp(TC_SQUARE, temps, binder))
        print(f"  L={L}: binder at T_c = {at_tc[L]:.4f}  ({time.time()-t0:.1f}s)")
    spread = max(at_tc.values()) - min(at_tc.values())
    window = all(0.56 < v < 0.66 for v in at_tc.values())
    tol = 0.05 if not quick else 0.08
    ok = spread < tol and window
    print(f"mega-path Binder: spread {spread:.4f} (tol {tol}), "
          f"universal-window {'ok' if window else 'VIOLATED'} ... "
          f"{'PASSED' if ok else 'FAILED'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--only",
        choices=["ztest", "pairs", "fk", "event", "observe", "binder"],
    )
    args = ap.parse_args()

    ok = True
    if args.only in (None, "ztest"):
        print("== mega vs per-sweep scan: two-sample z-test ==")
        ok &= run_ztest(args.quick)
    if args.only in (None, "pairs"):
        print("== megapair vs per-sweep scan: spin-glass z-test ==")
        ok &= run_pairs_ztest(args.quick)
    if args.only in (None, "fk"):
        print("== fused FK kernel vs staged path: z-test ==")
        ok &= run_fk_ztest(args.quick)
    if args.only in (None, "event"):
        print("== fused overlap-event kernel vs staged path: z-test ==")
        ok &= run_event_ztest(args.quick)
    if args.only in (None, "observe"):
        print("== fused FK observe vs staged observe: z-test ==")
        ok &= run_observe_ztest(args.quick)
    if args.only in (None, "binder"):
        print("== Binder cumulant at T_c through the mega path ==")
        ok &= run_binder(args.quick)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
