"""Serialized runner for every pending on-chip job (CLAUDE.md: batch all
TPU work so a brief chip-up window is fully used; never run two TPU
processes at once).

    python benchmarks/chip_window.py [--quick] [--only mp_event,tg,...]

Jobs run as sequential subprocesses in decision-priority order, each
bounded by a timeout; the backend is re-probed (bench.wait_for_backend)
before every job so a mid-window outage skips cleanly instead of hanging.
All output tees to stdout AND benchmarks/chip_window.log for the docs
update.
"""

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402  (wait_for_backend)

JOBS = [
    # (name, argv tail, timeout_s) — priority order: A/B deciders first,
    # tables second, statistics last (longest, least decision-critical)
    ("mp_event", ["benchmarks/mp_event_ab.py"], 5400),
    ("tg", ["benchmarks/_ab_megapair_tg.py"], 3600),
    ("fk", ["benchmarks/fk_ab.py"], 5400),
    ("bench_all", ["benchmarks/bench_all.py"], 7200),
    ("stats", ["tests/tpu_stats_ci.py", "--quick"], 7200),
    # round-4 batch: new-kernel deciders, current-defaults config refresh
    # (the 2026-08-19 bench_all ran pre-tri-kernel / mp_event-on), then the
    # chip-level physics re-validation of the round-3/4 default paths
    ("tri", ["benchmarks/tri_ab.py"], 3600),
    ("halo", ["benchmarks/halo_ab.py"], 3600),
    ("stats_cost", ["benchmarks/stats_ab.py"], 5400),
    ("configs_r4", ["benchmarks/driver_configs.py"], 7200),
    ("binder_sq", ["tests/binder_crossings.py", "--quick", "--only",
                   "square"], 7200),
    ("binder_tri", ["tests/binder_crossings.py", "--quick", "--only",
                    "triangular"], 7200),
    ("sg_quick", ["tests/spin_glass_crossings.py", "--quick"], 10800),
    ("qhist_quick", ["tests/overlap_histogram.py", "--quick"], 10800),
    # round-4 late batch: log-doubling CC rollout decision; triangular
    # config-2 A/B rerun now that the FK phase rides the fused kernel
    ("cc_log", ["benchmarks/cc_log_ab.py"], 5400),
    ("tri2", ["benchmarks/tri_ab.py"], 3600),
    # super-rounds-per-check sweep (classic/1/2/4 incl. the 256^2 T_c
    # case) + SW-dynamics autocorrelation through the fused-FK defaults
    # (last validated on the round-2 cluster path)
    ("cc_rpc", ["benchmarks/cc_log_ab.py"], 7200),
    ("autocorr", ["tests/autocorrelation_scaling.py", "--quick"], 7200),
    # end-of-round refresh through the final defaults (auto CC body)
    ("bench_final", ["benchmarks/bench_all.py"], 7200),
    # hybrid CC body (classic rounds + one super round per check block):
    # the 256^2 T_c case is the decision target
    ("cc_mix", ["benchmarks/cc_log_ab.py"], 7200),
    # lane-packed 2D halo kernel overhead bound (space=1, late round 4)
    ("halo_packed", ["benchmarks/halo_ab.py"], 5400),
    # BCC/FCC sweep kernels (late round 4): A/B vs the jnp roll path +
    # Binder re-validation through the kernel at the L=8 sizes
    ("diag", ["benchmarks/diag_ab.py"], 5400),
    ("binder_bcc", ["tests/binder_crossings.py", "--quick", "--only",
                    "bcc"], 7200),
    ("binder_fcc", ["tests/binder_crossings.py", "--quick", "--only",
                    "fcc"], 7200),
    # ---- round 5 ----
    # boundary-contraction CC feasibility: primitive costs (gather /
    # scatter-min / sort / roll-round) at small tile sizes — the
    # build/no-build decision input (VERDICT item 2)
    ("contract_probe", ["benchmarks/cc_contract_probe.py"], 3600),
    # drift calibration reference: bench.py now interleaves a frozen
    # calibration program; record calibration_iters_per_sec from a healthy
    # phase into bench.CAL_REF_ITERS_PER_SEC (VERDICT item 5)
    ("cal_ref", ["bench.py"], 3600),
    # full-observe-on-fused-kernels cost bound (target <= ~2x no-observer,
    # and fused faster than staged; VERDICT item 1)
    ("observe_cost", ["benchmarks/observe_ab.py"], 5400),
    # Pallas band-local CC body: space=1 op-level A/B (VERDICT item 3)
    ("band_cc", ["benchmarks/band_cc_ab.py"], 5400),
    # mp_event re-A/B after the round-5 per-mode pl.when masking (hoisted
    # draw streams; unselected modes now cost only their uniforms) —
    # decides default ON vs frozen (VERDICT item 7)
    ("mp_event_r5", ["benchmarks/mp_event_ab.py"], 5400),
    # generic-offset kernel: custom tables vs jnp + generic-vs-dedicated
    # FCC overhead (VERDICT item 4 chip evidence)
    ("gen", ["benchmarks/gen_ab.py"], 5400),
    # end-of-round refresh through the round-5 defaults, one serialized
    # session: flagship (now drift-calibrated) + driver configs + 5-mode
    ("bench_r5", ["benchmarks/bench_all.py"], 7200),
    # on-TPU statistics suite incl. the new fused-observe z-test (the
    # observed bond graph's hardware-PRNG stream vs the staged threefry
    # twin on the bitwise-identical trajectory)
    ("stats_r5", ["tests/tpu_stats_ci.py", "--quick"], 10800),
    # ---- round 5, second window (after the matmul-histogram + winding
    # block-check + mp_event VMEM-hoist fixes) ----
    # exactness gate first: matmul histograms must be bitwise the
    # scatter's on the real backend before any number is recorded
    ("hist_check", ["benchmarks/hist_check.py"], 1800),
    # observe + collect cost re-measurement through the new derivation
    ("observe_r5b", ["benchmarks/observe_ab.py"], 5400),
    ("stats_r5b", ["benchmarks/stats_ab.py"], 5400),
    # config-5 opt-in arm compiles again after the spin-tile hoist:
    # the deferred default decision
    ("mp_event_r5b", ["benchmarks/mp_event_ab.py"], 5400),
]


DONE_FILE = Path(__file__).parent / ".chip_window_done"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated job names")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the completed-jobs ledger and rerun all")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    if args.fresh and DONE_FILE.exists():
        DONE_FILE.unlink()
    done = (set(DONE_FILE.read_text().split())
            if DONE_FILE.exists() else set())

    log = open(ROOT / "benchmarks" / "chip_window.log", "a")

    def emit(line):
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    emit(f"==== chip_window start {time.strftime('%F %T')} ====")
    failures = []
    for name, argv, timeout_s in JOBS:
        if only and name not in only:
            continue
        if name in done:
            emit(f"---- {name} (already done; --fresh to rerun) ----")
            continue
        emit(f"---- {name} ----")
        if not bench.wait_for_backend():
            failures.append(name)
            emit(f"[{name} SKIPPED: backend unavailable]")
            continue
        cmd = [sys.executable] + argv
        if args.quick and name != "tg":  # tg tool has no --quick
            cmd.append("--quick")
        env = dict(os.environ)
        if name in ("stats", "stats_r5"):
            env["PEAPODS_TPU_STATS"] = "1"
        if name == "cc_mix":
            env["PEAPODS_CC_AB_ARMS"] = "0,1,mix"
        t0 = time.time()
        try:
            r = subprocess.run(
                cmd, cwd=ROOT, timeout=timeout_s,
                capture_output=True, text=True, env=env,
            )
            for stream in (r.stdout, r.stderr):
                for ln in stream.strip().splitlines():
                    emit(f"  {ln}")
            if r.returncode != 0:
                failures.append(name)
                emit(f"[{name} FAILED rc={r.returncode}]")
            else:
                done.add(name)
                with open(DONE_FILE, "a") as df:
                    df.write(name + "\n")
        except subprocess.TimeoutExpired as e:
            failures.append(name)
            for stream in (e.stdout, e.stderr):
                if stream:
                    if isinstance(stream, bytes):
                        stream = stream.decode(errors="replace")
                    for ln in stream.strip().splitlines():
                        emit(f"  {ln}")
            emit(f"[{name} TIMED OUT after {timeout_s}s]")
        emit(f"---- {name} done ({time.time() - t0:.0f}s) ----")
    emit(f"==== chip_window end {time.strftime('%F %T')} "
         f"failures={failures} ====")
    log.close()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
