"""CI entry point for the on-TPU kernel statistics suite.

The hardware-PRNG kernels cannot be statistically validated on the CPU
interpreter (it stubs ``prng_random_bits``), so their distribution-level
checks ride this single command, gated behind an env flag so any CI can add
it as a job on a TPU runner:

    PEAPODS_TPU_STATS=1 python tests/tpu_stats_ci.py

Runs ``tests/mega_equivalence.py --quick`` (megakernel z-test, megapair
spin-glass z-test, fused-FK and fused-overlap-event kernel z-tests,
mega-path Binder check) in a subprocess on the real chip,
then appends a dated record to ``VALIDATION.md`` so the validation ledger is
updated mechanically rather than by hand.  Exits nonzero on any failure.

Without the flag the script exits 0 immediately (safe on CPU-only runners).
"""

import datetime
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    if os.environ.get("PEAPODS_TPU_STATS") != "1":
        print("PEAPODS_TPU_STATS != 1 — skipping the on-TPU statistics job")
        return 0

    # the tunneled chip goes through 'Unavailable' phases; wait them out in
    # bounded subprocesses before initializing this process's backend
    sys.path.insert(0, str(REPO))
    from bench import wait_for_backend

    wait_for_backend()

    import jax

    platforms = {d.platform for d in jax.devices()}
    if platforms == {"cpu"}:
        print("no accelerator visible — refusing to run the statistics "
              "suite on CPU (the interpreter stubs the hardware PRNG)")
        return 1

    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "mega_equivalence.py"),
         "--quick"],
        capture_output=True, text=True,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    ok = proc.returncode == 0

    results = re.findall(
        r"^(.*(?:z-test|Binder).*(?:PASSED|FAILED).*)$", proc.stdout, re.M
    )
    stamp = datetime.date.today().isoformat()
    lines = [
        "",
        f"## Kernel statistics CI run ({stamp}, quick budget)",
        "",
        "Command: `PEAPODS_TPU_STATS=1 python tests/tpu_stats_ci.py`",
        "",
    ]
    lines += [f"- {r.strip()}" for r in results] or ["- (no results parsed)"]
    lines.append(f"- overall: {'PASSED' if ok else 'FAILED'}")
    lines.append("")
    block = "\n".join(lines)
    ledger = REPO / "VALIDATION.md"
    # idempotent per day+outcome: a retried chip window must not stack
    # identical blocks (it did on 2026-08-19)
    if block in ledger.read_text():
        print("VALIDATION.md already has this exact block — not re-appending")
        return 0 if ok else 1
    with open(ledger, "a") as f:
        f.write(block)
    print(f"VALIDATION.md updated ({'PASSED' if ok else 'FAILED'})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
