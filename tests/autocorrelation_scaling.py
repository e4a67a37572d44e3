"""Physics validation: SW autocorrelation time scaling tau ~ L^z, z ~ 0.25.

Port of ``/root/reference/tests/autocorrelation_scaling.py``: SW dynamics at
the exact 2D T_c must satisfy tau(L=64)/tau(L=32) = 2^0.25 within 0.1.

Run: ``python tests/autocorrelation_scaling.py [--quick]``.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
from utils import TC_SQUARE  # noqa: E402

from peapods_tpu import Ising  # noqa: E402

EXPECTED_RATIO = 2**0.25  # ~ 1.189
TOLERANCE = 0.1
TEST_SEED = 42


def run(quick=False):
    n_sweeps = 10000 if quick else 40000
    max_lag = 500 if quick else 2000
    n_disorder = 8 if quick else 16
    print(f"\n{'=' * 60}")
    print("  SW autocorrelation scaling: tau(L=64) / tau(L=32) ~ 2^0.25")
    print(f"{'=' * 60}")

    temps = np.array([TC_SQUARE], dtype=np.float32)
    taus = {}

    for L in [32, 64]:
        model = Ising([L, L], temperatures=temps, n_disorder=n_disorder,
                      seed=TEST_SEED)
        model.sample(
            n_sweeps,
            cluster_update_interval=1,
            cluster_mode="sw",
            autocorrelation_max_lag=max_lag,
            warmup_ratio=0.25,
        )
        tau = model.mags2_tau[0]
        taus[L] = tau
        print(f"  L={L:3d}  tau_int(m^2) = {tau:.3f}")

    ratio = taus[64] / taus[32]
    err = abs(ratio - EXPECTED_RATIO)
    print(
        f"  ratio: {ratio:.3f}  (expected {EXPECTED_RATIO:.3f}, err={err:.3f}, "
        f"tol={TOLERANCE})"
    )
    assert err < TOLERANCE, (
        f"ratio {ratio:.3f} deviates from {EXPECTED_RATIO:.3f} by {err:.3f} "
        f">= {TOLERANCE}"
    )
    print("  PASSED")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick)
