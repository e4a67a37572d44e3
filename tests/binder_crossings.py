"""Physics validation: Binder cumulant crossings at exact/known T_c.

Port of ``/root/reference/tests/binder_crossings.py`` (same configs,
tolerances, and CI role): curves for several lattice sizes must cross at the
exact critical temperature for square, triangular, cubic, BCC, and FCC
lattices with spread < 0.05.

Run: ``python tests/binder_crossings.py [--quick] [--only NAME]``.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
from utils import (  # noqa: E402
    TC_BCC,
    TC_CUBIC,
    TC_FCC,
    TC_SQUARE,
    TC_TRIANGULAR,
    assert_crossing,
)

from peapods_tpu import Ising  # noqa: E402

OUT_DIR = Path(__file__).parent
TEST_SEED = 42


def ferromagnet(name, sizes, tc, temps, n_sweeps, tol=0.05, shape_fn=None,
                plot=False, **ising_kwargs):
    print(f"\n{'=' * 60}")
    print(f"  {name}  (T_c = {tc:.4f})")
    print(f"{'=' * 60}")

    if shape_fn is None:
        shape_fn = lambda n: (n, n)

    results = {}
    for L in sizes:
        t0 = time.perf_counter()
        model = Ising(
            shape_fn(L),
            temperatures=temps,
            n_replicas=2,
            seed=TEST_SEED,
            **ising_kwargs,
        )
        model.sample(
            n_sweeps,
            sweep_mode="metropolis",
            cluster_update_interval=1,
            cluster_mode="sw",
            pt_interval=1,
            warmup_ratio=0.25,
        )
        results[f"L={L}"] = model.binder_cumulant
        print(f"  L={L}: {time.perf_counter() - t0:.1f}s")

    assert_crossing(temps, results, tc, tol=tol)
    if plot:
        from utils import plot_crossing

        slug = name.lower().replace(" ", "_")
        plot_crossing(
            temps, results, tc,
            ylabel="Binder cumulant",
            title=f"{name} Binder crossing",
            out_path=OUT_DIR / f"{slug}.png",
        )


def run(quick=False, only=None, plot=False):
    n_sweeps = 3000 if quick else 10000
    cases = {
        "square": dict(
            name="2D square",
            sizes=[8, 16, 32],
            tc=TC_SQUARE,
            temps=np.linspace(TC_SQUARE - 0.3, TC_SQUARE + 0.3, 32).astype(
                np.float32
            ),
        ),
        "triangular": dict(
            name="2D triangular",
            sizes=[8, 16, 32],
            tc=TC_TRIANGULAR,
            temps=np.linspace(TC_TRIANGULAR - 0.4, TC_TRIANGULAR + 0.4, 32).astype(
                np.float32
            ),
            geometry="tri",
        ),
        "cubic": dict(
            name="3D cubic",
            sizes=[6, 8, 10],
            tc=TC_CUBIC,
            temps=np.linspace(TC_CUBIC - 0.4, TC_CUBIC + 0.4, 24).astype(np.float32),
            shape_fn=lambda n: (n, n, n),
        ),
        "bcc": dict(
            name="3D BCC",
            sizes=[6, 8, 10],
            tc=TC_BCC,
            temps=np.linspace(TC_BCC - 0.5, TC_BCC + 0.5, 24).astype(np.float32),
            geometry="bcc",
            shape_fn=lambda n: (n, n, n),
        ),
        "fcc": dict(
            name="3D FCC",
            sizes=[6, 8, 10],
            tc=TC_FCC,
            temps=np.linspace(TC_FCC - 0.6, TC_FCC + 0.6, 24).astype(np.float32),
            geometry="fcc",
            shape_fn=lambda n: (n, n, n),
        ),
    }
    for key, case in cases.items():
        if only and key != only:
            continue
        ferromagnet(n_sweeps=n_sweeps, plot=plot, **case)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick, only=args.only, plot=args.plot)
