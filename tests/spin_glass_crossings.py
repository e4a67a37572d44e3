"""Physics validation: 3D EA spin-glass SG-Binder crossings at T_c ~ 1.102.

Port of ``/root/reference/tests/spin_glass_crossings.py``: bimodal EA glass,
25 disorder samples, SG Binder crossing (tol 0.3) for the default Houdayer
mix, CMR, Joerg, and the CMR+Houd4 mode mix, plus the histogram-vs-moment
internal consistency check.

Run: ``python tests/spin_glass_crossings.py [--quick] [--only NAME]``.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))
from utils import TC_EA_3D, assert_crossing, assert_overlap_binder  # noqa: E402

from peapods_tpu import Ising  # noqa: E402

OUT_DIR = Path(__file__).parent
TEST_SEED = 42


def crossing_case(name, n_sweeps, n_disorder, sizes, plot=False, **overlap_kwargs):
    temps = np.linspace(0.8, 1.4, 12).astype(np.float32)

    print(f"\n{'=' * 60}")
    print(f"  {name}  (T_c = {TC_EA_3D:.4f})")
    print(f"{'=' * 60}")

    n_replicas = overlap_kwargs.pop("n_replicas", 2)
    results = {}
    for L in sizes:
        t0 = time.perf_counter()
        model = Ising(
            (L, L, L),
            couplings="bimodal",
            temperatures=temps,
            n_replicas=n_replicas,
            n_disorder=n_disorder,
            seed=TEST_SEED,
        )
        model.sample(
            n_sweeps,
            sweep_mode="metropolis",
            pt_interval=1,
            overlap_cluster_update_interval=1,
            warmup_ratio=0.25,
            **overlap_kwargs,
        )
        assert_overlap_binder(model)
        results[f"L={L}"] = model.sg_binder
        print(f"  L={L}: {time.perf_counter() - t0:.1f}s")

    assert_crossing(temps, results, TC_EA_3D, tol=0.3)
    if plot:
        from utils import plot_crossing

        slug = name.lower().replace(" ", "_").replace("+", "_")
        plot_crossing(
            temps, results, TC_EA_3D,
            ylabel="SG Binder ratio",
            title=f"{name} Binder crossing",
            out_path=OUT_DIR / f"{slug}.png",
        )


def run(quick=False, only=None, plot=False):
    n_sweeps = 4000 if quick else 10000
    n_disorder = 16 if quick else 25
    sizes = [8, 10]
    cases = {
        "houdayer": dict(name="3D EA spin glass"),
        "cmr": dict(
            name="3D EA spin glass (CMR)",
            overlap_cluster_build_mode="cmr",
            overlap_cluster_mode="sw",
        ),
        "jorg": dict(
            name="3D EA spin glass (Joerg)",
            overlap_cluster_build_mode="jorg",
            overlap_cluster_mode="sw",
        ),
        "cmr_houd4": dict(
            name="3D EA spin glass (CMR+Houd4)",
            overlap_cluster_build_mode="cmr+houd4",
            overlap_cluster_mode="sw",
            n_replicas=4,
        ),
    }
    for key, case in cases.items():
        if only and key != only:
            continue
        name = case.pop("name")
        crossing_case(name, n_sweeps, n_disorder, sizes, plot=plot, **case)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()
    run(quick=args.quick, only=args.only, plot=args.plot)
