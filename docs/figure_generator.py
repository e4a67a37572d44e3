"""Regenerate the docs figure: FK cluster-size distributions across T.

Counterpart of the reference's ``docs/figure_generator.py`` (:1-42), adapted
to this engine's data model: ``Ising.fk_csd`` here is already a per-size
histogram (``hist[s]`` = number of clusters of size ``s`` accumulated over
recorded sweeps), so the figure plots the normalized histogram directly
instead of re-binning a sample list.

Run on any backend (``python docs/figure_generator.py [--quick]``); writes
``docs/csd.png``.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from peapods_tpu import Ising  # noqa: E402

ACCENT = "#0366d6"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    try:
        from matplotlib import pyplot as plt
    except ImportError:
        print("matplotlib is required for the docs figure", file=sys.stderr)
        sys.exit(1)

    for param in ("axes.edgecolor", "xtick.color", "ytick.color",
                  "text.color", "axes.titlecolor"):
        plt.rcParams[param] = ACCENT

    L = 32
    temperatures = np.geomspace(0.1, 10, 32)
    model = Ising((L, L), temperatures=temperatures)
    model.sample(
        n_sweeps=2**12 if args.quick else 2**16,
        warmup_ratio=0.1,
        cluster_update_interval=1,
        pt_interval=1,
        collect_cluster_stats=True,
    )

    sizes = np.arange(1, L * L + 1)
    for t in range(17, 27, 2):
        hist = np.asarray(model.fk_csd[t], dtype=np.float64)[1:]  # drop size 0
        total = hist.sum()
        if total == 0:
            continue
        pdf = np.where(hist > 0, hist / total, np.nan)
        plt.plot(sizes, pdf, label=f"$T = {temperatures[t]:.3f}$")

    plt.xscale("log")
    plt.yscale("log")
    plt.ylim(1e-7, 1)
    plt.legend()
    plt.title(f"cluster size distributions of a {L} x {L} Ising ferromagnet")

    out = Path(__file__).resolve().parent / "csd.png"
    plt.savefig(out, dpi=300, bbox_inches="tight", pad_inches=0,
                transparent=True)
    print(f"Saved to {out}")


if __name__ == "__main__":
    main()
