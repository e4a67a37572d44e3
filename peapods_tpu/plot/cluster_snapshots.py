#!/usr/bin/env python
"""Visualize cluster snapshots from sweep .npz files.

Behavior-parity port of ``/root/reference/plot/cluster_snapshots.py`` for the
TPU build's identical snapshot npz schema.

Usage:
    python -m peapods_tpu.plot.cluster_snapshots results.npz
    python -m peapods_tpu.plot.cluster_snapshots results.npz -s 3 -t 5
    python -m peapods_tpu.plot.cluster_snapshots results.npz --all-temps
    python -m peapods_tpu.plot.cluster_snapshots results.npz -o snapshot.png
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

MIN_CLUSTER_SIZE = 10
# grey clusters render red, CMR blue clusters blue, non-CMR clusters green
PALETTE = {
    "blue": np.array([0.2, 0.5, 1.0]),
    "red": np.array([0.9, 0.2, 0.2]),
    "green": np.array([0.2, 0.8, 0.3]),
}


def load_snapshots(path):
    data = np.load(path, allow_pickle=True)
    prefix = next(
        (
            k[: -len("_snapshot_sweep_ids")]
            for k in data.files
            if k.endswith("_snapshot_sweep_ids")
        ),
        None,
    )
    if prefix is None:
        print("no snapshot data found in npz", file=sys.stderr)
        sys.exit(1)

    result = {
        "sweep_ids": data[f"{prefix}_snapshot_sweep_ids"],
        "mode_idxs": data[f"{prefix}_snapshot_mode_idxs"],
        "cluster_ids": data[f"{prefix}_snapshot_cluster_ids"],
        "spins": data[f"{prefix}_snapshot_spins"],
        "system_ids": data[f"{prefix}_snapshot_system_ids"],
        "shape": tuple(data[f"{prefix}_lattice_shape"]),
    }
    if f"{prefix}_snapshot_blue_ids" in data.files:
        result["blue_ids"] = data[f"{prefix}_snapshot_blue_ids"]
    if "temperatures" in data.files:
        result["temperatures"] = data["temperatures"]
    return result


def _large_cluster_mask(ids):
    """Mask of sites in clusters of at least MIN_CLUSTER_SIZE sites."""
    _, inverse, counts = np.unique(ids, return_inverse=True, return_counts=True)
    return counts[inverse] >= MIN_CLUSTER_SIZE


def cluster_image(snaps, snap_idx, temp_idx):
    shape = snaps["shape"]
    if len(shape) != 2:
        raise ValueError(f"only 2D lattices supported, got shape {shape}")
    n_spins = int(np.prod(shape))
    img = np.ones((n_spins, 3))

    in_grey = _large_cluster_mask(snaps["cluster_ids"][snap_idx, temp_idx])
    if "blue_ids" in snaps:
        img[in_grey] = PALETTE["red"]
        in_blue = _large_cluster_mask(snaps["blue_ids"][snap_idx, temp_idx])
        img[in_blue] = PALETTE["blue"]
    else:
        img[in_grey] = PALETTE["green"]
    return img.reshape(*shape, 3)


def plot_single(snaps, snap_idx, temp_idx, ax):
    ax.imshow(
        cluster_image(snaps, snap_idx, temp_idx),
        interpolation="nearest",
        origin="lower",
    )
    ax.set_xticks([])
    ax.set_yticks([])
    sweep_id = snaps["sweep_ids"][snap_idx]
    temps = snaps.get("temperatures")
    if temps is not None:
        ax.set_title(f"sweep {sweep_id}, T={temps[temp_idx]:.4f}", fontsize=9)
    else:
        ax.set_title(f"sweep {sweep_id}, t_idx={temp_idx}", fontsize=9)


def _grid_plot(n_panels, plot_fn, title):
    import matplotlib.pyplot as plt

    ncols = min(4, n_panels)
    nrows = (n_panels + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 4 * nrows))
    axes = np.atleast_2d(axes)
    for i in range(n_panels):
        plot_fn(i, axes[i // ncols, i % ncols])
    for i in range(n_panels, nrows * ncols):
        axes[i // ncols, i % ncols].axis("off")
    fig.suptitle(title, fontsize=12)
    return fig


def main():
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser(description="Plot cluster snapshots")
    parser.add_argument("npz", help="Path to .npz file")
    parser.add_argument("-s", "--snap", type=int, default=-1)
    parser.add_argument("-t", "--temp", type=int, default=0)
    parser.add_argument("--all-temps", action="store_true")
    parser.add_argument("--all-snaps", action="store_true")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    snaps = load_snapshots(args.npz)
    n_snaps = len(snaps["sweep_ids"])
    n_temps = snaps["cluster_ids"].shape[1]
    mode = "CMR" if "blue_ids" in snaps else "overlap"
    snap_idx = args.snap % n_snaps
    temp_idx = args.temp % n_temps

    if args.all_temps:
        fig = _grid_plot(
            n_temps,
            lambda t, ax: plot_single(snaps, snap_idx, t, ax),
            f"{mode} clusters — snapshot {snap_idx}",
        )
    elif args.all_snaps:
        temps = snaps.get("temperatures")
        t_label = (
            f"T={temps[temp_idx]:.4f}" if temps is not None else f"t_idx={temp_idx}"
        )
        fig = _grid_plot(
            n_snaps,
            lambda s, ax: plot_single(snaps, s, temp_idx, ax),
            f"{mode} clusters — {t_label}",
        )
    else:
        fig, ax = plt.subplots(figsize=(6, 6))
        plot_single(snaps, snap_idx, temp_idx, ax)

    fig.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=200, bbox_inches="tight")
        print(f"saved to {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
