"""Shared helpers for the physics validation scripts.

Counterpart of the reference test helpers (``/root/reference/tests/utils.py``):
exact/known critical temperatures plus the crossing and histogram-consistency
assertions the CI physics jobs rely on.
"""

from pathlib import Path

import numpy as np

# Critical temperatures: square/triangular are exact, the rest are the
# accepted literature values used by the reference CI.
TC_SQUARE = 2.0 / np.log(1 + np.sqrt(2))
TC_TRIANGULAR = 4.0 / np.log(3)
TC_CUBIC = 4.511
TC_BCC = 6.235
TC_FCC = 9.792
TC_EA_3D = 1.102


def assert_overlap_binder(model, tol=0.05):
    """SG Binder from the P(q) histogram must match the moment estimate."""
    if not hasattr(model, "sg_binder"):
        return
    n_bins = int(np.prod(model.lattice_shape)) + 1
    q = np.linspace(-1, 1, n_bins)
    hists = np.stack([h.astype(np.float64) for h in model.overlap_histogram])
    totals = hists.sum(1)
    ok = totals > 0
    p = hists / np.where(ok, totals, 1)[:, None]
    q2 = (q[None, :] ** 2 * p).sum(1)
    q4 = (q[None, :] ** 4 * p).sum(1)
    from_hist = 1 - q4 / (3 * q2**2)
    err = np.abs(from_hist - model.sg_binder)
    bad = ok & (err >= tol)
    assert not bad.any(), (
        f"histogram-vs-moment SG Binder mismatch at temps {np.nonzero(bad)[0]}: "
        f"max err {err[ok].max():.6f} >= {tol}"
    )


def assert_crossing(temps, results, tc, tol=0.05):
    """Binder curves for all sizes must agree at T_c within ``tol``."""
    at_tc = {label: np.interp(tc, temps, curve) for label, curve in results.items()}
    for label, value in at_tc.items():
        print(f"  {label}  binder at T_c: {value:.4f}")
    spread = max(at_tc.values()) - min(at_tc.values())
    print(f"  spread: {spread:.4f} (tol={tol})")
    assert spread < tol, f"spread {spread:.4f} >= {tol}, sizes not crossing"
    print("  PASSED")


def plot_crossing(temps, results, tc, ylabel, title, out_path):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for label, values in results.items():
        ax.plot(temps, values, label=label)
    ax.axvline(tc, color="k", linestyle="--", alpha=0.5, label=f"$T_c$ = {tc:.4f}")
    ax.set(xlabel="Temperature", ylabel=ylabel, title=title)
    ax.legend()
    out = Path(out_path)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved plot to {out}")
