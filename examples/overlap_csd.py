"""Overlap-cluster size distributions of a 2D +-J glass across temperatures.

At low temperature the Houdayer overlap-cluster distribution develops a heavy
tail with system-spanning clusters; near and above T_c it decays quickly.
"""

import sys
from pathlib import Path

import numpy as np
from matplotlib import pyplot as plt

sys.path.insert(0, str(Path(__file__).parent.parent))
from peapods_tpu import Ising  # noqa: E402

SIZE = 64
temps = np.array([0.5, 1.0, 1.5, 2.0, 2.5])
SAMPLING = dict(
    n_sweeps=2**14,
    warmup_ratio=0.25,
    overlap_cluster_update_interval=1,
    overlap_cluster_build_mode="houdayer",
    overlap_cluster_mode="wolff",
    pt_interval=1,
    collect_cluster_stats=True,
)

model = Ising(
    lattice_shape=(SIZE, SIZE),
    couplings="bimodal",
    temperatures=temps,
    n_replicas=2,
    n_disorder=100,
)
results = model.sample(**SAMPLING)

fig, ax = plt.subplots(figsize=(6, 4))
for t_idx, temp in enumerate(temps):
    csd = np.asarray(results["overlap_csd"][0][t_idx], dtype=np.float64)
    sizes = np.arange(len(csd))
    populated = csd > 0
    ax.scatter(
        sizes[populated],
        csd[populated] / csd.sum(),
        s=8,
        label=f"T = {temp:.1f}",
    )

ax.set_xscale("log")
ax.set_yscale("log")
ax.set(xlabel="Cluster size s", ylabel="P(s)",
       title=f"Overlap CSD ({SIZE}x{SIZE} +-J spin glass)")
ax.legend()
fig.tight_layout()
fig.savefig("overlap_csd.png", dpi=150)
plt.show()
