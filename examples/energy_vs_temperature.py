"""Plot the energy curve of a small 2D ferromagnet across a log temperature grid."""

import sys
from pathlib import Path

import numpy as np
from matplotlib import pyplot as plt

sys.path.insert(0, str(Path(__file__).parent.parent))
from peapods_tpu import Ising  # noqa: E402

model = Ising(
    lattice_shape=(32, 32),
    temperatures=np.geomspace(0.1, 10, 32),
    n_replicas=2,
)
model.sample(
    n_sweeps=4096,
    warmup_ratio=0.25,
    cluster_update_interval=8,
    pt_interval=8,
)

fig, ax = plt.subplots()
ax.plot(model.temperatures, model.energies_avg)
ax.set(
    xlabel="Temperature",
    ylabel="Energy per spin",
    title="Energy vs temperature for a 32x32 Ising ferromagnet",
)
fig.savefig("energy_vs_temperature.png", dpi=150)
plt.show()
