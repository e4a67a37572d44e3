"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU via virtual devices
(SURVEY.md section 4); the real-TPU path is exercised by bench.py and the
driver's compile checks.  NOTE: this environment's axon sitecustomize forces
``jax_platforms="axon,cpu"`` from inside ``jax.config`` — an env-var override
is not enough, the config must be re-updated after importing jax and before
any backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
