"""Seed derivation: SeedSequence on the Python side, threefry keys on device.

The reference derives a 64-bit dynamics seed from ``np.random.SeedSequence``
(``python/peapods/spin_models.py:13-23``), then fans out per-realization seeds
via splitmix64 (``src/lib.rs:22-32``) and per-RNG-domain child seeds
(``simulation/realization.rs:6-19``).  We reproduce the same splitmix64 fan-out
host-side (so seed discipline tests carry over unchanged), then convert each
64-bit stream seed into a JAX threefry key.  On-device, per-sweep randomness is
derived by folding a monotonically increasing sweep counter into the
realization key — a counter-based scheme that is reproducible regardless of
execution order, replacing the reference's stateful Xoshiro streams.
"""

from __future__ import annotations

import numpy as np
import jax

__all__ = [
    "splitmix64",
    "realization_seed",
    "seed_material",
    "dynamics_seed",
    "key_from_u64",
]

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(value: int) -> int:
    """splitmix64 mix function (reference src/lib.rs:22-28)."""
    v = np.uint64(value & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        v = (v + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = v
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        z = z ^ (z >> np.uint64(31))
    return int(z)


def realization_seed(root: int, realization: int) -> int:
    """Per-disorder-realization seed (reference src/lib.rs:30-32)."""
    return splitmix64(root ^ splitmix64(realization))


def seed_material(seed):
    """(coupling SeedSequence, 64-bit dynamics seed) — spin_models.py:13-19."""
    if seed is not None and (not isinstance(seed, (int, np.integer)) or seed < 0):
        raise ValueError("seed must be a non-negative integer or None")
    root = np.random.SeedSequence(seed)
    coupling_seed, dyn_seed = root.spawn(2)
    dynamics = int(dyn_seed.generate_state(1, dtype=np.uint64)[0])
    return coupling_seed, dynamics


def dynamics_seed(seed) -> int:
    return seed_material(seed)[1]


def key_from_u64(seed: int) -> jax.Array:
    """Fold a full 64-bit seed into a threefry key."""
    lo = np.uint32(seed & 0xFFFFFFFF)
    hi = np.uint32((seed >> 32) & 0xFFFFFFFF)
    return jax.random.fold_in(jax.random.PRNGKey(int(lo)), int(hi))
