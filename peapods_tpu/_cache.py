"""Persistent XLA compilation cache setup (imported for its side effect).

The fused sweep-loop program is large; caching compiled executables across
processes makes repeated CLI invocations and test runs start in seconds
instead of minutes.
"""

import os

import jax

_dir = os.environ.get(
    "PEAPODS_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "peapods_tpu_xla")
)
try:
    os.makedirs(_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
