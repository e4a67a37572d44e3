"""One-shot engine-plan / fallback logging.

The engine picks kernels and mesh layouts silently (``Runtime.build``,
``LoopProgram``); when a gate forces a slow path the user should hear about
it exactly once.  ``PEAPODS_QUIET=1`` suppresses everything (CI physics
scripts), and repeated messages are deduplicated process-wide.
"""

from __future__ import annotations

import os
import sys

__all__ = ["log_once"]

_seen: set[str] = set()


def log_once(msg: str) -> None:
    """Print ``msg`` to stderr once per process (dedup by content)."""
    if os.environ.get("PEAPODS_QUIET") == "1" or msg in _seen:
        return
    _seen.add(msg)
    print(f"[peapods-tpu] {msg}", file=sys.stderr)
