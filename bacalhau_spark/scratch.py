"""Managed scratch space — one per-process root, removed at interpreter exit.

Round-trip queries and context archives need driver-local staging paths.
Raw ``tempfile.mkdtemp`` per invocation leaks a directory every run; this
module parents every scratch dir under a single lazily-created root that is
cleaned up atexit, so repeated invocations (driver rounds, pytest sessions,
serve daemons) leave nothing behind.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="bacalhau-spark-")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(label: str) -> str:
    """A fresh subdirectory under the process scratch root."""
    return tempfile.mkdtemp(prefix=f"{label}-", dir=scratch_root())
