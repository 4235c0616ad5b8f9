"""Small process-lifetime utilities shared by plans/sinks/streaming."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.clear()


atexit.register(_cleanup_scratch)


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is reclaimed at process exit — query
    plans stage sinks, checkpoints, and stream-source symlink dirs here
    so repeated runs (pytest, the driver's correctness sweep, bench
    loops) don't accumulate orphan temp dirs."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d
