"""Process-lifetime scratch directories for round-trip queries.

Source/sink round-trip queries and streaming checkpoints need on-disk
scratch space. Raw ``tempfile.mkdtemp`` litters /tmp forever — repeated
correctness/bench runs accumulate unbounded checkpoint dirs. Every
scratch dir the engine allocates lives under ONE per-process base dir
that an ``atexit`` hook removes, so a run cleans up after itself while
each call site still gets a fresh, collision-free directory.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_BASE: str | None = None


def scratch_dir(prefix: str = "") -> str:
    """A fresh directory under the per-process scratch base (created
    lazily, removed at interpreter exit). Drop-in replacement for
    ``tempfile.mkdtemp(prefix=...)`` at query call sites."""
    global _BASE
    if _BASE is None:
        _BASE = tempfile.mkdtemp(prefix="h20wf_scratch_")
        atexit.register(shutil.rmtree, _BASE, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_BASE)
