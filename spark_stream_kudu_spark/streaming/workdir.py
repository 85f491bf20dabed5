"""Scratch-dir management for file-replay streaming queries.

The end-to-end streaming queries (stream_traffic_pipeline, the
streaming/extensions.py runs) each stage replay files, a checkpoint,
and a sink under a fresh run directory in ``.tmp/``. Runs are
independent, so old directories are garbage; this module hands out run
dirs and reaps siblings older than an hour (long past the point their
lazily-read result DataFrames were consumed) so repeated correctness /
test runs don't grow the repo without bound.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

TMP_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp"
)

_MAX_AGE_SEC = 3600


def gc_old_runs(max_age_sec: int = _MAX_AGE_SEC) -> None:
    """Remove run directories whose mtime is older than ``max_age_sec``.
    Best-effort: concurrent runs racing on the same dir just skip it."""
    if not os.path.isdir(TMP_ROOT):
        return
    cutoff = time.time() - max_age_sec
    for name in os.listdir(TMP_ROOT):
        path = os.path.join(TMP_ROOT, name)
        try:
            if os.path.isdir(path) and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass


def new_run_dir(prefix: str) -> str:
    """Fresh scratch dir for one streaming run; reaps stale siblings."""
    gc_old_runs()
    path = os.path.join(TMP_ROOT, f"{prefix}_{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    return path
