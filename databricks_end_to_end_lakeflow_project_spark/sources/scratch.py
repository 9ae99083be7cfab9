"""Process-scoped scratch-dir lifecycle for the pid-unique staging dirs.

Three operator families stage derived copies of the testdata under
``$TMPDIR`` (non-parquet round trips, watermark-replay slices, bucketed
join copies). The dirs are pid-tagged so concurrent processes (driver
gate + local pytest) never overwrite files the other is mid-read on —
but a bare pid tag leaks: every process leaves a fresh copy behind.
This module closes the loop:

- :func:`pid_scratch_dir` is the single constructor for such paths;
- the FIRST call in a process prunes any sibling dir whose trailing
  ``_<pid>`` belongs to a process that no longer exists (the previous
  runs' leftovers — safe to delete precisely because a dead pid cannot
  be mid-read);
- every dir handed out is registered for ``atexit`` removal, so a
  cleanly-exiting process reclaims its own copies immediately.

A crash therefore leaves dirs behind only until the NEXT run's prune —
bounded accumulation instead of unbounded growth.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

_ROOTS = (
    "lakeflow_sources",
    "lakeflow_replay",
    "lakeflow_bucketed",
    "lakeflow_models",
)
_PID_SUFFIX = re.compile(r"_(\d+)$")
_pruned = False
_own_dirs: set[str] = set()
_atexit_registered = False


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def prune_stale_pid_dirs() -> list[str]:
    """Remove pid-tagged scratch dirs of processes that are gone.
    Returns the removed paths (for tests). Dirs without a pid suffix
    (legacy layouts) are left alone — they cannot be attributed."""
    removed: list[str] = []
    tmp = tempfile.gettempdir()
    for root in _ROOTS:
        base = os.path.join(tmp, root)
        if not os.path.isdir(base):
            continue
        for child in os.listdir(base):
            m = _PID_SUFFIX.search(child)
            if not m or int(m.group(1)) == os.getpid():
                continue
            if not _alive(int(m.group(1))):
                path = os.path.join(base, child)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return removed


def _cleanup_own() -> None:
    for d in _own_dirs:
        shutil.rmtree(d, ignore_errors=True)


def pid_tag(sf_dir: str) -> str:
    """The canonical process-unique tag for staged copies of ``sf_dir``."""
    return f"{sf_dir.strip('/').replace('/', '_').replace('.', '_')}_{os.getpid()}"


def ephemeral_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with lifecycle: the dir is registered for
    removal at interpreter exit (same mechanism as the pid-tagged
    scratch dirs), so per-call fixture/checkpoint roots don't accumulate
    across runs."""
    global _atexit_registered
    if not _atexit_registered:
        _atexit_registered = True
        atexit.register(_cleanup_own)
    d = tempfile.mkdtemp(prefix=prefix)
    _own_dirs.add(d)
    return d


def pid_model_dir(*parts: str) -> str:
    """Pid-unique dir for ORACLE MODEL EXPORTS (the MMR / PQ /
    binaryfile-manifest pattern: a bounded trained-model parquet the
    generated oracle SQL reads back). The path is pid-tagged so a pytest
    run concurrent with the driver gate can never overwrite a model
    between the other process's Spark run and its DuckDB oracle read —
    the oracle SQL strings embed the path at module-import time, and the
    import, the Spark query and the oracle all happen in the SAME
    process, so the tag is consistent where it must be and unique where
    it must be. Same prune/atexit lifecycle as every pid scratch dir."""
    return pid_scratch_dir("lakeflow_models", "models", *parts)


def pid_scratch_dir(root: str, sf_dir: str, *parts: str) -> str:
    """Pid-unique scratch path ``$TMPDIR/{root}/{tag}/{parts...}`` with
    lifecycle management: first use prunes dead processes' leftovers,
    and this process's dirs are removed at interpreter exit."""
    global _pruned, _atexit_registered
    if not _pruned:
        _pruned = True
        prune_stale_pid_dirs()
    if not _atexit_registered:
        _atexit_registered = True
        atexit.register(_cleanup_own)
    top = os.path.join(tempfile.gettempdir(), root, pid_tag(sf_dir))
    _own_dirs.add(top)
    return os.path.join(top, *parts) if parts else top
