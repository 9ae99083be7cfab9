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

_ROOTS = ("lakeflow_sources", "lakeflow_replay", "lakeflow_bucketed")
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
