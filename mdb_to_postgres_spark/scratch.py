"""Process-scoped scratch-directory registry.

Every temp directory the engine creates (streaming checkpoints, foreach
sinks, CDC state stores, embedded-Derby databases) goes through this
module so it is either released eagerly (``release`` in a finally block)
or swept at interpreter exit — never leaked. Round 10's official bench
died on ENOSPC after a long driver session; the audit found >120 leaked
``ckpt_*`` dirs sharing the filesystem with sf10 shuffle spill
(VERDICT.md round 10, "What's wrong" #1). Two rules restore the
invariant:

1. ``scratch_dir(prefix)`` instead of raw ``tempfile.mkdtemp`` — the dir
   is registered and removed at ``atexit`` even if the caller crashes
   mid-query.
2. ``sweep_stale()`` at harness startup (bench.py, driver-sim) removes
   dirs matching our prefixes left by a previous process that was KILLED
   before its atexit ran (SIGKILL skips atexit). Liveness is decided by
   the ``.owner_pid`` marker each scratch dir carries: a dir whose owner
   process is still alive is NEVER swept (a bench's spark.local.dir lives
   for the whole run — an age guard alone deleted one out from under a
   live shuffle in testing); a dir whose owner is dead is reclaimed
   immediately. Markerless dirs (foreign/legacy) fall back to an age
   guard.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

_LIVE: list[str] = []

# Every prefix the engine has ever used for a temp dir. Adding a new
# scratch consumer means adding its prefix here (tests assert each
# scratch_dir call site uses a registered prefix).
STALE_PREFIXES = (
    "ckpt_",
    "sink_",
    "cdc_state_",
    "mdbspark_derby_",
    "mdbspark_localdir_",
)

_STALE_AGE_SEC = 1800  # in-flight dirs of a live sibling process are newer


_OWNER_MARKER = ".owner_pid"


def scratch_dir(prefix: str) -> str:
    """mkdtemp + owner-PID marker + registration for the atexit sweep."""
    d = tempfile.mkdtemp(prefix=prefix)
    try:
        with open(os.path.join(d, _OWNER_MARKER), "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass  # marker is an optimization; the atexit sweep still covers us
    _LIVE.append(d)
    return d


def _owner_alive(path: str) -> bool | None:
    """True/False if the dir carries a readable owner-PID marker and that
    process is alive/dead; None if there is no marker (unknown owner)."""
    try:
        with open(os.path.join(path, _OWNER_MARKER)) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return None


def release(path: str) -> None:
    """Remove a scratch dir now (idempotent) and deregister it."""
    shutil.rmtree(path, ignore_errors=True)
    try:
        _LIVE.remove(path)
    except ValueError:
        pass


@atexit.register
def _sweep_at_exit() -> None:
    for d in list(_LIVE):
        shutil.rmtree(d, ignore_errors=True)
    _LIVE.clear()


def sweep_stale(tmp_root: str | None = None, min_age_sec: int = _STALE_AGE_SEC) -> int:
    """Remove leftover scratch dirs from crashed/killed prior processes.

    Returns the number of directories removed. Only touches dirs whose
    basename starts with one of STALE_PREFIXES. A dir whose owner-PID
    marker names a LIVE process is never removed (concurrent harness
    runs are safe regardless of age); a dead owner's dir is reclaimed
    immediately; markerless dirs fall back to the mtime age guard.
    """
    root = tmp_root or tempfile.gettempdir()
    now = time.time()
    removed = 0
    try:
        entries = os.listdir(root)
    except OSError:
        return 0
    for name in entries:
        if not name.startswith(STALE_PREFIXES):
            continue
        path = os.path.join(root, name)
        try:
            if not os.path.isdir(path):
                continue
            alive = _owner_alive(path)
            if alive is True:
                continue
            if alive is None and now - os.stat(path).st_mtime < min_age_sec:
                continue
        except OSError:
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed += 1
    return removed
