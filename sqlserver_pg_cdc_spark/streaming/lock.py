"""Single-writer lock sentinel for quiesced maintenance passes.

Every day-2 maintenance op on streamed state (`purge_tombstones`,
`rescale`, `prune_history`, `compact_batch_log`) documents "run
quiesced — single writer only": the op re-reads partition files between
its stats pass and its rewrite pass, so a concurrent ``foreachBatch``
writer swapping a partition in that window would be silently
overwritten with the op's stale snapshot (a lost update). Through
round 9 that contract was documentation only; this module ENFORCES it:

* the maintenance op holds a create-exclusive marker
  (``__maintenance.lock``, O_CREAT|O_EXCL — atomic on every POSIX
  filesystem) in the state/log dir for the duration of the pass;
* every partitioned sink's batch apply and every gate's log write
  checks the marker first and FAILS FAST with a clear message while a
  live pass holds it — Structured Streaming surfaces the failed batch
  and replays it after the pass releases;
* a second concurrent maintenance op fails the exclusive create the
  same way.

Crash recovery: a pass that dies mid-way leaves the marker behind, but
the marker records (pid, host, ts) — a later acquire or writer check
treats it as STALE when its pid is gone (same host) or its timestamp
is past ``stale_after_s``, breaks it, and proceeds. That is safe
because every guarded op is individually crash-recoverable
(`_recover_rescale`, per-partition generation swap, batch-log meta
commit point): the lock exists to serialize LIVE writers, not to mark
corruption.

Reference analog: the reference serializes day-2 maintenance against
its connectors by pausing them (docs/troubleshooting-part01.md
retention runbooks); here the pause is enforced at the state boundary
rather than assumed.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

LOCK_FILE = "__maintenance.lock"

# Default staleness horizon for locks whose owner cannot be liveness-
# checked (other host): generous, because breaking a LIVE lock is the
# one unsafe action. Same-host dead pids are broken immediately.
DEFAULT_STALE_AFTER_S = 6 * 3600.0


class MaintenanceLockError(RuntimeError):
    """A maintenance pass holds (or contends for) the single-writer
    lock. Writers should retry after the pass finishes."""


def _lock_path(state_dir: str) -> str:
    return os.path.join(state_dir, LOCK_FILE)


def read_lock(state_dir: str) -> dict | None:
    """The live lock's payload (op, pid, host, ts) or None. A marker
    that cannot be parsed (crash mid-write) reads as an empty dict —
    present but anonymous, so staleness falls back to file mtime."""
    path = _lock_path(state_dir)
    try:
        with open(path) as f:
            raw = f.read()
    except FileNotFoundError:
        return None
    try:
        info = json.loads(raw)
    except (ValueError, UnicodeDecodeError):
        info = {}
    if "ts" not in info:
        try:
            info["ts"] = os.path.getmtime(path)
        except OSError:
            info["ts"] = time.time()
    return info


def _is_stale(info: dict, stale_after_s: float) -> bool:
    import socket

    pid = info.get("pid")
    host = info.get("host")
    if pid is not None and host == socket.gethostname():
        try:
            os.kill(int(pid), 0)
        except ProcessLookupError:
            return True  # owner died on this host: break immediately
        except PermissionError:
            pass  # alive, owned by another user
        except (OverflowError, ValueError):
            return True  # garbage pid: treat as crashed-mid-write
        else:
            return False  # owner is alive here: never stale by age
        return False
    # foreign-host or anonymous lock: age is the only signal
    return (time.time() - float(info.get("ts", 0.0))) > stale_after_s


def assert_no_maintenance(
    state_dir: str,
    what: str = "upsert batch",
    stale_after_s: float = DEFAULT_STALE_AFTER_S,
) -> None:
    """Writer-side check: fail fast while a LIVE maintenance pass holds
    the dir; break and proceed past a stale (crashed) one."""
    info = read_lock(state_dir)
    if info is None:
        return
    if _is_stale(info, stale_after_s):
        try:
            os.remove(_lock_path(state_dir))
        except FileNotFoundError:
            pass
        return
    raise MaintenanceLockError(
        f"{what} refused: maintenance op {info.get('op')!r} "
        f"(pid {info.get('pid')}, host {info.get('host')}, started "
        f"{time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime(float(info.get('ts', 0.0))))}) "
        f"holds the single-writer lock on {state_dir}; retry after it "
        f"finishes, or remove {LOCK_FILE} if it crashed on another host"
    )


@contextmanager
def maintenance_lock(
    state_dir: str,
    op: str,
    stale_after_s: float = DEFAULT_STALE_AFTER_S,
):
    """Hold the create-exclusive maintenance marker for the pass."""
    import socket

    os.makedirs(state_dir, exist_ok=True)
    path = _lock_path(state_dir)
    fd = None
    for _attempt in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            info = read_lock(state_dir)
            if info is not None and _is_stale(info, stale_after_s):
                # crashed owner: break the lock, retry the exclusive
                # create once (a racing breaker loses the create and
                # re-reads a FRESH lock on its second attempt)
                try:
                    os.remove(path)
                except FileNotFoundError:
                    pass
                continue
            raise MaintenanceLockError(
                f"maintenance op {op!r} refused: "
                f"{(info or {}).get('op')!r} (pid {(info or {}).get('pid')}) "
                f"already holds the single-writer lock on {state_dir}"
            )
    if fd is None:
        raise MaintenanceLockError(
            f"maintenance op {op!r} could not acquire the single-writer "
            f"lock on {state_dir} (live contention)"
        )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "op": op,
                    "pid": os.getpid(),
                    "host": socket.gethostname(),
                    "ts": time.time(),
                },
                f,
            )
        yield
    finally:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass
