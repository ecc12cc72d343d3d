"""Incremental checksum state tracker (reference incremental/state.py).

Per-table persisted state ``{table, checksum, row_count, last_run, mode}``
as one JSON file per table with advisory file locking and atomic replace —
the same shape the reference persists (state.py:112-164), minus the
hand-rolled retry loop (a rename is atomic on POSIX).

This is deliberately NOT Spark streaming state: the reference's
incremental mode is per-run bookkeeping (one record per table), not
per-key state. A tiny driver-side store is the right tool; at fleet scale
point ``state_dir`` at shared storage.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import tempfile
from dataclasses import asdict, dataclass

try:
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX
    fcntl = None


@dataclass(frozen=True)
class ChecksumState:
    table: str
    checksum: str
    row_count: int
    last_run: str  # ISO-8601 UTC
    mode: str  # "full" | "delta"


class IncrementalStateTracker:
    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, table: str) -> str:
        safe = table.replace("/", "_")
        return os.path.join(self.state_dir, f"{safe}.json")

    def load(self, table: str) -> ChecksumState | None:
        path = self._path(table)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            if fcntl:
                fcntl.flock(f, fcntl.LOCK_SH)
            try:
                raw = json.load(f)
            finally:
                if fcntl:
                    fcntl.flock(f, fcntl.LOCK_UN)
        return ChecksumState(**raw)

    def save(self, state: ChecksumState) -> None:
        path = self._path(state.table)
        fd, tmp = tempfile.mkstemp(dir=self.state_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                if fcntl:
                    fcntl.flock(f, fcntl.LOCK_EX)
                try:
                    json.dump(asdict(state), f)
                    f.flush()
                    os.fsync(f.fileno())
                finally:
                    if fcntl:
                        fcntl.flock(f, fcntl.LOCK_UN)
            os.replace(tmp, path)  # atomic on POSIX
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def record_run(
        self, table: str, checksum: str, row_count: int, mode: str = "full"
    ) -> ChecksumState:
        state = ChecksumState(
            table=table,
            checksum=checksum,
            row_count=row_count,
            last_run=_dt.datetime.now(_dt.timezone.utc).isoformat(),
            mode=mode,
        )
        self.save(state)
        return state

    def tables(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.state_dir) if f.endswith(".json")
        )
