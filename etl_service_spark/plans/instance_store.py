"""Durable schedule-instance store — pc.ETL_Zeitplan_Ausfuehrungen.

The reference keeps schedule executions in a DB table
(res/pc/ETL_Zeitplan_Ausfuehrungen.sql:11-26) that survives service
crashes, and leans on that durability twice:

- **boot recovery** (code/DIZService.Worker/Worker.cs:45-51): on start
  the service runs ``UPDATE pc.ETL_Zeitplan_Ausfuehrungen SET
  Ausgefuehrt = 1 WHERE Ausgefuehrt = 0`` — rows left half-open by a
  crash (requested or started, never finished) are closed so the
  scheduler does not treat them as still running, while ``Erfolgreich``
  keeps its DEFAULT(0): a crashed run reads as executed-and-failed.
- **graceful stop** (Worker.cs:78-103 StopAsync): the same UPDATE plus
  ``Letzte_Aenderung = now, Letzte_Aenderung_Nutzer = suser_name()``.

This module is the rebuild's durable twin: an append-only JSON-lines
journal, one line per state CHANGE, folded last-write-wins by the
reference's natural key (workflow, Anforderungszeitpunkt) — the key
Processor.cs uses to decide whether a scheduled occurrence already
fired. Append-only makes every mutation a single atomic-enough write:
a crash can only tear the final line, and ``load()`` drops a torn
tail instead of failing (the reference gets the same guarantee from
the DB's transaction log).

Control-plane scale: the journal grows by one line per instance state
change — O(schedule activity), never O(data). ``compact()`` rewrites
it to one line per instance (the DB-table analogue) via
write-temp-then-``os.replace`` so a crash mid-compaction leaves the
old journal intact.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile
from dataclasses import dataclass
from datetime import datetime

from .scheduler_loop import ScheduleInstance

# pc.ETL_Zeitplan_Ausfuehrungen natural key for fold + idempotence
Key = tuple[str, str]  # (workflow, Anforderungszeitpunkt isoformat)


class StoreLockedError(RuntimeError):
    """Another live InstanceStore (this or any process) holds the
    journal's writer lock."""


def _iso(ts: datetime | None) -> str | None:
    return None if ts is None else ts.isoformat()


def _from_iso(s: str | None) -> datetime | None:
    return None if s is None else datetime.fromisoformat(s)


@dataclass
class StoredRow:
    """One folded journal row — the table row, plus the audit stamps
    the DDL carries (Letzte_Aenderung, Letzte_Aenderung_Nutzer)."""

    workflow: str
    Anforderungszeitpunkt: datetime
    Startzeitpunkt: datetime | None
    Endzeitpunkt: datetime | None
    Ausgefuehrt: bool
    Erfolgreich: bool | None
    Letzte_Aenderung: datetime | None
    Letzte_Aenderung_Nutzer: str | None

    def key(self) -> Key:
        return (self.workflow, self.Anforderungszeitpunkt.isoformat())

    def to_instance(self) -> ScheduleInstance:
        return ScheduleInstance(
            workflow=self.workflow,
            Anforderungszeitpunkt=self.Anforderungszeitpunkt,
            Startzeitpunkt=self.Startzeitpunkt,
            Endzeitpunkt=self.Endzeitpunkt,
            Ausgefuehrt=self.Ausgefuehrt,
            Erfolgreich=self.Erfolgreich,
        )


class InstanceStore:
    """``exclusive`` (default): take the journal's single-writer lock
    for the store's lifetime. The reference's table is multi-writer
    because the DB serializes it (Worker.cs:45-51 assumes that); a
    shared FILE journal has no such referee, and two interleaving
    writers would let one loop's ``reset_stale`` close a row a live
    peer just opened. The lock is an ``fcntl.flock`` on a sidecar
    ``<path>.lock``: held while the store lives, released by
    ``close()`` — and by the KERNEL when the process dies, including
    SIGKILL, so a crashed service never wedges its successor (no lease
    or TTL guesswork). A second store on the same journal raises
    :class:`StoreLockedError` immediately, or blocks until the peer
    exits with ``wait=True`` (clean takeover: the new boot's
    ``reset_stale`` then closes only a DEAD peer's rows, by
    construction). ``exclusive=False`` opens a read-only observer —
    every mutating call refuses.

    ``autocompact_lines``: a long-lived service appends one line per
    state change forever; past this many lines ``load()`` folds the
    journal back to one line per instance (the atomic ``compact()``
    machinery), bounding the file at O(instances). Only an exclusive
    store compacts — an observer never rewrites the file it is
    watching."""

    def __init__(
        self,
        path: str,
        exclusive: bool = True,
        wait: bool = False,
        autocompact_lines: int = 4096,
    ) -> None:
        self.path = path
        self.exclusive = exclusive
        self.autocompact_lines = autocompact_lines
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._lock_fd: int | None = None
        if exclusive:
            fd = os.open(self.path + ".lock", os.O_CREAT | os.O_RDWR, 0o644)
            try:
                flags = fcntl.LOCK_EX | (0 if wait else fcntl.LOCK_NB)
                fcntl.flock(fd, flags)
            except OSError:
                os.close(fd)
                raise StoreLockedError(
                    f"journal {path} is held by another live scheduler "
                    "instance (pass wait=True to take over when it exits, "
                    "or exclusive=False for a read-only observer)"
                ) from None
            self._lock_fd = fd

    def close(self) -> None:
        """Release the writer lock (idempotent). The kernel does the
        same implicitly when the process exits — even on SIGKILL."""
        if self._lock_fd is not None:
            fcntl.flock(self._lock_fd, fcntl.LOCK_UN)
            os.close(self._lock_fd)
            self._lock_fd = None

    def __enter__(self) -> "InstanceStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:  # best-effort; close() is the contract
        try:
            self.close()
        except Exception:
            pass

    def _require_writer(self) -> None:
        if self.exclusive and self._lock_fd is None:
            raise StoreLockedError(f"store for {self.path} is closed")
        if not self.exclusive:
            raise StoreLockedError(
                f"store for {self.path} is a read-only observer "
                "(exclusive=False)"
            )

    # -- journal primitives ------------------------------------------------

    def _append(self, row: dict) -> None:
        self._require_writer()
        line = json.dumps(row, separators=(",", ":"))
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(line + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def _fold(self) -> tuple[dict[Key, StoredRow], int]:
        """Folded rows plus the RAW journal line count (the
        auto-compaction trigger)."""
        rows: dict[Key, StoredRow] = {}
        if not os.path.exists(self.path):
            return rows, 0
        with open(self.path, encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        for i, line in enumerate(lines):
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                # only the journal's final line can be torn (append is
                # the sole writer); a torn line is a write the caller
                # never saw acknowledged — drop it, like an uncommitted
                # transaction. A corrupt NON-final line means something
                # other than this store wrote the file: refuse to guess.
                if i == len(lines) - 1 or all(not x for x in lines[i + 1 :]):
                    break
                raise ValueError(
                    f"corrupt journal line {i + 1} in {self.path}"
                ) from None
            row = StoredRow(
                workflow=d["workflow"],
                Anforderungszeitpunkt=_from_iso(d["anforderung"]),
                Startzeitpunkt=_from_iso(d.get("start")),
                Endzeitpunkt=_from_iso(d.get("ende")),
                Ausgefuehrt=bool(d.get("ausgefuehrt", False)),
                Erfolgreich=d.get("erfolgreich"),
                Letzte_Aenderung=_from_iso(d.get("aenderung")),
                Letzte_Aenderung_Nutzer=d.get("aenderung_nutzer"),
            )
            rows[row.key()] = row  # last write wins
        return rows, sum(1 for x in lines if x)

    # -- table API ----------------------------------------------------------

    def record(
        self, inst: ScheduleInstance, user: str | None = None,
        now: datetime | None = None,
    ) -> None:
        """Persist the instance's CURRENT state (insert and update are
        the same journal append; the fold makes it an upsert)."""
        self._append(
            {
                "workflow": inst.workflow,
                "anforderung": _iso(inst.Anforderungszeitpunkt),
                "start": _iso(inst.Startzeitpunkt),
                "ende": _iso(inst.Endzeitpunkt),
                "ausgefuehrt": inst.Ausgefuehrt,
                "erfolgreich": inst.Erfolgreich,
                "aenderung": _iso(now),
                "aenderung_nutzer": user,
            }
        )

    def load(self) -> list[StoredRow]:
        """All current rows, request-time order (the table's natural
        read order for the scheduler's idempotence check). An
        exclusive store auto-compacts when the journal has outgrown
        its folded row set past ``autocompact_lines`` — the bound that
        keeps a long-lived service's journal O(instances), not
        O(state changes ever)."""
        folded, n_lines = self._fold()
        if (
            self.exclusive
            and self._lock_fd is not None
            and n_lines >= self.autocompact_lines
            and n_lines > len(folded)
        ):
            self._rewrite(folded)
        return sorted(
            folded.values(),
            key=lambda r: (r.Anforderungszeitpunkt, r.workflow),
        )

    def reset_stale(
        self, user: str | None = None, now: datetime | None = None
    ) -> int:
        """The Worker.cs recovery UPDATE: close every row with
        Ausgefuehrt = 0. Boot path (Worker.cs:45-51) passes no user —
        the raw UPDATE stamps nothing; stop path (Worker.cs:78-103)
        passes user+now and stamps Letzte_Aenderung(_Nutzer).
        Erfolgreich is NOT touched: the column's DEFAULT(0) means a
        half-open row closes as failed unless a finish was recorded.
        Returns the number of rows closed."""
        closed = 0
        for row in self._fold()[0].values():
            if row.Ausgefuehrt:
                continue
            row.Ausgefuehrt = True
            if row.Erfolgreich is None:
                row.Erfolgreich = False  # DDL DEFAULT(0)
            if user is not None:
                row.Letzte_Aenderung = now
                row.Letzte_Aenderung_Nutzer = user
            self._append(
                {
                    "workflow": row.workflow,
                    "anforderung": _iso(row.Anforderungszeitpunkt),
                    "start": _iso(row.Startzeitpunkt),
                    "ende": _iso(row.Endzeitpunkt),
                    "ausgefuehrt": True,
                    "erfolgreich": row.Erfolgreich,
                    "aenderung": _iso(row.Letzte_Aenderung),
                    "aenderung_nutzer": row.Letzte_Aenderung_Nutzer,
                }
            )
            closed += 1
        return closed

    def compact(self) -> int:
        """Rewrite the journal to one line per instance (atomic via
        temp-file + os.replace). Returns the folded row count."""
        self._require_writer()
        folded = self._fold()[0]
        self._rewrite(folded)
        return len(folded)

    def _rewrite(self, folded: dict[Key, StoredRow]) -> None:
        self._require_writer()
        rows = sorted(
            folded.values(),
            key=lambda r: (r.Anforderungszeitpunkt, r.workflow),
        )
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)), suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                for row in rows:
                    fh.write(
                        json.dumps(
                            {
                                "workflow": row.workflow,
                                "anforderung": _iso(row.Anforderungszeitpunkt),
                                "start": _iso(row.Startzeitpunkt),
                                "ende": _iso(row.Endzeitpunkt),
                                "ausgefuehrt": row.Ausgefuehrt,
                                "erfolgreich": row.Erfolgreich,
                                "aenderung": _iso(row.Letzte_Aenderung),
                                "aenderung_nutzer": row.Letzte_Aenderung_Nutzer,
                            },
                            separators=(",", ":"),
                        )
                        + "\n"
                    )
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
