"""Spark 4 Python DataSource: a partition-parallel JSON-lines reader.

The reference's connector surface is a closed enum of vendor drivers
(`CommandExecuter.cs` connection switch); Spark's equivalent
extension point for "a format the engine doesn't ship" is the Python
DataSource API (SPARK-44076, pyspark>=4.0): schema + partition
planning on the driver, `read(partition)` on executors. This module
exercises that surface end-to-end with a deliberately simple format —
JSON-lines with a REQUIRED explicit schema (no inference scan: at
100 TB schema inference is a full extra read of the corpus, so the
reader refuses to run without a declared schema, same policy as the
FILE-JSON connector in sources/connectors.py).

Partitioning model: one input partition per file — the natural unit
for a landing directory written by an upstream Spark job (one part
file per upstream task). Executors open only their own file; the
driver never reads data, only the directory listing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class JsonLinesDataSource(DataSource):
    """``spark.read.format("etl_jsonl").option("schema", ddl).load(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "etl_jsonl"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError(
                "etl_jsonl requires an explicit 'schema' option — "
                "inference would be a full extra scan of the input"
            )
        return ddl

    def reader(self, schema) -> "JsonLinesReader":
        return JsonLinesReader(schema, self.options)

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(schema, self.options, overwrite)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _converter(dt_name: str):
    if dt_name in ("long", "integer", "short", "byte"):
        return lambda v: None if v is None else int(v)
    if dt_name in ("double", "float"):
        return lambda v: None if v is None else float(v)
    if dt_name == "boolean":
        return lambda v: None if v is None else bool(v)
    if dt_name == "string":
        return lambda v: None if v is None else str(v)
    raise ValueError(f"etl_jsonl: unsupported field type {dt_name}")


class JsonLinesReader(DataSourceReader):
    def __init__(self, schema, options):
        self._fields = [(f.name, _converter(f.dataType.typeName())) for f in schema.fields]
        root = options.get("path")
        if root is None:
            raise ValueError("etl_jsonl: no path given")
        if os.path.isdir(root):
            self._files = sorted(
                os.path.join(root, f)
                for f in os.listdir(root)
                if not f.startswith(("_", ".")) and not f.endswith(".crc")
            )
        else:
            self._files = [root]

    def partitions(self):
        return [_FilePartition(p) for p in self._files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(conv(rec.get(name)) for name, conv in self._fields)


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class JsonLinesWriter(DataSourceWriter):
    """Write side of the custom source — the full two-phase commit
    protocol the DataSourceWriter API exists for: each TASK writes its
    rows to a hidden ``.staged-*`` file (invisible to the reader's
    dot-file filter) and returns the name as its commit message; the
    DRIVER's ``commit`` renames every staged file into place only after
    all tasks succeeded (and, for overwrite mode, removes the prior
    part files first); ``abort`` deletes the staged files. A failed or
    speculatively-duplicated task therefore never leaves a readable
    half-written part — the same staged-files-then-publish shape as
    sources/snapshots.py, here per write job instead of per table
    version."""

    def __init__(self, schema, options, overwrite: bool):
        self._names = [f.name for f in schema.fields]
        self._path = options.get("path")
        if self._path is None:
            raise ValueError("etl_jsonl: no path given")
        self._overwrite = overwrite

    def write(self, iterator) -> _StagedFile:
        import uuid

        os.makedirs(self._path, exist_ok=True)
        staged = f".staged-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self._path, staged), "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {k: v for k, v in zip(self._names, row)}
                fh.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return _StagedFile(staged, n)

    def commit(self, messages) -> None:
        # publish-first, remove-old-second: a crash mid-commit leaves
        # old+new parts visible together (bounded duplicates a re-run
        # replaces) — never the old parts deleted with the new rows
        # still hidden (silent loss). Same loss-ordering convention as
        # corpus_stream's curated-first write and purge_forgotten.
        old_parts = [
            f
            for f in os.listdir(self._path)
            if f.startswith("part-") and f.endswith(".jsonl")
        ]
        published = set()
        for m in messages:
            os.rename(
                os.path.join(self._path, m.staged),
                os.path.join(self._path, "part-" + m.staged[len(".staged-"):]),
            )
            published.add("part-" + m.staged[len(".staged-"):])
        if self._overwrite:
            for f in old_parts:
                if f not in published:
                    os.remove(os.path.join(self._path, f))
        self._sweep_orphans()

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self._path, m.staged))
            except FileNotFoundError:
                pass
        self._sweep_orphans()

    def _sweep_orphans(self) -> None:
        # failed/speculative attempts never return a commit message, so
        # their staged files are unreachable through `messages`. Under
        # this source's single-writer-per-directory contract (the same
        # contract snapshots._commit documents) any .staged-* remaining
        # at job end belongs to this job's dead attempts — sweep them
        # so long-lived append directories don't grow invisible garbage.
        for f in os.listdir(self._path):
            if f.startswith(".staged-"):
                try:
                    os.remove(os.path.join(self._path, f))
                except FileNotFoundError:
                    pass


class JsonLinesStreamDataSource(DataSource):
    """Streaming twin: ``spark.readStream.format("etl_jsonl_stream")``
    over a grow-only landing directory of JSON-lines files.

    This is the extension point for feeds Spark's built-in file stream
    can't read (an external queue, a vendor drop-box protocol). Offset
    model: the lexicographically-sorted file list is the log, the
    offset is a cursor {"count": N} into it — so the landing contract
    is the same one every file-queue integration documents: files land
    complete, named in monotonically increasing order (timestamp/seq
    prefixes), and are never mutated. Replays between two committed
    offsets re-read exactly the files in [start, end) — exactly-once
    into a checkpointed sink.

    The cursor offset is O(1) regardless of history (unlike an
    explicit file-set offset, which grows with the stream) — at 100 TB
    of drops the checkpoint stays bytes-sized.
    """

    @classmethod
    def name(cls) -> str:
        return "etl_jsonl_stream"

    def schema(self):
        ddl = self.options.get("schema")
        if not ddl:
            raise ValueError("etl_jsonl_stream requires an explicit 'schema' option")
        return ddl

    def simpleStreamReader(self, schema) -> "JsonLinesStreamReader":
        return JsonLinesStreamReader(schema, self.options)


class JsonLinesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self._fields = [(f.name, _converter(f.dataType.typeName())) for f in schema.fields]
        self._root = options.get("path")
        if self._root is None:
            raise ValueError("etl_jsonl_stream: no path given")

    def _files(self) -> list[str]:
        if not os.path.isdir(self._root):
            return []
        return sorted(
            f
            for f in os.listdir(self._root)
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        )

    def _rows(self, names):
        # a LIST iterator, not a generator: the engine's prefetch cache
        # copy.copy()-es the returned iterator (datasource_internal),
        # and generators are not copyable. The simple-reader contract
        # is driver-side micro-batch prefetch anyway, so the batch is
        # in memory either way.
        out = []
        for name in names:
            with open(os.path.join(self._root, name), encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    out.append(tuple(conv(rec.get(n)) for n, conv in self._fields))
        return iter(out)

    def initialOffset(self) -> dict:
        return {"count": 0}

    def read(self, start: dict):
        files = self._files()
        newly = files[start["count"]:]
        return self._rows(newly), {"count": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # recovery replay: the sorted grow-only listing makes the slice
        # [start, end) identical to what the original batch read
        return self._rows(self._files()[start["count"]:end["count"]])

    def commit(self, end: dict) -> None:
        pass  # files are the log; nothing to truncate
