"""Python DataSource write path: the error-audit channel as a
``df.write.format("audit_log")`` sink with two-phase commit.

The reference appends audit rows with a bare ``to_sql`` (reference
``crawler/src/utils/error_handler.py:25-35``) — a failed task there
leaves partial rows behind. This sink implements the DataSource V2
commit protocol instead:

1. each task writes its rows to a *staging* JSONL file under the
   job's own ``_staging/<job-id>/`` directory and returns the file
   name in its :class:`WriterCommitMessage`;
2. the driver's ``commit`` renames exactly the staged files named in
   the commit messages into the log directory — files from failed or
   speculative task attempts are never named, so they are never
   published; in overwrite mode new files publish BEFORE old ones are
   pruned, so a mid-commit crash leaves a superset visible, never an
   emptied log;
3. ``abort`` removes the job's staging directory; concurrent write
   jobs stage under different job ids and cannot sweep each other's
   files; a crashed job leaves only its own ``_staging/<job-id>``
   garbage, which no other job's commit touches.

Readers list only committed files, so the audit log is append-only
and all-or-nothing per batch — the same atomicity discipline as
``sinks/parquet.py``'s staged swaps, expressed through Spark's own
writer-commit machinery rather than hand-rolled renames.

JSONL keeps the sink dependency-free and line-appendable; the audit
table is tiny by construction (one row per failed task/run), so
columnar layout buys nothing here.

Deployment constraint: tasks stage and the driver publishes, so
``path`` must be a filesystem both can see (local[*] in tests; NFS /
fuse-mounted object storage on a cluster). For a pure-S3 deployment
the identical protocol rides Hadoop FS renames instead — that variant
already exists as the staged swaps in ``sinks/parquet.py``; this
module's point is expressing it through Spark's own writer-commit
machinery.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

#: mirrors the reference's airflow_errors columns
#: (``crawler/src/utils/error_handler.py:25-28``)
AUDIT_SCHEMA_DDL = "dag_id string, task_id string, run_id string, error string"


@dataclass
class _StagedFile(WriterCommitMessage):
    name: str
    rows: int


class AuditLogWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]
        self.overwrite = overwrite
        # per-JOB staging directory: the writer instance (and its job
        # id) is pickled to every task, so all of this job's tasks
        # stage under one directory that no concurrent write job
        # touches — commit/abort can sweep it wholesale without racing
        # another writer's staged files.
        self.job_id = uuid.uuid4().hex

    def _staging(self) -> str:
        return os.path.join(self.path, "_staging", self.job_id)

    def write(self, rows: Iterator[Row]) -> _StagedFile:
        """Task side: stage this partition's rows under the job's own
        staging directory."""
        staging = self._staging()
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _StagedFile(name=name, rows=n)

    def commit(self, messages: list[_StagedFile | None]) -> None:
        """Driver side: publish exactly the files the successful task
        attempts named, then drop this job's staging directory (which
        may still hold files from failed or speculative attempts).

        Overwrite order is publish-then-prune: new files land first,
        then old files are removed — a crash mid-commit leaves readers
        seeing old+new (a superset), never an emptied log.
        """
        staging = self._staging()
        published: list[str] = []
        for msg in messages:
            if msg is not None and msg.rows > 0:
                os.replace(
                    os.path.join(staging, msg.name),
                    os.path.join(self.path, msg.name),
                )
                published.append(msg.name)
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl") and f not in published:
                    os.remove(os.path.join(self.path, f))
        self._sweep_staging()

    def abort(self, messages: list[_StagedFile | None]) -> None:
        self._sweep_staging()

    def _sweep_staging(self) -> None:
        staging = self._staging()
        if os.path.isdir(staging):
            for leftover in os.listdir(staging):
                os.remove(os.path.join(staging, leftover))
            os.rmdir(staging)


class AuditLogReader(DataSourceReader):
    """Read back committed audit rows (staging is invisible)."""

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def read(self, partition) -> Iterator[tuple]:
        if not os.path.isdir(self.path):
            return
        for f in sorted(os.listdir(self.path)):
            if not f.endswith(".jsonl"):
                continue
            with open(os.path.join(self.path, f)) as fh:
                for line in fh:
                    d = json.loads(line)
                    yield (
                        d.get("dag_id"),
                        d.get("task_id"),
                        d.get("run_id"),
                        d.get("error"),
                    )


class AuditLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "audit_log"

    def schema(self) -> str:
        return AUDIT_SCHEMA_DDL

    def reader(self, schema: StructType) -> AuditLogReader:
        return AuditLogReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> AuditLogWriter:
        return AuditLogWriter(dict(self.options), overwrite)
