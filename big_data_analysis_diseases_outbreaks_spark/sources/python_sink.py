"""Engine-native exactly-once streaming SINK via the Spark 4 Python
DataSource writer API — the writer-side twin of
``sources/producer_source.py`` (which covers the reader side of
SURVEY.md §2.A10). The reference's pipeline ends in Kafka/JDBC sinks
(``Main.scala:81-95``); this sink shows the engine can OWN a custom
delivery protocol end-to-end with the same exactly-once guarantee
foreachBatch gives, but as a reusable ``format("audit_sink")``.

Protocol (the two-phase commit the DataSourceStreamWriter API is built
for):

- ``write(iterator)`` runs on EXECUTORS, once per partition: rows are
  staged to a private file named by (task partition id, uuid) under
  ``<path>/.staging/`` and the file name travels back to the driver in
  the ``WriterCommitMessage`` — no executor ever touches the committed
  namespace.
- ``commit(messages, batchId)`` runs once on the driver AFTER every
  partition succeeded: staged files move atomically into
  ``<path>/batch=<id>/``. A retried batch REPLACES its own directory
  wholesale (delete + move) — the same idempotent per-batch-partition
  overwrite recipe as ``streaming/curation.py``, so at-least-once
  delivery from the engine becomes exactly-once in the sink.
- ``abort`` deletes the staged files; the committed namespace is
  untouched by failed attempts.

Rows are rendered as two-column CSV (long, long) — schema-checked on
read-back. Local-fs ops are ``os``-level here; on a cluster the same
protocol runs against an object store via the Hadoop FS API
(``sources/fsutil.py``) — rename-based commit is the part to swap for
a manifest write there, since object-store "rename" is not atomic.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

AUDIT_SINK_SCHEMA = "doc_id BIGINT, n_tokens BIGINT"


@dataclass
class StagedFile(WriterCommitMessage):
    path: str
    n_rows: int


class AuditSinkDataSource(DataSource):
    """``format("audit_sink")`` — required option: ``path``."""

    @classmethod
    def name(cls) -> str:
        return "audit_sink"

    def schema(self) -> str:
        return AUDIT_SINK_SCHEMA

    def streamWriter(self, schema, overwrite: bool) -> "AuditSinkWriter":
        return AuditSinkWriter(dict(self.options))


class AuditSinkWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> StagedFile:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        staging = os.path.join(self.path, ".staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{pid:05d}-{uuid.uuid4().hex}.csv")
        n = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{int(row[0])},{int(row[1])}\n")
                n += 1
        return StagedFile(path=fname, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        commit_batch_dir(
            self.path,
            batchId,
            [m.path for m in messages if m is not None],
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def commit_batch_dir(path: str, batch_id: int, staged: list[str]) -> None:
    """Replace-style batch commit: the batch directory is rebuilt from
    this attempt's staged files only, so a retried micro-batch can
    never double its rows (delete-then-move; the final directory
    appears with all files present)."""
    final = os.path.join(path, f"batch={batch_id}")
    tmp = os.path.join(path, f".commit-{batch_id}-{uuid.uuid4().hex}")
    os.makedirs(tmp)
    for i, f in enumerate(staged):
        shutil.move(f, os.path.join(tmp, f"part-{i:05d}.csv"))
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)


def register_audit_sink(spark) -> None:
    """Register under by-value pickling — the Python runner process
    inherits neither sys.path nor cwd (see producer_source.py)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(AuditSinkDataSource)
