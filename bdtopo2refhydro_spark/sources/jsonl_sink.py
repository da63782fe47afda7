"""Custom JSONL sink (Spark 4 Python DataSource writer API).

The export side of the crawl world: sharded JSON-Lines, one shard per
task, with a REAL two-phase commit — tasks write `.inprogress` temp
files and report them in commit messages; only the DRIVER's commit()
renames shards to their final names and stamps a `_SUCCESS` manifest
(shard list + row counts). A job that dies mid-write leaves only temp
files and no manifest, so downstream readers (which must key on
`_SUCCESS`) never see a torn dataset — the same task-commit/job-commit
split Hadoop FileOutputCommitter v1 gives the JVM writers, here
implemented explicitly because the Python DataSource API leaves the
commit protocol to the source.

    spark.dataSource.register(JsonlSinkDataSource)
    df.write.format("jsonl_shards").mode("append"|"overwrite").save(dir)

Scale shape: one shard per input partition, written streamingly (no
row buffering); the driver handles only O(#shards) renames. Speculative
/ retried tasks each write a unique temp file, and commit() renames the
one copy per partition that reached a commit message — duplicate
attempts are swept by their absence from the message list.

Completes the custom-source family next to sources/warc.py (reader).
"""

from __future__ import annotations

import json
import os

MANIFEST = "_SUCCESS"
COMMIT_LOG = "_COMMITS"


def _lazy_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _ShardCommit(WriterCommitMessage):
        def __init__(self, tmp_name: str, final_name: str, rows: int):
            self.tmp_name = tmp_name
            self.final_name = final_name
            self.rows = rows

    class JsonlWriter(DataSourceWriter):
        def __init__(self, options, schema, overwrite: bool):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("jsonl_shards sink requires a path")
            self._fields = schema.fieldNames()
            self._overwrite = overwrite

        def write(self, iterator):
            import uuid

            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            os.makedirs(self._dir, exist_ok=True)
            final = f"part-{pid:05d}.jsonl"
            tmp = f".{final}.{uuid.uuid4().hex}.inprogress"
            rows = 0
            with open(os.path.join(self._dir, tmp), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(
                        dict(zip(self._fields, row)), default=str,
                        sort_keys=True))
                    fh.write("\n")
                    rows += 1
                fh.flush()
                os.fsync(fh.fileno())
            return _ShardCommit(tmp, final, rows)

        def commit(self, messages):
            if self._overwrite:
                for f in os.listdir(self._dir):
                    if f.endswith(".jsonl") or f == MANIFEST:
                        os.remove(os.path.join(self._dir, f))
            shards = []
            for m in messages:
                os.replace(os.path.join(self._dir, m.tmp_name),
                           os.path.join(self._dir, m.final_name))
                shards.append({"shard": m.final_name, "rows": m.rows})
            with open(os.path.join(self._dir, MANIFEST), "w") as fh:
                json.dump({"shards": shards,
                           "total_rows": sum(s["rows"] for s in shards)},
                          fh)

        def abort(self, messages):
            for m in messages:
                try:
                    os.remove(os.path.join(self._dir, m.tmp_name))
                except FileNotFoundError:
                    pass

    from pyspark.sql.datasource import DataSourceStreamWriter

    class JsonlStreamWriter(DataSourceStreamWriter):
        """Streaming flavor (DataSourceStreamWriter): every micro-batch
        runs the same two-phase protocol — tasks write uuid temp files,
        the driver's commit(messages, batchId) renames them to
        ``part-b<batch>-<pid>.jsonl`` and APPENDS a line to the
        ``_COMMITS`` batch log. Exactly-once on replay: a batchId
        already present in the log is a committed no-op (its temps are
        swept, nothing renamed twice) — the jsonl analogue of the
        foreachBatch upsert's idempotence contract
        (streaming/ingest.py:stream_upsert_foreach_batch)."""

        def __init__(self, options, schema):
            self._dir = options.get("path")
            if not self._dir:
                raise ValueError("jsonl_stream sink requires a path")
            self._fields = schema.fieldNames()

        def write(self, iterator):
            import uuid

            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            os.makedirs(self._dir, exist_ok=True)
            tmp = f".epoch-{pid:05d}.{uuid.uuid4().hex}.inprogress"
            rows = 0
            with open(os.path.join(self._dir, tmp), "w") as fh:
                for row in iterator:
                    fh.write(json.dumps(
                        dict(zip(self._fields, row)), default=str,
                        sort_keys=True))
                    fh.write("\n")
                    rows += 1
                fh.flush()
                os.fsync(fh.fileno())
            return _ShardCommit(tmp, f"{pid:05d}", rows)

        def _committed(self) -> set[int]:
            log = os.path.join(self._dir, COMMIT_LOG)
            if not os.path.exists(log):
                return set()
            with open(log) as fh:
                return {json.loads(line)["batch_id"] for line in fh
                        if line.strip()}

        def commit(self, messages, batchId):
            os.makedirs(self._dir, exist_ok=True)
            if batchId in self._committed():
                self.abort(messages, batchId)  # replayed batch: sweep
                return
            shards = []
            for m in messages:
                final = f"part-b{batchId:05d}-{m.final_name}.jsonl"
                os.replace(os.path.join(self._dir, m.tmp_name),
                           os.path.join(self._dir, final))
                shards.append({"shard": final, "rows": m.rows})
            with open(os.path.join(self._dir, COMMIT_LOG), "a") as fh:
                fh.write(json.dumps({"batch_id": batchId,
                                     "shards": shards}))
                fh.write("\n")
                fh.flush()
                os.fsync(fh.fileno())

        def abort(self, messages, batchId):
            for m in messages:
                try:
                    os.remove(os.path.join(self._dir, m.tmp_name))
                except FileNotFoundError:
                    pass

    class JsonlSinkDataSource(DataSource):
        """df.write.format("jsonl_shards").save(dir) — module docstring."""

        @classmethod
        def name(cls):
            return "jsonl_shards"

        def writer(self, schema, overwrite: bool):
            return JsonlWriter(self.options, schema, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return JsonlStreamWriter(self.options, schema)

    return JsonlSinkDataSource


def register_jsonl_sink(spark) -> bool:
    """Register the sink; False when the Python DataSource API is
    unavailable (graceful degradation, same policy as sources/warc.py)."""
    try:
        ds = _lazy_datasource()
    except ImportError:
        return False
    spark.dataSource.register(ds)
    return True
