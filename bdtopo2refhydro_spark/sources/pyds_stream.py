"""Custom streaming source (Spark 4 Python DataSource streaming API).

Completes the Python DataSource family: batch READER (warc.py), batch
WRITER (io.py:jsonl_shards), and — here — a STREAMING reader built on
``SimpleDataSourceStreamReader``. The source emits a deterministic
integer sequence in fixed-size micro-batches, which is exactly the
contract a replayable ingest feed (a queue offset range, a ledger, a
change stream) exposes:

    spark.dataSource.register(SeqStreamDataSource)
    df = (spark.readStream.format("seqstream")
          .option("n_total", 120).option("batch_size", 50).load())

Schema: (seq_id bigint, val bigint) with val = (seq_id * 2654435761)
% 1000003 — a fixed multiplicative hash, so any drained prefix is
bit-replayable in SQL (the driver oracle generates the same rows with
``range``).

Offset/replay contract (the part that matters for exactly-once):
``initialOffset`` pins {"pos": 0}; ``read(start)`` returns rows
[start.pos, min(start.pos + batch_size, n_total)) and the advanced
offset; ``readBetweenOffsets(start, end)`` regenerates exactly that
slice on recovery — deterministic by construction, so a replayed
micro-batch is byte-identical. The reader runs on the DRIVER by design
(SimpleDataSourceStreamReader's contract — right for low-volume control
feeds; a partitioned ``DataSourceStreamReader`` is the high-volume
path, same offset algebra).
"""

from __future__ import annotations

SEQ_MULT = 2654435761
SEQ_MOD = 1000003


def _row(i: int) -> tuple[int, int]:
    return (i, (i * SEQ_MULT) % SEQ_MOD)


try:
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _SeqReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n_total = int(options.get("n_total", 120))
            self.batch = int(options.get("batch_size", 50))

        def initialOffset(self) -> dict:
            return {"pos": 0}

        def read(self, start: dict):
            pos = int(start["pos"])
            end = min(pos + self.batch, self.n_total)
            rows = iter([_row(i) for i in range(pos, end)])
            return rows, {"pos": end}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter([_row(i)
                         for i in range(int(start["pos"]),
                                        int(end["pos"]))])

    class SeqStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "seqstream"

        def schema(self) -> str:
            return "seq_id bigint, val bigint"

        def simpleStreamReader(self, schema):
            return _SeqReader(self.options)

    PYDS_STREAM_AVAILABLE = True
except ImportError:  # pragma: no cover - pyspark<4 fallback
    SeqStreamDataSource = None
    PYDS_STREAM_AVAILABLE = False


def drain_seq_stream(spark, *, n_total: int = 120, batch_size: int = 50,
                     query_name: str = "pyseq_sink"):
    """Register the source, drain it fully into a memory sink, and
    return the drained table — the batch-equivalence harness shape of
    streaming/ingest.py:stream_parquet_passthrough. Python streaming
    sources do NOT support Trigger.AvailableNow (Spark falls back to
    ONE micro-batch, silently truncating the drain to the first read —
    pinned by test), so the drain uses a continuous trigger +
    processAllAvailable(), which blocks until the prefetched offset
    stops advancing (read() at pos == n_total returns an unchanged
    offset), then stops the query. With batch_size < n_total the drain
    takes multiple micro-batches, exercising the offset advance."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    spark.catalog.dropTempView(query_name)
    spark.dataSource.register(SeqStreamDataSource)
    df = (
        spark.readStream.format("seqstream")
        .option("n_total", n_total).option("batch_size", batch_size)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
