"""Structured-Streaming ingest for the pages table.

The reference is pure batch (SURVEY.md §2.7 — no streaming semantics to
re-create; the north rule keeps the engine batch-only). This module exists
for the operational path a crawl pipeline needs anyway: continuously landing
new WARC-extracted page files into the engine's input table, exactly-once,
without touching `text` bytes (the byte-identity invariant applies at
ingest too).

No watermarks / session windows — nothing in the reference maps to them,
so they are deliberately not built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_pages_ingest(spark: SparkSession, source_dir: str, out_dir: str,
                        checkpoint_dir: str, available_now: bool = True):
    """readStream a directory of page parquet drops → append to the pages
    table. `text` passes through untouched; only a dedupe-within-batch on
    url is applied (exactly-once per file via the checkpoint log).

    available_now=True drains what exists and stops (batch-like testing);
    False leaves a continuous micro-batch stream running."""
    src: DataFrame = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(source_dir)
    )
    deduped = src.dropDuplicates(["url"])
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_parquet_passthrough(spark: SparkSession, path: str, schema,
                               query_name: str, transform=None) -> DataFrame:
    """readStream a parquet path → optional stateless DataFrame transform →
    availableNow micro-batch drain → memory sink; returns the drained table
    as a DataFrame. The batch-equivalence harness for the streaming
    boundary: the driver's oracle compares it against the same logic as a
    plain batch SELECT, proving the stream neither drops, duplicates, nor
    mutates rows — and, with `transform`, that the engine's stateless
    operators (quality scoring, PII redaction, language id, …) run
    UNCHANGED on a stream: same logical plan, micro-batched."""
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    spark.catalog.dropTempView(query_name)
    import os

    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # file-stream sources list a directory; a single-file input becomes
        # dir + pathGlobFilter (same trick works for s3://bucket/file keys)
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    src: DataFrame = reader.parquet(path)
    if transform is not None:
        src = transform(src)
    q = (
        src.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
