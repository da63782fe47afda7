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


def stream_upsert_foreach_batch(spark: SparkSession, source_path: str,
                                target_dir: str, checkpoint_dir: str,
                                key: str = "url",
                                order_col: str | None = None,
                                files_per_trigger: int | None = None):
    """Streaming UPSERT sink via foreachBatch: each micro-batch is
    deduplicated per key (keep the order_col-max row, ties to the
    incoming row) and merged copy-on-write into a keyed parquet target —
    the hand-rolled analog of `MERGE INTO` against a table format, for
    plain parquet directories.

    Exactly-once: Spark's checkpoint replays a failed batch with the
    SAME batch_id, and `_apply` is IDEMPOTENT per batch_id — a marker
    file under <target>/_applied/ records completion, so a replayed
    batch that already committed becomes a no-op (the classic
    foreachBatch contract; pytest drives _apply twice directly).

    Scale notes: copy-on-write rewrites the whole target per batch —
    right for small/medium dimension tables kept fresh off a stream; a
    fact-scale target wants the Iceberg MERGE path (sources/io.py) with
    file-level pruning instead. The anti-join is keyed, never a scan of
    incoming x target."""
    import os
    import shutil

    schema = spark.read.parquet(source_path).schema
    applied_dir = os.path.join(target_dir, "_applied")
    os.makedirs(applied_dir, exist_ok=True)
    data_dir = os.path.join(target_dir, "data")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(applied_dir, str(batch_id))
        if os.path.exists(marker):
            return  # replayed batch, already committed
        tmp = data_dir + f"._tmp_{batch_id}"
        old = data_dir + f"._old_{batch_id}"
        if not os.path.exists(data_dir):
            # crash-recovery: a previous attempt died mid-swap. If the
            # fully-merged tmp exists, it IS the committed state — rename
            # it in and finish the commit; else restore the pre-batch
            # data set aside under `old` and merge normally.
            if os.path.exists(os.path.join(tmp, "_SUCCESS")):
                os.rename(tmp, data_dir)
                if os.path.exists(old):
                    shutil.rmtree(old)
                open(marker, "w").close()
                return
            if os.path.exists(old):
                os.rename(old, data_dir)
        from pyspark.sql import Window

        order = F.col(order_col).desc() if order_col else F.lit(1).asc()
        w = Window.partitionBy(key).orderBy(order)
        incoming = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
        sess = batch_df.sparkSession
        if os.path.exists(data_dir):
            current = sess.read.parquet(data_dir)
            keep = current.join(incoming.select(key), key, "left_anti")
            merged = keep.unionByName(incoming)
        else:
            merged = incoming
        # crash-safe swap: set the current data aside with an atomic
        # rename (never rmtree the only copy), rename the merged result
        # in, and delete the old copy LAST — at every instant either the
        # old or the new data is reachable (data_dir present, or tmp
        # holding the full merged result for the recovery path above).
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(data_dir):
            os.rename(data_dir, old)
        os.rename(tmp, data_dir)
        if os.path.exists(old):
            shutil.rmtree(old)
        open(marker, "w").close()  # commit AFTER the swap

    src = spark.readStream.schema(schema)
    if files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", files_per_trigger)
    if os.path.isfile(source_path):
        src = src.option("pathGlobFilter", os.path.basename(source_path))
        source_path = os.path.dirname(source_path)
    q = (
        src.parquet(source_path)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _apply  # exposed so tests can drive batch replay directly


def stream_to_jsonl_sink(spark: SparkSession, path: str, schema,
                         out_dir: str, checkpoint_dir: str,
                         select_cols: list[str] | None = None) -> None:
    """readStream a parquet path → the custom python jsonl_shards sink
    (sources/jsonl_sink.py JsonlStreamWriter) with an availableNow
    drain. The sink's per-batch two-phase commit (+ _COMMITS batch log)
    makes replays exactly-once; the JVM file source supports
    availableNow, so the drain is complete (the python-SOURCE
    availableNow caveat does not apply to sinks)."""
    import os

    from bdtopo2refhydro_spark.sources.jsonl_sink import register_jsonl_sink

    if not register_jsonl_sink(spark):
        raise RuntimeError("python DataSource API unavailable")
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    src: DataFrame = reader.parquet(path)
    if select_cols:
        src = src.select(*select_cols)
    q = (src.writeStream.format("jsonl_shards")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
