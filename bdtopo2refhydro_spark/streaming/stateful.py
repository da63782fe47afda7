"""Custom stateful / windowed streaming operators.

The reference is pure batch, so nothing here re-creates reference
semantics; these are the streaming operators a continuously-landing crawl
pipeline needs (SURVEY.md §2.7 scope note):

- ``stream_dedup_stateful`` — cross-micro-batch exact dedup on a key via
  ``applyInPandasWithState``: the first row ever seen for a key is
  emitted, every later arrival (same batch or any later batch) is
  dropped. State per key is one boolean; at 10^12 keys the state store is
  partitioned by the groupBy key across executors, so state never
  concentrates anywhere.
- ``stream_windowed_counts`` — event-time tumbling-window counts with a
  watermark for late data (the standard readStream → window agg shape).

Both are drained with ``trigger(availableNow=True)`` into a memory sink
for deterministic testing — the driver oracle replays them as plain SQL
over the same parquet, proving stream/batch equivalence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _stream_reader(spark: SparkSession, path: str, schema,
                   files_per_trigger: int | None = None):
    reader = spark.readStream.schema(schema)
    if files_per_trigger is not None:
        # forces multi-micro-batch processing under availableNow — the
        # cross-batch state path is what distinguishes these operators
        # from a within-batch dropDuplicates
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    if os.path.isfile(path):
        # file-stream sources list a directory (streaming/ingest.py)
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def _drain_to_memory(stream_df: DataFrame, query_name: str,
                     output_mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    spark.catalog.dropTempView(query_name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_dedup_stateful(spark: SparkSession, path: str, key: str,
                          query_name: str = "stream_dedup",
                          files_per_trigger: int | None = None) -> DataFrame:
    """Exactly-once-per-key emission across micro-batches.

    applyInPandasWithState contract: one state cell per key holding
    ``seen``; the first micro-batch that delivers a key emits that key's
    representative row (lexicographic min over ``sorted(columns)`` WITHIN
    that batch — an EXPLICIT name-sorted order, not parquet schema order,
    so the oracle SQL's ORDER BY list is identical by construction and a
    schema reorder cannot silently break parity [ADVICE r2]; the survivor
    is deterministic given the batch split, and globally deterministic
    when the key arrives in one batch, which is what the driver oracle
    replays) and flips the state; every later batch's rows for that key
    are consumed and dropped."""
    import pandas as pd

    schema = spark.read.parquet(path).schema
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in schema.fields)
    src = _stream_reader(spark, path, schema, files_per_trigger)

    def _dedup(key_tuple, pdf_iter, state: GroupState):
        batches = list(pdf_iter)
        if state.exists:
            return iter(())
        state.update((True,))
        all_rows = pd.concat(batches, ignore_index=True)
        first = all_rows.sort_values(sorted(all_rows.columns)) \
                        .head(1).reset_index(drop=True)
        return iter((first,))

    out = src.groupBy(key).applyInPandasWithState(
        _dedup,
        outputStructType=out_ddl,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain_to_memory(out, query_name, "append")


def stream_windowed_counts(spark: SparkSession, path: str,
                           time_col: str, group_col: str,
                           query_name: str = "stream_windows",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts per group with a late-data
    watermark. Complete output mode so an availableNow drain emits every
    window (append mode would hold back windows newer than the final
    watermark)."""
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema)
    # event-time columns must be TIMESTAMP (with local tz) — parquet NTZ
    # timestamps are re-cast in the session timezone (UTC in this engine's
    # session factory, so wall values are unchanged)
    src = src.withColumn(time_col, F.col(time_col).cast("timestamp"))
    agg = (
        src.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), group_col)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), group_col, "n")
    )
    return _drain_to_memory(agg, query_name, "complete")


def stream_interval_join(spark: SparkSession, path: str, *,
                         time_col: str = "ts", key_col: str = "user_id",
                         id_col: str = "event_id",
                         type_col: str = "event_type",
                         left_type: str = "click", right_type: str = "view",
                         within: str = "10 minutes",
                         watermark: str = "30 minutes",
                         how: str = "inner",
                         query_name: str = "stream_join",
                         files_per_trigger: int | None = None) -> DataFrame:
    """Stream-stream event-time INTERVAL join: every ``left_type`` event
    pairs with the same key's ``right_type`` events whose timestamp lands
    in ``[l.ts, l.ts + within]`` (both bounds inclusive).

    This is Spark's stateful stream-stream join: both sides buffer in the
    state store (partitioned by the join key across executors — at crawl
    scale neither side's state concentrates anywhere), watermarks bound
    how long a buffered row waits for a late partner, and the time-range
    predicate lets Spark evict state as the watermark passes
    ``l.ts + within``. Inner joins emit eagerly on match, so an
    availableNow drain in append mode is deterministic and equals the
    batch interval join — PROVIDED no needed row arrives later than the
    watermark allows; the cross-batch pytest pins both the match-across-
    micro-batches path and the watermark-eviction path.

    Emits (left_id, right_id, key, delta_us) with integer-microsecond
    deltas (bit-exact vs the DuckDB oracle's epoch_us arithmetic).

    ``how='left_outer'``: a left row with no partner emits NULL-padded
    only once the watermark has passed its whole join window (the join
    must be certain no partner can still arrive) — so unmatched rows
    near the stream's end stay withheld under an availableNow drain,
    and the null-emission path needs the same 3-batch structure as
    eviction to observe (pytest-pinned)."""
    schema = spark.read.parquet(path).schema
    left = (
        _stream_reader(spark, path, schema, files_per_trigger)
        .filter(F.col(type_col) == left_type)
        .select(F.col(id_col).alias("left_id"),
                F.col(key_col).alias("key"),
                F.col(time_col).cast("timestamp").alias("l_ts"))
        .withWatermark("l_ts", watermark)
    )
    right = (
        _stream_reader(spark, path, schema, files_per_trigger)
        .filter(F.col(type_col) == right_type)
        .select(F.col(id_col).alias("right_id"),
                F.col(key_col).alias("r_key"),
                F.col(time_col).cast("timestamp").alias("r_ts"))
        .withWatermark("r_ts", watermark)
    )
    joined = left.join(
        right,
        F.expr(f"key = r_key AND r_ts >= l_ts "
               f"AND r_ts <= l_ts + INTERVAL {within}"),
        how,
    )
    if how == "left_semi":
        # semi-join output carries ONLY left columns; each matched left
        # row emits exactly once (eagerly, like inner), unmatched rows
        # never emit — so an availableNow drain equals the batch
        # EXISTS-semantics semi join.
        joined = joined.select(
            "left_id", F.col("key"), F.unix_micros("l_ts").alias("l_us"))
    else:
        joined = joined.select(
            "left_id", "right_id", F.col("key"),
            (F.unix_micros("r_ts") - F.unix_micros("l_ts"))
            .alias("delta_us"),
        )
    return _drain_to_memory(joined, query_name, "append")


def stream_session_windows(spark: SparkSession, path: str,
                           time_col: str, group_col: str,
                           gap: str = "30 minutes",
                           query_name: str = "stream_sessions",
                           files_per_trigger: int | None = None) -> DataFrame:
    """Event-time SESSION windows per group on a stream — Spark's native
    session_window aggregation, the streaming twin of the batch
    sessionize operator. Sessions merge across micro-batches in the state
    store (keyed by group → partitioned across executors, same state
    story as stream_dedup_stateful); a session extends while consecutive
    events arrive < gap apart and closes at last_event + gap. Complete
    output mode: session-window aggregations support neither update nor
    append-without-final-watermark emission under an availableNow drain
    (probed on Spark 4), and complete re-emits the merged final sessions,
    which is exactly what the batch-equivalence oracle replays. Emits
    (group, start_us, end_us, n_events) as integer microseconds."""
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    src = src.withColumn(time_col, F.col(time_col).cast("timestamp"))
    agg = (
        src.groupBy(F.session_window(F.col(time_col), gap),
                    F.col(group_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            group_col,
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
            "n_events",
        )
    )
    return _drain_to_memory(agg, query_name, "complete")


def stream_dedup_within_watermark(spark: SparkSession, path: str,
                                  keys: list, time_col: str,
                                  delay: str = "1 hour",
                                  query_name: str = "stream_dedup_wm",
                                  files_per_trigger: int | None = None
                                  ) -> DataFrame:
    """Native watermark-bounded streaming dedup: Spark's
    dropDuplicatesWithinWatermark keeps one row per key while the key's
    event time is inside the watermark window, then FREES the key's
    state — the production-shaped dedup for unbounded streams, where
    the applyInPandasWithState variant (stream_dedup_stateful) keeps a
    boolean per key forever. State is partitioned by the dedup key
    across executors; at 100 TB/day the watermark bound is what keeps
    the state store finite.

    Emits only the key columns (every suppressed duplicate carries the
    same key tuple, so the drained result is exactly the DISTINCT key
    set regardless of intra-batch arrival order — which is what makes
    an exact value oracle possible for a first-wins operator)."""
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    deduped = (
        src.withColumn(time_col, F.col(time_col).cast("timestamp"))
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )
    return _drain_to_memory(deduped, query_name, "append")


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf python package for
    its driver<->worker state protocol (probed: absent here → the
    streaming runner crashes with ImportError). Same degradation policy
    as the Iceberg path in sources/io.py: feature-gate, skip-marked
    tests, full implementation below for environments that have it."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def stream_running_counts_tws(spark: SparkSession, path: str,
                              key_col: str,
                              query_name: str = "tws_counts",
                              files_per_trigger: int | None = None
                              ) -> DataFrame:
    """Per-key running event counts via transformWithStateInPandas —
    Spark 4's arbitrary-stateful API (typed value state in RocksDB,
    timers, TTL) and the successor to applyInPandasWithState. Emits one
    (key, n) update per key per micro-batch with n = cumulative count;
    state is partitioned by the groupBy key across executors and lives
    in the RocksDB state store (changelog-checkpointed — the 100-TB
    state story: working set on local disk, bounded memory).

    Raises RuntimeError when the protobuf dependency is missing (see
    tws_available)."""
    if not tws_available():
        raise RuntimeError("transformWithStateInPandas needs protobuf")
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class _Count(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._cnt = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())]))

        def handleInputRows(self, key, rows, timer_values):
            total = sum(len(pdf) for pdf in rows)
            prev = self._cnt.get()
            cur = (prev[0] if prev else 0) + total
            self._cnt.update((cur,))
            yield pd.DataFrame({"key": [key[0]], "n": [cur]})

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    out = src.groupBy(F.col(key_col)).transformWithStateInPandas(
        _Count(), outputStructType="key long, n long",
        outputMode="Update", timeMode="None")
    return _drain_to_memory(out, query_name, "update")


def stream_dedup_then_window(spark: SparkSession, path: str, *,
                             key_col: str = "user_id",
                             time_col: str = "ts",
                             delay: str = "2 hours",
                             window: str = "1 hour",
                             query_name: str = "stream_chain",
                             files_per_trigger: int | None = None
                             ) -> DataFrame:
    """CHAINED stateful streaming operators in one query (Spark 4):
    dropDuplicatesWithinWatermark → event-time windowed aggregation —
    two state stores in a single micro-batch pipeline (dedup state
    keyed on (key, minute), window state on (window, key)), the shape
    a real ingest topology has (dedup at the door, rollup behind it).

    Determinism for the exact oracle: the dedup key includes the
    MINUTE-quantized event time, so every duplicate of a key carries an
    identical event time — whichever arrival wins, the surviving row's
    window assignment is the same. Complete output mode (the probed
    availableNow-drainable mode for this chain; append holds back
    windows newer than the final watermark)."""
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    tsm = F.date_trunc("minute", F.col(time_col).cast("timestamp"))
    deduped = (src.withColumn("tsm", tsm)
               .withWatermark("tsm", delay)
               .dropDuplicatesWithinWatermark([key_col, "tsm"]))
    agg = (deduped.groupBy(F.window("tsm", window).alias("w"), key_col)
           .agg(F.count("*").alias("n"))
           .select(F.col("w.start").cast("string").alias("w_start"),
                   key_col, F.col("n").cast("long").alias("n")))
    return _drain_to_memory(agg, query_name, "complete")


def dedup_state_snapshot(spark: SparkSession, path: str,
                         keys: list[str], schema) -> DataFrame:
    """Run a streaming dropDuplicates over ``path`` to a FRESH
    checkpoint, then read the operator's state store back through the
    Spark 4 ``statestore`` DataSource — the observability surface for
    stateful pipelines (state-size audits, dedup-key forensics,
    offline state repair all start from this read).

    Returns one row per state key (exactly the distinct key set of the
    input — which is what makes the surface value-oracle-checkable).
    The checkpoint lives under a mkdtemp dir: the read is of a REAL
    committed HDFSStateStore layout, not a mock, and a rerun never
    reuses stale state.
    """
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="state_src_")
    src = _stream_reader(spark, path, schema)
    q = (src.select(*keys).dropDuplicates(keys)
         .writeStream.format("noop")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(*[F.col(f"key.{k}").alias(k) for k in keys])


def stream_source_fingerprint(spark: SparkSession, path: str, *,
                              group_col: str = "source",
                              id_col: str = "doc_id",
                              files_per_trigger: int | None = None,
                              query_name: str = "stream_fp"
                              ) -> DataFrame:
    """Order-free integrity fingerprint per group over a STREAM: the
    running state is commutative AND associative — count, bit_xor of
    a Knuth multiplicative mix, and a bounded modular sum — so ANY
    micro-batch decomposition converges to the same final table and
    the streamed result equals the batch GROUP BY bit-for-bit (the
    oracle asserts exactly that). Complete output mode; the classic
    cheap way to certify an ingest pipeline dropped or duplicated
    nothing, per source."""
    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    mix = (F.col(id_col) * F.lit(2654435761)) % F.lit(1 << 61)
    agg = (src.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.expr(f"bit_xor(({id_col} * 2654435761) % "
                       f"{1 << 61})").alias("xmix"),
                F.sum(mix % F.lit(1000003)).alias("smix")))
    return _drain_to_memory(agg, query_name, "complete")


def stream_token_bucket(spark: SparkSession, path: str, *,
                        key: str = "host", ts_us: str = "t",
                        eid: str = "event_id", cap: int = 3,
                        refill_us: int = 5_000_000,
                        files_per_trigger: int | None = None,
                        select_exprs: list | None = None,
                        query_name: str = "stream_bucket") -> DataFrame:
    """Token-bucket rate limiting as CROSS-BATCH stateful streaming:
    the per-key state cell carries (tokens, last_t) between
    micro-batches, each batch's rows are replayed in (t, event_id)
    order inside the UDF, and the recurrence is the same clamped
    integer refill as temporal.token_bucket — so when micro-batches
    respect event-time order per key (one file, or time-sorted file
    splits), the streamed decisions equal the batch operator's
    bit-for-bit, which is what the oracle and the cross-batch pytest
    assert. Returns (key, event_id, accepted)."""
    import pandas as pd

    schema = spark.read.parquet(path).schema
    src = _stream_reader(spark, path, schema, files_per_trigger)
    if select_exprs:
        src = src.selectExpr(*select_exprs)

    def _bucket(key_tuple, pdf_iter, state: GroupState):
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values([ts_us, eid])
        if state.exists:
            tok, prev = state.get
        else:
            tok, prev = cap, None
        out = []
        for tt, ee in zip(rows[ts_us], rows[eid]):
            if prev is not None:
                tok = min(cap, tok + (int(tt) - prev) // refill_us)
            prev = int(tt)
            acc = tok >= 1
            if acc:
                tok -= 1
            out.append((key_tuple[0], ee, acc))
        state.update((int(tok), int(prev)))
        return iter((pd.DataFrame(
            out, columns=[key, eid, "accepted"]),))

    out = src.groupBy(key).applyInPandasWithState(
        _bucket,
        outputStructType=f"{key} long, {eid} long, accepted boolean",
        stateStructType="tok long, prev long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain_to_memory(out, query_name, "append")
