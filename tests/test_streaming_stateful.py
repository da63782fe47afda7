"""Stateful / windowed streaming operators (streaming/stateful.py)."""

import time

import pytest
from pyspark.sql import functions as F

from bdtopo2refhydro_spark.streaming import (
    stream_dedup_stateful,
    stream_windowed_counts,
)


def test_stateful_dedup_across_micro_batches(spark, tmp_path):
    """The point of applyInPandasWithState: a key seen in an EARLIER
    micro-batch is dropped in every later one — cross-batch state, which
    a within-batch dropDuplicates cannot do. maxFilesPerTrigger=1 forces
    one micro-batch per file; file mtimes order the batches."""
    d = str(tmp_path / "drops")
    spark.createDataFrame([("a", 1), ("c", 30)], "k string, v int") \
        .coalesce(1).write.parquet(d + "/f1")
    time.sleep(1.1)  # file-source ordering is mtime-based
    spark.createDataFrame([("a", 99), ("b", 2)], "k string, v int") \
        .coalesce(1).write.parquet(d + "/f2")
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    import os

    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(d + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (time.time() + i, time.time() + i))
    out = stream_dedup_stateful(spark, flat, key="k",
                                query_name="t_dedup_x",
                                files_per_trigger=1)
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {"a": 1, "c": 30, "b": 2}  # a=99 (2nd batch) dropped


def test_windowed_counts_match_batch_groupby(spark, tmp_path):
    p = str(tmp_path / "events")
    spark.createDataFrame(
        [("2024-01-01 10:05:00", "x"), ("2024-01-01 10:55:00", "x"),
         ("2024-01-01 11:05:00", "x"), ("2024-01-01 10:30:00", "y")],
        "ts_s string, event_type string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type") \
     .coalesce(1).write.parquet(p)
    out = stream_windowed_counts(spark, p, time_col="ts",
                                 group_col="event_type",
                                 query_name="t_win_x")
    got = {(str(r.w_start), r.event_type): r.n for r in out.collect()}
    assert got == {
        ("2024-01-01 10:00:00", "x"): 2,
        ("2024-01-01 11:00:00", "x"): 1,
        ("2024-01-01 10:00:00", "y"): 1,
    }


def test_session_windows_merge_across_micro_batches(spark, tmp_path):
    """A user's session split across two micro-batches must merge in the
    session-window state store: events at 10:00/10:10 (batch 1) and
    10:25 (batch 2) are < 30 min apart pairwise → ONE session; the
    11:30 event opens a second. Also cross-checked against the
    single-batch drain of the same rows."""
    import os
    import time as _t

    from bdtopo2refhydro_spark.streaming import stream_session_windows

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    b1 = [("2024-01-01 10:00:00", 1), ("2024-01-01 10:10:00", 1),
          ("2024-01-01 09:00:00", 2)]
    b2 = [("2024-01-01 10:25:00", 1), ("2024-01-01 11:30:00", 1)]
    for i, rows in enumerate([b1, b2]):
        df = spark.createDataFrame(rows, "ts_s string, user_id long") \
            .select(F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
        sub = str(tmp_path / f"b{i}")
        df.coalesce(1).write.parquet(sub)
        import glob
        import shutil
        src = glob.glob(sub + "/part-*.parquet")[0]
        shutil.copy(src, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (_t.time() + i, _t.time() + i))

    out = stream_session_windows(spark, flat, time_col="ts",
                                 group_col="user_id", gap="30 minutes",
                                 query_name="t_sess_multi",
                                 files_per_trigger=1)
    got = {(r.user_id, r.start_us, r.end_us, r.n_events)
           for r in out.collect()}

    single = stream_session_windows(spark, flat, time_col="ts",
                                    group_col="user_id", gap="30 minutes",
                                    query_name="t_sess_single")
    assert got == {(r.user_id, r.start_us, r.end_us, r.n_events)
                   for r in single.collect()}

    us = lambda s: int(  # noqa: E731
        __import__("datetime").datetime.fromisoformat(s + "+00:00")
        .timestamp() * 1_000_000)
    gap = 30 * 60 * 1_000_000
    assert got == {
        (1, us("2024-01-01 10:00:00"), us("2024-01-01 10:25:00") + gap, 3),
        (1, us("2024-01-01 11:30:00"), us("2024-01-01 11:30:00") + gap, 1),
        (2, us("2024-01-01 09:00:00"), us("2024-01-01 09:00:00") + gap, 1),
    }


def _write_ordered_batches(tmp_path, batches, schema, ts_cols=("ts",)):
    """Write each batch as one parquet file with increasing mtime so the
    file stream source replays them as separate ordered micro-batches."""
    import glob
    import os
    import shutil
    import time as _t

    flat = str(tmp_path / "flat")
    os.makedirs(flat, exist_ok=True)
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        for c in ts_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        sub = str(tmp_path / f"ij_b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        src = glob.glob(sub + "/part-*.parquet")[0]
        shutil.copy(src, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (_t.time() + i, _t.time() + i))
    return flat


def test_interval_join_matches_across_micro_batches(spark, tmp_path):
    """Left rows buffered in batch 1 must still match right rows that only
    arrive in batch 2 — the state-store path a within-batch join lacks."""
    from bdtopo2refhydro_spark.streaming import stream_interval_join

    schema = "event_id long, ts string, user_id long, event_type string"
    b1 = [(0, "2024-01-01 10:00:00", 1, "click"),
          (1, "2024-01-01 10:03:00", 1, "view"),     # same-batch match
          (2, "2024-01-01 10:00:00", 2, "click")]
    b2 = [(3, "2024-01-01 10:08:00", 1, "view"),     # cross-batch match
          (4, "2024-01-01 10:09:00", 2, "view"),     # cross-batch match
          (5, "2024-01-01 10:20:00", 1, "view")]     # outside 10-min window
    flat = _write_ordered_batches(tmp_path, [b1, b2], schema)
    out = stream_interval_join(spark, flat, within="10 minutes",
                               watermark="2 hours",
                               query_name="t_ij_multi",
                               files_per_trigger=1)
    got = {(r.left_id, r.right_id, r.key, r.delta_us) for r in out.collect()}
    m = 60 * 1_000_000
    assert got == {(0, 1, 1, 3 * m), (0, 3, 1, 8 * m), (2, 4, 2, 9 * m)}


def test_interval_join_watermark_evicts_stale_state(spark, tmp_path):
    """A left row older than (watermark - within) is evicted from the
    state store once the event-time watermark advances past its join
    window; a right partner arriving in a later batch then finds nothing.
    This is the bounded-state guarantee that makes the join runnable on
    an unbounded crawl stream."""
    from bdtopo2refhydro_spark.streaming import stream_interval_join

    schema = "event_id long, ts string, user_id long, event_type string"
    # Two subtleties pinned here (both probed on Spark 4):
    # - the global watermark is the MIN over both inputs', so batch 1
    #   must advance BOTH sides (a side with no data yet pins the global
    #   watermark at epoch and nothing ever evicts);
    # - join-state cleanup runs at the END of a batch with that batch's
    #   watermark, which derives from the PREVIOUS batch's data — so a
    #   stale row survives one extra batch, and observing eviction takes
    #   three: seed watermark (b1), cleanup fires (end of b2), late
    #   partner misses (b3).
    b1 = [(0, "2024-01-01 10:00:00", 1, "click"),
          (1, "2024-01-01 15:00:00", 9, "click"),
          (2, "2024-01-01 15:00:00", 9, "view")]     # advances right side
    b2 = [(3, "2024-01-01 15:01:00", 9, "view")]
    # b2 ran with watermark 15:00-10min = 14:50; its end-of-batch cleanup
    # evicted click 0 (window [10:00,10:10] ≪ 14:50)
    b3 = [(4, "2024-01-01 10:05:00", 1, "view"),     # partner came too late
          (5, "2024-01-01 15:04:00", 9, "view")]     # fresh pair still joins
    flat = _write_ordered_batches(tmp_path, [b1, b2, b3], schema)
    out = stream_interval_join(spark, flat, within="10 minutes",
                               watermark="10 minutes",
                               query_name="t_ij_evict",
                               files_per_trigger=1)
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert {(1, 2), (1, 3), (1, 5)} <= got
    assert (0, 4) not in got


def test_interval_join_left_outer_emits_nulls_after_watermark(spark,
                                                              tmp_path):
    """An unmatched left row null-pads only once the watermark clears its
    join window — same 3-batch structure as state eviction (the outer
    result is literally produced by the eviction pass)."""
    from bdtopo2refhydro_spark.streaming import stream_interval_join

    schema = "event_id long, ts string, user_id long, event_type string"
    b1 = [(0, "2024-01-01 10:00:00", 1, "click"),    # never matched
          (1, "2024-01-01 15:00:00", 9, "click"),
          (2, "2024-01-01 15:00:00", 9, "view")]
    b2 = [(3, "2024-01-01 15:01:00", 9, "view")]
    b3 = [(4, "2024-01-01 15:04:00", 9, "view")]
    flat = _write_ordered_batches(tmp_path, [b1, b2, b3], schema)
    out = stream_interval_join(spark, flat, within="10 minutes",
                               watermark="10 minutes", how="left_outer",
                               query_name="t_ij_outer",
                               files_per_trigger=1)
    got = {(r.left_id, r.right_id) for r in out.collect()}
    assert (0, None) in got          # null-padded after watermark passed
    assert {(1, 2), (1, 3), (1, 4)} <= got


def test_dedup_within_watermark_cross_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a key repeated in a LATER
    micro-batch (inside the watermark delay) is suppressed by the keyed
    state store; output is exactly the distinct key set."""
    import glob
    import os
    import shutil

    from bdtopo2refhydro_spark.streaming.stateful import (
        stream_dedup_within_watermark,
    )

    d = str(tmp_path / "drops")
    spark.createDataFrame(
        [("2024-01-01 10:00:00", "a", "click"),
         ("2024-01-01 10:00:10", "a", "view")],
        "ts_s string, user_id string, event_type string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type").coalesce(1).write.parquet(d + "/f1")
    time.sleep(1.1)
    spark.createDataFrame(
        [("2024-01-01 10:00:20", "a", "click"),   # dup within watermark
         ("2024-01-01 10:00:30", "b", "click")],
        "ts_s string, user_id string, event_type string",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type").coalesce(1).write.parquet(d + "/f2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(d + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (now + i, now + i))
    out = stream_dedup_within_watermark(
        spark, flat, ["user_id", "event_type"], "ts",
        query_name="t_dedup_wm_x", files_per_trigger=1)
    got = {(r.user_id, r.event_type) for r in out.collect()}
    assert got == {("a", "click"), ("a", "view"), ("b", "click")}
    assert out.count() == 3  # the 2nd-batch ("a","click") was suppressed


def test_tws_running_counts_cross_batch(spark, tmp_path):
    """transformWithStateInPandas running counter — skip-marked where
    the protobuf dependency is absent (same policy as Iceberg tests)."""
    from bdtopo2refhydro_spark.streaming.stateful import (
        stream_running_counts_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf not available for transformWithState")
    import glob
    import os
    import shutil

    d = str(tmp_path / "drops")
    spark.createDataFrame([(1,), (1,), (2,)], "user_id long") \
        .coalesce(1).write.parquet(d + "/f1")
    time.sleep(1.1)
    spark.createDataFrame([(1,), (2,)], "user_id long") \
        .coalesce(1).write.parquet(d + "/f2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(d + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (now + i, now + i))
    out = stream_running_counts_tws(spark, flat, "user_id",
                                    query_name="t_tws_x",
                                    files_per_trigger=1)
    # update-mode memory sink: one row per key per batch; the MAX per
    # key is the cumulative total
    rows = out.groupBy("key").agg(F.max("n").alias("n")).collect()
    assert {(r.key, r.n) for r in rows} == {(1, 3), (2, 2)}


def test_foreach_batch_upsert_and_idempotent_replay(spark, tmp_path):
    """foreachBatch UPSERT sink: later batches overwrite keys, and a
    REPLAYED batch_id is a committed no-op (the exactly-once
    contract)."""
    import glob
    import os
    import shutil

    from bdtopo2refhydro_spark.streaming.ingest import (
        stream_upsert_foreach_batch,
    )

    d = str(tmp_path / "drops")
    spark.createDataFrame([("a", 1), ("b", 1), ("b", 5)],
                          "url string, v long") \
        .coalesce(1).write.parquet(d + "/f1")
    time.sleep(1.1)
    spark.createDataFrame([("b", 9), ("c", 2)], "url string, v long") \
        .coalesce(1).write.parquet(d + "/f2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(d + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (now + i, now + i))
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    apply_fn = stream_upsert_foreach_batch(
        spark, flat, target, ckpt, key="url", order_col="v",
        files_per_trigger=1)
    data = os.path.join(target, "data")
    got = {(r.url, r.v) for r in spark.read.parquet(data).collect()}
    # within-batch dedup kept b=5, then batch 2 upserted b=9, added c
    assert got == {("a", 1), ("b", 9), ("c", 2)}
    # idempotent replay: re-apply batch 0 (already committed) → no-op
    replay = spark.createDataFrame([("a", 777)], "url string, v long")
    apply_fn(replay, 0)
    got2 = {(r.url, r.v) for r in spark.read.parquet(data).collect()}
    assert got2 == got
    # a NEW batch id does apply
    apply_fn(replay, 99)
    got3 = {(r.url, r.v) for r in spark.read.parquet(data).collect()}
    assert got3 == {("a", 777), ("b", 9), ("c", 2)}


# ---------------------------------------------------------------------------
# Python DataSource streaming reader (sources/pyds_stream.py)
# ---------------------------------------------------------------------------

def test_pyds_seq_stream_drains_exact_sequence(spark):
    from bdtopo2refhydro_spark.sources.pyds_stream import (
        SEQ_MOD, SEQ_MULT, drain_seq_stream,
    )

    out = drain_seq_stream(spark, n_total=120, batch_size=50,
                           query_name="pyseq_test_sink")
    rows = sorted((r["seq_id"], r["val"]) for r in out.collect())
    assert rows == [(i, (i * SEQ_MULT) % SEQ_MOD) for i in range(120)]


def test_pyds_seq_stream_offset_slice_replay():
    # readBetweenOffsets must regenerate exactly the committed slice —
    # the recovery contract, checked directly on the reader.
    from bdtopo2refhydro_spark.sources.pyds_stream import _SeqReader

    r = _SeqReader({"n_total": "10", "batch_size": "4"})
    assert r.initialOffset() == {"pos": 0}
    rows1, off1 = r.read({"pos": 0})
    assert off1 == {"pos": 4} and len(list(rows1)) == 4
    rows_replay = list(r.readBetweenOffsets({"pos": 0}, {"pos": 4}))
    rows2, off2 = r.read({"pos": 8})
    assert off2 == {"pos": 10} and len(list(rows2)) == 2
    assert [i for i, _ in rows_replay] == [0, 1, 2, 3]


def test_pyds_seq_stream_available_now_truncates_to_one_batch(spark):
    # Spark 4 subtlety (pinned): python streaming sources do not
    # implement Trigger.AvailableNow — Spark logs a warning and falls
    # back to SINGLE-batch execution, so an availableNow drain silently
    # yields only the first read() (50 of 120 rows). drain_seq_stream
    # must therefore use processAllAvailable, never availableNow.
    from bdtopo2refhydro_spark.sources.pyds_stream import (
        SeqStreamDataSource,
    )

    for q in spark.streams.active:
        if q.name == "pyseq_an_sink":
            q.stop()
    spark.catalog.dropTempView("pyseq_an_sink")
    spark.dataSource.register(SeqStreamDataSource)
    df = (spark.readStream.format("seqstream")
          .option("n_total", 120).option("batch_size", 50).load())
    q = (df.writeStream.format("memory").queryName("pyseq_an_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.table("pyseq_an_sink").count() == 50


def test_chained_dedup_window_dedups_across_micro_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) carrying the SAME
    (user, minute) row: the chained dedup state suppresses the replay
    in batch 2, so the downstream window count stays 1 — the
    cross-batch two-state-store behavior a within-batch distinct
    cannot give."""
    import pyspark.sql.functions as F

    from bdtopo2refhydro_spark.streaming.stateful import (
        stream_dedup_then_window,
    )

    rows = [(1, "2024-01-01 10:00:30"), (1, "2024-01-01 10:05:10"),
            (2, "2024-01-01 11:00:00")]
    df = spark.createDataFrame(rows, "user_id bigint, t string").select(
        "user_id", F.col("t").cast("timestamp_ntz").alias("ts"))
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src / "a"))
    # batch 2 replays user 1 @ 10:00 (same minute) + adds a new minute
    rows2 = [(1, "2024-01-01 10:00:55"), (1, "2024-01-01 10:20:00")]
    df2 = spark.createDataFrame(rows2, "user_id bigint, t string").select(
        "user_id", F.col("t").cast("timestamp_ntz").alias("ts"))
    df2.coalesce(1).write.parquet(str(src / "b"))

    out = stream_dedup_then_window(
        spark, f"{src}/*/", query_name="chain_xbatch",
        files_per_trigger=1)
    got = {(r.w_start, r.user_id): r.n for r in out.collect()}
    # user 1, hour 10: minutes {10:00, 10:05, 10:20} -> 3 (NOT 4)
    assert got == {("2024-01-01 10:00:00", 1): 3,
                   ("2024-01-01 11:00:00", 2): 1}


def test_stream_fingerprint_cross_batch_equals_batch(spark, tmp_path):
    """3-file split + maxFilesPerTrigger=1 forces the commutative
    state through multiple micro-batches; final table must equal the
    batch GROUP BY exactly."""
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.streaming.stateful import \
        stream_source_fingerprint

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    src_dir = str(tmp_path / "fp_src")
    df.repartition(3).write.parquet(src_dir)

    got = stream_source_fingerprint(
        spark, src_dir, files_per_trigger=1,
        query_name="stream_fp_test")
    got_rows = {r["source"]: (r["n"], r["xmix"], r["smix"])
                for r in got.collect()}
    mix = (F.col("doc_id") * 2654435761) % (1 << 61)
    want = {r["source"]: (r["n"], r["xmix"], r["smix"])
            for r in df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr(f"bit_xor((doc_id * 2654435761) % {1 << 61})")
                 .alias("xmix"),
                 F.sum(mix % 1000003).alias("smix")).collect()}
    assert got_rows == want


def test_stream_token_bucket_cross_batch_state_carry(spark, tmp_path):
    """Time-sorted 3-file split + maxFilesPerTrigger=1: the (tokens,
    last_t) state must carry across micro-batches so the streamed
    decisions equal the batch operator's."""
    from bdtopo2refhydro_spark.operators.temporal import token_bucket
    from bdtopo2refhydro_spark.streaming.stateful import \
        stream_token_bucket

    S = 5_000_000
    rows = []
    eid = 0
    for host in range(3):
        t = 0
        for _ in range(30):
            t += (eid * 7919) % (3 * S)
            rows.append((host, t, eid))
            eid += 1
    df = spark.createDataFrame(rows, "host long, t long, event_id long")
    src_dir = str(tmp_path / "bucket_src")
    # one file per time tercile, preserving per-key event-time order
    # across batches
    n = len(rows)
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))
    cut1, cut2 = ordered[n // 3][1], ordered[2 * n // 3][1]
    df.where(F.col("t") < cut1).coalesce(1).write.parquet(
        src_dir + "/f1")
    df.where((F.col("t") >= cut1) & (F.col("t") < cut2)) \
        .coalesce(1).write.parquet(src_dir + "/f2")
    df.where(F.col("t") >= cut2).coalesce(1).write.parquet(
        src_dir + "/f3")
    import glob
    import os
    import shutil
    import time as _time
    base_t = _time.time() - 100
    for i, f in enumerate(sorted(glob.glob(src_dir + "/f*/part-*"))):
        dst = f"{src_dir}/{i:02d}.parquet"
        shutil.copy(f, dst)
        # FileStreamSource orders by modification time: pin it ascending
        os.utime(dst, (base_t + i * 10, base_t + i * 10))
    for d in glob.glob(src_dir + "/f[123]"):
        shutil.rmtree(d)

    got = {(r["host"], r["event_id"]): r["accepted"]
           for r in stream_token_bucket(
               spark, src_dir, files_per_trigger=1,
               query_name="stream_bucket_test").collect()}
    want = {(r["host"], r["event_id"]): r["accepted"]
            for r in token_bucket(df).collect()}
    assert got == want and len(got) == len(rows)
