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
