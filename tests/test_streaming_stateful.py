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
