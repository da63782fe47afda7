"""Iceberg catalog path (SURVEY.md §1.1, J10 ↔ MERGE INTO).

The sandbox ships no Iceberg jars, so the MERGE tests skip (not fail)
when `iceberg_available` is False; the availability probe and the
explicit IcebergUnavailable degradation are testable everywhere.
"""

import pytest
from pyspark.sql import functions as F

from bdtopo2refhydro_spark.sources import (
    IcebergUnavailable,
    iceberg_available,
    merge_append_skip_duplicates,
    merge_upsert,
    write_iceberg,
)


def test_unavailable_raises_explicitly(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg present — degradation path not reachable")
    df = spark.range(3).select(F.col("id").alias("url"))
    with pytest.raises(IcebergUnavailable):
        write_iceberg(df, "ns.t")
    with pytest.raises(IcebergUnavailable):
        merge_append_skip_duplicates(spark, "ns.t", df)
    with pytest.raises(IcebergUnavailable):
        merge_upsert(spark, "ns.t", df)


@pytest.fixture()
def iceberg(spark):
    if not iceberg_available(spark):
        pytest.skip("no Iceberg jars in this runtime")
    return spark


def test_merge_append_skips_duplicates(iceberg, tmp_path):
    spark = iceberg
    spark.sql("CREATE NAMESPACE IF NOT EXISTS default")
    base = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int")
    write_iceberg(base, "default.merge_skip_t")
    incoming = spark.createDataFrame([("u2", 99), ("u3", 3)],
                                     "url string, v int")
    merge_append_skip_duplicates(spark, "default.merge_skip_t", incoming)
    got = {(r.url, r.v) for r in
           spark.read.table("default.merge_skip_t").collect()}
    assert got == {("u1", 1), ("u2", 2), ("u3", 3)}  # u2 NOT overwritten


def test_merge_upsert_overwrites_and_inserts(iceberg):
    spark = iceberg
    base = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, v int")
    write_iceberg(base, "default.merge_upsert_t")
    incoming = spark.createDataFrame([("u2", 99), ("u3", 3)],
                                     "url string, v int")
    merge_upsert(spark, "default.merge_upsert_t", incoming)
    got = {(r.url, r.v) for r in
           spark.read.table("default.merge_upsert_t").collect()}
    assert got == {("u1", 1), ("u2", 99), ("u3", 3)}


def test_merge_source_dedupe_is_deterministic_take_first(spark):
    """ADVICE r2 (medium): the MERGE source must be unique on the key —
    duplicate keys in one incoming crawl batch would raise Iceberg's
    'multiple matching source rows' (upsert) or double-insert
    (append-skip). _dedupe_incoming keeps one row per key under the
    name-sorted non-key column order; pure DataFrame logic, so this runs
    without Iceberg jars."""
    from bdtopo2refhydro_spark.sources.io import _dedupe_incoming

    inc = spark.createDataFrame(
        [
            ("u1", "b-geom", 2),
            ("u1", "a-geom", 9),  # survivor: lowest (geom, v)
            ("u2", "x", 1),
        ],
        "url string, geom string, v int",
    )
    out = {r["url"]: (r["geom"], r["v"])
           for r in _dedupe_incoming(inc, "url").collect()}
    assert out == {"u1": ("a-geom", 9), "u2": ("x", 1)}
    # key-only frame: still collapses to one row per key
    solo = spark.createDataFrame([("k",), ("k",)], "url string")
    assert _dedupe_incoming(solo, "url").count() == 1
