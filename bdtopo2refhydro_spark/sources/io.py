"""IO helpers: parquet-backed tables (Iceberg-shaped API) + schema guards.

The reference loads GPKG layers and raises IOError when invalid
(create_exutoire.py:80-87). Here a "layer" is a parquet directory (tests /
this sandbox) or an Iceberg table (production path — same call sites, the
format string switches). Writers default to create-or-replace, matching the
reference's saving_gpkg create-file → overwrite-layer fallback
(create_exutoire.py:89-144).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, path_or_table: str) -> DataFrame:
    """S1: load a table. Catalog names (`ns.table`) → Iceberg/catalog read;
    paths → parquet directory read."""
    if os.path.sep in path_or_table or path_or_table.endswith(".parquet"):
        return spark.read.parquet(path_or_table)
    return spark.read.table(path_or_table)


def assert_schema(df: DataFrame, expected_cols: dict[str, str]) -> DataFrame:
    """S2: fail fast when a source is missing expected columns — the engine's
    analog of layer.isValid() → IOError (fix_direction.py:62-64)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = {
        c: t for c, t in expected_cols.items()
        if c not in actual or actual[c] != t
    }
    if missing:
        raise IOError(
            f"source schema mismatch: expected {missing}, have {actual}"
        )
    return df


def write_table(df: DataFrame, path_or_table: str, mode: str = "overwrite") -> None:
    """S3: create-or-replace sink."""
    if os.path.sep in path_or_table or path_or_table.endswith(".parquet"):
        df.write.mode(mode).parquet(path_or_table)
    else:
        df.write.mode(mode).saveAsTable(path_or_table)


def read_jsonl(spark: SparkSession, path: str, schema: str,
               corrupt_col: str = "_corrupt_record") -> DataFrame:
    """S1 alternate format: newline-delimited JSON — the standard crawl
    interchange (CDX/WAT/WET sidecars, export dumps). The schema is
    REQUIRED: schema inference scans the whole input once before the real
    read, which is a non-starter at corpus scale. PERMISSIVE mode keeps
    malformed lines, routing their raw text into `corrupt_col` so the
    pipeline can quarantine instead of abort (mirrors the S2 fail-fast
    guard but at row granularity, which is what a 100-TB ingest needs)."""
    return (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str,
             header: bool = True, sep: str = ",") -> DataFrame:
    """S1 alternate format: CSV with an explicit schema (no inference scan),
    PERMISSIVE malformed-row handling."""
    return (
        spark.read.schema(schema)
        .option("header", header).option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """S3 at scale: hive-partitioned parquet layout (e.g. by source / crawl
    date) so downstream reads prune partitions at plan time instead of
    scanning the corpus. Choose LOW-cardinality keys: each distinct tuple
    is a directory, and a high-cardinality partition key (url, doc_id)
    melts the metastore and produces millions of tiny files."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


# --- Iceberg catalog path (SURVEY.md §1.1: GeoPackage layer ↔ Iceberg
# `namespace.table`; J10 ↔ MERGE INTO). The sandbox has no Iceberg jars, so
# every entry point degrades with an explicit IcebergUnavailable — the
# tests skip (not fail) when the runtime lacks the extension. -------------

class IcebergUnavailable(RuntimeError):
    """Raised when the Spark session has no Iceberg catalog/extension."""


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension classes are on the JVM
    classpath (spark-submit --packages org.apache.iceberg:...)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
        return True
    except Exception:  # noqa: BLE001 — Py4J raises raw Py4JError/JavaError
        return False


def _require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailable(
            "Iceberg extension not on the classpath; launch with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-... and "
            "spark.sql.extensions=org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions")


def write_iceberg(df: DataFrame, table: str,
                  partition_by: str | None = None) -> None:
    """S3 on the catalog path: create-or-replace an Iceberg table (the
    production analog of the reference's create-file → overwrite-layer
    fallback, create_exutoire.py:89-144)."""
    _require_iceberg(df.sparkSession)
    w = df.writeTo(table).using("iceberg")
    if partition_by is not None:
        from pyspark.sql import functions as F

        w = w.partitionedBy(F.col(partition_by))
    w.createOrReplace()


def _dedupe_incoming(incoming: DataFrame, key: str) -> DataFrame:
    """A MERGE source must be unique on the merge key: duplicate keys in
    one incoming batch (likely for crawl data) would raise Iceberg's
    'multiple matching source rows' on the upsert path and double-insert
    on the append-skip path, breaking target key uniqueness for every
    later merge (ADVICE r2). Keep one row per key under a deterministic
    total order — all non-key columns ascending, the same take-first
    discipline as relational.take_first_join / streaming stream_dedup."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    others = sorted(c for c in incoming.columns if c != key)
    order = [F.col(c) for c in others] or [F.col(key)]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        incoming.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_append_skip_duplicates(spark: SparkSession, target_table: str,
                                 incoming: DataFrame,
                                 key: str = "url") -> None:
    """J10 ~ etl_load:appendfeaturestolayer ACTION_ON_DUPLICATE:1 (skip),
    as an Iceberg MERGE: rows whose key already exists are skipped, the
    rest are inserted — one atomic commit, no read-modify-write of the
    whole table (operators/relational.append_skip_duplicates is the
    DataFrame equivalent for non-catalog tables)."""
    _require_iceberg(spark)
    _dedupe_incoming(incoming, key).createOrReplaceTempView("_merge_incoming")
    spark.sql(f"""
        MERGE INTO {target_table} t
        USING _merge_incoming s
        ON t.{key} = s.{key}
        WHEN NOT MATCHED THEN INSERT *
    """)


def merge_upsert(spark: SparkSession, target_table: str,
                 incoming: DataFrame, key: str = "url") -> None:
    """J5+J7 combined on the catalog path (fix_connection insert-if-absent
    + fix_modified_geom overwrite-by-key as one MERGE)."""
    _require_iceberg(spark)
    _dedupe_incoming(incoming, key).createOrReplaceTempView("_merge_incoming")
    spark.sql(f"""
        MERGE INTO {target_table} t
        USING _merge_incoming s
        ON t.{key} = s.{key}
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   cell_size: float, n_files: int = 64,
                   mode: str = "overwrite", bits: int = 26) -> None:
    """Z-order-clustered parquet sink: rows sorted by the Morton key of
    their (x, y) cell, range-partitioned into ``n_files`` so every output
    file owns a DISJOINT key range (repartitionByRange) and rows are
    sorted within each file. A tile/bbox scan then prunes whole files and
    row groups via parquet min/max stats on ``zkey`` — the lakehouse
    CLUSTER BY zorder layout, built from primitives. The key column is
    kept in the output (it doubles as the coarse join/prune key)."""
    from ..functions.cells import zorder_key_expr
    from pyspark.sql import functions as F

    keyed = df.withColumn(
        "_ix", F.expr(f"CAST(floor(greatest({x_col}, 0.0) / {cell_size}) AS BIGINT)")
    ).withColumn(
        "_iy", F.expr(f"CAST(floor(greatest({y_col}, 0.0) / {cell_size}) AS BIGINT)")
    ).withColumn("zkey", F.expr(zorder_key_expr("_ix", "_iy", bits))) \
     .drop("_ix", "_iy")
    keyed.repartitionByRange(n_files, "zkey") \
         .sortWithinPartitions("zkey") \
         .write.mode(mode).parquet(path)


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8, sorted_by_key: bool = True) -> None:
    """Co-located (bucketed) table sink: ONE shuffle on `key` at write
    time buys every later equi-join/aggregate on `key` a shuffle-free
    plan — the amortization that matters when a 100-TB fact table is
    joined daily. The explicit repartition(n_buckets, key) puts exactly
    one file in each bucket, so a bucketed sort-merge join needs no
    Exchange AND no extra Sort (multi-file buckets would re-sort).
    Parquet + saveAsTable keeps bucket metadata in the session catalog;
    the Iceberg path is the same call with `bucket(n, key)` partitioning."""
    spark = df.sparkSession
    # a fresh session's in-memory catalog forgets the table but its
    # managed LOCATION survives on disk → CREATE collides
    # (LOCATION_ALREADY_EXISTS). DROP IF EXISTS covers a known table
    # (and any persistent metastore); the orphaned-directory sweep is
    # the local/in-memory-catalog case.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc)
    w = (
        df.repartition(n_buckets, key)
        .write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sorted_by_key:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_equijoin(spark: SparkSession, left_table: str,
                      right_table: str, left_key: str,
                      right_key: str) -> DataFrame:
    """Equi-join two tables bucketed on their join keys (same bucket
    count): Catalyst recognizes the matching hash distributions and plans
    a zero-Exchange sort-merge join (pinned by test_plan_shapes)."""
    lt = spark.read.table(left_table)
    rt = spark.read.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])


def compact_files(spark, path: str, *, target_bytes: int = 128 * 1024 * 1024,
                  out_path: str | None = None) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files — the maintenance pass every
    long-lived table needs (streaming sinks and incremental appends
    accumulate small files; each file costs a task + an open at read
    time, so 10k 1 MB files read ~100x slower than 80 128 MB files).

    Rewrites in place by default or to ``out_path``. The in-place swap is
    crash-safe: the compacted data is written to a sibling temp dir, the
    ORIGINAL dir is renamed aside (atomic), the temp dir renamed into
    place (atomic), and only then is the old copy deleted — at every
    instant the table path either holds the old or the new data (a crash
    mid-sequence leaves at worst an ``._compact_old`` dir to sweep).
    Returns the output file count. Row order is not preserved (parquet
    readers must not rely on it); content equality is the tested
    contract."""
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path) for f in fs if f.endswith(".parquet"))
    n_out = max(1, math.ceil(total / target_bytes))
    dest = out_path or (path.rstrip("/") + "._compact_tmp")
    df.repartition(n_out).write.mode("overwrite").parquet(dest)
    if out_path is None:
        old = path.rstrip("/") + "._compact_old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
        try:
            os.rename(dest, path)
        except OSError:
            os.rename(old, path)  # roll back: restore the original
            raise
        shutil.rmtree(old)
        dest = path
    return len([f for f in os.listdir(dest)
                if f.endswith(".parquet")])
