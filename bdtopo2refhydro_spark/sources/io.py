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


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 64) -> None:
    """Bucketed, sorted sink for co-located equi-joins (SURVEY.md §4):
    two tables bucketed by the same key and count join WITHOUT a shuffle
    (no Exchange on either side) — the storage-level answer to repeated
    node-id joins in the graph passes. Catalog table only; parquet paths
    cannot carry bucket metadata."""
    df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, key).sortBy(key).saveAsTable(table)
