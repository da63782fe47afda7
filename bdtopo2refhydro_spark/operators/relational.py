"""Relational correction passes — the reference's five fix_* scripts as pure
DataFrame transforms (SURVEY.md §2.2-§2.3).

The reference collects IDs to the driver and mutates layers in place
(e.g. fix_connection.py:75-96); here every pass is
``DataFrame -> DataFrame`` built from broadcast semi/anti/left joins —
correction tables are tiny next to the edges table, so joins broadcast the
correction side and never shuffle the big side. The one exception is
``fix_connection``: its anti-join builds on the TARGET's keys, so it stays
unhinted (broadcasting the big side's key set would OOM the driver).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import udfs as U

# values of the canal filter at fix_suppr_canal_auto.py:104-109 — the NOT
# LIKE patterns carry no wildcards, so equality semantics
CANAL_NATURES = ("Canal", "Conduit forcé", "Conduit buse", "Ecoulement canalisé")


def dedup_geometries(df: DataFrame, geom_col: str = "geom_wkb") -> DataFrame:
    """A2 ~ native:deleteduplicategeometries
    (create_connected_reference_hydro.py:150-156): keep one row per exact
    geometry. Deterministic keep-first by lowest key ordering (the reference
    keeps GPKG iteration order; at scale "first" must be defined)."""
    order_cols = [c for c in df.columns if c != geom_col]
    # partition by (hash, bytes): the 8-byte hash decides almost every
    # shuffle/sort comparison; the raw WKB stays in the key only for exact
    # tie-out on hash collisions, so semantics are unchanged but the sort
    # comparator no longer walks multi-KB geometry blobs per comparison
    w = Window.partitionBy(F.xxhash64(geom_col), F.col(geom_col)) \
        .orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def fix_connection(target: DataFrame, corrections: DataFrame,
                   key: str = "url") -> DataFrame:
    """J5 insert-if-absent ~ fix_connection.py:80-96: add correction rows
    whose key is not already present.

    No broadcast hint: the build side of this anti-join is the TARGET's key
    set (billions of keys at corpus scale — hinting it would collect the
    big side to the driver). Unhinted, only the key column of the big side
    shuffles and AQE picks the strategy; the corrections side is the small
    one but anti-join semantics put it on the probe side."""
    incoming = corrections.join(target.select(key), key, "left_anti")
    return target.unionByName(incoming, allowMissingColumns=True)


def fix_direction(target: DataFrame, correction_keys: DataFrame,
                  key: str = "url", geom_col: str = "geom_wkb") -> DataFrame:
    """F4/P1 ~ fix_direction.py:78-88: reverse line geometry for keyed rows."""
    marked = target.join(
        F.broadcast(correction_keys.select(key).withColumn("_rev", F.lit(True))),
        key, "left",
    )
    return marked.withColumn(
        geom_col,
        F.when(F.col("_rev").isNotNull(), U.st_reverse(geom_col)).otherwise(
            F.col(geom_col)
        ),
    ).drop("_rev")


def fix_connection_and_direction(target: DataFrame, corrections: DataFrame,
                                 key: str = "url",
                                 geom_col: str = "geom_wkb") -> DataFrame:
    """~ fix_connection_and_direction.py:77-106: insert missing rows, then
    reverse the direction of every keyed row (including the fresh inserts,
    matching the reference's two-phase loop)."""
    added = fix_connection(target, corrections, key)
    return fix_direction(added, corrections, key, geom_col)


def fix_modified_geom(target: DataFrame, corrections: DataFrame,
                      key: str = "url", geom_col: str = "geom_wkb",
                      new_geom_col: str = "new_geom_wkb") -> DataFrame:
    """J7 ~ fix_modified_geom.py:79-87: overwrite geometry from the
    correction table where keys match (left join + coalesce, replacing the
    reference's per-row indexed lookup)."""
    src = corrections.select(key, F.col(new_geom_col).alias("_new_geom"))
    return (
        target.join(F.broadcast(src), key, "left")
        .withColumn(geom_col, F.coalesce("_new_geom", geom_col))
        .drop("_new_geom")
    )


def fix_suppr_canal_multichenal(target: DataFrame, correction_keys: DataFrame,
                                key: str = "url") -> DataFrame:
    """J6 delete-by-key ~ fix_suppr_canal_multichenal.py:78-92."""
    return target.join(F.broadcast(correction_keys.select(key)), key, "left_anti")


def filter_canals(df: DataFrame, nature_col: str = "nature") -> DataFrame:
    """P2 ~ qgis:extractbyexpression at fix_suppr_canal_auto.py:104-109."""
    return df.filter(~F.col(nature_col).isin(*CANAL_NATURES))


def merge_layers(dfs: list[tuple[str, DataFrame]]) -> DataFrame:
    """F9 ~ native:mergevectorlayers (create_exutoire.py:161-164): union with
    provenance columns (`layer` col added like the reference; `path` omitted
    — tables, not files)."""
    out = None
    for name, df in dfs:
        tagged = df.withColumn("layer", F.lit(name))
        out = tagged if out is None else out.unionByName(tagged, allowMissingColumns=True)
    return out


def take_first_join(left: DataFrame, right: DataFrame, key: str,
                    order_col: str | Column, prefix: str = "join_") -> DataFrame:
    """J8 ~ native:joinattributestable METHOD:1 (take first match only,
    create_5m_width_hydro_network.py:375-386) with `join_` column prefix.
    Deterministic first = lowest order_col."""
    w = Window.partitionBy(key).orderBy(order_col)
    first = (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    renamed = first.select(
        key, *[F.col(c).alias(f"{prefix}{c}") for c in first.columns if c != key]
    )
    return left.join(renamed, key, "left")


def append_skip_duplicates(base: DataFrame, incoming: DataFrame,
                           key: str = "url") -> DataFrame:
    """J10 ~ etl_load:appendfeaturestolayer ACTION_ON_DUPLICATE:1 (skip)
    (create_5m_width_hydro_network.py:248-253). Iceberg path:
    MERGE INTO ... WHEN NOT MATCHED THEN INSERT."""
    return base.unionByName(
        incoming.join(base.select(key), key, "left_anti"),
        allowMissingColumns=True,
    )


def salted_join(skewed: DataFrame, other: DataFrame, key: str, *,
                salts: int = 16, salt_cols: list[str] | None = None,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the SKEWED side, replicate the other.

    A hash join on a power-law key (host, user, domain — every crawl
    table has one) lands each hot key in one shuffle partition; one task
    then processes the whole head of the distribution while the rest of
    the cluster idles. AQE's skew-join splitting fixes this for
    sort-merge joins at runtime, but not for stateful operators or when
    the skewed side must stay hash-partitioned downstream — this is the
    explicit fallback.

    Each skewed row gets a deterministic salt in [0, salts) derived from
    ``salt_cols`` (default: all non-key columns — NOT a random number,
    so retries/resumes place rows identically); the other side is
    replicated ``salts``× via an explode, and the join runs on
    (key, salt). Hot keys therefore spread over ``salts`` partitions at
    the cost of |other| × salts shuffle bytes — the right trade when
    ``other`` is per-key aggregates (small rows) and ``skewed`` is the
    corpus. Result == the plain equi-join, row for row.
    """
    if salt_cols is None:
        salt_cols = [c for c in skewed.columns if c != key]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                  F.lit(salts)).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return left.join(right, [key, "_salt"], how).drop("_salt")


def merge_apply(target: DataFrame, source: DataFrame, *,
                key: str = "k", op_col: str = "op",
                ts_col: str = "ts") -> DataFrame:
    """MERGE INTO semantics as a pure DataFrame op (no lakehouse
    runtime): matched+upsert updates, matched+delete removes,
    not-matched+upsert inserts, untouched target rows pass through.
    The source is first deduplicated per key to the max-(ts, value)
    row — MERGE requires unique source keys, and doing it
    deterministically here mirrors the Iceberg path's source-dedupe
    (sources/io.py:merge_upsert). One full-outer join on the key; all
    decisions are CASE projections, so the plan is join + project —
    the same shape a lakehouse MERGE compiles to. Value columns are
    every non-key/op column shared by both sides."""
    val_cols = [c for c in target.columns if c != key]
    rest = [c for c in source.columns if c not in (key, ts_col)]
    src_one = (source
               .groupBy(key)
               .agg(F.max(F.struct(ts_col, *rest)).alias("_m"))
               .select(key, *[F.col(f"_m.{c}").alias(c)
                              for c in [ts_col] + rest]))
    t = target.select(key, *[F.col(c).alias(f"_t_{c}")
                             for c in val_cols])
    s = src_one.select(key, F.col(op_col).alias("_op"),
                       *[F.col(c).alias(f"_s_{c}") for c in val_cols])
    j = t.join(s, key, "full_outer")
    keep = (F.col("_op").isNull()  # target-only row
            | (F.col("_op") == "upsert"))
    out_cols = [
        F.when(F.col("_op") == "upsert", F.col(f"_s_{c}"))
        .otherwise(F.col(f"_t_{c}")).alias(c) for c in val_cols]
    return j.where(keep).select(key, *out_cols)
