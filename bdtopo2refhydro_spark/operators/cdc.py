"""Change-data-capture operators for corpus versioning.

The reference is a one-shot batch pipeline (it rebuilds the whole
reference network per run — extract_* scripts in bdtopo2refhydro); a
continuously re-crawled corpus needs the incremental counterparts: what
changed between two snapshots (``snapshot_diff``) and the full validity
history of a tracked attribute (``scd2_build``). Both are pure
DataFrame compositions — no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  compare_cols: list[str], *,
                  include_unchanged: bool = False) -> DataFrame:
    """Diff two corpus snapshots by key: (key, change, old_digest,
    new_digest) with change in {'added','removed','changed'} (and
    'unchanged' when ``include_unchanged``).

    Scale shape: each side is projected to (key, md5-of-compared-cols)
    BEFORE the full-outer join, so only 16-byte digests shuffle — the
    text/payload bytes of a 100 TB snapshot never leave their scan
    stage. The join is a plain key equi-join (co-partitionable /
    bucketable by key); no window, no skew hotspot beyond the key
    distribution itself.
    """
    def digest(df: DataFrame, out: str) -> DataFrame:
        parts = []
        for c in compare_cols:
            # \x01 (not \x00): DuckDB VARCHAR cannot hold NUL, and the
            # driver oracle must byte-replicate this digest
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x01")))
            parts.append(F.lit("\x1f"))  # unambiguous column separator
        return df.select(F.col(key_col),
                         F.md5(F.concat(*parts).cast("binary")).alias(out))

    o = digest(old, "old_digest")
    n = digest(new, "new_digest")
    diff = o.join(n, key_col, "full_outer").select(
        key_col,
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged")).alias("change"),
        "old_digest", "new_digest",
    )
    if not include_unchanged:
        diff = diff.filter(F.col("change") != "unchanged")
    return diff


def scd2_build(events: DataFrame, key_col: str, ts_col: str,
               attr_col: str, *, tiebreak_col: str) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one row per (key, attribute version) with integer-µs validity
    ``[valid_from_us, valid_to_us)`` — ``valid_to_us`` NULL and
    ``is_current`` true on the open version.

    Consecutive events carrying the SAME attribute value collapse into
    one version (the SCD2 contract: a version row exists only when the
    tracked value actually changed). Ordering is (ts, tiebreak) so
    equal-timestamp events are deterministic.

    Scale shape: two windows over the same (key × time) ordering — one
    partition-by-key shuffle total (Catalyst reuses the sort for both
    the change-collapse lag and the validity lead); state per key is a
    sort run, not materialized history, so hot keys cost their row
    count, nothing quadratic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    versions = (
        events.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    return versions.select(
        key_col,
        F.col(attr_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w).cast("timestamp"))
        .alias("valid_to_us"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def apply_cdc(base: DataFrame, changes: DataFrame, *, key_col: str,
              seq_col: str = "seq", op_col: str = "op",
              val_cols: list[str] | None = None) -> DataFrame:
    """Apply a CDC change batch (I/U/D rows with a sequence number)
    onto a base snapshot — the batch-side materialization step of a
    replication pipeline (the streaming sibling is
    stream_upsert_foreach_batch). LAST change per key wins by
    ``seq_col`` (max_by over a struct; seq is the log offset, so ties
    cannot happen); a winning 'D' removes the key, 'I'/'U' upsert the
    value columns, untouched base keys pass through unchanged.

    Scale shape: one groupBy on the CHANGE keys (the small side), one
    full-outer equi-join against base — never a window over the big
    snapshot. Returns the new snapshot with base's column set.
    """
    val_cols = val_cols or [c for c in changes.columns
                            if c not in (key_col, seq_col, op_col)]
    last = (changes.groupBy(key_col)
            .agg(F.max_by(F.struct(op_col, *val_cols), F.col(seq_col))
                 .alias("_c"))
            .select(key_col,
                    F.col(f"_c.{op_col}").alias("_op"),
                    *[F.col(f"_c.{c}").alias(f"_new_{c}")
                      for c in val_cols]))
    j = base.join(last, key_col, "full_outer")
    no_change = F.col("_op").isNull()
    sel = [F.col(key_col)]
    for c in base.columns:
        if c == key_col:
            continue
        if c in val_cols:
            sel.append(F.when(no_change, F.col(c))
                       .otherwise(F.col(f"_new_{c}")).alias(c))
        else:
            sel.append(F.col(c))
    return j.where(no_change | (F.col("_op") != "D")).select(*sel)


def entity_clusters(recs, id_col: str, key_cols: list[str]):
    """Entity resolution by transitive closure over SHARED-KEY links
    (email links A-B, phone links B-C ⟹ {A,B,C} are one entity):
    for each match key, records sharing a value link by a STAR to the
    key's minimum record id — never all-pairs, so a hot key of
    cardinality k costs k edges, not k² — and the O(log) min-label CC
    merges stars across keys into entities. NULL key values never
    link. Returns (id_col, cluster) with cluster = min record id of
    the entity; callers consolidate golden records by aggregating
    over `cluster`."""
    from .graph import connected_components

    if not key_cols:
        raise ValueError(
            "entity_clusters: key_cols must name at least one match "
            "key (with no keys every record is its own singleton — "
            "pass the id column itself if that is what you want)")
    base = recs.select(F.col(id_col).cast("long").alias("rid"),
                       *[F.col(k) for k in key_cols]) \
        .localCheckpoint(eager=False)
    edges = None
    for k in key_cols:
        kk = base.where(F.col(k).isNotNull())
        mins = kk.groupBy(k).agg(F.min("rid").alias("root"))
        e = (kk.join(mins, k)
             .where(F.col("rid") != F.col("root"))
             .select(F.col("rid").alias("node"),
                     F.col("root").alias("nbr")))
        edges = e if edges is None else edges.unionByName(e)
    adj = edges.unionByName(
        edges.select(F.col("nbr").alias("node"),
                     F.col("node").alias("nbr")))
    cc = connected_components(adj)
    return (base.select("rid").join(cc.withColumnRenamed("node", "rid"),
                                    "rid", "left")
            .select(F.col("rid").alias(id_col),
                    F.coalesce("l", F.col("rid")).alias("cluster")))
