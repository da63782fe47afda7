"""Cluster driver for the INCREMENTAL-REFRESH pipeline — the
spark-submit counterpart of submit_curation.py for the per-snapshot
operation (plans/refresh.py): diff the new crawl against the existing
corpus, dedup only the delta against the OLD side, gate, and emit the
per-source admission manifest plus the admitted-id list.

  python scripts/package_pyfiles.py
  spark-submit \
    --py-files dist/bdtopo2refhydro_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.shuffle.partitions=<4x total cores> \
    scripts/submit_refresh.py \
    --old <parquet: existing corpus (doc_id, text, lang, source)> \
    --new <parquet: incoming snapshot, same schema> \
    --workdir <durable dir for stage checkpoints + lineage> \
    --output <output dir>

Stages materialize under --workdir and are skipped on rerun (a killed
job resumes past completed stages; every stage is deterministic so the
resumed run is byte-identical). The old corpus contributes only digests
and MinHash band keys — its text bytes never shuffle (the property that
makes monthly refreshes affordable at corpus scale).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=3)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark import SparkConf

    b = SparkSession.builder.appName("refresh_pipeline")
    if not SparkConf().contains("spark.master"):
        b = b.master("local[*]")
    spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators.cdc import snapshot_diff
    from bdtopo2refhydro_spark.operators.text import incremental_dedup
    from bdtopo2refhydro_spark.plans.checkpoint import CheckpointedPipeline
    from bdtopo2refhydro_spark.plans.lineage import Lineage

    lineage = Lineage()
    pipe = CheckpointedPipeline(spark, args.workdir, lineage,
                                resume=not args.no_resume)
    old = spark.read.parquet(args.old)
    new = spark.read.parquet(args.new)

    # stage 1: delta keys — both snapshots project to (key, digest)
    # before the full-outer join, so only 16-byte digests shuffle
    def _delta():
        return (
            snapshot_diff(old, new, "doc_id", ["text", "lang", "source"])
            .filter(F.col("change").isin("added", "changed"))
            .select("doc_id", "change")
        )

    delta = pipe.stage("delta_keys", _delta)

    # stage 2: dedup flags for the delta only, against the OLD corpus
    # only (never old x old) — checkpoint is one boolean row per
    # candidate
    def _flags():
        cand = new.join(delta.select("doc_id"), "doc_id", "left_semi")
        return incremental_dedup(cand, old, threshold=args.threshold)

    flags = pipe.stage("dedup_flags", _flags)

    # stage 3: token gate + admitted-id list (id/source/outcome columns
    # only — text never enters a checkpoint)
    def _admitted():
        cand = new.join(delta.select("doc_id"), "doc_id", "left_semi")
        toks = cand.select(
            "doc_id", "source",
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
            .cast("bigint").alias("n_tok"),
        )
        return (
            toks.join(flags, "doc_id")
            .withColumn("gate_ok", F.col("n_tok") >= args.min_tokens)
            .withColumn(
                "admitted",
                ~F.col("dropped_exact") & ~F.col("dropped_near")
                & F.col("gate_ok"))
        )

    admitted = pipe.stage("admitted", _admitted)

    manifest = admitted.groupBy("source").agg(
        F.count("*").alias("n_candidates"),
        F.sum(F.col("dropped_exact").cast("long")).alias("n_exact"),
        F.sum((~F.col("dropped_exact") & F.col("dropped_near"))
              .cast("long")).alias("n_near"),
        F.sum((~F.col("dropped_exact") & ~F.col("dropped_near")
               & ~F.col("gate_ok")).cast("long")).alias("n_gate_failed"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum(F.when(F.col("admitted"), F.col("n_tok"))
              .otherwise(F.lit(0))).alias("tok_admitted"),
    )
    manifest.write.mode("overwrite").parquet(f"{args.output}/manifest")
    # admitted ids hive-partitioned by source: each downstream ingester
    # reads exactly one prunable directory
    admitted.filter("admitted").select("doc_id", "source") \
        .write.mode("overwrite").partitionBy("source") \
        .parquet(f"{args.output}/admitted_ids")
    lineage.partition_counts("admitted", admitted)
    lineage.write(spark, f"{args.workdir}/_lineage")
    spark.stop()


if __name__ == "__main__":
    main()
