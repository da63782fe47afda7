"""Cluster driver for the webtext curation flagship — the spark-submit
counterpart of submit_reference_network.py (north rule packaging:
checkpoint/resume + per-partition lineage for BOTH flagship pipelines):

  python scripts/package_pyfiles.py
  spark-submit \
    --py-files dist/bdtopo2refhydro_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.shuffle.partitions=<4x total cores> \
    scripts/submit_curation.py \
    --docs <parquet/iceberg path: doc_id, text, source, n_chars> \
    --benchmark <parquet path: same schema — the eval set to scrub> \
    --workdir <durable dir for stage checkpoints + lineage> \
    --output <output dir>

Stages materialize under --workdir and are skipped on rerun: a killed
job resumes past completed stages, and because every stage is
deterministic (md5 dedup keeps lowest id, window packing) the resumed
run produces byte-identical shard assignments. The packed manifest is
written hive-partitioned by (source, shard): each tokenizer worker reads
exactly one prunable directory.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--benchmark", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--rep-factor", type=int, default=5)
    ap.add_argument("--decontam-k", type=int, default=8)
    ap.add_argument("--domain-cap", type=int, default=100_000)
    ap.add_argument("--shard-budget", type=int, default=1 << 22)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark import SparkConf

    b = SparkSession.builder.appName("curation_pipeline")
    if not SparkConf().contains("spark.master"):
        b = b.master("local[*]")
    spark = b.getOrCreate()

    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators import corpus as C
    from bdtopo2refhydro_spark.operators import text as TX
    from bdtopo2refhydro_spark.operators.text import tokens_expr
    from bdtopo2refhydro_spark.plans.checkpoint import CheckpointedPipeline
    from bdtopo2refhydro_spark.plans.lineage import Lineage

    lineage = Lineage()
    pipe = CheckpointedPipeline(spark, args.workdir, lineage,
                                resume=not args.no_resume)

    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark)
    toks = tokens_expr()

    # stage 1: dedup survivors + integer gates (bodies hashed once, never
    # shuffled — the checkpoint carries only id/source/count columns)
    def _survivors():
        base = docs.select(
            "doc_id", "source", "n_chars",
            F.md5(F.col("text").cast("binary")).alias("text_hash"),
            F.size(F.expr(toks)).cast("long").alias("n_tokens"),
        )
        keep = base.groupBy("text_hash").agg(F.min("doc_id").alias("keep_id"))
        top = (
            docs.select("doc_id", F.explode(F.expr(toks)).alias("tok"))
            .groupBy("doc_id", "tok").count()
            .groupBy("doc_id").agg(F.max("count").alias("top_token_count"))
        )
        return (
            base.join(keep, "text_hash").join(top, "doc_id")
            .filter(
                (F.col("doc_id") == F.col("keep_id"))
                & (F.col("n_tokens") >= args.min_tokens)
                & (F.col("top_token_count") * args.rep_factor
                   <= F.col("n_tokens"))
            )
            .select("doc_id", "source", "n_chars", "n_tokens")
        )

    survivors = pipe.stage("survivors", _survivors)

    # stage 2: decontamination flags (full doc scan again — shingles need
    # text — but the checkpoint is one row per clean doc id)
    def _clean_ids():
        return (
            TX.decontaminate(docs, bench, k=args.decontam_k)
            .filter(~F.col("contaminated"))
            .select("doc_id")
        )

    clean_ids = pipe.stage("clean_ids", _clean_ids)

    # stage 3: cap + pack over the two checkpointed id tables only
    def _packed():
        surv = survivors.join(clean_ids, "doc_id", "left_semi")
        capped = C.domain_cap(
            surv, args.domain_cap, domain_col="source", id_col="doc_id"
        ).drop("rank_in_domain", "n_chars")
        return C.pack_shards(capped, args.shard_budget,
                             tokens_col="n_tokens", group_col="source",
                             id_col="doc_id")

    packed = pipe.stage("packed", _packed)

    # shard-partitioned manifest: one (source, shard) directory per
    # tokenizer work unit, prunable at plan time
    packed.write.mode("overwrite").partitionBy("source", "shard") \
        .parquet(f"{args.output}/manifest")
    lineage.partition_counts("packed", packed)
    lineage.write(spark, f"{args.workdir}/_lineage")
    spark.stop()


if __name__ == "__main__":
    main()
