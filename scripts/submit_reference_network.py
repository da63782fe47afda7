"""Cluster driver for the flagship reference-network pipeline — the script
handed to `spark-submit` (north rule packaging):

  python scripts/package_pyfiles.py
  spark-submit \
    --py-files dist/bdtopo2refhydro_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.adaptive.skewJoin.enabled=true \
    --conf spark.sql.shuffle.partitions=<4x total cores> \
    scripts/submit_reference_network.py \
    --edges  <parquet/iceberg path: url, geom_wkb, nature> \
    --outlets <parquet path: outlet_id, geom_wkb> \
    --workdir <durable dir for stage checkpoints + lineage> \
    --output  <output dir>

No master / core counts here — the cluster submit owns executor topology
(the N vs 4N scaling criterion varies ONLY --num-executors between runs).
Every stage materializes under --workdir and is skipped on rerun
(resume-from-checkpoint); lineage metrics (per-stage wall/rows +
per-partition counts) land at <workdir>/_lineage.
"""

from __future__ import annotations

import argparse
import os
import sys

# under spark-submit the package arrives via --py-files; for a plain-python
# local run, fall back to the repo checkout next to this script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True)
    ap.add_argument("--outlets", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--tolerance", type=float, default=1.0)
    ap.add_argument("--cell-size", type=float, default=2000.0)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark import SparkConf

    b = SparkSession.builder.appName("reference_network")
    if not SparkConf().contains("spark.master"):
        # plain-python invocation (tests); under spark-submit the cluster
        # master from the submit command wins
        b = b.master("local[*]")
    spark = b.getOrCreate()

    from bdtopo2refhydro_spark.operators import aggregate_segments
    from bdtopo2refhydro_spark.plans import run_reference_network
    from bdtopo2refhydro_spark.plans.checkpoint import CheckpointedPipeline
    from bdtopo2refhydro_spark.plans.lineage import Lineage

    lineage = Lineage()
    pipe = CheckpointedPipeline(spark, args.workdir, lineage,
                                resume=not args.no_resume)

    edges = spark.read.parquet(args.edges)
    outlets = spark.read.parquet(args.outlets)

    # stage 1: dedupe → node ids → spatial join → BFS → principal stem,
    # keeping node/len working columns so stage 2 restarts from the
    # checkpoint alone
    troncon_nodes = pipe.stage(
        "troncon_nodes",
        lambda: run_reference_network(
            edges, outlets, tolerance=args.tolerance,
            cell_size=args.cell_size, with_segments=False,
        )[0],
    )
    # stage 2: A3 chain collapse over the checkpointed traversal output
    segment = pipe.stage("segment",
                         lambda: aggregate_segments(troncon_nodes))
    troncon = troncon_nodes.drop("NODEA", "NODEB", "len")

    troncon.write.mode("overwrite").parquet(f"{args.output}/troncon")
    segment.write.mode("overwrite").parquet(f"{args.output}/segment")
    lineage.partition_counts("troncon", troncon)
    lineage.write(spark, f"{args.workdir}/_lineage")
    spark.stop()


if __name__ == "__main__":
    main()
