"""Natural-scale check for graph.biconnected_components /
articulation_points: the flower chain at scale — R cycles of length C
sharing single vertices (nodes k·(C−1) … k·(C−1)+C−1). Ground truth is
CLOSED FORM: every cycle is one block labelled by its minimal edge
(base·2³² + base+1), and the articulation points are exactly the R−1
shared vertices. Exercises the whole Tarjan-Vishkin stack at natural
scale: Borůvka over R·C edges, Euler-tour list ranking, dense_index
preorder, the rmq_sparse_table low/high battery over the full preorder
sequence, and the aux-graph CC.

Run: python scripts/bicc_scale_check.py [R] [C]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

R = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators.graph import \
        biconnected_components
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("bicc_scale", cores=8, shuffle_partitions=64)
    base = C - 1
    edges = spark.range(0, R * C).selectExpr(
        f"cast(id div {C} as long) * {base}"
        f" + cast(id % {C} as long) as u",
        f"cast(id div {C} as long) * {base}"
        f" + cast((id % {C}) + 1 as long) % {C} as v")
    t0 = time.time()
    bc = biconnected_components(edges).cache()
    n_edges = bc.count()
    n_blocks = bc.select("block").distinct().count()
    # every edge's block label must be its cycle's minimal edge
    bad = bc.where(
        F.col("block") != ((F.col("a") / base).cast("long") * base)
        * (1 << 32) + ((F.col("a") / base).cast("long") * base) + 1
    ).count()
    wall_bc = time.time() - t0
    assert n_edges == R * C, (n_edges, R * C)
    assert n_blocks == R, (n_blocks, R)
    assert bad == 0, bad
    t0 = time.time()
    # articulation = vertices in >=2 blocks, derived from the SAME bc
    # frame (running the TV pipeline twice would double the wall for
    # no extra evidence)
    inc = (bc.select(F.col("a").alias("node"), "block")
           .union(bc.select(F.col("b").alias("node"), "block")))
    art = (inc.groupBy("node")
           .agg(F.countDistinct("block").alias("nb"))
           .select("node", (F.col("nb") >= 2).alias("is_art"))
           .cache())
    n_art = art.where("is_art").count()
    bad_art = art.where(
        F.col("is_art") != ((F.col("node") % base == 0)
                            & (F.col("node") >= base)
                            & (F.col("node") <= (R - 1) * base))).count()
    wall_art = time.time() - t0
    assert n_art == R - 1, (n_art, R - 1)
    assert bad_art == 0, bad_art
    print(f"OK: {R:,} blocks (one per {C}-cycle, labels exact) and "
          f"exactly the {R - 1:,} shared articulation vertices on "
          f"{R * C:,} edges; biconnected {wall_bc:.1f}s, "
          f"articulation {wall_art:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
