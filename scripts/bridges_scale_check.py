"""Natural-scale check for graph.bridges: a chain of R disjoint
C-cycles joined by single connector edges — every connector is a
bridge (removing it splits the chain), every cycle edge is not, so the
ground truth is CLOSED FORM at any scale. Default R=20,000 C=100 →
2,000,000 nodes, 2,019,999 edges: Borůvka spans ~2M nodes, the Euler
tour list-ranks ~4M directed edges (~22 pointer doublings), and the
two-level prefix-XOR scan covers the whole subtree battery — all the
machinery the sf fixtures exercise at 339 edges, at the scale where
the round structure actually matters.

Run: python scripts/bridges_scale_check.py [R] [C]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

R = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.operators.graph import bridges
    from bdtopo2refhydro_spark.session import get_spark

    spark = get_spark("bridges_scale", cores=8, shuffle_partitions=64)
    n = R * C
    # cycle edges: unit r holds nodes rC..rC+C-1; edge i -> next in
    # cycle. connectors: (rC, (r+1)C)
    cyc = spark.range(0, n).selectExpr(
        "id as u",
        f"cast(id div {C} as long) * {C}"
        f" + cast((id % {C}) + 1 as long) % {C} as v")
    conn = spark.range(0, R - 1).selectExpr(
        f"id * {C} as u", f"(id + 1) * {C} as v")
    edges = cyc.unionByName(conn)
    t0 = time.time()
    out = bridges(edges).cache()
    n_edges = out.count()
    n_bridges = out.where("is_bridge").count()
    wall = time.time() - t0
    # every bridge must be a connector: a < b with a % C == 0,
    # b == a + C
    bad = out.where(
        F.col("is_bridge") & ~((F.col("a") % C == 0)
                               & (F.col("b") == F.col("a") + C))).count()
    assert n_edges == n + R - 1, (n_edges, n + R - 1)
    assert n_bridges == R - 1, (n_bridges, R - 1)
    assert bad == 0, bad
    print(f"OK: bridges found exactly the {R - 1:,} connectors among "
          f"{n + R - 1:,} edges ({R:,} {C}-cycles) in {wall:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
