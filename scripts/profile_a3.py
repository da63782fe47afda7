"""Per-stage wall profile of A3 aggregate_segments at sf0.1.

Times, on a materialized troncon (so upstream cost is excluded):
  1. _chain_roots (degree calc + successor pointers + chase/jump)
  2. the bucketed applyInPandas stitch alone (given checkpointed roots)
Run on an idle box; walls swing with CPU clock state (CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdtopo2refhydro_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from bdtopo2refhydro_spark.plans import run_reference_network
    import bdtopo2refhydro_spark.operators.aggregate as A

    edges = entry._tree_geom_edges(spark, sf_dir)
    troncon, _ = run_reference_network(
        edges, entry._outlet_band(spark), tolerance=1.0, cell_size=5000.0,
        with_segments=False)
    troncon = troncon.localCheckpoint()
    n = troncon.count()
    print(f"troncon rows: {n}")

    for rep in range(3):
        t0 = time.time()
        e = troncon.select("url", "geom_wkb", "NODEA", "NODEB")
        roots = A._chain_roots(e, "url").localCheckpoint()
        n_roots = roots.count()
        t1 = time.time()
        n_out = A.aggregate_segments(troncon, "url").count()
        t2 = time.time()
        print(f"rep{rep}: chain_roots {t1-t0:.2f}s ({n_roots} rows) | "
              f"full A3 (roots+split+stitch) {t2-t1:.2f}s ({n_out} chains)")


if __name__ == "__main__":
    main()
