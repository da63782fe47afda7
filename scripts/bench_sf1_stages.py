"""sf1 per-stage wall breakdown (VERDICT r4 'Next round' #3): run the
flagship reference_network pipeline at /tmp/sf1 (and a comparison
sf_dir, default sf0.1) with each stage forced through an EAGER
localCheckpoint + count so the stage split is visible, plus total walls
for the other headline composites. Prints a markdown-ready table for
PLANS.md and one JSON line.

Stage forcing adds wall vs the fused pipeline (PLANS.md records ~+4s at
sf0.1) — the per-stage numbers are for SHAPE comparison across scales
(what grows linearly, what doesn't), not absolute throughput; bench.py
remains the headline number.

Usage: [SPARK_GRAFT_CPUS=32] python scripts/bench_sf1_stages.py \
           [sf_dir=/tmp/sf1] [compare_dir=/root/testdata/sf0.1]
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def refnet_stages(spark, sf_dir: str) -> dict[str, float]:
    """run_reference_network stage for stage (pipelines.py:101), each
    forced eagerly. Mirrors the pipeline exactly; any drift shows up as
    a row-count mismatch vs the fused driver query."""
    import __spark_entry__ as E
    from bdtopo2refhydro_spark.functions import udfs as U
    from bdtopo2refhydro_spark.operators import (
        aggregate_segments,
        dedup_geometries,
        edges_touching,
        identify_network_nodes,
        principal_stem,
        select_by_location,
        select_connected,
    )

    walls: dict[str, float] = {}

    def stage(name, df):
        t0 = time.monotonic()
        out = df.localCheckpoint()  # eager
        walls[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {walls[name]}s", flush=True)
        return out

    edges = E._tree_geom_edges(spark, sf_dir)
    e = stage("A2_dedup", dedup_geometries(edges, "geom_wkb"))
    e = stage("G1_node_ids",
              identify_network_nodes(e, "url", tolerance=1.0)
              .withColumn("len", U.st_length("geom_wkb")))
    seeded = stage("J1_outlet_join",
                   select_by_location(e, E._outlet_band(spark), "url",
                                      cell_size=5000.0))
    seed_edges = seeded.filter(F.col("selected"))
    seed_nodes = (seed_edges.select(F.col("NODEA").alias("node"))
                  .union(seed_edges.select(F.col("NODEB"))).distinct())
    visited = stage("G2_traversal",
                    select_connected(e, seed_nodes, "both"))
    troncon = stage("touch_semi",
                    e.join(edges_touching(e, visited, "url"), "url",
                           "left_semi"))
    outlet_nodes = seed_edges.select(F.col("NODEB").alias("node")).distinct()
    troncon = stage("G4_principal_stem",
                    principal_stem(troncon, outlet_nodes, "url"))
    seg = stage("A3_agg_segments", aggregate_segments(troncon, "url"))
    walls["_troncon_rows"] = troncon.count()
    walls["_segment_rows"] = seg.count()
    return walls


def headline_total(spark, sf_dir: str, name: str) -> float:
    import __spark_entry__ as E
    from bdtopo2refhydro_spark.operators._ckpt import (
        release_all_persistent,
    )

    t0 = time.monotonic()
    df = E.queries()[name](spark, sf_dir)
    df.select(F.count("*"), F.expr(
        "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns)
        + "))")).first()
    wall = round(time.monotonic() - t0, 2)
    release_all_persistent(spark)
    spark.catalog.clearCache()
    return wall


def main() -> int:
    from bdtopo2refhydro_spark.operators._ckpt import (
        release_all_persistent,
    )
    from bdtopo2refhydro_spark.session import get_spark

    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    cmp_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-sf1", cores=cpus,
                      shuffle_partitions=int(cpus))

    out = {}
    for label, d in (("sf0.1", cmp_dir), ("sf1", sf1)):
        print(f"== reference_network stages @ {label} ({d}) ==",
              flush=True)
        out[f"refnet_stages_{label}"] = refnet_stages(spark, d)
        release_all_persistent(spark)
        spark.catalog.clearCache()
        for q in ("zonal_pct", "curation_pipeline", "refresh_pipeline"):
            w = headline_total(spark, d, q)
            out[f"{q}_{label}"] = w
            print(f"  {q} @ {label}: {w}s", flush=True)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
