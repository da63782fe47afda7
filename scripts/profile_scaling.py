"""Localize the non-scaling component of the scaling-bench job: time each
phase separately (materialized between phases) at a given core count.

Usage: python scripts/profile_scaling.py <cpus>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PARTS = 64
EDGES_PARQUET = os.environ.get("SCALING_EDGES_DIR", "/tmp/scaling_edges_parquet")


def main(cpus: int) -> None:
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.functions import udfs as U
    from bdtopo2refhydro_spark.operators import (
        select_by_location,
        zonal_pct_in_surface,
    )
    from bdtopo2refhydro_spark.session import get_spark
    from bdtopo2refhydro_spark.sources import (
        edges_df_dist,
        outlet_polygons_df,
        surfaces_df,
    )

    spark = get_spark(f"profile_{cpus}", cores=cpus, shuffle_partitions=N_PARTS)
    edges = spark.read.parquet(EDGES_PARQUET).localCheckpoint()
    edges.count()
    outlets = outlet_polygons_df(spark)
    surfaces = surfaces_df(spark)

    # warmup
    warm = edges_df_dist(spark, 20_000).repartition(N_PARTS).localCheckpoint()
    warm.count()
    wsel = select_by_location(warm, outlets, cell_size=2000.0)
    wz = zonal_pct_in_surface(wsel, surfaces, cell_size=2000.0)
    wz.count()

    t = {}
    t0 = time.monotonic()
    sel = select_by_location(edges, outlets, cell_size=2000.0).localCheckpoint()
    sel.count()
    t["1_select_by_location"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    zonal = zonal_pct_in_surface(sel, surfaces, cell_size=2000.0).localCheckpoint()
    zonal.count()
    t["2_zonal_pct"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    tiled = zonal.withColumn("ep", U.st_endpoints("geom_wkb")).withColumn(
        "cell", U.cell_of(F.col("ep.x0"), F.col("ep.y0"), 1000.0)
    )
    out = tiled.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("selected"), 1).otherwise(0)).alias("n_sel"),
        F.avg("pct_in_surface").alias("avg_pct"),
    )
    out.select(
        F.count("*").alias("rows"),
        F.expr("bit_xor(xxhash64(cell, n, n_sel, round(avg_pct, 3)))").alias("chk"),
    ).first()
    t["3_tile_agg"] = round(time.monotonic() - t0, 2)

    print(json.dumps({"cpus": cpus, **t,
                      "total": round(sum(t.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
