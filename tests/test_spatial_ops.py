"""Cell-bucketed spatial join + zonal tiling tests (J1/J2/J9)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdtopo2refhydro_spark.geom.wkb import linestring_wkb, polygon_wkb
from bdtopo2refhydro_spark.operators import (
    extract_by_location,
    select_by_location,
    zonal_pct_in_surface,
)


def _rect(x0, y0, x1, y1):
    return polygon_wkb(
        np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    )


@pytest.fixture(scope="module")
def lines(spark):
    rows = [
        ("crossing", linestring_wkb([[-500.0, 500.0], [1500.0, 500.0]])),
        ("inside", linestring_wkb([[100.0, 100.0], [900.0, 900.0]])),
        ("outside", linestring_wkb([[5000.0, 5000.0], [6000.0, 6000.0]])),
        ("far", linestring_wkb([[90000.0, 90000.0], [91000.0, 91000.0]])),
        ("half", linestring_wkb([[500.0, 500.0], [500.0, 1500.0]])),
    ]
    return spark.createDataFrame(rows, "url string, geom_wkb binary")


@pytest.fixture(scope="module")
def polys(spark):
    return spark.createDataFrame(
        [(0, _rect(0, 0, 1000, 1000))], "pid long, geom_wkb binary"
    )


def test_select_by_location(lines, polys):
    out = {r.url: r.selected
           for r in select_by_location(lines, polys, cell_size=700.0).collect()}
    assert out == {
        "crossing": True, "inside": True, "half": True,
        "outside": False, "far": False,
    }


def test_extract_by_location(lines, polys):
    keep = {r.url for r in extract_by_location(lines, polys).collect()}
    assert keep == {"crossing", "inside", "half"}
    drop = {r.url for r in extract_by_location(lines, polys, negate=True).collect()}
    assert drop == {"outside", "far"}


def test_zonal_pct(lines, polys):
    out = {r.url: r.pct_in_surface
           for r in zonal_pct_in_surface(lines, polys, cell_size=700.0).collect()}
    assert out["crossing"] == pytest.approx(50.0)  # 1000 of 2000 inside
    assert out["inside"] == pytest.approx(100.0)
    assert out["half"] == pytest.approx(50.0)
    assert out["outside"] == 0.0 and out["far"] == 0.0


def test_zonal_pct_disjoint_surfaces_sum(spark):
    # line crossing two disjoint rectangles: 30% + 20% = 50%
    line = [("u", linestring_wkb([[0.0, 5.0], [1000.0, 5.0]]))]
    lines = spark.createDataFrame(line, "url string, geom_wkb binary")
    polys = spark.createDataFrame(
        [(0, _rect(0, 0, 300, 10)), (1, _rect(500, 0, 700, 10))],
        "pid long, geom_wkb binary",
    )
    out = zonal_pct_in_surface(lines, polys, cell_size=200.0).collect()
    assert out[0].pct_in_surface == pytest.approx(50.0)


def test_large_cell_and_small_cell_agree(lines, polys):
    big = {r.url: r.selected
           for r in select_by_location(lines, polys, cell_size=10000.0).collect()}
    small = {r.url: r.selected
             for r in select_by_location(lines, polys, cell_size=150.0).collect()}
    assert big == small  # cell size is a perf knob, never a semantics knob


def test_raster_roundtrip_runs(spark):
    """rasterize_counts → raster_vectorize merges horizontally adjacent
    above-threshold cells into maximal runs."""
    from bdtopo2refhydro_spark.operators import (
        raster_vectorize,
        rasterize_counts,
    )

    pts = spark.createDataFrame(
        # row 0: cells x=0,1,2 hot (2 pts each), x=4 hot → runs [0..2],[4]
        # row 1: cell x=0 cold (1 pt)
        [(x * 10.0 + 1.0, 1.0) for x in (0, 0, 1, 1, 2, 2, 4, 4)]
        + [(1.0, 11.0)],
        "x double, y double",
    )
    grid = rasterize_counts(pts, "x", "y", 10.0)
    runs = {
        (r["cy"], r["col_start"], r["col_end"]): (r["n_cells"], r["total"])
        for r in raster_vectorize(grid, threshold=2.0).collect()
    }
    assert runs == {(0, 0, 2): (3, 6), (0, 4, 4): (1, 2)}


def test_dissolve_disjoint_rects(spark):
    """A1: dissolve merges polygons into one multipolygon row; for the
    engine's disjoint surfaces the collection is the union — total area is
    the sum of part areas."""
    import numpy as np
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.functions import udfs as U
    from bdtopo2refhydro_spark.geom.kernels import geom_area
    from bdtopo2refhydro_spark.geom.wkb import polygon_wkb
    from bdtopo2refhydro_spark.operators import dissolve

    def rect(x0, y0, x1, y1):
        return polygon_wkb([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])

    polys = spark.createDataFrame(
        [(0, bytearray(rect(0, 0, 10, 10))), (1, bytearray(rect(20, 0, 25, 4)))],
        "pid int, geom_wkb binary",
    )
    out = dissolve(polys).withColumn("area", U.st_area("geom_wkb")).first()
    assert out["n_parts"] == 2
    assert out["area"] == 100.0 + 20.0
    assert geom_area(bytes(out["geom_wkb"])) == 120.0


def test_salted_repartition_spreads_hot_cell(spark):
    """All rows in ONE dense cell must spread across ~salt partitions
    (the north rule's salted repartition on cell prefix)."""
    import numpy as np
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.geom.wkb import linestring_wkb
    from bdtopo2refhydro_spark.operators import salted_repartition_by_cell

    wkb = bytearray(linestring_wkb(np.array([[10.0, 10.0], [20.0, 20.0]])))
    rows = [(f"u{i}", wkb) for i in range(200)]
    df = spark.createDataFrame(rows, "url string, geom_wkb binary").coalesce(1)
    out = salted_repartition_by_cell(df, salt=8, num_partitions=8)
    parts = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    assert len(parts) >= 3          # hot cell split across partitions
    assert max(r["count"] for r in parts) < 200  # nothing holds everything


def test_spatial_join_shuffle_path_matches_broadcast(spark, lines, polys):
    """The large-polygon-side fallback (shuffle equi-join on cell) must
    produce exactly the broadcast path's hits."""
    from bdtopo2refhydro_spark.operators import spatial as S

    a = sorted(r["url"] for r in
               S.spatial_join_hits(lines, polys, "url", 10.0).collect())
    orig = S.BROADCAST_POLY_ROWS
    try:
        S.BROADCAST_POLY_ROWS = 0  # force the shuffle path
        b = sorted(r["url"] for r in
                   S.spatial_join_hits(lines, polys, "url", 10.0).collect())
    finally:
        S.BROADCAST_POLY_ROWS = orig
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# knn_join (exact grid-bucketed kNN) + compact_cover (multi-res tiling)
# ---------------------------------------------------------------------------


def test_knn_join_hand_checked(spark):
    from bdtopo2refhydro_spark.operators.spatial import knn_join

    data = spark.createDataFrame(
        [(i, i * 10, 0) for i in range(5)], "did long, x long, y long"
    )
    qs = spark.createDataFrame(
        [(100, 1, 0), (101, 38, 5)], "qid long, x long, y long"
    )
    got = {
        (r.qid, r.rn): (r.did, r.d2)
        for r in knn_join(qs, data, k=2, cell_size=4, extent=64).collect()
    }
    assert got == {
        (100, 1): (0, 1), (100, 2): (1, 81),
        (101, 1): (4, 29), (101, 2): (3, 89),
    }


def test_knn_join_matches_brute_force(spark):
    """Random-ish integer points: operator == exact brute force, including
    (d2, did) tie-breaks, across cell sizes that force 1 vs many rounds."""
    pts = [(i, (i * 7919) % 500, (i * 104729) % 500) for i in range(120)]
    data = spark.createDataFrame(pts, "did long, x long, y long")
    qs = spark.createDataFrame(pts[:25], "qid long, x long, y long") \
              .withColumnRenamed("did", "qid")
    expected = {}
    for qid, qx, qy in pts[:25]:
        cand = sorted(
            ((qx - x) ** 2 + (qy - y) ** 2, did) for did, x, y in pts
        )[:4]
        for rn, (d2, did) in enumerate(cand, 1):
            expected[(qid, rn)] = (did, d2)
    from bdtopo2refhydro_spark.operators.spatial import knn_join

    for cs in (8, 100, 1000):  # many rounds / few rounds / single round
        for sc in (False, True):  # queries ARE a subset of data here
            got = {
                (r.qid, r.rn): (r.did, r.d2)
                for r in knn_join(qs, data, k=4, cell_size=cs,
                                  extent=512, self_contained=sc).collect()
            }
            assert got == expected, f"cell_size={cs} self_contained={sc}"


def test_knn_join_fewer_than_k_points(spark):
    """With < k data points the terminal whole-plane round still emits all
    of them (no certificate ever fires)."""
    from bdtopo2refhydro_spark.operators.spatial import knn_join

    data = spark.createDataFrame([(1, 0, 0), (2, 30, 40)],
                                 "did long, x long, y long")
    qs = spark.createDataFrame([(9, 100, 100)], "qid long, x long, y long")
    rows = knn_join(qs, data, k=5, cell_size=16, extent=128) \
        .orderBy("rn").collect()
    assert [(r.did, r.d2, r.rn) for r in rows] == [
        (2, 70 * 70 + 60 * 60, 1), (1, 20000, 2)
    ]


def test_compact_cover_levels(spark):
    from bdtopo2refhydro_spark.functions.cells import CELL_SHIFT
    from bdtopo2refhydro_spark.operators.spatial import compact_cover

    dim = 1 << CELL_SHIFT
    rows = (
        # gid 1: complete 2x2 at origin -> one level-1 parent; lone cell kept
        [(1, x * dim + y) for x in range(2) for y in range(2)]
        + [(1, 5 * dim + 5)]
        # gid 2: complete aligned 4x4 -> recurses to a single level-2 cell
        + [(2, x * dim + y) for x in range(4) for y in range(4)]
        # gid 3: 2x2 NOT aligned (offset 1) -> nothing compacts
        + [(3, (x + 1) * dim + (y + 1)) for x in range(2) for y in range(2)]
    )
    cov = spark.createDataFrame(rows, "gid long, cell long")
    got = {(r.gid, r.level, r.cell)
           for r in compact_cover(cov, levels=2).collect()}
    assert got == (
        {(1, 0, 5 * dim + 5), (1, 1, 0), (2, 2, 0)}
        | {(3, 0, (x + 1) * dim + (y + 1)) for x in range(2) for y in range(2)}
    )


def test_compact_cover_dedups_input(spark):
    """Overlapping multi-part covers: duplicates collapse before counting,
    so a duplicated sibling can't fake a complete block."""
    from bdtopo2refhydro_spark.functions.cells import CELL_SHIFT
    from bdtopo2refhydro_spark.operators.spatial import compact_cover

    dim = 1 << CELL_SHIFT
    # three distinct siblings, one of them twice: must stay level 0
    cov = spark.createDataFrame(
        [(1, 0), (1, 1), (1, dim), (1, dim)], "gid long, cell long"
    )
    got = sorted((r.level, r.cell)
                 for r in compact_cover(cov, levels=1).collect())
    assert got == [(0, 0), (0, 1), (0, dim)]


def test_dbscan_grid_chain_cluster_border_and_noise(spark):
    """Golden DBSCAN: a chain of points spaced 9 apart (eps=10,
    min_pts=3) — every interior point is core, the chain is ONE
    cluster (exercises multi-round CC, not a complete graph), the
    endpoints are core too (self + 1 nbr + ... wait: ends have 2
    neighbors incl self = 2 < 3? no: self + one inner = 2) — ends are
    BORDER, attached to the chain's cluster; a far point is noise."""
    from bdtopo2refhydro_spark.operators.spatial import dbscan_grid

    # chain at y=0: x = 0, 9, 18, ..., 72 (9 points); noise at (500, 500)
    pts = [(i, float(9 * i), 0.0) for i in range(9)] + [(99, 500.0, 500.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = {r["id"]: (r["is_core"], r["cluster"])
           for r in dbscan_grid(df, eps=10.0, min_pts=3).collect()}
    # interior points: self + 2 nbrs = 3 -> core; ends: self + 1 = 2 -> border
    for i in range(1, 8):
        assert out[i] == (True, 1), (i, out[i])  # min core id = 1
    assert out[0] == (False, 1)
    assert out[8] == (False, 1)
    assert out[99] == (False, None)
