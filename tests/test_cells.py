"""Cell index tests (F11)."""

import numpy as np

from bdtopo2refhydro_spark.functions.cells import (
    CELL_SHIFT,
    cell_decode,
    cell_id,
    cell_neighbors,
    cover_bbox_cells,
    cover_line_cells,
)


def test_cell_id_roundtrip():
    c = cell_id(12345.6, 98765.4, 1000.0)
    ix, iy = cell_decode(c)
    assert ix == 12 and iy == 98
    assert int(c) == 12 * (1 << CELL_SHIFT) + 98


def test_cell_id_vectorized_matches_scalar():
    xs = np.array([0.0, 999.9, 1000.0, 54321.0])
    ys = np.array([0.0, 1.0, 2000.0, 77.0])
    cells = cell_id(xs, ys, 1000.0)
    for x, y, c in zip(xs, ys, cells):
        assert int(cell_id(x, y, 1000.0)) == int(c)


def test_neighbors_3x3():
    c = int(cell_id(5000.0, 5000.0, 1000.0))
    nbrs = cell_neighbors(c)
    assert len(nbrs) == 9 and c in nbrs
    # all within one step
    ix, iy = cell_decode(c)
    for n in nbrs:
        jx, jy = cell_decode(n)
        assert abs(int(jx) - int(ix)) <= 1 and abs(int(jy) - int(iy)) <= 1


def test_neighbors_clipped_at_origin():
    c = int(cell_id(0.0, 0.0, 1000.0))
    assert len(cell_neighbors(c)) == 4  # corner cell


def test_cover_bbox():
    cells = cover_bbox_cells(0, 0, 2500, 1500, 1000.0)
    assert len(cells) == 3 * 2


def test_cover_line_contains_endpoint_cells():
    coords = np.array([[100.0, 100.0], [5100.0, 100.0], [5100.0, 3100.0]])
    cells = set(cover_line_cells(coords, 1000.0))
    assert int(cell_id(100.0, 100.0, 1000.0)) in cells
    assert int(cell_id(5100.0, 3100.0, 1000.0)) in cells
    # per-segment bboxes, not whole-line bbox: corner cell far from both
    # segments must NOT be covered
    assert int(cell_id(100.0, 3100.0, 1000.0)) not in cells


def test_subdivided_cover_superset_of_touched_cells(spark):
    """The production cover path subdivides long diagonal segments into
    ~cell_size pieces (udfs._subdivide_segments): the result must still
    contain EVERY cell the segment passes through (dense-sample check),
    stay within the old full-bbox cover, and shrink it dramatically for
    long diagonals (the O(W×H) → O(W+H) fix)."""
    import numpy as np

    from bdtopo2refhydro_spark.functions import udfs as U
    from bdtopo2refhydro_spark.functions.cells import CELL_SHIFT
    from bdtopo2refhydro_spark.geom.wkb import linestring_wkb
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    cell = 1000.0
    dim = np.int64(1) << CELL_SHIFT
    rows, expected_supersets, bbox_counts = [], [], []
    for i in range(20):
        a = rng.rand(2) * 90000
        b = a + (rng.rand(2) - 0.5) * 80000
        b = np.clip(b, 0, 99000)
        rows.append((i, bytearray(linestring_wkb(np.vstack([a, b])))))
        # dense sampling: every touched cell appears among the samples
        t = np.linspace(0, 1, 20001)
        pts = a + t[:, None] * (b - a)
        cells = (np.floor(pts[:, 0] / cell).astype(np.int64) * dim
                 + np.floor(pts[:, 1] / cell).astype(np.int64))
        expected_supersets.append(set(cells.tolist()))
        w = abs(np.floor(b[0] / cell) - np.floor(a[0] / cell)) + 1
        h = abs(np.floor(b[1] / cell) - np.floor(a[1] / cell)) + 1
        bbox_counts.append(int(w * h))
    df = spark.createDataFrame(rows, "i int, geom_wkb binary")
    got = {
        r["i"]: set(r["c"])
        for r in df.select(
            "i", U.st_cover_cells(F.col("geom_wkb"), cell).alias("c")
        ).collect()
    }
    total_cover = total_bbox = 0
    for i in range(20):
        assert expected_supersets[i] <= got[i], f"segment {i} lost cells"
        total_cover += len(got[i])
        total_bbox += bbox_counts[i]
    # the whole point: far fewer candidate cells than the bbox cover
    assert total_cover < total_bbox / 3


def test_geohash_canonical_example(spark):
    """geohash_expr matches the published geohash.org reference value
    for (57.64911N, 10.40744E) -> u4pruydqqvj at several precisions,
    in BOTH dialects."""
    import duckdb

    from bdtopo2refhydro_spark.functions.cells import geohash_expr

    for prec in (1, 4, 6, 11):
        want = "u4pruydqqvj"[:prec]
        got_s = spark.sql(
            "SELECT " + geohash_expr("lon", "lat", prec) + " AS g FROM "
            "(SELECT CAST(10.40744 AS DOUBLE) lon, "
            "CAST(57.64911 AS DOUBLE) lat)").first()["g"]
        got_d = duckdb.sql(
            "SELECT " + geohash_expr("lon", "lat", prec, dialect="duckdb")
            + " AS g FROM (SELECT 10.40744::DOUBLE lon, "
            "57.64911::DOUBLE lat)").fetchone()[0]
        assert got_s == want == got_d, (prec, got_s, got_d)


def test_geohash_edges_clamp(spark):
    """lon=180 / lat=90 clamp into the top cell instead of overflowing
    the bit budget; the antipode corner is all-zero bits ('0'*p)."""
    from bdtopo2refhydro_spark.functions.cells import geohash_expr

    rows = spark.sql(
        "SELECT " + geohash_expr("lon", "lat", 4) + " AS g FROM VALUES "
        "(CAST(180.0 AS DOUBLE), CAST(90.0 AS DOUBLE)), "
        "(CAST(-180.0 AS DOUBLE), CAST(-90.0 AS DOUBLE)) AS t(lon, lat)"
    ).collect()
    assert rows[0]["g"] == "zzzz" and rows[1]["g"] == "0000"
