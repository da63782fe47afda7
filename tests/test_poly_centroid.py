"""polygon_centroid vs python shoelace, both orientations."""

import random

from bdtopo2refhydro_spark.operators.spatial import polygon_centroid


def _ref(poly):
    a2 = cxn = cyn = 0
    n = len(poly)
    for i in range(n):
        x, y = poly[i]
        xn, yn = poly[(i + 1) % n]
        c = x * yn - xn * y
        a2 += c
        cxn += (x + xn) * c
        cyn += (y + yn) * c
    return a2, cxn / (3 * a2), cyn / (3 * a2)


def test_polygon_centroid_vs_reference(spark):
    rng = random.Random(11)
    polys = {
        0: [(0, 0), (10, 0), (10, 10), (0, 10)],           # CCW square
        1: [(0, 0), (0, 6), (8, 6), (8, 0)],               # CW (negative)
        2: [(0, 0), (4, 1), (5, 4), (2, 6), (-1, 3)],      # pentagon
        3: [(0, 0), (6, 0), (6, 2), (2, 2), (2, 5), (0, 5)],  # L-shape
    }
    rows = [(pid, i, x, y) for pid, poly in polys.items()
            for i, (x, y) in enumerate(poly)]
    df = spark.createDataFrame(rows, "pid long, vid long, x long, y long")
    got = {r["pid"]: (r["a2"], r["cx"], r["cy"])
           for r in polygon_centroid(df).collect()}
    for pid, poly in polys.items():
        a2, cx, cy = _ref(poly)
        assert got[pid] == (a2, cx, cy), pid
    assert got[0][0] == 200 and got[1][0] == -96  # orientation signs
    assert (got[0][1], got[0][2]) == (5.0, 5.0)
