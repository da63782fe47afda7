"""Unit tests for the pure-numpy WKB geometry kernel (SURVEY.md §5.1)."""

import numpy as np
import pytest

from bdtopo2refhydro_spark.geom import (
    bbox,
    boundary,
    buffer_geom,
    endpoints,
    geom_length,
    intersection_length,
    line_intersects_polygon,
    linestring_wkb,
    make_valid,
    multipolygon_wkb,
    parse_wkb,
    point_in_polygon,
    point_wkb,
    polygon_wkb,
    reverse_line,
    GeomType,
)
from bdtopo2refhydro_spark.geom.kernels import _poly_parts


SQUARE = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)


def test_wkb_roundtrip_linestring():
    coords = np.array([[1.5, 2.5], [3.0, 4.0], [5.0, 5.0]])
    gtype, parsed = parse_wkb(linestring_wkb(coords))
    assert gtype == GeomType.LINESTRING
    np.testing.assert_allclose(parsed, coords)


def test_wkb_roundtrip_polygon_with_hole():
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=float)
    gtype, rings = parse_wkb(polygon_wkb([SQUARE, hole]))
    assert gtype == GeomType.POLYGON
    assert len(rings) == 2
    np.testing.assert_allclose(rings[1], hole)


def test_length():
    assert geom_length(linestring_wkb([[0, 0], [3, 4]])) == pytest.approx(5.0)
    assert geom_length(linestring_wkb([[0, 0], [3, 4], [3, 10]])) == pytest.approx(11.0)
    assert geom_length(point_wkb(1, 1)) == 0.0


def test_reverse_is_involution():
    coords = np.array([[0, 0], [1, 2], [3, 4]], dtype=float)
    w = linestring_wkb(coords)
    assert reverse_line(reverse_line(w)) == w
    _, rev = parse_wkb(reverse_line(w))
    np.testing.assert_allclose(rev, coords[::-1])


def test_endpoints():
    assert endpoints(linestring_wkb([[1, 2], [5, 5], [7, 8]])) == (1, 2, 7, 8)


def test_bbox():
    assert bbox(linestring_wkb([[1, 9], [5, 2]])) == (1, 2, 5, 9)
    assert bbox(polygon_wkb(SQUARE)) == (0, 0, 10, 10)


def test_boundary():
    gtype, coords = parse_wkb(boundary(polygon_wkb(SQUARE)))
    assert gtype == GeomType.LINESTRING
    np.testing.assert_allclose(coords, SQUARE)


def test_make_valid_closes_and_dedups():
    open_ring = np.array([[0, 0], [10, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    gtype, rings = parse_wkb(make_valid(polygon_wkb(open_ring)))
    r = rings[0]
    np.testing.assert_allclose(r[0], r[-1])
    assert len(r) == 5  # 4 distinct corners + closure


def test_make_valid_orients_ccw():
    cw = SQUARE[::-1]
    _, rings = parse_wkb(make_valid(polygon_wkb(cw)))
    x, y = rings[0][:-1, 0], rings[0][:-1, 1]
    area = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert area > 0


def test_point_in_polygon():
    assert point_in_polygon(5, 5, [SQUARE])
    assert not point_in_polygon(15, 5, [SQUARE])
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=float)
    assert not point_in_polygon(3, 3, [SQUARE, hole])  # in the hole
    assert point_in_polygon(5, 5, [SQUARE, hole])


def test_line_intersects_polygon():
    polys = [[SQUARE]]
    crossing = np.array([[-5, 5], [15, 5]], dtype=float)
    inside = np.array([[2, 2], [8, 8]], dtype=float)
    outside = np.array([[20, 20], [30, 30]], dtype=float)
    touching = np.array([[10, 5], [20, 5]], dtype=float)
    assert line_intersects_polygon(crossing, polys)
    assert line_intersects_polygon(inside, polys)
    assert not line_intersects_polygon(outside, polys)
    assert line_intersects_polygon(touching, polys)


def test_intersection_length():
    polys = [[SQUARE]]
    crossing = np.array([[-5, 5], [15, 5]], dtype=float)  # 10 inside
    assert intersection_length(crossing, polys) == pytest.approx(10.0)
    inside = np.array([[2, 5], [8, 5]], dtype=float)
    assert intersection_length(inside, polys) == pytest.approx(6.0)
    outside = np.array([[20, 20], [30, 20]], dtype=float)
    assert intersection_length(outside, polys) == pytest.approx(0.0)
    # segment exiting through a corner-ish path, multi-vertex
    multi = np.array([[5, 5], [5, 15], [5, 25]], dtype=float)
    assert intersection_length(multi, polys) == pytest.approx(5.0)


def test_intersection_length_with_hole():
    hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], dtype=float)
    polys = [[SQUARE, hole]]
    line = np.array([[-5, 5], [15, 5]], dtype=float)
    # inside outer 10, minus 6 crossing the hole
    assert intersection_length(line, polys) == pytest.approx(4.0)


def test_is_convex_ccw():
    from bdtopo2refhydro_spark.geom.kernels import is_convex_ccw

    assert is_convex_ccw(SQUARE)
    assert not is_convex_ccw(SQUARE[::-1])  # CW
    concave = np.array(
        [[0, 0], [10, 0], [10, 10], [5, 2], [0, 10], [0, 0]], dtype=float
    )
    assert not is_convex_ccw(concave)


def test_clip_intervals_convex_matches_general_path():
    from bdtopo2refhydro_spark.geom.kernels import clip_intervals_convex

    P = np.array([[-5, 5], [2, 5], [20, 20], [10, 5], [-5, -5]], dtype=float)
    Q = np.array([[15, 5], [8, 5], [30, 20], [20, 5], [15, 15]], dtype=float)
    t0, t1 = clip_intervals_convex(P, Q, SQUARE)
    seg_len = np.hypot(*(Q - P).T)
    lens = np.maximum(np.minimum(t1, 1) - np.maximum(t0, 0), 0) * seg_len
    expected = [
        intersection_length(np.array([p, q]), [[SQUARE]])
        for p, q in zip(P, Q)
    ]
    np.testing.assert_allclose(lens, expected, atol=1e-9)


def test_clip_intervals_convex_overflow_lane_no_warning():
    """A near-degenerate segment (denormal y-delta) makes d tiny-nonzero
    on its parallel lanes while c stays moderate → |c/d| overflows float
    max in the vectorized divide. The lane is discarded (|d| < eps ⇒
    parallel), so the errstate must cover over= and the result must be
    the correct EMPTY interval — regression for the RuntimeWarning audit
    (VERDICT r3 item 8)."""
    import warnings

    from bdtopo2refhydro_spark.geom.kernels import clip_intervals_convex

    # vs the top edge: c ≈ 100, d ≈ -2e-310 → t ≈ 5e311 overflows;
    # the segment sits at x=20, fully outside the square
    P = np.array([[20.0, 1e-311]])
    Q = np.array([[20.0, 3e-311]])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        t0, t1 = clip_intervals_convex(P, Q, SQUARE)
    assert t0[0] > t1[0]  # empty interval: no intersection


def test_buffer_point_is_circle():
    gtype, rings = parse_wkb(buffer_geom(point_wkb(0, 0), 10.0))
    assert gtype == GeomType.POLYGON
    r = np.hypot(rings[0][:, 0], rings[0][:, 1])
    np.testing.assert_allclose(r, 10.0)


def test_buffer_line_capsules_cover_distance_band():
    line = linestring_wkb([[0, 0], [100, 0]])
    buf = buffer_geom(line, 50.0)
    polys = _poly_parts(parse_wkb(buf))
    # points within 50m of the segment are inside some capsule
    assert any(point_in_polygon(50, 49, rings) for rings in polys)
    assert any(point_in_polygon(-30, 0, rings) for rings in polys)  # cap zone
    assert not any(point_in_polygon(50, 51, rings) for rings in polys)
    assert not any(point_in_polygon(-60, 0, rings) for rings in polys)


def test_udfs_pass_through_null_geometries(spark):
    """NULL WKB rows flow through the UDF surface as NULL results instead
    of crashing the batch (a corrupt crawl record must not kill a task)."""
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.functions import udfs as U

    df = spark.createDataFrame(
        [("a", None)], "url string, geom_wkb binary"
    )
    row = df.select(
        U.st_length("geom_wkb").alias("l"),
        U.st_reverse("geom_wkb").alias("r"),
        U.st_make_valid("geom_wkb").alias("v"),
        U.st_area("geom_wkb").alias("ar"),
    ).first()
    assert row["l"] is None and row["r"] is None
    assert row["v"] is None and row["ar"] is None


def test_geom_area_near_open_ring_at_large_coords():
    """VERDICT r2 'What's wrong' #3: closure must be an ABSOLUTE test. A
    ring open by ~1 unit at 1e5-scale coords is within np.allclose's
    relative tolerance, which silently dropped the final vertex from the
    shoelace; the absolute-_EPS check closes it explicitly and keeps it."""
    from bdtopo2refhydro_spark.geom.kernels import geom_area

    base = 100000.0
    ring = np.array(
        [
            [base, base],
            [base + 100, base],
            [base + 100, base + 100],
            [base, base + 100],
            [base + 0.9, base],  # open by 0.9 units — NOT closed
        ]
    )
    # expected: shoelace of the pentagon closed by appending ring[0]
    closed = np.vstack([ring, ring[0]])
    x, y = closed[:-1, 0], closed[:-1, 1]
    expected = abs(
        0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )
    area = geom_area(polygon_wkb(ring))
    assert area == pytest.approx(expected, abs=1e-6)
    assert abs(area - 10000.0) > 10  # the buggy closed-square answer


def test_geom_length_fallback_matches_vectorized_reduction(spark):
    """ADVICE r2: the per-geometry kernel and the batch-vectorized
    st_length must use the SAME sequential reduction so a batch's
    composition (all-LineString vs mixed) never shifts results by ulps.
    Non-integer coords chosen so pairwise vs sequential summation WOULD
    differ if the reductions diverged."""
    from pyspark.sql import functions as F

    from bdtopo2refhydro_spark.functions import udfs as U
    from bdtopo2refhydro_spark.geom.kernels import geom_length
    from bdtopo2refhydro_spark.geom.wkb import multilinestring_wkb

    rng = np.random.RandomState(7)
    coords = np.cumsum(rng.rand(40, 2) * 0.731, axis=0) + 1e5
    line = linestring_wkb(coords)
    # mixed batch: a MultiLineString forces the whole batch onto the
    # per-geometry kernel path; an all-LineString batch vectorizes
    multi = multilinestring_wkb([coords[:20], coords[20:]])
    df_vec = spark.createDataFrame([("a", bytearray(line))],
                                   "url string, geom_wkb binary")
    df_mix = spark.createDataFrame(
        [("a", bytearray(line)), ("m", bytearray(multi))],
        "url string, geom_wkb binary",
    ).coalesce(1)  # one Arrow batch → the MultiLineString forces fallback
    v_vec = df_vec.select(U.st_length("geom_wkb").alias("L")).first()["L"]
    v_mix = {
        r["url"]: r["L"]
        for r in df_mix.select(
            "url", U.st_length("geom_wkb").alias("L")
        ).collect()
    }
    assert v_vec == v_mix["a"]  # bit-identical across batch compositions
    assert v_mix["a"] == geom_length(line)


# ---------------------------------------------------------------------------
# Douglas-Peucker simplification
# ---------------------------------------------------------------------------

def _py_dp(coords, tol):
    """Recursive reference implementation (CLRS-style)."""
    import numpy as np

    def rec(i, j, keep):
        if j - i < 2:
            return
        a, b = coords[i], coords[j]
        d = b - a
        L = np.hypot(d[0], d[1])
        best, bi = -1.0, -1
        for k in range(i + 1, j):
            if L <= 1e-12:
                dist = np.hypot(*(coords[k] - a))
            else:
                dist = abs(d[0] * (coords[k][1] - a[1])
                           - d[1] * (coords[k][0] - a[0])) / L
            if dist > best:
                best, bi = dist, k
        if best > tol:
            keep[bi] = True
            rec(i, bi, keep)
            rec(bi, j, keep)

    keep = [False] * len(coords)
    keep[0] = keep[-1] = True
    rec(0, len(coords) - 1, keep)
    return keep


def test_simplify_dp_matches_reference_on_random_zigzags():
    import numpy as np

    from bdtopo2refhydro_spark.geom import kernels as K

    for seed in range(30):
        rng = np.random.RandomState(seed)
        n = rng.randint(3, 40)
        coords = np.cumsum(rng.randn(n, 2) * 10, axis=0)
        tol = float(rng.uniform(0.5, 15))
        wkb = K.linestring_wkb(coords)
        got = K.parse_wkb(K.simplify_dp(wkb, tol))[1]
        want = coords[np.array(_py_dp(coords, tol))]
        assert np.array_equal(got, want), (seed, tol)


def test_simplify_dp_endpoints_and_straight_line():
    import numpy as np

    from bdtopo2refhydro_spark.geom import kernels as K

    # collinear interior points all collapse, endpoints survive
    coords = np.array([[0, 0], [10, 0], [20, 0], [30, 0]], float)
    out = K.parse_wkb(K.simplify_dp(K.linestring_wkb(coords), 0.5))[1]
    assert np.array_equal(out, coords[[0, 3]])
    # multilinestring simplifies part-wise
    parts = [coords, np.array([[0, 0], [5, 9], [10, 0]], float)]
    mls = K.multilinestring_wkb(parts)
    gtype, data = K.parse_wkb(K.simplify_dp(mls, 0.5))
    assert len(data[0]) == 2 and len(data[1]) == 3
