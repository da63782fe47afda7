"""Property tests (SURVEY.md §5.4) over the pure-numpy geometry kernel and
cell index — no SparkSession, so they run in milliseconds and explore the
input space via hypothesis."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdtopo2refhydro_spark.functions import cells as C  # noqa: E402
from bdtopo2refhydro_spark.geom import kernels as K  # noqa: E402
from bdtopo2refhydro_spark.geom.wkb import (  # noqa: E402
    linestring_wkb,
    parse_wkb,
    polygon_wkb,
)

coord = st.floats(min_value=0.0, max_value=1e5, allow_nan=False,
                  allow_infinity=False, width=64)


def _line(pts):
    return linestring_wkb(np.array(pts, dtype=np.float64))


@st.composite
def polylines(draw, min_pts=2, max_pts=8):
    n = draw(st.integers(min_pts, max_pts))
    pts = [(draw(coord), draw(coord)) for _ in range(n)]
    hypothesis.assume(
        all(abs(a[0] - b[0]) + abs(a[1] - b[1]) > 1e-9
            for a, b in zip(pts, pts[1:]))
    )
    return pts


@settings(max_examples=200, deadline=None)
@given(polylines())
def test_reverse_involution_and_length_invariance(pts):
    wkb = _line(pts)
    rev = K.reverse_line(wkb)
    assert K.reverse_line(rev) == wkb
    assert K.geom_length(rev) == pytest.approx(K.geom_length(wkb), rel=1e-12)


@settings(max_examples=200, deadline=None)
@given(polylines())
def test_endpoints_swap_under_reverse(pts):
    x0, y0, x1, y1 = K.endpoints(_line(pts))
    rx0, ry0, rx1, ry1 = K.endpoints(K.reverse_line(_line(pts)))
    assert (rx0, ry0, rx1, ry1) == (x1, y1, x0, y0)


@settings(max_examples=200, deadline=None)
@given(polylines(), st.sampled_from([100.0, 1000.0, 5000.0]))
def test_cover_contains_endpoint_cells(pts, cell_size):
    cover = set(C.cover_line_cells(np.array(pts), cell_size))
    for x, y in pts:
        assert C.cell_id(x, y, cell_size) in cover


@settings(max_examples=200, deadline=None)
@given(coord, coord, st.sampled_from([100.0, 1000.0]))
def test_cell_roundtrip_and_neighbors(x, y, cell_size):
    cid = C.cell_id(x, y, cell_size)
    ix, iy = C.cell_decode(cid)
    assert ix == int(np.floor(x / cell_size)) and iy == int(np.floor(y / cell_size))
    nbrs = C.cell_neighbors(cid)
    # neighborhood includes self by design (the snapping join's candidate
    # set), is duplicate-free, and stays within the grid bounds
    assert len(set(nbrs)) == len(nbrs)
    assert cid in nbrs
    assert len(nbrs) <= 9


@settings(max_examples=100, deadline=None)
@given(coord, coord, st.floats(min_value=1.0, max_value=5e4,
                               allow_nan=False, width=64),
       st.floats(min_value=1.0, max_value=5e4, allow_nan=False, width=64))
def test_rect_make_valid_idempotent_and_area(x0, y0, w, h):
    ring = np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                     [x0, y0 + h], [x0, y0]])
    wkb = polygon_wkb([ring])
    fixed = K.make_valid(wkb)
    assert K.make_valid(fixed) == fixed
    # shoelace on small rects far from the origin cancels ~1e10-magnitude
    # products → absolute error up to ~1e-4 is inherent double behavior
    assert K.geom_area(fixed) == pytest.approx(w * h, rel=1e-6, abs=1e-3)
    assert K.geom_length(fixed) == pytest.approx(2 * (w + h), rel=1e-9)


@settings(max_examples=200, deadline=None)
@given(polylines(2, 2), st.sampled_from([500.0, 2000.0]))
def test_cell_clip_lengths_sum_to_segment_length(pts, cell_size):
    """The zonal correctness keystone (SURVEY §7, spatial.py module doc):
    per-cell Cyrus-Beck clip intervals over the segment's cover partition
    the segment exactly — this is why the zonal operator may sum per-cell
    intersection lengths without deduping candidates."""
    seg = np.array(pts)
    p, q = seg[:1], seg[1:2]
    seg_len = K.geom_length(_line(pts))
    total = 0.0
    for cid in C.cover_line_cells(seg, cell_size):
        ix, iy = C.cell_decode(cid)
        ring = np.array([
            [ix * cell_size, iy * cell_size],
            [(ix + 1) * cell_size, iy * cell_size],
            [(ix + 1) * cell_size, (iy + 1) * cell_size],
            [ix * cell_size, (iy + 1) * cell_size],
            [ix * cell_size, iy * cell_size],
        ])
        t0, t1 = K.clip_intervals_convex(p, q, ring)
        total += max(float(t1[0] - t0[0]), 0.0) * seg_len
    assert total == pytest.approx(seg_len, rel=1e-9, abs=1e-9)
