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
