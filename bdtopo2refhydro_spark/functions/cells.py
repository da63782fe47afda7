"""Hierarchical grid-cell encoding (the engine's H3/S2 stand-in).

The reference builds a QGIS in-memory spatial index before each spatial join
(create_connected_reference_hydro.py:169-171, fix_suppr_canal_auto.py:87-90).
Spark has no spatial index, so the engine replaces it with *cell bucketing*:
every geometry is covered by a set of grid cells at a chosen cell size, the
cover is exploded to rows, and the spatial join becomes an equi-join on
``cell`` followed by an exact geometric refine (SURVEY.md §4).

Cell id layout (int64, deterministic pure arithmetic — identical in Spark
SQL, DuckDB SQL, and numpy, so cell assignments are oracle-checkable):

    cell = ix * 2^26 + iy        with  ix = floor(x / cell_size),
                                       iy = floor(y / cell_size)

Valid for 0 <= x,y < cell_size * 2^26 — ample for EPSG:2154-style planar
meters (Lambert-93 x,y < 1.3e7 even at cell_size=1). Negative coords are
clamped to 0 (engine fixtures are in [0, 1e5]^2).
"""

from __future__ import annotations

import numpy as np

CELL_SHIFT = 26
_DIM = np.int64(1) << CELL_SHIFT  # 2^26


def cell_id(x, y, cell_size: float):
    """Vectorized (x, y) → int64 cell id. Accepts scalars or ndarrays."""
    ix = np.floor(np.maximum(np.asarray(x, dtype=np.float64), 0.0) / cell_size).astype(np.int64)
    iy = np.floor(np.maximum(np.asarray(y, dtype=np.float64), 0.0) / cell_size).astype(np.int64)
    return ix * _DIM + iy


def cell_decode(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return cell // _DIM, cell % _DIM


def cell_neighbors(cell: int, ring: int = 1) -> list[int]:
    """The (2*ring+1)^2 neighborhood incl. self — candidate generation for
    kNN / tolerance snapping (graft generalization of the reference's
    quantized-endpoint equality, SURVEY.md G1)."""
    ix, iy = int(cell) // int(_DIM), int(cell) % int(_DIM)
    out = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < _DIM and 0 <= jy < _DIM:
                out.append(jx * int(_DIM) + jy)
    return out


def cover_segment_cells(p, q, cell_size: float) -> set[int]:
    """Cells overlapped by segment p→q's bbox (conservative superset — safe
    because every cell-join is followed by an exact refine)."""
    x0, x1 = sorted((float(p[0]), float(q[0])))
    y0, y1 = sorted((float(p[1]), float(q[1])))
    return cover_bbox_cells(x0, y0, x1, y1, cell_size)


def cover_bbox_cells(xmin, ymin, xmax, ymax, cell_size: float) -> set[int]:
    ix0 = max(int(np.floor(xmin / cell_size)), 0)
    ix1 = max(int(np.floor(xmax / cell_size)), 0)
    iy0 = max(int(np.floor(ymin / cell_size)), 0)
    iy1 = max(int(np.floor(ymax / cell_size)), 0)
    dim = int(_DIM)
    return {
        ix * dim + iy
        for ix in range(ix0, ix1 + 1)
        for iy in range(iy0, iy1 + 1)
    }


def cover_line_cells(coords: np.ndarray, cell_size: float) -> list[int]:
    """Cell cover of a polyline = union of per-segment bbox covers. Tighter
    than whole-line bbox for long diagonal lines (the skew killer)."""
    cells: set[int] = set()
    if len(coords) == 1:
        return sorted(cover_bbox_cells(coords[0, 0], coords[0, 1],
                                       coords[0, 0], coords[0, 1], cell_size))
    for i in range(len(coords) - 1):
        cells |= cover_segment_cells(coords[i], coords[i + 1], cell_size)
    return sorted(cells)


def zorder_key_expr(ix_col: str, iy_col: str, bits: int = 26) -> str:
    """Spark-SQL expression interleaving the low ``bits`` of two
    non-negative BIGINT axis indices into one Morton/Z-order key
    (ix bit b → key bit 2b, iy bit b → key bit 2b+1; 2·bits ≤ 62 so the
    key stays a positive BIGINT). Pure integer bit arithmetic — DuckDB
    evaluates the identical formula, so Z keys are oracle-checkable.

    Z-ordering is the storage-layout half of the tiling story: sorting a
    corpus by this key before writing makes spatially-adjacent rows
    file-adjacent, so a tile-range scan prunes row groups by min/max
    stats instead of reading the corpus (the same role CLUSTER BY
    zorder plays in lakehouse engines)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    terms = []
    for b in range(bits):
        terms.append(f"(shiftleft(shiftright({ix_col}, {b}) & 1, {2 * b}))")
        terms.append(f"(shiftleft(shiftright({iy_col}, {b}) & 1, {2 * b + 1}))")
    return "(" + " + ".join(terms) + ")"


def hilbert_steps(bits: int, x: str = "hx", y: str = "hy",
                  d: str = "hd") -> list[tuple[str, str, str]]:
    """Per-level SQL step expressions for the Hilbert curve index of a
    2^bits × 2^bits grid — the locality key whose consecutive cells are
    always EDGE-adjacent (Morton/Z-order jumps across the plane at
    power-of-two boundaries; Hilbert never does, so range scans touch
    tighter spatial neighborhoods for the same key interval).

    Returns one (x_expr, y_expr, d_expr) triple per level; callers
    chain them (Spark: selectExpr chain; DuckDB: CTE chain). The
    expressions are DIALECT-NEUTRAL on purpose: only CASE, &, +, −, ×
    — no '^' (exponent in DuckDB) and no 'div' (Spark-only) — so the
    exact same strings drive both engines. Quadrant math per level s:
    rx = (x&s)>0, ry = (y&s)>0, d += s²·((3rx) XOR ry) with the XOR
    replaced by its arithmetic form 3rx + ry − 2·rx·ry, then the
    sub-square is masked and (reflect + transpose)-rotated when ry=0.
    """
    steps = []
    for level in range(bits):
        s = 1 << (bits - 1 - level)
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        xm = f"({x} & {s - 1})"
        ym = f"({y} & {s - 1})"
        d_expr = (f"({d} + {s * s} * "
                  f"(3 * {rx} + {ry} - 2 * {rx} * {ry}))")
        x_expr = (f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                  f"THEN {s - 1} - {ym} ELSE {ym} END) "
                  f"ELSE {xm} END)")
        y_expr = (f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                  f"THEN {s - 1} - {xm} ELSE {xm} END) "
                  f"ELSE {ym} END)")
        steps.append((x_expr, y_expr, d_expr))
    return steps


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lon_col: str, lat_col: str, precision: int = 6,
                 dialect: str = "spark") -> str:
    """SQL expression computing the standard base-32 geohash of
    (``lon_col``, ``lat_col``) DOUBLE columns at ``precision`` chars —
    the textual cell encoding of the H3/S2 family (bit-interleaved
    lon/lat, lon first, MSB first, 5 bits per character).

    The whole computation is one expression of IEEE double arithmetic
    (one add, one divide, one multiply, one floor per axis) followed by
    pure integer bit shuffling, written token-identically for the
    ``spark`` and ``duckdb`` dialects — so geohash assignments are
    value-oracle-checkable across engines (same discipline as
    ``zorder_key_expr``). Inputs must satisfy -180 ≤ lon ≤ 180,
    -90 ≤ lat ≤ 90; the edge values clamp to the top cell.

    Parity with the published algorithm (geohash.org): pinned in
    tests/test_cells.py against the canonical (57.64911, 10.40744) →
    ``u4pruy`` example.
    """
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2  # lon leads on odd totals
    lat_bits = nbits // 2

    def _axis(col: str, lo: float, span: float, bits: int) -> str:
        scaled = (f"CAST(floor(({col} + {lo:.1f}) / {span:.1f} * "
                  f"{1 << bits}.0) AS BIGINT)")
        # exact top edge (lon=180 / lat=90) lands one past the last cell
        return f"least({scaled}, {(1 << bits) - 1})"

    lon_i = _axis(lon_col, 180.0, 360.0, lon_bits)
    lat_i = _axis(lat_col, 90.0, 180.0, lat_bits)

    def _bit(src: str, shift: int) -> str:
        if dialect == "spark":
            return f"(shiftright({src}, {shift}) & 1)"
        return f"(({src}) >> {shift} & 1)"

    chars = []
    for k in range(precision):
        terms = []
        for j in range(5 * k, 5 * k + 5):
            if j % 2 == 0:  # even global bit positions come from lon
                b = _bit("__ghx", lon_bits - 1 - j // 2)
            else:
                b = _bit("__ghy", lat_bits - 1 - (j - 1) // 2)
            terms.append(f"({b} << {5 * k + 4 - j})" if dialect == "duckdb"
                         else f"shiftleft({b}, {5 * k + 4 - j})")
        val = "(" + " + ".join(terms) + ")"
        chars.append(f"substring('{GEOHASH_BASE32}', {val} + 1, 1)")
    body = "concat(" + ", ".join(chars) + ")"
    # bind the axis indices once via a scalar subquery-free inline: both
    # dialects lack LET in expressions, so textually substitute
    return body.replace("__ghx", lon_i).replace("__ghy", lat_i)
