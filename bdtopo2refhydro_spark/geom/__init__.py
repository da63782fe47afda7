"""Pure-numpy geometry kernel over WKB (no shapely/GEOS in this environment).

Scope: exactly the scalar surface the reference uses (SURVEY.md §2.6
F1-F8) — planar EPSG:2154-style meters, LineString/Polygon/Multi* only,
little-endian WKB. Correct for the engine's synthetic shapes and the
oracle tests; not an OGC-complete library.
"""

from .wkb import (  # noqa: F401
    GeomType,
    parse_wkb,
    point_wkb,
    linestring_wkb,
    polygon_wkb,
    multilinestring_wkb,
    multipolygon_wkb,
)
from .kernels import (  # noqa: F401
    geom_length,
    reverse_line,
    endpoints,
    boundary,
    buffer_geom,
    make_valid,
    point_in_polygon,
    segments_intersect,
    line_intersects_polygon,
    intersection_length,
    bbox,
)
