"""Column-level function surface: cell index + Arrow-vectorized geometry UDFs."""

from .cells import (  # noqa: F401
    CELL_SHIFT,
    cell_id,
    cell_decode,
    cell_neighbors,
    cover_segment_cells,
    cover_line_cells,
    cover_bbox_cells,
)
from . import udfs  # noqa: F401
