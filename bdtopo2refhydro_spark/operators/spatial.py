"""Cell-bucketed spatial joins — the engine's replacement for the
reference's in-memory spatial index + per-feature predicate loops.

Physical shape (SURVEY.md §4, north rule):

  lines:    explode(cover_cells(geom))  → (cell, line...)
  polygons: explode(cover_cells(geom))  → (cell, poly...)   [small side]
  equi-join on cell  (polygon side BROADCAST — outlet bands / surfaces are
  tiny next to the pages table)  → exact refine with st_intersects /
  st_intersection_length  → groupBy(line key) to collapse multi-cell dupes.

At 100 TB the lines side never shuffles: the only wide op is the final
groupBy on the line key, and with AQE + salted cells (dense urban cells)
the refine stays balanced. Candidate duplication across cells is bounded by
per-segment bbox covers (functions/cells.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import udfs as U

DEFAULT_CELL_SIZE = 2000.0


def cell_index_polygons(polys: DataFrame, cell_size: float = DEFAULT_CELL_SIZE,
                        geom_col: str = "geom_wkb") -> DataFrame:
    """Explode polygon cell covers → (cell, poly_wkb). The engine's analog of
    layer.createSpatialIndex() (create_connected_reference_hydro.py:169-171),
    but immutable and broadcastable."""
    return polys.select(
        F.explode(U.st_cover_cells(F.col(geom_col), cell_size)).alias("cell"),
        F.col(geom_col).alias("_poly_wkb"),
    )


def spatial_join_hits(lines: DataFrame, polys: DataFrame, key: str = "url",
                      cell_size: float = DEFAULT_CELL_SIZE,
                      geom_col: str = "geom_wkb") -> DataFrame:
    """Distinct line keys whose geometry intersects ≥1 polygon (exact).

    J1/J2 core ~ native:selectbylocation PREDICATE:[0] intersects
    (create_connected_reference_hydro.py:181-187)."""
    poly_idx = F.broadcast(cell_index_polygons(polys, cell_size, geom_col))
    cand = (
        lines.select(key, geom_col,
                     F.explode(U.st_cover_cells(F.col(geom_col), cell_size)).alias("cell"))
        .join(poly_idx, "cell")
        # a line may meet the same polygon in several cells — dedupe before
        # the (expensive) exact refine
        .dropDuplicates([key, "_poly_wkb"])
        .withColumn("_hit", U.st_intersects(geom_col, "_poly_wkb"))
        .filter(F.col("_hit"))
        .select(key)
        .distinct()
    )
    return cand


def select_by_location(lines: DataFrame, polys: DataFrame, key: str = "url",
                       cell_size: float = DEFAULT_CELL_SIZE,
                       geom_col: str = "geom_wkb",
                       flag_col: str = "selected") -> DataFrame:
    """J1 ~ native:selectbylocation: lines + boolean selection column (the
    reference's mutable selection bitmask → explicit column)."""
    hits = spatial_join_hits(lines, polys, key, cell_size, geom_col)
    return lines.join(
        hits.withColumn(flag_col, F.lit(True)), key, "left"
    ).withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))


def extract_by_location(lines: DataFrame, polys: DataFrame, key: str = "url",
                        cell_size: float = DEFAULT_CELL_SIZE,
                        geom_col: str = "geom_wkb",
                        negate: bool = False) -> DataFrame:
    """J2 ~ native:extractbylocation (fix_suppr_canal_auto.py:94-100;
    clip-to-zone at create_5m_width_hydro_network.py:157-171). negate=True
    gives the 'disjoint' complement (left_anti)."""
    hits = spatial_join_hits(lines, polys, key, cell_size, geom_col)
    how = "left_anti" if negate else "left_semi"
    return lines.join(hits, key, how)


def zonal_pct_in_surface(lines: DataFrame, surfaces: DataFrame,
                         key: str = "url",
                         cell_size: float = DEFAULT_CELL_SIZE,
                         geom_col: str = "geom_wkb",
                         pct_col: str = "pct_in_surface") -> DataFrame:
    """J9 ~ the zonal overlay loop (create_5m_width_hydro_network.py:209-245):
    for each line, % of its length inside the water surfaces.

    The reference dissolves all surfaces into one polygon first
    (native:dissolve, :174-179). A global dissolve is a scale killer, so the
    engine sums per-surface intersection lengths instead and caps at 100 —
    identical semantics when surfaces are disjoint (make_valid'd inputs;
    SURVEY.md §7 'Dissolve at scale')."""
    poly_idx = F.broadcast(cell_index_polygons(surfaces, cell_size, geom_col))
    inter = (
        lines.select(key, geom_col,
                     F.explode(U.st_cover_cells(F.col(geom_col), cell_size)).alias("cell"))
        .join(poly_idx, "cell")
        .dropDuplicates([key, "_poly_wkb"])
        .withColumn("_ilen", U.st_intersection_length(geom_col, "_poly_wkb"))
        .groupBy(key)
        .agg(F.sum("_ilen").alias("_in_len"))
    )
    return (
        lines.withColumn("_len", U.st_length(geom_col))
        .join(inter, key, "left")
        .withColumn(
            pct_col,
            F.least(
                F.lit(100.0),
                F.coalesce(F.col("_in_len") / F.col("_len") * 100.0, F.lit(0.0)),
            ),
        )
        .drop("_in_len", "_len")
    )
