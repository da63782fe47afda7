"""bdtopo2refhydro_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query/data-processing capabilities of
EVS-GIS/bdtopo2refhydro (reference, read-only at /root/reference).

Not a port: the reference is an eager PyQGIS dataflow; this engine is a lazy
Spark DataFrame library. Geometry lives in WKB binary columns; all geometry
math is Arrow-vectorized pandas UDFs over a pure-numpy WKB kernel
(``bdtopo2refhydro_spark.geom``); spatial joins are cell-bucketed broadcast
equi-joins with exact refine (``operators.spatial``); the reference's
graph passes (``fct:identifynetworknodes``, ``SelectConnectedComponents``,
principal stem, Hack/Strahler) are checkpointed iterative self-joins
(``operators.graph`` / ``operators.orders``).
"""

__version__ = "0.1.0"
