"""Engine operators (SURVEY.md §2): relational correction passes, spatial
joins, graph passes, stream ordering, segment aggregation, web-text ops."""

from .relational import (  # noqa: F401
    dedup_geometries,
    fix_connection,
    fix_direction,
    fix_connection_and_direction,
    fix_modified_geom,
    fix_suppr_canal_multichenal,
    filter_canals,
    merge_layers,
    take_first_join,
    append_skip_duplicates,
)
from .spatial import (  # noqa: F401
    cell_index_polygons,
    spatial_join_hits,
    select_by_location,
    extract_by_location,
    zonal_pct_in_surface,
    rasterize_counts,
    raster_vectorize,
    dissolve,
    salted_repartition_by_cell,
)
from .graph import (  # noqa: F401
    TraversalMetrics,
    connected_components,
    identify_network_nodes,
    network_nodes,
    snap_endpoints_knn,
    select_connected,
    edges_touching,
    fix_network_connectivity,
)
from .orders import (  # noqa: F401
    distance_from_outlet,
    principal_stem,
    measure_from_outlet,
    upstream_length,
    hack_order,
    strahler_order,
    prune_slivers,
)
from .aggregate import aggregate_segments  # noqa: F401
from .ann import cosine_topk, lsh_ann_topk, cosine_dup_pairs  # noqa: F401
