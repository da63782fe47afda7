"""Sources/sinks: deterministic synthetic fixtures, parquet IO, lineage."""

from .synth import (  # noqa: F401
    make_pages_pdf,
    make_edges_pdf,
    make_outlet_polygons_pdf,
    make_surfaces_pdf,
    make_zones_pdf,
    make_corrections_pdf,
    pages_df,
    edges_df,
    edges_df_dist,
    outlet_polygons_df,
    surfaces_df,
    zones_df,
    corrections_df,
)
from .io import (  # noqa: F401
    IcebergUnavailable,
    assert_schema,
    iceberg_available,
    merge_append_skip_duplicates,
    merge_upsert,
    read_table,
    write_iceberg,
    write_table,
)
