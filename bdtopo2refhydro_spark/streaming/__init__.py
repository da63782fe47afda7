from .ingest import stream_pages_ingest, stream_parquet_passthrough  # noqa: F401
from .stateful import stream_dedup_stateful, stream_windowed_counts  # noqa: F401
