from .ingest import stream_pages_ingest, stream_parquet_passthrough  # noqa: F401
from .stateful import (  # noqa: F401
    stream_dedup_stateful,
    stream_interval_join,
    stream_session_windows,
    stream_windowed_counts,
)
