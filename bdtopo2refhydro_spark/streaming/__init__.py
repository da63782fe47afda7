from .ingest import stream_pages_ingest, stream_parquet_passthrough  # noqa: F401
