from .ingest import stream_pages_ingest  # noqa: F401
