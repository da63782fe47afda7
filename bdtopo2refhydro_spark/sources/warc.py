"""Custom WARC data source (Spark 4 Python DataSource API).

The crawl world's native container is WARC (ISO 28500): a stream of
records, each a block of \r\n-terminated headers followed by a payload
whose size comes from the Content-Length header — NOT from a delimiter,
so payloads may legally contain "WARC/1.0" or any other bytes. This
module implements a genuine (simplified: response-type records,
uncompressed) WARC reader as a first-class Spark source:

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/path/to/dir_or_file")

Schema: (url string, warc_date string, content_length bigint,
payload binary).

Scale shape: ``partitions()`` yields ONE partition per .warc file, so a
directory of crawl segments reads with file-level parallelism (the same
granularity the parquet source uses for row groups); each task streams
its file once, parsing by Content-Length framing. At 100 TB the reader
runs on executors — the driver only lists files. Filters/column pruning
are not pushed (the Python DataSource API v1 surface); a production
deployment fronting *.warc.gz would add a decompressing iterator in
``read`` — the framing logic is unchanged.

Reference: the engine's S1 layer-scan contract (SURVEY.md §2), extended
to the crawl-native container the reference never needed (its inputs
are GIS layers).
"""

from __future__ import annotations

CRLF = b"\r\n"
_MAGIC = b"WARC/1.0"


def parse_warc(buf: bytes):
    """Yield dicts (uri, date, payload) from an uncompressed WARC byte
    stream. Framing is by Content-Length — payload bytes are opaque and
    may contain record magic; after the payload the spec requires two
    CRLFs before the next record."""
    pos = 0
    n = len(buf)
    while True:
        start = buf.find(_MAGIC, pos)
        if start < 0:
            return
        hdr_end = buf.find(CRLF + CRLF, start)
        if hdr_end < 0:
            # record magic with no header terminator = truncated header
            # block — fail loudly, consistent with the truncated-payload
            # ValueError (silently dropping tail records hides corrupt
            # crawl segments).
            raise ValueError(
                f"unterminated WARC header block at byte {start}")
        headers = {}
        for line in buf[start:hdr_end].split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        if b"content-length" not in headers:
            raise ValueError(f"missing Content-Length at byte {start}")
        try:
            clen = int(headers[b"content-length"])
        except ValueError:
            raise ValueError(f"bad Content-Length at byte {start}")
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(f"truncated WARC record at byte {start}")
        payload = buf[body_start:body_start + clen]
        yield {
            "uri": headers.get(b"warc-target-uri", b"").decode("utf-8"),
            "date": headers.get(b"warc-date", b"").decode("utf-8"),
            "payload": payload,
        }
        pos = body_start + clen


def build_warc_bytes(records) -> bytes:
    """Serialize (uri, date, payload-bytes) triples as WARC/1.0 response
    records — the writer twin used by fixtures and tests."""
    out = bytearray()
    for uri, date, payload in records:
        out += _MAGIC + CRLF
        out += b"WARC-Type: response" + CRLF
        out += b"WARC-Target-URI: " + uri.encode("utf-8") + CRLF
        out += b"WARC-Date: " + date.encode("utf-8") + CRLF
        out += b"Content-Length: " + str(len(payload)).encode() + CRLF
        out += CRLF
        out += payload + CRLF + CRLF
    return bytes(out)


def parse_warc_gz(buf: bytes):
    """Yield records from a MEMBER-GZIPPED WARC stream — Common Crawl's
    actual on-disk format: each record is its own gzip member, and the
    members are concatenated, so a reader can seek to any member
    boundary and stream from there (the property range-fetch pipelines
    rely on). Decompresses member-by-member via zlib's unused_data
    hand-off; each member must contain exactly one record."""
    import zlib

    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError(f"expected gzip member magic at byte {pos}")
        z = zlib.decompressobj(wbits=31)
        body = z.decompress(buf[pos:])
        if not z.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        recs = list(parse_warc(body))
        if len(recs) != 1:
            raise ValueError(
                f"gzip member at byte {pos} holds {len(recs)} records "
                "(member-gzipped WARC requires exactly one)")
        yield recs[0]
        consumed = len(buf) - pos - len(z.unused_data)
        pos += consumed


def build_warc_gz_bytes(records) -> bytes:
    """Writer twin of parse_warc_gz: one gzip member per record,
    mtime pinned to 0 so fixture bytes are deterministic."""
    import gzip

    out = bytearray()
    for rec in records:
        out += gzip.compress(build_warc_bytes([rec]), mtime=0)
    return bytes(out)


def _lazy_datasource():
    # pyspark.sql.datasource import is deferred so the module imports on
    # environments without the Python DataSource API (Spark < 4)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _WarcPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("warc source requires a path")

        def partitions(self):
            import glob
            import os

            p = self._path
            if os.path.isdir(p):
                files = sorted(glob.glob(os.path.join(p, "*.warc"))
                               + glob.glob(os.path.join(p, "*.warc.gz")))
            else:
                files = [p]
            if not files:
                raise ValueError(f"no .warc[.gz] files under {p}")
            return [_WarcPartition(f) for f in files]

        def read(self, partition):
            with open(partition.path, "rb") as fh:
                buf = fh.read()
            parse = (parse_warc_gz if partition.path.endswith(".gz")
                     else parse_warc)
            for rec in parse(buf):
                yield (rec["uri"], rec["date"], len(rec["payload"]),
                       rec["payload"])

    class WarcDataSource(DataSource):
        """spark.read.format("warc").load(path) — see module docstring."""

        @classmethod
        def name(cls):
            return "warc"

        def schema(self):
            return ("url string, warc_date string, "
                    "content_length bigint, payload binary")

        def reader(self, schema):
            return WarcReader(self.options)

    return WarcDataSource


def register_warc_source(spark) -> bool:
    """Register the WARC source on a session; returns False when the
    Python DataSource API is unavailable (graceful degradation, same
    policy as the Iceberg path in sources/io.py)."""
    try:
        ds = _lazy_datasource()
    except ImportError:
        return False
    spark.dataSource.register(ds)
    return True
