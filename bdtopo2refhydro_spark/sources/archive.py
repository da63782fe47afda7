"""ZIP central-directory scanning (APPNOTE.TXT byte layout, by hand).

Crawl dumps and document corpora routinely arrive as ZIP containers
(docx/epub/jar are all ZIPs). Listing a ZIP does NOT require reading the
file: the authoritative index is the *central directory* at the END of
the archive — the reason cloud readers can list a 10 GB zip with one
ranged GET of the last ~64 KB. This module implements that read path
against the real byte layout (not via ``zipfile``):

  - walk back from EOF to the End-Of-Central-Directory magic
    ``PK\\x05\\x06`` (scanning past a trailing comment),
  - read the CD offset/count from the EOCD,
  - parse each ``PK\\x01\\x02`` central-header (name, sizes, CRC,
    method, local-header offset),
  - optionally verify payload CRCs by slicing stored data at the local
    header (``PK\\x03\\x04``) — the integrity pass.

The writer twin used by fixtures/tests is stdlib ``zipfile`` with a
pinned 1980 timestamp, so the parser is exercised against an
INDEPENDENT implementation of the format.

Scale shape: one Arrow batch of zip payloads in, one batch of listings
out (`zip_entries` below is a mapInPandas kernel) — the Python cost is
per-archive, not per-byte, and listing never inflates non-stored data.
"""

from __future__ import annotations

import struct
import zlib

_EOCD = b"PK\x05\x06"
_CDH = b"PK\x01\x02"
_LFH = b"PK\x03\x04"


def build_zip_bytes(entries, *, compress: bool = False) -> bytes:
    """(name, payload-bytes) pairs → ZIP bytes via stdlib zipfile (the
    independent writer), timestamp pinned for byte determinism."""
    import io
    import zipfile

    bio = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(bio, "w", method) as zf:
        for name, payload in entries:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, payload)
    return bio.getvalue()


def parse_zip_central_directory(buf: bytes, *, verify_crc: bool = True):
    """Yield dicts (name, n_bytes, method, crc_ok) from a ZIP's central
    directory. ``n_bytes`` is the UNCOMPRESSED size from the central
    header; ``crc_ok`` re-computes the payload CRC32 (stored data is
    sliced in place, deflated data is inflated) against the header
    field when ``verify_crc``.
    """
    # EOCD sits in the last 22 bytes + up to 65535 comment bytes
    tail_start = max(0, len(buf) - 22 - 65535)
    eocd = buf.rfind(_EOCD, tail_start)
    if eocd < 0:
        raise ValueError("no end-of-central-directory record")
    (n_total, cd_size, cd_off) = struct.unpack(
        "<HII", buf[eocd + 10:eocd + 20])
    pos = cd_off
    for _ in range(n_total):
        if buf[pos:pos + 4] != _CDH:
            raise ValueError(f"bad central header magic at byte {pos}")
        (method, crc, csize, usize, nlen, elen, clen) = struct.unpack(
            "<H4xIIIHHH", buf[pos + 10:pos + 34])
        lfh_off = struct.unpack("<I", buf[pos + 42:pos + 46])[0]
        name = buf[pos + 46:pos + 46 + nlen].decode("utf-8")
        crc_ok = None
        if verify_crc:
            if buf[lfh_off:lfh_off + 4] != _LFH:
                raise ValueError(f"bad local header at byte {lfh_off}")
            lnlen, lelen = struct.unpack(
                "<HH", buf[lfh_off + 26:lfh_off + 30])
            data_start = lfh_off + 30 + lnlen + lelen
            raw = buf[data_start:data_start + csize]
            if method == 0:
                data = raw
            elif method == 8:
                data = zlib.decompress(raw, wbits=-15)
            else:
                raise ValueError(f"unsupported method {method} for {name}")
            crc_ok = zlib.crc32(data) & 0xFFFFFFFF == crc
        yield {"name": name, "n_bytes": usize, "method": method,
               "crc_ok": crc_ok}
        pos += 46 + nlen + elen + clen


def zip_entries(df, zip_col: str = "zip_bytes", id_col: str = "doc_id"):
    """mapInPandas kernel: (id, zip binary) rows → one row per archive
    entry (id, name, n_bytes, method, crc_ok). Listing is central-
    directory-only plus the CRC verify pass."""
    from pyspark.sql import functions as F  # noqa: F401

    out_schema = (f"{id_col} long, name string, n_bytes long, "
                  "method int, crc_ok boolean")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, z in zip(pdf[id_col], pdf[zip_col]):
                for e in parse_zip_central_directory(bytes(z)):
                    rows.append((int(i), e["name"], int(e["n_bytes"]),
                                 int(e["method"]), bool(e["crc_ok"])))
            yield pd.DataFrame(
                rows, columns=[id_col, "name", "n_bytes", "method",
                               "crc_ok"])

    return df.select(id_col, zip_col).mapInPandas(gen, out_schema)
