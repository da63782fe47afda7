"""Custom WARC data source (sources/warc.py): byte-level framing parser
+ the registered Spark source."""

import os

from bdtopo2refhydro_spark.sources.warc import (
    build_warc_bytes,
    parse_warc,
    register_warc_source,
)


def test_parse_warc_content_length_framing():
    # payloads that would break any delimiter-based parser: record magic
    # and header-terminator bytes INSIDE the payload
    recs = [("http://a", "2024-01-01T00:00:00Z", b"x WARC/1.0 y"),
            ("http://b", "2024-01-02T00:00:00Z", b"a\r\n\r\nb"),
            ("http://c", "2024-01-03T00:00:00Z", b"")]
    got = list(parse_warc(build_warc_bytes(recs)))
    assert [(g["uri"], g["date"], g["payload"]) for g in got] == recs


def test_parse_warc_truncated_record_raises():
    buf = build_warc_bytes([("u", "d", b"abcdef")])[:-8]  # cut payload
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc(buf))


def test_warc_source_one_partition_per_file(spark, tmp_path):
    d = str(tmp_path / "segs")
    os.makedirs(d)
    recs = [(f"http://u{i}", "2024-01-01T00:00:00Z",
             f"body-{i}".encode()) for i in range(6)]
    for part in range(3):
        with open(os.path.join(d, f"seg{part}.warc"), "wb") as fh:
            fh.write(build_warc_bytes(recs[part * 2:(part + 1) * 2]))
    assert register_warc_source(spark)
    df = spark.read.format("warc").load(d)
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.url, r.content_length, bytes(r.payload))
                  for r in df.collect())
    assert rows == sorted((u, len(p), p) for u, _, p in recs)


def test_parse_warc_gz_member_roundtrip():
    """Member-gzipped stream: each record its own gzip member; payloads
    containing record magic stay opaque; member boundaries honored."""
    from bdtopo2refhydro_spark.sources.warc import (
        build_warc_gz_bytes,
        parse_warc_gz,
    )

    recs = [("u1", "2024-01-01T00:00:00Z", b"WARC/1.0 inside payload"),
            ("u2", "2024-01-02T00:00:00Z", b"\x00" * 100),
            ("u3", "2024-01-03T00:00:00Z", b"")]
    buf = build_warc_gz_bytes(recs)
    got = list(parse_warc_gz(buf))
    assert [(g["uri"], g["payload"]) for g in got] == [
        ("u1", b"WARC/1.0 inside payload"), ("u2", b"\x00" * 100),
        ("u3", b"")]


def test_parse_warc_gz_truncated_member_raises():
    import pytest

    from bdtopo2refhydro_spark.sources.warc import (
        build_warc_gz_bytes,
        parse_warc_gz,
    )

    buf = build_warc_gz_bytes([("u", "d", b"x" * 50)])
    with pytest.raises(ValueError, match="truncated gzip member"):
        list(parse_warc_gz(buf[:-8]))
    with pytest.raises(ValueError, match="gzip member magic"):
        list(parse_warc_gz(b"NOPE" + buf))


def test_zip_central_directory_mixed_methods_and_comment():
    """Hand parser vs stdlib writer: stored + deflated entries, EOCD
    found past a trailing archive comment, CRCs verified; a flipped
    payload byte is caught by the CRC pass."""
    import io
    import zipfile

    from bdtopo2refhydro_spark.sources.archive import (
        build_zip_bytes,
        parse_zip_central_directory,
    )

    buf = build_zip_bytes([("a.txt", b"hello world"),
                           ("b/c.bin", b"\x01\x02" * 300)])
    got = {e["name"]: e for e in parse_zip_central_directory(buf)}
    assert got["a.txt"]["n_bytes"] == 11
    assert got["b/c.bin"]["n_bytes"] == 600
    assert all(e["crc_ok"] for e in got.values())

    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        zi = zipfile.ZipInfo("z.txt", (1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_DEFLATED
        zf.writestr(zi, b"deflate me " * 40)
        zf.comment = b"trailing comment exercises the EOCD back-scan"
    buf2 = bio.getvalue()
    got2 = list(parse_zip_central_directory(buf2))
    assert got2[0]["name"] == "z.txt" and got2[0]["method"] == 8
    assert got2[0]["crc_ok"] and got2[0]["n_bytes"] == 440

    # flip one payload byte (stored entry) -> crc_ok False
    bad = bytearray(buf)
    idx = bad.index(b"hello world")
    bad[idx] ^= 0xFF
    got3 = {e["name"]: e for e in parse_zip_central_directory(bytes(bad))}
    assert got3["a.txt"]["crc_ok"] is False
