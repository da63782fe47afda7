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
