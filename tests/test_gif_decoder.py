"""REAL GIF87a LZW decoder (multimodal.py:_decode_gif) vs direct
pixel math, plus raw-LZW corner cases (KwKwK, width growth, missing
EOI)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bdtopo2refhydro_spark.operators.multimodal import (
    _decode_gif, _lzw_decode_gif, extract_image_features,
    gif_payload_udf, synth_gif_bytes)


def _pack(codes_widths):
    acc = nbits = 0
    out = bytearray()
    for code, w in codes_widths:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_kwkwk_case():
    # min_code=2: clear=4, eoi=5. codes [clear, 0, 6]: 6 == next free
    # slot with prev=[0] -> entry [0,0] (KwKwK). widths all 3.
    data = _pack([(4, 3), (0, 3), (6, 3), (5, 3)])
    assert _lzw_decode_gif(data, 2) == [0, 0, 0]


def test_lzw_width_growth_and_compression():
    # build a stream that uses a dictionary entry after width bump:
    # codes: clear,1,2,3,0, then code 6 = [1,2] (first entry added),
    # widths: idx0..3 at 3 bits, idx>=4 at 4 bits.
    data = _pack([(4, 3), (1, 3), (2, 3), (3, 3), (0, 4), (6, 4), (5, 4)])
    assert _lzw_decode_gif(data, 2) == [1, 2, 3, 0, 1, 2]


def test_lzw_truncated_raises():
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode_gif(_pack([(4, 3), (0, 3)]), 2)


def test_synth_gif_roundtrip_many_ids():
    for doc_id in range(0, 60):
        b = synth_gif_bytes(doc_id)
        w, h, feats = _decode_gif(b)
        assert (w, h) == (2 + doc_id % 4, 2 + doc_id % 3)
        pal = [(5 * doc_id + 40 * j) % 256 for j in range(4)]
        px = [pal[(doc_id + i) % 4] for i in range(w * h)]
        assert feats[0] == np.float32((sum(px) / len(px)) / 256.0)
        assert feats[3] == np.float32(max(px) / 256.0)
        assert feats[4] == np.float32(min(px) / 256.0)
        # closed-form byte length: widths 3/4/5 by code index
        n = w * h + 2
        bits = (3 * min(n, 4) + 4 * max(min(n, 12) - 4, 0)
                + 5 * max(n - 12, 0))
        assert len(b) == 39 + (bits + 7) // 8


def test_gif_through_extract_image_features(spark):
    df = spark.range(20).select(
        F.col("id").cast("string").alias("url"),
        gif_payload_udf()("id").alias("payload"))
    rows = extract_image_features(df, payload_col="payload").collect()
    assert len(rows) == 20
    for r in rows:
        doc_id = int(r["url"])
        assert r["media_type"] == "image/gif"
        assert (r["width"], r["height"]) == (2 + doc_id % 4, 2 + doc_id % 3)
