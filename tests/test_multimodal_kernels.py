"""Property tests for the real multimodal byte-level kernels (pure numpy,
no SparkSession — these run in milliseconds per example)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bdtopo2refhydro_spark.operators.multimodal import (
    _decode_ppm,
    _decode_wav,
    _resize_ppm,
    synth_ppm_bytes,
    synth_wav_bytes,
)


def _encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_decode_matches_numpy_reference(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dw, dh, feats = _decode_ppm(_encode_ppm(px))
    assert (dw, dh) == (w, h)
    ref = px.reshape(-1, 3).mean(axis=0, dtype=np.float64) / 256.0
    assert np.array_equal(feats[:3], ref.astype(np.float32))
    assert feats[3] == px.max() / 256.0 and feats[4] == px.min() / 256.0


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 16), h=st.integers(1, 16),
    fx=st.integers(1, 4), fy=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_integer_upscale_roundtrips(w, h, fx, fy, seed):
    """Nearest-neighbor by the center rule: an exact-integer upscale
    duplicates each pixel into an fx×fy block, so scaling back down
    recovers the original bytes; resizing to the same dims is identity."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    src = _encode_ppm(px)
    assert _resize_ppm(src, w, h) == src
    up = _resize_ppm(src, w * fx, h * fy)
    upx = np.frombuffer(up, np.uint8, count=w * fx * h * fy * 3,
                        offset=len(up) - w * fx * h * fy * 3)
    assert np.array_equal(
        upx.reshape(h * fy, w * fx, 3),
        np.repeat(np.repeat(px, fy, axis=0), fx, axis=1),
    )
    assert _resize_ppm(up, w, h) == src


@settings(max_examples=200, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    n=st.integers(1, 4000),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_decode_matches_numpy_reference(rate, n, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    wav = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    d, sr, loud = _decode_wav(wav)
    assert sr == rate and d == n * 1000 // rate
    assert loud == np.abs(samples.astype(np.float64)).mean() / 32768.0


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(0, 2**40))
def test_synth_fixtures_decode_to_their_closed_forms(doc_id):
    w, h, feats = _decode_ppm(synth_ppm_bytes(doc_id))
    assert (w, h) == (4 + doc_id % 13, 3 + doc_id % 7)
    assert feats[0] == (doc_id % 256) / 256.0
    assert feats[1] == (doc_id * 7 % 256) / 256.0
    d, sr, loud = _decode_wav(synth_wav_bytes(doc_id))
    assert sr == (8, 16, 32, 48)[doc_id % 4] * 1000
    assert d == 100 + 50 * (doc_id % 7)
    assert loud == ((doc_id * 31) % 32768) / 32768.0


# ---------------------------------------------------------------------------
# PNG decode (chunk walk + inflate + all five scanline filters)
# ---------------------------------------------------------------------------

def _encode_png(px: np.ndarray, filters, level=6) -> bytes:
    """Reference PNG encoder for tests: encodes row r with filters[r]
    per the spec's FILTER definitions (the inverse of the decoder)."""
    import zlib

    from bdtopo2refhydro_spark.operators.multimodal import _PNG_SIG

    h, w, _ = px.shape
    flat = px.reshape(h, 3 * w).astype(int)
    raw = bytearray()
    prev = np.zeros(3 * w, dtype=int)
    for r in range(h):
        ft = filters[r]
        raw.append(ft)
        cur = flat[r]
        for i in range(3 * w):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((cur[i] - pred) % 256)
        prev = flat[r]
    idat = zlib.compress(bytes(raw), level)

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + zlib.crc32(t + d).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes((8, 2, 0, 0, 0))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


@settings(max_examples=60, deadline=None)
@given(w=st.integers(1, 12), h=st.integers(1, 8),
       seed=st.integers(0, 2**31 - 1),
       data=st.data())
def test_png_decode_matches_numpy_reference_all_filters(w, h, seed, data):
    from bdtopo2refhydro_spark.operators.multimodal import _decode_png

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    gw, gh, feats = _decode_png(_encode_png(px, filters))
    assert (gw, gh) == (w, h)
    flat = px.reshape(-1, 3)
    assert np.allclose(feats[:3],
                       flat.mean(axis=0, dtype=np.float64) / 256.0,
                       atol=1e-6)
    assert feats[3] == flat.max() / 256.0
    assert feats[4] == flat.min() / 256.0


@settings(max_examples=200, deadline=None)
@given(doc_id=st.integers(0, 2**40))
def test_synth_png_closed_forms(doc_id):
    from bdtopo2refhydro_spark.operators.multimodal import (
        _decode_png,
        synth_png_bytes,
    )

    p = synth_png_bytes(doc_id)
    w, h, feats = _decode_png(p)
    assert (w, h) == (4 + doc_id % 13, 3 + doc_id % 7)
    # level-0 deflate makes the total byte count closed-form
    assert len(p) == 68 + h * (1 + 3 * w)
    assert feats[0] == (doc_id % 256) / 256.0
    assert feats[1] == (doc_id * 7 % 256) / 256.0


def _encode_tiff_gray(px: np.ndarray, bo: str, rows_per_strip: int) -> bytes:
    """Independent reference TIFF writer for arbitrary pixel data (the
    synth writer only emits constant-color fixtures)."""
    h, w = px.shape
    strips = [px[r:r + rows_per_strip].tobytes()
              for r in range(0, h, rows_per_strip)]
    data_off = 8
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n_entries = 9
    arrays_off = ifd_off + 2 + 12 * n_entries + 4
    ext = bytearray()

    def ent(tag, typ, values):
        size = {3: 2, 4: 4}[typ]
        enc = b"".join(v.to_bytes(size, bo) for v in values)
        if len(enc) <= 4:
            return (tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                    + len(values).to_bytes(4, bo) + enc.ljust(4, b"\x00"))
        off = arrays_off + len(ext)
        ext.extend(enc)
        return (tag.to_bytes(2, bo) + typ.to_bytes(2, bo)
                + len(values).to_bytes(4, bo) + off.to_bytes(4, bo))

    entries = (ent(256, 3, [w]) + ent(257, 3, [h]) + ent(258, 3, [8])
               + ent(259, 3, [1]) + ent(262, 3, [1]) + ent(273, 4, offs)
               + ent(277, 3, [1]) + ent(278, 3, [rows_per_strip])
               + ent(279, 4, [len(s) for s in strips]))
    hdr = (b"II*\x00" if bo == "little" else b"MM\x00*") \
        + ifd_off.to_bytes(4, bo)
    return (hdr + b"".join(strips)
            + n_entries.to_bytes(2, bo) + entries + (0).to_bytes(4, bo)
            + bytes(ext))


@settings(max_examples=150, deadline=None)
@given(w=st.integers(1, 20), h=st.integers(1, 20),
       rps=st.integers(1, 21), big=st.booleans(),
       seed=st.integers(0, 2**31 - 1))
def test_tiff_decode_matches_numpy_reference(w, h, rps, big, seed):
    """_decode_tiff reconstructs arbitrary gray pixels under every
    strip split and BOTH endiannesses."""
    from bdtopo2refhydro_spark.operators.multimodal import _decode_tiff

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    buf = _encode_tiff_gray(px, "big" if big else "little", rps)
    got_w, got_h, feats = _decode_tiff(buf)
    assert (got_w, got_h) == (w, h)
    assert abs(feats[0] - px.mean(dtype=np.float64) / 256.0) < 1e-6
    assert feats[3] == px.max() / 256.0
    assert feats[4] == px.min() / 256.0


def test_tiff_malformed_raises():
    import pytest

    from bdtopo2refhydro_spark.operators.multimodal import (
        _decode_tiff,
        synth_tiff_bytes,
    )

    with pytest.raises(ValueError, match="not a TIFF"):
        _decode_tiff(b"XXYY" + b"\x00" * 32)
    buf = bytearray(synth_tiff_bytes(7))
    buf[-1] ^= 0  # no-op; now truncate a strip instead
    with pytest.raises(ValueError):
        _decode_tiff(bytes(buf[:12]))


def test_mp3_parser_malformed_raises():
    import pytest

    from bdtopo2refhydro_spark.operators.multimodal import (
        parse_mp3_frames,
        synth_mp3_bytes,
    )

    buf = synth_mp3_bytes(5)
    with pytest.raises(ValueError, match="lost MP3 sync"):
        parse_mp3_frames(b"\x00" + buf)
    with pytest.raises(ValueError, match="truncated MP3 frame"):
        parse_mp3_frames(buf[:-10])
    # free-format bitrate index (0) is rejected
    bad = bytearray(buf)
    bad[2] = (0 << 4) | (bad[2] & 0x0F)
    with pytest.raises(ValueError, match="bad bitrate"):
        parse_mp3_frames(bytes(bad))
    # MPEG-2 version bits rejected
    bad2 = bytearray(buf)
    bad2[1] = 0xF3  # version 10 (MPEG-2), layer III
    with pytest.raises(ValueError, match="only MPEG-1"):
        parse_mp3_frames(bytes(bad2))
