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
