"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode dispatch is by magic bytes, the way a production featurizer sniffs
content-type: uncompressed formats this container can genuinely parse are
decoded FOR REAL in pure numpy (binary PPM ``P6`` images, RIFF/WAVE 16-bit
PCM audio); everything else falls back to a deterministic STUB (no
libjpeg/ffmpeg here — clearly marked below). The Spark-side plumbing is
identical either way: schema, Arrow batch shape, mapInPandas iterator
contract, and partition sizing are exactly what a full PIL/ffmpeg decode
would use — swapping the stub for one touches nothing else.

At scale: binary payloads dominate partition size, so `media_repartition`
splits by byte budget, not row count — 128 MB of payload per task keeps
Arrow batches inside executor memory regardless of document skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a binary PPM (``P6``) image: header tokens (with
    ``#`` comment skipping per the netpbm spec), then raw interleaved RGB.
    Features are the per-channel means scaled by the power-of-two 256 —
    means accumulate in float64 and the /256 is exact in float32, so the
    values replay bit-identically in a doubles-only SQL oracle."""
    pos = 2  # past 'P6'
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    n = width * height * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    means = px.reshape(-1, 3).mean(axis=0, dtype=np.float64) / 256.0
    feats = np.zeros(8, dtype=np.float32)
    feats[:3] = means
    feats[3] = px.max() / 256.0
    feats[4] = px.min() / 256.0
    return width, height, feats


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of an uncompressed 24-bit BMP: BITMAPFILEHEADER (data
    offset at byte 10) + BITMAPINFOHEADER (width/height/bpp/compression),
    rows bottom-up, BGR byte order, each row padded to a 4-byte boundary
    — all four quirks byte-exact per the Windows BMP spec. Features match
    the PPM path (RGB channel means /256, max, min)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (bpp={bpp})")
    h = abs(height)
    stride = (3 * width + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=data_off).reshape(h, stride)
    px = rows[:, : 3 * width].reshape(-1, 3)  # (B, G, R) per pixel
    means = px.mean(axis=0, dtype=np.float64)[::-1] / 256.0  # → R, G, B
    feats = np.zeros(8, dtype=np.float32)
    feats[:3] = means
    feats[3] = px.max() / 256.0
    feats[4] = px.min() / 256.0
    return width, h, feats


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of an 8-bit RGB non-interlaced PNG: chunk walk
    (IHDR / concatenated IDAT / IEND, CRCs skipped), zlib inflate, then
    the full scanline-filter reconstruction — all five filter types
    (None/Sub/Up/Average/Paeth) per the PNG spec §9. Only the container
    lacks libpng; zlib is stdlib, so unlike JPEG this format needs no
    stub. Features match the PPM/BMP paths (RGB means /256, max, min).

    Sub/Average/Paeth are byte recurrences along the row (each byte
    depends on the reconstructed byte 3 positions back), so those rows
    reconstruct in a per-byte loop; None/Up rows stay vectorized. A
    production decoder hands this to libpng — the mapInPandas plumbing
    around it would not change."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, w, h = 8, b"", None, None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            comp, filt, interlace = data[10], data[11], data[12]
            if (bit_depth, color_type, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced PNG")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + payload + CRC
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    recon = np.empty((h, stride), dtype=np.uint8)
    for r in range(h):
        ft, cur = int(rows[r, 0]), rows[r, 1:]
        if ft == 0:
            rec = cur.copy()
        elif ft == 2:
            rec = cur + prev  # uint8 wraparound == mod-256 add
        elif ft in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            pv = prev.astype(np.int64)
            for i in range(stride):
                a = rec[i - 3] if i >= 3 else 0
                b = pv[i]
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = pv[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (int(cur[i]) + pred) % 256
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        recon[r] = rec
        prev = recon[r]
    px = recon.reshape(-1, 3)
    feats = np.zeros(8, dtype=np.float32)
    feats[:3] = px.mean(axis=0, dtype=np.float64) / 256.0
    feats[3] = px.max() / 256.0
    feats[4] = px.min() / 256.0
    return w, h, feats


def _decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of an uncompressed 8-bit grayscale baseline TIFF
    (decoder #5): endian sniff ('II'/'MM' both supported), IFD entry
    walk (TIFF 6.0 §2), strip assembly via StripOffsets/StripByteCounts
    — including the spec's inline-vs-external value placement rule
    (count·size ≤ 4 bytes lives IN the entry; larger arrays live at an
    offset). Features mirror the RGB paths with the gray value
    replicated across channels."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF")

    def rd(off: int, n: int) -> int:
        return int.from_bytes(payload[off:off + n], bo)

    _TYPE_SIZE = {3: 2, 4: 4}  # SHORT, LONG
    ifd = rd(4, 4)
    n_entries = rd(ifd, 2)
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        off = ifd + 2 + 12 * e
        tag, typ, cnt = rd(off, 2), rd(off + 2, 2), rd(off + 4, 4)
        if typ not in _TYPE_SIZE:
            continue  # RATIONAL resolution tags etc. — not needed
        sz = _TYPE_SIZE[typ]
        src = off + 8 if cnt * sz <= 4 else rd(off + 8, 4)
        tags[tag] = [rd(src + i * sz, sz) for i in range(cnt)]

    for req in (256, 257, 273, 279):
        if req not in tags:
            raise ValueError(f"TIFF missing required tag {req}")
    w, h = tags[256][0], tags[257][0]
    if tags.get(258, [8])[0] != 8 or tags.get(259, [1])[0] != 1:
        raise ValueError("only 8-bit uncompressed baseline TIFF")
    if tags.get(277, [1])[0] != 1:
        raise ValueError("only single-sample (grayscale) TIFF")
    data = b"".join(payload[o:o + c]
                    for o, c in zip(tags[273], tags[279]))
    if len(data) != w * h:
        raise ValueError("TIFF strip size mismatch")
    px = np.frombuffer(data, dtype=np.uint8)
    feats = np.zeros(8, dtype=np.float32)
    feats[:3] = px.mean(dtype=np.float64) / 256.0
    feats[3] = px.max() / 256.0
    feats[4] = px.min() / 256.0
    return w, h, feats


def _lzw_decode_gif(data: bytes, min_code: int) -> list[int]:
    """REAL GIF-variant LZW decode: LSB-first variable-width codes,
    CLEAR/EOI handling, dictionary growth with the deferred width bump
    (width++ when the next free slot reaches 2^width, capped at 12),
    including the KwKwK case (code == next free slot)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out: list[int] = []
    acc = nbits = pos = 0

    def reset():
        return ({i: [i] for i in range(clear)}, clear + 2, min_code + 1)

    table, nxt, width = reset()
    prev: list[int] | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, nxt, width = reset()
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + [entry[0]]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry


def _decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a GIF87a/89a with a global color table and one
    non-interlaced image: logical-screen descriptor, palette read,
    extension-block skip, data sub-block assembly, then the full LZW
    decompression (_lzw_decode_gif). Features match the RGB decoders
    (palette-mapped channel means /256, max, min)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    if not packed & 0x80:
        raise ValueError("GIF without global color table")
    n_colors = 1 << ((packed & 0x07) + 1)
    pos = 13
    palette = np.frombuffer(
        payload[pos:pos + 3 * n_colors], dtype=np.uint8).reshape(-1, 3)
    pos += 3 * n_colors
    while payload[pos] == 0x21:  # extension: label then sub-blocks
        pos += 2
        while payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
    if payload[pos] != 0x2C:
        raise ValueError("expected image descriptor")
    iw = int.from_bytes(payload[pos + 5:pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7:pos + 9], "little")
    if payload[pos + 9] & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    min_code = payload[pos + 10]
    pos += 11
    data = bytearray()
    while (ln := payload[pos]) != 0:
        data += payload[pos + 1:pos + 1 + ln]
        pos += 1 + ln
    idx = _lzw_decode_gif(bytes(data), min_code)
    if len(idx) != iw * ih:
        raise ValueError("GIF pixel count mismatch")
    px = palette[np.asarray(idx, dtype=np.int64)]
    feats = np.zeros(8, dtype=np.float32)
    feats[:3] = px.mean(axis=0, dtype=np.float64) / 256.0
    feats[3] = px.max() / 256.0
    feats[4] = px.min() / 256.0
    return w, h, feats


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB: deterministic fake decode (no PIL/libjpeg in this container).
    A real deployment replaces this body with
    ``img = PIL.Image.open(io.BytesIO(payload))`` and a model-backed
    featurizer; the (width, height, float32[8]) contract is unchanged."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feats = np.frombuffer(digest[:32], dtype=np.uint8).astype(np.float32)
    feats = feats / 255.0
    return width, height, feats[:8]


def extract_image_features(media: DataFrame, payload_col: str = "html",
                           batch_hint: int = 256) -> DataFrame:
    """mapInPandas featurization: iterator-of-batches in, iterator out —
    the decode never materializes a whole partition."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:2] == b"P6":
                    w, h, f = _decode_ppm(b)
                    mt = "image/x-portable-pixmap"
                elif b[:2] == b"BM":
                    w, h, f = _decode_bmp(b)
                    mt = "image/bmp"
                elif b[:8] == _PNG_SIG:
                    w, h, f = _decode_png(b)
                    mt = "image/png"
                elif b[:4] in (b"II*\x00", b"MM\x00*"):
                    w, h, f = _decode_tiff(b)
                    mt = "image/tiff"
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    w, h, f = _decode_gif(b)
                    mt = "image/gif"
                else:
                    w, h, f = _decode_image_stub(b)
                    mt = "image/stub"
                out.append(
                    {"url": url, "media_type": mt,
                     "n_bytes": len(b), "width": int(w),
                     "height": int(h), "features": f.tolist()}
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(
        _featurize, IMAGE_FEATURES_SCHEMA
    )


def media_repartition(df: DataFrame, payload_col: str = "html",
                      target_bytes_per_task: int = 128 * 1024 * 1024) -> DataFrame:
    """Byte-budget repartition for binary-heavy tables: estimates total
    payload bytes from a cheap aggregate and repartitions so each task
    holds ~target_bytes_per_task. Row-count partitioning would let one
    partition of large media blow executor memory."""
    total = df.select(
        F.sum(F.length(F.col(payload_col)).cast("long")).alias("b")
    ).first()["b"] or 0
    n_parts = max(1, int(total // target_bytes_per_task) + 1)
    return df.repartition(n_parts)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("loudness", T.FloatType()),
    ]
)


def _wav_pcm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE chunk walk to the raw 16-bit PCM samples: fmt / data
    chunks, unknown chunks (LIST, …) skipped, word-aligned advance —
    the shared parse under _decode_wav (summary features) and
    audio_frame_energy (per-frame analysis). Returns
    (rate, channels, int16 sample array)."""
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF but not WAVE")
    pos, rate, channels, bits = 12, None, None, None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:
                raise ValueError("non-PCM WAV unsupported")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            if bits != 16:
                raise ValueError(f"{bits}-bit PCM unsupported")
            samples = np.frombuffer(body, dtype="<i2",
                                    count=size // 2)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, samples


def _decode_wav(payload: bytes) -> tuple[int, int, float]:
    """REAL decode of a RIFF/WAVE container with 16-bit PCM samples
    (_wav_pcm chunk walk), then duration from frame count and loudness
    as the mean absolute sample amplitude over the power-of-two full
    scale 32768 (float64 accumulate — exact for the scale of int16
    sums, so SQL-replayable)."""
    rate, channels, samples = _wav_pcm(payload)
    frames = samples.size // channels
    duration_ms = frames * 1000 // rate
    loudness = float(
        np.abs(samples.astype(np.float64)).mean() / 32768.0
    ) if samples.size else 0.0
    return duration_ms, rate, loudness


def _decode_audio_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB: deterministic fake decode (no ffmpeg/librosa in this
    container). A real deployment replaces this body with an ffprobe/pcm
    decode; the (duration_ms, sample_rate, loudness) contract is
    unchanged."""
    digest = hashlib.sha256(payload).digest()
    duration_ms = 1000 + int.from_bytes(digest[0:2], "big")
    sample_rate = (8, 16, 22, 44)[digest[2] % 4] * 1000
    # /256 not /255: power-of-two denominator → exact in float32 AND
    # float64, so the DuckDB oracle (doubles) matches bit-for-bit
    loudness = digest[3] / 256.0
    return duration_ms, sample_rate, loudness


def extract_audio_features(media: DataFrame, payload_col: str = "payload",
                           ) -> DataFrame:
    """mapInPandas audio featurization — same iterator contract as
    extract_image_features."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:4] == b"RIFF":
                    d, sr, loud = _decode_wav(b)
                else:
                    d, sr, loud = _decode_audio_stub(b)
                out.append({"url": url, "n_bytes": len(b),
                            "duration_ms": d, "sample_rate": sr,
                            "loudness": loud})
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(
        _featurize, AUDIO_FEATURES_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_video_frames(media: DataFrame, payload_col: str = "payload",
                        every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame — a
    row-expanding mapInPandas (the shape a real ffmpeg key-frame extractor
    produces). The stub derives a deterministic per-video duration and
    per-frame digest from the payload; swap `_decode_audio_stub`-style
    internals for ffmpeg and the schema/partitioning stays identical.
    At scale, run media_repartition() first so the byte-heavy input is
    partitioned by payload size, not row count."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                hx = hashlib.sha256(b).hexdigest()
                digest = bytes.fromhex(hx)
                duration_ms = 1000 + int.from_bytes(digest[0:2], "big")
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    # hex-string chaining (not raw-byte concat) keeps the
                    # derivation replayable in VARCHAR-only SQL sha256
                    fr = hashlib.sha256(f"{hx}#{i}".encode()).hexdigest()
                    out.append({"url": url, "frame_idx": i, "ts_ms": ts,
                                "frame_sha": fr})
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(_sample, FRAME_SCHEMA)


def synth_ppm_bytes(doc_id: int) -> bytes:
    """Deterministic VALID binary-PPM fixture for the real decode path:
    (4 + id%13)×(3 + id%7) pixels, constant color (id%256, 7id%256,
    13id%256). Constant pixels make the channel means closed-form in
    doc_id, so a SQL oracle replays the genuine byte-level decode."""
    w, h = 4 + doc_id % 13, 3 + doc_id % 7
    r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 13) % 256
    return f"P6\n{w} {h}\n255\n".encode() + bytes((r, g, b)) * (w * h)


def synth_wav_bytes(doc_id: int) -> bytes:
    """Deterministic VALID RIFF/WAVE 16-bit mono PCM fixture: rate in
    {8,16,32,48} kHz (all divide 1000·duration), duration 100+50·(id%7) ms,
    every sample at amplitude 31·id mod 32768 — so duration_ms and
    loudness have closed forms in doc_id and the real chunk-walking
    decode is SQL-verifiable."""
    rate = (8, 16, 32, 48)[doc_id % 4] * 1000
    dur_ms = 100 + 50 * (doc_id % 7)
    amp = (doc_id * 31) % 32768
    n = rate * dur_ms // 1000
    data = np.full(n, amp, dtype="<i2").tobytes()
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def synth_bmp_bytes(doc_id: int) -> bytes:
    """Deterministic VALID 24-bit BMP fixture: (4 + id%5)×(2 + id%4)
    pixels — widths 4..8 cover every row-padding remainder (3w % 4 ∈
    {0,1,2,3}) — constant color (id%256, 7id%256, 11id%256) written
    bottom-up in BGR with padded rows, so channel means are closed-form
    in doc_id and the oracle verifies the genuine byte-level decode
    including stride handling."""
    w, h = 4 + doc_id % 5, 2 + doc_id % 4
    r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 11) % 256
    stride = (3 * w + 3) & ~3
    row = bytes((b, g, r)) * w + b"\x00" * (stride - 3 * w)
    data = row * h
    size = 14 + 40 + len(data)
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")                       # data offset
        + (40).to_bytes(4, "little")                       # info header
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")                        # BI_RGB
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16                                     # res/palette
    )
    return hdr + data


def synth_png_bytes(doc_id: int) -> bytes:
    """Deterministic VALID PNG fixture: (4 + id%13)×(3 + id%7) pixels,
    constant color (id%256, 7id%256, 11id%256), filter byte 0 per row,
    IDAT deflated at level 0 (stored blocks) so the compressed length —
    and therefore n_bytes — is CLOSED-FORM in doc_id for the oracle:
    raw = h·(1+3w) bytes, idat = raw + 11 (2 zlib hdr + 5 stored-block
    hdr + 4 adler), total = 8 sig + 25 IHDR + (12 + idat) + 12 IEND.
    Real compression levels and nonzero filters are pytest-covered."""
    import zlib

    w, h = 4 + doc_id % 13, 3 + doc_id % 7
    r, g, b = doc_id % 256, (doc_id * 7) % 256, (doc_id * 11) % 256
    raw = (b"\x00" + bytes((r, g, b)) * w) * h
    idat = zlib.compress(raw, 0)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes((8, 2, 0, 0, 0))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def synth_tiff_bytes(doc_id: int) -> bytes:
    """Deterministic VALID grayscale TIFF fixture: (3 + id%6)×(2 + id%5)
    pixels, constant gray (5·id)%256, RowsPerStrip=2 (so taller images
    split into MULTIPLE strips and the external StripOffsets/ByteCounts
    array path is exercised), endianness by id parity ('II' even, 'MM'
    odd). Constant pixels make the mean closed-form in doc_id."""
    w, h = 3 + doc_id % 6, 2 + doc_id % 5
    g = (doc_id * 5) % 256
    bo = "little" if doc_id % 2 == 0 else "big"
    rows_per_strip = 2
    n_strips = (h + rows_per_strip - 1) // rows_per_strip
    strips = []
    r = 0
    while r < h:
        rows = min(rows_per_strip, h - r)
        strips.append(bytes([g]) * (w * rows))
        r += rows

    # layout: 8-byte header | strip data | IFD | external arrays
    data_off = 8
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    n_entries = 9
    arrays_off = ifd_off + 2 + 12 * n_entries + 4

    def i2(v: int) -> bytes:
        return v.to_bytes(2, bo)

    def i4(v: int) -> bytes:
        return v.to_bytes(4, bo)

    ext = bytearray()

    def entry(tag: int, typ: int, values: list[int]) -> bytes:
        nonlocal ext
        size = {3: 2, 4: 4}[typ]
        enc = b"".join(v.to_bytes(size, bo) for v in values)
        if len(enc) <= 4:
            return i2(tag) + i2(typ) + i4(len(values)) + enc.ljust(4, b"\x00")
        off = arrays_off + len(ext)
        ext += enc
        return i2(tag) + i2(typ) + i4(len(values)) + i4(off)

    entries = (
        entry(256, 3, [w]) + entry(257, 3, [h]) + entry(258, 3, [8])
        + entry(259, 3, [1]) + entry(262, 3, [1])
        + entry(273, 4, offs) + entry(277, 3, [1])
        + entry(278, 3, [rows_per_strip])
        + entry(279, 4, [len(s) for s in strips])
    )
    assert len(strips) == n_strips
    hdr = (b"II*\x00" if bo == "little" else b"MM\x00*") + i4(ifd_off)
    ifd = i2(n_entries) + entries + i4(0)
    return hdr + b"".join(strips) + ifd + bytes(ext)


def synth_gif_bytes(doc_id: int) -> bytes:
    """Deterministic VALID GIF87a fixture: (2 + id%4)×(2 + id%3)
    pixels over a 4-gray global palette g_j = (5·id + 40·j) % 256,
    pixel(i) = (id + i) % 4 — varying indices so the LZW path is
    genuinely exercised. The encoder emits [CLEAR, literals…, EOI]
    with the SAME width-growth rule the decoder applies, so the
    byte length is closed-form in doc_id (widths 3/4/5 by code index:
    ≤3 / ≤11 / ≤27)."""
    w, h = 2 + doc_id % 4, 2 + doc_id % 3
    pal = b"".join(bytes([(5 * doc_id + 40 * j) % 256]) * 3
                   for j in range(4))
    pixels = [(doc_id + i) % 4 for i in range(w * h)]
    min_code, clear, eoi = 2, 4, 5
    acc = nbits = 0
    out = bytearray()
    width, nxt = min_code + 1, clear + 2
    prev_seen = False

    def emit(code: int, cw: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    for p in pixels:
        emit(p, width)
        if prev_seen:
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev_seen = True
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    hdr = (b"GIF87a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0x81, 0, 0]))
    desc = (b"\x2c" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
            + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00")
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (hdr + pal + desc + bytes([min_code]) + bytes(blocks)
            + b"\x00" + b"\x3b")


def gif_payload_udf():
    """binary pandas UDF: doc_id -> synth_gif_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_gif_bytes(int(i)))
    return _mk


def tiff_payload_udf():
    """binary pandas UDF: doc_id -> synth_tiff_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_tiff_bytes(int(i)))
    return _mk


def png_payload_udf():
    """binary pandas UDF: doc_id -> synth_png_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_png_bytes(int(i)))
    return _mk


def bmp_payload_udf():
    """binary pandas UDF: doc_id -> synth_bmp_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_bmp_bytes(int(i)))
    return _mk


def ppm_payload_udf():
    """binary pandas UDF: doc_id -> synth_ppm_bytes(doc_id). Lives here so
    the pd.Series type hints resolve in this module's globals."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_ppm_bytes(int(i)))
    return _mk


def wav_payload_udf():
    """binary pandas UDF: doc_id -> synth_wav_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_wav_bytes(int(i)))
    return _mk


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def _resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resample of a binary PPM: decode, index-map
    rows/columns with the standard floor((i + 0.5) * src / dst) center
    rule, re-encode. Integer arithmetic only — deterministic across
    platforms."""
    w, h, _ = _decode_ppm(payload)
    header_end = len(payload) - w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, offset=header_end,
                       count=w * h * 3).reshape(h, w, 3)
    rows = ((2 * np.arange(out_h) + 1) * h) // (2 * out_h)
    cols = ((2 * np.arange(out_w) + 1) * w) // (2 * out_w)
    out = px[rows][:, cols]
    return f"P6\n{out_w} {out_h}\n255\n".encode() + out.tobytes()


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  payload_col: str = "payload") -> DataFrame:
    """Image-resize stage of a multimodal training pipeline: mapInPandas
    over binary payloads, PPM payloads genuinely resampled (nearest
    neighbor), anything else passed through untouched with its original
    dimensions unknown (-1) — the shape a production letterboxing pass
    has, minus the libjpeg-backed formats this container can't parse."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:2] == b"P6":
                    rb = _resize_ppm(b, out_w, out_h)
                    out.append({"url": url, "width": out_w,
                                "height": out_h, "n_bytes": len(rb),
                                "resized": rb})
                else:
                    out.append({"url": url, "width": -1, "height": -1,
                                "n_bytes": len(b), "resized": b})
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.select("url", payload_col).mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def _ppm_pixels(payload: bytes) -> np.ndarray:
    """Binary-PPM (P6) decode to the raw (H, W, 3) uint8 pixel array —
    same header walk as _decode_ppm (comment skipping per the netpbm
    spec) but returning pixels, for operators that need spatial
    structure (perceptual hashing, resampling) rather than channel
    moments."""
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=width * height * 3, offset=pos)
    return px.reshape(height, width, 3)


def ahash64(gray: np.ndarray) -> int:
    """64-bit average hash of a (H, W) integer gray image, EXACT
    integer arithmetic end to end: nearest-neighbor downsample to 8x8
    at indices floor(i*H/8), floor(j*W/8), then bit(i,j) = 1 iff
    cell*64 > sum(cells) — the mean comparison with the denominator
    cleared, so the hash is bit-replayable on any engine (no float
    mean). Bit index is i*8 + j, LSB first."""
    h, w = gray.shape
    ys = (np.arange(8, dtype=np.int64) * h) // 8
    xs = (np.arange(8, dtype=np.int64) * w) // 8
    cells = gray[np.ix_(ys, xs)].astype(np.int64)
    bits = (cells * 64 > cells.sum()).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("hash_hi", T.LongType()),
        T.StructField("hash_lo", T.LongType()),
    ]
)


def perceptual_ahash(media: DataFrame,
                     payload_col: str = "payload") -> DataFrame:
    """Perceptual average-hash over REAL decoded image bytes: the
    near-duplicate-image primitive of a multimodal curation pipeline.
    Gray = (r+g+b)//3 per pixel (integer), 8x8 nearest-neighbor
    downsample, mean-threshold bits (ahash64). The 64-bit hash ships
    as two uint32 halves (hash_hi, hash_lo) so BIGINT stays unsigned-
    clean in every engine.

    Scale shape: mapInPandas decode (payload bytes never shuffle — the
    output is 20 bytes/image); downstream exact-dup grouping or banded
    Hamming joins (cf. simhash_pairs' 4x16 Manku bands) operate on the
    hash columns only."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:2] != b"P6":
                    raise ValueError("perceptual_ahash: PPM-only path")
                px = _ppm_pixels(b)
                gray = px.astype(np.int64).sum(axis=2) // 3
                hv = ahash64(gray)
                out.append({"url": url,
                            "width": int(px.shape[1]),
                            "height": int(px.shape[0]),
                            "hash_hi": int(hv >> 32),
                            "hash_lo": int(hv & 0xFFFFFFFF)})
            yield pd.DataFrame(
                out, columns=[f.name for f in PHASH_SCHEMA.fields])

    return media.select("url", payload_col).mapInPandas(
        _hash, PHASH_SCHEMA)


def synth_ppm_split_bytes(doc_id: int) -> bytes:
    """Two-tone vertical-split PPM fixture: (8 + id%9) x (8 + id%5),
    first s = 1 + (5·id)%(w−1) columns gray 40, the rest gray 200 (all
    channels equal). The 8x8 aHash of such an image is closed-form in
    doc_id — bright bits exactly at sampled columns floor(j·w/8) >= s,
    repeated down all 8 rows (and 0 when no sampled column is bright:
    all-equal cells never exceed their own mean) — so the SQL oracle
    replays the genuine byte-level decode + hash (see _q_image_phash)."""
    w, h = 8 + doc_id % 9, 8 + doc_id % 5
    s = 1 + (5 * doc_id) % (w - 1)
    row = bytes((40, 40, 40)) * s + bytes((200, 200, 200)) * (w - s)
    return f"P6\n{w} {h}\n255\n".encode() + row * h


def ppm_split_payload_udf():
    """binary pandas UDF: doc_id -> synth_ppm_split_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_ppm_split_bytes(int(i)))
    return _mk


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_energy(media: DataFrame, *, frame: int = 1024,
                       payload_col: str = "payload") -> DataFrame:
    """Per-frame audio energy over REAL decoded PCM (_wav_pcm): the
    speech/VAD/silence-trim primitive — fixed-size sample frames, each
    scored by Σ sample² in EXACT int64 (≤ 2^45 per 1024-frame, no float
    accumulation), so segment gates replay bitwise on any engine.

    Scale shape: mapInPandas decode, output rows are 4 integers per
    frame — audio bytes never shuffle. A row-expanding operator like
    sample_video_frames; frame count is ceil(n/frame)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                if payload is None:
                    continue
                _, _, samples = _wav_pcm(bytes(payload))
                s64 = samples.astype(np.int64)
                for i in range(0, max(len(s64), 1), frame):
                    chunk = s64[i:i + frame]
                    out.append({
                        "url": url,
                        "frame_idx": i // frame,
                        "n_samples": int(chunk.size),
                        "energy": int((chunk * chunk).sum()),
                    })
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FRAMES_SCHEMA.fields])

    return media.select("url", payload_col).mapInPandas(
        _frames, AUDIO_FRAMES_SCHEMA)


# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0=free, 15=bad
_MP3_BITRATES = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320, None)
_MP3_RATES = (44100, 48000, 32000, None)


def parse_mp3_frames(payload: bytes) -> tuple[int, int, int, int]:
    """Walk MPEG-1 Layer III frame headers (ISO 11172-3): 11-bit sync,
    version/layer bits, bitrate + samplerate table lookups, frame
    length = 144·bitrate/samplerate + padding. Returns (n_frames,
    total_bytes, total_samples, duration_ms) — the container-level
    metadata an audio curation pass extracts WITHOUT decoding audio
    (1152 samples per L3 frame). VBR streams (per-frame bitrate
    switches) are handled by re-reading the tables each frame.
    Malformed sync/indices/truncation raise."""
    pos, n = 0, len(payload)
    n_frames = total = 0
    sr_seen = None
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated MP3 header at byte {pos}")
        b1, b2, b3 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        if (b2 >> 3) & 0x3 != 0x3 or (b2 >> 1) & 0x3 != 0x1:
            raise ValueError("only MPEG-1 Layer III")
        br = _MP3_BITRATES[b3 >> 4]
        sr = _MP3_RATES[(b3 >> 2) & 0x3]
        if br is None or sr is None:
            raise ValueError(f"bad bitrate/samplerate index at {pos}")
        if sr_seen is None:
            sr_seen = sr
        elif sr != sr_seen:
            raise ValueError("samplerate switch mid-stream")
        pad = (b3 >> 1) & 0x1
        flen = 144 * br * 1000 // sr + pad
        if pos + flen > n:
            raise ValueError(f"truncated MP3 frame at byte {pos}")
        pos += flen
        n_frames += 1
        total += flen
    dur_ms = n_frames * 1152 * 1000 // sr_seen if sr_seen else 0
    return n_frames, total, n_frames * 1152, dur_ms


def synth_mp3_bytes(doc_id: int) -> bytes:
    """Deterministic VALID MPEG-1 L3 frame stream: 3 + id%5 frames,
    VBR (bitrate index cycles 5/7/9 → 64/96/128 kbps by (id+i)%3),
    samplerate 48 kHz (even id) / 32 kHz (odd) so per-frame duration
    is integral (24/36 ms), padding bit (id+i)%2."""
    sr_idx = 1 if doc_id % 2 == 0 else 2
    sr = _MP3_RATES[sr_idx]
    out = bytearray()
    for i in range(3 + doc_id % 5):
        br_idx = (5, 7, 9)[(doc_id + i) % 3]
        pad = (doc_id + i) % 2
        flen = 144 * _MP3_BITRATES[br_idx] * 1000 // sr + pad
        hdr = bytes((0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                     0x00))
        out += hdr + bytes(flen - 4)
    return bytes(out)


def mp3_frame_stats(media: DataFrame,
                    payload_col: str = "payload") -> DataFrame:
    """mapInPandas kernel: (url, mp3 binary) → container metadata row
    per stream via the real frame walk."""
    schema = ("url string, n_frames int, total_bytes bigint, "
              "total_samples bigint, duration_ms bigint")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                nf, tb, ts, dm = parse_mp3_frames(bytes(payload))
                rows.append((url, nf, tb, ts, dm))
            yield pd.DataFrame(rows, columns=[
                "url", "n_frames", "total_bytes", "total_samples",
                "duration_ms"])

    return media.select("url", payload_col).mapInPandas(gen, schema)


def mp3_payload_udf():
    """binary pandas UDF: doc_id -> synth_mp3_bytes(doc_id)."""
    @F.pandas_udf("binary")
    def _mk(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_mp3_bytes(int(i)))
    return _mk
