"""Pure-stdlib media codecs (operators/codecs.py) + real multimodal path."""

from __future__ import annotations

import struct
import zlib

import pytest

from ksql_spark.operators.codecs import (
    _chunk,
    det_bytes,
    png_decode,
    png_encode,
    rvid_decode,
    rvid_encode,
    wav_decode,
    wav_encode,
)


def test_png_roundtrip():
    pix = det_bytes(7, 8 * 8 * 3)
    data = png_encode(pix, 8, 8)
    out, w, h = png_decode(data)
    assert (out, w, h) == (pix, 8, 8)


def test_png_decodes_all_filter_types():
    """The decoder must handle filters our encoder never emits (Sub/Up/
    Average/Paeth) — hand-build a PNG whose rows use each filter."""
    w, h = 4, 5
    stride = w * 3
    pix = det_bytes(3, stride * h)
    rows = [bytearray(pix[y * stride : (y + 1) * stride]) for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytearray(stride)
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4]):
        row = rows[y]
        filt = bytearray()
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = (row[x] - a) & 0xFF
            elif ftype == 2:
                v = (row[x] - b) & 0xFF
            elif ftype == 3:
                v = (row[x] - (a + b) // 2) & 0xFF
            else:
                v = (row[x] - paeth(a, b, c)) & 0xFF
            filt.append(v)
        raw.append(ftype)
        raw.extend(filt)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out, ow, oh = png_decode(data)
    assert (out, ow, oh) == (pix, w, h)


def test_png_rejects_corruption():
    data = bytearray(png_encode(det_bytes(1, 12), 2, 2))
    with pytest.raises(ValueError):
        png_decode(b"JUNK" + bytes(data))
    data[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError):
        png_decode(bytes(data))


def test_wav_roundtrip():
    samples = [(i * 331) % 65536 - 32768 for i in range(128)]
    data = wav_encode(samples, 16000)
    out, rate = wav_decode(data)
    assert out == samples and rate == 16000


def test_rvid_roundtrip():
    frames = [det_bytes(i, 4 * 4 * 3) for i in range(3)]
    out, w, h = rvid_decode(rvid_encode(frames, 4, 4))
    assert out == frames and (w, h) == (4, 4)
    with pytest.raises(ValueError):
        rvid_decode(b"XXXX" + b"\x00" * 12)


def test_real_features_match_formula(spark):
    """End-to-end: encode -> Spark mapInPandas decode -> features equal the
    straight-from-formula computation (no codec)."""
    from ksql_spark.operators.multimodal import (
        AUDIO_SAMPLES,
        IMG_H,
        IMG_W,
        extract_features,
        synthesize_media_real,
    )

    media = synthesize_media_real(spark, n=9, seed=42)
    rows = {r["media_id"]: r for r in extract_features(media, decode_stub=False).collect()}
    # image 0: mean of generative bytes
    import hashlib

    def content(i, n):
        out = bytearray()
        b = 0
        while len(out) < n:
            out.extend(hashlib.md5(f"42:{i}:{b}".encode()).digest())
            b += 1
        return bytes(out[:n])

    pix = content(0, IMG_W * IMG_H * 3)
    assert rows[0]["features"][0] == (sum(pix) / (IMG_W * IMG_H * 3)) / 255.0
    raw = content(1, AUDIO_SAMPLES * 2)
    samples = [
        struct.unpack(">H", raw[2 * j : 2 * j + 2])[0] - 32768 for j in range(AUDIO_SAMPLES)
    ]
    assert rows[1]["features"][0] == (sum(samples) / AUDIO_SAMPLES) / 32768.0
    assert rows[2]["kind"] == "video" and rows[2]["features"][1] == 4 / 256.0


def test_resize_real_path(spark):
    from ksql_spark.operators.multimodal import resize_images, synthesize_media_real

    media = synthesize_media_real(spark, n=3, seed=42)
    out = resize_images(media, max_side=4, decode_stub=False)
    img = out.filter("kind = 'image'").first()
    assert (img["width"], img["height"]) == (4, 4)
    pixels, w, h = png_decode(bytes(img["payload"]))
    assert (w, h) == (4, 4) and len(pixels) == 4 * 4 * 3
    # nearest-neighbor: corner pixel preserved from the source image
    src = det_bytes(0, 8 * 8 * 3)

    # media 0 uses seed formula, not det_bytes — recompute via the fixture formula
    import hashlib

    def content(i, n):
        buf = bytearray()
        b = 0
        while len(buf) < n:
            buf.extend(hashlib.md5(f"42:{i}:{b}".encode()).digest())
            b += 1
        return bytes(buf[:n])

    src = content(0, 8 * 8 * 3)
    assert pixels[0:3] == src[0:3]
