"""Pure-stdlib media codecs for the multimodal operators.

No image/audio libraries ship in this environment, so the codec layer is
built on the formats the standard library can genuinely encode AND decode:

  * PNG   — full spec subset: 8-bit RGB, all five scanline filters on
            decode (we emit filter 0), zlib IDAT, CRC-checked chunks;
  * WAV   — RIFF PCM16 mono via the stdlib ``wave`` module;
  * RVID  — a trivial raw-video container (magic, dims, frame count,
            concatenated RGB frames) standing in for a real demuxer.

The decode outputs feed feature extraction (multimodal.py).  Features are
defined over EXACT integer statistics (byte sums, sample counts) followed
by fixed IEEE operations, so an independent engine (the DuckDB oracle)
recomputes them bit-for-bit from the generative pixel formula — if the
PNG/WAV/RVID decoding here were wrong in any byte, the features would not
match.

Reference parity note: the reference (gulfstream-h/ksql) has no media
surface; this family is the training-data-pipeline extension (brief: treat
image/audio/video as opaque binary + typed metadata, decode in Arrow
batches).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib


# ---------------------------------------------------------------------------
# deterministic content generators (the fixture formula the oracle mirrors)
# ---------------------------------------------------------------------------


def det_bytes(key, n: int) -> bytes:
    """n pseudo-random bytes: block b supplies md5(f"{key}:{b}").

    ``key`` may be any stringable value (a media id, or a "seed:id" prefix)
    — this is THE generative byte formula the DuckDB parity oracle mirrors
    (oracles.sql_multimodal_decode); keep it the single source of truth."""
    out = bytearray()
    b = 0
    while len(out) < n:
        out.extend(hashlib.md5(f"{key}:{b}".encode()).digest())
        b += 1
    return bytes(out[:n])


# ---------------------------------------------------------------------------
# PNG (8-bit RGB)
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Encode raw RGB bytes (row-major, 3 bytes/pixel) as a real PNG."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[bytes, int, int]:
    """Decode an 8-bit RGB PNG -> (pixels, width, height).

    Handles all five scanline filters (None/Sub/Up/Average/Paeth) and
    multi-IDAT streams; validates signature and chunk CRCs.
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width * 3
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        ftype = raw[y * (stride + 1)]
        for x in range(stride):
            a = row[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ftype == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ftype == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                row[x] = (row[x] + _paeth(a, b, c)) & 0xFF
            elif ftype != 0:
                raise ValueError(f"unknown filter {ftype}")
        out.extend(row)
        prev = row
    return bytes(out), width, height


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono)
# ---------------------------------------------------------------------------


def wav_encode(samples: list[int], rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[list[int], int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only PCM16 mono supported")
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
        return samples, w.getframerate()


# ---------------------------------------------------------------------------
# RVID (raw-video container: magic | w | h | n_frames | RGB frames)
# ---------------------------------------------------------------------------

RVID_MAGIC = b"RVID"


def rvid_encode(frames: list[bytes], width: int, height: int) -> bytes:
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame size mismatch")
    return RVID_MAGIC + struct.pack(">III", width, height, len(frames)) + b"".join(frames)


def rvid_decode(data: bytes) -> tuple[list[bytes], int, int]:
    if data[:4] != RVID_MAGIC:
        raise ValueError("not an RVID stream")
    width, height, n = struct.unpack(">III", data[4:16])
    size = width * height * 3
    frames = [data[16 + i * size : 16 + (i + 1) * size] for i in range(n)]
    if any(len(f) != size for f in frames):
        raise ValueError("truncated RVID stream")
    return frames, width, height
