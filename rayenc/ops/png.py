"""Pure-numpy PNG encode/decode (no pillow/libpng — zlib is stdlib).

Implements the public PNG spec subset that matters for training-data
plumbing: 8-bit greyscale (color type 0), RGB (2), and RGBA (6), all five
scanline filters on decode, filter 0 (None) on encode. This turns the
multimodal decode stage from an honest stub into a real kernel: payloads
round-trip bit-exactly through an independent reader (pyarrow ships zero
image codecs, so the cross-check in tests is against our own encoder's
spec-conformant output plus hand-built filtered files).

Scale note: filters 1/3/4 (Sub/Average/Paeth) are sequential in x by
definition; the decoder vectorizes across the row where the recurrence
allows (Up is fully vectorized) and falls back to a per-pixel loop for
Sub/Average/Paeth rows — fine for thumbnail-sized training images; real
pipelines hand the payload to a native codec in the same stage shape.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes (filter 0 scanlines)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = np.zeros((h, 1 + w * c), np.uint8)
    rows[:, 1:] = img.reshape(h, w * c)  # filter byte 0 per scanline
    idat = zlib.compress(rows.tobytes(), level)
    return SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8. Verifies chunk CRCs."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"PNG depth={depth} colortype={ctype} interlace={interlace}"
        )
    c = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = 1 + w * c
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub — sequential in x
            cur = line.copy()
            for x in range(c, w * c):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(w * c):
                left = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(w * c):
                left = cur[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, c)


# ------------------------------------------------------------------- WAV
# (kept in this module: both are the pure-python media codecs backing the
# multimodal stages; RIFF/PCM is the public WAVE format)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 samples (int16 or float in [-1, 1]) -> WAV bytes."""
    s = np.asarray(samples)
    if s.dtype.kind == "f":
        s = np.clip(s, -1.0, 1.0)
        s = (s * 32767.0).astype("<i2")
    else:
        s = s.astype("<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels), rate).
    PCM 16-bit only (format tag 1)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(f"WAV format {fmt_tag}/{bits}bit")
        elif tag == b"data":
            samples = np.frombuffer(body, "<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    out = (samples.astype(np.float32) / 32768.0).reshape(-1, channels)
    return out, rate
