"""PLAIN encoding for all physical types.

Mirrors `parquet-column/.../values/plain/PlainValuesWriter.java:49-76`
(little-endian fixed width; BINARY = len:int32 LE + bytes per value) and
`BooleanPlainValuesWriter.java` (bit-packed booleans, LSB first).
"""

from __future__ import annotations

import numpy as np

_FIXED = {
    "INT32": np.dtype("<i4"),
    "INT64": np.dtype("<i8"),
    "FLOAT": np.dtype("<f4"),
    "DOUBLE": np.dtype("<f8"),
}


def encode_fixed(values: np.ndarray, ptype: str) -> bytes:
    return np.ascontiguousarray(values, dtype=_FIXED[ptype]).tobytes()


def decode_fixed(buf, n: int, ptype: str) -> np.ndarray:
    return np.frombuffer(buf, _FIXED[ptype], count=n)


def encode_boolean(values: np.ndarray) -> bytes:
    return np.packbits(
        np.ascontiguousarray(values, dtype=np.uint8), bitorder="little"
    ).tobytes()


def decode_boolean(buf, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, np.uint8), bitorder="little", count=n).astype(
        bool
    )


def encode_binary(offsets: np.ndarray, data: np.ndarray) -> bytes:
    """len:int32 LE + bytes, per value. offsets: int64[n+1], data: uint8."""
    n = len(offsets) - 1
    lengths = np.diff(offsets).astype(np.int64)
    total = 4 * n + int(lengths.sum())
    out = np.empty(total, np.uint8)
    # destination start of each length prefix
    dst_starts = np.zeros(n, np.int64)
    if n > 1:
        np.cumsum(lengths[:-1] + 4, out=dst_starts[1:])
    # write length prefixes
    len_le = lengths.astype("<i4").view(np.uint8).reshape(n, 4)
    idx4 = dst_starts[:, None] + np.arange(4)
    out[idx4.ravel()] = len_le.ravel()
    # write payload bytes via repeat-trick gather
    if lengths.sum() > 0:
        dst_payload = _ranges(dst_starts + 4, lengths)
        src_payload = _ranges(offsets[:-1].astype(np.int64), lengths)
        out[dst_payload] = np.asarray(data, np.uint8)[src_payload]
    return out.tobytes()


def decode_binary(buf, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (offsets int64[n+1], data uint8[...])."""
    raw = np.frombuffer(buf, np.uint8)
    offsets = np.zeros(n + 1, np.int64)
    lengths = np.empty(n, np.int64)
    pos = 0
    # lengths are at variable positions; sequential scan over values would be
    # O(n) python — instead peel iteratively: read the first length, then jump.
    # Vectorized approach: iterate but in chunks is still sequential; n per page
    # is <= 20k and this is only used for PLAIN binary (rare fallback), so a
    # python loop is acceptable here.
    for k in range(n):
        ln = int.from_bytes(raw[pos : pos + 4].tobytes(), "little")
        lengths[k] = ln
        pos += 4 + ln
    np.cumsum(lengths, out=offsets[1:])
    data = np.empty(int(offsets[-1]), np.uint8)
    src_starts = np.zeros(n, np.int64)
    if n > 1:
        np.cumsum(lengths[:-1] + 4, out=src_starts[1:])
    src_starts += 4
    if len(data):
        data[_ranges(offsets[:-1], lengths)] = raw[_ranges(src_starts, lengths)]
    return offsets, data


def encode_fixed_len(values: np.ndarray) -> bytes:
    """FIXED_LEN_BYTE_ARRAY: raw bytes (values: (n, width) uint8)."""
    return np.ascontiguousarray(values, np.uint8).tobytes()


def decode_fixed_len(buf, n: int, width: int) -> np.ndarray:
    return np.frombuffer(buf, np.uint8, count=n * width).reshape(n, width)


def _ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flat index array covering [starts[i], starts[i]+lengths[i]) for all i."""
    lengths = np.asarray(lengths, np.int64)
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = np.cumsum(lengths)
    idx = np.arange(total, dtype=np.int64)
    shift = np.repeat(np.asarray(starts, np.int64) - (ends - lengths), lengths)
    return idx + shift
