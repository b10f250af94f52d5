"""BYTE_STREAM_SPLIT: byte-plane transpose of fixed-width values.

Mirrors `parquet-column/.../values/bytestreamsplit/ByteStreamSplitValuesWriter.java:36-100`:
byte i of every k-byte value is scattered into stream i; streams concatenated.
Helps downstream block compressors on float data.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values)
    k = v.dtype.itemsize
    return v.view(np.uint8).reshape(-1, k).T.tobytes()


def decode(buf, n: int, dtype) -> np.ndarray:
    dtype = np.dtype(dtype)
    k = dtype.itemsize
    planes = np.frombuffer(buf, np.uint8, count=n * k).reshape(k, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dtype)
