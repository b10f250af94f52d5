"""Vectorized XXH64 (seed 0) — the hash parquet bloom filters mandate.

Implements the public XXH64 algorithm (Yann Collet's xxHash spec) with
numpy uint64 lane arithmetic: fixed-width inputs (the plain encodings of
INT32/INT64/FLOAT/DOUBLE) hash as one vector pass; variable-length byte
strings are bucketed by length so each distinct length runs its stripe /
tail schedule vectorized across all values of that length. The scalar
`xxh64` is the readable reference the batch kernels are tested against
(plus the published test vectors).

Reference consumer: BlockSplitBloomFilter.java (hash function XXHASH,
seed 0, over the value's plain encoding).
"""

from __future__ import annotations

import numpy as np

P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)

_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar reference XXH64."""
    seed = seed & _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + 0x9E3779B185EBCA87 + 0xC2B2AE3D27D4EB4F) & _M
        v2 = (seed + 0xC2B2AE3D27D4EB4F) & _M
        v3 = seed
        v4 = (seed - 0x9E3779B185EBCA87) & _M

        def rnd(acc, lane):
            acc = (acc + lane * 0xC2B2AE3D27D4EB4F) & _M
            acc = ((acc << 31) | (acc >> 33)) & _M
            return (acc * 0x9E3779B185EBCA87) & _M

        while i + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            ((v1 << 1) | (v1 >> 63))
            + ((v2 << 7) | (v2 >> 57))
            + ((v3 << 12) | (v3 >> 52))
            + ((v4 << 18) | (v4 >> 46))
        ) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * 0x9E3779B185EBCA87 + 0x85EBCA77C2B2AE63) & _M
    else:
        h = (seed + 0x27D4EB2F165667C5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * 0xC2B2AE3D27D4EB4F) & _M
        k = ((k << 31) | (k >> 33)) & _M
        k = (k * 0x9E3779B185EBCA87) & _M
        h ^= k
        h = (((h << 27) | (h >> 37)) * 0x9E3779B185EBCA87 + 0x85EBCA77C2B2AE63) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * 0x9E3779B185EBCA87) & _M
        h = (((h << 23) | (h >> 41)) * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) & _M
        i += 4
    while i < n:
        h ^= (data[i] * 0x27D4EB2F165667C5) & _M
        h = (((h << 11) | (h >> 53)) * 0x9E3779B185EBCA87) & _M
        i += 1
    h ^= h >> 33
    h = (h * 0xC2B2AE3D27D4EB4F) & _M
    h ^= h >> 29
    h = (h * 0x165667B19E3779F9) & _M
    h ^= h >> 32
    return h


def _avalanche(h):
    h = h ^ (h >> np.uint64(33))
    h = h * P2
    h = h ^ (h >> np.uint64(29))
    h = h * P3
    h = h ^ (h >> np.uint64(32))
    return h


def _round_v(acc, lane):
    return _rotl(acc + lane * P2, 31) * P1


def _tail(h, mat: np.ndarray, start: int, L: int):
    """Apply the <32-byte tail schedule to a (n, L) byte matrix from
    ``start`` (vectorized over rows)."""
    i = start
    while i + 8 <= L:
        k = mat[:, i : i + 8].copy().view("<u8").reshape(-1)
        h = h ^ _round_v(np.uint64(0), k)
        h = _rotl(h, 27) * P1 + P4
        i += 8
    if i + 4 <= L:
        k = mat[:, i : i + 4].copy().view("<u4").reshape(-1).astype(np.uint64)
        h = h ^ (k * P1)
        h = _rotl(h, 23) * P2 + P3
        i += 4
    while i < L:
        h = h ^ (mat[:, i].astype(np.uint64) * P5)
        h = _rotl(h, 11) * P1
        i += 1
    return _avalanche(h)


def _xxh64_matrix(mat: np.ndarray) -> np.ndarray:
    """XXH64(seed=0) of every row of a (n, L) uint8 matrix."""
    n, L = mat.shape
    with np.errstate(over="ignore"):
        if L < 32:
            h = np.full(n, int(P5) + L, np.uint64)
            return _tail(h, mat, 0, L)
        v1 = np.full(n, (int(P1) + int(P2)) & _M, np.uint64)
        v2 = np.full(n, int(P2), np.uint64)
        v3 = np.zeros(n, np.uint64)
        v4 = np.full(n, (-int(P1)) & _M, np.uint64)
        i = 0
        while i + 32 <= L:
            lanes = mat[:, i : i + 32].copy().view("<u8")  # (n, 4)
            v1 = _round_v(v1, lanes[:, 0])
            v2 = _round_v(v2, lanes[:, 1])
            v3 = _round_v(v3, lanes[:, 2])
            v4 = _round_v(v4, lanes[:, 3])
            i += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ _round_v(np.uint64(0), v)) * P1 + P4
        h = h + np.uint64(L)
        return _tail(h, mat, i, L)


def xxh64_fixed(arr: np.ndarray) -> np.ndarray:
    """XXH64 of each element's little-endian byte representation (the plain
    encoding of INT32/INT64/FLOAT/DOUBLE)."""
    a = np.ascontiguousarray(arr)
    mat = a.view(np.uint8).reshape(len(a), a.dtype.itemsize)
    return _xxh64_matrix(mat)


def xxh64_bytes(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """XXH64 of each variable-length byte string (Arrow offsets+data layout),
    vectorized per distinct length."""
    offsets = np.asarray(offsets, np.int64)
    data = np.asarray(data, np.uint8)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    out = np.empty(n, np.uint64)
    for L in np.unique(lengths):
        idx = np.flatnonzero(lengths == L)
        L = int(L)
        if L == 0:
            out[idx] = np.uint64(xxh64(b""))
            continue
        starts = offsets[idx]
        gather = starts[:, None] + np.arange(L, dtype=np.int64)[None, :]
        out[idx] = _xxh64_matrix(data[gather])
    return out
