"""DELTA_BINARY_PACKED for INT32 / INT64.

Format (mirrors `parquet-column/.../values/delta/DeltaBinaryPackingValuesWriter.java:31-50`
and `DeltaBinaryPackingValuesWriterForInteger.java:75-164`):

    page      := <header> <block>*
    header    := uvarint(blockSize) uvarint(numMiniblocks) uvarint(totalCount)
                 zigzag_varint(firstValue)
    block     := zigzag_varint(minDelta) <numMiniblocks width bytes>
                 <flushed miniblocks bit-packed at their width>

Deltas are computed in *wrapping* int32/int64 arithmetic
(`DeltaBinaryPackingValuesWriterForInteger.java:85-88`); per block the deltas
are frame-of-reference shifted by the block min (wrapping subtraction, result
viewed unsigned), each miniblock packed at the bit width of the OR-mask of its
real values (`:150-164`). Only ceil(realDeltas/miniSize) miniblocks are
emitted for the final block; a partially-filled miniblock is emitted full-size
(we pad with zeros where the reference packs leftover garbage — readers ignore
values past totalCount, `:118-124`). Unflushed miniblocks still get a width
byte (we write 0 where the reference writes a stale byte, `:105-107`).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_widths_of_or, pack_lsb, unpack_lsb
from .varint import (
    read_uvarint,
    read_zigzag_varint32,
    read_zigzag_varint64,
    write_uvarint,
    write_zigzag_varint32,
    write_zigzag_varint64,
)

DEFAULT_BLOCK = 128  # DeltaBinaryPackingValuesWriter.DEFAULT_NUM_BLOCK_VALUES
DEFAULT_MINIBLOCKS = 4  # DEFAULT_NUM_MINIBLOCKS


def _config(block: int, miniblocks: int) -> int:
    msize = block // miniblocks
    if block % miniblocks or msize % 8:
        raise ValueError(f"miniBlockSize must be a multiple of 8, got {block}/{miniblocks}")
    return msize


def encode(
    values: np.ndarray,
    block: int = DEFAULT_BLOCK,
    miniblocks: int = DEFAULT_MINIBLOCKS,
) -> bytes:
    v = np.ascontiguousarray(values)
    is64 = v.dtype == np.int64
    if not is64:
        v = v.astype(np.int32, copy=False)
    msize = _config(block, miniblocks)
    n = len(v)

    out = bytearray()
    write_uvarint(out, block)
    write_uvarint(out, miniblocks)
    write_uvarint(out, n)
    wzz = write_zigzag_varint64 if is64 else write_zigzag_varint32
    wzz(out, int(v[0]) if n else 0)
    if n <= 1:
        return bytes(out)

    sdt = np.int64 if is64 else np.int32
    udt = np.uint64 if is64 else np.uint32
    with np.errstate(over="ignore"):
        deltas = (v[1:] - v[:-1]).astype(sdt, copy=False)  # wrapping diff

    nd = len(deltas)
    nblocks = (nd + block - 1) // block
    pad = nblocks * block - nd
    if pad:
        deltas = np.concatenate([deltas, np.zeros(pad, sdt)])
    dmat = deltas.reshape(nblocks, block)
    real = np.minimum(np.maximum(nd - np.arange(nblocks) * block, 0), block)

    # per-block min over real deltas only (pad positions masked to +inf-like)
    col = np.arange(block)
    mask_real = col[None, :] < real[:, None]
    big = np.iinfo(sdt).max
    masked = np.where(mask_real, dmat, big)
    mins = masked.min(axis=1).astype(sdt)

    with np.errstate(over="ignore"):
        adj = (dmat - mins[:, None]).astype(sdt, copy=False).view(udt)
    adj = np.where(mask_real, adj, 0).astype(udt)

    # per-miniblock OR mask over real values -> bit widths
    adj3 = adj.reshape(nblocks, miniblocks, msize)
    ors = np.bitwise_or.reduce(adj3, axis=2)
    widths = bit_widths_of_or(ors)  # (nblocks, miniblocks)
    mb_real = np.ceil(real / msize).astype(np.int64)  # flushed miniblocks per block
    flushed = np.arange(miniblocks)[None, :] < mb_real[:, None]
    widths = np.where(flushed, widths, 0)

    mins_l = mins.tolist()
    widths_l = widths.tolist()
    mb_real_l = mb_real.tolist()
    for b in range(nblocks):
        wzz(out, mins_l[b])
        out += bytes(widths_l[b])
        wrow = widths_l[b]
        for m in range(mb_real_l[b]):
            out += pack_lsb(adj3[b, m], wrow[m])
    return bytes(out)


def decode(buf, out_dtype=None) -> np.ndarray:
    """Decode a full DELTA_BINARY_PACKED page (count is in the header).

    out_dtype: np.int32 (default) or np.int64.
    """
    block, i = read_uvarint(buf, 0)
    miniblocks, i = read_uvarint(buf, i)
    n, i = read_uvarint(buf, i)
    is64 = out_dtype == np.int64
    rzz = read_zigzag_varint64 if is64 else read_zigzag_varint32
    first, i = rzz(buf, i)
    sdt = np.int64 if is64 else np.int32
    if n == 0:
        return np.empty(0, sdt)
    if n == 1:
        return np.array([first], sdt)
    msize = _config(block, miniblocks)

    nd = n - 1
    # pass 1: walk headers, collect (min, widths, data offsets)
    pos = i
    blocks_meta = []
    remaining = nd
    while remaining > 0:
        mn, pos = rzz(buf, pos)
        wrow = list(buf[pos : pos + miniblocks])
        pos += miniblocks
        in_block = min(block, remaining)
        mb = (in_block + msize - 1) // msize
        offs = []
        for m in range(mb):
            nbytes = msize * wrow[m] // 8
            offs.append((pos, wrow[m]))
            pos += nbytes
        blocks_meta.append((mn, in_block, offs))
        remaining -= in_block

    deltas = np.empty(nd, sdt)
    dpos = 0
    udt = np.uint64 if is64 else np.uint32
    for mn, in_block, offs in blocks_meta:
        vals = [
            unpack_lsb(buf[o : o + msize * w // 8], msize, w, udt) for (o, w) in offs
        ]
        arr = vals[0] if len(vals) == 1 else np.concatenate(vals)
        with np.errstate(over="ignore"):
            d = (arr[:in_block].view(sdt) + sdt(mn)).astype(sdt, copy=False)
        deltas[dpos : dpos + in_block] = d
        dpos += in_block

    out = np.empty(n, sdt)
    out[0] = first
    with np.errstate(over="ignore"):
        np.cumsum(deltas, dtype=sdt, out=out[1:])
        out[1:] += sdt(first)
    return out


def decoded_byte_end(buf) -> int:
    """Return the byte length of the encoded page starting at buf[0]
    (needed when pages are concatenated, e.g. DELTA_BYTE_ARRAY)."""
    block, i = read_uvarint(buf, 0)
    miniblocks, i = read_uvarint(buf, i)
    n, i = read_uvarint(buf, i)
    _, i = read_uvarint(buf, i)  # zigzag first value
    if n <= 1:
        return i
    msize = _config(block, miniblocks)
    remaining = n - 1
    while remaining > 0:
        _, i = read_uvarint(buf, i)  # zigzag min delta
        wrow = list(buf[i : i + miniblocks])
        i += miniblocks
        in_block = min(block, remaining)
        mb = (in_block + msize - 1) // msize
        for m in range(mb):
            i += msize * wrow[m] // 8
        remaining -= in_block
    return i
