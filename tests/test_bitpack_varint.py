"""Bit packing + varint kernels (mirrors TestBitPackingColumn.java coverage:
all bit widths round-trip)."""

import numpy as np
import pytest

from rayenc.codecs.bitpack import bit_width32, bit_widths_of_or, pack_lsb, unpack_lsb
from rayenc.codecs.varint import (
    read_uvarint,
    read_zigzag_varint32,
    uvarint_encode_batch,
    write_uvarint,
    write_zigzag_varint32,
    zigzag32,
    unzigzag32,
)


@pytest.mark.parametrize("width", list(range(0, 33)) + [40, 48, 64])
def test_pack_roundtrip_all_widths(width):
    rng = np.random.default_rng(0)
    n = 64
    maxv = (1 << width) if width < 64 else (1 << 63)
    vals = rng.integers(0, max(maxv, 1), size=n, dtype=np.uint64)
    buf = pack_lsb(vals, width)
    assert len(buf) == n * width // 8
    out = unpack_lsb(buf, n, width, np.uint64)
    np.testing.assert_array_equal(out, vals)


def test_pack_layout_lsb_first():
    # 8 values of width 3: value bits laid out LSB first
    vals = np.array([1, 2, 3, 4, 5, 6, 7, 0], np.uint64)
    buf = pack_lsb(vals, 3)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8), bitorder="little")
    expect = []
    for v in vals:
        expect += [(int(v) >> k) & 1 for k in range(3)]
    assert bits[: len(expect)].tolist() == expect


def test_bit_width32():
    assert bit_width32(0) == 0
    assert bit_width32(1) == 1
    assert bit_width32(255) == 8
    assert bit_width32(256) == 9
    assert bit_width32(-1) == 32  # java int -1 => 32 leading ones


def test_bit_widths_of_or():
    v = np.array([0, 1, 7, 8, 2**31, 2**32 - 1, 2**53 + 1, 2**63], np.uint64)
    expect = [0, 1, 3, 4, 32, 32, 54, 64]
    assert bit_widths_of_or(v).tolist() == expect


@pytest.mark.parametrize("value", [0, 1, 127, 128, 300, 2**21, 2**31 - 1, 2**32 - 1])
def test_uvarint_roundtrip(value):
    out = bytearray()
    write_uvarint(out, value)
    got, i = read_uvarint(out, 0)
    assert got == value and i == len(out)


def test_uvarint_negative_java_semantics():
    out = bytearray()
    write_uvarint(out, -1)  # java writeUnsignedVarInt(-1) emits 5 bytes
    assert len(out) == 5
    got, _ = read_uvarint(out, 0)
    assert got == 2**32 - 1


@pytest.mark.parametrize("value", [0, -1, 1, -64, 64, -(2**31), 2**31 - 1])
def test_zigzag32(value):
    assert unzigzag32(zigzag32(value)) == value
    out = bytearray()
    write_zigzag_varint32(out, value)
    got, _ = read_zigzag_varint32(out, 0)
    assert got == value


def test_zigzag_known_values():
    assert zigzag32(0) == 0
    assert zigzag32(-1) == 1
    assert zigzag32(1) == 2
    assert zigzag32(-2) == 3


def test_uvarint_batch_matches_scalar():
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [
            rng.integers(0, 2**k, size=50, dtype=np.uint64)
            for k in (7, 14, 21, 32, 63)
        ]
    )
    flat, lengths = uvarint_encode_batch(vals)
    expect = bytearray()
    for v in vals:
        write_uvarint(expect, int(v))
    assert bytes(flat.tobytes()) == bytes(expect)
    i = 0
    for v, ln in zip(vals, lengths):
        got, j = read_uvarint(flat, i)
        assert got == int(v) and j - i == ln
        i = j
