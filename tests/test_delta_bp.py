"""DELTA_BINARY_PACKED — mirrors
`DeltaBinaryPackingValuesWriterForIntegerTest.java:42-145` (+ ForLong) case
for case, plus wrapping-arithmetic and header checks."""

import numpy as np
import pytest

from rayenc.codecs import delta_bp
from rayenc.codecs.varint import read_uvarint, read_zigzag_varint32

BLOCK = 128


def roundtrip32(vals):
    vals = np.asarray(vals, np.int32)
    buf = delta_bp.encode(vals)
    out = delta_bp.decode(buf, np.int32)
    np.testing.assert_array_equal(out, vals)
    return buf


def roundtrip64(vals):
    vals = np.asarray(vals, np.int64)
    buf = delta_bp.encode(vals)
    out = delta_bp.decode(buf, np.int64)
    np.testing.assert_array_equal(out, vals)
    return buf


def test_header():
    buf = delta_bp.encode(np.array([7], np.int32))
    b, i = read_uvarint(buf, 0)
    m, i = read_uvarint(buf, i)
    n, i = read_uvarint(buf, i)
    first, i = read_zigzag_varint32(buf, i)
    assert (b, m, n, first) == (128, 4, 1, 7)
    assert i == len(buf)


def test_empty_and_single():
    assert delta_bp.decode(delta_bp.encode(np.empty(0, np.int32)), np.int32).size == 0
    roundtrip32([-42])


# --- reference test cases (Random(0) analog via seeded numpy) ---


def test_aligned_to_block():  # shouldReadWriteWhenDataIsAlignedWithBlock
    rng = np.random.default_rng(0)
    roundtrip32(rng.integers(-(2**31), 2**31, 5 * BLOCK, dtype=np.int64).astype(np.int32))


def test_block_not_aligned_to_miniblock():  # 128 - 3
    rng = np.random.default_rng(0)
    roundtrip32(rng.integers(0, 20, BLOCK - 3))


def test_partial_miniblock():  # 32 - 3
    rng = np.random.default_rng(0)
    roundtrip32(rng.integers(0, 20, 32 - 3))


def test_data_not_aligned():  # 5*128+3, 5*128+1
    rng = np.random.default_rng(0)
    roundtrip32(rng.integers(0, 33, 5 * BLOCK + 3))
    roundtrip32(rng.integers(0, 33, 5 * BLOCK + 1))


def test_negative_deltas():  # 10 - (i*32 - random(6))
    rng = np.random.default_rng(0)
    i = np.arange(5 * BLOCK)
    roundtrip32(10 - (i * 32 - rng.integers(0, 6, len(i))))


def test_constant_deltas():  # i*32
    roundtrip32(np.arange(5 * BLOCK, dtype=np.int32) * 32)


def test_constant_values():  # all 3
    buf = roundtrip32(np.full(5 * BLOCK, 3, np.int32))
    # constant values -> all-zero deltas -> tiny page
    assert len(buf) < 5 * BLOCK // 16


def test_min_max_alternating_wraparound():  # Integer.MIN/MAX alternating
    vals = np.empty(BLOCK * 2 + 3, np.int64)
    vals[::2] = -(2**31)
    vals[1::2] = 2**31 - 1
    roundtrip32(vals.astype(np.int32))


def test_small_range_random():
    rng = np.random.default_rng(0)
    roundtrip32(rng.integers(-10, 10, 1000))


def test_miniblock_size_validation():  # miniblock % 8 != 0 must raise
    with pytest.raises(ValueError):
        delta_bp.encode(np.arange(10, dtype=np.int32), block=128, miniblocks=3)
    with pytest.raises(ValueError):
        delta_bp.encode(np.arange(10, dtype=np.int32), block=100, miniblocks=3)


# --- int64 variants (DeltaBinaryPackingValuesWriterForLongTest) ---


def test_long_roundtrips():
    rng = np.random.default_rng(0)
    roundtrip64(rng.integers(-(2**63), 2**63 - 1, 3 * BLOCK + 5, dtype=np.int64))
    roundtrip64(np.arange(5 * BLOCK, dtype=np.int64) * (2**33))
    vals = np.empty(300, np.int64)
    vals[::2] = -(2**63)
    vals[1::2] = 2**63 - 1
    roundtrip64(vals)


def test_decoded_byte_end():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1000, 777).astype(np.int32)
    buf = delta_bp.encode(vals)
    tail = b"\xde\xad\xbe\xef"
    assert delta_bp.decoded_byte_end(buf + tail) == len(buf)


def test_size_beats_plain_on_sorted():
    vals = np.cumsum(np.random.default_rng(5).integers(0, 4, 10000)).astype(np.int32)
    buf = delta_bp.encode(vals)
    assert len(buf) < len(vals) * 4 // 4  # far smaller than PLAIN
