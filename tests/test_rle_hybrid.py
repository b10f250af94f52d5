"""RLE / bit-packed hybrid — grammar golden bytes mirrored from
`parquet-column/src/test/.../rle/TestRunLengthBitPackingHybridEncoder.java:44-287`
plus vectorized-vs-state-machine equivalence and round trips."""

import numpy as np
import pytest

from rayenc.codecs import rle_hybrid
from rayenc.codecs.bitpack import unpack_lsb
from rayenc.codecs.varint import read_uvarint


def enc(values, width=3):
    return rle_hybrid.encode(np.asarray(values, np.uint32), width)


def test_rle_only():  # TestRunLengthBitPackingHybridEncoder.testRLEOnly
    buf = enc([4] * 100 + [5] * 100)
    h, i = read_uvarint(buf, 0)
    assert h == 200 and buf[i] == 4
    h, j = read_uvarint(buf, i + 1)
    assert h == 200 and buf[j] == 5
    assert j + 1 == len(buf)


def test_repeated_zeros():  # testRepeatedZeros: initial previousValue == 0
    buf = enc([0] * 10)
    h, i = read_uvarint(buf, 0)
    assert h == 20 and buf[i] == 0 and i + 1 == len(buf)


def test_bitwidth_zero():  # testBitWidthZero
    buf = rle_hybrid.encode(np.zeros(10, np.uint32), 0)
    h, i = read_uvarint(buf, 0)
    assert h == 20 and i == len(buf)


def test_bit_packing_only():  # testBitPackingOnly
    vals = [i % 3 for i in range(100)]
    buf = enc(vals)
    h, i = read_uvarint(buf, 0)
    assert h == 27  # ((104/8) << 1) | 1
    out = unpack_lsb(buf[i:], 104, 3)
    assert out[:100].tolist() == vals
    assert i + 104 * 3 // 8 == len(buf)


def test_bit_packing_overflow():  # testBitPackingOverflow: 504-value run cap
    vals = [i % 3 for i in range(1000)]
    buf = enc(vals)
    h, i = read_uvarint(buf, 0)
    assert h == 127  # ((504/8) << 1) | 1
    out = unpack_lsb(buf[i : i + 504 * 3 // 8], 504, 3)
    assert out.tolist() == vals[:504]
    i += 504 * 3 // 8
    h, i = read_uvarint(buf, i)
    assert h == 125  # ((496/8) << 1) | 1
    out = unpack_lsb(buf[i:], 496, 3)
    assert out[:496].tolist() == vals[504:]


def test_transition_bitpacked_to_rle():  # testTransitionFromBitPackingToRle
    vals = [0, 1, 0, 1, 0] + [2] * 103
    buf = enc(vals)
    h, i = read_uvarint(buf, 0)
    assert h == 3  # one group of 8: 5 literals + 3 donated repeats
    out = unpack_lsb(buf[i : i + 3], 8, 3)
    assert out.tolist() == [0, 1, 0, 1, 0, 2, 2, 2]
    h, i = read_uvarint(buf, i + 3)
    assert h == 200 and buf[i] == 2
    assert i + 1 == len(buf)


def test_padding_zeros_on_unfinished_group():
    # 7 values -> one zero-padded group
    vals = [1, 1, 1, 1, 0, 0, 0]
    buf = enc(vals, width=1)
    h, i = read_uvarint(buf, 0)
    assert h == 3
    out = unpack_lsb(buf[i:], 8, 1)
    assert out.tolist() == vals + [0]


@pytest.mark.parametrize(
    "pattern",
    [
        "random",
        "all_same",
        "alternating_runs8",
        "short_runs",
        "sorted_lowndv",
        "single",
        "group_boundary_7",
        "group_boundary_8",
        "group_boundary_9",
        "run_spanning_groups",
        "trailing_run",
    ],
)
def test_vectorized_matches_state_machine(pattern):
    rng = np.random.default_rng(42)
    if pattern == "random":
        vals = rng.integers(0, 32, 3000, dtype=np.uint32)
    elif pattern == "all_same":
        vals = np.full(777, 13, np.uint32)
    elif pattern == "alternating_runs8":
        vals = np.repeat(np.arange(50, dtype=np.uint32) % 2 * 3, 8)
    elif pattern == "short_runs":
        vals = np.repeat(rng.integers(0, 8, 500, dtype=np.uint32), rng.integers(1, 7))
    elif pattern == "sorted_lowndv":
        vals = np.sort(rng.integers(0, 5, 2000, dtype=np.uint32))
    elif pattern == "single":
        vals = np.array([7], np.uint32)
    elif pattern == "group_boundary_7":
        vals = rng.integers(0, 32, 7, dtype=np.uint32)
    elif pattern == "group_boundary_8":
        vals = rng.integers(0, 32, 8, dtype=np.uint32)
    elif pattern == "group_boundary_9":
        vals = rng.integers(0, 32, 9, dtype=np.uint32)
    elif pattern == "run_spanning_groups":
        vals = np.array([1, 2, 3] + [9] * 20 + [1, 2] + [9] * 9 + [4], np.uint32)
    else:  # trailing_run
        vals = np.array([1, 2, 3, 4, 5] + [6] * 50, np.uint32)
    width = 5
    fast = rle_hybrid.encode(vals, width)
    ref = rle_hybrid.encode_scalar(vals.tolist(), width)
    assert fast == ref, pattern
    out = rle_hybrid.decode(fast, len(vals), width)
    np.testing.assert_array_equal(out, vals)


def test_vectorized_matches_state_machine_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(0, 400))
        # mixture of runs and noise to hit donation corners
        vals = []
        while len(vals) < n:
            if rng.random() < 0.5:
                vals += [int(rng.integers(0, 16))] * int(rng.integers(1, 30))
            else:
                vals += rng.integers(0, 16, int(rng.integers(1, 10))).tolist()
        vals = np.array(vals[:n], np.uint32)
        fast = rle_hybrid.encode(vals, 4)
        ref = rle_hybrid.encode_scalar(vals.tolist(), 4)
        assert fast == ref, f"trial {trial}"
        if n:
            np.testing.assert_array_equal(rle_hybrid.decode(fast, n, 4), vals)


def test_framed():
    vals = np.arange(100, dtype=np.uint32) % 4
    buf = rle_hybrid.encode_framed(vals, 2)
    assert int.from_bytes(buf[:4], "little") == len(buf) - 4
    out, consumed = rle_hybrid.decode_framed(buf, 100, 2)
    assert consumed == len(buf)
    np.testing.assert_array_equal(out, vals)


def test_multibyte_rle_header_and_wide_value():
    vals = np.full(100000, 70000, np.uint32)  # needs 17-bit width, 3-byte value
    buf = rle_hybrid.encode(vals, 17)
    h, i = read_uvarint(buf, 0)
    assert h == 100000 << 1
    assert int.from_bytes(buf[i : i + 3], "little") == 70000
    np.testing.assert_array_equal(rle_hybrid.decode(buf, 100000, 17), vals)
