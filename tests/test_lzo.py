"""Legacy LZO (CompressionCodec id 3) — clean-room LZO1X block codec +
Hadoop framing (CompressionCodecName.java:29,
parquet-hadoop/.../codec/NonBlockedDecompressorStream.java).

No LZO library exists in this container (liblzo2 is GPL and python-lzo is
absent), so there is no independent-decoder differential; instead the
decoder is pinned with hand-crafted instruction streams for every opcode
family from the public format grammar, and compress→decompress roundtrips
fuzz the pair.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import parquet_write
from rayenc.codecs.lzo import LzoHadoopCodec, lzo1x_compress, lzo1x_decompress
from rayenc.parquet_compat import read_table_conformance
from rayenc.parquet_read_enc import read_table_filtered
from rayenc.selector import EncodeConfig


def _lineitem():
    return pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"],
    )


# ------------------------------------------------- hand-crafted opcode pins


def test_eof_only_stream_is_empty():
    assert lzo1x_decompress(b"\x11\x00\x00") == b""


def test_first_byte_literal_runs():
    # first byte > 17: initial literal run of (byte - 17)
    assert lzo1x_decompress(bytes([17 + 5]) + b"abcde" + b"\x11\x00\x00") == b"abcde"
    # short form (1..3 literals) must be followed by a match; EOF is one
    assert lzo1x_decompress(bytes([17 + 2]) + b"hi" + b"\x11\x00\x00") == b"hi"


def test_long_literal_run_opcodes():
    # 0000LLLL with state == 0: length = L + 3
    assert (
        lzo1x_decompress(bytes([4]) + b"0123456" + b"\x11\x00\x00") == b"0123456"
    )
    # 00000000 + 255-run extension (zero bytes add 255 each, nonzero byte
    # terminates): length = 18 + 255*1 + 227 = 500
    data = bytes(range(250)) * 2  # 500 bytes
    stream = bytes([0, 0, 500 - 18 - 255]) + data + b"\x11\x00\x00"
    assert lzo1x_decompress(stream) == data


def test_m2_short_and_long_matches():
    # 21 literals, then M2 "copy 4 from distance 4" (01 L=1 D=011 S=00, H=0):
    # opcode 0b0110_1100 = 0x6C, distance = (0<<3)+3+1 = 4
    lit = b"abcdefghijklmnopqwxyz"
    stream = bytes([17 + 21]) + lit + bytes([0x6C, 0x00]) + b"\x11\x00\x00"
    assert lzo1x_decompress(stream) == lit + b"wxyz"
    # M2 long: 1 L=3 D=000 S=01 (0xE1), H=0 -> copy 8 from distance 1,
    # then S=1 trailing literal
    stream = bytes([17 + 4]) + b"wxyz" + bytes([0xE1, 0x00]) + b"!" + b"\x11\x00\x00"
    assert lzo1x_decompress(stream) == b"wxyz" + b"z" * 8 + b"!"


def test_m3_match_and_overlap():
    # M3: 001LLLLL, LE16 -> distance = (le>>2)+1; overlapping match
    # (distance 2 < length 10) repeats the 2-byte pattern
    stream = (
        bytes([17 + 4])
        + b"abXY"
        + bytes([0x20 | (10 - 2), (1 << 2) | 0, 0])  # dist 2, len 10, S=0
        + b"\x11\x00\x00"
    )
    assert lzo1x_decompress(stream) == b"abXY" + b"XY" * 5


def test_m4_match_distance_over_16k():
    # M4: 0001HLLL, distance = 16384 + (H<<14) + (le>>2)
    pad = bytes(range(256)) * 70  # 17920 bytes of literals
    n = len(pad)
    z, nz = divmod(n - 18 - 1, 255)
    stream = (
        bytes([0]) + b"\x00" * z + bytes([nz + 1]) + pad
        + bytes([0x10 | 3, (100 << 2) & 0xFF, (100 << 2) >> 8])  # len 5
        + b"\x11\x00\x00"
    )
    dist = 16384 + 100
    start = n - dist
    assert lzo1x_decompress(stream) == pad + pad[start : start + 5]


def test_truncated_and_corrupt_streams_raise():
    with pytest.raises(ValueError):
        lzo1x_decompress(b"")
    with pytest.raises(ValueError):
        lzo1x_decompress(bytes([17 + 10]) + b"abc")  # truncated literals
    with pytest.raises(ValueError):
        # match distance beyond output
        lzo1x_decompress(bytes([17 + 4]) + b"abcd" + bytes([0x6C, 0xFF]))


# --------------------------------------------------------- roundtrip fuzz


def test_compress_decompress_fuzz():
    rng = np.random.default_rng(1)
    for trial in range(120):
        n = int(rng.integers(0, 4000))
        alpha = int(rng.integers(1, 257))
        data = rng.integers(0, alpha, size=n).astype(np.uint8).tobytes()
        if rng.random() < 0.5 and n > 10:
            cut = int(rng.integers(1, n))
            data = data[:cut] * int(rng.integers(1, 5)) + data[cut:]
        assert lzo1x_decompress(lzo1x_compress(data)) == data, trial


def test_boundary_lengths():
    for n in (0, 1, 2, 3, 4, 18, 19, 238, 239, 273, 274, 255 * 3 + 18):
        data = bytes(range(256))[: min(n, 256)] * ((n + 255) // 256 or 1)
        data = data[:n]
        assert lzo1x_decompress(lzo1x_compress(data)) == data, n


def test_hadoop_framing_roundtrip():
    c = LzoHadoopCodec()
    for data in (b"", b"x", b"hello world " * 100, bytes(range(256)) * 3000):
        framed = c.compress(data).to_pybytes()
        assert int.from_bytes(framed[:4], "big") == len(data)
        assert bytes(c.decompress(framed, len(data))) == data
    # >256 KiB payload -> multiple chunks inside one block
    big = (b"0123456789abcdef" * 45_000)[: 700 * 1024]
    framed = c.compress(big).to_pybytes()
    assert bytes(c.decompress(framed, len(big))) == big
    # nonstandard (small) compressor buffer: chunks are self-delimiting,
    # so any chunking decodes
    import struct

    data = bytes(range(251)) * 611
    parts = [struct.pack(">I", len(data))]
    for pos in range(0, len(data), 16 * 1024):
        chunk = lzo1x_compress(data[pos : pos + 16 * 1024])
        parts += [struct.pack(">I", len(chunk)), chunk]
    assert bytes(c.decompress(b"".join(parts), len(data))) == data
    # garbage is an error, not silent passthrough
    with pytest.raises(ValueError):
        c.decompress(b"\x00\x01\x02 definitely not lzo", 64)


# ------------------------------------------------------ parquet end-to-end


def test_write_lzo_read_by_rayenc(tmp_path):
    import duckdb

    table = _lineitem()
    path = str(tmp_path / "lzo.parquet")
    parquet_write.write_table(
        table, path, EncodeConfig(compression="lzo"), row_group_size=2500
    )
    # codec id 3 on disk (duckdb's metadata reader names it; neither
    # duckdb nor pyarrow can DECODE lzo — pyarrow raises "not built" —
    # which is exactly why rayenc carries its own decoder)
    names = {
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT compression FROM parquet_metadata('{path}')"
        ).fetchall()
    }
    assert names == {"LZO"}
    back = read_table_conformance(path)
    for col in table.column_names:
        assert back.column(col).to_pylist() == table.column(col).to_pylist(), col


def test_filtered_read_over_lzo(tmp_path):
    table = _lineitem()
    path = str(tmp_path / "lzof.parquet")
    parquet_write.write_table(
        table, path, EncodeConfig(compression="lzo"), row_group_size=2000
    )
    got = read_table_filtered(path, [("l_orderkey", "<=", 500)])
    want = table.filter(pa.compute.field("l_orderkey") <= 500)
    assert got.sort_by("l_orderkey").equals(
        want.select(got.column_names).sort_by("l_orderkey")
    )


def test_transcompress_lzo_to_zstd(tmp_path):
    # the migration path old LZO lakes actually need: LZO -> modern codec
    from rayenc.rewrite import transcompress_parquet_raw

    t = _lineitem()
    src = str(tmp_path / "lzo.parquet")
    parquet_write.write_table(
        t, src, EncodeConfig(compression="lzo"), row_group_size=2000
    )
    out = str(tmp_path / "z.parquet")
    transcompress_parquet_raw(src, out, "zstd")
    # now every standard reader can open it
    assert pq.read_table(out).cast(t.schema).equals(t)
