"""FSST fixtures from FIXTURES.md F2: id-like strings, URLs, random bytes
(escape-path correctness, must-not-inflate-beyond-escape-bound), plus a
python-scalar greedy oracle proving the vectorized parse is exact."""

import numpy as np
import pyarrow as pa
import pytest

from rayenc.codecs import fsst
from rayenc.codecs.dictionary import binary_array, binary_parts


def parts(strings):
    return binary_parts(pa.array(strings, pa.string()))


def roundtrip(strings):
    offsets, data = parts(strings)
    buf = fsst.encode_column(offsets, data)
    o, d = fsst.decode_column(buf, len(strings))
    assert binary_array(o, d).cast(pa.string()).to_pylist() == strings
    return buf, offsets, data


def scalar_compress(table: fsst.SymbolTable, s: bytes) -> bytes:
    """Greedy longest-match reference implementation."""
    by_len = {}
    for code, sym in enumerate(table.symbols):
        by_len.setdefault(len(sym), {})[sym] = code
    lens = sorted(by_len, reverse=True)
    out = bytearray()
    p = 0
    while p < len(s):
        for ln in lens:
            if p + ln <= len(s) and s[p : p + ln] in by_len[ln]:
                out.append(by_len[ln][s[p : p + ln]])
                p += ln
                break
        else:
            out += bytes([fsst.ESCAPE, s[p]])
            p += 1
    return bytes(out)


def test_idlike_strings_compress_and_roundtrip():
    strings = [f"web/shard-{i // 100:05d}/doc-{i:012d}" for i in range(2000)]
    buf, offsets, data = roundtrip(strings)
    assert len(buf) < len(data)  # must actually compress id-like text


def test_urls():
    strings = [
        f"https://example.org/path/to/resource/{i}?session={i * 7:x}&lang=en"
        for i in range(500)
    ]
    buf, offsets, data = roundtrip(strings)
    assert len(buf) < len(data)


def test_random_bytes_escape_path_no_blowup():
    rng = np.random.default_rng(0)
    strings = [
        bytes(rng.integers(0, 256, int(rng.integers(1, 40))).tolist()).decode(
            "latin-1"
        )
        for _ in range(300)
    ]
    offsets, data = parts(strings)
    buf = fsst.encode_column(offsets, data)
    o, d = fsst.decode_column(buf, len(strings))
    got = binary_array(o, d).cast(pa.string()).to_pylist()
    assert got == strings
    # worst case is 2x (all escapes) + table + lengths
    assert len(buf) <= 2 * len(data) + 600 + len(strings) * 2


def test_embedded_escape_bytes():
    # strings containing 0xff bytes exercise the marker/literal parity logic
    strings = ["\xff", "\xff\xff", "a\xffb", "\xff" * 7, "x" * 5 + "\xff"] * 20
    roundtrip(strings)


def test_empty_and_edge_strings():
    roundtrip(["", "a", "", "ab" * 50, ""])


def test_vectorized_parse_matches_scalar_greedy():
    strings = [f"src-{i % 7}/item{i:06d}/end" for i in range(400)] + [
        "",
        "\xff\xff",
        "zzz",
    ]
    offsets, data = parts(strings)
    table = fsst.train(offsets, data)
    assert 0 < len(table.symbols) <= 255
    c_off, c_data = fsst.compress(table, offsets, data)
    raw = data.tobytes()
    pos = 0
    for i in range(len(strings)):
        s = raw[offsets[i] : offsets[i + 1]]
        expect = scalar_compress(table, s)
        got = c_data[c_off[i] : c_off[i + 1]].tobytes()
        assert got == expect, f"string {i}: {s!r}"


def test_table_serialization():
    strings = [f"prefix-common-{i}" for i in range(100)]
    offsets, data = parts(strings)
    table = fsst.train(offsets, data)
    blob = table.serialize()
    table2, consumed = fsst.SymbolTable.deserialize(blob)
    assert consumed == len(blob)
    assert table2.symbols == table.symbols


def test_low_ndv_column():
    strings = (["common_crawl", "wikipedia", "github"] * 500)[:1400]
    buf, offsets, data = roundtrip(strings)
    assert len(buf) < len(data) // 2
