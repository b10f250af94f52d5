"""Variant binary encoding + shredding (parquet-variant analog): value
round trips across every JSON shape, metadata dictionary parsing, column
conversion, and shred/unshred identity."""

import json

import pyarrow as pa
import pytest

from rayenc import variant as V


CASES = [
    None, True, False, 0, -7, 300, -70000, 2**40, 1.5, -0.0, "", "hi",
    "x" * 100,  # long string (>63 bytes -> P_STRING form)
    {"a": 1, "b": [1, "two", {"c": None}], "z": {"nested": True}},
    [1, [2, [3]]], {}, [],
    {"k": 2**62}, [None, True, 1.25],
]


def test_value_roundtrip_all_shapes():
    m = V.Metadata()
    for c in CASES:
        b = V.encode_value(c, m)
        assert V.decode_value(b, m) == c, c


def test_metadata_roundtrip():
    m = V.Metadata(["alpha", "beta", "a-much-longer-key-name", "k"])
    m2 = V.Metadata.from_bytes(m.to_bytes())
    assert m2.keys == m.keys


def test_metadata_many_keys_offset_width():
    # >255 distinct keys forces 2-byte offsets
    m = V.Metadata([f"key{i:04d}" for i in range(300)])
    m2 = V.Metadata.from_bytes(m.to_bytes())
    assert m2.keys == m.keys


def test_object_fields_key_sorted():
    m = V.Metadata()
    b = V.encode_value({"z": 1, "a": 2}, m)
    assert V.decode_value(b, m) == {"z": 1, "a": 2}
    # spec: object fields stored sorted by key — both encodes identical
    m2 = V.Metadata()
    m2.add("z"), m2.add("a")
    b2 = V.encode_value({"a": 2, "z": 1}, m2)
    assert V.decode_value(b2, m2) == {"a": 2, "z": 1}


def test_column_json_variant_roundtrip():
    col = pa.array(
        ['{"k": 87, "s": "x"}', None, '{"k": 0}', '{"arr": [1,2,3], "k": -5}']
    )
    back = V.variant_to_json(V.json_to_variant(col))
    want = [
        None if s is None
        else json.dumps(json.loads(s), sort_keys=True, separators=(",", ":"))
        for s in col.to_pylist()
    ]
    assert back.to_pylist() == want


def test_shred_unshred_identity():
    col = pa.array(
        ['{"k": 87, "s": "x"}', None, '{"k": 0}', '{"s": "only"}']
    )
    t = pa.table({"id": [1, 2, 3, 4], "props": col})
    sh = V.shred_batch(t, "props", {"k": "int64", "s": "string"})
    assert sh.column("props$k").to_pylist() == [87, None, 0, None]
    assert sh.column("props$s").to_pylist() == ["x", None, None, "only"]
    un = V.unshred_batch(sh, "props", {"k": "int64", "s": "string"})
    want = [
        None if s is None
        else json.dumps(json.loads(s), sort_keys=True, separators=(",", ":"))
        for s in col.to_pylist()
    ]
    assert un.column("props").to_pylist() == want


def test_shred_dataset(ray_session):
    import ray.data

    t = pa.table(
        {"id": list(range(100)), "props": [f'{{"k": {i * 3}}}' for i in range(100)]}
    )
    ds = ray.data.from_arrow(t)
    out = V.shred_variant_dataset(ds, "props", {"k": "int64"}).to_pandas()
    assert sorted(out["props$k"]) == sorted(i * 3 for i in range(100))


# --------------------- full primitive set (decimal/temporal/binary/uuid)


def test_variant_extended_primitives_roundtrip():
    """All spec primitives beyond JSON's native set (VariantEncoding.md
    ids 8-20): decimal4/8/16, date, timestamp ±tz, float, binary, time,
    uuid — exact encode/decode round trips, nested included."""
    import datetime as dt
    import decimal
    import uuid

    from rayenc.variant import Metadata, decode_value, encode_value

    m = Metadata()
    vals = [
        decimal.Decimal("123.45"),  # decimal4
        decimal.Decimal("-9999999999999.999"),  # decimal8
        decimal.Decimal("12345678901234567890.123456789"),  # decimal16
        dt.date(2024, 2, 29),
        dt.datetime(2024, 1, 2, 3, 4, 5, 123456, tzinfo=dt.timezone.utc),
        dt.datetime(1969, 12, 31, 23, 59, 59),  # ntz, pre-epoch
        dt.time(13, 45, 30, 250000),
        b"\x00\x01raw",
        uuid.UUID("12345678-1234-5678-1234-567812345678"),
        {"k": [decimal.Decimal("0.5"), dt.date(1970, 1, 1), None]},
    ]
    for v in vals:
        assert decode_value(encode_value(v, m), m) == v


def test_variant_float_and_nanos_decode():
    """Foreign-written primitives we decode but never produce: float4 and
    nanosecond timestamps."""
    import datetime as dt
    import struct

    from rayenc.variant import (
        B_PRIMITIVE,
        Metadata,
        P_FLOAT,
        P_TIMESTAMP_NANOS,
        decode_value,
    )

    m = Metadata()
    f = bytes([(P_FLOAT << 2) | B_PRIMITIVE]) + struct.pack("<f", 1.5)
    assert decode_value(f, m) == 1.5
    nanos = 1_500_000_000  # 1.5 s
    ts = bytes([(P_TIMESTAMP_NANOS << 2) | B_PRIMITIVE]) + struct.pack("<q", nanos)
    assert decode_value(ts, m) == dt.datetime(
        1970, 1, 1, 0, 0, 1, 500000, tzinfo=dt.timezone.utc
    )


def test_variant_json_rendering_of_extended_types():
    import pyarrow as pa

    import datetime as dt
    import decimal

    from rayenc.variant import Metadata, encode_value, variant_to_json

    m = Metadata()
    v = encode_value(
        {"d": decimal.Decimal("1.50"), "t": dt.date(2024, 1, 2), "b": b"\x01"},
        m,
    )
    col = pa.StructArray.from_arrays(
        [pa.array([m.to_bytes()], pa.binary()), pa.array([v], pa.binary())],
        ["metadata", "value"],
    )
    (j,) = variant_to_json(col).to_pylist()
    assert '"d":"1.50"' in j and '"t":"2024-01-02"' in j and '"b":"AQ=="' in j


def test_variant_big_int_beyond_int64():
    # JSON integers outside int64 used to crash struct.pack; they now ride
    # decimal16 scale 0 (exact). >128-bit ints raise a clear ValueError.
    import json

    import pyarrow as pa

    from rayenc import variant

    vals = [2**63 - 1, 2**63, 2**70, -(2**100), -(2**63)]
    col = pa.array([json.dumps(v) for v in vals], pa.string())
    sv = variant.json_to_variant(col)
    back = variant.variant_to_json(sv)
    for i, v in enumerate(vals):
        got = json.loads(back[i].as_py())
        # decimal16 renders via _json_default (string, exactness kept)
        assert int(got) == v, (v, got)
    with pytest.raises(ValueError, match="38 digits"):
        variant.json_to_variant(pa.array([json.dumps(2**130)]))
    # a 39-digit int fits in 128 bits but exceeds decimal16 precision 38
    with pytest.raises(ValueError, match="38 digits"):
        variant.json_to_variant(pa.array([json.dumps(10**38)]))
    # 38 digits is the max that encodes
    assert variant.json_to_variant(pa.array([json.dumps(10**38 - 1)]))


def test_vectorized_json_matches_row_path():
    # the r5 vectorized variant_to_json must agree byte-for-byte with the
    # per-row reference decoder over every primitive family, string escape
    # class, nested shape, null placement — and over sliced structs
    import datetime as dt
    import decimal
    import uuid

    import numpy as np
    import pyarrow as pa

    from rayenc import variant as V

    rows = [
        None, True, False, 0, -128, 127, 30000, -(2**31), 2**40, -(2**62),
        3.14159, -0.0, float(np.float32(1.5)), 1e308, float("inf"), float("nan"),
        "short", 'needs "escape"', "unicode ✓ text", "x" * 100, "",
        {"k": 1, "z": "v"}, {"nested": {"a": [1, 2, None]}}, [1, "two", 3.0],
        decimal.Decimal("123.456"), decimal.Decimal(10**30),
        dt.date(2020, 2, 29),
        dt.datetime(2021, 1, 1, 12, tzinfo=dt.timezone.utc),
        dt.datetime(2021, 1, 1, 12), dt.time(23, 59, 59, 123456),
        uuid.UUID(int=2**100), b"\x00\xffbin",
    ] * 8
    meta = V.Metadata()
    vals, mask = [], []
    for i, r in enumerate(rows):
        if r is None and i % 3 == 0:  # struct-level nulls interleaved
            vals.append(None)
            mask.append(True)
        else:
            vals.append(V.encode_value(r, meta))
            mask.append(False)
    mb = meta.to_bytes()
    col = pa.StructArray.from_arrays(
        [pa.array([mb] * len(vals), pa.binary()), pa.array(vals, pa.binary())],
        ["metadata", "value"], mask=pa.array(mask),
    )
    assert V.variant_to_json(col).to_pylist() == V._variant_to_json_rows(col).to_pylist()
    sl = col.slice(5, 100)  # non-zero struct offset takes the row path
    assert V.variant_to_json(sl).to_pylist() == V._variant_to_json_rows(sl).to_pylist()
