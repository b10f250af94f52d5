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
