"""TIME logical type + declared annotations (UUID/JSON/BSON/ENUM/INTERVAL)
— the LogicalTypeAnnotation.java members beyond the arrow-native set
(`LogicalTypeAnnotation.java` timeType/uuidType/jsonType/bsonType/enumType/
intervalType)."""

import os
import tempfile
import uuid

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import parquet_write
from rayenc.parquet_compat import read_table_conformance
from rayenc.selector import EncodeConfig


def _tmp():
    return tempfile.mktemp(suffix=".parquet", dir="/tmp")


class TestTimeTypes:
    def test_time_roundtrip_all_units(self):
        t = pa.table(
            {
                "t32": pa.array([1000, 2000, None], pa.time32("ms")),
                "t64": pa.array([123456789, 5, None], pa.time64("us")),
                "tns": pa.array([123456789123, 5, None], pa.time64("ns")),
            }
        )
        out = _tmp()
        parquet_write.write_table(t, out)
        got = read_table_conformance(out)
        assert got.equals(t)
        # pyarrow restores the same arrow types from our annotations
        assert pq.read_table(out).schema.equals(t.schema)

    def test_time_footer_annotations(self):
        t = pa.table(
            {
                "t32": pa.array([1], pa.time32("ms")),
                "t64": pa.array([1], pa.time64("us")),
                "tns": pa.array([1], pa.time64("ns")),
            }
        )
        out = _tmp()
        parquet_write.write_table(t, out)
        s = pq.ParquetFile(out).schema
        # TimeType(isAdjustedToUTC=false) has no ConvertedType equivalent
        # (spec: TIME_MILLIS/TIME_MICROS imply UTC-adjusted), so the logical
        # annotation carries the type alone
        for i, unit in enumerate(("milliseconds", "microseconds", "nanoseconds")):
            assert s.column(i).converted_type == "NONE"
            lt = str(s.column(i).logical_type)
            assert "isAdjustedToUTC=false" in lt and unit in lt

    def test_time32_seconds_normalized_to_millis(self):
        t = pa.table({"t": pa.array([1, 2, None], pa.time32("s"))})
        out = _tmp()
        parquet_write.write_table(t, out)
        got = pq.read_table(out).column("t")
        assert got.type == pa.time32("ms")
        assert got.cast(pa.time32("s")).to_pylist() == t.column("t").to_pylist()

    def test_time32_seconds_nested_normalized(self):
        # ADVICE r4: a time32[s] leaf nested in a struct/list used to reach
        # _logical_type and crash with KeyError: 's' — coercion is recursive
        t = pa.table(
            {
                "s": pa.array(
                    [{"t": 1, "x": 7}, {"t": None, "x": 8}],
                    pa.struct([("t", pa.time32("s")), ("x", pa.int32())]),
                ),
                "l": pa.array([[1, 2], [3]], pa.list_(pa.time32("s"))),
            }
        )
        out = _tmp()
        parquet_write.write_table(t, out)
        got = pq.read_table(out)
        assert got.column("s").type.field("t").type == pa.time32("ms")
        assert got.column("l").type.value_type == pa.time32("ms")
        assert (
            got.column("s").combine_chunks().field("t").to_pylist()
            == t.column("s").combine_chunks().field("t").to_pylist()
        )
        assert (
            got.column("l").combine_chunks().flatten().to_pylist()
            == t.column("l").combine_chunks().flatten().to_pylist()
        )

    def test_duckdb_reads_our_time(self):
        t = pa.table({"t64": pa.array([3723000000], pa.time64("us"))})
        out = _tmp()
        parquet_write.write_table(t, out)
        v = duckdb.sql(
            f"SELECT CAST(t64 AS VARCHAR) v FROM read_parquet('{out}')"
        ).df()["v"][0]
        assert v == "01:02:03"

    def test_we_read_pyarrow_time(self):
        t = pa.table(
            {
                "t64": pa.array([1, 2, 3], pa.time64("us")),
                "t32": pa.array([1, 2, 3], pa.time32("ms")),
            }
        )
        out = _tmp()
        pq.write_table(t, out, version="2.6")
        assert read_table_conformance(out).equals(t)


class TestDeclaredAnnotations:
    def test_all_annotations_in_footer(self):
        t = pa.table(
            {
                "id": pa.array([uuid.uuid4().bytes for _ in range(3)], pa.binary(16)),
                "doc": pa.array(['{"a":1}', None, "{}"]),
                "kind": pa.array(["A", "B", None]),
                "blob": pa.array([b"\x01", None, b"\x02"], pa.binary()),
                "span": pa.array([os.urandom(12) for _ in range(3)], pa.binary(12)),
            }
        )
        cfg = EncodeConfig(
            logical_annotations={
                "id": "UUID",
                "doc": "JSON",
                "kind": "ENUM",
                "blob": "BSON",
                "span": "INTERVAL",
            }
        )
        out = _tmp()
        parquet_write.write_table(t, out, config=cfg)
        s = pq.ParquetFile(out).schema
        by_name = {s.column(i).name: s.column(i) for i in range(len(s))}
        assert str(by_name["id"].logical_type) == "UUID"
        assert by_name["id"].converted_type == "NONE"
        assert by_name["doc"].converted_type == "JSON"
        assert by_name["kind"].converted_type == "ENUM"
        assert by_name["blob"].converted_type == "BSON"
        assert by_name["span"].converted_type == "INTERVAL"
        # values survive byte-exact through pyarrow
        got = pq.read_table(out)
        assert got.column("id").to_pylist() == t.column("id").to_pylist()
        assert got.column("span").to_pylist() == t.column("span").to_pylist()
        # and through our own conformance reader
        ours = read_table_conformance(out)
        assert ours.column("id").to_pylist() == t.column("id").to_pylist()

    def test_uuid_requires_flba16(self):
        t = pa.table({"id": pa.array([b"short"], pa.binary())})
        with pytest.raises(ValueError, match="UUID"):
            parquet_write.write_table(
                t, _tmp(), config=EncodeConfig(logical_annotations={"id": "UUID"})
            )

    def test_interval_requires_flba12(self):
        t = pa.table({"s": pa.array([os.urandom(16)], pa.binary(16))})
        with pytest.raises(ValueError, match="INTERVAL"):
            parquet_write.write_table(
                t, _tmp(), config=EncodeConfig(logical_annotations={"s": "INTERVAL"})
            )

    def test_unknown_annotation_rejected(self):
        t = pa.table({"x": pa.array(["a"])})
        with pytest.raises(ValueError, match="unknown logical annotation"):
            parquet_write.write_table(
                t, _tmp(), config=EncodeConfig(logical_annotations={"x": "WAT"})
            )


class TestDecimalAsInteger:
    def _table(self):
        from decimal import Decimal

        return pa.table(
            {
                "d9": pa.array(
                    [Decimal("1.23"), Decimal("-99999.99"), None],
                    pa.decimal128(9, 2),
                ),
                "d18": pa.array(
                    [Decimal("123456789.123456"), Decimal("-1.000001"), None],
                    pa.decimal128(18, 6),
                ),
                "d38": pa.array(
                    [Decimal("1.5"), None, Decimal("-2.5")],
                    pa.decimal128(38, 10),
                ),
            }
        )

    def test_physical_types_and_roundtrip(self):
        t = self._table()
        out = _tmp()
        parquet_write.write_table(
            t, out, config=EncodeConfig(decimal_as_integer=True)
        )
        s = pq.ParquetFile(out).schema
        phys = {s.column(i).name: s.column(i).physical_type for i in range(len(s))}
        # p<=9 -> INT32, p<=18 -> INT64, beyond stays FLBA
        assert phys == {
            "d9": "INT32",
            "d18": "INT64",
            "d38": "FIXED_LEN_BYTE_ARRAY",
        }
        assert pq.read_table(out).equals(t)
        assert read_table_conformance(out).equals(t)

    def test_duckdb_reads_integer_decimals(self):
        t = self._table()
        out = _tmp()
        parquet_write.write_table(
            t, out, config=EncodeConfig(decimal_as_integer=True)
        )
        v = duckdb.sql(
            f"SELECT CAST(d18 AS VARCHAR) v FROM read_parquet('{out}')"
        ).df()["v"]
        assert v[0] == "123456789.123456"

    def test_off_by_default_stays_flba(self):
        t = self._table()
        out = _tmp()
        parquet_write.write_table(t, out)
        s = pq.ParquetFile(out).schema
        assert s.column(0).physical_type == "FIXED_LEN_BYTE_ARRAY"
        assert pq.read_table(out).equals(t)

    def test_smaller_than_flba(self):
        from decimal import Decimal

        vals = [Decimal(i) / 100 for i in range(20000)]
        t = pa.table({"d": pa.array(vals, pa.decimal128(12, 2))})
        out_flba, out_int = _tmp(), _tmp()
        parquet_write.write_table(t, out_flba)
        parquet_write.write_table(
            t, out_int, config=EncodeConfig(decimal_as_integer=True)
        )
        assert os.path.getsize(out_int) < os.path.getsize(out_flba) * 0.55
        assert pq.read_table(out_int).equals(t)
