"""Dotted-path predicate pushdown on struct leaves
(`filter2/predicate/FilterApi` column paths like ``a.b.c``; non-repeated
paths only, like ColumnIndexFilter's row-ranges math)."""

import tempfile

import numpy as np
import pyarrow as pa
import pytest

from rayenc import parquet_write
from rayenc.parquet_read_enc import read_table_filtered


@pytest.fixture(scope="module")
def struct_file():
    n = 20000
    t = pa.table(
        {
            "id": pa.array(np.arange(n)),
            "meta": pa.array(
                [
                    {"user": f"u{i % 97}", "score": int(i % 1000)}
                    if i % 11
                    else None
                    for i in range(n)
                ],
                pa.struct([("user", pa.string()), ("score", pa.int64())]),
            ),
        }
    )
    out = tempfile.mktemp(suffix=".parquet", dir="/tmp")
    parquet_write.write_table(t, out, row_group_size=4000)
    return out, n


def test_dotted_equality(struct_file):
    out, n = struct_file
    got = read_table_filtered(out, [("meta.score", "==", 500)])
    assert got.num_rows == sum(1 for i in range(n) if i % 11 and i % 1000 == 500)
    assert got.schema.names == ["id", "meta"]  # helper column dropped
    # every surviving row really matches
    assert all(
        s == 500 for s in got.column("meta").combine_chunks().field("score").to_pylist()
    )


def test_dotted_range_with_projection(struct_file):
    out, n = struct_file
    got = read_table_filtered(out, [("meta.score", ">", 990)], columns=["id"])
    assert got.schema.names == ["id"]
    want = [i for i in range(n) if i % 11 and i % 1000 > 990]
    assert sorted(got.column("id").to_pylist()) == want


def test_dotted_string_leaf(struct_file):
    out, n = struct_file
    got = read_table_filtered(out, [("meta.user", "==", "u5")], columns=["id"])
    want = [i for i in range(n) if i % 11 and i % 97 == 5]
    assert sorted(got.column("id").to_pylist()) == want


def test_dotted_is_null_counts_struct_nulls(struct_file):
    out, n = struct_file
    got = read_table_filtered(out, [("meta.user", "is_null", None)], columns=["id"])
    assert got.num_rows == sum(1 for i in range(n) if i % 11 == 0)


def test_dotted_and_flat_conjunction(struct_file):
    out, n = struct_file
    got = read_table_filtered(
        out, [("meta.score", "==", 7), ("id", "<", 5000)], columns=["id"]
    )
    want = [i for i in range(5000) if i % 11 and i % 1000 == 7]
    assert sorted(got.column("id").to_pylist()) == want


def test_repeated_path_rejected():
    t = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64()))})
    out = tempfile.mktemp(suffix=".parquet", dir="/tmp")
    parquet_write.write_table(t, out)
    with pytest.raises(ValueError, match="repeated path"):
        read_table_filtered(out, [("l.list.element", "==", 1)])


def test_top_level_struct_column_rejected(struct_file):
    out, _ = struct_file
    # "meta" is a group node, not a leaf — rejected at the leaf lookup
    with pytest.raises(ValueError, match="predicate column"):
        read_table_filtered(out, [("meta", "==", 1)])
