"""Nested schema shredding: structs, maps, multi-level lists, nulls at every
level — through the container (blocks) and the parquet writer.

Mirrors the coverage of the reference's record shredding/assembly tests
(`parquet-column/src/test/.../io/TestColumnIO.java`,
`column/mem/TestMemColumn.java`), expressed over Arrow arrays.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import parquet_write
from rayenc.blocks import decode_block, encode_block


def gnarly_table() -> pa.Table:
    return pa.table(
        {
            "i": pa.array([1, 2, None, 4], pa.int64()),
            "s": pa.array(
                [{"a": 1, "b": "x"}, None, {"a": None, "b": "z"}, {"a": 4, "b": None}],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
            "l": pa.array([[1, 2], None, [], [None, 5]], pa.list_(pa.int32())),
            "ll": pa.array(
                [[[1.5], [None]], [], None, [[2.5, 3.5]]],
                pa.list_(pa.list_(pa.float64())),
            ),
            "m": pa.array(
                [[("k1", "v1"), ("k2", None)], None, [], [("k3", "v3")]],
                pa.map_(pa.string(), pa.string()),
            ),
            "fsl": pa.array(
                [[1, 2, 3], None, [7, 8, 9], [0, 0, 0]], pa.list_(pa.int16(), 3)
            ),
            "sl": pa.array(
                [
                    {"xs": [1, 2], "n": None},
                    {"xs": None, "n": "q"},
                    None,
                    {"xs": [], "n": "r"},
                ],
                pa.struct([("xs", pa.list_(pa.int64())), ("n", pa.string())]),
            ),
        }
    )


def random_nested_table(n=2000, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    # list<string> with null lists and null elements
    lens = rng.integers(0, 5, n)
    null_list = rng.random(n) < 0.15
    counts = np.where(null_list, 0, lens)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    total = int(counts.sum())
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
    elems = words[rng.integers(0, len(words), total)]
    elem_null = rng.random(total) < 0.1
    tags = pa.ListArray.from_arrays(
        pa.array(starts, pa.int32()),
        pa.array(elems, pa.string(), mask=elem_null),
        mask=pa.array(null_list),
    )
    # struct<f1: float64 nullable, f2: list<int32>>
    f1 = pa.array(rng.normal(size=n), pa.float64(), mask=rng.random(n) < 0.2)
    l2 = rng.integers(0, 3, n)
    s2 = np.zeros(n + 1, np.int64)
    np.cumsum(l2, out=s2[1:])
    f2 = pa.ListArray.from_arrays(
        pa.array(s2, pa.int32()),
        pa.array(rng.integers(-100, 100, int(l2.sum())), pa.int32()),
    )
    st = pa.StructArray.from_arrays([f1, f2], ["f1", "f2"], mask=pa.array(rng.random(n) < 0.1))
    return pa.table({"id": pa.array(ids), "tags": tags, "st": st})


@pytest.mark.parametrize("table_fn", [gnarly_table, random_nested_table])
def test_container_nested_roundtrip(table_fn):
    t = table_fn()
    blob, manifest = encode_block(t)
    back = decode_block(blob, manifest)
    for c in t.column_names:
        assert t.column(c).combine_chunks().equals(back.column(c).combine_chunks()), c


def test_container_nested_projection():
    t = gnarly_table()
    blob, manifest = encode_block(t)
    back = decode_block(blob, manifest, columns=["s", "m"])
    assert back.column_names == ["s", "m"]
    assert t.column("m").combine_chunks().equals(back.column("m").combine_chunks())


@pytest.mark.parametrize("table_fn", [gnarly_table, random_nested_table])
def test_parquet_write_nested_pyarrow_reads(table_fn, tmp_path):
    t = table_fn()
    path = str(tmp_path / "nested.parquet")
    parquet_write.write_table(t, path)
    back = pq.read_table(path)
    for c in t.column_names:
        assert back.column(c).to_pylist() == t.column(c).to_pylist(), c


def test_parquet_write_nested_duckdb_reads(tmp_path):
    import duckdb

    t = random_nested_table()
    path = str(tmp_path / "nested.parquet")
    parquet_write.write_table(t, path, row_group_size=700)
    n, tag_sum = duckdb.sql(
        f"SELECT COUNT(*), SUM(len(tags)) FROM '{path}'"
    ).fetchone()
    assert n == t.num_rows
    import pyarrow.compute as pc

    want = pc.sum(pc.list_value_length(t.column("tags"))).as_py()
    assert tag_sum == want
    # struct child aggregation through duckdb
    f1_cnt = duckdb.sql(f"SELECT COUNT(st.f1) FROM '{path}'").fetchone()[0]
    assert f1_cnt == t.num_rows - pc.sum(
        pc.cast(pc.is_null(pc.struct_field(t.column("st").combine_chunks(), "f1")), pa.int64())
    ).as_py()


def test_parquet_write_nested_multi_row_group(tmp_path):
    t = gnarly_table()
    big = pa.concat_tables([t] * 300).combine_chunks()
    path = str(tmp_path / "big.parquet")
    parquet_write.write_table(big, path, row_group_size=256)
    back = pq.read_table(path)
    assert pq.ParquetFile(path).metadata.num_row_groups == 5
    for c in big.column_names:
        assert back.column(c).to_pylist() == big.column(c).to_pylist(), c
