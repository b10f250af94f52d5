"""Conformance on the reference's OWN test inputs.

parquet-java ships real parquet files under its test resources — written by
parquet-mr 1.9.0/1.13.0 (the `example` object model,
`ParquetFileWriter` append tests) and parquet-cpp (empty row groups).
Reading them bit-identically to pyarrow is the literal "matches the
reference's results on its own test inputs" gate: old writers, zero-row
row groups, multi-row-group appends, binary-without-UTF8 annotation, and
deep nesting with REQUIRED struct elements inside lists
(parquet-hadoop/src/test/resources/*.parquet).
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from rayenc import parquet_compat

REF_DIR = "/root/reference"

FILES = sorted(glob.glob(os.path.join(REF_DIR, "**", "*.parquet"), recursive=True))


@pytest.mark.skipif(not FILES, reason="reference test resources not present")
@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(p) for p in FILES])
def test_reference_file_reads_bit_identical(path):
    got = parquet_compat.read_table_conformance(path)
    want = pq.read_table(path)
    assert got.num_rows == want.num_rows
    if not got.schema.equals(want.schema):
        got = got.cast(want.schema)
    assert got.equals(want), f"{os.path.basename(path)} differs from pyarrow"


@pytest.mark.skipif(not FILES, reason="reference test resources not present")
def test_reference_nested_required_struct_nullability():
    # the parquet-mr 1.9.0 file carries list<struct<number int64 NOT NULL,
    # kind string>>: the assembled element type must keep the REQUIRED flag
    p = os.path.join(
        REF_DIR,
        "parquet-hadoop/src/test/resources/"
        "test-file-with-no-column-indexes-1.parquet",
    )
    if not os.path.exists(p):
        pytest.skip("file absent")
    got = parquet_compat.read_table_conformance(p)
    want = pq.read_table(p)
    assert got.schema.equals(want.schema)
    assert got.column("phoneNumbers").to_pylist() == want.column(
        "phoneNumbers"
    ).to_pylist()

APPEND_1 = os.path.join(
    REF_DIR, "parquet-hadoop/src/test/resources/test-append_1.parquet"
)


@pytest.mark.skipif(not os.path.exists(APPEND_1), reason="file absent")
def test_reference_filtered_read_unset_dictionary_offset():
    # parquet-mr leaves dictionary_page_offset UNSET for dictionary-encoded
    # chunks (the dict page sits at data_page_offset and the OffsetIndex
    # lists only data pages) — the page-selected decode path must peek the
    # chunk-start header instead of trusting field 11
    from rayenc.parquet_read_enc import read_table_filtered

    w = pq.read_table(APPEND_1)
    v = w.column("string")[5].as_py()
    got = read_table_filtered(APPEND_1, [("string", "==", v)])
    import pyarrow.compute as pc

    expect = w.filter(pc.equal(w.column("string"), v))
    assert got.num_rows == expect.num_rows
    assert got.sort_by("id").equals(expect.sort_by("id").select(got.column_names))

    got2 = read_table_filtered(APPEND_1, [("id", ">", 990)])
    assert got2.num_rows == w.filter(pc.greater(w.column("id"), 990)).num_rows


@pytest.mark.skipif(not FILES, reason="reference test resources not present")
def test_reference_filtered_read_nested_without_arrow_schema():
    # plaintext nested file with no ARROW:schema key-value: the filtered
    # reader derives the Arrow schema like the conformance reader instead
    # of raising (nested columns assembled whole; flat predicates pushed)
    from rayenc.parquet_read_enc import read_table_filtered

    p = os.path.join(
        REF_DIR,
        "parquet-hadoop/src/test/resources/"
        "test-file-with-no-column-indexes-1.parquet",
    )
    if not os.path.exists(p):
        pytest.skip("file absent")
    w = pq.read_table(p)
    got = read_table_filtered(p, [("id", "<=", 10)])
    assert got.num_rows == 11
    full = read_table_filtered(p, [("id", ">=", 0)])
    assert full.equals(w.select(full.column_names))
