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
