"""Unsigned-integer statistics regression (round-3 ADVICE): min/max for UINT
columns must be computed in the unsigned domain, not on the sign-wrapped
storage, in (a) the container manifest + page index and (b) written parquet
footer Statistics / ColumnIndex — otherwise readers prune row groups and
pages that contain matching rows."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from rayenc import blocks, parquet_write, stats
from rayenc.schema import shred


def _uint_table():
    return pa.table(
        {
            "u32": pa.array([1, 5, 4294967295, 2, 3], pa.uint32()),
            "u64": pa.array([7, 2**64 - 1, 9, 1, 4], pa.uint64()),
        }
    )


def test_chunk_stats_unsigned_domain():
    col = shred("u32", _uint_table().column("u32").combine_chunks())[0]
    assert col.unsigned
    st = stats.compute(col)
    assert st.min_value == 1
    assert st.max_value == 4294967295


def test_manifest_and_page_bounds_unsigned():
    table = _uint_table()
    blob, manifest = blocks.encode_block(table)
    by_name = {c["name"]: c for c in manifest["chunks"]}
    st = by_name["u32"]["stats"]
    assert st["min"] == 1 and st["max"] == 4294967295
    st64 = by_name["u64"]["stats"]
    assert st64["min"] == 1 and st64["max"] == 2**64 - 1
    pages = by_name["u32"]["pages"]
    if pages and "min" in pages[0]:
        assert max(p["max"] for p in pages) == 4294967295
    # decode with the equality predicate that the wrapped bounds would skip
    mask = blocks.page_mask_for_predicate(by_name["u32"], [("u32", "==", 4294967295)])
    assert mask is None or any(mask)
    out = blocks.decode_block(blob, manifest)
    assert out.equals(table)


def test_decode_dataset_predicate_not_skipped(tmp_path):
    import ray.data

    from rayenc import pipeline

    src = str(tmp_path / "src.parquet")
    pq.write_table(_uint_table(), src)
    out_dir = str(tmp_path / "enc")
    pipeline.encode_job([src], out_dir).materialize()
    ds = pipeline.decode_dataset(out_dir, predicate=[("u32", "==", 4294967295)])
    got = ds.to_pandas()
    assert len(got) == 1
    assert int(got["u32"].iloc[0]) == 4294967295


def test_parquet_footer_stats_unsigned(tmp_path):
    table = _uint_table()
    path = str(tmp_path / "u.parquet")
    parquet_write.write_table(table, path)
    md = pq.ParquetFile(path).metadata
    cs = {
        md.row_group(0).column(i).path_in_schema: md.row_group(0).column(i).statistics
        for i in range(md.num_columns)
    }
    assert cs["u32"].min == 1 and cs["u32"].max == 4294967295
    assert cs["u64"].min == 1 and cs["u64"].max == 2**64 - 1
    # pyarrow dataset row-group pruning must keep the matching row
    dset = pads.dataset(path, format="parquet")
    got = dset.to_table(filter=pc.field("u32") == 4294967295)
    assert got.num_rows == 1
