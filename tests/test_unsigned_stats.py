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


def test_bit_packed_write_warns():
    import warnings

    import pyarrow.parquet as pq

    from rayenc import parquet_write
    from rayenc.selector import EncodeConfig

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    import tempfile

    path = tempfile.mktemp(suffix=".parquet")
    cfg = EncodeConfig()
    cfg.level_encoding = "BIT_PACKED"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        parquet_write.write_table(t, path, cfg)
    assert any("BIT_PACKED" in str(x.message) for x in w)


def test_grouped_encode_tolerates_null_keys(tmp_path):
    import ray.data

    from rayenc import pipeline

    src = str(tmp_path / "s.parquet")
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(100)]),
            "tokens": pa.array([[i, i + 1] for i in range(100)], pa.list_(pa.int32())),
            "n_tok": pa.array([2] * 100, pa.int32()),
            "source": pa.array(
                [None if i % 7 == 0 else f"s{i % 3}" for i in range(100)]
            ),
        }
    )
    pq.write_table(t, src)
    out = str(tmp_path / "enc")
    # a null key value must fall back to a bucket, not KeyError the job
    pipeline.encode_grouped_job(
        [src], out, key="source", salt_col=None, max_block_rows=1000
    ).materialize()
    got = pipeline.decode_dataset(out).to_pandas()
    assert len(got) == 100
    # nulls survive the grouped encode untouched (sentinel is shuffle-only)
    assert got["source"].isna().sum() == sum(1 for i in range(100) if i % 7 == 0)


def test_nan_float_stats_omitted_and_pruning_sound(tmp_path):
    # NaN-poisoned float pages write NO min/max (the spec-safe choice:
    # poisoned bounds must never prune) and filtered reads stay exact
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayenc import parquet_write
    from rayenc.parquet_read_enc import read_table_filtered

    p = str(tmp_path / "nan.parquet")
    v = np.array([1.5, float("nan"), -3.0, 2.0, float("nan")] * 200)
    t = pa.table({"f": pa.array(v), "k": pa.array(range(1000))})
    parquet_write.write_table(t, p, row_group_size=250)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert st is None or not st.has_min_max
    got = read_table_filtered(p, [("f", ">", 1.9)])
    assert got.num_rows == 200
