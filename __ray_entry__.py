"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

Every ``queries()`` entry drives the full Ray Data pipeline (read_parquet ->
plan partitions -> EncodeWorker actor pool -> blob+manifest -> DecodeWorker)
and returns decoded data, so the DuckDB oracle comparison *is* the
encode->decode lossless gate per operator of SURVEY.md §2.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import pyarrow as pa

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _roundtrip(sf_dir: str, table: str, columns=None, config=None):
    """Encode one parquet table through the Ray pipeline and stream it back."""
    import ray
    from rayenc import pipeline

    out = tempfile.mkdtemp(prefix=f"rayenc-{table}-", dir="/tmp")
    path = os.path.join(sf_dir, f"{table}.parquet")
    pipeline.encode_job(
        path, out, config=config, columns=columns, target_block_bytes=8 << 20
    ).materialize()
    ds = pipeline.decode_dataset(out)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _forced(sf_dir: str, table: str, column: str, encoding: str):
    """Round trip a single column with a pinned encoding (the per-column
    ColumnProperty override surface, SURVEY.md §2.7)."""
    from rayenc.selector import EncodeConfig

    cfg = EncodeConfig(column_encodings={column: encoding, f"{column}#values": encoding})
    return _roundtrip(sf_dir, table, columns=[column], config=cfg)


def entry() -> Any:
    """Flagship: encode+decode the sf0.001 tokenized synthetic table."""
    from rayenc import data, pipeline

    path = data.cached_parquet(2000, mean_tokens=60.0)
    out = tempfile.mkdtemp(prefix="rayenc-entry-", dir="/tmp")
    pipeline.encode_job(path, out, target_block_bytes=4 << 20).materialize()
    return pipeline.decode_dataset(out)


def _stats_query(sf_dir: str, table: str, cols: list[str]):
    """Min/max/count aggregates computed from the engine's per-chunk manifest
    statistics (column/statistics/Statistics.java analog) — no re-scan."""
    import json

    from rayenc import pipeline

    out = tempfile.mkdtemp(prefix=f"rayenc-stats-{table}-", dir="/tmp")
    path = os.path.join(sf_dir, f"{table}.parquet")
    pipeline.encode_job(path, out, columns=cols, target_block_bytes=8 << 20).materialize()
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    rows = 0
    for name in sorted(os.listdir(out)):
        if not name.endswith(".manifest.json"):
            continue
        manifest = json.loads(open(os.path.join(out, name)).read())
        rows += manifest["num_rows"]
        for chunk in manifest["chunks"]:
            cname = chunk["name"]
            if cname not in cols:
                continue
            st = chunk["stats"]
            if st["min"] is None:
                continue
            mins[cname] = st["min"] if cname not in mins else min(mins[cname], st["min"])
            maxs[cname] = st["max"] if cname not in maxs else max(maxs[cname], st["max"])
    data = {"cnt": [rows]}
    for c in cols:
        data[f"min_{c}"] = [mins[c]]
        data[f"max_{c}"] = [maxs[c]]
    return pa.table(data)


def _dict_group_counts(sf_dir: str):
    """Per-source counts via the dictionary encoder inside map_batches with a
    partial-aggregate combine (pre-aggregation before the small shuffle)."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        from rayenc.codecs.dictionary import factorize
        import numpy as np

        idx, dic = factorize(batch.column("source"))
        counts = np.bincount(idx, minlength=len(dic))
        return pa.table({"source": dic.cast(pa.string()), "cnt": counts})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum("cnt")
    )
    # ray groupby sum names the column "sum(cnt)" — normalize to cnt
    return agg.map_batches(
        lambda b: b.rename_columns(["source", "cnt"]), batch_format="pyarrow"
    )


def _tokens_roundtrip(sf_dir: str):
    """Rows-only gate: synthetic tokenized table (FIXTURES.md F1) through the
    full pipeline; per-row token-array equality counted distributedly."""
    from rayenc import data, pipeline

    path = data.cached_parquet(5000, mean_tokens=80.0)
    out = tempfile.mkdtemp(prefix="rayenc-tok-", dir="/tmp")
    pipeline.encode_job(path, out, target_block_bytes=16 << 20).materialize()
    import pyarrow.parquet as pq
    import ray

    got = pipeline.decode_dataset(out)

    def check(batch: pa.Table) -> pa.Table:
        import numpy as np

        n_tok = batch.column("n_tok").to_numpy()
        lens = pa.compute.list_value_length(batch.column("tokens")).to_numpy()
        return pa.table(
            {
                "rows": [batch.num_rows],
                "len_mismatch": [int((n_tok != lens).sum())],
            }
        )

    per_block = got.map_batches(check, batch_format="pyarrow").to_pandas()
    want = pq.read_table(path)
    full = pa.concat_tables(
        [ray.get(r) for r in pipeline.decode_dataset(out).to_arrow_refs()]
    )
    return pa.table(
        {
            "rows": [int(per_block["rows"].sum())],
            "len_mismatch": [int(per_block["len_mismatch"].sum())],
            "bit_identical": [bool(full.sort_by("doc_id").equals(want.sort_by("doc_id")))],
        }
    )


def _selector_report(sf_dir: str):
    """Deterministic (table, column, chosen encoding) report — the codec
    auto-selector surface (SURVEY.md §2.3)."""
    import json

    from rayenc import pipeline

    rows = []
    for table in ("lineitem", "documents", "events", "embeddings"):
        out = tempfile.mkdtemp(prefix=f"rayenc-sel-{table}-", dir="/tmp")
        pipeline.encode_job(
            os.path.join(sf_dir, f"{table}.parquet"), out, target_block_bytes=64 << 20
        ).materialize()
        name = sorted(f for f in os.listdir(out) if f.endswith(".manifest.json"))[0]
        manifest = json.loads(open(os.path.join(out, name)).read())
        for chunk in manifest["chunks"]:
            rows.append((table, chunk["name"], chunk["encoding"]))
    rows.sort()
    return pa.table(
        {
            "tbl": [r[0] for r in rows],
            "col": [r[1] for r in rows],
            "encoding": [r[2] for r in rows],
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}
    for t in TABLES:
        q[f"roundtrip_{t}"] = lambda sf, t=t: _roundtrip(sf, t)
    # forced single-encoding round trips (one per SURVEY §2.1 encoder family)
    q["enc_delta_binary_packed"] = lambda sf: _forced(sf, "lineitem", "l_orderkey", "DELTA_BINARY_PACKED")
    q["enc_plain"] = lambda sf: _forced(sf, "lineitem", "l_extendedprice", "PLAIN")
    q["enc_rle_dictionary"] = lambda sf: _forced(sf, "lineitem", "l_returnflag", "RLE_DICTIONARY")
    q["enc_delta_length_byte_array"] = lambda sf: _forced(sf, "documents", "text", "DELTA_LENGTH_BYTE_ARRAY")
    q["enc_delta_byte_array"] = lambda sf: _forced(sf, "events", "props", "DELTA_BYTE_ARRAY")
    q["enc_fsst"] = lambda sf: _forced(sf, "documents", "text", "FSST")
    q["enc_byte_stream_split"] = lambda sf: _forced(sf, "embeddings", "embedding", "BYTE_STREAM_SPLIT")
    q["stats_lineitem"] = lambda sf: _stats_query(sf, "lineitem", ["l_orderkey", "l_quantity", "l_extendedprice"])
    q["stats_documents"] = lambda sf: _stats_query(sf, "documents", ["n_chars"])
    q["dict_source_counts"] = _dict_group_counts
    # rows-only (non-SQL-expressible) gates
    q["tokens_roundtrip"] = _tokens_roundtrip
    q["selector_report"] = _selector_report
    return q


def oracle_sql() -> dict[str, str]:
    o = {f"roundtrip_{t}": f"SELECT * FROM {t}" for t in TABLES}
    o["enc_delta_binary_packed"] = "SELECT l_orderkey FROM lineitem"
    o["enc_plain"] = "SELECT l_extendedprice FROM lineitem"
    o["enc_rle_dictionary"] = "SELECT l_returnflag FROM lineitem"
    o["enc_delta_length_byte_array"] = "SELECT text FROM documents"
    o["enc_delta_byte_array"] = "SELECT props FROM events"
    o["enc_fsst"] = "SELECT text FROM documents"
    o["enc_byte_stream_split"] = "SELECT embedding FROM embeddings"
    o["stats_lineitem"] = (
        "SELECT COUNT(*) AS cnt,"
        " MIN(l_orderkey) AS min_l_orderkey, MAX(l_orderkey) AS max_l_orderkey,"
        " MIN(l_quantity) AS min_l_quantity, MAX(l_quantity) AS max_l_quantity,"
        " MIN(l_extendedprice) AS min_l_extendedprice,"
        " MAX(l_extendedprice) AS max_l_extendedprice FROM lineitem"
    )
    o["stats_documents"] = (
        "SELECT COUNT(*) AS cnt, MIN(n_chars) AS min_n_chars,"
        " MAX(n_chars) AS max_n_chars FROM documents"
    )
    o["dict_source_counts"] = (
        "SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source"
    )
    return o
