"""Block container: page split, chunk encode/decode, blob + manifest.

One *block* (a Ray Data block / one Arrow batch) encodes to one blob plus a
manifest dict. Per column chunk the layout mirrors parquet-java's column
chunk (`ColumnChunkPageWriteStore.java:76-128`): an optional chunk-level aux
page (dictionary page — `ColumnWriterBase.finalizeColumnChunk:280-302` — or
FSST symbol table), then data pages split by the (1 MiB, 20k rows) rule of
`ColumnWriteStoreBase.sizeCheck` (`ParquetProperties.java:50,62`). Pages are
optionally compressed with a block codec (`CompressionCodecName.java:26-33`,
default UNCOMPRESSED like `ParquetWriter.java:50`).

The manifest carries lineage + stats + chosen encodings per chunk — the
engine's equivalent of the footer metadata (`ParquetFileWriter.end`), in JSON
so a resumed driver can scan it cheaply.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa

from . import selector as sel
from . import stats as stats_mod
from .codecs import (
    bytestream_split,
    delta_bp,
    delta_length,
    delta_strings,
    dictionary as dict_codec,
    fsst,
    plain,
    rle_for,
    rle_hybrid,
)
from .schema import PhysicalColumn, assemble, shred

MAGIC = b"RENC1\x00"


# ---------------------------------------------------------------- page split


def page_ranges(col: PhysicalColumn, config: sel.EncodeConfig) -> list[tuple[int, int]]:
    """Split a chunk's rows into page row-ranges by cumulative PLAIN-equivalent
    size (~1 MiB) or row count (20k), whichever trips first."""
    n = col.num_values
    if n == 0:
        return []
    if col.ptype == "BINARY":
        offsets, _ = col.values
        ranges = []
        start = 0
        while start < n:
            # data-byte budget (the 4-byte length prefixes are second order;
            # clamp by rows afterwards)
            budget = offsets[start] + config.page_size
            hi = int(np.searchsorted(offsets, budget, side="right")) - 1
            end = max(start + 1, min(hi, start + config.page_rows, n))
            ranges.append((start, end))
            start = end
        return ranges
    if col.ptype == "BOOLEAN":
        rows_per_page = config.page_rows
    else:
        itemsize = np.asarray(col.values).dtype.itemsize
        rows_per_page = min(config.page_rows, max(1, config.page_size // itemsize))
    return [(a, min(a + rows_per_page, n)) for a in range(0, n, rows_per_page)]


# ------------------------------------------------------------- page encoding


def _binary_slice(values, a, b):
    offsets, data = values
    off = offsets[a : b + 1] - offsets[a]
    return off, data[offsets[a] : offsets[b]]


def _encode_candidate(
    col: PhysicalColumn, encoding: str, ranges, config: sel.EncodeConfig
):
    """Encode the whole chunk with one encoding.

    Returns (aux_bytes|None, aux_meta|None, [page_bytes]) or None if the
    encoding is inapplicable (e.g. dictionary rejected by thresholds)."""
    ptype = col.ptype
    v = col.values
    pages: list[bytes] = []
    if encoding == "RLE_DICTIONARY":
        fac = sel.try_dictionary(col, config)
        if fac is None:
            return None
        indices, dic = fac
        kind = "dict"
        if ptype == "BINARY":
            aux = dict_codec.dict_page_binary(dic)
        elif ptype == "BOOLEAN":
            return None
        elif ptype in ("INT32", "INT64"):
            # sort the dictionary and remap ids: the sorted keys delta-encode
            # to near nothing (our container improvement over the reference's
            # PLAIN first-occurrence dict page, DictionaryValuesWriter:253-268)
            dvals = dic.to_numpy(zero_copy_only=False)
            order = np.argsort(dvals, kind="stable")
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            indices = inv[indices]
            aux = delta_bp.encode(np.ascontiguousarray(dvals[order]))
            kind = "dicti"
        else:
            aux = dict_codec.dict_page_fixed(dic, ptype)
        for a, b in ranges:
            pages.append(dict_codec.encode_ids(indices[a:b], len(dic)))
        return aux, {"kind": kind, "count": len(dic)}, pages
    if encoding == "FSST":
        offsets, data = v
        table = fsst.train(offsets, data)
        aux = table.serialize()
        for a, b in ranges:
            off, dat = _binary_slice(v, a, b)
            c_off, c_dat = fsst.compress(table, off, dat)
            lengths = np.diff(c_off).astype(np.int32)
            pages.append(delta_bp.encode(lengths) + c_dat.tobytes())
        return aux, {"kind": "fsst", "count": len(table.symbols)}, pages
    for a, b in ranges:
        if ptype == "BINARY":
            off, dat = _binary_slice(v, a, b)
            if encoding == "PLAIN":
                pages.append(plain.encode_binary(off, dat))
            elif encoding == "DELTA_LENGTH_BYTE_ARRAY":
                pages.append(delta_length.encode(off, dat))
            elif encoding == "DELTA_BYTE_ARRAY":
                pages.append(delta_strings.encode(off, dat))
            else:
                return None
        elif ptype == "BOOLEAN":
            if encoding == "PLAIN":
                pages.append(plain.encode_boolean(v[a:b]))
            elif encoding == "RLE":
                pages.append(rle_hybrid.encode(np.asarray(v[a:b], np.uint8), 1))
            else:
                return None
        else:
            vs = v[a:b]
            if encoding == "PLAIN":
                pages.append(plain.encode_fixed(vs, ptype))
            elif encoding == "DELTA_BINARY_PACKED":
                if ptype not in ("INT32", "INT64"):
                    return None
                pages.append(delta_bp.encode(vs))
            elif encoding == "RLE_FOR":
                if ptype not in ("INT32", "INT64"):
                    return None
                page = rle_for.encode(vs)
                if page is None:  # range wider than 32 bits
                    return None
                pages.append(page)
            elif encoding == "BYTE_STREAM_SPLIT":
                pages.append(bytestream_split.encode(vs))
            else:
                return None
    return None, None, pages


def _decode_pages(entry: dict, aux_buf, page_bufs: list) -> PhysicalColumn:
    ptype = entry["ptype"]
    encoding = entry["encoding"]
    name = entry["name"]
    counts = [p["num_values"] for p in entry["pages"]]
    if encoding == "RLE_DICTIONARY":
        dcount = entry["aux"]["count"]
        ids = np.concatenate(
            [dict_codec.decode_ids(b, c) for b, c in zip(page_bufs, counts)]
        ) if counts else np.empty(0, np.uint32)
        if ptype == "BINARY":
            d_off, d_dat = dict_codec.read_dict_page_binary(aux_buf, dcount)
            dic = dict_codec.binary_array(d_off, d_dat)
            arr = dic.take(pa.array(ids, pa.int64()))
            return PhysicalColumn(name, ptype, dict_codec.binary_parts(arr))
        if entry["aux"]["kind"] == "dicti":
            np_dtype = np.int32 if ptype == "INT32" else np.int64
            dvals = delta_bp.decode(aux_buf, np_dtype)
        else:
            dvals = dict_codec.read_dict_page_fixed(aux_buf, dcount, ptype)
        return PhysicalColumn(name, ptype, dvals[ids])
    if encoding == "FSST":
        table, _ = fsst.SymbolTable.deserialize(aux_buf)
        offs_list, data_list = [], []
        for buf, c in zip(page_bufs, counts):
            body = np.frombuffer(buf, np.uint8)
            end = delta_bp.decoded_byte_end(body)
            lengths = delta_bp.decode(body[:end], np.int32)
            c_off = np.zeros(c + 1, np.int64)
            np.cumsum(lengths, out=c_off[1:])
            o, d = fsst.decompress(table, c_off, body[end:])
            offs_list.append(o)
            data_list.append(d)
        return PhysicalColumn(name, ptype, _concat_binary(offs_list, data_list))
    if ptype == "BINARY":
        offs_list, data_list = [], []
        for buf, c in zip(page_bufs, counts):
            if encoding == "PLAIN":
                o, d = plain.decode_binary(buf, c)
            elif encoding == "DELTA_LENGTH_BYTE_ARRAY":
                o, d = delta_length.decode(buf, c)
            elif encoding == "DELTA_BYTE_ARRAY":
                o, d = delta_strings.decode(buf, c)
            else:
                raise ValueError(encoding)
            offs_list.append(o)
            data_list.append(d)
        return PhysicalColumn(name, ptype, _concat_binary(offs_list, data_list))
    if ptype == "BOOLEAN":
        if encoding == "PLAIN":
            parts = [plain.decode_boolean(b, c) for b, c in zip(page_bufs, counts)]
        else:
            parts = [
                rle_hybrid.decode(b, c, 1, np.uint8).astype(bool)
                for b, c in zip(page_bufs, counts)
            ]
        return PhysicalColumn(name, ptype, _concat(parts, bool))
    np_dtype = {"INT32": np.int32, "INT64": np.int64, "FLOAT": np.float32, "DOUBLE": np.float64}[
        ptype
    ]
    parts = []
    for buf, c in zip(page_bufs, counts):
        if encoding == "PLAIN":
            parts.append(plain.decode_fixed(buf, c, ptype))
        elif encoding == "DELTA_BINARY_PACKED":
            parts.append(delta_bp.decode(buf, np_dtype))
        elif encoding == "RLE_FOR":
            parts.append(rle_for.decode(buf, c, np_dtype))
        elif encoding == "BYTE_STREAM_SPLIT":
            parts.append(bytestream_split.decode(buf, c, np_dtype))
        else:
            raise ValueError(encoding)
    return PhysicalColumn(name, ptype, _concat(parts, np_dtype))


def _concat(parts, dtype):
    if not parts:
        return np.empty(0, dtype)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _concat_binary(offs_list, data_list):
    if not offs_list:
        return np.zeros(1, np.int64), np.empty(0, np.uint8)
    if len(offs_list) == 1:
        return offs_list[0], data_list[0]
    sizes = [int(o[-1]) for o in offs_list]
    starts = np.cumsum([0] + sizes[:-1])
    offsets = np.concatenate(
        [offs_list[0]] + [o[1:] + s for o, s in zip(offs_list[1:], starts[1:])]
    )
    return offsets, np.concatenate(data_list)


# ------------------------------------------------------------- chunk + block


def _compressor(config: sel.EncodeConfig):
    if not config.compression:
        return None
    return pa.Codec(config.compression, compression_level=config.compression_level)


def encode_chunk(
    col: PhysicalColumn, out: io.BytesIO, config: sel.EncodeConfig
) -> dict:
    stats = stats_mod.compute(col)
    ranges = page_ranges(col, config)
    best = None
    best_size = None
    for encoding in sel.candidates_for(col, stats, config):
        enc = _encode_candidate(col, encoding, ranges, config)
        if enc is None:
            continue
        aux, aux_meta, pages = enc
        size = (len(aux) if aux else 0) + sum(len(p) for p in pages)
        if best_size is None or size < best_size:
            best = (encoding, aux, aux_meta, pages)
            best_size = size
    assert best is not None, f"no applicable encoding for {col.name} ({col.ptype})"
    encoding, aux, aux_meta, pages = best

    codec = _compressor(config)
    entry: dict = {
        "name": col.name,
        "ptype": col.ptype,
        "encoding": encoding,
        "stats": stats.to_manifest(),
        "encoded_bytes": best_size,
        "pages": [],
        "aux": None,
        "validity": None,
    }
    if col.null_mask is not None:
        vbuf = rle_hybrid.encode(
            (~col.null_mask).astype(np.uint8), 1
        )  # def levels, max_def=1
        entry["validity"] = {
            "offset": out.tell(),
            "length": len(vbuf),
            "count": len(col.null_mask),
        }
        out.write(vbuf)
    if aux is not None:
        blob = codec.compress(aux).to_pybytes() if codec else aux
        entry["aux"] = {
            **aux_meta,
            "offset": out.tell(),
            "length": len(blob),
            "raw_length": len(aux),
        }
        out.write(blob)
    for (a, b), page in zip(ranges, pages):
        blob = codec.compress(page).to_pybytes() if codec else page
        entry["pages"].append(
            {
                "offset": out.tell(),
                "length": len(blob),
                "raw_length": len(page),
                "num_values": b - a,
            }
        )
        out.write(blob)
    return entry


def decode_chunk(blob, entry: dict, config: sel.EncodeConfig | None = None) -> PhysicalColumn:
    compression = (config.compression if config else None) or entry.get("compression")
    codec = pa.Codec(compression) if compression else None

    def read(meta):
        raw = blob[meta["offset"] : meta["offset"] + meta["length"]]
        if codec:
            raw = codec.decompress(raw, meta["raw_length"]).to_pybytes()
        return raw

    aux_buf = read(entry["aux"]) if entry["aux"] else None
    page_bufs = [read(p) for p in entry["pages"]]
    col = _decode_pages(entry, aux_buf, page_bufs)
    if entry["validity"]:
        vmeta = entry["validity"]
        vbuf = blob[vmeta["offset"] : vmeta["offset"] + vmeta["length"]]
        valid = rle_hybrid.decode(vbuf, vmeta["count"], 1, np.uint8).astype(bool)
        col.null_mask = ~valid
    return col


def encode_block(table: pa.Table, config: sel.EncodeConfig | None = None) -> tuple[bytes, dict]:
    """Encode one Arrow table (one block / row group) -> (blob, manifest)."""
    config = config or sel.EncodeConfig()
    out = io.BytesIO()
    out.write(MAGIC)
    chunks = []
    for field in table.schema:
        for col in shred(field.name, table.column(field.name)):
            entry = encode_chunk(col, out, config)
            if config.compression:
                entry["compression"] = config.compression
            chunks.append(entry)
    blob = out.getvalue()
    manifest = {
        "format": "renc1",
        "num_rows": table.num_rows,
        "schema": table.schema.serialize().to_pybytes().hex(),
        "blob_bytes": len(blob),
        "raw_bytes": sum(c["stats"]["raw_bytes"] for c in chunks),
        "chunks": chunks,
    }
    return blob, manifest


def decode_block(blob, manifest: dict) -> pa.Table:
    assert bytes(blob[: len(MAGIC)]) == MAGIC, "bad block magic"
    schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(manifest["schema"])))
    decoded: dict[str, tuple] = {}
    for entry in manifest["chunks"]:
        col = decode_chunk(blob, entry)
        decoded[entry["name"]] = (col.values, col.null_mask)
    arrays = [assemble(field, decoded) for field in schema]
    return pa.Table.from_arrays(arrays, schema=schema)
