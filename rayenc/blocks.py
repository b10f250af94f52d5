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
    alp,
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
    if col.ptype == "FIXED_LEN_BYTE_ARRAY":
        width = np.asarray(col.values).shape[1]
        rows_per_page = min(config.page_rows, max(1, config.page_size // max(1, width)))
        return [(a, min(a + rows_per_page, n)) for a in range(0, n, rows_per_page)]
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


class _Candidate:
    """Planned chunk encoding: exact (or, for FSST, estimated) total size plus
    a deferred ``emit`` that materializes aux + page bytes exactly once."""

    __slots__ = ("encoding", "size", "estimated", "aux_meta", "_emit", "aux_size")

    def __init__(self, encoding, size, emit, aux_meta=None, estimated=False,
                 aux_size=0):
        self.encoding = encoding
        self.size = size
        self.estimated = estimated
        self.aux_meta = aux_meta
        self.aux_size = aux_size
        self._emit = emit

    def emit(self):
        """-> (aux_bytes | None, [page_bytes])"""
        return self._emit()


def _plan_candidate(
    col: PhysicalColumn, encoding: str, ranges, config: sel.EncodeConfig,
    memo: dict | None = None,
) -> _Candidate | None:
    """Plan one encoding for the whole chunk without materializing payload
    bytes (except cheap aux). Returns None when inapplicable. ``memo``
    caches chunk-global work (dictionary factorize, FSST table training)
    across the sampled and full planning passes."""
    ptype = col.ptype
    v = col.values

    if encoding == "RLE_DICTIONARY":
        if memo is not None and "dict_fac" in memo:
            fac = memo["dict_fac"]
        else:
            fac = sel.try_dictionary(col, config)
            if memo is not None:
                memo["dict_fac"] = fac
        if fac is None:
            return None
        indices, dic = fac
        kind = "dict"
        if ptype == "BINARY":
            d_off, _d_dat = dict_codec.binary_parts(dic)
            aux_size = 4 * (len(d_off) - 1) + int(d_off[-1])
            aux_emit = lambda: dict_codec.dict_page_binary(dic)
        elif ptype == "BOOLEAN":
            return None
        elif ptype in ("INT32", "INT64"):
            # sorted keys delta-encode to near nothing; remap ids
            # (improvement over the reference's PLAIN first-occurrence dict
            # page, DictionaryValuesWriter.java:253-268)
            dvals = dic.to_numpy(zero_copy_only=False)
            order = np.argsort(dvals, kind="stable")
            # uint32 remap table: the gathered id array is the largest
            # allocation on this path — half the bytes, half the cold-fault
            # and bandwidth cost vs int64
            inv = np.empty(len(order), np.uint32)
            inv[order] = np.arange(len(order), dtype=np.uint32)
            indices = inv[indices]
            dict_plan = delta_bp.Plan(np.ascontiguousarray(dvals[order]))
            aux_size = dict_plan.size
            aux_emit = dict_plan.emit
            kind = "dicti"
        else:
            aux_size = len(dic) * (4 if ptype == "FLOAT" else 8)
            aux_emit = lambda: dict_codec.dict_page_fixed(dic, ptype)
        width = dict_codec.bit_width32(max(len(dic) - 1, 0))
        id_plans = [rle_hybrid.Plan(indices[a:b], width) for a, b in ranges]
        size = aux_size + sum(1 + p.size for p in id_plans)

        def emit():
            return aux_emit(), [bytes([width]) + p.emit() for p in id_plans]

        return _Candidate(encoding, size, emit, {"kind": kind, "count": len(dic)},
                          aux_size=aux_size)

    if encoding == "FSST":
        offsets, data = v
        if memo is not None and "fsst_table" in memo:
            table = memo["fsst_table"]
        else:
            table = fsst.train(offsets, data)
            if memo is not None:
                memo["fsst_table"] = table
        aux = table.serialize()
        n = len(offsets) - 1
        # estimate: compress a strided sample of rows
        if n and len(data):
            take = max(1, min(n, 512))
            stride = max(1, n // take)
            idx = np.arange(0, n, stride)[:take]
            lens = (offsets[idx + 1] - offsets[idx]).astype(np.int64)
            s_off = np.zeros(len(idx) + 1, np.int64)
            np.cumsum(lens, out=s_off[1:])
            s_dat = data[plain._ranges(offsets[idx], lens)]
            c_off, _c = fsst.compress(table, s_off, s_dat)
            ratio = (c_off[-1] / max(1, s_off[-1])) if s_off[-1] else 1.0
        else:
            ratio = 1.0
        est = len(aux) + int(len(data) * ratio * 1.03) + 2 * n + 64

        def emit():
            pages = []
            for a, b in ranges:
                off, dat = _binary_slice(v, a, b)
                c_off, c_dat = fsst.compress(table, off, dat)
                lengths = np.diff(c_off).astype(np.int32)
                pages.append(delta_bp.encode(lengths) + c_dat.tobytes())
            return aux, pages

        return _Candidate(
            encoding, est, emit, {"kind": "fsst", "count": len(table.symbols)},
            estimated=True, aux_size=len(aux),
        )

    if ptype == "BINARY":
        offsets, data = v
        if encoding == "PLAIN":
            size = 4 * (len(offsets) - 1) + int(offsets[-1] - offsets[0])
            return _Candidate(
                encoding,
                size,
                lambda: (None, [plain.encode_binary(*_binary_slice(v, a, b)) for a, b in ranges]),
            )
        if encoding == "DELTA_LENGTH_BYTE_ARRAY":
            plans = []
            for a, b in ranges:
                off, _ = _binary_slice(v, a, b)
                plans.append(delta_bp.Plan(np.diff(off).astype(np.int32)))
            size = sum(p.size for p in plans) + int(offsets[-1] - offsets[0])

            def emit():
                pages = []
                for (a, b), p in zip(ranges, plans):
                    _, dat = _binary_slice(v, a, b)
                    pages.append(p.emit() + np.ascontiguousarray(dat, np.uint8).tobytes())
                return None, pages

            return _Candidate(encoding, size, emit)
        if encoding == "DELTA_BYTE_ARRAY":
            page_plans = []
            size = 0
            for a, b in ranges:
                off, dat = _binary_slice(v, a, b)
                prefix = delta_strings.common_prefix_lengths(off, dat)
                suffix_lengths = np.diff(off) - prefix
                p1 = delta_bp.Plan(prefix.astype(np.int32))
                p2 = delta_bp.Plan(suffix_lengths.astype(np.int32))
                sbytes = int(suffix_lengths.sum())
                page_plans.append((off, dat, prefix, suffix_lengths, p1, p2))
                size += p1.size + p2.size + sbytes

            def emit():
                pages = []
                for off, dat, prefix, slens, p1, p2 in page_plans:
                    sdata = dat[plain._ranges(off[:-1] + prefix, slens)]
                    pages.append(p1.emit() + p2.emit() + sdata.tobytes())
                return None, pages

            return _Candidate(encoding, size, emit)
        return None

    if ptype == "FIXED_LEN_BYTE_ARRAY":
        varr = np.asarray(v, np.uint8)
        width = varr.shape[1]
        if encoding == "PLAIN":
            return _Candidate(
                encoding,
                col.num_values * width,
                lambda: (None, [plain.encode_fixed_len(varr[a:b]) for a, b in ranges]),
            )
        if encoding == "BYTE_STREAM_SPLIT":
            return _Candidate(
                encoding,
                col.num_values * width,
                lambda: (None, [varr[a:b].T.tobytes() for a, b in ranges]),
            )
        if encoding == "DELTA_BYTE_ARRAY":
            page_plans = []
            size = 0
            for a, b in ranges:
                off = np.arange(b - a + 1, dtype=np.int64) * width
                dat = varr[a:b].reshape(-1)
                prefix = delta_strings.common_prefix_lengths(off, dat)
                slens = np.diff(off) - prefix
                p1 = delta_bp.Plan(prefix.astype(np.int32))
                p2 = delta_bp.Plan(slens.astype(np.int32))
                page_plans.append((off, dat, prefix, slens, p1, p2))
                size += p1.size + p2.size + int(slens.sum())

            def emit():
                pages = []
                for off, dat, prefix, slens, p1, p2 in page_plans:
                    sdata = dat[plain._ranges(off[:-1] + prefix, slens)]
                    pages.append(p1.emit() + p2.emit() + sdata.tobytes())
                return None, pages

            return _Candidate(encoding, size, emit)
        return None

    if ptype == "BOOLEAN":
        if encoding == "PLAIN":
            size = sum((b - a + 7) // 8 for a, b in ranges)
            return _Candidate(
                encoding, size, lambda: (None, [plain.encode_boolean(v[a:b]) for a, b in ranges])
            )
        if encoding == "RLE":
            plans = [rle_hybrid.Plan(np.asarray(v[a:b], np.uint8), 1) for a, b in ranges]
            return _Candidate(
                encoding,
                sum(p.size for p in plans),
                lambda: (None, [p.emit() for p in plans]),
            )
        return None

    itemsize = np.asarray(v).dtype.itemsize
    if encoding == "PLAIN":
        size = col.num_values * itemsize
        return _Candidate(
            encoding, size, lambda: (None, [plain.encode_fixed(v[a:b], ptype) for a, b in ranges])
        )
    if encoding == "BYTE_STREAM_SPLIT":
        size = col.num_values * itemsize
        return _Candidate(
            encoding, size, lambda: (None, [bytestream_split.encode(v[a:b]) for a, b in ranges])
        )
    if encoding == "ALP":
        if ptype not in ("FLOAT", "DOUBLE"):
            return None
        plans = [alp.Plan(v[a:b]) for a, b in ranges]
        if not all(p.applicable for p in plans):
            return None  # exception-dominated page: non-decimal floats
        return _Candidate(
            encoding,
            sum(p.size for p in plans),
            lambda: (None, [p.emit() for p in plans]),
        )
    if encoding == "DELTA_BINARY_PACKED":
        if ptype not in ("INT32", "INT64"):
            return None
        plans = [delta_bp.Plan(v[a:b]) for a, b in ranges]
        return _Candidate(
            encoding, sum(p.size for p in plans), lambda: (None, [p.emit() for p in plans])
        )
    if encoding == "RLE_FOR":
        if ptype not in ("INT32", "INT64"):
            return None
        plans = [rle_for.Plan(v[a:b]) for a, b in ranges]
        if not all(p.applicable for p in plans):
            return None  # some page's range exceeds 32 bits
        return _Candidate(
            encoding,
            sum(p.size for p in plans),
            lambda: (None, [p.emit() for p in plans]),
        )
    return None


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
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        width = entry["flba_width"]
        parts = []
        for buf, c in zip(page_bufs, counts):
            if encoding == "PLAIN":
                parts.append(plain.decode_fixed_len(buf, c, width))
            elif encoding == "BYTE_STREAM_SPLIT":
                parts.append(
                    np.ascontiguousarray(
                        np.frombuffer(buf, np.uint8, count=c * width).reshape(width, c).T
                    )
                )
            elif encoding == "DELTA_BYTE_ARRAY":
                _, d = delta_strings.decode(buf, c)
                parts.append(d.reshape(c, width))
            else:
                raise ValueError(encoding)
        out = (
            np.concatenate(parts) if parts else np.empty((0, width), np.uint8)
        )
        return PhysicalColumn(name, ptype, np.ascontiguousarray(out, np.uint8))
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
        elif encoding == "ALP":
            parts.append(alp.decode(buf, c, np_dtype))
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


def _content_key(col: PhysicalColumn):
    """Cheap exact-content key for intra-block chunk dedup, or None."""
    import hashlib

    if col.null_mask is not None:
        return None
    if col.ptype == "BINARY":
        offsets, data = col.values
        if len(data) > 1 << 22:  # don't hash very large string chunks
            return None
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(offsets).tobytes())
        h.update(np.ascontiguousarray(data).tobytes())
        return (col.ptype, h.hexdigest())
    v = np.ascontiguousarray(np.asarray(col.values))
    if v.nbytes > 1 << 22:
        return None
    return (col.ptype, str(v.dtype), hashlib.sha256(v.tobytes()).hexdigest())


# ------------------------------------------------------------- chunk + block


def _compressor(config: sel.EncodeConfig):
    if not config.compression:
        return None
    if config.compression == "lz4_hadoop":
        raise ValueError(
            "lz4_hadoop is a parquet-interop page codec (write_table / "
            "transcode); renc containers use lz4 (raw frames) instead"
        )
    return pa.Codec(config.compression, compression_level=config.compression_level)


def encode_chunk(
    col: PhysicalColumn, out: io.BytesIO, config: sel.EncodeConfig
) -> dict:
    ovr = config.column_encodings.get(col.name) or config.column_encodings.get(
        col.name.split("#")[0]
    )
    if ovr == "DEVNULL":
        # DevNullValuesWriter parity (column/values/DevNullValuesWriter.java):
        # values are consumed and dropped — used to measure shredding /
        # pipeline overhead without encode cost. Write-only: the chunk
        # appears in the manifest with zero pages and cannot be decoded.
        return {
            "name": col.name,
            "ptype": col.ptype,
            "encoding": "DEVNULL",
            "stats": stats_mod.compute(col).to_manifest(),
            "encoded_bytes": 0,
            "pages": [],
            "aux": None,
            "validity": None,
        }
    stats = stats_mod.compute(col)
    ranges = page_ranges(col, config)
    cand_names = sel.candidates_for(col, stats, config)
    memo: dict = {}
    if (
        not config.exhaustive_selection
        and len(ranges) > 4
        and len(cand_names) > 1
    ):
        # two-phase selection: planning every candidate over every page is
        # the dominant encode cost (the selector, not the winning kernel).
        # Size candidates on a 3-page sample, extrapolate the page portion
        # (aux — dict/FSST tables — is chunk-global and not scaled), and
        # fully plan only the two best; the winner's manifest sizes stay
        # exact because it is re-planned over all pages.
        sample = [ranges[0], ranges[len(ranges) // 2], ranges[-1]]
        scale = sum(b - a for a, b in ranges) / max(
            1, sum(b - a for a, b in sample)
        )
        scored = []
        for encoding in cand_names:
            c = _plan_candidate(col, encoding, sample, config, memo)
            if c is not None:
                est = c.aux_size + (c.size - c.aux_size) * scale
                scored.append((est, encoding))
        scored.sort()
        cand_names = [e for _, e in scored[:2]]
    cands = []
    for encoding in cand_names:
        cand = _plan_candidate(col, encoding, ranges, config, memo)
        if cand is not None:
            cands.append(cand)
    if not cands:
        # both sampled finalists proved inapplicable over the full page set
        # (e.g. an ALP/RLE_FOR-breaking page outside the sample): fall back
        # to the exhaustive candidate list
        for encoding in sel.candidates_for(col, stats, config):
            if encoding in cand_names:
                continue
            cand = _plan_candidate(col, encoding, ranges, config, memo)
            if cand is not None:
                cands.append(cand)
    assert cands, f"no applicable encoding for {col.name} ({col.ptype})"
    cands.sort(key=lambda c: c.size)
    best = cands[0]
    aux, pages = best.emit()
    best_size = (len(aux) if aux else 0) + sum(len(p) for p in pages)
    if best.estimated and len(cands) > 1 and best_size > cands[1].size:
        # the estimate overshot: fall back to the next exact candidate so the
        # min-bytes guarantee holds
        best = cands[1]
        aux, pages = best.emit()
        best_size = (len(aux) if aux else 0) + sum(len(p) for p in pages)
    encoding, aux_meta = best.encoding, best.aux_meta

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
    if col.ptype == "FIXED_LEN_BYTE_ARRAY":
        entry["flba_width"] = int(np.asarray(col.values).shape[1])
    if col.name.split("#")[0] in config.bloom_columns:
        from . import bloom

        filt = bloom.build_for_column(col, fpp=config.bloom_fpp)
        if filt is not None:
            entry["bloom"] = filt.serialize()
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
    # per-page min/max: the column-index page-skipping statistics
    # (internal/column/columnindex/ColumnIndexBuilder.java analog)
    page_minmax = None
    if col.ptype in ("INT32", "INT64", "FLOAT", "DOUBLE") and ranges:
        v = np.asarray(col.values)
        if col.unsigned and v.dtype.kind == "i":
            # unsigned columns: bounds in the unsigned domain (see stats.compute)
            v = v.view(v.dtype.str.replace("i", "u"))
        page_minmax = [
            (v[a:b].min().item(), v[a:b].max().item()) for a, b in ranges
        ]
        if v.dtype.kind == "f":
            # NaN bounds are meaningless for skipping and invalid strict
            # JSON: leave such pages unbounded (parquet-mr's NaN rule)
            page_minmax = [
                (None, None) if (mn != mn or mx != mx) else (mn, mx)
                for mn, mx in page_minmax
            ]
    elif col.ptype == "BINARY" and ranges and col.null_mask is None:
        import pyarrow.compute as pc

        arrb = dict_codec.binary_array(*col.values).cast(pa.large_binary())
        page_minmax = []
        for a, b in ranges:
            mm = pc.min_max(arrb.slice(a, b - a))
            page_minmax.append(
                (
                    mm["min"].as_py()[: stats_mod.BINARY_TRUNCATE].decode("latin-1"),
                    stats_mod.truncate_max(
                        mm["max"].as_py(), stats_mod.BINARY_TRUNCATE
                    ).decode("latin-1"),
                )
            )
    for k, ((a, b), page) in enumerate(zip(ranges, pages)):
        blob = codec.compress(page).to_pybytes() if codec else page
        pentry = {
            "offset": out.tell(),
            "length": len(blob),
            "raw_length": len(page),
            "num_values": b - a,
        }
        if page_minmax is not None:
            pentry["min"], pentry["max"] = page_minmax[k]
        entry["pages"].append(pentry)
        out.write(blob)
    return entry


def page_mask_for_predicate(entry: dict, predicate) -> list[bool] | None:
    """Which pages of ONE chunk can contain rows matching the predicate
    (page-level min/max skipping; None when stats are unavailable).
    ``predicate`` is anything predicate.normalize accepts — a legacy
    conjunction list or an And/Or/Not tree; leaves on other columns are
    treated as satisfiable (sound: Or across columns prunes only through
    `_kept_row_intervals`' per-branch interval union)."""
    from . import predicate as P

    tree = P.normalize(predicate)
    pages = entry["pages"]
    if tree is None or not pages or "min" not in pages[0]:
        return None
    name = entry["name"]
    mask = []
    for p in pages:
        lo, hi = p.get("min"), p.get("max")
        if isinstance(lo, str):
            # string bounds are stored latin-1 (bytewise order, truncated
            # max incremented — ColumnIndexBuilder semantics)
            lo, hi = lo.encode("latin-1"), hi.encode("latin-1")

        def leaf_fn(leaf, lo=lo, hi=hi):
            if leaf.col != name:
                return True
            if lo is None:  # unbounded page (NaN-bearing floats): keep
                return True
            return P.leaf_vs_bounds(leaf, lo, hi)

        mask.append(P.may_match(tree, leaf_fn))
    return mask


def decode_chunk(
    blob,
    entry: dict,
    config: sel.EncodeConfig | None = None,
    page_mask: list[bool] | None = None,
) -> PhysicalColumn:
    compression = (config.compression if config else None) or entry.get("compression")
    codec = pa.Codec(compression) if compression else None

    def read(meta):
        raw = blob[meta["offset"] : meta["offset"] + meta["length"]]
        if codec:
            raw = codec.decompress(raw, meta["raw_length"]).to_pybytes()
        return raw

    aux_buf = read(entry["aux"]) if entry["aux"] else None
    if page_mask is not None:
        entry = dict(entry)
        entry["pages"] = [p for p, keep in zip(entry["pages"], page_mask) if keep]
        assert entry["validity"] is None, "page skip only for non-null chunks"
    page_bufs = [read(p) for p in entry["pages"]]
    col = _decode_pages(entry, aux_buf, page_bufs)
    if entry["validity"]:
        vmeta = entry["validity"]
        vbuf = blob[vmeta["offset"] : vmeta["offset"] + vmeta["length"]]
        valid = rle_hybrid.decode(vbuf, vmeta["count"], 1, np.uint8).astype(bool)
        col.null_mask = ~valid
    return col


def decode_chunk_dictionary(
    blob,
    entry: dict,
    config: sel.EncodeConfig | None = None,
    page_mask: list[bool] | None = None,
) -> pa.Array:
    """Decode an RLE_DICTIONARY BINARY chunk to ``pa.DictionaryArray``
    WITHOUT materializing values: only the id pages and the (NDV-sized)
    dictionary page are touched — the reference's reader-visible
    `Dictionary` (`dictionary/DictionaryValuesReader.java:49-55`) kept
    end-to-end instead of eagerly materialized."""
    assert entry["encoding"] == "RLE_DICTIONARY" and entry["ptype"] == "BINARY"
    assert entry["validity"] is None, "dictionary fast path is non-null only"
    compression = (config.compression if config else None) or entry.get("compression")
    codec = pa.Codec(compression) if compression else None

    def read(meta):
        raw = blob[meta["offset"] : meta["offset"] + meta["length"]]
        if codec:
            raw = codec.decompress(raw, meta["raw_length"]).to_pybytes()
        return raw

    pages = entry["pages"]
    if page_mask is not None:
        pages = [p for p, keep in zip(pages, page_mask) if keep]
    ids = (
        np.concatenate(
            [dict_codec.decode_ids(read(p), p["num_values"]) for p in pages]
        )
        if pages
        else np.empty(0, np.uint32)
    )
    aux = entry["aux"]
    d_off, d_dat = dict_codec.read_dict_page_binary(read(aux), aux["count"])
    dic = dict_codec.binary_array(d_off, d_dat)
    return pa.DictionaryArray.from_arrays(
        pa.array(ids.astype(np.int32), pa.int32()), dic
    )


def encode_block(table: pa.Table, config: sel.EncodeConfig | None = None) -> tuple[bytes, dict]:
    """Encode one Arrow table (one block / row group) -> (blob, manifest).

    Identical physical columns within a block (e.g. the tokenized table's
    ``n_tok`` == ``tokens#lengths`` invariant) are encoded once; duplicates
    become manifest aliases."""
    config = config or sel.EncodeConfig()
    out = io.BytesIO()
    out.write(MAGIC)
    chunks = []
    seen: dict[tuple, str] = {}
    for field in table.schema:
        for col in shred(field.name, table.column(field.name)):
            key = _content_key(col)
            if key is not None and key in seen:
                chunks.append(
                    {
                        "name": col.name,
                        "ptype": col.ptype,
                        "alias": seen[key],
                        "encoding": "ALIAS",
                        "encoded_bytes": 0,
                        "stats": stats_mod.compute(col).to_manifest(),
                        "pages": [],
                        "aux": None,
                        "validity": None,
                    }
                )
                continue
            entry = encode_chunk(col, out, config)
            if config.compression:
                entry["compression"] = config.compression
            chunks.append(entry)
            if key is not None and entry["encoding"] != "DEVNULL":
                # never alias TO a write-only chunk (it has no pages)
                seen[key] = col.name
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


def _merge_intervals(iv):
    out: list[tuple[int, int]] = []
    for a, b in iv:
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def _intersect_intervals(a, b):
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo < hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _entry_page_ranges(entry):
    counts = np.array([p["num_values"] for p in entry["pages"]], np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return [(int(s), int(e)) for s, e in zip(starts, ends)]


def _pred_intervals(pred, by_name, nrows):
    """Row intervals that may satisfy one NNF predicate node, from per-page
    min/max: And intersects, Or unions per-branch intervals (the RowRanges
    calculus of `internal/filter2/columnindex/ColumnIndexFilter.java`),
    leaves map to their column's surviving page ranges."""
    from . import predicate as P

    if isinstance(pred, P.And):
        iv = [(0, nrows)]
        for k in pred.preds:
            iv = _intersect_intervals(iv, _pred_intervals(k, by_name, nrows))
            if not iv:
                break
        return iv
    if isinstance(pred, P.Or):
        out = []
        for k in pred.preds:
            out = _merge_intervals(out + _pred_intervals(k, by_name, nrows))
        return out
    e = by_name.get(pred.col)
    if e is not None and e.get("alias"):
        e = by_name.get(e["alias"])
    if e is None or e["validity"] is not None:
        return [(0, nrows)]
    mask = page_mask_for_predicate(e, pred)
    if mask is None:
        return [(0, nrows)]
    return _merge_intervals(
        [r for r, k in zip(_entry_page_ranges(e), mask) if k]
    )


def _kept_row_intervals(manifest, by_name, page_predicate, nrows):
    """Rows that can satisfy the predicate, from per-page min/max of every
    predicate column — the offset-index row-alignment of
    `internal/column/columnindex/` generalized to And/Or/Not trees across
    any number of columns. None when nothing was pruned."""
    from . import predicate as P

    tree = P.normalize(page_predicate)
    if tree is None:
        return None
    kept = _pred_intervals(tree, by_name, nrows)
    if kept == [(0, nrows)]:
        return None
    return kept


def _take_rows(col: PhysicalColumn, idx: np.ndarray) -> PhysicalColumn:
    if col.ptype == "BINARY":
        offsets, data = col.values
        lens = offsets[idx + 1] - offsets[idx]
        new_off = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(lens, out=new_off[1:])
        from .codecs.delta_bp import _ranges

        new_data = data[_ranges(offsets[idx], lens)]
        return PhysicalColumn(col.name, col.ptype, (new_off, new_data))
    v = np.asarray(col.values)
    return PhysicalColumn(col.name, col.ptype, v[idx], unsigned=col.unsigned)


def decode_block(
    blob,
    manifest: dict,
    columns: list[str] | None = None,
    page_predicate=None,
    dictionary_strings: bool = False,
) -> pa.Table:
    """Decode a block; ``columns`` restricts decode to those top-level fields
    (their list sub-chunks included) — chunk-level projection pushdown.

    ``page_predicate`` enables page-level min/max skipping across any number
    of predicate columns: per-column page masks become global row intervals
    (pages -> row ranges, like parquet's offset index), the intervals
    intersect, and every projected column decodes only the pages overlapping
    the surviving rows, sliced back into row alignment. Applies when all
    projected chunks are flat and non-null; otherwise decoding falls back to
    full pages.

    ``dictionary_strings=True`` keeps RLE_DICTIONARY-encoded flat string
    columns *encoded*: the chunk comes back as
    ``pa.DictionaryArray(int32 ids, values)`` instead of materialized
    strings (the reference hands readers the `Dictionary` object the same
    way — `dictionary/DictionaryValuesReader.java`). For low-NDV columns
    this shrinks the decoded block by ~avg_len/4 and predicates evaluate on
    the NDV-sized dictionary (predicate.leaf_mask), not per row."""
    assert bytes(blob[: len(MAGIC)]) == MAGIC, "bad block magic"
    schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(manifest["schema"])))
    if columns is not None:
        schema = pa.schema([f for f in schema if f.name in set(columns)])
        wanted = set(columns)
    else:
        wanted = None
    by_name = {c["name"]: c for c in manifest["chunks"]}
    # DEVNULL chunks (DevNullValuesWriter parity) are write-only: silently
    # absent from full decodes, an error when explicitly selected
    devnull = {
        e["name"].split("#")[0]
        for e in manifest["chunks"]
        if e.get("encoding") == "DEVNULL"
    }
    if devnull:
        if wanted is not None and wanted & devnull:
            raise NotImplementedError(
                f"columns {sorted(wanted & devnull)} were encoded DEVNULL "
                "(write-only; DevNullValuesWriter semantics)"
            )
        schema = pa.schema([f for f in schema if f.name not in devnull])
    proj = [
        e
        for e in manifest["chunks"]
        if (wanted is None or e["name"].split("#")[0] in wanted)
        and e["name"].split("#")[0] not in devnull
    ]
    kept = None
    if page_predicate is not None and all(
        "#" not in e["name"] and e["validity"] is None for e in proj
    ):
        kept = _kept_row_intervals(
            manifest, by_name, page_predicate, manifest["num_rows"]
        )
    decoded: dict[str, object] = {}
    dict_cols: set[str] = set()

    def _dict_eligible(entry, target) -> bool:
        if not dictionary_strings or "#" in entry["name"]:
            return False
        if target["encoding"] != "RLE_DICTIONARY" or target["ptype"] != "BINARY":
            return False
        if target["validity"] is not None:
            return False
        t = schema.field(entry["name"]).type
        return (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        )

    for entry in proj:
        target = entry
        if entry.get("alias"):
            target = by_name[entry["alias"]]
            if target["name"] in decoded:
                if target["name"] in dict_cols and "#" in entry["name"]:
                    # sub-chunk alias of a dictionary-decoded column: its
                    # parent assembly needs materialized parts
                    col = decode_chunk(blob, target)
                    decoded[entry["name"]] = (col.values, col.null_mask)
                else:
                    decoded[entry["name"]] = decoded[target["name"]]
                    if target["name"] in dict_cols:
                        dict_cols.add(entry["name"])
                continue
        fast = _dict_eligible(entry, target)
        if kept is not None:
            ranges = _entry_page_ranges(target)
            sel = [
                any(a < e and s < b for a, b in kept) for s, e in ranges
            ]
            idx_parts = []
            base = 0
            for (s, e), k in zip(ranges, sel):
                if not k:
                    continue
                for a, b in kept:
                    lo, hi = max(s, a), min(e, b)
                    if lo < hi:
                        idx_parts.append(np.arange(base + lo - s, base + hi - s))
                base += e - s
            idx = (
                np.concatenate(idx_parts) if idx_parts else np.empty(0, np.int64)
            )
            if fast:
                arr = decode_chunk_dictionary(blob, target, page_mask=sel)
                arr = arr.take(pa.array(idx, pa.int64()))
            else:
                col = decode_chunk(blob, target, page_mask=sel)
                col = _take_rows(col, idx)
        elif fast:
            arr = decode_chunk_dictionary(blob, target)
        else:
            col = decode_chunk(blob, target)
        if fast:
            ft = schema.field(entry["name"]).type
            if arr.dictionary.type != ft:
                arr = pa.DictionaryArray.from_arrays(
                    arr.indices, arr.dictionary.cast(ft)
                )
            decoded[entry["name"]] = arr
            dict_cols.add(entry["name"])
        else:
            decoded[entry["name"]] = (col.values, col.null_mask)
    arrays, fields = [], []
    for field in schema:
        if field.name in dict_cols:
            arr = decoded[field.name]
            arrays.append(arr)
            fields.append(pa.field(field.name, arr.type, field.nullable))
        else:
            arrays.append(assemble(field, decoded))
            fields.append(field)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
