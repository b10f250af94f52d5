"""Write real parquet files using rayenc encoders only.

The inverse of rayenc.parquet_compat: values are encoded by our kernels
(selector-chosen among the parquet-legal encodings), pages are laid out in
the V1 format (`ColumnWriterV1.java:61-81`: framed RLE rep/def levels +
values), headers and the footer are serialized with a minimal thrift
*compact protocol* writer (PageHeader / FileMetaData from parquet.thrift),
and the file carries the `PAR1` magic framing
(`ParquetFileWriter.java:110-113,596,1874`). Output is readable by pyarrow
and DuckDB — independent-reader proof that our encoded bytes are
format-true.

Supported: flat INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY/BOOLEAN/
FIXED_LEN_BYTE_ARRAY(+DECIMAL) columns (required or optional) and non-null
list<primitive> (the tokenized-table shape); one row group per call site
decision.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from . import parquet_crypto as pcrypt
from . import selector as sel
from . import stats as stats_mod
from .blocks import _plan_candidate, page_ranges
from .codecs import rle_hybrid
from .codecs.dictionary import dict_page_binary, dict_page_fixed, encode_ids
from .schema import PhysicalColumn, shred

MAGIC = b"PAR1"


class _ChunkCrypto:
    """Per-column-chunk encryption state: the module AADs share the row-group
    and column ordinals; the page ordinal counts data pages only
    (ColumnChunkPageWriteStore.java pageOrdinal semantics, starting at -1)."""

    def __init__(self, key: bytes, file_aad: bytes, rg: int, col: int,
                 ctr_pages: bool = False):
        self.key = key
        self.file_aad = file_aad
        self.rg = rg
        self.col = col
        self.page_ord = -1
        # AES_GCM_CTR_V1: page BODIES use CTR (no tag); headers stay GCM
        self.ctr_pages = ctr_pages

    def next_page(self) -> None:
        self.page_ord += 1

    def _aad(self, mtype: int, paged: bool) -> bytes:
        return pcrypt.module_aad(
            self.file_aad, mtype, self.rg, self.col,
            self.page_ord if paged else -1,
        )

    def header(self, hdr: bytes, dict_page: bool = False) -> bytes:
        mt = pcrypt.M_DICT_PAGE_HEADER if dict_page else pcrypt.M_DATA_PAGE_HEADER
        return pcrypt.encrypt_module(self.key, hdr, self._aad(mt, not dict_page))

    def page(self, body: bytes, dict_page: bool = False) -> bytes:
        if self.ctr_pages:
            return pcrypt.encrypt_module_ctr(self.key, body)
        mt = pcrypt.M_DICT_PAGE if dict_page else pcrypt.M_DATA_PAGE
        return pcrypt.encrypt_module(self.key, body, self._aad(mt, not dict_page))


def _converted_type(t: "pa.DataType"):
    """ConvertedType enum for logical annotations we emit
    (LogicalTypeAnnotation.java equivalents): UTF8=0, DECIMAL=5, DATE=6,
    TIMESTAMP_MILLIS=9, TIMESTAMP_MICROS=10. Plain binary columns stay
    unannotated — stamping UTF8 on them would surface arbitrary payloads as
    strings in independent readers."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return 0
    if pa.types.is_decimal(t):
        return 5
    if pa.types.is_date32(t):
        return 6
    # TIME gets no ConvertedType: we stamp TimeType(isAdjustedToUTC=false)
    # (local time-of-day), and the spec defines TIME_MILLIS/TIME_MICROS as
    # equivalent to the UTC-adjusted flavor only — parquet-java's
    # timeType(false, unit).toConvertedType() is likewise null
    if pa.types.is_integer(t):
        # INT_8..INT_64 = 15..18, UINT_8..UINT_64 = 11..14
        width_slot = {8: 0, 16: 1, 32: 2, 64: 3}[t.bit_width]
        if pa.types.is_signed_integer(t):
            return None if t.bit_width in (32, 64) else 15 + width_slot
        return 11 + width_slot
    return None


def _logical_type(t: "pa.DataType"):
    """SchemaElement.logicalType (field 10) writer closure, or None.
    Timestamps need the LogicalType union (TimestampType{isAdjustedToUTC,
    unit}) — ConvertedType alone implies UTC-adjusted semantics."""
    if pa.types.is_timestamp(t):
        unit_field = {"ms": 1, "us": 2, "ns": 3}[t.unit]
        utc = t.tz is not None

        def emit(w: "_W"):
            w.begin_struct(10)  # logicalType
            w.begin_struct(8)  # TIMESTAMP
            w.boolean(1, utc)
            w.begin_struct(2)  # unit union
            w.begin_struct(unit_field)  # MILLIS/MICROS/NANOS empty struct
            w.end_struct()
            w.end_struct()
            w.end_struct()
            w.end_struct()

        return emit
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        # TimeType{isAdjustedToUTC, unit} — LogicalType union field 7
        # (LogicalTypeAnnotation.TimeLogicalTypeAnnotation). We stamp
        # isAdjustedToUTC=false (local time-of-day): pyarrow maps either
        # flavor to arrow time32/time64, but DuckDB maps true to TIMETZ and
        # then rejects the 4/8-byte column statistics, so false is the
        # interoperable choice
        t_unit_field = {"ms": 1, "us": 2, "ns": 3}[t.unit]

        def emit_time(w: "_W"):
            w.begin_struct(10)  # logicalType
            w.begin_struct(7)  # TIME
            w.boolean(1, False)
            w.begin_struct(2)  # unit union
            w.begin_struct(t_unit_field)
            w.end_struct()
            w.end_struct()
            w.end_struct()
            w.end_struct()

        return emit_time
    if pa.types.is_float16(t):

        def emit_f16(w: "_W"):
            w.begin_struct(10)  # logicalType
            w.begin_struct(15)  # FLOAT16 (Float16Type, empty struct)
            w.end_struct()
            w.end_struct()

        return emit_f16
    return None

# thrift parquet enums
T_BOOLEAN, T_INT32, T_INT64, T_INT96, T_FLOAT, T_DOUBLE, T_BYTE_ARRAY, T_FLBA = range(8)
ENC_PLAIN, _, ENC_PLAIN_DICT, ENC_RLE, ENC_BIT_PACKED, ENC_DELTA_BP, ENC_DELTA_LEN, ENC_DELTA_BA, ENC_RLE_DICT, ENC_BSS = range(10)

_PARQUET_TYPE = {
    "BOOLEAN": T_BOOLEAN,
    "INT32": T_INT32,
    "INT64": T_INT64,
    "FLOAT": T_FLOAT,
    "DOUBLE": T_DOUBLE,
    "BINARY": T_BYTE_ARRAY,
    "FIXED_LEN_BYTE_ARRAY": T_FLBA,
    "INT96": T_INT96,
}
_ENC_CODE = {
    "PLAIN": ENC_PLAIN,
    "RLE": ENC_RLE,
    "DELTA_BINARY_PACKED": ENC_DELTA_BP,
    "DELTA_LENGTH_BYTE_ARRAY": ENC_DELTA_LEN,
    "DELTA_BYTE_ARRAY": ENC_DELTA_BA,
    "RLE_DICTIONARY": ENC_RLE_DICT,
    "BYTE_STREAM_SPLIT": ENC_BSS,
}
# encodings that exist in the parquet format (no FSST / RLE_FOR in files)
PARQUET_LEGAL = set(_ENC_CODE) | {"PLAIN"}


# ----------------------------------------------------- thrift compact writer


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _wvarint(out: bytearray, v: int) -> None:
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


class _W:
    """Compact-protocol struct writer."""

    def __init__(self):
        self.out = bytearray()
        self._stack = []
        self._last = 0

    def _field(self, fid: int, ftype: int) -> None:
        delta = fid - self._last
        if 0 < delta <= 15:
            self.out.append((delta << 4) | ftype)
        else:
            self.out.append(ftype)
            _wvarint(self.out, _zigzag(fid))
        self._last = fid

    def i(self, fid: int, v: int) -> None:  # i32 (zigzag varint, type 5)
        self._field(fid, 5)
        _wvarint(self.out, _zigzag(int(v)))

    def i64(self, fid: int, v: int) -> None:  # i64 (zigzag varint, type 6)
        self._field(fid, 6)
        _wvarint(self.out, _zigzag(int(v)))

    def boolean(self, fid: int, v: bool) -> None:
        self._field(fid, 1 if v else 2)

    def dbl(self, fid: int, v: float) -> None:  # double (type 7, 8-byte LE)
        self._field(fid, 7)
        self.out += struct.pack("<d", float(v))

    def binary(self, fid: int, b: bytes) -> None:
        self._field(fid, 8)
        _wvarint(self.out, len(b))
        self.out += b

    def string(self, fid: int, s: str) -> None:
        self.binary(fid, s.encode())

    def begin_struct(self, fid: int) -> None:
        self._field(fid, 12)
        self._stack.append(self._last)
        self._last = 0

    def end_struct(self) -> None:
        self.out.append(0)
        self._last = self._stack.pop()

    def begin_list(self, fid: int, etype: int, size: int) -> None:
        self._field(fid, 9)
        if size < 15:
            self.out.append((size << 4) | etype)
        else:
            self.out.append(0xF0 | etype)
            _wvarint(self.out, size)

    def stop(self) -> bytes:
        self.out.append(0)
        return bytes(self.out)


# parquet CompressionCodec enum (CompressionCodecName.java:26-33); "lz4" maps
# to LZ4_RAW (7) — the modern raw-block variant readers implement
_CODEC_ID = {
    "snappy": 1,
    "gzip": 2,
    "lzo": 3,  # legacy LZO, Hadoop block framing (clean-room LZO1X)
    "brotli": 4,
    "lz4_hadoop": 5,  # legacy LZ4, Hadoop block framing (parquet-mr parity)
    "zstd": 6,
    "lz4": 7,
}


def _page_codec(name: str | None):
    if not name:
        return 0, None
    key = name.lower()
    if key not in _CODEC_ID:
        raise ValueError(f"unsupported parquet page codec {name!r}")
    if key == "lz4_hadoop":
        from .codecs.lz4hadoop import Lz4HadoopCodec

        return 5, Lz4HadoopCodec()
    if key == "lzo":
        from .codecs.lzo import LzoHadoopCodec

        return 3, LzoHadoopCodec()
    return _CODEC_ID[key], pa.Codec("lz4_raw" if key == "lz4" else key)


def _page_header(
    ptype_page: int, unc: int, comp: int, body_fields, crc: int | None = None
) -> bytes:
    w = _W()
    w.i(1, ptype_page)
    w.i(2, unc)
    w.i(3, comp)
    if crc is not None:
        w.i(4, crc - (1 << 32) if crc >= (1 << 31) else crc)  # thrift i32
    body_fields(w)
    return w.stop()


def data_page_header(
    num_values: int, encoding: int, unc: int, comp: int | None = None,
    crc: int | None = None, level_enc: int = ENC_RLE,
) -> bytes:
    def body(w: _W):
        w.begin_struct(5)
        w.i(1, num_values)
        w.i(2, encoding)
        w.i(3, level_enc)  # definition level encoding
        w.i(4, level_enc)  # repetition level encoding
        w.end_struct()

    return _page_header(0, unc, comp if comp is not None else unc, body, crc)


def data_page_header_v2(
    num_values: int,
    num_nulls: int,
    num_rows: int,
    encoding: int,
    def_len: int,
    rep_len: int,
    unc: int,
    comp: int,
    is_compressed: bool,
    crc: int | None = None,
) -> bytes:
    """DataPageHeaderV2 (parquet.thrift; ColumnWriterV2.java:43-112): levels
    sit unframed and uncompressed before the (optionally compressed) values."""

    def body(w: _W):
        w.begin_struct(8)
        w.i(1, num_values)
        w.i(2, num_nulls)
        w.i(3, num_rows)
        w.i(4, encoding)
        w.i(5, def_len)
        w.i(6, rep_len)
        w.boolean(7, is_compressed)
        w.end_struct()

    return _page_header(3, unc, comp, body, crc)


def dict_page_header(
    num_values: int, unc: int, comp: int | None = None, crc: int | None = None
) -> bytes:
    def body(w: _W):
        w.begin_struct(7)
        w.i(1, num_values)
        w.i(2, ENC_PLAIN)
        w.end_struct()

    return _page_header(2, unc, comp if comp is not None else unc, body, crc)


# ---------------------------------------------------- Dremel record shredding


class _Leaf:
    """One parquet leaf column shredded out of a (possibly nested) arrow
    column: dense defined values plus repetition/definition level arrays."""

    __slots__ = ("path", "arr", "rep", "dfv", "max_rep", "max_def")

    def __init__(self, path, arr, rep, dfv, max_rep, max_def):
        self.path = path
        self.arr = arr
        self.rep = rep
        self.dfv = dfv
        self.max_rep = max_rep
        self.max_def = max_def


def _entry_ranges(arr, idx, alive):
    """(start, length) of each alive entry's value range in ``arr.values``
    coordinates (offsets are slice-adjusted, values are the unsliced child)."""
    S = len(alive)
    start = np.zeros(S, np.int64)
    length = np.zeros(S, np.int64)
    t = arr.type
    a_idx = idx[alive]
    if pa.types.is_fixed_size_list(t):
        w = t.list_size
        start[alive] = (arr.offset + a_idx) * w
        length[alive] = w
        values = arr.values
    else:
        off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        start[alive] = off[a_idx]
        length[alive] = off[a_idx + 1] - off[a_idx]
        values = arr.values
    return values, start, length


def _walk(arr, nullable, rep, dfv, alive, idx, cur_rep, cur_def, path, leaves):
    """Vectorized Dremel shredding (`io/MessageColumnIO.java:508` semantics):
    one slot per level entry; null/empty entries go dead at their final
    definition level and flow down to every leaf beneath, preserving record
    order. All operations are numpy over whole slot arrays."""
    t = arr.type

    if nullable:
        cur_def += 1
        if arr.null_count:
            isv = arr.is_valid().to_numpy(zero_copy_only=False)
            ok = np.zeros(len(alive), bool)
            ok[alive] = isv[idx[alive]]
            alive = alive & ok
        dfv = dfv.copy()
        dfv[alive] += 1

    if pa.types.is_map(t):
        arr = arr.cast(
            pa.list_(pa.struct([pa.field("key", t.key_type, False),
                                pa.field("value", t.item_type)]))
        )
        t = arr.type
        group = "key_value"
    else:
        group = "list"

    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        cur_rep += 1
        cur_def += 1  # the repeated level: empty lists stay one def below
        values, start, length = _entry_ranges(arr, idx, alive)
        nonempty = alive & (length > 0)
        counts = np.ones(len(alive), np.int64)
        counts[nonempty] = length[nonempty]
        S2 = int(counts.sum())
        starts = np.zeros(len(alive), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        new_rep = np.full(S2, cur_rep, np.uint8)
        new_rep[starts] = rep  # first slot of each entry keeps the entry rep
        ndfv = dfv.copy()
        ndfv[nonempty] += 1
        new_dfv = np.repeat(ndfv, counts)
        new_alive = np.repeat(nonempty, counts)
        pos = np.arange(S2, dtype=np.int64) - np.repeat(starts, counts)
        new_idx = np.repeat(start, counts) + pos
        elem = t.value_field
        if group == "key_value":
            st = values
            kpath = path + [group, "key"]
            vpath = path + [group, "value"]
            _walk(st.field(0), False, new_rep, new_dfv, new_alive, new_idx,
                  cur_rep, cur_def, kpath, leaves)
            _walk(st.field(1), True, new_rep, new_dfv, new_alive, new_idx,
                  cur_rep, cur_def, vpath, leaves)
        else:
            _walk(values, elem.nullable, new_rep, new_dfv, new_alive, new_idx,
                  cur_rep, cur_def, path + [group, "element"], leaves)
        return

    if pa.types.is_struct(t):
        for i, child in enumerate(t):
            _walk(arr.field(i), child.nullable, rep, dfv, alive, idx,
                  cur_rep, cur_def, path + [child.name], leaves)
        return

    if pa.types.is_dictionary(t):
        arr = arr.dictionary_decode()

    if alive.all() and len(idx) == len(arr) and (idx == np.arange(len(arr))).all():
        dense = arr
    else:
        dense = arr.take(pa.array(idx[alive], pa.int64()))
    leaves.append(
        _Leaf(
            path,
            dense,
            rep if cur_rep > 0 else None,
            dfv if cur_def > 0 else None,
            cur_rep,
            cur_def,
        )
    )


def _dremel_leaves(field: pa.Field, arr) -> list[_Leaf]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    leaves: list[_Leaf] = []
    _walk(
        arr, field.nullable,
        np.zeros(n, np.uint8), np.zeros(n, np.uint8),
        np.ones(n, bool), np.arange(n, dtype=np.int64),
        0, 0, [field.name], leaves,
    )
    return leaves


# ------------------------------------------------------------- file assembly


class _Column:
    def __init__(self, path_in_schema, ptype, max_rep, max_def):
        self.path = path_in_schema
        self.ptype = ptype
        self.max_rep = max_rep
        self.max_def = max_def
        self.encodings: set[int] = set()
        self.num_values = 0
        self.start_offset = 0
        self.dict_offset = None
        self.data_offset = None
        self.total_bytes = 0
        self.total_unc = 0  # uncompressed equivalent (incl. headers)
        self.codec = 0  # CompressionCodec enum
        self.type_length = None  # FIXED_LEN_BYTE_ARRAY width
        # PageEncodingStats (field 13): {(page_type, encoding): count}
        self.page_stats: dict = {}
        # per-data-page records for the ColumnIndex / OffsetIndex
        self.page_index: list = []
        self.ci_offset = self.ci_len = None
        self.oi_offset = self.oi_len = None
        # Statistics (ColumnMetaData field 12) + SizeStatistics (field 16)
        self.null_count = 0
        self.min_bytes = None
        self.max_bytes = None
        self.stats_exact = True
        self.rep_hist = None
        self.def_hist = None
        self.unenc_bytes = None
        # modular-encryption state (set when the file is encrypted)
        self.crypto_key = None
        self.uses_col_key = False
        self.rg_ord = None
        self.col_ord = None
        # GeospatialStatistics (ColumnMetaData field 17) for GEOMETRY leaves
        self.geo = None
        # split-block bloom (SpecBloom) pending serialization + its location
        self.bloom = None
        self.bloom_offset = None
        self.bloom_len = None


def _levels_payload(levels: np.ndarray | None, width: int) -> bytes:
    if levels is None:
        return b""
    return rle_hybrid.encode_framed(levels, width)


def _encode_column_pages(
    col: PhysicalColumn,
    out: bytearray,
    meta: _Column,
    config: sel.EncodeConfig,
    rep_levels: np.ndarray | None = None,
    def_levels: np.ndarray | None = None,
    max_rep: int = 0,
    max_def: int = 0,
    crypto: "_ChunkCrypto | None" = None,
) -> None:
    """Emit dictionary page (maybe) + data pages for one column chunk.

    Levels cover *slots* (one per value, plus one per empty list / null row).
    Flat required columns omit levels entirely (the reference's DevNull level
    writers); page splitting happens over slots so num_values counts slots,
    and value ranges derive from the definition levels."""
    cfg = sel.EncodeConfig(
        page_size=config.page_size,
        page_rows=config.page_rows,
        max_dict_bytes=config.max_dict_bytes,
        fsst=False,  # parquet-legal candidates only
        column_encodings={
            k: v
            for k, v in config.column_encodings.items()
            if v in PARQUET_LEGAL
        },
        disable_dictionary=config.disable_dictionary,
    )
    if def_levels is None:
        slot_ranges = None
        ranges = page_ranges(col, cfg)
    else:
        S = len(def_levels)
        step = cfg.page_rows
        if max_rep > 0 and S:
            # pages must start on record boundaries (rep == 0) so V2
            # num_rows is exact and readers can seek by row
            rec = np.flatnonzero(rep_levels == 0)
            want = np.arange(step, S, step)
            hits = np.searchsorted(rec, want)
            cuts = np.unique(rec[hits[hits < len(rec)]])
            bounds = [0, *[int(c) for c in cuts if 0 < c < S], S]
            slot_ranges = list(zip(bounds[:-1], bounds[1:]))
        else:
            slot_ranges = [(a, min(a + step, S)) for a in range(0, S, step)] or [(0, 0)]
        vprefix = np.zeros(S + 1, np.int64)
        np.cumsum((def_levels == max_def).astype(np.int64), out=vprefix[1:])
        ranges = [(int(vprefix[a]), int(vprefix[b])) for a, b in slot_ranges]

    meta.start_offset = len(out)
    if col.num_values == 0 and def_levels is None:
        # zero-row chunk: no data pages; data_offset must still be valid
        meta.encodings.add(ENC_PLAIN)
        meta.data_offset = meta.start_offset
        return

    st = stats_mod.compute(col)
    cands = []
    for enc_name in sel.candidates_for(col, st, cfg):
        if enc_name not in PARQUET_LEGAL:
            continue
        if (
            col.ptype == "FIXED_LEN_BYTE_ARRAY"
            and enc_name in ("BYTE_STREAM_SPLIT", "DELTA_BYTE_ARRAY")
            and cfg.column_encodings.get(col.name) != enc_name
        ):
            # spec-legal for FLBA (format 2.11 extended BSS) but common
            # readers (DuckDB) only accept BSS for FLOAT/DOUBLE and
            # DELTA_BYTE_ARRAY for BYTE_ARRAY — keep auto-selected output
            # widely readable; an explicit column_encodings override is
            # honored (our readers decode both)
            continue
        cand = _plan_candidate(col, enc_name, ranges, cfg)
        if cand is not None:
            cands.append(cand)
    if not cands:
        # an override that can't plan for this chunk (or a non-parquet
        # encoding) falls back to the automatic candidate set
        auto = sel.EncodeConfig(
            page_size=cfg.page_size, page_rows=cfg.page_rows,
            max_dict_bytes=cfg.max_dict_bytes, fsst=False,
        )
        for enc_name in sel.candidates_for(col, st, auto):
            if enc_name not in PARQUET_LEGAL or (
                col.ptype == "FIXED_LEN_BYTE_ARRAY"
                and enc_name in ("BYTE_STREAM_SPLIT", "DELTA_BYTE_ARRAY")
            ):
                continue
            cand = _plan_candidate(col, enc_name, ranges, auto)
            if cand is not None:
                cands.append(cand)
    # V1 RLE data pages (BOOLEAN) carry a 4-byte LE length prefix per page
    # (RunLengthBitPackingHybridValuesWriter.getBytes) — count it in the
    # size comparison so RLE only wins when it wins framed.
    cands.sort(key=lambda c: c.size + (4 * len(ranges) if c.encoding == "RLE" else 0))
    best = cands[0]
    aux, pages = best.emit()
    if best.encoding == "RLE":
        pages = [len(p).to_bytes(4, "little") + p for p in pages]

    codec_id, codec = _page_codec(config.compression)
    v2 = getattr(config, "parquet_page_version", "1.0") == "2.0"
    meta.codec = codec_id

    def compress(b: bytes) -> bytes:
        return codec.compress(b).to_pybytes() if codec else b

    if best.encoding == "RLE_DICTIONARY":
        # emit the dictionary page in parquet shape (PLAIN keys in
        # first-occurrence order — parquet-java semantics, not our sorted
        # container variant); compressed per page like
        # ColumnChunkPageWriteStore.java:192-252
        fac = sel.try_dictionary(col, cfg)
        ids, dic = fac
        if col.ptype == "BINARY":
            dict_payload = dict_page_binary(dic)
        else:
            dict_payload = dict_page_fixed(dic, col.ptype)
        dict_comp = compress(dict_payload)
        if crypto is not None:
            # module encryption: compressed_page_size covers the ciphertext
            # frame (ColumnChunkPageWriteStore.java:517-521 takes the size
            # after encryption); CRC is over the stored (encrypted) bytes
            dict_comp = crypto.page(dict_comp, dict_page=True)
        meta.dict_offset = len(out)
        hdr = dict_page_header(
            len(dic), len(dict_payload), len(dict_comp), crc=zlib.crc32(dict_comp)
        )
        if crypto is not None:
            hdr = crypto.header(hdr, dict_page=True)
        out += hdr
        out += dict_comp
        meta.page_stats[(2, ENC_PLAIN)] = meta.page_stats.get((2, ENC_PLAIN), 0) + 1
        meta.total_unc += len(hdr) + len(dict_payload)
        meta.encodings |= {ENC_PLAIN, ENC_RLE_DICT}
        pages = [encode_ids(ids[a:b], len(dic)) for a, b in ranges]
    else:
        meta.encodings.add(_ENC_CODE[best.encoding])

    from .codecs.dictionary import bit_width32

    enc_code = (
        ENC_RLE_DICT if best.encoding == "RLE_DICTIONARY" else _ENC_CODE[best.encoding]
    )
    for k, payload in enumerate(pages):
        if def_levels is not None:
            sa, sb = slot_ranges[k]
            nv = sb - sa
        else:
            a, b = ranges[k]
            nv = b - a
        if v2:
            # DataPageV2: unframed uncompressed levels, then compressed values
            rep_b = def_b = b""
            nrows, nnulls = nv, 0
            if def_levels is not None:
                if max_rep > 0:
                    rep_b = rle_hybrid.encode(rep_levels[sa:sb], bit_width32(max_rep))
                    nrows = int((rep_levels[sa:sb] == 0).sum())
                def_b = rle_hybrid.encode(def_levels[sa:sb], bit_width32(max_def))
                nnulls = int((def_levels[sa:sb] < max_def).sum())
            vals = compress(payload)
            if crypto is not None:
                # V2 levels stay plaintext before the encrypted values blob
                # (ColumnChunkPageWriteStore.writePageV2:320-325)
                crypto.next_page()
                vals = crypto.page(vals)
            body = rep_b + def_b + vals
            hdr = data_page_header_v2(
                nv, nnulls, nrows, enc_code,
                len(def_b), len(rep_b),
                unc=len(rep_b) + len(def_b) + len(payload),
                comp=len(body),
                is_compressed=codec is not None,
                crc=zlib.crc32(body),
            )
            unc_len = len(rep_b) + len(def_b) + len(payload)
        else:
            lv = b""
            legacy = getattr(config, "level_encoding", "RLE") == "BIT_PACKED"
            if def_levels is not None:
                if legacy:
                    from .codecs.bitpack import pack_msb

                    if max_rep > 0:
                        lv += pack_msb(rep_levels[sa:sb], bit_width32(max_rep))
                    lv += pack_msb(def_levels[sa:sb], bit_width32(max_def))
                else:
                    if max_rep > 0:
                        lv += _levels_payload(rep_levels[sa:sb], bit_width32(max_rep))
                    lv += _levels_payload(def_levels[sa:sb], bit_width32(max_def))
            raw = lv + payload
            body = compress(raw)
            if crypto is not None:
                # V1 pages encrypt levels+values as one module
                crypto.next_page()
                body = crypto.page(body)
            hdr = data_page_header(
                nv, enc_code, len(raw), len(body), crc=zlib.crc32(body),
                level_enc=ENC_BIT_PACKED if legacy else ENC_RLE,
            )
            unc_len = len(raw)
        if crypto is not None:
            hdr = crypto.header(hdr)
        if meta.data_offset is None:
            meta.data_offset = len(out)
        page_off = len(out)
        out += hdr
        out += body
        meta.num_values += nv
        meta.total_unc += len(hdr) + unc_len
        pt = 3 if v2 else 0
        meta.page_stats[(pt, enc_code)] = meta.page_stats.get((pt, enc_code), 0) + 1
        # ColumnIndex / OffsetIndex records (PageLocation.offset points at
        # the page header; sizes include the header)
        if def_levels is not None:
            sa, sb = slot_ranges[k]
            page_rows = (
                int((rep_levels[sa:sb] == 0).sum()) if max_rep > 0 else nv
            )
            va, vb = ranges[k]
            defined = vb - va
            bounds = _value_bounds(col, va, vb)
        else:
            va, vb = ranges[k]
            defined = vb - va
            page_rows = nv
            bounds = _value_bounds(col, va, vb)
        meta.page_index.append(
            {
                "offset": page_off,
                "size": len(out) - page_off,
                "rows": page_rows,
                "nulls": nv - defined,
                "defined": defined,
                "bounds": bounds,
                "keys": _bounds_cmp_keys(col, bounds),
            }
        )
    if meta.data_offset is None:
        meta.data_offset = meta.start_offset
    meta.total_bytes = len(out) - meta.start_offset


def _bounds_cmp_keys(col: PhysicalColumn, bounds):
    """Comparable keys for the WRITTEN page bounds in the column's
    comparator order (PrimitiveComparator analog) — feeds the
    boundary_order calculation over the values readers binary-search.
    None when the type's order isn't expressible here (wide decimals)."""
    if bounds is None:
        return None
    import struct

    mn, mx = bounds[0], bounds[1]
    if col.ptype in ("INT32", "INT64", "FLOAT", "DOUBLE"):
        fmt = {"INT32": "<i", "INT64": "<q", "FLOAT": "<f", "DOUBLE": "<d"}[col.ptype]
        if col.unsigned and fmt in ("<i", "<q"):
            fmt = fmt.upper()
        return struct.unpack(fmt, mn)[0], struct.unpack(fmt, mx)[0]
    if col.ptype in ("BOOLEAN", "BINARY"):
        return mn, mx  # unsigned lexicographic (UTF8/bytes comparator)
    if col.ptype == "FIXED_LEN_BYTE_ARRAY" and col.f16:
        return (
            np.frombuffer(mn, "<f2")[0].item(),
            np.frombuffer(mx, "<f2")[0].item(),
        )
    return None


def _value_bounds(col: PhysicalColumn, a: int, b: int):
    """(min_bytes, max_bytes, exact) of col.values[a:b] in parquet Statistics
    byte order, or None when unbounded (NaNs, FLBA ordering subtleties)."""
    import struct

    if b <= a:
        return None
    if col.ptype in ("INT32", "INT64", "FLOAT", "DOUBLE"):
        v = np.asarray(col.values)[a:b]
        if v.dtype.kind == "f" and np.isnan(v).any():
            return None
        fmt = {"INT32": "<i", "INT64": "<q", "FLOAT": "<f", "DOUBLE": "<d"}[col.ptype]
        if col.unsigned and v.dtype.kind == "i":
            # UINT logical types order TYPE_DEFINED_ORDER in the unsigned
            # domain: take bounds on the unsigned view and pack the (same)
            # bit pattern, else uint32 [1, 4294967295] records min=-1/max=5
            # and readers prune matching row groups
            v = v.view(v.dtype.str.replace("i", "u"))
            fmt = fmt.upper()
        return struct.pack(fmt, v.min().item()), struct.pack(fmt, v.max().item()), True
    if col.ptype == "BOOLEAN":
        v = np.asarray(col.values, bool)[a:b]
        return (b"\x01" if v.min() else b"\x00"), (b"\x01" if v.max() else b"\x00"), True
    if col.ptype == "BINARY":
        import pyarrow.compute as pc

        from . import stats as st_mod
        from .codecs.dictionary import binary_array

        offsets, data = col.values
        arr = binary_array(offsets, data).cast(pa.large_binary()).slice(a, b - a)
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        lim = st_mod.BINARY_TRUNCATE
        exact = len(mn) <= lim and len(mx) <= lim
        return mn[:lim], st_mod.truncate_max(mx, lim), exact
    if col.ptype == "FIXED_LEN_BYTE_ARRAY" and col.f16:
        # FLOAT16 orders numerically as IEEE half floats
        # (Float16Statistics / TYPE_DEFINED_ORDER for the FLOAT16 logical
        # type): bounds on the float view, ±0 widened like parquet-cpp so
        # an exact-zero predicate can never be wrongly pruned
        v = np.ascontiguousarray(np.asarray(col.values)[a:b]).view("<f2").ravel()
        if np.isnan(v).any():
            return None
        mn, mx = v.min(), v.max()
        if mn == 0.0:
            mn = np.float16(-0.0)
        if mx == 0.0:
            mx = np.float16(0.0)
        return mn.tobytes(), mx.tobytes(), True
    return None


def _leaf_statistics(meta: _Column, col: PhysicalColumn, leaf: _Leaf) -> None:
    """Typed min/max/null-count + level histograms for the footer
    (Statistics.java + SizeStatistics.java semantics; binary bounds use the
    ColumnIndexBuilder truncate/increment rule with exactness flags)."""
    import struct

    if leaf.dfv is not None:
        meta.null_count = int((leaf.dfv < leaf.max_def).sum())
        meta.def_hist = np.bincount(leaf.dfv, minlength=leaf.max_def + 1)
    if leaf.rep is not None:
        meta.rep_hist = np.bincount(leaf.rep, minlength=leaf.max_rep + 1)
    if col.num_values == 0:
        return
    if col.ptype == "BINARY":
        offsets, _data = col.values
        meta.unenc_bytes = int(offsets[-1] - offsets[0])
    bounds = _value_bounds(col, 0, col.num_values)
    if bounds is not None:
        meta.min_bytes, meta.max_bytes, meta.stats_exact = bounds


def _write_row_group(
    table: pa.Table,
    out: bytearray,
    config: sel.EncodeConfig,
    file_crypto: "tuple[pcrypt.FileEncryption, bytes] | None" = None,
    rg_ord: int = 0,
    int96_cols: "frozenset[str] | set[str]" = frozenset(),
) -> list[_Column]:
    columns: list[_Column] = []
    col_ord = 0
    for field in table.schema:
        for leaf in _dremel_leaves(field, table.column(field.name)):
            t = leaf.arr.type
            col = shred("/".join(leaf.path), leaf.arr)[0]
            if col.ptype == "FIXED_LEN_BYTE_ARRAY" and pa.types.is_decimal(t):
                # arrow decimal storage is little-endian full-width; parquet
                # DECIMAL over FLBA is big-endian two's complement at the
                # *minimal* length for the precision (parquet-mr / pyarrow
                # convention; wider lengths trip DuckDB's decimal reader)
                be = np.asarray(col.values)[:, ::-1]
                L = _decimal_flba_len(t.precision)
                col.values = np.ascontiguousarray(be[:, be.shape[1] - L :])
            # INT96 columns arrive as FLBA(12) (the _timestamps_to_int96
            # storage) and encode as FLBA PLAIN pages — byte-identical to
            # INT96 PLAIN — but the footer stamps physical type INT96 with
            # no type_length and no min/max (sort order UNKNOWN)
            is_int96 = len(leaf.path) == 1 and leaf.path[0] in int96_cols
            meta = _Column(
                leaf.path, "INT96" if is_int96 else col.ptype,
                leaf.max_rep, leaf.max_def,
            )
            crypto = None
            if file_crypto is not None:
                props, file_aad = file_crypto
                key, uses_col_key = props.key_for(".".join(leaf.path))
                crypto = _ChunkCrypto(
                    key, file_aad, rg_ord, col_ord,
                    ctr_pages=props.algorithm == "AES_GCM_CTR_V1",
                )
                meta.crypto_key = key
                meta.uses_col_key = uses_col_key
                meta.rg_ord, meta.col_ord = rg_ord, col_ord
            if leaf.max_def == 0:
                _encode_column_pages(col, out, meta, config, crypto=crypto)
            else:
                _encode_column_pages(
                    col, out, meta, config,
                    rep_levels=leaf.rep, def_levels=leaf.dfv,
                    max_rep=leaf.max_rep, max_def=leaf.max_def,
                    crypto=crypto,
                )
            col_ord += 1
            if col.ptype == "FIXED_LEN_BYTE_ARRAY" and not is_int96:
                meta.type_length = int(np.asarray(col.values).shape[1])
            _leaf_statistics(meta, col, leaf)
            dotted = ".".join(leaf.path)
            spec = config.geospatial.get(dotted) or config.geospatial.get(
                leaf.path[0]
            )
            if (
                spec is not None
                and spec.kind == "geometry"
                and col.ptype == "BINARY"
            ):
                from . import geo as geo_mod

                meta.geo = geo_mod.compute_statistics(leaf.arr)
            if dotted in config.bloom_columns or leaf.path[0] in config.bloom_columns:
                from . import bloom as bloom_mod

                fpp = getattr(config, "bloom_fpp", 0.01)
                if getattr(config, "bloom_adaptive", False):
                    meta.bloom = bloom_mod.build_adaptive_spec_bloom(
                        col,
                        max_bytes=config.bloom_max_bytes,
                        num_candidates=config.bloom_candidates,
                        fpp=fpp,
                    )
                else:
                    meta.bloom = bloom_mod.build_spec_bloom(col, fpp=fpp)
            columns.append(meta)
    return columns


def _bloom_header_bytes(num_bytes: int) -> bytes:
    """BloomFilterHeader (parquet.thrift): numBytes + XXHASH + BLOCK +
    UNCOMPRESSED unions (Util.writeBloomFilterHeader / BlockSplitBloomFilter
    serialization)."""
    w = _W()
    w.i(1, num_bytes)
    for fid in (2, 3, 4):  # hash / algorithm / compression unions, member 1
        w.begin_struct(fid)
        w.begin_struct(1)
        w.end_struct()
        w.end_struct()
    return w.stop()


def _page_indexes_bytes(meta: _Column):
    """(ColumnIndex bytes, OffsetIndex bytes) for one chunk
    (`internal/column/columnindex/ColumnIndexBuilder.java` /
    `OffsetIndexBuilder.java` output shapes), or None when a non-null page
    has no representable bounds (NaNs, FLBA)."""
    pages = meta.page_index
    if not pages:
        return None
    for p in pages:
        if p["defined"] > 0 and p["bounds"] is None:
            return None
    ci = _W()
    ci.begin_list(1, 1, len(pages))  # null_pages (bool bytes: 1 true, 2 false)
    for p in pages:
        ci.out.append(1 if p["defined"] == 0 else 2)
    ci.begin_list(2, 8, len(pages))  # min_values
    for p in pages:
        b = p["bounds"][0] if p["defined"] else b""
        _wvarint(ci.out, len(b))
        ci.out += b
    ci.begin_list(3, 8, len(pages))  # max_values
    for p in pages:
        b = p["bounds"][1] if p["defined"] else b""
        _wvarint(ci.out, len(b))
        ci.out += b
    # boundary_order (ColumnIndexBuilder.calculateBoundaryOrder): ASCENDING /
    # DESCENDING when both the min and max lists of non-null pages are
    # monotone under the column comparator; vacuously ASCENDING for <=1 page
    keys = [p["keys"] for p in pages if p["defined"] > 0]
    order = 0
    if all(k is not None for k in keys):
        mins = [k[0] for k in keys]
        maxs = [k[1] for k in keys]
        if all(a <= b for a, b in zip(mins, mins[1:])) and all(
            a <= b for a, b in zip(maxs, maxs[1:])
        ):
            order = 1
        elif all(a >= b for a, b in zip(mins, mins[1:])) and all(
            a >= b for a, b in zip(maxs, maxs[1:])
        ):
            order = 2
    ci.i(4, order)
    ci.begin_list(5, 6, len(pages))  # null_counts
    for p in pages:
        _wvarint(ci.out, _zigzag(p["nulls"]))
    oi = _W()
    oi.begin_list(1, 12, len(pages))  # page_locations
    first = 0
    for p in pages:
        pl = _W()
        pl.i64(1, p["offset"])
        pl.i(2, p["size"])
        pl.i64(3, first)
        oi.out += pl.stop()
        first += p["rows"]
    return ci.stop(), oi.stop()


def _row_byte_sizes(table: pa.Table) -> "np.ndarray":
    """Approximate in-memory bytes per row (the `memSize / recordCount`
    estimate of InternalParquetRecordWriter.checkBlockSizeReached,
    parquet-hadoop/.../InternalParquetRecordWriter.java:177-208, computed
    exactly per row instead of as a running average)."""
    import pyarrow.compute as pc

    def sizes(arr, n):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_binary(t):
            off = np.frombuffer(arr.buffers()[1], np.int32, n + 1, arr.offset * 4)
            return np.diff(off).astype(np.int64) + 4
        if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            off = np.frombuffer(arr.buffers()[1], np.int64, n + 1, arr.offset * 8)
            return np.diff(off) + 8
        if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_map(t):
            width = 4 if pa.types.is_list(t) or pa.types.is_map(t) else 8
            lengths = np.asarray(
                pc.list_value_length(arr).fill_null(0), np.int64
            )
            nv = len(arr.values) if not pa.types.is_map(t) else len(arr.keys)
            per_elem = (
                arr.values.nbytes / max(1, nv)
                if not pa.types.is_map(t)
                else (arr.keys.nbytes + arr.items.nbytes) / max(1, nv)
            )
            return (lengths * per_elem).astype(np.int64) + width
        if pa.types.is_struct(t):
            out = np.zeros(n, np.int64)
            for i in range(t.num_fields):
                out += sizes(arr.field(i), n)
            return out
        # fixed-width primitives / decimals / FLBA: uniform
        return np.full(n, max(1, arr.nbytes // max(1, n)), np.int64)

    total = np.zeros(table.num_rows, np.int64)
    for name in table.column_names:
        total += sizes(table.column(name), table.num_rows)
    return total


def _has_time32s(t: pa.DataType) -> bool:
    """Any time32[s] leaf anywhere under ``t`` (struct/list/map included)?"""
    if pa.types.is_time32(t) and t.unit == "s":
        return True
    if pa.types.is_dictionary(t):
        return _has_time32s(t.value_type)
    for i in range(t.num_fields):
        if _has_time32s(t.field(i).type):
            return True
    return False


def _coerce_time32s(t: pa.DataType) -> pa.DataType:
    """Recursively replace time32[s] with time32[ms] (parquet TIME has no
    seconds unit), preserving struct/list/map/dictionary shape."""
    if pa.types.is_time32(t) and t.unit == "s":
        return pa.time32("ms")
    if pa.types.is_dictionary(t):
        return pa.dictionary(t.index_type, _coerce_time32s(t.value_type), t.ordered)
    if pa.types.is_struct(t):
        return pa.struct(
            [f.with_type(_coerce_time32s(f.type)) for f in t]
        )
    if pa.types.is_map(t):
        return pa.map_(
            _coerce_time32s(t.key_type), _coerce_time32s(t.item_type)
        )
    if pa.types.is_large_list(t):
        return pa.large_list(_coerce_time32s(t.value_type))
    if pa.types.is_fixed_size_list(t):
        return pa.list_(_coerce_time32s(t.value_type), t.list_size)
    if pa.types.is_list(t):
        f = t.value_field
        return pa.list_(f.with_type(_coerce_time32s(f.type)))
    return t


def _slice_by_bytes(table: pa.Table, target_bytes: int) -> "list[pa.Table]":
    cum = np.cumsum(_row_byte_sizes(table))
    if not len(cum) or cum[-1] <= target_bytes:
        return [table]
    marks = np.arange(1, int(cum[-1] // target_bytes) + 1) * target_bytes
    cuts = np.unique(np.searchsorted(cum, marks, side="left") + 1)
    cuts = cuts[cuts < table.num_rows]
    bounds = [0, *cuts.tolist(), table.num_rows]
    return [table.slice(a, b - a) for a, b in zip(bounds, bounds[1:])]


def write_table(
    table: pa.Table,
    path: str,
    config: sel.EncodeConfig | None = None,
    row_group_size: int | None = None,
    encryption: "pcrypt.FileEncryption | None" = None,
    row_group_bytes: int | None = None,
    sorting_columns: "list[tuple[str, bool, bool]] | None" = None,
    key_value_metadata: "dict[str, str] | None" = None,
) -> None:
    """``row_group_size`` caps rows per group; ``row_group_bytes`` flushes
    by estimated in-memory size like the reference's 128 MiB
    DEFAULT_BLOCK_SIZE (ParquetWriter.java) — per-row exact for
    variable-length columns, so token tables with skewed list lengths get
    even groups."""
    config = config or sel.EncodeConfig()
    if getattr(config, "level_encoding", "RLE") == "BIT_PACKED":
        # parquet-java reads deprecated BIT_PACKED levels big-endian
        # (Encoding.java:155-158) but parquet-cpp/pyarrow/DuckDB read them
        # LSB-first, so such files silently misdecode everywhere but
        # parquet-java — warn loudly rather than produce them quietly
        import warnings

        warnings.warn(
            "level_encoding=BIT_PACKED writes big-endian levels "
            "(parquet-java semantics); parquet-cpp/pyarrow/DuckDB misread "
            "these files — use only for parquet-java interop testing",
            stacklevel=2,
        )
    if row_group_size is not None and row_group_size < table.num_rows:
        slices = [
            table.slice(a, row_group_size)
            for a in range(0, table.num_rows, row_group_size)
        ]
    elif row_group_bytes is not None:
        slices = _slice_by_bytes(table, row_group_bytes)
    else:
        slices = [table]
    write_tables(
        slices, path, config, encryption,
        sorting_columns=sorting_columns, key_value_metadata=key_value_metadata,
    )


def write_tables(
    slices: "list[pa.Table]",
    path: str,
    config: sel.EncodeConfig | None = None,
    encryption: "pcrypt.FileEncryption | None" = None,
    sorting_columns: "list[tuple[str, bool, bool]] | None" = None,
    key_value_metadata: "dict[str, str] | None" = None,
) -> None:
    """Write one parquet file with one row group per input table (all the
    same schema) — the row-group stitching shape of
    `rewrite/ParquetRewriter.java:99-127` merging multiple inputs.

    ``sorting_columns``: declared sort order of the rows as
    ``(leaf column name, descending, nulls_first)`` tuples, recorded as
    SortingColumn metadata on every row group (RowGroup field 4 — the
    ParquetProperties.sortingColumns surface); purely declarative, like
    the reference. ``key_value_metadata``: user FileMetaData key/value
    pairs (ParquetWriter extraMetaData)."""
    config = config or sel.EncodeConfig()
    if not slices:
        raise ValueError("write_tables needs at least one table")
    if any(not s.schema.equals(slices[0].schema) for s in slices[1:]):
        raise ValueError("all merged tables must share one schema")
    decimal_ints: dict[str, tuple[int, int]] = {}
    if getattr(config, "decimal_as_integer", False):
        # DECIMAL(p<=18) -> INT32/INT64 physical, unscaled
        # (DecimalLogicalTypeAnnotation on INT32/INT64; the reader side —
        # ours, pyarrow, DuckDB — restores decimal128 from the annotation)
        slices = [_decimals_to_ints(s, decimal_ints) for s in slices]
    int96_map: dict[str, pa.DataType] = {}
    if getattr(config, "int96_timestamps", False):
        # flat timestamps -> deprecated INT96 physical (opt-in legacy
        # interop; PrimitiveTypeName.INT96). Nested timestamps keep INT64.
        slices = [_timestamps_to_int96(s, int96_map) for s in slices]
    if any(_has_time32s(f.type) for f in slices[0].schema):
        # parquet TIME has no seconds unit — coerce time32[s] to ms up
        # front (pyarrow's write-side coercion), so stats, ARROW:schema
        # and the shredded values all agree; recursive so a seconds-unit
        # leaf nested in a struct/list/map is coerced too
        cast_schema = pa.schema(
            [f.with_type(_coerce_time32s(f.type)) for f in slices[0].schema]
        )
        slices = [s.cast(cast_schema) for s in slices]
    table = slices[0] if len(slices) == 1 else pa.concat_tables(slices)
    crypto = None
    if encryption is not None:
        aad_unique, file_aad = encryption.make_file_aad()
        crypto = (encryption, file_aad, aad_unique)
    magic = (
        pcrypt.MAGIC_ENCRYPTED
        if encryption is not None and not encryption.plaintext_footer
        else MAGIC
    )
    out = bytearray(magic)
    row_groups: list[tuple[list[_Column], int]] = []
    # ParquetFileWriter emits NO row group for zero records — drop empty
    # slices (schema-only files are valid; readers see num_rows=0)
    nonempty = [s for s in slices if s.num_rows]
    slices = nonempty or []
    for rg_ord, sl in enumerate(slices):
        cols = _write_row_group(
            sl, out, config,
            file_crypto=(crypto[0], crypto[1]) if crypto else None,
            rg_ord=rg_ord,
            int96_cols=frozenset(int96_map),
        )
        row_groups.append((cols, sl.num_rows))

    # page-index structures (column index then offset index per chunk),
    # between the last row group and the footer like ParquetFileWriter;
    # encrypted files wrap each as its own GCM module (types 6/7)
    for cols, _ in row_groups:
        for meta in cols:
            res = _page_indexes_bytes(meta)
            if res is None:
                continue
            ci_b, oi_b = res
            if meta.crypto_key is not None:
                ci_b = pcrypt.encrypt_module(
                    meta.crypto_key, ci_b,
                    pcrypt.module_aad(crypto[1], pcrypt.M_COLUMN_INDEX,
                                      meta.rg_ord, meta.col_ord),
                )
                oi_b = pcrypt.encrypt_module(
                    meta.crypto_key, oi_b,
                    pcrypt.module_aad(crypto[1], pcrypt.M_OFFSET_INDEX,
                                      meta.rg_ord, meta.col_ord),
                )
            meta.ci_offset = len(out)
            meta.ci_len = len(ci_b)
            out += ci_b
            meta.oi_offset = len(out)
            meta.oi_len = len(oi_b)
            out += oi_b

    # bloom filters after the page indexes, before the footer
    # (ParquetFileWriter.end:1878-1880 order; serializeBloomFilters:2038)
    for cols, _ in row_groups:
        for meta in cols:
            if meta.bloom is None:
                continue
            bitset = meta.bloom.bitset_bytes()
            hdr = _bloom_header_bytes(len(bitset))
            if meta.crypto_key is not None:
                hdr = pcrypt.encrypt_module(
                    meta.crypto_key, hdr,
                    pcrypt.module_aad(crypto[1], pcrypt.M_BLOOM_HEADER,
                                      meta.rg_ord, meta.col_ord),
                )
                bitset = pcrypt.encrypt_module(
                    meta.crypto_key, bitset,
                    pcrypt.module_aad(crypto[1], pcrypt.M_BLOOM_BITSET,
                                      meta.rg_ord, meta.col_ord),
                )
            meta.bloom_offset = len(out)
            out += hdr
            out += bitset
            meta.bloom_len = len(out) - meta.bloom_offset

    sorting = None
    if sorting_columns and row_groups:
        dotted = [".".join(m.path) for m in row_groups[0][0]]
        sorting = []
        for name, desc, nulls_first in sorting_columns:
            if name not in dotted:
                raise ValueError(f"sorting column {name!r} is not a leaf: {dotted}")
            sorting.append((dotted.index(name), bool(desc), bool(nulls_first)))
    footer = _file_metadata(
        table, row_groups, crypto=crypto, geo=config.geospatial or None,
        sorting=sorting, extra_kv=key_value_metadata,
        annotations=getattr(config, "logical_annotations", None) or None,
        decimal_ints=decimal_ints or None,
        int96_map=int96_map or None,
    )
    if encryption is None:
        out += footer
        out += len(footer).to_bytes(4, "little")
        out += MAGIC
    elif encryption.plaintext_footer:
        # signed plaintext footer: footer bytes + 28-byte nonce/tag signature
        footer_aad = pcrypt.module_aad(crypto[1], pcrypt.M_FOOTER)
        sig = pcrypt.gcm_signature(encryption.footer_key, footer, footer_aad)
        out += footer
        out += sig
        out += (len(footer) + len(sig)).to_bytes(4, "little")
        out += MAGIC
    else:
        # encrypted footer: plaintext FileCryptoMetaData, then the footer as
        # a GCM module; combined length + PARE (serializeFooter:2162-2170)
        cw = _W()
        _emit_encryption_algorithm(cw, 1, encryption, crypto[2])
        if encryption.footer_key_metadata:
            cw.binary(2, encryption.footer_key_metadata)
        crypto_md = cw.stop()
        footer_aad = pcrypt.module_aad(crypto[1], pcrypt.M_FOOTER)
        enc_footer = pcrypt.encrypt_module(
            encryption.footer_key, footer, footer_aad
        )
        out += crypto_md
        out += enc_footer
        out += (len(crypto_md) + len(enc_footer)).to_bytes(4, "little")
        out += pcrypt.MAGIC_ENCRYPTED
    with open(path, "wb") as f:
        f.write(out)


def _degrade_fsl(t: "pa.DataType") -> "pa.DataType":
    """fixed_size_list -> list and dictionary -> value type for the embedded
    schema: the parquet data is 3-level lists (null slots have zero
    elements) / plain values, which arrow readers cannot restore directly
    (dictionary restoration trips pyarrow's DictAccumulator on non-dict
    page encodings)."""
    if pa.types.is_dictionary(t):
        return _degrade_fsl(t.value_type)
    if pa.types.is_fixed_size_list(t):
        return pa.list_(_degrade_fsl(t.value_type))
    if pa.types.is_list(t):
        return pa.list_(_degrade_fsl(t.value_type))
    if pa.types.is_large_list(t):
        return pa.large_list(_degrade_fsl(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _degrade_fsl(f.type), f.nullable) for f in t]
        )
    if pa.types.is_map(t):
        return pa.map_(_degrade_fsl(t.key_type), _degrade_fsl(t.item_type))
    return t


def _arrow_schema_b64(schema: pa.Schema) -> str:
    """Serialized arrow schema (IPC stream framing + base64), the
    ARROW:schema convention arrow readers use to restore logical types."""
    import base64

    import pyarrow.ipc as ipc

    schema = pa.schema(
        [pa.field(f.name, _degrade_fsl(f.type), f.nullable) for f in schema]
    )
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, schema):
        pass
    return base64.b64encode(sink.getvalue().to_pybytes()).decode()


def _decimal_flba_len(precision: int) -> int:
    L = 1
    while 10 ** precision > 2 ** (8 * L - 1):
        L += 1
    return L


def _schema_body(field: pa.Field) -> list[dict]:
    """SchemaElement dicts for one (possibly nested) field, depth-first in the
    same order `_dremel_leaves` emits leaves (MessageType tree of
    `schema/MessageType.java`, LIST/MAP shapes per the parquet logical-type
    spec / `parquet-arrow List3Levels.java`)."""
    t = field.type
    if pa.types.is_dictionary(t):
        t = t.value_type  # shredded as the value type
    rep = 1 if field.nullable else 0
    name = field.name
    if pa.types.is_map(t):
        return (
            [{"name": name, "rep": rep, "children": 1, "converted": 1},  # MAP
             {"name": "key_value", "rep": 2, "children": 2}]
            + _schema_body(pa.field("key", t.key_type, False))
            + _schema_body(pa.field("value", t.item_type, True))
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        elem = t.value_field
        return (
            [{"name": name, "rep": rep, "children": 1, "converted": 3},  # LIST
             {"name": "list", "rep": 2, "children": 1}]
            + _schema_body(pa.field("element", t.value_type, elem.nullable))
        )
    if pa.types.is_struct(t):
        out = [{"name": name, "rep": rep, "children": t.num_fields}]
        for child in t:
            out += _schema_body(child)
        return out
    from .schema import physical_type

    ptype = physical_type(t)
    e = {"name": name, "type": _PARQUET_TYPE[ptype], "rep": rep}
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        e["type_length"] = (
            _decimal_flba_len(t.precision) if pa.types.is_decimal(t) else t.byte_width
        )
    conv = _converted_type(t)
    if conv is not None:
        e["converted"] = conv
    if pa.types.is_decimal(t):
        e["precision"], e["scale"] = t.precision, t.scale
    logical = _logical_type(t)
    if logical is not None:
        e["logical"] = logical
    return [e]


def _emit_column_meta_fields(cc: _W, meta: _Column, redact: bool = False) -> None:
    """ColumnMetaData fields (parquet.thrift), written into an open struct.
    ``redact`` drops Statistics and PageEncodingStats — the plaintext copy
    kept next to an encrypted column in plaintext-footer files
    (ParquetMetadataConverter.java:687-692)."""
    cc.i(1, _PARQUET_TYPE[meta.ptype])
    cc.begin_list(2, 5, len(meta.encodings) + 1)
    for enc in sorted(meta.encodings):
        _wvarint(cc.out, _zigzag(enc))
    _wvarint(cc.out, _zigzag(ENC_RLE))  # levels
    cc.begin_list(3, 8, len(meta.path))
    for part in meta.path:
        _wvarint(cc.out, len(part.encode()))
        cc.out += part.encode()
    cc.i(4, meta.codec)
    cc.i64(5, meta.num_values)
    cc.i64(6, meta.total_unc)
    cc.i64(7, meta.total_bytes)
    cc.i64(9, meta.data_offset)
    if meta.dict_offset is not None:
        cc.i64(11, meta.dict_offset)
    if not redact and (meta.min_bytes is not None or meta.null_count):
        cc.begin_struct(12)  # Statistics
        cc.i64(3, meta.null_count)
        if meta.max_bytes is not None:
            cc.binary(5, meta.max_bytes)
            cc.binary(6, meta.min_bytes)
            cc.boolean(7, meta.stats_exact)  # is_max_value_exact
            cc.boolean(8, meta.stats_exact)  # is_min_value_exact
        cc.end_struct()
    if not redact and meta.page_stats:
        cc.begin_list(13, 12, len(meta.page_stats))  # encoding_stats
        for (pt, enc), cnt in sorted(meta.page_stats.items()):
            pes = _W()
            pes.i(1, pt)
            pes.i(2, enc)
            pes.i(3, cnt)
            cc.out += pes.stop()
    if meta.bloom_offset is not None:
        cc.i64(14, meta.bloom_offset)  # bloom_filter_offset
        cc.i(15, meta.bloom_len)  # bloom_filter_length
    if (
        meta.rep_hist is not None
        or meta.def_hist is not None
        or meta.unenc_bytes is not None
    ):
        cc.begin_struct(16)  # SizeStatistics
        if meta.unenc_bytes is not None:
            cc.i64(1, meta.unenc_bytes)
        for fid, hist in ((2, meta.rep_hist), (3, meta.def_hist)):
            if hist is not None:
                cc.begin_list(fid, 6, len(hist))
                for h in hist:
                    _wvarint(cc.out, _zigzag(int(h)))
        cc.end_struct()
    if not redact and meta.geo is not None:
        from . import geo as geo_mod

        gd = geo_mod.to_footer_dict(meta.geo)
        if gd is not None:
            cc.begin_struct(17)  # GeospatialStatistics
            if 1 in gd:
                cc.begin_struct(1)  # BoundingBox
                for fid in sorted(gd[1]):
                    cc.dbl(fid, gd[1][fid])
                cc.end_struct()
            if 2 in gd:
                cc.begin_list(2, 5, len(gd[2]))  # geospatial_types
                for code in gd[2]:
                    _wvarint(cc.out, _zigzag(code))
            cc.end_struct()


def _emit_encryption_algorithm(
    w: _W, fid: int, props: "pcrypt.FileEncryption", aad_file_unique: bytes
) -> None:
    """EncryptionAlgorithm union: AesGcmV1 (member 1) or AesGcmCtrV1
    (member 2, same field shape)."""
    w.begin_struct(fid)
    w.begin_struct(2 if props.algorithm == "AES_GCM_CTR_V1" else 1)
    if props.aad_prefix is not None and props.store_aad_prefix:
        w.binary(1, props.aad_prefix)
    w.binary(2, aad_file_unique)
    if props.aad_prefix is not None and not props.store_aad_prefix:
        w.boolean(3, True)  # supply_aad_prefix
    w.end_struct()
    w.end_struct()


def _emit_schema_elem(w: "_W", e: dict) -> None:
    """One SchemaElement from the _schema_body dict shape."""
    ew = _W()
    if "type" in e:
        ew.i(1, e["type"])
    if "type_length" in e:
        ew.i(2, e["type_length"])
    if "rep" in e:
        ew.i(3, e["rep"])
    ew.string(4, e["name"])
    if "children" in e:
        ew.i(5, e["children"])
    if e.get("converted") is not None:
        ew.i(6, e["converted"])
    if "scale" in e:
        ew.i(7, e["scale"])
        ew.i(8, e["precision"])
    if e.get("logical") is not None:
        e["logical"](ew)
    if e.get("geo") is not None:
        spec = e["geo"]
        ew.begin_struct(10)  # logicalType
        ew.begin_struct(17 if spec.kind == "geometry" else 18)
        if spec.crs:
            ew.string(1, spec.crs)
        if spec.kind == "geography" and spec.algorithm is not None:
            ew.i(2, spec.algorithm)  # EdgeInterpolationAlgorithm
        ew.end_struct()
        ew.end_struct()
    w.out += ew.stop()


# declared annotations (EncodeConfig.logical_annotations): name ->
# (required physical type or None, ConvertedType or None, LogicalType union
# field or None).  The LogicalTypeAnnotation.java members with no arrow-16
# native type: enumType/jsonType/bsonType/uuidType/intervalType.
_DECLARED_LOGICAL = {
    "ENUM": (T_BYTE_ARRAY, 4, 4),
    "JSON": (T_BYTE_ARRAY, 19, 12),
    "BSON": (T_BYTE_ARRAY, 20, 13),
    "UUID": (T_FLBA, None, 14),
    "INTERVAL": (T_FLBA, 21, None),
}


def _apply_declared_annotation(fb: list, name: str, kind: str) -> None:
    if kind not in _DECLARED_LOGICAL:
        raise ValueError(f"unknown logical annotation {kind!r} for {name}")
    if len(fb) != 1 or "type" not in fb[0]:
        raise ValueError(f"logical annotation {kind} needs a flat leaf: {name}")
    e = fb[0]
    want_phys, conv, logical_field = _DECLARED_LOGICAL[kind]
    if e["type"] != want_phys:
        raise ValueError(
            f"{kind} annotation on {name} requires physical type "
            f"{'FLBA' if want_phys == T_FLBA else 'BYTE_ARRAY'}"
        )
    if kind == "UUID" and e.get("type_length") != 16:
        raise ValueError(f"UUID column {name} must be fixed_size_binary(16)")
    if kind == "INTERVAL" and e.get("type_length") != 12:
        raise ValueError(f"INTERVAL column {name} must be fixed_size_binary(12)")
    if conv is not None:
        e["converted"] = conv
    else:
        e.pop("converted", None)
    if logical_field is not None:
        def emit_declared(w: "_W", f=logical_field):
            w.begin_struct(10)  # logicalType
            w.begin_struct(f)  # empty-struct union member
            w.end_struct()
            w.end_struct()

        e["logical"] = emit_declared
    else:
        e["logical"] = None


def _decimals_to_ints(table: pa.Table, decimal_ints: dict) -> pa.Table:
    """Replace flat decimal128(p<=18) columns with their unscaled INT32/
    INT64 storage, recording {name: (precision, scale)} for the footer."""
    import numpy as np

    cols, fields = [], []
    for i, f in enumerate(table.schema):
        col = table.column(i)
        t = f.type
        if pa.types.is_decimal128(t) and t.precision <= 18:
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            raw = np.frombuffer(arr.buffers()[1], np.int64)
            lo = raw.reshape(-1, 2)[arr.offset : arr.offset + len(arr), 0]
            out_t = pa.int32() if t.precision <= 9 else pa.int64()
            ints = pa.array(
                lo.astype(np.int32) if out_t == pa.int32() else lo, out_t
            )
            if arr.null_count:
                import pyarrow.compute as pc

                ints = pc.if_else(arr.is_valid(), ints, pa.scalar(None, out_t))
            decimal_ints[f.name] = (t.precision, t.scale)
            cols.append(ints)
            fields.append(pa.field(f.name, out_t, f.nullable))
        else:
            cols.append(col)
            fields.append(f)
    return pa.table(cols, schema=pa.schema(fields))


_NS_PER_DAY = 86_400_000_000_000
_JULIAN_EPOCH = 2440588  # Julian day number of 1970-01-01


def _timestamps_to_int96(table: pa.Table, int96_map: dict) -> pa.Table:
    """Replace flat timestamp columns with their 12-byte INT96 storage
    ([int64 LE nanos-of-day][int32 LE Julian day] — the layout
    ``parquet_compat.int96_to_timestamp_ns`` inverts), recording
    {name: original arrow type} for the footer's ARROW:schema."""
    import numpy as np
    import pyarrow.compute as pc

    cols, fields = [], []
    for i, f in enumerate(table.schema):
        col = table.column(i)
        t = f.type
        if not pa.types.is_timestamp(t):
            cols.append(col)
            fields.append(f)
            continue
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ns = arr.cast(pa.timestamp("ns", tz=t.tz)).cast(pa.int64())
        total = pc.fill_null(ns, 0).to_numpy()
        # floor div/mod keep nanos-of-day non-negative for pre-1970 values
        v = np.empty((len(arr), 12), np.uint8)
        v[:, :8] = (total % _NS_PER_DAY).astype("<i8").view(np.uint8).reshape(-1, 8)
        v[:, 8:] = (
            (total // _NS_PER_DAY + _JULIAN_EPOCH)
            .astype("<i4")
            .view(np.uint8)
            .reshape(-1, 4)
        )
        fsb = pa.Array.from_buffers(
            pa.binary(12), len(arr), [None, pa.py_buffer(v.tobytes())]
        )
        if arr.null_count:
            fsb = pc.if_else(arr.is_valid(), fsb, pa.scalar(None, pa.binary(12)))
        int96_map[f.name] = t
        cols.append(fsb)
        fields.append(pa.field(f.name, pa.binary(12), f.nullable))
    return pa.table(cols, schema=pa.schema(fields))


def _file_metadata(
    table: pa.Table, row_groups, crypto=None, geo=None,
    sorting=None, extra_kv=None, annotations=None, decimal_ints=None,
    int96_map=None,
) -> bytes:
    w = _W()
    w.i(1, 2)  # version

    body: list[dict] = []
    for field in table.schema:
        fb = _schema_body(field)
        # GEOMETRY/GEOGRAPHY logical type on flat binary leaves
        # (LogicalTypeAnnotation geometry/geography; union fields 17/18)
        if geo and field.name in geo and len(fb) == 1 and "type" in fb[0]:
            fb[0]["geo"] = geo[field.name]
        if annotations and field.name in annotations:
            _apply_declared_annotation(fb, field.name, annotations[field.name])
        if decimal_ints and field.name in decimal_ints and len(fb) == 1:
            p, s = decimal_ints[field.name]
            fb[0]["converted"] = 5  # DECIMAL on INT32/INT64 physical
            fb[0]["precision"], fb[0]["scale"] = p, s
        if int96_map and field.name in int96_map and len(fb) == 1:
            # deprecated INT96 physical: no type_length, no logical type
            fb[0]["type"] = T_INT96
            for k in ("type_length", "converted", "logical"):
                fb[0].pop(k, None)
        body += fb
    elems = [{"name": "schema", "children": table.num_columns}] + body

    w.begin_list(2, 12, len(elems))
    for e in elems:
        _emit_schema_elem(w, e)
    w.i64(3, table.num_rows)

    w.begin_list(4, 12, len(row_groups))
    kv_schema = table.schema
    if decimal_ints:
        # advertise the original decimal arrow types, not the transformed
        # int storage — pyarrow restores decimal128 from this metadata
        kv_schema = pa.schema(
            [
                f.with_type(pa.decimal128(*decimal_ints[f.name]))
                if f.name in decimal_ints
                else f
                for f in kv_schema
            ]
        )
    if int96_map:
        # advertise the original timestamp types: pyarrow reads INT96 as
        # timestamp[ns] and restores unit/tz from this metadata
        kv_schema = pa.schema(
            [
                f.with_type(int96_map[f.name]) if f.name in int96_map else f
                for f in kv_schema
            ]
        )
    kv_pairs = [("ARROW:schema", _arrow_schema_b64(kv_schema))]
    if extra_kv:
        kv_pairs += list(extra_kv.items())
    for columns, rg_rows in row_groups:
        rg = _W()
        rg.begin_list(1, 12, len(columns))
        for meta in columns:
            cc = _W()
            cc.i64(2, meta.start_offset)  # file_offset
            # column-key columns (and every encrypted column when the footer
            # is plaintext) carry their ColumnMetaData separately encrypted
            # in field 9 (ParquetMetadataConverter.java:664-693); plaintext
            # footers keep a redacted copy with stats stripped
            encrypt_md = meta.crypto_key is not None and (
                meta.uses_col_key or (crypto is not None and crypto[0].plaintext_footer)
            )
            if not encrypt_md:
                cc.begin_struct(3)
                _emit_column_meta_fields(cc, meta)
                cc.end_struct()
            elif crypto is not None and crypto[0].plaintext_footer:
                cc.begin_struct(3)
                _emit_column_meta_fields(cc, meta, redact=True)
                cc.end_struct()
            if meta.oi_offset is not None:
                cc.i64(4, meta.oi_offset)
                cc.i(5, meta.oi_len)
                cc.i64(6, meta.ci_offset)
                cc.i(7, meta.ci_len)
            if meta.crypto_key is not None:
                props, file_aad = crypto[0], crypto[1]
                cc.begin_struct(8)  # ColumnCryptoMetaData union
                if meta.uses_col_key:
                    cc.begin_struct(2)  # ENCRYPTION_WITH_COLUMN_KEY
                    cc.begin_list(1, 8, len(meta.path))
                    for part in meta.path:
                        _wvarint(cc.out, len(part.encode()))
                        cc.out += part.encode()
                    km = props.column_key_metadata.get(".".join(meta.path))
                    if km:
                        cc.binary(2, km)
                    cc.end_struct()
                else:
                    cc.begin_struct(1)  # ENCRYPTION_WITH_FOOTER_KEY (empty)
                    cc.end_struct()
                cc.end_struct()
                if encrypt_md:
                    mw = _W()
                    _emit_column_meta_fields(mw, meta)
                    aad = pcrypt.module_aad(
                        file_aad, pcrypt.M_COLUMN_METADATA,
                        meta.rg_ord, meta.col_ord,
                    )
                    cc.binary(
                        9, pcrypt.encrypt_module(meta.crypto_key, mw.stop(), aad)
                    )
            rg.out += cc.stop()
        rg.i64(2, sum(m.total_unc for m in columns))  # spec: UNCOMPRESSED size
        rg.i64(3, rg_rows)
        if sorting:
            # SortingColumn list (parquet.thrift RowGroup field 4; written
            # by ParquetFileWriter from ParquetProperties.sortingColumns)
            rg.begin_list(4, 12, len(sorting))
            for leaf_idx, desc, nulls_first in sorting:
                sc = _W()
                sc.i(1, leaf_idx)
                sc.boolean(2, desc)
                sc.boolean(3, nulls_first)
                rg.out += sc.stop()
        w.out += rg.stop()
    # ARROW:schema key-value metadata: readers restore the exact arrow types
    # (fixed-size lists, timestamp timezones) like pyarrow's own files
    w.begin_list(5, 12, len(kv_pairs))
    for key, val in kv_pairs:
        kv = _W()
        kv.string(1, key)
        kv.string(2, val)
        w.out += kv.stop()
    w.string(6, "rayenc 0.1")
    # column_orders: readers only honor min_value/max_value when the order
    # is declared TYPE_DEFINED_ORDER (parquet.thrift ColumnOrder union)
    num_leaves = len(row_groups[0][0]) if row_groups else 0
    if num_leaves:
        w.begin_list(7, 12, num_leaves)
        for _ in range(num_leaves):
            co = _W()
            co.begin_struct(1)  # TYPE_ORDER (empty struct)
            co.end_struct()
            w.out += co.stop()
    if crypto is not None and crypto[0].plaintext_footer:
        # plaintext-footer encrypted file: algorithm + signing-key metadata
        # live in FileMetaData itself (serializeFooter:2127-2134)
        props, _, aad_unique = crypto
        _emit_encryption_algorithm(w, 8, props, aad_unique)
        if props.footer_key_metadata:
            w.binary(9, props.footer_key_metadata)
    return w.stop()
