"""Read real parquet pages with rayenc decoders (format conformance).

SURVEY.md §5(c): cross-validation against parquet-format ground truth — pages
written by an independent implementation (pyarrow's C++ writer, configured
with explicit column encodings) are parsed and decoded by OUR kernels, which
proves byte-level compatibility with the formats the reference emits
(`Encoding.java:62-256` dispatch; page layout `ColumnWriterV1.java:61-81`).

Only the page-level plumbing lives here: a minimal thrift *compact protocol*
struct reader (the parquet PageHeader is compact-thrift,
`parquet-format-structures`), the V1/V2 data-page layout (rep/def levels +
values), and the encoding dispatch into rayenc.codecs. Column chunk offsets
come from pyarrow's own metadata API — we only refuse to use its value
decoders.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from .codecs import (
    bytestream_split,
    delta_bp,
    delta_length,
    delta_strings,
    plain,
    rle_hybrid,
)
from .codecs.varint import read_uvarint

# parquet-format Encoding enum
PLAIN = 0
PLAIN_DICTIONARY = 2
RLE = 3
BIT_PACKED = 4  # deprecated big-endian level encoding
DELTA_BINARY_PACKED = 5
DELTA_LENGTH_BYTE_ARRAY = 6
DELTA_BYTE_ARRAY = 7
RLE_DICTIONARY = 8
BYTE_STREAM_SPLIT = 9

DATA_PAGE = 0
INDEX_PAGE = 1
DICTIONARY_PAGE = 2
DATA_PAGE_V2 = 3


# --------------------------------------------------- thrift compact protocol


def _read_zigzag(buf, i):
    u, i = read_uvarint(buf, i)
    return (u >> 1) ^ -(u & 1), i


def _skip_field(buf, i, ftype):
    if ftype in (1, 2):  # bool true/false encoded in the type nibble
        return i
    if ftype == 3:  # byte
        return i + 1
    if ftype in (4, 5, 6):  # i16/i32/i64 zigzag varint
        _, i = read_uvarint(buf, i)
        return i
    if ftype == 7:  # double
        return i + 8
    if ftype == 8:  # binary
        ln, i = read_uvarint(buf, i)
        return i + ln
    if ftype in (9, 10):  # list/set
        head = buf[i]
        i += 1
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size, i = read_uvarint(buf, i)
        for _ in range(size):
            i = _skip_field(buf, i, etype)
        return i
    if ftype == 12:  # struct
        _, i = _read_struct(buf, i)
        return i
    raise ValueError(f"unsupported thrift compact type {ftype}")


def _read_struct(buf, i):
    """Parse a compact-protocol struct -> ({field_id: value}, next_offset).
    Values kept for ints/bools/structs; other types skipped."""
    fields = {}
    last_id = 0
    while True:
        byte = buf[i]
        i += 1
        if byte == 0:  # stop
            return fields, i
        delta = byte >> 4
        ftype = byte & 0x0F
        if delta == 0:
            fid_z, i = _read_zigzag(buf, i)
            fid = int(fid_z)
        else:
            fid = last_id + delta
        last_id = fid
        if ftype == 1:
            fields[fid] = True
        elif ftype == 2:
            fields[fid] = False
        elif ftype in (4, 5, 6):
            v, i = _read_zigzag(buf, i)
            fields[fid] = int(v)
        elif ftype == 12:
            v, i = _read_struct(buf, i)
            fields[fid] = v
        else:
            i = _skip_field(buf, i, ftype)
    return fields, i


@dataclass
class PageHeader:
    type: int
    uncompressed_size: int
    compressed_size: int
    num_values: int
    encoding: int
    def_level_encoding: int | None = None
    rep_level_encoding: int | None = None
    v2_def_bytes: int = 0
    v2_rep_bytes: int = 0
    v2_is_compressed: bool = True
    v2_num_nulls: int = 0
    v2_num_rows: int = 0
    header_len: int = 0
    crc: int | None = None


def read_page_header(buf, i=0) -> PageHeader:
    fields, end = _read_struct(buf, i)
    ptype = fields[1]
    h = PageHeader(
        type=ptype,
        uncompressed_size=fields[2],
        compressed_size=fields[3],
        num_values=0,
        encoding=PLAIN,
        header_len=end - i,
        crc=fields.get(4),
    )
    if ptype == DATA_PAGE:
        d = fields[5]
        h.num_values = d[1]
        h.encoding = d[2]
        h.def_level_encoding = d[3]
        h.rep_level_encoding = d.get(4)
    elif ptype == DICTIONARY_PAGE:
        d = fields[7]
        h.num_values = d[1]
        h.encoding = d[2]
    elif ptype == DATA_PAGE_V2:
        d = fields[8]
        h.num_values = d[1]
        h.encoding = d[4]
        h.v2_def_bytes = d[5]
        h.v2_rep_bytes = d[6]
        h.v2_is_compressed = d.get(7, True)
        h.v2_num_nulls = d.get(2, 0)
        h.v2_num_rows = d.get(3, h.num_values)
    return h


# ------------------------------------------------------------- page decoding

_PHYS = {"INT32": "INT32", "INT64": "INT64", "FLOAT": "FLOAT", "DOUBLE": "DOUBLE"}


def read_column_chunk(path: str, column: str, row_group: int = 0,
                      raw_levels: bool = False):
    """Decode one flat column chunk of an (uncompressed) parquet file using
    ONLY rayenc decoders for levels and values. Returns a numpy array for
    fixed types or (offsets, data) for BYTE_ARRAY."""
    f = pq.ParquetFile(path)
    meta = f.metadata.row_group(row_group)
    col_idx = None
    for ci in range(meta.num_columns):
        if meta.column(ci).path_in_schema == column:
            col_idx = ci
            break
    assert col_idx is not None, column
    cmeta = meta.column(col_idx)
    schema_col = f.schema.column(col_idx)
    max_def = schema_col.max_definition_level
    max_rep = schema_col.max_repetition_level
    type_length = getattr(schema_col, "length", 0) or 0
    codec = None
    if cmeta.compression != "UNCOMPRESSED":
        import pyarrow as pa

        name = cmeta.compression.lower()
        # pyarrow's metadata API has no name for LZ4_HADOOP (codec id 5)
        # and reports "UNKNOWN"; only that codec maps to it in this pyarrow
        if name in ("lz4", "unknown"):
            # legacy codec id 5: Hadoop-framed (parquet-mr) or raw-block
            # (old parquet-cpp) dialect — Lz4HadoopCodec handles both
            from .codecs.lz4hadoop import Lz4HadoopCodec

            codec = Lz4HadoopCodec()
        elif name == "lzo":
            # legacy codec id 3: Hadoop framing around raw LZO1X blocks —
            # clean-room decoder (codecs/lzo.py), same framing as LZ4
            from .codecs.lzo import LzoHadoopCodec

            codec = LzoHadoopCodec()
        else:
            codec = pa.Codec(name)
    ptype = cmeta.physical_type
    start = cmeta.dictionary_page_offset
    if start is None or start < 0:
        start = cmeta.data_page_offset
    total = cmeta.total_compressed_size

    with open(path, "rb") as fh:
        fh.seek(start)
        raw = np.frombuffer(fh.read(total), np.uint8)

    return _decode_page_stream(
        _plain_page_iter(raw, cmeta.num_values, path, column),
        cmeta.num_values, max_rep, max_def, ptype, type_length, codec,
        raw_levels=raw_levels,
    )


def _plain_page_iter(raw, num_values, path="", column=""):
    """Yield (PageHeader, body) pairs from an unencrypted page stream,
    verifying page CRCs (ParquetFileWriter CRC semantics: CRC-32 over the
    on-disk page body)."""
    pos = 0
    remaining = num_values
    while remaining > 0 and pos < len(raw):
        h = read_page_header(raw, pos)
        body = raw[pos + h.header_len : pos + h.header_len + h.compressed_size]
        pos += h.header_len + h.compressed_size
        if h.crc is not None:
            import zlib

            if zlib.crc32(body.tobytes()) != (h.crc & 0xFFFFFFFF):
                raise ValueError(
                    f"page CRC mismatch in {path!r} column {column!r}"
                )
        yield h, body
        if h.type != DICTIONARY_PAGE:
            remaining -= h.num_values


def _decode_page_stream(
    pages, num_values, max_rep, max_def, ptype, type_length, codec,
    raw_levels: bool = False,
):
    """Decode a stream of (PageHeader, body) pairs — the shared half of
    read_column_chunk, also fed by the modular-encryption page decryptor
    (rayenc.parquet_read_enc), whose bodies arrive already decrypted."""
    from .codecs.bitpack import bit_width32

    w_rep = bit_width32(max_rep)
    w_def = bit_width32(max_def)
    remaining = num_values
    dictionary = None
    out_parts = []
    level_parts = []
    rep_parts = []
    for h, body in pages:
        if remaining <= 0:
            break
        if codec is not None:
            if h.type == DATA_PAGE_V2:
                if not h.v2_is_compressed:
                    pass  # spec allows per-page opt-out (field 7)
                else:
                    # V2: rep/def levels sit uncompressed before the body
                    lv = h.v2_rep_bytes + h.v2_def_bytes
                    payload = codec.decompress(
                        body[lv:].tobytes(), h.uncompressed_size - lv
                    )
                    body = np.concatenate(
                        [body[:lv], np.frombuffer(payload, np.uint8)]
                    )
            else:
                body = np.frombuffer(
                    codec.decompress(body.tobytes(), h.uncompressed_size), np.uint8
                )
        if h.type == DICTIONARY_PAGE:
            dictionary = _decode_plain(body, h.num_values, ptype, type_length)
            continue
        if h.type == DATA_PAGE:
            # V1 layout: [rep levels: framed RLE][def levels: framed RLE]
            # [values]; REQUIRED flat columns (max levels == 0) omit levels
            body_v = body
            nvals = h.num_values
            if max_rep > 0:
                if h.rep_level_encoding == BIT_PACKED:
                    from .codecs.bitpack import unpack_msb

                    nb = (h.num_values * w_rep + 7) // 8
                    rep_parts.append(unpack_msb(body_v[:nb], h.num_values, w_rep))
                    body_v = body_v[nb:]
                else:
                    rlv, consumed = rle_hybrid.decode_framed(
                        body_v, h.num_values, w_rep
                    )
                    rep_parts.append(rlv)
                    body_v = body_v[consumed:]
            if max_def > 0 and h.def_level_encoding == RLE:
                levels, consumed = rle_hybrid.decode_framed(
                    body_v, h.num_values, w_def
                )
                level_parts.append(levels)
                nvals = int((levels == max_def).sum())  # nulls hold no value slot
                body_v = body_v[consumed:]
            elif max_def > 0 and h.def_level_encoding == BIT_PACKED:
                # deprecated big-endian level encoding (unframed; legacy
                # parquet-java files)
                from .codecs.bitpack import unpack_msb

                nbytes = (h.num_values * w_def + 7) // 8
                levels = unpack_msb(body_v[:nbytes], h.num_values, w_def)
                level_parts.append(levels)
                nvals = int((levels == max_def).sum())
                body_v = body_v[nbytes:]
            out_parts.append(
                _decode_values(body_v, nvals, h.encoding, ptype, dictionary, type_length)
            )
        elif h.type == DATA_PAGE_V2:
            nvals = h.num_values
            if max_rep > 0 and h.v2_rep_bytes:
                rep_parts.append(
                    rle_hybrid.decode(body[: h.v2_rep_bytes], h.num_values, w_rep)
                )
            if max_def > 0 and h.v2_def_bytes:
                levels = rle_hybrid.decode(
                    body[h.v2_rep_bytes : h.v2_rep_bytes + h.v2_def_bytes],
                    h.num_values,
                    w_def,
                )
                level_parts.append(levels)
                nvals = int((levels == max_def).sum())
            body_v = body[h.v2_rep_bytes + h.v2_def_bytes :]
            out_parts.append(
                _decode_values(body_v, nvals, h.encoding, ptype, dictionary, type_length)
            )
        remaining -= h.num_values
    values = _concat_parts(out_parts, ptype)
    if raw_levels:
        rep = np.concatenate(rep_parts) if rep_parts else None
        deflev = np.concatenate(level_parts) if level_parts else None
        return values, rep, deflev
    if max_rep > 0:
        rep = np.concatenate(rep_parts) if rep_parts else np.zeros(0, np.uint32)
        deflev = (
            np.concatenate(level_parts)
            if level_parts
            else np.full(len(rep), max_def, np.uint32)
        )
        return values, rep, deflev  # (dense values, rep levels, def levels)
    if level_parts:
        levels = np.concatenate(level_parts)
        valid = levels == max_def
        if not valid.all():
            return values, valid  # (dense values, validity)
    return values


def int96_to_timestamp_ns(vals: np.ndarray) -> np.ndarray:
    """Convert decoded INT96 rows (n, 12 bytes) to int64 epoch nanoseconds
    (nanos-in-day + Julian day, the deprecated Spark/Impala layout)."""
    v = np.ascontiguousarray(vals, np.uint8)
    nanos = v[:, :8].copy().view(np.int64).reshape(-1)
    julian = v[:, 8:12].copy().view(np.int32).reshape(-1).astype(np.int64)
    return (julian - 2440588) * 86_400_000_000_000 + nanos


def read_list_column(path: str, field_name: str, row_group: int = 0):
    """Decode a one-level list column (the 3-level LIST shape of
    `parquet-arrow/.../schema/List3Levels.java`) from real rep/def levels
    using rayenc decoders only; returns a pa.ListArray equal to pyarrow's
    read. Handles null lists, empty lists and null elements."""
    import pyarrow as pa

    f = pq.ParquetFile(path)
    arrow_field = f.schema_arrow.field(field_name)
    t = arrow_field.type
    assert pa.types.is_list(t) or pa.types.is_large_list(t), t
    # locate the leaf path ("name.list.element" / legacy namings)
    leaf = None
    meta = f.metadata.row_group(row_group)
    for ci in range(meta.num_columns):
        p = meta.column(ci).path_in_schema
        if p.split(".")[0] == field_name:
            leaf = p
            break
    assert leaf is not None, field_name
    sc = f.schema.column([c.path_in_schema for c in
                          (meta.column(i) for i in range(meta.num_columns))
                          ].index(leaf))
    max_def = sc.max_definition_level
    vals, rep, deflev = read_column_chunk(path, leaf, row_group)
    return assemble_list(vals, rep, deflev, arrow_field, max_def)


def assemble_list(vals, rep, deflev, arrow_field, max_def):
    """Rebuild a one-level list array from decoded dense values + levels
    (shared by the plaintext and modular-encryption read paths)."""
    import pyarrow as pa

    t = arrow_field.type
    d_list = 1 if arrow_field.nullable else 0
    d_nonempty = d_list + 1
    n_rec = int((rep == 0).sum())
    rec_id = np.cumsum(rep == 0) - 1
    elem_slot = deflev >= d_nonempty
    counts = np.bincount(rec_id[elem_slot], minlength=n_rec)
    offsets = np.zeros(n_rec + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    elem_def = deflev[elem_slot]
    elem_valid = elem_def == max_def
    # child array: dense decoded values scattered over element slots
    n_elem = int(elem_slot.sum())
    take = np.full(n_elem, -1, np.int64)
    take[elem_valid] = np.arange(int(elem_valid.sum()))
    take_arr = pa.array(take, pa.int64(), mask=take < 0)
    elem_t = t.value_type
    if isinstance(vals, tuple):  # BYTE_ARRAY
        from .codecs.dictionary import binary_array

        dense = binary_array(*vals)
        if not pa.types.is_string(elem_t) and not pa.types.is_large_string(elem_t):
            dense = dense.cast(pa.large_binary())
    else:
        v = np.asarray(vals)
        dense = pa.array(v.reshape(len(v), -1).tolist()) if v.ndim == 2 else pa.array(v)
    child = dense.take(take_arr).cast(elem_t)
    rec_first_def = deflev[rep == 0]
    mask = pa.array(rec_first_def < d_list) if d_list else None
    out = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), child, mask=mask)
    return out.cast(t)


def assemble_flat(r, t):
    """read_column_chunk result for a flat column + arrow type -> pa.Array
    (nulls restored, logical type cast applied). Shared with the
    modular-encryption read path."""
    import pyarrow as pa

    from .schema import _restore_nulls

    mask = None
    if isinstance(r, tuple) and len(r) == 2 and r[1].dtype == bool:
        r, valid = r
        mask = ~valid
    if pa.types.is_decimal(t):
        arr = _decimal_dense(np.asarray(r), t)
        return _restore_nulls(arr, mask, t)
    if isinstance(r, tuple):  # BYTE_ARRAY
        from .codecs.dictionary import binary_array

        arr = binary_array(*r)
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            arr = arr.cast(pa.large_binary())
    else:
        v = np.asarray(r)
        if v.ndim == 2 and v.shape[1] == 12 and pa.types.is_timestamp(t):
            arr = pa.array(int96_to_timestamp_ns(v), pa.timestamp("ns"))
        elif v.ndim == 2 and pa.types.is_float16(t):
            # FLOAT16 logical type: FLBA(2) bytes ARE little-endian halves
            arr = pa.array(np.ascontiguousarray(v).view("<f2").ravel())
        elif v.ndim == 2:
            arr = pa.array([bytes(row) for row in v], pa.binary(v.shape[1]))
        elif pa.types.is_temporal(t):
            arr = pa.array(v, pa.int64() if v.dtype == np.int64 else pa.int32())
        elif pa.types.is_boolean(t):
            arr = pa.array(v.astype(bool))
        elif pa.types.is_unsigned_integer(t) and v.dtype.kind == "i":
            # UINT logical types store the same bit pattern in signed
            # physical ints — reassemble by view, not value cast
            arr = pa.array(v.view(v.dtype.str.replace("i", "u")))
        else:
            arr = pa.array(v)
    arr = _restore_nulls(arr, mask, arr.type)
    return arr.cast(t)


def _decimal_dense(v: np.ndarray, t) -> "pa.Array":
    """Dense decoded decimal storage -> pa.Decimal128/256Array. Parquet
    DECIMAL rides on FLBA (big-endian two's complement, minimal width — our
    writer and pyarrow) or INT32/INT64 unscaled (DuckDB for small
    precisions); arrow decimal buffers are 16/32-byte little-endian two's
    complement, so the conversion is a byte reverse + sign extension."""
    import pyarrow as pa

    width = 32 if t.precision > 38 else 16  # decimal256 beyond p=38
    if v.ndim == 2:  # FLBA rows, big-endian
        n, L = v.shape
        out = np.zeros((n, width), np.uint8)
        out[:, :L] = v[:, ::-1]
        out[v[:, 0] >= 128, L:] = 0xFF
    else:  # INT32/INT64 unscaled
        n = len(v)
        out = np.zeros((n, width), np.uint8)
        out[:, :8] = v.astype("<i8").view(np.uint8).reshape(n, 8)
        out[v < 0, 8:] = 0xFF
    return pa.Array.from_buffers(t, n, [None, pa.py_buffer(out.tobytes())])


def _leaf_paths_under(meta, root: str) -> list[str]:
    return [
        meta.column(ci).path_in_schema
        for ci in range(meta.num_columns)
        if meta.column(ci).path_in_schema.split(".")[0] == root
    ]


def _scatter_dense(dense, elem_valid: np.ndarray, elem_t):
    """Scatter dense leaf values over element slots (None where absent)."""
    import pyarrow as pa

    n_elem = len(elem_valid)
    take = np.full(n_elem, -1, np.int64)
    take[elem_valid] = np.arange(int(elem_valid.sum()))
    return dense.take(pa.array(take, pa.int64(), mask=take < 0)).cast(elem_t)


def _to_dense_arrow(vals, elem_t):
    import pyarrow as pa

    if isinstance(vals, tuple):
        from .codecs.dictionary import binary_array

        dense = binary_array(*vals)
        if not (pa.types.is_string(elem_t) or pa.types.is_large_string(elem_t)):
            dense = dense.cast(pa.large_binary())
        return dense
    v = np.asarray(vals)
    if pa.types.is_decimal(elem_t):
        return _decimal_dense(v, elem_t)
    if v.ndim == 2 and pa.types.is_float16(elem_t):
        return pa.array(np.ascontiguousarray(v).view("<f2").ravel())
    if v.ndim == 2:
        return pa.array([bytes(row) for row in v], pa.binary(v.shape[1]))
    if pa.types.is_boolean(elem_t):
        return pa.array(v.astype(bool))
    if pa.types.is_temporal(elem_t):
        return pa.array(v, pa.int64() if v.dtype == np.int64 else pa.int32())
    return pa.array(v)


def _count_leaves(t) -> int:
    import pyarrow as pa

    if pa.types.is_map(t):
        return _count_leaves(t.key_type) + _count_leaves(t.item_type)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return _count_leaves(t.value_type)
    if pa.types.is_struct(t):
        return sum(_count_leaves(c.type) for c in t)
    return 1


def assemble_tree(field, leaves: list):
    """General vectorized Dremel record assembly: rebuild one (arbitrarily
    nested) arrow column from its leaves' (dense values, rep, def) triples,
    in depth-first leaf order — the inverse of parquet_write._walk and the
    RecordReaderImplementation.java state machine, done level-at-a-time
    with numpy instead of per-record transitions.

    ``leaves``: [(vals, rep:np|None, def:np|None), ...]. Levels follow the
    writer's convention: a nullable node adds one def level; a list adds one
    rep and one def level, with entry slots at def >= that level."""
    import pyarrow as pa

    def build(f, lvs, r, d):
        t = f.type
        if f.nullable:
            d += 1
        if pa.types.is_map(t) or pa.types.is_list(t) or pa.types.is_large_list(t):
            is_map = pa.types.is_map(t)
            rep0, def0 = lvs[0][1], lvs[0][2]
            parent = rep0 <= r
            n_rec = int(parent.sum())
            r2, d2 = r + 1, d + 1
            keep = def0 >= d2  # slots inside surviving entries (any depth)
            # an ENTRY at this level starts at rep <= r2; deeper slots
            # (rep > r2) continue an entry's subtree and must not be counted
            entry = keep & (rep0 <= r2)
            rec_id = np.cumsum(parent) - 1
            counts = np.bincount(rec_id[entry], minlength=n_rec)
            offsets = np.zeros(n_rec + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            null_rec = None
            if f.nullable:
                first_def = def0[parent]
                null_rec = first_def < d
            sub = [
                (vals, rp[keep], dv[keep]) for vals, rp, dv in lvs
            ]
            if is_map:
                elem_f = pa.field(
                    "entries",
                    pa.struct(
                        [pa.field("key", t.key_type, False),
                         pa.field("value", t.item_type, True)]
                    ),
                    False,
                )
            else:
                elem_f = pa.field(
                    "element", t.value_type, t.value_field.nullable
                )
            child = build(elem_f, sub, r2, d2)
            off_arr = pa.array(
                offsets, pa.int64(),
                mask=np.concatenate([null_rec, [False]])
                if null_rec is not None and null_rec.any() else None,
            )
            if is_map:
                out = pa.MapArray.from_arrays(
                    off_arr.cast(pa.int32()), child.field(0), child.field(1)
                )
                if null_rec is not None and null_rec.any():
                    # MapArray.from_arrays lacks a mask param: rebuild with
                    # the validity from the (masked) offsets array
                    out = pa.Array.from_buffers(
                        out.type, len(out),
                        [off_arr.cast(pa.int32()).buffers()[0],
                         off_arr.cast(pa.int32()).buffers()[1]],
                        children=[out.values],
                    )
                return out.cast(t)
            cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
            if pa.types.is_list(t):
                off_arr = off_arr.cast(pa.int32())
            return cls.from_arrays(off_arr, child).cast(t)
        if pa.types.is_struct(t):
            def0 = lvs[0][2]
            smask = None
            if f.nullable and def0 is not None:
                invalid = def0 < d
                smask = pa.array(invalid) if invalid.any() else None
            arrays = []
            pos = 0
            for child_f in t:
                k = _count_leaves(child_f.type)
                arrays.append(build(child_f, lvs[pos : pos + k], r, d))
                pos += k
            # pass the typed fields, not just names: a REQUIRED child
            # (e.g. list<struct<number int64 not null, ...>>, as written
            # by parquet-java's example model) must keep its
            # non-nullable flag — pyarrow refuses a later cast from an
            # all-nullable struct to one with a `not null` child
            return pa.StructArray.from_arrays(
                arrays, fields=list(t), mask=smask
            )
        # primitive leaf
        vals, rep0, def0 = lvs[0]
        dense = _to_dense_arrow(vals, t)
        if def0 is None:
            return dense.cast(t)
        valid = def0 == d
        return _scatter_dense(dense, valid, t)

    # normalize: nested leaves always carry levels; a leaf with neither is a
    # flat REQUIRED column (primitive fast path). rep may be absent for flat
    # OPTIONAL leaves — synthesize zeros so list math never sees None.
    norm = []
    for vals, rp, dv in leaves:
        if dv is not None and rp is None:
            rp = np.zeros(len(dv), np.int64)
        norm.append(
            (vals,
             None if rp is None else np.asarray(rp),
             None if dv is None else np.asarray(dv))
        )
    return build(field, norm, 0, 0)


def read_table_conformance(path: str, columns: "list[str] | None" = None) -> "pa.Table":
    """Decode a whole parquet file — flat (incl. decimal), one-level list
    (primitive or struct elements), map, and flat-struct columns, all row
    groups — with rayenc decoders only, returning a pa.Table equal to
    pyarrow's read: the file-level conformance gate. ``columns`` prunes at
    the chunk level: unlisted columns' pages are never read (column names
    the file lacks are ignored so evolved-schema callers can pass the
    union's names)."""
    import pyarrow as pa

    from .schema import _restore_nulls

    f = pq.ParquetFile(path)
    schema = f.schema_arrow
    if columns is not None:
        schema = pa.schema(
            [schema.field(c) for c in columns if schema.get_field_index(c) >= 0]
        )
    parts = []
    for rg in range(f.metadata.num_row_groups):
        cols = []
        meta = f.metadata.row_group(rg)
        for field in schema:
            t = field.type
            if pa.types.is_nested(t):
                # any nesting shape through the general Dremel assembler
                leaf_paths = _leaf_paths_under(meta, field.name)
                triples = [
                    read_column_chunk(path, lp, rg, raw_levels=True)
                    for lp in leaf_paths
                ]
                cols.append(assemble_tree(field, triples))
                continue
            r = read_column_chunk(path, field.name, rg)
            cols.append(assemble_flat(r, t))
        parts.append(pa.Table.from_arrays(cols, schema=schema))
    if not parts:  # schema-only file (zero row groups)
        return schema.empty_table()
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def _decode_plain(body, n, ptype, type_length=0):
    if ptype in _PHYS:
        return plain.decode_fixed(body, n, ptype)
    if ptype == "INT96":
        # deprecated 12-byte timestamps (Encoding.java:63; Spark legacy
        # files): nanos-in-day int64 LE + Julian day int32 LE
        return plain.decode_fixed_len(body, n, 12)
    if ptype == "BYTE_ARRAY":
        return plain.decode_binary(body, n)
    if ptype == "BOOLEAN":
        return plain.decode_boolean(body, n)
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        return plain.decode_fixed_len(body, n, type_length)
    raise NotImplementedError(ptype)


def _decode_values(body, n, encoding, ptype, dictionary, type_length=0):
    if encoding == PLAIN:
        return _decode_plain(body, n, ptype, type_length)
    if encoding == RLE:
        # RLE as a VALUE encoding is boolean-only and 4-byte length framed
        # in both V1 and V2 pages (only LEVELS drop the frame in V2)
        assert ptype == "BOOLEAN", ptype
        vals, _ = rle_hybrid.decode_framed(body, n, 1, np.uint8)
        return vals.astype(bool)
    if encoding in (PLAIN_DICTIONARY, RLE_DICTIONARY):
        width = int(body[0])
        ids = rle_hybrid.decode(body[1:], n, width)
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            return dictionary[ids]
        if ptype == "BYTE_ARRAY":
            d_off, d_dat = dictionary
            lengths = np.diff(d_off)[ids]
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(lengths, out=offsets[1:])
            out = np.empty(int(offsets[-1]), np.uint8)
            src = plain._ranges(d_off[:-1][ids], lengths)
            out[plain._ranges(offsets[:-1], lengths)] = d_dat[src]
            return offsets, out
        return dictionary[ids]
    if encoding == DELTA_BINARY_PACKED:
        return delta_bp.decode(body, np.int64 if ptype == "INT64" else np.int32)
    if encoding == DELTA_LENGTH_BYTE_ARRAY:
        return delta_length.decode(body, n)
    if encoding == DELTA_BYTE_ARRAY:
        o, d = delta_strings.decode(body, n)
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            return d.reshape(n, type_length)
        return o, d
    if encoding == BYTE_STREAM_SPLIT:
        if ptype == "FIXED_LEN_BYTE_ARRAY":
            # extended BSS over FLBA (format 2.11): k byte planes of width
            # type_length, transposed back to (n, type_length) rows
            return np.ascontiguousarray(
                np.frombuffer(body, np.uint8, count=n * type_length)
                .reshape(type_length, n).T
            )
        dt = {"FLOAT": np.float32, "DOUBLE": np.float64, "INT32": np.int32, "INT64": np.int64}[ptype]
        return bytestream_split.decode(body, n, dt)
    raise NotImplementedError(f"encoding {encoding}")


_EMPTY_DTYPE = {
    "INT32": np.int32, "INT64": np.int64, "INT96": np.uint8,
    "FLOAT": np.float32, "DOUBLE": np.float64, "BOOLEAN": np.bool_,
}


def _concat_parts(parts, ptype):
    if not parts:
        # zero-value chunk (0-row row groups exist in the wild)
        if ptype == "BYTE_ARRAY":
            return np.zeros(1, np.int64), np.zeros(0, np.uint8)
        return np.zeros(0, _EMPTY_DTYPE.get(ptype, np.uint8))
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        return parts[0] if len(parts) == 1 else np.concatenate(parts)
    if ptype == "BYTE_ARRAY":
        offs_list = [p[0] for p in parts]
        data_list = [p[1] for p in parts]
        sizes = [int(o[-1]) for o in offs_list]
        starts = np.cumsum([0] + sizes[:-1])
        offsets = np.concatenate(
            [offs_list[0]] + [o[1:] + s for o, s in zip(offs_list[1:], starts[1:])]
        )
        return offsets, np.concatenate(data_list)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


# ---------------------------------------------------------------------------
# Schema evolution: merged-footer reads (GlobalMetaData / MessageType.union)
# ---------------------------------------------------------------------------

class IncompatibleSchemaError(ValueError):
    """IncompatibleSchemaModificationException analog
    (parquet-column/.../schema/GroupType.java:380, PrimitiveType.java:887)."""


_INT_RANK = {8: 0, 16: 1, 32: 2, 64: 3}


def _widen_types(a, b):
    """Smallest arrow type both ``a`` and ``b`` cast into losslessly, or
    None when there is none. This is the non-strict extension beyond
    MessageType.union(strict=false) (which keeps the first type): numeric
    widening the way engines evolve columns in practice (int32->int64,
    float->double, decimal precision growth at equal scale)."""
    import pyarrow as pa

    if a.equals(b):
        return a
    for t in (a, b):
        if not (
            pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_decimal(t)
        ):
            return None
    if pa.types.is_decimal(a) or pa.types.is_decimal(b):
        if (
            pa.types.is_decimal(a) and pa.types.is_decimal(b)
            and a.scale == b.scale
        ):
            prec = max(a.precision, b.precision)
            return pa.decimal128(prec, a.scale) if prec <= 38 else pa.decimal256(prec, a.scale)
        return None
    if pa.types.is_floating(a) or pa.types.is_floating(b):
        # float+float -> wider float; int+float -> float64 (lossless for
        # int32 and below; int64+float loses, refuse)
        if pa.types.is_floating(a) and pa.types.is_floating(b):
            return a if a.bit_width >= b.bit_width else b
        i = a if pa.types.is_integer(a) else b
        return pa.float64() if i.bit_width <= 32 else None
    if pa.types.is_signed_integer(a) != pa.types.is_signed_integer(b):
        # unsigned fits in the next-wider signed
        u = a if pa.types.is_unsigned_integer(a) else b
        s = b if u is a else a
        if s.bit_width > u.bit_width:
            return s
        wider = u.bit_width * 2 if u.bit_width >= s.bit_width else s.bit_width * 2
        return {16: pa.int16(), 32: pa.int32(), 64: pa.int64()}.get(wider)
    return a if a.bit_width >= b.bit_width else b


def _union_field(f, g, strict, path):
    import pyarrow as pa

    nullable = f.nullable or g.nullable
    ft, gt = f.type, g.type
    if pa.types.is_struct(ft) and pa.types.is_struct(gt):
        return pa.field(
            f.name, pa.struct(_union_fields(list(ft), list(gt), strict, path)),
            nullable,
        )
    if (
        (pa.types.is_list(ft) and pa.types.is_list(gt))
        or (pa.types.is_large_list(ft) and pa.types.is_large_list(gt))
    ):
        elem = _union_field(ft.value_field, gt.value_field, strict, path + ".list")
        return pa.field(
            f.name,
            pa.list_(elem) if pa.types.is_list(ft) else pa.large_list(elem),
            nullable,
        )
    if ft.equals(gt):
        return pa.field(f.name, ft, nullable)
    if strict:
        raise IncompatibleSchemaError(
            f"can not merge type {gt} into {ft} at {path!r}"
            " (MessageType.union strict: primitive type names, logical"
            " types and FLBA lengths must match)"
        )
    wide = _widen_types(ft, gt)
    if wide is None:
        raise IncompatibleSchemaError(
            f"can not merge type {gt} into {ft} at {path!r}: no lossless widening"
        )
    return pa.field(f.name, wide, nullable)


def _union_fields(a_fields, b_fields, strict, path):
    by_name = {f.name: f for f in b_fields}
    if len(by_name) != len(b_fields):
        raise IncompatibleSchemaError(f"duplicate field names under {path!r}")
    out = []
    for f in a_fields:
        g = by_name.get(f.name)
        out.append(f if g is None else _union_field(f, g, strict, f"{path}.{f.name}"))
    seen = {f.name for f in a_fields}
    # new fields appended in their own order, forced nullable: rows from
    # files that predate the field have no values for it
    # (GroupType.mergeFields "add new fields" tail loop)
    for g in b_fields:
        if g.name not in seen:
            out.append(g.with_nullable(True))
    return out


def union_schemas(schemas, strict: bool = True):
    """``MessageType.union`` over arrow schemas
    (parquet-column/.../schema/MessageType.java:134-140,
    GroupType.java:398-435): field order of the first schema with later
    files' new fields appended; struct/list types merge recursively;
    ``strict=True`` (the reference default) requires identical primitive
    types, ``strict=False`` additionally widens numerics losslessly."""
    import pyarrow as pa

    uni = list(schemas[0])
    for s in schemas[1:]:
        uni = _union_fields(uni, list(s), strict, "")
    return pa.schema(uni)


def _align_array(col, t):
    """Cast one column to its unified-schema type, recursing into structs
    so fields added by evolution materialize as nulls."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.type.equals(t):
        return col
    if pa.types.is_struct(t) and pa.types.is_struct(col.type):
        have = {f.name for f in col.type}
        children = [
            _align_array(col.field(f.name), f.type) if f.name in have
            else pa.nulls(len(col), f.type)
            for f in t
        ]
        return pa.StructArray.from_arrays(
            children, fields=list(t), mask=pc.is_null(col)
        )
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and (
        pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
    ):
        values = _align_array(col.values, t.value_type)
        cls = pa.ListArray if pa.types.is_list(t) else pa.LargeListArray
        return cls.from_arrays(col.offsets, values, mask=pc.is_null(col))
    return pc.cast(col, t)


def align_table(table, unified):
    """Project one file's table onto the unified schema: present columns
    cast/recursed, absent columns as typed nulls — what the reference's
    read path does when the requested MessageType has fields a file lacks
    (ColumnIOFactory builds null readers for missing paths)."""
    import pyarrow as pa

    cols = [
        _align_array(table.column(f.name), f.type)
        if f.name in table.column_names else pa.nulls(table.num_rows, f.type)
        for f in unified
    ]
    return pa.Table.from_arrays(cols, schema=unified)


def read_tables_evolved(paths, strict: bool = True, columns=None):
    """Merged-footer multi-file read (ParquetFileWriter.getGlobalMetaData,
    hadoop/ParquetFileWriter.java:2371-2395): union the file schemas, then
    conformance-read every file with OUR decoders and align each to the
    union — missing columns become nulls, widened columns cast. The
    distributed variant is pipeline.read_parquet_evolved."""
    import pyarrow as pa

    schemas = [pq.ParquetFile(p).schema_arrow for p in paths]
    uni = union_schemas(schemas, strict)
    if columns is not None:
        uni = pa.schema([uni.field(c) for c in columns])
    parts = [
        align_table(read_table_conformance(p, columns=uni.names), uni)
        for p in paths
    ]
    return pa.concat_tables(parts)
