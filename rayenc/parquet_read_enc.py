"""Read modular-encrypted parquet files with rayenc decoders.

pyarrow's metadata API cannot open an encrypted footer without a KMS-backed
CryptoFactory, so this module carries its own *full* thrift compact-protocol
parser (the minimal one in parquet_compat keeps only ints/structs) and
rebuilds the file metadata from bytes: FileCryptoMetaData + encrypted
FileMetaData behind the ``PARE`` magic (`ParquetFileWriter.
serializeFooter:2162-2170`), or a plaintext footer whose 28-byte GCM
signature is verified (`:2127-2158`). Page streams are walked module by
module (`InternalFileDecryptor.java` / `ModuleCipherFactory.java` AAD
semantics: header and body are separate GCM modules; the page ordinal counts
data pages only), decrypted, and handed to the shared
``parquet_compat._decode_page_stream`` decoders.

Key resolution: explicit keys on ``FileDecryption`` win; otherwise, if the
file carries pyarrow/parquet-mr "key material" JSON key_metadata
(``{"keyMaterialType":"PKMT1",...,"wrappedDEK":...}``) a ``key_unwrapper``
callback can unwrap it — tests use this to read files pyarrow encrypted.
"""

from __future__ import annotations

import base64
import struct

import numpy as np
import pyarrow as pa

from . import parquet_crypto as pcrypt
from .parquet_compat import (
    _decode_page_stream,
    _plain_page_iter,
    assemble_flat,
    read_page_header,
)
from .parquet_crypto import FileDecryption

# --------------------------------------------------- full compact protocol


def _uvarint(buf, i):
    v = shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _zigzag(v):
    return (v >> 1) ^ -(v & 1)


def _read_value(buf, i, ftype):
    if ftype in (1, 2):  # bool as a LIST element: one byte, 1=true
        return buf[i] == 1, i + 1
    if ftype == 3:  # byte
        v = buf[i] - 256 if buf[i] > 127 else buf[i]
        return v, i + 1
    if ftype in (4, 5, 6):  # i16/i32/i64 zigzag varints
        v, i = _uvarint(buf, i)
        return _zigzag(v), i
    if ftype == 7:  # double
        return struct.unpack_from("<d", buf, i)[0], i + 8
    if ftype == 8:  # binary
        n, i = _uvarint(buf, i)
        return bytes(buf[i : i + n]), i + n
    if ftype in (9, 10):  # list / set
        head = buf[i]
        i += 1
        size = head >> 4
        etype = head & 0x0F
        if size == 15:
            size, i = _uvarint(buf, i)
        out = []
        for _ in range(size):
            v, i = _read_value(buf, i, etype)
            out.append(v)
        return out, i
    if ftype == 11:  # map: varint size, then (ktype<<4|vtype), then pairs
        size, i = _uvarint(buf, i)
        out = {}
        if size:
            kv = buf[i]
            i += 1
            for _ in range(size):
                k, i = _read_value(buf, i, kv >> 4)
                v, i = _read_value(buf, i, kv & 0x0F)
                out[k] = v
        return out, i
    if ftype == 12:
        return _read_struct_full(buf, i)
    raise NotImplementedError(f"thrift compact type {ftype}")


def _read_struct_full(buf, i):
    """Parse a compact-protocol struct keeping every field type
    (bools/ints/doubles/binary/lists/structs) -> ({fid: value}, end)."""
    fields = {}
    last = 0
    while True:
        byte = buf[i]
        i += 1
        if byte == 0:
            return fields, i
        delta = byte >> 4
        ftype = byte & 0x0F
        if delta == 0:
            z, i = _uvarint(buf, i)
            fid = _zigzag(z)
        else:
            fid = last + delta
        last = fid
        if ftype == 1:
            fields[fid] = True
        elif ftype == 2:
            fields[fid] = False
        else:
            fields[fid], i = _read_value(buf, i, ftype)
    return fields, i


# ------------------------------------------------------------ footer model

_CODEC_NAME = {0: None, 1: "snappy", 2: "gzip", 4: "brotli", 6: "zstd", 7: "lz4_raw"}
_PTYPE_NAME = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}


class LeafInfo:
    __slots__ = ("path", "ptype", "type_length", "max_rep", "max_def")

    def __init__(self, path, ptype, type_length, max_rep, max_def):
        self.path = path
        self.ptype = ptype
        self.type_length = type_length
        self.max_rep = max_rep
        self.max_def = max_def

    @property
    def dotted(self):
        return ".".join(self.path)


def _walk_schema(elems):
    """SchemaElement list -> LeafInfo per leaf (depth-first order).
    repetition_type: 0 required, 1 optional, 2 repeated."""
    leaves = []
    pos = 1  # skip root

    def walk(path, max_rep, max_def):
        nonlocal pos
        e = elems[pos]
        pos += 1
        rep = e.get(3, 0)
        name = e[4].decode() if isinstance(e.get(4), bytes) else e.get(4, "")
        if rep == 1:
            max_def += 1
        elif rep == 2:
            max_rep += 1
            max_def += 1
        nchild = e.get(5, 0)
        if nchild:
            for _ in range(nchild):
                walk(path + [name], max_rep, max_def)
        else:
            leaves.append(
                LeafInfo(
                    path + [name], _PTYPE_NAME[e[1]], e.get(2, 0), max_rep, max_def
                )
            )

    root = elems[0]
    for _ in range(root.get(5, 0)):
        walk([], 0, 0)
    return leaves


def _unwrap_key_material(key_metadata: bytes) -> bytes | None:
    """Unwrap parquet-mr/pyarrow internal key material when it is the
    single-wrapped base64 form our test KMS produces; returns None when the
    metadata isn't that shape (caller falls back to explicit keys)."""
    import json

    try:
        km = json.loads(key_metadata)
        if km.get("keyMaterialType") == "PKMT1" and not km.get("doubleWrapping"):
            return base64.b64decode(km["wrappedDEK"])
    except Exception:
        return None
    return None


class EncryptedFile:
    """Parsed (and, where needed, decrypted) metadata of one parquet file."""

    def __init__(self, path: str, decryption: FileDecryption | None = None):
        self.path = path
        self.dec = decryption or FileDecryption()
        with open(path, "rb") as f:
            self.raw = f.read()
        tail = self.raw[-8:]
        (flen,) = struct.unpack("<i", tail[:4])
        magic = tail[4:]
        region = self.raw[len(self.raw) - 8 - flen : len(self.raw) - 8]
        self.file_aad = b""
        self.algorithm = None
        if magic == pcrypt.MAGIC_ENCRYPTED:
            crypto_md, end = _read_struct_full(region, 0)
            self._load_algorithm(crypto_md[1])
            key = self._footer_key(crypto_md.get(2))
            footer_aad = pcrypt.module_aad(self.file_aad, pcrypt.M_FOOTER)
            footer_bytes, _ = pcrypt.decrypt_module(key, region, end, footer_aad)
            self.md, _ = _read_struct_full(footer_bytes, 0)
            self.footer_key = key
        elif magic == b"PAR1":
            self.md, end = _read_struct_full(region, 0)
            self.footer_key = None
            if 8 in self.md:  # plaintext footer of an encrypted file
                self._load_algorithm(self.md[8])
                try:
                    key = self._footer_key(self.md.get(9))
                except ValueError:
                    key = None  # metadata stays readable; columns won't be
                self.footer_key = key
                if key is not None:
                    sig = region[end : end + 28]
                    if len(sig) == 28 and not pcrypt.verify_gcm_signature(
                        key, region[:end], sig,
                        pcrypt.module_aad(self.file_aad, pcrypt.M_FOOTER),
                    ):
                        raise ValueError(f"footer signature verification failed: {path}")
        else:
            raise ValueError(f"not a parquet file (magic {magic!r}): {path}")
        self.schema_elems = self.md[2]
        self.leaves = _walk_schema(self.schema_elems)
        self.num_rows = self.md.get(3, 0)
        self.row_groups = self.md.get(4, [])
        self.kv = {
            e[1].decode(): e[2].decode()
            for e in self.md.get(5, [])
            if 1 in e and 2 in e
        }

    # -- keys / algorithm ---------------------------------------------------

    def _load_algorithm(self, alg_union: dict) -> None:
        if 1 not in alg_union:
            raise NotImplementedError("only AES_GCM_V1 is supported")
        gcm = alg_union[1]
        self.algorithm = "AES_GCM_V1"
        stored_prefix = gcm.get(1, b"")
        supply = gcm.get(3, False)
        prefix = self.dec.aad_prefix if (supply or not stored_prefix) else stored_prefix
        self.file_aad = (prefix or b"") + gcm.get(2, b"")

    def _footer_key(self, key_metadata) -> bytes:
        if self.dec.footer_key is not None:
            return self.dec.footer_key
        if key_metadata:
            k = _unwrap_key_material(key_metadata)
            if k is not None:
                return k
        raise ValueError(f"no footer key available for {self.path}")

    def _column_key(self, dotted: str, key_metadata) -> bytes:
        k = self.dec.column_keys.get(dotted)
        if k is not None:
            return k
        if key_metadata:
            k = _unwrap_key_material(key_metadata)
            if k is not None:
                return k
        if self.footer_key is not None:
            return self.footer_key
        raise ValueError(f"no key available for column {dotted!r}")

    # -- schema -------------------------------------------------------------

    def arrow_schema(self) -> pa.Schema:
        b64 = self.kv.get("ARROW:schema")
        if b64:
            return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(b64)))
        fields = []
        for leaf in self.leaves:
            if len(leaf.path) != 1:
                raise NotImplementedError(
                    "nested schema without ARROW:schema metadata"
                )
            t = {
                "BOOLEAN": pa.bool_(), "INT32": pa.int32(), "INT64": pa.int64(),
                "FLOAT": pa.float32(), "DOUBLE": pa.float64(),
                "BYTE_ARRAY": pa.binary(),
                "FIXED_LEN_BYTE_ARRAY": pa.binary(leaf.type_length),
                "INT96": pa.timestamp("ns"),
            }[leaf.ptype]
            fields.append(pa.field(leaf.path[0], t, leaf.max_def > 0))
        return pa.schema(fields)

    # -- chunks -------------------------------------------------------------

    def chunk_meta(self, rg_ord: int, col_ord: int) -> dict:
        """ColumnMetaData dict for one chunk, decrypting
        encrypted_column_metadata when that is the only copy."""
        cc = self.row_groups[rg_ord][1][col_ord]
        crypto = cc.get(8)
        md = cc.get(3)
        if crypto is not None and 2 in crypto and cc.get(9):
            dotted = self.leaves[col_ord].dotted
            key = self._column_key(dotted, crypto[2].get(2))
            aad = pcrypt.module_aad(
                self.file_aad, pcrypt.M_COLUMN_METADATA, rg_ord, col_ord
            )
            plain, _ = pcrypt.decrypt_module(key, cc[9], 0, aad)
            md, _ = _read_struct_full(plain, 0)
        if md is None:
            raise ValueError(f"no readable ColumnMetaData for column {col_ord}")
        return md

    def _chunk_key(self, rg_ord: int, col_ord: int) -> bytes | None:
        """Key for the chunk's page modules, or None when unencrypted."""
        cc = self.row_groups[rg_ord][1][col_ord]
        crypto = cc.get(8)
        if crypto is None:
            return None
        if 2 in crypto:
            return self._column_key(self.leaves[col_ord].dotted, crypto[2].get(2))
        if self.footer_key is None:
            raise ValueError("footer key required for footer-key column")
        return self.footer_key

    def decode_leaf(self, rg_ord: int, col_ord: int, raw_levels: bool = False):
        """Decode one leaf chunk with rayenc kernels (any encryption state)."""
        leaf = self.leaves[col_ord]
        md = self.chunk_meta(rg_ord, col_ord)
        start = md.get(11, None)
        if start is None or start < 0:
            start = md[9]
        has_dict = 11 in md and md[11] is not None and md[11] >= 0
        total = md[7]
        num_values = md[5]
        raw = np.frombuffer(self.raw[start : start + total], np.uint8)
        codec_name = _CODEC_NAME.get(md.get(4, 0))
        if md.get(4, 0) not in _CODEC_NAME:
            raise NotImplementedError(f"codec id {md.get(4)}")
        codec = pa.Codec(codec_name) if codec_name else None
        key = self._chunk_key(rg_ord, col_ord)
        if key is None:
            pages = _plain_page_iter(raw, num_values, self.path, leaf.dotted)
        else:
            pages = _encrypted_page_iter(
                raw, key, self.file_aad, rg_ord, col_ord, num_values, has_dict
            )
        return _decode_page_stream(
            pages, num_values, leaf.max_rep, leaf.max_def, leaf.ptype,
            leaf.type_length, codec, raw_levels=raw_levels,
        )


def _encrypted_page_iter(raw, key, file_aad, rg, col, num_values, has_dict):
    """Walk an encrypted chunk: each page is [header module][body module]
    (V1/dict) or [header module][plaintext levels][values module] (V2).
    AAD mismatches surface as InvalidTag — the GCM tag doubles as the
    module-type/ordinal check."""
    import zlib

    pos = 0
    remaining = num_values
    page_ord = -1
    expect_dict = has_dict
    while remaining > 0 and pos < len(raw):
        if expect_dict:
            hdr_aad = pcrypt.module_aad(file_aad, pcrypt.M_DICT_PAGE_HEADER, rg, col)
        else:
            page_ord += 1
            hdr_aad = pcrypt.module_aad(
                file_aad, pcrypt.M_DATA_PAGE_HEADER, rg, col, page_ord
            )
        hdr_bytes, pos = pcrypt.decrypt_module(key, raw, pos, hdr_aad)
        h = read_page_header(np.frombuffer(hdr_bytes, np.uint8), 0)
        if h.type == 3:  # DATA_PAGE_V2: plaintext levels + encrypted values
            lv = h.v2_rep_bytes + h.v2_def_bytes
            levels = raw[pos : pos + lv]
            body_start = pos
            vals_pt, pos = pcrypt.decrypt_module(
                key, raw,
                pos + lv,
                pcrypt.module_aad(file_aad, pcrypt.M_DATA_PAGE, rg, col, page_ord),
            )
            if h.crc is not None:
                stored = raw[body_start:pos].tobytes()
                if zlib.crc32(stored) != (h.crc & 0xFFFFFFFF):
                    raise ValueError("encrypted page CRC mismatch")
                h.crc = None
            body = np.concatenate([levels, np.frombuffer(vals_pt, np.uint8)])
        else:
            mt = pcrypt.M_DICT_PAGE if expect_dict else pcrypt.M_DATA_PAGE
            body_start = pos
            body_pt, pos = pcrypt.decrypt_module(
                key, raw, pos,
                pcrypt.module_aad(
                    file_aad, mt, rg, col, -1 if expect_dict else page_ord
                ),
            )
            if h.crc is not None:
                stored = raw[body_start:pos].tobytes()
                if zlib.crc32(stored) != (h.crc & 0xFFFFFFFF):
                    raise ValueError("encrypted page CRC mismatch")
                h.crc = None
            body = np.frombuffer(body_pt, np.uint8)
        if expect_dict:
            expect_dict = False
            page_ord = -1  # dict page consumed no data-page ordinal
        else:
            remaining -= h.num_values
        yield h, body


def _parse_index(f: "EncryptedFile", rg_ord: int, col_ord: int):
    """(ColumnIndex dict, OffsetIndex dict) for one chunk, decrypting the
    index modules (types 6/7) when the column is encrypted; None when the
    file carries no page index."""
    cc = f.row_groups[rg_ord][1][col_ord]
    if 6 not in cc or 4 not in cc:
        return None
    key = f._chunk_key(rg_ord, col_ord)

    def grab(off, length, mtype):
        region = f.raw[off : off + length]
        if key is None:
            return _read_struct_full(region, 0)[0]
        aad = pcrypt.module_aad(f.file_aad, mtype, rg_ord, col_ord)
        pt, _ = pcrypt.decrypt_module(key, region, 0, aad)
        return _read_struct_full(pt, 0)[0]

    return (
        grab(cc[6], cc[7], pcrypt.M_COLUMN_INDEX),
        grab(cc[4], cc[5], pcrypt.M_OFFSET_INDEX),
    )


_MINMAX_FMT = {"INT32": "<i", "INT64": "<q", "FLOAT": "<f", "DOUBLE": "<d"}


def _page_bounds(cidx, leaf, unsigned_hint=False):
    """Decode ColumnIndex min/max byte arrays into comparable values
    (None per page when the page is all-null)."""
    nulls = cidx.get(1, [])
    mins, maxs = cidx.get(2, []), cidx.get(3, [])
    fmt = _MINMAX_FMT.get(leaf.ptype)
    out = []
    for p in range(len(mins)):
        if p < len(nulls) and nulls[p]:
            out.append(None)
            continue
        if fmt is not None:
            lo = struct.unpack(fmt, mins[p])[0]
            hi = struct.unpack(fmt, maxs[p])[0]
        else:  # BINARY: bytewise order; truncated max was incremented
            lo, hi = bytes(mins[p]), bytes(maxs[p])
        out.append((lo, hi))
    return out


def _page_keep_mask(bounds, op, value) -> list[bool]:
    if op == "in":
        # keep a page when ANY member may fall inside its bounds
        masks = [_page_keep_mask(bounds, "==", v) for v in value]
        return [any(col) for col in zip(*masks)] if masks else [False] * len(bounds)
    keep = []
    for b in bounds:
        if b is None:
            keep.append(False)
            continue
        lo, hi = b
        if isinstance(lo, bytes):
            if isinstance(value, str):
                value = value.encode()
            if not isinstance(value, bytes):
                keep.append(True)
                continue
        elif isinstance(value, (str, bytes)):
            keep.append(True)
            continue
        keep.append(
            not (
                (op == "==" and (value < lo or value > hi))
                or (op == "<" and lo >= value)
                or (op == "<=" and lo > value)
                or (op == ">" and hi <= value)
                or (op == ">=" and hi < value)
            )
        )
    return keep


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


def read_table_filtered(
    path: str,
    predicate: list,
    columns: list[str] | None = None,
    decryption: FileDecryption | None = None,
    row_groups: list[int] | None = None,
) -> pa.Table:
    """Predicate-pushdown read of a parquet FILE driven by OUR ColumnIndex /
    OffsetIndex parsing (the filter2/columnindex page-skipping surface,
    `internal/filter2/columnindex/ColumnIndexFilter.java` semantics): pages
    whose min/max exclude every conjunct are never decoded; the surviving
    row intervals intersect across predicate columns; the exact filter runs
    after decode. Flat columns; plaintext or encrypted files."""
    import pyarrow.compute as pc

    f = EncryptedFile(path, decryption)
    schema = f.arrow_schema()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    leaf_ord = {leaf.dotted: i for i, leaf in enumerate(f.leaves)}
    parts = []
    rg_iter = (
        [(i, f.row_groups[i]) for i in row_groups]
        if row_groups is not None
        else list(enumerate(f.row_groups))
    )
    for rg_ord, rg in rg_iter:
        rg_rows = rg.get(3)
        # bloom filters veto whole row groups for equality conjuncts before
        # any page-index work (BloomFilterReader + ColumnIndexFilter compose
        # the same way in the reference read path)
        skip_rg = False
        for col, op, value in predicate:
            if op != "==":
                continue
            ci = leaf_ord[col]
            filt = read_bloom_filter(f, rg_ord, ci)
            if filt is None:
                continue
            from .bloom import spec_value_hash

            h = spec_value_hash(value, f.leaves[ci].ptype)
            if not bool(filt.might_contain_hashes(h)[0]):
                skip_rg = True
                break
        if skip_rg:
            continue
        intervals = [(0, rg_rows)]
        idx_cache = {}
        for col, op, value in predicate:
            ci = leaf_ord[col]
            parsed = _parse_index(f, rg_ord, ci)
            if parsed is None:
                continue
            cidx, oidx = parsed
            idx_cache[col] = parsed
            locs = oidx.get(1, [])
            firsts = [loc[3] for loc in locs] + [rg_rows]
            bounds = _page_bounds(cidx, f.leaves[ci])
            keep = _page_keep_mask(bounds, op, value)
            col_iv = [
                (firsts[p], firsts[p + 1]) for p, k in enumerate(keep) if k
            ]
            intervals = _intersect_intervals(intervals, col_iv)
            if not intervals:
                break
        if not intervals:
            continue
        cols = []
        for field in schema:
            if pa.types.is_nested(field.type):
                # nested SELECTED columns (predicates stay flat): decode the
                # whole chunk set via the general assembler, slice record
                # intervals — page skipping still applies to the flat
                # predicate columns driving `intervals`
                from .parquet_compat import assemble_tree

                triples = [
                    f.decode_leaf(rg_ord, i, raw_levels=True)
                    for i, leaf in enumerate(f.leaves)
                    if leaf.path[0] == field.name
                ]
                arr = assemble_tree(field, triples)
                picked = pa.concat_arrays(
                    [arr.slice(a, b - a) for a, b in intervals]
                )
                cols.append(picked)
                continue
            ci = leaf_ord[field.name]
            parsed = idx_cache.get(field.name) or _parse_index(f, rg_ord, ci)
            if parsed is None:
                r = f.decode_leaf(rg_ord, ci)
                arr = assemble_flat(r, field.type)
                picked = pa.concat_arrays(
                    [arr.slice(a, b - a).combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr.slice(a, b - a) for a, b in intervals]
                )
                cols.append(picked)
                continue
            _, oidx = parsed
            locs = oidx.get(1, [])
            firsts = [loc[3] for loc in locs] + [rg_rows]
            page_sel = [
                p
                for p in range(len(locs))
                if _intersect_intervals(
                    [(firsts[p], firsts[p + 1])], intervals
                )
            ]
            arr = _decode_selected_pages(f, rg_ord, ci, locs, page_sel, field.type)
            # map final intervals to local offsets within decoded pages
            local = []
            base = 0
            for p in page_sel:
                a, b = firsts[p], firsts[p + 1]
                for lo, hi in _intersect_intervals([(a, b)], intervals):
                    local.append((base + lo - a, hi - lo))
                base += b - a
            picked = pa.concat_arrays([arr.slice(s, n) for s, n in local])
            cols.append(picked)
        tbl = pa.Table.from_arrays(cols, schema=schema)
        parts.append(tbl)
    table = (
        pa.concat_tables(parts)
        if len(parts) > 1
        else (parts[0] if parts else schema.empty_table())
    )
    mask = None
    for col, op, value in predicate:
        if col not in table.column_names:
            continue
        c = table.column(col)
        if op == "in":
            m = pc.is_in(c, value_set=pa.array(list(value)))
        else:
            m = {
                "==": pc.equal, "<": pc.less, "<=": pc.less_equal,
                ">": pc.greater, ">=": pc.greater_equal, "!=": pc.not_equal,
            }[op](c, pa.scalar(value))
        mask = m if mask is None else pc.and_(mask, m)
    return table.filter(mask) if mask is not None else table


def _decode_selected_pages(f, rg_ord, col_ord, locs, page_sel, arrow_t):
    """Decode only the selected data pages of one flat chunk (dictionary
    page always decoded first when present)."""
    from .parquet_compat import _decode_page_stream

    leaf = f.leaves[col_ord]
    md = f.chunk_meta(rg_ord, col_ord)
    codec_name = _CODEC_NAME.get(md.get(4, 0))
    codec = pa.Codec(codec_name) if codec_name else None
    key = f._chunk_key(rg_ord, col_ord)
    dict_off = md.get(11)
    has_dict = dict_off is not None and dict_off >= 0

    def pages():
        if has_dict:
            pos = dict_off
            if key is None:
                h = read_page_header(np.frombuffer(f.raw[pos : pos + 65536], np.uint8), 0)
                body = np.frombuffer(
                    f.raw[pos + h.header_len : pos + h.header_len + h.compressed_size],
                    np.uint8,
                )
                h.crc = None
                yield h, body
            else:
                hdr_pt, end = pcrypt.decrypt_module(
                    key, f.raw, pos,
                    pcrypt.module_aad(f.file_aad, pcrypt.M_DICT_PAGE_HEADER,
                                      rg_ord, col_ord),
                )
                h = read_page_header(np.frombuffer(hdr_pt, np.uint8), 0)
                body_pt, _ = pcrypt.decrypt_module(
                    key, f.raw, end,
                    pcrypt.module_aad(f.file_aad, pcrypt.M_DICT_PAGE,
                                      rg_ord, col_ord),
                )
                h.crc = None
                yield h, np.frombuffer(body_pt, np.uint8)
        for p in page_sel:
            pos = locs[p][1]
            if key is None:
                h = read_page_header(
                    np.frombuffer(f.raw[pos : pos + 65536], np.uint8), 0
                )
                body = np.frombuffer(
                    f.raw[pos + h.header_len : pos + h.header_len + h.compressed_size],
                    np.uint8,
                )
                h.crc = None
                yield h, body
            else:
                hdr_pt, end = pcrypt.decrypt_module(
                    key, f.raw, pos,
                    pcrypt.module_aad(f.file_aad, pcrypt.M_DATA_PAGE_HEADER,
                                      rg_ord, col_ord, p),
                )
                h = read_page_header(np.frombuffer(hdr_pt, np.uint8), 0)
                if h.type == 3:
                    lv = h.v2_rep_bytes + h.v2_def_bytes
                    levels = f.raw[end : end + lv]
                    vals_pt, _ = pcrypt.decrypt_module(
                        key, f.raw, end + lv,
                        pcrypt.module_aad(f.file_aad, pcrypt.M_DATA_PAGE,
                                          rg_ord, col_ord, p),
                    )
                    body = np.concatenate(
                        [np.frombuffer(levels, np.uint8),
                         np.frombuffer(vals_pt, np.uint8)]
                    )
                else:
                    body_pt, _ = pcrypt.decrypt_module(
                        key, f.raw, end,
                        pcrypt.module_aad(f.file_aad, pcrypt.M_DATA_PAGE,
                                          rg_ord, col_ord, p),
                    )
                    body = np.frombuffer(body_pt, np.uint8)
                h.crc = None
                yield h, body

    # num_values budget: selected page value counts are unknown before the
    # headers are read; pass a large bound — the iterator is finite
    r = _decode_page_stream(
        pages(), 1 << 62, f.leaves[col_ord].max_rep, f.leaves[col_ord].max_def,
        leaf.ptype, leaf.type_length, codec,
    )
    return assemble_flat(r, arrow_t)


def read_bloom_filter(f: "EncryptedFile", rg_ord: int, col_ord: int):
    """Parse the split-block bloom filter of one chunk from the file
    (BloomFilterHeader + bitset; encrypted files wrap both as GCM modules
    types 8/9 — serializeBloomFilters:2038-2100), or None when absent."""
    from .bloom import SpecBloom

    md = f.chunk_meta(rg_ord, col_ord)
    off = md.get(14)
    if off is None:
        return None
    key = f._chunk_key(rg_ord, col_ord)
    if key is None:
        hdr, end = _read_struct_full(f.raw, off)
        num_bytes = hdr[1]
        bitset = f.raw[end : end + num_bytes]
    else:
        hdr_pt, end = pcrypt.decrypt_module(
            key, f.raw, off,
            pcrypt.module_aad(f.file_aad, pcrypt.M_BLOOM_HEADER, rg_ord, col_ord),
        )
        hdr, _ = _read_struct_full(hdr_pt, 0)
        num_bytes = hdr[1]
        bitset, _ = pcrypt.decrypt_module(
            key, f.raw, end,
            pcrypt.module_aad(f.file_aad, pcrypt.M_BLOOM_BITSET, rg_ord, col_ord),
        )
    if 1 not in hdr.get(2, {1: {}}) or 1 not in hdr.get(3, {1: {}}):
        raise NotImplementedError("non-XXHASH/BLOCK bloom filter")
    if len(bitset) != num_bytes:
        raise ValueError("bloom bitset truncated")
    return SpecBloom.from_bitset(bytes(bitset))


def bloom_might_contain(
    path: str, column: str, value, decryption: FileDecryption | None = None
) -> list[bool]:
    """Per-row-group bloom verdicts for ``column == value`` (True = row
    group may contain it). Row groups without a bloom return True."""
    from .bloom import spec_value_hash

    f = EncryptedFile(path, decryption)
    col_ord = next(
        i for i, leaf in enumerate(f.leaves) if leaf.dotted == column
    )
    ptype = f.leaves[col_ord].ptype
    h = spec_value_hash(value, "INT64" if ptype == "INT96" else ptype)
    out = []
    for rg in range(len(f.row_groups)):
        filt = read_bloom_filter(f, rg, col_ord)
        out.append(True if filt is None else bool(filt.might_contain_hashes(h)[0]))
    return out


def read_table_encrypted(
    path: str,
    decryption: FileDecryption | None = None,
    row_groups: list[int] | None = None,
) -> pa.Table:
    """Decode a (possibly encrypted) parquet file — flat and one-level-list
    columns — using rayenc decoders and our own footer parser; pass
    ``row_groups`` to read a subset (e.g. after bloom-filter skipping). The
    encrypted counterpart of parquet_compat.read_table_conformance."""
    f = EncryptedFile(path, decryption)
    schema = f.arrow_schema()
    leaf_by_root: dict[str, int] = {}
    for ord_, leaf in enumerate(f.leaves):
        leaf_by_root.setdefault(leaf.path[0], ord_)
    parts = []
    for rg_ord in row_groups if row_groups is not None else range(len(f.row_groups)):
        cols = []
        for field in schema:
            t = field.type
            col_ord = leaf_by_root[field.name]
            if pa.types.is_nested(t):
                # any nesting shape through the general Dremel assembler,
                # fed by the decrypting leaf decoder
                from .parquet_compat import assemble_tree

                triples = [
                    f.decode_leaf(rg_ord, i, raw_levels=True)
                    for i, leaf in enumerate(f.leaves)
                    if leaf.path[0] == field.name
                ]
                cols.append(assemble_tree(field, triples))
                continue
            r = f.decode_leaf(rg_ord, col_ord)
            cols.append(assemble_flat(r, t))
        parts.append(pa.Table.from_arrays(cols, schema=schema))
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
