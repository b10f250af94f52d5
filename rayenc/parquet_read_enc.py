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
(``{"keyMaterialType":"PKMT1",...,"wrappedDEK":...}``), it is unwrapped —
single wrapping through ``FileDecryption.kms_unwrap``, double wrapping
(KEK->DEK, `crypto/keytools/FileKeyUnwrapper.java`) additionally through
``KeyToolkit.decryptKeyLocally`` semantics. Tests use the trivial base64
KMS to read files pyarrow encrypted in both wrapping modes.
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


def _resolve_codec(codec_id: int):
    """Page codec for a CompressionCodec ordinal.  Ids 5 (legacy LZ4,
    Hadoop-framed or raw dialect) and 3 (legacy LZO, Hadoop-framed LZO1X)
    route through ``codecs.lz4hadoop.codec_for_id``
    (CompressionCodecName.java:29-31)."""
    if codec_id in _CODEC_NAME:
        name = _CODEC_NAME[codec_id]
        return pa.Codec(name) if name else None
    from .codecs.lz4hadoop import codec_for_id

    return codec_for_id(codec_id)


_PTYPE_NAME = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}


class LeafInfo:
    __slots__ = ("path", "ptype", "type_length", "max_rep", "max_def",
                 "unsigned", "f16", "utf8", "elem")

    def __init__(self, path, ptype, type_length, max_rep, max_def,
                 unsigned=False, f16=False, utf8=False, elem=None):
        self.f16 = f16
        self.utf8 = utf8
        self.elem = elem
        self.path = path
        self.ptype = ptype
        self.type_length = type_length
        self.max_rep = max_rep
        self.max_def = max_def
        self.unsigned = unsigned

    @property
    def dotted(self):
        return ".".join(self.path)


# ConvertedType UINT_8/16/32/64 ordinals (parquet.thrift)
_UNSIGNED_CONVERTED = {11, 12, 13, 14}


def _leaf_is_unsigned(e: dict) -> bool:
    """SchemaElement -> is the leaf an unsigned integer logical type?
    (converted_type field 6, or LogicalType.INTEGER field 10 with
    isSigned=false) — drives unsigned-domain min/max comparison, matching
    the write-side unsigned stats domain (stats.compute)."""
    if e.get(6) in _UNSIGNED_CONVERTED:
        return True
    lt = e.get(10)
    if isinstance(lt, dict) and isinstance(lt.get(10), dict):
        return lt[10].get(2, True) is False
    return False


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
            lt = e.get(10)
            leaves.append(
                LeafInfo(
                    path + [name], _PTYPE_NAME[e[1]], e.get(2, 0), max_rep,
                    max_def, unsigned=_leaf_is_unsigned(e),
                    f16=isinstance(lt, dict) and 15 in lt,  # FLOAT16
                    # ConvertedType UTF8 (0) or LogicalType STRING (union 1)
                    utf8=e.get(6) == 0
                    or (isinstance(lt, dict) and 1 in lt),
                    elem=e,
                )
            )

    root = elems[0]
    for _ in range(root.get(5, 0)):
        walk([], 0, 0)
    return leaves


_TIME_UNIT_ARROW = {1: "ms", 2: "us", 3: "ns"}


def _leaf_arrow_type(leaf: "LeafInfo") -> "pa.DataType":
    """Flat-leaf SchemaElement -> the Arrow type pyarrow would derive
    (parquet-cpp SchemaField conversion): logicalType union preferred,
    legacy ConvertedType fallback. assemble_flat's final ``cast(t)`` turns
    the raw physical decode into this type, so filtered reads of files
    without ARROW:schema metadata match pyarrow's schema."""
    e = leaf.elem or {}
    base = {
        "BOOLEAN": pa.bool_(), "INT32": pa.int32(), "INT64": pa.int64(),
        "FLOAT": pa.float32(), "DOUBLE": pa.float64(),
        "BYTE_ARRAY": pa.string() if leaf.utf8 else pa.binary(),
        "FIXED_LEN_BYTE_ARRAY": pa.binary(leaf.type_length),
        "INT96": pa.timestamp("ns"),
    }[leaf.ptype]
    if leaf.f16:
        return pa.float16()
    lt = e.get(10)
    if isinstance(lt, dict):
        if 5 in lt:  # DECIMAL{1:scale, 2:precision}
            p, s = lt[5].get(2, 0), lt[5].get(1, 0)
            return pa.decimal128(p, s) if p <= 38 else pa.decimal256(p, s)
        if 6 in lt:
            return pa.date32()
        if 7 in lt:  # TIME{1:isAdjustedToUTC, 2:unit}
            unit = _TIME_UNIT_ARROW.get(next(iter(lt[7].get(2, {1: None}))), "ms")
            return pa.time32("ms") if unit == "ms" else pa.time64(unit)
        if 8 in lt:  # TIMESTAMP{1:isAdjustedToUTC, 2:unit}
            unit = _TIME_UNIT_ARROW.get(next(iter(lt[8].get(2, {1: None}))), "ms")
            return pa.timestamp(unit, tz="UTC" if lt[8].get(1) else None)
        if 10 in lt:  # INTEGER{1:bitWidth, 2:isSigned}
            bw = lt[10].get(1, 32)
            signed = lt[10].get(2, True) is not False
            return getattr(pa, f"{'' if signed else 'u'}int{bw}")()
        return base
    ct = e.get(6)
    if ct is None:
        return base
    if ct == 5:  # DECIMAL: scale field 7, precision field 8
        p, s = e.get(8, 0), e.get(7, 0)
        return pa.decimal128(p, s) if p <= 38 else pa.decimal256(p, s)
    _BY_CONVERTED = {
        6: pa.date32(), 7: pa.time32("ms"), 8: pa.time64("us"),
        # legacy TIMESTAMP_* are instants (isAdjustedToUTC=true)
        9: pa.timestamp("ms", tz="UTC"), 10: pa.timestamp("us", tz="UTC"),
        11: pa.uint8(), 12: pa.uint16(), 13: pa.uint32(), 14: pa.uint64(),
        15: pa.int8(), 16: pa.int16(), 17: pa.int32(), 18: pa.int64(),
    }
    return _BY_CONVERTED.get(ct, base)


_REPETITION = {0: "required", 1: "optional", 2: "repeated"}
_TIME_UNIT = {1: "MILLIS", 2: "MICROS", 3: "NANOS"}
# legacy ConvertedType -> the modern annotation text MessageType#toString
# prints (LogicalTypeAnnotation.fromConvertedType mapping)
_CONVERTED_NAME = {
    0: "STRING", 1: "MAP", 2: "MAP_KEY_VALUE", 3: "LIST", 4: "ENUM",
    6: "DATE", 7: "TIME(MILLIS,true)", 8: "TIME(MICROS,true)",
    9: "TIMESTAMP(MILLIS,true)", 10: "TIMESTAMP(MICROS,true)",
    11: "INTEGER(8,false)", 12: "INTEGER(16,false)", 13: "INTEGER(32,false)",
    14: "INTEGER(64,false)", 15: "INTEGER(8,true)", 16: "INTEGER(16,true)",
    17: "INTEGER(32,true)", 18: "INTEGER(64,true)",
    19: "JSON", 20: "BSON", 21: "INTERVAL",
}


def _annotation(e: dict) -> str:
    """'(STRING)' etc. for one SchemaElement — MessageType#toString /
    LogicalTypeAnnotation.toString rendering; logicalType union preferred,
    legacy ConvertedType as fallback."""
    lt = e.get(10)
    if isinstance(lt, dict):
        if 1 in lt:
            return " (STRING)"
        if 2 in lt:
            return " (MAP)"
        if 3 in lt:
            return " (LIST)"
        if 4 in lt:
            return " (ENUM)"
        if 5 in lt:
            d = lt[5]
            return f" (DECIMAL({d.get(2, 0)},{d.get(1, 0)}))"
        if 6 in lt:
            return " (DATE)"
        if 7 in lt:
            d = lt[7]
            unit = _TIME_UNIT.get(next(iter(d.get(2, {1: None}))), "MILLIS")
            return f" (TIME({unit},{str(bool(d.get(1))).lower()}))"
        if 8 in lt:
            d = lt[8]
            unit = _TIME_UNIT.get(next(iter(d.get(2, {1: None}))), "MILLIS")
            return f" (TIMESTAMP({unit},{str(bool(d.get(1))).lower()}))"
        if 10 in lt:
            d = lt[10]
            return f" (INTEGER({d.get(1, 32)},{str(d.get(2, True) is not False).lower()}))"
        if 12 in lt:
            return " (JSON)"
        if 13 in lt:
            return " (BSON)"
        if 14 in lt:
            return " (UUID)"
        if 15 in lt:
            return " (FLOAT16)"
        if 16 in lt:
            return " (VARIANT)"
        if 17 in lt:
            return " (GEOMETRY)"
        if 18 in lt:
            return " (GEOGRAPHY)"
    conv = e.get(6)
    if conv == 5:
        return f" (DECIMAL({e.get(8, 0)},{e.get(7, 0)}))"
    if conv in _CONVERTED_NAME:
        return f" ({_CONVERTED_NAME[conv]})"
    return ""


def format_message_type(elems: list) -> str:
    """Footer SchemaElement list -> the parquet message-type text syntax
    (MessageTypeParser grammar; parquet-cli SchemaCommand's --parquet
    output). From-scratch printer over the raw thrift dicts."""
    lines: list[str] = []
    pos = 1

    def name_of(e):
        n = e.get(4, "")
        return n.decode() if isinstance(n, bytes) else n

    def walk(indent: int):
        nonlocal pos
        e = elems[pos]
        pos += 1
        pad = "  " * indent
        rep = _REPETITION.get(e.get(3, 0), "required")
        nchild = e.get(5, 0)
        if nchild:
            lines.append(f"{pad}{rep} group {name_of(e)}{_annotation(e)} {{")
            for _ in range(nchild):
                walk(indent + 1)
            lines.append(f"{pad}}}")
            return
        t = _PTYPE_NAME[e[1]].lower()
        if t == "byte_array":
            t = "binary"  # MessageTypeParser grammar name
        elif t == "fixed_len_byte_array":
            t = f"fixed_len_byte_array({e.get(2, 0)})"
        lines.append(f"{pad}{rep} {t} {name_of(e)}{_annotation(e)};")

    root = elems[0]
    lines.append(f"message {name_of(root) or 'schema'} {{")
    for _ in range(root.get(5, 0)):
        walk(1)
    lines.append("}")
    return "\n".join(lines)


def _unwrap_key_material(
    key_metadata: bytes, dec: FileDecryption, path: str | None = None
) -> bytes | None:
    """Unwrap parquet-mr/pyarrow key material (PKMT1 JSON): single wrapping
    resolves the DEK straight through the KMS; DOUBLE wrapping
    (`crypto/keytools/FileKeyUnwrapper.java:119-144`, the Spark default)
    unwraps the KEK through the KMS under the master key, then decrypts the
    DEK locally with AAD = raw kekID bytes (KeyToolkit.decryptKeyLocally).
    internalStorage=false metadata carries only a keyReference — the
    material itself is fetched from the `_KEY_MATERIAL_FOR_<name>.json`
    sidecar next to the file (`KeyMetadata.java:41-52` +
    `HadoopFSKeyMaterialStore`). Returns None when the metadata isn't that
    shape (caller falls back to explicit keys)."""
    import json

    try:
        km = json.loads(key_metadata)
        if km.get("keyMaterialType") != "PKMT1":
            return None
        if km.get("internalStorage") is False and "keyReference" in km:
            if path is None:
                return None
            store = pcrypt.read_key_material_store(path)
            km = json.loads(store[km["keyReference"]])
        master = km.get("masterKeyID", "")
        if not km.get("doubleWrapping"):
            return dec.unwrap(km["wrappedDEK"], master)
        kek = dec.unwrap(km["wrappedKEK"], master)
        kek_id = base64.b64decode(km["keyEncryptionKeyID"])
        return pcrypt.decrypt_key_locally(km["wrappedDEK"], kek, kek_id)
    except Exception:
        return None


class EncryptedFile:
    """Parsed (and, where needed, decrypted) metadata of one parquet file."""

    def __init__(self, path: str, decryption: FileDecryption | None = None):
        self.path = path
        self.dec = decryption or FileDecryption()
        # mmap, not read(): decode tasks are planned one per (file, row
        # group), so each task touches only its row group's byte ranges —
        # a full read() would re-read and re-fault the whole file per task
        import mmap

        with open(path, "rb") as f:
            try:
                self.raw = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except (ValueError, OSError):  # zero-length or special file
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
        cb = self.md.get(6)
        self.created_by = cb.decode(errors="replace") if cb else None

    # -- keys / algorithm ---------------------------------------------------

    def _load_algorithm(self, alg_union: dict) -> None:
        if 1 in alg_union:
            gcm = alg_union[1]
            self.algorithm = "AES_GCM_V1"
        elif 2 in alg_union:
            # AES_GCM_CTR_V1: same union field shape; page bodies are CTR
            gcm = alg_union[2]
            self.algorithm = "AES_GCM_CTR_V1"
        else:
            raise NotImplementedError(
                "only AES_GCM_V1 / AES_GCM_CTR_V1 are supported"
            )
        stored_prefix = gcm.get(1, b"")
        supply = gcm.get(3, False)
        prefix = self.dec.aad_prefix if (supply or not stored_prefix) else stored_prefix
        self.file_aad = (prefix or b"") + gcm.get(2, b"")

    def _footer_key(self, key_metadata) -> bytes:
        if self.dec.footer_key is not None:
            return self.dec.footer_key
        if key_metadata:
            k = _unwrap_key_material(key_metadata, self.dec, self.path)
            if k is not None:
                return k
        raise ValueError(f"no footer key available for {self.path}")

    def _column_key(self, dotted: str, key_metadata) -> bytes:
        k = self.dec.column_keys.get(dotted)
        if k is not None:
            return k
        if key_metadata:
            k = _unwrap_key_material(key_metadata, self.dec, self.path)
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
        if any(len(leaf.path) != 1 for leaf in self.leaves):
            if self.algorithm is None:
                # plaintext nested file without ARROW:schema (e.g. written by
                # parquet-mr): derive the Arrow schema the same way the
                # conformance reader does
                import pyarrow.parquet as pq

                return pq.ParquetFile(self.path).schema_arrow
            raise NotImplementedError(
                "nested schema without ARROW:schema metadata"
            )
        fields = [
            pa.field(leaf.path[0], _leaf_arrow_type(leaf), leaf.max_def > 0)
            for leaf in self.leaves
        ]
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
        codec = _resolve_codec(md.get(4, 0))
        key = self._chunk_key(rg_ord, col_ord)
        if key is None:
            pages = _plain_page_iter(raw, num_values, self.path, leaf.dotted)
        else:
            pages = _encrypted_page_iter(
                raw, key, self.file_aad, rg_ord, col_ord, num_values,
                has_dict, ctr_pages=self.algorithm == "AES_GCM_CTR_V1",
            )
        return _decode_page_stream(
            pages, num_values, leaf.max_rep, leaf.max_def, leaf.ptype,
            leaf.type_length, codec, raw_levels=raw_levels,
        )


def _encrypted_page_iter(raw, key, file_aad, rg, col, num_values, has_dict,
                         ctr_pages=False):
    """Walk an encrypted chunk: each page is [header module][body module]
    (V1/dict) or [header module][plaintext levels][values module] (V2).
    AAD mismatches surface as InvalidTag — the GCM tag doubles as the
    module-type/ordinal check. With ``ctr_pages`` (AES_GCM_CTR_V1) page
    BODIES decrypt in CTR without tags; headers remain GCM."""
    import zlib

    def body_module(buf, off, aad):
        if ctr_pages:
            return pcrypt.decrypt_module_ctr(key, buf, off)
        return pcrypt.decrypt_module(key, buf, off, aad)

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
            vals_pt, pos = body_module(
                raw,
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
            body_pt, pos = body_module(
                raw, pos,
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
_MINMAX_FMT_UNSIGNED = {"INT32": "<I", "INT64": "<Q"}


def _bounds_fmt(leaf):
    """struct format for ColumnIndex / Statistics bounds of one leaf —
    unsigned logical ints compare in the unsigned domain (mirrors the
    write-side unsigned stats fix; TYPE_DEFINED_ORDER for UINT_* sorts
    unsigned, so the stored bytes exceed the signed max for large values);
    FLOAT16 FLBA-2 bounds decode as IEEE half floats, so float predicates
    on halffloat columns prune numerically."""
    if leaf.unsigned and leaf.ptype in _MINMAX_FMT_UNSIGNED:
        return _MINMAX_FMT_UNSIGNED[leaf.ptype]
    if getattr(leaf, "f16", False) and leaf.ptype == "FIXED_LEN_BYTE_ARRAY":
        return "<e"  # half float
    return _MINMAX_FMT.get(leaf.ptype)


def _page_bounds(cidx, leaf):
    """Decode ColumnIndex min/max byte arrays into comparable values
    (None per page when the page is all-null)."""
    nulls = cidx.get(1, [])
    mins, maxs = cidx.get(2, []), cidx.get(3, [])
    fmt = _bounds_fmt(leaf)
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


def _chunk_stat_bounds(md: dict, leaf) -> tuple | None:
    """(lo, hi) from ColumnMetaData.statistics min_value/max_value (fields
    6/5), or None when absent/unusable. BYTE_ARRAY bounds are raw bytes
    (truncated-with-increment upper bound — still valid bounds)."""
    st = md.get(12)
    if not isinstance(st, dict):
        return None
    mn, mx = st.get(6), st.get(5)
    if mn is None or mx is None:
        return None
    fmt = _bounds_fmt(leaf)
    if fmt is not None:
        if len(mn) != struct.calcsize(fmt) or len(mx) != struct.calcsize(fmt):
            return None
        return struct.unpack(fmt, mn)[0], struct.unpack(fmt, mx)[0]
    if leaf.ptype == "BYTE_ARRAY":
        return bytes(mn), bytes(mx)
    if leaf.ptype == "BOOLEAN" and len(mn) == 1 and len(mx) == 1:
        return bool(mn[0]), bool(mx[0])
    return None


# PageEncodingStats page types / encodings for the dictionary-filter check
_DICT_ENCODINGS = {2, 8}  # PLAIN_DICTIONARY, RLE_DICTIONARY


def _all_pages_dict_encoded(md: dict) -> bool:
    """True when PageEncodingStats (ColumnMetaData field 13) proves every
    data page of the chunk is dictionary-encoded — the
    `DictionaryFilter.hasNonDictionaryPages` precondition. Without encoding
    stats the answer is unknowable from metadata -> False (no veto)."""
    enc_stats = md.get(13)
    if not enc_stats:
        return False
    saw_data = False
    for st in enc_stats:
        ptype, enc = st.get(1), st.get(2)
        if ptype in (0, 3):  # DATA_PAGE / DATA_PAGE_V2
            saw_data = True
            if enc not in _DICT_ENCODINGS:
                return False
    return saw_data


def read_dictionary_values(f: "EncryptedFile", rg_ord: int, col_ord: int):
    """Decode ONE chunk's dictionary page into a pyarrow array of its
    distinct non-null values, or None when the chunk has no dictionary.
    This is the read half of `filter2/dictionarylevel/DictionaryFilter.java`:
    the dictionary is tiny (<=1 MiB) next to the data pages, so reading it
    to veto a row group is the cheapest inconclusive-stats fallback."""
    from .parquet_compat import _decode_plain

    leaf = f.leaves[col_ord]
    md = f.chunk_meta(rg_ord, col_ord)
    dict_off = md.get(11)
    if dict_off is None or dict_off < 0:
        return None
    codec = _resolve_codec(md.get(4, 0))
    key = f._chunk_key(rg_ord, col_ord)
    if key is None:
        h = read_page_header(
            np.frombuffer(f.raw[dict_off : dict_off + 65536], np.uint8), 0
        )
        body = np.frombuffer(
            f.raw[
                dict_off + h.header_len : dict_off + h.header_len + h.compressed_size
            ],
            np.uint8,
        )
    else:
        hdr_pt, end = pcrypt.decrypt_module(
            key, f.raw, dict_off,
            pcrypt.module_aad(f.file_aad, pcrypt.M_DICT_PAGE_HEADER, rg_ord, col_ord),
        )
        h = read_page_header(np.frombuffer(hdr_pt, np.uint8), 0)
        body_pt, _ = pcrypt.decrypt_module(
            key, f.raw, end,
            pcrypt.module_aad(f.file_aad, pcrypt.M_DICT_PAGE, rg_ord, col_ord),
        )
        body = np.frombuffer(body_pt, np.uint8)
    if h.type != 2:
        return None
    if codec is not None:
        body = np.frombuffer(
            codec.decompress(body.tobytes(), h.uncompressed_size), np.uint8
        )
    vals = _decode_plain(body, h.num_values, leaf.ptype, leaf.type_length)
    if leaf.ptype == "BYTE_ARRAY":
        offsets, data = vals
        arr = pa.Array.from_buffers(
            pa.large_binary(), h.num_values,
            [None, pa.py_buffer(np.ascontiguousarray(offsets, np.int64)),
             pa.py_buffer(np.ascontiguousarray(data))],
        )
        return arr
    if leaf.ptype == "FIXED_LEN_BYTE_ARRAY":
        v = np.ascontiguousarray(vals, np.uint8)
        return pa.Array.from_buffers(
            pa.binary(leaf.type_length), h.num_values, [None, pa.py_buffer(v)]
        )
    return pa.array(np.asarray(vals))


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


def _matching_pages(node, bounds, boundary_order: int) -> list[int]:
    """Page ordinals whose bounds may satisfy one predicate leaf.

    When the ColumnIndex declares ASCENDING/DESCENDING boundary_order and
    the leaf is a plain comparison, binary-search the bounds lists instead
    of testing every page (`columnindex/BoundaryOrder.java` eq/lt/gt
    semantics; all-null pages — None bounds — never match a leaf and are
    excluded from the search coordinates). Falls back to the linear scan
    for UNORDERED indexes, set/udp leaves, and mixed-type bounds."""
    from bisect import bisect_left, bisect_right

    from . import predicate as P

    op = getattr(node, "op", None)
    if boundary_order in (1, 2) and op in ("==", "<", "<=", ">", ">="):
        nn = [p for p, b in enumerate(bounds) if b is not None]
        mins = [bounds[p][0] for p in nn]
        maxs = [bounds[p][1] for p in nn]
        if boundary_order == 2:  # DESCENDING: search the reversed lists
            nn, mins, maxs = nn[::-1], mins[::-1], maxs[::-1]
        v = node.value
        same_type = nn and (
            isinstance(v, type(mins[0]))
            or (
                isinstance(v, (int, float))
                and not isinstance(v, bool)
                and isinstance(mins[0], (int, float))
            )
        )
        if isinstance(v, float) and v != v:  # NaN value: linear path
            same_type = False
        if same_type:
            # ascending mins+maxs: each op selects a contiguous page run
            if op == "==":
                lo = bisect_left(maxs, v)  # first page with max >= v
                hi = bisect_right(mins, v)  # first page with min > v
            elif op in ("<", "<="):
                lo = 0
                key = bisect_right if op == "<=" else bisect_left
                hi = key(mins, v)  # pages with min < v (or <= v)
            else:  # > / >=
                key = bisect_left if op == ">=" else bisect_right
                lo = key(maxs, v)  # first page with max > v (or >= v)
                hi = len(nn)
            return sorted(nn[lo:hi])
    return [
        p
        for p, b in enumerate(bounds)
        if (b is not None and P.leaf_vs_bounds(node, b[0], b[1]))
    ]


_FILE_CACHE: dict = {}


def _open_cached(path: str, decryption) -> "EncryptedFile":
    """Per-process EncryptedFile reuse: pipeline.read_parquet_filtered plans
    one task per (file, row group), and Ray's long-lived workers would
    otherwise re-parse the same footer once per row group. Keyed on file
    mtime so rewrites invalidate; the mmap is read-only and shares pages
    across tasks. Bounded (reset at 8 files) — workers touch few distinct
    files at a time."""
    import os as _os

    try:
        mt = _os.path.getmtime(path)
    except OSError:
        mt = None
    key = (path, mt, id(decryption) if decryption is not None else None)
    f = _FILE_CACHE.get(key)
    if f is None:
        if len(_FILE_CACHE) >= 8:
            _FILE_CACHE.clear()
        f = EncryptedFile(path, decryption)
        _FILE_CACHE[key] = f
    return f


def read_table_filtered(
    path: str,
    predicate,
    columns: list[str] | None = None,
    decryption: FileDecryption | None = None,
    row_groups: list[int] | None = None,
    use_dictionary_filter: bool = True,
) -> pa.Table:
    """Predicate-pushdown read of a parquet FILE driven by OUR ColumnIndex /
    OffsetIndex parsing (the filter2/columnindex page-skipping surface,
    `internal/filter2/columnindex/ColumnIndexFilter.java` semantics).

    ``predicate`` is anything predicate.normalize accepts: the legacy
    ``[(col, op, value), ...]`` conjunction list or a full And/Or/Not tree
    with In/NotIn/UserPredicate leaves (`filter2/predicate/Operators.java`
    algebra). Row groups are vetoed by chunk statistics, then bloom filters
    (equality leaves), then — when stats are inconclusive and
    PageEncodingStats prove the chunk fully dictionary-encoded — by reading
    the dictionary page itself (`filter2/dictionarylevel/
    DictionaryFilter.java`). Surviving row groups prune pages through the
    RowRanges calculus (And intersects, Or unions per-branch intervals);
    the exact filter runs after decode. Predicate columns excluded from
    ``columns`` are decoded for the mask and dropped from the result.
    Flat predicate columns; plaintext or encrypted files."""
    from . import predicate as P

    tree = P.normalize(predicate)
    f = _open_cached(path, decryption)
    schema = f.arrow_schema()
    leaf_ord = {leaf.dotted: i for i, leaf in enumerate(f.leaves)}
    pred_cols = sorted(P.columns(tree))
    for c in pred_cols:
        if c not in leaf_ord:
            raise ValueError(f"predicate column {c!r} not in {path}")

    def _pred_field(c: str) -> pa.Field:
        """Arrow field for a predicate column: a top-level flat column, or a
        dotted struct leaf (`FilterApi.intColumn("a.b.c")` paths). Repeated
        paths (through list/map) have Dremel record semantics the flat
        filter can't express — rejected like the reference's
        ColumnIndexFilter does for its row-ranges math."""
        lf = f.leaves[leaf_ord[c]]
        if lf.max_rep > 0:
            raise ValueError(f"predicate column {c!r} is under a repeated path")
        if schema.get_field_index(c) >= 0:
            fld = schema.field(c)
            if pa.types.is_nested(fld.type):
                raise ValueError(f"predicate column {c!r} is nested")
            return fld
        # walk struct nesting to the leaf's arrow type
        fld = schema.field(lf.path[0])
        for seg in lf.path[1:]:
            fld = fld.type.field(seg)
        return pa.field(c, fld.type)

    if columns is not None:
        out_names = list(columns)
        extra = [c for c in pred_cols if c not in columns]
        dec_schema = pa.schema(
            [schema.field(c) for c in columns] + [_pred_field(c) for c in extra]
        )
    else:
        extra = [c for c in pred_cols if schema.get_field_index(c) < 0]
        out_names = schema.names if extra else None
        dec_schema = (
            pa.schema(list(schema) + [_pred_field(c) for c in extra])
            if extra
            else schema
        )
    for c in pred_cols:
        _pred_field(c)  # validates flat / non-repeated
    parts = []
    rg_iter = (
        [(i, f.row_groups[i]) for i in row_groups]
        if row_groups is not None
        else list(enumerate(f.row_groups))
    )
    dict_cache: dict = {}

    # PARQUET-251 gate: binary min/max from parquet-mr < 1.8.0 (or files
    # with missing/unparseable created_by) are corrupt and must not prune
    # (CorruptStatistics.shouldIgnoreStatistics)
    from .created_by import should_ignore_statistics

    distrust_binary = should_ignore_statistics(f.created_by, "BYTE_ARRAY")

    def rg_leaf_fn(rg_ord):
        def fn(leaf: P.Leaf) -> bool:
            ci = leaf_ord[leaf.col]
            lf = f.leaves[ci]
            md = f.chunk_meta(rg_ord, ci)
            if leaf.op in ("is_null", "not_null"):
                # Statistics.null_count (field 3) vs ColumnMetaData
                # num_values (field 5, nulls included)
                st = md.get(12)
                nulls = st.get(3) if isinstance(st, dict) else None
                if nulls is None:
                    return True
                if leaf.op == "is_null":
                    return nulls > 0
                return md.get(5, 0) - nulls > 0
            if distrust_binary and lf.ptype in (
                "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"
            ):
                b = None
            else:
                b = _chunk_stat_bounds(md, lf)
            if b is not None and not P.leaf_vs_bounds(leaf, b[0], b[1]):
                return False
            if leaf.op in ("==", "in"):
                filt = read_bloom_filter(f, rg_ord, ci)
                if filt is not None:
                    from .bloom import spec_value_hash

                    vals = leaf.value if leaf.op == "in" else [leaf.value]
                    if not any(
                        bool(
                            filt.might_contain_hashes(
                                spec_value_hash(v, lf.ptype)
                            )[0]
                        )
                        for v in vals
                    ):
                        return False
            if use_dictionary_filter and _all_pages_dict_encoded(md):
                key = (rg_ord, ci)
                if key not in dict_cache:
                    try:
                        dict_cache[key] = read_dictionary_values(f, rg_ord, ci)
                    except Exception:
                        dict_cache[key] = None
                dvals = dict_cache[key]
                if dvals is not None:
                    try:
                        arr = dvals
                        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(
                            arr.type
                        ):
                            vals = (
                                leaf.value
                                if isinstance(leaf.value, tuple)
                                else (leaf.value,)
                            )
                            if any(isinstance(v, str) for v in vals):
                                arr = arr.cast(pa.large_string())
                        if not P.leaf_vs_values(leaf, arr):
                            return False
                    except Exception:
                        pass
            return True

        return fn

    def page_intervals(node, rg_ord, rg_rows, idx_cache):
        from .blocks import _merge_intervals

        if isinstance(node, P.And):
            iv = [(0, rg_rows)]
            for k in node.preds:
                iv = _intersect_intervals(
                    iv, page_intervals(k, rg_ord, rg_rows, idx_cache)
                )
                if not iv:
                    break
            return iv
        if isinstance(node, P.Or):
            out = []
            for k in node.preds:
                out = _merge_intervals(
                    out + page_intervals(k, rg_ord, rg_rows, idx_cache)
                )
            return out
        ci = leaf_ord[node.col]
        parsed = idx_cache.get(node.col)
        if parsed is None:
            parsed = _parse_index(f, rg_ord, ci)
            idx_cache[node.col] = parsed
        if parsed is None:
            return [(0, rg_rows)]
        cidx, oidx = parsed
        locs = oidx.get(1, [])
        firsts = [loc[3] for loc in locs] + [rg_rows]
        if node.op in ("is_null", "not_null"):
            # ColumnIndex null_pages (field 1) + null_counts (field 5)
            null_pages = cidx.get(1, [])
            counts = cidx.get(5, None)
            keep = []
            for p in range(len(locs)):
                if node.op == "not_null":
                    k = not (p < len(null_pages) and null_pages[p])
                else:
                    k = counts[p] > 0 if (counts and p < len(counts)) else True
                if k:
                    keep.append(p)
            return _merge_intervals(
                [(firsts[p], firsts[p + 1]) for p in keep]
            )
        bounds = _page_bounds(cidx, f.leaves[ci])
        keep = _matching_pages(node, bounds, cidx.get(4, 0))
        return _merge_intervals([(firsts[p], firsts[p + 1]) for p in keep])

    for rg_ord, rg in rg_iter:
        rg_rows = rg.get(3)
        if tree is not None and not P.may_match(tree, rg_leaf_fn(rg_ord)):
            continue
        idx_cache = {}
        intervals = (
            page_intervals(tree, rg_ord, rg_rows, idx_cache)
            if tree is not None
            else [(0, rg_rows)]
        )
        if not intervals:
            continue
        cols = []
        for field in dec_schema:
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
            if parsed is not None:
                # PARQUET-246: pre-1.8 parquet-mr DELTA_BYTE_ARRAY pages
                # share prefix state — page-selected decode would be garbage;
                # fall back to the sequential whole-chunk decode
                from .created_by import requires_sequential_reads

                encs = f.chunk_meta(rg_ord, ci).get(2) or []
                if 7 in encs and requires_sequential_reads(f.created_by, 7):
                    parsed = None
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
        tbl = pa.Table.from_arrays(cols, schema=dec_schema)
        parts.append(tbl)
    table = (
        pa.concat_tables(parts)
        if len(parts) > 1
        else (parts[0] if parts else dec_schema.empty_table())
    )
    table = P.filter_table(tree, table)
    if extra:
        table = table.select(out_names)
    return table


def _decode_selected_pages(f, rg_ord, col_ord, locs, page_sel, arrow_t):
    """Decode only the selected data pages of one flat chunk (dictionary
    page always decoded first when present)."""
    from .parquet_compat import _decode_page_stream

    leaf = f.leaves[col_ord]
    md = f.chunk_meta(rg_ord, col_ord)
    codec = _resolve_codec(md.get(4, 0))
    key = f._chunk_key(rg_ord, col_ord)
    dict_off = md.get(11)
    has_dict = dict_off is not None and dict_off >= 0
    if not has_dict and key is None:
        # parquet-mr quirk: dictionary_page_offset is often unset even for
        # dictionary-encoded chunks — the dict page sits at data_page_offset
        # and the OffsetIndex lists only data pages (ParquetMetadataConverter
        # keeps the field optional). Peek the header at the chunk start and
        # claim it as the dictionary when its type says so.
        encodings = md.get(2) or []
        if 2 in encodings or 8 in encodings:  # PLAIN_DICTIONARY / RLE_DICTIONARY
            start = md.get(9)
            if start is not None and start >= 0:
                h0 = read_page_header(
                    np.frombuffer(f.raw[start : start + 65536], np.uint8), 0
                )
                if h0.type == 2:
                    dict_off = start
                    has_dict = True

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


def geospatial_statistics(
    path: str, decryption: "FileDecryption | None" = None
) -> dict:
    """Merged per-column GeospatialStatistics from ColumnMetaData field 17
    (GeospatialStatistics{bbox, geospatial_types}; read shape of
    `ParquetMetadataConverter.fromParquetStatistics:1029-1060`, merge shape
    of `GeospatialStatistics.merge:153-160`).

    Returns {dotted column name: geo.GeospatialStatistics} for every column
    that declares the stats in at least one row group; chunks that omit
    field 17 contribute nothing (our writer omits it exactly when the chunk
    held no non-empty geometries, so the merged bbox stays tight)."""
    from . import geo as geo_mod

    f = EncryptedFile(path, decryption)
    out: dict = {}
    for rg_ord in range(len(f.row_groups)):
        for ci, leaf in enumerate(f.leaves):
            md = f.chunk_meta(rg_ord, ci)
            g = geo_mod.from_footer_dict(md.get(17))
            if g is None:
                continue
            if leaf.dotted in out:
                out[leaf.dotted].merge(g)
            else:
                out[leaf.dotted] = g
    return out


def plan_byte_splits(
    path: str, split_bytes: int, decryption=None
) -> "dict[int, list[int]]":
    """Assign row groups to fixed-size byte splits by midpoint — the
    reference's HDFS-split planning rule
    (ParquetMetadataConverter.filterFileMetaDataByMidpoint,
    parquet-hadoop/.../ParquetMetadataConverter.java:1531-1580): a row
    group belongs to the split whose byte range contains
    ``start + total_compressed/2``, where ``start`` is the first chunk's
    dictionary-page offset when present, else its data-page offset
    (getOffset, ibid.). Every row group lands in exactly one split, so a
    fleet of readers each handed one split covers the file exactly once
    without coordination. Returns {split_ordinal: [row-group ordinals]}."""
    f = EncryptedFile(path, decryption)
    out: dict[int, list[int]] = {}
    for rg_ord in range(len(f.row_groups)):
        ncols = len(f.row_groups[rg_ord][1])
        md0 = f.chunk_meta(rg_ord, 0)
        start = md0.get(9, 0)
        dict_off = md0.get(11)
        if dict_off and 0 < dict_off < start:
            start = dict_off
        total = sum(
            f.chunk_meta(rg_ord, c).get(7, 0) for c in range(ncols)
        )
        out.setdefault(int((start + total // 2) // split_bytes), []).append(rg_ord)
    return out
