"""Parse parquet message-type text syntax -> SchemaElement dicts.

The inverse of ``parquet_read_enc.format_message_type`` — the reference's
``MessageTypeParser.java`` (parquet-column/.../schema/MessageTypeParser.java)
grammar, from scratch:

    message <name> {
      required|optional|repeated group <name> [(ANNOTATION)] [= id] { ... }
      required|optional|repeated <primitive> <name> [(ANNOTATION)] [= id];
    }

Primitives: ``boolean int32 int64 int96 float double binary
fixed_len_byte_array(N)`` (``binary`` == BYTE_ARRAY).  Annotations accept
both the modern ``LogicalTypeAnnotation`` spellings (``STRING``,
``DECIMAL(p,s)``, ``TIMESTAMP(MICROS,true)``, ``INTEGER(8,false)``, ...)
and the legacy ``OriginalType`` names (``UTF8``, ``TIMESTAMP_MICROS``,
``UINT_8``, ...) like the reference parser does.

Output is the same numeric-keyed thrift-dict shape the footer parser
produces (SchemaElement fields: 1 type, 2 type_length, 3 repetition,
4 name, 5 num_children, 6 converted_type, 7 scale, 8 precision,
9 field_id, 10 logicalType), so ``format_message_type(parse(s)) == s``
round-trips and the elements slot into every existing schema consumer.
``message_type_to_arrow`` maps a parsed message type onto an Arrow schema
for the write path (``cli encode --schema``).
"""

from __future__ import annotations

import re

import pyarrow as pa

_PTYPE_ID = {
    "boolean": 0, "int32": 1, "int64": 2, "int96": 3,
    "float": 4, "double": 5, "binary": 6, "fixed_len_byte_array": 7,
}
_REP_ID = {"required": 0, "optional": 1, "repeated": 2}
_UNIT_ID = {"MILLIS": 1, "MICROS": 2, "NANOS": 3}

_TOKEN = re.compile(r"[{}();,=]|[^\s{}();,=]+")


def _tokens(text: str):
    return _TOKEN.findall(text)


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokens(text)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of message type")
        self.pos += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")
        return t


def _apply_annotation(e: dict, name: str, args: list[str]) -> None:
    """Set logicalType (field 10) + legacy converted_type (field 6) for one
    annotation, mirroring LogicalTypeAnnotation <-> ConvertedType mapping."""
    up = name.upper()
    if up in ("STRING", "UTF8"):
        e[10] = {1: {}}
        e[6] = 0
    elif up == "MAP":
        e[10] = {2: {}}
        e[6] = 1
    elif up == "MAP_KEY_VALUE":
        e[6] = 2
    elif up == "LIST":
        e[10] = {3: {}}
        e[6] = 3
    elif up == "ENUM":
        e[10] = {4: {}}
        e[6] = 4
    elif up == "DECIMAL":
        p, s = (int(args[0]), int(args[1]) if len(args) > 1 else 0) if args else (10, 0)
        e[10] = {5: {1: s, 2: p}}
        e[6] = 5
        e[7] = s
        e[8] = p
    elif up == "DATE":
        e[10] = {6: {}}
        e[6] = 6
    elif up in ("TIME", "TIMESTAMP"):
        unit = args[0].upper() if args else "MILLIS"
        utc = (args[1].lower() == "true") if len(args) > 1 else True
        fid = 7 if up == "TIME" else 8
        e[10] = {fid: {1: utc, 2: {_UNIT_ID[unit]: {}}}}
        if utc and unit in ("MILLIS", "MICROS"):  # legacy has no NANOS/local
            base = {"TIME": {"MILLIS": 7, "MICROS": 8},
                    "TIMESTAMP": {"MILLIS": 9, "MICROS": 10}}[up]
            e[6] = base[unit]
    elif up in ("TIME_MILLIS", "TIME_MICROS", "TIMESTAMP_MILLIS",
                "TIMESTAMP_MICROS"):
        kind, unit = up.split("_")
        _apply_annotation(e, kind, [unit, "true"])
    elif up == "INTEGER":
        width = int(args[0]) if args else 32
        signed = (args[1].lower() == "true") if len(args) > 1 else True
        e[10] = {10: {1: width, 2: signed}}
        e[6] = {8: 11, 16: 12, 32: 13, 64: 14}[width] + (4 if signed else 0)
    elif re.fullmatch(r"U?INT_(8|16|32|64)", up):
        signed = not up.startswith("U")
        _apply_annotation(e, "INTEGER", [up.rsplit("_", 1)[1], str(signed).lower()])
    elif up == "JSON":
        e[10] = {12: {}}
        e[6] = 19
    elif up == "BSON":
        e[10] = {13: {}}
        e[6] = 20
    elif up == "UUID":
        e[10] = {14: {}}
    elif up == "FLOAT16":
        e[10] = {15: {}}
    elif up == "VARIANT":
        e[10] = {16: {}}
    elif up == "GEOMETRY":
        e[10] = {17: {}}
    elif up == "GEOGRAPHY":
        e[10] = {18: {}}
    elif up == "INTERVAL":
        e[6] = 21
    else:
        raise ValueError(f"unknown annotation {name!r}")


def _parse_annotation(p: _Parser, e: dict) -> None:
    if p.peek() != "(":
        return
    p.next()
    name = p.next()
    args: list[str] = []
    if p.peek() == "(":
        p.next()
        while p.peek() != ")":
            t = p.next()
            if t != ",":
                args.append(t)
        p.expect(")")
    p.expect(")")
    _apply_annotation(e, name, args)


def _parse_field_id(p: _Parser, e: dict) -> None:
    if p.peek() == "=":
        p.next()
        e[9] = int(p.next())


def _parse_field(p: _Parser, elems: list) -> None:
    rep = p.next()
    if rep not in _REP_ID:
        raise ValueError(f"expected repetition, got {rep!r}")
    t = p.next()
    if t == "group":
        e = {3: _REP_ID[rep], 4: p.next(), 5: 0}
        _parse_annotation(p, e)
        _parse_field_id(p, e)
        elems.append(e)
        p.expect("{")
        while p.peek() != "}":
            _parse_field(p, elems)
            e[5] += 1
        p.expect("}")
        return
    if t not in _PTYPE_ID:
        raise ValueError(f"unknown primitive type {t!r}")
    e = {1: _PTYPE_ID[t], 3: _REP_ID[rep]}
    if t == "fixed_len_byte_array":
        p.expect("(")
        e[2] = int(p.next())
        p.expect(")")
    e[4] = p.next()
    _parse_annotation(p, e)
    _parse_field_id(p, e)
    p.expect(";")
    elems.append(e)


def parse_message_type(text: str) -> list:
    """Message-type text -> SchemaElement thrift-dict list (root first,
    depth-first — the footer layout ``format_message_type`` consumes)."""
    p = _Parser(text)
    p.expect("message")
    name = p.next()
    root = {4: name, 5: 0}
    elems = [root]
    p.expect("{")
    while p.peek() != "}":
        _parse_field(p, elems)
        root[5] += 1
    p.expect("}")
    if p.peek() is not None:
        raise ValueError(f"trailing tokens after message: {p.peek()!r}")
    return elems


# ------------------------------------------------------ arrow conversion

_TIME_ARROW = {1: pa.time32("ms"), 2: pa.time64("us"), 3: pa.time64("ns")}
_TS_ARROW = {1: "ms", 2: "us", 3: "ns"}


def _leaf_arrow(e: dict) -> pa.DataType:
    lt = e.get(10) or {}
    conv = e.get(6)
    pt = e[1]
    if 5 in lt or conv == 5:  # DECIMAL
        d = lt.get(5, {})
        prec = d.get(2, e.get(8, 10))
        scale = d.get(1, e.get(7, 0))
        return pa.decimal128(prec, scale) if prec <= 38 else pa.decimal256(prec, scale)
    if pt == 0:
        return pa.bool_()
    if pt == 1:
        if 10 in lt:
            width, signed = lt[10].get(1, 32), lt[10].get(2, True)
            return {
                (8, True): pa.int8(), (16, True): pa.int16(),
                (32, True): pa.int32(), (8, False): pa.uint8(),
                (16, False): pa.uint16(), (32, False): pa.uint32(),
            }[(width, signed)]
        if 6 in lt or conv == 6:
            return pa.date32()
        if 7 in lt or conv == 7:
            return pa.time32("ms")
        return pa.int32()
    if pt == 2:
        if 10 in lt:
            return pa.int64() if lt[10].get(2, True) else pa.uint64()
        if 7 in lt:
            return _TIME_ARROW[next(iter(lt[7].get(2, {2: {}})))]
        if conv == 8:
            return pa.time64("us")
        if 8 in lt:
            unit = _TS_ARROW[next(iter(lt[8].get(2, {2: {}})))]
            return pa.timestamp(unit, "UTC" if lt[8].get(1) else None)
        if conv in (9, 10):
            return pa.timestamp("ms" if conv == 9 else "us", "UTC")
        return pa.int64()
    if pt == 3:
        # a declared int96 leaf maps to timestamp[ns]; the writer emits
        # INT64 unless EncodeConfig(int96_timestamps=True) opts into the
        # deprecated 12-byte physical layout
        return pa.timestamp("ns")
    if pt == 4:
        return pa.float32()
    if pt == 5:
        return pa.float64()
    if pt == 6:
        if 1 in lt or 4 in lt or 12 in lt or conv in (0, 4, 19):
            return pa.string()
        return pa.binary()
    if pt == 7:
        if 15 in lt:
            return pa.float16()
        return pa.binary(e.get(2, 0))
    raise ValueError(f"unknown physical type {pt}")


def message_type_to_arrow(src: "str | list") -> pa.Schema:
    """Message-type text (or parsed elements) -> Arrow schema.  Standard
    3-level LIST and MAP group shapes map to ``pa.list_`` / ``pa.map_``;
    plain groups map to structs; a bare ``repeated`` field maps to a list
    of its type (legacy 2-level layout)."""
    elems = parse_message_type(src) if isinstance(src, str) else src
    pos = 1

    def raw() -> tuple[pa.Field, int]:
        """One schema node -> (field WITHOUT the repeated wrap, repetition).
        The caller decides how a ``repeated`` node nests (list element vs
        legacy 2-level list)."""
        nonlocal pos
        e = elems[pos]
        pos += 1
        rep = e.get(3, 0)
        name = e[4] if isinstance(e.get(4), str) else e.get(4, b"").decode()
        nchild = e.get(5, 0)
        if not nchild:
            return pa.field(name, _leaf_arrow(e), rep != 0), rep
        lt = e.get(10) or {}
        conv = e.get(6)
        if (3 in lt or conv == 3) and nchild == 1:
            cf, crep = raw()
            if crep != 2:
                raise ValueError(f"LIST group {name!r} child must be repeated")
            if pa.types.is_struct(cf.type) and cf.type.num_fields == 1:
                # standard 3-level: unwrap the repeated level to the element
                elem = cf.type.field(0)
            else:
                elem = cf  # 2-level legacy: the repeated node IS the element
            t = pa.list_(pa.field("element", elem.type, elem.nullable))
            return pa.field(name, t, rep == 1), rep
        if (2 in lt or conv in (1, 2)) and nchild == 1:
            cf, crep = raw()
            if crep != 2 or not pa.types.is_struct(cf.type) or cf.type.num_fields != 2:
                raise ValueError(f"MAP group {name!r} needs a repeated key_value pair")
            t = pa.map_(cf.type.field(0).type, cf.type.field(1).type)
            return pa.field(name, t, rep == 1), rep
        children = []
        for _ in range(nchild):
            cf, crep = raw()
            if crep == 2:  # legacy repeated field inside a plain group
                cf = pa.field(cf.name, pa.list_(cf.type), False)
            children.append(cf)
        return pa.field(name, pa.struct(children), rep == 1), rep

    fields = []
    root = elems[0]
    for _ in range(root.get(5, 0)):
        f, rep = raw()
        if rep == 2:
            f = pa.field(f.name, pa.list_(f.type), False)
        fields.append(f)
    return pa.schema(fields)
