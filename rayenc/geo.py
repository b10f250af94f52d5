"""Geospatial statistics for GEOMETRY columns (Geospatial.md).

Re-expresses parquet-java's geospatial statistics surface
(`parquet-column/src/main/java/org/apache/parquet/column/statistics/
geospatial/BoundingBox.java`, `GeospatialTypes.java`,
`GeospatialStatistics.java` and the footer conversion in
`parquet-hadoop/.../format/converter/ParquetMetadataConverter.java:856-884,
995-1027`) without JTS: a small from-scratch WKB envelope parser (ISO WKB
and EWKB, both byte orders) feeds per-chunk `BoundingBox` + geometry-type
sets, which the writer serializes as ColumnMetaData field 17
(`GeospatialStatistics{1: bbox, 2: geospatial_types}` in parquet.thrift).

Semantics mirrored from the reference:

- bbox starts at (+inf, -inf) per dimension and is only ever widened;
  empty geometries are skipped entirely (`BoundingBox.update:273-275`).
- X/Y NaN bounds mark the box invalid; an invalid box is dropped from the
  footer, and z/m bounds are emitted only when finite values were seen
  (`toParquetBoundingBox:856-884`).
- merging a wraparound X range (xmin > xmax, allowed by the spec for
  antimeridian-crossing boxes) poisons X to NaN (`BoundingBox.merge:238`).
- geometry type codes are `dimension_prefix + base` with XY=0, XYZ=+1000,
  XYM=+2000, XYZM=+3000 and base 1..7 = Point..GeometryCollection
  (`GeospatialTypes.java:148-182`); an unknown type invalidates the set.
- unparseable WKB values are skipped with a warning, matching
  `GeospatialStatistics.Builder.update:60-66`.

Only GEOMETRY columns collect statistics; GEOGRAPHY columns get a noop
builder exactly like `GeospatialStatistics.newBuilder:94-104` (edge
interpolation over the sphere needs a geodesy library the reference also
does not ship for stats purposes).
"""

from __future__ import annotations

import math
import struct
import warnings
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_INF = math.inf

# EWKB dimension / srid flags (PostGIS extended WKB)
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

#: EdgeInterpolationAlgorithm enum (parquet.thrift)
EDGE_SPHERICAL, EDGE_VINCENTY, EDGE_THOMAS, EDGE_ANDOYER, EDGE_KARNEY = range(5)


class WKBParseError(ValueError):
    pass


@dataclass(frozen=True)
class GeoSpec:
    """Per-column geospatial declaration (LogicalType GEOMETRY/GEOGRAPHY).

    kind: "geometry" collects bbox+types stats; "geography" writes the
    logical type only (noop stats, `GeospatialStatistics.newBuilder`).
    crs: optional CRS string stored in the logical type (default per spec
    is OGC:CRS84 when absent). algorithm: geography edge interpolation.
    """

    kind: str = "geometry"
    crs: str | None = None
    algorithm: int | None = None

    def __post_init__(self):
        if self.kind not in ("geometry", "geography"):
            raise ValueError(f"GeoSpec kind {self.kind!r}")


class BoundingBox:
    """X/Y/Z/M envelope with the reference's validity + wraparound rules."""

    __slots__ = ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax",
                 "mmin", "mmax", "valid")

    def __init__(self, xmin=_INF, xmax=-_INF, ymin=_INF, ymax=-_INF,
                 zmin=_INF, zmax=-_INF, mmin=_INF, mmax=-_INF):
        self.xmin, self.xmax = xmin, xmax
        self.ymin, self.ymax = ymin, ymax
        self.zmin, self.zmax = zmin, zmax
        self.mmin, self.mmax = mmin, mmax
        self.valid = self.is_xy_valid()

    # -- validity (NaN poisoning) and emptiness (never-updated dims) --
    def is_x_valid(self):
        return not (math.isnan(self.xmin) or math.isnan(self.xmax))

    def is_y_valid(self):
        return not (math.isnan(self.ymin) or math.isnan(self.ymax))

    def is_xy_valid(self):
        return self.is_x_valid() and self.is_y_valid()

    def is_z_valid(self):
        return not (math.isnan(self.zmin) or math.isnan(self.zmax))

    def is_m_valid(self):
        return not (math.isnan(self.mmin) or math.isnan(self.mmax))

    def is_x_empty(self):
        return math.isinf(self.xmin - self.xmax)

    def is_y_empty(self):
        return math.isinf(self.ymin - self.ymax)

    def is_xy_empty(self):
        return self.is_x_empty() or self.is_y_empty()

    def is_z_empty(self):
        return math.isinf(self.zmin - self.zmax)

    def is_m_empty(self):
        return math.isinf(self.mmin - self.mmax)

    @staticmethod
    def is_wraparound(xmin, xmax):
        """Spec-legal antimeridian boxes have xmin > xmax (e.g. Fiji)."""
        return not math.isinf(xmin - xmax) and xmin > xmax

    def is_x_wraparound(self):
        return self.is_wraparound(self.xmin, self.xmax)

    def _reset(self):
        self.xmin = self.ymin = self.zmin = self.mmin = _INF
        self.xmax = self.ymax = self.zmax = self.mmax = -_INF

    def abort(self):
        self.valid = False
        self._reset()

    def update_coords(self, xs, ys, zs=None, ms=None):
        """Widen by coordinate arrays (one parsed geometry). NaN x/y
        coordinates leave that dimension untouched (JTS envelope +
        `updateBounds:315-331` conditional-update semantics); z/m track
        only finite values (`update:280-289`)."""
        if not self.valid or len(xs) == 0:
            return
        xmn, xmx = np.nanmin(xs), np.nanmax(xs)
        if not (math.isnan(xmn) or math.isnan(xmx)):
            self.xmin = min(self.xmin, float(xmn))
            self.xmax = max(self.xmax, float(xmx))
        ymn, ymx = np.nanmin(ys), np.nanmax(ys)
        if not (math.isnan(ymn) or math.isnan(ymx)):
            self.ymin = min(self.ymin, float(ymn))
            self.ymax = max(self.ymax, float(ymx))
        for vals, lo, hi in ((zs, "zmin", "zmax"), (ms, "mmin", "mmax")):
            if vals is not None and len(vals):
                mn, mx = np.nanmin(vals), np.nanmax(vals)
                if not (math.isnan(mn) or math.isnan(mx)):
                    setattr(self, lo, min(getattr(self, lo), float(mn)))
                    setattr(self, hi, max(getattr(self, hi), float(mx)))
        self.valid = self.is_xy_valid()

    def merge(self, other: "BoundingBox | None"):
        """`BoundingBox.merge:224-258`: invalid poisons; wraparound X on
        either side degrades X to NaN (merge of wraparound unsupported)."""
        if not self.valid:
            return
        if other is None or not other.valid:
            self.abort()
            return
        # Java Math.min/max propagate NaN from either operand
        def mn(a, b):
            return math.nan if (math.isnan(a) or math.isnan(b)) else min(a, b)

        def mx(a, b):
            return math.nan if (math.isnan(a) or math.isnan(b)) else max(a, b)

        if self.is_x_wraparound() or other.is_x_wraparound():
            self.xmin = self.xmax = math.nan
        else:
            self.xmin = mn(self.xmin, other.xmin)
            self.xmax = mx(self.xmax, other.xmax)
        self.ymin = mn(self.ymin, other.ymin)
        self.ymax = mx(self.ymax, other.ymax)
        self.zmin = mn(self.zmin, other.zmin)
        self.zmax = mx(self.zmax, other.zmax)
        self.mmin = mn(self.mmin, other.mmin)
        self.mmax = mx(self.mmax, other.mmax)
        self.valid = self.is_xy_valid()

    def copy(self):
        return BoundingBox(self.xmin, self.xmax, self.ymin, self.ymax,
                           self.zmin, self.zmax, self.mmin, self.mmax)

    def __repr__(self):
        s = (f"BoundingBox(x=[{self.xmin}, {self.xmax}], "
             f"y=[{self.ymin}, {self.ymax}]")
        if not self.is_z_empty():
            s += f", z=[{self.zmin}, {self.zmax}]"
        if not self.is_m_empty():
            s += f", m=[{self.mmin}, {self.mmax}]"
        return s + ("" if self.valid else ", valid=False") + ")"


_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
               5: "MultiLineString", 6: "MultiPolygon",
               7: "GeometryCollection"}


class GeospatialTypes:
    """Set of geometry type codes seen (`GeospatialTypes.java`)."""

    __slots__ = ("types", "valid")

    def __init__(self, types=None, valid=True):
        self.types: set[int] = set(types or ())
        self.valid = valid

    def update(self, code: int):
        if not self.valid:
            return
        if code % 1000 in _TYPE_NAMES:
            self.types.add(code)
        else:
            self.valid = False
            self.types.clear()

    def merge(self, other: "GeospatialTypes | None"):
        if not self.valid:
            return
        if other is None or not other.valid:
            self.valid = False
            self.types.clear()
            return
        self.types |= other.types

    def abort(self):
        self.valid = False
        self.types.clear()

    def copy(self):
        return GeospatialTypes(set(self.types), self.valid)

    def __repr__(self):
        names = []
        for t in sorted(self.types):
            dim = {0: "XY", 1: "XYZ", 2: "XYM", 3: "XYZM"}.get(t // 1000, "?")
            names.append(f"{_TYPE_NAMES.get(t % 1000, 'Unknown')} ({dim})")
        return "GeospatialTypes{" + ", ".join(names) + "}"


class GeospatialStatistics:
    """bbox + type set for one chunk; merge() re-aggregates across chunks
    / row groups exactly like `GeospatialStatistics.merge:153-160`."""

    __slots__ = ("bbox", "types")

    def __init__(self, bbox: BoundingBox | None = None,
                 types: GeospatialTypes | None = None):
        self.bbox = BoundingBox() if bbox is None else bbox
        self.types = GeospatialTypes() if types is None else types

    def update_wkb(self, value: bytes | None):
        if value is None:
            return
        try:
            code, xs, ys, zs, ms = parse_wkb(bytes(value))
        except WKBParseError as e:
            warnings.warn(f"unparseable WKB skipped in geospatial stats: {e}",
                          stacklevel=2)
            return
        if len(xs) == 0:  # empty geometry: no bbox, no type recorded
            return
        self.bbox.update_coords(xs, ys, zs, ms)
        self.types.update(code)

    def merge(self, other: "GeospatialStatistics"):
        self.bbox.merge(other.bbox)
        self.types.merge(other.types)

    def is_valid(self):
        return self.bbox.valid or self.types.valid

    def copy(self):
        return GeospatialStatistics(self.bbox.copy(), self.types.copy())

    def __repr__(self):
        return f"GeospatialStatistics({self.bbox!r}, {self.types!r})"


# ------------------------------------------------------------- WKB parsing


def _header(buf, pos):
    """Parse one geometry header -> (pos, endian, base_type, has_z, has_m)."""
    if pos + 5 > len(buf):
        raise WKBParseError("truncated header")
    order = buf[pos]
    if order not in (0, 1):
        raise WKBParseError(f"byte order {order}")
    end = "<" if order == 1 else ">"
    (raw,) = struct.unpack_from(end + "I", buf, pos + 1)
    pos += 5
    if raw & _EWKB_SRID:
        pos += 4  # skip SRID (EWKB)
    has_z = bool(raw & _EWKB_Z)
    has_m = bool(raw & _EWKB_M)
    base = raw & 0x0FFFFFFF & ~(_EWKB_Z | _EWKB_M) & 0xFFFF
    if base >= 1000:  # ISO WKB dimension encoding
        dim_code = base // 1000
        base %= 1000
        has_z = has_z or dim_code in (1, 3)
        has_m = has_m or dim_code in (2, 3)
    return pos, end, base, has_z, has_m


def _coords(buf, pos, end, n, dim, acc):
    nbytes = n * dim * 8
    if pos + nbytes > len(buf):
        raise WKBParseError("truncated coordinates")
    a = np.frombuffer(buf, dtype=end + "f8", count=n * dim, offset=pos)
    acc.append((a.reshape(n, dim), dim))
    return pos + nbytes


def _parse_geom(buf, pos, acc):
    """Recursive WKB walk; appends (coords[n,dim], dim) blocks with the
    geometry's has_z/has_m noted through dim layout. Returns
    (pos, base_type, has_z, has_m)."""
    pos, end, base, has_z, has_m = _header(buf, pos)
    dim = 2 + has_z + has_m
    if base == 1:  # Point
        pos = _coords(buf, pos, end, 1, dim, acc)
        pt, _ = acc[-1]
        if math.isnan(pt[0, 0]) and math.isnan(pt[0, 1]):
            acc.pop()  # POINT EMPTY (NaN coords): contributes nothing
    elif base == 2:  # LineString
        (n,) = struct.unpack_from(end + "I", buf, pos)
        pos = _coords(buf, pos + 4, end, n, dim, acc)
    elif base == 3:  # Polygon
        (nrings,) = struct.unpack_from(end + "I", buf, pos)
        pos += 4
        for _ in range(nrings):
            (n,) = struct.unpack_from(end + "I", buf, pos)
            pos = _coords(buf, pos + 4, end, n, dim, acc)
    elif base in (4, 5, 6, 7):  # Multi* / GeometryCollection
        (n,) = struct.unpack_from(end + "I", buf, pos)
        pos += 4
        for _ in range(n):
            pos, _, cz, cm = _parse_geom(buf, pos, acc)
            has_z, has_m = has_z or cz, has_m or cm
    else:
        raise WKBParseError(f"geometry type {base}")
    return pos, base, has_z, has_m


def parse_wkb(value: bytes):
    """Parse one WKB blob -> (type_code, xs, ys, zs|None, ms|None).

    type_code carries the dimension prefix (+1000 Z, +2000 M, +3000 ZM)
    of the outer geometry, `GeospatialTypes.getGeometryTypeCode` shape.
    Empty geometries return zero-length coordinate arrays."""
    try:
        pos, base, has_z, has_m = _parse_geom(value, 0, acc := [])
    except (struct.error, IndexError) as e:
        raise WKBParseError(str(e)) from None
    if pos > len(value):
        raise WKBParseError("truncated geometry")
    code = base + (1000 if has_z else 0) + (2000 if has_m else 0)
    if not acc:
        z = np.empty(0)
        return code, z, z, None, None
    xs = np.concatenate([c[:, 0] for c, _ in acc])
    ys = np.concatenate([c[:, 1] for c, _ in acc])
    zs = ms = None
    if has_z:
        parts = [c[:, 2] for c, d in acc if d >= 3]
        zs = np.concatenate(parts) if parts else None
    if has_m:
        # m is the last dimension: index 3 for XYZM, 2 for XYM
        parts = [c[:, d - 1] for c, d in acc if d >= 3]
        ms = np.concatenate(parts) if parts else None
    return code, xs, ys, zs, ms


_LE_XY_POINT_HDR = b"\x01\x01\x00\x00\x00"


def compute_statistics(arr) -> GeospatialStatistics:
    """GeospatialStatistics over one Arrow binary array (a column chunk).

    Fast path: a column of little-endian XY points (the overwhelmingly
    common case at scale — 21-byte WKB) is parsed in one vectorized
    numpy pass; anything else falls back to the per-value recursive
    parser, which is bounded by geometry complexity, not row count."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    stats = GeospatialStatistics()
    n = len(arr)
    if n == 0:
        return stats
    null_count = arr.null_count
    if null_count == n:
        return stats
    # uniform 21-byte LE XY points?
    odt = "<i8" if pa.types.is_large_binary(arr.type) else "<i4"
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=odt, count=n + 1 + arr.offset
    )[arr.offset:]
    if null_count == 0 and (np.diff(offsets) == 21).all():
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                             count=int(offsets[-1]))[int(offsets[0]):]
        recs = data.reshape(n, 21)
        if (recs[:, :5] == np.frombuffer(_LE_XY_POINT_HDR, np.uint8)).all():
            xy = np.ascontiguousarray(recs[:, 5:21]).view("<f8").reshape(n, 2)
            finite = ~(np.isnan(xy[:, 0]) & np.isnan(xy[:, 1]))
            if finite.any():
                stats.bbox.update_coords(xy[finite, 0], xy[finite, 1])
                stats.types.update(1)
            return stats
    for v in arr:
        stats.update_wkb(v.as_py() if v.is_valid else None)
    return stats


# --------------------------------------------- footer (de)serialization glue


def to_footer_dict(stats: GeospatialStatistics) -> dict | None:
    """GeospatialStatistics -> thrift-field dict for ColumnMetaData field 17
    ({1: bbox{1:xmin..8:mmax}, 2: [codes]}), applying the reference's
    omission rules (`toParquetGeospatialStatistics:995-1027`,
    `toParquetBoundingBox:856-884`): invalid/empty bbox omitted, z/m only
    when seen, empty/invalid type list omitted, all-empty -> None."""
    out: dict = {}
    bb = stats.bbox
    if bb is not None and bb.valid and not bb.is_xy_empty():
        b = {1: bb.xmin, 2: bb.xmax, 3: bb.ymin, 4: bb.ymax}
        if bb.is_z_valid() and not bb.is_z_empty():
            b[5], b[6] = bb.zmin, bb.zmax
        if bb.is_m_valid() and not bb.is_m_empty():
            b[7], b[8] = bb.mmin, bb.mmax
        out[1] = b
    if stats.types is not None and stats.types.valid and stats.types.types:
        out[2] = sorted(stats.types.types)
    return out or None


def from_footer_dict(d: dict | None) -> GeospatialStatistics | None:
    """Inverse of to_footer_dict (`fromParquetStatistics:1029-1060`):
    missing bbox fields decode as NaN -> invalid per dimension."""
    if d is None:
        return None
    bbox = None
    if 1 in d:
        b = d[1]
        bbox = BoundingBox(
            b.get(1, math.nan), b.get(2, math.nan),
            b.get(3, math.nan), b.get(4, math.nan),
            b.get(5, math.nan), b.get(6, math.nan),
            b.get(7, math.nan), b.get(8, math.nan),
        )
    types = GeospatialTypes(d[2]) if 2 in d else None
    return GeospatialStatistics(bbox or BoundingBox(),
                                types or GeospatialTypes())
