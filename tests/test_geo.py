"""Geospatial statistics (rayenc/geo.py): WKB parsing, BoundingBox /
GeospatialTypes semantics, footer round-trip through our writer+reader.

Mirrors the reference's test coverage in
parquet-column/src/test/java/org/apache/parquet/column/statistics/geospatial/
(TestBoundingBox.java, TestGeospatialTypes.java, TestGeospatialStatistics.java)
without JTS: WKB fixtures are built by hand with struct.pack.
"""

import math
import struct

import numpy as np
import pyarrow as pa
import pytest

from rayenc import geo, parquet_write
from rayenc.parquet_compat import read_table_conformance  # noqa: F401
from rayenc.parquet_read_enc import (
    geospatial_statistics,
    read_table_encrypted,
)
from rayenc.selector import EncodeConfig


# ------------------------------------------------------------- WKB builders


def wkb_point(x, y, z=None, m=None, big_endian=False):
    end = ">" if big_endian else "<"
    code = 1 + (1000 if z is not None else 0) + (2000 if m is not None else 0)
    coords = [x, y] + ([z] if z is not None else []) + (
        [m] if m is not None else []
    )
    return (
        (b"\x00" if big_endian else b"\x01")
        + struct.pack(end + "I", code)
        + struct.pack(end + f"{len(coords)}d", *coords)
    )


def wkb_linestring(coords, big_endian=False):
    end = ">" if big_endian else "<"
    dim = len(coords[0]) if coords else 2
    code = 2 + {2: 0, 3: 1000, 4: 3000}[dim]
    out = (b"\x00" if big_endian else b"\x01") + struct.pack(
        end + "II", code, len(coords)
    )
    for c in coords:
        out += struct.pack(end + f"{dim}d", *c)
    return out


def wkb_polygon(rings):
    out = b"\x01" + struct.pack("<II", 3, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for c in ring:
            out += struct.pack("<2d", *c)
    return out


def wkb_multipoint(points):
    out = b"\x01" + struct.pack("<II", 4, len(points))
    for p in points:
        out += wkb_point(*p)
    return out


def wkb_collection(members):
    out = b"\x01" + struct.pack("<II", 7, len(members))
    for m in members:
        out += m
    return out


def ewkb_point_z(x, y, z, srid=4326):
    # PostGIS EWKB: flag bits + inline SRID
    return b"\x01" + struct.pack("<I", 1 | 0x80000000 | 0x20000000) + \
        struct.pack("<I", srid) + struct.pack("<3d", x, y, z)


# -------------------------------------------------------------- WKB parsing


def test_parse_point_xy():
    code, xs, ys, zs, ms = geo.parse_wkb(wkb_point(3.0, -7.5))
    assert code == 1
    assert xs.tolist() == [3.0] and ys.tolist() == [-7.5]
    assert zs is None and ms is None


def test_parse_point_big_endian():
    code, xs, ys, _, _ = geo.parse_wkb(wkb_point(1.5, 2.5, big_endian=True))
    assert code == 1 and xs.tolist() == [1.5] and ys.tolist() == [2.5]


def test_parse_point_zm_codes():
    assert geo.parse_wkb(wkb_point(0, 0, z=1.0))[0] == 1001
    assert geo.parse_wkb(wkb_point(0, 0, z=1.0, m=2.0))[0] == 3001
    code, _, _, zs, ms = geo.parse_wkb(wkb_point(0, 0, z=9.0, m=4.0))
    assert zs.tolist() == [9.0] and ms.tolist() == [4.0]
    assert code == 3001


def test_parse_ewkb_srid_z():
    code, xs, ys, zs, _ = geo.parse_wkb(ewkb_point_z(10.0, 20.0, 30.0))
    assert code == 1001
    assert xs.tolist() == [10.0] and zs.tolist() == [30.0]


def test_parse_polygon_and_multi():
    poly = wkb_polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]])
    code, xs, ys, _, _ = geo.parse_wkb(poly)
    assert code == 3
    assert xs.max() == 4.0 and ys.max() == 4.0
    mp = wkb_multipoint([(1, 2), (-5, 3)])
    code, xs, ys, _, _ = geo.parse_wkb(mp)
    assert code == 4 and xs.min() == -5.0


def test_parse_geometry_collection():
    coll = wkb_collection([wkb_point(1, 1), wkb_linestring([(0, 0), (9, 9)])])
    code, xs, ys, _, _ = geo.parse_wkb(coll)
    assert code == 7
    assert xs.max() == 9.0 and xs.min() == 0.0


def test_parse_empty_geometries():
    # POINT EMPTY: NaN coordinates
    code, xs, _, _, _ = geo.parse_wkb(wkb_point(math.nan, math.nan))
    assert code == 1 and len(xs) == 0
    # LINESTRING EMPTY / MULTIPOINT EMPTY: zero counts
    assert len(geo.parse_wkb(wkb_linestring([]))[1]) == 0
    assert len(geo.parse_wkb(wkb_multipoint([]))[1]) == 0


def test_parse_errors():
    with pytest.raises(geo.WKBParseError):
        geo.parse_wkb(b"\x02\x01\x00\x00\x00")  # bad byte order
    with pytest.raises(geo.WKBParseError):
        geo.parse_wkb(wkb_point(1, 2)[:-4])  # truncated coords
    with pytest.raises(geo.WKBParseError):
        geo.parse_wkb(b"\x01" + struct.pack("<I", 99))  # unknown type


# -------------------------------------------------- BoundingBox (reference)


def test_bbox_update_and_validity():
    bb = geo.BoundingBox()
    assert bb.is_xy_empty() and bb.valid
    bb.update_coords(np.array([1.0, 5.0]), np.array([2.0, -3.0]))
    assert (bb.xmin, bb.xmax, bb.ymin, bb.ymax) == (1.0, 5.0, -3.0, 2.0)
    assert not bb.is_xy_empty()


def test_bbox_merge_invalid_poisons():
    # TestBoundingBox: merging an invalid box invalidates and resets
    bb = geo.BoundingBox(0, 1, 0, 1)
    bad = geo.BoundingBox(math.nan, math.nan, 0, 1)
    assert not bad.valid
    bb.merge(bad)
    assert not bb.valid and bb.is_xy_empty()
    # further merges are no-ops once invalid
    bb.merge(geo.BoundingBox(0, 1, 0, 1))
    assert not bb.valid


def test_bbox_merge_wraparound_nans_x():
    # spec-legal antimeridian box (xmin > xmax) can't be merged: X -> NaN,
    # Y still merges (BoundingBox.merge:238-254)
    fiji = geo.BoundingBox(170.0, -170.0, -20.0, -15.0)
    assert fiji.is_x_wraparound() and fiji.valid
    bb = geo.BoundingBox(0, 1, 0, 1)
    bb.merge(fiji)
    assert math.isnan(bb.xmin) and math.isnan(bb.xmax)
    assert bb.ymin == -20.0 and bb.ymax == 1.0
    assert not bb.valid  # NaN X marks the box invalid


def test_bbox_z_m_tracked_independently():
    bb = geo.BoundingBox()
    bb.update_coords(np.array([0.0]), np.array([0.0]), zs=np.array([5.0]))
    bb.update_coords(np.array([1.0]), np.array([1.0]), ms=np.array([-2.0]))
    assert (bb.zmin, bb.zmax) == (5.0, 5.0)
    assert (bb.mmin, bb.mmax) == (-2.0, -2.0)
    assert not bb.is_z_empty() and not bb.is_m_empty()


# ---------------------------------------------- GeospatialTypes (reference)


def test_types_update_merge_invalid():
    t = geo.GeospatialTypes()
    t.update(1)
    t.update(1001)
    assert t.types == {1, 1001}
    other = geo.GeospatialTypes({3007})
    t.merge(other)
    assert t.types == {1, 1001, 3007}
    t.update(999)  # unknown base type code invalidates
    assert not t.valid and t.types == set()
    t.merge(other)  # stays invalid
    assert not t.valid


# ------------------------------------------------- statistics accumulation


def test_compute_statistics_fast_path_points():
    vals = [wkb_point(float(i), float(-i)) for i in range(100)]
    stats = geo.compute_statistics(pa.array(vals, pa.binary()))
    assert stats.bbox.xmin == 0.0 and stats.bbox.xmax == 99.0
    assert stats.bbox.ymin == -99.0 and stats.bbox.ymax == 0.0
    assert stats.types.types == {1}


def test_compute_statistics_mixed_and_nulls():
    vals = [
        wkb_point(1.0, 2.0),
        None,
        wkb_linestring([(0, 0, 5), (4, 4, -2)]),
        wkb_point(math.nan, math.nan),  # empty: skipped entirely
    ]
    stats = geo.compute_statistics(pa.array(vals, pa.binary()))
    assert (stats.bbox.xmin, stats.bbox.xmax) == (0.0, 4.0)
    assert (stats.bbox.zmin, stats.bbox.zmax) == (-2.0, 5.0)
    assert stats.types.types == {1, 1002}


def test_compute_statistics_unparseable_warns_and_skips():
    vals = [wkb_point(1.0, 1.0), b"\xff\xffgarbage"]
    with pytest.warns(UserWarning, match="unparseable WKB"):
        stats = geo.compute_statistics(pa.array(vals, pa.binary()))
    # matches GeospatialStatistics.Builder.update:60-66 (warn + omit)
    assert stats.bbox.xmax == 1.0 and stats.types.types == {1}


# ------------------------------------------------------ footer (de)serialize


def test_footer_dict_omission_rules():
    # invalid bbox dropped; valid types kept (toParquetGeospatialStatistics)
    s = geo.GeospatialStatistics()
    s.update_wkb(wkb_point(1, 2))
    s.bbox.xmin = math.nan
    s.bbox.valid = False
    d = geo.to_footer_dict(s)
    assert 1 not in d and d[2] == [1]
    # z/m omitted when never seen
    s2 = geo.GeospatialStatistics()
    s2.update_wkb(wkb_point(1, 2))
    d2 = geo.to_footer_dict(s2)
    assert set(d2[1]) == {1, 2, 3, 4}
    # all-empty -> None
    assert geo.to_footer_dict(geo.GeospatialStatistics()) is None


def test_footer_dict_roundtrip():
    s = geo.GeospatialStatistics()
    s.update_wkb(wkb_point(1, 2, z=3.0))
    s.update_wkb(wkb_point(-4, 8, z=0.5))
    back = geo.from_footer_dict(geo.to_footer_dict(s))
    assert (back.bbox.xmin, back.bbox.xmax) == (-4.0, 1.0)
    assert (back.bbox.zmin, back.bbox.zmax) == (0.5, 3.0)
    assert back.types.types == {1001}


# ------------------------------------------------------- file round trip


def _write_geo_file(tmp_path, vals, kind="geometry", rg=None):
    t = pa.table({
        "id": pa.array(range(len(vals)), pa.int64()),
        "g": pa.array(vals, pa.binary()),
    })
    cfg = EncodeConfig(
        geospatial={"g": geo.GeoSpec(kind, crs="OGC:CRS84")}
    )
    path = str(tmp_path / "geo.parquet")
    parquet_write.write_table(t, path, config=cfg, row_group_size=rg)
    return path, t


def test_file_roundtrip_stats_and_values(tmp_path):
    vals = [wkb_point(float(i % 7) - 3, float(i % 11)) for i in range(50)]
    path, t = _write_geo_file(tmp_path, vals, rg=20)
    got = read_table_encrypted(path)
    assert got.column("g").to_pylist() == vals
    st = geospatial_statistics(path)
    assert set(st) == {"g"}
    bb = st["g"].bbox
    assert (bb.xmin, bb.xmax) == (-3.0, 3.0)
    assert (bb.ymin, bb.ymax) == (0.0, 10.0)
    assert st["g"].types.types == {1}


def test_file_stats_multi_row_group_merge(tmp_path):
    # row group 0: points near origin; row group 1: a far linestring
    vals = [wkb_point(0.0, 0.0), wkb_point(1.0, 1.0),
            wkb_linestring([(50.0, -50.0), (60.0, -60.0)]), None]
    path, _ = _write_geo_file(tmp_path, vals, rg=2)
    st = geospatial_statistics(path)
    bb = st["g"].bbox
    assert (bb.xmin, bb.xmax) == (0.0, 60.0)
    assert (bb.ymin, bb.ymax) == (-60.0, 1.0)
    assert st["g"].types.types == {1, 2}


def test_geography_column_noop_stats(tmp_path):
    # GEOGRAPHY: logical type stamped, stats are noop
    # (GeospatialStatistics.newBuilder:98-100)
    vals = [wkb_point(1.0, 2.0)]
    path, _ = _write_geo_file(tmp_path, vals, kind="geography")
    assert geospatial_statistics(path) == {}
    got = read_table_encrypted(path)
    assert got.column("g").to_pylist() == vals


def test_duckdb_still_reads_geo_file(tmp_path):
    # unknown ColumnMetaData field 17 must be skippable by foreign readers;
    # DuckDB reads the file (pyarrow 16 predates GEOMETRY and rejects the
    # logical type union member — expected for pre-2.11 readers)
    import duckdb

    vals = [wkb_point(float(i), 0.0) for i in range(10)]
    path, _ = _write_geo_file(tmp_path, vals)
    n, mx = duckdb.sql(
        f"select count(*), max(id) from read_parquet('{path}')"
    ).fetchall()[0]
    assert (n, mx) == (10, 9)


def test_cli_show_geospatial_statistics(tmp_path, capsys):
    from rayenc.cli import main

    vals = [wkb_point(5.0, 6.0), wkb_point(-1.0, 2.0)]
    path, _ = _write_geo_file(tmp_path, vals)
    main(["show-geospatial-statistics", path])
    out = capsys.readouterr().out
    assert "file g:" in out and "x=[-1.0, 5.0]" in out and "Point (XY)" in out


# ----------------------------------------------------- property (hypothesis)


from hypothesis import given, settings
from hypothesis import strategies as st

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(finite, finite), min_size=1, max_size=20),
    st.booleans(),
)
def test_property_multipoint_bbox(coords, big_endian):
    """bbox of a multipoint == numpy min/max of its coordinates, either
    byte order."""
    out = (b"\x00" if big_endian else b"\x01") + struct.pack(
        (">" if big_endian else "<") + "II", 4, len(coords)
    )
    for x, y in coords:
        out += wkb_point(x, y, big_endian=big_endian)
    stats = geo.GeospatialStatistics()
    stats.update_wkb(out)
    xs = np.array([c[0] for c in coords])
    ys = np.array([c[1] for c in coords])
    assert stats.bbox.xmin == xs.min() and stats.bbox.xmax == xs.max()
    assert stats.bbox.ymin == ys.min() and stats.bbox.ymax == ys.max()
    assert stats.types.types == {4}


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(finite, finite, finite), min_size=1, max_size=12))
def test_property_linestring_z_roundtrip_through_footer(coords):
    """footer dict round trip preserves the XYZ envelope exactly."""
    s = geo.GeospatialStatistics()
    s.update_wkb(wkb_linestring(coords))
    back = geo.from_footer_dict(geo.to_footer_dict(s))
    for f in ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax"):
        assert getattr(back.bbox, f) == getattr(s.bbox, f)
    assert back.types.types == {1002}
