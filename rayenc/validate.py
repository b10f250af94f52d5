"""ColumnIndex contract validation.

From-scratch analog of parquet-hadoop's
`hadoop/ColumnIndexValidator.java`: decode every data page of a file and
check the written ColumnIndex/OffsetIndex against the actual page contents
— null_pages flags, per-page null counts, bound containment in the column's
comparator domain (unsigned ints, IEEE half floats, bytewise strings with
truncate/increment uppers), and that a declared ASCENDING/DESCENDING
boundary_order is actually monotone. Returns human-readable violations
instead of throwing, so the CLI can report all of them at once.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parquet_read_enc import (
    EncryptedFile,
    FileDecryption,
    _bounds_fmt,
    _decode_selected_pages,
    _parse_index,
)


def _page_values(f: EncryptedFile, rg: int, ci: int, locs, p: int, arrow_t):
    """Arrow array of ONE data page's values (nulls included)."""
    return _decode_selected_pages(f, rg, ci, locs, [p], arrow_t)


def _actual_bounds(arr: pa.Array, leaf):
    """(min, max) of the non-null page values in the leaf's comparator
    domain, or None when the page has no non-null values."""
    if len(arr) - arr.null_count == 0:
        return None
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        mm = pc.min_max(arr.cast(pa.large_binary()))
        return mm["min"].as_py(), mm["max"].as_py()
    if pa.types.is_boolean(t):
        mm = pc.min_max(arr)
        return int(mm["min"].as_py()), int(mm["max"].as_py())
    mm = pc.min_max(arr)
    return mm["min"].as_py(), mm["max"].as_py()


def _written_bounds(cidx, p: int, leaf):
    fmt = _bounds_fmt(leaf)
    mn, mx = cidx.get(2, [])[p], cidx.get(3, [])[p]
    if fmt is not None:
        return struct.unpack(fmt, mn)[0], struct.unpack(fmt, mx)[0]
    return bytes(mn), bytes(mx)


def validate_column_index(
    path: str, decryption: FileDecryption | None = None
) -> list[str]:
    """All ColumnIndex contract violations in ``path`` (empty = valid).

    Flat leaves are fully checked (bounds, null counts, null_pages,
    boundary_order); nested leaves are checked for index shape only, since
    per-page row alignment under repetition needs record assembly."""
    f = EncryptedFile(path, decryption)
    schema = f.arrow_schema()
    issues: list[str] = []
    for rg in range(len(f.row_groups)):
        for ci, leaf in enumerate(f.leaves):
            idx = _parse_index(f, rg, ci)
            if idx is None:
                continue
            cidx, oidx = idx
            where = f"rg {rg} col {leaf.dotted}"
            nulls = cidx.get(1, [])
            mins, maxs = cidx.get(2, []), cidx.get(3, [])
            counts = cidx.get(5, [])
            locs = oidx.get(1, [])
            if not (len(nulls) == len(mins) == len(maxs) == len(locs)):
                issues.append(
                    f"{where}: index length mismatch "
                    f"(null_pages {len(nulls)}, mins {len(mins)}, "
                    f"maxs {len(maxs)}, locations {len(locs)})"
                )
                continue
            if leaf.max_rep > 0 or len(leaf.path) > 1:
                continue  # nested: shape-checked only
            try:
                arrow_t = schema.field(leaf.dotted).type
            except KeyError:
                continue
            written = []
            for p in range(len(locs)):
                arr = _page_values(f, rg, ci, locs, p, arrow_t)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                defined = len(arr) - arr.null_count
                if bool(nulls[p]) != (defined == 0):
                    issues.append(
                        f"{where} page {p}: null_pages={bool(nulls[p])} but "
                        f"{defined} non-null values"
                    )
                if p < len(counts) and counts[p] != arr.null_count:
                    issues.append(
                        f"{where} page {p}: null_count {counts[p]} != "
                        f"actual {arr.null_count}"
                    )
                if defined == 0:
                    continue
                got = _actual_bounds(arr, leaf)
                lo, hi = _written_bounds(cidx, p, leaf)
                written.append((lo, hi))
                amn, amx = got
                if isinstance(lo, bytes) and isinstance(amn, str):
                    amn, amx = amn.encode(), amx.encode()
                if isinstance(lo, (int, float)) and isinstance(amn, bool):
                    amn, amx = int(amn), int(amx)
                if amn < lo:
                    issues.append(
                        f"{where} page {p}: value {amn!r} below written "
                        f"min {lo!r}"
                    )
                # truncated uppers were incremented: containment, not equality
                if amx > hi:
                    issues.append(
                        f"{where} page {p}: value {amx!r} above written "
                        f"max {hi!r}"
                    )
            order = cidx.get(4, 0)
            if order == 1 and not _monotone(written, ascending=True):
                issues.append(f"{where}: boundary_order ASCENDING but bounds are not")
            if order == 2 and not _monotone(written, ascending=False):
                issues.append(f"{where}: boundary_order DESCENDING but bounds are not")
    return issues


def _monotone(bounds, ascending: bool) -> bool:
    mins = [b[0] for b in bounds]
    maxs = [b[1] for b in bounds]
    if ascending:
        return all(a <= b for a, b in zip(mins, mins[1:])) and all(
            a <= b for a, b in zip(maxs, maxs[1:])
        )
    return all(a >= b for a, b in zip(mins, mins[1:])) and all(
        a >= b for a, b in zip(maxs, maxs[1:])
    )
