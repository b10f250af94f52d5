"""Dataset summary files — `_metadata` / `_common_metadata`.

The reference writes these through `ParquetFileWriter.writeMetadataFile` +
`mergeFooters` (ParquetFileWriter.java:2222-2301) from the job committer
(`ParquetOutputCommitter.java`): `_metadata` is one footer holding every
part file's row groups with `ColumnChunk.file_path` set to the part's
relative name; `_common_metadata` is the schema-only footer.  Readers plan
an entire multi-file scan — including row-group predicate pruning — from
ONE footer instead of opening every part footer, which is the difference
between one small read and ~100k footer reads on a lake-scale dataset.

mergeFooters semantics kept: all parts must share one schema
(`GlobalMetaData.merge` throws on mismatch); key-value metadata is merged
with conflicting values dropped (ParquetFileWriter.mergeInto strict=false
behavior).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

METADATA = "_metadata"
COMMON_METADATA = "_common_metadata"


def part_files(dir_path: str) -> list[str]:
    """Data files of a dataset directory, sorted; `_`-prefixed (summary,
    markers) and hidden files excluded like parquet-mr's hiddenFileFilter."""
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def write_summary(dir_path: str, paths: list[str] | None = None) -> str:
    """Write `_metadata` + `_common_metadata` for the part files in
    ``dir_path`` (ParquetFileWriter.writeMetadataFile).  Returns the
    `_metadata` path."""
    paths = paths if paths is not None else part_files(dir_path)
    if not paths:
        raise ValueError(f"no parquet part files under {dir_path}")
    merged = None
    schema = None
    for p in paths:
        md = pq.read_metadata(p)
        if schema is None:
            schema = md.schema.to_arrow_schema()
        elif not md.schema.to_arrow_schema().equals(schema, check_metadata=False):
            # GlobalMetaData.merge: "could not merge metadata: key
            # parquet.schema has conflicting values"
            raise ValueError(
                f"could not merge footers: schema of {p} conflicts with "
                f"{paths[0]}"
            )
        md.set_file_path(os.path.relpath(p, dir_path))
        if merged is None:
            merged = md
        else:
            merged.append_row_groups(md)
    out = os.path.join(dir_path, METADATA)
    merged.write_metadata_file(out)
    pq.write_metadata(schema, os.path.join(dir_path, COMMON_METADATA))
    return out


def read_summary(dir_path: str):
    """Parsed `_metadata` FileMetaData for a dataset directory."""
    return pq.read_metadata(os.path.join(dir_path, METADATA))


def _rg_bounds(rg_meta, name_to_idx: dict[str, int], col: str):
    """(min, max, null_count) of one column in one summary row group, or
    None components when statistics are absent."""
    i = name_to_idx.get(col)
    if i is None:
        return None, None, None
    st = rg_meta.column(i).statistics
    if st is None:
        return None, None, None
    mn = st.min if st.has_min_max else None
    mx = st.max if st.has_min_max else None
    nulls = st.null_count if st.has_null_count else None
    return mn, mx, nulls


def plan_from_summary(
    dir_path: str, predicate=None
) -> list[tuple[str, int]]:
    """(part path, row-group ordinal WITHIN its part) for every row group
    that may match ``predicate``, planned purely from `_metadata` — no part
    footer is opened.  Pruning runs the same three-valued stats veto the
    per-file path uses (predicate.leaf_vs_bounds over And/Or/Not trees)."""
    from . import predicate as P

    md = read_summary(dir_path)
    tree = P.normalize(predicate) if predicate is not None else None
    name_to_idx: dict[str, int] = {}
    if md.num_row_groups:
        rg0 = md.row_group(0)
        name_to_idx = {
            rg0.column(i).path_in_schema: i for i in range(rg0.num_columns)
        }
    out: list[tuple[str, int]] = []
    local_ord: dict[str, int] = {}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        fp = rg.column(0).file_path
        ordn = local_ord.get(fp, 0)
        local_ord[fp] = ordn + 1
        if tree is not None:

            def leaf_fn(leaf) -> bool:
                mn, mx, nulls = _rg_bounds(rg, name_to_idx, leaf.col)
                if leaf.op == "is_null":
                    return nulls is None or nulls > 0
                if leaf.op == "not_null":
                    if nulls is None:
                        return True
                    return rg.num_rows - nulls > 0
                if mn is None or mx is None:
                    return True
                return P.leaf_vs_bounds(leaf, mn, mx)

            if not P.may_match(tree, leaf_fn):
                continue
        out.append((os.path.join(dir_path, fp), ordn))
    return out
