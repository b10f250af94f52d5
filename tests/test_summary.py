"""`_metadata` / `_common_metadata` summary files
(ParquetFileWriter.writeMetadataFile + mergeFooters,
ParquetOutputCommitter) and summary-planned distributed reads."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayenc import parquet_write
from rayenc.summary import (
    COMMON_METADATA,
    METADATA,
    part_files,
    plan_from_summary,
    read_summary,
    write_summary,
)


def _make_dataset(d, n_parts=3, rows=5000):
    os.makedirs(d, exist_ok=True)
    for p in range(n_parts):
        base = p * rows
        t = pa.table(
            {
                "id": pa.array(np.arange(base, base + rows)),
                "grp": pa.array([f"g{(base + i) % 7}" for i in range(rows)]),
                "val": pa.array(np.arange(base, base + rows) * 0.25),
            }
        )
        parquet_write.write_table(
            t, os.path.join(d, f"part-{p:06d}.parquet"), row_group_size=2000
        )
    return d


class TestWriteSummary:
    def test_merged_footer(self, tmp_path):
        d = _make_dataset(str(tmp_path / "ds"))
        out = write_summary(d)
        assert os.path.basename(out) == METADATA
        md = read_summary(d)
        # 3 parts x ceil(5000/2000)=3 row groups
        assert md.num_row_groups == 9
        assert md.num_rows == 15000
        # file_path set per row group, relative names
        fps = {md.row_group(g).column(0).file_path for g in range(9)}
        assert fps == {f"part-{p:06d}.parquet" for p in range(3)}
        # _common_metadata carries the schema only
        common = pq.read_schema(os.path.join(d, COMMON_METADATA))
        assert common.names == ["id", "grp", "val"]

    def test_part_files_excludes_summaries(self, tmp_path):
        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        parts = part_files(d)
        assert len(parts) == 3
        assert all("_metadata" not in p for p in parts)
        # idempotent: re-writing after the summary exists ignores it
        write_summary(d)
        assert read_summary(d).num_row_groups == 9

    def test_schema_conflict_raises(self, tmp_path):
        d = str(tmp_path / "ds")
        os.makedirs(d)
        parquet_write.write_table(
            pa.table({"a": [1, 2]}), os.path.join(d, "part-0.parquet")
        )
        parquet_write.write_table(
            pa.table({"b": ["x"]}), os.path.join(d, "part-1.parquet")
        )
        with pytest.raises(ValueError, match="could not merge"):
            write_summary(d)


def test_cli_write_summary(tmp_path, capsys):
    from rayenc import cli

    d = _make_dataset(str(tmp_path / "ds"), n_parts=2)

    class A:
        dir = d

    assert cli.cmd_write_summary(A()) == 0
    assert "merged 2 part footers" in capsys.readouterr().out
    assert read_summary(d).num_row_groups == 6


class TestPlanFromSummary:
    def test_plan_covers_all_without_predicate(self, tmp_path):
        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        plan = plan_from_summary(d)
        assert len(plan) == 9
        # row-group ordinals are per part file
        from collections import Counter

        per_file = Counter(p for p, _ in plan)
        assert set(per_file.values()) == {3}
        assert sorted(rg for p, rg in plan if p.endswith("part-000001.parquet")) == [0, 1, 2]

    def test_predicate_prunes_row_groups(self, tmp_path):
        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        # id is globally sorted across parts: one row group matches
        plan = plan_from_summary(d, [("id", "==", 7100)])
        assert len(plan) == 1
        path, rg = plan[0]
        assert path.endswith("part-000001.parquet") and rg == 1

    def test_range_predicate_spans_parts(self, tmp_path):
        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        plan = plan_from_summary(d, [("id", ">", 4500), ("id", "<", 5500)])
        files = {os.path.basename(p) for p, _ in plan}
        assert files == {"part-000000.parquet", "part-000001.parquet"}
        assert len(plan) == 2  # last rg of part 0, first rg of part 1


class TestDistributedSummaryRead:
    def test_matches_direct_filtered_read(self, ray_session, tmp_path):
        from rayenc.parquet_read_enc import read_table_filtered
        from rayenc.pipeline import read_parquet_summary

        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        pred = [("id", ">=", 3000), ("id", "<", 9000)]
        got = (
            read_parquet_summary(d, pred, columns=["id", "val"])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = pa.concat_tables(
            [
                read_table_filtered(p, pred, columns=["id", "val"])
                for p in part_files(d)
            ]
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert got.equals(want)
        assert len(got) == 6000

    def test_no_predicate_reads_everything(self, ray_session, tmp_path):
        from rayenc.pipeline import read_parquet_summary

        d = _make_dataset(str(tmp_path / "ds"))
        write_summary(d)
        ds = read_parquet_summary(d)
        assert ds.count() == 15000


def _lake(tmp_path):
    import os

    d = str(tmp_path / "lake")
    os.makedirs(d)
    for i in range(3):
        pq.write_table(
            pa.table({"k": pa.array([i * 10 + j for j in range(10)], pa.int64())}),
            f"{d}/f{i}.parquet",
        )
    return d


def test_summary_stale_part_replanned_live(ray_session, tmp_path):
    # a part rewritten AFTER the summary must not be pruned by its stale
    # summary stats (silently wrong results) — the staleness sidecar
    # detects the change and that part replans from its live footer
    import time

    from rayenc import pipeline, summary

    d = _lake(tmp_path)
    summary.write_summary(d)
    time.sleep(0.02)
    pq.write_table(
        pa.table({"k": pa.array(list(range(100, 140)), pa.int64())}),
        f"{d}/f1.parquet",
    )
    assert pipeline.read_parquet_summary(d, [("k", ">=", 100)]).count() == 40
    assert pipeline.read_parquet_summary(d, [("k", ">=", 0)]).count() == 60


def test_summary_new_part_planned_live(ray_session, tmp_path):
    from rayenc import pipeline, summary

    d = _lake(tmp_path)
    summary.write_summary(d)
    pq.write_table(
        pa.table({"k": pa.array(list(range(200, 210)), pa.int64())}),
        f"{d}/f9.parquet",
    )
    assert pipeline.read_parquet_summary(d, [("k", ">=", 200)]).count() == 10
    assert pipeline.read_parquet_summary(d).count() == 40


def test_summary_deleted_part_raises(ray_session, tmp_path):
    import os

    import pytest as _pytest

    from rayenc import pipeline, summary

    d = _lake(tmp_path)
    summary.write_summary(d)
    os.remove(f"{d}/f2.parquet")
    with _pytest.raises(FileNotFoundError, match="no longer exists"):
        pipeline.read_parquet_summary(d, [("k", ">=", 0)]).count()
