"""Ray Data encode / decode / verify pipelines with checkpoint-resume.

The engine's job lifecycle (SURVEY.md §3.3 "our lifecycle"):

    plan_partitions(parquet paths)        deterministic (file, row-group,
                                          row-range) descriptors
    -> ray.data.from_items(descriptors)
    -> map_batches(EncodeWorker, ...)     actor pool; each call reads its
                                          fragment, encodes one block, writes
                                          blob + manifest atomically
    -> summary Dataset (tiny)             per-partition metrics

Parallelism comes from Ray Data's streaming executor — the reference has no
distributed runtime of its own and leans on Hadoop/Spark tasks
(`ParquetInputFormat.java:342-390`); our unit of work mirrors its row-group
split. Checkpointing: a partition is complete iff its manifest file exists
and references an existing blob; `plan_partitions` + the `resume` filter skip
completed work, which is what a re-submitted `ray job submit` run does.

Determinism: encode is a pure function of (fragment bytes, config), so Ray
task retries and resumed runs produce byte-identical blobs (required for the
resume-equality tests; mirrors the determinism note in SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from . import blocks, parquet_compat
from .selector import EncodeConfig

DEFAULT_TARGET_BLOCK_BYTES = 64 << 20  # raw bytes per encode partition


# ------------------------------------------------------------------ planning


def default_staging_dir(staging_dir: str | None, prefix: str) -> str:
    """Resolve a staging directory, refusing the node-local /tmp default on
    a multi-node cluster — a path only one node can see would silently
    stage a fraction of the data. Pass a shared-filesystem path instead."""
    if staging_dir is not None:
        return staging_dir
    import tempfile

    alive = [n for n in ray.nodes() if n.get("Alive", False)]
    if len(alive) > 1:
        raise ValueError(
            f"{len(alive)} alive nodes but no staging_dir given: the "
            "node-local /tmp default is not visible to other nodes — pass "
            "a shared filesystem path"
        )
    return tempfile.mkdtemp(prefix=prefix, dir="/tmp")


def _plan_file(path: str, target_block_bytes: int) -> list[dict]:
    """Partition descriptors for ONE file (footer metadata only)."""
    md = pq.ParquetFile(path).metadata
    descs: list[dict] = []
    cur_rgs: list[int] = []
    cur_bytes = 0
    for rg in range(md.num_row_groups):
        rg_meta = md.row_group(rg)
        rg_bytes = rg_meta.total_byte_size
        if rg_bytes > target_block_bytes * 2 and rg_meta.num_rows > 1:
            if cur_rgs:
                descs.append({"path": path, "row_groups": cur_rgs})
                cur_rgs, cur_bytes = [], 0
            # split one giant row group into row ranges
            nsplit = int(np.ceil(rg_bytes / target_block_bytes))
            rows = rg_meta.num_rows
            step = (rows + nsplit - 1) // nsplit
            for s in range(0, rows, step):
                descs.append(
                    {
                        "path": path,
                        "row_groups": [rg],
                        "row_start": s,
                        "row_count": min(step, rows - s),
                    }
                )
            continue
        if cur_bytes + rg_bytes > target_block_bytes and cur_rgs:
            descs.append({"path": path, "row_groups": cur_rgs})
            cur_rgs, cur_bytes = [], 0
        cur_rgs.append(rg)
        cur_bytes += rg_bytes
    if cur_rgs:
        descs.append({"path": path, "row_groups": cur_rgs})
    return descs


def plan_partitions(
    paths: list[str] | str,
    target_block_bytes: int = DEFAULT_TARGET_BLOCK_BYTES,
    parallel: bool | None = None,
) -> list[dict]:
    """Deterministic partition descriptors from parquet row groups.

    One partition = one or more consecutive row groups of one file (small row
    groups coalesce up to the target), or a row-range slice of one row group
    (giant row groups split). Partition ids are stable across runs.

    ``parallel``: read footers with Ray tasks instead of a driver loop —
    ParquetInputFormat's parallel summary reading. Default: on above 64
    files (100 TB lakes have 10^4–10^5 files; serial footer parsing would
    be minutes of driver time). Determinism is unchanged — descriptors are
    ordered by sorted path regardless of task completion order."""
    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)
    if parallel is None:
        parallel = len(paths) > 64
    if parallel and paths:
        plan_one = ray.remote(num_cpus=0.25)(_plan_file)
        per_file = ray.get(
            [plan_one.remote(p, target_block_bytes) for p in paths]
        )
        descs = [d for file_descs in per_file for d in file_descs]
    else:
        descs = [
            d for p in paths for d in _plan_file(p, target_block_bytes)
        ]
    for pid, d in enumerate(descs):
        d["pid"] = pid
    return descs


def _read_fragment(desc: dict, columns=None) -> pa.Table:
    f = pq.ParquetFile(desc["path"], memory_map=True)
    rgs = [int(r) for r in desc["row_groups"]]
    align = desc.get("align_schema")
    schema = None
    if align:
        # evolved-schema ingestion (encode_evolved_job): read only the
        # union columns this file has, widen/null-fill to the union after
        schema = pa.ipc.read_schema(pa.py_buffer(bytes(align)))
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        have = set(f.schema_arrow.names)
        columns = [c for c in schema.names if c in have]
    table = f.read_row_groups(rgs, columns=columns, use_threads=False)
    if int(desc.get("row_start", -1)) >= 0:
        table = table.slice(int(desc["row_start"]), int(desc["row_count"]))
    if schema is not None:
        table = parquet_compat.align_table(table, schema)
    return table


# ------------------------------------------------------------------- workers


class EncodeWorker:
    """Stateful actor: holds config; reads a fragment, encodes, writes
    blob+manifest atomically, emits a summary row (SURVEY.md §7.2)."""

    def __init__(self, out_dir: str, config: EncodeConfig | None = None, columns=None):
        from .memtune import tune_process_memory

        tune_process_memory()
        self.out_dir = out_dir
        self.config = config or EncodeConfig()
        self.columns = columns
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: dict) -> dict:
        rows = []
        n = len(batch["pid"])
        for k in range(n):
            desc = {key: _unbox(batch[key][k]) for key in batch}
            rows.append(self.encode_one(desc))
        return {key: np.array([r[key] for r in rows]) for key in rows[0]}

    def encode_one(self, desc: dict) -> dict:
        pid = int(desc["pid"])
        t0 = time.perf_counter()
        table = _read_fragment(desc, self.columns)
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        blob, manifest = blocks.encode_block(table, self.config)
        t_enc = time.perf_counter() - t0
        manifest["lineage"] = {
            "path": desc["path"],
            "row_groups": [int(r) for r in desc["row_groups"]],
            "row_start": int(desc.get("row_start", -1)),
            "row_count": int(desc.get("row_count", -1)),
        }
        manifest["pid"] = pid
        manifest["timings"] = {"read_s": t_read, "encode_s": t_enc}
        blob_name = f"part-{pid:06d}.renc"
        _atomic_write(os.path.join(self.out_dir, blob_name), blob)
        manifest["blob"] = blob_name
        _atomic_write(
            os.path.join(self.out_dir, f"part-{pid:06d}.manifest.json"),
            json.dumps(manifest).encode(),
        )
        return {
            "pid": pid,
            "rows": table.num_rows,
            "raw_bytes": manifest["raw_bytes"],
            "blob_bytes": len(blob),
            "read_s": t_read,
            "encode_s": t_enc,
        }


class DecodeWorker:
    """Streams container partitions back as Arrow tables, with read-side
    pruning: ``columns`` decodes only the needed chunks, ``predicate`` both
    skips whole partitions via manifest min/max statistics (the column-index /
    row-group skipping of `filter2/compat` + `internal/filter2/columnindex`)
    and applies the exact row filter after decode."""

    def __init__(self, out_dir: str, columns=None, predicate=None,
                 dictionary_strings: bool = False,
                 bad_block_threshold: float | None = None,
                 total_partitions: int | None = None):
        from .memtune import tune_process_memory
        from . import predicate as P

        tune_process_memory()
        self.out_dir = out_dir
        self.columns = list(columns) if columns else None
        # legacy conjunction list OR an And/Or/Not tree (filter2 algebra)
        self.pred = P.normalize(predicate)
        self.pred_cols = P.columns(self.pred)
        self.dictionary_strings = dictionary_strings
        # error-tolerant reads (UnmaterializableRecordCounter /
        # parquet.read.bad.record.threshold, per worker like the
        # reference's per-split counter): None = raise on the first bad
        # partition; a fraction in [0,1] tolerates that share of the
        # partitions THIS worker has seen, then raises
        self.bad_block_threshold = bad_block_threshold
        # denominator: the job's partition count (the reference's counter
        # divides by the split's total record count, known up front)
        self.total_partitions = total_partitions
        self._seen = 0
        self._bad = 0

    def _skip_by_stats(self, manifest: dict) -> bool:
        from . import predicate as P

        if self.pred is None:
            return False
        chunks = {c["name"]: c for c in manifest["chunks"]}

        def leaf_fn(leaf: P.Leaf) -> bool:
            entry = chunks.get(leaf.col)
            if entry is None:
                return True
            # bloom veto for equality-style leaves before stats
            if leaf.op in ("==", "in") and entry.get("bloom"):
                from . import bloom

                filt = bloom.BloomFilter.deserialize(entry["bloom"])
                vals = leaf.value if leaf.op == "in" else [leaf.value]
                if not any(
                    bool(filt.might_contain_hashes(bloom.value_hash(v))[0])
                    for v in vals
                ):
                    return False
            st = entry.get("stats")
            if leaf.op in ("is_null", "not_null"):
                # exact null-count veto (stats carry defined + null counts)
                if not st:
                    return True
                if leaf.op == "is_null":
                    return st.get("null_count", 1) > 0
                return st.get("num_values", 1) > 0
            if not st or st.get("min") is None:
                return True
            lo, hi = st["min"], st["max"]
            if isinstance(lo, str):
                # binary min/max are stored latin-1 (bytewise order
                # preserved, max truncated-with-increment —
                # ColumnIndexBuilder semantics). Manifests from before
                # stats_v=2 stored lossy utf-8-replace strings that are NOT
                # valid bounds — never skip on those.
                if st.get("stats_v", 1) < 2:
                    return True
                lo, hi = lo.encode("latin-1"), hi.encode("latin-1")
            return P.leaf_vs_bounds(leaf, lo, hi)

        return not P.may_match(self.pred, leaf_fn)

    def __call__(self, batch: dict):
        from . import predicate as P

        for name in batch["manifest"]:
            self._seen += 1
            try:
                manifest = json.loads(
                    open(os.path.join(self.out_dir, str(name)), "rb").read()
                )
                if self._skip_by_stats(manifest):
                    continue
                with open(os.path.join(self.out_dir, manifest["blob"]), "rb") as f:
                    blob = f.read()
                # decode predicate columns even when the projection excludes
                # them (the mask must see every referenced column; dropped
                # after the filter)
                decode_cols = self.columns
                if self.columns is not None and self.pred is not None:
                    decode_cols = self.columns + [
                        c for c in sorted(self.pred_cols) if c not in self.columns
                    ]
                table = blocks.decode_block(
                    blob, manifest, columns=decode_cols, page_predicate=self.pred,
                    dictionary_strings=self.dictionary_strings,
                )
            except Exception as exc:
                # UnmaterializableRecordCounter semantics
                # (hadoop/UnmaterializableRecordCounter.java): tolerate up
                # to bad_block_threshold of this worker's partitions, then
                # fail the task
                self._bad += 1
                if self.bad_block_threshold is None:
                    raise
                denom = self.total_partitions or self._seen
                if self._bad > self.bad_block_threshold * denom:
                    raise RuntimeError(
                        f"bad partition rate {self._bad}/{denom} exceeds "
                        f"threshold {self.bad_block_threshold}: {name}: {exc!r}"
                    ) from exc
                import logging

                logging.getLogger(__name__).warning(
                    "skipping unreadable partition %s: %r", name, exc
                )
                continue
            if self.pred is not None:
                table = P.filter_table(self.pred, table)
                if decode_cols is not self.columns:
                    table = table.select(self.columns)
            if table.num_rows:
                yield table


_WORKER_CACHE: dict = {}


def _encode_batch_task(batch: dict, *, out_dir: str, config=None, columns=None) -> dict:
    """Task-mode UDF: reuses a per-process EncodeWorker so Ray's long-lived
    worker processes keep warm heaps across tasks and across jobs (this host
    re-cools freed pages; see rayenc/memtune.py). Stateless semantics are
    unchanged — encode is a pure function of (fragment, config)."""
    key = ("enc", out_dir, repr(config), tuple(columns) if columns else None)
    w = _WORKER_CACHE.get(key)
    if w is None:
        w = EncodeWorker(out_dir, config, columns)
        _WORKER_CACHE[key] = w
    return w(batch)


def _decode_batch_task(batch: dict, *, out_dir: str, columns=None, predicate=None,
                       dictionary_strings: bool = False,
                       bad_block_threshold: float | None = None,
                       total_partitions: int | None = None):
    key = ("dec", out_dir, tuple(columns) if columns else None, repr(predicate),
           dictionary_strings, bad_block_threshold)
    w = _WORKER_CACHE.get(key)
    if w is None:
        w = DecodeWorker(out_dir, columns, predicate, dictionary_strings,
                         bad_block_threshold, total_partitions)
        _WORKER_CACHE[key] = w
    yield from w(batch)


def _unbox(v):
    return v.item() if hasattr(v, "item") and not isinstance(v, (list, np.ndarray)) else v


def _atomic_write(path: str, data: bytes) -> None:
    # re-ensure the directory: workers are cached per (out_dir, config)
    # across jobs in a Ray session, so a user deleting the output dir and
    # re-running the job would otherwise hit FileNotFoundError from the
    # cached worker whose __init__ mkdir ran in a previous job
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------------- jobs


def completed_pids(out_dir: str) -> set[int]:
    """Partitions whose manifest exists and references an existing blob."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.endswith(".manifest.json"):
            try:
                manifest = json.loads(open(os.path.join(out_dir, name), "rb").read())
            except (json.JSONDecodeError, OSError):
                continue
            if os.path.exists(os.path.join(out_dir, manifest["blob"])):
                done.add(int(manifest["pid"]))
    return done


def encode_job(
    paths: list[str] | str,
    out_dir: str,
    config: EncodeConfig | None = None,
    *,
    columns=None,
    resume: bool = True,
    concurrency: int | tuple | None = None,
    target_block_bytes: int = DEFAULT_TARGET_BLOCK_BYTES,
    use_actors: bool = False,
    align_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Encode parquet files into the renc container. Returns the summary
    Dataset (one small row per partition) — consuming it drives the job.

    ``align_schema``: union schema for evolved inputs (see
    encode_evolved_job) — every fragment aligns to it before encoding.

    use_actors=False (default) runs the stage as Ray tasks: encode state is
    per-chunk (dictionary / FSST symbol tables live for one partition, the
    ``toDictPageAndClose`` scope), and Ray's long-lived worker processes keep
    heaps warm across tasks AND jobs — measurably faster on this host
    (BASELINE.md). use_actors=True runs the same worker as an actor pool
    (``map_batches(EncodeWorker, concurrency=...)``), the shape to use when a
    stage holds cross-partition state (e.g. a corpus-trained FSST table)."""
    descs = plan_partitions(paths, target_block_bytes)
    if align_schema is not None:
        blob = align_schema.serialize().to_pybytes()
        for d in descs:
            d["align_schema"] = blob
    if resume:
        done = completed_pids(out_dir)
        descs = [d for d in descs if d["pid"] not in done]
    if not descs:
        return ray.data.from_items([])
    # fill defaults for schema stability across descriptors
    for d in descs:
        d.setdefault("row_start", -1)
        d.setdefault("row_count", -1)
    ds = ray.data.from_items(descs)
    if concurrency is None:
        # measured on this host: >12 concurrently-faulting encode workers
        # saturate the hypervisor page-fault path (sys-time explosion) while
        # memory bandwidth flattens; on a real multi-node cluster each node
        # brings its own memory, so the cap is per-node (BASELINE.md).
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    concurrency = (
        min(concurrency, len(descs))
        if isinstance(concurrency, int)
        else concurrency
    )
    if use_actors:
        return ds.map_batches(
            EncodeWorker,
            fn_constructor_kwargs={
                "out_dir": out_dir, "config": config, "columns": columns
            },
            batch_size=1,
            concurrency=concurrency,
            num_cpus=1,
        )
    return ds.map_batches(
        _encode_batch_task,
        fn_kwargs={"out_dir": out_dir, "config": config, "columns": columns},
        batch_size=1,
        concurrency=concurrency,
        num_cpus=1,
    )


def encode_dataset_job(
    ds: "ray.data.Dataset",
    out_dir: str,
    config: EncodeConfig | None = None,
    staging_dir: str | None = None,
    min_rows_per_file: int | None = None,
    **encode_kwargs,
) -> "ray.data.Dataset":
    """Encode an arbitrary Ray Dataset (not just parquet paths): the dataset
    is staged as parquet once (write_parquet — on a multi-node cluster pass a
    shared ``staging_dir``), then encoded through the deterministic
    partitioned job so resume/lineage semantics hold. The staging cost is one
    extra sequential write; sources that are already parquet should call
    ``encode_job`` directly."""
    import tempfile

    staging = default_staging_dir(staging_dir, "rayenc-stage-")
    # sources that arrive as many tiny blocks (read_json on small files)
    # would otherwise stage one micro parquet file per block
    wkw = {"min_rows_per_file": min_rows_per_file} if min_rows_per_file else {}
    ds.write_parquet(staging, **wkw)
    paths = [
        os.path.join(staging, f)
        for f in sorted(os.listdir(staging))
        if f.endswith(".parquet")
    ]
    return encode_job(paths, out_dir, config=config, **encode_kwargs)


def ingest_jsonl_job(
    paths: list[str] | str,
    out_dir: str,
    config: EncodeConfig | None = None,
    columns: "list[str] | None" = None,
    staging_dir: str | None = None,
    min_rows_per_file: int | None = 100_000,
    **encode_kwargs,
) -> "ray.data.Dataset":
    """JSONL / JSON-lines corpus -> renc container: the ingestion shape web
    crawls actually arrive in (one JSON document per line, e.g.
    {"doc_id": ..., "text": ..., "source": ...}). ray.data.read_json
    streams the lines as Arrow blocks; ``columns`` prunes to the needed
    fields before staging; the rest is encode_dataset_job (stage as parquet
    once, then the deterministic resumable encode)."""
    if isinstance(paths, str):
        paths = [paths]
    ds = ray.data.read_json(paths)
    if columns is not None:
        ds = ds.select_columns(columns)
    return encode_dataset_job(
        ds, out_dir, config=config, staging_dir=staging_dir,
        min_rows_per_file=min_rows_per_file, **encode_kwargs
    )


def transcode_parquet_job(
    paths: list[str] | str,
    out_dir: str,
    config: EncodeConfig | None = None,
    *,
    resume: bool = True,
    concurrency=None,
    target_block_bytes: int = DEFAULT_TARGET_BLOCK_BYTES,
    encryption=None,
) -> "ray.data.Dataset":
    """Distributed parquet -> parquet re-encode using rayenc encoders: each
    partition becomes one parquet file written by rayenc.parquet_write (the
    reference's whole job — ParquetWriter at cluster scale). Output files are
    readable by any parquet reader; completed partitions are skipped on
    re-submit (presence of the final file marks completion — writes are
    atomic via rename). ``encryption`` (a parquet_crypto.FileEncryption)
    writes every output file modular-encrypted — the cluster-scale analog of
    ParquetRewriter re-encryption."""
    descs = plan_partitions(paths, target_block_bytes)
    os.makedirs(out_dir, exist_ok=True)
    if resume:
        descs = [
            d
            for d in descs
            if not os.path.exists(os.path.join(out_dir, f"part-{d['pid']:06d}.parquet"))
        ]
    if not descs:
        return ray.data.from_items([])
    for d in descs:
        d.setdefault("row_start", -1)
        d.setdefault("row_count", -1)

    def transcode(batch: dict) -> dict:
        from .memtune import tune_process_memory
        from . import parquet_write

        tune_process_memory()
        rows = []
        n = len(batch["pid"])
        for k in range(n):
            desc = {key: _unbox(batch[key][k]) for key in batch}
            pid = int(desc["pid"])
            t0 = time.perf_counter()
            table = _read_fragment(desc)
            final = os.path.join(out_dir, f"part-{pid:06d}.parquet")
            tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
            parquet_write.write_table(table, tmp, config, encryption=encryption)
            os.replace(tmp, final)
            rows.append(
                {
                    "pid": pid,
                    "rows": table.num_rows,
                    "out_bytes": os.path.getsize(final),
                    "seconds": time.perf_counter() - t0,
                }
            )
        return {key: np.array([r[key] for r in rows]) for key in rows[0]}

    ds = ray.data.from_items(descs)
    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    return ds.map_batches(
        transcode,
        batch_size=1,
        concurrency=min(concurrency, len(descs)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def _grouped_value_bytes(batch: pa.Table) -> np.ndarray:
    """Per-row encoded-payload estimate used for block budgeting (tokens
    dominate the tokenized table; 64 B/row otherwise)."""
    if "tokens" in batch.column_names:
        lens = pa.compute.list_value_length(batch.column("tokens")).to_numpy(
            zero_copy_only=False
        )
        return lens.astype(np.int64) * 4
    return np.full(batch.num_rows, 64, np.int64)


def encode_grouped_job(
    paths: list[str] | str,
    out_dir: str,
    key: str = "source",
    config: EncodeConfig | None = None,
    salt_col: str | None = "doc_id",
    max_block_rows: int = 100_000,
    max_block_value_bytes: int = DEFAULT_TARGET_BLOCK_BYTES,
    concurrency=None,
) -> "ray.data.Dataset":
    """Encode with key co-location: rows are bucketed by ``key`` so each
    partition holds rows of one source (dictionary/FSST tables stay coherent
    per source — SURVEY.md §7.3).

    Skew is handled BEFORE the shuffle: a cheap pre-aggregation (per-batch
    partial sizes -> one tiny groupby) measures each key's payload, each key
    gets ceil(bytes / block_budget) sub-buckets, and rows salt into them by
    ``salt_col`` hash. No task ever materializes more than ~one block budget
    of rows — a giant source becomes many bounded groups instead of one
    straggler materializing a fixed fraction of the corpus.

    This is the one encode path with a shuffle; the pre-aggregation ships one
    row per (batch, key), then only the groupby exchange moves rows, once."""
    if isinstance(paths, str):
        paths = [paths]
    os.makedirs(out_dir, exist_ok=True)
    config = config or EncodeConfig()

    def _fill_key_nulls(colk):
        """Null key values break Ray Data's groupby sort (None vs str
        compare) — both passes normalize them to the same sentinel so null
        rows co-locate as one ordinary group."""
        if colk.null_count:
            import pyarrow.compute as _pc

            sentinel = (
                "\x00<null>"
                if pa.types.is_string(colk.type)
                or pa.types.is_large_string(colk.type)
                else -(1 << 62)
            )
            return _pc.fill_null(colk, sentinel)
        return colk

    # pass 1: per-key payload sizes (partial aggregate inside map_batches,
    # then a tiny shuffle of one row per key per batch)
    def partial_sizes(batch: pa.Table) -> pa.Table:
        vb = _grouped_value_bytes(batch)
        t = pa.table(
            {key: _fill_key_nulls(batch.column(key)), "vbytes": pa.array(vb)}
        )
        agg = t.group_by([key]).aggregate([("vbytes", "sum")])
        return agg.rename_columns([key, "vbytes"])

    src_ds = ray.data.read_parquet(paths)
    sizes = (
        src_ds.map_batches(partial_sizes, batch_format="pyarrow")
        .groupby(key)
        .sum("vbytes")
        .to_pandas()
    )
    vb_col = [c for c in sizes.columns if c != key][0]
    keys_sorted = sizes.sort_values(key).reset_index(drop=True)
    nblk = np.maximum(
        1, np.ceil(keys_sorted[vb_col].to_numpy() / max_block_value_bytes)
    ).astype(np.int64)
    base = np.zeros(len(nblk), np.int64)
    np.cumsum(nblk[:-1], out=base[1:])
    plan = {
        k: (int(b), int(nb))
        for k, b, nb in zip(keys_sorted[key], base, nblk)
    }
    plan_ref = ray.put(plan)

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .ops.dedup import hash_strings

        p = ray.get(plan_ref)
        # same sentinel normalization as pass 1, so null keys find their
        # planned buckets (np.unique also cannot sort None-mixed arrays)
        kv = _fill_key_nulls(batch.column(key)).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(kv, return_inverse=True)
        # keys absent from the pass-1 plan (e.g. null key values, which
        # np.unique folds to a sentinel the census never saw) fall back to
        # bucket 0 rather than failing the job
        bases = np.array([p.get(u, (0, 1))[0] for u in uniq], np.int64)[inv]
        nb = np.array([p.get(u, (0, 1))[1] for u in uniq], np.int64)[inv]
        if salt_col and salt_col in batch.column_names:
            salt_arr = batch.column(salt_col)
            if not pa.types.is_string(salt_arr.type) and not pa.types.is_large_string(
                salt_arr.type
            ):
                salt_arr = salt_arr.cast(pa.large_string())
            salt = hash_strings(salt_arr).astype(np.int64) & 0x7FFFFFFF
        else:
            salt = np.arange(batch.num_rows, dtype=np.int64)
        return batch.append_column(
            "__bucket", pa.array(bases + (salt % np.maximum(nb, 1)))
        )

    def encode_bucket(group: pa.Table) -> pa.Table:
        from . import blocks as blocks_mod

        group = group.sort_by([(key, "ascending")])
        bucket = int(group.column("__bucket")[0].as_py())
        group = group.drop_columns(["__bucket"])
        # split the bucket into blocks bounded by rows and value bytes (the
        # pre-shuffle sub-bucketing already bounds groups to ~one budget;
        # this is the exact-cut safety net)
        cum = np.cumsum(_grouped_value_bytes(group))
        out_rows = []
        start = 0
        seq = 0
        while start < group.num_rows:
            base = cum[start - 1] if start else 0
            hi = int(np.searchsorted(cum, base + max_block_value_bytes, "right"))
            end = max(start + 1, min(hi, start + max_block_rows, group.num_rows))
            block = group.slice(start, end - start)
            blob, manifest = blocks_mod.encode_block(block, config)
            manifest["pid"] = bucket * 10_000 + seq
            manifest["lineage"] = {"bucket": bucket, "seq": seq, "key": key}
            blob_name = f"bucket-{bucket:04d}-{seq:04d}.renc"
            _atomic_write(os.path.join(out_dir, blob_name), blob)
            manifest["blob"] = blob_name
            _atomic_write(
                os.path.join(out_dir, f"bucket-{bucket:04d}-{seq:04d}.manifest.json"),
                json.dumps(manifest).encode(),
            )
            vb = int(cum[end - 1] - (cum[start - 1] if start else 0))
            out_rows.append((bucket, seq, block.num_rows, len(blob), vb))
            start = end
            seq += 1
        return pa.table(
            {
                "bucket": pa.array([r[0] for r in out_rows], pa.int64()),
                "seq": pa.array([r[1] for r in out_rows], pa.int64()),
                "rows": pa.array([r[2] for r in out_rows], pa.int64()),
                "blob_bytes": pa.array([r[3] for r in out_rows], pa.int64()),
                "value_bytes": pa.array([r[4] for r in out_rows], pa.int64()),
            }
        )

    return (
        src_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(encode_bucket, batch_format="pyarrow")
    )


def export_parquet_job(
    container_dir: str,
    out_dir: str,
    config: EncodeConfig | None = None,
    *,
    resume: bool = True,
    concurrency=None,
    encryption=None,
) -> "ray.data.Dataset":
    """Distributed container -> parquet export: each renc partition decodes
    and re-writes as one standard parquet file through rayenc.parquet_write
    (the inverse of transcode_parquet_job; completes the
    parquet -> container -> parquet lifecycle). Completed partitions are
    skipped on re-submit."""
    os.makedirs(out_dir, exist_ok=True)
    manifests = sorted(
        n for n in os.listdir(container_dir) if n.endswith(".manifest.json")
    )
    if resume:
        manifests = [
            m for m in manifests
            if not os.path.exists(
                os.path.join(out_dir, m.replace(".manifest.json", ".parquet"))
            )
        ]
    if not manifests:
        return ray.data.from_items([])

    def export(batch: dict) -> dict:
        from .memtune import tune_process_memory
        from . import blocks as blocks_mod
        from . import parquet_write

        tune_process_memory()
        rows = []
        for name in batch["manifest"]:
            name = str(name)
            manifest = json.loads(
                open(os.path.join(container_dir, name), "rb").read()
            )
            with open(os.path.join(container_dir, manifest["blob"]), "rb") as f:
                blob = f.read()
            table = blocks_mod.decode_block(blob, manifest)
            final = os.path.join(out_dir, name.replace(".manifest.json", ".parquet"))
            tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
            parquet_write.write_table(table, tmp, config, encryption=encryption)
            os.replace(tmp, final)
            rows.append({"manifest": name, "rows": table.num_rows,
                         "out_bytes": os.path.getsize(final)})
        return {k: np.array([r[k] for r in rows]) for k in rows[0]}

    ds = ray.data.from_items([{"manifest": m} for m in manifests])
    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    return ds.map_batches(
        export,
        batch_size=1,
        concurrency=min(concurrency, len(manifests)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def decode_dataset(
    out_dir: str, concurrency=None, columns=None, predicate=None,
    dictionary_strings: bool = False, bad_block_threshold: float | None = None,
) -> "ray.data.Dataset":
    """Stream the encoded container back as a Dataset of Arrow blocks.

    columns: decode only these top-level columns (chunk-level pruning).
    predicate: [(col, op, value), ...] conjunctions; partitions whose manifest
    min/max statistics exclude the predicate are skipped without reading the
    blob, then the exact filter is applied to decoded rows.
    dictionary_strings: keep RLE_DICTIONARY flat string columns as Arrow
    DictionaryArray (ids + NDV-sized dictionary) instead of materializing —
    low-NDV columns stay small in the object store and predicates evaluate
    over the dictionary once (predicate.leaf_mask dictionary path).
    bad_block_threshold: error tolerance for 100 TB reads over imperfect
    storage (UnmaterializableRecordCounter / the reference's
    parquet.read.bad.record.threshold, counted per worker like its
    per-split counter) — None fails fast on the first unreadable
    partition; a fraction skips unreadable partitions (with a warning)
    until their share of a worker's partitions exceeds it."""
    manifests = sorted(
        n for n in os.listdir(out_dir) if n.endswith(".manifest.json")
    )
    if (predicate is not None or columns is not None) and manifests:
        # fail at PLAN time on unknown columns — not as a KeyError from deep
        # inside a Ray task after work has launched
        from . import predicate as _P

        def _names(manifest: str) -> set:
            with open(os.path.join(out_dir, manifest)) as f:
                chunk_names = {c["name"] for c in json.load(f)["chunks"]}
            # nested columns shred to "name#..." chunks; the decoded table
            # exposes the top-level name
            return chunk_names | {n.split("#", 1)[0] for n in chunk_names}

        known = _names(manifests[0])
        requested = _P.columns(_P.normalize(predicate)) if predicate else set()
        if columns is not None:
            requested |= set(columns)
        missing = requested - known
        # merged containers may carry differing per-part schemas: a column
        # absent from the first manifest can exist in later parts, so only
        # when something looks missing do we union the remaining manifests
        # (rare path — the common homogeneous case stays one driver read)
        for m in manifests[1:]:
            if not missing:
                break
            known |= _names(m)
            missing = requested - known
        if missing:
            raise ValueError(
                f"column(s) {sorted(missing)} not in container "
                f"schema {sorted(known)}"
            )
    ds = ray.data.from_items([{"manifest": m} for m in manifests])
    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    if isinstance(concurrency, int):
        concurrency = min(concurrency, max(1, len(manifests)))
    return ds.map_batches(
        _decode_batch_task,
        fn_kwargs={"out_dir": out_dir, "columns": columns, "predicate": predicate,
                   "dictionary_strings": dictionary_strings,
                   "bad_block_threshold": bad_block_threshold,
                   "total_partitions": len(manifests)},
        batch_size=1,
        concurrency=concurrency,
        num_cpus=1,
    )


def verify_roundtrip(paths: list[str] | str, out_dir: str, key: str | None = None) -> dict:
    """Order-insensitive equality between the input parquet and the decoded
    container output. Small-data verification helper (drives both pipelines)."""
    decoded = decode_dataset(out_dir).to_arrow_refs()
    got = pa.concat_tables([ray.get(r) for r in decoded])
    if isinstance(paths, str):
        paths = [paths]
    want = pa.concat_tables([pq.read_table(p) for p in sorted(paths)])
    if key is not None:
        got = got.sort_by(key)
        want = want.sort_by(key)
    return {
        "rows_match": got.num_rows == want.num_rows,
        "equal": got.equals(want),
        "rows": got.num_rows,
    }


def merge_containers(in_dirs: list[str], out_dir: str) -> int:
    """Consolidate several renc containers into one WITHOUT decoding — the
    `ParquetFileWriter.appendFile` analog at container granularity: blobs
    copy verbatim (partitions are self-contained), manifests renumber pids
    and blob names densely in sorted (dir, pid) order. Schemas must match.
    Returns the merged partition count."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for d in in_dirs:
        for n in sorted(
            x for x in os.listdir(d) if x.endswith(".manifest.json")
        ):
            entries.append((d, n))
    if not entries:
        raise ValueError("no partitions to merge")
    schema0 = None
    for pid, (d, n) in enumerate(entries):
        manifest = json.loads(open(os.path.join(d, n)).read())
        if schema0 is None:
            schema0 = manifest["schema"]
        elif manifest["schema"] != schema0:
            raise ValueError(
                f"container schema mismatch: {d}/{n} differs from "
                f"{entries[0][0]}"
            )
        blob_name = f"part-{pid:06d}.renc"
        shutil.copyfile(
            os.path.join(d, manifest["blob"]),
            os.path.join(out_dir, blob_name),
        )
        manifest["pid"] = pid
        manifest["blob"] = blob_name
        _atomic_write(
            os.path.join(out_dir, f"part-{pid:06d}.manifest.json"),
            json.dumps(manifest).encode(),
        )
    return len(entries)


def encode_encrypted_parquet_job(
    paths: list[str] | str,
    out_dir: str,
    decryption,
    config: EncodeConfig | None = None,
    *,
    resume: bool = True,
    concurrency: int | tuple | None = None,
) -> "ray.data.Dataset":
    """Encode modular-encrypted parquet inputs into the renc container: the
    data-lake ingestion path where sources carry AES-GCM encryption
    (rayenc.parquet_crypto.FileDecryption supplies the keys). Partitions are
    planned from OUR footer parser (pyarrow cannot open a PARE footer
    without a KMS factory), one partition per row group, decoded through
    read_table_encrypted and encoded with the same atomic blob+manifest
    resume contract as encode_job."""
    from .parquet_read_enc import EncryptedFile

    if isinstance(paths, str):
        paths = [paths]
    descs: list[dict] = []
    for path in sorted(paths):
        f = EncryptedFile(path, decryption)
        for rg in range(len(f.row_groups)):
            descs.append({"path": path, "rg": rg})
    for pid, d in enumerate(descs):
        d["pid"] = pid
    if resume:
        done = completed_pids(out_dir)
        descs = [d for d in descs if d["pid"] not in done]
    if not descs:
        return ray.data.from_items([])
    os.makedirs(out_dir, exist_ok=True)

    def task(batch: dict) -> dict:
        from .memtune import tune_process_memory
        from .parquet_read_enc import read_table_encrypted

        tune_process_memory()
        rows = []
        for k in range(len(batch["pid"])):
            pid = int(batch["pid"][k])
            path = str(batch["path"][k])
            rg = int(batch["rg"][k])
            t0 = time.perf_counter()
            table = read_table_encrypted(path, decryption, row_groups=[rg])
            blob, manifest = blocks.encode_block(table, config)
            manifest["lineage"] = {"path": path, "row_groups": [rg],
                                   "row_start": -1, "row_count": -1}
            manifest["pid"] = pid
            blob_name = f"part-{pid:06d}.renc"
            _atomic_write(os.path.join(out_dir, blob_name), blob)
            manifest["blob"] = blob_name
            _atomic_write(
                os.path.join(out_dir, f"part-{pid:06d}.manifest.json"),
                json.dumps(manifest).encode(),
            )
            rows.append(
                {"pid": pid, "rows": table.num_rows, "blob_bytes": len(blob),
                 "seconds": time.perf_counter() - t0}
            )
        return {k2: np.array([r[k2] for r in rows]) for k2 in rows[0]}

    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    ds = ray.data.from_items(descs)
    return ds.map_batches(
        task, batch_size=1,
        concurrency=min(concurrency, len(descs)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def read_parquet_filtered(
    paths: list[str] | str,
    predicate: list,
    columns: list[str] | None = None,
    decryption=None,
    concurrency: int | tuple | None = None,
) -> "ray.data.Dataset":
    """Distributed predicate-pushdown read of parquet FILES driven by OUR
    index structures: one task per (file, row group) runs
    parquet_read_enc.read_table_filtered — bloom row-group vetoes +
    ColumnIndex page skipping + exact filtering all happen inside the task,
    so only surviving rows enter the object store. Works on plaintext and
    modular-encrypted files (pass parquet_crypto.FileDecryption)."""
    from .parquet_read_enc import EncryptedFile

    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)

    def _n_rgs(path: str) -> int:
        return len(EncryptedFile(path, decryption).row_groups)

    if len(paths) > 64:  # parallel footer reads, like plan_partitions
        counts = ray.get(
            [ray.remote(num_cpus=0.25)(_n_rgs).remote(p) for p in paths]
        )
    else:
        counts = [_n_rgs(p) for p in paths]
    descs = [
        {"path": path, "rg": rg}
        for path, n in zip(paths, counts)
        for rg in range(n)
    ]
    if not descs:
        return ray.data.from_items([])

    def task(batch: dict):
        from .memtune import tune_process_memory
        from .parquet_read_enc import read_table_filtered

        tune_process_memory()
        for k in range(len(batch["path"])):
            table = read_table_filtered(
                str(batch["path"][k]), predicate, columns=columns,
                decryption=decryption, row_groups=[int(batch["rg"][k])],
            )
            if table.num_rows:
                yield table

    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    return ray.data.from_items(descs).map_batches(
        task, batch_size=1,
        concurrency=min(concurrency, len(descs)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def read_parquet_summary(
    dir_path: str,
    predicate=None,
    columns: list[str] | None = None,
    decryption=None,
    concurrency: int | tuple | None = None,
) -> "ray.data.Dataset":
    """Distributed read of a dataset directory planned from its
    `_metadata` summary file (ParquetFileWriter.writeMetadataFile /
    ParquetOutputCommitter): row groups are stats-pruned against
    ``predicate`` using ONLY the summary footer — no part footer is
    opened during planning — then each surviving (file, row group) runs
    the full pushdown read (bloom + dictionary + ColumnIndex page
    skipping + exact filter) inside its task.  At lake scale this is one
    small driver read instead of ~len(files) footer fetches."""
    from .summary import plan_from_summary

    plan = plan_from_summary(dir_path, predicate)
    if predicate is None:
        # whole-file conformance reads: one task per part, no duplication
        descs = [{"path": p, "rg": -1} for p in sorted({p for p, _ in plan})]
    else:
        descs = [{"path": p, "rg": rg} for p, rg in plan]
    if not descs:
        return ray.data.from_items([])

    def task(batch: dict):
        from .memtune import tune_process_memory
        from .parquet_compat import read_table_conformance
        from .parquet_read_enc import read_table_filtered

        tune_process_memory()
        for k in range(len(batch["path"])):
            path, rg = str(batch["path"][k]), int(batch["rg"][k])
            if rg >= 0:
                table = read_table_filtered(
                    path, predicate, columns=columns,
                    decryption=decryption, row_groups=[rg],
                )
            else:
                table = read_table_conformance(path, columns=columns)
            if table.num_rows:
                yield table

    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    return ray.data.from_items(descs).map_batches(
        task, batch_size=1,
        concurrency=min(concurrency, len(descs)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def read_parquet_evolved(
    paths: list[str],
    strict: bool = True,
    columns: list[str] | None = None,
    predicate=None,
    concurrency: int | tuple | None = None,
) -> "ray.data.Dataset":
    """Distributed merged-footer read of parquet files whose schemas
    evolved (ParquetFileWriter.getGlobalMetaData + MessageType.union):
    the driver unions the footer schemas (footers only — no payload I/O),
    then one task per file conformance-reads it with OUR decoders and
    aligns to the broadcast union schema (missing columns -> nulls,
    strict=False widens numerics). Payload bytes never touch the driver;
    at 100 TB the footer scan is O(files) metadata reads and every
    alignment is a per-task arrow cast.

    ``predicate`` (anything predicate.normalize accepts) composes with
    evolution per SQL semantics: files that carry every predicate column
    get the full pushdown read (stats + bloom + dictionary + page
    skipping via read_table_filtered); files that predate a predicate
    column align it to null first, so comparison leaves fail there
    (Kleene null verdicts drop the rows) instead of erroring."""
    from . import predicate as P

    tree = P.normalize(predicate) if predicate is not None else None
    uni_full = parquet_compat.union_schemas(
        [pq.ParquetFile(p).schema_arrow for p in sorted(paths)], strict
    )
    uni = uni_full
    if columns is not None:
        uni = pa.schema([uni_full.field(c) for c in columns])
    pred_cols = sorted(P.columns(tree)) if tree is not None else []
    for c in pred_cols:
        if uni_full.get_field_index(c) < 0:
            raise ValueError(f"predicate column {c!r} in no input file")
    ext = pa.schema(
        list(uni)
        + [uni_full.field(c) for c in pred_cols if uni.get_field_index(c) < 0]
    )
    uni_ref = ray.put((uni.serialize().to_pybytes(), ext.serialize().to_pybytes()))

    def task(batch: dict):
        from .memtune import tune_process_memory
        from .parquet_read_enc import read_table_filtered

        tune_process_memory()
        uni_b, ext_b = ray.get(uni_ref)
        schema = pa.ipc.read_schema(pa.py_buffer(uni_b))
        ext_schema = pa.ipc.read_schema(pa.py_buffer(ext_b))
        for p in batch["path"]:
            if tree is None:
                yield parquet_compat.align_table(
                    parquet_compat.read_table_conformance(
                        str(p), columns=schema.names
                    ),
                    schema,
                )
                continue
            avail = {f.name for f in pq.ParquetFile(str(p)).schema_arrow}
            if all(c in avail for c in pred_cols):
                t = read_table_filtered(
                    str(p), tree,
                    columns=[n for n in schema.names if n in avail],
                )
                yield parquet_compat.align_table(t, schema)
            else:
                t = parquet_compat.align_table(
                    parquet_compat.read_table_conformance(
                        str(p), columns=ext_schema.names
                    ),
                    ext_schema,
                )
                m = P.mask(tree, t)
                yield t.filter(m).select(schema.names)

    if concurrency is None:
        concurrency = min(12, max(1, int(ray.cluster_resources().get("CPU", 4))))
    return ray.data.from_items(
        [{"path": p} for p in sorted(paths)]
    ).map_batches(
        task, batch_size=1,
        concurrency=min(concurrency, len(paths)) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )


def encode_evolved_job(
    paths: "list[str]",
    out_dir: str,
    config: EncodeConfig | None = None,
    strict: bool = False,
    **kw,
) -> "ray.data.Dataset":
    """Ingest schema-EVOLVED parquet files into one uniform renc container:
    the driver unions the footer schemas (MessageType.union /
    getGlobalMetaData; strict=False widens numerics losslessly), stamps
    every partition descriptor with the union, and runs the standard
    encode_job — each task aligns its fragment (missing columns -> nulls,
    widened columns cast) before encoding, so decode_dataset and every
    predicate/projection surface see a single schema with no special
    handling. Resume/lineage semantics are unchanged."""
    if isinstance(paths, str):
        paths = [paths]
    uni = parquet_compat.union_schemas(
        [pq.ParquetFile(p).schema_arrow for p in sorted(paths)], strict
    )
    return encode_job(paths, out_dir, config, align_schema=uni, **kw)
