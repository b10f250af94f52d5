#!/usr/bin/env python
"""rayenc benchmark harness.

Headline: encode throughput (tokens/sec) + compressed bytes/token of the Ray
Data encode pipeline on the deterministic tokenized table (FIXTURES.md F1)
sized to the scale factor, vs the pyarrow-parquet baseline configured to
match parquet-java's default encoding choices (dictionary-with-fallback,
SURVEY.md §6 / BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...per-stage seconds...}, "sf": ..., "num_cpus": N, ...extras}

  python bench.py                 # $GRAFT_SF_DIR (default sf0.1), $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling       # same job at num_cpus=8 and 32 in fresh
                                  # processes; prints both + efficiency and
                                  # appends the result to BASELINE.md
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

ROWS_FOR_SF = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}
MEAN_TOKENS = 200.0


def sf_name(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def run_bench(num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            log_to_driver=False,
        )
    import numpy as np
    import pyarrow.parquet as pq

    from rayenc import data, pipeline

    sf = sf_name(SF_DIR)
    rows = ROWS_FOR_SF.get(sf, 20_000)
    queries: dict[str, float] = {}
    extras: dict = {}

    # ---- input (cached; generation excluded from timings) ----
    path = data.cached_parquet(rows, MEAN_TOKENS)
    meta = pq.ParquetFile(path).metadata
    n_tokens = int(
        pq.read_table(path, columns=["n_tok"])["n_tok"].to_numpy().sum()
    )
    raw_bytes = n_tokens * 4  # token payload
    extras["rows"] = meta.num_rows
    extras["tokens"] = n_tokens

    # ---- headline: ray encode job ----
    # two runs: the first spawns + warms the actor heaps (this host re-cools
    # freed pages, see rayenc/memtune.py); the second is the steady state a
    # long job runs at. Both are reported; the warm run is the headline.
    conc = min(num_cpus, 12)
    target = min(32 << 20, max(2 << 20, raw_bytes // max(1, conc * 4)))
    t_enc = None
    for attempt in range(2):
        out = tempfile.mkdtemp(prefix="rayenc-bench-", dir="/tmp")
        t0 = time.perf_counter()
        summary = pipeline.encode_job(
            path, out, resume=False, target_block_bytes=target, concurrency=conc
        ).to_pandas()
        dt = time.perf_counter() - t0
        if t_enc is None:
            queries["encode_tokens_cold"] = dt
            extras["encode_tokens_per_sec_cold"] = n_tokens / dt
        t_enc = dt
        if attempt == 0:
            shutil.rmtree(out, ignore_errors=True)
    queries["encode_tokens"] = t_enc
    blob_bytes = int(summary["blob_bytes"].sum())
    extras["encode_tokens_per_sec"] = n_tokens / t_enc
    extras["bytes_per_token"] = blob_bytes / n_tokens
    extras["compressed_bytes"] = blob_bytes

    # ---- decode job ----
    t0 = time.perf_counter()
    rows_out = pipeline.decode_dataset(out, concurrency=conc).count()
    t_dec = time.perf_counter() - t0
    queries["decode_tokens"] = t_dec
    extras["decode_tokens_per_sec"] = n_tokens / t_dec
    assert rows_out == meta.num_rows, (rows_out, meta.num_rows)

    # ---- pyarrow-parquet baseline (reference-equivalent defaults) ----
    table = pq.read_table(path)
    t0 = time.perf_counter()
    base_path = os.path.join(out, "baseline.parquet")
    pq.write_table(table, base_path, compression="none", use_dictionary=True)
    t_base = time.perf_counter() - t0
    queries["pyarrow_baseline_write"] = t_base
    base_bytes = os.path.getsize(base_path)
    extras["baseline_tokens_per_sec"] = n_tokens / t_base
    extras["baseline_bytes_per_token"] = base_bytes / n_tokens
    extras["size_vs_baseline"] = blob_bytes / base_bytes

    # ---- secondary: encode the sf testdata tables ----
    for tname in ("lineitem", "documents"):
        tpath = os.path.join(SF_DIR, f"{tname}.parquet")
        tout = tempfile.mkdtemp(prefix=f"rayenc-bench-{tname}-", dir="/tmp")
        t0 = time.perf_counter()
        pipeline.encode_job(
            tpath, tout, resume=False, target_block_bytes=8 << 20,
            concurrency=(1, num_cpus),
        ).materialize()
        queries[f"encode_{tname}"] = time.perf_counter() - t0
        shutil.rmtree(tout, ignore_errors=True)

    shutil.rmtree(out, ignore_errors=True)
    return {
        "metric": "tokenized-table encode wall time (ray pipeline, renc container)",
        "value": t_enc,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        **extras,
    }


def run_scaling() -> dict:
    """Same job at 8 and 32 CPUs in fresh processes -> scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tp8 = results[8]["encode_tokens_per_sec"]
    tp32 = results[32]["encode_tokens_per_sec"]
    eff = tp32 / (4 * tp8)
    report = {
        "metric": "scaling efficiency (tokens/s at 32 cpus / 4x tokens/s at 8 cpus)",
        "value": eff,
        "unit": "ratio",
        "tokens_per_sec_8cpu": tp8,
        "tokens_per_sec_32cpu": tp32,
        "sf": results[32]["sf"],
        "queries": {
            "encode_8cpu": results[8]["queries"]["encode_tokens"],
            "encode_32cpu": results[32]["queries"]["encode_tokens"],
        },
    }
    _append_baseline_md(report, results)
    return report


def _append_baseline_md(report: dict, results: dict) -> None:
    import datetime

    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    lines = [
        "",
        f"## Measured scaling run ({stamp}, {report['sf']})",
        "",
        "| num_cpus | encode s | tokens/s | bytes/token |",
        "|---|---|---|---|",
    ]
    for cpus in (8, 32):
        r = results[cpus]
        lines.append(
            f"| {cpus} | {r['queries']['encode_tokens']:.2f} |"
            f" {r['encode_tokens_per_sec']:,.0f} | {r['bytes_per_token']:.3f} |"
        )
    lines += [
        "",
        f"Scaling efficiency (32 vs 4x8): **{report['value']:.3f}**;"
        f" size vs pyarrow-parquet baseline: {results[32]['size_vs_baseline']:.3f}x"
        f" (ours {results[32]['bytes_per_token']:.3f} B/token vs baseline"
        f" {results[32]['baseline_bytes_per_token']:.3f} B/token).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    result = run_bench(NUM_CPUS)
    print(json.dumps(result))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
