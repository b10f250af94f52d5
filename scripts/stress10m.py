"""10M-row / ~1.6B-token partition-count stress (VERDICT r4 task 7).

Evidence that the partition planner, resume scan and manifest store hold at
~10^4 partitions: 20 shard files x 500k rows at mean 160 tokens, encoded
with a target block size chosen to yield ~10,000 partitions, then

  1. plan-only wall (parallel footer planning over the shards)
  2. cold + converged-warm encode wall / tokens/s
  3. no-op resume rescan wall over the completed container
  4. SIGKILL mid-encode, then resumed completion (skips finished parts)
  5. decode count-consume wall / tokens/s

Usage:  python scripts/stress10m.py [--rows-per-shard 500000] [--shards 20]
        [--partitions 10000]   (writes a summary JSON line; appends nothing)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN_TOKENS = 160.0


def shard_paths(shards: int, rows: int) -> list[str]:
    from rayenc import data

    paths = []
    for i in range(shards):
        t0 = time.perf_counter()
        p = data.cached_parquet(rows, MEAN_TOKENS, seed=1000 + i)
        dt = time.perf_counter() - t0
        if dt > 1:
            print(f"  shard {i}: generated in {dt:.1f}s", flush=True)
        paths.append(p)
    return paths


def child_encode(paths: list[str], out: str, target: int) -> None:
    """Run in a subprocess for the SIGKILL test."""
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, log_to_driver=False)
    from rayenc import pipeline

    pipeline.encode_job(paths, out, resume=True, target_block_bytes=target,
                        concurrency=12).materialize()
    ray.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-shard", type=int, default=500_000)
    ap.add_argument("--shards", type=int, default=20)
    ap.add_argument("--partitions", type=int, default=10_000)
    ap.add_argument("--child-encode", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_encode:
        cfg = json.loads(args.child_encode)
        child_encode(cfg["paths"], cfg["out"], cfg["target"])
        return 0

    import pyarrow.parquet as pq

    import ray

    print(f"generating {args.shards} x {args.rows_per_shard} rows ...", flush=True)
    paths = shard_paths(args.shards, args.rows_per_shard)
    n_tokens = 0
    total_bytes = 0
    for p in paths:
        n_tokens += int(pq.read_table(p, columns=["n_tok"])["n_tok"].to_numpy().sum())
        total_bytes += os.path.getsize(p)
    rows = args.shards * args.rows_per_shard
    target = max(1 << 18, total_bytes // args.partitions)
    print(f"rows={rows:,} tokens={n_tokens:,} input={total_bytes/1e9:.2f} GB "
          f"target_block={target/1e6:.2f} MB", flush=True)

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, log_to_driver=False)
    from rayenc import pipeline

    report: dict = {
        "rows": rows, "tokens": n_tokens, "input_gb": total_bytes / 1e9,
        "target_block_bytes": target,
    }

    # 1. plan-only (parallel footer read above 64 files is not triggered at
    #    20 shards; measure both the default and forced-parallel paths)
    t0 = time.perf_counter()
    descs = pipeline.plan_partitions(paths, target)
    report["plan_serial_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    descs_p = pipeline.plan_partitions(paths, target, parallel=True)
    report["plan_parallel_sec"] = round(time.perf_counter() - t0, 3)
    assert [d["pid"] for d in descs] == [d["pid"] for d in descs_p]
    report["partitions"] = len(descs)
    print(f"planned {len(descs):,} partitions "
          f"(serial {report['plan_serial_sec']}s, "
          f"parallel {report['plan_parallel_sec']}s)", flush=True)

    # 2. encode cold + converged warm
    def timed_encode():
        out = tempfile.mkdtemp(prefix="stress10m-", dir="/tmp")
        t0 = time.perf_counter()
        pipeline.encode_job(paths, out, resume=False, target_block_bytes=target,
                            concurrency=12).materialize()
        return time.perf_counter() - t0, out

    cold, out = timed_encode()
    report["encode_cold_sec"] = round(cold, 2)
    walls = []
    prev = cold
    for _ in range(4):
        shutil.rmtree(out, ignore_errors=True)
        dt, out = timed_encode()
        walls.append(dt)
        if abs(dt - prev) / prev < 0.15:
            break
        prev = dt
    warm = min(walls)
    report["encode_warm_sec"] = round(warm, 2)
    report["encode_tokens_per_sec"] = round(n_tokens / warm)
    blob_bytes = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    report["bytes_per_token"] = round(blob_bytes / n_tokens, 3)
    n_manifests = sum(1 for f in os.listdir(out) if f.endswith(".manifest.json"))
    report["manifests"] = n_manifests
    print(f"encode cold {cold:.1f}s warm {warm:.1f}s "
          f"({n_tokens/warm/1e6:.1f}M tok/s), {n_manifests:,} manifests, "
          f"{report['bytes_per_token']} B/token", flush=True)

    # 3. no-op resume rescan over the completed container
    t0 = time.perf_counter()
    pipeline.encode_job(paths, out, resume=True, target_block_bytes=target,
                        concurrency=12).materialize()
    report["resume_noop_sec"] = round(time.perf_counter() - t0, 2)
    print(f"no-op resume rescan: {report['resume_noop_sec']}s", flush=True)

    # 4. SIGKILL mid-encode, resume
    kill_out = tempfile.mkdtemp(prefix="stress10m-kill-", dir="/tmp")
    cfg = json.dumps({"paths": paths, "out": kill_out, "target": target})
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child-encode", cfg],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # kill the child's whole Ray session group
    )
    # the child is a cold start in its own Ray session: time the kill off
    # the cold wall so it lands mid-encode
    time.sleep(max(10.0, cold * 0.5))
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()
    done_before = sum(
        1 for f in os.listdir(kill_out) if f.endswith(".manifest.json")
    )
    t0 = time.perf_counter()
    pipeline.encode_job(paths, kill_out, resume=True, target_block_bytes=target,
                        concurrency=12).materialize()
    resume_dt = time.perf_counter() - t0
    done_after = sum(
        1 for f in os.listdir(kill_out) if f.endswith(".manifest.json")
    )
    report["kill_done_partitions"] = done_before
    report["resume_after_kill_sec"] = round(resume_dt, 2)
    assert done_after == n_manifests, (done_after, n_manifests)
    print(f"SIGKILL at ~50% ({done_before:,} parts done) -> resume finished "
          f"remaining {n_manifests - done_before:,} in {resume_dt:.1f}s", flush=True)
    shutil.rmtree(kill_out, ignore_errors=True)

    # 5. decode count-consume
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        n = pipeline.decode_dataset(out).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert n == rows, (n, rows)
    report["decode_sec"] = round(best, 2)
    report["decode_tokens_per_sec"] = round(n_tokens / best)
    print(f"decode {best:.1f}s ({n_tokens/best/1e6:.1f}M tok/s)", flush=True)
    shutil.rmtree(out, ignore_errors=True)

    ray.shutdown()
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
