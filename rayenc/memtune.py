"""Per-process memory tuning for cold-page-fault-expensive hosts.

On virtualized hosts with free-page reporting (this sandbox, and common on
cloud VMs), memory returned to the OS is re-cooled by the hypervisor and the
next first-touch costs ~0.5 ms/page — 100x the arithmetic it holds. glibc
munmaps every free of a >32 MiB block (and smaller ones until its dynamic
threshold adapts), and Arrow's jemalloc purges dirty pages, so a numpy/arrow
encode loop pays cold faults forever.

``tune_process_memory`` pins the process's memory in the malloc arena:
- mallopt(M_MMAP_THRESHOLD, 1 GiB): large numpy buffers come from the arena
  instead of fresh mmaps;
- mallopt(M_TRIM_THRESHOLD, 1 GiB): the arena is never trimmed back to the OS;
- Arrow's memory pool switched to the system allocator so parquet read
  buffers live in the same retained arena.

Net effect: each worker's heap warms once and stays warm; steady-state
throughput is then bounded by bandwidth, not page faults. Memory cost: each
worker retains its high-water mark (bounded by partition size x pipeline
temporaries).
"""

from __future__ import annotations

import ctypes
import ctypes.util

M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3

_done = False


def tune_process_memory() -> bool:
    global _done
    if _done:
        return True
    _done = True
    ok = False
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6", use_errno=True)
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        ok = True
    except (OSError, AttributeError):
        pass
    try:
        import pyarrow as pa

        pa.set_memory_pool(pa.system_memory_pool())
    except Exception:
        pass
    return ok
