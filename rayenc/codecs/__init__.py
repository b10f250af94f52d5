"""Pure numpy codec kernels (no Ray dependency).

Each codec exposes ``encode(...) -> bytes`` and ``decode(buf, n, ...) ->
numpy/arrow values``. The byte formats mirror the parquet encoding formats as
implemented by apache/parquet-java (see per-module citations), so that
grammar-level golden-byte tests from the reference test suite apply.
"""
