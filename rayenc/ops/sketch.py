"""Distributed mergeable sketches: HyperLogLog and Count-Min.

The canonical "can't hold it exactly at 100 TB" operators. Both are
one-pass, vectorized (XXH64 batch hashing + numpy scatter), and MERGE by
elementwise max / sum — so the Ray shape is map_batches(partial sketch)
followed by a tiny driver-side (or tree) merge of fixed-size register
arrays: the shuffle payload is `2^p` bytes per block regardless of input
size, never the data.

HyperLogLog follows the standard HLL paper construction (Flajolet et
al.; the same register/bias constants parquet-java-adjacent engines
use): p-bit bucket index from the hash high bits, rank = leading-zero
count of the rest, harmonic-mean estimate with small-range linear
counting. Count-Min (Cormode-Muthukrishnan) uses d row-salted XXH64
hashes over a width-w table; point queries take the row minimum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """XXH64 of each UTF-8 string in an arrow array (vectorized)."""
    from ..codecs import xxh

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    offsets = np.frombuffer(arr.buffers()[1], "<i8", count=len(arr) + 1 + arr.offset)[
        arr.offset:
    ]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    return xxh.xxh64_bytes(offsets.astype(np.int64), data)


# ------------------------------------------------------------- HyperLogLog


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.ascontiguousarray(h, np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, + 1 (capped)
        lz = np.full(len(h), 64 - self.p, np.uint8)
        nz = rest != 0
        # float64 log2 is exact for the top bit position of a uint64
        top = np.zeros(len(h), np.int64)
        r = rest[nz]
        bits = np.zeros(r.shape, np.int64)
        for shift in (32, 16, 8, 4, 2, 1):  # branchless bit-length, 6 steps
            s = np.uint64(shift)
            big = r >= (np.uint64(1) << s)
            bits[big] += shift
            r = np.where(big, r >> s, r)
        top[nz] = bits
        lz[nz] = (63 - top[nz]).astype(np.uint8)
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        s = cls(b[0])
        s.registers = np.frombuffer(b[1:], np.uint8).copy()
        return s


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate distinct count of a string column: per-block partial
    sketches (2^p bytes each) merged on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        s = HyperLogLog(p)
        s.add_hashes(_hash_strings(batch.column(col)))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.merge(HyperLogLog.from_bytes(row["sketch"]))
    return merged.estimate()


# --------------------------------------------------------------- Count-Min


class CountMin:
    __slots__ = ("w", "d", "table")

    def __init__(self, w: int = 4096, d: int = 4):
        self.w, self.d = w, d
        self.table = np.zeros((d, w), np.int64)

    def _cells(self, h: np.ndarray) -> np.ndarray:
        # d row hashes from one 64-bit hash via odd-multiplier mixing
        h = np.ascontiguousarray(h, np.uint64)
        rows = np.empty((self.d, len(h)), np.int64)
        with np.errstate(over="ignore"):
            for i in range(self.d):
                salt = (0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF
                mixed = h * np.uint64(2 * i + 1) + np.uint64(salt)
                rows[i] = ((mixed >> np.uint64(33)) % np.uint64(self.w)).astype(np.int64)
        return rows

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        c = np.ones(len(h), np.int64) if counts is None else counts
        rows = self._cells(h)
        for i in range(self.d):
            np.add.at(self.table[i], rows[i], c)

    def merge(self, other: "CountMin") -> None:
        self.table += other.table

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        rows = self._cells(h)
        est = self.table[0][rows[0]]
        for i in range(1, self.d):
            est = np.minimum(est, self.table[i][rows[i]])
        return est


def cms_token_counts(ds, queries: list[str], text_col: str = "text",
                     w: int = 1 << 14, d: int = 4) -> dict:
    """Approximate per-token frequencies over whitespace tokens: per-block
    Count-Min partials (d*w int64 cells each) summed on the driver, then
    point-queried for ``queries``. Estimates are exact-or-overcounts."""
    import pyarrow.compute as pc

    from ..codecs import xxh

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        vc = toks.value_counts()
        s = CountMin(w, d)
        s.add_hashes(
            _hash_strings(vc.field("values")),
            vc.field("counts").to_numpy().astype(np.int64),
        )
        return pa.table(
            {"sketch": pa.array([s.table.tobytes()], pa.large_binary())}
        )

    merged = CountMin(w, d)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        other = CountMin(w, d)
        other.table = np.frombuffer(row["sketch"], np.int64).reshape(d, w).copy()
        merged.merge(other)
    qh = np.array([xxh.xxh64(q.encode()) for q in queries], np.uint64)
    est = merged.query_hashes(qh)
    return dict(zip(queries, est.tolist()))


def grouped_percentiles(
    ds, key_col: str, val_col: str, qs: "tuple[float, ...]" = (0.5, 0.9),
):
    """Exact per-group percentiles of a numeric column — the per-source
    quality-threshold primitive (e.g. "drop docs below the source's p10
    token count"). One ``groupby(key).map_groups`` shuffle of (key, value)
    pairs only; np.quantile(method='linear') matches SQL quantile_cont
    interpolation exactly, so the result is DuckDB-oracle-able. For
    sketched (approximate, merge-only) variants at extreme scale use a
    t-digest-style stage instead; exact is right whenever one group's
    values fit a task."""
    import pyarrow as pa

    def per_group(group: pa.Table) -> pa.Table:
        vals = group.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        vals = vals[~np.isnan(vals)]
        out = {key_col: [group.column(key_col)[0].as_py()]}
        for q in qs:
            out[f"p{int(round(q * 100))}"] = [
                float(np.quantile(vals, q, method="linear")) if len(vals) else None
            ]
        return pa.table(out)

    return ds.select_columns([key_col, val_col]).groupby(key_col).map_groups(
        per_group, batch_format="pyarrow"
    )
