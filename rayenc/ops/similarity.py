"""Approximate nearest-neighbor search over an embedding column.

- ``brute_force_topk``: the exactness baseline — the (small) query matrix is
  ``ray.put`` once and read zero-copy in every ``map_batches`` task (broadcast,
  not re-shipped per batch); each task computes a numpy matmul against its
  batch and keeps a per-block top-k; the tiny per-block top-k tables merge on
  the driver. Never shuffles the embedding corpus.
- ``ivf_topk``: the scale path — k-means-ish centroids trained on a sample
  (driver, one pass), every vector assigned to its nearest centroid in
  ``map_batches``; queries probe only ``nprobe`` centroid partitions, so the
  scanned fraction is ``nprobe / nlist``.
- ``cosine_near_dup_pairs``: embedding near-duplicate detection by bucketing
  on the nearest centroid and comparing within buckets only.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

log = logging.getLogger("rayenc.ops.similarity")


def _to_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    if n == 0:
        return values.reshape(0, 0)
    dim = len(values) // n
    return values.reshape(n, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _distributed_topk(
    block_results, query_ids: np.ndarray, k: int, id_col: str,
    min_score: float | None = None,
) -> pa.Table:
    """Reduce per-block candidate tables (qi, id, score) to the global
    top-k per query with a ``groupby(qi).map_groups`` shuffle — only the
    final nq*k rows ever reach the driver (the round-2 driver-side
    per-query merge loop was O(blocks*nq*k) driver rows)."""
    qids = np.asarray(query_ids, np.int64)

    def reduce_q(group: pa.Table) -> pa.Table:
        qi = group.column("qi")[0].as_py()
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sc = group.column("score").to_numpy(zero_copy_only=False)
        if min_score is not None:
            keep = sc > min_score
            ids, sc = ids[keep], sc[keep]
        order = np.lexsort((ids, -sc))[:k]  # score desc, id asc tiebreak
        return pa.table(
            {
                "query_id": pa.array(
                    np.full(len(order), qids[qi], np.int64)
                ),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "neighbor_id": pa.array(ids[order].astype(np.int64)),
            }
        )

    res = block_results.groupby("qi").map_groups(reduce_q, batch_format="pyarrow")
    parts = [ray.get(r) for r in res.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64())}
        )
    return pa.concat_tables(parts).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of each query against the whole dataset."""
    qn = _normalize(np.asarray(queries, np.float32))
    q_ref = ray.put(qn)  # broadcast once, zero-copy reads in every task

    def block_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = q @ m.T  # (nq, nb)
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        nq = len(q)
        return pa.table(
            {
                "qi": pa.array(np.repeat(np.arange(nq), kk)),
                id_col: pa.array(ids[top.reshape(-1)]),
                "score": pa.array(np.take_along_axis(scores, top, 1).reshape(-1).astype(np.float64)),
            }
        )

    return _distributed_topk(
        ds.map_batches(block_topk, batch_format="pyarrow"), query_ids, k, id_col
    )


def train_centroids(sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 0) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample (spherical: cosine space)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, np.float32))
    cent = sample[rng.choice(len(sample), min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add a ``centroid`` partition column (the IVF bucketing shuffle key)."""
    c_ref = ray.put(_normalize(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(c_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        a = np.argmax(m @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("centroid", pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """IVF search: scan only the nprobe nearest centroid partitions per query."""
    qn = _normalize(np.asarray(queries, np.float32))
    cent = _normalize(centroids)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = np.unique(probes).astype(np.int32)
    w_ref = ray.put(wanted)
    assigned = ivf_assign(ds, centroids, vec_col)

    def keep_probed(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        cents = batch.column("centroid").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(cents, w)))

    filtered = assigned.map_batches(keep_probed, batch_format="pyarrow")
    # (nq, nlist) membership table shipped once: the per-batch mask is a
    # single fancy-index gather instead of an np.isin per query
    probe_bool = np.zeros((len(qn), len(cent)), bool)
    probe_bool[np.arange(len(qn))[:, None], probes] = True
    q_ref = ray.put((qn, probe_bool))

    def block_topk(batch: pa.Table) -> pa.Table:
        q, pb = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cents = batch.column("centroid").to_numpy(zero_copy_only=False)
        scores = q @ m.T
        # a query only sees vectors in its probed partitions
        mask = pb[:, cents.astype(np.int64)]
        scores = np.where(mask, scores, -2.0)
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        nq = len(q)
        return pa.table(
            {
                "qi": pa.array(np.repeat(np.arange(nq), kk)),
                id_col: pa.array(ids[top.reshape(-1)]),
                "score": pa.array(
                    np.take_along_axis(scores, top, 1).reshape(-1).astype(np.float64)
                ),
            }
        )

    return _distributed_topk(
        filtered.map_batches(block_topk, batch_format="pyarrow"),
        query_ids, k, id_col, min_score=-1.5,
    )


def build_ivf_index(
    ds,
    centroids: np.ndarray,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    staging_dir: str | None = None,
):
    """Persist the IVF assignment: the corpus is encoded into the renc
    container bucketed by nearest centroid (one groupby shuffle), so each
    partition's manifest carries centroid min == max == its list id and
    probe-time decoding skips every non-probed partition from manifests
    alone — nprobe/nlist becomes a real scan reduction, not a compare
    reduction. Returns the index directory."""
    import os
    import tempfile

    from rayenc import pipeline

    assigned = ivf_assign(ds, centroids, vec_col)
    # on a multi-node cluster pass a shared filesystem path here; the
    # default node-local tmp dir only works single-node
    from rayenc.pipeline import default_staging_dir
    staging = default_staging_dir(staging_dir, "ivf-staging-")
    assigned.write_parquet(staging)
    paths = [
        os.path.join(staging, f)
        for f in sorted(os.listdir(staging))
        if f.endswith(".parquet")
    ]
    pipeline.encode_grouped_job(
        paths, out_dir, key="centroid", salt_col=None,
        max_block_rows=1 << 20,
    ).materialize()
    return out_dir


def ivf_index_topk(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Search a persisted IVF index: per query only the ``nprobe`` nearest
    centroid partitions decode (manifest min/max skipping); everything else
    never leaves storage."""
    from rayenc import pipeline

    qn = _normalize(np.asarray(queries, np.float32))
    cent = _normalize(centroids)
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    wanted = [int(c) for c in np.unique(probes)]
    # ONE decode over the whole probe set: the `in` predicate skips
    # non-probed partitions from manifest min/max alone (no per-centroid
    # dataset chain)
    probed = pipeline.decode_dataset(
        index_dir, predicate=[("centroid", "in", wanted)]
    )
    probe_bool = np.zeros((len(qn), len(cent)), bool)
    probe_bool[np.arange(len(qn))[:, None], probes] = True
    q_ref = ray.put((qn, probe_bool))

    def block_topk(batch: pa.Table) -> pa.Table:
        q, pb = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cents = batch.column("centroid").to_numpy(zero_copy_only=False)
        scores = q @ m.T
        mask = pb[:, cents.astype(np.int64)]
        scores = np.where(mask, scores, -2.0)
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "qi": pa.array(np.repeat(np.arange(len(q)), kk)),
                id_col: pa.array(ids[top.reshape(-1)]),
                "score": pa.array(
                    np.take_along_axis(scores, top, 1).reshape(-1).astype(np.float64)
                ),
            }
        )

    return _distributed_topk(
        probed.map_batches(block_topk, batch_format="pyarrow"),
        query_ids, k, id_col, min_score=-1.5,
    )


def cosine_near_dup_pairs(
    ds,
    centroids: np.ndarray,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Embedding near-duplicate pairs: bucket by nearest centroid, compare
    within buckets (misses cross-bucket pairs by design — the standard
    recall/cost trade; raise nlist or add multi-assignment for higher recall)."""
    assigned = ivf_assign(ds, centroids, vec_col)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(group.column(vec_col)))
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if n < 2:
            return empty
        if n > 4096:
            log.warning(
                "cosine near-dup bucket truncated: %d vecs > 4096 "
                "(%d vecs not compared; raise nlist to split the bucket)",
                n, n - 4096,
            )
            m, ids = m[:4096], ids[:4096]
            n = 4096
        s = m @ m.T
        ia, ib = np.triu_indices(n, 1)
        keep = s[ia, ib] >= threshold
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids[ia], ids[ib])[keep]),
                "id_b": pa.array(np.maximum(ids[ia], ids[ib])[keep]),
                "cosine": pa.array(s[ia, ib][keep].astype(np.float64)),
            }
        )

    return assigned.groupby("centroid").map_groups(bucket_pairs, batch_format="pyarrow")


def _quantize_rows(m: np.ndarray):
    """Symmetric per-vector int8 quantization of L2-normalized rows:
    ``code = round(v / scale)`` with ``scale = max|v| / 127`` — 4x smaller
    than float32 at <0.5% cosine error for typical dims."""
    m = _normalize(np.asarray(m, np.float32))
    scale = np.abs(m).max(axis=1) / 127.0
    scale[scale == 0] = 1.0
    codes = np.rint(m / scale[:, None]).astype(np.int8)
    return codes, scale.astype(np.float32)


def quantize_embeddings(ds, vec_col: str = "embedding"):
    """Replace a float ``vec_col`` with int8 ``q_code`` (list<int8>) +
    float32 ``q_scale`` — the storage/shuffle scale path for embedding
    search: 4x fewer bytes through the object store and the encoded
    container (int8 codes also dictionary/bit-pack far better than
    floats). Search over the quantized corpus with
    ``brute_force_topk_quantized``."""

    def qz(batch: pa.Table) -> pa.Table:
        codes, scale = _quantize_rows(_to_matrix(batch.column(vec_col)))
        n, d = codes.shape if codes.size else (0, 0)
        code_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, max(d, 1), dtype=np.int32)[: n + 1]),
            pa.array(codes.reshape(-1)),
        )
        batch = batch.remove_column(batch.schema.get_field_index(vec_col))
        return batch.append_column("q_code", code_col).append_column(
            "q_scale", pa.array(scale)
        )

    return ds.map_batches(qz, batch_format="pyarrow")


def brute_force_topk_quantized(
    ds_q,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
) -> pa.Table:
    """Cosine top-k over a ``quantize_embeddings`` corpus: float queries are
    quantized with the same rule, both sides re-normalized, so identical
    vectors score exactly 1.0 (the quantization fixed point) and ranking
    degrades only by the int8 rounding error. Same broadcast + per-block
    top-k + groupby reduce shape as ``brute_force_topk``."""
    qc, _ = _quantize_rows(queries)
    q_ref = ray.put(_normalize(qc.astype(np.float32)))

    def block_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_to_matrix(batch.column("q_code")))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = q @ m.T
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        return pa.table(
            {
                "qi": pa.array(np.repeat(np.arange(len(q)), kk)),
                id_col: pa.array(ids[top.reshape(-1)]),
                "score": pa.array(
                    np.take_along_axis(scores, top, 1).reshape(-1).astype(np.float64)
                ),
            }
        )

    return _distributed_topk(
        ds_q.map_batches(block_topk, batch_format="pyarrow"),
        query_ids, k, id_col,
    )
