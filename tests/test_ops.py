"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from rayenc.ops import dedup, similarity, text, multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    table = pq.read_table(f"{SF}/documents.parquet")
    # append exact and near duplicates with new ids
    base = table.to_pydict()
    n = len(base["doc_id"])
    dup = {k: list(v[:20]) for k, v in base.items()}
    dup["doc_id"] = [10_000 + i for i in range(20)]  # exact dups of docs 0..19
    near = {k: list(v[20:30]) for k, v in base.items()}
    near["doc_id"] = [20_000 + i for i in range(10)]
    near["text"] = [t + " extra token" for t in near["text"]]  # near dups
    merged = {
        k: list(base[k]) + list(dup[k]) + list(near[k]) for k in base
    }
    return ray.data.from_arrow(pa.table(merged))


def test_hash_strings_collision_free_here():
    arr = pa.array([f"doc-{i}" for i in range(5000)] + ["", "a", "a"])
    h = dedup.hash_strings(arr)
    assert len(np.unique(h)) == 5002  # "a" == "a"
    assert h[-1] == h[-2]


def test_exact_dedup(docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups).to_pandas()
    # 500 distinct texts + 10 near-dups (distinct texts) = 510 rows
    assert len(out) == 510
    # the 20 exact duplicates kept the original (smaller) doc_id
    assert not set(range(10_000, 10_020)) & set(out.doc_id)


def test_minhash_signatures_similarity_estimates():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + "with a small suffix change"
    c = "completely different content about columnar encoding engines"
    sig = dedup.minhash_signatures(pa.array([a, b, c]), num_hashes=128)
    sim_ab = (sig[0] == sig[1]).mean()
    sim_ac = (sig[0] == sig[2]).mean()
    assert sim_ab > 0.45 and sim_ac < 0.2  # true jaccard(a,b) ~= 0.62


def test_minhash_lsh_pairs(docs_with_dups):
    pairs = dedup.minhash_lsh_pairs(docs_with_dups, threshold=0.5).to_pandas()
    pairset = set(zip(pairs.id_a, pairs.id_b))
    # every exact duplicate pair must be found
    for i in range(20):
        assert (i, 10_000 + i) in pairset, f"missing exact dup pair {i}"
    # near-duplicates (one appended token) should mostly be found
    near_found = sum((20 + i, 20_000 + i) in pairset for i in range(10))
    assert near_found >= 8


def test_simhash_near_dups(docs_with_dups):
    pairs = dedup.simhash_near_dups(docs_with_dups, max_hamming=3).to_pandas()
    pairset = set(zip(pairs.id_a, pairs.id_b))
    found = sum((i, 10_000 + i) in pairset for i in range(20))
    assert found == 20  # exact dups have hamming 0


def test_ngram_jaccard():
    j = dedup.ngram_jaccard(["abcdefgh"], ["abcdefgh"])
    assert j[0] == 1.0
    j2 = dedup.ngram_jaccard(["abcdefghij"], ["zzzzzzzzzz"])
    assert j2[0] == 0.0


class TestSimilarity:
    def test_brute_force_topk(self, ray_session):
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        emb = pq.read_table(f"{SF}/embeddings.parquet")
        mat = similarity._to_matrix(emb.column("embedding"))
        ids = emb.column("vec_id").to_numpy()
        out = similarity.brute_force_topk(ds, mat[:3], ids[:3], k=5)
        df = out.to_pandas()
        assert len(df) == 15
        # each query's best neighbor is itself
        top1 = df[df["rank"] == 1].sort_values("query_id")
        assert top1.neighbor_id.tolist() == ids[:3].tolist()

    def test_ivf_recall(self, ray_session):
        emb = pq.read_table(f"{SF}/embeddings.parquet")
        mat = similarity._to_matrix(emb.column("embedding"))
        ids = emb.column("vec_id").to_numpy()
        cent = similarity.train_centroids(mat, nlist=8)
        ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        exact = similarity.brute_force_topk(ds, mat[:5], ids[:5], k=5).to_pandas()
        approx = similarity.ivf_topk(
            ray.data.read_parquet(f"{SF}/embeddings.parquet"),
            mat[:5], ids[:5], cent, k=5, nprobe=4,
        ).to_pandas()
        # recall@5 with half the lists probed should be decent
        recall = len(
            set(zip(approx.query_id, approx.neighbor_id))
            & set(zip(exact.query_id, exact.neighbor_id))
        ) / len(exact)
        assert recall >= 0.5, recall

    def test_cosine_near_dup_pairs(self, ray_session):
        emb = pq.read_table(f"{SF}/embeddings.parquet")
        mat = similarity._to_matrix(emb.column("embedding"))
        dup = pa.table(
            {
                "vec_id": pa.array([9000, 9001], pa.int64()),
                "embedding": pa.array(
                    [mat[0].tolist(), (mat[0] * 1.001).tolist()],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0], pa.int32()),
            }
        )
        schema_matched = emb.select(["vec_id", "embedding", "label"]).cast(dup.schema)
        ds = ray.data.from_arrow(pa.concat_tables([schema_matched, dup]))
        cent = similarity.train_centroids(mat, nlist=4)
        pairs = similarity.cosine_near_dup_pairs(ds, cent, threshold=0.999).to_pandas()
        assert (9000, 9001) in set(zip(pairs.id_a, pairs.id_b))


class TestText:
    def test_token_counts_match_duckdb(self):
        import duckdb

        table = pq.read_table(f"{SF}/documents.parquet")
        ours = text.token_counts(table.column("text").combine_chunks()).to_pylist()
        want = (
            duckdb.connect()
            .execute(
                "SELECT len(string_split(text, ' ')) AS n FROM "
                f"read_parquet('{SF}/documents.parquet')"
            )
            .df()["n"]
            .tolist()
        )
        assert ours == want

    def test_quality_and_langid_shapes(self):
        table = pq.read_table(f"{SF}/documents.parquet")
        q = text.quality_scores(table)
        assert q.num_rows == table.num_rows
        assert set(q.column_names) >= {"n_words", "punct_ratio", "stopword_ratio"}
        l = text.language_id(table)
        assert set(l.column("lang_pred").to_pylist()) <= {"en", "de", "fr", "es", "unknown"}

    def test_fingerprints_normalize_whitespace(self):
        t = pa.table({"doc_id": [1, 2], "text": ["a  b c", "a b  c"]})
        fp = text.fingerprints(t)
        assert fp.column("fingerprint")[0] == fp.column("fingerprint")[1]

    def test_bpe_ish_counts(self):
        t = pa.array(["hello, world 42!"])
        assert text.bpe_ish_token_counts(t).to_pylist() == [5]  # hello , world 42 !


class TestMultimodal:
    def test_pipeline_shapes(self, ray_session):
        table = multimodal.synthesize_media_table(100, payload_bytes=512)
        ds = ray.data.from_arrow(table)
        out = multimodal.media_pipeline(ds, target=8, concurrency=2, batch_size=16)
        df = out.to_pandas()
        assert len(df) == 100
        assert all(len(f) == 8 * 8 * 3 for f in df.features)

    def test_deterministic_fake_decode(self):
        stage = multimodal.ImageDecodeStage(target=4)
        t = multimodal.synthesize_media_table(5)
        a = stage(t)
        b = stage(t)
        assert a.equals(b)

    def test_strict_mode_raises(self):
        stage = multimodal.ImageDecodeStage(strict=True)
        with pytest.raises(NotImplementedError):
            stage(multimodal.synthesize_media_table(1))

    def test_audio_stage(self):
        stage = multimodal.AudioFrameSampleStage(frames=8)
        out = stage(multimodal.synthesize_media_table(3))
        assert out.num_rows == 3 and len(out.column("frames")[0]) == 8


def test_minhash_dedup_end_to_end(docs_with_dups):
    out = dedup.minhash_dedup(docs_with_dups, threshold=0.5).to_pandas()
    kept = set(out.doc_id)
    # all 20 synthetic exact duplicates removed
    assert not set(range(10_000, 10_020)) & kept
    # union-find keeps exactly the min id per cluster: every dropped id must
    # link (directly or transitively) to a smaller surviving id
    pairs = dedup.minhash_lsh_pairs(docs_with_dups, threshold=0.5).to_pandas()
    linked = {}
    for a, b in zip(pairs.id_a, pairs.id_b):
        linked.setdefault(b, set()).add(a)
        linked.setdefault(a, set()).add(b)
    all_ids = set(docs_with_dups.to_pandas().doc_id)
    for d in all_ids - kept:
        assert any(x < d for x in linked.get(d, ())), d
    assert 0 in kept  # the global min id always survives
    # the corpus itself has a handful of natural near-dups; bound the removal
    assert 450 <= len(out) <= 510  # ~54 removed: 30 synthetic + natural near-dups


def test_short_docs_get_distinct_signatures():
    # docs shorter than the shingle size must not collapse to one signature
    import pyarrow as pa

    texts = pa.array(["hi", "no", "a", "b", "", "hi"])
    sigs = dedup.minhash_signatures(texts, num_hashes=32, k=5)
    assert not np.array_equal(sigs[0], sigs[1])  # 'hi' != 'no'
    assert not np.array_equal(sigs[2], sigs[3])  # 'a' != 'b'
    assert np.array_equal(sigs[0], sigs[5])  # identical short docs still match
    sentinel = np.iinfo(np.uint64).max
    assert not (sigs == sentinel).all(axis=1).any()


def test_exact_dedup_shuffles_only_hash_id(docs_with_dups):
    # the shuffled intermediate must carry (hash, id) pairs, never the text
    pairs = dedup.hash_id_pairs(docs_with_dups)
    assert set(pairs.schema().names) == {"__h", "doc_id"}


def test_connected_components_matches_union_find(ray_session):
    # chain 1-2-3, pair (10,11), singleton-free; survivors = component minima
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2, 10, 5], pa.int64()),
                "id_b": pa.array([2, 3, 11, 6], pa.int64()),
            }
        )
    )
    edges = dedup.connected_component_edges(pairs).to_pandas()
    got = {(u, v) for u, v in zip(edges.u, edges.v)}
    assert got == {(1, 2), (1, 3), (10, 11), (5, 6)}


def test_ivf_persisted_index(ray_session, tmp_path):
    """The persisted IVF index skips non-probed partitions from manifests
    alone and matches brute force when every list is probed."""
    import json
    import pyarrow.parquet as pq

    from rayenc import pipeline

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    mat = similarity._to_matrix(emb.column("embedding"))
    ids = emb.column("vec_id").to_numpy()
    cent = similarity.train_centroids(mat, nlist=8)
    idx_dir = str(tmp_path / "ivf")
    similarity.build_ivf_index(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), cent, idx_dir
    )
    # one partition per centroid, min == max == list id in the manifest
    import os

    manifests = [
        json.loads(open(os.path.join(idx_dir, f)).read())
        for f in sorted(os.listdir(idx_dir))
        if f.endswith(".manifest.json")
    ]
    assert len(manifests) >= 4
    for m in manifests:
        st = {c["name"]: c["stats"] for c in m["chunks"]}["centroid"]
        assert st["min"] == st["max"]
    # manifest-level skipping: a single-probe decode skips all other partitions
    w = pipeline.DecodeWorker(idx_dir, predicate=[("centroid", "==", int(manifests[0]["chunks"][0] and 0))])
    skipped = sum(w._skip_by_stats(m) for m in manifests)
    assert skipped >= len(manifests) - 2
    # exhaustive probe == brute force
    exact = similarity.brute_force_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), mat[:5], ids[:5], k=5
    )
    got = similarity.ivf_index_topk(idx_dir, mat[:5], ids[:5], cent, k=5, nprobe=8)
    assert got.equals(exact)
    # partial probe keeps decent recall
    approx = similarity.ivf_index_topk(idx_dir, mat[:5], ids[:5], cent, k=5, nprobe=4)
    recall = len(
        set(zip(approx.column("query_id").to_pylist(), approx.column("neighbor_id").to_pylist()))
        & set(zip(exact.column("query_id").to_pylist(), exact.column("neighbor_id").to_pylist()))
    ) / exact.num_rows
    assert recall >= 0.5, recall


def test_exact_dedup_same_id_reingestion(ray_session):
    # duplicate rows sharing the same doc_id collapse batch-locally
    t = pa.table({"doc_id": pa.array([1, 1, 2], pa.int64()),
                  "text": pa.array(["x", "x", "y"])})
    out = dedup.exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out.doc_id) == [1, 2]


def test_exact_dedup_anti_join_path(docs_with_dups):
    # force the partitioned LEFT ANTI join regime with a tiny broadcast cap
    out = dedup.exact_dedup(docs_with_dups, max_broadcast=1).to_pandas()
    assert len(out) == 510
    assert not set(range(10_000, 10_020)) & set(out.doc_id)


def test_minhash_dedup_anti_join_path(docs_with_dups):
    out = dedup.minhash_dedup(
        docs_with_dups, threshold=0.5, max_broadcast=1
    ).to_pandas()
    # all 20 exact dups removed; near-dups mostly removed
    assert not set(range(10_000, 10_020)) & set(out.doc_id)
    assert len(out) <= 510


def test_remove_ids_empty_drop_set(docs_with_dups):
    import ray.data

    drop = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    out = dedup.remove_ids(docs_with_dups, drop).to_pandas()
    assert len(out) == 530


def test_chunk_documents_matches_python_reference():
    import pyarrow.parquet as pq

    from rayenc.ops import text as T

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = T.chunk_documents(docs, size=256)
    want = []
    for did, t in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        n = max(1, -(-len(t) // 256))
        for k in range(n):
            want.append((did, k + 1, t[k * 256 : (k + 1) * 256]))
    got = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("chunk_idx").to_pylist(),
            out.column("chunk").to_pylist(),
        )
    )
    assert got == want


def test_exact_dedup_null_text_distinct_from_empty(ray_session):
    # null flattens to zero bytes like '' in the flat buffer; the content
    # hash salts validity so NULL rows dedupe together but never against ''
    import ray.data

    from rayenc.ops import dedup

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)]),
            "text": pa.array(["", None, None, "", "a", None]),
        }
    )
    kept = sorted(
        dedup.exact_dedup(ray.data.from_arrow(t)).to_pandas()["doc_id"]
    )
    assert kept == ["d0", "d1", "d4"]


def test_chunk_documents_null_and_empty_text():
    # a null text length is NaN through numpy and used to cast to garbage
    # int64, exploding the chunk count to petabytes — nulls count as empty
    import pyarrow as pa

    from rayenc.ops import text as T

    doc = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "text": pa.array(["", None, "x" * 600, "short"]),
        }
    )
    out = T.chunk_documents(doc, size=256)
    assert out.column("doc_id").to_pylist() == ["a", "b", "c", "c", "c", "d"]
    by_doc = dict(
        zip(out.column("doc_id").to_pylist(), out.column("chunk").to_pylist())
    )
    assert by_doc["b"] is None
    assert by_doc["a"] == ""


def test_pack_sequences_sliced_and_null_lists():
    # Ray batches arrive as slices; offsets must be slice-aware and null
    # token lists contribute zero tokens
    import pyarrow as pa

    from rayenc.ops import text as T

    tok = pa.array([[1, 2], [3, 4, 5], [6], None, [7, 8, 9, 10], [11]],
                   pa.list_(pa.int32()))
    t = pa.table({"doc_id": pa.array(list("efgh")), "tokens": tok.slice(2, 4)})
    p = T.pack_sequences(t, context_len=3)
    got = [x for xs in p.column("tokens").to_pylist() for x in xs]
    assert got == [6, 7, 8, 9, 10, 11]
    assert all(len(xs) <= 3 for xs in p.column("tokens").to_pylist())


def test_pack_sequences_invariants():
    from rayenc.ops import text as T

    rng = np.random.default_rng(0)
    lens = rng.integers(1, 4000, 200)
    toks = pa.table(
        {"tokens": pa.array([list(range(int(n))) for n in lens], pa.list_(pa.int32()))}
    )
    p = T.pack_sequences(toks, context_len=1024)
    out_lens = [len(x) for x in p.column("tokens").to_pylist()]
    assert sum(out_lens) == int(lens.sum())  # token conservation
    assert all(l <= 1024 for l in out_lens)
    assert all(l == 1024 for l in out_lens[:-1])  # greedy fills every pack
    # concatenated values preserve document order
    flat_in = [v for n in lens for v in range(int(n))]
    flat_out = [v for x in p.column("tokens").to_pylist() for v in x]
    assert flat_in == flat_out


# ------------------------- deterministic sampling / mixing / splitting


def test_hash_sample_deterministic_and_proportional(ray_session):
    import ray

    from rayenc.ops import sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    s1 = sorted(r["doc_id"] for r in sample.hash_sample(ds, "doc_id", 0.3, salt=1).take_all())
    s2 = sorted(r["doc_id"] for r in sample.hash_sample(ds, "doc_id", 0.3, salt=1).take_all())
    assert s1 == s2  # pure function of (key, salt)
    n = ds.count()
    assert 0.15 * n < len(s1) < 0.45 * n
    # a larger fraction with the same salt is a superset (nested samples)
    s_big = set(r["doc_id"] for r in sample.hash_sample(ds, "doc_id", 0.6, salt=1).take_all())
    assert set(s1) <= s_big


def test_weighted_mix_single_pass(ray_session):
    import ray

    from rayenc.ops import sample

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    )
    mixed = sample.weighted_mix(
        ds, "doc_id", "source", {"src0": 1.0, "src1": 0.0}, salt=2
    ).take_all()
    srcs = {r["source"] for r in mixed}
    assert "src1" not in srcs  # fraction 0 drops everything
    n_src0 = sum(1 for r in ds.take_all() if r["source"] == "src0")
    assert sum(1 for r in mixed if r["source"] == "src0") == n_src0  # 1.0 keeps all
    assert srcs <= {"src0"}  # groups without a fraction are dropped


def test_train_val_split_disjoint_exhaustive(ray_session):
    import ray

    from rayenc.ops import sample

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    tr, va = sample.train_val_split(ds, "doc_id", 0.2, salt=9)
    t = set(r["doc_id"] for r in tr.take_all())
    v = set(r["doc_id"] for r in va.take_all())
    assert not (t & v)
    assert len(t) + len(v) == ds.count()
    # split_column labels agree with the two-dataset split
    lab = sample.split_column(ds, "doc_id", 0.2, salt=9).take_all()
    assert {r["doc_id"] for r in lab if r["split"] == "val"} == v


def test_sample_sql_predicate_matches_numpy():
    import numpy as np

    import duckdb

    from rayenc.ops import sample

    keys = np.arange(0, 5000, dtype=np.int64)
    mask = sample.bucket_of(keys, salt=5) < np.uint64(int(0.37 * sample.BUCKETS))
    pred = sample.sample_sql_predicate("k", 0.37, salt=5)
    got = duckdb.sql(
        f"SELECT count(*) FROM range(5000) t(k) WHERE {pred}"
    ).fetchone()[0]
    assert got == int(mask.sum())


# ------------------------------------------------- sessionization (events)


def test_sessionize_gap_semantics(ray_session):
    import datetime as dt

    import ray

    from rayenc.ops import sessions

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions split by a 2-hour gap
        {"event_id": 1, "user_id": 1, "ts": base, "value": 1.0},
        {"event_id": 2, "user_id": 1, "ts": base + dt.timedelta(minutes=10), "value": 2.0},
        {"event_id": 3, "user_id": 1, "ts": base + dt.timedelta(hours=2), "value": 4.0},
        # user 2: single event
        {"event_id": 4, "user_id": 2, "ts": base, "value": 8.0},
        # gap exactly == timeout stays in-session (strict > breaks)
        {"event_id": 5, "user_id": 3, "ts": base, "value": 1.0},
        {"event_id": 6, "user_id": 3, "ts": base + dt.timedelta(seconds=1800), "value": 1.0},
    ]
    ds = ray.data.from_items(rows)
    got = sorted(
        sessions.sessionize(ds).take_all(),
        key=lambda r: (r["user_id"], r["session_id"]),
    )
    assert [(r["user_id"], r["session_id"], r["n_events"], r["sum_value"])
            for r in got] == [
        (1, 0, 2, 3.0), (1, 1, 1, 4.0), (2, 0, 1, 8.0), (3, 0, 2, 2.0),
    ]
    assert got[0]["session_end"] - got[0]["session_start"] == dt.timedelta(
        minutes=10
    )


def test_sessionize_matches_sql_oracle(ray_session):
    import duckdb

    import ray

    from rayenc.ops import sessions

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    got = sessions.sessionize(ds).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(sessions.sessionize_sql()).fetchdf()
    key = ["user_id", "session_id"]
    g = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    w = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    for c in ("session_start", "session_end"):
        w[c] = w[c].astype("datetime64[us]")
    assert g.equals(w)


def test_token_topk_exact(ray_session):
    import duckdb

    import ray

    from rayenc.ops import text as text_ops

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = text_ops.token_topk(ds, k=10).to_pandas()
    assert list(got.columns) == ["token", "cnt"]
    # monotone non-increasing counts; deterministic tie-break by token
    assert (got["cnt"].diff().dropna() <= 0).all()
    want = duckdb.sql(f"""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS token
          FROM read_parquet('{SF}/documents.parquet'))
        GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 10""").fetchdf()
    assert got.reset_index(drop=True).equals(want)


# ------------------------------------------------ sketches (HLL, Count-Min)


def test_hll_accuracy_and_merge():
    from rayenc.ops.sketch import HyperLogLog

    rng = np.random.default_rng(1)
    h = HyperLogLog(14)
    x = rng.integers(0, 2**64, 200_000, dtype=np.uint64)
    h.add_hashes(x)
    assert abs(h.estimate() - 200_000) / 200_000 < 0.03  # ~3 sigma at p=14
    # duplicates don't move the estimate
    h.add_hashes(x[:50_000])
    assert abs(h.estimate() - 200_000) / 200_000 < 0.03
    # merged partials == single-pass registers
    a, b, c = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
    a.add_hashes(x[:120_000]); b.add_hashes(x[100_000:]); c.add_hashes(x)
    a.merge(b)
    assert (a.registers == c.registers).all()
    # serialization round trip
    back = HyperLogLog.from_bytes(a.to_bytes())
    assert back.p == 12 and (back.registers == a.registers).all()


def test_hll_small_range_linear_counting():
    from rayenc.ops.sketch import HyperLogLog

    h = HyperLogLog(12)
    x = np.random.default_rng(2).integers(0, 2**64, 300, dtype=np.uint64)
    h.add_hashes(x)
    assert abs(h.estimate() - 300) < 15


def test_cms_overcount_only_and_merge():
    from rayenc.ops.sketch import CountMin

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    counts = rng.integers(1, 100, 5000).astype(np.int64)
    s = CountMin(1 << 14, 4)
    s.add_hashes(keys, counts)
    est = s.query_hashes(keys)
    assert (est >= counts).all()  # never undercounts
    assert (est == counts).mean() > 0.95  # mostly exact at this load
    # merge == single pass
    a, b = CountMin(1 << 14, 4), CountMin(1 << 14, 4)
    a.add_hashes(keys[:3000], counts[:3000])
    b.add_hashes(keys[3000:], counts[3000:])
    a.merge(b)
    assert (a.table == s.table).all()


def test_distributed_sketches_over_documents(ray_session):
    import duckdb

    import ray

    from rayenc.ops import sketch

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    est = sketch.hll_distinct(ds, "text", p=12)
    assert abs(est - exact) / exact < 0.05
    truth = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""SELECT token, COUNT(*) FROM (SELECT unnest(string_split(text,' '))
            AS token FROM read_parquet('{SF}/documents.parquet'))
            GROUP BY token"""
        ).fetchall()
    }
    cm = sketch.cms_token_counts(ds, ["the", "data", "zzz_absent"])
    assert cm["the"] >= truth.get("the", 0)
    assert cm["zzz_absent"] <= 2  # tiny table: collisions ~0


# ----------------------------------------------------- broadcast hash join


def test_broadcast_join_inner_and_left(ray_session):
    import duckdb
    import pyarrow.parquet as pq

    import ray

    from rayenc.ops.join import broadcast_join

    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
    ).rename_columns(["o_custkey", "c_name"])
    ds = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    got = broadcast_join(ds, cust, "o_custkey").to_pandas()
    want = duckdb.sql(f"""
        SELECT o_orderkey, o_custkey, c_name
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
        ON o.o_custkey = c.c_custkey""").fetchdf()
    k = sorted(got.columns)
    assert got[k].sort_values(k).reset_index(drop=True).equals(
        want[k].sort_values(k).reset_index(drop=True)
    )
    # left outer keeps every order even when the dim row is absent
    lo = broadcast_join(ds, cust.slice(0, 5), "o_custkey",
                        join_type="left outer")
    assert lo.count() == ds.count()


def test_broadcast_join_size_guard(ray_session):
    import pyarrow as pa

    import ray

    from rayenc.ops.join import broadcast_join

    big = pa.table({"k": pa.array(range(1000))})
    ds = ray.data.from_items([{"k": 1}])
    with pytest.raises(ValueError, match="broadcast"):
        broadcast_join(ds, big, "k", max_broadcast_bytes=100)


def test_shuffle_join_matches_broadcast(ray_session):
    import pyarrow.parquet as pq

    import ray

    from rayenc.ops.join import broadcast_join, shuffle_join

    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_name"]
    ).rename_columns(["o_custkey", "c_name"])
    ds = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    right = ray.data.from_arrow(cust)
    a = shuffle_join(ds, right, "o_custkey", num_buckets=8).to_pandas()
    b = broadcast_join(ds, cust, "o_custkey").to_pandas()
    k = sorted(a.columns)
    assert a[k].sort_values(k).reset_index(drop=True).equals(
        b[k].sort_values(k).reset_index(drop=True)
    )


def test_asof_join_semantics(ray_session):
    import datetime as dt

    import ray

    from rayenc.ops.join import asof_join

    base = dt.datetime(2024, 1, 1)
    left = ray.data.from_items([
        {"user_id": 1, "ts": base + dt.timedelta(minutes=m), "ev": f"L{m}"}
        for m in (5, 15, 25)
    ] + [{"user_id": 2, "ts": base, "ev": "L-nope"}])
    right = ray.data.from_items([
        {"user_id": 1, "ts": base + dt.timedelta(minutes=m), "px": m}
        for m in (0, 10, 20)
    ])
    out = {r["ev"]: r["px"] for r in
           asof_join(left, right, by="user_id", on="ts").take_all()}
    # each left row matches the latest right at-or-before its ts;
    # user 2 has no right rows -> null
    assert out == {"L5": 0, "L15": 10, "L25": 20, "L-nope": None}


def test_range_join_overlaps_and_misses(ray_session):
    import pyarrow as pa

    import ray

    from rayenc.ops.join import range_join

    iv = pa.table({
        "name": ["a", "b", "wide"],
        "lo": [0.0, 10.0, 5.0],
        "hi": [10.0, 20.0, 15.0],
    })
    ds = ray.data.from_items([{"v": 7.0}, {"v": 12.0}, {"v": 99.0}])
    got = sorted(
        (r["v"], r["name"]) for r in range_join(ds, iv, "v").take_all()
    )
    # 7 hits a+wide, 12 hits b+wide, 99 hits nothing (dropped, inner)
    assert got == [(7.0, "a"), (7.0, "wide"), (12.0, "b"), (12.0, "wide")]


def test_quantized_topk(ray_session):
    """Int8 quantization: 4x byte cut, exact self-match at the fixed point,
    and near-exact agreement with float brute force on real embeddings."""
    import numpy as np

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    mat = similarity._to_matrix(emb.column("embedding"))
    ids = emb.column("vec_id").to_numpy()

    dq = similarity.quantize_embeddings(ds)
    t = pa.concat_tables([ray.get(r) for r in dq.to_arrow_refs()])
    assert "embedding" not in t.column_names
    code = t.column("q_code").combine_chunks()
    assert code.values.type == pa.int8()
    assert code.values.nbytes * 4 == mat.astype(np.float32).nbytes

    out = similarity.brute_force_topk_quantized(dq, mat[:10], ids[:10], k=5)
    df = out.to_pandas()
    top1 = df[df["rank"] == 1].sort_values("query_id")
    assert top1.neighbor_id.tolist() == sorted(ids[:10].tolist())
    # quantized top-5 overlaps float top-5 heavily
    exact = similarity.brute_force_topk(
        ray.data.read_parquet(f"{SF}/embeddings.parquet"), mat[:10], ids[:10], k=5
    ).to_pandas()
    overlap = 0
    for qid in ids[:10]:
        a = set(df[df.query_id == qid].neighbor_id)
        b = set(exact[exact.query_id == qid].neighbor_id)
        overlap += len(a & b)
    assert overlap >= 40  # >=80% of 50


def test_scrub_pii():
    t = pa.table({"doc_id": [1, 2, 3, 4], "text": [
        "mail john.doe+x@example.co.uk or call +1 (555) 123-4567",
        "server 192.168.0.1; me@x.io",
        "clean text", None,
    ]})
    out = text.scrub_pii(t).column("text").to_pylist()
    assert out[0] == "mail <EMAIL> or call <PHONE>"
    assert out[1] == "server <IP>; <EMAIL>"
    assert out[2] == "clean text" and out[3] is None
    # oracle-parity of the shared patterns through duckdb's RE2
    import duckdb

    from rayenc.ops.text import pii_sql_expr
    want = [r[0] for r in duckdb.sql(
        f"SELECT {pii_sql_expr()} FROM t ORDER BY doc_id"
    ).fetchall()]
    assert out == want


def test_decontamination(ray_session):
    """Hashed n-gram decontamination flags every doc sharing a >=n char
    span with a probe, and nothing else on real sf0.01 documents."""
    import numpy as np

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = docs.column("text").to_pylist()
    # probe = an exact span copied out of doc 0 (plus a never-present one)
    probes = [texts[0][20:60], "@@this n-gram exists nowhere@@"]
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = pa.concat_tables([
        ray.get(r) for r in text.ngram_contamination(ds, probes, n=13)
        .to_arrow_refs()
    ]).sort_by("doc_id")
    flags = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("contaminated").to_pylist()))
    assert out.num_rows == docs.num_rows
    assert flags[docs.column("doc_id")[0].as_py()] is True
    # every flagged doc really shares a 13-char window with the probe
    probe = probes[0]
    grams = {probe[i:i + 13] for i in range(len(probe) - 12)}
    for d, t_ in zip(docs.column("doc_id").to_pylist(), texts):
        really = any(g in t_ for g in grams)
        assert flags[d] == really, d

    # exact substring variant agrees with python membership
    sub = text.substring_contamination(docs, [probes[0]])
    want = [probes[0] in t_ for t_ in texts]
    assert sub.column("contaminated").to_pylist() == want


def test_repetition_ratios():
    t = pa.table({"doc_id": [0, 1, 2], "text": [
        "abcabcabcabcabcabc",  # 9 windows, 3 distinct -> 2/3 duplicated
        "abcdefghijklmnopqr",  # all distinct
        "short",               # < n -> null
    ]})
    out = text.repetition_ratios(t, n=10)
    vals = out.column("dup_ratio").to_pylist()
    assert abs(vals[0] - 2 / 3) < 1e-12
    assert vals[1] == 0.0 and vals[2] is None


def test_grouped_percentiles(ray_session):
    import duckdb
    import numpy as np

    from rayenc.ops.sketch import grouped_percentiles

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    parts = [ray.get(r) for r in
             grouped_percentiles(ds, "source", "n_chars").to_arrow_refs()]
    t = pa.concat_tables(
        [p.select(["source", "p50", "p90"]) for p in parts
         if p.num_rows and "p50" in p.column_names]
    ).sort_by("source")
    want = duckdb.sql(
        f"SELECT source, quantile_cont(n_chars, 0.5) p50,"
        f" quantile_cont(n_chars, 0.9) p90"
        f" FROM read_parquet('{SF}/documents.parquet')"
        f" GROUP BY source ORDER BY source"
    ).fetchall()
    got = list(zip(t.column("source").to_pylist(),
                   t.column("p50").to_pylist(), t.column("p90").to_pylist()))
    assert len(got) == len(want)
    for (s1, a1, b1), (s2, a2, b2) in zip(got, want):
        assert s1 == s2
        assert np.isclose(a1, a2, rtol=0, atol=1e-9)
        assert np.isclose(b1, b2, rtol=0, atol=1e-9)


def test_running_totals(ray_session):
    from rayenc.ops import sessions

    t = pa.table({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pa.array([3, 1, 2, 5, 4], pa.timestamp("us")),
        "event_id": pa.array([30, 10, 20, 50, 40], pa.int64()),
    })
    ds = ray.data.from_arrow(t)
    parts = [ray.get(r) for r in
             sessions.running_totals(ds).to_arrow_refs()]
    out = pa.concat_tables([p for p in parts if p.num_rows]).sort_by(
        [("user_id", "ascending"), ("event_id", "ascending")]
    )
    assert out.column("running_total").to_pylist() == [10, 30, 60, 40, 90]


def test_group_quota_skewed(ray_session):
    import ray

    from rayenc.ops import sample

    # heavy skew + one group under the cap + non-contiguous keys
    rows = (
        [{"k": 2 * i + 1, "g": "big"} for i in range(500)]
        + [{"k": 10_000 + i, "g": "mid"} for i in range(40)]
        + [{"k": 90_000 + i, "g": "tiny"} for i in range(3)]
    )
    ds = ray.data.from_items(rows).repartition(7)
    got = sample.group_quota(ds, "k", "g", 10).take_all()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["k"])
    assert sorted(by_g["big"]) == [2 * i + 1 for i in range(10)]
    assert sorted(by_g["mid"]) == [10_000 + i for i in range(10)]
    assert sorted(by_g["tiny"]) == [90_000, 90_001, 90_002]  # under cap: all


def test_group_sample_exact_and_deterministic(ray_session):
    import ray

    from rayenc.ops import sample

    rows = [{"k": i, "g": "ab"[i % 2]} for i in range(300)] + [
        {"k": 1000 + i, "g": "small"} for i in range(5)
    ]
    ds = ray.data.from_items(rows).repartition(5)
    got1 = sorted((r["g"], r["k"]) for r in sample.group_sample(ds, "k", "g", 20, salt=4).take_all())
    got2 = sorted((r["g"], r["k"]) for r in sample.group_sample(ds, "k", "g", 20, salt=4).take_all())
    assert got1 == got2  # pure function of (key, salt)
    from collections import Counter
    c = Counter(g for g, _ in got1)
    assert c == {"a": 20, "b": 20, "small": 5}  # exact-N, under-cap keeps all
    other = sorted((r["g"], r["k"]) for r in sample.group_sample(ds, "k", "g", 20, salt=5).take_all())
    assert other != got1  # salt changes the draw


def test_group_quota_and_sample_random_shapes(ray_session):
    # randomized cross-check vs a pandas reference over random group
    # shapes, caps and partitionings (unique keys — the documented domain)
    import pandas as pd
    import ray

    from rayenc.ops import sample

    rng = np.random.default_rng(11)
    for trial in range(4):
        n_groups = int(rng.integers(1, 8))
        sizes = rng.integers(1, 60, n_groups)
        keys = rng.permutation(10_000)[: sizes.sum()]
        rows, k = [], 0
        for g in range(n_groups):
            for _ in range(sizes[g]):
                rows.append({"k": int(keys[k]), "g": f"g{g}"})
                k += 1
        cap = int(rng.integers(1, 25))
        parts = int(rng.integers(1, 9))
        ds = ray.data.from_items(rows).repartition(parts)
        df = pd.DataFrame(rows)
        want = (
            df.sort_values(["g", "k"]).groupby("g").head(cap)
        )
        got = sample.group_quota(ds, "k", "g", cap).take_all()
        assert sorted((r["g"], r["k"]) for r in got) == sorted(
            zip(want["g"], want["k"])
        ), f"trial {trial} cap {cap} parts {parts}"
        # sampling: exact per-group counts, deterministic, within the keys
        samp = sample.group_sample(ds, "k", "g", cap, salt=trial).take_all()
        from collections import Counter

        cnt = Counter(r["g"] for r in samp)
        assert cnt == {
            f"g{g}": min(cap, int(sizes[g])) for g in range(n_groups)
        }, f"trial {trial}"


# ----------------------------------------------- duplicate spans (substring)


def _naive_dup_spans(texts: dict, window: int):
    from collections import Counter, defaultdict

    docwins, occ = defaultdict(set), []
    for did, x in texts.items():
        for i in range(len(x) // window):
            w = x[i * window : (i + 1) * window]
            docwins[w].add(did)
            occ.append((did, w))
    dup = {w for w, ds in docwins.items() if len(ds) >= 2}
    counts = Counter(did for did, w in occ if w in dup)

    def clean(x):
        n = len(x) // window
        return (
            "".join(
                x[i * window : (i + 1) * window]
                for i in range(n)
                if x[i * window : (i + 1) * window] not in dup
            )
            + x[n * window :]
        )

    return dict(counts), {did: clean(x) for did, x in texts.items()}


@pytest.fixture(scope="module")
def span_docs(ray_session):
    shared = "ABCDEFGH"  # one exact window
    texts = {
        0: shared + "xxxxyyyy" + shared + "tail",  # shared twice + remainder
        1: "zzzzzzzz" + shared,  # shares with 0
        2: "qqqqqqqqrrrrrrrr",  # unique windows
        3: "short",  # below window size
        4: "zzzzzzzz" + "zzzzzzzz",  # same window twice, ONE doc only
        5: "",  # empty
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values())),
            "source": pa.array([f"s{i}" for i in texts]),
        }
    )
    return texts, ray.data.from_arrow(tbl).repartition(3)


def test_duplicate_span_counts(span_docs):
    texts, ds = span_docs
    want, _ = _naive_dup_spans(texts, 8)
    out = dedup.duplicate_span_counts(ds, window=8).to_pandas()
    got = dict(zip(out.doc_id, out.n_dup_windows))
    # doc 4's repeated window lives in >=2 docs (docs 1 and 4) -> both count;
    # doc 0's `shared` window counts twice there
    assert got == want


@pytest.mark.parametrize("max_broadcast", [1_000_000, 1])
def test_remove_duplicate_spans(span_docs, max_broadcast):
    texts, ds = span_docs
    _, want = _naive_dup_spans(texts, 8)
    out = dedup.remove_duplicate_spans(
        ds, window=8, max_broadcast=max_broadcast
    ).to_pandas()
    assert dict(zip(out.doc_id, out.text)) == want
    # untouched columns survive both regimes
    assert dict(zip(out.doc_id, out.source)) == {i: f"s{i}" for i in texts}


def test_remove_duplicate_spans_no_dups_is_identity(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["aaaaaaaabbbbbbbb", "ccccccccdddddddd"])}
    )
    ds = ray.data.from_arrow(tbl)
    out = dedup.remove_duplicate_spans(ds, window=8).to_pandas()
    assert sorted(out.text) == ["aaaaaaaabbbbbbbb", "ccccccccdddddddd"]
    assert dedup.duplicate_span_counts(ds, window=8).count() == 0


def test_window_spans_preserves_string_type(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["ABCDEFGHrest", "ABCDEFGH"], pa.large_string())}
    )
    out_ds = dedup.remove_duplicate_spans(
        ray.data.from_arrow(tbl), window=8
    )
    t = pa.concat_tables(
        [ray.get(r) for r in out_ds.to_arrow_refs() if ray.get(r).num_rows]
    )
    assert pa.types.is_large_string(t.schema.field("text").type)
    got = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    assert got == {1: "rest", 2: ""}


@pytest.fixture(scope="module")
def token_docs(ray_session):
    W = 4
    toks = {
        0: [9, 9, 9, 9] + [100, 101, 102, 103] + [7],   # boiler + unique + rem
        1: [9, 9, 9, 9] + [200, 201, 202, 203],          # shares boiler with 0
        2: [300, 301, 302, 303, 304, 305, 306, 307],     # unique
        3: [9, 9],                                        # below window
        4: [],                                            # empty
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(toks), pa.int64()),
            "tokens": pa.array(list(toks.values()), pa.list_(pa.int32())),
            "n_tok": pa.array([len(v) for v in toks.values()], pa.int32()),
        }
    )
    return toks, ray.data.from_arrow(tbl).repartition(3)


def test_duplicate_token_span_counts(token_docs):
    toks, ds = token_docs
    out = dedup.duplicate_token_span_counts(ds, window=4).to_pandas()
    assert dict(zip(out.doc_id, out.n_dup_windows)) == {0: 1, 1: 1}


@pytest.mark.parametrize("max_broadcast", [1_000_000, 1])
def test_remove_duplicate_token_spans(token_docs, max_broadcast):
    toks, ds = token_docs
    out_ds = dedup.remove_duplicate_token_spans(
        ds, window=4, max_broadcast=max_broadcast
    )
    t = pa.concat_tables(
        [ray.get(r) for r in out_ds.to_arrow_refs() if ray.get(r).num_rows]
    )
    got = dict(
        zip(t.column("doc_id").to_pylist(),
            [list(x) for x in t.column("tokens").to_pylist()])
    )
    want = {
        0: [100, 101, 102, 103, 7],
        1: [200, 201, 202, 203],
        2: [300, 301, 302, 303, 304, 305, 306, 307],
        3: [9, 9],
        4: [],
    }
    assert got == want
    nts = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("n_tok").to_pylist()))
    assert nts == {k: len(v) for k, v in want.items()}
    # schema preserved: list<int32> stays list<int32>, n_tok stays int32
    assert t.schema.field("tokens").type == pa.list_(pa.int32())
    assert t.schema.field("n_tok").type == pa.int32()


def _naive_stride_dup(texts: dict, window: int, stride: int):
    from collections import Counter, defaultdict

    docwins, occ = defaultdict(set), []
    for did, x in texts.items():
        n = max(0, (len(x) - window) // stride + 1)
        for i in range(n):
            w = x[i * stride : i * stride + window]
            docwins[w].add(did)
            occ.append((did, i, w))
    dup = {w for w, ds in docwins.items() if len(ds) >= 2}
    counts = Counter(did for did, _, w in occ if w in dup)
    cleaned = {}
    for did, x in texts.items():
        keep = [True] * len(x)
        n = max(0, (len(x) - window) // stride + 1)
        for i in range(n):
            w = x[i * stride : i * stride + window]
            if w in dup:
                for j in range(i * stride, i * stride + window):
                    keep[j] = False
        cleaned[did] = "".join(c for c, k in zip(x, keep) if k)
    return dict(counts), cleaned


def test_duplicate_spans_sliding_stride(ray_session):
    # shared phrase at DIFFERENT offsets in two docs: fixed windows miss it,
    # stride-1 sliding windows catch it
    shared = "DUPLICATE!"  # 10 chars, window=10
    texts = {
        1: "aaa" + shared + "bbbbbbb",
        2: "zzzzz" + shared + "qq",
        3: "unrelated text here!",
    }
    tbl = pa.table(
        {"doc_id": pa.array(list(texts), pa.int64()),
         "text": pa.array(list(texts.values()))}
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    # aligned windows: no detection
    assert dedup.duplicate_span_counts(ds, window=10).count() == 0
    # sliding: both docs flagged once
    want, cleaned = _naive_stride_dup(texts, 10, 1)
    out = dedup.duplicate_span_counts(ds, window=10, stride=1).to_pandas()
    assert dict(zip(out.doc_id, out.n_dup_windows)) == want == {1: 1, 2: 1}
    got = dedup.remove_duplicate_spans(ds, window=10, stride=1).to_pandas()
    assert dict(zip(got.doc_id, got.text)) == cleaned
    assert cleaned[1] == "aaabbbbbbb" and cleaned[2] == "zzzzzqq"


def test_remove_spans_overlapping_union(ray_session):
    # two dup windows overlap inside one doc -> union removed, no double count
    texts = {
        1: "ABCDEFGH" + "IJKL",      # windows at stride 4: ABCD..., EFGH...
        2: "xxABCDEFGHxx",
        3: "ABCDEFGHyyyy",
    }
    tbl = pa.table(
        {"doc_id": pa.array(list(texts), pa.int64()),
         "text": pa.array(list(texts.values()))}
    )
    ds = ray.data.from_arrow(tbl)
    want, cleaned = _naive_stride_dup(texts, 8, 1)
    out = dedup.remove_duplicate_spans(ds, window=8, stride=1).to_pandas()
    assert dict(zip(out.doc_id, out.text)) == cleaned


def test_token_spans_sliding_stride(ray_session):
    toks = {
        1: [5, 6, 7, 8, 1],          # shared run at offset 0
        2: [9, 5, 6, 7, 8],          # shared run at offset 1
        3: [1, 2, 3, 4, 5],
    }
    tbl = pa.table(
        {"doc_id": pa.array(list(toks), pa.int64()),
         "tokens": pa.array(list(toks.values()), pa.list_(pa.int32())),
         "n_tok": pa.array([len(v) for v in toks.values()], pa.int32())}
    )
    ds = ray.data.from_arrow(tbl)
    assert dedup.duplicate_token_span_counts(ds, window=4).count() == 0
    out = dedup.duplicate_token_span_counts(ds, window=4, stride=1).to_pandas()
    assert dict(zip(out.doc_id, out.n_dup_windows)) == {1: 1, 2: 1}
    t = pa.concat_tables(
        [ray.get(r) for r in
         dedup.remove_duplicate_token_spans(ds, window=4, stride=1)
         .to_arrow_refs() if ray.get(r).num_rows]
    )
    got = dict(zip(t.column("doc_id").to_pylist(),
                   [list(x) for x in t.column("tokens").to_pylist()]))
    assert got == {1: [1], 2: [9], 3: [1, 2, 3, 4, 5]}
    assert dict(zip(t.column("doc_id").to_pylist(),
                    t.column("n_tok").to_pylist())) == {1: 1, 2: 1, 3: 5}


def test_asof_join_null_timestamps_match_duckdb(ray_session):
    # null RIGHT ts rows are dropped (never "the latest <= l.on"); null
    # LEFT ts sorts NULLS-LAST and matches the latest valid right row —
    # DuckDB ASOF LEFT JOIN semantics, verified against the oracle
    import duckdb
    import pandas as pd

    from rayenc.ops import join

    lt = pa.table({"g": pa.array(["a", "a", "a", "b"]),
                   "ts": pa.array([5.0, 1.0, None, 2.0]),
                   "id": pa.array([1, 2, 3, 4])})
    rt = pa.table({"g": pa.array(["a", "a", "b"]),
                   "ts": pa.array([0.0, 4.0, None]),
                   "price": pa.array([10.0, 20.0, 99.0])})
    got = (
        join.asof_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt), "g", "ts")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    l_df, r_df = lt.to_pandas(), rt.to_pandas()
    want = duckdb.sql(
        "SELECT l.id, r.price FROM l_df l ASOF LEFT JOIN r_df r "
        "ON l.g = r.g AND l.ts >= r.ts ORDER BY id"
    ).df()
    pd.testing.assert_series_equal(got["price"], want["price"])


def test_range_join_differential_vs_bruteforce(ray_session):
    # the r5 searchsorted/segment-decomposition rewrite must agree with the
    # O(n*k) definition on dense overlapping intervals incl. exact-boundary
    # values (lo inclusive, hi exclusive)
    import numpy as np
    import pyarrow as pa

    import ray

    from rayenc.ops.join import range_join

    rng = np.random.default_rng(3)
    k = 200
    lo = rng.uniform(0, 100, k)
    hi = lo + rng.uniform(0.1, 20, k)
    iv = pa.table({"iid": np.arange(k, dtype=np.int64), "lo": lo, "hi": hi})
    vals = np.concatenate(
        [rng.uniform(-5, 110, 500), lo[:20], hi[:20]]  # boundary probes
    )
    ds = ray.data.from_arrow(
        pa.table({"v": vals, "rid": np.arange(len(vals), dtype=np.int64)})
    )
    got = sorted((r["rid"], r["iid"]) for r in range_join(ds, iv, "v").take_all())
    want = sorted(
        (rid, iid)
        for rid, v in enumerate(vals)
        for iid in range(k)
        if lo[iid] <= v < hi[iid]
    )
    assert got == want
