"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting — all vectorized map_batches stages (pyarrow.compute
/ numpy kernels; compiled state built once per process, not per batch)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import hash_strings

# tiny stopword profiles for the n-gram/stopword language heuristic; good
# enough for corpus routing, not a linguistics claim
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por"},
}


def token_counts(texts) -> pa.Array:
    """Whitespace token count per document (vectorized arrow kernels)."""
    return pc.list_value_length(pc.split_pattern(texts, " ")).cast(pa.int64())


_BPEISH = None


def bpe_ish_token_counts(texts) -> pa.Array:
    """Token count under a BPE-ish word/punct/space regex (compiled once)."""
    global _BPEISH
    if _BPEISH is None:
        _BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    counts = pc.count_substring_regex(texts, _BPEISH)
    return counts.cast(pa.int64())


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals per document: length, word stats, punct and
    digit ratios, stopword fraction."""
    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts).cast(pa.float64())
    words = pc.split_pattern(texts, " ")
    n_words = pc.list_value_length(words).cast(pa.float64())
    n_punct = pc.count_substring_regex(texts, r"[^\w\s]").cast(pa.float64())
    n_digit = pc.count_substring_regex(texts, r"[0-9]").cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1.0))
    mean_word_len = pc.divide(n_chars, safe_words)
    stop_re = r"\b(" + "|".join(sorted(_LANG_PROFILES["en"])) + r")\b"
    n_stop = pc.count_substring_regex(texts, stop_re).cast(pa.float64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": n_words.cast(pa.int64()),
            "mean_word_len": mean_word_len,
            "punct_ratio": pc.divide(n_punct, safe_chars),
            "digit_ratio": pc.divide(n_digit, safe_chars),
            "stopword_ratio": pc.divide(n_stop, safe_words),
        }
    )


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language guess per document."""
    texts = batch.column(text_col)
    words = pc.list_value_length(pc.split_pattern(texts, " ")).cast(pa.float64())
    safe_words = pc.max_element_wise(words, pa.scalar(1.0))
    scores = {}
    for lang, stops in _LANG_PROFILES.items():
        pat = r"\b(" + "|".join(sorted(stops)) + r")\b"
        scores[lang] = pc.divide(
            pc.count_substring_regex(texts, pat).cast(pa.float64()), safe_words
        ).to_numpy(zero_copy_only=False)
    mat = np.stack([scores[lang] for lang in _LANG_PROFILES])
    best = np.argmax(mat, axis=0)
    langs = np.array(list(_LANG_PROFILES))
    conf = mat[best, np.arange(mat.shape[1])]
    pred = np.where(conf > 0.0, langs[best], "unknown")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred.tolist(), pa.string()),
            "lang_conf": pa.array(conf),
        }
    )


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint of the whitespace-normalized text (the
    rolling-hash dedup key)."""
    norm = pc.replace_substring_regex(batch.column(text_col), r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    h = hash_strings(norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(h.view(np.int64)),
        }
    )


def chunk_documents(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id", size: int = 256) -> pa.Table:
    """Split each document into fixed-size character chunks (the
    context-window chunking step of a training-data pipeline), fully
    vectorized: one pyarrow slice per chunk ordinal instead of per-row
    python. Output rows: (id, chunk_idx, chunk) in document order."""
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    # null texts count as empty (one chunk, null slice): a raw null length
    # is NaN in numpy and casts to garbage int64, exploding nchunks
    nchars = (
        pc.fill_null(pc.utf8_length(texts), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nchunks = np.maximum(1, -(-nchars // size))  # empty docs keep one chunk
    ids = batch.column(id_col)
    rep = pa.array(np.repeat(np.arange(len(nchunks)), nchunks))
    starts = np.concatenate([np.arange(k) for k in nchunks]) if len(nchunks) else np.zeros(0, np.int64)
    max_k = int(nchunks.max()) if len(nchunks) else 0
    # per-ordinal vectorized slice: ordinal k covers every doc with >k
    # chunks; the concatenated ordinal-major arrays reorder to
    # (doc, ordinal) with one permutation take
    parts = []
    doc_keys = []
    ord_keys = []
    for k in range(max_k):
        sel = np.flatnonzero(nchunks > k)
        parts.append(
            pc.utf8_slice_codeunits(
                texts.take(pa.array(sel)), k * size, (k + 1) * size
            )
        )
        doc_keys.append(sel)
        ord_keys.append(np.full(len(sel), k, np.int64))
    if parts:
        allc = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])
        dk = np.concatenate(doc_keys)
        ok = np.concatenate(ord_keys)
        perm = np.lexsort((ok, dk))
        chunks = allc.take(pa.array(perm))
    else:
        chunks = pa.array([], pa.string())
    return pa.table(
        {
            id_col: ids.take(rep),
            "chunk_idx": pa.array(starts + 1, pa.int64()),  # 1-based like SQL
            "chunk": chunks,
        }
    )


def pack_sequences(batch: pa.Table, tokens_col: str = "tokens",
                   context_len: int = 2048) -> pa.Table:
    """Greedy first-fit packing of token arrays into fixed-budget training
    sequences WITHIN the batch (cross-partition packing would need a
    shuffle; per-partition packing is the standard scale trade). Documents
    longer than the budget are split. Output: (pack_id, tokens, n_docs)
    with sum(len(tokens)) conserved and every pack <= context_len."""
    toks = batch.column(tokens_col)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    packs = []  # list of (start, stop) runs into values per pack
    cur = []
    budget = context_len
    for i in range(len(lens)):
        a, b = offsets[i], offsets[i + 1]
        while b - a > 0:
            take = min(b - a, budget)
            cur.append((a, a + take))
            a += take
            budget -= take
            if budget == 0:
                packs.append(cur)
                cur = []
                budget = context_len
    if cur:
        packs.append(cur)
    out_vals = np.concatenate(
        [values[a:b] for p in packs for a, b in p]
    ) if packs else np.zeros(0, values.dtype)
    pack_lens = np.array([sum(b - a for a, b in p) for p in packs], np.int64)
    out_off = np.zeros(len(packs) + 1, np.int64)
    np.cumsum(pack_lens, out=out_off[1:])
    return pa.table(
        {
            "pack_id": pa.array(np.arange(len(packs), dtype=np.int64)),
            "tokens": pa.ListArray.from_arrays(
                pa.array(out_off, pa.int32()).cast(pa.int32()),
                pa.array(out_vals),
            ),
            "n_docs": pa.array(
                np.array([len(p) for p in packs], np.int64)
            ),
        }
    )


def token_topk(ds, k: int = 20, text_col: str = "text"):
    """Exact heavy hitters: top-k whitespace tokens by total count.

    Scale shape: each batch pre-aggregates its own token counts (arrow
    split + value_counts — a combiner), so the groupby shuffle moves one
    (token, partial_count) row per distinct token per block instead of
    every token occurrence; the final sort ranks only distinct tokens.
    Ties break on the token string so output is deterministic.
    """
    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column(text_col), " "))
        vc = toks.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["token", "cnt"])

    return (
        counts.map_batches(rename, batch_format="pyarrow")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


# PII patterns shared by scrub_pii and its SQL oracle — both arrow and
# DuckDB run RE2, so one syntax serves both sides verbatim
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def scrub_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails, phone numbers and IPv4 addresses from a text column
    (the standard pre-training privacy scrub), entirely in arrow's RE2
    kernels — no Python-level row loop. Order matters: emails first so a
    user@host doesn't get its digits phone-matched."""
    col = batch.column(text_col)
    for pat, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, col
    )


def pii_sql_expr(text_col: str = "text") -> str:
    """The equivalent DuckDB expression (regexp_replace chain, 'g' flag)
    for oracle parity with scrub_pii."""
    expr = text_col
    for pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


# ---------------------------------------------------------------- decontamination

_FNV = np.uint64(1099511628211)


def _char_ngram_hashes(texts, n: int):
    """Rolling polynomial 64-bit hashes of every n-byte character window
    per string (windows never cross string boundaries). Returns
    (hashes, owner string ids)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    arr = pc.cast(arr, pa.string())
    buf = arr.buffers()
    offsets = np.frombuffer(buf[1], np.int32, len(arr) + 1, arr.offset * 4)
    data = np.frombuffer(buf[2], np.uint8) if buf[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offsets)
    total = int(offsets[-1]) - int(offsets[0])
    data = data[int(offsets[0]): int(offsets[-1])]
    if total < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    d = data.astype(np.uint64)
    acc = np.zeros(total - n + 1, np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):  # intentional mod-2^64 wraparound
        for j in range(n):
            acc += d[j: total - n + 1 + j] * p
            p = p * _FNV
    sid = np.repeat(np.arange(len(arr)), np.maximum(lengths, 0))
    keep = sid[: total - n + 1] == sid[n - 1:]
    return acc[keep], sid[: total - n + 1][keep]


def ngram_contamination(
    ds, probes: "list[str]", n: int = 13,
    text_col: str = "text", id_col: str = "doc_id",
):
    """Test-set decontamination flags: a document is contaminated when it
    shares ANY length-``n`` character n-gram with any probe (benchmark /
    eval) text — the standard n-gram-overlap decontamination rule for
    pre-training corpora. The probe n-gram hash set is built once on the
    driver and broadcast (``ray.put``); each batch computes rolling hashes
    vectorized and one ``np.isin`` — nothing shuffles. Probes shorter
    than ``n`` contribute no n-grams (hash their text as one window by
    lowering ``n`` if that matters)."""
    import ray

    ph, _ = _char_ngram_hashes(pa.array(probes, pa.string()), n)
    probe_ref = ray.put(np.unique(ph))

    def flag(batch: pa.Table) -> pa.Table:
        pset = ray.get(probe_ref)
        h, sid = _char_ngram_hashes(batch.column(text_col), n)
        hit = np.zeros(batch.num_rows, bool)
        if len(h) and len(pset):
            m = np.isin(h, pset)
            np.logical_or.at(hit, sid[m], True)
        return pa.table(
            {id_col: batch.column(id_col), "contaminated": pa.array(hit)}
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def substring_contamination(
    batch: pa.Table, probes: "list[str]",
    text_col: str = "text", id_col: str = "doc_id",
) -> pa.Table:
    """Exact whole-probe containment flags (small probe lists): one arrow
    match_substring pass per probe, OR-combined — the conservative variant
    when the probe set fits a broadcast list of literals."""
    col = batch.column(text_col)
    m = None
    for p in probes:
        k = pc.match_substring(col, p)
        m = k if m is None else pc.or_kleene(m, k)
    if m is None:
        m = pa.array(np.zeros(batch.num_rows, bool))
    return pa.table(
        {id_col: batch.column(id_col),
         "contaminated": pc.fill_null(m, False)}
    )


def repetition_ratios(
    batch: pa.Table, n: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
) -> pa.Table:
    """Per-document repetition quality signal: the fraction of length-``n``
    character n-grams that are duplicates of an earlier one in the same
    document (the Gopher/MassiveText duplicate-n-gram rule used to drop
    boilerplate-heavy pages). ``1 - distinct/total`` per doc, fully
    vectorized: one rolling-hash pass + one lexsort over (doc, hash) —
    no Python per-row loop. Documents shorter than ``n`` emit null."""
    h, sid = _char_ngram_hashes(batch.column(text_col), n)
    nrows = batch.num_rows
    total = np.bincount(sid, minlength=nrows) if len(sid) else np.zeros(nrows, np.int64)
    if len(h):
        order = np.lexsort((h, sid))
        hs, ss = h[order], sid[order]
        new = np.ones(len(hs), bool)
        same = (ss[1:] == ss[:-1]) & (hs[1:] == hs[:-1])
        new[1:] = ~same
        distinct = np.bincount(ss[new], minlength=nrows)
    else:
        distinct = np.zeros(nrows, np.int64)
    ratio = 1.0 - distinct / np.maximum(total, 1)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "dup_ratio": pa.array(ratio, pa.float64(), mask=total == 0),
        }
    )
