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
