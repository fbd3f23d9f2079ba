"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All per-doc features are JVM column expressions (codegen, SQL-twinnable for
the DuckDB oracle); the winnowing fingerprint is a vectorized numpy kernel
(pytest-checked — rolling hashes aren't sanely expressible in ANSI SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny pinned function-word lists (n-gram-free heuristic language ID)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "que", "para", "con"),
}


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: argmax over marker-word hit counts; 'und'
    (undetermined) when no markers hit. Deterministic tie-break: language
    code ascending. One split, per-language filtered counts (codegen)."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda w: w != "")
    out = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = list(LANG_MARKERS[lang])
        out = out.withColumn(
            f"hits_{lang}",
            F.size(F.filter(F.col("_w"), lambda w: w.isin(markers))))
        score_cols.append(f"hits_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when((F.col(f"hits_{lang}") == best) & (best > 0),
                       F.lit(lang)).otherwise(guess)
    return out.select("doc_id", *score_cols, guess.alias("lang_guess"))


def quality_features(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc quality features (length, word stats, punct/digit/stopword
    ratios) + a pinned composite score in [0,1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.lower(t), r"[^a-z0-9]+")
    words = F.filter(words, lambda w: w != "")
    n_words = F.size(words)
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(words, F.lit(0),
                                   lambda acc, w: acc + F.length(w))
                       .cast("double") / n_words).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stop_hits = F.size(F.filter(
        words, lambda w: w.isin(["the", "and", "of", "to", "in", "is",
                                 "that", "for", "with", "was"])))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(0.0)
    length_ok = ((n_words >= 10) & (n_words <= 5000)).cast("double")
    wlen_ok = ((mean_wlen >= 2.0) & (mean_wlen <= 12.0)).cast("double")
    score = (0.4 * length_ok + 0.2 * wlen_ok
             + 0.2 * (1.0 - F.least(punct_ratio * 10, F.lit(1.0)))
             + 0.2 * (1.0 - F.least(digit_ratio * 5, F.lit(1.0))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (a word of length L
    costs ceil(L/4) subword tokens — the usual ~4-chars/token heuristic)."""
    t = F.col(text_col)
    ws = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    words = F.filter(F.split(F.lower(t), r"[^a-z0-9]+"), lambda w: w != "")
    bpe = F.aggregate(words, F.lit(0).cast("long"),
                      lambda acc, w: acc + F.ceil(F.length(w) / 4.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(words).cast("long").alias("word_tokens"),
        bpe.alias("bpe_tokens"),
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (the SQL-twinnable exact variant; see `winnowing_fingerprints` for the
    rolling-hash sketch)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.md5(norm).alias("fingerprint"))


def winnowing_fingerprints(docs: DataFrame, k: int = 7, window: int = 4,
                           id_col: str = "doc_id", text_col: str = "text"
                           ) -> DataFrame:
    """Winnowing document sketch (Schleimer et al. 2003): Karp-Rabin rolling
    hashes over char k-grams, min per sliding window, distinct mins =
    fingerprint set. Vectorized numpy kernel (no per-char Python loops)."""
    # powers B^(k-1), ..., B^0 with natural uint64 wraparound (deterministic)
    BASE_INT = 1000003
    powers = np.array(
        [pow(BASE_INT, k - 1 - j, 1 << 64) for j in range(k)], dtype=np.uint64)

    def kernel(iterator):
        from numpy.lib.stride_tricks import sliding_window_view
        for pdf in iterator:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = " ".join(str(text).lower().split())
                arr = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                n = arr.size
                if n < k:
                    ids.append(doc_id)
                    fps.append([int(arr.sum())] if n else [0])
                    continue
                # vectorized k-gram hashes: (windows * powers).sum, uint64 wrap
                h = (sliding_window_view(arr, k) * powers).sum(
                    axis=1, dtype=np.uint64)
                m = h.size
                if m <= window:
                    mins = np.array([h.min()])
                else:
                    mins = np.unique(
                        np.min(sliding_window_view(h, window), axis=1))
                ids.append(doc_id)
                # numpy uint64 -> int64 reinterpret (same bits) for LongType
                fps.append([int(v) for v in mins.view(np.int64)])
            yield pd.DataFrame({"doc_id": ids, "fingerprints": fps})

    return docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text")).mapInPandas(
        kernel, schema="doc_id long, fingerprints array<long>")
