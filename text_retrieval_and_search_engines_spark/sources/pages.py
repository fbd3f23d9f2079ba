"""Deterministic synthetic `pages` corpus + query/qrel fixtures (FIXTURES.md).

Shape per BASELINE.json input_hint:
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— a Common-Crawl-style web-page table. ``text`` is exactly what the pinned
extractor produces from ``html`` (byte-identity invariant). Vocabulary is
Zipf-distributed so head-term skew is real; doc lengths are log-normal with a
heavy tail. Everything is a pure function of (seed, n_docs): no external data.

Reference anchors: corpus = 528,155 robust04 docs (``run_pipeline.ipynb``),
queries = TSV qid\\ttext (``src/data_loader.py:12-35``), qrels = whitespace
4-col (``src/data_loader.py:60-85``).
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd

from ..functions.text import extract_text

_BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

_WORD_CORE = [
    "spark", "index", "query", "search", "data", "web", "page", "crawl",
    "text", "term", "score", "rank", "document", "token", "merge", "sort",
    "join", "filter", "batch", "stream", "table", "column", "row", "hash",
    "block", "engine", "retrieval", "running", "connection", "national",
    "optimization", "probate", "relational", "generalization", "archive",
]


def make_vocab(size: int, seed: int = 42) -> list[str]:
    """Deterministic vocabulary of `size` pseudo-words."""
    rng = np.random.default_rng(seed)
    vocab = list(_WORD_CORE)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    while len(vocab) < size:
        ln = int(rng.integers(3, 11))
        vocab.append("".join(rng.choice(letters, size=ln)))
    # dedupe preserving order, then trim
    seen, out = set(), []
    for w in vocab:
        if w not in seen:
            seen.add(w)
            out.append(w)
    while len(out) < size:
        out.append(f"w{len(out):06d}x")
    return out[:size]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def synth_pages(n_docs: int, seed: int = 42, vocab_size: int = 5000,
                mean_tokens: int = 300) -> pd.DataFrame:
    """Generate the pages table as a pandas DataFrame (driver-side fixture).

    Includes the FIXTURES.md edge rows (empty body, tag-only lines, giant
    token, unicode, duplicate texts) in the first docs when n_docs allows.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed))
    probs = _zipf_probs(vocab_size)
    langs = np.where(rng.random(n_docs) < 0.9, "en",
                     rng.choice(["de", "fr", "es", "zh"], size=n_docs))

    mu = math.log(mean_tokens) - 0.5
    lengths = np.maximum(5, rng.lognormal(mu, 1.0, n_docs)).astype(np.int64)
    lengths = np.minimum(lengths, 20000)

    rows = []
    for i in range(n_docs):
        url = f"https://example.org/{langs[i]}/doc{i:08d}"
        ts = _BASE_TS + dt.timedelta(seconds=int(i) * 17)
        body_html = _make_body(i, int(lengths[i]), vocab, probs, rng)
        title_words = vocab[rng.choice(vocab_size, size=3, p=probs)]
        html = (
            "<html><head><title>" + " ".join(title_words) + "</title>"
            "<script>var x = 1 < 2;</script><style>.a{color:red}</style>"
            "</head><body>" + body_html + "</body></html>"
        ).encode("utf-8")
        rows.append((url, ts, html, extract_text(html), str(langs[i])))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _make_body(i: int, n_tokens: int, vocab: np.ndarray, probs: np.ndarray,
               rng: np.random.Generator) -> str:
    # deterministic edge-case docs up front (FIXTURES.md edge rows)
    if i == 1:
        return ""  # empty body
    if i == 2:
        return "<p>   \t  </p>"  # whitespace-only
    if i == 3:
        return "<p><b></b></p><p>ok</p>"  # tag-only lines + short line
    if i == 4:
        return "<p>" + "x" * 900 + "</p>"  # one giant unbroken token
    if i == 5:
        return "<p>café naïve 中文文本 &amp; more</p>"
    words = vocab[rng.choice(len(vocab), size=n_tokens, p=probs)]
    # duplicate-text pair: doc 7 repeats doc 6's body deterministically
    paras = []
    per_para = 40
    for j in range(0, n_tokens, per_para):
        paras.append("<p>" + " ".join(words[j:j + per_para]) + ".</p>")
    return "\n".join(paras)


def synth_queries(n_queries: int, seed: int = 42, vocab_size: int = 5000
                  ) -> pd.DataFrame:
    """Reference-query-set analogue: qid strings '301'.., 2-6 corpus terms.

    Includes one all-OOV query and one stopword-only query (FIXTURES.md §2).
    """
    rng = np.random.default_rng(seed + 1)
    vocab = np.array(make_vocab(vocab_size, seed))
    probs = _zipf_probs(vocab_size)
    rows = []
    for q in range(n_queries):
        qid = str(301 + q)
        if q == n_queries - 1 and n_queries > 2:
            text = "zzzunknownterm qqqmissing"          # all-OOV
        elif q == n_queries - 2 and n_queries > 2:
            text = "the and of"                          # stopword-only
        else:
            k = int(rng.integers(2, 7))
            text = " ".join(vocab[rng.choice(vocab_size, size=k, p=probs)])
        rows.append((qid, text))
    return pd.DataFrame(rows, columns=["qid", "text"])


def write_pages_parquet(path: str, n_docs: int, seed: int = 42,
                        vocab_size: int = 5000) -> pd.DataFrame:
    """Write the synthetic corpus to parquet (driver-side, for fixtures).
    Timestamps coerced to microseconds — Spark rejects TIMESTAMP(NANOS)."""
    pdf = synth_pages(n_docs, seed=seed, vocab_size=vocab_size)
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)
    return pdf
