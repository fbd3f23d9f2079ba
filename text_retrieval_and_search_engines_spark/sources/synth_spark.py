"""Distributed deterministic corpus generator (bench-scale pages table).

The driver-side generator (sources/pages.py) is fine for fixtures; benches
need 10^5..10^6 docs, so this one generates INSIDE Spark with counter-based
hashing: every token is a pure function of (seed, docid, position), so the
corpus is identical at any parallelism/partitioning — no RNG state to thread
through executors.

Shape matches BASELINE.json input_hint semantics: Zipf(s~1.07) vocabulary
(head-term skew is real), heavy-tailed doc lengths, ~mean_tokens tokens/doc.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .pages import _zipf_probs, make_vocab

_K1 = np.uint64(0x9E3779B97F4A7C15)
_K2 = np.uint64(0xBF58476D1CE4E5B9)
_K3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, uint64 wraparound)."""
    x = (x ^ (x >> np.uint64(30))) * _K2
    x = (x ^ (x >> np.uint64(27))) * _K3
    return x ^ (x >> np.uint64(31))


def _hash01(a: np.ndarray, b: np.ndarray, seed: int) -> np.ndarray:
    """Uniform [0,1) from integer pair — counter-based, order-free."""
    h = _mix(a.astype(np.uint64) * _K1
             + b.astype(np.uint64) * _K2
             + np.uint64(seed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_corpus(spark: SparkSession, n_docs: int, vocab_size: int = 5000,
                 mean_tokens: int = 300, seed: int = 42,
                 n_partitions: int | None = None) -> DataFrame:
    """pages-shaped (url, text) DataFrame, identical at any parallelism."""
    vocab = np.array(make_vocab(vocab_size, seed))
    cum = np.cumsum(_zipf_probs(vocab_size))
    parts = n_partitions or spark.sparkContext.defaultParallelism

    def kernel(iterator):
        for pdf in iterator:
            ids = pdf["id"].to_numpy().astype(np.int64)
            # heavy-tailed doc length: inverse-uniform with cap
            u = _hash01(ids, np.full_like(ids, -1), seed)
            dls = np.minimum(
                (mean_tokens * 0.28 / (u + 0.02)).astype(np.int64) + 5, 20000)
            texts = []
            for docid, dl in zip(ids, dls):
                pos = np.arange(dl, dtype=np.int64)
                uu = _hash01(np.full(dl, docid, dtype=np.int64), pos, seed + 1)
                idx = np.searchsorted(cum, uu)
                texts.append(" ".join(vocab[np.minimum(idx, vocab_size - 1)]))
            yield pd.DataFrame({
                "url": [f"https://example.org/en/doc{i:09d}" for i in ids],
                "text": texts,
            })

    return (spark.range(0, n_docs, 1, parts)
            .mapInPandas(kernel, schema="url string, text string"))
