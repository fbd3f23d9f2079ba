"""Hypothesis property tests for the corpus-hygiene operators (VERDICT r4
item 7): on random corpora with planted n-gram structure, the Spark
operators must agree with a direct Python ground truth — contaminated iff
a true window overlap exists; dup counts/fractions exactly as defined.
Mirrors the BMW==exhaustive property-test pattern (tests/test_bmw.py)."""

from __future__ import annotations

import os
import random
import sys
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_retrieval_and_search_engines_spark.operators import decontam  # noqa: E402

VOCAB = [f"w{i}" for i in range(12)]   # tiny vocab -> real collisions


def _windows(text: str, n: int) -> list[str]:
    words = [w for w in __import__("re").split(r"[^a-z0-9]+", text.lower())
             if w]
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)] \
        if len(words) >= n else []


def _mk_corpus(seed: int, n_docs: int, doc_len: int,
               plant: bool) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    boiler = " ".join(rng.choices(VOCAB, k=6))
    for i in range(n_docs):
        body = " ".join(rng.choices(VOCAB, k=doc_len))
        if plant and i % 3 == 0:
            body += " " + boiler          # shared tail on every 3rd doc
        docs.append((i, body))
    return docs


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10**6), st.integers(2, 5), st.integers(3, 16),
       st.integers(2, 10), st.booleans())
def test_dup_span_stats_matches_python_ground_truth(spark, seed, n, n_docs,
                                                    doc_len, plant):
    docs = _mk_corpus(seed, n_docs, doc_len, plant)
    counts: Counter = Counter()
    per_doc = {}
    for i, t in docs:
        ws = _windows(t, n)
        per_doc[i] = ws
        counts.update(ws)
    expected = {}
    for i, ws in per_doc.items():
        dup = sum(1 for w in ws if counts[w] >= 2)
        frac = round(dup / len(ws), 6) if ws else 0.0
        expected[i] = (len(ws), dup, frac)

    out = decontam.dup_span_stats(
        spark.createDataFrame(docs, "doc_id long, text string"), n=n)
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
           for r in out.collect()}
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 10**6), st.integers(2, 5), st.integers(3, 12),
       st.integers(2, 10))
def test_contamination_matches_python_ground_truth(spark, seed, n, n_docs,
                                                   doc_len):
    rng = random.Random(seed ^ 0x5EED)
    docs = _mk_corpus(seed, n_docs, doc_len, plant=True)
    # benchmark: one planted fragment from a random doc + one fresh line
    donor = docs[rng.randrange(len(docs))][1]
    bench = [(1000, donor[: max(len(donor) // 2, 1)]),
             (1001, " ".join(rng.choices(VOCAB, k=doc_len)))]
    bgrams = set()
    for _, t in bench:
        bgrams.update(_windows(t, n))
    expected = {}
    for i, t in docs:
        ws = _windows(t, n)
        hits = sum(1 for w in ws if w in bgrams)
        expected[i] = (len(ws), hits, int(hits > 0))

    out = decontam.contamination_stats(
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(bench, "doc_id long, text string"), n=n)
    got = {r["doc_id"]: (r["n_windows"], r["n_hits"], r["contaminated"])
           for r in out.collect()}
    assert got == expected
