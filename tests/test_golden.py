"""Checked-in golden fixtures pin the analysis chain + oracle behavior
across refactors (FIXTURES.md §7). Regenerate ONLY on a deliberate,
documented semantics change."""

from __future__ import annotations

import json
import math
import os

from text_retrieval_and_search_engines_spark.functions.text import tokenize
from text_retrieval_and_search_engines_spark.oracle.bm25_oracle import (
    OracleIndex)
from text_retrieval_and_search_engines_spark.sources.pages import (
    synth_pages, synth_queries)

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    with open(os.path.join(GOLD, name)) as f:
        return json.load(f)


def test_extraction_bytes_pinned():
    pdf = synth_pages(200, seed=42, vocab_size=500).head(20)
    want = _load("extracted_text.json")
    for row in pdf.itertuples():
        assert row.text == want[row.url], row.url


def test_token_vectors_pinned():
    pdf = synth_pages(200, seed=42, vocab_size=500).head(20)
    want = _load("tokens.json")
    for row in pdf.itertuples():
        assert tokenize(row.text) == want[row.url], row.url


def _oracle():
    pdf = synth_pages(200, seed=42, vocab_size=500)
    en = pdf[pdf.lang == "en"].sort_values("url").reset_index(drop=True)
    return OracleIndex.build(list(zip(range(len(en)), en["text"])))


def test_stats_pinned():
    oracle = _oracle()
    want = _load("stats.json")
    assert oracle.n_docs == want["n_docs"]
    assert math.isclose(oracle.avgdl, want["avgdl"], abs_tol=1e-12)
    for t, (df, cf) in want["terms"].items():
        assert oracle.df(t) == df and oracle.cf(t) == cf, t


def test_topk_pinned():
    oracle = _oracle()
    want = _load("topk.json")
    for row in synth_queries(8, seed=42, vocab_size=500).itertuples():
        got = oracle.search(row.text, k=10)
        exp = want[row.qid]
        assert [d for d, _ in got] == [d for d, _ in exp], row.qid
        for (gd, gs), (ed, es) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=0, abs_tol=1e-12)


def test_rm3_pinned():
    oracle = _oracle()
    want = _load("rm3.json")
    for row in synth_queries(8, seed=42, vocab_size=500).head(3).itertuples():
        got = sorted(oracle.rm3_expand(row.text).items())
        exp = [(t, w) for t, w in want[row.qid]]
        assert [t for t, _ in got] == [t for t, _ in exp], row.qid
        for (gt, gw), (_, ew) in zip(got, exp):
            assert math.isclose(gw, ew, rel_tol=0, abs_tol=1e-12)
