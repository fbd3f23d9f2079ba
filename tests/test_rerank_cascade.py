"""Cascade plumbing tests (N3 ensemble / N5 filter->ensemble->scatter)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
    cascade, ensemble)


@pytest.fixture(scope="module")
def passages(spark):
    rows = [("q1", "d1", 0, "alpha beta"), ("q1", "d1", 1, "beta gamma"),
            ("q1", "d2", 0, "alpha alpha"), ("q1", "d3", 0, "unrelated"),
            ("q2", "d1", 0, "zeta")]
    return spark.createDataFrame(
        rows, "qid string, docid string, passage_idx int, passage_text string")


def _scorer(weight_word):
    def fn(p, q):
        return p.select(
            "qid", "docid", "passage_idx",
            F.when(F.col("passage_text").contains(weight_word), 2.0)
            .otherwise(1.0).alias("score"))
    return fn


def test_ensemble_weighted_norm(spark, passages):
    a = _scorer("alpha")(passages, None)
    b = _scorer("beta")(passages, None)
    out = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in ensemble({"a": a, "b": b},
                             {"a": 0.4, "b": 0.6}).collect()}
    # q1/d1/p0 contains alpha and beta -> norm 1.0 in both -> 0.4 + 0.6
    assert math.isclose(out[("q1", "d1", 0)], 1.0)
    # q1/d3 contains neither -> 0 + 0
    assert math.isclose(out[("q1", "d3", 0)], 0.0)
    # q2 single passage: degenerate norm -> 0.5 each -> 0.5
    assert math.isclose(out[("q2", "d1", 0)], 0.5)


def test_cascade_filters_and_scatters(spark, passages):
    out = cascade(
        passages, None,
        first_stage=_scorer("alpha"), filter_k=2,
        later_stages={"ce": _scorer("beta"), "t5": _scorer("gamma")},
        stage_weights={"ce": 0.5, "t5": 0.5})
    got = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in out.collect()}
    assert len(got) == 5  # scatter back to ALL input passages
    assert got[("q1", "d3", 0)] == 0.0  # never survived stage 1
    # survivors get ensemble scores in [0, 1]
    assert all(0.0 <= v <= 1.0 + 1e-9 for v in got.values())
    surviving = [k for k, v in got.items() if v > 0.0]
    assert all(k[0] in ("q1", "q2") for k in surviving)


def test_hashed_linear_scorer_in_cascade(spark, passages):
    """VERDICT r1 item 8: a CPU-real scorer (hashed-feature linear model)
    drives the cascade — its ordering differs from the lexical stand-in,
    it is deterministic across runs, and scatter-back stays exact."""
    from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
        hashed_linear_scorer)

    queries = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "zeta")], "qid string, text string")
    scorer = hashed_linear_scorer(dim=1 << 14, seed=7)

    s1 = scorer(passages, queries).collect()
    s2 = scorer(passages, queries).collect()
    key = lambda r: (r["qid"], r["docid"], r["passage_idx"])
    assert {key(r): r["score"] for r in s1} == \
        {key(r): r["score"] for r in s2}          # deterministic
    scores = {key(r): r["score"] for r in s1}
    assert len(set(scores.values())) > 1           # non-trivial signal

    # ordering differs from the lexical contains-word stand-in
    lex = {key(r): r["score"] for r in _scorer("alpha")(passages, None).collect()}
    q1_keys = [k for k in scores if k[0] == "q1"]
    lex_order = sorted(q1_keys, key=lambda k: (-lex[k], k))
    hash_order = sorted(q1_keys, key=lambda k: (-scores[k], k))
    assert lex_order != hash_order

    out = cascade(
        passages, queries,
        first_stage=scorer, filter_k=2,
        later_stages={"ce": scorer, "lex": _scorer("beta")},
        stage_weights={"ce": 0.6, "lex": 0.4})
    got = {key(r): r["score"] for r in out.collect()}
    assert len(got) == 5                           # scatter-back exact
    # exactly filter_k survivors per qid score > 0 is not guaranteed (norm
    # can be 0), but non-survivors are exactly 0
    surv = {k for k, v in got.items() if v != 0.0}
    assert all(k[0] in ("q1", "q2") for k in surv)


def test_biencoder_scorer_semantics(spark, passages):
    """N1 shape: independent encode + normalized dot. A passage sharing
    query terms scores higher than an unrelated one; identical text scores
    cosine 1.0."""
    from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
        biencoder_scorer)

    queries = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "zeta")], "qid string, text string")
    got = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in biencoder_scorer(dim=128)(passages, queries).collect()}
    # 'alpha beta' query vs 'alpha beta' passage -> cosine 1.0
    assert got[("q1", "d1", 0)] == pytest.approx(1.0, abs=1e-9)
    # overlap beats no overlap
    assert got[("q1", "d1", 1)] > got[("q1", "d3", 0)]
    assert got[("q1", "d3", 0)] == pytest.approx(0.0, abs=1e-9)
    # exact-match passage for q2
    assert got[("q2", "d1", 0)] == pytest.approx(1.0, abs=1e-9)


def test_three_stage_cascade_biencoder_filter(spark, passages):
    """N5 ThreeStage: bi-encoder filter -> {cross-encoder-shape, lexical}
    ensemble -> scatter-back (reference neural_reranker.py:474-612)."""
    from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
        biencoder_scorer, hashed_linear_scorer)

    queries = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "zeta")], "qid string, text string")
    out = cascade(
        passages, queries,
        first_stage=biencoder_scorer(dim=128), filter_k=2,
        later_stages={"ce": hashed_linear_scorer(dim=1 << 14),
                      "t5": _scorer("gamma")},
        stage_weights={"ce": 0.5, "t5": 0.5})
    got = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in out.collect()}
    assert len(got) == 5
    # d3 ('unrelated') can never survive a bi-encoder filter for q1
    assert got[("q1", "d3", 0)] == 0.0


def test_monot5_scorer_range_and_monotonicity(spark, passages):
    """N4 shape: scores live in (0,1) and preserve the underlying logit
    order (sigmoid is monotone)."""
    from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
        hashed_linear_scorer, monot5_scorer)

    queries = spark.createDataFrame(
        [("q1", "alpha beta"), ("q2", "zeta")], "qid string, text string")
    key = lambda r: (r["qid"], r["docid"], r["passage_idx"])
    logits = {key(r): r["score"] for r in
              hashed_linear_scorer(dim=1 << 14, seed=13)(
                  passages, queries).collect()}
    probs = {key(r): r["score"] for r in
             monot5_scorer(dim=1 << 14, seed=13)(
                 passages, queries).collect()}
    assert all(0.0 < v < 1.0 for v in probs.values())
    ks = sorted(logits)
    assert sorted(ks, key=lambda k: logits[k]) == \
        sorted(ks, key=lambda k: probs[k])
