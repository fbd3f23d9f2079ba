"""Authoritative hand-verified evaluation fixture (VERDICT r1 item 7).

pytrec_eval is not installable in this sandbox, so this fixture pins the
trec_eval-documented semantics by hand: graded relevance (rel=2), a
judged-nonrelevant doc (rel=0), a relevant-but-not-retrieved doc, and an
UNJUDGED query that must be excluded from per-query output entirely
(pytrec_eval behavior; reference wraps it at src/evaluation.py:70-108).

Every expected value below is derived inline from the trec_eval formulas
with plain ``math`` — an independent derivation path from the DataFrame
plan under test:

* AP    = (1/R) * sum over relevant retrieved d of (cum_rel@rank / rank)
* P@k   = |relevant in top k| / k
* nDCG@k = DCG@k / IDCG@k, gain = rel (linear), discount = log2(rank+1),
           ideal ranking = (rel DESC, docid ASC)
"""

from __future__ import annotations

import math

import pytest

from text_retrieval_and_search_engines_spark.operators.evaluation import (
    evaluate_run, mean_metrics)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    # q1: d3 judged non-relevant at rank 1, graded d1 (rel=2) at rank 2,
    #     d2 (rel=1) at rank 3, unjudged d4 at rank 4; d9 relevant but
    #     never retrieved (R=3).
    # q2: unjudged d2 at rank 1, d1 (rel=1) at rank 2 (R=1).
    # q3: retrieved but has NO judgments -> excluded from output.
    run = spark.createDataFrame(
        [("q1", "d3", 3.0), ("q1", "d1", 2.5), ("q1", "d2", 2.0),
         ("q1", "d4", 1.0),
         ("q2", "d2", 1.0), ("q2", "d1", 0.5),
         ("q3", "d1", 1.0)],
        "qid string, docid string, score double")
    qrels = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d2", 1), ("q1", "d3", 0), ("q1", "d9", 1),
         ("q2", "d1", 1)],
        "qid string, docid string, rel int")
    return run, qrels


def test_per_query_matches_hand_derivation(spark, fixture_dfs):
    run, qrels = fixture_dfs
    per_q = {r["qid"]: r for r in evaluate_run(run, qrels).collect()}

    # unjudged query excluded entirely (pytrec_eval behavior)
    assert set(per_q) == {"q1", "q2"}

    # ---- AP ---------------------------------------------------------------
    # q1: relevant retrieved at ranks 2 (cum_rel 1) and 3 (cum_rel 2); R=3
    ap_q1 = (1 / 2 + 2 / 3) / 3
    ap_q2 = (1 / 2) / 1
    assert per_q["q1"]["map"] == pytest.approx(ap_q1, abs=1e-6)
    assert per_q["q2"]["map"] == pytest.approx(ap_q2, abs=1e-6)

    # ---- P@10 ---------------------------------------------------------------
    assert per_q["q1"]["p_10"] == pytest.approx(2 / 10, abs=1e-6)
    assert per_q["q2"]["p_10"] == pytest.approx(1 / 10, abs=1e-6)

    # ---- nDCG@10 ------------------------------------------------------------
    dcg_q1 = 2 / math.log2(2 + 1) + 1 / math.log2(3 + 1)
    idcg_q1 = 2 / math.log2(1 + 1) + 1 / math.log2(2 + 1) + 1 / math.log2(3 + 1)
    dcg_q2 = 1 / math.log2(2 + 1)
    idcg_q2 = 1 / math.log2(1 + 1)
    assert per_q["q1"]["ndcg_10"] == pytest.approx(dcg_q1 / idcg_q1, abs=1e-6)
    assert per_q["q2"]["ndcg_10"] == pytest.approx(dcg_q2 / idcg_q2, abs=1e-6)

    # ---- means over judged queries only ------------------------------------
    m = mean_metrics(evaluate_run(run, qrels)).collect()[0]
    assert m["map"] == pytest.approx((ap_q1 + ap_q2) / 2, abs=1e-6)
    assert m["p_10"] == pytest.approx(0.15, abs=1e-6)
    assert m["ndcg_10"] == pytest.approx(
        (dcg_q1 / idcg_q1 + dcg_q2 / idcg_q2) / 2, abs=1e-6)
