"""pytrec_eval cross-check (VERDICT r3 'what's missing' 3, mirroring the
iceberg/onnx gated smokes): the native DataFrame metrics must agree with
the reference's actual evaluation library on a graded-relevance fixture.
Skipped while the sandbox cannot install pytrec_eval; the first
environment that ships it runs the real cross-check.

Scores in the fixture are all DISTINCT: trec_eval breaks score ties by
docname DESCENDING while the engine pins (score DESC, docid ASC) — a
documented deviation tested separately in test_eval_fixture.py.
"""

from __future__ import annotations

import pytest

pytrec_eval = pytest.importorskip("pytrec_eval")

from text_retrieval_and_search_engines_spark.operators import evaluation  # noqa: E402

RUN = [
    # qid, docid, score  (distinct scores per qid)
    ("q1", 11, 9.0), ("q1", 12, 8.0), ("q1", 13, 7.0), ("q1", 14, 6.0),
    ("q1", 15, 5.0),
    ("q2", 21, 4.0), ("q2", 11, 3.5), ("q2", 23, 3.0), ("q2", 24, 2.0),
    ("q3", 31, 1.5), ("q3", 32, 1.0),           # q3: nothing relevant
]
QRELS = [
    ("q1", 11, 2), ("q1", 13, 1), ("q1", 99, 1),     # one unretrieved rel
    ("q2", 23, 3), ("q2", 24, 1), ("q2", 11, 0),     # graded + explicit 0
    ("q3", 77, 1),
]


def test_native_metrics_match_pytrec_eval(spark):
    run = spark.createDataFrame(RUN, "qid string, docid long, score double")
    qrels = spark.createDataFrame(QRELS, "qid string, docid long, rel int")

    per_q = {r["qid"]: r for r in
             evaluation.evaluate_run(run, qrels).collect()}

    evaluator = pytrec_eval.RelevanceEvaluator(
        {q: {str(d): r for qq, d, r in QRELS if qq == q}
         for q in {q for q, _, _ in QRELS}},
        {"map", "ndcg", "ndcg_cut_10", "P_10", "recall_100"})
    want = evaluator.evaluate(
        {q: {str(d): s for qq, d, s in RUN if qq == q}
         for q in {q for q, _, _ in RUN}})

    assert set(per_q) == set(want)
    pairs = [("map", "map"), ("ndcg", "ndcg"), ("ndcg_10", "ndcg_cut_10"),
             ("p_10", "P_10"), ("recall_100", "recall_100")]
    for qid in want:
        for ours, theirs in pairs:
            assert per_q[qid][ours] == pytest.approx(
                want[qid][theirs], abs=1e-9), (qid, ours)
