"""Hand-computed fixtures for fusion / aggregation / evaluation / TREC I/O,
mirroring the reference semantics (fusion.py / aggregation.py /
evaluation.py / trec_io.py)."""

from __future__ import annotations

import math
import os

import pytest

from text_retrieval_and_search_engines_spark.operators import (
    aggregation as agg)
from text_retrieval_and_search_engines_spark.operators import fusion
from text_retrieval_and_search_engines_spark.operators import (
    evaluation as ev)
from text_retrieval_and_search_engines_spark.sources import trec_io


@pytest.fixture(scope="module")
def runs_df(spark):
    # two runs, partially overlapping docs; includes a doc in only one run
    rows = [
        ("r1", "q1", "d1", 10.0), ("r1", "q1", "d2", 5.0), ("r1", "q1", "d3", 1.0),
        ("r2", "q1", "d2", 2.0), ("r2", "q1", "d4", 1.0),
        ("r1", "q2", "d1", 3.0), ("r2", "q2", "d1", 3.0),  # constant-score run
    ]
    return spark.createDataFrame(
        rows, "run_id string, qid string, docid string, score double")


def _d(df):
    return {(r["qid"], r["docid"]): r["score"] for r in df.collect()}


def test_rrf(runs_df):
    got = _d(fusion.rrf(runs_df, k=60))
    assert math.isclose(got[("q1", "d1")], 1 / 61)
    assert math.isclose(got[("q1", "d2")], 1 / 62 + 1 / 61)
    assert math.isclose(got[("q1", "d4")], 1 / 62)
    assert math.isclose(got[("q2", "d1")], 2 / 61)


def test_combsum_and_mnz(runs_df):
    got = _d(fusion.combsum(runs_df))
    # q1/r1: d1=1, d2=(5-1)/9, d3=0 ; q1/r2: d2=1, d4=0
    assert math.isclose(got[("q1", "d2")], 4 / 9 + 1.0)
    assert math.isclose(got[("q1", "d1")], 1.0)
    # constant-score run -> degenerate 0.5 per run
    assert math.isclose(got[("q2", "d1")], 1.0)
    mnz = _d(fusion.combmnz(runs_df))
    assert math.isclose(mnz[("q1", "d2")], (4 / 9 + 1.0) * 2)
    assert math.isclose(mnz[("q1", "d3")], 0.0)


def test_weighted_fusion(runs_df):
    got = _d(fusion.weighted_fusion(runs_df, {"r1": 2.0, "r2": 1.0}))
    assert math.isclose(got[("q1", "d2")], 2.0 * (4 / 9) + 1.0 * 1.0)
    assert math.isclose(got[("q1", "d1")], 2.0)


def test_fusion_run_order_invariance(spark, runs_df):
    flipped = runs_df.orderBy("docid", "run_id")
    a = _d(fusion.rrf(runs_df))
    b = _d(fusion.rrf(flipped))
    assert a == b


@pytest.fixture(scope="module")
def passages_df(spark):
    rows = [
        ("q1", "d1", 0, 1.0), ("q1", "d1", 1, 5.0), ("q1", "d1", 2, 3.0),
        ("q1", "d2", 0, 2.0),
        ("q2", "d1", 0, 4.0), ("q2", "d1", 1, 4.0),
    ]
    return spark.createDataFrame(
        rows, "qid string, docid string, passage_idx int, score double")


def test_aggregation_strategies(passages_df):
    assert _d(agg.max_p(passages_df))[("q1", "d1")] == 5.0
    assert _d(agg.sum_p(passages_df))[("q1", "d1")] == 9.0
    assert _d(agg.first_p(passages_df))[("q1", "d1")] == 1.0
    assert math.isclose(_d(agg.avg_p(passages_df))[("q1", "d1")], 3.0)
    assert math.isclose(_d(agg.topk_p(passages_df, 2))[("q1", "d1")], 4.0)
    hybrid = _d(agg.max_first_hybrid(passages_df))
    assert math.isclose(hybrid[("q1", "d1")], 0.7 * 5.0 + 0.3 * 1.0)
    assert math.isclose(hybrid[("q1", "d2")], 2.0)
    assert _d(agg.aggregate(passages_df, "top3"))[("q2", "d1")] == 4.0
    with pytest.raises(ValueError):
        agg.aggregate(passages_df, "nope")


@pytest.fixture(scope="module")
def eval_fixture(spark):
    # run q1: d1(3.0) d2(2.0) d3(1.0); qrels: d1 rel=2, d3 rel=1, d9 rel=1
    run = spark.createDataFrame(
        [("q1", "d1", 3.0), ("q1", "d2", 2.0), ("q1", "d3", 1.0)],
        "qid string, docid string, score double")
    qrels = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d3", 1), ("q1", "d9", 1), ("q1", "d2", 0)],
        "qid string, docid string, rel int")
    return run, qrels


def test_average_precision(eval_fixture):
    run, qrels = eval_fixture
    got = {r["qid"]: r["ap"] for r in ev.average_precision(run, qrels).collect()}
    # hits at ranks 1 (P=1/1) and 3 (P=2/3); R=3 -> AP=(1+2/3)/3
    assert math.isclose(got["q1"], (1.0 + 2 / 3) / 3)


def test_precision_recall(eval_fixture):
    run, qrels = eval_fixture
    p2 = {r["qid"]: r["p_2"] for r in ev.precision_at(run, qrels, 2).collect()}
    assert math.isclose(p2["q1"], 0.5)
    r2 = {r["qid"]: r["recall_2"] for r in ev.recall_at(run, qrels, 2).collect()}
    assert math.isclose(r2["q1"], 1 / 3)


def test_ndcg(eval_fixture):
    run, qrels = eval_fixture
    got = {r["qid"]: r["ndcg"] for r in ev.ndcg_at(run, qrels).collect()}
    dcg = 2 / math.log2(2) + 0 + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert math.isclose(got["q1"], dcg / idcg)


def test_evaluate_run_and_mean(eval_fixture):
    run, qrels = eval_fixture
    per_q = ev.evaluate_run(run, qrels, p_cutoffs=(2,), r_cutoffs=(2,),
                            ndcg_cutoffs=(None, 2))
    row = per_q.collect()[0]
    assert math.isclose(row["map"], (1.0 + 2 / 3) / 3)
    mean = ev.mean_metrics(per_q).collect()[0]
    assert math.isclose(mean["p_2"], 0.5)


def test_trec_roundtrip(spark, tmp_path, eval_fixture):
    run, _ = eval_fixture
    extra = spark.createDataFrame(
        [("q10", "d1", 1.5)], "qid string, docid string, score double")
    path = os.path.join(str(tmp_path), "run_1.res")
    trec_io.write_run(run.unionByName(extra), path, "myrun")
    lines = open(path).read().splitlines()
    # qid order (len, lex): q1 before q10; %.6f scores; 1-based ranks
    assert lines[0] == "q1 Q0 d1 1 3.000000 myrun"
    assert lines[-1] == "q10 Q0 d1 1 1.500000 myrun"
    back = trec_io.read_run(spark, path)
    assert back.count() == 4
    got = {(r["qid"], r["docid"]): (r["rank"], r["score"]) for r in back.collect()}
    assert got[("q1", "d3")] == (3, 1.0)
