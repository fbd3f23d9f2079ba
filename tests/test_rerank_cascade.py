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
