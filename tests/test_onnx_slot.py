"""ONNX-slot smoke (VERDICT r3 item 8, mirroring tests/test_iceberg.py):
the claim "a real model drops into the cross-encoder slot" as an
EXECUTABLE test. Skipped while the sandbox lacks onnxruntime/onnx; the
first environment that ships them runs a genuine ONNX linear model
through ``onnx_scorer``'s broadcast-join + mapInPandas path and checks it
agrees with ``hashed_linear_scorer`` over identical weights.
"""

from __future__ import annotations

import numpy as np
import pytest

onnx = pytest.importorskip("onnx")
pytest.importorskip("onnxruntime")

from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (  # noqa: E402
    hashed_linear_scorer, onnx_scorer)

DIM = 1 << 10


def _linear_onnx_model(weights: np.ndarray) -> bytes:
    """(n, dim) float32 'features' -> (n, 1) scores = features @ weights."""
    from onnx import TensorProto, helper, numpy_helper

    w = numpy_helper.from_array(
        weights.astype(np.float32).reshape(-1, 1), name="w")
    node = helper.make_node("MatMul", ["features", "w"], ["scores"])
    graph = helper.make_graph(
        [node], "linear_reranker",
        [helper.make_tensor_value_info(
            "features", TensorProto.FLOAT, [None, int(weights.size)])],
        [helper.make_tensor_value_info(
            "scores", TensorProto.FLOAT, [None, 1])],
        initializer=[w])
    model = helper.make_model(graph)
    onnx.checker.check_model(model)
    return model.SerializeToString()


def test_onnx_model_drops_into_cross_encoder_slot(spark):
    weights = np.random.default_rng(3).standard_normal(DIM) * 0.1
    model_bytes = _linear_onnx_model(weights)

    passages = spark.createDataFrame(
        [("q1", 1, 0, "spark shuffles postings fast"),
         ("q1", 2, 0, "an unrelated cooking recipe"),
         ("q2", 1, 1, "bm25 scoring with block max"),
         ("q2", 3, 0, "another unrelated passage")],
        "qid string, docid long, passage_idx int, passage_text string")
    queries = spark.createDataFrame(
        [("q1", "spark postings"), ("q2", "bm25 block max")],
        "qid string, text string")

    got = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in onnx_scorer(model_bytes, dim=DIM)(
               passages, queries).collect()}
    ref = {(r["qid"], r["docid"], r["passage_idx"]): r["score"]
           for r in hashed_linear_scorer(dim=DIM, weights=weights)(
               passages, queries).collect()}
    assert set(got) == set(ref)
    for k in ref:
        # float32 session vs float64 closure weights
        assert abs(got[k] - ref[k]) < 1e-3
    # the model actually discriminates (not all-zero / constant)
    assert len({round(v, 6) for v in got.values()}) > 1
