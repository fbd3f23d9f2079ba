"""EP1 3-run pipeline end-to-end (reference main.py:26-234 flow)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from text_retrieval_and_search_engines_spark.plans.pipeline import (
    run1_lexical, run2_reranked, run3_fused, run_pipeline)
from text_retrieval_and_search_engines_spark.sources.pages import synth_queries


@pytest.fixture(scope="module")
def pipeline_inputs(spark, tiny_index):
    reader, oracle, catalog, en = tiny_index
    qpdf = synth_queries(5, seed=42, vocab_size=500)
    queries = spark.createDataFrame(qpdf)
    expanded = queries.select(
        "qid", F.concat_ws(" ", "text", "text").alias("text"))
    docs = catalog.read_table(spark, "docs")
    # planted qrels: oracle top-5 per query are relevant
    rels = []
    for row in qpdf.itertuples():
        for rank, (docid, _) in enumerate(oracle.search(row.text, k=5)):
            rels.append((row.qid, docid, 2 if rank < 2 else 1))
    qrels = spark.createDataFrame(rels, "qid string, docid long, rel int")
    return reader, queries, expanded, docs, qrels


def test_run1_produces_fused_scores(spark, pipeline_inputs):
    reader, queries, expanded, docs, qrels = pipeline_inputs
    r1 = run1_lexical(reader, queries, expanded, docs)
    rows = r1.collect()
    assert rows
    # RRF scores bounded by 2 runs: max 2/61
    assert all(0 < r["score"] <= 2 / 61 + 1e-12 for r in rows)


def test_run2_interpolation_shape(spark, pipeline_inputs):
    reader, queries, expanded, docs, qrels = pipeline_inputs
    r2 = run2_reranked(reader, expanded, docs, rerank_depth=10)
    rows = r2.collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["score"])
    for qid, scores in by_q.items():
        assert all(0.0 <= s <= 1.0 + 1e-9 for s in scores), qid


def test_full_pipeline_with_metrics_and_trec(spark, pipeline_inputs, tmp_path):
    reader, queries, expanded, docs, qrels = pipeline_inputs
    out = run_pipeline(reader, queries, expanded, docs, qrels,
                       out_dir=str(tmp_path))
    assert out["metrics"] is not None
    m = {r["run"]: r for r in out["metrics"].collect()}
    assert set(m) == {"run1", "run2", "run3"}
    # planted qrels from BM25 top-5 -> lexical runs must score well
    assert m["run1"]["map"] > 0.3
    assert m["run3"]["map"] > 0.2
    for f in ("run_1.res", "run_2.res", "run_3.res"):
        path = os.path.join(str(tmp_path), f)
        assert os.path.exists(path)
        lines = open(path).read().splitlines()
        assert lines and len(lines[0].split()) == 6  # TREC 6-column
        assert lines[0].split()[1] == "Q0"
        assert lines[0].split()[2].startswith("https://")  # external ids


def test_run3_is_rrf_of_run1_run2(spark, pipeline_inputs):
    reader, queries, expanded, docs, qrels = pipeline_inputs
    r1 = run1_lexical(reader, queries, expanded, docs)
    r2 = run2_reranked(reader, expanded, docs, rerank_depth=10)
    r3 = run3_fused(r1, r2)
    one = r3.orderBy(F.desc("score")).first()
    assert one["score"] <= 2 / 61 + 1e-12
