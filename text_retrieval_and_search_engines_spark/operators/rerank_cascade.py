"""Multi-stage reranking cascade plumbing (SURVEY §2.9 N3/N5 shapes).

The reference's neural rerankers (bi-encoder / cross-encoder / MonoT5,
``final-project/src/neural_reranker.py``) are OUT OF SCOPE for v0 — no
models/GPUs in this environment — but the CASCADE STRUCTURE is an operator in
its own right (DualStage/ThreeStage at ``neural_reranker.py:395-612``):

* stage 1 (cheap) scores all passages, keeps top `filter_k` per query;
* later (expensive) stages score only survivors;
* per-model min-max normalization then weighted ensemble
  (``neural_reranker.py:139-210,514-529``, weights [0.4, 0.6]);
* scatter-back: passages that never survived stage 1 get score 0.0
  (``neural_reranker.py:606-611``) — a left join + coalesce.

A scorer is any (passages, queries) -> (qid, docid, passage_idx, score)
callable (Arrow model inference would slot in via mapInPandas); the default
test scorers are deterministic lexical functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ScorerFn = Callable[[DataFrame, DataFrame], DataFrame]
KEY = ["qid", "docid", "passage_idx"]


def _minmax_per_qid(scored: DataFrame, degenerate: float = 0.5) -> DataFrame:
    """Per-query min-max normalization (neural_reranker.py:18-35)."""
    w = Window.partitionBy("qid")
    mx, mn = F.max("score").over(w), F.min("score").over(w)
    return scored.withColumn(
        "score",
        F.when(mx == mn, F.lit(degenerate))
        .otherwise((F.col("score") - mn) / (mx - mn)))


def ensemble(scored_runs: dict[str, DataFrame],
             weights: dict[str, float]) -> DataFrame:
    """N3: per-model min-max norm then weighted sum over passage keys."""
    out = None
    for name, df in scored_runs.items():
        normed = _minmax_per_qid(df).select(
            *KEY, (F.col("score") * F.lit(float(weights[name])))
            .alias(f"_s_{name}"))
        out = normed if out is None else out.join(normed, KEY, "outer")
    score = None
    for name in scored_runs:
        c = F.coalesce(F.col(f"_s_{name}"), F.lit(0.0))
        score = c if score is None else score + c
    return out.select(*KEY, score.alias("score"))


def cascade(passages: DataFrame, queries: DataFrame,
            first_stage: ScorerFn, filter_k: int,
            later_stages: dict[str, ScorerFn],
            stage_weights: dict[str, float]) -> DataFrame:
    """N5: cheap filter -> expensive ensemble -> scatter back to ALL input
    passages (non-survivors 0.0)."""
    s1 = first_stage(passages, queries)
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("docid"), F.asc("passage_idx"))
    survivors = (s1.withColumn("_r", F.row_number().over(w))
                 .filter(F.col("_r") <= filter_k).select(*KEY))
    surviving_passages = passages.join(survivors, KEY, "left_semi")
    scored = {name: fn(surviving_passages, queries)
              for name, fn in later_stages.items()}
    combined = ensemble(scored, stage_weights)
    return (passages.select(*KEY)
            .join(combined, KEY, "left")
            .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0))))
