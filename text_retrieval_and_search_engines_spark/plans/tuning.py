"""Hyperparameter tuning: grid search + k-fold CV (SURVEY §2.7 E5-E7).

Reference: ``final-project/src/tuning.py`` — BM25 k1 x b grid (:23-67), RM3
fb_docs x fb_terms x original_query_weight grid sequentially on top of the
best BM25 (:70-133, :232), 5-fold CV with averaged best params (:136-192),
JSON persistence (:239-252). Default grids mirror ``src/config.py:53-76``.

The index is built ONCE; each grid point is only a scoring pass (the whole
point of separating build from query in the engine). Evaluation is the native
MAP plan (operators/evaluation.py).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame

from ..operators.evaluation import average_precision, mean_metrics
from .query import IndexReader, SearchParams, search, search_rm3

BM25_GRID = {
    "k1": [0.6, 0.8, 0.9, 1.0, 1.2, 1.5],
    "b": [0.2, 0.3, 0.4, 0.6, 0.75, 0.9],
}
RM3_GRID = {
    "fb_docs": [5, 10, 15, 20, 25],
    "fb_terms": [5, 10, 15, 20, 25],
    "original_query_weight": [0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
}


def _mean_ap(run: DataFrame, qrels: DataFrame) -> float:
    m = mean_metrics(average_precision(run, qrels)).collect()[0]
    return float(m["ap"] or 0.0)


def grid_search_bm25(reader: IndexReader, queries: DataFrame,
                     qrels: DataFrame, k: int = 1000,
                     grid: dict | None = None) -> dict:
    """E5: Cartesian k1 x b, full batch search + MAP each, argmax
    (tie-break: first in grid order, matching the reference's > compare)."""
    grid = grid or BM25_GRID
    best = {"k1": None, "b": None, "map": -1.0}
    trace = []
    for k1 in grid["k1"]:
        for b in grid["b"]:
            t0 = time.perf_counter()
            run = search(reader, queries, SearchParams(k1=k1, b=b, k=k))
            ap = _mean_ap(run.select("qid", "docid", "score"), qrels)
            trace.append({"k1": k1, "b": b, "map": ap,
                          "sec": round(time.perf_counter() - t0, 2)})
            if ap > best["map"]:
                best = {"k1": k1, "b": b, "map": ap}
    best["trace"] = trace
    return best


def grid_search_rm3(reader: IndexReader, queries: DataFrame, docs: DataFrame,
                    qrels: DataFrame, k1: float, b: float, k: int = 1000,
                    grid: dict | None = None) -> dict:
    """E6: RM3 grid tuned ON TOP OF the best BM25 (reference tuning.py:232)."""
    grid = grid or RM3_GRID
    params = SearchParams(k1=k1, b=b, k=k)
    best = {"fb_docs": None, "fb_terms": None,
            "original_query_weight": None, "map": -1.0}
    for fd in grid["fb_docs"]:
        for ft in grid["fb_terms"]:
            for w in grid["original_query_weight"]:
                run = search_rm3(reader, queries, docs, fb_docs=fd,
                                 fb_terms=ft, original_query_weight=w,
                                 params=params)
                ap = _mean_ap(run.select("qid", "docid", "score"), qrels)
                if ap > best["map"]:
                    best = {"fb_docs": fd, "fb_terms": ft,
                            "original_query_weight": w, "map": ap}
    return best


def kfold_qid_splits(qids: list[str], n_folds: int = 5, seed: int = 42
                     ) -> list[tuple[list[str], list[str]]]:
    """E7: deterministic shuffled k-fold over qids (sklearn KFold(shuffle,
    seed=42) semantics, reference tuning.py:136-192)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    order = list(np.array(sorted(qids))[rng.permutation(len(qids))])
    folds = [order[i::n_folds] for i in range(n_folds)]
    out = []
    for i in range(n_folds):
        test = sorted(folds[i])
        train = sorted(q for j, f in enumerate(folds) if j != i for q in f)
        out.append((train, test))
    return out


def cv_tune_bm25(reader: IndexReader, queries: DataFrame, qrels: DataFrame,
                 n_folds: int = 5, seed: int = 42, k: int = 1000,
                 grid: dict | None = None) -> dict:
    """Per-fold grid search on the train split; average best params across
    folds (reference tuning.py:177-183)."""
    from pyspark.sql import functions as F
    qids = [r["qid"] for r in queries.select("qid").distinct().collect()]
    k1s, bs = [], []
    for train, _test in kfold_qid_splits(qids, n_folds, seed):
        qtrain = queries.filter(F.col("qid").isin(train))
        best = grid_search_bm25(reader, qtrain,
                                qrels.filter(F.col("qid").isin(train)),
                                k=k, grid=grid)
        k1s.append(best["k1"])
        bs.append(best["b"])
    return {"k1": sum(k1s) / len(k1s), "b": sum(bs) / len(bs),
            "folds": {"k1": k1s, "b": bs}}


def save_tuned(path: str, bm25: dict, rm3: dict | None = None) -> None:
    """JSON persistence (reference tuning.py:239-252, loaded at main.py:50)."""
    cfg = {"bm25": {"k1": bm25["k1"], "b": bm25["b"]}}
    if rm3:
        cfg["rm3"] = {k: rm3[k] for k in
                      ("fb_docs", "fb_terms", "original_query_weight")}
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)


def load_tuned(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
