"""Effectiveness-parity harness for the rerank cascade (VERDICT r2 item 2).

The reference's headline behavior is run1 < run2 < run3 MAP on robust04
(``final-project/README.md:19-23``, run_pipeline ``src/main.py:206-227``).
The trained models are out of scope (north rule), but the CASCADE must be
shown to *lift* effectiveness — not merely execute — when a signal-bearing
scorer drops into the neural slot. This harness plants a synthetic corpus +
qrels with (a) a real text-similarity signal the deterministic bi-encoder
can exploit and (b) an RM3 topic-drift trap that hurts the pure lexical
run1, then runs the FULL 3-run pipeline and asserts:

* MAP(run3 fused) >= MAP(run1 lexical)  — the reference's headline ordering;
* the bi-encoder cascade beats the deliberately uncorrelated hashed-linear
  scorer in run2 — the swap-in slot carries signal, not just plumbing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
    biencoder_scorer, cascade, hashed_linear_scorer)
from text_retrieval_and_search_engines_spark.plans.index_build import (
    IndexConfig, build_index)
from text_retrieval_and_search_engines_spark.plans.pipeline import (
    docs_from_pages, run2_reranked, run_pipeline)
from text_retrieval_and_search_engines_spark.plans.query import (
    IndexReader, SearchParams)
from text_retrieval_and_search_engines_spark.sources.tables import Catalog

N_TOPICS = 8


def _corpus() -> tuple[pd.DataFrame, list, list, list]:
    """Deterministic planted-topic corpus where whole-doc BM25 CANNOT
    separate relevant from distractor — only passage-level evidence can.

    Per topic t, 6 relevant docs open with the 3 query words TOGETHER in
    one passage; 6 distractors carry the same words at the same tf and the
    same doc length, but SCATTERED >300 chars apart so no 256-char passage
    holds two of them. Whole-doc BM25 scores tie exactly (equal tf, equal
    dl) and the tie-break (docid = url rank; distractor urls sort first)
    puts every distractor above every relevant doc in the lexical run. The
    reranker sees passages: MaxP bi-encoder cosine lifts the dense-passage
    docs — exactly the passage-evidence effect the reference's cascade
    exists for. Expanded queries add out-of-vocabulary terms only (the
    expansion must not leak the answer).
    """
    rng = np.random.default_rng(42)
    filler = [f"common{i}" for i in range(30)]

    def pad(k: int) -> str:
        return " ".join(rng.choice(filler, size=k))

    rows, queries, expanded, qrels = [], [], [], []
    for t in range(N_TOPICS):
        qw = [f"t{t}w{j}" for j in range(6)]
        queries.append((f"q{t}", f"{qw[0]} {qw[1]} {qw[2]}"))
        expanded.append((f"q{t}",
                         f"{qw[0]} {qw[1]} {qw[2]} {qw[3]} {qw[4]}"))
        for d in range(6):
            # dense: all 3 query words in the FIRST passage
            text = f"{qw[0]} {qw[1]} {qw[2]} {pad(102 + 2 * d)}"
            url = f"rel-t{t}-d{d}"
            rows.append((url, text))
            qrels.append((f"q{t}", url, 1))
        for d in range(6):
            # scattered: same tf, same dl, >300 chars between query words
            text = (f"{qw[0]} {pad(45)} {qw[1]} {pad(45)} {qw[2]} "
                    f"{pad(12 + 2 * d)}")
            rows.append((f"a-scat-t{t}-d{d}", text))   # url sorts BEFORE rel
    for i in range(50):
        rows.append((f"filler-{i}", pad(105)))
    pages = pd.DataFrame(rows, columns=["url", "text"])
    return pages, queries, expanded, qrels


@pytest.fixture(scope="module")
def eff(spark, tmp_path_factory):
    pages, queries, expanded, qrels = _corpus()
    cat = Catalog(str(tmp_path_factory.mktemp("effcat")))
    cfg = IndexConfig(range_size=64, block=16, langs=(),
                      recompute_text=False, materialize_docs=False,
                      analyzer="simple")
    pages_df = spark.createDataFrame(pages)
    build_index(spark, pages_df, cat, cfg, input_fp="eff")
    reader = IndexReader(spark, cat)
    docs = docs_from_pages(reader, pages_df).persist()
    docs.count()
    # qrels on internal docids
    url2id = {r["url"]: r["docid"] for r in reader.docmap.collect()}
    qrels_df = spark.createDataFrame(
        [(q, int(url2id[u]), r) for q, u, r in qrels],
        "qid string, docid long, rel int")
    qdf = spark.createDataFrame(queries, "qid string, text string")
    qexp = spark.createDataFrame(expanded, "qid string, text string")
    return reader, qdf, qexp, docs, qrels_df


def _bi_cascade(passages, queries):
    """N5 cascade with the deterministic bi-encoder in the neural slot:
    hashed-BoW filter stage -> bi-encoder ensemble -> scatter-back."""
    return cascade(
        passages, queries,
        first_stage=biencoder_scorer(dim=256, seed=11),
        filter_k=60,
        later_stages={"bi": biencoder_scorer(dim=512, seed=7)},
        stage_weights={"bi": 1.0})


def test_cascade_lifts_map_over_lexical(eff):
    """The reference's headline ordering: fused run3 MAP >= lexical run1
    MAP, with the bi-encoder cascade as run2's reranker."""
    reader, qdf, qexp, docs, qrels_df = eff
    out = run_pipeline(reader, qdf, qexp, docs, qrels=qrels_df,
                       params=SearchParams(k=200),
                       reranker=_bi_cascade)
    m = {r["run"]: r["map"] for r in out["metrics"].collect()}
    assert m["run1"] > 0.2            # lexical baseline is sane
    assert m["run2"] > m["run1"], (   # the cascade itself lifts MAP
        f"reranked run2 MAP {m['run2']:.4f} <= run1 {m['run1']:.4f}")
    assert m["run3"] >= m["run1"], (
        f"fused run3 MAP {m['run3']:.4f} < lexical run1 MAP {m['run1']:.4f}")


def test_biencoder_beats_uncorrelated_scorer(eff):
    """The neural slot must carry SIGNAL: with the bi-encoder (term-overlap
    cosine) run2 MAP beats the same cascade wired to the deliberately
    uncorrelated hashed-linear random projection."""
    from text_retrieval_and_search_engines_spark.operators.evaluation import (
        evaluate_run, mean_metrics)

    reader, qdf, qexp, docs, qrels_df = eff

    def random_cascade(passages, queries):
        return cascade(
            passages, queries,
            first_stage=hashed_linear_scorer(dim=1 << 14, seed=3),
            filter_k=60,
            later_stages={"x": hashed_linear_scorer(dim=1 << 14, seed=5)},
            stage_weights={"x": 1.0})

    def run2_map(reranker) -> float:
        run2 = run2_reranked(reader, qexp, docs, reranker,
                             SearchParams(k=200))
        m = mean_metrics(evaluate_run(
            run2.select("qid", "docid", "score"), qrels_df,
            p_cutoffs=(10,), r_cutoffs=(100,), ndcg_cutoffs=(10,)))
        return float(m.collect()[0]["map"])

    assert run2_map(_bi_cascade) > run2_map(random_cascade)


def test_trained_crossencoder_learns_and_lifts(eff):
    """The last untested reference behavior (VERDICT r2 'missing' 1): an
    actually-TRAINED model through the full train -> broadcast ->
    distributed-inference loop. A tiny pure-numpy logistic regression over
    the hashed cross features (deterministic, no external ML libs) is
    trained on dense-vs-scattered passage pairs, then dropped into the SAME
    cascade slot a torch/ONNX cross-encoder would use. Asserts (a) training
    converges (log-loss decreases), (b) the trained scorer beats the
    untrained random-weight scorer at reranking. In-domain training by
    construction — the claim is that LEARNED weights carry signal through
    the Spark inference path, not cross-domain generalization."""
    from text_retrieval_and_search_engines_spark.operators.evaluation import (
        evaluate_run, mean_metrics)
    from text_retrieval_and_search_engines_spark.operators.rerank_cascade import (
        train_hashed_crossencoder)

    reader, qdf, qexp, docs, qrels_df = eff

    # training pairs straight from the corpus construction: dense first
    # passage = positive, scattered fragment = negative
    rng = np.random.default_rng(7)
    filler = [f"common{i}" for i in range(30)]
    pairs = []
    for t in range(N_TOPICS):
        q = f"t{t}w0 t{t}w1 t{t}w2"
        for d in range(3):
            pad1 = " ".join(rng.choice(filler, size=20))
            pad2 = " ".join(rng.choice(filler, size=20))
            pairs.append((q, f"t{t}w0 t{t}w1 t{t}w2 {pad1}", 1))
            pairs.append((q, f"t{t}w0 {pad2}", 0))
            pairs.append((q, f"{pad1} t{t}w2 {pad2}", 0))

    dim = 1 << 16
    w, losses = train_hashed_crossencoder(pairs, dim=dim, seed=7,
                                          epochs=6, lr=0.5)
    assert losses[-1] < losses[0] * 0.5        # it actually learned

    def ce_cascade(weights):
        def rr(passages, queries):
            return cascade(
                passages, queries,
                first_stage=hashed_linear_scorer(dim=dim, seed=3,
                                                 weights=weights),
                filter_k=60,
                later_stages={"ce": hashed_linear_scorer(dim=dim, seed=5,
                                                         weights=weights)},
                stage_weights={"ce": 1.0})
        return rr

    def run2_map(reranker) -> float:
        run2 = run2_reranked(reader, qexp, docs, reranker,
                             SearchParams(k=200))
        m = mean_metrics(evaluate_run(
            run2.select("qid", "docid", "score"), qrels_df,
            p_cutoffs=(10,), r_cutoffs=(100,), ndcg_cutoffs=(10,)))
        return float(m.collect()[0]["map"])

    trained = run2_map(ce_cascade(w))
    untrained = run2_map(ce_cascade(None))
    assert trained > untrained + 0.1, (trained, untrained)  # a clear lift
    assert trained > 0.7
