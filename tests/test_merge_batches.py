"""Held-tail correctness of the Arrow merge kernel (plans/index_build.py).

A (term, range) group's runs can span MULTIPLE Arrow batches on the merge
side; the kernel carries an open tail between batches (three distinct
branches: whole-batch continuation, first-group continuation, unrelated
tail). Default 10k-row batches never exercise those branches at pytest
scale, so this test shrinks ``spark.sql.execution.arrow.maxRecordsPerBatch``
to force dozens of tiny batches and verifies every decoded posting against
a pandas-computed truth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from text_retrieval_and_search_engines_spark.functions import codec
from text_retrieval_and_search_engines_spark.plans.index_build import (
    IndexConfig, build_postings, tokenize_docs)


@pytest.mark.parametrize("batch_rows", [3, 17])
def test_group_spanning_batches_exact(spark, batch_rows):
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> huge groups
    rows = []
    for docid in range(400):
        n = int(rng.integers(3, 12))
        text = " ".join(rng.choice(vocab, n))
        rows.append((docid, text))
    docs = spark.createDataFrame(rows, "docid long, text string")

    # ground truth: (term, docid) -> tf, dl per doc (simple analyzer)
    truth_tf: dict = {}
    dl_map: dict = {}
    for docid, text in rows:
        toks = text.split()
        dl_map[docid] = len(toks)
        for t in toks:
            truth_tf[(t, docid)] = truth_tf.get((t, docid), 0) + 1

    cfg = IndexConfig(range_size=32, block=8, analyzer="simple", langs=(),
                      recompute_text=False, materialize_docs=False)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   str(batch_rows))
    try:
        doc_tokens = tokenize_docs(docs.select("docid", "text")
                                   .withColumnRenamed("text", "text"),
                                   analyzer="simple")
        chunks = build_postings(doc_tokens, cfg).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got: dict = {}
    for r in chunks:
        rs = int(r["range_id"]) * cfg.range_size
        docids, tfs, dls = codec.decode_postings(bytes(r["payload"]),
                                                 range_start=rs)
        assert np.all(np.diff(docids) > 0)      # sorted, no dup docids
        assert int(r["df_chunk"]) == docids.size
        assert int(r["cf_chunk"]) == int(tfs.sum())
        for d, tf, dl in zip(docids, tfs, dls):
            key = (r["term"], int(d))
            assert key not in got, f"docid {d} appears in 2 chunks of {key}"
            got[key] = int(tf)
            assert dl == dl_map[int(d)]

    assert got == truth_tf


def test_head_term_skew_bounded_and_exact(spark):
    """north_star skew contract: a pathological head term (50% of all
    tokens) must split into chunks of <= range_size postings (the
    deterministic docid-range salt), and scores must still match the
    oracle exactly."""
    from text_retrieval_and_search_engines_spark.oracle.bm25_oracle import (
        OracleIndex)
    from text_retrieval_and_search_engines_spark.plans.index_build import (
        build_index)
    from text_retrieval_and_search_engines_spark.plans.query import (
        IndexReader, SearchParams, search_fast)
    from text_retrieval_and_search_engines_spark.sources.tables import Catalog

    rng = np.random.default_rng(13)
    tail = [f"t{i}" for i in range(50)]
    rows = []
    for i in range(600):
        toks = []
        for _ in range(int(rng.integers(4, 16))):
            toks.append("zz" if rng.random() < 0.5 else
                        tail[int(rng.integers(0, 50))])
        rows.append((f"u{i:05d}", " ".join(toks)))
    pages = spark.createDataFrame(rows, "url string, text string")

    import tempfile
    cat = Catalog(tempfile.mkdtemp(prefix="skew_cat_"))
    cfg = IndexConfig(range_size=64, block=16, analyzer="simple", langs=(),
                      recompute_text=False, materialize_docs=False)
    build_index(spark, pages, cat, cfg, input_fp="skew")
    reader = IndexReader(spark, cat)

    # the head term's postings are split into bounded chunks
    head = (reader.postings.filter("term = 'zz'")
            .select("range_id", "df_chunk").collect())
    assert len(head) >= 5                      # actually split
    assert all(r["df_chunk"] <= 64 for r in head)

    # rank + score identity vs the oracle under the skewed distribution
    ordered = sorted(rows)
    oracle = OracleIndex.build(
        [(i, t) for i, (_u, t) in enumerate(ordered)])
    for qtext in ["zz", "zz t7 t13", "t3 t4"]:
        got = search_fast(reader, [("q", qtext)],
                          SearchParams(k=20)).collect()
        exp = oracle.search(qtext, k=20, term_weights={
            t: float(w) for t, w in
            __import__("collections").Counter(qtext.split()).items()})
        assert [(r["docid"], round(r["score"], 10)) for r in got] == \
            [(d, round(s, 10)) for d, s in exp], qtext
