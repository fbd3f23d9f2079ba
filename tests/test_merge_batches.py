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
