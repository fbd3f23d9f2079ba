"""Incremental (streaming) index maintenance: append batches == full rebuild
after compaction; streaming source drives the same path."""

from __future__ import annotations

import os

import pytest

from text_retrieval_and_search_engines_spark.oracle.bm25_oracle import (
    OracleIndex)
from text_retrieval_and_search_engines_spark.plans.index_build import (
    IndexConfig, build_index)
from text_retrieval_and_search_engines_spark.plans.query import (
    IndexReader, SearchParams, search_fast)
from text_retrieval_and_search_engines_spark.sources.pages import synth_pages
from text_retrieval_and_search_engines_spark.sources.tables import Catalog
from text_retrieval_and_search_engines_spark.streaming.incremental import (
    append_pages_batch, compact_postings, stream_pages_into_index)

CFG = IndexConfig(range_size=64, block=16, langs=(), recompute_text=False,
                  materialize_docs=False)


def _oracle_for(pdf_list):
    texts = []
    for pdf in pdf_list:
        texts.extend(zip(pdf["url"], pdf["text"]))
    # append-mode ids: batch-local rank by url, offset by arrival order
    docs, base = [], 0
    for pdf in pdf_list:
        s = pdf.sort_values("url").reset_index(drop=True)
        docs.extend((base + i, t) for i, t in enumerate(s["text"]))
        base += len(s)
    return OracleIndex.build(docs)


def test_append_then_query_matches_oracle(spark, tmp_path):
    p1 = synth_pages(60, seed=11, vocab_size=200)
    p2 = synth_pages(40, seed=12, vocab_size=200)
    p2["url"] = p2["url"].str.replace("doc", "newdoc")  # disjoint urls

    cat = Catalog(str(tmp_path / "cat"))
    build_index(spark, spark.createDataFrame(p1), cat, CFG, input_fp="b0")
    info = append_pages_batch(spark, spark.createDataFrame(p2), cat, CFG)
    assert info["appended_docs"] == 40
    assert info["base_docid"] == 60

    oracle = _oracle_for([p1, p2])
    reader = IndexReader(spark, cat)
    assert reader.n_docs == 100

    got = search_fast(reader, [("q", "spark index data")],
                      SearchParams(k=10)).collect()
    exp = oracle.search("spark index data", k=10)
    assert [(r["docid"], round(r["score"], 10)) for r in got] == \
        [(d, round(s, 10)) for d, s in exp]

    # compaction must not change results (sort-merge combine)
    compact_postings(spark, cat, CFG)
    reader2 = IndexReader(spark, cat)
    got2 = search_fast(reader2, [("q", "spark index data")],
                       SearchParams(k=10)).collect()
    assert [(r["docid"], r["score"]) for r in got2] == \
        [(r["docid"], r["score"]) for r in got]
    # one chunk per (term, range) after compaction
    dup = (reader2.postings.groupBy("term", "range_id").count()
           .filter("count > 1").count())
    assert dup == 0


def test_streaming_source_appends(spark, tmp_path):
    p1 = synth_pages(50, seed=21, vocab_size=200)
    cat = Catalog(str(tmp_path / "cat2"))
    build_index(spark, spark.createDataFrame(p1), cat, CFG, input_fp="s0")

    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    p2 = synth_pages(30, seed=22, vocab_size=200)
    p2["url"] = p2["url"].str.replace("doc", "streamdoc")
    spark.createDataFrame(p2).write.parquet(inbox, mode="overwrite")

    q = stream_pages_into_index(
        spark, inbox, "url string, warc_ts timestamp, html binary, "
        "text string, lang string", cat, CFG,
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    reader = IndexReader(spark, cat)
    assert reader.n_docs == 80
    urls = {r["url"] for r in reader.docmap.collect()}
    assert any("streamdoc" in u for u in urls)
