"""T1-T4 chunking/context, S1-S3 loaders, E5/E7 tuning plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_retrieval_and_search_engines_spark.operators.passages import (
    CHUNK_SIZE, chunk_text, extract_context, make_passages, prepend_context)
from text_retrieval_and_search_engines_spark.plans.tuning import (
    kfold_qid_splits, load_tuned, save_tuned)
from text_retrieval_and_search_engines_spark.sources import loaders


def test_extract_context_rules():
    assert extract_context("\n\nshort\nThis is a meaningful first line.\n") \
        == "This is a meaningful first line."
    assert extract_context("<doc><tag>\nAnother good line here.") \
        == "Another good line here."
    long = "word " * 50  # 250 chars, no sentence end
    assert extract_context(long) == long.strip()[:150]
    sent = "A sentence that ends right here. " + "x" * 200
    assert extract_context(sent) == "A sentence that ends right here."
    assert extract_context("") == ""
    assert extract_context("   \n  <b></b>  \n tiny ") == ""


def test_chunk_text_bounds_and_overlap():
    text = ("Sentence one is here. " * 30).strip()  # ~660 chars
    chunks = chunk_text(text)
    assert len(chunks) >= 2
    assert all(len(c) <= CHUNK_SIZE + 64 for c in chunks)
    # overlap: consecutive chunks share content
    assert chunks[0][-20:] in (chunks[0] + chunks[1])
    joined = " ".join(chunks)
    assert "Sentence one is here." in joined
    assert chunk_text("") == []
    assert chunk_text("tiny") == ["tiny"]
    # giant unbroken token falls back to hard split
    assert all(len(c) <= CHUNK_SIZE for c in chunk_text("x" * 1000))


def test_prepend_context():
    assert prepend_context("CTX", "some chunk") == "[CTX] some chunk"
    assert prepend_context("CTX here", "CTX here and more") == "CTX here and more"
    assert prepend_context("", "chunk") == "chunk"


def test_make_passages(spark):
    docs = spark.createDataFrame(
        [("d1", "First line of context. " + "Body sentence. " * 40),
         ("d2", "short"), ("d3", "")],
        "docid string, text string")
    p = make_passages(docs).collect()
    by_doc = {}
    for r in p:
        by_doc.setdefault(r["docid"], []).append(r)
    assert len(by_doc["d1"]) >= 2
    assert [r["passage_idx"] for r in sorted(by_doc["d1"],
            key=lambda r: r["passage_idx"])] == list(range(len(by_doc["d1"])))
    assert all(r["context"] == "First line of context."
               for r in by_doc["d1"])
    assert "d3" not in by_doc  # empty doc -> no passages
    assert by_doc["d2"][0]["text"] == "short"  # <10 chars -> no context


def test_loaders(spark, tmp_path):
    qp = tmp_path / "queries.txt"
    qp.write_text("301\tfirst query\n\n302\tsecond query\n")
    q = loaders.load_queries_tsv(spark, str(qp))
    assert {(r["qid"], r["text"]) for r in q.collect()} == {
        ("301", "first query"), ("302", "second query")}

    ep = tmp_path / "expanded.csv"
    ep.write_text("qid,original_query,expanded_query\n"
                  "301,first query,first query plus terms\n")
    e = loaders.load_expanded_csv(spark, str(ep))
    merged = loaders.queries_with_fallback(q, e).collect()
    got = {r["qid"]: r["text"] for r in merged}
    assert got["301"] == "first query plus terms"
    assert got["302"] == "second query"  # fallback path (main.py:68)

    rp = tmp_path / "qrels.txt"
    rp.write_text("301 0 doc1 2\n301 0 doc2 0\nbad line\n302 0 doc9 1\n")
    r = loaders.load_qrels(spark, str(rp))
    assert {(x["qid"], x["docid"], x["rel"]) for x in r.collect()} == {
        ("301", "doc1", 2), ("301", "doc2", 0), ("302", "doc9", 1)}
    assert loaders.filter_qids(r, ["301"]).count() == 2


def test_train_test_qids():
    assert len(loaders.TRAIN_QIDS) == 50
    assert len(loaders.TEST_QIDS) == 199
    assert "672" not in loaders.TEST_QIDS


def test_kfold_splits():
    qids = [str(i) for i in range(301, 351)]
    splits = kfold_qid_splits(qids, 5, seed=42)
    assert len(splits) == 5
    all_test = [q for _, test in splits for q in test]
    assert sorted(all_test) == sorted(qids)  # exact partition
    for train, test in splits:
        assert not set(train) & set(test)
        assert len(train) + len(test) == 50
    assert splits == kfold_qid_splits(qids, 5, seed=42)  # deterministic


def test_tuned_config_roundtrip(tmp_path):
    p = str(tmp_path / "tuned.json")
    save_tuned(p, {"k1": 0.9, "b": 0.4},
               {"fb_docs": 10, "fb_terms": 10, "original_query_weight": 0.5,
                "map": 0.3})
    cfg = load_tuned(p)
    assert cfg["bm25"] == {"k1": 0.9, "b": 0.4}
    assert cfg["rm3"]["fb_docs"] == 10


def test_grid_search_small(spark, tiny_index):
    from text_retrieval_and_search_engines_spark.plans.tuning import (
        grid_search_bm25)
    from text_retrieval_and_search_engines_spark.sources.pages import (
        synth_queries)
    reader, oracle, catalog, en = tiny_index
    qdf = spark.createDataFrame(synth_queries(4, seed=42, vocab_size=500))
    # synthetic qrels: top-3 oracle docs are 'relevant'
    rels = []
    for row in synth_queries(4, seed=42, vocab_size=500).itertuples():
        for docid, _ in oracle.search(row.text, k=3):
            rels.append((row.qid, docid, 1))
    if not rels:
        pytest.skip("no relevant docs in tiny corpus")
    qrels = spark.createDataFrame(rels, "qid string, docid long, rel int")
    best = grid_search_bm25(
        reader, qdf, qrels, k=10,
        grid={"k1": [0.9, 1.2], "b": [0.4]})
    assert best["k1"] in (0.9, 1.2) and best["b"] == 0.4
    assert best["map"] > 0.5  # planted qrels -> high MAP
