"""Incremental index maintenance via Structured Streaming (streaming/).

The reference is a pure batch pipeline (SURVEY §2.8 — no streaming operators
exist there), but a Common-Crawl-scale corpus grows continuously, so the
engine supports APPEND-mode index maintenance: a stream of new pages is
micro-batched through ``foreachBatch``; each batch tokenizes with the same
pinned analyzer and appends new (term, range) postings chunks. The postings
table already allows multiple chunk rows per (term, range) — the query
kernels score every chunk in a group, so appended segments are visible
without a rebuild (Lucene-segment-like semantics; a periodic ``compact``
sort-merge combines chunks).

Append-mode docids extend the dense space: batch docids start at the current
max+1, ranked by url WITHIN the batch (global rank-by-url determinism holds
per build + append ORDER, like Lucene segment ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.index_build import (IndexConfig, assign_docids, build_postings,
                                 tokenize_docs)
from ..sources.tables import Catalog


def append_pages_batch(spark: SparkSession, batch: DataFrame,
                       catalog: Catalog, cfg: IndexConfig) -> dict:
    """Append one micro-batch of pages to an existing index."""
    from pyspark.sql import functions as F

    current = catalog.read_table(spark, "docmap")
    base = (current.agg(F.max("docid")).collect()[0][0] or -1) + 1

    docs = assign_docids(batch.select("url", "text"), cfg.n_partitions)
    docs = docs.withColumn("docid", F.col("docid") + F.lit(base))

    docs = docs.persist()
    catalog.write_table(docs.select("docid", "url"), "docmap",
                        fingerprint="append", mode="append")
    doc_tokens = tokenize_docs(docs).persist()
    catalog.write_table(doc_tokens.select("docid", "dl"), "doclens",
                        fingerprint="append", mode="append")
    postings = build_postings(doc_tokens, cfg)
    catalog.write_table(postings.repartition("term_bucket"), "postings",
                        fingerprint="append", mode="append",
                        partition_by=["term_bucket"])
    n_new = docs.count()
    docs.unpersist()
    doc_tokens.unpersist()
    _refresh_stats(spark, catalog, cfg)
    return {"appended_docs": n_new, "base_docid": base}


def _refresh_stats(spark: SparkSession, catalog: Catalog,
                   cfg: IndexConfig) -> None:
    """Recompute termstats + collection stats after an append."""
    postings = catalog.read_table(spark, "postings")
    termstats = postings.groupBy("term").agg(
        F.sum("df_chunk").alias("df"), F.sum("cf_chunk").alias("cf"))
    catalog.write_table(termstats, "termstats", fingerprint="append")
    doclens = catalog.read_table(spark, "doclens")
    agg = doclens.agg(F.count("*").alias("n"), F.avg("dl").alias("a")
                      ).collect()[0]
    stats = spark.createDataFrame(
        [(int(agg["n"]), float(agg["a"] or 0.0), cfg.range_size, cfg.block,
          cfg.n_term_buckets)],
        "n_docs long, avgdl double, range_size long, block int, "
        "n_term_buckets int")
    catalog.write_table(stats, "stats", fingerprint="append")


def stream_pages_into_index(spark: SparkSession, source_dir: str,
                            schema: str, catalog: Catalog,
                            cfg: IndexConfig,
                            checkpoint_dir: str,
                            trigger_once: bool = True):
    """readStream(parquet dir) -> foreachBatch append. With
    ``trigger_once`` the stream drains available files and stops —
    the batch-driven smoke-test shape; a real deployment drops it."""
    stream = (spark.readStream.schema(schema).parquet(source_dir))

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_pages_batch(spark, batch_df, catalog, cfg)

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_postings(spark: SparkSession, catalog: Catalog,
                     cfg: IndexConfig) -> None:
    """Sort-merge combine appended chunks: decode every chunk of a
    (term, range) group, merge by docid, re-encode one chunk — the
    'sort-merge combine across partitions' of the north_star, applied as
    segment compaction."""
    import numpy as np
    import pandas as pd

    from ..functions import codec
    from ..plans.index_build import POSTINGS_SCHEMA, term_bucket

    postings = catalog.read_table(spark, "postings")
    range_size, block, n_buckets = cfg.range_size, cfg.block, cfg.n_term_buckets

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import time
        from pyspark import TaskContext
        t0 = time.perf_counter()
        term, range_id = key
        rs = int(range_id) * range_size
        ds, ts, ls = [], [], []
        for payload in pdf["payload"]:
            d, t, l = codec.decode_postings(payload, range_start=rs)
            ds.append(d), ts.append(t), ls.append(l)
        docids = np.concatenate(ds)
        order = np.argsort(docids, kind="stable")
        docids = docids[order]
        tfs = np.concatenate(ts)[order]
        dls = np.concatenate(ls)[order]
        payload = codec.encode_postings(docids, tfs, dls, range_start=rs)
        bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, block)
        go, to, do = codec.block_offsets(docids, tfs, dls, rs, block)
        ctx = TaskContext.get()
        return pd.DataFrame([[
            term, term_bucket(term, n_buckets), int(range_id),
            int(docids.size), int(tfs.sum()), payload, bl.tolist(),
            btf.astype(np.int32).tolist(), bdl.astype(np.int32).tolist(),
            go.astype(np.int32).tolist(), to.astype(np.int32).tolist(),
            do.astype(np.int32).tolist(),
            ctx.partitionId() if ctx else -1,
            (time.perf_counter() - t0) * 1e3,
        ]], columns=[c.strip().split(" ")[0]
                     for c in POSTINGS_SCHEMA.split(",")])

    merged = postings.groupBy("term", "range_id").applyInPandas(
        merge, schema=POSTINGS_SCHEMA)
    # can't overwrite a path while scanning it: write aside, then swap
    import os
    import shutil
    tmp = catalog.path("postings__compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    (merged.repartition("term_bucket").write.mode("overwrite")
     .partitionBy("term_bucket").parquet(tmp))
    final = catalog.path("postings")
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    catalog._append_snapshot({"table": "postings", "fingerprint": "compact",
                              "committed_at": __import__("time").time()})
