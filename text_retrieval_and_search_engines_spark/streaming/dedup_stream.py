"""Stateful streaming deduplication (training-data ingest pipeline).

A continuous crawl ingest must drop re-posted/boilerplate documents BEFORE
they reach the tokenizer — at 100 TB the dedup state cannot live in one
process, so it is partitioned by content hash across executors via
``applyInPandasWithState`` (Spark's keyed-state operator): the state for
one ``text_hash`` is just "seen n times", co-located with every future
arrival of that hash by the state-store hash partitioning. First arrival
passes through; repeats are dropped (and counted).

This composes with the index append stream as an upstream stage:

    readStream -> dedup_exact_stream(...) -> foreachBatch(append_pages_batch)

The MinHash/SimHash NEAR-dup variants stay batch ops (operators/dedup.py):
near-dup needs a candidate join across band buckets, which is a per-batch
join against accumulated state tables, not per-key state — foreachBatch
with a persisted fingerprint table is the honest scale design there.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_seen long"


def with_text_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pinned content hash (same normalization family as operators/dedup)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("text_hash", F.md5(norm))


def dedup_exact_stream(stream_df: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: emit only the FIRST document ever seen per
    content hash; later arrivals (same or later micro-batches) are dropped.

    State: one long per distinct hash, partitioned by the state store —
    memory scales with distinct content across the cluster, never with
    stream length on one node. Within a single micro-batch the surviving
    representative is DETERMINISTIC: the minimum (warc_ts, url) row among
    the batch's duplicates (row order inside an applyInPandasWithState
    group is not a Spark contract, so "first in arrival order" would vary
    across reruns — ADVICE r2).
    """
    hashed = with_text_hash(stream_df, text_col)
    out_schema = hashed.schema
    sort_cols = [c for c in ("warc_ts", "url") if c in hashed.columns]

    def dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
                 ) -> Iterator[pd.DataFrame]:
        (n_seen,) = state.get if state.exists else (0,)
        first_seen = n_seen == 0
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_seen += len(pdf)
            if not first_seen:
                continue
            cand = (pdf.sort_values(sort_cols, kind="stable").iloc[:1]
                    if sort_cols else pdf.iloc[:1])
            if best is None:
                best = cand
            elif sort_cols:
                best = (pd.concat([best, cand])
                        .sort_values(sort_cols, kind="stable").iloc[:1])
        if best is not None:
            yield best
        state.update((n_seen,))

    return (hashed.groupBy("text_hash")
            .applyInPandasWithState(
                dedup_fn, outputStructType=out_schema,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def crawl_stats_stream(stream_df: DataFrame, window: str = "1 hour",
                       watermark: str = "2 hours",
                       ts_col: str = "warc_ts") -> DataFrame:
    """Ingest monitoring: pages/bytes per (event-time window, lang) with a
    watermark bounding late-crawl state — the standard windowed-aggregation
    shape for a continuous crawl feed. Late pages beyond the watermark are
    dropped from the aggregate (state stays bounded); the append path
    itself ingests them regardless.
    """
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"), "lang")
            .agg(F.count("*").alias("n_pages"),
                 F.avg(F.length("text")).alias("avg_text_len"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "lang", "n_pages", "avg_text_len"))
