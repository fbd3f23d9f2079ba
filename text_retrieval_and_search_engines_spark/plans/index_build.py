"""Distributed inverted-index build (SURVEY.md §3 "index build job", M1).

Plan (all DataFrame + Arrow kernels; the reference's equivalent structure is
Lucene's segment index opened at ``final-project/src/bm25_retrieval.py:28-42``):

1. scan pages (Iceberg/parquet) -> filter langs -> extract text (vectorized
   Arrow UDF, byte-identical to the oracle extractor).
2. deterministic dense docid assignment: global rank by url via scalable
   two-phase zipWithIndex (range-repartition by url, per-partition offsets
   broadcast; NO single-partition window). The rank is a pure function of the
   url set, so docids are identical at any parallelism.
3. tokenize once per doc (Arrow kernel) -> one row per doc with parallel
   term/tf arrays + dl -> JVM-side explode to (docid, term, tf, dl).
4. partition postings by (term, range_id = docid // range_size): the docid
   range is a DETERMINISTIC salt — a head term's postings split into bounded
   chunks, so build-side skew is capped at range_size postings per task
   (north_star "salted hash-partitioning on term"), and chunk boundaries are
   aligned across terms so query-time scoring can parallelize by docid range.
   Per (term, range) an Arrow kernel sorts by docid and emits the
   delta+varbyte payload + block-max metadata; whole-term views are obtained
   by a sort-merge combine over chunks (functions/codec.py order guarantees).
5. aggregate term stats (df, cf) from chunk stats; collection stats
   (N, avgdl) from doclens — tiny, broadcast at query time so scoring never
   shuffles document-length data (dl additionally rides inline in payloads).
6. per-partition lineage rows (input split, term range, postings count,
   bytes, wall time) -> metrics table; each phase commits a snapshot so the
   build is resumable (north_star).
"""

from __future__ import annotations

import hashlib
import json
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec
from ..functions.text import extract_text_series, tokenize_series
from ..sources.tables import Catalog

TOKENS_SCHEMA = "docid long, dl long, terms array<string>, tfs array<int>"
POSTINGS_SCHEMA = (
    "term string, term_bucket int, range_id long, df_chunk long, "
    "cf_chunk long, payload binary, block_last array<long>, "
    "block_max_tf array<int>, block_min_dl array<int>, goff array<int>, "
    "toff array<int>, doff array<int>, build_partition int, build_ms double"
)


def term_bucket(term: str, n_buckets: int) -> int:
    """Pinned term->bucket hash (md5-based, same family as operators/dedup).
    The postings table is PARTITIONED by this column, so a query's scan
    prunes to the buckets of its own terms — the Parquet-native analogue of
    Lucene's term dictionary lookup."""
    import hashlib
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


@dataclass(frozen=True)
class IndexConfig:
    """Build-time knobs. k1/b are NOT here — they stay query-time parameters
    exactly as in the reference (``set_bm25``, src/bm25_retrieval.py:70)."""

    # docids per postings chunk. This is the engine's shard size: it bounds
    # (a) the build-side merge group (<= range_size postings), (b) the
    # query-side dense accumulator (range_size float64s), and (c) per-chunk
    # encode/decode overhead amortization (chunks should hold >=10k postings
    # for head terms — over-salting measured 3x slower at 10^6 docs).
    # Tuning rule: local/bench 2^16-2^17; 10^9 docs ~2^20; 10^12 docs ~2^22
    # (4M docs/range -> 32 MB accumulator, ~250k ranges = query fan-out units
    # on a 1000-executor cluster, max head-term chunk ~40 MB).
    range_size: int = 1 << 17
    block: int = 128                   # postings per block-max block
    n_term_buckets: int = 32           # postings partition-pruning buckets
    analyzer: str = "english"          # "english" (stop+Porter, the pinned
                                       # reference chain) | "simple"
                                       # (lowercase [a-z0-9]+ only — the
                                       # SQL-twinnable variant)
    langs: tuple[str, ...] = ("en",)   # analyzer is English (robust04)
    recompute_text: bool = True        # html -> text via pinned extractor
    n_partitions: int | None = None    # docid-assignment range partitions
    materialize_docs: bool = True      # write docs(docid,url,text)? At petabyte
                                       # scale keep False: it would re-copy the
                                       # whole corpus; RM3 re-fetches text via
                                       # docmap joined back to the pages table

    def fingerprint(self, input_fp: str) -> str:
        blob = json.dumps([asdict(self), input_fp], sort_keys=True, default=list)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


# --------------------------------------------------------------------------
# phase 1: docs table (url, docid, text, dl? no — text only) + docid ranks
# --------------------------------------------------------------------------

def assign_docids(pages: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Deterministic dense docid = global rank of url (0-based).

    Scalable two-phase zipWithIndex: range-partition + sort by url, count per
    partition, broadcast offsets, per-partition arange. Rank is
    parallelism-invariant; reference docids are external strings
    (``FBIS3-10082``-style) — ours map via the docmap table (SURVEY.md §1.2).
    """
    spark = pages.sparkSession
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 8)
    part = (
        pages.repartitionByRange(n_parts, "url")
        .sortWithinPartitions("url")
        .persist()
    )
    counts = (
        part.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid").count().collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    b_offsets = spark.sparkContext.broadcast(offsets)

    # note: StructType.add mutates in place — build a fresh copy instead
    out_schema = T.StructType(
        list(part.schema.fields) + [T.StructField("docid", T.LongType())])

    def attach(iterator):
        ctx = TaskContext.get()
        base = b_offsets.value.get(ctx.partitionId() if ctx else 0, 0)
        for pdf in iterator:
            n = len(pdf)
            yield pdf.assign(docid=np.arange(base, base + n, dtype=np.int64))
            base += n

    return part.mapInPandas(attach, schema=out_schema)


def extract_docs(pages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Filter langs, (re)extract text byte-identically, assign docids.

    The rank-by-url sort runs on the URL PROJECTION only (a few percent of
    the corpus bytes) and joins back — never range-shuffles the full text.
    AQE turns the join into a broadcast when the docmap fits; at 10^12 docs
    it degrades to a hash join on url, still cheaper than sorting payloads.
    """
    df = pages
    if cfg.langs:
        df = df.filter(F.col("lang").isin(list(cfg.langs)))
    if cfg.recompute_text:
        @F.pandas_udf("string")
        def _extract(html: pd.Series) -> pd.Series:
            return extract_text_series(html)
        df = df.withColumn("text", _extract(F.col("html")))
    docmap = assign_docids(df.select("url"), cfg.n_partitions)
    return df.select("url", "text").join(docmap, "url").select(
        "docid", "url", "text")


# --------------------------------------------------------------------------
# phase 2: tokenize -> (docid, term, tf, dl); doclens
# --------------------------------------------------------------------------

def tokenize_docs(docs: DataFrame, analyzer: str = "english") -> DataFrame:
    """One Arrow pass per doc -> (docid, dl, terms[], tfs[]). Zero-token docs
    keep a row (dl=0, empty arrays) so N/avgdl count them (oracle parity)."""

    from ..functions.text import STOPWORDS, _stem_cached, _TOKEN_RE

    def kernel(iterator):
        findall = _TOKEN_RE.findall
        stem = _stem_cached if analyzer == "english" else (lambda t: t)
        stop = STOPWORDS if analyzer == "english" else frozenset()
        for pdf in iterator:
            terms, tfs, dls = [], [], []
            for text in pdf["text"]:
                # single fused pass: tokenize -> stop -> stem -> tf counts
                # (minimal allocation; the pandas .str chain costs ~3 extra
                # object-array passes per batch)
                tf: dict[str, int] = {}
                dl = 0
                for tok in findall(("" if text is None else text).lower()):
                    if tok in stop:
                        continue
                    dl += 1
                    st = stem(tok)
                    tf[st] = tf.get(st, 0) + 1
                ks = list(tf.keys())
                terms.append(ks)
                tfs.append([tf[k] for k in ks])
                dls.append(dl)
            yield pd.DataFrame({
                "docid": pdf["docid"].astype("int64"),
                "dl": pd.Series(dls, dtype="int64"),
                "terms": terms,
                "tfs": tfs,
            })

    return docs.select("docid", "text").mapInPandas(kernel, schema=TOKENS_SCHEMA)


def explode_tokens(doc_tokens: DataFrame) -> DataFrame:
    """JVM-side flatten to (docid, term, tf, dl) — no Python in the explode."""
    return (
        doc_tokens
        .select("docid", "dl", F.explode(F.arrays_zip("terms", "tfs")).alias("e"))
        .select(
            "docid",
            F.col("e.terms").alias("term"),
            F.col("e.tfs").cast("int").alias("tf"),
            "dl",
        )
    )


# --------------------------------------------------------------------------
# phase 3: postings chunks per (term, range)
# --------------------------------------------------------------------------

def build_postings(doc_tokens: DataFrame, cfg: IndexConfig) -> DataFrame:
    """(term, range_id)-partitioned chunk encode: delta+varbyte payload +
    block-max metadata + per-block skip offsets. Max group size = range_size
    (the deterministic skew cap).

    Physical shape: ONE shuffle (repartition by (term, range_id)) + in-task
    sort, then a mapInPandas kernel that walks group boundaries in numpy —
    NOT applyInPandas, whose per-group pandas materialization costs ~10ms x
    millions of (term, range) groups. Groups can span Arrow batches, so the
    kernel carries the open tail group between batches.
    """
    range_size = cfg.range_size
    block = cfg.block
    n_buckets = cfg.n_term_buckets

    def encode_run(term: str, range_id: int, docids, tfs, dls, out, t0):
        rs = int(range_id) * range_size
        payload = codec.encode_postings(docids, tfs, dls, range_start=rs)
        bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, block=block)
        go, to, do = codec.block_offsets(docids, tfs, dls, range_start=rs,
                                         block=block)
        ctx = TaskContext.get()
        out.append((
            term, term_bucket(term, n_buckets), int(range_id),
            int(docids.size), int(tfs.sum()) if tfs.size else 0, payload,
            bl.tolist(), btf.astype(np.int32).tolist(),
            bdl.astype(np.int32).tolist(), go.astype(np.int32).tolist(),
            to.astype(np.int32).tolist(), do.astype(np.int32).tolist(),
            ctx.partitionId() if ctx else -1,
            (time.perf_counter() - t0) * 1e3,
        ))

    cols = [c.strip().split(" ")[0] for c in POSTINGS_SCHEMA.split(",")]
    RUNS_SCHEMA = ("term string, range_id long, docids array<long>, "
                   "tfs array<int>, dls array<int>")

    # ---- map-side combine: per-input-partition partial posting runs -------
    # Instead of shuffling one row per token occurrence (tens of millions),
    # each input partition locally groups its tokens into (term, range) RUNS
    # with array payloads — ~2 orders of magnitude fewer shuffle rows, same
    # bytes, trivial sort cost. This is the "salted runs ... merged via
    # sort-merge combine across partitions" of the north_star.
    RUNS_FLUSH_TOKENS = 4_000_000  # ~bounded memory per task; extra runs
                                   # per (term, range) are fine — the merge
                                   # side combines any number of them

    def runs_kernel(iterator):
        # flatten per-doc (terms[], tfs[]) arrays numpy-side — no JVM explode,
        # no per-token Arrow rows (list arrays travel compactly)
        t_parts, d_parts, tf_parts, dl_parts = [], [], [], []
        buffered = 0

        def flush():
            terms = np.concatenate(t_parts)
            docids = np.concatenate(d_parts)
            tf_a = np.concatenate(tf_parts)
            dl_a = np.concatenate(dl_parts)
            t_parts.clear(), d_parts.clear(), tf_parts.clear(), dl_parts.clear()
            ranges = docids // range_size
            # runs need GROUPING only, not lexicographic term order — hash-
            # factorize to int codes (O(n)) instead of lexsorting millions of
            # object strings (the measured hot spot at 10^8 tokens)
            codes, _ = pd.factorize(terms)
            order = np.lexsort((docids, ranges, codes))
            terms, docids = terms[order], docids[order]
            tf_a, dl_a, ranges = tf_a[order], dl_a[order], ranges[order]
            codes = codes[order]
            change = np.flatnonzero(
                (codes[1:] != codes[:-1]) | (ranges[1:] != ranges[:-1])) + 1
            bounds = np.concatenate(([0], change, [terms.size]))
            rows = []
            for gi in range(len(bounds) - 1):
                lo, hi = int(bounds[gi]), int(bounds[gi + 1])
                # numpy slices (views) — Arrow converts them directly; a
                # .tolist() here would allocate ~10^7 PyObjects per task
                rows.append((terms[lo], int(ranges[lo]),
                             docids[lo:hi], tf_a[lo:hi], dl_a[lo:hi]))
                if len(rows) >= 20000:
                    yield pd.DataFrame(rows, columns=["term", "range_id",
                                                      "docids", "tfs", "dls"])
                    rows = []
            if rows:
                yield pd.DataFrame(rows, columns=["term", "range_id",
                                                  "docids", "tfs", "dls"])

        for pdf in iterator:
            term_lists = pdf["terms"].to_numpy()
            counts = np.fromiter((len(x) for x in term_lists),
                                 dtype=np.int64, count=len(term_lists))
            n_tok = int(counts.sum())
            if n_tok == 0:
                continue
            d_parts.append(np.repeat(
                pdf["docid"].to_numpy().astype(np.int64), counts))
            dl_parts.append(np.repeat(
                pdf["dl"].to_numpy().astype(np.int32), counts))
            t_parts.append(np.concatenate(
                [np.asarray(x, dtype=object) for x in term_lists if len(x)]))
            tf_parts.append(np.concatenate(
                [np.asarray(x, dtype=np.int32)
                 for x in pdf["tfs"].to_numpy() if len(x)]))
            buffered += n_tok
            if buffered >= RUNS_FLUSH_TOKENS:
                yield from flush()
                buffered = 0
        if d_parts:
            yield from flush()

    # ---- reduce side: sort-merge combine runs per (term, range) -----------
    def merge_kernel(iterator):
        held: pd.DataFrame | None = None

        def emit_group(g: pd.DataFrame, out: list, t0: float):
            docids = np.concatenate([np.asarray(x, dtype=np.int64)
                                     for x in g["docids"]])
            tfs = np.concatenate([np.asarray(x, dtype=np.int64)
                                  for x in g["tfs"]])
            dls = np.concatenate([np.asarray(x, dtype=np.int64)
                                  for x in g["dls"]])
            order = np.argsort(docids, kind="stable")
            encode_run(g["term"].iloc[0], int(g["range_id"].iloc[0]),
                       docids[order], tfs[order], dls[order], out, t0)

        for pdf in iterator:
            if held is not None:
                pdf = pd.concat([held, pdf], ignore_index=True)
            terms = pdf["term"].to_numpy()
            ranges = pdf["range_id"].to_numpy()
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (ranges[1:] != ranges[:-1])) + 1
            bounds = np.concatenate(([0], change, [len(pdf)]))
            if len(bounds) >= 2:
                held = pdf.iloc[bounds[-2]:].reset_index(drop=True)
                bounds = bounds[:-1]
            out: list = []
            t0 = time.perf_counter()
            for gi in range(len(bounds) - 1):
                emit_group(pdf.iloc[int(bounds[gi]):int(bounds[gi + 1])],
                           out, t0)
                t0 = time.perf_counter()
            if out:
                yield pd.DataFrame(out, columns=cols)
        if held is not None and len(held):
            out = []
            emit_group(held, out, time.perf_counter())
            yield pd.DataFrame(out, columns=cols)

    spark = doc_tokens.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    runs = doc_tokens.select("docid", "dl", "terms", "tfs").mapInPandas(
        runs_kernel, schema=RUNS_SCHEMA)
    parted = (runs.repartition(n_shuffle, "term", "range_id")
              .sortWithinPartitions("term", "range_id"))
    return parted.mapInPandas(merge_kernel, schema=POSTINGS_SCHEMA)


def lineage_from_postings(postings: DataFrame) -> DataFrame:
    """Per-build-partition lineage: term range, postings count, bytes, wall
    time (north_star metrics table)."""
    return (
        postings.groupBy("build_partition")
        .agg(
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
            F.count("*").alias("n_chunks"),
            F.sum("df_chunk").alias("n_postings"),
            F.sum(F.octet_length("payload")).alias("bytes"),
            F.sum("build_ms").alias("wall_time_ms"),
        )
        .withColumn("phase", F.lit("postings"))
    )


# --------------------------------------------------------------------------
# driver: full build with snapshot-resumable phases
# --------------------------------------------------------------------------

def build_index(spark: SparkSession, pages: DataFrame, catalog: Catalog,
                cfg: IndexConfig = IndexConfig(), input_fp: str = "",
                force: bool = False) -> dict:
    """Run all phases; skip any whose snapshot fingerprint already matches
    (resumability contract). Returns a summary dict.

    Phase layout (one read of the raw corpus total):
      1. doc_tokens: extract -> docid assignment -> tokenize, fused into a
         single pass over pages; emits doc_tokens + docmap (+ docs if
         cfg.materialize_docs — off for petabyte corpora, it re-copies text).
      2. postings: doc_tokens -> explode -> (term, range) chunk encode.
      3. meta: doclens/stats from doc_tokens; termstats/lineage from
         postings (each source read once, cached across its two aggregates).
    """
    fp = cfg.fingerprint(input_fp)
    t_start = time.perf_counter()
    phase_sec: dict[str, float] = {}

    if force or not catalog.has_table("doc_tokens", fp):
        docs = extract_docs(pages, cfg)   # lineage: re-derivable, not stored
        if cfg.materialize_docs:
            catalog.write_table(docs, "docs", fingerprint=fp)
            docs = catalog.read_table(spark, "docs")
        else:
            docs = docs.persist()
            docs.count()  # materialize once; concurrent writers read cache
        # independent writes run as concurrent Spark jobs (driver threads)
        with ThreadPoolExecutor(2) as ex:
            f1 = ex.submit(catalog.write_table, docs.select("docid", "url"),
                           "docmap", fp)
            f2 = ex.submit(catalog.write_table,
                           tokenize_docs(docs, cfg.analyzer),
                           "doc_tokens", fp)
            f1.result(), f2.result()
        docs.unpersist()
        phase_sec["tokenize"] = round(time.perf_counter() - t_start, 2)
    doc_tokens = catalog.read_table(spark, "doc_tokens")

    if force or not catalog.has_table("postings", fp):
        t_p = time.perf_counter()
        catalog.write_table(
            build_postings(doc_tokens, cfg).repartition("term_bucket"),
            "postings", fingerprint=fp, partition_by=["term_bucket"])
        phase_sec["postings"] = round(time.perf_counter() - t_p, 2)

    if force or not catalog.has_table("stats", fp):
        t_m = time.perf_counter()
        postings = catalog.read_table(spark, "postings").persist()
        postings.count()
        termstats = postings.groupBy("term").agg(
            F.sum("df_chunk").alias("df"), F.sum("cf_chunk").alias("cf"))
        with ThreadPoolExecutor(4) as ex:
            f1 = ex.submit(catalog.write_table,
                           doc_tokens.select("docid", "dl"), "doclens", fp)
            f2 = ex.submit(catalog.write_table, termstats, "termstats", fp)
            f3 = ex.submit(catalog.write_table,
                           lineage_from_postings(postings), "lineage", fp)
            f4 = ex.submit(lambda: doc_tokens.agg(
                F.count("*").alias("n_docs"),
                F.avg("dl").alias("avgdl")).collect()[0])
            f1.result(), f2.result(), f3.result()
            agg = f4.result()
        postings.unpersist()
        stats = spark.createDataFrame(
            [(int(agg["n_docs"]), float(agg["avgdl"] or 0.0),
              cfg.range_size, cfg.block, cfg.n_term_buckets, cfg.analyzer)],
            "n_docs long, avgdl double, range_size long, block int, "
            "n_term_buckets int, analyzer string")
        catalog.write_table(stats, "stats", fingerprint=fp)
        phase_sec["meta"] = round(time.perf_counter() - t_m, 2)

    srow = catalog.read_table(spark, "stats").collect()[0]
    return {
        "n_docs": srow["n_docs"],
        "avgdl": srow["avgdl"],
        "fingerprint": fp,
        "build_sec": time.perf_counter() - t_start,
        "phase_sec": phase_sec,
    }
