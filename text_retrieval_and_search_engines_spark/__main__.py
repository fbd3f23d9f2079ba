"""spark-submit CLI (SURVEY §7 M7; reference CLI ``src/main.py:321-344``).

Usage (zip the package first for --py-files):
    zip -r engine.zip text_retrieval_and_search_engines_spark
    spark-submit --py-files engine.zip -m text_retrieval_and_search_engines_spark ...

Commands:
    index   --pages PATH --catalog DIR [--langs en,de] [--range-size N]
    search  --catalog DIR --queries TSV [--k 1000] [--rm3] [--out run.res]
    tune    --catalog DIR --queries TSV --qrels PATH --out tuned.json [--cv]
    pipeline --catalog DIR --queries TSV --expanded CSV [--qrels PATH]
             --out-dir DIR     (the reference's 3-run train/test flow)
    curate  --catalog DIR --docs PATH --out PATH [--near minhash|simhash|none]
             (training-data curation: quality/repetition filters + dedup;
              drop counts land in the catalog metrics table)
    ann     --catalog DIR --build --embeddings PATH   (materialize IVF state)
    ann     --catalog DIR --queries PATH [--k 5 --n-probe 2]
             (serve a query batch from the persisted state — no corpus scan)
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from .plans.index_build import IndexConfig, build_index
from .plans.query import IndexReader, SearchParams, search, search_rm3
from .session import get_spark
from .sources.loaders import load_expanded_csv, load_qrels, load_queries_tsv
from .sources.tables import Catalog
from .sources.trec_io import write_run


def _add_common(p):
    p.add_argument("--catalog", required=True)
    p.add_argument("--master", default=None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="text_retrieval_and_search_engines_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ix = sub.add_parser("index")
    _add_common(p_ix)
    p_ix.add_argument("--pages", required=True,
                      help="parquet/iceberg path with (url, warc_ts, html, text, lang)")
    p_ix.add_argument("--langs", default="en")
    p_ix.add_argument("--range-size", type=int, default=1 << 17)
    p_ix.add_argument("--no-extract", action="store_true",
                      help="trust the text column instead of re-extracting html")
    p_ix.add_argument("--force", action="store_true")

    p_s = sub.add_parser("search")
    _add_common(p_s)
    p_s.add_argument("--queries", required=True, help="TSV qid\\ttext")
    p_s.add_argument("--k", type=int, default=1000)
    p_s.add_argument("--k1", type=float, default=0.9)
    p_s.add_argument("--b", type=float, default=0.4)
    p_s.add_argument("--rm3", action="store_true")
    p_s.add_argument("--algo", default="exact", choices=["exact", "bmw"])
    p_s.add_argument("--out", default=None, help="TREC run file")
    p_s.add_argument("--run-name", default="engine")

    p_t = sub.add_parser("tune")
    _add_common(p_t)
    p_t.add_argument("--queries", required=True)
    p_t.add_argument("--qrels", required=True)
    p_t.add_argument("--out", required=True)
    p_t.add_argument("--cv", action="store_true")
    p_t.add_argument("--rm3", action="store_true")

    p_p = sub.add_parser("pipeline")
    _add_common(p_p)
    p_p.add_argument("--queries", required=True)
    p_p.add_argument("--expanded", required=True)
    p_p.add_argument("--qrels", default=None)
    p_p.add_argument("--out-dir", required=True)

    p_a = sub.add_parser("append", help="incremental index append (streaming)")
    _add_common(p_a)
    p_a.add_argument("--pages", required=True)
    p_a.add_argument("--stream", action="store_true",
                     help="drain --pages as a Structured Streaming source")
    p_a.add_argument("--checkpoint", default=None)
    p_a.add_argument("--range-size", type=int, default=1 << 17)
    p_a.add_argument("--curate-neardups", action="store_true",
                     help="near-dedup each batch against the catalog's "
                          "dedup_signatures state before indexing "
                          "(requires curate --write-state first)")
    p_a.add_argument("--neardup-jaccard", type=float, default=0.8)

    p_cu = sub.add_parser(
        "curate", help="training-data curation: quality/repetition filters "
                       "+ exact & near dedup -> curated parquet + metrics")
    _add_common(p_cu)
    p_cu.add_argument("--docs", required=True,
                      help="parquet with (doc_id, text, ...)")
    p_cu.add_argument("--out", required=True, help="curated parquet path")
    p_cu.add_argument("--id-col", default="doc_id")
    p_cu.add_argument("--text-col", default="text")
    p_cu.add_argument("--min-quality", type=float, default=0.4)
    p_cu.add_argument("--min-words", type=int, default=5)
    p_cu.add_argument("--max-top-bigram", type=float, default=0.3)
    p_cu.add_argument("--near", default="minhash",
                      choices=["minhash", "simhash", "none"])
    p_cu.add_argument("--jaccard", type=float, default=0.8)
    p_cu.add_argument("--redact-pii", action="store_true",
                      help="replace emails/ssns/phones/ips with placeholder "
                           "tokens before any other stage")
    p_cu.add_argument("--max-dup-frac", type=float, default=None,
                      help="drop docs whose duplicated-substring-span "
                           "fraction exceeds this (Lee et al. style)")
    p_cu.add_argument("--decontam-bench", default=None,
                      help="parquet of benchmark/eval docs; corpus docs "
                           "sharing any n-gram with it are dropped")
    p_cu.add_argument("--decontam-text-col", default="text",
                      help="text column name in the --decontam-bench file")
    p_cu.add_argument("--decontam-ngram", type=int, default=13)
    p_cu.add_argument("--dup-span-ngram", type=int, default=10,
                      help="word-window width for --max-dup-frac")
    p_cu.add_argument("--write-state", action="store_true",
                      help="materialize the curated corpus's minhash "
                           "signatures (dedup_signatures table) so later "
                           "appends can near-dedup against the base")

    p_ann = sub.add_parser(
        "ann", help="IVF ANN serving: --build materializes the quantizer + "
                    "partitioned inverted lists in the catalog; --queries "
                    "answers a batch against the persisted state (no corpus "
                    "scan, no retraining)")
    _add_common(p_ann)
    p_ann.add_argument("--build", action="store_true")
    p_ann.add_argument("--embeddings", default=None,
                       help="parquet with (vec_id, embedding) — build only")
    p_ann.add_argument("--queries", default=None,
                       help="parquet with (qid, embedding) — query only")
    p_ann.add_argument("--n-centroids", type=int, default=16)
    p_ann.add_argument("--iters", type=int, default=3)
    p_ann.add_argument("--seed", type=int, default=42)
    p_ann.add_argument("--k", type=int, default=5)
    p_ann.add_argument("--n-probe", type=int, default=2)
    p_ann.add_argument("--sim-round", type=int, default=None)
    p_ann.add_argument("--out", default=None, help="result parquet path")

    p_c = sub.add_parser("compact", help="sort-merge combine appended chunks")
    _add_common(p_c)
    p_c.add_argument("--range-size", type=int, default=1 << 17)
    p_c.add_argument("--incremental", action="store_true",
                     help="compact only the term_buckets that hold "
                          "multi-chunk groups, one bucket swap at a time "
                          "(bounded I/O; termstats deltas stay, folded on "
                          "the next full compact or --termstats)")
    p_c.add_argument("--termstats", action="store_true",
                     help="fold termstats delta rows (and per-epoch stats "
                          "rows) only — O(vocab) I/O, postings untouched")

    args = ap.parse_args(argv)
    spark = get_spark(f"engine-{args.cmd}", master=args.master)
    catalog = Catalog(args.catalog)

    if args.cmd == "index":
        pages = spark.read.parquet(args.pages)
        cfg = IndexConfig(
            range_size=args.range_size,
            langs=tuple(x for x in args.langs.split(",") if x),
            recompute_text=not args.no_extract)
        info = build_index(spark, pages, catalog, cfg,
                           input_fp=args.pages, force=args.force)
        print(json.dumps(info))
        return 0

    if args.cmd == "curate":
        from .operators.curate import CurateConfig, curate_corpus
        cfg = CurateConfig(min_quality=args.min_quality,
                           min_words=args.min_words,
                           max_top_bigram_frac=args.max_top_bigram,
                           near=args.near, jaccard=args.jaccard,
                           redact_pii=args.redact_pii,
                           max_dup_frac=args.max_dup_frac,
                           dup_span_ngram=args.dup_span_ngram,
                           decontam_ngram=args.decontam_ngram)
        bench = (spark.read.parquet(args.decontam_bench)
                 if args.decontam_bench else None)
        _, stats = curate_corpus(
            spark, spark.read.parquet(args.docs), catalog, cfg,
            id_col=args.id_col, text_col=args.text_col, out_path=args.out,
            bench=bench, bench_text_col=args.decontam_text_col,
            write_state=args.write_state)
        print(json.dumps(stats))
        return 0

    if args.cmd == "ann":
        from .operators.similarity import ivf_build_serving, ivf_serve_topk
        if args.build:
            if not args.embeddings:
                ap.error("ann --build requires --embeddings")
            info = ivf_build_serving(
                spark, catalog, spark.read.parquet(args.embeddings),
                n_centroids=args.n_centroids, seed=args.seed,
                iters=args.iters, sim_round=args.sim_round)
            print(json.dumps(info))
            return 0
        if not args.queries:
            ap.error("ann needs --build or --queries")
        res = ivf_serve_topk(spark, catalog,
                             spark.read.parquet(args.queries),
                             k=args.k, n_probe=args.n_probe,
                             sim_round=args.sim_round)
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
        else:
            res.orderBy("qid", "rank").show(50, truncate=False)
        return 0

    if args.cmd in ("append", "compact"):
        from .streaming.incremental import (append_pages_batch,
                                            compact_postings,
                                            stream_pages_into_index)
        from .plans.index_build import read_stats_row
        srow = read_stats_row(spark, catalog)

        def _opt(name, default):
            # read_stats_row reads the full STATS_SCHEMA; legacy catalogs
            # surface missing counters as nulls, not missing fields
            v = srow[name]
            return v if v is not None else default

        cfg = IndexConfig(range_size=int(srow["range_size"]),
                          block=int(srow["block"]),
                          n_term_buckets=int(_opt("n_term_buckets", 32)),
                          analyzer=str(_opt("analyzer", "english")),
                          langs=(), recompute_text=False,
                          materialize_docs=False)
        if args.cmd == "compact":
            if getattr(args, "termstats", False):
                from .streaming.incremental import compact_termstats
                compact_termstats(spark, catalog)
                print("compacted termstats")
                return 0
            if getattr(args, "incremental", False):
                from .streaming.incremental import buckets_needing_compaction
                work = buckets_needing_compaction(spark, catalog)
                compact_postings(spark, catalog, cfg, buckets=work)
                print(f"compacted buckets {work}")
            else:
                compact_postings(spark, catalog, cfg)
                print("compacted postings")
            return 0
        if args.stream:
            q = stream_pages_into_index(
                spark, args.pages,
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string", catalog, cfg,
                checkpoint_dir=args.checkpoint or (args.catalog + "/_ckpt"),
                curate_neardups=args.curate_neardups,
                neardup_jaccard=args.neardup_jaccard)
            q.awaitTermination()
            print("stream drained")
        elif args.curate_neardups:
            import uuid
            from .operators.curate import append_pages_batch_curated
            info = append_pages_batch_curated(
                spark, spark.read.parquet(args.pages), catalog, cfg,
                epoch_tag=f"cli{uuid.uuid4().hex[:10]}",
                jaccard=args.neardup_jaccard)
            print(json.dumps(info))
        else:
            info = append_pages_batch(
                spark, spark.read.parquet(args.pages), catalog, cfg)
            print(json.dumps(info))
        return 0

    reader = IndexReader(spark, catalog)
    if args.cmd == "search":
        queries = load_queries_tsv(spark, args.queries)
        params = SearchParams(k1=args.k1, b=args.b, k=args.k, algo=args.algo)
        if args.rm3:
            docs = catalog.read_table(spark, "docs")
            run = search_rm3(reader, queries, docs, params=params)
        else:
            run = search(reader, queries, params)
        from .plans.query import attach_urls
        out = attach_urls(reader, run).select(
            "qid", F.col("url").alias("docid"), "score")
        if args.out:
            write_run(out, args.out, args.run_name, max_docs=args.k)
            print(f"wrote {args.out}")
        else:
            out.orderBy("qid", F.desc("score")).show(50, truncate=False)
        return 0

    if args.cmd == "tune":
        from .plans.tuning import (cv_tune_bm25, grid_search_bm25,
                                   grid_search_rm3, save_tuned)
        queries = load_queries_tsv(spark, args.queries)
        qrels = load_qrels(spark, args.qrels)
        if args.cv:
            best = cv_tune_bm25(reader, queries, qrels)
        else:
            best = grid_search_bm25(reader, queries, qrels)
        rm3 = None
        if args.rm3:
            docs = catalog.read_table(spark, "docs")
            rm3 = grid_search_rm3(reader, queries, docs, qrels,
                                  k1=best["k1"], b=best["b"])
        save_tuned(args.out, best, rm3)
        print(json.dumps({"bm25": {k: best[k] for k in ("k1", "b")},
                          "rm3": rm3}))
        return 0

    if args.cmd == "pipeline":
        from .plans.pipeline import run_pipeline
        from .sources.loaders import queries_with_fallback
        queries = load_queries_tsv(spark, args.queries)
        expanded = queries_with_fallback(
            queries, load_expanded_csv(spark, args.expanded))
        qrels = load_qrels(spark, args.qrels) if args.qrels else None
        docs = catalog.read_table(spark, "docs")
        # qrels docids are external urls -> map to dense ids
        if qrels is not None:
            dm = reader.docmap.select(F.col("docid").alias("docid_int"), "url")
            qrels = (qrels.join(dm, qrels.docid == dm.url, "inner")
                     .select("qid", F.col("docid_int").alias("docid"), "rel"))
        out = run_pipeline(reader, queries, expanded, docs, qrels,
                           out_dir=args.out_dir)
        if out["metrics"] is not None:
            out["metrics"].show(truncate=False)
        print(f"wrote run_1.res run_2.res run_3.res to {args.out_dir}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
