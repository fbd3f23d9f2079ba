"""Round-6 optimization probe harness (bench.py is FROZEN for measurement;
this file exists for guide-§1 isolation: per-query timing with the same
.count() action the frozen bench uses, min-of-N reps, optional
.explain("formatted") capture into plans/r06/).

Usage:
  python bench_extra.py --ops bm25_topk,term_stats --sf /root/testdata/sf1.0 \
      --reps 3 [--explain plans/r06 --suffix before] [--noop]

Special op names beyond entry_queries.QUERY_FNS:
  pii_x / decontam_x / dup_spans_x / dup_spans_persist_x / decontam_persist_x
      -- the frozen bench's hygiene extras (same shapes, same actions)
  curate_x   -- the frozen bench's curate_corpus call (full DAG wall)
  index_x    -- the frozen bench's index build (REPL-replicated corpus)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import corpus_df, make_spark, warmup  # noqa: E402
from text_retrieval_and_search_engines_spark import entry_queries  # noqa: E402


def hygiene_ops(spark, sf_dir):
    from text_retrieval_and_search_engines_spark.operators import (
        decontam as dc_ops, pii as pii_ops)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def pii_x():
        return pii_ops.pii_features(docs).agg(F.sum("has_pii"))

    def decontam_x():
        return dc_ops.contamination_stats(
            docs.filter(F.col("doc_id") % 25 != 0),
            docs.filter(F.col("doc_id") % 25 == 0), n=13
        ).agg(F.sum("contaminated"))

    def dup_spans_x():
        return dc_ops.dup_span_stats(docs, n=10).agg(F.sum("n_dup_windows"))

    return {"pii_x": pii_x, "decontam_x": decontam_x,
            "dup_spans_x": dup_spans_x}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--explain", default=None,
                    help="directory for .explain('formatted') dumps")
    ap.add_argument("--suffix", default="probe")
    ap.add_argument("--noop", action="store_true",
                    help="noop-sink write instead of .count()")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = make_spark(args.cpus)
    if not args.no_warm:
        warmup(spark)
    ops = args.ops.split(",")
    hyg = hygiene_ops(spark, args.sf)
    out = {}
    for name in ops:
        if name == "curate_x":
            from text_retrieval_and_search_engines_spark.operators.curate \
                import CurateConfig, curate_corpus
            from text_retrieval_and_search_engines_spark.sources.tables \
                import Catalog
            import shutil
            docs = spark.read.parquet(f"{args.sf}/documents.parquet")
            times = []
            for r in range(args.reps):
                root = f"/tmp/bx_curate_{r}"
                shutil.rmtree(root, ignore_errors=True)
                spark.sparkContext.setJobDescription(f"curate_x rep{r}")
                t0 = time.perf_counter()
                curate_corpus(spark, docs, Catalog(root), CurateConfig(),
                              out_path="/dev/shm/bx_curated.parquet")
                times.append(time.perf_counter() - t0)
            out[name] = [round(t, 3) for t in times]
            continue
        if name == "index_x":
            import shutil
            from text_retrieval_and_search_engines_spark.plans.index_build \
                import IndexConfig, build_index
            from text_retrieval_and_search_engines_spark.sources.tables \
                import Catalog
            os.environ.setdefault("SPARK_GRAFT_SF_DIR", args.sf)
            import bench as bench_mod
            bench_mod.SF_DIR = args.sf
            corpus = corpus_df(spark)
            corpus.count()
            times, phases = [], []
            for r in range(args.reps):
                root = f"/tmp/bx_cat_{r}"
                shutil.rmtree(root, ignore_errors=True)
                spark.sparkContext.setJobDescription(f"index_x rep{r}")
                t0 = time.perf_counter()
                info = build_index(
                    spark, corpus, Catalog(root),
                    IndexConfig(range_size=1 << 16, langs=(),
                                recompute_text=False,
                                materialize_docs=False),
                    input_fp=f"bx-{r}")
                times.append(time.perf_counter() - t0)
                phases.append(info.get("phase_sec", {}))
            out[name] = [round(t, 3) for t in times]
            out[name + "_phases"] = phases
            continue
        mk = hyg.get(name) or (
            lambda s=name: entry_queries.QUERY_FNS[s](spark, args.sf))
        times = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            df = mk()
            t0 = time.perf_counter()
            if name in hyg:
                # the frozen bench .collect()s these aggregates — .count()
                # on top of a global agg lets Catalyst prune the whole
                # computation (left joins with unused right sides drop)
                df.collect()
            elif args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(time.perf_counter() - t0)
        out[name] = [round(t, 3) for t in times]
        if args.explain:
            import contextlib
            import io
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                mk().explain("formatted")
            with open(os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
