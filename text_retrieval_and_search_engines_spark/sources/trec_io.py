"""TREC 6-column run-file source + sink (SURVEY §2.1, S6-S9).

Reference: ``final-project/src/trec_io.py`` — writer for scored runs
(:51-77), writer for ranked lists (:11-48), reader (:80-120), submission
merge (:123-142). Format (reference README.md:138-144):

    qid Q0 docid rank score run_name

scores ``%.6f``; <=1000 docs per query; 1-based ranks by score desc; output
qid order is ``(len(qid), qid)`` — string qids sort numerically that way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def format_run(run: DataFrame, run_name: str, max_docs: int = 1000) -> DataFrame:
    """(qid, docid, score) -> formatted TREC lines + sort keys."""
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        run.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_docs)
        .select(
            F.length("qid").alias("_qlen"),
            "qid", "rank",
            F.format_string("%s Q0 %s %d %.6f %s",
                            F.col("qid"), F.col("docid").cast("string"),
                            F.col("rank"), F.col("score").cast("double"),
                            F.lit(run_name)).alias("value"),
        )
    )


def write_run(run: DataFrame, path: str, run_name: str,
              max_docs: int = 1000) -> None:
    """Single TREC run file at `path` (driver collects — run files are <=
    n_queries*1000 lines by construction, reference trec_io.py:51-77)."""
    rows = (format_run(run, run_name, max_docs)
            .orderBy("_qlen", "qid", "rank")
            .select("value").collect())
    with open(path, "w") as f:
        for r in rows:
            f.write(r["value"] + "\n")


def read_run(spark, path: str) -> DataFrame:
    """TREC run file -> run(qid, docid, rank, score) (trec_io.py:80-120)."""
    df = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("docid"),
        parts.getItem(3).cast("int").alias("rank"),
        parts.getItem(4).cast("double").alias("score"),
    ).filter(F.col("docid").isNotNull())


def merge_submissions(spark, in_paths: list[str], out_paths: list[str],
                      run_names: list[str] | None = None) -> None:
    """Re-number/rename runs to run_{i}.res (trec_io.py:123-142)."""
    for i, (src, dst) in enumerate(zip(in_paths, out_paths)):
        run = read_run(spark, src)
        name = (run_names[i] if run_names else f"run_{i + 1}")
        write_run(run.select("qid", "docid", "score"), dst, name)
