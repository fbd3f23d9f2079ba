"""Query / expanded-query / qrels loaders (SURVEY §2.1 S1-S3).

Reference: ``final-project/src/data_loader.py`` — query TSV (:12-35),
expanded-query CSV with header qid,original_query,expanded_query (:38-57),
whitespace qrels with >=4 columns (:60-85), train/test qid splits (:97-109).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRAIN_QIDS = [str(q) for q in range(301, 351)]
TEST_QIDS = [str(q) for q in list(range(351, 451)) + list(range(601, 701))
             if q != 672]


def load_queries_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1: qid\\tquery lines, skip blanks (data_loader.py:12-35)."""
    df = spark.read.text(path)
    split = F.split(F.col("value"), "\t", 2)
    return (df.filter(F.trim("value") != "")
            .select(F.trim(split.getItem(0)).alias("qid"),
                    F.trim(split.getItem(1)).alias("text"))
            .filter(F.col("text").isNotNull()))


def load_expanded_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: CSV header qid,original_query,expanded_query
    (data_loader.py:38-57)."""
    return (spark.read.csv(path, header=True)
            .select("qid", "original_query", "expanded_query"))


def queries_with_fallback(queries: DataFrame, expanded: DataFrame) -> DataFrame:
    """Expanded query per qid, falling back to the original when the qid is
    missing from the expansion file (reference main.py:68)."""
    return (queries.join(expanded.select("qid", "expanded_query"),
                         "qid", "left")
            .select("qid", F.coalesce("expanded_query", "text").alias("text")))


def load_qrels(spark: SparkSession, path: str) -> DataFrame:
    """S3: whitespace-separated 'qid iter docid rel' (data_loader.py:60-85)."""
    df = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (df.filter(F.size(parts) >= 4)
            .select(parts.getItem(0).alias("qid"),
                    parts.getItem(2).alias("docid"),
                    parts.getItem(3).cast("int").alias("rel"))
            .filter(F.col("rel").isNotNull()))


def filter_qids(df: DataFrame, qids: list[str]) -> DataFrame:
    """Train/test split helper (data_loader.py:97-109)."""
    return df.filter(F.col("qid").isin(qids))
