"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``text_retrieval_and_search_engines_spark`` — see
``entry_queries.py`` for the registry and SURVEY.md §2 for the operator map.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from text_retrieval_and_search_engines_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 over the sf0.001 documents corpus."""
    return entry_queries.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline operators)."""
    return dict(entry_queries.QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins — round 4: every queries() key has one (39/39),
    including the real-engine entries (exact, BMW, two-pass RM3), the
    multi-probe/margin LSH ANN paths, the full IVF serving path
    (assignment -> probe selection -> cell-restricted top-k), and the
    composed curation DAG (filters -> exact dedup -> LSH near dedup)."""
    return dict(entry_queries.ORACLE_SQL)
