from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_retrieval_and_search_engines_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master=os.environ.get("SPARK_MASTER", "local[4]"),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages():
    """Deterministic 200-doc corpus (FIXTURES.md 'tiny')."""
    from text_retrieval_and_search_engines_spark.sources.pages import synth_pages
    return synth_pages(200, seed=42, vocab_size=500)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_pages, tmp_path_factory):
    """Built index over the tiny corpus + the matching oracle."""
    from text_retrieval_and_search_engines_spark.oracle.bm25_oracle import OracleIndex
    from text_retrieval_and_search_engines_spark.plans.index_build import (
        IndexConfig, build_index)
    from text_retrieval_and_search_engines_spark.plans.query import IndexReader
    from text_retrieval_and_search_engines_spark.sources.tables import Catalog

    root = str(tmp_path_factory.mktemp("catalog"))
    catalog = Catalog(root)
    cfg = IndexConfig(range_size=64, block=16)  # small so chunking is exercised
    pages_df = spark.createDataFrame(tiny_pages)
    build_index(spark, pages_df, catalog, cfg, input_fp="tiny200")
    reader = IndexReader(spark, catalog)

    en = tiny_pages[tiny_pages.lang == "en"].sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(en)), en["text"])))
    return reader, oracle, catalog, en
