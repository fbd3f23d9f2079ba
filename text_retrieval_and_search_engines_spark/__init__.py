"""PySpark-native full-text index build + BM25 query engine.

A brand-new engine with the query semantics of the reference IR pipeline
(er1009/text-retrieval-and-search-engines, surveyed in SURVEY.md): distributed
inverted-index construction (delta + varbyte compressed posting lists with
block-max metadata) and Okapi BM25 / RM3 top-k retrieval, plus fusion,
passage aggregation, TREC I/O and native IR evaluation — all expressed as
DataFrame plans + vectorized Arrow UDF kernels.
"""

__version__ = "0.1.0"
