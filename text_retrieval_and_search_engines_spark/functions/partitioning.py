"""Scale-adaptive input parallelism (guide §2.5 "input skew": one small
parquet file plans into 1-2 splits, and every heavy per-row stage above it
— tokenize, shingling, 32-wide signature hashing, window builds — then
runs nearly serial while 30 cores idle; measured 246 s for the curate
signature aggregate at sf1.0 on 2 tasks).

`ensure_min_partitions` round-robin-repartitions a frame ONLY when its
scan parallelism is below the session's default parallelism — at real
scale the input has more splits than cores and this is a no-op, so it is
derived from the input, never a local[32]-tuned constant. The exchange it
may add moves the raw input rows once — trivial next to the per-row work
it parallelizes."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition `df` to at least `n` (default: defaultParallelism)
    partitions — a no-op whenever the frame already has that many, so
    large inputs never pay the exchange."""
    target = n or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
