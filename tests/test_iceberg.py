"""Iceberg-runtime smoke (VERDICT r2 item 8 / missing item 2).

No iceberg-spark-runtime jar ships in this sandbox, so the Catalog's
``use_iceberg`` switch has never executed. This test exercises the real
branch the first time an environment provides the jar (skipif otherwise):
write/read/append through ``format('iceberg')`` and the documented
compact_postings guard. Runs in a SUBPROCESS because the iceberg catalog
needs session-level confs the shared fixture session was not built with.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")


def _iceberg_jars() -> list[str]:
    pats = [
        os.path.join(SPARK_HOME, "jars", "iceberg-spark-runtime*.jar"),
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*.jar"),
    ]
    return [p for pat in pats for p in glob.glob(pat)]


_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

warehouse = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("iceberg-smoke")
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate())

from text_retrieval_and_search_engines_spark.sources.tables import Catalog

spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
cat = Catalog(warehouse, use_iceberg=True, iceberg_namespace="local.db")
df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
cat.write_table(df, "smoke", fingerprint="t0")
assert cat.read_table(spark, "smoke").count() == 2
cat.write_table(spark.createDataFrame([(3, "c")], "id long, v string"),
                "smoke", fingerprint="t1", mode="append")
assert cat.read_table(spark, "smoke").count() == 3
assert cat.has_table("smoke")

# the local-dir compaction path must refuse an iceberg catalog loudly
from text_retrieval_and_search_engines_spark.plans.index_build import (
    IndexConfig)
from text_retrieval_and_search_engines_spark.streaming.incremental import (
    compact_postings)
try:
    compact_postings(spark, cat, IndexConfig())
    raise SystemExit("compact_postings must refuse iceberg catalogs")
except NotImplementedError:
    pass
print("ICEBERG-SMOKE-OK")
spark.stop()
"""


@pytest.mark.skipif(not _iceberg_jars(),
                    reason="no iceberg-spark-runtime jar in this "
                           "environment (documented in BENCH.md)")
def test_iceberg_catalog_roundtrip(tmp_path):
    script = tmp_path / "iceberg_smoke.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "warehouse")],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ICEBERG-SMOKE-OK" in out.stdout
