"""PII redaction + benchmark decontamination + duplicated-span operators:
planted-case semantics and the plan shapes the 100 TB story depends on
(PII is shuffle-free; the benchmark n-gram side is broadcast)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_retrieval_and_search_engines_spark.operators import decontam, pii  # noqa: E402


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "reach me at alice.smith+x@mail.example.org thanks"),
        (1, "server at 192.168.1.250 and backup 10.0.0.7"),
        (2, "call 555-123-4567 or 800.555.1212 today"),
        (3, "ssn 123-45-6789 on file"),
        (4, "plain text with no sensitive content at all"),
        (5, "multi a@b.co c@d.io 1.2.3.4 555-000-1111 999-88-7777"),
        (6, "paren phone (555) 123-4567 and intl +1 555 123 4567"),
        (7, "card 4111-1111-1111-1111 or 4111 1111 1111 1111 "
            "or 4111111111111111 but not 41111111111111111"),
        (8, "octet bounds: 999.999.999.999 and 256.1.1.1 are not IPs"),
        (9, "prose numbers 100 200 3000 are not a phone"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_planted(pii_docs):
    out = {r["doc_id"]: r.asDict()
           for r in pii.pii_features(pii_docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["has_pii"] == 1
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_phone"] == 2
    assert out[3]["n_ssn"] == 1
    assert out[4] == {"doc_id": 4, "n_email": 0, "n_credit_card": 0,
                      "n_ssn": 0, "n_phone": 0, "n_ipv4": 0, "has_pii": 0}
    assert out[5]["n_email"] == 2 and out[5]["n_ipv4"] == 1
    assert out[5]["n_phone"] == 1 and out[5]["n_ssn"] == 1
    # ADVICE r4 extensions: parens/international phones, credit cards,
    # bounds-checked IPv4 octets, and the documented precision guards
    assert out[6]["n_phone"] == 2
    assert out[7]["n_credit_card"] == 3 and out[7]["has_pii"] == 1
    assert out[8]["n_ipv4"] == 0 and out[8]["has_pii"] == 0
    assert out[9]["n_phone"] == 0 and out[9]["has_pii"] == 0


def test_redaction_is_a_fixpoint(pii_docs):
    """Re-running detection on redacted text finds nothing — the pinned
    pattern order leaves no residual matches."""
    red = pii.pii_redact(pii_docs).withColumnRenamed("redacted", "text")
    residual = (pii.pii_features(red)
                .agg(F.sum("has_pii").alias("s")).collect()[0]["s"])
    assert residual == 0
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert "<EMAIL>" in texts[0] and "alice" not in texts[0]
    assert texts[5].count("<EMAIL>") == 2 and "<SSN>" in texts[5]


def test_pii_features_is_shuffle_free(pii_docs):
    plan = (pii.pii_features(pii_docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_contamination_flags_planted(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    docs = spark.createDataFrame([
        (0, "we saw the quick brown fox run away yesterday"),   # 3-gram hit
        (1, "completely unrelated sentences about databases"),
        (2, "lazy dog sleeping"),                                # only 2-gram
    ], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in decontam.contamination_stats(docs, bench, n=3).collect()}
    assert out[0]["contaminated"] == 1 and out[0]["n_hits"] == 2  # two windows
    assert out[1]["contaminated"] == 0 and out[1]["n_hits"] == 0
    assert out[2]["contaminated"] == 0
    assert out[2]["n_windows"] == 1  # 3 words -> one window


def test_contamination_bench_side_is_broadcast(spark):
    bench = spark.createDataFrame([(0, "a b c d e")],
                                  "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a b c x y")],
                                 "doc_id long, text string")
    plan = (decontam.contamination_stats(docs, bench, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_dup_spans_planted(spark):
    boiler = "all rights reserved copyright twenty twenty four site map"
    docs = spark.createDataFrame([
        (0, "unique page about spark joins and shuffles here " + boiler),
        (1, "another page on varbyte posting compression text " + boiler),
        (2, "a page with entirely original content and nothing shared"),
        (3, "echo echo " + " ".join(["repeat"] * 12)),  # within-doc repeats
    ], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in decontam.dup_span_stats(docs, n=8).collect()}
    # the 9-word boilerplate tail yields >=2 shared 8-gram windows per doc
    assert out[0]["n_dup_windows"] >= 2 and out[1]["n_dup_windows"] >= 2
    assert out[2]["n_dup_windows"] == 0 and out[2]["dup_frac"] == 0.0
    # 12x "repeat" duplicates its own windows corpus-wide
    assert out[3]["n_dup_windows"] > 0
    for r in out.values():
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_short_doc_has_empty_window_set(spark):
    docs = spark.createDataFrame([(0, "only four words here"),
                                  (1, "")], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in decontam.dup_span_stats(docs, n=8).collect()}
    assert out[0]["n_windows"] == 0 and out[0]["dup_frac"] == 0.0
    assert out[1]["n_windows"] == 0


def test_fast_and_md5_hash_impls_agree(spark):
    """xxhash64 (production) and md5-h64 (oracle twin) keys must yield
    identical operator OUTPUTS — they only relabel the join keys."""
    boiler = "shared boilerplate tail appears on both of these pages now ok"
    docs = spark.createDataFrame([
        (0, "first page body text differs somewhat " + boiler),
        (1, "second page body text other words here " + boiler),
        (2, "totally unrelated and unique page content without repeats"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame([(9, boiler)], "doc_id long, text string")
    for fn in (
        lambda impl: decontam.dup_span_stats(docs, n=8, hash_impl=impl),
        lambda impl: decontam.contamination_stats(docs, bench, n=5,
                                                  hash_impl=impl),
    ):
        fast = sorted(map(tuple, fn("fast").collect()))
        md5 = sorted(map(tuple, fn("md5").collect()))
        assert fast == md5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decontam.dup_span_stats(docs, hash_impl="bogus").collect()


def test_hygiene_materialize_modes_identical_and_one_pass(spark, tmp_path):
    """VERDICT r4 item 1: persist= / scratch_path= make the O(tokens)
    window-build subtree run ONCE. Outputs must be bit-identical to the
    default recompute-per-consumer mode, and the final physical plan must
    contain NO Generate (explode) node — the window build lives behind the
    cache / scratch parquet, not re-planned per consumer."""
    docs = spark.createDataFrame(
        [(i, f"shared boilerplate tail here now {'x' if i % 2 else 'y'} "
             "alpha beta gamma delta epsilon zeta eta theta")
         for i in range(12)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    caches: list = []
    variants = {
        "default": decontam.dup_span_stats(docs, n=4),
        "persist": decontam.dup_span_stats(docs, n=4, persist=True,
                                           cache_registry=caches),
        "scratch": decontam.dup_span_stats(
            docs, n=4, scratch_path=str(tmp_path / "spans_scratch")),
    }
    rows = {k: sorted(map(tuple, v.collect())) for k, v in variants.items()}
    assert rows["persist"] == rows["default"]
    assert rows["scratch"] == rows["default"]
    # persist: every consumer reads the cache (the printed plan still
    # INLINES the InMemoryRelation's lineage, so don't grep for Generate —
    # the scan node type is the proof the subtree isn't re-executed)
    p_plan = variants["persist"]._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in p_plan
    # scratch: consumers read parquet; no window-build Generate anywhere
    s_plan = variants["scratch"]._jdf.queryExecution().executedPlan().toString()
    # (FileScan Location strings are truncated in the printout — assert the
    # scan TYPE, not the path substring)
    assert "Generate" not in s_plan and "FileScan parquet" in s_plan
    assert "Generate" in (variants["default"]._jdf.queryExecution()
                          .executedPlan().toString())

    c_caches: list = []
    c_variants = {
        "default": decontam.contamination_stats(docs, bench, n=4),
        "persist": decontam.contamination_stats(docs, bench, n=4,
                                                persist=True,
                                                cache_registry=c_caches),
        "scratch": decontam.contamination_stats(
            docs, bench, n=4, scratch_path=str(tmp_path / "cont_scratch")),
    }
    c_rows = {k: sorted(map(tuple, v.collect()))
              for k, v in c_variants.items()}
    assert c_rows["persist"] == c_rows["default"]
    assert c_rows["scratch"] == c_rows["default"]
    assert "InMemoryTableScan" in (c_variants["persist"]._jdf
                                   .queryExecution().executedPlan()
                                   .toString())
    # scratch: the corpus-side window build reads parquet; only the tiny
    # benchmark side may still explode inside its broadcast subtree
    cs_plan = (c_variants["scratch"]._jdf.queryExecution().executedPlan()
               .toString())
    assert "Generate" not in cs_plan.split("BroadcastExchange")[0]
    assert "FileScan parquet" in cs_plan
    for df in caches + c_caches:
        df.unpersist()
