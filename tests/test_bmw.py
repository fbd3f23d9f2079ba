"""BMW kernel property tests: block-max WAND == exhaustive scoring,
bit-identical, on random corpora/queries (the SURVEY §5 property contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_retrieval_and_search_engines_spark.functions import codec
from text_retrieval_and_search_engines_spark.plans.bmw import bmw_topk


def _make_group(rng, n_terms, n_docs_range, range_start, block=8):
    """Random (qid, range) scoring group as the kernel receives it."""
    rows = []
    for ti in range(n_terms):
        df_local = int(rng.integers(1, max(2, n_docs_range)))
        docids = np.sort(rng.choice(n_docs_range, size=df_local,
                                    replace=False)).astype(np.int64) + range_start
        tfs = rng.integers(1, 20, df_local).astype(np.int64)
        dls = rng.integers(1, 500, df_local).astype(np.int64)
        payload = codec.encode_postings(docids, tfs, dls, range_start)
        bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, block)
        go, to, do = codec.block_offsets(docids, tfs, dls, range_start, block)
        rows.append({
            "term": f"t{ti:03d}", "weight": float(rng.integers(1, 3)),
            "df": df_local + int(rng.integers(0, 5)),  # global df >= local
            "n_qterms": n_terms,
            "payload": payload, "block_last": bl.tolist(),
            "block_max_tf": btf.tolist(), "block_min_dl": bdl.tolist(),
            "goff": go.tolist(), "toff": to.tolist(), "doff": do.tolist(),
        })
    return pd.DataFrame(rows)


def _exhaustive(pdf, range_start, range_size, n_docs, avgdl, k1, b, k, mode):
    """Reference: the exact kernel's logic, standalone."""
    acc = np.zeros(range_size, dtype=np.float64)
    hits = np.zeros(range_size, dtype=np.int64)
    order = np.argsort(pdf["term"].to_numpy(), kind="stable")
    for i in order:
        docids, tfs, dls = codec.decode_postings(
            pdf["payload"].iloc[i], range_start=range_start)
        if docids.size == 0:
            continue
        df = float(pdf["df"].iloc[i])
        w = float(pdf["weight"].iloc[i])
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        s = w * (idf * codec.bm25_tf_norm(tfs, dls, k1, b, avgdl))
        loc = docids - range_start
        acc[loc] += s
        hits[loc] += 1
    if mode == "and":
        cand = np.flatnonzero(hits == int(pdf["n_qterms"].iloc[0]))
    else:
        cand = np.flatnonzero(hits)
    scores = acc[cand]
    sel = np.lexsort((cand, -scores))[:k]
    return (cand[sel] + range_start), scores[sel]


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**6), st.integers(1, 6), st.integers(2, 40),
       st.sampled_from([1, 3, 10]), st.sampled_from(["or", "and"]))
def test_bmw_equals_exhaustive(seed, n_terms, n_docs_range, k, mode):
    rng = np.random.default_rng(seed)
    range_start = int(rng.integers(0, 1000)) * 64
    pdf = _make_group(rng, n_terms, n_docs_range, range_start)
    n_docs, avgdl = 1000.0, 123.4
    for k1, b in [(0.9, 0.4), (1.5, 0.75)]:
        ed, es = _exhaustive(pdf, range_start, 64 * 1024, n_docs, avgdl,
                             k1, b, k, mode)
        gd, gs = bmw_topk(pdf, range_start, 64 * 1024, n_docs, avgdl,
                          k1, b, k, mode)
        assert np.array_equal(gd, ed), (gd, ed)
        assert np.array_equal(gs, es)  # bit-identical floats


def test_bmw_with_ties():
    """Many identical docs -> massive score ties; tie-break must hold."""
    rng = np.random.default_rng(7)
    rows = []
    docids = np.arange(100, dtype=np.int64)
    tfs = np.full(100, 3, dtype=np.int64)
    dls = np.full(100, 50, dtype=np.int64)
    payload = codec.encode_postings(docids, tfs, dls, 0)
    bl, btf, bdl = codec.block_max_meta(docids, tfs, dls, 8)
    go, to, do = codec.block_offsets(docids, tfs, dls, 0, 8)
    rows.append({"term": "t0", "weight": 1.0, "df": 100, "n_qterms": 1,
                 "payload": payload, "block_last": bl.tolist(),
                 "block_max_tf": btf.tolist(), "block_min_dl": bdl.tolist(),
                 "goff": go.tolist(), "toff": to.tolist(), "doff": do.tolist()})
    pdf = pd.DataFrame(rows)
    d, s = bmw_topk(pdf, 0, 1024, 1000.0, 50.0, 0.9, 0.4, 10, "or")
    assert list(d) == list(range(10))  # all tied -> smallest docids win
    assert len(set(s)) == 1


def test_bmw_spark_rank_identical(spark, tiny_index):
    """End-to-end: algo='bmw' through the Spark plan == oracle."""
    import math
    from text_retrieval_and_search_engines_spark.plans.query import (
        SearchParams, search)
    from text_retrieval_and_search_engines_spark.sources.pages import (
        synth_queries)
    reader, oracle, catalog, en = tiny_index
    qpdf = synth_queries(8, seed=42, vocab_size=500)
    qdf = spark.createDataFrame(qpdf)
    rows = search(reader, qdf, SearchParams(k=20, algo="bmw")).collect()
    got = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        got.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    for row in qpdf.itertuples():
        exp = oracle.search(row.text, k=20)
        g = got.get(row.qid, [])
        assert [d for d, _ in g] == [d for d, _ in exp], row.qid
        for (gd, gs), (_, es) in zip(g, exp):
            assert math.isclose(gs, es, rel_tol=0, abs_tol=1e-12)
