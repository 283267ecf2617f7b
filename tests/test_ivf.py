"""IVF search tests: full-probe == exact kNN; partial-probe recall;
determinism of the seeded k-means."""

import os

import pytest
from pyspark.sql import functions as F

from rust_diskann_spark.operators import ivf
from rust_diskann_spark.operators.exact import exact_knn

K = 5


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).persist()


@pytest.fixture(scope="module")
def queries(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def test_fullprobe_equals_exact(corpus, queries):
    approx = ivf.ivf_knn(queries, corpus, K, n_cells=8, n_probe=8, iters=1)
    exact = exact_knn(queries, corpus, K, "l2")
    a = {(r["query_id"], r["rank"]): r["id"] for r in approx.collect()}
    e = {(r["query_id"], r["rank"]): r["id"] for r in exact.collect()}
    assert a == e


def test_partial_probe_recall(corpus, queries):
    approx = ivf.ivf_knn(queries, corpus, K, n_cells=8, n_probe=4, iters=2)
    exact = exact_knn(queries, corpus, K, "l2")
    recall = ivf.ivf_recall(approx, exact, K).collect()[0]["recall"]
    # probing half the cells on unclustered synthetic data must beat the
    # ~n_probe/n_cells floor comfortably (centroid ordering is informative)
    assert recall >= 0.5


def test_partial_probe_row_counts(corpus, queries):
    res = ivf.ivf_knn(queries, corpus, K, n_cells=8, n_probe=2, iters=1)
    per_q = res.groupBy("query_id").count().collect()
    assert all(r["count"] == K for r in per_q)
    ranks = res.select("rank").distinct().collect()
    assert sorted(r["rank"] for r in ranks) == list(range(1, K + 1))


def test_kmeans_deterministic(corpus):
    c1 = ivf.kmeans_centroids(corpus, 4, iters=2, seed=7)
    c2 = ivf.kmeans_centroids(corpus, 4, iters=2, seed=7)
    import numpy as np

    assert np.allclose(c1, c2)


def test_literal_cap_bounds_plan_and_preserves_results(
    corpus, queries, monkeypatch
):
    """r11: above _IVF_LITERAL_MAX the centroid model must leave the
    plan (closure-shipped mapInPandas routing/assignment) and results
    must not change. 8 cells x dim 64 = 512 elements; a cap of 256
    forces the big-model path on the same data, so the two arms are
    directly comparable."""
    import re

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )

    lit = ivf.ivf_sampled_knn(queries, corpus, K, n_cells=8, n_probe=2)
    p_lit = plan(lit)

    monkeypatch.setattr(ivf, "_IVF_LITERAL_MAX", 256)
    big = ivf.ivf_sampled_knn(queries, corpus, K, n_cells=8, n_probe=2)
    p_big = plan(big)

    # the literal arm embeds centroid doubles in the plan; the capped
    # arm must not (no multi-element double literals, MapInPandas nodes
    # instead) and its plan must stay small regardless of n_cells
    assert p_big.count("MapInPandas") >= 2  # routing + assignment
    assert len(p_big) < len(p_lit)
    assert not re.search(r"\[[-0-9.Ee, ]{200,}\]", p_big)

    a = {(r["query_id"], r["rank"]): r["id"] for r in lit.collect()}
    b = {(r["query_id"], r["rank"]): r["id"] for r in big.collect()}
    assert a == b


def test_literal_cap_noncontiguous_cells_raise(corpus, queries, monkeypatch):
    monkeypatch.setattr(ivf, "_IVF_LITERAL_MAX", 1)
    with pytest.raises(ValueError, match="non-contiguous"):
        ivf._probes_narrow(
            queries.select(
                F.col("query_id"), F.col("qvec").alias("qv")
            ),
            [(0, [0.0, 1.0]), (2, [1.0, 0.0])],
            "l2",
            1,
        )


def test_cosine_fullprobe_equals_exact(corpus, queries):
    approx = ivf.ivf_knn(queries, corpus, K, metric="cosine", n_cells=4, n_probe=4, iters=1)
    exact = exact_knn(queries, corpus, K, "cosine")
    a = {(r["query_id"], r["rank"]): r["id"] for r in approx.collect()}
    e = {(r["query_id"], r["rank"]): r["id"] for r in exact.collect()}
    assert a == e
