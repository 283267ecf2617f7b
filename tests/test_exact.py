"""Exact brute-force kNN (D5) vs an independent DuckDB oracle on the
driver-provided embeddings fixture (F8)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rust_diskann_spark.operators.exact import exact_knn, get_vector, rescore


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(emb):
    # FIXTURES.md F8: every 100th row by vec_id is a query
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.mark.parametrize("metric,duck_expr", [
    ("l2", "list_distance(e.embedding, q.embedding)"),
    ("cosine", "1.0 - list_cosine_similarity(e.embedding, q.embedding)"),
    ("dot", "1.0 - list_inner_product(e.embedding, q.embedding)"),
])
def test_exact_knn_vs_duckdb(spark, sf_dir, emb, metric, duck_expr):
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    res = (
        exact_knn(_queries(emb), corpus, k=10, metric=metric)
        .orderBy("query_id", "rank")
        .collect()
    )
    con = duckdb.connect()
    want = con.execute(f"""
        with q as (select vec_id qid, embedding from '{sf_dir}/embeddings.parquet'
                   where vec_id % 100 = 0),
        scored as (
          select q.qid, e.vec_id id, {duck_expr}::double d,
                 row_number() over (partition by q.qid
                                    order by {duck_expr}, e.vec_id) rnk
          from '{sf_dir}/embeddings.parquet' e, q
        )
        select qid, rnk, id, d from scored where rnk <= 10 order by qid, rnk
    """).fetchall()
    assert len(res) == len(want)
    for r, w in zip(res, want):
        assert (r["query_id"], r["rank"], r["id"]) == (w[0], w[1], w[2])
        assert r["dist"] == pytest.approx(w[3], rel=1e-4, abs=1e-6)


def test_get_vector_and_rescore(spark, emb):
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    row = get_vector(corpus, 3).collect()
    assert len(row) == 1 and row[0]["id"] == 3

    queries = _queries(emb)
    res = exact_knn(queries, corpus, k=5, metric="l2")
    rs = rescore(res, corpus, queries, metric="l2")
    joined = res.join(rs, ["query_id", "id"]).collect()
    for r in joined:
        assert r["dist"] == pytest.approx(r["true_dist"], rel=1e-9)
