"""Distance expressions: Spark SQL form vs numpy twin vs DuckDB (D1-D4)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_diskann_spark.functions.distance import (
    distance_expr,
    l2_normalize_expr,
    numpy_distance,
)

FLOAT_VECS = [
    ([0.0, 0.0, 0.0], [1.0, 2.0, 2.0]),
    ([1.0, 0.0, 0.0], [0.5, 0.5, 0.0]),
    ([-1.5, 2.5, 3.0], [3.0, -2.0, 0.25]),
]


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_float_metrics_spark_vs_numpy(spark, metric):
    df = spark.createDataFrame(
        [(a, b) for a, b in FLOAT_VECS], "a array<float>, b array<float>"
    )
    got = [
        r["d"]
        for r in df.select(distance_expr(metric, F.col("a"), F.col("b")).alias("d"))
        .collect()
    ]
    want = [
        float(numpy_distance(metric, np.array(a), np.array([b]))[0])
        for a, b in FLOAT_VECS
    ]
    assert got == pytest.approx(want, rel=1e-6)


def test_l2_vs_duckdb(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b in FLOAT_VECS], "a array<double>, b array<double>"
    )
    got = [
        r["d"]
        for r in df.select(distance_expr("l2", F.col("a"), F.col("b")).alias("d"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("select list_distance(?::double[], ?::double[])", [a, b]).fetchone()[0]
        for a, b in FLOAT_VECS
    ]
    assert got == pytest.approx(want, rel=1e-9)


def test_cosine_vs_duckdb(spark):
    vecs = [p for p in FLOAT_VECS if any(x != 0 for x in p[0])]  # duckdb NaNs on zero vecs
    df = spark.createDataFrame(
        [(a, b) for a, b in vecs], "a array<double>, b array<double>"
    )
    got = [
        r["d"]
        for r in df.select(distance_expr("cosine", F.col("a"), F.col("b")).alias("d"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        1.0
        - con.execute(
            "select list_cosine_similarity(?::double[], ?::double[])", [a, b]
        ).fetchone()[0]
        for a, b in vecs
    ]
    assert got == pytest.approx(want, rel=1e-9)


def test_hamming_spark_vs_numpy(spark):
    rows = [([5, 12], [3, 12]), ([0, 0], [0, 0]), ([2**40, 7], [1, 7])]
    df = spark.createDataFrame(rows, "a array<long>, b array<long>")
    got = [
        r["d"]
        for r in df.select(distance_expr("hamming", F.col("a"), F.col("b")).alias("d"))
        .collect()
    ]
    want = [
        float(numpy_distance("hamming", np.array(a, np.int64), np.array([b], np.int64))[0])
        for a, b in rows
    ]
    assert got == want


def test_l2_normalize(spark):
    """E2 normalization (annhdf5.rs:204-213): after normalize, dot == cosine sim."""
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<float>")
    (row,) = df.select(l2_normalize_expr(F.col("a")).alias("n")).collect()
    assert row["n"] == pytest.approx([0.6, 0.8], rel=1e-6)
