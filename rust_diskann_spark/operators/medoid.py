"""Relational medoid estimation (reference B2, lib.rs:736-756).

The reference samples 8 pivots and takes the argmin of summed distances —
a parallel map-reduce. The Spark form is fully declarative:

1. pick pivots deterministically (the reference's ``thread_rng`` sample is
   replaced by a seeded/deterministic selection so the result is
   reproducible and oracle-checkable);
2. broadcast the pivots (8 rows) against the corpus — a broadcast
   nested-loop join, corpus scanned once, no shuffle;
3. global argmin via ``min_by(struct(id), struct(score, id))`` — a single
   all-to-one aggregation of one row per partition (map-side combined).

At 100 TB this is one corpus scan + a scalar reduce — the same asymptotics
as the reference's rayon fold (lib.rs:746-753).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_diskann_spark.functions.distance import distance_expr
from rust_diskann_spark.params import MEDOID_SAMPLE_K


def deterministic_pivots(corpus: DataFrame, n_pivots: int = MEDOID_SAMPLE_K) -> DataFrame:
    """Pivot selection: the ``n_pivots`` smallest ids. Deterministic stand-in
    for the reference's random sample (lib.rs:742-744) — any fixed pivot set
    yields a valid medoid estimate; determinism buys oracle checkability."""
    return corpus.orderBy("id").limit(n_pivots)


def medoid(corpus: DataFrame, metric: str = "l2", n_pivots: int = MEDOID_SAMPLE_K) -> DataFrame:
    """One-row DataFrame (medoid_id BIGINT, score DOUBLE): the corpus row
    minimizing summed distance to the pivots, ties to smallest id
    (lib.rs:150-163)."""
    pivots = deterministic_pivots(corpus, n_pivots).select(
        F.col("id").alias("pivot_id"), F.col("vec").alias("pivot_vec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(pivots))
        .select(
            "id",
            distance_expr(metric, F.col("vec"), F.col("pivot_vec")).alias("d"),
        )
        .groupBy("id")
        .agg(F.sum("d").alias("score"))
    )
    return scored.select(
        F.min_by(F.col("id"), F.struct(F.col("score"), F.col("id"))).alias("medoid_id"),
        F.min(F.struct(F.col("score"), F.col("id"))).getField("score").alias("score"),
    )
