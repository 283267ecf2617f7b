"""Brute-force exact kNN — the correctness oracle (reference D5).

Ground-truth semantics of ann-benchmarks' ``neighbors``/``distances``
(reference examples/utils/annhdf5.rs:10-13): for every query, all corpus
distances, ranked (dist asc, id asc — Candidate ordering lib.rs:150-163),
truncated to k.

Plan shape (and why it scales):
- queries x corpus is a **broadcast nested-loop join**: the query side is
  broadcast (queries are invariably the small side — 10k queries of 128-d
  f32 is ~5 MB), so the corpus is scanned once, partition-parallel, with
  zero shuffle of corpus rows.
- the distance fold is a codegen'd higher-order function — no Python in
  the hot path.
- top-k per query uses a window rank; Spark's WindowGroupLimit rewrite
  (verified in the executed plan) inserts a PARTIAL group-limit before
  the exchange, so the shuffle carries O(q * k * partitions) surviving
  triples, not the full O(q * n) score matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rust_diskann_spark.functions.distance import (
    cosine_expr_with_norms,
    distance_expr,
    norm_expr,
)

# query-side row count above which the broadcast hint is withheld —
# mirroring autoBroadcastJoinThreshold's job for the hint we would
# otherwise force. 50k 128-d f64 queries is ~50 MB per executor; a
# million-query batch would OOM the broadcast long before the scan
# breaks. Counted with a bounded `limit(cap+1).count()` probe rather
# than Catalyst's size estimate, which prices computed array columns at
# pointer width (measured: 12 B/row for a 64-d array projection).
# Past the threshold the hint is dropped and Spark builds on whichever
# side its own stats call smaller (the corpus, for a small corpus; a
# partitioned cartesian product when both sides are big).
MAX_BROADCAST_QUERIES = 50_000


def _fits_broadcast(q: DataFrame) -> bool:
    return q.limit(MAX_BROADCAST_QUERIES + 1).count() <= MAX_BROADCAST_QUERIES


def exact_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "l2",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
    id_col: str = "id",
    vec_col: str = "vec",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Exact top-k per query -> (query_id, rank, id, dist).

    ``rank`` is 1-based, ordered (dist asc, id asc) — deterministic and
    oracle-checkable. ``broadcast_queries``: None = probe the query side's
    row count (bounded, :data:`MAX_BROADCAST_QUERIES`); pass an explicit
    bool to skip the probe job.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec"))
    if broadcast_queries is None:
        broadcast_queries = _fits_broadcast(q)
    if metric == "cosine":
        # hoist the norm folds to one per ROW (vs one per pair inlined in
        # distance_expr) — identical arithmetic, ~3x fewer folds
        q = q.withColumn("__qnorm", norm_expr(F.col("__qvec")))
        c = c.withColumn("__cnorm", norm_expr(F.col("__vec")))
        dist = cosine_expr_with_norms(
            F.col("__qvec"), F.col("__vec"), F.col("__qnorm"), F.col("__cnorm")
        )
    else:
        dist = distance_expr(metric, F.col("__qvec"), F.col("__vec"))
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = c.crossJoin(q_side).select("query_id", "id", dist.alias("dist"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "dist")
    )


def rescore(
    results: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    metric: str = "l2",
) -> DataFrame:
    """Exact re-scoring of returned ids (reference E9,
    examples/diskann_sift.rs:44-52): join results back to the corpus and
    recompute the true distance. Point lookups ride a broadcast hash join
    on the (small) result set."""
    q = queries.select(F.col("query_id"), F.col("qvec").alias("__qvec"))
    c = corpus.select(F.col("id"), F.col("vec").alias("__vec"))
    return (
        results.join(c, "id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "id",
            distance_expr(metric, F.col("__qvec"), F.col("__vec")).alias("true_dist"),
        )
    )


def get_vector(corpus: DataFrame, idx: int, id_col: str = "id") -> DataFrame:
    """Point lookup by id (reference A9 ``get_vector``, lib.rs:724-732).
    A filter on the id column — Parquet row-group stats prune the scan."""
    return corpus.filter(F.col(id_col) == idx)
