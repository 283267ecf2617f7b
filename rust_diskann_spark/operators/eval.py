"""Recall / quality evaluation operators (reference E2, E5-E8).

These are the reference's benchmark-harness computations re-expressed as
declarative aggregations — every one is a join + conditional aggregate,
fully Catalyst-optimized and DuckDB-oracle-checkable.

Inputs follow the ann-benchmarks ground-truth layout (reference
examples/utils/annhdf5.rs:10-34):

- ``results``: (query_id, rank, id, dist) — engine output (exact or ANN);
- ``gt``: (query_id, neighbor_ids ARRAY<BIGINT>, dists ARRAY<FLOAT>) —
  exact top-k ids and distances, sorted by (dist, id).

Scale notes: all joins here key on query_id with one row per query on the
gt side — broadcast-able up to millions of queries; aggregations are
map-side combined scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def threshold_recall_at_k(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """Threshold recall@k (reference E5, examples/diskann_sift.rs:59-99):
    fraction of returned neighbors whose distance is <= the ground-truth
    k-th distance (ties at the boundary count as hits). One row:
    (recall DOUBLE)."""
    gtk = gt.select(
        "query_id", F.element_at("dists", k).cast("double").alias("gt_kth")
    )
    hits = (
        results.filter(F.col("rank") <= k)
        .join(F.broadcast(gtk), "query_id")
        .agg(
            (
                F.sum(F.when(F.col("dist") <= F.col("gt_kth") + 1e-6, 1).otherwise(0))
                / (F.countDistinct("query_id") * F.lit(k))
            ).alias("recall")
        )
    )
    return hits


def id_recall_at_k(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """ID-recall@k (reference E6, examples/diskann_skewed.rs:167-172):
    |returned ids ∩ gt top-k ids| / k, averaged over queries. One row:
    (id_recall DOUBLE)."""
    returned = (
        results.filter(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(F.collect_list("id").alias("returned_ids"))
    )
    gtk = gt.select("query_id", F.slice("neighbor_ids", 1, k).alias("gt_ids"))
    return (
        returned.join(F.broadcast(gtk), "query_id")
        .select(
            (
                F.size(F.array_intersect("returned_ids", "gt_ids")) / F.lit(k)
            ).alias("q_recall")
        )
        .agg(F.avg("q_recall").alias("id_recall"))
    )


def last_distance_ratio(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """Last-distance ratio (reference E7, diskann_sift.rs:74-86):
    mean over queries of (k-th returned distance / gt k-th distance).
    One row: (last_ratio DOUBLE)."""
    last = results.filter(F.col("rank") == k).select(
        "query_id", F.col("dist").alias("last_dist")
    )
    gtk = gt.select(
        "query_id", F.element_at("dists", k).cast("double").alias("gt_kth")
    )
    return (
        last.join(F.broadcast(gtk), "query_id")
        .select(
            F.when(F.col("gt_kth") > 0, F.col("last_dist") / F.col("gt_kth"))
            .otherwise(F.lit(1.0))
            .alias("ratio")
        )
        .agg(F.avg("ratio").alias("last_ratio"))
    )


def ground_truth_from_exact(exact_results: DataFrame, k: int) -> DataFrame:
    """Build the gt table (F6 layout) from exact kNN output: collect the
    top-k (id, dist) per query into aligned arrays sorted by (dist, id)."""
    return (
        exact_results.filter(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "id", "dist"))
            ).alias("packed")
        )
        .select(
            "query_id",
            F.transform("packed", lambda s: s.getField("id")).alias("neighbor_ids"),
            F.transform("packed", lambda s: s.getField("dist")).alias("dists"),
        )
    )
