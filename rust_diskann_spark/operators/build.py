"""Distributed Vamana graph build (reference A1/A11 + B3-B10).

Design — shard-and-merge (reference README.md:157 documents this pattern as
exactly equivalent to a single index when per-shard k' >= k at search):

1. hash-assign every vector to one of ``num_shards`` shards (``id %
   num_shards`` — deterministic, uniform; ids are dense so no skew);
2. ``repartition("shard")`` then ``applyInPandas`` per shard: each task
   materializes its shard's vectors as one numpy matrix and runs the full
   sequential Vamana kernel (core/vamana.py) with seed ``seed + shard`` —
   executor-local, zero cross-shard communication;
3. each task emits ``(shard, id, neighbors[], medoid)`` rows — adjacency
   stores *global* ids, so the graph table is self-describing.

Scale math (reference README.md:139): a shard of n_s vectors costs
``n_s * (4*dim + 4*max_degree)`` bytes in task memory. For 100 TB of 128-d
f32 (~190 B/row with the graph) pick num_shards so n_s stays ~5-20 M rows
(~2-10 GiB/task); the build is then embarrassingly parallel across
executors, bounded by the slowest shard — exactly the reference's
per-chunk rayon fan-out writ large.

Why not a relational build? Vamana's frontier expansion is sequentially
dependent (each chunk's pruning reads the graph state the previous chunk
wrote — lib.rs:1028-1107); expressing each of the ~n/256 rounds as a Spark
join would mean thousands of shuffles of the full edge set. The pandas-UDF
shard kernel does O(1) shuffles total (the repartition).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rust_diskann_spark.core import vamana
from rust_diskann_spark.params import IndexParams

GRAPH_SCHEMA = "shard INT, id BIGINT, neighbors ARRAY<BIGINT>, medoid BIGINT"


def assign_shards(vectors: DataFrame, num_shards: int) -> DataFrame:
    """Deterministic shard assignment on the dense id (reference A11)."""
    return vectors.withColumn(
        "shard", (F.col("id") % F.lit(num_shards)).cast("int")
    )


def build_graph(vectors: DataFrame, params: IndexParams) -> DataFrame:
    """Vectors (id, vec[, shard]) -> graph (shard, id, neighbors, medoid).

    One shuffle (the shard repartition); the Vamana loop never crosses the
    executor boundary. Deterministic for a fixed ``params.seed``.
    """
    if "shard" not in vectors.columns:
        vectors = assign_shards(vectors, params.num_shards)

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        dtype = np.int64 if params.metric == "hamming" else np.float32
        mat = np.asarray(pdf["vec"].tolist(), dtype=dtype)
        graph, medoid_local = vamana.build_vamana(
            mat, params, seed=params.seed + shard
        )
        gids = pdf["id"].to_numpy()  # local ordinal -> global id
        return pd.DataFrame(
            {
                "shard": shard,
                "id": gids,
                "neighbors": [gids[row].tolist() for row in graph.to_lists()],
                "medoid": int(gids[medoid_local]),
            }
        )

    return (
        vectors.repartition(params.num_shards, "shard")
        .groupBy("shard")
        .applyInPandas(build_shard, schema=GRAPH_SCHEMA)
    )


def degree_invariant_violations(graph: DataFrame, max_degree: int) -> int:
    """Count nodes exceeding the degree bound — must be 0 (reference final
    sweep invariant, lib.rs:1111-1132)."""
    return graph.filter(F.size("neighbors") > max_degree).count()
