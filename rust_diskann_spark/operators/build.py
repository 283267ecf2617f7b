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

GRAPH_SCHEMA = (
    "shard INT, id BIGINT, neighbors ARRAY<BIGINT>, medoid BIGINT, "
    "entries ARRAY<BIGINT>"
)


def assign_shards(
    vectors: DataFrame, num_shards: int, shard_by: str = "hash",
    metric: str = "l2", seed: int = 42,
) -> DataFrame:
    """Deterministic shard assignment (reference A11).

    ``hash``: dense-id modulo — uniform shards, every shard samples the
    whole space (the README.md:157 equivalence regime).
    ``kmeans``: locality shards via seeded k-means cells (operators/ivf)
    — uneven but spatially coherent, enabling medoid-routed probing at
    search (``shard_probes``).
    """
    if shard_by == "hash":
        return vectors.withColumn(
            "shard", (F.col("id") % F.lit(num_shards)).cast("int")
        )
    if metric == "hamming":
        raise ValueError("kmeans sharding requires a float metric (l2/cosine/dot)")
    from rust_diskann_spark.functions.distance import numpy_distance_matrix
    from rust_diskann_spark.operators import ivf

    cents = ivf.kmeans_centroids(vectors, num_shards, metric=metric, iters=2, seed=seed)
    vec_type = vectors.schema["vec"].dataType.simpleString()

    def assign_fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["vec"].to_numpy())
            d = numpy_distance_matrix(metric, mat, cents)
            yield pd.DataFrame(
                {
                    "shard": d.argmin(axis=1).astype(np.int32),
                    "id": pdf["id"],
                    "vec": pdf["vec"],
                }
            )

    return vectors.select("id", "vec").mapInPandas(
        assign_fn, f"shard INT, id BIGINT, vec {vec_type}"
    )


def build_graph(vectors: DataFrame, params: IndexParams) -> DataFrame:
    """Vectors (id, vec[, shard]) -> graph (shard, id, neighbors, medoid).

    One shuffle (the shard repartition); the Vamana loop never crosses the
    executor boundary. Deterministic for a fixed ``params.seed``.
    """
    if "shard" not in vectors.columns:
        vectors = assign_shards(
            vectors, params.num_shards, params.shard_by, params.metric, params.seed
        )

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        dtype = np.int64 if params.metric == "hamming" else np.float32
        mat = np.asarray(pdf["vec"].tolist(), dtype=dtype)
        graph, medoid_local = vamana.build_vamana(
            mat, params, seed=params.seed + shard
        )
        # farthest-point search entry points (medoid first) — multi-entry
        # beam search keeps recall on clustered shards (see IndexParams)
        entries_local = vamana.select_entry_points(
            mat, params.metric, medoid_local, params.entry_points
        )
        gids = pdf["id"].to_numpy()  # local ordinal -> global id
        return pd.DataFrame(
            {
                "shard": shard,
                "id": gids,
                "neighbors": [gids[row].tolist() for row in graph.to_lists()],
                "medoid": int(gids[medoid_local]),
                "entries": [gids[entries_local].tolist()] * len(gids),
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
