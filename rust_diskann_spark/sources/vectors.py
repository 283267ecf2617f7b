"""Vector-collection ingest + validation (reference B1, FlatVectors).

The reference densifies ``Vec<Vec<T>>`` into a contiguous row-major buffer
and errors on ragged dims or empty input (lib.rs:176-199). Spark's
equivalent "table" is ``(id BIGINT, vec ARRAY<scalar>)`` Parquet — Parquet's
columnar layout plays FlatVectors' role. Ids are dense ``0..n-1`` to
reproduce reference id semantics (lib.rs:692).

Validation is declarative (one aggregate scan, Catalyst prunes to the
``vec`` column): scale note — at 100 TB this is a single map-side-combined
aggregation with a scalar result; no shuffle of the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load_vectors(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Read a Parquet vector table and normalize column names to (id, vec)."""
    df = spark.read.parquet(path)
    return df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("vec"))


def validate_vectors(df: DataFrame, dim: int | None = None) -> int:
    """Validate uniform dimension / non-empty (reference lib.rs:176-199).

    Returns the dimension. Raises ``ValueError`` on empty input, ragged
    dims, or mismatch against an expected ``dim`` — mirroring the
    reference's ingest errors (lib.rs:180-190) and query-time dim assert
    (lib.rs:636-641).
    """
    agg = df.agg(
        F.min(F.size("vec")).alias("dmin"),
        F.max(F.size("vec")).alias("dmax"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if agg["n"] == 0:
        raise ValueError("empty vector collection (reference lib.rs:177-179)")
    if agg["dmin"] != agg["dmax"]:
        raise ValueError(
            f"ragged vector dims [{agg['dmin']}, {agg['dmax']}] (reference lib.rs:180-190)"
        )
    if dim is not None and agg["dmin"] != dim:
        raise ValueError(f"dimension mismatch: expected {dim}, got {agg['dmin']}")
    return int(agg["dmin"])


def with_dense_ids(df: DataFrame, order_col: str) -> DataFrame:
    """Assign dense ids 0..n-1 by a deterministic order (reference ids are
    positional, lib.rs:692; ``monotonically_increasing_id`` is non-dense so
    we use a window rank).

    Scale note: a global ``row_number`` over one window is a single-reducer
    sort. For 100 TB ingest prefer ``zipWithIndex``-style two-phase
    (per-partition counts + offsets); this helper is for collections whose
    source ids are absent — the driver's fixtures already carry dense ids.
    """
    w = Window.orderBy(F.col(order_col))
    return df.withColumn("id", F.row_number().over(w).cast("long") - 1)
