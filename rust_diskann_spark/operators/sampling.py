"""Deterministic hash-based sampling — the reproducible sampling
primitive a training-data pipeline needs.

``F.rand()``/``df.sample()`` draw from per-partition RNG streams: the
surviving row set changes with partitioning, retries, and cluster layout,
which poisons cache keys, A/B comparisons, and incremental reruns at
100 TB. Hash sampling instead derives a bucket in [0, buckets) from
md5(key) — a pure Column expression (JVM codegen, no shuffle, no UDF) —
and keeps a row iff ``bucket < rate * buckets``. The same rows survive on
every run, on any cluster, in any engine that agrees on md5 (DuckDB
oracle-checkable: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``('0x' || substr(md5(x),1,15))::bigint`` — the same portability
contract functions/text.py's minhash uses).

No reference analog (the reference is a vector kernel; its only sampling
is the medoid's 8 random pivots, lib.rs:742-744) — this is a
beyond-reference pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): md5 of the key's string form,
    first 15 hex chars (60 bits — exact in a BIGINT) mod ``buckets``."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        % buckets
    )


def sql_hash_bucket(key: str, buckets: int = DEFAULT_BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket` (identical md5 hex, identical
    60-bit reduction)."""
    return f"(('0x' || substr(md5(cast({key} as varchar)), 1, 15))::bigint % {buckets})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, selected by
    ``hash_bucket(key) < rate * buckets``. Narrow (no shuffle); the filter
    pushes into the scan's codegen stage."""
    return df.filter(hash_bucket(F.col(key_col), buckets) < int(rate * buckets))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps rows whose
    bucket < rates[s] * buckets (``default_rate`` for unlisted strata).
    The rate table compiles to a CASE expression — still a narrow
    codegen'd filter, no join, no shuffle; rebalancing a 100 TB corpus
    (e.g. downsample boilerplate-heavy languages) is one scan.
    """
    thresh: Column = F.lit(int(default_rate * buckets))
    for value, r in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == value, int(r * buckets)).otherwise(
            thresh
        )
    return df.filter(hash_bucket(F.col(key_col), buckets) < thresh)
