"""Scan-mode mmap shard cache (operators/shard_cache.py): the cached
path must be bit-identical to broadcast and legacy scan search, self-heal
from the index parquet on cache loss, and release its disk footprint on
close()."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rust_diskann_spark import IndexParams, build_index, open_index
from rust_diskann_spark.operators import shard_cache


def _corpus(spark, n=400, dim=8, seed=3):
    return spark.range(n).select(
        F.col("id"),
        F.array(
            *[F.round(F.randn(seed=seed + i) * 10, 3) for i in range(dim)]
        ).cast("array<float>").alias("vec"),
    )


def _queries(spark, corpus, every=40):
    return corpus.filter(F.col("id") % every == 0).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )


def _rows(df):
    return sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["id"]), round(r["dist"], 9))
        for r in df.collect()
    )


@pytest.fixture()
def idx_path(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("RDS_SCAN_CACHE_DIR", str(tmp_path / "cache"))
    path = str(tmp_path / "idx")
    base = _corpus(spark)
    build_index(
        base, path,
        IndexParams(max_degree=8, build_beam_width=16, num_shards=4,
                    seed=11, shard_by="kmeans"),
    )
    return path


def test_cached_scan_matches_broadcast_and_legacy(spark, idx_path,
                                                  monkeypatch):
    q = _queries(spark, _corpus(spark))
    idx = open_index(spark, idx_path)
    res_bc = _rows(idx.search_with_dists(q, k=5, beam_width=32,
                                         mode="broadcast"))
    res_cached = _rows(idx.search_with_dists(q, k=5, beam_width=32,
                                             mode="scan"))
    assert idx._skeleton is not None  # cached path was taken
    assert idx._scan_side is None  # no JVM-persisted corpus
    monkeypatch.setenv("RDS_SCAN_CACHE", "0")
    res_legacy = _rows(idx.search_with_dists(q, k=5, beam_width=32,
                                             mode="scan"))
    assert idx._scan_side is not None  # legacy path was taken
    assert res_cached == res_bc == res_legacy
    idx.close()


def test_cached_scan_plan_ships_no_corpus(spark, idx_path):
    """The cached plan's corpus side is the shard-id skeleton: the index
    parquet must not appear in the scan-mode physical plan (workers read
    it directly, outside Spark's scan operators)."""
    q = _queries(spark, _corpus(spark))
    idx = open_index(spark, idx_path)
    plan = idx.search_with_dists(
        q, k=5, beam_width=32, mode="scan"
    )._jdf.queryExecution().executedPlan().toString()
    assert "vectors.parquet" not in plan
    assert "graph.parquet" not in plan
    idx.close()


def test_cached_probed_matches_legacy_probed(spark, idx_path, monkeypatch):
    q = _queries(spark, _corpus(spark))
    idx = open_index(spark, idx_path)
    for probes in (2, "auto"):
        got_cached = _rows(idx.search_with_dists(
            q, k=5, beam_width=32, shard_probes=probes, mode="scan"
        ))
        monkeypatch.setenv("RDS_SCAN_CACHE", "0")
        idx_legacy = open_index(spark, idx_path)
        got_legacy = _rows(idx_legacy.search_with_dists(
            q, k=5, beam_width=32, shard_probes=probes, mode="scan"
        ))
        idx_legacy.close()
        monkeypatch.delenv("RDS_SCAN_CACHE")
        assert got_cached == got_legacy
    idx.close()


def test_cache_miss_self_heals_from_parquet(spark, idx_path):
    """Deleting the cache tree mid-session (node restart, tmp cleanup)
    must re-decode from the index parquet with identical results."""
    q = _queries(spark, _corpus(spark))
    idx = open_index(spark, idx_path)
    before = _rows(idx.search_with_dists(q, k=5, beam_width=32, mode="scan"))
    token_dir = os.path.join(
        shard_cache.cache_root(), idx._get_cache_token()
    )
    assert os.path.isdir(token_dir)
    shutil.rmtree(token_dir)
    after = _rows(idx.search_with_dists(q, k=5, beam_width=32, mode="scan"))
    assert before == after
    idx.close()


def test_warm_scan_populates_cache_and_close_drops_it(spark, idx_path):
    idx = open_index(spark, idx_path)
    idx.warm("scan")
    token_dir = os.path.join(
        shard_cache.cache_root(), idx._get_cache_token()
    )
    # one entry per shard, each a completed (renamed) directory
    shard_dirs = [d for d in os.listdir(token_dir) if d.startswith("shard_")]
    assert len(shard_dirs) == idx.meta.num_shards
    assert not any(".tmp." in d for d in shard_dirs)
    # routing collected by the same warm job
    assert set(idx._scan_routing) == set(range(idx.meta.num_shards))
    idx.close()
    assert not os.path.exists(token_dir)
    # handle stays usable after close: caches rebuild on next use
    q = _queries(spark, _corpus(spark))
    assert len(_rows(idx.search_with_dists(q, k=5, beam_width=32,
                                           mode="scan"))) > 0
    idx.close()


def test_over_budget_broadcast_rides_mmap_source(spark, idx_path):
    """Explicit broadcast mode on an over-budget file-backed index must
    serve from the mmap shard map (one page-cache copy per node) instead
    of a real per-worker broadcast, with identical rows."""
    from rust_diskann_spark.plans import index as plans_index

    q = _queries(spark, _corpus(spark))
    idx_ref = open_index(spark, idx_path)
    expected = _rows(idx_ref.search_with_dists(q, k=5, beam_width=32,
                                               mode="broadcast"))
    assert not isinstance(idx_ref._shards_bc, shard_cache.MmapShardSource)
    idx_ref.close()

    # probed expectation from a REAL broadcast handle with the same
    # shard_probes: a routing regression specific to the mmap shard map
    # that preserved cardinality would pass a rows-count check (r8 ADVICE)
    idx_ref = open_index(spark, idx_path)
    expected_auto = _rows(idx_ref.search_with_dists(
        q, k=5, beam_width=32, shard_probes="auto", mode="broadcast"
    ))
    assert not isinstance(idx_ref._shards_bc, shard_cache.MmapShardSource)
    idx_ref.close()

    spark.conf.set(plans_index.BROADCAST_THRESHOLD_CONF, "1k")
    try:
        idx = open_index(spark, idx_path)
        for probes, want in ((None, expected), ("auto", expected_auto)):
            got = _rows(idx.search_with_dists(
                q, k=5, beam_width=32, shard_probes=probes, mode="broadcast"
            ))
            assert got == want
        assert isinstance(idx._shards_bc, shard_cache.MmapShardSource)
        idx.close()
        assert idx._shards_bc is None
    finally:
        spark.conf.unset(plans_index.BROADCAST_THRESHOLD_CONF)


def test_feasible_over_budget_broadcast_stays_real(spark, idx_path,
                                                   monkeypatch):
    """Explicit broadcast mode past the AUTO budget but within memory
    feasibility must use a REAL broadcast, not the mmap shard map: the
    per-worker anonymous copies run 1.45-1.6x the 4 KiB file-backed mmap
    on gather-bound search (r9, scale_runs_r9/1m_resid_real.log). Only
    true infeasibility (workers x bytes vs executor memory) or an
    explicit operator conf downgrades an explicit broadcast request."""
    from rust_diskann_spark.plans import index as plans_index

    monkeypatch.setattr(plans_index, "BROADCAST_INDEX_THRESHOLD", 1)
    q = _queries(spark, _corpus(spark))
    idx = open_index(spark, idx_path)
    assert not idx._fits_broadcast()
    assert idx._broadcast_feasible()
    rows = _rows(idx.search_with_dists(q, k=5, beam_width=32,
                                       mode="broadcast"))
    assert len(rows) > 0
    assert not isinstance(idx._shards_bc, shard_cache.MmapShardSource)
    idx.close()


def test_cold_get_or_decode_returns_mmap(spark, idx_path):
    """A cache MISS must populate and then serve the mmap-backed tuple,
    not the in-memory decode: load_shard_map memoizes whatever this
    returns, and an in-memory copy would be pinned per worker process —
    the multiplier the cache exists to remove (r8 ADVICE, medium)."""
    import numpy as np

    idx = open_index(spark, idx_path)
    token = idx._get_cache_token()
    root = shard_cache.cache_root()
    shutil.rmtree(os.path.join(root, token), ignore_errors=True)
    tup = shard_cache.get_or_decode(root, token, 0, idx_path, "l2")
    assert tup is not shard_cache.EMPTY
    mat = tup[1]
    assert isinstance(mat, np.memmap), type(mat)
    # and the warm-path hit stays mmap too
    again = shard_cache.get_or_decode(root, token, 0, idx_path, "l2")
    assert isinstance(again[1], np.memmap)
    idx.close()


def test_token_changes_when_parquet_replaced_without_metadata(
    spark, idx_path
):
    """In-place vectors/graph replacement that leaves metadata.json
    untouched must still invalidate the cache token (r8 ADVICE: a token
    keyed on metadata alone served stale shards silently)."""
    before = shard_cache.index_token(idx_path)
    vdir = os.path.join(idx_path, "vectors.parquet")
    victim = next(
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(vdir)
        for f in fns
        if f.endswith(".parquet")
    )
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert shard_cache.index_token(idx_path) != before


def test_cached_scan_hamming_roundtrip(spark, tmp_path, monkeypatch):
    """Hamming vectors are int64 words; the cache and routing must keep
    them integral end-to-end (a float64 trip corrupts words >= 2^53)."""
    monkeypatch.setenv("RDS_SCAN_CACHE_DIR", str(tmp_path / "hcache"))
    big = (1 << 62) + 12345  # survives only integer round trips
    base = spark.range(64).select(
        F.col("id"),
        F.array(
            (F.lit(big) + F.col("id")).cast("long"),
            F.xxhash64(F.col("id")),
        ).alias("vec"),
    )
    path = str(tmp_path / "hidx")
    build_index(
        base, path,
        IndexParams(max_degree=6, build_beam_width=12, num_shards=2,
                    metric="hamming", seed=5, shard_by="hash"),
    )
    idx = open_index(spark, path)
    q = base.limit(4).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )
    res_scan = _rows(idx.search_with_dists(q, k=3, beam_width=16,
                                           mode="scan"))
    res_bc = _rows(idx.search_with_dists(q, k=3, beam_width=16,
                                         mode="broadcast"))
    assert res_scan == res_bc
    # every query's own vector is its 0-distance top hit
    top = {(r[0], r[1]): (r[2], r[3]) for r in res_scan}
    for qid in (0, 1, 2, 3):
        assert top[(qid, 1)] == (qid, 0.0)
    res_probed = _rows(idx.search_with_dists(
        q, k=3, beam_width=16, shard_probes=2, mode="scan"
    ))
    assert res_probed == res_scan  # p == num_shards -> scan-all
    idx.close()
