"""Piece-group serving (r9 verdict #2a): co-probed cap-split pieces are
unioned into one mmap-cached sub-graph and served by a single beam
search (operators/search.py grouped_scan_search +
operators/shard_cache.py merge_tuples/get_or_merge). Contract:

- singleton groups are BIT-IDENTICAL to the per-shard cached scan (the
  grouped path is pure plumbing in that limit);
- the routing-derived grouping separates well-separated clusters and
  respects the max_pieces chunk cap;
- grouped auto-probed search preserves recall vs the exact oracle on a
  clustered corpus (the serving regime the grouping targets);
- the union is one cache entry, reused across batches, dropped by
  close() with the token tree."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_diskann_spark import IndexParams, build_index, open_index
from rust_diskann_spark.core import vamana
from rust_diskann_spark.operators import search as search_ops
from rust_diskann_spark.operators import shard_cache
from rust_diskann_spark.operators.exact import exact_knn


def _clustered_corpus(spark, n=600, dim=8, clusters=3, spread=0.05, seed=7):
    """Well-separated gaussian clusters — the regime where kmeans shards
    are cluster pieces and probe routing works."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim)) * 10
    rows = []
    for i in range(n):
        c = i % clusters
        v = centers[c] + rng.standard_normal(dim) * spread * 10
        rows.append((i, [round(float(x), 3) for x in v]))
    return spark.createDataFrame(rows, "id BIGINT, vec ARRAY<FLOAT>")


def _queries(corpus, every=50):
    return corpus.filter(F.col("id") % every == 0).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec")
    )


def _rows(df):
    return sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["id"]), round(r["dist"], 9))
        for r in df.collect()
    )


@pytest.fixture()
def kmeans_idx(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("RDS_SCAN_CACHE_DIR", str(tmp_path / "cache"))
    corpus = _clustered_corpus(spark)
    path = str(tmp_path / "idx")
    params = IndexParams(
        max_degree=16, build_beam_width=32, num_shards=6,
        shard_by="kmeans", seed=11,
    )
    build_index(corpus, path, params)
    idx = open_index(spark, path)
    yield idx, corpus
    idx.close()


def test_group_shards_by_routing_separates_clusters():
    rng = np.random.default_rng(0)
    routing = {}
    # 3 clusters x 2 pieces; each piece contributes a few routing points
    for c in range(3):
        center = np.zeros(4, dtype=np.float32)
        center[0] = c * 100.0
        for j in range(2):
            routing[c * 2 + j] = (
                center + rng.standard_normal((3, 4)).astype(np.float32)
            )
    groups = search_ops.group_shards_by_routing(routing, "l2", np.float32)
    assert sorted(map(sorted, groups.values())) == [[0, 1], [2, 3], [4, 5]]
    # chunk cap: max_pieces=1 degenerates to singletons
    singles = search_ops.group_shards_by_routing(
        routing, "l2", np.float32, max_pieces=1
    )
    assert sorted(map(list, singles.values())) == [[s] for s in range(6)]


def test_merge_tuples_singleton_is_identity():
    gids = np.arange(5, dtype=np.int64)
    mat = np.eye(5, 4, dtype=np.float32)
    g = vamana.Graph(
        np.full((5, 2), vamana.PAD, dtype=np.int32), np.zeros(5, np.int32)
    )
    tup = (gids, mat, g, 0, None, None, None)
    assert shard_cache.merge_tuples([tup], "l2") is tup
    assert shard_cache.merge_tuples([None, shard_cache.EMPTY], "l2") is None


def test_merge_tuples_union_relabels_and_seeds():
    def mk(gid0, n, medoid, width):
        gids = np.arange(gid0, gid0 + n, dtype=np.int64)
        mat = np.arange(n * 2, dtype=np.float32).reshape(n, 2) + gid0
        adj = np.full((n, width), vamana.PAD, dtype=np.int32)
        deg = np.zeros(n, np.int32)
        for i in range(n):  # ring graph, local ids
            adj[i, 0] = (i + 1) % n
            deg[i] = 1
        ent = np.array([n - 1], dtype=np.int64)
        sqn = vamana.sq_norms(mat)
        return (gids, mat, vamana.Graph(adj, deg), medoid, sqn, ent, None)

    a, b = mk(0, 3, 0, 2), mk(100, 4, 1, 3)
    gids, mat, g, medoid, sqn, ent, quant = shard_cache.merge_tuples(
        [a, b], "l2"
    )
    assert gids.tolist() == [0, 1, 2, 100, 101, 102, 103]
    assert mat.shape == (7, 2) and g.adj.shape == (7, 3)
    # block 2's local ids are offset by 3; PAD slots stay PAD
    assert g.adj[3, 0] == 4 and g.adj[6, 0] == 3
    assert g.adj[0, 1] == vamana.PAD
    assert medoid == 0  # block 0's medoid, offset 0
    # seeds: both medoids + both FPS entries, relabeled
    assert ent.tolist() == sorted({0, 2, 1 + 3, 3 + 3})
    np.testing.assert_allclose(sqn, vamana.sq_norms(mat))


def test_grouped_singleton_groups_bitwise_match_cached_scan(
    spark, kmeans_idx
):
    idx, corpus = kmeans_idx
    q = _queries(corpus)
    base = idx.search_with_dists(q, k=5, beam_width=32, mode="scan")
    n_shards = idx.meta.num_shards
    grouped = search_ops.grouped_scan_search(
        q, {i: [i] for i in range(n_shards)}, idx.path,
        idx._get_cache_token(), shard_cache.cache_root(), idx.params,
        k=5, beam_width=32,
    )
    assert _rows(grouped) == _rows(base)


def test_grouped_auto_probe_recall_and_cache_entry(spark, kmeans_idx):
    idx, corpus = kmeans_idx
    q = _queries(corpus)
    res = idx.search_with_dists(
        q, k=5, beam_width=32, mode="scan", shard_probes="auto",
        group_pieces=True,
    )
    got = res.select("query_id", "id")
    gt = exact_knn(
        q, corpus.select("id", "vec"), 5, "l2"
    ).select("query_id", "id")
    n_q = q.count()
    recall = got.join(gt, ["query_id", "id"]).count() / float(n_q * 5)
    assert recall >= 0.9, f"grouped probed recall {recall}"
    # union entries live under the index token; at least one group got
    # merged and cached (groups are derived, so count is data-dependent)
    token_dir = os.path.join(
        shard_cache.cache_root(), idx._get_cache_token()
    )
    group_dirs = [
        d for d in os.listdir(token_dir) if d.startswith("shard_g")
    ]
    assert group_dirs, "no union cache entries were materialized"
    # grouping is non-trivial on clustered data: fewer groups than shards
    assert len(idx._get_groups()) < idx.meta.num_shards
    # second batch reuses the entries (no new group dirs)
    idx.search_with_dists(
        q, k=5, beam_width=32, mode="scan", shard_probes="auto",
        group_pieces=True,
    ).count()
    assert sorted(
        d for d in os.listdir(token_dir) if d.startswith("shard_g")
    ) == sorted(group_dirs)
    # close() drops the whole token tree, unions included
    idx.close()
    assert not os.path.exists(token_dir)


def test_group_pieces_guards(spark, kmeans_idx):
    idx, corpus = kmeans_idx
    q = _queries(corpus)
    with pytest.raises(ValueError, match="group_pieces"):
        idx.search_with_dists(
            q, k=5, beam_width=32, mode="broadcast", group_pieces=True
        )
    with pytest.raises(ValueError, match="group_pieces"):
        idx.search_with_dists(
            q, k=5, beam_width=32, mode="cogroup", group_pieces=True
        )


def test_warm_grouped_materializes_unions(spark, kmeans_idx):
    idx, corpus = kmeans_idx
    idx.warm("grouped")
    token_dir = os.path.join(
        shard_cache.cache_root(), idx._get_cache_token()
    )
    group_dirs = {
        d for d in os.listdir(token_dir) if d.startswith("shard_g")
    }
    assert len(group_dirs) == len(idx._get_groups())
    # a subsequent grouped search reuses them (no new entries)
    q = _queries(corpus)
    idx.search_with_dists(
        q, k=5, beam_width=32, mode="scan", shard_probes="auto",
        group_pieces=True,
    ).count()
    assert {
        d for d in os.listdir(token_dir) if d.startswith("shard_g")
    } == group_dirs


def test_warm_rejects_unknown_mode(spark, kmeans_idx):
    idx, _ = kmeans_idx
    with pytest.raises(ValueError, match="grouped"):
        idx.warm("groupd")
