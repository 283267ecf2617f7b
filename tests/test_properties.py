"""Property-based tests (hypothesis) for the kernel invariants the
reference guarantees structurally (SURVEY.md §5: the reference has no
property tests — this is our addition)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rust_diskann_spark.core import vamana
from rust_diskann_spark.functions.distance import numpy_distance, numpy_distance_matrix
from rust_diskann_spark.params import IndexParams

DIMS = st.integers(min_value=2, max_value=16)


def _mat(rng, n, d):
    return rng.standard_normal((n, d)).astype(np.float32)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 60), d=DIMS,
       max_degree=st.integers(1, 12), alpha=st.floats(1.0, 2.0))
def test_robust_prune_invariants(seed, n, d, max_degree, alpha):
    rng = np.random.default_rng(seed)
    vecs = _mat(rng, n, d)
    u = int(rng.integers(0, n))
    cand = rng.integers(0, n, size=min(3 * n, 80)).astype(np.int64)
    dists = numpy_distance("l2", vecs[u], vecs[cand])
    sqn = vamana.sq_norms(vecs)
    out = vamana.robust_prune(u, cand, dists, vecs, "l2", max_degree, alpha, sqnorms=sqn)
    out2 = vamana.robust_prune(u, cand, dists, vecs, "l2", max_degree, alpha, sqnorms=sqn)
    assert list(out) == list(out2)  # deterministic
    assert len(out) <= max_degree  # degree bound (lib.rs:1111-1132)
    assert u not in out  # no self loops (lib.rs:1224-1226)
    assert len(set(out.tolist())) == len(out)  # no duplicates
    assert set(out.tolist()) <= set(cand.tolist())  # subset of candidates
    # the single closest candidate (excluding self) is always selected first
    non_self = cand[cand != u]
    if len(non_self) and len(out):
        d_ns = numpy_distance("l2", vecs[u], vecs[non_self])
        order = np.lexsort((non_self, d_ns))
        assert out[0] == non_self[order[0]]


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 80), d=DIMS,
       beam=st.integers(1, 16))
def test_greedy_search_result_ordering(seed, n, d, beam):
    rng = np.random.default_rng(seed)
    vecs = _mat(rng, n, d)
    p = IndexParams(max_degree=4, build_beam_width=8, num_shards=1, seed=seed % 1000)
    graph, medoid = vamana.build_vamana(vecs, p, seed=seed % 1000)
    q = rng.standard_normal(d).astype(np.float32)
    ids, dists = vamana.beam_search(
        vecs, graph, "l2", medoid, q, k=min(5, n), beam_width=beam,
        sqnorms=vamana.sq_norms(vecs),
    )
    assert len(set(ids.tolist())) == len(ids)
    assert all(dists[i] <= dists[i + 1] + 1e-12 for i in range(len(dists) - 1))
    # returned dists are the true distances (reference test_medium_random)
    true = numpy_distance("l2", q, vecs[ids])
    assert np.allclose(dists, true, atol=1e-5)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 40))
def test_dedup_keep_best_matches_naive(seed, n):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, 10, size=n).astype(np.int64)
    dists = rng.random(n)
    got_i, got_d = vamana._dedup_keep_best(ids, dists)
    best = {}
    for i, d in zip(ids, dists):
        best[i] = min(best.get(i, np.inf), d)
    assert {int(i): float(d) for i, d in zip(got_i, got_d)} == {
        int(i): float(d) for i, d in best.items()
    }
    assert list(got_i) == sorted(got_i)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 30),
       m=st.integers(1, 10), d=DIMS,
       metric=st.sampled_from(["l2", "cosine", "dot"]))
def test_distance_matrix_matches_rowwise(seed, n, m, d, metric):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, d))
    b = rng.standard_normal((m, d))
    full = numpy_distance_matrix(metric, a, b)
    assert full.shape == (n, m)
    for j in range(m):
        assert np.allclose(full[:, j], numpy_distance(metric, b[j], a), atol=1e-9)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 50),
       max_degree=st.integers(1, 8))
def test_build_degree_bound_and_determinism(seed, n, max_degree):
    rng = np.random.default_rng(seed)
    vecs = _mat(rng, n, 8)
    p = IndexParams(
        max_degree=max_degree, build_beam_width=8, num_shards=1, seed=seed % 997
    )
    g1, m1 = vamana.build_vamana(vecs, p, seed=seed % 997)
    g2, m2 = vamana.build_vamana(vecs, p, seed=seed % 997)
    assert m1 == m2
    assert np.array_equal(g1.adj, g2.adj) and np.array_equal(g1.deg, g2.deg)
    assert (g1.deg <= max_degree).all()
    for u in range(n):
        nbrs = g1.neighbors(u)
        assert u not in nbrs
        assert len(set(nbrs.tolist())) == len(nbrs)
