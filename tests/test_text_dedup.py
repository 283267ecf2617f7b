"""Text-function and dedup-operator properties (the DuckDB contract
checker cross-checks values; these tests pin the *semantics*)."""

import pytest
from pyspark.sql import functions as F

from rust_diskann_spark.functions import text as TX
from rust_diskann_spark.operators import dedup as DD

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup (1 token)
    (3, "a completely different sentence about spark engines"),
    (4, "der schnelle braune fuchs springt und ist nicht hier"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING").persist()


def test_exact_duplicates(docs):
    res = {r["doc_id"]: r for r in DD.exact_duplicates(docs).collect()}
    assert res[0]["canonical_id"] == 0 and not res[0]["is_duplicate"]
    assert res[1]["canonical_id"] == 0 and res[1]["is_duplicate"]
    assert not res[2]["is_duplicate"]
    assert res[0]["content_hash"] == res[1]["content_hash"]


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["signature"] for r in DD.minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == TX.MINHASH_PERMS
    assert sigs[0] != sigs[3]
    assert 5 not in sigs  # too few tokens -> filtered


def test_minhash_near_dup_similarity_ordering(docs):
    sigs = {r["doc_id"]: r["signature"] for r in DD.minhash_signatures(docs).collect()}

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / TX.MINHASH_PERMS

    assert est(0, 2) > est(0, 3)  # near dup more similar than unrelated


def test_lsh_pairs_find_planted_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in DD.minhash_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide in every band


def test_minhash_near_duplicates_verified(docs):
    rows = DD.minhash_near_duplicates(docs, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got[(0, 1)] == 1.0


def test_minhash_verify_hashed_shingles_exact_jaccard(docs):
    """r11 verify internals: shingles are xxhash64-int64 and built ONCE
    over the union of both candidate sides behind a candidate-id
    semi-join. The jaccard must still equal the exact string-shingle
    jaccard for every explicitly passed candidate pair (threshold=0.0
    keeps non-dup pairs, exercising n_inter=0 and the shared-doc case:
    doc 0 appears on the a-side of two pairs)."""
    cands = docs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (2, 3)], "doc_a LONG, doc_b LONG"
    )
    rows = DD.minhash_near_duplicates(
        docs, threshold=0.0, candidates=cands
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    texts = dict(DOCS)

    def shingles(t):
        toks = [w for w in t.lower().split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    assert set(got) == {(0, 1), (0, 2), (2, 3)}
    for (a, b), j in got.items():
        sa, sb = shingles(texts[a]), shingles(texts[b])
        exp = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert abs(j - exp) < 1e-9, (a, b, j, exp)


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in DD.simhash_signatures(docs).collect()}
    assert sh[0] == sh[1]
    assert all(0 <= v < (1 << TX.SIMHASH_BITS) for v in sh.values())
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far


def test_simhash_near_duplicates(docs):
    rows = DD.simhash_near_duplicates(docs, max_hamming=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert pairs[(0, 1)] == 0


def test_ngram_jaccard_exact(docs):
    rows = DD.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got[(0, 1)] == 1.0
    # docs 0 and 2 share 9 tokens with one substitution: 7 trigrams each,
    # 4 shared -> jaccard 4/10
    assert abs(got[(0, 2)] - 0.4) < 1e-9


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha")], "doc_id LONG, text STRING"
    )
    fps = [
        r["fp"]
        for r in df.select(
            TX.fingerprint_expr(TX.tokens_expr(F.col("text"))).alias("fp")
        ).collect()
    ]
    assert fps[0] != fps[1]


def test_lang_id_heuristic(docs):
    langs = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", TX.lang_id_expr(F.col("text")).alias("lang")
        ).collect()
    }
    assert langs[0] == "en"
    assert langs[4] == "de"
    assert langs[5] == "unknown"


def test_embedding_near_dup_block_matmul_matches_planted(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(1000 + i, rows[i][1]) for i in range(0, 200, 20)]  # planted twins
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_duplicates(emb, 0.99, n_blocks=4).collect()
    }
    assert {(i, 1000 + i) for i in range(0, 200, 20)} <= got
    # random 16-d gaussians essentially never hit cos >= .99
    assert len(got) == 10


def test_embedding_lsh_hot_bucket_blocked_pairs(spark):
    """r5 verdict item #3: a degenerate bucket (all vectors in one LSH
    bucket — here scaled copies of one direction, which share the sign
    pattern in EVERY table) must flow through the blocked pair expansion,
    emitting every C(n,2) pair exactly once rather than B^2/2 rows inside
    one join partition. Exact count proves no block-boundary pair is
    dropped or duplicated; n=700 > _PAIR_BLOCK=512 forces a real split."""
    import numpy as np

    rng = np.random.default_rng(7)
    d = rng.standard_normal(16)
    n = 700
    rows = [
        (i, [float(x) for x in (d * (1.0 + 0.001 * i))]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = DD.embedding_near_duplicates_lsh(emb, threshold=0.999).collect()
    assert len(got) == n * (n - 1) // 2
    assert all(r["id_a"] < r["id_b"] for r in got)
    assert all(r["cosine_sim"] >= 0.999 for r in got)


def test_blocked_bucket_pairs_hot_bucket_bounded(spark):
    """_blocked_bucket_pairs on a planted ~2k-member hot bucket: with
    block=256 the 2000-member bucket splits into 8 positional blocks ->
    36 block-pair tasks of <=256^2 pairs each (bounded), and the union of
    their outputs is exactly C(2000,2) distinct ordered pairs."""
    n = 2000
    buckets = spark.createDataFrame(
        [(0, 0, list(range(n)))], "table_id INT, bucket INT, ids ARRAY<BIGINT>"
    ).select("ids")
    pairs = DD._blocked_bucket_pairs(buckets, with_simhash=False, block=256)
    assert pairs.count() == n * (n - 1) // 2


def test_embedding_exact_block_cap_and_distributed_pairs(spark):
    """r5 verdict item #4: past _MAX_EXACT_BLOCKS the exact variant must
    refuse with a pointer at the LSH path; below it, the block-pair table
    is generated executor-side — n_blocks=1024 (524,800 pair rows, a size
    a driver-side python list would make painfully visible) still returns
    the planted twins."""
    import numpy as np

    with pytest.raises(ValueError, match="embedding_near_duplicates_lsh"):
        DD.embedding_near_duplicates(
            spark.createDataFrame(
                [(0, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
            ),
            n_blocks=DD._MAX_EXACT_BLOCKS + 1,
        )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows += [(1000 + i, rows[i][1]) for i in range(0, 50, 10)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_duplicates(emb, 0.99, n_blocks=1024).collect()
    }
    assert {(i, 1000 + i) for i in range(0, 50, 10)} <= got


def test_dedup_components_chain_and_isolated_pair(spark):
    """a-b, b-c chain collapses to one cluster labeled min(id); a separate
    pair keeps its own min label; every paired doc gets exactly one row."""
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (7, 40)], "doc_a LONG, doc_b LONG"
    )
    out = {
        r["doc_id"]: r["cluster_rep"]
        for r in DD.dedup_components(pairs).collect()
    }
    assert out == {10: 10, 20: 10, 30: 10, 7: 7, 40: 7}


def test_dedup_components_on_minhash_pairs(docs):
    """The planted exact/near dups (docs 0,1,2) form one component with
    rep 0 when fed exact n-gram pairs at threshold 0.3 (doc 2 differs
    from 0/1 by one token of nine -> trigram J = 4/10 = 0.4, below LSH's
    reliable-collision range but above the exact verifier's cut)."""
    pairs = DD.ngram_jaccard_pairs(docs, 0.3)
    out = {
        r["doc_id"]: r["cluster_rep"]
        for r in DD.dedup_components(pairs).collect()
    }
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert 3 not in out and 5 not in out  # unpaired docs are absent


def test_stratified_hash_sample_deterministic_and_bounded(spark):
    from rust_diskann_spark.operators import sampling as SMP

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    s1 = SMP.stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    s2 = SMP.stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5, "de": 0.1})
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())  # deterministic
    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    # md5 buckets are uniform: expect ~500 en, ~100 de (binomial, wide margin)
    assert 400 < by_lang["en"] < 600
    assert 50 < by_lang["de"] < 160
    # unlisted strata default to rate 0.0 -> dropped
    s3 = SMP.stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5})
    assert s3.filter(F.col("lang") == "de").count() == 0


def test_dedup_components_no_spurious_warning_at_fixpoint(spark):
    """r3 ADVICE: exhausting max_iters does not itself prove
    non-convergence — the fused init round may already be the fixpoint
    (max_iters=1), and a run whose last allowed round reached it must not
    warn either; a genuinely split long chain still must."""
    import warnings

    star = spark.createDataFrame([(1, 2), (1, 3)], "doc_a LONG, doc_b LONG")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # any warn -> fail
        out = DD.dedup_components(star, max_iters=1)
        assert {(r["doc_id"], r["cluster_rep"]) for r in out.collect()} == {
            (1, 1), (2, 1), (3, 1)
        }
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a LONG, doc_b LONG"
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        DD.dedup_components(chain, max_iters=1).collect()
        assert any("did not converge" in str(w.message) for w in rec)
