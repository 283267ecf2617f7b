"""Text-analysis primitives for training-data pipelines.

Beyond the reference's scope (it is a vector kernel), but first-class in
this engine: tokenization, portable hashing, shingling, MinHash, SimHash,
language-ID heuristics, quality scoring, and document fingerprints — the
operators a 100 TB text-corpus pipeline needs.

Every primitive here exists **twice from one source of constants**:

- ``*_expr``  -> a Spark Column (built-ins only — JVM-side, codegen'd;
  no Python in the hot path);
- ``sql_*``   -> the equivalent DuckDB SQL fragment, so the driver's
  oracle runs the *same function* independently.

Portability contract: hashing is md5-based (identical lowercase hex in
both engines) reduced into int64 ranges that cannot overflow in either
engine's bigint arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: token hashes and permutation arithmetic stay
# < 2^62, inside int64 for both Spark and DuckDB.
HASH_P = 2_147_483_647
# fingerprint fold modulus (fits acc*131 + h in int64)
FP_MOD = 1_000_000_007
FP_MULT = 131

MINHASH_PERMS = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
# 60-bit SimHash from two 30-bit md5 halves: wide enough that banded
# chunks (60/4 = 15 bits) collide at ~2^-15, keeping candidate sets
# near-linear; 16 bits collided at 1/16 per chunk — quadratic blowup
SIMHASH_BITS = 60
SIMHASH_HALF = 30

# deterministic LCG-style permutation coefficients (a != 0)
MINHASH_A = [(1103515245 * (i + 1) + 12345) % HASH_P or 1 for i in range(MINHASH_PERMS)]
MINHASH_B = [(2654435761 * (i + 1) + 1013904223) % HASH_P for i in range(MINHASH_PERMS)]

# tiny embedded stopword sets for the language-ID heuristic; the fixture
# corpus is synthetic, so the value of this operator is its *portability*
# (Spark and DuckDB agree token-for-token), not linguistic accuracy.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "por"],
}
ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]

# word-piece pattern for the BPE-ish token count (letters / digits / other)
PIECE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def tokens_expr(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")


def sql_tokens(text: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({text}), '\\s+'), t -> t != '')"


def token_hash_expr(token: Column) -> Column:
    """Portable 60-bit token hash reduced mod HASH_P: first 15 hex chars of
    md5, identical in Spark (conv) and DuckDB (hex cast)."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long") % HASH_P


def sql_token_hash(token: str) -> str:
    return f"(('0x' || substr(md5({token}), 1, 15))::bigint % {HASH_P})"


def token_hashes_expr(tokens: Column) -> Column:
    return F.transform(tokens, token_hash_expr)


def sql_token_hashes(tokens: str) -> str:
    return f"list_transform({tokens}, t -> {sql_token_hash('t')})"


# ---------------------------------------------------------------------------
# shingles / n-grams
# ---------------------------------------------------------------------------


def word_ngrams_expr(tokens: Column, n: int) -> Column:
    """Word n-grams joined by a single space; empty array when the document
    has fewer than n tokens (guarded: ``sequence(1, 0)`` would otherwise
    produce a DESCENDING [1, 0] and poison the slice)."""
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))


def sql_word_ngrams(tokens: str, n: int) -> str:
    parts = " || ' ' || ".join(f"({tokens})[i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({tokens}) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


def minhash_signature_expr(tokens: Column) -> Column:
    """MINHASH_PERMS-wide signature: for perm i, min over token hashes of
    (a_i * h + b_i) mod P. Pure built-ins -> stays in codegen.

    Formulated as ONE ``aggregate`` fold carrying the whole signature as
    the accumulator: each token is md5-hashed exactly once, then updates
    all perms via a cheap ``zip_with``. The naive per-perm formulation
    (32 x ``array_min(transform(...))``) re-evaluates the md5 hash array
    per perm after Catalyst collapses the projections — ~30x more hashing.
    """
    coeffs = F.arrays_zip(
        F.array(*[F.lit(a).cast("long") for a in MINHASH_A]).alias("a"),
        F.array(*[F.lit(b).cast("long") for b in MINHASH_B]).alias("b"),
    )
    init = F.array_repeat(F.lit(HASH_P).cast("long"), MINHASH_PERMS)
    # fold over the PRE-hashed longs: the md5 work sits in the aggregate's
    # input (evaluated once per row); the lambda touches only cheap i64 ops
    return F.aggregate(
        token_hashes_expr(tokens),
        init,
        lambda acc, h: F.zip_with(
            acc, coeffs, lambda m, ab: F.least(m, (ab["a"] * h + ab["b"]) % HASH_P)
        ),
    )


def sql_minhash_signature(tokens: str) -> str:
    hashes = sql_token_hashes(tokens)
    mins = ", ".join(
        f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {HASH_P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{mins}]"


def lsh_band_keys_expr(signature: Column) -> Column:
    """LSH_BANDS band keys: each is the '|'-joined slice of LSH_ROWS
    signature entries. Two docs are candidates iff any band key collides."""
    keys = [
        F.concat_ws(
            "|",
            F.transform(
                F.slice(signature, b * LSH_ROWS + 1, LSH_ROWS),
                lambda x: x.cast("string"),
            ),
        )
        for b in range(LSH_BANDS)
    ]
    return F.array(*keys)


def lsh_band_packed_expr(signature: Column) -> Column:
    """LSH_BANDS packed band keys: each band's LSH_ROWS signature entries
    packed pairwise into longs (``v[2i] * 2^31 + v[2i+1]``; odd tail kept
    as-is) and wrapped in a struct. Signature entries are always non-null
    longs in ``[0, HASH_P)`` with ``HASH_P = 2^31 - 1`` (the fold starts
    from ``HASH_P`` and takes mins mod ``HASH_P``), so the packing is a
    bijection of :func:`lsh_band_keys_expr`'s '|'-joined string key: two
    docs collide on a packed band iff they collide on the string band.
    The struct is ~20 inline fixed-width bytes vs ~43+ bytes of variable
    string per shuffled band row, and grouping compares longs instead of
    strings (guide §2.3: shuffle fewer, narrower bytes)."""
    keys = []
    for b in range(LSH_BANDS):
        vals = [
            F.element_at(signature, b * LSH_ROWS + i + 1)
            for i in range(LSH_ROWS)
        ]
        packed = [
            vals[i] * F.lit(2**31).cast("long") + vals[i + 1]
            for i in range(0, len(vals) - 1, 2)
        ]
        if len(vals) % 2:
            packed.append(vals[-1])
        keys.append(
            F.struct(*[p.alias(f"k{i}") for i, p in enumerate(packed)])
        )
    return F.array(*keys)


def sql_lsh_band_keys(signature: str) -> str:
    keys = ", ".join(
        f"array_to_string(({signature})[{b * LSH_ROWS + 1}:{(b + 1) * LSH_ROWS}], '|')"
        for b in range(LSH_BANDS)
    )
    return f"[{keys}]"


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _half_hash_expr(token: Column, lo: int) -> Column:
    """30-bit hash from md5 hex chars [lo, lo+8): 32-bit hex chunk
    reduced mod 2^30 — portable (Spark conv == DuckDB hex cast)."""
    return F.conv(F.substring(F.md5(token), lo, 8), 16, 10).cast("long") % (
        1 << SIMHASH_HALF
    )


def _sql_half_hash(token: str, lo: int) -> str:
    return f"(('0x' || substr(md5({token}), {lo}, 8))::bigint % {1 << SIMHASH_HALF})"


def simhash_expr(tokens: Column) -> Column:
    """SIMHASH_BITS-bit SimHash over DISTINCT tokens: bit b is set iff
    sum over tokens of (2*bit_b(h) - 1) > 0, where bits 0..29 come from
    one md5-derived 30-bit half and bits 30..59 from another.

    One ``aggregate`` fold carrying all SIMHASH_BITS counters (md5 per
    token evaluated per half, not once per bit — see
    minhash_signature_expr for the pattern's rationale).
    """
    halves = F.transform(
        F.array_distinct(tokens),
        lambda t: F.struct(
            _half_hash_expr(t, 1).alias("a"), _half_hash_expr(t, 9).alias("b")
        ),
    )
    # per-bit metadata: which half to read and the power-of-two for the
    # in-half bit (halves < 2^30, so double division is exact)
    meta = F.array(
        *[
            F.struct(
                F.lit(b // SIMHASH_HALF).alias("sel"),
                F.lit(1 << (b % SIMHASH_HALF)).cast("long").alias("p"),
            )
            for b in range(SIMHASH_BITS)
        ]
    )
    counts = F.aggregate(
        halves,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            meta,
            lambda c, m: c
            + (
                F.floor(
                    F.when(m["sel"] == 0, h["a"]).otherwise(h["b"]) / m["p"]
                ).cast("long")
                % 2
            )
            * 2
            - 1,
        ),
    )
    pows = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    return F.aggregate(
        F.zip_with(
            counts,
            pows,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_simhash(tokens: str) -> str:
    dt = f"list_distinct({tokens})"
    terms = " + ".join(
        f"(case when list_reduce(list_prepend(0::bigint, "
        f"list_transform({dt}, t -> ((({_sql_half_hash('t', 1 if b < SIMHASH_HALF else 9)}) "
        f">> {b % SIMHASH_HALF}) & 1) * 2 - 1)), "
        f"(acc, x) -> acc + x) > 0 then {2**b}::bigint else 0::bigint end)"
        for b in range(SIMHASH_BITS)
    )
    return f"({terms})"


# ---------------------------------------------------------------------------
# fingerprint / quality / language-ID
# ---------------------------------------------------------------------------


def fingerprint_expr(tokens: Column) -> Column:
    """Order-sensitive document fingerprint: left fold
    acc = (acc * FP_MULT + token_hash mod FP_MOD) mod FP_MOD."""
    hashes = F.transform(tokens, lambda t: token_hash_expr(t) % FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + h) % FP_MOD,
    )


def sql_fingerprint(tokens: str) -> str:
    hashes = f"list_transform({tokens}, t -> {sql_token_hash('t')} % {FP_MOD})"
    return (
        f"list_reduce(list_prepend(0::bigint, {hashes}), "
        f"(acc, h) -> (acc * {FP_MULT} + h) % {FP_MOD})"
    )


def piece_count_expr(text: Column) -> Column:
    """BPE-ish word-piece count: letter runs / digit runs / single
    punctuation marks over the lowercased text."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(PIECE_RE), 0))


def sql_piece_count(text: str) -> str:
    return f"len(regexp_extract_all(lower({text}), '{PIECE_RE}'))"


def _stopword_ratio_expr(tokens: Column, stopwords: list[str]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(tokens) > 0, n_sw / F.size(tokens)).otherwise(F.lit(0.0))


def _sql_stopword_ratio(tokens: str, stopwords: list[str]) -> str:
    lit = "[" + ", ".join(f"'{s}'" for s in stopwords) + "]"
    return (
        f"(case when len({tokens}) > 0 then "
        f"len(list_filter({tokens}, t -> list_contains({lit}, t)))::double / len({tokens}) "
        f"else 0.0 end)"
    )


def quality_features_exprs(text: Column) -> dict[str, Column]:
    """Quality-scoring feature set (one pass over the text):
    n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio, and a
    [0,1] composite quality score."""
    toks = tokens_expr(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    mean_len = F.when(
        n_tokens > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n_tokens,
    ).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(F.lower(text), F.lit("[^a-z0-9\\s]"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    sw_ratio = _stopword_ratio_expr(toks, ENGLISH_STOPWORDS)
    score = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(sw_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": mean_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": score,
    }


def sql_quality_features(text: str) -> dict[str, str]:
    toks = sql_tokens(text)
    n_chars = f"length({text})"
    n_tokens = f"len({toks})"
    mean_len = (
        f"(case when {n_tokens} > 0 then "
        f"list_reduce(list_prepend(0::bigint, list_transform({toks}, t -> length(t))), "
        f"(a, b) -> a + b)::double / {n_tokens} else 0.0 end)"
    )
    n_punct = f"len(regexp_extract_all(lower({text}), '[^a-z0-9\\s]'))"
    punct_ratio = f"(case when {n_chars} > 0 then {n_punct}::double / {n_chars} else 0.0 end)"
    sw_ratio = _sql_stopword_ratio(toks, ENGLISH_STOPWORDS)
    score = (
        f"(least({n_tokens}::double / 100.0, 1.0) * 0.4 "
        f"+ (1.0 - least({punct_ratio} * 5.0, 1.0)) * 0.3 "
        f"+ least({sw_ratio} * 5.0, 1.0) * 0.3)"
    )
    return {
        "n_chars": f"{n_chars}::bigint",
        "n_tokens": f"{n_tokens}::bigint",
        "mean_token_len": mean_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": sw_ratio,
        "quality_score": score,
    }


def lang_id_expr(text: Column) -> Column:
    """Heuristic language-ID: most-overlapping stopword set; deterministic
    tie-break by language code ascending; 'unknown' when no overlap."""
    toks = tokens_expr(text)

    def contains(sw):
        return lambda t: F.array_contains(sw, t)

    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        score = F.size(F.filter(toks, contains(sw)))
        improved = (score > best_score) | ((score == best_score) & (score > 0) & (F.lit(lang) < best_lang))
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(score, best_score)
    return best_lang


def sql_lang_id(text: str) -> str:
    toks = sql_tokens(text)
    score = lambda lang: (  # noqa: E731
        f"len(list_filter({toks}, t -> list_contains(["
        + ", ".join(f"'{s}'" for s in LANG_STOPWORDS[lang])
        + "], t)))"
    )
    # same fold order as the Spark expression: iterate langs descending,
    # prefer strictly-better scores, tie-break to the smaller code
    expr = "'unknown'"
    prev_scores: list[str] = []
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        s = score(lang)
        best_so_far = (
            f"greatest({', '.join(prev_scores)}, 0)" if prev_scores else "0"
        )
        expr = (
            f"(case when {s} > {best_so_far} or ({s} = {best_so_far} and {s} > 0 "
            f"and '{lang}' < {expr}) then '{lang}' else {expr} end)"
        )
        prev_scores.append(s)
    return expr
