"""Deterministic cross-engine text hashing primitives.

Every hash here is MD5-based because MD5 is the one hash function that
Spark (``F.md5``) and any ANSI oracle engine (DuckDB ``md5``) compute
identically, hex-encoded the same way. That makes MinHash signatures,
LSH band buckets, SimHash bits, and content fingerprints *bit-for-bit
reproducible* in plain SQL — so the whole dedup tier is verifiable by the
driver's DuckDB oracle instead of needing rows-only checks.

"Permutations" for MinHash are salted hashes: permutation ``h`` maps a
shingle ``s`` to ``md5('<h>|' || s)`` and the signature component is the
lexicographic minimum over the doc's shingle set. A uniform hash composed
with lexicographic min is the standard min-wise family (Broder 1997);
salting replaces seeded tabulation so no RNG state needs to be shared
with the oracle.

Each Spark-side builder has a ``*_sql`` twin emitting the equivalent
DuckDB expression, so operator and oracle can never drift apart.

Scale notes: everything here is a pure column expression (JVM-evaluated,
whole-stage-codegen'd; MD5 via commons-codec) — no Python UDFs, no
shuffles. The expensive parts of dedup (band bucketing, pair joins) live
in ``operators/dedup.py``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


# --- tokenization ------------------------------------------------------------

def tokens(text: Column | str) -> Column:
    """Non-empty whitespace tokens. Mirrors ``tokens_sql``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t != '')"


def word_shingles(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles; documents shorter than ``n`` tokens contribute
    their whole text as a single shingle (so every doc has a signature)."""
    starts = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda p: F.concat_ws(" ", *[F.element_at(toks, p + i) for i in range(n)])  # noqa: E731
    sh = F.when(F.size(toks) >= n, F.transform(starts, gram)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    return F.array_distinct(sh) if distinct else sh


def word_shingles_sql(toks: str, n: int = 3, distinct: bool = True) -> str:
    gram_l = " || ' ' || ".join(f"({toks})[i+{k + 1}]" for k in range(n))
    sh = (
        f"CASE WHEN len({toks}) >= {n} "
        f"THEN list_transform(range(len({toks}) - {n - 1}), i -> {gram_l}) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )
    return f"list_distinct({sh})" if distinct else sh


def char_ngrams(text: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Character n-grams; texts shorter than ``n`` chars contribute the
    whole text as one gram. Mirrors ``char_ngrams_sql``."""
    c = F.col(text) if isinstance(text, str) else text
    starts = F.sequence(F.lit(1), F.length(c) - (n - 1))
    grams = F.transform(starts, lambda p: c.substr(p, F.lit(n)))
    sh = F.when(F.length(c) >= n, grams).otherwise(F.array(c))
    return F.array_distinct(sh) if distinct else sh


def char_ngrams_sql(expr: str, n: int = 3, distinct: bool = True) -> str:
    sh = (
        f"CASE WHEN length({expr}) >= {n} "
        f"THEN list_transform(range(length({expr}) - {n - 1}), "
        f"i -> substr({expr}, i + 1, {n})) "
        f"ELSE [{expr}] END"
    )
    return f"list_distinct({sh})" if distinct else sh


# --- MinHash -----------------------------------------------------------------

# Multiply-mod permutation family over a single md5 base hash: one md5 per
# shingle (the expensive part), then n cheap integer maps
#     pi_h(x) = (a_h * (x mod 2^31) + b_h) mod (2^61 - 1)
# with (a_h, b_h) themselves md5-derived constants — the standard universal
# hash family, 16x fewer digest computations than per-salt md5, and pure
# 64-bit arithmetic (no overflow: a < 2^31, x mod 2^31 < 2^31 -> product
# < 2^62).
MINHASH_PRIME = (1 << 61) - 1
_MOD31 = 1 << 31


def _perm_consts(h: int) -> tuple[int, int]:
    import hashlib

    a = int(hashlib.md5(f"perm-a|{h}".encode()).hexdigest()[:8], 16) | 1
    b = int(hashlib.md5(f"perm-b|{h}".encode()).hexdigest()[:8], 16)
    return a, b


def shingle_base_hash(shingles: Column) -> Column:
    """array<bigint>: 60-bit base hash per shingle (first 15 md5 hex)."""
    return F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    )


def shingle_base_hash_sql(shingles: str) -> str:
    return (
        f"list_transform({shingles}, s -> "
        f"CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))"
    )


def minhash_from_base(base: Column, n_hashes: int = 16) -> Column:
    """Signature from a *materialized* base-hash array column. Callers
    must compute ``shingle_base_hash`` into its own column first — the
    base expression is referenced once per permutation, and only a
    materialized column keeps the md5 pass from being replayed 16x
    (Catalyst will not inline a multiply-referenced expensive alias)."""

    def perm_min(h: int) -> Column:
        a, b = _perm_consts(h)
        return F.array_min(
            F.transform(
                base,
                lambda x: (F.lit(a) * (x % F.lit(_MOD31)) + F.lit(b))
                % F.lit(MINHASH_PRIME),
            )
        )

    return F.array(*[perm_min(h) for h in range(n_hashes)])


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """Convenience one-expression form (fine for tests/small frames; the
    pair-mining pipeline materializes the base hashes instead)."""
    return minhash_from_base(shingle_base_hash(shingles), n_hashes)


def minhash_from_base_sql(base: str, n_hashes: int = 16) -> str:
    """DuckDB twin of ``minhash_from_base`` — pass a CTE column holding
    the base-hash list so the md5 pass runs once there too."""
    comps = ", ".join(
        f"list_min(list_transform({base}, "
        f"x -> ({a} * (x % {_MOD31}) + {b}) % {MINHASH_PRIME}))"
        for a, b in (_perm_consts(h) for h in range(n_hashes))
    )
    return f"[{comps}]"


def band_hashes(sig: Column, n_bands: int = 4, rows_per_band: int = 4) -> Column:
    """LSH banding: one md5 per band of ``rows_per_band`` signature rows.
    Two docs collide in band ``b`` iff that whole band matches — the
    standard (b, r) S-curve tuning (threshold ≈ (1/b)^(1/r))."""

    def band(b: int) -> Column:
        part = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        return F.md5(F.concat_ws(",", F.transform(part, lambda x: x.cast("string"))))

    return F.array(*[band(b) for b in range(n_bands)])


def band_hashes_sql(sig: str, n_bands: int = 4, rows_per_band: int = 4) -> list[str]:
    return [
        "md5(array_to_string(list_transform("
        f"({sig})[{b * rows_per_band + 1}:{(b + 1) * rows_per_band}], "
        "x -> CAST(x AS VARCHAR)), ','))"
        for b in range(n_bands)
    ]


# --- SimHash -----------------------------------------------------------------

def token_md5(toks: Column) -> Column:
    """Per-token md5 hex — materialize this ONCE (own column) before
    feeding :func:`simhash16`, which references it 16 times."""
    return F.transform(toks, F.md5)


def token_md5_sql(toks: str) -> str:
    return f"list_transform({toks}, t -> md5(t))"


def simhash16(hashed_toks: Column) -> Column:
    """16-bit SimHash over a pre-hashed token multiset (``token_md5``).

    Bit ``j`` of a token's hash is the high bit of hex digit ``j`` of its
    md5 (digit >= 8). Each token votes +1/-1 per bit; the fingerprint bit
    is 1 where the vote sum is positive. Near-identical documents differ
    in a small Hamming distance (Charikar 2002).
    """
    def vote(j: int) -> Column:
        return F.aggregate(
            hashed_toks,
            F.lit(0),
            lambda acc, hx: acc
            + F.when(F.substring(hx, j + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1),
        )

    bits = [
        F.when(F.coalesce(vote(j), F.lit(0)) > 0, F.lit(2**j)).otherwise(F.lit(0))
        for j in range(16)
    ]
    return reduce(lambda a, b: a + b, bits).cast("bigint")


def simhash16_sql(hashed_toks: str) -> str:
    """DuckDB twin over a pre-hashed CTE column (``token_md5_sql``)."""
    highs = ", ".join(f"'{c}'" for c in HEX_HIGH)
    terms = []
    for j in range(16):
        vote = (
            f"COALESCE(list_sum(list_transform({hashed_toks}, "
            f"hx -> CASE WHEN substr(hx, {j + 1}, 1) IN ({highs}) THEN 1 ELSE -1 END)), 0)"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END)")
    return f"CAST({' + '.join(terms)} AS BIGINT)"
