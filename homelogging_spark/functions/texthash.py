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


# --- MinHash -----------------------------------------------------------------

def _salted_min(shingles: Column, h: int) -> Column:
    # NB: a plain single-arg lambda — pyspark treats a 2-parameter function
    # (even via default args) as the (element, index) transform variant.
    salt = F.lit(f"{h}|")
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(salt, s))))


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """Array of ``n_hashes`` min-wise hashes (hex strings) of the shingle
    set. Element ``h`` is ``min(md5('<h>|' || s))`` over shingles ``s``."""
    return F.array(*[_salted_min(shingles, h) for h in range(n_hashes)])


def minhash_signature_sql(shingles: str, n_hashes: int = 16) -> str:
    comps = ", ".join(
        f"list_min(list_transform({shingles}, s -> md5('{h}|' || s)))"
        for h in range(n_hashes)
    )
    return f"[{comps}]"


def band_hashes(sig: Column, n_bands: int = 4, rows_per_band: int = 4) -> Column:
    """LSH banding: one md5 per band of ``rows_per_band`` signature rows.
    Two docs collide in band ``b`` iff that whole band matches — the
    standard (b, r) S-curve tuning (threshold ≈ (1/b)^(1/r))."""
    return F.array(
        *[
            F.md5(F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band)))
            for b in range(n_bands)
        ]
    )


def band_hashes_sql(sig: str, n_bands: int = 4, rows_per_band: int = 4) -> list[str]:
    return [
        f"md5(array_to_string(({sig})[{b * rows_per_band + 1}:{(b + 1) * rows_per_band}], ','))"
        for b in range(n_bands)
    ]


# --- SimHash -----------------------------------------------------------------

def simhash16(toks: Column) -> Column:
    """16-bit SimHash over the token multiset.

    Bit ``j`` of a token's hash is the high bit of hex digit ``j`` of its
    md5 (digit >= 8). Each token votes +1/-1 per bit; the fingerprint bit
    is 1 where the vote sum is positive. Near-identical documents differ
    in a small Hamming distance (Charikar 2002).
    """
    def vote(j: int) -> Column:
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.substring(F.md5(t), j + 1, 1).isin(*HEX_HIGH), 1).otherwise(-1),
        )

    bits = [
        F.when(F.coalesce(vote(j), F.lit(0)) > 0, F.lit(2**j)).otherwise(F.lit(0))
        for j in range(16)
    ]
    return reduce(lambda a, b: a + b, bits).cast("bigint")


def simhash16_sql(toks: str) -> str:
    highs = ", ".join(f"'{c}'" for c in HEX_HIGH)
    terms = []
    for j in range(16):
        vote = (
            f"COALESCE(list_sum(list_transform({toks}, "
            f"t -> CASE WHEN substr(md5(t), {j + 1}, 1) IN ({highs}) THEN 1 ELSE -1 END)), 0)"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END)")
    return f"CAST({' + '.join(terms)} AS BIGINT)"
