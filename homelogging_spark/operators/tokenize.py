"""Real byte-pair-encoding tokenizer: learn merges from a corpus and
apply them — tokenizer-exact token counts for the packing / budget /
mixture stages that previously ran on the ``bpe_ish_token_count``
regex approximation (``textops.py``).

Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units"): pre-tokenize text into words,
start each word as its character sequence, and repeatedly merge the
most-frequent adjacent symbol pair; applying the learned merge list in
rank order reproduces the min-rank-first reference tokenizer exactly,
because a merge can only create NEW pairs involving its output symbol,
whose own merges always rank later.

Representation — the whole trick of this module: a word's symbol
sequence is carried as a single delimited string where every token is
wrapped in ``\\x1f`` sentinels (``\\x1fth\\x1f\\x1fe\\x1f`` for
``[th, e]``), so applying one merge ``(l, r)`` is EXACTLY one plain
``replace(s, '\\x1fl\\x1f\\x1fr\\x1f', '\\x1flr\\x1f')``:

- token boundaries are explicit, so a pair can never match inside a
  longer token;
- each token keeps its own sentinels, so one leftmost-to-right
  non-overlapping ``replace`` pass equals the exhaustive
  merge-this-pair loop (``[a,a,a,a]`` → ``[aa,aa]``, proven in
  ``test_tokenize``);
- ``replace`` has IDENTICAL semantics in Spark SQL, DuckDB, and
  Python ``str.replace`` — the oracle replicates the merge loop
  bit-for-bit as a nested scalar expression, no recursion needed.

Scale: application is a pure JVM-side expression chain (one ``replace``
per merge inside a ``transform`` lambda — whole-stage codegen, zero
Python, zero shuffle) — the right shape for config-sized merge lists.
The chain's MEASURED compile ceiling is between 200 and 500 merges
(Catalyst's nested-Column conversion overflows the stack — SCALE.md
r13); beyond it, and for production vocabularies generally,
:func:`bpe_token_count_udf` is the same fold as an Arrow-batched pandas
UDF over a broadcast merges list with a per-word memo (word frequency
follows Zipf — the fold runs once per DISTINCT word, which also makes
the UDF the faster form on heavy-tailed text), unit-pinned bit-equal to
the expression form.

Learning runs on the distinct-WORD frequency table (one corpus scan,
then iterations touch only the vocabulary — Sennrich's dictionary
trick, distributed): each round re-tokenizes the vocab with the merges
so far (JVM expression), explodes adjacent pairs, and takes the
globally most frequent pair (ties broken lexicographically, so the
result is a pure function of the corpus). Reference parity: the
reference has no tokenizer; this serves the LLM-pipeline brief's
"tokenizer-exact budgets" requirement next to ``pack_docs`` /
``budget_select`` / ``mixture_weights``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
WORD_RE = "[a-z0-9]+"

# Measured-safe ceiling for the JVM expression-chain form (SCALE.md r13:
# 200 merges compile and run; somewhere between 200 and 500 Catalyst's
# nested-Column conversion overflows the stack — a HARD compile-time
# crash, not a slowdown). `word_bpe_tokens` / `bpe_token_count`
# auto-dispatch to the bit-equal Arrow-UDF fold above this bound, so a
# production vocabulary (tens of thousands of merges) Just Works;
# `_apply_merges` itself raises, because a caller composing the raw
# chain has no UDF to fall back to.
MAX_EXPR_MERGES = 200

# --- versioned merge-list config (r15, carried from the r13 plan) ------------
#
# A tokenizer upgrade is a DATA change, not a code change: merge lists
# live in this APPEND-ONLY version map (the ``series_schema`` /
# config-driven-series precedent — ``plans/sources_registry.py``), every
# consumer pins a ``vocab_version``, ``merges_dim`` exposes the whole
# map as a joinable config dim, and ``vocab_audit`` emits the audit row
# a corpus-build manifest records ("which tokenizer counted these
# tokens" — without it a budget computed under v1 silently mixes with
# packs computed under v2). Versions are frozen ``learn_bpe_merges``
# output on the sf0.01 documents fixture; the learner is deterministic
# (ties broken lexicographically), so v1 is a PREFIX of v2 — larger
# vocabularies extend, never rewrite, earlier ones.
MERGE_VERSIONS: dict[int, tuple[tuple[str, str], ...]] = {
    # v1: learn_bpe_merges(documents, "text", 48) — frozen 2026-08-15
    1: (
        ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'),
        ('s', 't'), ('m', 'er'), ('a', 't'), ('l', 'u'),
        ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'),
        ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'),
        ('at', 'c'), ('atc', 'h'), ('b', 'atch'), ('a', 'n'),
        ('c', 'an'), ('s', 'can'), ('c', 'o'), ('c', 'u'),
        ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('cu', 'st'),
        ('cust', 'o'), ('custo', 'mer'), ('f', 'i'), ('fi', 'l'),
        ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'),
        ('m', 'all'), ('s', 'mall'), ('g', 'e'), ('l', 'ow'),
        ('mer', 'ge'), ('s', 'low'), ('c', 't'), ('ct', 'or'),
        ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('v', 'ector'),
    ),
    # v2: learn_bpe_merges(documents, "text", 64) — frozen 2026-08-15
    # (r15 vocab bump; extends v1 by 16 merges)
    2: (
        ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'),
        ('s', 't'), ('m', 'er'), ('a', 't'), ('l', 'u'),
        ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'),
        ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'),
        ('at', 'c'), ('atc', 'h'), ('b', 'atch'), ('a', 'n'),
        ('c', 'an'), ('s', 'can'), ('c', 'o'), ('c', 'u'),
        ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('cu', 'st'),
        ('cust', 'o'), ('custo', 'mer'), ('f', 'i'), ('fi', 'l'),
        ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'),
        ('m', 'all'), ('s', 'mall'), ('g', 'e'), ('l', 'ow'),
        ('mer', 'ge'), ('s', 'low'), ('c', 't'), ('ct', 'or'),
        ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('v', 'ector'),
        ('in', 'e'), ('l', 'ine'), ('a', 'b'), ('ab', 'l'),
        ('abl', 'e'), ('at', 'a'), ('d', 'ata'), ('t', 'able'),
        ('u', 'p'), ('a', 'g'), ('ag', 'g'), ('a', 'lu'),
        ('alu', 'e'), ('v', 'alue'), ('e', 'y'), ('k', 'ey'),
    ),
    # v3: learn_bpe_merges_batched(documents, "text", 32, initial=v2) —
    # frozen 2026-08-15 (r16 vocab bump; the batched learner's
    # continuation path, pinned sequential-identical in test_tokenize).
    # Extends v2 by 25 merges and EXHAUSTS the fixture corpus at
    # min_freq=2 (the learner stopped early: no pair with freq >= 2
    # remains), so v3 is this corpus's complete BPE vocabulary.
    3: (
        ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'),
        ('s', 't'), ('m', 'er'), ('a', 't'), ('l', 'u'),
        ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'),
        ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'),
        ('at', 'c'), ('atc', 'h'), ('b', 'atch'), ('a', 'n'),
        ('c', 'an'), ('s', 'can'), ('c', 'o'), ('c', 'u'),
        ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('cu', 'st'),
        ('cust', 'o'), ('custo', 'mer'), ('f', 'i'), ('fi', 'l'),
        ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'),
        ('m', 'all'), ('s', 'mall'), ('g', 'e'), ('l', 'ow'),
        ('mer', 'ge'), ('s', 'low'), ('c', 't'), ('ct', 'or'),
        ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('v', 'ector'),
        ('in', 'e'), ('l', 'ine'), ('a', 'b'), ('ab', 'l'),
        ('abl', 'e'), ('at', 'a'), ('d', 'ata'), ('t', 'able'),
        ('u', 'p'), ('a', 'g'), ('ag', 'g'), ('a', 'lu'),
        ('alu', 'e'), ('v', 'alue'), ('e', 'y'), ('k', 'ey'),
        ('a', 'm'), ('e', 'am'), ('r', 'eam'), ('st', 'ream'),
        ('d', 'ow'), ('in', 'dow'), ('w', 'indow'), ('par', 'k'),
        ('s', 'park'), ('g', 'r'), ('gr', 'o'), ('gro', 'up'),
        ('par', 't'), ('b', 'i'), ('bi', 'g'), ('or', 't'),
        ('s', 'ort'), ('er', 'y'), ('q', 'u'), ('qu', 'ery'),
        ('a', 'st'), ('f', 'ast'), ('h', 'e'), ('t', 'he'),
        ('d', 'up'),
    ),
}

CURRENT_VOCAB_VERSION = 3


def merges_for(version: int = CURRENT_VOCAB_VERSION) -> list[tuple[str, str]]:
    """The frozen merge list for ``version`` (raises on unknown — a
    consumer must never silently fall back to a different tokenizer)."""
    if version not in MERGE_VERSIONS:
        raise ValueError(
            f"unknown vocab_version {version}; known: "
            f"{sorted(MERGE_VERSIONS)}"
        )
    return list(MERGE_VERSIONS[version])


def vocab_audit(version: int = CURRENT_VOCAB_VERSION) -> dict:
    """The audit row a corpus-build manifest records alongside token
    counts/packs: version, size, and a content digest so two manifests
    claiming the same version are provably the same tokenizer."""
    import hashlib

    merges = merges_for(version)
    canon = "\n".join(f"{lhs} {rhs}" for lhs, rhs in merges)
    return {
        "vocab_version": int(version),
        "n_merges": len(merges),
        "merges_md5": hashlib.md5(canon.encode()).hexdigest(),
    }


def merges_dim(spark) -> "DataFrame":
    """Every version as one joinable/broadcastable config dim:
    ``(vocab_version int, rank int, lhs string, rhs string)`` — rank is
    the merge's application order. Dim-sized by construction (versions ×
    merges); write it next to the corpus manifest so a reader can
    re-derive any historical count."""
    rows = [
        (v, i, lhs, rhs)
        for v, merges in sorted(MERGE_VERSIONS.items())
        for i, (lhs, rhs) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "vocab_version int, rank int, lhs string, rhs string"
    )


# Back-compat alias: the CURRENT version's list (bpe_pack and the
# tokenize tests pin their semantics through this name; bumping
# CURRENT_VOCAB_VERSION is the data change that re-certifies them).
DEFAULT_MERGES: list[tuple[str, str]] = merges_for(CURRENT_VOCAB_VERSION)


def _wrapped(word: Column) -> Column:
    """Character sequence of a word in wrapped-string form."""
    return F.regexp_replace(word, "(.)", f"{SEP}$1{SEP}")


def _apply_merges(s: Column, merges: Sequence[tuple[str, str]]) -> Column:
    """Apply the merge list in rank order to a wrapped-string sequence —
    one literal ``replace`` per merge, pure JVM scalar chain. Refuses
    lists beyond :data:`MAX_EXPR_MERGES`: the chain would crash Catalyst
    at compile (measured, SCALE.md r13) — use the Arrow fold
    (:func:`bpe_token_count_udf`, or the auto-dispatching
    :func:`bpe_token_count` / :func:`word_bpe_tokens`) instead."""
    if len(merges) > MAX_EXPR_MERGES:
        raise ValueError(
            f"{len(merges)} merges exceed the expression chain's measured "
            f"compile ceiling ({MAX_EXPR_MERGES}; Catalyst stack-overflows "
            f"between 200 and 500 nested replaces) — use the bit-equal "
            f"Arrow-UDF fold (bpe_token_count_udf / the auto-dispatching "
            f"bpe_token_count)"
        )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(f"{SEP}{left}{SEP}{SEP}{right}{SEP}"),
            F.lit(f"{SEP}{left}{right}{SEP}"),
        )
    return s


def _rules(merges: Sequence[tuple[str, str]]) -> list[tuple[str, str]]:
    """(pattern, replacement) pairs of the wrapped-string fold — the
    Python-side twin of :func:`_apply_merges`' literals."""
    return [
        (f"{SEP}{l}{SEP}{SEP}{r}{SEP}", f"{SEP}{l}{r}{SEP}") for l, r in merges
    ]


def _fold_word(w: str, rules: Sequence[tuple[str, str]]) -> str:
    """Python twin of the JVM fold: wrap, then one ``str.replace`` per
    merge (identical leftmost-non-overlapping semantics — module
    docstring). Returns the folded WRAPPED string."""
    s = SEP + (SEP + SEP).join(w) + SEP if w else ""
    for pat, rep in rules:
        s = s.replace(pat, rep)
    return s


def word_bpe_tokens(word: Column, merges: Sequence[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for one (lowercase) word. The
    outer sentinels are trimmed BEFORE the split so tokens come back
    bare (counting alone doesn't need the trim — the split count is
    sentinel-invariant — but pair mining in the learner does).

    Merge lists beyond :data:`MAX_EXPR_MERGES` auto-dispatch to the
    bit-equal Arrow-UDF fold (the expression chain would crash Catalyst
    at compile) — so ``learn_bpe_merges`` keeps working past round 200
    and a production vocabulary tokenizes without caller dispatch."""
    if len(merges) > MAX_EXPR_MERGES:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rules = _rules(merges)

        def tokens_batch(words: pd.Series) -> pd.Series:
            memo: dict[str, list[str]] = {}

            def toks(w: str) -> list[str]:
                t = memo.get(w)
                if t is None:
                    t = memo[w] = _fold_word(w, rules).strip(SEP).split(SEP + SEP)
                return t

            return pd.Series(
                [None if w is None else toks(w) for w in words], dtype="object"
            )

        tokens_batch.__annotations__ = {"words": pd.Series, "return": pd.Series}
        return pandas_udf(tokens_batch, "array<string>")(word)
    s = F.btrim(_apply_merges(_wrapped(word), merges), F.lit(SEP))
    return F.split(s, SEP + SEP)


def bpe_token_count(
    text: Column, merges: Sequence[tuple[str, str]]
) -> Column:
    """Per-document BPE token count: pre-tokenize into ``[a-z0-9]+``
    words on the lowercased text, tokenize each word by the merge list,
    sum. NULL/empty text counts 0. Everything JVM-side.

    Merge lists beyond :data:`MAX_EXPR_MERGES` auto-dispatch to the
    bit-equal Arrow-UDF fold with a per-word memo (the expression chain
    would crash Catalyst at compile — SCALE.md r13; dispatch boundary
    and cross-boundary bit-equality pinned in ``test_tokenize``). The
    DataFrame-level :func:`bpe_token_count_udf` stays the preferred
    production entry — it ships the merges as an explicit broadcast
    variable; this dispatch serializes them in the UDF closure (fine to
    a few MB of rules)."""
    if len(merges) > MAX_EXPR_MERGES:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        rules = _rules(merges)
        word_pat = WORD_RE

        def count_batch(texts: pd.Series) -> pd.Series:
            import re

            word_re = re.compile(word_pat)
            memo: dict[str, int] = {}

            def n_tokens(w: str) -> int:
                n = memo.get(w)
                if n is None:
                    n = memo[w] = _fold_word(w, rules).count(SEP + SEP) + 1
                return n

            return pd.Series(
                [
                    0
                    if t is None
                    else sum(n_tokens(w) for w in word_re.findall(t.lower()))
                    for t in texts
                ],
                dtype="int64",
            )

        count_batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
        return pandas_udf(count_batch, "bigint")(text)
    words = F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), F.lit(0))
    per_word = F.transform(
        words, lambda w: F.size(F.split(_apply_merges(_wrapped(w), merges), SEP + SEP))
    )
    n = F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
    return F.coalesce(n, F.lit(0)).cast("bigint")


def bpe_token_count_sql(expr: str, merges: Sequence[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`bpe_token_count` — the identical merge
    loop as nested ``replace`` calls over the same wrapped-string form
    (module docstring), summed per document with ``list_transform``."""
    s = f"chr(31) || array_to_string(string_split(w, ''), chr(31)||chr(31)) || chr(31)"
    for left, right in merges:
        # SQL-literal-escape the symbols (double the quotes): learned
        # merges are [a-z0-9]+ by construction, but an arbitrary
        # caller-supplied merge containing a quote must not break (or
        # inject into) the emitted oracle SQL
        l, r = left.replace("'", "''"), right.replace("'", "''")
        pat = f"chr(31)||'{l}'||chr(31)||chr(31)||'{r}'||chr(31)"
        rep = f"chr(31)||'{l}{r}'||chr(31)"
        s = f"replace({s}, {pat}, {rep})"
    return (
        "CAST(COALESCE(list_sum(list_transform("
        f"regexp_extract_all(lower({expr}), '{WORD_RE}'), "
        f"w -> len(string_split({s}, chr(31)||chr(31))))), 0) AS BIGINT)"
    )


def bpe_token_count_udf(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "n_tokens",
) -> DataFrame:
    """Arrow-batched pandas-UDF form for PRODUCTION merge lists (tens of
    thousands of rules, beyond what an expression chain can compile).
    Same fold, same wrapped-string replace, with a per-word memo — the
    Zipf head dominates, so most words hit the memo. The merges list
    rides an explicit broadcast variable (the config-dim precedent), so
    executors deserialize it once per worker, not once per task.
    Unit-pinned bit-equal to :func:`bpe_token_count`."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))
    word_re = re.compile(WORD_RE)

    def count_batch(texts: pd.Series) -> pd.Series:
        rules = _rules(bc.value)
        memo: dict[str, int] = {}

        def word_tokens(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = memo[w] = _fold_word(w, rules).count(SEP + SEP) + 1
            return n

        return pd.Series(
            [
                0
                if t is None
                else sum(word_tokens(w) for w in word_re.findall(t.lower()))
                for t in texts
            ],
            dtype="int64",
        )

    count_batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    udf = pandas_udf(count_batch, "bigint")
    return df.withColumn(out_col, udf(F.col(text_col)))


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn a merge list from a corpus (Sennrich 2016, distributed).

    One corpus scan builds the distinct-word frequency table (cached —
    it is vocabulary-sized, not corpus-sized); each of the ``n_merges``
    rounds re-tokenizes the VOCABULARY with the merges so far (JVM
    expression chain), explodes adjacent token pairs weighted by word
    frequency, and takes the most frequent pair — ties broken by
    (left, right) lexicographic order so the result is a deterministic
    function of the corpus. Stops early when the best pair's frequency
    drops below ``min_freq``. The returned list is meant to be FROZEN
    into config (the ``DEFAULT_MERGES`` precedent) — learning is an
    offline build step, application is the hot path."""
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .persist()
    )
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            toks = word_bpe_tokens(F.col("word"), merges)
            pairs = (
                words.select("wcount", toks.alias("_toks"))
                .where(F.size("_toks") >= 2)
                .select(
                    "wcount",
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.size("_toks") - 2),
                            lambda i: F.struct(
                                F.col("_toks")[i].alias("l"),
                                F.col("_toks")[i + 1].alias("r"),
                            ),
                        )
                    ).alias("pair"),
                )
            )
            top = (
                pairs.groupBy("pair.l", "pair.r")
                .agg(F.sum("wcount").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["freq"] < min_freq:
                break
            merges.append((top[0]["l"], top[0]["r"]))
        return merges
    finally:
        words.unpersist()


def learn_bpe_merges_batched(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
    initial: Sequence[tuple[str, str]] | None = None,
    batch_cap: int = 64,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """:func:`learn_bpe_merges`, PROVABLY identical output, in a
    fraction of the Spark jobs (r15 verdict #2: one job per merge is
    the last driver-side loop that grows with a model parameter — at a
    real 32k vocabulary it is a training-path scale-killer).

    Per round ONE pair-count job runs (same tables as the sequential
    learner), the top ``batch_cap + 1`` pairs come back ranked by the
    sequential tie-break ``(freq DESC, l, r)``, and the driver accepts
    the longest prefix that is safe to take as consecutive sequential
    steps:

    - **token-disjoint prefix**: the walk stops at the first pair
      sharing a token with an accepted pair (merging ``(a,b)`` can only
      change counts of pairs CONTAINING ``a`` or ``b``, so
      disjoint-pair counts are exactly their round-start counts), and
      stops at any self-pair ``(a,a)`` beyond position 0 (a self-merge
      can create a pair — e.g. ``(aa,a)`` — bounded only by its own
      frequency, which breaks the separation argument below);
    - **strict frequency separation**: accepted pairs are truncated to
      those with ``freq`` STRICTLY above the first non-accepted pair's
      (``f_out``). Every pair a batch merge CREATES — ``(x, ab)``,
      ``(ab, y)`` — is count-bounded by a round-start neighbor pair
      (``(x, a)`` / ``(b, y)``) that CONTAINS ``a`` or ``b`` and is
      therefore not in the (token-disjoint) batch, so created-pair
      frequency <= f_out < every accepted frequency: at each simulated
      sequential step the accepted pair is still the unique
      ``(freq, l, r)``-max over old and created pairs alike.

    When truncation leaves nothing (ties at the top, or a leading
    self-pair), the round degenerates to accepting exactly the top-1 —
    which IS the sequential step — so progress is guaranteed and the
    worst case is the sequential learner's schedule. Zipf-shaped
    corpora spend that worst case only on the first few rounds, where
    the head pairs contest the same characters.

    ``initial``: already-applied merges (continue an existing frozen
    vocabulary — how v3 extends v2); the ``n_merges`` budget counts NEW
    merges only. ``stats`` (optional dict) receives ``rounds`` /
    ``jobs`` / ``learned`` for SCALE.md-style accounting. Equality with
    the sequential learner is pinned in ``test_tokenize``."""
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .persist()
    )
    try:
        merges: list[tuple[str, str]] = list(initial or [])
        n_initial = len(merges)
        rounds = 0
        while len(merges) - n_initial < n_merges:
            budget = n_merges - (len(merges) - n_initial)
            toks = word_bpe_tokens(F.col("word"), merges)
            pairs = (
                words.select("wcount", toks.alias("_toks"))
                .where(F.size("_toks") >= 2)
                .select(
                    "wcount",
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(0), F.size("_toks") - 2),
                            lambda i: F.struct(
                                F.col("_toks")[i].alias("l"),
                                F.col("_toks")[i + 1].alias("r"),
                            ),
                        )
                    ).alias("pair"),
                )
            )
            ranked = (
                pairs.groupBy("pair.l", "pair.r")
                .agg(F.sum("wcount").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
                .limit(batch_cap + 1)
                .collect()
            )
            rounds += 1
            if not ranked or ranked[0]["freq"] < min_freq:
                break
            used: set[str] = set()
            accepted: list[tuple[str, str, int]] = []
            f_out: int | None = None
            for i, row in enumerate(ranked):
                l, r, freq = row["l"], row["r"], row["freq"]
                if (
                    len(accepted) >= budget
                    or l in used
                    or r in used
                    or (l == r and i > 0)
                ):
                    f_out = freq
                    break
                accepted.append((l, r, freq))
                used.update((l, r))
                if l == r:
                    # a leading self-pair is only safe SOLO: its created
                    # pairs (e.g. (aa,a)) are bounded by its own
                    # frequency, not by any non-batch neighbor — close
                    # the batch so this round is the sequential step
                    f_out = (
                        ranked[i + 1]["freq"] if i + 1 < len(ranked) else None
                    )
                    break
            else:
                # table exhausted before batch_cap+1 rows: no pair was
                # left out, so no separation cut is needed
                f_out = None if len(ranked) <= batch_cap else ranked[-1]["freq"]
            if f_out is not None:
                accepted = [a for a in accepted if a[2] > f_out]
            if not accepted:
                # ties at the top (or a leading self-pair): take exactly
                # the sequential step
                accepted = [(ranked[0]["l"], ranked[0]["r"], ranked[0]["freq"])]
            take = [a for a in accepted if a[2] >= min_freq]
            merges.extend((l, r) for l, r, _ in take)
            if len(take) < len(accepted):
                break  # sequential stop: best remaining pair < min_freq
        if stats is not None:
            stats["rounds"] = rounds
            stats["jobs"] = rounds  # one pair-count job per round
            stats["learned"] = len(merges) - n_initial
        return merges
    finally:
        words.unpersist()
