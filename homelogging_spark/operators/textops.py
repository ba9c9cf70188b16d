"""Text-analysis operators for training-data pipelines.

Language identification, quality scoring, token counting, and corpus
statistics over a ``documents(doc_id, text, lang, source, n_chars)``
table. Like the dedup tier, these are engine-side extensions beyond the
reference's telemetry scope, built the same way: pure ``pyspark.sql``
column expressions (JVM-side, codegen'd, no UDFs), each with a
DuckDB-replicable formulation so the driver's oracle can hash-check it.

Scale: every operator here is embarrassingly parallel per document (map
side only) until the final aggregate; corpus stats shuffle only partial
aggregation state. At 100 TB the scan dominates — which is the right
bottleneck.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from homelogging_spark.functions.texthash import tokens, tokens_sql

# Stopword anchors per language — high-frequency function words that are
# near-unique to each language (overlapping forms like es/fr 'la' are kept:
# scoring is by total hits, not exclusivity).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "es", "los"),
    "fr": ("le", "la", "les", "de", "et", "est", "une", "que", "pour", "dans"),
}
# Fixed priority order for argmax ties (first wins).
LANG_ORDER: tuple[str, ...] = ("en", "de", "es", "fr")

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
# Identical regex semantics in Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def stopword_hits(toks: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) in ``lang``'s stopword list."""
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_hits_sql(toks: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks}, t -> t IN ({words})))"


def language_id(toks: Column) -> Column:
    """Predicted language: argmax of stopword hit counts, ties resolved in
    ``LANG_ORDER``. A deliberately simple, deterministic n-gram-free
    heuristic — real corpora route through fastText-style models, but the
    *plumbing* (per-doc map-side classify, no shuffle) is identical.
    """
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_ORDER}

    expr = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        later = [l for l in LANG_ORDER if LANG_ORDER.index(l) > LANG_ORDER.index(lang)]
        cond = reduce(lambda a, b: a & b, [hits[lang] >= hits[l] for l in later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def language_id_sql(toks: str) -> str:
    hits = {lang: stopword_hits_sql(toks, lang) for lang in LANG_ORDER}
    clauses = []
    for i, lang in enumerate(LANG_ORDER[:-1]):
        conds = " AND ".join(
            f"({hits[lang]}) >= ({hits[l]})" for l in LANG_ORDER[i + 1 :]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return f"CASE {' '.join(clauses)} ELSE '{LANG_ORDER[-1]}' END"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under the BPE-style pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def bpe_ish_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_PATTERN}'))"


def quality_columns(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Quality-signal columns (all doubles, deterministic):

    - ``n_tokens``, ``mean_token_len``: length profile
    - ``stopword_ratio``: English stopword mass (fluency proxy)
    - ``punct_ratio``: non-alphanumeric density (boilerplate/markup proxy)
    - ``quality_score``: bounded linear combination in [0, 1]

    ``toks``: optionally an already-staged token-array COLUMN — callers
    that consume several of these signals in one projection alias
    ``tokens(text)`` once and pass it here, so the tokenize subtree is
    not re-embedded (and re-executed) per signal (see
    ``classifier_quality_filter``'s staging note)."""
    if toks is None:
        toks = tokens(text)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    # try_divide: degenerate docs yield NULL ratios (the DuckDB twin's
    # divide-by-zero semantics) instead of an ANSI-mode job crash
    stop_ratio = F.try_divide(stopword_hits(toks, "en"), n_tokens)
    punct_ratio = F.try_divide(n_punct, n_chars)
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.4
        + F.least(F.lit(1.0), stop_ratio * F.lit(4.0)) * 0.3
        + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(5.0))) * 0.3
    )
    return {
        "n_tokens": n_tokens.cast("bigint"),
        "mean_token_len": F.try_divide(tok_chars, n_tokens),
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": score,
    }


def quality_columns_sql(expr: str) -> dict[str, str]:
    toks = tokens_sql(expr)
    n_tokens = f"len({toks})"
    tok_chars = f"COALESCE(list_sum(list_transform({toks}, t -> length(t))), 0)"
    n_chars = f"length({expr})"
    n_punct = f"({n_chars} - length(regexp_replace({expr}, '[^A-Za-z0-9 ]', '', 'g')))"
    stop_ratio = f"(({stopword_hits_sql(toks, 'en')}) * 1.0 / ({n_tokens}))"
    punct_ratio = f"(({n_punct}) * 1.0 / ({n_chars}))"
    score = (
        f"least(1.0, ({n_tokens}) / 100.0) * 0.4"
        f" + least(1.0, {stop_ratio} * 4.0) * 0.3"
        f" + (1.0 - least(1.0, {punct_ratio} * 5.0)) * 0.3"
    )
    return {
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "mean_token_len": f"(({tok_chars}) * 1.0 / ({n_tokens}))",
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": f"({score})",
    }


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    include_bpe: bool = False,
    approx_median: bool = False,
) -> DataFrame:
    """Per-group corpus statistics: doc counts, char/token length profile,
    median length. Classic partial-aggregation shape; the exact median is
    the only piece holding per-group value state. ``approx_median`` is
    the very-large-group dial: ``percentile_approx`` (Greenwald-Khanna
    sketch, mergeable constant-size state, default accuracy 10000) in
    the SAME single-scan aggregation — engine-internal sketch, so the
    registered query pins the exact form and the approx form is
    unit-pinned for schema equality + tolerance instead.
    With ``include_bpe`` the BPE-ish token measure is folded into the SAME
    single-scan aggregation (no second pass over the corpus)."""
    toks = tokens(F.col(text_col))
    cols = [
        F.col(group_col),
        F.length(text_col).alias("len"),
        F.size(toks).alias("ntok"),
    ]
    median = (
        F.percentile_approx("len", F.lit(0.5), F.lit(10000)).cast("double")
        if approx_median
        else F.percentile("len", F.lit(0.5))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len").cast("bigint").alias("total_chars"),
        F.avg("len").alias("avg_chars"),
        F.avg("ntok").alias("avg_tokens"),
        median.alias("median_chars"),
    ]
    if include_bpe:
        cols.append(bpe_ish_token_count(F.col(text_col)).alias("nbpe"))
        aggs += [
            F.sum("nbpe").cast("bigint").alias("total_bpe_tokens"),
            F.avg("nbpe").alias("avg_bpe_tokens"),
        ]
    return df.select(*cols).groupBy(group_col).agg(*aggs)


def topk_ngrams(
    df: DataFrame,
    k: int = 25,
    n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams: explode shingles, count,
    keep the global top-k (ties broken by ngram text so the result set
    is a pure function of the corpus).

    Scale shape: the explode is map-side; the count is a partial
    aggregation before one shuffle on the ngram (high cardinality, no
    hot key); the global top-k compiles to TakeOrderedAndProject —
    every partition keeps only its local k rows, the driver merges
    k * partitions rows, never the full ngram distribution."""
    from homelogging_spark.functions.texthash import tokens, word_shingles

    grams = df.select(
        F.explode(
            word_shingles(tokens(F.col(text_col)), n=n, distinct=False)
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram"))
        .limit(k)
    )


def topk_ngrams_sql(k: int = 25, n: int = 2, source: str = "documents") -> str:
    from homelogging_spark.functions.texthash import tokens_sql, word_shingles_sql

    return f"""
WITH toks AS (SELECT {tokens_sql('text')} AS toks FROM {source}),
g AS (SELECT unnest({word_shingles_sql('toks', n, distinct=False)}) AS ngram FROM toks)
SELECT ngram, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY 1
ORDER BY n DESC, ngram
LIMIT {k}
"""


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc top-k terms by tf·idf with idf = ln(N / df). Three
    shuffles, all on high-cardinality keys and all carrying only the
    post-partial-agg (doc, term, tf) rows: (doc, term) for tf, (term)
    for document frequencies, (doc) for the per-doc rank. Ties break by
    term text so the selection is deterministic.

    r21: df comes from a count window over tf partitioned on the term —
    the same value as the former ``tf.groupBy("term")`` + broadcast
    join (df = number of tf rows carrying the term), but the tf subtree
    (scan → tokenize → explode → partial agg) appears ONCE in the plan
    instead of twice: the broadcast build side re-computed the whole
    exploded aggregation just to count rows per term (guide §2.4 —
    duplicated subtrees are hidden second scans)."""
    from pyspark.sql import Window

    from homelogging_spark.functions.texthash import tokens

    terms = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # corpus size as a 1-row cross (broadcast) — a column-pruned count
    # scan, the cheapest way to attach the scalar
    n_docs = df.select(F.count(F.lit(1)).cast("double").alias("n_total"))
    w_df = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_df).cast("bigint"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_total") / F.col("df")),
        )
    )
    # Rank on the QUANTIZED score: ln()'s last ulp is engine-specific, so
    # two terms with near-equal raw tfidf can order differently in Spark
    # vs the DuckDB oracle at the rank-k boundary, flipping the kept term
    # (dedup_keep_best ranks from quantized keys for the same reason).
    from homelogging_spark.functions.numeric import quantize

    w = Window.partitionBy(id_col).orderBy(
        quantize(F.col("tfidf")).desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )


def tfidf_top_terms_sql(k: int = 3, source: str = "documents") -> str:
    from homelogging_spark.functions.numeric import quantize_sql
    from homelogging_spark.functions.texthash import tokens_sql

    return f"""
WITH terms AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM {source}
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY 1, 2
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM {source}),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         tf.tf * ln(n.n_total / dfreq.df) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
r AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY doc_id
           ORDER BY {quantize_sql('tfidf')} DESC, term) AS BIGINT) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df, tfidf
FROM r WHERE rank <= {k}
"""


def corpus_digest_col(id_col: Column) -> Column:
    """Per-doc 52-bit md5 hash whose ``bit_xor`` aggregate is the
    order-insensitive corpus fingerprint shared by the BM25 stats state
    (``streaming.pipeline.bm25_stats_batch_merger``) and the serve-time
    drift check (``bm25_topk(verify_state=True)``) — the
    ``sharding.shard_manifest`` fingerprint idiom. XOR is associative,
    commutative, and self-inverse with identity 0, so the digest is
    incrementally maintainable across doc-disjoint micro-batches."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bm25|"), id_col.cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("bigint")


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_len_col: str | None = None,
    dfreq: DataFrame | None = None,
    stats: DataFrame | None = None,
    verify_state: bool = False,
) -> DataFrame:
    """Per-query BM25 top-k lexical retrieval (Robertson/Sparck Jones;
    the Lucene non-negative idf variant ``ln(1 + (N - df + .5)/(df +
    .5))``) — the ranked-retrieval complement to ``tfidf_top_terms``
    (which characterizes docs, not answers queries) and the lexical leg
    ``rrf_fuse`` hybridizes with the ANN leg.

    ``queries``: (query_id bigint, term string) rows — a bounded query
    panel (broadcast twice: once to prune the exploded term stream,
    once to attach query ids), the ann_topk query-side shape.

    Scale shape: the corpus term stream is pruned to QUERY terms by a
    broadcast semi-join immediately after the explode, so tf, df, and
    the score aggregation all run on |docs containing a query term| —
    the full vocabulary table is never built (unlike tf·idf, which
    needs it by definition). Corpus size N and avgdl are one 1-row
    aggregate broadcast back — by default a second tokenizing scan;
    ``doc_len_col`` is the 100 TB dial: point it at a STORED
    token-count column (``bpe_token_count_udf`` output, an ingest
    statistic) and the stats pass aggregates two numeric columns
    instead of re-tokenizing the text (same emitted rows when the
    stored lengths equal the tokenizer's — pinned). Ranking sorts the
    QUANTIZED score (ln's last ulp is engine-specific) with doc-id
    ties, so the emitted top-k is a pure function of the corpus.

    ``dfreq`` / ``stats`` (r17): serve the corpus statistics from
    MAINTAINED artifacts instead of recomputing them — the lexical
    analogue of the ANN leg ranking from ``index_cycle`` parquet.
    ``dfreq``: a (term, df) table (the
    ``streaming.pipeline.start_bm25_stats_stream`` state — full
    vocabulary; it is pruned to query terms before broadcast).
    ``stats``: one (n_docs, total_dl) row from the same state
    generation (avgdl derives as total_dl / n_docs, the identical
    long/long double division the batch path's avg performs). Emitted
    rows are pinned identical to the recomputing path when the state
    covers exactly the scored corpus.

    State↔corpus drift (r18, r17 verdict #3): the identity contract
    above is now CHECKABLE, not just documented. The state generation
    carries a corpus fingerprint (n_docs + the order-insensitive
    md5-XOR digest of doc ids, :func:`corpus_digest_col`);
    ``verify_state=True`` compares it against the SCORED frame with
    two 1-row aggregates and raises on mismatch — a state generation
    that lags or leads the docs frame fails loudly instead of silently
    shifting every idf. Left opt-in because the mismatch is sometimes
    the point: the hybrid-panel shape scores a FILTERED corpus against
    full-corpus statistics on purpose (global idf over a candidate
    subset — the sharded-search posture, where each shard ranks its
    slice under corpus-wide statistics); that subset-corpus serving is
    legitimate exactly when the caller KNOWS df/N describe a superset,
    so it must stay expressible — without verification, by design.
    An empty-corpus state (n_docs=0) while the scored frame is
    non-empty is never consistent: the stats row is filtered out and
    the result is EMPTY (matching the recomputing path on the only
    consistent corpus — the empty one — instead of emitting NULL
    scores, the r17 ADVICE finding).
    """
    from pyspark.sql import Window

    from homelogging_spark.functions.numeric import quantize
    from homelogging_spark.functions.texthash import tokens

    if doc_len_col is not None:
        staged = df.select(
            F.col(id_col),
            tokens(F.col(text_col)).alias("__toks"),
            F.col(doc_len_col).cast("double").alias("__dl"),
        )
    else:
        staged = df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        ).withColumn("__dl", F.size("__toks").cast("double"))
    terms = staged.select(
        id_col,
        F.col("__dl").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    q_terms = queries.select("term").distinct()
    matched = terms.join(F.broadcast(q_terms), "term")
    # tf once per (doc, term) — query ids attach AFTER the heavy agg so
    # two queries sharing a term reuse the same row
    tf = matched.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    if dfreq is not None:
        # maintained full-vocabulary df table: prune to query terms
        # (tiny) before it rides the broadcast below
        dfreq = dfreq.join(F.broadcast(q_terms), "term").select(
            "term", F.col("df").cast("double").alias("df")
        )
        with_df = tf.join(F.broadcast(dfreq), "term")
    else:
        # r21 (guide §2.4): df via a count window over the PRUNED tf
        # frame partitioned on the term — the same value as the former
        # tf.groupBy("term") + broadcast join (df = tf rows per term),
        # but the tf subtree (corpus tokenize + explode + prune + agg)
        # appears once in the plan instead of twice. The window's
        # exchange moves only the query-term tf rows.
        with_df = tf.withColumn(
            "df",
            F.count(F.lit(1))
            .over(Window.partitionBy("term"))
            .cast("double"),
        )
    if stats is not None:
        if verify_state:
            state_row = stats.limit(1).collect()
            if not state_row:
                raise ValueError("state stats generation is empty")
            state = state_row[0].asDict()
            if state.get("corpus_digest") is None:
                raise ValueError(
                    "verify_state=True but the state carries no "
                    "corpus_digest (pre-r18 generation, or a merge over "
                    "legacy state propagated the unknown); rebuild the "
                    "state or serve without verification"
                )
            got = df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.coalesce(
                    F.bit_xor(corpus_digest_col(F.col(id_col))), F.lit(0)
                ).alias("digest"),
            ).collect()[0]
            if int(state["n_docs"]) != int(got.n) or int(
                state["corpus_digest"]
            ) != int(got.digest):
                raise ValueError(
                    f"BM25 state/corpus drift: state covers "
                    f"n_docs={int(state['n_docs'])} "
                    f"(digest={int(state['corpus_digest'])}) but the "
                    f"scored frame has n={int(got.n)} "
                    f"(digest={int(got.digest)}); the served idf/avgdl "
                    "would not describe this corpus. Re-run the stats "
                    "stream, or serve without verify_state if the "
                    "subset-corpus contract applies."
                )
        # n_docs=0 guard (r17 ADVICE): an empty-corpus state is only
        # consistent with an empty corpus — filtering the stats row out
        # yields the EMPTY result for any scored frame (the recomputing
        # path's output on the one consistent corpus), never NULL-score
        # rows and never an ANSI divide-by-zero
        stats = stats.where(F.col("n_docs") > 0).select(
            F.col("n_docs").cast("double").alias("n_total"),
            (F.col("total_dl") / F.col("n_docs")).alias("avgdl"),
        )
    elif doc_len_col is not None:
        # the dial: stats from the stored length column — no tokenizing
        stats = df.agg(
            F.count(F.lit(1)).cast("double").alias("n_total"),
            F.avg(F.col(doc_len_col).cast("double")).alias("avgdl"),
        )
    else:
        stats = staged.agg(
            F.count(F.lit(1)).cast("double").alias("n_total"),
            F.avg(F.size("__toks")).alias("avgdl"),
        )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_total") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # r17 (r16 ADVICE): dedup (query_id, term) ahead of the scoring
    # join too — a duplicated term row in the panel would double-count
    # that term's contribution in score AND n_terms_hit
    q_pairs = queries.select("query_id", "term").distinct()
    scored = (
        with_df
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(q_pairs), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.sum(idf * tf_norm).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        quantize(F.col("score")).desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            id_col,
            quantize("score").alias("score"),
            "n_terms_hit",
        )
    )


def bm25_topk_sql(
    queries_cte: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    source: str = "documents",
) -> str:
    """DuckDB twin of ``bm25_topk``. ``queries_cte``: SQL producing
    (query_id, term) rows, e.g. ``SELECT * FROM (VALUES (0, 'grid'),
    (0, 'power')) q(query_id, term)``."""
    from homelogging_spark.functions.numeric import quantize_sql
    from homelogging_spark.functions.texthash import tokens_sql

    return f"""
WITH q AS ({queries_cte}),
staged AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM {source}),
terms AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS term
  FROM staged
),
matched AS (
  SELECT t.* FROM terms t
  WHERE t.term IN (SELECT DISTINCT term FROM q)
),
tf AS (
  SELECT doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
  FROM matched GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_total, avg(len(toks)) AS avgdl
  FROM staged
),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln(1.0 + (stats.n_total - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * {k1 + 1.0!r}) /
               (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * tf.dl / stats.avgdl))
         ) AS score,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       JOIN (SELECT DISTINCT query_id, term FROM q) q USING (term)
  GROUP BY 1, 2
),
r AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY {quantize_sql('score')} DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, {quantize_sql('score')} AS score, n_terms_hit
FROM r WHERE rank <= {k}
"""


def rrf_fuse(
    legs: Sequence[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists that
    share (query, id, rank) columns — the standard hybrid-search merge
    of a lexical (BM25) and a vector (ANN) leg: ``score = Σ_legs
    1/(c + rank)``, ids absent from a leg contribute nothing.

    Rank-only fusion needs no score calibration between legs — exactly
    why it is the robust default when one leg is cosine distance and
    the other a BM25 logit. Each leg is already top-k (bounded), so the
    union, the fuse aggregation, and the final window are all
    dim-sized. Output ranks sort by the QUANTIZED fused score with id
    ties (1/(c+r) sums are double additions; both engines emit the
    same quantized key)."""
    from functools import reduce

    from pyspark.sql import Window

    from homelogging_spark.functions.numeric import quantize

    tagged = [
        leg.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col))).alias("contrib"),
        )
        for leg in legs
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), tagged)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_legs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        quantize(F.col("rrf_score")).desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            quantize("rrf_score").alias("rrf_score"),
            "n_legs",
        )
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_shared: int = 3,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
) -> DataFrame:
    """Decontamination scan: flag corpus docs sharing >= ``min_shared``
    distinct word-``shingle_n``-gram hashes with any benchmark doc —
    the standard guard against eval-set leakage into training data.

    This is the EXACT-overlap form (the GPT-3/PaLM n-gram-collision
    style). The fuzzy whole-doc complement needs no new operator:
    ``dedup.incremental_dedup(new_df=corpus, old_df=benchmark)`` is
    precisely near-dup decontamination — one verdict row per corpus
    doc against the benchmark's LSH band buckets, cross-frame only,
    with ``dup_of`` naming the matched benchmark doc.

    Scale shape — never all-pairs: both sides explode to (gram_hash,
    doc) rows; candidates form ONLY via the equi-join on the 60-bit
    gram hash (8-byte keys, not gram strings); the per-(corpus, bench)
    overlap count is a partial-aggregated shuffle on the pair key.

    ``max_gram_df`` is the stop-gram guard: a gram shared by D corpus
    docs and B benchmark docs fans the join out to D*B rows, and
    boilerplate grams ("in this paper we", license headers) have D in
    the millions while carrying zero contamination signal. With the
    cutoff set, grams whose corpus document frequency exceeds it are
    anti-joined out BEFORE the pair join (corpus side only — an inner
    join needs just one side cut), bounding each gram's fan-out by
    max_gram_df * B. The census groupBy and the anti join both key on
    ``gh``, the same key the pair join shuffles on, so the Exchange is
    shared. Semantics trade: a doc contaminated ONLY via stop-grams is
    no longer flagged — the standard decontamination position (Brown
    et al. 2020 filter n-grams by document frequency for exactly this
    reason); grams under the cutoff are unaffected."""
    from homelogging_spark.functions.texthash import (
        shingle_base_hash,
        tokens,
        word_shingles,
    )

    def grams(df: DataFrame, out_id: str) -> DataFrame:
        g = F.array_distinct(
            shingle_base_hash(word_shingles(tokens(F.col(text_col)), shingle_n))
        )
        return df.select(F.col(id_col).alias(out_id), F.explode(g).alias("gh"))

    cg = grams(corpus, "corpus_id")
    if max_gram_df is not None:
        if max_gram_df < 1:
            raise ValueError(f"max_gram_df must be >= 1, got {max_gram_df}")
        hot = (
            cg.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_gram_df)
            .select("gh")
        )
        cg = cg.join(hot, "gh", "left_anti")
    shared = (
        cg.join(grams(benchmark, "bench_id"), "gh")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bench_hits"),
            F.max("n_shared").cast("bigint").alias("max_shared"),
            F.min("bench_id").cast("bigint").alias("first_bench_id"),
        )
        .select("corpus_id", "n_bench_hits", "max_shared", "first_bench_id")
    )


def benchmark_contamination_sql(
    corpus_sql: str,
    benchmark_sql: str,
    min_shared: int = 3,
    shingle_n: int = 3,
) -> str:
    from homelogging_spark.functions.texthash import (
        shingle_base_hash_sql,
        tokens_sql,
        word_shingles_sql,
    )

    def grams(src: str, out_id: str) -> str:
        toks = tokens_sql("text")
        sh = word_shingles_sql("toks", shingle_n)
        return f"""(
  SELECT doc_id AS {out_id}, unnest(gh) AS gh FROM (
    SELECT doc_id, list_distinct({shingle_base_hash_sql('sh')}) AS gh FROM (
      SELECT doc_id, {sh} AS sh FROM (
        SELECT doc_id, {toks} AS toks FROM ({src})))))"""

    return f"""
WITH shared AS (
  SELECT c.corpus_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM {grams(corpus_sql, 'corpus_id')} c
  JOIN {grams(benchmark_sql, 'bench_id')} b USING (gh)
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared}
)
SELECT corpus_id,
       CAST(count(*) AS BIGINT) AS n_bench_hits,
       CAST(max(n_shared) AS BIGINT) AS max_shared,
       CAST(min(bench_id) AS BIGINT) AS first_bench_id
FROM shared GROUP BY 1
"""


def repetition_columns(
    text: Column,
    max_bigram_cover: float = 0.2,
    max_dup_trigram: float = 0.3,
    toks: Column | None = None,
) -> dict[str, Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the rules RefinedWeb/Dolma reuse) as composable columns: the
    fraction of a document covered by its single most frequent word
    bigram, the duplicate fraction of its word trigrams, and the
    ``keep`` flag applying the conventional thresholds. Boilerplate,
    SEO spam, and templated pages light both up.

    Scale: ZERO shuffle — both metrics are per-row array computations.
    The top-bigram count is a single-pass run-length fold over the
    row's SORTED bigram array (``F.aggregate``: longest run == top
    gram's occurrence count), and the trigram duplicate fraction is
    ``1 - distinct/total`` on the same row. All JVM column expressions
    inside whole-stage codegen; at 100 TB this is a pure map over the
    corpus scan. Mirrors ``repetition_scores_sql``.

    ``toks``: optionally an already-staged token-array COLUMN (the
    ``quality_columns`` convention) so callers consuming several
    text-signal families alias ``tokens(text)`` once."""
    from homelogging_spark.functions.texthash import tokens, word_shingles

    if toks is None:
        toks = tokens(text)
    n = F.size(toks)
    big = F.array_sort(word_shingles(toks, 2, distinct=False))
    tri = word_shingles(toks, 3, distinct=False)

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(
        big,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )
    cover = F.when(n >= 2, F.lit(2.0) * best / n).otherwise(F.lit(0.0))
    dup_tri = F.when(
        n >= 3,
        F.lit(1.0) - F.size(F.array_distinct(tri)) / (n - 2),
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n.cast("bigint"),
        "top_bigram_cover": cover,
        "dup_trigram_frac": dup_tri,
        "keep": (cover <= F.lit(max_bigram_cover))
        & (dup_tri <= F.lit(max_dup_trigram)),
    }


def repetition_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bigram_cover: float = 0.2,
    max_dup_trigram: float = 0.3,
) -> DataFrame:
    """Per-doc repetition report: :func:`repetition_columns` projected
    alongside the id — see that function for semantics and the scale
    argument."""
    c = repetition_columns(
        F.col(text_col), max_bigram_cover, max_dup_trigram
    )
    return df.select(
        F.col(id_col),
        c["n_tokens"].alias("n_tokens"),
        c["top_bigram_cover"].alias("top_bigram_cover"),
        c["dup_trigram_frac"].alias("dup_trigram_frac"),
        c["keep"].alias("keep"),
    )


def repetition_scores_sql(
    max_bigram_cover: float = 0.2,
    max_dup_trigram: float = 0.3,
    source: str = "documents",
) -> str:
    from homelogging_spark.functions.texthash import tokens_sql

    return f"""
WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS t FROM {source}),
m AS (
  SELECT doc_id, len(t) AS n,
         CASE WHEN len(t) >= 2 THEN
           list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])
         ELSE [] END AS big,
         CASE WHEN len(t) >= 3 THEN
           list_transform(range(len(t) - 2),
                          i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
         ELSE [] END AS tri
  FROM toks
),
bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(big) AS g FROM m) GROUP BY 1, 2
),
mx AS (SELECT doc_id, max(c) AS best FROM bc GROUP BY 1),
s AS (
  SELECT m.doc_id, m.n,
         CASE WHEN m.n >= 2 THEN 2.0 * mx.best / m.n ELSE 0.0 END AS cover,
         CASE WHEN m.n >= 3 THEN
           1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / (m.n - 2)
         ELSE 0.0 END AS dup_tri
  FROM m LEFT JOIN mx USING (doc_id)
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       cover AS top_bigram_cover,
       dup_tri AS dup_trigram_frac,
       (cover <= {max_bigram_cover} AND dup_tri <= {max_dup_trigram}) AS keep
FROM s
"""


# PII patterns — identical semantics in Java regex (Spark) and RE2
# (DuckDB): ASCII classes, bounded repetition, \b word boundaries only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_ORDER = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_PHONE, "<PHONE>"),
    (PII_IPV4, "<IP>"),
)


def pii_columns(text: Column) -> dict[str, Column]:
    """Column-level PII pieces (counts per class + redacted text) so a
    panel can fold them into ONE map-side projection alongside other
    text signals — the ``quality_columns`` pattern."""
    redacted = text
    for pat, tag in _PII_ORDER:
        redacted = F.regexp_replace(redacted, pat, tag)
    return {
        "n_emails": F.size(
            F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))
        ).cast("bigint"),
        "n_phones": F.size(
            F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))
        ).cast("bigint"),
        "n_ips": F.size(
            F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))
        ).cast("bigint"),
        "redacted": redacted,
    }


def pii_columns_sql(expr: str) -> dict[str, str]:
    redacted = expr
    for pat, tag in _PII_ORDER:
        redacted = f"regexp_replace({redacted}, '{pat}', '{tag}', 'g')"
    return {
        "n_emails": f"CAST(len(regexp_extract_all({expr}, '{PII_EMAIL}')) AS BIGINT)",
        "n_phones": f"CAST(len(regexp_extract_all({expr}, '{PII_PHONE}')) AS BIGINT)",
        "n_ips": f"CAST(len(regexp_extract_all({expr}, '{PII_IPV4}')) AS BIGINT)",
        "redacted": redacted,
    }


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII detection + redaction over a text column: counts per class
    (email, phone, IPv4) and the redacted text with class placeholders,
    applied in a fixed order so overlapping matches resolve
    deterministically. Every real training-corpus pipeline runs a pass
    like this before release (C4/Dolma-style scrubbing); the regexes are
    deliberately simple ASCII patterns with identical Java-regex/RE2
    semantics so the oracle replicates them bit-for-bit.

    Scale: pure map-side column expressions (regexp_extract_all /
    regexp_replace inside codegen) — zero shuffle, no UDF.
    Mirrors ``pii_scrub_sql``."""
    cols = pii_columns(F.col(text_col))
    return df.select(
        F.col(id_col), *(c.alias(name) for name, c in cols.items())
    )


def pii_scrub_sql(source: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    cols = pii_columns_sql(text_col)
    sel = ",\n       ".join(f"{sql} AS {name}" for name, sql in cols.items())
    return f"""
SELECT {id_col},
       {sel}
FROM {source}
"""


def dedup_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4/CCNet-style intra-document line deduplication: split on
    newline, keep the FIRST occurrence of each distinct line in
    original order, re-join. Web-scraped docs repeat navigation chrome,
    cookie banners, and share buttons many times per page; dropping
    repeated lines inside the doc is the standard cleanup pass (C4,
    Raffel et al. 2020 §2.2 dropped non-sentence/boilerplate lines;
    CCNet dedups at paragraph granularity) that runs BEFORE corpus-wide
    dedup — it shrinks the text the shingle/MinHash tiers must hash.

    Scale: pure map-side column expressions (``split`` →
    ``array_distinct`` → ``array_join``) — zero shuffle, no UDF, and
    ``array_distinct`` is documented first-occurrence-order-preserving
    (the SQL twin replicates that with an index-aware list
    comprehension). Returns per doc: line counts, the deduped text, and
    the kept-fraction; callers selecting only the counts let Catalyst
    prune the rebuilt text away."""
    lines = F.split(F.col(text_col), "\n")
    uniq = F.array_distinct(lines)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(uniq).cast("bigint").alias("n_unique_lines"),
        F.array_join(uniq, "\n").alias("line_deduped"),
    )


def dedup_lines_sql(source: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`dedup_lines` — first-occurrence order via
    ``list_filter`` with the element's index against ``list_position``
    (the first index at which the element appears)."""
    lines = f"str_split({text_col}, chr(10))"
    uniq = f"list_filter({lines}, (x, i) -> list_position({lines}, x) = i)"
    return f"""
SELECT {id_col},
       CAST(len({lines}) AS BIGINT) AS n_lines,
       CAST(len({uniq}) AS BIGINT) AS n_unique_lines,
       array_to_string({uniq}, chr(10)) AS line_deduped
FROM {source}
"""


# --- model-based quality filtering (r15) --------------------------------------
#
# The pipeline stage downstream of the HEURISTIC signals above: modern
# corpus builds (DCLM, FineWeb-style) train a small classifier on those
# signals and filter on its score. The ENGINE's job is the application
# machinery — computing the score JVM-side over the existing feature
# columns and treating the trained weights as versioned CONFIG, exactly
# the tokenize.MERGE_VERSIONS design ("model upgrades are data changes
# with an audit row"). Weights here are deterministic hand-set
# stand-ins; a real deployment drops its trained coefficients into a
# new version and the audit digest records which model filtered what.
#
# The score is the raw LOGIT (bias + Σ w·x, folded in sorted feature
# order): +, * only — bit-identical on any IEEE engine, unlike a
# sigmoid whose libm exp differs in the last ulp across engines. The
# keep decision is score >= 0 (the 0.5-probability threshold folded
# into the bias), so calibration lives with the consumer.

QUALITY_MODEL_VERSIONS: dict[int, dict] = {
    # v1: fluency-positive, boilerplate-negative — signs follow the
    # Gopher/C4 rules the heuristic tier implements
    1: {
        "bias": -1.0,
        "weights": {
            "dup_trigram_frac": -2.0,
            "len_saturation": 1.5,
            "mean_token_len": 0.2,
            "punct_ratio": -5.0,
            "stopword_ratio": 4.0,
            "top_bigram_cover": -3.0,
        },
    },
}

CURRENT_QUALITY_MODEL = 1

# feature name -> builders. Spark side takes the text Column; SQL side
# takes the text expression string. len_saturation is the bounded
# length signal quality_columns uses inside its heuristic score.
_MODEL_FEATURES = (
    "dup_trigram_frac",
    "len_saturation",
    "mean_token_len",
    "punct_ratio",
    "stopword_ratio",
    "top_bigram_cover",
)


def model_for(version: int = CURRENT_QUALITY_MODEL) -> dict:
    """The (bias, weights) config for ``version``; refuses unknown
    versions instead of silently scoring with the wrong model."""
    if version not in QUALITY_MODEL_VERSIONS:
        raise ValueError(
            f"unknown quality model version {version}; have "
            f"{sorted(QUALITY_MODEL_VERSIONS)}"
        )
    m = QUALITY_MODEL_VERSIONS[version]
    missing = set(m["weights"]) ^ set(_MODEL_FEATURES)
    if missing:
        raise ValueError(f"model v{version} feature mismatch: {missing}")
    return m


def model_audit(version: int = CURRENT_QUALITY_MODEL) -> dict:
    """The manifest row recording WHICH model filtered a corpus build:
    version, feature count, and a content digest over the canonical
    (feature, weight) listing — two manifests claiming the same version
    are provably the same coefficients."""
    import hashlib

    m = model_for(version)
    canon = f"bias {m['bias']!r}\n" + "\n".join(
        f"{f} {m['weights'][f]!r}" for f in sorted(m["weights"])
    )
    return {
        "model_version": int(version),
        "n_features": len(m["weights"]),
        "model_md5": hashlib.md5(canon.encode()).hexdigest(),
    }


def model_dim(spark) -> "DataFrame":
    """Every model version as one joinable/broadcastable config dim:
    ``(model_version int, feature string, weight double)`` with the
    bias as feature ``__bias__`` — dim-sized; write it next to the
    corpus manifest so any historical keep decision is re-derivable."""
    rows = []
    for v in sorted(QUALITY_MODEL_VERSIONS):
        m = model_for(v)
        rows.append((v, "__bias__", float(m["bias"])))
        rows += [
            (v, f, float(m["weights"][f])) for f in sorted(m["weights"])
        ]
    return spark.createDataFrame(
        rows, "model_version int, feature string, weight double"
    )


def _model_feature_columns(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """The six model features, expression-for-expression the
    ``quality_columns`` / ``repetition_columns`` definitions (the SQL
    twin mirrors those, so the formulas here must not drift). Pass
    ``toks`` to build every token-derived feature from an ALREADY
    STAGED token array column instead of re-embedding ``tokens(text)``
    in each — see :func:`classifier_quality_filter` for why."""
    from homelogging_spark.functions.texthash import word_shingles

    t = tokens(text) if toks is None else toks
    n = F.size(t)
    tok_chars = F.aggregate(
        F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x
    )
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    big = F.array_sort(word_shingles(t, 2, distinct=False))
    tri = word_shingles(t, 3, distinct=False)

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(
        big,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )
    return {
        "dup_trigram_frac": F.when(
            n >= 3, F.lit(1.0) - F.size(F.array_distinct(tri)) / (n - 2)
        ).otherwise(F.lit(0.0)),
        "len_saturation": F.least(
            F.lit(1.0), n.cast("double") / F.lit(100.0)
        ),
        # try_divide: a degenerate doc (zero tokens / zero chars) must
        # yield NULL ratios like the DuckDB twin — plain `/` under
        # Spark 4's default ANSI mode would CRASH the corpus job on
        # the first empty doc (r15 ADVICE textops.py:862)
        "mean_token_len": F.try_divide(tok_chars, n),
        "punct_ratio": F.try_divide(n_punct, n_chars),
        "stopword_ratio": F.try_divide(stopword_hits(t, "en"), n),
        "top_bigram_cover": F.when(
            n >= 2, F.lit(2.0) * best / n
        ).otherwise(F.lit(0.0)),
    }


def classifier_score_columns(
    text: Column, version: int = CURRENT_QUALITY_MODEL
) -> dict[str, Column]:
    """``score`` (the logit, folded bias-first then sorted feature
    order — the exact bracketing the SQL twin replays) and ``kept``
    (score >= 0, null-safe: a degenerate doc's NULL logit reads as
    dropped — see ``classifier_quality_filter``)."""
    m = model_for(version)
    feats = _model_feature_columns(text)
    score = F.lit(float(m["bias"]))
    for f in sorted(m["weights"]):
        score = score + F.lit(float(m["weights"][f])) * feats[f]
    return {
        "score": score,
        "kept": F.coalesce(score >= F.lit(0.0), F.lit(False)),
    }


def classifier_quality_filter(
    df: DataFrame,
    version: int = CURRENT_QUALITY_MODEL,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality filter: zero-shuffle projections emitting
    each document's logit score and keep verdict under the given model
    version (stamped per row — a corpus built across a model upgrade
    stays auditable). At 100 TB this is a pure map over the corpus
    scan, same as the heuristic tier it consumes.

    STAGED on purpose (same lesson as the tsmatch scoring restage,
    SCALE.md r15), and staged so that Catalyst KEEPS the stage: an
    alias referenced only once gets inlined by CollapseProject, which
    is exactly what un-staged a naive per-feature projection here and
    left ~20 copies of ``tokens(text)`` inside ``when`` branches
    (where codegen subexpression elimination cannot reach). The token
    array is aliased ONCE and referenced by every token-derived
    feature — a multiply-referenced non-cheap alias survives
    CollapseProject — and the score alias is likewise referenced
    twice (kept + the consumer's quantize). Measured 15 s → ~1 s at
    sf0.1 under the noop full-materialization protocol."""
    m = model_for(version)
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    feats = _model_feature_columns(F.col("__text"), toks=F.col("__toks"))
    score = F.lit(float(m["bias"]))
    for f in sorted(m["weights"]):
        score = score + F.lit(float(m["weights"][f])) * feats[f]
    return staged.select(
        F.col(id_col),
        F.lit(int(version)).alias("model_version"),
        score.alias("score"),
        # null-safe keep verdict (r15 ADVICE): a degenerate doc (zero
        # tokens or zero chars) has NULL ratio features hence a NULL
        # logit — it must be deterministically DROPPED, not emit a NULL
        # verdict downstream gates fall through; the score stays NULL
        # (honest: the model genuinely has no opinion)
    ).withColumn("kept", F.coalesce(F.col("score") >= F.lit(0.0), F.lit(False)))


def _top_bigram_cover_sql(toks: str) -> str:
    """Scalar-expression twin of ``repetition_columns``' bigram cover
    (the panel oracle's group-by form needs a whole CTE chain; the
    classifier needs it as ONE expression). best is an integer count —
    identical however it is computed — and the 2.0*best/n bracketing
    matches the Spark side."""
    from homelogging_spark.functions.texthash import word_shingles_sql

    big = word_shingles_sql(toks, 2, distinct=False)
    best = (
        f"list_max(list_transform(list_distinct({big}), "
        f"g -> len(list_filter({big}, x -> x = g))))"
    )
    return (
        f"CASE WHEN len({toks}) >= 2 THEN 2.0 * ({best}) / len({toks}) "
        f"ELSE 0.0 END"
    )


def _dup_trigram_frac_sql(toks: str) -> str:
    """Scalar-expression twin of ``repetition_columns``' duplicate
    trigram fraction."""
    from homelogging_spark.functions.texthash import word_shingles_sql

    tri = word_shingles_sql(toks, 3, distinct=False)
    return (
        f"CASE WHEN len({toks}) >= 3 THEN "
        f"1.0 - CAST(len(list_distinct({tri})) AS DOUBLE) / (len({toks}) - 2) "
        f"ELSE 0.0 END"
    )


def classifier_score_sql(
    expr: str, version: int = CURRENT_QUALITY_MODEL
) -> dict[str, str]:
    """DuckDB twin of :func:`classifier_score_columns` — identical
    feature expressions and identical fold order, so the logit is
    bit-for-bit."""
    m = model_for(version)
    q = quality_columns_sql(expr)
    toks = tokens_sql(expr)
    feats = {
        "dup_trigram_frac": _dup_trigram_frac_sql(toks),
        "len_saturation": f"least(1.0, CAST(len({toks}) AS DOUBLE) / 100.0)",
        "mean_token_len": q["mean_token_len"],
        "punct_ratio": q["punct_ratio"],
        "stopword_ratio": q["stopword_ratio"],
        "top_bigram_cover": _top_bigram_cover_sql(toks),
    }
    score = f"CAST({m['bias']!r} AS DOUBLE)"
    for f in sorted(m["weights"]):
        score = f"({score} + CAST({m['weights'][f]!r} AS DOUBLE) * ({feats[f]}))"
    # kept is null-safe exactly like the Spark side: degenerate docs
    # (NULL logit) read as dropped, score itself stays NULL
    return {"score": score, "kept": f"COALESCE(({score}) >= 0.0, FALSE)"}


# --- n-gram LM perplexity filter (r19 runway, CCNet stage) --------------------

def ngram_lm_counts(
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Train the bigram language-model statistics a CCNet-style
    perplexity filter scores against (Wenzek et al. 2020 use a KenLM
    5-gram; the add-k-smoothed bigram here is the same *stage* with a
    self-contained, oracle-replayable model): from a REFERENCE corpus
    (the high-quality slice perplexity is measured relative to),
    produce

    - ``bigrams``: (w1, w2, c) — adjacent-token pair counts;
    - ``contexts``: (w1, c) — context counts, DERIVED as the sum of the
      kept bigram counts per w1 so the conditional is exactly
      normalized against the same table the scorer joins;
    - ``stats``: one row (n_vocab) — distinct context types, the V in
      add-k smoothing.

    ``min_count`` is the 100 TB table-size dial: hapax bigrams (the
    Heaps-tail mass of a web corpus) are dropped BEFORE the context
    sum, so the model stays self-consistent under the cut. Scale
    shape: one reference scan → explode to pairs (map-side) → one
    partial-agg shuffle on (w1, w2); the context table and stats fold
    from the bounded bigram table. The artifacts are
    maintenance-friendly the same way BM25's (dfreq, stats) are —
    additive across doc-disjoint batches (each bigram occurrence
    counts once): ``streaming.pipeline.start_ngram_lm_stream``
    maintains the raw-count state incrementally and
    :func:`ngram_lm_from_state` loads it with the cut applied
    consistently, pinned score-identical to this batch trainer."""
    from homelogging_spark.functions.texthash import tokens

    toks = tokens(F.col(text_col))
    pairs = (
        ref_docs.select(toks.alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda p: F.struct(
                        F.element_at(F.col("__toks"), p).alias("w1"),
                        F.element_at(F.col("__toks"), p + 1).alias("w2"),
                    ),
                )
            ).alias("pair")
        )
        .select("pair.w1", "pair.w2")
    )
    bigrams = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .where(F.col("c") >= min_count)
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("c").cast("bigint").alias("c"))
    stats = contexts.agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab"))
    return {"bigrams": bigrams, "contexts": contexts, "stats": stats}


def ngram_lm_from_state(
    spark,
    state_path: str,
    min_count: int = 1,
    verify_corpus: DataFrame | None = None,
    id_col: str = "doc_id",
) -> dict:
    """Load a :func:`streaming.pipeline.start_ngram_lm_stream` state
    generation into the dict :func:`ngram_lm_score` consumes. The
    state stores RAW bigram counts (``min_count`` is not additive-safe
    across micro-batches — a pair cut per batch could cross the
    threshold globally), so the cut is applied HERE, and the contexts
    table and n_vocab derive from the CUT table — exactly the
    self-consistency :func:`ngram_lm_counts` guarantees, so a
    state-loaded model scores row-identically to the batch-trained one
    over the same reference corpus (pinned in ``TestNgramLmStream``).
    Both state layouts load transparently (the r19 hash-partitioned
    layout adds `part`/`pmax` bookkeeping columns, projected away
    here); a partitioned state interrupted between swap renames is
    repaired before reading, the same restore the merger runs.

    ``verify_corpus`` (r19 — the ``bm25_topk(verify_state=True)``
    discipline applied to the LM tier): pass the reference-corpus
    frame the statistics are SUPPOSED to describe, and the load
    compares the state generation's fingerprint (n_docs + the
    order-insensitive md5-XOR digest of doc ids) against it with one
    1-row aggregate, raising on mismatch — a state that lags or leads
    the reference slice fails loudly instead of silently shifting
    every conditional probability. Opt-in for the same reason BM25's
    is: scoring against statistics trained on a DIFFERENT (larger,
    frozen) reference corpus is the normal CCNet posture, and must
    stay expressible — without verification, by design."""
    import os

    from homelogging_spark.streaming.pipeline import (
        _read_state_stats,
        _repair_partitioned_state,
    )

    _repair_partitioned_state(spark, state_path, "bigrams")
    if verify_corpus is not None:
        state = _read_state_stats(spark, state_path)
        if state is None:
            raise ValueError(
                f"ngram-lm state at {state_path} has no committed stats "
                "generation to verify against"
            )
        if state.get("corpus_digest") is None:
            raise ValueError(
                "verify_corpus given but the state carries no "
                "corpus_digest (a merge over legacy state propagated "
                "the unknown); rebuild the state or load without "
                "verification"
            )
        got = verify_corpus.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(
                F.bit_xor(corpus_digest_col(F.col(id_col))), F.lit(0)
            ).alias("digest"),
        ).collect()[0]
        if int(state["n_docs"]) != int(got.n) or int(
            state["corpus_digest"]
        ) != int(got.digest):
            raise ValueError(
                f"ngram-lm state/corpus drift: state covers "
                f"n_docs={int(state['n_docs'])} "
                f"(digest={int(state['corpus_digest'])}) but the "
                f"reference frame has n={int(got.n)} "
                f"(digest={int(got.digest)}); the served conditionals "
                "would not describe this reference corpus. Re-run the "
                "LM stats stream, or load without verify_corpus if "
                "scoring against a frozen external reference is "
                "intended."
            )
    bigrams = (
        spark.read.parquet(os.path.join(state_path, "bigrams"))
        .select("w1", "w2", "c")
        .where(F.col("c") >= min_count)
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("c").cast("bigint").alias("c"))
    stats = contexts.agg(F.count(F.lit(1)).cast("bigint").alias("n_vocab"))
    return {"bigrams": bigrams, "contexts": contexts, "stats": stats}


def bm25_from_state(spark, state_path: str) -> dict:
    """Load a :func:`streaming.pipeline.bm25_stats_batch_merger` state
    generation into the ``(dfreq, stats)`` frames :func:`bm25_topk`
    serves from — THE load path for external consumers (r20, r19
    ADVICE #1). The point of the function is the repair-on-read
    guarantee: a partitioned state interrupted between a partition's
    two swap renames (live dir missing, trash holding the last
    committed generation) is restored BEFORE reading — the same
    ``_repair_partitioned_state`` the merger runs — where a raw
    ``spark.read.parquet(state + "/dfreq")`` would silently drop that
    partition's terms (and ``verify_state=True`` would still pass,
    because n_docs/digest live in the untouched stats row). Legacy
    whole-generation-swap states repair through the same call. Both
    layouts load transparently: the partitioned layout's ``part`` /
    ``pmax`` bookkeeping columns are projected away here."""
    import os

    from homelogging_spark.streaming.pipeline import _repair_partitioned_state

    _repair_partitioned_state(spark, state_path, "dfreq")
    return {
        "dfreq": spark.read.parquet(
            os.path.join(state_path, "dfreq")
        ).select("term", "df"),
        "stats": spark.read.parquet(os.path.join(state_path, "stats")),
    }


def ngram_lm_score(
    docs: DataFrame,
    lm: dict,
    k: float = 0.5,
    ppl_threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram perplexity against :func:`ngram_lm_counts`
    statistics — the LM-based member of the quality-stage family
    (heuristic ``quality_columns`` → versioned linear
    ``classifier_quality_filter`` → this, the CCNet design: documents
    whose perplexity under a reference-corpus LM is high read as far
    from the reference distribution).

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` (add-k smoothing —
    closed-form, no backoff state, so the DuckDB twin replays it
    exactly); ``nll`` = mean −ln P over the doc's bigrams; ``ppl`` =
    exp(nll). Documents with fewer than two tokens emit
    ``n_bigrams=0`` with NULL nll/ppl and ``keep=true`` (no evidence
    against them — the classifier stage's null-safety convention,
    inverted deliberately: a degenerate doc is the LENGTH gate's job,
    not the LM's). With ``ppl_threshold`` set, ``keep = ppl <= t``.

    Determinism: nll sums libm ``ln`` terms, so the emitted nll/ppl
    are QUANTIZED (the bm25 score discipline — quantize rounds away
    both the last-ulp libm disagreement and the sub-1e-12 float
    summation-order noise at document lengths).

    Scale shape: pairs derive map-side from each doc row; the score is
    two hash joins against the bounded LM tables (broadcast when the
    model fits — a min_count-cut bigram table usually does; Spark
    picks by size) + one partial-agg shuffle on the doc id. The
    corpus is scanned once; nothing corpus-sized is ever collected."""
    from homelogging_spark.functions.numeric import quantize
    from homelogging_spark.functions.texthash import tokens

    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, "__toks", (F.size("__toks") - 1).alias("__n_pairs")
    )
    pairs = base.where(F.col("__n_pairs") >= 1).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n_pairs")),
                lambda p: F.struct(
                    F.element_at(F.col("__toks"), p).alias("w1"),
                    F.element_at(F.col("__toks"), p + 1).alias("w2"),
                ),
            )
        ).alias("pair"),
    ).select(id_col, "pair.w1", "pair.w2")
    joined = (
        pairs.join(
            lm["bigrams"].withColumnRenamed("c", "__c12"), ["w1", "w2"], "left"
        )
        .join(lm["contexts"].withColumnRenamed("c", "__c1"), ["w1"], "left")
        .crossJoin(F.broadcast(lm["stats"]))
    )
    nlp = -(
        F.log(F.coalesce(F.col("__c12"), F.lit(0)).cast("double") + F.lit(float(k)))
        - F.log(
            F.coalesce(F.col("__c1"), F.lit(0)).cast("double")
            + F.lit(float(k)) * F.col("n_vocab").cast("double")
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.avg(nlp).alias("__nll"),
    )
    sel = [
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias(
            "n_bigrams"
        ),
        quantize("__nll").alias("nll"),
        quantize(F.exp(F.col("__nll"))).alias("ppl"),
    ]
    if ppl_threshold is not None:
        sel.append(
            F.coalesce(
                quantize(F.exp(F.col("__nll")))
                <= F.lit(float(ppl_threshold)),
                F.lit(True),
            ).alias("keep")
        )
    return base.select(id_col, "__n_pairs").join(scored, id_col, "left").select(*sel)


def ngram_lm_score_sql(
    ref_source: str,
    score_source: str,
    k: float = 0.5,
    ppl_threshold: float | None = None,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`ngram_lm_counts` + :func:`ngram_lm_score`
    — identical smoothing arithmetic, identical quantization, so the
    emitted (n_bigrams, nll, ppl, keep) hash-match."""
    from homelogging_spark.functions.numeric import quantize_sql
    from homelogging_spark.functions.texthash import tokens_sql

    toks = tokens_sql(text_col)
    keep_sql = (
        ""
        if ppl_threshold is None
        else f", COALESCE({quantize_sql('exp(__nll)')} <= {float(ppl_threshold)!r}, TRUE) AS keep"
    )
    return f"""
WITH ref_pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM (SELECT {toks} AS t FROM {ref_source}) r,
       LATERAL unnest(range(1, len(t))) u(i)
  WHERE len(t) >= 2
),
bigrams AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM ref_pairs
  GROUP BY 1, 2 HAVING count(*) >= {int(min_count)}
),
contexts AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c FROM bigrams GROUP BY 1),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab FROM contexts),
base AS (
  SELECT {id_col}, {toks} AS t, len({toks}) - 1 AS n_pairs
  FROM {score_source}
),
doc_pairs AS (
  SELECT {id_col}, t[i] AS w1, t[i+1] AS w2
  FROM base, LATERAL unnest(range(1, len(t))) u(i)
  WHERE n_pairs >= 1
),
scored AS (
  SELECT p.{id_col},
         CAST(count(*) AS BIGINT) AS n_bigrams,
         avg(-(ln(COALESCE(b.c, 0) + {float(k)!r})
               - ln(COALESCE(cx.c, 0) + {float(k)!r} * s.n_vocab))) AS __nll
  FROM doc_pairs p
  LEFT JOIN bigrams b USING (w1, w2)
  LEFT JOIN contexts cx USING (w1)
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT base.{id_col},
       COALESCE(scored.n_bigrams, 0) AS n_bigrams,
       {quantize_sql('__nll')} AS nll,
       {quantize_sql('exp(__nll)')} AS ppl{keep_sql}
FROM base LEFT JOIN scored USING ({id_col})
"""
