"""LLM-data-pipeline queries: dedup, text analysis, similarity search,
multimodal — the training-corpus tier over ``documents`` / ``embeddings``.

Every query has a DuckDB oracle that replicates the *same algorithm*
bit-for-bit (md5-derived hashing, literal hyperplanes, sequential double
folds — see ``functions/texthash.py`` and ``operators/similarity.py``),
so the driver's hash gate verifies signatures and bucket assignments,
not just row counts.

Dtype rule: every integer output is CAST to BIGINT on both sides; every
float output goes through ``quantize``/``quantize_sql``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from homelogging_spark.functions.numeric import quantize, quantize_sql
from homelogging_spark.functions.texthash import (
    band_hashes_sql,
    char_ngrams_sql,
    minhash_from_base_sql,
    shingle_base_hash_sql,
    simhash16_sql,
    token_md5_sql,
    tokens,
    tokens_sql,
    word_shingles_sql,
)
from homelogging_spark.operators import clustering, dedup, multimodal, similarity, textops
from homelogging_spark.tables import load_table, spread

EMB_DIM = 64
N_QUERY_VECS = 5  # vec_id < 5 are the query set; the rest are the corpus


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across cores — every query here is CPU-bound
    per-row hashing/regex work, not I/O (see ``tables.spread``)."""
    return spread(load_table(spark, sf_dir, "documents"))


# --- text analysis -----------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (r6 merge: subsumes the former
    per-doc ``token_counts`` driver query). RETIRED from the registry
    in r15 — `text_quality_panel`'s ``panel='lang'`` leg now certifies
    these columns verbatim (consolidation funding the `sq8_topk`
    registration); kept as a library operator and for the unit suite.
    Per-doc grain stays unit-tested in
    ``test_llm_ops.TestQualityAndTokens``."""
    docs = _docs(spark, sf_dir)
    out = textops.corpus_stats(docs, "text", "lang", include_bpe=True)
    return out.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "total_chars",
        quantize("avg_chars").alias("avg_chars"),
        quantize("avg_tokens").alias("avg_tokens"),
        quantize("median_chars").alias("median_chars"),
        "total_bpe_tokens",
        quantize("avg_bpe_tokens").alias("avg_bpe_tokens"),
    )


ORACLE_TEXT_STATS = f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       {quantize_sql('avg(length(text))')} AS avg_chars,
       {quantize_sql(f'avg(len({tokens_sql("text")}))')} AS avg_tokens,
       {quantize_sql('quantile_cont(length(text), 0.5)')} AS median_chars,
       CAST(sum({textops.bpe_ish_token_count_sql('text')}) AS BIGINT) AS total_bpe_tokens,
       {quantize_sql(f'avg({textops.bpe_ish_token_count_sql("text")})')} AS avg_bpe_tokens
FROM documents GROUP BY 1
"""


def q_text_clean_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-cleaning panel — PII scrub (``textops.pii_scrub``, the
    absorbed r11 `pii_scrub` row) + C4/CCNet intra-document line dedup
    (``textops.dedup_lines``) certified in ONE zero-shuffle projection.
    Both inputs are SYNTHESIZED deterministically (the sources-registry
    pattern — both engines build the identical payload): PII tokens
    concatenated for the scrub leg; duplicated boilerplate lines
    (repeated newsletter/share chrome around the doc body, the
    web-scrape shape) for the line-dedup leg. Each leg's exact output
    text is hash-checked via md5. Scale: synthesis, scan, scrub, and
    line dedup are all map-side column expressions — zero shuffle, no
    UDF; at 100 TB the scan dominates, which is the right bottleneck."""
    docs = _docs(spark, sf_dir)
    nl = F.lit("\n")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" now."),
        ).alias("pii_text"),
        F.concat(
            F.lit("Subscribe to our newsletter"), nl,
            F.col("text"), nl,
            F.lit("Share this article"), nl,
            F.lit("Subscribe to our newsletter"), nl,
            F.col("text"), nl,
            F.lit("Copyright Example Corp"),
        ).alias("line_text"),
    )
    pii = textops.pii_columns(F.col("pii_text"))
    lines = F.split(F.col("line_text"), "\n")
    uniq = F.array_distinct(lines)
    deduped = F.array_join(uniq, "\n")
    return aug.select(
        "doc_id",
        pii["n_emails"].alias("n_emails"),
        pii["n_phones"].alias("n_phones"),
        pii["n_ips"].alias("n_ips"),
        F.length(pii["redacted"]).cast("bigint").alias("n_chars_redacted"),
        F.md5(F.encode(pii["redacted"], "UTF-8")).alias("redacted_md5"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(uniq).cast("bigint").alias("n_unique_lines"),
        F.md5(F.encode(deduped, "UTF-8")).alias("line_deduped_md5"),
    )


_PII_AUG_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' now.'"
)

_LINE_AUG_SQL = (
    "'Subscribe to our newsletter' || chr(10) || text || chr(10)"
    " || 'Share this article' || chr(10)"
    " || 'Subscribe to our newsletter' || chr(10) || text || chr(10)"
    " || 'Copyright Example Corp'"
)


def _text_clean_panel_oracle() -> str:
    pii = textops.pii_columns_sql("pii_text")
    lines = "str_split(line_text, chr(10))"
    uniq = f"list_filter({lines}, (x, i) -> list_position({lines}, x) = i)"
    return f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_SQL} AS pii_text, {_LINE_AUG_SQL} AS line_text
  FROM documents
)
SELECT doc_id,
       {pii['n_emails']} AS n_emails,
       {pii['n_phones']} AS n_phones,
       {pii['n_ips']} AS n_ips,
       CAST(length({pii['redacted']}) AS BIGINT) AS n_chars_redacted,
       md5({pii['redacted']}) AS redacted_md5,
       CAST(len({lines}) AS BIGINT) AS n_lines,
       CAST(len({uniq}) AS BIGINT) AS n_unique_lines,
       md5(array_to_string({uniq}, chr(10))) AS line_deduped_md5
FROM aug
"""


ORACLE_TEXT_CLEAN_PANEL = _text_clean_panel_oracle()


def q_text_quality_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality panel — the r11 merge of `language_id` and
    `quality_score` (which itself absorbed `repetition_scores` in r7),
    r15-widened with the per-language corpus-stats leg of the retired
    `text_stats` row (window-slot consolidation per the COVERAGE.md
    registry-growth policy, funding the `sq8_topk` registration):

    - ``panel='doc'``: per-doc language-ID prediction + agreement, the
      length/stopword/punct quality columns, AND the Gopher repetition
      gate — one zero-shuffle projection over the corpus scan (the
      same shape each leg had separately; Catalyst
      subexpression-shares the token array);
    - ``panel='lang'``: the per-language aggregate stats (docs, chars,
      whitespace AND BPE-ish token sums — any per-doc counting error
      surfaces in the sums), one bounded-key partial-agg shuffle.

    The battery_panel discriminator convention: every output column of
    both former rows appears verbatim under its leg, so one row set
    certifies both at full fidelity."""
    docs = _docs(spark, sf_dir)
    # r21 (guide §4 per-row work): STAGE the token array and the
    # language-ID verdict as materialized columns — the former single
    # projection re-embedded the tokenize subtree in every signal
    # family and evaluated the language_id CASE tree twice (pred_lang
    # + agree). Higher-order array functions are CodegenFallback
    # (interpreted), so expression-tree duplication is paid per row at
    # execution, not folded by codegen; CollapseProject keeps
    # multi-referenced non-cheap aliases staged.
    staged = docs.select(
        "doc_id",
        "lang",
        "text",
        tokens(F.col("text")).alias("__toks"),
    )
    toks = F.col("__toks")
    cols = textops.quality_columns(F.col("text"), toks=toks)
    rep = textops.repetition_columns(F.col("text"), toks=toks)
    scored = staged.select(
        "doc_id",
        "lang",
        textops.language_id(toks).alias("__pred"),
        cols["n_tokens"].cast("bigint").alias("__n_tokens"),
        quantize(cols["mean_token_len"]).alias("__mean_token_len"),
        quantize(cols["stopword_ratio"]).alias("__stopword_ratio"),
        quantize(cols["punct_ratio"]).alias("__punct_ratio"),
        quantize(cols["quality_score"]).alias("__quality_score"),
        quantize(rep["top_bigram_cover"]).alias("__top_bigram_cover"),
        quantize(rep["dup_trigram_frac"]).alias("__dup_trigram_frac"),
        rep["keep"].alias("__rep_keep"),
    )
    # n/a encoding per dtype: doubles carry typed NULLs (the
    # battery_panel-proven shape — null doubles hash identically on
    # both engines), while strings/booleans/bigints carry explicit
    # sentinels ('' / FALSE / -1): a null in those dtypes degrades the
    # pandas/driver comparison to object columns whose None-vs-NaN
    # coercion is engine-dependent. The panel discriminator governs
    # which columns are meaningful on a row.
    nd = F.lit(None).cast("double")
    na_b = F.lit(-1).cast("bigint")
    doc_leg = scored.select(
        F.lit("doc").alias("panel"),
        F.col("doc_id"),
        F.col("__pred").alias("pred_lang"),
        F.col("lang").alias("label_lang"),
        (F.col("__pred") == F.col("lang")).alias("agree"),
        F.col("__n_tokens").alias("n_tokens"),
        F.col("__mean_token_len").alias("mean_token_len"),
        F.col("__stopword_ratio").alias("stopword_ratio"),
        F.col("__punct_ratio").alias("punct_ratio"),
        F.col("__quality_score").alias("quality_score"),
        F.col("__top_bigram_cover").alias("top_bigram_cover"),
        F.col("__dup_trigram_frac").alias("dup_trigram_frac"),
        F.col("__rep_keep").alias("rep_keep"),
        na_b.alias("n_docs"),
        na_b.alias("total_chars"),
        nd.alias("avg_chars"),
        nd.alias("avg_tokens"),
        nd.alias("median_chars"),
        na_b.alias("total_bpe_tokens"),
        nd.alias("avg_bpe_tokens"),
    )
    stats = textops.corpus_stats(docs, "text", "lang", include_bpe=True)
    lang_leg = stats.select(
        F.lit("lang").alias("panel"),
        na_b.alias("doc_id"),
        F.lit("").alias("pred_lang"),
        F.col("lang").alias("label_lang"),
        F.lit(False).alias("agree"),
        na_b.alias("n_tokens"),
        nd.alias("mean_token_len"),
        nd.alias("stopword_ratio"),
        nd.alias("punct_ratio"),
        nd.alias("quality_score"),
        nd.alias("top_bigram_cover"),
        nd.alias("dup_trigram_frac"),
        F.lit(False).alias("rep_keep"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars"),
        quantize("avg_chars").alias("avg_chars"),
        quantize("avg_tokens").alias("avg_tokens"),
        quantize("median_chars").alias("median_chars"),
        F.col("total_bpe_tokens"),
        quantize("avg_bpe_tokens").alias("avg_bpe_tokens"),
    )
    return doc_leg.unionByName(lang_leg)


_QC = textops.quality_columns_sql("text")
ORACLE_TEXT_QUALITY_PANEL = f"""
WITH rep AS (
  SELECT doc_id,
         top_bigram_cover, dup_trigram_frac, keep AS rep_keep
  FROM ({textops.repetition_scores_sql()})
), t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
)
SELECT 'doc' AS panel,
       doc_id,
       {textops.language_id_sql('toks')} AS pred_lang,
       lang AS label_lang,
       ({textops.language_id_sql('toks')} = lang) AS agree,
       CAST({_QC['n_tokens']} AS BIGINT) AS n_tokens,
       {quantize_sql(_QC['mean_token_len'])} AS mean_token_len,
       {quantize_sql(_QC['stopword_ratio'])} AS stopword_ratio,
       {quantize_sql(_QC['punct_ratio'])} AS punct_ratio,
       {quantize_sql(_QC['quality_score'])} AS quality_score,
       {quantize_sql('top_bigram_cover')} AS top_bigram_cover,
       {quantize_sql('dup_trigram_frac')} AS dup_trigram_frac,
       rep_keep,
       CAST(-1 AS BIGINT) AS n_docs,
       CAST(-1 AS BIGINT) AS total_chars,
       CAST(NULL AS DOUBLE) AS avg_chars,
       CAST(NULL AS DOUBLE) AS avg_tokens,
       CAST(NULL AS DOUBLE) AS median_chars,
       CAST(-1 AS BIGINT) AS total_bpe_tokens,
       CAST(NULL AS DOUBLE) AS avg_bpe_tokens
FROM documents JOIN rep USING (doc_id) JOIN t USING (doc_id)
UNION ALL
SELECT 'lang' AS panel,
       CAST(-1 AS BIGINT) AS doc_id,
       '' AS pred_lang,
       lang AS label_lang,
       FALSE AS agree,
       CAST(-1 AS BIGINT) AS n_tokens,
       CAST(NULL AS DOUBLE) AS mean_token_len,
       CAST(NULL AS DOUBLE) AS stopword_ratio,
       CAST(NULL AS DOUBLE) AS punct_ratio,
       CAST(NULL AS DOUBLE) AS quality_score,
       CAST(NULL AS DOUBLE) AS top_bigram_cover,
       CAST(NULL AS DOUBLE) AS dup_trigram_frac,
       FALSE AS rep_keep,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       {quantize_sql('avg(length(text))')} AS avg_chars,
       {quantize_sql(f'avg(len({tokens_sql("text")}))')} AS avg_tokens,
       {quantize_sql('quantile_cont(length(text), 0.5)')} AS median_chars,
       CAST(sum({textops.bpe_ish_token_count_sql('text')}) AS BIGINT) AS total_bpe_tokens,
       {quantize_sql(f'avg({textops.bpe_ish_token_count_sql("text")})')} AS avg_bpe_tokens
FROM documents GROUP BY lang
"""


def q_corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus assembly (``sampling.budget_select``): rank
    docs by quantized quality score (quantized so both engines rank
    from bit-identical keys; doc_id tiebreak), keep the best docs while
    the running token total stays within a fixed budget. The cumsum is
    the distributed two-pass prefix sum — the only single-task step
    touches one row per partition, never the data."""
    from homelogging_spark.operators import sampling

    docs = _docs(spark, sf_dir)
    cols = textops.quality_columns(F.col("text"))
    scored = docs.select(
        "doc_id",
        quantize(cols["quality_score"]).alias("score"),
        cols["n_tokens"].alias("n_tokens"),
    )
    out = sampling.budget_select(
        scored,
        [F.col("score").desc(), F.col("doc_id")],
        F.col("n_tokens").cast("double"),
        budget=10000.0,
    )
    return out.select(
        "doc_id",
        "score",
        "n_tokens",
        quantize("cum_weight").alias("cum_tokens"),
    )


ORACLE_CORPUS_BUDGET_SELECT = f"""
WITH q AS (
  SELECT doc_id,
         {quantize_sql(_QC['quality_score'])} AS score,
         {_QC['n_tokens']} AS n_tokens
  FROM documents
),
c AS (
  SELECT *, sum(CAST(n_tokens AS DOUBLE)) OVER (
              ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT doc_id, score, n_tokens, {quantize_sql('cum')} AS cum_tokens
FROM c WHERE cum <= 10000.0
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-importance panel at both grains — the r8 merge of the former
    ``topk_ngrams`` driver query (window-slot consolidation per the
    COVERAGE.md registry-growth policy): one result carries

    - ``scope='doc'``: per-doc top-3 tf·idf terms (idf = ln(N/df); ln is
      computed from integer-exact tf/df/N on both engines, so the
      scores agree to the quantize precision);
    - ``scope='corpus'``: the global top-25 word bigrams with their
      exact counts and ranks — the former ``topk_ngrams`` output,
      embedded verbatim (doc_id/df/tfidf NULL at corpus scope).

    Both certify the gram-aggregation path (explode → partial-agg
    shuffle on the gram). The corpus branch still compiles to
    TakeOrderedAndProject; its rank window runs AFTER the limit, over
    exactly 25 rows — bounded, not a global-window funnel."""
    docs = _docs(spark, sf_dir)
    per_doc = textops.tfidf_top_terms(docs, k=3).select(
        F.lit("doc").alias("scope"),
        F.col("doc_id"),
        "rank",
        "term",
        "tf",
        "df",
        quantize("tfidf").alias("tfidf"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("ngram"))
    corpus = (
        textops.topk_ngrams(docs, k=25, n=2)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            F.lit("corpus").alias("scope"),
            F.lit(None).cast("bigint").alias("doc_id"),
            "rank",
            F.col("ngram").alias("term"),
            F.col("n").alias("tf"),
            F.lit(None).cast("bigint").alias("df"),
            F.lit(None).cast("double").alias("tfidf"),
        )
    )
    return per_doc.unionByName(corpus)


ORACLE_TFIDF_TOP_TERMS = f"""
WITH base AS ({textops.tfidf_top_terms_sql(k=3)}),
corpus AS ({textops.topk_ngrams_sql(k=25, n=2)})
SELECT 'doc' AS scope, doc_id, rank, term, tf, df,
       {quantize_sql('tfidf')} AS tfidf
FROM base
UNION ALL
SELECT 'corpus' AS scope, CAST(NULL AS BIGINT) AS doc_id,
       CAST(row_number() OVER (ORDER BY n DESC, ngram) AS BIGINT) AS rank,
       ngram AS term, n AS tf,
       CAST(NULL AS BIGINT) AS df, CAST(NULL AS DOUBLE) AS tfidf
FROM corpus
"""


CONTAM_MOD = 25  # doc_id % 25 == 0 -> the held-out "benchmark" set
CONTAM_MIN_SHARED = 3


def q_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: corpus docs sharing >= 3 distinct word-trigram
    hashes with any held-out benchmark doc (deterministic id-mod split
    stands in for a real eval set). Candidates form only through the
    equi-join on 60-bit gram hashes — never all-pairs
    (``textops.benchmark_contamination``)."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % CONTAM_MOD == 0)
    corpus = docs.where(F.col("doc_id") % CONTAM_MOD != 0)
    return textops.benchmark_contamination(
        corpus, bench, min_shared=CONTAM_MIN_SHARED
    )


ORACLE_CONTAMINATION_SCAN = textops.benchmark_contamination_sql(
    f"SELECT doc_id, text FROM documents WHERE doc_id % {CONTAM_MOD} != 0",
    f"SELECT doc_id, text FROM documents WHERE doc_id % {CONTAM_MOD} = 0",
    min_shared=CONTAM_MIN_SHARED,
)


PSI_BIN_W = 50
PSI_NBINS = 10


def q_length_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two corpus snapshots (sources
    src0-9 vs src10-19): Population Stability Index over the doc-length
    histogram — the standard shift detector between crawl snapshots.
    Counts are exact; p/q use additive smoothing (+0.5 per bin) so the
    ln is total; per-bin contributions emitted (their sum is the PSI).
    One scan, one tiny (2 x bins) aggregate.

    r21: the totals ride a global window over the 10-bin aggregate
    instead of a separate ``counts.agg`` + broadcast cross — the
    broadcast build side re-computed the whole counts subtree, so the
    documents scan (and its per-row regexp_extract) ran TWICE per
    invocation (guide §2.4). The window is a single-partition pass
    over at most PSI_NBINS rows, bounded at any corpus scale."""
    docs = load_table(spark, sf_dir, "documents")
    snap_a = F.regexp_extract("source", r"src(\d+)", 1).cast("int") < 10
    bin_ = F.least(
        F.floor(F.col("n_chars") / PSI_BIN_W), F.lit(PSI_NBINS - 1)
    ).cast("bigint")
    counts = (
        docs.select(snap_a.alias("is_a"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        )
    )
    w_all = Window.partitionBy()
    j = counts.withColumn("ta", F.sum("n_a").over(w_all)).withColumn(
        "tb", F.sum("n_b").over(w_all)
    )
    p = (F.col("n_a") + 0.5) / (F.col("ta") + 0.5 * PSI_NBINS)
    q = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * PSI_NBINS)
    contrib = (p - q) * F.log(p / q)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        quantize(p).alias("p"),
        quantize(q).alias("q"),
        quantize(contrib).alias("psi_contrib"),
    )


ORACLE_LENGTH_DRIFT_PSI = f"""
WITH c AS (
  SELECT least(CAST(floor(n_chars / {PSI_BIN_W}) AS BIGINT), {PSI_NBINS - 1}) AS bin,
         CAST(sum(CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) < 10
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) < 10
                  THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM documents GROUP BY 1
), t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM c),
j AS (
  SELECT bin, n_a, n_b,
         (n_a + 0.5) / (ta + 0.5 * {PSI_NBINS}) AS p,
         (n_b + 0.5) / (tb + 0.5 * {PSI_NBINS}) AS q
  FROM c CROSS JOIN t
)
SELECT bin, n_a, n_b,
       {quantize_sql('p')} AS p,
       {quantize_sql('q')} AS q,
       {quantize_sql('(p - q) * ln(p / q)')} AS psi_contrib
FROM j
"""


# --- dedup -------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = dedup.exact_dedup(docs)
    return out.select(
        "doc_id",
        "content_hash",
        F.col("n_copies").cast("bigint").alias("n_copies"),
        "canonical_id",
        "is_canonical",
    )


ORACLE_EXACT_DEDUP = """
SELECT doc_id,
       md5(text) AS content_hash,
       CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS is_canonical
FROM documents
"""


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with BOTH verify metrics over one shared LSH
    candidate pass — the r8 merge of the former ``ngram_jaccard``
    driver query (window-slot consolidation per the COVERAGE.md
    registry-growth policy): every candidate pair passing either
    threshold is emitted with its word-shingle Jaccard AND its
    char-trigram Jaccard plus both verdict flags, so one driver row
    certifies both verify paths (``dedup.near_dup_pairs_dual``). The
    former single-metric outputs are exactly the ``word_dup`` /
    ``char_dup`` row subsets."""
    docs = _docs(spark, sf_dir)
    out = dedup.near_dup_pairs_dual(
        docs, word_threshold=0.7, char_threshold=0.5
    )
    return out.select(
        "doc_a",
        "doc_b",
        quantize("jaccard").alias("jaccard"),
        quantize("ngram_jaccard").alias("ngram_jaccard"),
        "word_dup",
        "char_dup",
    )


def _lsh_cte_prefix(n_hashes: int = 16, n_bands: int = 4) -> str:
    """Shared DuckDB CTE chain replicating ``dedup.band_candidate_pairs``:
    tokens -> shingles -> 60-bit base hashes (``bh``) -> MinHash signature
    -> bands -> candidate ``pairs (doc_a < doc_b)``. Every LSH-derived
    oracle (minhash verify, ngram verify, cluster assignment) appends its
    own verify/closure CTEs to this prefix."""
    rows = n_hashes // n_bands
    bands_sql = band_hashes_sql("sig", n_bands, rows)
    band_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, {expr} AS band_hash FROM sig"
        for b, expr in enumerate(bands_sql)
    )
    return f"""toks AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
sh AS (SELECT doc_id, {word_shingles_sql('toks')} AS sh FROM toks),
bh AS (SELECT doc_id, list_distinct({shingle_base_hash_sql('sh')}) AS bh FROM sh),
sig AS (SELECT doc_id, {minhash_from_base_sql('bh', n_hashes)} AS sig FROM bh),
bands AS ({band_selects}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)"""


def _minhash_near_dup_oracle(
    ngram_n: int = 3,
    word_threshold: float = 0.7,
    char_threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 4,
) -> str:
    # grams are 60-bit hashes of the char n-grams (mirrors the Spark side:
    # verify ships 8-byte ints, never gram strings). Both metrics verify
    # the SAME candidate pair set; flags compare on the raw ratios, the
    # emitted values are quantized.
    hashed_grams = f"list_distinct({shingle_base_hash_sql(char_ngrams_sql('text', ngram_n))})"
    return f"""
WITH {_lsh_cte_prefix(n_hashes, n_bands)},
g AS (SELECT doc_id, {hashed_grams} AS grams FROM documents),
v AS (
  SELECT p.doc_a, p.doc_b,
         len(list_intersect(x.bh, y.bh)) * 1.0 / len(list_distinct(x.bh || y.bh)) AS jw,
         len(list_intersect(cx.grams, cy.grams)) * 1.0
           / len(list_distinct(cx.grams || cy.grams)) AS jc
  FROM pairs p
  JOIN bh x ON p.doc_a = x.doc_id JOIN bh y ON p.doc_b = y.doc_id
  JOIN g cx ON p.doc_a = cx.doc_id JOIN g cy ON p.doc_b = cy.doc_id
)
SELECT doc_a, doc_b,
       {quantize_sql('jw')} AS jaccard,
       {quantize_sql('jc')} AS ngram_jaccard,
       (jw >= {word_threshold}) AS word_dup,
       (jc >= {char_threshold}) AS char_dup
FROM v WHERE jw >= {word_threshold} OR jc >= {char_threshold}
"""


ORACLE_MINHASH_NEAR_DUP = _minhash_near_dup_oracle()


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-incremental dedup gate (``dedup.incremental_dedup``):
    docs with ``doc_id % 4 == 0`` play the NEW snapshot, the rest the
    existing corpus; every new doc is checked against the old side only
    (digest anti-hit + cross-frame LSH + Jaccard verify) — old-vs-old
    pairs are never formed."""
    docs = _docs(spark, sf_dir)
    new_df = docs.where(F.col("doc_id") % 4 == 0)
    old_df = docs.where(F.col("doc_id") % 4 != 0)
    out = dedup.incremental_dedup(new_df, old_df, threshold=0.7)
    return out.select(
        "doc_id",
        "exact_dup",
        "near_dup",
        "dup_of",
        quantize("best_jaccard").alias("best_jaccard"),
        "keep",
    )


ORACLE_INCREMENTAL_DEDUP = f"""
WITH {_lsh_cte_prefix()},
dig AS (SELECT doc_id, md5(text) AS h FROM documents),
olddig AS (SELECT DISTINCT h FROM dig WHERE doc_id % 4 != 0),
ex AS (
  SELECT d.doc_id, (o.h IS NOT NULL) AS exact_dup
  FROM dig d LEFT JOIN olddig o ON d.h = o.h
  WHERE d.doc_id % 4 = 0
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 != 0
),
v AS (
  SELECT c.new_id, c.old_id,
         len(list_intersect(x.bh, y.bh)) * 1.0 / len(list_distinct(x.bh || y.bh)) AS j
  FROM cand c JOIN bh x ON c.new_id = x.doc_id JOIN bh y ON c.old_id = y.doc_id
),
near AS (
  SELECT new_id, min(old_id) AS dup_of, max(j) AS best_j
  FROM v WHERE j >= 0.7 GROUP BY 1
)
SELECT ex.doc_id, ex.exact_dup,
       (near.dup_of IS NOT NULL) AS near_dup,
       near.dup_of,
       {quantize_sql('near.best_j')} AS best_jaccard,
       (NOT ex.exact_dup AND near.dup_of IS NULL) AS keep
FROM ex LEFT JOIN near ON ex.doc_id = near.new_id
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fingerprint panel — the r8 merge of the former
    ``simhash_buckets`` driver query (window-slot consolidation per the
    COVERAGE.md registry-growth policy): the winnowing-style anchor
    fingerprint AND the 16-bit SimHash with its exact-fingerprint
    bucket size, from one corpus scan (``dedup.fingerprint_panel``) —
    one driver row certifies both fingerprint families."""
    docs = _docs(spark, sf_dir)
    out = dedup.fingerprint_panel(docs)
    return out.select(
        "doc_id",
        "anchors",
        "fingerprint",
        "simhash",
        F.col("bucket_size").cast("bigint").alias("bucket_size"),
    )


ORACLE_DOC_FINGERPRINT = f"""
WITH toks AS (SELECT doc_id, {tokens_sql('text')} AS toks FROM documents),
sh AS (SELECT doc_id, {word_shingles_sql('toks')} AS sh,
              {token_md5_sql('toks')} AS hmd5
       FROM toks),
a AS (
  SELECT doc_id,
         (list_sort(list_transform(sh, s -> md5(s))))[1:4] AS anchors,
         {simhash16_sql('hmd5')} AS simhash
  FROM sh
)
SELECT doc_id,
       array_to_string(anchors, ',') AS anchors,
       md5(array_to_string(anchors, ',')) AS fingerprint,
       simhash,
       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
FROM a
"""


# The cluster assignment is a materialized dedup table in production
# (pairs + label propagation run once per corpus snapshot, then every
# downstream decision reads it) — memoized per (session, sf_dir) and
# persisted untracked, same contract as the battery sim memo.
_CLUSTER_CACHE: dict[tuple, DataFrame] = {}


def _shared_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CLUSTER_CACHE.get(key)
    if got is None:
        docs = _docs(spark, sf_dir)
        pairs = dedup.minhash_near_dup_pairs(docs, threshold=0.7)
        got = clustering.assign_dedup_clusters(docs, pairs).persist()
        _CLUSTER_CACHE[key] = got
    return got


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> clusters -> per-doc dedup decision: the last stage of the
    dedup pipeline. Near-dup pairs from the MinHash-LSH path feed
    connected components (iterative min-label propagation); every doc gets
    a deterministic cluster id (minimum reachable doc_id), its cluster
    size, the min-id canonical flag, AND the keep-best verdict (highest
    quantized quality per cluster, tie-broken by doc_id — what a real
    corpus build keeps). (r6 merge: subsumes the former
    ``dedup_keep_best`` driver query — both decisions come from one
    cluster assignment, so one driver row certifies both.)"""
    docs = _docs(spark, sf_dir)
    clusters = _shared_clusters(spark, sf_dir)
    quality = docs.select(
        "doc_id",
        quantize(textops.quality_columns(F.col("text"))["quality_score"]).alias(
            "quality"
        ),
    )
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "is_canonical",
            (F.col("rn") == 1).alias("keep"),
            "quality",
        )
    )


def _dedup_cluster_ctes(
    threshold: float = 0.7, n_hashes: int = 16, n_bands: int = 4
) -> str:
    """Min-label fixpoint as a DuckDB recursive CTE chain ending in
    ``asg (doc_id, cluster_id)``: reachability closure over the
    symmetrized verified-pair edge list, then min(reachable id) per node
    — exactly the fixed point ``connected_components`` iterates to (the
    label set is schedule-independent, so the two computations agree
    row-for-row). Shared by the cluster-assignment and keep-best
    oracles."""
    return f"""{_lsh_cte_prefix(n_hashes, n_bands)},
v AS (
  SELECT p.doc_a, p.doc_b,
         len(list_intersect(x.bh, y.bh)) * 1.0 / len(list_distinct(x.bh || y.bh)) AS j
  FROM pairs p JOIN bh x ON p.doc_a = x.doc_id JOIN bh y ON p.doc_b = y.doc_id
),
vp AS (SELECT doc_a, doc_b FROM v WHERE j >= {threshold}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM vp
          UNION ALL SELECT doc_b AS a, doc_a AS b FROM vp),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node),
asg AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
)"""


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_dedup_cluster_ctes()},
q AS (
  SELECT doc_id, {quantize_sql(textops.quality_columns_sql('text')['quality_score'])} AS quality
  FROM documents
),
r AS (
  SELECT a.doc_id, a.cluster_id, q.quality,
         count(*) OVER (PARTITION BY a.cluster_id) AS cluster_size,
         row_number() OVER (PARTITION BY a.cluster_id
                            ORDER BY q.quality DESC, a.doc_id) AS rn
  FROM asg a JOIN q USING (doc_id)
)
SELECT doc_id, cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       (doc_id = cluster_id) AS is_canonical,
       (rn = 1) AS keep,
       quality
FROM r
"""


# Leakage-safe split fractions: dict ORDER is the cumulative band order
# on both engines (split_assign / split_assign_sql share the accumulated
# float literals bit-for-bit).
_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment (r10): every doc is split
    by the hash-uniform of its near-dup CLUSTER id — not its own id — so
    a near-duplicate of a training document can never land in an eval
    split (the contamination path ``contamination_scan`` audits, closed
    off at split time; cf. the dedup-before-split practice of Lee et al.
    2022 §6). Reuses the memoized ``_shared_clusters`` assignment; the
    split itself is a pure map-side expression over the cluster key
    (``sampling.split_assign``), so the only distributed work is the
    cluster assignment the dedup pipeline already maintains. Singleton
    docs split by their own id (cluster_id == doc_id)."""
    from homelogging_spark.operators import sampling

    clusters = _shared_clusters(spark, sf_dir)
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        sampling.split_assign(
            F.col("cluster_id"), _SPLIT_FRACTIONS, salt="split-v1"
        ).alias("split"),
    )


def _leakage_split_oracle() -> str:
    from homelogging_spark.operators.sampling import split_assign_sql

    return f"""
WITH RECURSIVE {_dedup_cluster_ctes()}
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       {split_assign_sql('cluster_id', _SPLIT_FRACTIONS, 'split-v1')} AS split
FROM asg
"""


ORACLE_LEAKAGE_SPLIT = _leakage_split_oracle()


_BUILD_QUALITY_MIN = 0.3
_BUILD_BUDGET = 6000.0


def q_corpus_build_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END corpus build decision, every stage composed in one
    plan — the user story the individual operators serve:

    1. hygiene: Gopher repetition keep-flag AND quantized quality >=
       ``_BUILD_QUALITY_MIN`` (``repetition_scores`` + ``quality_columns``);
    2. model (r15): the versioned linear quality classifier's keep
       verdict (``classifier_score_columns`` — the model-based filter
       stage, applied after the cheap heuristics the way production
       builds order them);
    3. dedup: among surviving docs, keep the highest-quality member
       of each near-dup cluster (the memoized ``_shared_clusters``
       assignment — ranked WITHIN survivors, so a cluster whose best
       doc failed upstream still keeps its best surviving one);
    4. budget: rank survivors by quality and keep while the running
       token total stays within ``_BUILD_BUDGET`` tokens (the distributed
       prefix sum, unfiltered so dropped rows are labelable).

    Every doc gets a verdict: ``kept`` or the FIRST stage that dropped
    it (``hygiene`` / ``model`` / ``duplicate`` / ``budget``) plus its
    running token total where defined — the audit trail a production
    corpus build publishes alongside the corpus."""
    from homelogging_spark.operators import sampling

    docs = _docs(spark, sf_dir)
    # one staged token array feeds the quality signals AND the model
    # features — without it each consumer re-embeds tokens(text) and
    # CollapseProject leaves the duplicates inside when-branches where
    # codegen CSE cannot reach (classifier_quality_filter's staging
    # note; measured there)
    staged = docs.select(
        "doc_id",
        "text",
        textops.tokens(F.col("text")).alias("__toks"),
    )
    qc = textops.quality_columns(F.col("text"), toks=F.col("__toks"))
    mf = textops._model_feature_columns(F.col("text"), toks=F.col("__toks"))
    # r21 (guide §2.4): the repetition gate rides the SAME staged
    # projection (toks passed through) — the former repetition_scores
    # frame re-scanned and re-tokenized the corpus just to join one
    # boolean back on doc_id.
    rep_cols = textops.repetition_columns(F.col("text"), toks=F.col("__toks"))
    mdl = textops.model_for()
    mdl_score = F.lit(float(mdl["bias"]))
    for fname in sorted(mdl["weights"]):
        mdl_score = mdl_score + F.lit(float(mdl["weights"][fname])) * mf[fname]
    q = staged.select(
        "doc_id",
        quantize(qc["quality_score"]).alias("quality"),
        qc["n_tokens"].alias("n_tokens"),
        # null-safe (r15 ADVICE): a degenerate doc (zero tokens/chars)
        # yields NULL ratio features hence a NULL logit; without the
        # coalesce it would fall through every stage CASE branch below
        # and be mislabeled 'budget' (identically in both engines, so
        # the oracle could never catch it)
        F.coalesce(mdl_score >= F.lit(0.0), F.lit(False)).alias("mdl_ok"),
        rep_cols["keep"].alias("rep_ok"),
    )
    # h and ranked are each referenced by multiple plan branches of the
    # final assembly (stage CASE + two left joins); without persist the
    # repetition fold and quality exprs re-evaluate once per branch
    # (measured 12.2 s -> ~3 s at sf0.1). Both are doc_id-rows of a few
    # columns — materialized intermediates, released by cachelife.
    from homelogging_spark.functions.cachelife import tracked_persist

    h = tracked_persist(
        q.withColumn(
            "hyg_ok",
            # null-safe like mdl_ok: NULL quality (degenerate doc) must
            # read as a hygiene drop, not fall out of the verdict CASE
            F.coalesce(
                F.col("rep_ok") & (F.col("quality") >= F.lit(_BUILD_QUALITY_MIN)),
                F.lit(False),
            ),
        )
    )
    clusters = _shared_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    surv = h.where("hyg_ok AND mdl_ok").join(clusters, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    ranked = tracked_persist(surv.withColumn("rn", F.row_number().over(w)))
    winners = ranked.where(F.col("rn") == 1).select("doc_id", "quality", "n_tokens")
    budgeted = sampling.budget_select(
        winners,
        [F.col("quality").desc(), F.col("doc_id")],
        F.col("n_tokens").cast("double"),
        budget=_BUILD_BUDGET,
        filter_to_budget=False,
    ).select("doc_id", "cum_weight")
    out = (
        h.join(ranked.select("doc_id", "rn"), "doc_id", "left")
        .join(budgeted, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            "n_tokens",
            F.when(~F.col("hyg_ok"), F.lit("hygiene"))
            .when(~F.col("mdl_ok"), F.lit("model"))
            .when(F.col("rn") > 1, F.lit("duplicate"))
            .when(F.col("cum_weight") <= _BUILD_BUDGET, F.lit("kept"))
            .otherwise(F.lit("budget"))
            .alias("stage"),
            quantize("cum_weight").alias("cum_tokens"),
        )
    )
    return out


ORACLE_CORPUS_BUILD_PIPELINE = f"""
WITH RECURSIVE {_dedup_cluster_ctes()},
rep AS (SELECT doc_id, keep AS rep_ok FROM ({textops.repetition_scores_sql()})),
q AS (
  SELECT doc_id,
         {quantize_sql(_QC['quality_score'])} AS quality,
         {_QC['n_tokens']} AS n_tokens,
         COALESCE({textops.classifier_score_sql('text')['kept']}, FALSE) AS mdl_ok
  FROM documents
),
h AS (
  SELECT q.doc_id, q.quality, q.n_tokens, q.mdl_ok,
         COALESCE(rep.rep_ok AND q.quality >= {_BUILD_QUALITY_MIN}, FALSE) AS hyg_ok
  FROM q JOIN rep USING (doc_id)
),
ranked AS (
  SELECT h.doc_id, h.quality, h.n_tokens, a.cluster_id,
         row_number() OVER (PARTITION BY a.cluster_id
                            ORDER BY h.quality DESC, h.doc_id) AS rn
  FROM h JOIN asg a USING (doc_id) WHERE h.hyg_ok AND h.mdl_ok
),
winners AS (SELECT doc_id, quality, n_tokens FROM ranked WHERE rn = 1),
c AS (
  SELECT doc_id, sum(CAST(n_tokens AS DOUBLE)) OVER (
           ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM winners
)
SELECT h.doc_id, h.quality, h.n_tokens,
       CASE WHEN NOT h.hyg_ok THEN 'hygiene'
            WHEN NOT h.mdl_ok THEN 'model'
            WHEN ranked.rn > 1 THEN 'duplicate'
            WHEN c.cum <= {_BUILD_BUDGET} THEN 'kept'
            ELSE 'budget' END AS stage,
       {quantize_sql('c.cum')} AS cum_tokens
FROM h
LEFT JOIN ranked USING (doc_id)
LEFT JOIN c USING (doc_id)
"""


# --- similarity search -------------------------------------------------------

def _emb_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    # no spread: the top-k queries broadcast a 5-row query side over one
    # corpus scan — the extra exchange costs more than it parallelizes
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.where(F.col("vec_id") < N_QUERY_VECS),
        emb.where(F.col("vec_id") >= N_QUERY_VECS),
    )


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    queries, corpus = _emb_split(spark, sf_dir)
    out = similarity.exact_topk(queries, corpus, k=5)
    return out.select("query_id", "rank", "vec_id", quantize("cosine").alias("cosine"))


ORACLE_EMBEDDING_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
s AS (SELECT query_id, vec_id,
             {similarity.cosine_sql('q_emb', 'embedding', EMB_DIM)} AS cos
      FROM q, c),
r AS (SELECT query_id, vec_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM s)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, {quantize_sql('cos')} AS cosine
FROM r WHERE rank <= 5
"""


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search (r15; r18: its registry row retired
    into ``ann_topk``'s ``method='sq8'`` leg, which emits these columns
    verbatim — this function stays as the leg's builder and the unit
    tests' subject): per-dimension uint8 codes
    against corpus-trained [min, max] bounds — the standard 4x memory
    lever BESIDE PQ (FAISS SQ8): no codebook training, one bounds pass,
    two-flop decode. Asymmetric ranking (float queries vs decoded
    corpus) with the recall@5 honesty column against the exact
    brute-force truth; the oracle replays the full train → encode →
    decode → rank chain bit-for-bit (the pq_codes discipline).

    Scale: bounds are a dim-row aggregate trained at ingest (sampled,
    like the PQ trainer); encode+decode is a broadcast-bounds map over
    one corpus scan; scoring is exact_topk's broadcast-query shape.
    The honest trade vs PQ: dim bytes/vector (vs M), near-exact recall
    at the top of the ranking (pinned ≥ 0.8 here), no cell pruning —
    compose with IVF for that, exactly as ivf_pq_topk does."""
    queries, corpus = _emb_split(spark, sf_dir)
    out = similarity.sq8_topk(queries, corpus, k=5)
    exact = similarity.exact_topk(queries, corpus, k=5)
    out = similarity.topk_recall(
        out.withColumnRenamed("vec_id", "cand_id"), exact, k=5
    )
    return out.select(
        "query_id",
        "rank",
        F.col("cand_id").alias("vec_id"),
        quantize("cosine_sq8").alias("cosine_sq8"),
        quantize("recall_at_k").alias("recall_at_k"),
    )


def _sq8_topk_oracle(k: int = 5) -> str:
    corpus_sql = (
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}"
    )
    codes = similarity.sq8_codes_sql("embedding", EMB_DIM)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
c AS ({corpus_sql}),
b AS ({similarity.sq8_bounds_sql(corpus_sql, EMB_DIM)}),
deq AS (SELECT vec_id, {similarity.sq8_dequant_sql(codes, EMB_DIM)} AS emb_hat
        FROM c, b),
s AS (SELECT query_id, vec_id,
             {similarity.cosine_sql('q_emb', 'emb_hat', EMB_DIM)} AS cos
      FROM q, deq),
r AS (SELECT query_id, vec_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM s),
ann AS (SELECT query_id, vec_id AS cand_id, cos, rank FROM r WHERE rank <= {k}),
{_exact_truth_ctes(k)}
SELECT ann.query_id, CAST(ann.rank AS BIGINT) AS rank, ann.cand_id AS vec_id,
       {quantize_sql('ann.cos')} AS cosine_sq8,
       {quantize_sql(f'coalesce(h.n_hits, 0) / {k}.0')} AS recall_at_k
FROM ann LEFT JOIN hits h USING (query_id)
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN top-k WITH the honesty column (r6): per-query recall@3
    against the exact brute-force top-3 (``similarity.topk_recall``) —
    the quality-vs-cost dial of the (tables, planes) setting, published
    by data, not argument."""
    queries, corpus = _emb_split(spark, sf_dir)
    out = similarity.lsh_topk(queries, corpus, k=3, n_tables=2, planes_per_table=6)
    exact = similarity.exact_topk(queries, corpus, k=3)
    out = similarity.topk_recall(out, exact, k=3)
    return out.select(
        "query_id",
        "rank",
        "cand_id",
        quantize("cosine").alias("cosine"),
        quantize("recall_at_k").alias("recall_at_k"),
    )


def _exact_truth_ctes(k: int) -> str:
    """CTE suffix shared by both ANN oracles: the exact brute-force
    top-``k`` truth set and the per-query hit count against an ``ann``
    CTE (query_id, cand_id) — mirrors ``similarity.topk_recall``."""
    cos = similarity.cosine_sql("q_emb", "embedding", EMB_DIM)
    return f"""exq AS (SELECT vec_id AS query_id, embedding AS q_emb
       FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
exc AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
exs AS (SELECT query_id, vec_id, {cos} AS cos FROM exq, exc),
truth AS (SELECT query_id, vec_id AS cand_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
    FROM exs) WHERE rk <= {k}),
hits AS (SELECT ann.query_id, count(*) AS n_hits
         FROM ann JOIN truth USING (query_id, cand_id) GROUP BY 1)"""


def _ann_lsh_topk_oracle(n_tables: int = 2, planes_per_table: int = 6, k: int = 3) -> str:
    planes = similarity.hyperplanes(n_tables * planes_per_table, EMB_DIM)
    bucket_selects = "\nUNION ALL ".join(
        f"SELECT vec_id, {t} AS table_idx, "
        + similarity.lsh_bucket_sql(
            "embedding", planes[t * planes_per_table : (t + 1) * planes_per_table]
        )
        + " AS bucket FROM embeddings"
        for t in range(n_tables)
    )
    return f"""
WITH b AS ({bucket_selects}),
qb AS (SELECT vec_id AS query_id, table_idx, bucket FROM b WHERE vec_id < {N_QUERY_VECS}),
cb AS (SELECT vec_id AS cand_id, table_idx, bucket FROM b WHERE vec_id >= {N_QUERY_VECS}),
cand AS (SELECT DISTINCT query_id, cand_id FROM qb JOIN cb USING (table_idx, bucket)),
s AS (SELECT cand.query_id, cand.cand_id,
             {similarity.cosine_sql('q.embedding', 'c.embedding', EMB_DIM)} AS cos
      FROM cand
      JOIN embeddings q ON cand.query_id = q.vec_id
      JOIN embeddings c ON cand.cand_id = c.vec_id),
r AS (SELECT query_id, cand_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
      FROM s),
ann AS (SELECT query_id, cand_id, cos, rank FROM r WHERE rank <= {k}),
{_exact_truth_ctes(k)}
SELECT ann.query_id, CAST(ann.rank AS BIGINT) AS rank, ann.cand_id,
       {quantize_sql('ann.cos')} AS cosine,
       {quantize_sql(f'coalesce(h.n_hits, 0) / {k}.0')} AS recall_at_k
FROM ann LEFT JOIN hits h USING (query_id)
"""


ORACLE_ANN_LSH_TOPK = _ann_lsh_topk_oracle()

# evaluated here (not at its def site) because the oracle composes the
# shared _exact_truth_ctes defined just above
ORACLE_SQ8_TOPK = _sq8_topk_oracle()


IVF_N_CENTROIDS = 8
IVF_NPROBE = 2
IVF_KMEANS_ITERS = 2

# Trained quantizers are INDEX ARTIFACTS, not per-query computations: a
# real IVF/PQ deployment trains once and serves many queries. Memoized
# per (session, sf_dir); the frames are K (or K*M) lineage-truncated
# rows, so the cache holds kilobytes, and values are deterministic so a
# recompute-after-eviction would be identical.
_QUANTIZER_CACHE: dict[tuple, DataFrame] = {}


def _cached_quantizer(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    got = _QUANTIZER_CACHE.get(key)
    if got is None:
        got = build()
        _QUANTIZER_CACHE[key] = got
    return got


# r20: one load_index() HANDLE per (session, committed generation) —
# load_index is ~9 parquet reads + fs probes of driver-side latency and
# the serving ops verify provenance once per handle, so re-loading per
# query invocation paid ~1s of pure metadata work each time. Keyed on
# the generation marker's mtime: a rebuilt generation gets a FRESH
# handle (full re-verification); the handle holds lazy frames, never
# results — every search still executes from the artifacts.
_INDEX_HANDLE_CACHE: dict[tuple, dict] = {}


def _cached_index_handle(spark: SparkSession, root: str) -> dict:
    import os as _os

    from homelogging_spark.operators.maintenance import load_index

    marker = _os.path.join(root, "centroids", "_SUCCESS")
    try:
        stamp = _os.path.getmtime(marker)
    except OSError:
        # r21 (r20 ADVICE #2): an unstat-able marker (non-local index
        # root, missing _SUCCESS) must NOT collapse every generation at
        # this root onto one stale stamp=None entry — skip the cache and
        # load fresh, paying the metadata latency but never serving a
        # stale handle.
        return load_index(spark, root)
    key = (spark.sparkContext.applicationId, root, stamp)
    got = _INDEX_HANDLE_CACHE.get(key)
    if got is None:
        got = load_index(spark, root)
        _INDEX_HANDLE_CACHE[key] = got
    return got


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (the coarse-quantizer alternative to LSH):
    centroids built by the deterministic k-means-lite (2 Lloyd iterations
    from md5-seeded literals — self-contained, no caller seed set), corpus
    assigned to its nearest cell, queries probe their 2 nearest cells,
    exact-cosine verify, top-3."""
    queries, corpus = _emb_split(spark, sf_dir)
    centroids = _cached_quantizer(
        spark,
        sf_dir,
        "ivf",
        lambda: similarity.kmeans_lite_centroids(
            corpus, n_centroids=IVF_N_CENTROIDS, n_iters=IVF_KMEANS_ITERS, dim=EMB_DIM
        ),
    )
    out = similarity.ivf_topk(queries, corpus, centroids, k=3, nprobe=IVF_NPROBE)
    exact = similarity.exact_topk(queries, corpus, k=3)
    out = similarity.topk_recall(out, exact, k=3)
    return out.select(
        "query_id",
        "rank",
        "cand_id",
        quantize("cosine").alias("cosine"),
        quantize("recall_at_k").alias("recall_at_k"),
    )


def _ann_ivf_topk_oracle(k: int = 3) -> str:
    cos = similarity.cosine_sql("t.embedding", "c.c_emb", EMB_DIM)
    qc_cos = similarity.cosine_sql("q.q_emb", "cl.c_emb2", EMB_DIM)
    corpus_sql = f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}"
    kmeans = similarity.kmeans_lite_sql(
        corpus_sql, IVF_N_CENTROIDS, IVF_KMEANS_ITERS, EMB_DIM
    )
    return f"""
WITH {kmeans},
c AS (SELECT centroid_id, c_emb FROM c{IVF_KMEANS_ITERS}),
assign_corpus AS (
  SELECT vec_id, embedding, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos} DESC, centroid_id) AS r
  FROM ({corpus_sql}) t, c
),
cells AS (SELECT vec_id AS cand_id, embedding AS c_emb2, centroid_id
          FROM assign_corpus WHERE r = 1),
assign_q AS (
  SELECT vec_id, embedding, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos} DESC, centroid_id) AS r
  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}) t, c
),
probes AS (SELECT vec_id AS query_id, embedding AS q_emb, centroid_id
           FROM assign_q WHERE r <= {IVF_NPROBE}),
s AS (
  SELECT DISTINCT q.query_id, cl.cand_id, {qc_cos} AS cos
  FROM probes q JOIN cells cl USING (centroid_id)
),
r AS (SELECT query_id, cand_id, cos, row_number() OVER (
        PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM s),
ann AS (SELECT query_id, cand_id, cos, rank FROM r WHERE rank <= {k}),
{_exact_truth_ctes(k)}
SELECT ann.query_id, CAST(ann.rank AS BIGINT) AS rank, ann.cand_id,
       {quantize_sql('ann.cos')} AS cosine,
       {quantize_sql(f'coalesce(h.n_hits, 0) / {k}.0')} AS recall_at_k
FROM ann LEFT JOIN hits h USING (query_id)
"""


ORACLE_ANN_IVF_TOPK = _ann_ivf_topk_oracle()


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 window-slot consolidation (absorbs the former ``ann_lsh_topk``
    + ``ann_ivf_topk`` rows): the two exact-verify ANN index families
    emit the identical (query_id, rank, cand_id, cosine, recall_at_k)
    schema, so one ``method``-tagged union panel certifies both — LSH
    bucket candidates and IVF coarse-quantizer probes, each with the
    per-query recall@3 honesty column against the exact brute-force
    truth. Both legs' plan shapes are unchanged (the broadcast-Q BNLJ
    scoring and cell-pruned probe join documented in SCALE.md). The
    exact truth subtree appears once per leg ON PURPOSE: an A/B against
    a tracked_persist-shared truth frame measured the shared form ~18%
    SLOWER (4.6 s vs 3.9 s median solo at sf0.1) — the persisted frame
    serializes the two legs behind its materialization barrier, while
    the duplicated subtrees run concurrently on otherwise-idle cores
    (and the honesty column is dropped entirely in the production path,
    so the duplication never reaches the 100 TB plan).

    r16 window-slot consolidation (funding ``domain_curation`` at the
    100-query cap): absorbs the retired ``embedding_topk`` row as a
    third ``method='exact'`` leg — the exact brute-force cosine top-k
    (``similarity.exact_topk``) emitted verbatim with
    ``recall_at_k=1.0`` (it IS the truth set the other legs' honesty
    columns compare against), so one driver row now certifies the
    baseline and both index families.

    r18 window-slot consolidation (funding the ``bm25_state_served``
    registration per the r17 verdict's plan): absorbs the retired
    ``sq8_topk`` row as a fourth ``method='sq8'`` leg — the
    scalar-quantized asymmetric top-5 (``q_sq8_topk``) emitted verbatim
    modulo the panel's column names (vec_id→cand_id,
    cosine_sq8→cosine). The leg keeps its own k=5 (the legs are
    unioned, never joined, so per-leg k is data, not a schema
    constraint). One row now certifies the exact baseline and all
    three quantized/index families."""
    lsh = q_ann_lsh_topk(spark, sf_dir)
    ivf = q_ann_ivf_topk(spark, sf_dir)
    exact = (
        q_embedding_topk(spark, sf_dir)
        .withColumnRenamed("vec_id", "cand_id")
        .withColumn("recall_at_k", F.lit(1.0))
    )
    sq8 = (
        q_sq8_topk(spark, sf_dir)
        .withColumnRenamed("vec_id", "cand_id")
        .withColumnRenamed("cosine_sq8", "cosine")
    )
    return (
        lsh.select(F.lit("lsh").alias("method"), "*")
        .unionByName(ivf.select(F.lit("ivf").alias("method"), "*"))
        .unionByName(exact.select(F.lit("exact").alias("method"), "*"))
        .unionByName(sq8.select(F.lit("sq8").alias("method"), "*"))
    )


ORACLE_ANN_TOPK = f"""
SELECT 'lsh' AS method, * FROM ({ORACLE_ANN_LSH_TOPK})
UNION ALL
SELECT 'ivf' AS method, * FROM ({ORACLE_ANN_IVF_TOPK})
UNION ALL
SELECT 'exact' AS method, query_id, rank, vec_id AS cand_id, cosine,
       1.0 AS recall_at_k
FROM ({ORACLE_EMBEDDING_TOPK})
UNION ALL
SELECT 'sq8' AS method, query_id, rank, vec_id AS cand_id,
       cosine_sq8 AS cosine, recall_at_k
FROM ({ORACLE_SQ8_TOPK})
"""


# --- hybrid search: BM25 lexical + exact ANN + RRF fusion --------------------

# (query_id, terms): the lexical intent of each ANN query vector —
# query ids deliberately coincide with the _emb_split query vec_ids so
# the two legs rank the same candidate pool for the same query
HYBRID_QUERY_TERMS: dict[int, tuple[str, ...]] = {
    0: ("key", "scan"),
    1: ("merge", "batch"),
    2: ("vector", "group"),
    3: ("window", "stream"),
    4: ("hash", "filter"),
}
HYBRID_K = 10
RRF_C = 60


def q_hybrid_search_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval panel (r17 — the r16 verdict's registration
    task, funded by the pulse/count window-slot consolidations): the
    three legs of a hybrid search stack in one family-labeled row,
    certifying ``textops.bm25_topk``, the exact ANN baseline, and
    ``textops.rrf_fuse`` verbatim.

    - ``family='bm25'``: per-query BM25 top-k over the corpus split
      (Lucene idf, query-term broadcast prune — the full vocabulary
      table is never built); ``n`` = n_terms_hit.
    - ``family='ann'``: exact brute-force cosine top-k of the SAME
      query ids' vectors over the corpus split (the truth set the
      ann_topk row's index families compare against); ``n`` NULL.
    - ``family='rrf'``: reciprocal-rank fusion of exactly those two
      ranked lists (``score = Σ 1/(c + rank)``, c=60) — rank-only, so
      no calibration between a BM25 logit and a cosine; ``n`` =
      n_legs. The fused leg consumes the other legs' emitted ranks,
      which are quantize-keyed and id-tie-broken — a pure function of
      the corpus in both engines.

    Both retrieval legs restrict to ``doc_id >= N_QUERY_VECS`` so the
    lexical and vector candidate pools coincide (embeddings' vec_id
    and documents' doc_id share the id space by construction).

    Scale: bm25 is the pruned-join shape documented at the operator;
    the ann leg is the broadcast-query scoring scan (allowlisted BNLJ);
    rrf touches only the two bounded top-k lists. The panel union adds
    nothing — three dim-sized legs."""
    queries, corpus = _emb_split(spark, sf_dir)
    docs = _docs(spark, sf_dir).where(F.col("doc_id") >= N_QUERY_VECS)
    q_panel = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(HYBRID_QUERY_TERMS.items()) for t in terms],
        "query_id long, term string",
    )
    # Each retrieval leg is consumed twice (its own panel leg + the rrf
    # fusion); the duplication is DELIBERATE — re-A/B'd in r21 after the
    # bm25 df-window fix: tracked_persist of both legs measured ~2.9 s
    # vs ~2.5 s per iter duplicated at sf0.1 (the ann_topk result again
    # — the persist barrier serializes legs that otherwise run
    # concurrently on idle cores; at 100 TB the production path drops
    # the rrf honesty recompute, not the legs).
    bm = textops.bm25_topk(docs, q_panel, k=HYBRID_K)
    ann = (
        similarity.exact_topk(queries, corpus, k=HYBRID_K)
        .withColumnRenamed("vec_id", "doc_id")
        .select("query_id", "rank", "doc_id", quantize("cosine").alias("cosine"))
    )
    fused = textops.rrf_fuse([bm, ann], k=HYBRID_K, c=RRF_C)
    bm_leg = bm.select(
        F.lit("bm25").alias("family"),
        "query_id",
        "rank",
        "doc_id",
        F.col("score"),
        F.col("n_terms_hit").alias("n"),
    )
    ann_leg = ann.select(
        F.lit("ann").alias("family"),
        "query_id",
        "rank",
        "doc_id",
        F.col("cosine").alias("score"),
        F.lit(None).cast("bigint").alias("n"),
    )
    rrf_leg = fused.select(
        F.lit("rrf").alias("family"),
        "query_id",
        "rank",
        "doc_id",
        F.col("rrf_score").alias("score"),
        F.col("n_legs").alias("n"),
    )
    return bm_leg.unionByName(ann_leg).unionByName(rrf_leg)


def _hybrid_oracle() -> str:
    q_cte = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, terms in sorted(HYBRID_QUERY_TERMS.items())
            for t in terms
        )
        + ") q(query_id, term)"
    )
    bm_sql = textops.bm25_topk_sql(
        q_cte,
        k=HYBRID_K,
        source=f"(SELECT * FROM documents WHERE doc_id >= {N_QUERY_VECS})",
    )
    ann_sql = f"""
WITH qv AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < {N_QUERY_VECS}),
cv AS (SELECT vec_id AS doc_id, embedding FROM embeddings
       WHERE vec_id >= {N_QUERY_VECS}),
sc AS (SELECT query_id, doc_id,
              {similarity.cosine_sql('q_emb', 'embedding', EMB_DIM)} AS cos
       FROM qv, cv),
rk AS (SELECT query_id, doc_id, cos,
              CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY cos DESC, doc_id) AS BIGINT) AS rank
       FROM sc)
SELECT query_id, rank, doc_id, {quantize_sql('cos')} AS cosine
FROM rk WHERE rank <= {HYBRID_K}
"""
    return f"""
WITH bm AS ({bm_sql}),
ann AS ({ann_sql}),
contrib AS (
  SELECT query_id, doc_id, 1.0 / ({RRF_C} + rank) AS c FROM bm
  UNION ALL
  SELECT query_id, doc_id, 1.0 / ({RRF_C} + rank) AS c FROM ann
),
fused AS (
  SELECT query_id, doc_id, sum(c) AS s,
         CAST(count(*) AS BIGINT) AS n_legs
  FROM contrib GROUP BY 1, 2
),
rrf AS (
  SELECT query_id, doc_id, s, n_legs,
         CAST(row_number() OVER (
              PARTITION BY query_id
              ORDER BY {quantize_sql('s')} DESC, doc_id) AS BIGINT) AS rank
  FROM fused
)
SELECT 'bm25' AS family, query_id, rank, doc_id, score,
       n_terms_hit AS n
FROM bm
UNION ALL
SELECT 'ann', query_id, rank, doc_id, cosine, CAST(NULL AS BIGINT)
FROM ann
UNION ALL
SELECT 'rrf', query_id, rank, doc_id, {quantize_sql('s')}, n_legs
FROM rrf WHERE rank <= {HYBRID_K}
"""


ORACLE_HYBRID_SEARCH_PANEL = _hybrid_oracle()


# Hot-cell guard dial for the registered semantic_dedup query: below the
# sf0.01 mean cell size (~544 rows / 8 cells) so the split path is
# actually exercised by the driver's oracle compare.
SEMDEDUP_CELL_CAP = 48


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup gate (``similarity.semantic_dedup``).
    The synthetic embeddings are near-orthogonal (max pairwise cosine
    ~0.48), so true positives are SYNTHESIZED the way the PII gate
    synthesizes PII: every 10th corpus vector gets a scaled copy
    (id + 100000, embedding * 1.5 — scaling preserves cosine exactly, so
    each copy lands in its original's cell at cosine ~1.0). The gate
    then checks the copy is dropped, the original kept, and every
    un-copied vector untouched. Reuses the memoized IVF quantizer.

    r10: runs WITH the hot-cell guard active (``cell_cap=48`` — under
    the sf0.01 mean cell size of ~68, so several cells actually split
    and the driver certifies the capped pair semantics, not just the
    easy path); the oracle replicates the salted md5 hash-split
    exactly."""
    _, corpus = _emb_split(spark, sf_dir)
    corpus = corpus.select("vec_id", "embedding")
    dups = corpus.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * F.lit(1.5)).alias(
            "embedding"
        ),
    )
    full = corpus.unionByName(dups)
    centroids = _cached_quantizer(
        spark,
        sf_dir,
        "ivf",
        lambda: similarity.kmeans_lite_centroids(
            corpus, n_centroids=IVF_N_CENTROIDS, n_iters=IVF_KMEANS_ITERS, dim=EMB_DIM
        ),
    )
    out = similarity.semantic_dedup(
        full, centroids, threshold=0.9, cell_cap=SEMDEDUP_CELL_CAP
    )
    return out.select(
        "vec_id",
        F.col("cell").cast("bigint").alias("cell"),
        "n_dups",
        "kept",
    )


def _semantic_dedup_oracle(threshold: float = 0.9) -> str:
    from homelogging_spark.operators.sampling import uniform_sql

    cos_assign = similarity.cosine_sql("t.embedding", "c.c_emb", EMB_DIM)
    cos_pair = similarity.cosine_sql("x.embedding", "y.embedding", EMB_DIM)
    # Twin of the cell_cap hash-split: identical salted-md5 uniform, so
    # sub-cell membership matches Spark's bit-for-bit (dyadic 52-bit math).
    _split_u = uniform_sql("cells.vec_id", similarity.SEMDEDUP_SPLIT_SALT)
    corpus_sql = (
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}"
    )
    kmeans = similarity.kmeans_lite_sql(
        corpus_sql, IVF_N_CENTROIDS, IVF_KMEANS_ITERS, EMB_DIM
    )
    return f"""
WITH {kmeans},
c AS (SELECT centroid_id, c_emb FROM c{IVF_KMEANS_ITERS}),
allv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings WHERE vec_id >= {N_QUERY_VECS}
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.5)
  FROM embeddings WHERE vec_id >= {N_QUERY_VECS} AND vec_id % 10 = 0
),
assign AS (
  SELECT vec_id, embedding, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos_assign} DESC, centroid_id) AS r
  FROM allv t, c
),
cells AS (SELECT vec_id, embedding, centroid_id FROM assign WHERE r = 1),
splits AS (
  SELECT centroid_id,
         CAST(ceil(count(*) / {float(SEMDEDUP_CELL_CAP)}) AS BIGINT) AS n_splits
  FROM cells GROUP BY 1),
cellsx AS (
  SELECT cells.*, CAST(floor(({_split_u}) * s.n_splits) AS BIGINT) AS sub
  FROM cells JOIN splits s USING (centroid_id)),
v AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos_pair} AS cos
  FROM cellsx x JOIN cellsx y
    ON x.centroid_id = y.centroid_id AND x.sub = y.sub AND x.vec_id < y.vec_id
  WHERE {cos_pair} >= {threshold}
),
partners AS (
  SELECT id_a AS vid, id_b AS other FROM v
  UNION ALL SELECT id_b, id_a FROM v
),
agg AS (SELECT vid, count(*) AS n_dups, min(other) AS mp FROM partners GROUP BY 1)
SELECT cells.vec_id, CAST(cells.centroid_id AS BIGINT) AS cell,
       CAST(COALESCE(agg.n_dups, 0) AS BIGINT) AS n_dups,
       COALESCE(agg.mp > cells.vec_id, TRUE) AS kept
FROM cells LEFT JOIN agg ON cells.vec_id = agg.vid
"""


ORACLE_SEMANTIC_DEDUP = _semantic_dedup_oracle()


# Per-cell keep budget for the registered cluster-balanced sample:
# between the sf0.01 min and max cell sizes (55..71), so the driver's
# oracle compare exercises BOTH branches of the rank filter — four
# cells are cut to k, four keep all members.
CBAL_K_PER_CELL = 60


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation sample
    (``sampling.cluster_balanced_sample``): nearest-centroid assignment
    over the memoized IVF quantizer, then a deterministic exactly-k
    md5-uniform pick PER CLUSTER — the diversity-preserving selection
    step (DCLM/SemDeDup-style) that a uniform hash sample cannot
    express. ``cell_n`` is the pre-sample cell census (the honesty
    column: how skewed the original mass was, how hard each cell was
    cut). One corpus scan + broadcast argmax assignment + one shuffle on
    the cell key shared by census and rank."""
    from homelogging_spark.operators.sampling import cluster_balanced_sample

    _, corpus = _emb_split(spark, sf_dir)
    corpus = corpus.select("vec_id", "embedding")
    centroids = _cached_quantizer(
        spark,
        sf_dir,
        "ivf",
        lambda: similarity.kmeans_lite_centroids(
            corpus, n_centroids=IVF_N_CENTROIDS, n_iters=IVF_KMEANS_ITERS, dim=EMB_DIM
        ),
    )
    return cluster_balanced_sample(corpus, centroids, k_per_cell=CBAL_K_PER_CELL)


def _cluster_balanced_sample_oracle() -> str:
    from homelogging_spark.operators.sampling import uniform_sql

    cos = similarity.cosine_sql("t.embedding", "c.c_emb", EMB_DIM)
    corpus_sql = (
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}"
    )
    kmeans = similarity.kmeans_lite_sql(
        corpus_sql, IVF_N_CENTROIDS, IVF_KMEANS_ITERS, EMB_DIM
    )
    u = uniform_sql("vec_id", "cbal")
    return f"""
WITH {kmeans},
c AS (SELECT centroid_id, c_emb FROM c{IVF_KMEANS_ITERS}),
assign AS (
  SELECT vec_id, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos} DESC, centroid_id) AS r
  FROM ({corpus_sql}) t, c
),
cells AS (SELECT vec_id, centroid_id AS cell FROM assign WHERE r = 1),
ranked AS (
  SELECT vec_id, cell,
         count(*) OVER (PARTITION BY cell) AS cell_n,
         row_number() OVER (PARTITION BY cell ORDER BY {u}, vec_id) AS rank
  FROM cells
)
SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       CAST(cell_n AS BIGINT) AS cell_n, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {CBAL_K_PER_CELL}
"""


ORACLE_CLUSTER_BALANCED_SAMPLE = _cluster_balanced_sample_oracle()


def q_model_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter (``textops.classifier_quality_filter``):
    the pipeline stage downstream of the heuristic signals — a versioned
    linear model (weights are config, `textops.QUALITY_MODEL_VERSIONS`,
    the tokenizer-vocab design) scored as a raw logit over the existing
    feature columns, keep = logit >= 0. Zero shuffle, one projection
    over the corpus scan; every row stamps the model version that
    filtered it. The logit is +/* only (no sigmoid), so both engines
    emit bit-identical doubles."""
    from homelogging_spark.operators.textops import classifier_quality_filter

    docs = load_table(spark, sf_dir, "documents")
    out = classifier_quality_filter(docs)
    return out.select(
        "doc_id",
        "model_version",
        quantize("score").alias("score"),
        "kept",
    )


def _model_quality_filter_oracle() -> str:
    from homelogging_spark.operators.textops import (
        CURRENT_QUALITY_MODEL,
        classifier_score_sql,
    )

    sq = classifier_score_sql("text")
    return f"""
SELECT doc_id,
       {CURRENT_QUALITY_MODEL} AS model_version,
       {quantize_sql(sq["score"])} AS score,
       {sq["kept"]} AS kept
FROM documents
"""


ORACLE_MODEL_QUALITY_FILTER = _model_quality_filter_oracle()


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes + reconstruction error over the full
    embeddings table: 4 subspaces x 8 centroids (codebooks from the
    deterministic k-means-lite on sliced vectors), L2 argmin assignment,
    single shuffle for the code pivot (``similarity.pq_codes``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    codebook = _cached_quantizer(
        spark,
        sf_dir,
        "pq",
        lambda: similarity.pq_codebook(emb, n_subspaces=4, n_centroids=8, dim=EMB_DIM),
    )
    out = similarity.pq_codes(
        emb, n_subspaces=4, n_centroids=8, dim=EMB_DIM, codebook=codebook
    )
    return out.select(
        "vec_id",
        "code_0",
        "code_1",
        "code_2",
        "code_3",
        quantize("recon_mse").alias("recon_mse"),
    )


_PQ_BASE = similarity.pq_codes_sql(
    "SELECT vec_id, embedding FROM embeddings", n_subspaces=4, n_centroids=8, dim=64
)
ORACLE_PQ_CODES = f"""
WITH base AS ({_PQ_BASE})
SELECT vec_id, code_0, code_1, code_2, code_3,
       {quantize_sql('recon_mse')} AS recon_mse
FROM base
"""


def _rotated_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table under the frozen OPQ structured rotation —
    r20: ``similarity.hd_rotate_rows``, the Arrow-batch bit-exact twin
    of the hd_rotate expression (same outputs; O(1) plan instead of a
    dim² HOF tree per invocation, numpy instead of interpreted lambdas
    per row — guide §4.2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hd_rotate_rows(emb, EMB_DIM)


def q_opq_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-style rotated product quantization vs plain PQ (r16, the r15
    stretch item): the FIXED structured rotation ``y = (1/sqrt d)·H·(s⊙x)``
    (``similarity.hd_rotate`` — Ge et al. 2013's optimization replaced
    by the deterministic FALCONN/fast-JL HD transform, so both engines
    replay it bit-for-bit) runs AHEAD of the standard 4x8 PQ chain, and
    one method-tagged panel reports the honest comparison at the SAME
    M and K:

    - ``panel='codes'``: per-vector codes + reconstruction MSE for both
      methods — the ``method='pq'`` rows are the retired ``pq_codes``
      driver query's rows verbatim (r16 window-slot consolidation
      funding this panel); the MSE delta IS the rotation's
      quantization-quality lift (or cost — reported either way).
    - ``panel='recall'``: ADC top-5 per method (sort key quantized as
      in ``pq_adc_topk``) with recall@5 against the exact ORIGINAL-space
      truth — rotation is orthogonal, so both methods answer the same
      geometric question and the recall columns are directly
      comparable.

    Scale: the rotation is one map-side O(dim²)-flop pass fused into
    each leg's existing scan (no extra shuffle, no Python); everything
    downstream is the unchanged PQ machinery at the same artifact
    sizes. Production swaps the expression for the O(d log d) butterfly
    in a Pandas UDF at large dim — semantics identical.

    Measured honesty on THIS fixture (sf0.01): recon MSE 0.01456 (pq)
    → 0.01433 (opq), a ~1.6% lift; recall@5 0.12 (pq) vs 0.08 (opq).
    The synthetic embeddings are near-isotropic random vectors, so
    there is little subspace-energy imbalance for the rotation to fix
    — the rotation's real value case is anisotropic learned embeddings
    (Ge et al. §1), and the point of this panel is that the lift is
    MEASURED per corpus, not assumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    rot = _rotated_emb(spark, sf_dir)
    # the recall truth is ORIGINAL-space exact top-k — method-independent
    # (the rotation is orthogonal), so compute it once and materialize
    # its |queries|*k rows instead of re-running the exact pass inside
    # each method leg (the panel's two legs otherwise carry two
    # identical exact-topk subtrees; no plan-level CSE crosses a union)
    exact = similarity.exact_topk(
        emb.where(F.col("vec_id") < N_QUERY_VECS),
        emb.where(F.col("vec_id") >= N_QUERY_VECS),
        k=5,
    ).localCheckpoint(eager=True)
    # train the two methods' codebooks concurrently: each build is a
    # chain of tiny Lloyd jobs (scheduling-bound, not CPU-bound), so the
    # two chains overlap on the scheduler like pq_codebook's own
    # per-subspace threads — halves the first-action training wall
    from concurrent.futures import ThreadPoolExecutor

    # the rotated side's id-mod training sample is taken BEFORE the
    # (r20, pushdown-opaque) Arrow rotation — same rows as the
    # in-operator sample_mod=16 filter, and the training pass rotates
    # only the sample; the raw side keeps the in-operator sample (the
    # filter pushes to the scan there)
    rot_train = similarity.hd_rotate_rows(
        emb.where(F.col("vec_id") % 16 == 0), EMB_DIM
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        books = dict(
            zip(
                ("pq", "opq_pq"),
                pool.map(
                    lambda ttm: _cached_quantizer(
                        spark,
                        sf_dir,
                        ttm[0],
                        lambda: similarity.pq_codebook(
                            ttm[1],
                            n_subspaces=4,
                            n_centroids=8,
                            dim=EMB_DIM,
                            sample_mod=ttm[2],
                        ),
                    ),
                    (("pq", emb, 16), ("opq_pq", rot_train, None)),
                ),
            )
        )
    legs = []
    for method, table, tag in (("pq", emb, "pq"), ("opq", rot, "opq_pq")):
        codebook = books[tag]
        codes_full = similarity.pq_codes(
            table, n_subspaces=4, n_centroids=8, dim=EMB_DIM, codebook=codebook
        )
        legs.append(
            codes_full.select(
                F.lit(method).alias("method"),
                F.lit("codes").alias("panel"),
                "vec_id",
                "code_0",
                "code_1",
                "code_2",
                "code_3",
                quantize("recon_mse").alias("recon_mse"),
                F.lit(None).cast("bigint").alias("query_id"),
                F.lit(None).cast("bigint").alias("rank"),
                F.lit(None).cast("double").alias("adc_d2"),
                F.lit(None).cast("double").alias("recall_at_k"),
            )
        )
        q_side = table.where(F.col("vec_id") < N_QUERY_VECS)
        c_side = table.where(F.col("vec_id") >= N_QUERY_VECS)
        codes_corpus = similarity.pq_codes(
            c_side.select("vec_id", "embedding"),
            n_subspaces=4,
            n_centroids=8,
            dim=EMB_DIM,
            codebook=codebook,
        )
        adc = similarity.pq_adc_topk(
            q_side.select("vec_id", "embedding"),
            codes_corpus,
            codebook,
            k=5,
            n_subspaces=4,
            dim=EMB_DIM,
            rank_decimals=6,
        ).withColumnRenamed("vec_id", "cand_id")
        rec = similarity.topk_recall(adc, exact, k=5)
        legs.append(
            rec.select(
                F.lit(method).alias("method"),
                F.lit("recall").alias("panel"),
                F.col("cand_id").alias("vec_id"),
                F.lit(None).cast("bigint").alias("code_0"),
                F.lit(None).cast("bigint").alias("code_1"),
                F.lit(None).cast("bigint").alias("code_2"),
                F.lit(None).cast("bigint").alias("code_3"),
                F.lit(None).cast("double").alias("recon_mse"),
                "query_id",
                "rank",
                quantize("adc_d2").alias("adc_d2"),
                quantize("recall_at_k").alias("recall_at_k"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def _opq_panel_oracle(k: int = 5) -> str:
    rot_sql = similarity.hd_rotate_sql(
        "SELECT vec_id, embedding FROM embeddings", EMB_DIM
    )
    nulls_codes = (
        "CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS rank, "
        "CAST(NULL AS DOUBLE) AS adc_d2, CAST(NULL AS DOUBLE) AS recall_at_k"
    )
    nulls_recall = (
        "CAST(NULL AS BIGINT) AS code_0, CAST(NULL AS BIGINT) AS code_1, "
        "CAST(NULL AS BIGINT) AS code_2, CAST(NULL AS BIGINT) AS code_3, "
        "CAST(NULL AS DOUBLE) AS recon_mse"
    )

    def codes_leg(method: str, src: str) -> str:
        base = similarity.pq_codes_sql(src, n_subspaces=4, n_centroids=8, dim=EMB_DIM)
        return (
            f"SELECT '{method}' AS method, 'codes' AS panel, vec_id, "
            f"code_0, code_1, code_2, code_3, "
            f"{quantize_sql('recon_mse')} AS recon_mse, {nulls_codes} "
            f"FROM ({base})"
        )

    def adc_leg(method: str, src: str) -> str:
        adc = similarity.pq_adc_topk_sql(
            src,
            f"SELECT vec_id, embedding FROM ({src}) WHERE vec_id >= {N_QUERY_VECS}",
            f"SELECT vec_id, embedding FROM ({src}) WHERE vec_id < {N_QUERY_VECS}",
            k=k,
            n_subspaces=4,
            n_centroids=8,
            dim=EMB_DIM,
        )
        return f"""
SELECT '{method}' AS method, 'recall' AS panel, ann.cand_id AS vec_id,
       {nulls_recall}, ann.query_id, ann.rank,
       {quantize_sql('ann.adc_d2')} AS adc_d2,
       {quantize_sql(f'coalesce(h.n_hits, 0) / {k}.0')} AS recall_at_k
FROM (SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS cand_id, adc_d2
      FROM ({adc})) ann
LEFT JOIN (
  SELECT a.query_id, count(*) AS n_hits
  FROM (SELECT query_id, vec_id AS cand_id FROM ({adc})) a
  JOIN (WITH {_OPQ_TRUTH} SELECT * FROM truth) t
       USING (query_id, cand_id)
  GROUP BY 1) h USING (query_id)
"""

    plain = "SELECT vec_id, embedding FROM embeddings"
    rot = f"SELECT vec_id, embedding FROM ({rot_sql})"
    return "\nUNION ALL\n".join(
        [
            codes_leg("pq", plain),
            adc_leg("pq", plain),
            codes_leg("opq", rot),
            adc_leg("opq", rot),
        ]
    )


# exact truth in ORIGINAL space, shared by both adc legs (rotation is
# orthogonal: both methods answer the same geometric question)
_OPQ_TRUTH = f"""exq AS (SELECT vec_id AS query_id, embedding AS q_emb
       FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
exc AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}),
exs AS (SELECT query_id, vec_id,
               {similarity.cosine_sql('q_emb', 'embedding', EMB_DIM)} AS cos
        FROM exq, exc),
truth AS (SELECT query_id, vec_id AS cand_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
    FROM exs) WHERE rk <= 5)"""


ORACLE_OPQ_PANEL = _opq_panel_oracle()


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k (Jégou et al. 2011 §IV,
    ``similarity.pq_adc_topk``): the codes-only ANN ranking — queries
    build a K·M distance table against the broadcast codebook and the
    corpus is ranked by M table lookups per vector, never touching raw
    embeddings. Codebook is the memoized 'pq' quantizer (trained once on
    the full table, exactly as ``q_pq_codes``); the corpus split
    (vec_id >= {N_QUERY_VECS}) is encoded and the {N_QUERY_VECS} query
    vectors rank it. Sort key quantized to 6 decimals (id tiebreak) so
    codes-equal candidates rank engine-independently."""
    queries, corpus = _emb_split(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    codebook = _cached_quantizer(
        spark,
        sf_dir,
        "pq",
        lambda: similarity.pq_codebook(emb, n_subspaces=4, n_centroids=8, dim=EMB_DIM),
    )
    codes = similarity.pq_codes(
        corpus.select("vec_id", "embedding"),
        n_subspaces=4,
        n_centroids=8,
        dim=EMB_DIM,
        codebook=codebook,
    )
    out = similarity.pq_adc_topk(
        queries.select("vec_id", "embedding"),
        codes,
        codebook,
        k=5,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )
    return out.select(
        "query_id", "rank", "vec_id", quantize("adc_d2").alias("adc_d2")
    )


ORACLE_PQ_ADC_TOPK = f"""
WITH base AS ({similarity.pq_adc_topk_sql(
    "SELECT vec_id, embedding FROM embeddings",
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}",
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
    k=5, n_subspaces=4, n_centroids=8, dim=EMB_DIM)})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS IVF-PQ composition (Jégou et al. 2011 §V,
    ``similarity.ivf_pq_topk``): the memoized 'ivf' coarse quantizer
    prunes each query to its {IVF_NPROBE} nearest cells, then PQ
    asymmetric distance ranks the surviving CODES — raw corpus
    embeddings appear in neither stage, the billion-vector index shape
    (cell ids + M-byte codes, both built at ingest; both index
    artifacts reuse the same memoized quantizers as `ann_topk` and
    `pq_adc_topk`). Sort key quantized as in `pq_adc_topk`."""
    queries, corpus = _emb_split(spark, sf_dir)
    corpus = corpus.select("vec_id", "embedding")
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _cached_quantizer(
        spark,
        sf_dir,
        "ivf",
        lambda: similarity.kmeans_lite_centroids(
            corpus, n_centroids=IVF_N_CENTROIDS, n_iters=IVF_KMEANS_ITERS, dim=EMB_DIM
        ),
    )
    cells = similarity.ivf_assign(corpus, centroids, 1).select(
        "vec_id", "centroid_id"
    )
    codebook = _cached_quantizer(
        spark,
        sf_dir,
        "pq",
        lambda: similarity.pq_codebook(emb, n_subspaces=4, n_centroids=8, dim=EMB_DIM),
    )
    codes = similarity.pq_codes(
        corpus, n_subspaces=4, n_centroids=8, dim=EMB_DIM, codebook=codebook
    )
    out = similarity.ivf_pq_topk(
        queries.select("vec_id", "embedding"),
        cells,
        codes,
        codebook,
        centroids,
        k=5,
        nprobe=IVF_NPROBE,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )
    return out.select(
        "query_id", "rank", "vec_id", quantize("adc_d2").alias("adc_d2")
    )


ORACLE_IVF_PQ_TOPK = f"""
WITH base AS ({similarity.ivf_pq_topk_sql(
    "SELECT vec_id, embedding FROM embeddings",
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}",
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
    k=5, nprobe=IVF_NPROBE, n_subspaces=4, n_centroids=8,
    coarse_k=IVF_N_CENTROIDS, coarse_iters=IVF_KMEANS_ITERS, dim=EMB_DIM)})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


# index_cycle's clamp bounds are pinned k_min = k_max here so the
# quantizer K is scale-invariant and the static DuckDB oracle can train
# the identical 16-centroid chain; the occupancy-scaling dial
# (k_min < k_max) is covered by tests/test_maintenance.TestIndexCycle.
INDEX_CYCLE_K = 16


OPQ_INDEX_SEED = "opq"  # the rotation diagonal of the fixture generation


def _ivf_index_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialized IVF-PQ index generation for the embeddings corpus —
    built once per sf_dir by ``maintenance.index_cycle`` (staleness
    keyed on the source parquet mtime, like the maintenance fixtures in
    ``tables.py``), then SERVED from parquet. This is the production
    shape the r13 verdict asked to certify end-to-end: refresh →
    stage-then-switch materialization → load → search, with the driver
    oracle checking the searched result."""
    import os
    import shutil

    from homelogging_spark.operators import maintenance
    from homelogging_spark.tables import (
        _fixture_build_lock,
        _fixture_path,
        _fixture_stale,
    )

    path = _fixture_path(sf_dir, "ivf_index")
    src = os.path.join(sf_dir, "embeddings.parquet")
    # the cycle writes standard parquet dirs per artifact; the centroids
    # _SUCCESS marker timestamps the generation. An artifact-SET upgrade
    # (r15 added the SQ8 pair) must also rebuild: a generation missing
    # any current artifact is stale regardless of mtime.
    probe = os.path.join(path, "centroids")

    def _stale() -> bool:
        # r17: the generation now carries the OPQ tier too — a root
        # missing any current artifact (incl. the opq trio and, r18,
        # the opq_meta provenance row) rebuilds
        return _fixture_stale(probe, src) or any(
            not os.path.exists(os.path.join(path, a))
            for a in maintenance.INDEX_ARTIFACTS
            + maintenance.OPQ_ARTIFACTS
            + (maintenance.OPQ_META,)
        )

    if _stale():
        with _fixture_build_lock(path):
            if _stale():
                # same-count corpus changes would no-op the occupancy
                # gate — a stale SOURCE must force a full generation
                shutil.rmtree(path, ignore_errors=True)
                _, corpus = _emb_split(spark, sf_dir)
                maintenance.index_cycle(
                    spark,
                    corpus.select("vec_id", "embedding"),
                    path,
                    k_min=INDEX_CYCLE_K,
                    k_max=INDEX_CYCLE_K,
                    n_iters=IVF_KMEANS_ITERS,
                    pq_subspaces=4,
                    pq_centroids=8,
                    dim=EMB_DIM,
                    # r17: the OPQ tier rides the same generation; the
                    # default 'expr' impl keeps the rotation (and hence
                    # the trained rotated codebook/codes) bit-replayable
                    # by the DuckDB twin — the registered-form
                    # requirement. 'fwht' is the production encode dial
                    # where no oracle must replay the rotation.
                    opq_seed=OPQ_INDEX_SEED,
                )
    return path


def q_index_cycle_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search SERVED from the ``maintenance.index_cycle``-maintained
    generation, as a method-labeled two-leg panel (r20: absorbs the
    retired ``opq_index_search`` row — the funding stale-stale
    consolidation for the ``ivf_opq_search`` registration, the
    ``latest_per_key``/``ann_topk`` precedent; both legs were
    r18-green and each keeps its original plan verbatim):

    - ``method='ivf_pq'`` — the original r14 row: the nightly cycle
      trains the occupancy-sized coarse quantizer and re-materializes
      cells + codebook + codes stage-then-switch; the leg loads that
      generation from parquet and ranks with ``similarity.ivf_pq_topk``
      — certifying the refresh → index → search chain (every double
      round-trips parquet bit-exactly, so the served ranking equals
      the in-memory one).
    - ``method='opq'`` — the retired r18 row verbatim: OPQ rotated-PQ
      search from the SAME generation's rotation signs + rotated
      codebook/codes via ``maintenance.opq_search``, rotation applied
      QUERY-side only (queries are dim-sized; the corpus is read as
      codes) — the r16 verdict's production path end-to-end: refresh →
      rotate → encode → commit → load → search. Oracle-replicable
      because the fixture generation encodes via the 'expr' rotation,
      which ``hd_rotate_sql`` replays bit-for-bit.

    One generation load feeds both legs; the union is bounded (2·Q·k
    rows), no shuffle beyond each leg's own top-k."""
    from homelogging_spark.operators.maintenance import opq_search

    idx = _cached_index_handle(spark, _ivf_index_root(spark, sf_dir))
    queries, _ = _emb_split(spark, sf_dir)
    q = queries.select("vec_id", "embedding")
    ivf = similarity.ivf_pq_topk(
        q,
        idx["cells"],
        idx["codes"],
        idx["codebook"],
        idx["centroids"],
        k=5,
        nprobe=IVF_NPROBE,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )
    opq = opq_search(
        q,
        idx,
        k=5,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )

    def _leg(out: DataFrame, method: str) -> DataFrame:
        return out.select(
            F.lit(method).alias("method"),
            "query_id",
            "rank",
            "vec_id",
            quantize("adc_d2").alias("adc_d2"),
        )

    return _leg(ivf, "ivf_pq").unionByName(_leg(opq, "opq"))


_IDX_CORPUS_SQL = (
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERY_VECS}"
)

# Unlike ORACLE_IVF_PQ_TOPK (codebook trained on the full table, K=8),
# the cycle trains BOTH quantizers on the retained corpus with the
# clamp-pinned K — the ivf_pq leg's oracle replays exactly that.
_ORACLE_IVF_PQ_LEG = f"""
WITH base AS ({similarity.ivf_pq_topk_sql(
    _IDX_CORPUS_SQL,
    _IDX_CORPUS_SQL,
    f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
    k=5, nprobe=IVF_NPROBE, n_subspaces=4, n_centroids=8,
    coarse_k=INDEX_CYCLE_K, coarse_iters=IVF_KMEANS_ITERS, dim=EMB_DIM)})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


def _opq_leg_oracle() -> str:
    # the retired opq_index_search oracle verbatim (r18): rotate both
    # sides with the seed-derived diagonal, retrain the rotated
    # codebook with the same sampled Lloyd chain, re-rank identically
    rot_corpus = similarity.hd_rotate_sql(
        _IDX_CORPUS_SQL, EMB_DIM, seed=OPQ_INDEX_SEED
    )
    rot_queries = similarity.hd_rotate_sql(
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
        EMB_DIM,
        seed=OPQ_INDEX_SEED,
    )
    return f"""
WITH base AS ({similarity.pq_adc_topk_sql(
        rot_corpus, rot_corpus, rot_queries,
        k=5, n_subspaces=4, n_centroids=8, n_iters=IVF_KMEANS_ITERS,
        dim=EMB_DIM, sample_mod=16, rank_decimals=6)})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


ORACLE_INDEX_CYCLE_SEARCH = f"""
WITH ivf_leg AS ({_ORACLE_IVF_PQ_LEG}), opq_leg AS ({_opq_leg_oracle()})
SELECT 'ivf_pq' AS method, query_id, rank, vec_id, adc_d2 FROM ivf_leg
UNION ALL
SELECT 'opq' AS method, query_id, rank, vec_id, adc_d2 FROM opq_leg
"""


def _learned_index_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialized index generation whose OPQ tier is the LEARNED
    rotation (r19, the r18 verdict's stretch): one
    ``index_cycle(opq_impl='learned', opq_seed='v1')`` run commits the
    coarse tier (raw-space centroids/cells), the rotation MATRIX as
    data, and the rotated-space codebook/codes — the generation
    ``ivf_opq_search`` composes coarse prune + learned-rotation ADC
    re-rank from. Separate root from ``_ivf_index_root`` because a
    generation carries exactly one rotation impl (the opq_meta
    contract)."""
    import os
    import shutil

    from homelogging_spark.operators import maintenance
    from homelogging_spark.tables import (
        _fixture_build_lock,
        _fixture_path,
        _fixture_stale,
    )

    path = _fixture_path(sf_dir, "learned_index")
    src = os.path.join(sf_dir, "embeddings.parquet")
    probe = os.path.join(path, "centroids")

    def _stale() -> bool:
        return _fixture_stale(probe, src) or any(
            not os.path.exists(os.path.join(path, a))
            for a in maintenance.INDEX_ARTIFACTS
            + (
                maintenance.OPQ_ROTATION,
                "opq_codebook",
                "opq_codes",
                maintenance.OPQ_META,
            )
        )

    if _stale():
        with _fixture_build_lock(path):
            if _stale():
                shutil.rmtree(path, ignore_errors=True)
                _, corpus = _emb_split(spark, sf_dir)
                maintenance.index_cycle(
                    spark,
                    corpus.select("vec_id", "embedding"),
                    path,
                    k_min=INDEX_CYCLE_K,
                    k_max=INDEX_CYCLE_K,
                    n_iters=IVF_KMEANS_ITERS,
                    pq_subspaces=4,
                    pq_centroids=8,
                    dim=EMB_DIM,
                    opq_seed="v1",
                    opq_impl="learned",
                )
    return path


def q_ivf_opq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-OPQ composition SERVED from one committed generation
    (written r19, REGISTERED r20 on the slot freed by the
    opq_index_search → index_cycle_search panel consolidation — the
    r19 verdict's #1): the generation's raw-space coarse tier prunes each
    query to its {IVF_NPROBE} nearest cells, and its LEARNED-rotation
    OPQ tier ADC-ranks the survivors from codes only
    (``maintenance.ivf_opq_search`` — rotation resolved from the
    committed matrix artifact, asserted against the config version in
    opq_meta, applied query-side only). The best-quality code tier on
    the cheapest candidate path: probes are Q·nprobe rows, the corpus
    moves as codes, and the cross-space composition is sound because
    the rotation is orthogonal (raw-space cosine pruning selects the
    cells a rotated-space prune would).

    The oracle replays the full chain: coarse k-means + assignments in
    the raw space, rotation/PQ-train/encode/ADC in the rotated space —
    ``ivf_pq_topk_sql(rotation=...)`` with the same frozen literals
    ``rotate_by_matrix`` embeds, bit-equal on both engines."""
    from homelogging_spark.operators.maintenance import ivf_opq_search

    idx = _cached_index_handle(spark, _learned_index_root(spark, sf_dir))
    queries, _ = _emb_split(spark, sf_dir)
    out = ivf_opq_search(
        queries.select("vec_id", "embedding"),
        idx,
        k=5,
        nprobe=IVF_NPROBE,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )
    return out.select(
        "query_id", "rank", "vec_id", quantize("adc_d2").alias("adc_d2")
    )


def _ivf_opq_search_oracle() -> str:
    from homelogging_spark.operators.opq_rotations import rotation_for

    return f"""
WITH base AS ({similarity.ivf_pq_topk_sql(
        _IDX_CORPUS_SQL,
        _IDX_CORPUS_SQL,
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
        k=5, nprobe=IVF_NPROBE, n_subspaces=4, n_centroids=8,
        coarse_k=INDEX_CYCLE_K, coarse_iters=IVF_KMEANS_ITERS, dim=EMB_DIM,
        rotation=rotation_for(1))})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


ORACLE_IVF_OPQ_SEARCH = _ivf_opq_search_oracle()


def q_opq_learned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED-rotation OPQ search under a config-frozen matrix (r18,
    unit-only — an r19/r20 registration candidate needing a funding
    consolidation): the rotation is Ge et al. alternating optimization
    trained OFFLINE and committed as versioned config
    (``opq_rotations.rotation_for`` — the BPE DEFAULT_MERGES design
    applied to a trained artifact), so the serving chain
    rotate → PQ-train → encode → ADC-rank is fully oracle-replayable
    even though the SVD training step never is. Rotation applied as
    the ``rotate_by_matrix`` expression (bit-identical on both
    engines); the PQ chain is ``q_pq_adc_topk``'s exactly (4×8,
    sample_mod=16, rank keys quantized at 6 decimals).

    Scale: identical shape to ``index_cycle_search``'s opq leg (the
    retired opq_index_search row) with the structured
    rotation swapped for the frozen learned one — one rotation pass
    fused into each scan, broadcast codebook, codes-only ranking; at
    production dim the expression form gives way to ``opq_rotate``'s
    dgemm exactly as expr gives way to fwht."""
    from homelogging_spark.operators.opq_rotations import rotation_for

    r = rotation_for()
    queries, corpus = _emb_split(spark, sf_dir)
    # r20: Arrow-batch bit-exact twin of the rotate_by_matrix expression
    # (similarity.rotate_by_matrix_rows) — same outputs, O(1) plan
    # instead of a dim² HOF tree rebuilt + reanalyzed per invocation and
    # interpreted per row. mapInPandas is opaque to filter pushdown, so
    # the codebook's id-mod TRAINING SAMPLE is taken BEFORE the rotation
    # (filter-then-rotate ≡ rotate-then-filter on vec_id; same rows the
    # in-operator sample_mod filter selected, and at scale the training
    # pass now rotates only the sample).
    rot = lambda df: similarity.rotate_by_matrix_rows(  # noqa: E731
        df.select("vec_id", "embedding"), r
    )
    rot_corpus = rot(corpus)
    rot_train = rot(corpus.where(F.col("vec_id") % 16 == 0))
    codebook = _cached_quantizer(
        spark,
        sf_dir,
        "opq_learned_pq",
        lambda: similarity.pq_codebook(
            rot_train, n_subspaces=4, n_centroids=8, dim=EMB_DIM, sample_mod=None
        ),
    )
    codes = similarity.pq_codes(
        rot_corpus, n_subspaces=4, n_centroids=8, dim=EMB_DIM, codebook=codebook
    )
    out = similarity.pq_adc_topk(
        rot(queries),
        codes,
        codebook,
        k=5,
        n_subspaces=4,
        dim=EMB_DIM,
        rank_decimals=6,
    )
    return out.select(
        "query_id", "rank", "vec_id", quantize("adc_d2").alias("adc_d2")
    )


def _opq_learned_search_oracle() -> str:
    from homelogging_spark.operators.opq_rotations import rotation_for

    r = rotation_for()
    rot_corpus = similarity.rotate_by_matrix_sql(_IDX_CORPUS_SQL, r)
    rot_queries = similarity.rotate_by_matrix_sql(
        f"SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERY_VECS}",
        r,
    )
    return f"""
WITH base AS ({similarity.pq_adc_topk_sql(
        rot_corpus, rot_corpus, rot_queries,
        k=5, n_subspaces=4, n_centroids=8, n_iters=IVF_KMEANS_ITERS,
        dim=EMB_DIM, sample_mod=16, rank_decimals=6)})
SELECT query_id, rank, vec_id, {quantize_sql('adc_d2')} AS adc_d2 FROM base
"""


ORACLE_OPQ_LEARNED_SEARCH = _opq_learned_search_oracle()


def _bm25_state_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialized BM25 corpus-statistics state for the documents
    table — built once per sf_dir THROUGH the incremental merger
    (three doc_id-sliced micro-batches folded by
    ``streaming.pipeline.bm25_stats_batch_merger``, the exact
    foreachBatch body the stream runs), then SERVED from parquet. The
    `_ivf_index_root` discipline applied to the lexical tier: the
    certified chain is stream-merge → committed generation → load →
    rank. r19: the generation builds in the HASH-PARTITIONED layout
    (``n_partitions=8`` — batches 1 and 2 exercise the
    touched-partition-only rewrite), which is invisible to serving:
    ``bm25_topk`` selects (term, df) by name, so the bookkeeping
    part/pmax columns project away and the registered row's emitted
    values are IDENTICAL to the legacy layout's (re-verified
    hash-equal against the unchanged recompute oracle at
    sf0.001/0.01/0.1 — a plan-internal change, no window tag)."""
    import os
    import shutil

    from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger
    from homelogging_spark.tables import (
        _fixture_build_lock,
        _fixture_path,
        _fixture_stale,
    )

    path = _fixture_path(sf_dir, "bm25_state")
    src = os.path.join(sf_dir, "documents.parquet")
    probe = os.path.join(path, "stats")

    def _stale() -> bool:
        if _fixture_stale(probe, src) or not os.path.exists(
            os.path.join(path, "dfreq")
        ):
            return True
        # the generation must carry the corpus fingerprint the
        # serve-time drift check verifies (r18) and the partitioned
        # layout marker (r19) — older fixture states rebuild once
        import glob as _glob

        import pyarrow.parquet as _pq

        parts = _glob.glob(os.path.join(probe, "*.parquet"))
        if not parts:
            return True
        names = _pq.read_schema(parts[0]).names
        return "corpus_digest" not in names or "n_partitions" not in names

    if _stale():
        with _fixture_build_lock(path):
            if _stale():
                shutil.rmtree(path, ignore_errors=True)
                docs = load_table(spark, sf_dir, "documents").select(
                    "doc_id", "text"
                )
                merger = bm25_stats_batch_merger(path, n_partitions=8)
                for i in range(3):
                    merger(docs.where(F.col("doc_id") % 3 == i), i)
    return path


def q_bm25_state_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k SERVED from the stream-maintained statistics state
    (written r17, registered r18 — funded by the sq8_topk → ann_topk
    method-leg consolidation): df / N / total_dl
    come from the committed generation `_bm25_state_root` built through
    the incremental merger; only the (query-term-pruned) tf pass
    touches text at serve time. The oracle is the plain RECOMPUTING
    BM25 SQL over the same corpus — the operator's entire claim is that
    serving from maintained state emits the recomputing path's rows
    verbatim, so hash-matching the recompute IS the certification (the
    skew_split_join oracle pattern). ``verify_state=True`` (r18): the
    registered row also exercises the corpus-fingerprint drift check —
    the state generation's digest must match the scored frame or the
    query raises instead of serving shifted idfs. r20 (r19 ADVICE #1):
    the state loads through :func:`textops.bm25_from_state`, which
    repairs an interrupted partition swap BEFORE reading — the load-
    side repair guarantee the LM tier already had, now on BM25 too."""
    from homelogging_spark.operators.textops import bm25_from_state, bm25_topk

    state = _bm25_state_root(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    q_panel = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(HYBRID_QUERY_TERMS.items()) for t in terms],
        "query_id long, term string",
    )
    st = bm25_from_state(spark, state)
    out = bm25_topk(
        docs,
        q_panel,
        k=HYBRID_K,
        dfreq=st["dfreq"],
        stats=st["stats"],
        verify_state=True,
    )
    return out.select("query_id", "rank", "doc_id", "score", "n_terms_hit")


def _bm25_state_served_oracle() -> str:
    from homelogging_spark.operators.textops import bm25_topk_sql

    q_cte = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({qid}, '{t}')"
            for qid, terms in sorted(HYBRID_QUERY_TERMS.items())
            for t in terms
        )
        + ") q(query_id, term)"
    )
    return bm25_topk_sql(q_cte, k=HYBRID_K)


ORACLE_BM25_STATE_SERVED = _bm25_state_served_oracle()


LM_PPL_THRESHOLD = 34.0  # splits the fixture corpus ~80/20 (config)
LM_MIN_COUNT = 2  # hapax bigrams cut — exercises the table-size dial
LM_STATE_PARTITIONS = 8  # hash-partitioned state layout (r19)


def _lm_state_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialized bigram-LM reference statistics for the documents
    table's reference slice (doc_id % 4 == 0) — built once per sf_dir
    THROUGH the incremental merger in its r19 HASH-PARTITIONED layout
    (three doc_id-sliced micro-batches folded by
    ``streaming.pipeline.ngram_lm_batch_merger(n_partitions=8)``, the
    exact foreachBatch body the stream runs — so batches 1 and 2
    exercise the touched-partition-only rewrite path), then SERVED
    from parquet. The ``_bm25_state_root`` discipline applied to the
    LM tier: the certified chain is stream-merge → committed
    generation → verified load → score."""
    import os
    import shutil

    from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger
    from homelogging_spark.tables import (
        _fixture_build_lock,
        _fixture_path,
        _fixture_stale,
    )

    path = _fixture_path(sf_dir, "lm_state")
    src = os.path.join(sf_dir, "documents.parquet")
    probe = os.path.join(path, "stats")

    def _stale() -> bool:
        if _fixture_stale(probe, src) or not os.path.exists(
            os.path.join(path, "bigrams")
        ):
            return True
        # the generation must be the partitioned layout with the size
        # metrics and the fingerprint the verified load checks —
        # pre-r19 states rebuild once
        import glob as _glob

        import pyarrow.parquet as _pq

        parts = _glob.glob(os.path.join(probe, "*.parquet"))
        if not parts:
            return True
        names = _pq.read_schema(parts[0]).names
        return "corpus_digest" not in names or "n_partitions" not in names

    if _stale():
        with _fixture_build_lock(path):
            if _stale():
                shutil.rmtree(path, ignore_errors=True)
                ref = (
                    load_table(spark, sf_dir, "documents")
                    .select("doc_id", "text")
                    .where(F.col("doc_id") % 4 == 0)
                )
                merger = ngram_lm_batch_merger(
                    path, n_partitions=LM_STATE_PARTITIONS
                )
                for i in range(3):
                    merger(ref.where(F.col("doc_id") % 3 == i), i)
    return path


def q_lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM perplexity filter SERVED from the
    stream-maintained statistics state (written r18, registered r19 on
    the free cap slot): the reference slice (doc_id % 4 == 0) is
    folded into a hash-partitioned raw-count state generation through
    the incremental merger (``_lm_state_root``), loaded with the
    min_count=2 hapax cut applied consistently at load
    (``textops.ngram_lm_from_state`` — raw counts in state because the
    cut is not additive-safe across micro-batches) AND with
    ``verify_corpus=ref``, so the registered row exercises the
    corpus-fingerprint drift check live (the ``bm25_state_served``
    posture); every other document is scored by mean bigram negative
    log-likelihood against the loaded model (``textops.
    ngram_lm_score``) — the LM-based member of the quality-stage
    family beside the heuristic panel and the versioned linear
    classifier (Wenzek et al. 2020's perplexity stage with a
    self-contained, oracle-replayable model). keep = ppl <= 34
    (config; splits the fixture ~80/20 so both verdicts fire).

    The oracle is the plain BATCH-TRAINING SQL replay (train → smooth
    → score → threshold end-to-end) — the operator's claim is that
    serving from the maintained, partition-incrementally-built state
    emits the batch path's rows verbatim, so hash-matching the
    recompute IS the certification (the skew_split_join /
    bm25_state_served oracle pattern).

    Scale: the state build amortizes across queries (one partial-agg
    shuffle per batch, touched-partition rewrites); scoring is two
    hash joins against the bounded cut table plus a doc-id partial
    agg — the corpus is scanned once at serve time."""
    from homelogging_spark.operators.textops import (
        ngram_lm_from_state,
        ngram_lm_score,
    )

    state = _lm_state_root(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    ref = docs.where(F.col("doc_id") % 4 == 0)
    rest = docs.where(F.col("doc_id") % 4 != 0)
    lm = ngram_lm_from_state(
        spark, state, min_count=LM_MIN_COUNT, verify_corpus=ref
    )
    return ngram_lm_score(
        rest, lm, k=0.5, ppl_threshold=LM_PPL_THRESHOLD
    )


ORACLE_LM_PERPLEXITY_FILTER = None  # assigned below (needs textops import)


def _lm_perplexity_filter_oracle() -> str:
    from homelogging_spark.operators.textops import ngram_lm_score_sql

    return ngram_lm_score_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0)",
        "(SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0)",
        k=0.5,
        ppl_threshold=LM_PPL_THRESHOLD,
        min_count=LM_MIN_COUNT,
    )


ORACLE_LM_PERPLEXITY_FILTER = _lm_perplexity_filter_oracle()


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    out = similarity.lsh_near_dup_pairs(emb, threshold=0.4)
    return out.select("id_a", "id_b", quantize("cosine").alias("cosine"))


def _embedding_near_dup_oracle(n_tables: int = 4, planes_per_table: int = 4) -> str:
    planes = similarity.hyperplanes(n_tables * planes_per_table, EMB_DIM)
    bucket_selects = "\nUNION ALL ".join(
        f"SELECT vec_id, {t} AS table_idx, "
        + similarity.lsh_bucket_sql(
            "embedding", planes[t * planes_per_table : (t + 1) * planes_per_table]
        )
        + " AS bucket FROM embeddings"
        for t in range(n_tables)
    )
    return f"""
WITH b AS ({bucket_selects}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2
    ON a.table_idx = b2.table_idx AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
s AS (SELECT cand.id_a, cand.id_b,
             {similarity.cosine_sql('x.embedding', 'y.embedding', EMB_DIM)} AS cos
      FROM cand
      JOIN embeddings x ON cand.id_a = x.vec_id
      JOIN embeddings y ON cand.id_b = y.vec_id)
SELECT id_a, id_b, {quantize_sql('cos')} AS cosine FROM s WHERE cos > 0.4
"""


ORACLE_EMBEDDING_NEAR_DUP = _embedding_near_dup_oracle()


# --- chunking / exact duplicated passages ------------------------------------

def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking with stride — corpus → training examples
    (``operators/chunking.chunk_documents``). Map-side only: sequence →
    posexplode → slice, zero shuffles."""
    from homelogging_spark.operators import chunking

    return chunking.chunk_documents(_docs(spark, sf_dir))


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span statistics (Lee et al. 2022 exact-substring
    dedup, positional k-shingle form) — the verbatim-passage complement
    to MinHash whole-doc near-dup
    (``operators/chunking.duplicated_passages``)."""
    from homelogging_spark.operators import chunking

    return chunking.duplicated_passages(_docs(spark, sf_dir))


def _chunking_oracles() -> tuple[str, str]:
    from homelogging_spark.operators import chunking

    return chunking.chunk_documents_sql(), chunking.duplicated_passages_sql()


ORACLE_DOC_CHUNKS, ORACLE_PASSAGE_DEDUP = _chunking_oracles()


# --- multimodal --------------------------------------------------------------

def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return multimodal.byte_stats(multimodal.with_payload(docs))


ORACLE_MULTIMODAL_BYTE_STATS = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1)))) AS BIGINT) AS byte_sum,
       CAST(len(list_distinct(list_transform(range(length(text)), i -> ascii(substr(text, i+1, 1))))) AS BIGINT) AS n_unique_bytes,
       lower(substr(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd 64-byte frame of each payload with stable content md5
    (``multimodal.frame_sample``) — the video/audio frame-sampling
    plumbing over the binary column. The oracle slices the text
    CHARACTER-wise, which equals the byte frames because the fixture
    corpus is pure ASCII (asserted by ``multimodal_byte_stats``'s
    octet_length == length agreement); real media swaps the slicer for
    a decoder, not the plan."""
    docs = _docs(spark, sf_dir)
    return multimodal.frame_sample(multimodal.with_payload(docs))


ORACLE_FRAME_SAMPLE = """
WITH t AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
), f AS (
  SELECT doc_id, text, unnest(generate_series(0, n // 64 - 1, 2)) AS k
  FROM t WHERE n >= 64
)
SELECT doc_id,
       CAST(k AS BIGINT) AS frame_idx,
       CAST(k * 64 AS BIGINT) AS frame_off,
       md5(substring(text, k * 64 + 1, 64)) AS frame_md5
FROM f
"""


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-curriculum ordering: quality quintile
    stages (high-quality first), then a round-robin interleave across
    sources inside each stage so no stage front-loads one domain —
    every rank derives from the QUANTIZED quality score with doc_id
    tiebreaks, so both engines order from bit-identical keys (the
    ``dedup_keep_best`` rule).

    Scale: NO global window anywhere (gated in ``test_plan_quality``).
    Both global ranks come from ``sampling.distributed_row_number`` —
    range-repartition + per-partition offsets, the ``budget_select``
    two-pass prefix-sum shape — and the quintile stage is the
    SQL-standard ``ntile(5)`` closed form over that rank and the corpus
    count (first ``n % 5`` buckets take the extra row), so the output
    is bit-identical to the naive ``Window.orderBy`` ntile plan the
    DuckDB oracle still runs. The only per-stage window partitions by
    (stage, source)."""
    from homelogging_spark.functions.cachelife import tracked_persist
    from homelogging_spark.operators.sampling import distributed_row_number

    docs = _docs(spark, sf_dir)
    q = quantize(textops.quality_columns(F.col("text"))["quality_score"])
    # persist the narrow (doc_id, source, quality) projection: the
    # two-pass rank evaluates its input lineage more than once, and the
    # quality text-ops are the expensive part of this query's lineage
    base = tracked_persist(docs.select("doc_id", "source", q.alias("quality")))
    ranked = distributed_row_number(
        base, [F.col("quality").desc(), F.col("doc_id")], alias="__rank"
    )
    n_df = base.agg(F.count(F.lit(1)).alias("__n"))
    r, n = F.col("__rank"), F.col("__n")
    rem = n % 5
    q_sz = (n - rem) / 5  # whole by construction
    stage = F.when(
        r <= rem * (q_sz + 1), F.ceil(r / (q_sz + 1))
    ).otherwise(rem + F.ceil((r - rem * (q_sz + 1)) / q_sz))
    staged = (
        ranked.join(F.broadcast(n_df))
        .withColumn("stage", stage.cast("bigint"))
        .drop("__rank", "__n")
    )
    w_src = Window.partitionBy("stage", "source").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    pos = staged.withColumn(
        "pos_in_source", F.row_number().over(w_src).cast("bigint")
    )
    out = distributed_row_number(
        pos,
        [F.col("stage"), F.col("pos_in_source"), F.col("source"), F.col("doc_id")],
        alias="global_pos",
    )
    return out.select(
        "doc_id", "source", "stage", "pos_in_source", "global_pos", "quality"
    )


ORACLE_CURRICULUM_ORDER = f"""
WITH base AS (
  SELECT doc_id, source,
         {quantize_sql(_QC['quality_score'])} AS quality
  FROM documents
), staged AS (
  SELECT *, CAST(ntile(5) OVER (ORDER BY quality DESC, doc_id) AS BIGINT) AS stage
  FROM base
), pos AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY stage, source ORDER BY quality DESC, doc_id
         ) AS BIGINT) AS pos_in_source
  FROM staged
)
SELECT doc_id, source, stage, pos_in_source,
       CAST(row_number() OVER (
         ORDER BY stage, pos_in_source, source, doc_id
       ) AS BIGINT) AS global_pos,
       quality
FROM pos
"""


# --- mergeable sketches / sharding (r8 registrations) -------------------------
#
# Promoted verbatim from their pre-certified drafts
# (tests/test_sketches.py::TestR8RegistrationDrafts and
# tests/test_tsmatch.py::TestRegistrationDraft ran these exact shapes
# with full DuckDB oracles against real sf0.01 data in r7).

_KMV_K = 128


def q_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise token-vocabulary overlap between sources, from KMV
    sketches alone (``operators/sketches.py``): per-source k-minimum-
    value sketches of the word-token stream, then union / Jaccard /
    intersection estimates for every source pair computed on the
    dim-sized sketch rows — the set-algebra question the HLL rollup
    (``q_hll_distinct_rollup``) cannot answer, without ever joining the
    token streams. The oracle rebuilds the sketches and every estimate
    bit-for-bit in DuckDB (md5-derived 52-bit hashes, identical merge
    and estimator arithmetic)."""
    from homelogging_spark.functions.texthash import tokens as _tokens
    from homelogging_spark.operators import sketches as sk

    docs = _docs(spark, sf_dir)
    toks = docs.select("source", F.explode(_tokens(F.col("text"))).alias("tok"))
    sketches = sk.kmv_sketch(toks, "tok", ["source"], k=_KMV_K)
    return sk.kmv_overlap(sketches, "source", k=_KMV_K).select(
        "group_a",
        "group_b",
        "n_union_sample",
        "n_both_in_sample",
        quantize("union_est").alias("union_est"),
        quantize("jaccard_est").alias("jaccard_est"),
        quantize("intersection_est").alias("intersection_est"),
    )


def _kmv_source_overlap_oracle(k: int = _KMV_K) -> str:
    from homelogging_spark.operators import sketches as sk

    h = sk._hash52_sql("tok", "kmv")
    merge = sk.kmv_merge_arrays_sql("a.kmv", "b.kmv", k)
    est = sk.kmv_estimate_sql("l", k)
    return f"""
WITH tok AS (SELECT source, unnest({tokens_sql('text')}) AS tok FROM documents),
h AS (SELECT DISTINCT source, {h} AS h FROM tok),
s AS (SELECT source, list_slice(list_sort(list(h)), 1, {k}) AS kmv FROM h GROUP BY source),
pairs AS (
  SELECT a.source AS group_a, b.source AS group_b,
         {merge} AS l,
         list_intersect(a.kmv, b.kmv) AS inter
  FROM s a JOIN s b ON a.source < b.source),
staged AS (
  SELECT group_a, group_b,
         len(l) AS n_l, len(list_intersect(l, inter)) AS n_both,
         {est} AS union_est
  FROM pairs)
SELECT group_a, group_b,
       CAST(n_l AS BIGINT) AS n_union_sample,
       CAST(n_both AS BIGINT) AS n_both_in_sample,
       {quantize_sql('union_est')} AS union_est,
       {quantize_sql('CAST(n_both AS DOUBLE) / CAST(n_l AS DOUBLE)')} AS jaccard_est,
       {quantize_sql('(CAST(n_both AS DOUBLE) / CAST(n_l AS DOUBLE)) * union_est')} AS intersection_est
FROM staged
"""


ORACLE_KMV_SOURCE_OVERLAP = _kmv_source_overlap_oracle()

_CM_DEPTH, _CM_WIDTH, _CM_TOPK = 4, 1024, 10


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters with count-min honesty columns
    (``sketches.heavy_hitters_report``): exact top-10 tokens
    (partial-agg + TakeOrderedAndProject) joined with the count-min
    estimate from a 4×1024 register table, ``overestimate`` emitted so
    the sketch's one-sided error is data, not argument. The register
    table is the constant-size structure a 100 TB rollup keeps per
    partition/day and merges by register sum; the oracle rebuilds the
    registers and the min-over-rows probe bit-for-bit."""
    from homelogging_spark.functions.texthash import tokens as _tokens
    from homelogging_spark.operators import sketches as sk

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("tok"))
    return sk.heavy_hitters_report(
        toks, "tok", k=_CM_TOPK, depth=_CM_DEPTH, width=_CM_WIDTH
    )


def _token_heavy_hitters_oracle(
    depth: int = _CM_DEPTH, width: int = _CM_WIDTH, topk: int = _CM_TOPK
) -> str:
    from homelogging_spark.operators import sketches as sk

    reg_selects = "\nUNION ALL ".join(
        f"SELECT {r} AS row, {sk._cm_col_sql('tok', r, width, 'cm')} AS col, "
        f"CAST(1 AS BIGINT) AS w FROM tok"
        for r in range(depth)
    )
    probe_selects = "\nUNION ALL ".join(
        f"SELECT tok, {r} AS row, {sk._cm_col_sql('tok', r, width, 'cm')} AS col "
        f"FROM exact"
        for r in range(depth)
    )
    return f"""
WITH tok AS (SELECT unnest({tokens_sql('text')}) AS tok FROM documents),
regs AS (SELECT row, col, SUM(w) AS cnt FROM ({reg_selects}) GROUP BY row, col),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM tok GROUP BY tok
  ORDER BY n_exact DESC, tok LIMIT {topk}),
probes AS ({probe_selects}),
est AS (SELECT p.tok, min(coalesce(r.cnt, 0)) AS cm_est
        FROM probes p LEFT JOIN regs r USING (row, col) GROUP BY p.tok)
SELECT e.tok, e.n_exact,
       CAST(est.cm_est AS BIGINT) AS cm_est,
       CAST(est.cm_est - e.n_exact AS BIGINT) AS overestimate
FROM exact e JOIN est USING (tok)
"""


ORACLE_TOKEN_HEAVY_HITTERS = _token_heavy_hitters_oracle()

_BLOOM_M, _BLOOM_J = 1 << 12, 5


def q_bloom_seen_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom seen-set gate over content digests (``sketches.bloom_build``
    / ``bloom_contains_inline``): docs with ``doc_id % 4 == 0`` play the
    incoming snapshot, the rest the retained corpus (the
    ``incremental_dedup`` split). The corpus digests build an m-bit word
    table (≤ ceil(m/63) rows — broadcast-sized regardless of corpus
    size); every incoming doc is probed INLINE (j broadcast joins, the
    streaming-legal form `streaming_bloom_dedup` runs per micro-batch).
    ``actually_seen`` (the exact digest join) is emitted alongside so
    the no-false-negative law is certified in data:
    ``actually_seen ⇒ maybe_present`` row by row. The oracle rebuilds
    the word table bit-for-bit via ``bloom_word_sql``."""
    from homelogging_spark.functions.cachelife import tracked_persist
    from homelogging_spark.operators import sketches as sk

    docs = _docs(spark, sf_dir)
    old_dig = tracked_persist(
        docs.where(F.col("doc_id") % 4 != 0)
        .select(F.md5(F.col("text")).alias("digest"))
        .distinct()
    )
    # materialize the word table once: bloom_contains_inline references
    # it in j differently-aliased broadcast joins, and without the
    # persist the digest scan + bit-OR aggregation would re-execute per
    # alias (the r7 ADVICE finding on streaming_bloom_dedup)
    filt = tracked_persist(sk.bloom_build(old_dig, "digest", _BLOOM_M, _BLOOM_J))
    # force materialization NOW (r8 ADVICE): persist alone is lazy, and the
    # j broadcast exchanges can otherwise race to compute the cache,
    # duplicating the digest scan the persist exists to avoid — same fix
    # as streaming_bloom_dedup's pre-stream count()
    filt.count()
    hashed = docs.where(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    )
    probed = sk.bloom_contains_inline(hashed, filt, "digest", _BLOOM_M, _BLOOM_J)
    seen = F.coalesce(F.col("_hit"), F.lit(False))
    return (
        probed.join(
            F.broadcast(old_dig.withColumn("_hit", F.lit(True))), "digest", "left"
        )
        .select(
            "doc_id",
            "digest",
            "maybe_present",
            seen.alias("actually_seen"),
            (~F.col("maybe_present")).alias("definitely_new"),
        )
    )


def _bloom_seen_probe_oracle(m_bits: int = _BLOOM_M, j: int = _BLOOM_J) -> str:
    from homelogging_spark.operators import sketches as sk

    coords = sk.bloom_word_sql("digest", j, m_bits, "bloom")
    probe_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, digest, {p} AS p FROM newdocs"
        for p in sk._bloom_positions_sql("digest", j, m_bits, "bloom")
    )
    wb = sk._BLOOM_WORD_BITS
    return f"""
WITH newdocs AS (SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 4 = 0),
olddig AS (SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 4 != 0),
w AS (SELECT wm.word AS word, bit_or(wm.mask) AS bits
      FROM (SELECT unnest({coords}) AS wm FROM olddig) GROUP BY 1),
c AS (SELECT doc_id, digest, CAST(p // {wb} AS INT) AS word,
             CAST(p % {wb} AS INT) AS bitpos
      FROM ({probe_selects})),
probe AS (SELECT doc_id, digest,
                 bool_and(coalesce(((w.bits >> c.bitpos) & 1) = 1, FALSE)) AS maybe_present
          FROM c LEFT JOIN w USING (word) GROUP BY 1, 2)
SELECT p.doc_id, p.digest, p.maybe_present,
       (o.digest IS NOT NULL) AS actually_seen,
       NOT p.maybe_present AS definitely_new
FROM probe p LEFT JOIN olddig o USING (digest)
"""


ORACLE_BLOOM_SEEN_PROBE = _bloom_seen_probe_oracle()

_N_SHARDS = 8


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment + publishing manifest
    (``operators/sharding.py``): docs dealt round-robin over the
    (token-count desc, doc_id) order into 8 shards — provable balance
    ``max − min ≤ max item`` — then the per-shard manifest: counts,
    token totals, min/max sizes, and the order-insensitive md5-XOR
    content fingerprint two manifest versions diff by. The global rank
    uses ``distributed_row_number`` (no global window); the manifest is
    one bounded groupBy. Assign AND manifest certified by one oracle."""
    from homelogging_spark.operators import sharding

    docs = _docs(spark, sf_dir)
    qc = textops.quality_columns(F.col("text"))
    sized = docs.select("doc_id", qc["n_tokens"].alias("n_tokens"))
    assigned = sharding.shard_assign(sized, _N_SHARDS)
    return sharding.shard_manifest(assigned)


def _shard_manifest_oracle() -> str:
    from homelogging_spark.operators import sharding

    sized = f"(SELECT doc_id, {_QC['n_tokens']} AS n_tokens FROM documents)"
    return sharding.shard_manifest_sql(sized, _N_SHARDS)


ORACLE_SHARD_MANIFEST = _shard_manifest_oracle()


LLM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_quality_panel": q_text_quality_panel,
    "text_clean_panel": q_text_clean_panel,
    "corpus_budget_select": q_corpus_budget_select,
    "incremental_dedup": q_incremental_dedup,
    "semantic_dedup": q_semantic_dedup,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "model_quality_filter": q_model_quality_filter,
    "tfidf_top_terms": q_tfidf_top_terms,
    "contamination_scan": q_contamination_scan,
    "length_drift_psi": q_length_drift_psi,
    "exact_dedup": q_exact_dedup,
    "minhash_near_dup": q_minhash_near_dup,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_clusters": q_dedup_clusters,
    "leakage_split": q_leakage_split,
    "corpus_build_pipeline": q_corpus_build_pipeline,
    "ann_topk": q_ann_topk,
    "hybrid_search_panel": q_hybrid_search_panel,
    "ivf_pq_topk": q_ivf_pq_topk,
    "index_cycle_search": q_index_cycle_search,
    "ivf_opq_search": q_ivf_opq_search,
    "bm25_state_served": q_bm25_state_served,
    "lm_perplexity_filter": q_lm_perplexity_filter,
    "opq_learned_search": q_opq_learned_search,
    "opq_panel": q_opq_panel,
    "pq_adc_topk": q_pq_adc_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "doc_chunks": q_doc_chunks,
    "passage_dedup": q_passage_dedup,
    "multimodal_byte_stats": q_multimodal_byte_stats,
    "frame_sample": q_frame_sample,
    "curriculum_order": q_curriculum_order,
    "kmv_source_overlap": q_kmv_source_overlap,
    "token_heavy_hitters": q_token_heavy_hitters,
    "bloom_seen_probe": q_bloom_seen_probe,
    "shard_manifest": q_shard_manifest,
}

LLM_ORACLES: dict[str, str] = {
    "text_quality_panel": ORACLE_TEXT_QUALITY_PANEL,
    "text_clean_panel": ORACLE_TEXT_CLEAN_PANEL,
    "corpus_budget_select": ORACLE_CORPUS_BUDGET_SELECT,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "cluster_balanced_sample": ORACLE_CLUSTER_BALANCED_SAMPLE,
    "model_quality_filter": ORACLE_MODEL_QUALITY_FILTER,
    "tfidf_top_terms": ORACLE_TFIDF_TOP_TERMS,
    "contamination_scan": ORACLE_CONTAMINATION_SCAN,
    "length_drift_psi": ORACLE_LENGTH_DRIFT_PSI,
    "exact_dedup": ORACLE_EXACT_DEDUP,
    "minhash_near_dup": ORACLE_MINHASH_NEAR_DUP,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "leakage_split": ORACLE_LEAKAGE_SPLIT,
    "corpus_build_pipeline": ORACLE_CORPUS_BUILD_PIPELINE,
    "ann_topk": ORACLE_ANN_TOPK,
    "hybrid_search_panel": ORACLE_HYBRID_SEARCH_PANEL,
    "ivf_pq_topk": ORACLE_IVF_PQ_TOPK,
    "index_cycle_search": ORACLE_INDEX_CYCLE_SEARCH,
    "ivf_opq_search": ORACLE_IVF_OPQ_SEARCH,
    "bm25_state_served": ORACLE_BM25_STATE_SERVED,
    "lm_perplexity_filter": ORACLE_LM_PERPLEXITY_FILTER,
    "opq_learned_search": ORACLE_OPQ_LEARNED_SEARCH,
    "opq_panel": ORACLE_OPQ_PANEL,
    "pq_adc_topk": ORACLE_PQ_ADC_TOPK,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "passage_dedup": ORACLE_PASSAGE_DEDUP,
    "multimodal_byte_stats": ORACLE_MULTIMODAL_BYTE_STATS,
    "frame_sample": ORACLE_FRAME_SAMPLE,
    "curriculum_order": ORACLE_CURRICULUM_ORDER,
    "kmv_source_overlap": ORACLE_KMV_SOURCE_OVERLAP,
    "token_heavy_hitters": ORACLE_TOKEN_HEAVY_HITTERS,
    "bloom_seen_probe": ORACLE_BLOOM_SEEN_PROBE,
    "shard_manifest": ORACLE_SHARD_MANIFEST,
}
