"""Training-pipeline assembly queries: sequence packing + deterministic
sampling over the ``documents`` corpus.

These are the corpus-assembly steps downstream of dedup/quality (the
``operators/packing.py`` and ``operators/sampling.py`` tier): pack short
docs into fixed token budgets, take reproducible stratified /
fixed-size-per-group samples, and compute domain-mixture reweights.

Every query has a DuckDB oracle replicating the same algorithm
bit-for-bit: the packing fold is an integer recurrence (recursive CTE
twin), and all sampling selection is md5-derived dyadic uniforms —
``bits/2^52`` is exact in any IEEE engine, so even the float ``u``
column matches exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from homelogging_spark.functions.numeric import quantize, quantize_sql
from homelogging_spark.functions.texthash import tokens, tokens_sql
from homelogging_spark.operators import packing, sampling
from homelogging_spark.tables import load_table, spread

PACK_CAPACITY = 512
PACK_SHARDS = 8

# whitespace token count as the doc length measure, shared by packing and
# mixture weighting; mirrors ORACLE via tokens_sql
_N_TOKENS_SQL = f"CAST(len({tokens_sql('text')}) AS BIGINT)"

STRAT_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}
STRAT_DEFAULT = 0.05  # es/fr fall through to the default rate
TOPK_PER_LANG = 20
MIX_SHARES = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )


# --- sequence packing --------------------------------------------------------

def q_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit packing of the corpus into 512-token budgets,
    hash-sharded 8 ways (see ``operators/packing.pack_greedy``): per-doc
    pack assignment (pack_id within shard), position, and running fill —
    PLUS the pack-level utilization rollup (docs per pack, final fill,
    waste fraction) attached per row via a window over the pack key.
    (r6 merge: subsumes the former ``pack_stats`` driver query; the
    window adds no exchange — rows are already partitioned by shard
    after the packing fold — so one driver row certifies both the
    assignment and the monitoring rollup.)"""
    packed = packing.pack_greedy(
        _doc_tokens(spark, sf_dir),
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )
    wp = Window.partitionBy("shard", "pack_id")
    fill = F.max("pack_fill").over(wp)
    return packed.select(
        "shard",
        "doc_id",
        "n_tokens",
        "pack_id",
        "pack_pos",
        "pack_fill",
        F.count(F.lit(1)).over(wp).cast("bigint").alias("pack_n_docs"),
        fill.cast("bigint").alias("fill"),
        quantize(
            F.lit(1.0) - F.least(fill, F.lit(PACK_CAPACITY)) / float(PACK_CAPACITY)
        ).alias("waste_frac"),
    )


_ORACLE_PACK_ASSIGN = packing.pack_greedy_oracle_sql(
    f"SELECT doc_id, {_N_TOKENS_SQL} AS n_tokens FROM documents",
    capacity=PACK_CAPACITY,
    n_shards=PACK_SHARDS,
)

ORACLE_PACK_DOCS = f"""
WITH packed AS ({_ORACLE_PACK_ASSIGN})
SELECT shard, doc_id, n_tokens, pack_id, pack_pos, pack_fill,
       CAST(count(*) OVER (PARTITION BY shard, pack_id) AS BIGINT) AS pack_n_docs,
       CAST(max(pack_fill) OVER (PARTITION BY shard, pack_id) AS BIGINT) AS fill,
       {quantize_sql(f'1.0 - least(max(pack_fill) OVER (PARTITION BY shard, pack_id), {PACK_CAPACITY}) / {PACK_CAPACITY}.0')} AS waste_frac
FROM packed
"""


# --- deterministic sampling --------------------------------------------------

def q_sampling_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic-sampling designs in one method-labeled panel —
    the r17 merge of the former ``hash_sample_panel`` (itself the r10
    merge of ``stratified_sample`` + ``weighted_sample``) and
    ``group_topk_sample`` rows, which additionally registers the
    r16-unit-only ``weighted_group_topk_sample`` as its ``wtopk`` leg
    (one merge funding two registrations' worth — the r16 verdict's
    consolidation plan). All four designs are salted-md5-uniform draws
    over the same corpus scan, so one union panel certifies each leg
    verbatim — (method, doc_id, lang, n_tokens, u, p, key, rank):

    - ``stratified``: per-language Bernoulli at configured rates (en
      50%, de 25%, zh 10%, default 5%); keep rule ``u < p``, p = the
      stratum rate (``sampling.stratified_hash_sample``).
    - ``weighted``: size-biased Bernoulli, p = min(1, rate * n_tokens)
      — budgets the kept TOKEN mass; u/p feed Horvitz-Thompson
      correction downstream (``sampling.weighted_hash_sample``).
    - ``topk``: exactly-k-per-language uniform (rank the hash uniform,
      keep first k — reservoir distribution, reproducible;
      ``sampling.group_topk_sample``).
    - ``wtopk``: exactly-k-per-language WEIGHTED without replacement
      (Efraimidis–Spirakis A-ES, token-count weights — the size-biased
      complement of topk); ``key`` = the audited group-max-normalized
      rank key u^(w_max/w) (``sampling.weighted_group_topk_sample``).

    The Bernoulli legs stay pure map-side predicates (no shuffle,
    reproducible under any repartitioning); the exactly-k legs are one
    rank-window shuffle each on the bounded language key."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    strat = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", STRAT_RATES, default_rate=STRAT_DEFAULT
    )
    # the stratum rate IS the inclusion probability of the stratified
    # leg — rebuilt here (same CASE the operator applies internally) so
    # the panel exposes p uniformly across both designs
    rate = F.lit(float(STRAT_DEFAULT))
    for stratum, r in sorted(STRAT_RATES.items()):
        rate = F.when(F.col("lang") == stratum, F.lit(float(r))).otherwise(rate)
    nulls = {
        "n_tokens": F.lit(None).cast("bigint").alias("n_tokens"),
        "u": F.lit(None).cast("double").alias("u"),
        "p": F.lit(None).cast("double").alias("p"),
        "key": F.lit(None).cast("double").alias("key"),
        "rank": F.lit(None).cast("bigint").alias("rank"),
    }
    strat_leg = strat.select(
        F.lit("stratified").alias("method"),
        "doc_id",
        "lang",
        nulls["n_tokens"],
        quantize("u").alias("u"),
        quantize(rate).alias("p"),
        nulls["key"],
        nulls["rank"],
    )
    toks = F.size(tokens(F.col("text"))).cast("bigint")
    wtd = sampling.weighted_hash_sample(
        docs.withColumn("n_tokens", toks), "doc_id", F.col("n_tokens"), WSAMP_RATE
    )
    wtd_leg = wtd.select(
        F.lit("weighted").alias("method"),
        "doc_id",
        "lang",
        "n_tokens",
        quantize("u").alias("u"),
        quantize("p").alias("p"),
        nulls["key"],
        nulls["rank"],
    )
    topk = sampling.group_topk_sample(docs, "lang", "doc_id", k=TOPK_PER_LANG)
    topk_leg = topk.select(
        F.lit("topk").alias("method"),
        "doc_id",
        "lang",
        nulls["n_tokens"],
        quantize("u").alias("u"),
        nulls["p"],
        nulls["key"],
        "rank",
    )
    wtopk = sampling.weighted_group_topk_sample(
        docs.withColumn("n_tokens", toks),
        "lang",
        "doc_id",
        F.col("n_tokens"),
        k=TOPK_PER_LANG,
    )
    wtopk_leg = wtopk.select(
        F.lit("wtopk").alias("method"),
        "doc_id",
        "lang",
        "n_tokens",
        nulls["u"],
        nulls["p"],
        F.col("aes_key").alias("key"),
        "rank",
    )
    return (
        strat_leg.unionByName(wtd_leg).unionByName(topk_leg).unionByName(wtopk_leg)
    )


_STRAT_RATE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{s}' THEN {r}" for s, r in sorted(STRAT_RATES.items())
    )
    + f" ELSE {STRAT_DEFAULT} END"
)


WSAMP_RATE = 0.004  # per-token keep rate; ~100-token docs keep at ~0.4

_NULL_D = "CAST(NULL AS DOUBLE)"
_NULL_B = "CAST(NULL AS BIGINT)"

ORACLE_SAMPLING_PANEL = f"""
WITH su AS (
  SELECT doc_id, lang, {sampling.uniform_sql('doc_id', 'strat')} AS u,
         {_STRAT_RATE_SQL} AS p
  FROM documents
), wt AS (
  SELECT doc_id, lang, {_N_TOKENS_SQL} AS n_tokens,
         {sampling.weighted_sql('doc_id', _N_TOKENS_SQL, WSAMP_RATE)}
  FROM documents
), tk AS (
  SELECT doc_id, lang, u,
         CAST(row_number() OVER (
              PARTITION BY lang ORDER BY u, doc_id) AS BIGINT) AS rank
  FROM (
    SELECT doc_id, lang, {sampling.uniform_sql('doc_id', 'topk')} AS u
    FROM documents
  )
), wtk AS ({sampling.weighted_group_topk_sql(
    f"(SELECT doc_id, lang, {_N_TOKENS_SQL} AS n_tokens FROM documents)",
    "lang", "doc_id", "n_tokens", TOPK_PER_LANG,
)})
SELECT 'stratified' AS method, doc_id, lang, {_NULL_B} AS n_tokens,
       {quantize_sql('u')} AS u, {quantize_sql('p')} AS p,
       {_NULL_D} AS key, {_NULL_B} AS rank
FROM su WHERE u < p
UNION ALL
SELECT 'weighted', doc_id, lang, n_tokens,
       {quantize_sql('u')}, {quantize_sql('p')}, {_NULL_D}, {_NULL_B}
FROM wt WHERE u < p
UNION ALL
SELECT 'topk', doc_id, lang, {_NULL_B},
       {quantize_sql('u')}, {_NULL_D}, {_NULL_D}, rank
FROM tk WHERE rank <= {TOPK_PER_LANG}
UNION ALL
SELECT 'wtopk', doc_id, lang, n_tokens,
       {_NULL_D}, {_NULL_D}, aes_key, rank
FROM wtk
"""


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture plan: observed token mass per language vs target
    shares → per-language acceptance rate (or upsample epochs when the
    stratum is under-represented). One corpus scan, one tiny aggregate
    (``operators/sampling.mixture_weights``)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = sampling.mixture_weights(
        docs, "lang", F.size(tokens(F.col("text"))).cast("bigint"), MIX_SHARES
    )
    return out.select(
        "lang",
        "n_docs",
        "n_tokens",
        quantize("target_share").alias("target_share"),
        quantize("rate").alias("rate"),
        quantize("epochs").alias("epochs"),
    )


_MIX_SHARE_SQL = (
    "CASE "
    + " ".join(f"WHEN lang = '{s}' THEN {v}" for s, v in sorted(MIX_SHARES.items()))
    + " ELSE 0.0 END"
)

ORACLE_MIXTURE_WEIGHTS = f"""
WITH agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({_N_TOKENS_SQL}) AS BIGINT) AS n_tokens,
         {_MIX_SHARE_SQL} AS target_share
  FROM documents GROUP BY lang
), t AS (
  SELECT *, sum(n_tokens) OVER () AS total FROM agg
)
SELECT lang, n_docs, n_tokens,
       {quantize_sql('target_share')} AS target_share,
       {quantize_sql('target_share * total / n_tokens')} AS rate,
       {quantize_sql('greatest(target_share * total / n_tokens, 1.0)')} AS epochs
FROM t
"""


# --- URL/domain curation ------------------------------------------------------

def q_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain curation panel (r16 — the FineWeb/CCNet pre-filter
    stage that ran AHEAD of text quality everywhere but here, r15
    verdict gap #3). Two family-labeled legs over one synthesized
    URL column (``documents`` carries no URL, so the gate SYNTHESIZES a
    deterministic messy URL per doc — uppercase schemes/hosts, default
    and non-default ports, tracking params mixed into real ones,
    fragments, root paths; the text_clean_panel pattern):

    - ``panel='doc'``: per-doc ``url_norm`` / registrable ``domain`` /
      blocklist verdict — certifies the whole normalization contract
      string-for-string (``operators/urlops`` module docstring) and the
      eTLD+1 extraction incl. multi-label suffixes (retail.co.uk,
      sample.com.au).
    - ``panel='domain'``: the per-domain rollup over UNBLOCKED docs fed
      into ``sampling.mixture_weights`` with uniform targets — n_docs,
      byte mass, and the acceptance rate that achieves the target mix.

    Scale: normalization/domain/blocklist are map-side column exprs on
    the corpus scan (zero shuffle, no UDF); the rollup is one bounded
    partial-agg exchange on the registrable-domain key (~10^7 at web
    scale) + a window over the dim-sized aggregate. Blocklist and
    suffix set are versioned config (``urlops.BLOCKLIST_VERSIONS``)."""
    from homelogging_spark.operators import urlops

    d = F.col("doc_id")
    host = (
        F.when(d % 8 == 0, "example.com")
        .when(d % 8 == 1, "News.Example.com")
        .when(d % 8 == 2, "shop.retail.co.uk")
        .when(d % 8 == 3, "spam-mill.com")
        .when(d % 8 == 4, "blog.sample.com.au")
        .when(d % 8 == 5, "ads.tracker-farm.net")
        .when(d % 8 == 6, "EXAMPLE.org")
        .otherwise("docs.sub.example.io")
    )
    url_raw = F.concat(
        F.when(d % 3 == 0, "HTTP://").when(d % 3 == 1, "https://").otherwise("http://"),
        host,
        F.when(d % 7 == 0, ":80").when(d % 7 == 1, ":443").when(d % 7 == 2, ":8080").otherwise(""),
        F.when(d % 4 == 0, F.lit("/")).otherwise(
            F.concat(F.lit("/Articles/item"), (d % 100).cast("string"))
        ),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("?utm_source=feed&id="),
                (d % 50).cast("string"),
                F.lit("&utm_medium=rss"),
            ),
        )
        .when(d % 5 == 1, F.lit("?gclid=zz123"))
        .when(
            d % 5 == 2,
            F.concat(F.lit("?id="), (d % 50).cast("string"), F.lit("&ref=sidebar")),
        )
        .otherwise(F.lit("")),
        F.when(d % 6 == 0, "#Section2").otherwise(""),
    )
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "n_chars", url_raw.alias("url_raw")
    )
    # staged form: the single-tree url_columns dict re-evaluates the
    # shared regex subtrees at every reference site (measured 5+ s at
    # sf0.1); with_url_columns stages them once per row (SCALE.md r16)
    base = urlops.with_url_columns(docs, "url_raw").select(
        "doc_id", "n_chars", "url_norm", "domain", "blocked"
    )
    doc_leg = base.select(
        F.lit("doc").alias("panel"),
        d.cast("string").alias("key"),
        "url_norm",
        "domain",
        "blocked",
        F.lit(None).cast("bigint").alias("n_docs"),
        F.lit(None).cast("bigint").alias("n_tokens"),
        F.lit(None).cast("double").alias("rate"),
    )
    # aggregate FIRST and filter the 8-row aggregate: a pre-agg
    # where(~blocked) is pushed below the staged projection and
    # re-inlines the whole URL tree into a per-row Filter (SCALE.md
    # r16, 3.2 s -> ms). blocked must ride as an AGGREGATE OUTPUT
    # (first(), constant per domain), not a group key — a predicate on
    # a group key pushes below the Aggregate all the same.
    per_domain = base.groupBy("domain").agg(
        F.first("blocked").alias("blocked"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("n_tokens"),
    )
    mix = sampling.mixture_weights_from_agg(
        per_domain.where(~F.col("blocked")).drop("blocked"),
        "domain",
        DOMAIN_MIX_SHARES,
    )
    dom_leg = mix.select(
        F.lit("domain").alias("panel"),
        F.col("domain").alias("key"),
        F.lit(None).cast("string").alias("url_norm"),
        "domain",
        F.lit(False).alias("blocked"),
        "n_docs",
        "n_tokens",
        quantize("rate").alias("rate"),
    )
    return doc_leg.unionByName(dom_leg)


# uniform mix target over the five unblocked registrable domains the
# synthesis produces (config, like MIX_SHARES)
DOMAIN_MIX_SHARES = {
    "example.com": 0.2,
    "example.io": 0.2,
    "example.org": 0.2,
    "retail.co.uk": 0.2,
    "sample.com.au": 0.2,
}


def _oracle_domain_curation() -> str:
    from homelogging_spark.operators import urlops

    synth = """
    ((CASE WHEN doc_id % 3 = 0 THEN 'HTTP://'
           WHEN doc_id % 3 = 1 THEN 'https://' ELSE 'http://' END)
     || (CASE WHEN doc_id % 8 = 0 THEN 'example.com'
              WHEN doc_id % 8 = 1 THEN 'News.Example.com'
              WHEN doc_id % 8 = 2 THEN 'shop.retail.co.uk'
              WHEN doc_id % 8 = 3 THEN 'spam-mill.com'
              WHEN doc_id % 8 = 4 THEN 'blog.sample.com.au'
              WHEN doc_id % 8 = 5 THEN 'ads.tracker-farm.net'
              WHEN doc_id % 8 = 6 THEN 'EXAMPLE.org'
              ELSE 'docs.sub.example.io' END)
     || (CASE WHEN doc_id % 7 = 0 THEN ':80'
              WHEN doc_id % 7 = 1 THEN ':443'
              WHEN doc_id % 7 = 2 THEN ':8080' ELSE '' END)
     || (CASE WHEN doc_id % 4 = 0 THEN '/'
              ELSE '/Articles/item' || CAST(doc_id % 100 AS VARCHAR) END)
     || (CASE WHEN doc_id % 5 = 0
              THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
                   || '&utm_medium=rss'
              WHEN doc_id % 5 = 1 THEN '?gclid=zz123'
              WHEN doc_id % 5 = 2
              THEN '?id=' || CAST(doc_id % 50 AS VARCHAR) || '&ref=sidebar'
              ELSE '' END)
     || (CASE WHEN doc_id % 6 = 0 THEN '#Section2' ELSE '' END))
    """
    mix_share = (
        "CASE "
        + " ".join(
            f"WHEN domain = '{s}' THEN {v}"
            for s, v in sorted(DOMAIN_MIX_SHARES.items())
        )
        + " ELSE 0.0 END"
    )
    return f"""
WITH n AS (
  SELECT doc_id, n_chars,
         {urlops.normalize_url_sql(synth)} AS url_norm
  FROM documents
), b AS (
  SELECT doc_id, n_chars, url_norm,
         {urlops.registrable_domain_sql(urlops.host_sql('url_norm'))} AS domain
  FROM n
), v AS (
  SELECT *, {urlops.blocked_sql('domain')} AS blocked FROM b
), agg AS (
  SELECT domain,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_tokens,
         {mix_share} AS target_share
  FROM v WHERE NOT blocked GROUP BY domain
), t AS (
  SELECT *, sum(n_tokens) OVER () AS total FROM agg
)
SELECT 'doc' AS panel, CAST(doc_id AS VARCHAR) AS key, url_norm, domain,
       blocked, CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_tokens,
       CAST(NULL AS DOUBLE) AS rate
FROM v
UNION ALL
SELECT 'domain', domain, CAST(NULL AS VARCHAR), domain, FALSE, n_docs, n_tokens,
       {quantize_sql('target_share * total / n_tokens')}
FROM t
"""


ORACLE_DOMAIN_CURATION = _oracle_domain_curation()


# --- real-BPE tokenization + packing -----------------------------------------

def q_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-EXACT packing (r13): per-doc token counts from the real
    BPE tokenizer (``operators/tokenize`` — frozen ``DEFAULT_MERGES``
    learned from this corpus, Sennrich 2016) fed through the same greedy
    first-fit fold as ``pack_docs``. One driver row certifies both the
    merge loop bit-for-bit (the oracle replays every merge as the
    identical wrapped-string ``replace`` chain) and the packing
    recurrence on those counts — "a training pipeline ships
    tokenizer-exact budgets", closing the gap where packing/budget/
    mixture ran only on the ``bpe_ish`` regex approximation.

    Scale: tokenization is a pure JVM scalar chain (zero Python, zero
    shuffle, whole-stage codegen); packing adds its one hash-shard
    exchange. For production merge lists beyond expression-chain size,
    ``tokenize.bpe_token_count_udf`` is the pinned-equal Arrow fold.

    r15: the merge list is the VERSIONED config dim
    ``tokenize.MERGE_VERSIONS`` (pinned here to
    ``CURRENT_VOCAB_VERSION``, bumped 1 → 2 this round — a 64-merge
    extension of the v1 prefix), so this driver row now re-certifies
    the tokenizer under the upgraded vocabulary; ``vocab_audit``
    supplies the manifest row recording which tokenizer counted."""
    from homelogging_spark.operators.tokenize import (
        CURRENT_VOCAB_VERSION,
        bpe_token_count,
        merges_for,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        bpe_token_count(
            F.col("text"), merges_for(CURRENT_VOCAB_VERSION)
        ).alias("n_tokens"),
    )
    return packing.pack_greedy(
        toks, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )


def _oracle_bpe_pack() -> str:
    from homelogging_spark.operators.tokenize import (
        CURRENT_VOCAB_VERSION,
        bpe_token_count_sql,
        merges_for,
    )

    return packing.pack_greedy_oracle_sql(
        "SELECT doc_id, "
        f"{bpe_token_count_sql('text', merges_for(CURRENT_VOCAB_VERSION))} "
        "AS n_tokens "
        "FROM documents",
        capacity=PACK_CAPACITY,
        n_shards=PACK_SHARDS,
    )


ORACLE_BPE_PACK = _oracle_bpe_pack()


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bpe_pack": q_bpe_pack,
    "pack_docs": q_pack_docs,
    "sampling_panel": q_sampling_panel,
    "mixture_weights": q_mixture_weights,
    "domain_curation": q_domain_curation,
}

PIPELINE_ORACLES: dict[str, str] = {
    "bpe_pack": ORACLE_BPE_PACK,
    "pack_docs": ORACLE_PACK_DOCS,
    "sampling_panel": ORACLE_SAMPLING_PANEL,
    "mixture_weights": ORACLE_MIXTURE_WEIGHTS,
    "domain_curation": ORACLE_DOMAIN_CURATION,
}
