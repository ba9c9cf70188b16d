"""Document chunking and exact duplicated-passage analysis.

Two training-data-pipeline operators downstream of cleaning/dedup:

- ``chunk_documents``: split every document into fixed-size token
  windows with a stride (overlap = chunk - stride) — the step that turns
  a cleaned corpus into training examples. Pure column expressions
  (``sequence`` → ``transform`` → ``posexplode`` → ``slice``): map-side
  only, zero shuffles, so at 100 TB the cost is the scan plus the output
  write. Every token is covered: the start grid is ``1 + i·stride`` for
  ``i in [0, ceil(max(0, n-chunk)/stride)]``, and the final window is
  allowed to run past the end (``slice`` clamps), mirroring how GPT-style
  pipelines chunk with a context-length window and fixed stride.

- ``duplicated_passages``: exact duplicated-span statistics in the
  spirit of suffix-array substring dedup (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better") — every
  positional k-token shingle is hashed, a shingle that occurs in ≥2
  distinct documents marks its span duplicated, and each document
  reports how much of it is covered by cross-document duplicated spans.
  This is the *exact-substring* complement to the MinHash/SimHash
  near-dup tier (``operators/dedup.py``): MinHash finds whole-document
  near-duplicates; this finds verbatim passages (boilerplate, licenses,
  quotations) embedded inside otherwise-distinct documents.

Scale: the shingle frame is ``tokens × 1`` rows per stride-1 position —
~k× the corpus token count in *rows* but each row is only
``(doc_id, md5)`` (the shingle text never survives past the hash).
One shuffle on the shingle hash with partial aggregation; the join back
to positions is a shuffle join on the same key (co-partitioned, AQE
handles the skew of mega-frequent boilerplate grams). Production dials
the position stride up (every 4th token) to cut volume 4× —
``duplicated_passages(pos_stride=...)``; the oracle pins it to 1 so the
check is exhaustive.

MD5 is used for the gram hash because Spark and DuckDB compute it
identically (see ``functions/texthash.py``), which is what makes the
whole operator hash-checkable by the driver's oracle.

Reference scope note: the reference (HomeLogging, C#) has no text tier;
these extend the engine for LLM-corpus work per the build mandate, built
on the same tokenizer as ``operators/textops.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from homelogging_spark.functions.texthash import tokens, tokens_sql

CHUNK_SIZE = 32
CHUNK_STRIDE = 24
PASSAGE_K = 8


def _chunk_starts(n: Column, chunk: int, stride: int) -> Column:
    """1-based start positions ``1 + i*stride`` covering all ``n`` tokens."""
    n_starts = F.floor((F.greatest(F.lit(0), n - chunk) + (stride - 1)) / stride) + 1
    return F.transform(
        F.sequence(F.lit(0), (n_starts - 1).cast("int")),
        lambda i: (F.lit(1) + i * stride).cast("int"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token-window chunks with overlap ``chunk - stride``.

    Output: one row per (doc, window) with the window's 0-based index,
    1-based token start, token count (tail windows are short), and the
    md5 of the re-joined window text — the id a downstream exact-dedup
    of *chunks* would key on. Map-side only."""
    toks = tokens(F.col(text_col))
    d = docs.select(
        id_col, toks.alias("_toks"), F.size(toks).alias("_n")
    ).select(
        id_col,
        "_toks",
        F.posexplode(_chunk_starts(F.col("_n"), chunk, stride)).alias(
            "chunk_idx", "start"
        ),
    )
    piece = F.slice(F.col("_toks"), F.col("start"), chunk)
    return d.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start").cast("bigint").alias("start"),
        F.size(piece).cast("bigint").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_md5"),
    )


def chunk_documents_sql(
    chunk: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same grid, same md5)."""
    return f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}
), s AS (
  SELECT doc_id, toks,
         (greatest(0, len(toks) - {chunk}) + {stride - 1}) // {stride} + 1 AS n_starts
  FROM t
), e AS (
  SELECT doc_id, toks, unnest(generate_series(0, n_starts - 1)) AS i FROM s
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(1 + i * {stride} AS BIGINT) AS start,
       CAST(len(list_slice(toks, 1 + i * {stride}, i * {stride} + {chunk})) AS BIGINT)
         AS chunk_tokens,
       md5(array_to_string(list_slice(toks, 1 + i * {stride}, i * {stride} + {chunk}), ' '))
         AS chunk_md5
FROM e
"""


def _span_grams(
    docs: DataFrame, k: int, text_col: str, id_col: str, pos_stride: int = 1
) -> DataFrame:
    """(doc_id, pos, gram_md5) for every ``pos_stride``-spaced k-token
    span (stride 1 = exhaustive).

    Documents shorter than ``k`` tokens emit no spans (they are whole-doc
    dedup territory, handled by ``exact_dedup``)."""
    toks = tokens(F.col(text_col))
    d = docs.select(id_col, toks.alias("_toks"), F.size(toks).alias("_n")).where(
        F.col("_n") >= k
    )
    starts = F.sequence(
        F.lit(1), (F.col("_n") - (k - 1)).cast("int"), F.lit(int(pos_stride))
    )
    return d.select(
        id_col, F.explode(starts).alias("pos"), "_toks"
    ).select(
        id_col,
        F.col("pos").cast("bigint").alias("pos"),
        F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), F.col("pos"), k))).alias(
            "gram_md5"
        ),
    )


def duplicated_passages(
    docs: DataFrame,
    k: int = PASSAGE_K,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_stride: int = 1,
) -> DataFrame:
    """Per-document exact duplicated-span statistics.

    ``pos_stride`` is the production volume dial the module docstring
    promises: sample every s-th start position, cutting the shingle
    frame s× (the oracle-pinned registered query keeps stride 1 so the
    check stays exhaustive). The trade at s > 1: two docs sharing a
    passage are only flagged when both sample a start inside it at the
    SAME token offset from the passage start modulo alignment — shared
    regions shorter than ~k + s - 1 tokens can escape, and per-doc span
    counts/fractions are over the sampled grid, not all positions.

    A span (positional k-token shingle) is *duplicated* when its hash
    occurs in ≥2 distinct documents. Output per document: total spans,
    duplicated spans, the fraction of spans duplicated, and the count of
    tokens covered by ≥1 duplicated span (union of [pos, pos+k) over
    duplicated positions, computed exactly via the classic
    sorted-interval sweep expressed as a window max — no UDF).

    Every doc in ``docs`` gets a row (docs with < k tokens report 0
    spans). One shuffle on ``gram_md5`` for the corpus-wide occurrence
    count, one co-keyed join back, one shuffle on doc_id for the final
    rollup."""
    from pyspark.sql.window import Window

    from homelogging_spark.functions.cachelife import tracked_persist

    # The gram frame feeds three consumers (corpus-wide dup counts, the
    # position semi-join, per-doc totals); without a persist Catalyst
    # re-runs the scan + explode for each (4 scans observed). Tracked
    # persist: one scan + explode, released by the caller's
    # release_caches() after the action.
    g = tracked_persist(_span_grams(docs, k, text_col, id_col, pos_stride))
    dup = (
        g.groupBy("gram_md5")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= 2)
        .select("gram_md5")
    )
    marked = g.join(dup, "gram_md5", "left_semi")
    # exact covered-token count: spans sorted by pos; a span adds
    # max(0, (pos+k) - max(prev_end, pos)) new tokens, where prev_end is
    # the running max of (pos+k) over preceding duplicated spans.
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = marked.withColumn(
        "_prev_end", F.coalesce(F.max(F.col("pos") + k).over(w), F.lit(0))
    ).withColumn(
        "_new",
        F.greatest(
            F.lit(0),
            (F.col("pos") + k) - F.greatest(F.col("_prev_end"), F.col("pos")),
        ),
    )
    per_doc_dup = covered.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum("_new").cast("bigint").alias("dup_tokens"),
    )
    totals = g.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"))
    from homelogging_spark.functions.numeric import quantize

    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(per_doc_dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            quantize(
                F.when(
                    F.coalesce(F.col("n_spans"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_dup_spans"), F.lit(0))
                    / F.col("n_spans").cast("double"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_frac"),
        )
    )


def duplicated_passages_sql(k: int = PASSAGE_K, table: str = "documents") -> str:
    """DuckDB twin of :func:`duplicated_passages`."""
    from homelogging_spark.functions.numeric import quantize_sql

    return f"""
WITH t AS (
  SELECT doc_id, {tokens_sql('text')} AS toks FROM {table}
), g AS (
  SELECT doc_id, CAST(p AS BIGINT) AS pos,
         md5(array_to_string(list_slice(toks, p, p + {k - 1}), ' ')) AS gram_md5
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {k - 1})) AS p
        FROM t WHERE len(toks) >= {k})
), dup AS (
  SELECT gram_md5 FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
), marked AS (
  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram_md5)
), covered AS (
  SELECT doc_id, pos,
         coalesce(max(pos + {k}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_end
  FROM marked
), per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans,
         sum(greatest(0, (pos + {k}) - greatest(prev_end, pos))) AS dup_tokens
  FROM covered GROUP BY 1
), totals AS (
  SELECT doc_id, count(*) AS n_spans FROM g GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(t.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       {quantize_sql(
           "CASE WHEN coalesce(t.n_spans, 0) > 0 "
           "THEN coalesce(p.n_dup_spans, 0) / CAST(t.n_spans AS DOUBLE) "
           "ELSE 0.0 END"
       )} AS dup_frac
FROM {table} d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
"""
