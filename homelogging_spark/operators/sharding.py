"""Training-shard assignment + manifest — the pipeline-final step.

After hygiene → dedup → budget select → curriculum, a corpus ships as
N shards a training job streams independently. Two requirements drive
the design:

- **Determinism**: re-running the pipeline must reproduce the exact
  shard membership (resumable publishing, diffable manifests). The
  assignment is a pure function of (size, id) — no RNG, no
  partition-id dependence.
- **Balance**: shards should carry ~equal token counts so data-parallel
  consumers finish together. Round-robin over the size-descending
  order gives a PROVABLE bound: sorting items a₁ ≥ a₂ ≥ … and dealing
  them cyclically, shard sums telescope so that
  ``max(shard_sum) − min(shard_sum) ≤ max(item_size)`` for every
  input (property-pinned in tests) — within one document of perfect,
  with no sequential bin-packing pass.

Scale shape: the only global structure is the size-descending rank,
computed with :func:`sampling.distributed_row_number` (range-repartition
+ per-partition offsets; the single-task step touches one row per
partition) — the same two-pass shape ``curriculum_order`` uses instead
of a global window. Assignment is then a map-side ``(rank-1) % n``;
the manifest is one bounded groupBy on the shard id. An SQL oracle
replicates everything (``row_number() OVER (ORDER BY …) % n``), so the
operator is driver-certifiable; the rank equivalence of the
distributed form is already plan-gated via curriculum_order.

Reference scope note: the reference system ships no corpus artifacts
(C# telemetry loggers); this is part of the LLM-training-data tier
(SURVEY.md "beyond the reference" extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from homelogging_spark.operators.sampling import distributed_row_number


def shard_assign(
    df: DataFrame,
    n_shards: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row a ``shard`` in [0, n_shards): round-robin over
    the (size desc, id) total order. Adds ``size_rank`` (the global
    1-based position in that order) alongside ``shard`` so consumers
    can reconstruct the deal order."""
    ranked = distributed_row_number(
        df,
        [F.col(size_col).desc(), F.col(id_col)],
        alias="size_rank",
    )
    return ranked.withColumn(
        "shard", ((F.col("size_rank") - 1) % n_shards).cast("int")
    )


def shard_manifest(
    assigned: DataFrame,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard publishing manifest: row count, token sum, min/max
    size, and an order-insensitive content fingerprint (bit-XOR of the
    member ids' 52-bit md5 hashes — mergeable and deterministic, so two
    manifests diff shard-by-shard without reading data files).

    One bounded groupBy (≤ n_shards groups) with map-side partials."""
    member_hash = F.conv(
        F.substring(F.md5(F.concat(F.lit("shard|"), F.col(id_col).cast("string"))), 1, 13),
        16,
        10,
    ).cast("bigint")
    return (
        assigned.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("total_tokens"),
            F.min(size_col).cast("bigint").alias("min_tokens"),
            F.max(size_col).cast("bigint").alias("max_tokens"),
            F.bit_xor(member_hash).alias("content_fingerprint"),
        )
        .orderBy("shard")
    )


def shard_manifest_sql(
    table: str,
    n_shards: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of assign+manifest over ``table`` — the oracle for a
    driver registration (same rank order, same modulo, same md5
    fingerprint arithmetic)."""
    return f"""
WITH ranked AS (
  SELECT {id_col}, {size_col},
         row_number() OVER (ORDER BY {size_col} DESC, {id_col}) AS size_rank
  FROM {table}),
assigned AS (
  SELECT *, CAST((size_rank - 1) % {n_shards} AS INT) AS shard FROM ranked)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({size_col}) AS BIGINT) AS total_tokens,
       CAST(min({size_col}) AS BIGINT) AS min_tokens,
       CAST(max({size_col}) AS BIGINT) AS max_tokens,
       bit_xor(CAST('0x' || substr(md5('shard|' || CAST({id_col} AS VARCHAR)), 1, 13) AS BIGINT)) AS content_fingerprint
FROM assigned GROUP BY shard ORDER BY shard
"""
