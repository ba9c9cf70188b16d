"""Sequence packing: greedy first-fit of documents into fixed token
budgets — the standard pre-training batching step (pack short docs
together up to the context length so padding is not wasted).

The greedy fold ("stay in the current pack while it fits, else open a
new one") is a nonlinear recurrence over the running fill level, so —
like the battery simulation (``operators/battery.py``) — it cannot be a
window function. It runs as an ``applyInPandas`` fold *per shard*: docs
are hash-sharded up front, each shard packs independently in a
deterministic order, and shards parallelize across the cluster. That is
exactly how production packers scale: global greedy packing is a
sequential chain, per-shard packing is embarrassingly parallel and
loses nothing (a shard boundary costs at most one partially-filled pack
per shard).

A doc longer than the capacity gets a pack of its own (fill > capacity)
— callers truncate or split upstream; silently dropping them would bias
the corpus toward short documents.

The recurrence is integer-only (token counts), so the DuckDB oracle
replicates it exactly with a recursive CTE advancing all shards in
lockstep one row per iteration (same pattern as the battery oracle).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "shard bigint, doc_id bigint, n_tokens bigint, "
    "pack_id bigint, pack_pos bigint, pack_fill bigint"
)


def pack_greedy(
    docs: DataFrame,
    doc_id: str = "doc_id",
    n_tokens: str = "n_tokens",
    capacity: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign (pack_id, pack_pos, pack_fill) to every doc.

    ``pack_id`` is unique within a shard; ``(shard, pack_id)`` is the
    global pack key. Docs are packed in ``doc_id`` order within their
    shard so the assignment is a pure function of the input set.
    """
    sharded = docs.select(
        F.pmod(F.col(doc_id), F.lit(n_shards)).cast("bigint").alias("shard"),
        F.col(doc_id).cast("bigint").alias("doc_id"),
        F.col(n_tokens).cast("bigint").alias("n_tokens"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_id, pack_pos, fill = [], [], []
        cur, pos, cur_fill = 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if pos > 0 and cur_fill + n > capacity:
                cur, pos, cur_fill = cur + 1, 0, 0
            pos += 1
            cur_fill += n
            pack_id.append(cur)
            pack_pos.append(pos)
            fill.append(cur_fill)
        pdf["pack_id"] = pd.Series(pack_id, dtype="int64")
        pdf["pack_pos"] = pd.Series(pack_pos, dtype="int64")
        pdf["pack_fill"] = pd.Series(fill, dtype="int64")
        return pdf

    from homelogging_spark.functions.shuffleutil import fold_partitioned

    return fold_partitioned(sharded, ["shard"]).groupBy("shard").applyInPandas(
        fold, PACK_SCHEMA
    )


def pack_greedy_oracle_sql(
    source_cte: str,
    capacity: int = 512,
    n_shards: int = 8,
) -> str:
    """Recursive-CTE twin: ``source_cte`` must yield (doc_id, n_tokens).
    All shards advance in lockstep, one position per recursion step.
    The shard key mirrors Spark's ``pmod`` (always nonnegative), not
    DuckDB's sign-following ``%`` — they diverge for negative doc_ids."""
    shard = f"((doc_id % {n_shards}) + {n_shards}) % {n_shards}"
    return f"""
WITH RECURSIVE src AS ({source_cte}),
base AS (
    SELECT CAST({shard} AS BIGINT) AS shard,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           row_number() OVER (PARTITION BY {shard} ORDER BY doc_id) AS pos
    FROM src
),
rec AS (
    SELECT shard, doc_id, n_tokens, pos,
           CAST(0 AS BIGINT) AS pack_id,
           CAST(1 AS BIGINT) AS pack_pos,
           n_tokens AS pack_fill
    FROM base WHERE pos = 1
    UNION ALL
    SELECT b.shard, b.doc_id, b.n_tokens, b.pos,
           CASE WHEN r.pack_fill + b.n_tokens <= {capacity}
                THEN r.pack_id ELSE r.pack_id + 1 END,
           CASE WHEN r.pack_fill + b.n_tokens <= {capacity}
                THEN r.pack_pos + 1 ELSE CAST(1 AS BIGINT) END,
           CASE WHEN r.pack_fill + b.n_tokens <= {capacity}
                THEN r.pack_fill + b.n_tokens ELSE b.n_tokens END
    FROM rec r JOIN base b ON b.shard = r.shard AND b.pos = r.pos + 1
)
SELECT shard, doc_id, n_tokens, pack_id, pack_pos, pack_fill FROM rec
"""


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Roll packs up to utilization stats: docs per pack, fill level,
    waste fraction. One small shuffle on the (shard, pack_id) key."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("pack_fill").cast("bigint").alias("fill"),
    )
    return per_pack.select(
        "shard",
        "pack_id",
        "n_docs",
        "fill",
        (F.lit(1.0) - F.least(F.col("fill"), F.lit(capacity)) / F.lit(float(capacity))).alias(
            "waste_frac"
        ),
    )


__all__: Iterable[str] = (
    "PACK_SCHEMA",
    "pack_greedy",
    "pack_greedy_oracle_sql",
    "pack_stats",
)
