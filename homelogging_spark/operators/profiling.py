"""Data-quality profiling operators.

Extracted from the registry's inline `q_table_profile` so the 100 TB
dial is a real parameter instead of a docstring suggestion: the audit
every ingest pipeline runs before trusting a new drop, per column the
row count, null count, distinct count, and numeric min/max — one scan,
one `agg`, one metadata-sized output row per column (unpivoted via
`inline`, never through the driver).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from homelogging_spark.functions.numeric import quantize


def table_profile(
    df: DataFrame,
    cols: Sequence[str],
    numeric_cols: Sequence[str] = (),
    ts_cols: Sequence[str] = (),
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Single-scan per-column table profile. Exact mode plans the
    multi-column distincts as ONE Expand — a deliberate exact-mode cost
    that multiplies the scanned rows by ``len(cols)`` before the
    aggregate. ``approx=True`` is the 100 TB dial: Spark's
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``)
    folds every column's distinct into the same single pass with
    constant-size sketch state and NO Expand — the plan shape a
    petabyte audit needs. The approx form is NOT cross-engine
    replicable (HLL++ hashing is engine-internal), so the registered
    driver query pins the exact form and the approx form is pinned by
    unit tolerance tests instead (`TestTableProfileOperator`).

    ``ts_cols`` report min/max as epoch seconds; other non-numeric
    columns report NULL bounds. Output: one row per profiled column —
    metadata-sized regardless of input scale."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        num = (
            F.col(c).cast("double")
            if (c in numeric_cols or c in ts_cols)
            else F.lit(None).cast("double")
        )
        distinct = (
            F.approx_count_distinct(F.col(c), rsd)
            if approx
            else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(c).cast("bigint").alias(f"_c_{c}"),
            distinct.cast("bigint").alias(f"_d_{c}"),
            quantize(F.min(num)).alias(f"_min_{c}"),
            quantize(F.max(num)).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"_c_{c}")).cast("bigint").alias("n_null"),
            F.col(f"_d_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_num"),
            F.col(f"_max_{c}").alias("max_num"),
        )
        for c in cols
    ]
    return row.select(F.inline(F.array(*structs)))
