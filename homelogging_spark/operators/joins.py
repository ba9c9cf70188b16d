"""Join operators (SURVEY.md §2.5).

The reference's flagship join is a *bucket-aligned equi join* (hourly series
dict-joined by truncated hour — ``RandomQueries/Program.cs:33-45``), NOT an
interpolating as-of join: missing right-hand buckets become 0.0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aligned_left_join(
    left: DataFrame,
    rights: Sequence[tuple[DataFrame, Sequence[str], float]],
    on: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Left-join one or more bucket-keyed series onto ``left`` with
    missing-as-default semantics (J1 + F6 — ``RandomQueries/Program.cs:38-45``
    dict ``TryGetValue`` → 0.0).

    ``rights``: (df, value_columns, default) triples. Each right side is a
    bucketed aggregate (hours/minutes), i.e. tiny relative to the fact scan,
    so we broadcast it — no shuffle of the big side. At 100 TB the left is
    the only large input and it streams through N broadcast hash joins in a
    single stage.
    """
    out = left
    for right, value_cols, default in rights:
        r = F.broadcast(right) if broadcast_right else right
        out = out.join(r, on=list(on), how="left")
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
) -> DataFrame:
    """Backward as-of join: each left row picks up the right side's
    values at the greatest ``right_ts <= left_ts`` for the same keys
    (NULL when no earlier right row exists).

    Scale design — the union+window formulation, NOT a range join: a
    naive ``ON r.ts <= l.ts`` inequality join is a per-key cross product
    (nested loop at 100 TB). Instead both sides are tagged and unioned
    (one shuffle on the keys), sorted by (ts, side) within each key, and
    the right values are carried forward with ``last(..., ignorenulls)``
    over an unbounded-preceding window. Cost: one shuffle + one sort of
    |L| + |R| — the same shape as any windowed aggregate, no pair
    blowup. Right rows at the identical timestamp win (<=, not <),
    matching DuckDB's ASOF JOIN ordering, which the oracle uses.

    Callers must ensure the right side is unique per (keys, right_ts) —
    pre-aggregate if not — or the picked row among equal timestamps is
    engine-dependent.
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    l_tagged = left.select(
        *keys,
        lt.alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (*keys, left_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *keys,
        rt.alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*keys, left_ts)],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged)
    for c in value_cols:
        merged = merged.withColumn(
            f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out = merged.where(F.col("__side") == 1).drop("__side")
    renames = {f"__r_{c}": f"right_{c}" for c in value_cols}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.withColumnRenamed("__ts", left_ts)


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    event_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval (range) join: event rows matched to every interval of the
    same keys with ``start <= ts < end``.

    Scale design: a raw ``BETWEEN`` join is a nested loop — quadratic
    per key. Instead both sides are mapped onto coarse time buckets: an
    event has exactly ONE bucket; an interval explodes into the buckets
    it covers (``sequence``). The join is then an EQUI join on (keys,
    bucket) — hash-partitioned, AQE-skew-splittable — and the exact
    predicate refines in-bucket. Each (event, interval) pair meets in at
    most one bucket (the event's), so no dedup pass is needed. Choose
    ``bucket_seconds`` near the median interval length: cost is
    O(|E| + |I| * avg_buckets_per_interval + matches).
    """
    # microsecond-exact bucketing: flooring to whole seconds first would
    # mis-bucket events inside an interval's last fractional second
    us = bucket_seconds * 1_000_000
    eb = F.floor(F.unix_micros(F.col(event_ts)) / us)
    ib_start = F.floor(F.unix_micros(F.col(start_col)) / us)
    # end is exclusive: the last covered bucket holds end - 1 microsecond
    ib_end = F.floor((F.unix_micros(F.col(end_col)) - 1) / us)
    e = events.withColumn("__bucket", eb)
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(ib_start, ib_end))
    )
    joined = e.join(i, [*keys, "__bucket"]).where(
        (F.col(event_ts) >= F.col(start_col)) & (F.col(event_ts) < F.col(end_col))
    )
    return joined.drop("__bucket")


def key_normalized_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Identity lookup with normalized keys (J3 — MAC matched
    case/separator-insensitively, ``Tapo/TapoLogger.cs:158-161``)."""

    def norm(c):
        return F.upper(F.translate(F.col(c), ":-.", ""))

    return left.join(right, norm(left_key) == norm(right_key), how)
