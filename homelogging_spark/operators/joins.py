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


def detect_hot_keys(
    fact: DataFrame,
    keys: Sequence[str],
    hot_threshold: int,
    max_hot: int = 64,
    sample_fraction: float | None = None,
) -> list[tuple]:
    """Find the fact-side join keys whose row counts exceed
    ``hot_threshold`` (at most ``max_hot`` of them, heaviest first).

    Scale design: the census is one ``groupBy(keys).count()`` — partial
    aggregation means the hot key contributes ONE row per map task, so
    the shuffle carries the distinct-key table, not the fact. When even
    that is too wide (billions of distinct keys at 100 TB), pass
    ``sample_fraction``: the census runs on a Bernoulli sample and the
    threshold is scaled by the same fraction — skew detection only
    needs the heavy head, which a sample preserves. The result is a
    bounded driver-side list (``max_hot`` rows), the one place a
    collect is correct by construction.
    """
    census = fact
    threshold = hot_threshold
    if sample_fraction is not None:
        census = census.sample(fraction=sample_fraction, seed=7)
        threshold = max(1, int(hot_threshold * sample_fraction))
    top = (
        census.groupBy(*keys)
        .count()
        .where(F.col("count") >= threshold)
        .orderBy(F.col("count").desc(), *keys)
        .limit(max_hot)
        .select(*keys)
        .collect()
    )
    return [tuple(r) for r in top]


def _hot_predicate(keys: Sequence[str], hot: Sequence[tuple]):
    """OR-of-conjunctions membership test for a bounded hot-key list —
    a plain JVM boolean expression (pushdown-eligible), exact for
    multi-column keys where string-concat tricks would risk separator
    collisions."""
    pred = F.lit(False)
    for tup in hot:
        term = F.lit(True)
        for k, v in zip(keys, tup):
            term = term & (F.col(k) == F.lit(v))
        pred = pred | term
    return pred


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    hot_keys: Sequence[tuple] | None = None,
    hot_threshold: int | None = None,
    max_hot: int = 64,
    sample_fraction: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-split equi join: row-identical to ``fact.join(dim, keys,
    how)`` but the hottest fact keys take a broadcast path while the
    long tail takes the ordinary shuffle join.

    The 100 TB problem this solves: the dim is too large to broadcast
    whole (so Spark picks a sort-merge/shuffle-hash join) and the fact
    key distribution is Zipf — a handful of keys own most rows. AQE's
    skew-join splits an oversized post-shuffle partition across tasks,
    which fixes task-level stragglers, but every fact row still pays
    the full shuffle write+read. Here the hot keys' fact rows never
    shuffle at all: the dim rows for those few keys (a slice bounded by
    ``max_hot`` keys, small even when the whole dim is not) broadcast
    to a map-side hash join, and only the tail shuffles — with the
    skew removed from its key distribution as a side effect.

    ``hot_keys``: caller-supplied key tuples, or None to detect via
    ``detect_hot_keys`` (requires ``hot_threshold``; see its docstring
    for the sampled form). ``how``: 'inner' or 'left' — for both, a
    fact row matches only dim rows of its own key, so partitioning the
    key space partitions the join exactly; 'right'/'outer' would need
    unmatched-dim reconciliation across the two branches and is
    refused rather than silently mis-joined.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join supports inner/left, got {how!r}")
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("pass hot_keys or hot_threshold")
        hot_keys = detect_hot_keys(
            fact, keys, hot_threshold, max_hot=max_hot,
            sample_fraction=sample_fraction,
        )
    if not hot_keys:
        return fact.join(dim, list(keys), how)
    is_hot = _hot_predicate(keys, hot_keys)
    hot_branch = fact.where(is_hot).join(
        F.broadcast(dim.where(is_hot)), list(keys), how
    )
    cold_branch = fact.where(~is_hot | is_hot.isNull()).join(
        dim.where(~is_hot | is_hot.isNull()), list(keys), how
    )
    return hot_branch.unionByName(cold_branch)


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
