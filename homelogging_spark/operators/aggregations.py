"""Aggregation operators (SURVEY.md §2.4).

Every operator here is a pure DataFrame transformation built from JVM-side
built-ins: Catalyst plans them as partial + final hash aggregates (map-side
combine), so at 100 TB each group-by shuffles only the per-partition partial
state, not raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from homelogging_spark.functions.timeutils import time_bucket


def time_bucket_agg(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    bucket_alias: str = "bucket",
) -> DataFrame:
    """Tumbling-window aggregation (A1/A2: server-side ``GroupBy(Hours(1))
    .Select(Average())`` parity — ``RandomQueries/Program.cs:73-75``).

    ``bucket`` is a calendar unit ('hour', 'minute', 'day'). One shuffle on
    (bucket, *keys); partial aggregation happens map-side.
    """
    bucket_col = time_bucket(F.col(ts_col), bucket).alias(bucket_alias)
    return df.groupBy(bucket_col, *[F.col(k) for k in keys]).agg(*aggs)


def latest_per_key(df: DataFrame, keys: Sequence[str], ts_col: str = "ts") -> DataFrame:
    """Latest row per key (A3 ``Last()`` / W2 ``entries.Last()`` —
    ``Kasa/KasaLogger.cs:59-62``).

    max_by-style via row_number over a descending window: a single shuffle
    on the keys; AQE handles skewed keys. Ties on ts are broken by the
    remaining columns in NAME-sorted order (not df.columns order), so the
    choice is deterministic and independent of projection order — oracles
    must use the same ORDER BY ts DESC, <non-key cols sorted by name> DESC.
    """
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in sorted(df.columns) if c not in keys and c != ts_col
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def trailing_percentile(
    df: DataFrame,
    value: Column,
    pct: float,
    cutoff: Column,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    alias: str = "pct",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact percentile over a trailing window anchored at a cutoff
    (A5: RQL ``last 5 minutes select percentile(50)`` —
    ``Deploy/switchboiler.sh:5``).

    ``approx=True`` switches to ``percentile_approx`` (GK sketch,
    mergeable map-side — no per-group full sort/materialization), the
    default to reach for above ~1e6 rows per group. Exact ``percentile``
    matches ANSI percentile_cont interpolation and stays the oracle-
    parity form; the reference's own use is a 5-minute window (~300
    points) where exact is free.
    """
    filtered = df.where(F.col(ts_col) >= cutoff)
    agg = (
        F.percentile_approx(value, F.lit(pct), F.lit(accuracy))
        if approx
        else F.percentile(value, F.lit(pct))
    )
    return filtered.groupBy(*[F.col(k) for k in keys]).agg(agg.alias(alias))


def all_gate(
    df: DataFrame,
    keys: Sequence[str],
    cond: Column,
    min_count: int = 0,
) -> DataFrame:
    """Universal/existential gates over a window of entries (A7 —
    ``Ebus/EbusThermostatSwitcher.cs:64-76``): per key, whether *all*
    entries satisfy ``cond``, whether none do, and how many do; guarded by
    a minimum sample count (the reference requires >= 10 points).
    """
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.when(cond, 1).otherwise(0)).alias("__all"),
        F.max(F.when(cond, 1).otherwise(0)).alias("__any"),
        F.sum(F.when(cond, 1).otherwise(0)).alias("n_true"),
    )
    return agg.select(
        *keys,
        "n",
        "n_true",
        ((F.col("n") >= min_count) & (F.col("__all") == 1)).alias("all_true"),
        ((F.col("n") >= min_count) & (F.col("__any") == 0)).alias("none_true"),
    )


def weighted_totals(
    df: DataFrame,
    keys: Sequence[str],
    usage: Column,
    weight: Column | None = None,
    usage_alias: str = "total_usage",
    weighted_alias: str = "total_cost",
    ratio_alias: str = "avg_rate",
    weighted: Column | None = None,
) -> DataFrame:
    """Client-side totals (A6 — ``RandomQueries/Program.cs:48-58``):
    sum(usage), weighted sum, and their ratio.

    Pass either ``weight`` (summed as usage*weight) or ``weighted`` (the
    already-multiplied term, summed directly). Prefer ``weighted`` when the
    caller has the product available: ``sum(q * (p/q))`` is not bit-identical
    to ``sum(p)`` under IEEE-754, which makes hash-exact oracle comparison
    fragile.
    """
    if (weight is None) == (weighted is None):
        raise ValueError("pass exactly one of weight= or weighted=")
    weighted_term = usage * weight if weighted is None else weighted
    out = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum(usage).alias(usage_alias),
        F.sum(weighted_term).alias(weighted_alias),
    )
    return out.withColumn(ratio_alias, F.col(weighted_alias) / F.col(usage_alias))


def running_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    ts_col: str = "ts",
    alias: str = "running_total",
) -> DataFrame:
    """Cumulative accumulation per key in time order (A8 pulse counting —
    ``Gpio/GpioLogger.cs:88-97``). One shuffle + in-partition sort."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: rows of a key belong to one session
    until a silence longer than ``gap_seconds`` starts the next —
    ``session_idx`` is the running count of gap-exceeding boundaries
    (the standard lag + conditional cumsum; one shuffle + one sort per
    key, no state beyond the window). Pass ``order_tiebreak`` columns to
    make ordering deterministic when timestamps can tie."""
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - prev_us
    is_new = F.when(
        prev_us.isNull() | (gap_us > F.lit(int(gap_seconds * 1_000_000))), 1
    ).otherwise(0)
    running = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "session_idx", F.sum(is_new).over(running).cast("bigint")
    )


def trailing_time_window_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    ts_col: str = "ts",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-row trailing time-RANGE aggregate: mean and count of ``value``
    over ``[ts - window, ts]`` within the key. ``rangeBetween`` over
    ``unix_micros`` — a true time-range frame (not N-rows), identical
    semantics to ANSI ``RANGE BETWEEN x PRECEDING AND CURRENT ROW``; one
    shuffle + sort per key, frame scan bounded by the window."""
    v = F.col(value) if isinstance(value, str) else value
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.withColumn("trailing_avg", F.avg(v).over(w)).withColumn(
        "n_in_window", F.count(v).over(w).cast("bigint")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant sum/count/avg: aggregate in TWO phases with an
    explicit salt so a handful of hot keys cannot serialize onto a
    handful of reducers.

    Phase 1 groups by (keys, salt) — ``n_salts`` partial rows per hot
    key, spread across the cluster; phase 2 combines the partials by the
    real keys (tiny input: |keys| * n_salts rows). The salt is a
    per-row uniform bucket — any distribution works because sum/count
    are associative; avg is derived from the combined partials, never
    averaged across partials. AQE's skew-join handles skewed JOINS
    automatically; skewed AGGREGATES over low-cardinality keys are the
    case that still needs this explicit shape when the map-side partial
    aggregation alone can't keep up (e.g. high-cardinality distincts
    layered on top).
    """
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.monotonically_increasing_id() % n_salts).alias("__salt")
    partial = (
        df.select(*keys, v.alias("__v"), salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum("__v").alias("__sum"), F.count("__v").alias("__n"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__sum").alias("sum_value"),
        F.sum("__n").cast("bigint").alias("n"),
        (F.sum("__sum") / F.sum("__n")).alias("avg_value"),
    )


def ewma_smooth(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.25,
) -> DataFrame:
    """Exponentially-weighted moving average per key:

        s_1 = x_1;   s_t = alpha * x_t + (1 - alpha) * s_{t-1}

    plus the residual ``x_t - s_{t-1}`` (deviation from the forecast) —
    the classic smoothing/denoising pass the reference's dashboards
    apply client-side and the band controllers (ST6/ST7) would consume
    server-side at scale.

    The recurrence is linear, but expressing it with window sums needs
    ``(1-alpha)^(t-i)`` factors whose closed form overflows/underflows
    for long series, so like ST2/ST4 it runs as a per-key
    ``applyInPandas`` fold on an explicit ``fold_partitioned`` exchange.
    State is one double per key — the streaming form is
    ``applyInPandasWithState`` exactly like the stateful rollover.
    ``alpha`` defaults to a dyadic fraction (0.25) so ``alpha`` and
    ``1 - alpha`` are exact binary values; the fold evaluates
    ``alpha*x + (1-alpha)*s`` with the same two multiplies and one add
    as the recursive-CTE oracle, keeping the doubles bit-identical.

    Scale: one shuffle on the keys; the fold is O(rows-per-key) with
    constant memory; skewed meters are bounded by per-meter row counts
    (time-partitioned upstream at 100 TB)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from homelogging_spark.functions.shuffleutil import fold_partitioned

    beta = 1.0 - alpha
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("ewma", DoubleType(), True),
            StructField("resid", DoubleType(), True),
        ]
    )

    def fold(pdf):
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        s = None
        smoothed, resids = [], []
        for x in pdf[value_col]:
            if s is None:
                s, r = x, 0.0
            else:
                r = x - s
                s = alpha * x + beta * s
            smoothed.append(s)
            resids.append(r)
        return pdf.assign(ewma=smoothed, resid=resids)

    return fold_partitioned(df, keys).groupBy(*keys).applyInPandas(fold, out_schema)


def robust_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    k: float = 3.5,
    approx: bool = False,
) -> DataFrame:
    """Per-key robust outlier detection via median/MAD — the
    heavy-tail-safe complement to the mean/std z-score path
    (``seasonal_residuals``): a handful of extreme readings inflate the
    std enough to mask themselves, while the median and the median
    absolute deviation are 50%-breakdown estimators (Iglewicz & Hoaglin
    1993: modified z = 0.6745 (x − med) / MAD, flag |z| > 3.5).

    r21 shape (guide §2.4): the median and the MAD are per-key window
    aggregates over ONE exchange on the keys — the former groupBy +
    join-back pair embedded the deviation subtree twice (its scan and
    the median aggregation re-ran inside the MAD branch), costing four
    scans and four exchanges for the same rows. Both windows share the
    key partitioning, so the sequential dependency (MAD needs the
    median's deviations) adds a second Window pass, never a second
    shuffle. ``approx=True`` is the 100 TB dial — both percentile
    passes switch to Spark's mergeable Greenwald-Khanna sketch
    (``percentile_approx``, no full-sort state; engine-internal, so the
    registered query pins the exact form and the approx form is
    unit-pinned for tolerance).

    A key whose MAD is 0 (at least half its values identical) emits
    NULL ``robust_z`` and ``is_outlier`` = (deviation > 0): the
    standard degenerate-scale fallback — any departure from a
    majority-constant signal is anomalous, but its magnitude is
    unquantifiable."""
    v = F.col(value_col).cast("double")

    w_key = Window.partitionBy(*keys)

    def med_expr(col: str):
        # the cast must wrap the WINDOWED column, not the bare aggregate
        # (over() applies to the aggregate expression itself)
        if approx:
            return (
                F.percentile_approx(col, F.lit(0.5), F.lit(10000))
                .over(w_key)
                .cast("double")
            )
        return F.percentile(col, F.lit(0.5)).over(w_key)

    dev = df.withColumn("_med", med_expr(value_col)).withColumn(
        "_dev", F.abs(v - F.col("_med"))
    )
    scored = dev.withColumn("_mad", med_expr("_dev"))
    z = F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad")
    return scored.select(
        *keys,
        *[c for c in df.columns if c not in keys],
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        F.when(F.col("_mad") > 0, z).alias("robust_z"),
        F.when(F.col("_mad") > 0, F.abs(z) > F.lit(k))
        .otherwise(F.col("_dev") > 0)
        .alias("is_outlier"),
    )
