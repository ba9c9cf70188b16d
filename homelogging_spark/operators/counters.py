"""Stateful counter-correction operators (SURVEY.md §2.7 ST1-ST3, A8).

These are the reference's order-dependent computations, re-expressed as
window functions wherever the recurrence is linear (cumulative sums with
conditional resets), and as ``applyInPandas`` only where it is not.

Window-function form matters at scale: a per-key ordered window is one
shuffle + sort, fully distributed across keys; an applyInPandas fold
materializes each group in Python. Every operator here partitions by the
meter key, so 1000 executors process 1000s of meters concurrently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def _ordered_window(keys: Sequence[str], ts_col: str) -> Window:
    return Window.partitionBy(*keys).orderBy(F.col(ts_col))


def counter_rollover_correct(
    df: DataFrame,
    keys: Sequence[str],
    raw_col: str,
    ts_col: str = "ts",
    epsilon: float = 0.0,
    corrected_alias: str = "corrected",
    offset_alias: str = "offset",
    rounded_compare: bool = False,
    compare_digits: int = 1,
    stored_digits: int = 3,
) -> DataFrame:
    """Monotonic-counter rollover correction (ST2/ST3 —
    ``Kasa/KasaLogger.cs:55-75``, ``Tapo/TapoLogger.cs:87-107``).

    A reset is detected when the raw counter drops below its previous value
    by more than ``epsilon``; the pre-reset raw value is added to a running
    offset, and ``corrected = raw + offset``. Both the Kasa form (offset :=
    last emitted total, which telescopes to the same accumulation) and the
    Tapo form (offset += last raw) are this cumulative sum — pure window
    functions, no UDF:

        reset_i   = raw_i < raw_{i-1} - eps
        offset_i  = sum_{j<=i, reset_j} raw_{j-1}
        corrected = raw_i + offset_i

    ``rounded_compare=True`` is the EXACT Tapo detection form
    (``TapoLogger.cs:100-107``): the stored last reading is
    ``round(prev, stored_digits)`` (the reference stores series values
    rounded to 3 decimals, ``:100``) and a reset fires iff
    ``round(cur, compare_digits) < round(last, compare_digits)`` —
    near-boundary monthly resets (e.g. 99.96 → 99.94, both rounding to
    different tenths) classify per the reference where the epsilon band
    would differ, and the offset accumulates the ROUNDED last reading.
    Caveat: C# ``Math.Round`` is banker's (half-to-even) while Spark
    ``F.round`` is HALF_UP; they differ only on exact binary midpoints
    (``*.25`` at 1 digit), which real kWh readings don't hit.
    """
    w = _ordered_window(keys, ts_col)
    cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag(F.col(raw_col)).over(w)
    if rounded_compare:
        last_stored = F.round(prev, stored_digits)
        reset = prev.isNotNull() & (
            F.round(F.col(raw_col), compare_digits)
            < F.round(last_stored, compare_digits)
        )
        carried = last_stored
    else:
        reset = (prev.isNotNull()) & (F.col(raw_col) < prev - F.lit(epsilon))
        carried = prev
    offset = F.coalesce(
        F.sum(F.when(reset, carried).otherwise(F.lit(0.0))).over(cum), F.lit(0.0)
    )
    return df.withColumn(offset_alias, offset).withColumn(
        corrected_alias, F.col(raw_col) + F.col(offset_alias)
    )


def kasa_offset_replace(
    df: DataFrame,
    keys: Sequence[str],
    raw_col: str = "raw",
    ts_col: str = "ts",
    epsilon: float = 0.01,
    round_digits: int = 4,
    round_mode: str = "decimal",
) -> DataFrame:
    """ST2 *exact* Kasa semantics (``Kasa/KasaLogger.cs:55-75``): on a
    reset (raw drops below previous raw by > epsilon) the offset is
    REPLACED with ``round(last emitted total, round_digits)`` — not
    accumulated. Because each total already contains the prior offset,
    this telescopes to the ST3 accumulation *except* for the per-reset
    round(., 4), which makes the recurrence nonlinear — hence the one
    ``applyInPandas`` fold in the counter family (the reference stores
    the rounded offset in the meter document between polls).

    ``round_mode`` picks the per-reset rounding implementation:

    - ``"decimal"`` (default): Python ``round`` — correctly-rounded
      decimal rounding, the closest match to the reference's
      ``Math.Round(x, 4)``.
    - ``"scaled"``: ``floor(x*10^d + 0.5) / 10^d`` — the explicit IEEE
      op sequence a SQL oracle can replicate bit-for-bit (the two modes
      differ only when the scaled multiply lands within 1 ulp of a
      decimal .5 boundary, e.g. round(12.00015, 4)).

    ``counter_rollover_correct`` is the window-function form to prefer
    when sub-1e-4 drift per reset is acceptable (see its epsilon test).
    """
    import math

    import pandas as pd

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("offset", DoubleType(), True),
            StructField("corrected", DoubleType(), True),
        ]
    )
    if round_mode == "decimal":
        def _round(x: float) -> float:
            return round(x, round_digits)
    elif round_mode == "scaled":
        scale = 10.0 ** round_digits

        def _round(x: float) -> float:
            return math.floor(x * scale + 0.5) / scale
    else:
        raise ValueError(f"round_mode must be 'decimal' or 'scaled': {round_mode!r}")

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        offset, last_raw, last_total = 0.0, None, None
        offsets, totals = [], []
        for raw in pdf[raw_col]:
            if last_raw is not None and raw < last_raw - epsilon:
                offset = _round(last_total)
            total = raw + offset
            offsets.append(offset)
            totals.append(total)
            last_raw, last_total = raw, total
        return pdf.assign(offset=offsets, corrected=totals)

    from homelogging_spark.functions.shuffleutil import fold_partitioned

    return fold_partitioned(df, keys).groupBy(*keys).applyInPandas(fold, out_schema)


def segmented_running_sum(
    df: DataFrame,
    keys: Sequence[str],
    delta: Column,
    reset: Column,
    ts_col: str = "ts",
    alias: str = "seg_sum",
) -> DataFrame:
    """Conditional-reset running sum: the segment-id trick behind ST1
    (energy-counter fraction interpolation, ``Mbus/MbusLogger.cs:116-149``).

    ``delta`` accumulates in time order per key; whenever ``reset`` is true
    the accumulator restarts from that row. Implemented as a cumulative sum
    of reset flags (segment id) + a cumulative sum partitioned by segment —
    two window passes over ONE shuffle/sort (same partitioning + ordering,
    Spark reuses the sort).
    """
    cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = F.sum(F.when(reset, 1).otherwise(0)).over(cum)
    out = df.withColumn("__seg", seg)
    cum_seg = (
        Window.partitionBy(*list(keys), "__seg")
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn(alias, F.sum(delta).over(cum_seg)).drop("__seg")


def energy_fraction_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    energy_col: str,
    power_col: str,
    ts_col: str = "ts",
    alias: str = "interpolated_energy",
    round_digits: int | None = 3,
) -> DataFrame:
    """ST1: whole-unit energy counter + instantaneous power → interpolated
    counter with a trapezoid-integrated fractional part
    (``Mbus/MbusLogger.cs:116-149`` semantics).

    Per key in time order:
      frac += (P_prev + P_now)/2 * dt_hours / 1000   (kW·h from W)
      skip negative power contributions (defrost);
      when the whole counter ticks up, the fraction resets to EXACTLY
      zero — the reference's branch order (``MbusLogger.cs:129-133``)
      never adds the tick interval's trapezoid delta, so tick rows emit
      the bare whole-unit counter;
      the fraction is clamped to <= 0.99 so interpolation never
      contradicts the whole-unit counter.
    """
    w = _ordered_window(keys, ts_col)
    p_prev = F.lag(F.col(power_col)).over(w)
    t_prev = F.lag(F.col(ts_col)).over(w)
    e_prev = F.lag(F.col(energy_col)).over(w)
    dt_h = (F.unix_millis(F.col(ts_col)) - F.unix_millis(t_prev)) / F.lit(3_600_000.0)
    contrib = (p_prev + F.col(power_col)) / F.lit(2.0) * dt_h / F.lit(1000.0)
    reset = e_prev.isNotNull() & (F.col(energy_col) > e_prev)
    delta = F.when(
        reset | p_prev.isNull() | (contrib < 0), F.lit(0.0)
    ).otherwise(contrib)
    out = segmented_running_sum(
        df.withColumn("__delta", delta).withColumn("__reset", reset),
        keys,
        F.col("__delta"),
        F.col("__reset"),
        ts_col,
        alias="__frac",
    )
    frac = F.least(F.col("__frac"), F.lit(0.99))
    interpolated = F.col(energy_col) + frac
    if round_digits is not None:
        # reference emits round(., 3) (``MbusLogger.cs:147``); callers that
        # hash-compare against an external oracle pass None and quantize
        # instead (Spark round() on double rounds the decimal *rendering* —
        # not reproducible in double-math engines).
        interpolated = F.round(interpolated, round_digits)
    return out.withColumn(alias, interpolated).drop("__delta", "__reset", "__frac")


def pulse_accumulate(
    df: DataFrame,
    keys: Sequence[str],
    quantity_per_pulse: Column,
    ts_col: str = "ts",
    debounce_ms: int = 0,
    step_emit_ms: int | None = None,
) -> DataFrame:
    """A8: pulse-event accumulation (``Gpio/GpioLogger.cs:74-99``).

    Each row is one pulse. Output: cumulative quantity, instantaneous rate
    (quantity / seconds since previous pulse), and optionally the
    reference's step-function emission — an extra row ``step_emit_ms``
    before each pulse carrying the previous cumulative value, so plotted
    lines are steps instead of ramps (``:92-93``).

    Debounce drops pulses closer than ``debounce_ms`` to their predecessor
    (``:47,57-60``), evaluated before accumulation.
    """
    w = _ordered_window(keys, ts_col)
    if debounce_ms > 0:
        gap = F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lag(F.col(ts_col)).over(w))
        df = df.withColumn("__gap", gap).where(
            F.col("__gap").isNull() | (F.col("__gap") >= debounce_ms)
        ).drop("__gap")
        w = _ordered_window(keys, ts_col)
    cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("quantity", F.sum(quantity_per_pulse).over(cum))
    dt_s = (
        F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lag(F.col(ts_col)).over(w))
    ) / F.lit(1000.0)
    out = out.withColumn("rate", quantity_per_pulse / dt_s)
    if step_emit_ms is None:
        return out
    pre = F.struct(
        (F.timestamp_millis(F.unix_millis(F.col(ts_col)) - step_emit_ms)).alias("ts2"),
        (F.col("quantity") - quantity_per_pulse).alias("q2"),
        F.lit(None).cast("double").alias("r2"),
        F.lit(0).alias("is_pulse"),
    )
    post = F.struct(
        F.col(ts_col).alias("ts2"),
        F.col("quantity").alias("q2"),
        F.col("rate").alias("r2"),
        F.lit(1).alias("is_pulse"),
    )
    exploded = out.select(
        *keys, F.explode(F.array(pre, post)).alias("__e")
    ).select(
        *keys,
        F.col("__e.ts2").alias(ts_col),
        F.col("__e.q2").alias("quantity"),
        F.col("__e.r2").alias("rate"),
        F.col("__e.is_pulse").alias("is_pulse"),
    )
    return exploded
