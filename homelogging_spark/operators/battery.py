"""ST4: battery zero-export simulation (the reference's flagship EP2
analytic, ``RandomQueries/ZeroExport.cs:33-73``).

An ordered fold over minute-averaged grid power: each step tries to
discharge the battery into positive grid draw (import) or charge it from
negative draw (export), with efficiency asymmetry and SoC clamps:

    gridEnergy = P / 1000 / 60                      (W -> kWh per minute)
    import:  discharge = min(maxE/eff, gridE/eff, SoC)
    export:  charge    = min(maxE*eff, -gridE*eff, capacity - SoC)
    Cycles   = (totalCharged + totalDischarged) / 2 / capacity

The SoC clamp makes this a *nonlinear* recurrence — no window-function
form exists (unlike ST1-ST3 in ``counters.py``), so this is the one
operator that genuinely needs ``applyInPandas``: per-meter ordered fold
in Python over Arrow batches.

Scale notes: partitioning is BY METER — 1000 executors fold 1000s of
meters concurrently, each group materialized once (a year of minutes is
~525k rows ≈ 20 MB per meter — comfortably in-memory; chunk by month and
carry state forward if a group ever outgrows an executor). The fold
itself is O(n) python-float arithmetic; the shuffle to group by meter is
the only data movement.

Oracle note: the recurrence IS replicable in SQL via a recursive CTE
that advances all meters in lockstep one row-number per iteration (depth
= max rows per meter) — see ``plans/battery_registry.py``. Both sides
consume identically quantized minute averages, and the per-step math is
the same sequence of IEEE double ops, so results hash-match exactly.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

SIM_COLUMNS = ("soc", "total_charged", "total_discharged", "cycles")


def simulate_battery_series(
    powers: Iterable[float],
    capacity: float = 2.7,
    efficiency: float = 0.9,
    max_power_kw: float = 0.8,
    step_minutes: float = 1.0,
    initial: tuple[float, float, float] = (0.0, 0.0, 0.0),
) -> list[tuple[float, float, float, float]]:
    """The pure fold: (soc, total_charged, total_discharged, cycles) after
    each step. Kept separate from Spark so tests (and any host) can run
    the exact recurrence directly. ``initial`` seeds
    (soc, charged, discharged) so the streaming form can resume the
    recurrence from state-store values between micro-batches."""
    max_energy = max_power_kw / 60.0 * step_minutes
    soc, charged, discharged = initial
    out: list[tuple[float, float, float, float]] = []
    for p in powers:
        grid_energy = p / 1000.0 / 60.0 * step_minutes
        if grid_energy > 0:  # importing -> try discharge
            d = min(max_energy / efficiency, grid_energy / efficiency, soc)
            discharged += d
            soc -= d
        else:  # exporting (or zero) -> try charge
            c = min(max_energy * efficiency, -grid_energy * efficiency, capacity - soc)
            charged += c
            soc += c
        out.append((soc, charged, discharged, (charged + discharged) / 2.0 / capacity))
    return out


def battery_zero_export(
    df: DataFrame,
    keys: Sequence[str],
    power_col: str = "power",
    ts_col: str = "bucket",
    capacity: float = 2.7,
    efficiency: float = 0.9,
    max_power_kw: float = 0.8,
    step_minutes: float = 1.0,
) -> DataFrame:
    """Per-key ordered battery fold: input rows + SoC / totals / cycles."""
    import pandas as pd

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(c, DoubleType(), True) for c in SIM_COLUMNS]
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        states = simulate_battery_series(
            pdf[power_col].tolist(), capacity, efficiency, max_power_kw, step_minutes
        )
        for i, c in enumerate(SIM_COLUMNS):
            pdf[c] = [s[i] for s in states]
        return pdf

    from homelogging_spark.functions.shuffleutil import fold_partitioned

    return fold_partitioned(df, keys).groupBy(*keys).applyInPandas(fold, out_schema)


def daily_cycles_report(
    sim: DataFrame, keys: Sequence[str], ts_col: str = "bucket"
) -> DataFrame:
    """W4 day-boundary report over the simulation output: per key and day,
    the cycles accumulated that day (end-of-day cycles minus end of the
    previous day — the reference's ``pr.Key.Date != state.Timestamp``
    emission, ``ZeroExport.cs:43-48``)."""
    from pyspark.sql import Window

    day = F.to_date(F.col(ts_col)).alias("day")
    per_day = sim.groupBy(*keys, day).agg(F.max("cycles").alias("eod_cycles"))
    w = Window.partitionBy(*keys).orderBy("day")
    return per_day.select(
        *keys,
        "day",
        (F.col("eod_cycles") - F.coalesce(F.lag("eod_cycles").over(w), F.lit(0.0))).alias(
            "cycles_delta"
        ),
    )
