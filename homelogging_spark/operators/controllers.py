"""Control-loop decision operators (SURVEY §2.7 ST5-ST7).

The reference runs three controllers over "latest value" snapshots; all
three are pure decision tables / hysteresis rules — batch-expressible as
``when``/``otherwise`` column expressions over an A3-style latest frame,
no state beyond what a lag column carries.

ST5 ``flow_temp_decision`` — ``Ebus/EbusRunExtender.cs:62-107``
ST6 ``thermostat_mode``    — ``Ebus/EbusThermostatSwitcher.cs:18-104``
ST7 ``pv_mode_decision``   — ``Deploy/switchboiler.sh:5-26``

Note on ST5 parity: the reference's unit table
(``TelemetryTests/EbusRunExtenderTests.cs:24-36``) predates the current
source — its first-theory cases 1 and 5 expect ``actual + 0.5`` where
``EbusRunExtender.cs:81`` now proposes ``desired + 0.5``. This module
follows the *source*; the ported tests mark the two stale rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from homelogging_spark.functions.timeutils import in_time_of_day_period


def flow_temp_decision(
    current_min: Column,
    actual_flow: Column,
    desired_flow: Column,
    speed: Column,
    settings_min: Column | float,
    settings_max: Column | float,
    desired_modulation: Column | float,
    apply_guards: bool = True,
) -> Column:
    """ST5: the 4-branch hysteresis rule table, NULL = no action.

    Branches (``EbusRunExtender.cs:64-94``, in priority order):
      1. current < configured minimum            -> reset to configured
      2. no heat requested and current above min -> reset to configured
      3. under-modulating and flow overshooting  -> desired + 0.5
      4. over-modulating and flow undershooting  -> current - 0.5
    Guards (``SetMinimumFlowTemp``, ``:98-107``): proposal clamped to
    [min, max] by refusal and a 0.4 deadband vs current.
    """
    s_min = F.lit(settings_min) if not isinstance(settings_min, Column) else settings_min
    s_max = F.lit(settings_max) if not isinstance(settings_max, Column) else settings_max
    d_mod = (
        F.lit(desired_modulation)
        if not isinstance(desired_modulation, Column)
        else desired_modulation
    )

    proposal = (
        F.when(current_min < s_min, s_min)
        .when((desired_flow < 1) & (current_min > s_min), s_min)
        .when(
            (speed < d_mod)
            & (actual_flow < s_max)
            & (actual_flow >= desired_flow)
            & (desired_flow >= 1),
            desired_flow + 0.5,
        )
        .when(
            (speed > d_mod + 5)
            & (actual_flow > s_min)
            & (actual_flow <= desired_flow)
            & (desired_flow <= current_min),
            current_min - 0.5,
        )
    )
    if not apply_guards:
        return proposal
    return F.when(
        (proposal >= s_min)
        & (proposal <= s_max)
        & (F.abs(proposal - current_min) >= 0.4),
        proposal,
    )


def thermostat_mode(
    outside_temp: Column,
    ts: Column,
    all_on: Column,
    none_on: Column,
    permanent_switch_temp: Column | float,
    off_periods: list[tuple[int, int]],
) -> Column:
    """ST6: thermostat switch decision (``EbusThermostatSwitcher.cs:
    18-104``): 'on' when it is cold enough permanently, 'off' inside a
    configured time-of-day off-period, else keep/derive from the A7
    window gates (all-on -> 'on', none-on -> 'off', mixed -> NULL =
    leave as-is). ``all_on``/``none_on`` come from
    ``aggregations.all_gate`` over the trailing MinimumOn/OffPeriod;
    ``off_periods`` are (on_minute, off_minute) pairs since midnight.
    """
    p_temp = (
        F.lit(permanent_switch_temp)
        if not isinstance(permanent_switch_temp, Column)
        else permanent_switch_temp
    )
    in_off = F.lit(False)
    for start, end in off_periods:
        in_off = in_off | in_time_of_day_period(ts, start, end)
    return (
        F.when(outside_temp <= p_temp, F.lit("on"))
        .when(in_off, F.lit("off"))
        .when(all_on, F.lit("on"))
        .when(none_on, F.lit("off"))
    )


def pv_mode_decision(
    median_power: Column,
    previous_mode: Column,
    in_threshold: float = -300.0,
    out_threshold: float = 30.0,
) -> Column:
    """ST7: boiler PV-mode bang-bang control (``Deploy/switchboiler.sh:
    5-26``): median(5 min) below the in-threshold switches PV mode on
    (1.0), above the out-threshold switches off (0.0), the hysteresis
    band in between keeps the previous mode (lagged emitted series)."""
    return (
        F.when(median_power < F.lit(in_threshold), F.lit(1.0))
        .when(median_power > F.lit(out_threshold), F.lit(0.0))
        .otherwise(F.coalesce(previous_mode, F.lit(0.0)))
    )


def cusum_alarms(
    df,
    keys,
    value_col: str = "value",
    ts_col: str = "ts",
    target: float = 35.0,
    slack: float = 5.0,
    threshold: float = 50.0,
):
    """CUSUM change-point alarms (Page 1954) per meter: one-sided upper
    and lower cumulative sums of deviations beyond a slack band,

        s_hi = max(0, s_hi + (x - target - slack))
        s_lo = max(0, s_lo + (target - slack - x))

    alarm when either exceeds ``threshold``; both sums RESET after an
    alarm (the standard restart, so repeated drift re-signals). The
    reference's controllers gate on instantaneous latest values
    (``EbusRunExtender``, ``switchboiler.sh``); CUSUM is the
    drift-robust upgrade that catches slow failures those bands miss.

    Sequential per-meter recurrence (max-clamp + reset makes it
    nonlinear) → ``applyInPandas`` fold on an explicit
    ``fold_partitioned`` exchange, same as ST2/ST4; state is two
    doubles per meter, so the streaming form is
    ``applyInPandasWithState`` exactly like the stateful rollover. All
    arithmetic is max/+/- on doubles — bit-identical in the
    recursive-CTE oracle, no rounding step needed."""
    import pandas as pd  # noqa: F401 (Arrow batch interface)
    from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

    up = target + slack
    dn = target - slack
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("cusum_hi", DoubleType(), True),
            StructField("cusum_lo", DoubleType(), True),
            StructField("alarm", BooleanType(), True),
        ]
    )

    def fold(pdf):
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        hi = lo = 0.0
        his, los, alarms = [], [], []
        for x in pdf[value_col]:
            s_hi = max(0.0, hi + (x - up))
            s_lo = max(0.0, lo + (dn - x))
            alarm = s_hi > threshold or s_lo > threshold
            his.append(s_hi)
            los.append(s_lo)
            alarms.append(alarm)
            hi, lo = (0.0, 0.0) if alarm else (s_hi, s_lo)
        return pdf.assign(cusum_hi=his, cusum_lo=los, alarm=alarms)

    from homelogging_spark.functions.shuffleutil import fold_partitioned

    return fold_partitioned(df, keys).groupBy(*keys).applyInPandas(fold, out_schema)
