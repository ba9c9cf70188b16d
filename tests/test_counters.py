"""Unit tests for the stateful counter operators (SURVEY.md §2.7) on
hand-built telemetry-shaped fixtures, checking exact reference semantics:

- ST2/ST3 rollover: offset accumulates the pre-reset raw value
  (``Tapo/TapoLogger.cs:87-107``; Kasa's replace-offset telescopes to the
  same recurrence, ``Kasa/KasaLogger.cs:55-75``).
- ST1 interpolation: trapezoid fraction, negative-delta skip, reset on
  whole-unit tick, 0.99 clamp (``Mbus/MbusLogger.cs:116-149``).
- A8 pulses: debounce, cumulative quantity, rate, step emission
  (``Gpio/GpioLogger.cs:74-99``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from homelogging_spark.operators.counters import (
    counter_rollover_correct,
    energy_fraction_interpolate,
    kasa_offset_replace,
    pulse_accumulate,
    segmented_running_sum,
)


def ts(minute, second=0, milli=0):
    base = datetime.datetime(2024, 1, 1)
    return base + datetime.timedelta(minutes=minute, seconds=second, milliseconds=milli)


def test_counter_rollover_accumulates_offsets(spark):
    rows = [
        ("m1", ts(0), 10.0),
        ("m1", ts(1), 12.5),
        ("m1", ts(2), 0.5),   # reset 1: offset += 12.5
        ("m1", ts(3), 3.0),
        ("m1", ts(4), 1.0),   # reset 2: offset += 3.0 → 15.5
        ("m2", ts(0), 5.0),   # independent key: no resets
        ("m2", ts(1), 6.0),
    ]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    out = counter_rollover_correct(df, ["meter_id"], "raw").orderBy("meter_id", "ts")
    got = [(r.meter_id, r.offset, r.corrected) for r in out.collect()]
    assert got == [
        ("m1", 0.0, 10.0),
        ("m1", 0.0, 12.5),
        ("m1", 12.5, 13.0),
        ("m1", 12.5, 15.5),
        ("m1", 15.5, 16.5),
        ("m2", 0.0, 5.0),
        ("m2", 0.0, 6.0),
    ]


def test_counter_rollover_epsilon_ignores_jitter(spark):
    rows = [("m", ts(0), 10.0), ("m", ts(1), 9.995), ("m", ts(2), 10.2)]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    out = counter_rollover_correct(df, ["meter_id"], "raw", epsilon=0.01)
    assert [r.offset for r in out.orderBy("ts").collect()] == [0.0, 0.0, 0.0]


def test_tapo_rounded_compare_exact_semantics(spark):
    """ST3 exact detection form (``Tapo/TapoLogger.cs:100-107``): reset
    iff round(cur, 1) < round(round(prev, 3), 1) — boundary cases the
    epsilon band classifies differently."""
    rows = [
        ("m", ts(0), 100.04),
        # epsilon form (eps=0.01): 99.97 < 100.03 → reset. Reference:
        # round(99.97,1)=100.0 NOT < round(100.04,1)=100.0 → NO reset.
        ("m", ts(1), 99.97),
        # a real monthly reset near the boundary: round(0.02,1)=0.0 <
        # round(99.97,1)=100.0 → reset, offset += round(99.97,3)=99.97
        ("m", ts(2), 0.02),
    ]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    exact = counter_rollover_correct(
        df, ["meter_id"], "raw", rounded_compare=True
    ).orderBy("ts").collect()
    assert [r.offset for r in exact] == [0.0, 0.0, 99.97]
    assert abs(exact[2].corrected - (0.02 + 99.97)) < 1e-12
    # the epsilon form classifies ts(1) as a reset — the divergence the
    # exact twin exists to remove
    eps = counter_rollover_correct(
        df, ["meter_id"], "raw", epsilon=0.01
    ).orderBy("ts").collect()
    assert eps[1].offset == 100.04

    # VERDICT r6 example: 99.96 → 99.94 rounds to different tenths
    # (100.0 vs 99.9) → the reference DOES classify it as a reset even
    # though the drop is only 0.02
    df2 = spark.createDataFrame(
        [("m", ts(0), 99.96), ("m", ts(1), 99.94)],
        "meter_id string, ts timestamp, raw double",
    )
    got = counter_rollover_correct(
        df2, ["meter_id"], "raw", rounded_compare=True
    ).orderBy("ts").collect()
    assert [r.offset for r in got] == [0.0, 99.96]
    # stored-digits rounding carries into the offset: prev rounds to 3
    # decimals BEFORE accumulating (TapoLogger.cs:100)
    df3 = spark.createDataFrame(
        [("m", ts(0), 12.00046), ("m", ts(1), 0.5)],
        "meter_id string, ts timestamp, raw double",
    )
    got3 = counter_rollover_correct(
        df3, ["meter_id"], "raw", rounded_compare=True
    ).orderBy("ts").collect()
    assert got3[1].offset == 12.0
    assert got3[1].corrected == 12.5


def test_kasa_offset_replace_exact_semantics(spark):
    # ST2 exact: on reset the offset is REPLACED with round(last_total, 4)
    rows = [
        ("m1", ts(0), 10.00015),
        ("m1", ts(1), 12.00015),
        ("m1", ts(2), 0.5),   # reset: offset := round(12.00015, 4) = 12.0002
        ("m1", ts(3), 1.0),
        ("m1", ts(4), 0.2),   # reset: offset := round(1.0 + 12.0002, 4)
        ("m2", ts(0), 5.0),
    ]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    out = {(r.meter_id, r.ts): r for r in kasa_offset_replace(df, ["meter_id"]).collect()}
    assert out[("m1", ts(2))].offset == round(12.00015, 4)
    assert out[("m1", ts(2))].corrected == 0.5 + round(12.00015, 4)
    assert out[("m1", ts(4))].offset == round(1.0 + round(12.00015, 4), 4)
    assert out[("m2", ts(0))].offset == 0.0
    # epsilon: a sub-0.01 dip is jitter, not a reset
    jitter = spark.createDataFrame(
        [("m", ts(0), 10.0), ("m", ts(1), 9.995)],
        "meter_id string, ts timestamp, raw double",
    )
    jrows = kasa_offset_replace(jitter, ["meter_id"]).orderBy("ts").collect()
    assert [r.offset for r in jrows] == [0.0, 0.0]


def test_kasa_replace_telescopes_to_accumulate_within_rounding(spark):
    # on round raw values the replace and accumulate forms coincide
    rows = [("m", ts(i), v) for i, v in enumerate([10.0, 12.5, 0.5, 3.0, 1.0])]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    replace = kasa_offset_replace(df, ["meter_id"]).orderBy("ts").collect()
    accum = counter_rollover_correct(df, ["meter_id"], "raw").orderBy("ts").collect()
    assert [r.corrected for r in replace] == [r.corrected for r in accum]


def test_segmented_running_sum_resets(spark):
    rows = [
        ("m", ts(0), 1.0, False),
        ("m", ts(1), 2.0, False),
        ("m", ts(2), 3.0, True),  # restart here
        ("m", ts(3), 4.0, False),
    ]
    df = spark.createDataFrame(
        rows, "meter_id string, ts timestamp, delta double, reset boolean"
    )
    out = segmented_running_sum(
        df, ["meter_id"], F.col("delta"), F.col("reset"), alias="acc"
    )
    assert [r.acc for r in out.orderBy("ts").collect()] == [1.0, 3.0, 3.0, 7.0]


def test_energy_fraction_interpolate(spark):
    # Constant 6000 W for one hour = 6 kWh; counter ticks whole kWh.
    rows = []
    for i in range(7):
        # every 10 minutes; whole counter = 100 + i (ticks each sample)
        rows.append(("m", ts(i * 10), 100.0 + i, 6000.0))
    df = spark.createDataFrame(
        rows, "meter_id string, ts timestamp, energy double, power double"
    )
    out = energy_fraction_interpolate(df, ["meter_id"], "energy", "power")
    got = [r.interpolated_energy for r in out.orderBy("ts").collect()]
    # Each 10-min step at 6 kW = 1.0 kWh fraction, but the counter ticks on
    # every row → the reference's branch order (MbusLogger.cs:129-133) zeroes
    # the fraction WITHOUT adding the tick interval's delta, so every tick
    # row emits exactly the whole-unit counter.
    assert got[0] == 100.0
    assert all(abs(v - (100.0 + i)) < 1e-9 for i, v in enumerate(got[1:], 1))


def test_energy_fraction_skips_negative_power(spark):
    rows = [
        ("m", ts(0), 100.0, 1200.0),
        ("m", ts(30), 100.0, -1200.0),  # trapezoid = 0 over this gap → skip
        ("m", ts(60), 100.0, 1200.0),
    ]
    df = spark.createDataFrame(
        rows, "meter_id string, ts timestamp, energy double, power double"
    )
    out = energy_fraction_interpolate(df, ["meter_id"], "energy", "power")
    got = [r.interpolated_energy for r in out.orderBy("ts").collect()]
    # (1200 + -1200)/2 = 0 → no contribution either interval
    assert got == [100.0, 100.0, 100.0]


def test_pulse_accumulate_debounce_and_rate(spark):
    rows = [
        ("w", ts(0, 0, 0)),
        ("w", ts(0, 0, 100)),  # 100 ms after previous → debounced away
        ("w", ts(0, 10, 0)),
        ("w", ts(0, 30, 0)),
    ]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp")
    out = pulse_accumulate(
        df, ["meter_id"], F.lit(0.5), debounce_ms=200
    ).orderBy("ts")
    got = [(r.quantity, r.rate) for r in out.collect()]
    assert [q for q, _ in got] == [0.5, 1.0, 1.5]
    assert got[0][1] is None
    assert abs(got[1][1] - 0.5 / 10.0) < 1e-12
    assert abs(got[2][1] - 0.5 / 20.0) < 1e-12


def test_pulse_step_emission(spark):
    rows = [("w", ts(1)), ("w", ts(2))]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp")
    out = pulse_accumulate(
        df, ["meter_id"], F.lit(1.0), step_emit_ms=10
    ).orderBy("ts")
    got = [(r.ts, r.quantity, r.is_pulse) for r in out.collect()]
    assert len(got) == 4
    # pre-step rows 10 ms before each pulse carry the previous total
    assert got[0][0] == ts(0, 59, 990) and got[0][1] == 0.0 and got[0][2] == 0
    assert got[1][0] == ts(1) and got[1][1] == 1.0 and got[1][2] == 1
    assert got[2][0] == ts(1, 59, 990) and got[2][1] == 1.0 and got[2][2] == 0
    assert got[3][0] == ts(2) and got[3][1] == 2.0 and got[3][2] == 1


def test_kasa_offset_replace_scaled_mode(spark):
    # "scaled" = floor(x*1e4+0.5)/1e4 — the oracle-replicable op
    # sequence; diverges from decimal round only within 1 ulp of a .5
    # boundary (12.00015 rounds up here, down under Python round)
    rows = [
        ("m", ts(0), 10.00015),
        ("m", ts(1), 12.00015),
        ("m", ts(2), 0.5),  # reset
    ]
    df = spark.createDataFrame(rows, "meter_id string, ts timestamp, raw double")
    out = {r.ts: r for r in kasa_offset_replace(df, ["meter_id"], round_mode="scaled").collect()}
    import math
    assert out[ts(2)].offset == math.floor(12.00015 * 1e4 + 0.5) / 1e4 == 12.0002
    dec = {r.ts: r for r in kasa_offset_replace(df, ["meter_id"]).collect()}
    assert dec[ts(2)].offset == round(12.00015, 4) == 12.0001

    import pytest
    with pytest.raises(ValueError):
        kasa_offset_replace(df, ["meter_id"], round_mode="bogus").collect()
