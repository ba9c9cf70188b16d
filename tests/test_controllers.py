"""ST5-ST7 controller decision tests.

The ST5 table ports ``TelemetryTests/EbusRunExtenderTests.cs:24-46``.
Note: the reference's own first-theory rows 1 and 5 predate its current
source — they expect ``actual + 0.5`` where ``EbusRunExtender.cs:81``
proposes ``desired + 0.5``. This port asserts the *source* semantics
(rows marked 'stale-upstream' carry the corrected expectation).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.controllers import (
    flow_temp_decision,
    pv_mode_decision,
    thermostat_mode,
)

NAN = float("nan")


def decide(spark, mod, cur, desired, actual, settings=(24.0, 30.0), d_mod=5.0,
           apply_guards=False):
    df = spark.createDataFrame(
        [(float(cur), float(actual), float(desired), float(mod))],
        "cur double, actual double, desired double, speed double",
    )
    row = df.select(
        flow_temp_decision(
            F.col("cur"), F.col("actual"), F.col("desired"), F.col("speed"),
            settings[0], settings[1], d_mod, apply_guards=apply_guards,
        ).alias("d")
    ).first()
    return row.d


class TestFlowTempDecisionTable:
    # (modulation, currentMinimum, desired, actualFlow) -> proposal
    # settings: min 24, max 30, desired modulation 5
    @pytest.mark.parametrize(
        "mod,cur,desired,actual,expected",
        [
            (0, 24, 24, 25, 24.5),  # overshoot -> desired+0.5 (stale-upstream: 25.5)
            (0, 26, 0, 22, 24),     # no heat requested -> reset to configured min
            (0, 23, 0, 15, 24),     # below configured minimum -> reset
            (0, 23, 23, 23.5, 24),  # below configured minimum wins first
            (0, 24, 24, 24.5, 24.5),  # on minimum -> desired+0.5 (stale-upstream: 25)
        ],
    )
    def test_first_theory(self, spark, mod, cur, desired, actual, expected):
        assert decide(spark, mod, cur, desired, actual) == pytest.approx(expected)

    # second theory: DesiredModulation = 10
    @pytest.mark.parametrize(
        "mod,cur,desired,actual,expected",
        [
            (9, 24, 25, 25, 25.5),
            (20, 26, 26, 26, 25.5),
            (5, 30, 30, 30, NAN),   # actual at max -> no action
            (20, 25, 26, 26, NAN),  # desired above current -> no action
        ],
    )
    def test_manage_modulation(self, spark, mod, cur, desired, actual, expected):
        got = decide(spark, mod, cur, desired, actual, d_mod=10.0)
        if math.isnan(expected):
            assert got is None
        else:
            assert got == pytest.approx(expected)

    def test_guards_deadband_and_clamps(self, spark):
        # proposal within 0.4 of current -> suppressed
        assert decide(spark, 0, 24.2, 24, 25, apply_guards=True) is None
        # proposal above max -> suppressed (desired 29.8 -> 30.3 > 30)
        assert decide(spark, 0, 24, 29.8, 29.9, apply_guards=True) is None
        # valid proposal passes the guards
        assert decide(spark, 0, 24, 26, 27, apply_guards=True) == pytest.approx(26.5)


class TestThermostatMode:
    def rows(self, spark, temp, hour, all_on, none_on):
        return spark.createDataFrame(
            [(temp, f"2024-01-01 {hour:02d}:30:00", all_on, none_on)],
            "temp double, ts string, all_on boolean, none_on boolean",
        ).select(
            thermostat_mode(
                F.col("temp"), F.col("ts").cast("timestamp"),
                F.col("all_on"), F.col("none_on"),
                permanent_switch_temp=2.0,
                off_periods=[(23 * 60, 6 * 60)],  # 23:00-06:00, wraps midnight
            ).alias("mode")
        ).first().mode

    def test_permanent_on_when_cold(self, spark):
        assert self.rows(spark, 1.0, 12, False, False) == "on"

    def test_off_period_wraps_midnight(self, spark):
        assert self.rows(spark, 10.0, 23, True, False) == "off"
        assert self.rows(spark, 10.0, 5, True, False) == "off"
        assert self.rows(spark, 10.0, 7, True, False) == "on"

    def test_window_gates(self, spark):
        assert self.rows(spark, 10.0, 12, True, False) == "on"
        assert self.rows(spark, 10.0, 12, False, True) == "off"
        assert self.rows(spark, 10.0, 12, False, False) is None  # keep as-is


class TestPvMode:
    @pytest.mark.parametrize(
        "median,prev,expected",
        [
            (-500.0, 0.0, 1.0),   # below in-threshold -> on
            (100.0, 1.0, 0.0),    # above out-threshold -> off
            (-100.0, 1.0, 1.0),   # hysteresis band keeps previous
            (-100.0, 0.0, 0.0),
            (-100.0, None, 0.0),  # no previous mode -> off
        ],
    )
    def test_bang_bang(self, spark, median, prev, expected):
        df = spark.createDataFrame([(median, prev)], "m double, p double")
        got = df.select(pv_mode_decision(F.col("m"), F.col("p")).alias("d")).first().d
        assert got == pytest.approx(expected)


class TestCusumAlarms:
    def test_drift_alarms_and_restarts(self, spark):
        """Slow upward drift must alarm where an instantaneous band check
        would not, and the sums must restart after each alarm."""
        import datetime as dt

        from homelogging_spark.operators.controllers import cusum_alarms

        t0 = dt.datetime(2024, 1, 1)
        # target=35, slack=5 -> accumulate (x-40); x=45 adds 5/step:
        # alarm (s_hi > 20) fires on the 5th step (s_hi=25), then restarts
        rows = [
            ("m1", t0 + dt.timedelta(minutes=i), 45.0) for i in range(10)
        ] + [
            # m2 stays inside the band -> never alarms
            ("m2", t0 + dt.timedelta(minutes=i), 36.0) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
        out = cusum_alarms(df, ["user_id"], target=35.0, slack=5.0, threshold=20.0)
        m1 = [r for r in out.where("user_id = 'm1'").orderBy("ts").collect()]
        assert [r.cusum_hi for r in m1[:5]] == [5.0, 10.0, 15.0, 20.0, 25.0]
        assert [r.alarm for r in m1[:5]] == [False, False, False, False, True]
        # restart: the 6th step begins from zero again
        assert m1[5].cusum_hi == 5.0 and m1[5].alarm is False
        m2 = out.where("user_id = 'm2'").collect()
        assert all(not r.alarm for r in m2)
        assert all(r.cusum_hi == 0.0 and r.cusum_lo == 0.0 for r in m2)

    def test_downward_drift_uses_lower_sum(self, spark):
        import datetime as dt

        from homelogging_spark.operators.controllers import cusum_alarms

        t0 = dt.datetime(2024, 1, 1)
        rows = [("m", t0 + dt.timedelta(minutes=i), 20.0) for i in range(4)]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
        out = cusum_alarms(df, ["user_id"], target=35.0, slack=5.0, threshold=25.0)
        got = [r for r in out.orderBy("ts").collect()]
        # 30 - 20 = 10/step on the lower sum
        assert [r.cusum_lo for r in got] == [10.0, 20.0, 30.0, 10.0]
        assert [r.alarm for r in got] == [False, False, True, False]
