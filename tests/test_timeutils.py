"""Timestamp truncation decision table.

Cases mirror the reference's unit tests (``TelemetryTests/ExtensionTest.cs:9-31``):
whole-second truncation plus arbitrary sub-second intervals (100 ms),
which ``date_trunc`` cannot express.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from homelogging_spark.functions.timeutils import (
    in_time_of_day_period,
    time_bucket,
    truncate_to_interval,
    truncate_to_seconds,
)

UTC = datetime.timezone.utc


def _run(spark, ts: datetime.datetime, col):
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    return df.select(col.alias("out")).collect()[0]["out"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2012-04-01T12:23:34.992233", "2012-04-01T12:23:34"),
        ("2012-04-01T12:23:34.000001", "2012-04-01T12:23:34"),
        ("2012-04-01T12:23:34.999999", "2012-04-01T12:23:34"),
        ("2012-04-01T00:00:00.000000", "2012-04-01T00:00:00"),
        ("2012-12-31T23:59:59.999999", "2012-12-31T23:59:59"),
    ],
)
def test_truncate_to_seconds(spark, raw, expected):
    ts = datetime.datetime.fromisoformat(raw)
    out = _run(spark, ts, truncate_to_seconds(F.col("ts")))
    assert out == datetime.datetime.fromisoformat(expected)


@pytest.mark.parametrize(
    "raw,interval_ms,expected",
    [
        ("2012-04-01T12:23:34.992233", 100, "2012-04-01T12:23:34.900000"),
        ("2012-04-01T12:23:34.150000", 100, "2012-04-01T12:23:34.100000"),
        ("2012-04-01T12:23:34.050000", 500, "2012-04-01T12:23:34.000000"),
        ("2012-04-01T12:23:34.700000", 500, "2012-04-01T12:23:34.500000"),
        ("2012-04-01T12:23:34.992233", 10, "2012-04-01T12:23:34.990000"),
    ],
)
def test_truncate_to_interval(spark, raw, interval_ms, expected):
    ts = datetime.datetime.fromisoformat(raw)
    out = _run(spark, ts, truncate_to_interval(F.col("ts"), interval_ms))
    assert out == datetime.datetime.fromisoformat(expected)


def test_time_bucket_hour(spark):
    ts = datetime.datetime.fromisoformat("2024-01-05T13:47:31.5")
    out = _run(spark, ts, time_bucket(F.col("ts"), "hour"))
    assert out == datetime.datetime.fromisoformat("2024-01-05T13:00:00")


@pytest.mark.parametrize(
    "hhmm,on_min,off_min,expected",
    [
        ((8, 30), 8 * 60, 17 * 60, True),
        ((7, 59), 8 * 60, 17 * 60, False),
        ((17, 0), 8 * 60, 17 * 60, False),
        # wrapping period 22:00 → 06:00
        ((23, 30), 22 * 60, 6 * 60, True),
        ((2, 0), 22 * 60, 6 * 60, True),
        ((12, 0), 22 * 60, 6 * 60, False),
    ],
)
def test_in_time_of_day_period(spark, hhmm, on_min, off_min, expected):
    ts = datetime.datetime(2024, 1, 1, *hhmm)
    out = _run(spark, ts, in_time_of_day_period(F.col("ts"), on_min, off_min))
    assert out is expected
