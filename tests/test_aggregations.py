"""Aggregation-operator tests not covered by oracle parity: the
percentile_approx scale path (A5) and gate guards (A7)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.aggregations import all_gate, trailing_percentile


def series(spark, values):
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [("s", t0 + timedelta(seconds=i), float(v)) for i, v in enumerate(values)],
        "key string, ts timestamp, value double",
    )


class TestTrailingPercentile:
    def test_exact_and_approx_agree_on_small_groups(self, spark):
        df = series(spark, range(101))
        cutoff = F.lit("2023-01-01").cast("timestamp")
        exact = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p"
        ).first().p
        approx = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p", approx=True
        ).first().p
        assert exact == pytest.approx(50.0)
        # GK sketch at default accuracy is exact for groups << accuracy
        assert approx == pytest.approx(exact)

    def test_cutoff_excludes_old_rows(self, spark):
        df = series(spark, [1000, 1, 2, 3])
        cutoff = F.lit("2024-01-01 00:00:01").cast("timestamp")
        got = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p"
        ).first().p
        assert got == pytest.approx(2.0)


class TestAllGateGuards:
    def test_min_count_guard(self, spark):
        df = series(spark, [10, 20, 30])  # all > 5 but only 3 samples
        out = all_gate(df, ["key"], F.col("value") > 5.0, min_count=10).first()
        assert out.n_true == 3
        assert out.all_true is False  # guard: too few samples to conclude
        assert out.none_true is False
