"""RQL-flavored SQL sugar (SURVEY §4): the string rewrite must produce
plans EQUIVALENT to the hand-written A1/A2 bucket aggregations and the
F4 trailing-range filter — checked by running both forms on the same
data and diffing results."""

from __future__ import annotations

from pyspark.sql import functions as F

from homelogging_spark.functions.rql import rewrite_rql, sql_rql
from homelogging_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    ev = load_table(spark, SF, "events")
    ev.createOrReplaceTempView("events_v")
    return ev


class TestRewrite:
    def test_group_by_interval_rewrites_to_window(self):
        out = rewrite_rql(
            "SELECT bucket_start, avg(value) AS v FROM t GROUP BY '1 hour'"
        )
        assert "GROUP BY window(ts, '1 hour')" in out
        assert "window.start" in out and "bucket_start" not in out

    def test_last_n_units_rewrites_to_range(self):
        out = rewrite_rql(
            "SELECT * FROM t WHERE LAST 5 minutes", now="2024-01-30 00:00:00"
        )
        assert (
            "ts >= TIMESTAMP '2024-01-30 00:00:00' - INTERVAL 5 minutes" in out
        )

    def test_string_literals_are_untouched(self):
        out = rewrite_rql(
            "SELECT 'bucket_start last 5 minutes' AS lit, bucket_start "
            "FROM t GROUP BY '1 hour'"
        )
        assert "'bucket_start last 5 minutes'" in out  # literal preserved
        assert out.count("window.start") == 1

    def test_no_sugar_is_identity(self):
        sql = "SELECT event_type, count(*) FROM t GROUP BY event_type"
        assert rewrite_rql(sql) == sql


class TestEquivalence:
    def test_hourly_avg_matches_a1(self, spark):
        """group by '1 hour' == the A1 window() bucket aggregation."""
        ev = _events(spark)
        sugar = sql_rql(
            spark,
            "SELECT bucket_start AS bucket, event_type, "
            "avg(value) AS avg_value, count(*) AS n "
            "FROM events_v GROUP BY '1 hour', event_type",
        )
        manual = ev.groupBy(
            F.window("ts", "1 hour"), "event_type"
        ).agg(
            F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n")
        ).select(
            F.col("window.start").alias("bucket"),
            "event_type",
            "avg_value",
            "n",
        )
        assert sorted(map(tuple, sugar.collect())) == sorted(
            map(tuple, manual.collect())
        )
        # hour-aligned window() == date_trunc (the A1 oracle form)
        trunc = ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        ).agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        assert sorted(map(tuple, sugar.collect())) == sorted(
            map(tuple, trunc.collect())
        )

    def test_minute_downsample_matches_a2(self, spark):
        """group by '1 minute' == the A2 minute downsample buckets."""
        _events(spark)
        sugar = sql_rql(
            spark,
            "SELECT bucket_start AS bucket, avg(value) AS v "
            "FROM events_v WHERE event_type = 'click' GROUP BY '1 minute'",
        )
        manual = sql_rql(  # no sugar in this one: plain spark.sql path
            spark,
            "SELECT date_trunc('minute', ts) AS bucket, avg(value) AS v "
            "FROM events_v WHERE event_type = 'click' "
            "GROUP BY date_trunc('minute', ts)",
        )
        assert sorted(map(tuple, sugar.collect())) == sorted(
            map(tuple, manual.collect())
        )

    def test_last_window_matches_f4(self, spark):
        """LAST 5 days == the explicit trailing-range predicate, and the
        predicate still reaches the parquet scan (pushdown survives the
        rewrite)."""
        ev = _events(spark)
        now = "2024-01-30 00:00:00"
        sugar = sql_rql(
            spark,
            "SELECT count(*) AS n FROM events_v WHERE LAST 5 days",
            now=now,
        )
        manual = ev.where(
            F.col("ts")
            >= F.lit(now).cast("timestamp") - F.expr("INTERVAL 5 days")
        ).agg(F.count(F.lit(1)).alias("n"))
        assert sugar.collect() == manual.collect()
        assert sugar.collect()[0].n > 0
        plan = (
            sql_rql(
                spark,
                "SELECT * FROM events_v WHERE LAST 5 days",
                now=now,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters:" in plan and "ts" in plan.split(
            "PushedFilters:"
        )[1].split("]")[0]
