"""Flagship query: the reference's solar/price cost analysis (EP1).

Reference semantics (``RandomQueries/Program.cs:33-58``): four hourly
series — grid power, APX price, two solar inverters — are bucket-averaged,
dict-joined on the truncated hour (missing hours → 0.0), then per-hour
usage/cost and their totals are computed client-side.

Mapped onto the driver testdata (FIXTURES.md §4): the ``events`` table is
the long-format fact table; ``event_type`` stands in for the series name.
  click    → grid Power        purchase → Apx price
  view     → solar inverter 1  signup   → solar inverter 2

Plan shape at scale: ONE scan of the fact table with a pushed
``event_type IN (...)`` filter, ONE hash aggregate per hour computing all
four series as conditional averages (``avg(when(event_type == s, value))``)
— partial aggregation map-side, a single shuffle on the hour key, and zero
joins. At 100 TB this reads the fact table once instead of four times; the
bucket-aligned-join formulation (kept as the general J1 operator in
``operators/joins.py``) is only needed when the series genuinely live in
different tables.

All float outputs are rounded to 6 decimals so results are bit-stable
across summation orders (Spark partial aggs vs single-threaded oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from homelogging_spark.functions.numeric import quantize
from homelogging_spark.tables import load_table

SERIES = {"power": "click", "price": "purchase", "solar1": "view", "solar2": "signup"}


def hourly_series(events: DataFrame, event_type: str, alias: str) -> DataFrame:
    """Single-series hourly average (building block kept for callers that
    join series from different tables via ``bucket_aligned_left_join``)."""
    return (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(quantize(F.avg("value")).alias(alias))
    )


def hourly_cost_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour joined series + derived usage/cost (EP1 steps 1-5).

    One scan, one aggregate: ``avg`` ignores the NULLs produced by the
    non-matching ``when`` branches, so each conditional average equals the
    per-series average; hours with no power rows are dropped (the reference
    iterates the power dict) and missing price/solar hours coalesce to 0.0
    (dict ``TryGetValue`` default) — identical semantics to the four-way
    bucket-aligned left join, at a quarter of the scan cost.
    """
    events = load_table(spark, sf_dir, "events")

    def series_avg(name: str) -> Column:
        cond = F.when(F.col("event_type") == SERIES[name], F.col("value"))
        return quantize(F.avg(cond)).alias(name)

    joined = (
        events.where(F.col("event_type").isin(list(SERIES.values())))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(*[series_avg(n) for n in ("power", "price", "solar1", "solar2")])
        .where(F.col("power").isNotNull())
        .withColumns(
            {n: F.coalesce(F.col(n), F.lit(0.0)) for n in ("price", "solar1", "solar2")}
        )
    )
    return joined.select(
        "hour",
        "power",
        "price",
        "solar1",
        "solar2",
        quantize((F.col("power") + F.col("solar1") + F.col("solar2")) / 1000.0).alias(
            "usage"
        ),
        quantize((F.col("power") + F.col("solar1") + F.col("solar2"))
            / 1000.0
            * F.col("price")).alias("cost"),
    )


def cost_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 step 6 (``RandomQueries/Program.cs:47-58``): coverage %, total
    usage, total cost, and the usage-weighted average rate.

    Derived from the same single-scan hourly frame as the flagship: the
    whole report is one fact scan + one hour-key shuffle + a final global
    aggregate over ~hours rows (trivially small)."""
    hourly = hourly_cost_analysis(spark, sf_dir)
    return hourly.agg(
        F.count(F.lit(1)).alias("n_hours"),
        quantize(100.0 * F.sum((F.col("price") != 0.0).cast("int")) / F.count(F.lit(1))).alias(
            "price_coverage_pct"
        ),
        quantize(F.sum("usage")).alias("total_usage"),
        quantize(F.sum("cost")).alias("total_cost"),
        quantize(F.sum("cost") / F.sum("usage")).alias("avg_rate"),
    )


FLAGSHIP_ORACLE = """
WITH power AS (
  SELECT date_trunc('hour', ts) AS hour, floor((avg(value)) * 1000000 + 0.5) / 1000000 AS power
  FROM events WHERE event_type = 'click' GROUP BY 1
), price AS (
  SELECT date_trunc('hour', ts) AS hour, floor((avg(value)) * 1000000 + 0.5) / 1000000 AS price
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), solar1 AS (
  SELECT date_trunc('hour', ts) AS hour, floor((avg(value)) * 1000000 + 0.5) / 1000000 AS solar1
  FROM events WHERE event_type = 'view' GROUP BY 1
), solar2 AS (
  SELECT date_trunc('hour', ts) AS hour, floor((avg(value)) * 1000000 + 0.5) / 1000000 AS solar2
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT p.hour AS hour,
       p.power AS power,
       COALESCE(pr.price, 0.0) AS price,
       COALESCE(s1.solar1, 0.0) AS solar1,
       COALESCE(s2.solar2, 0.0) AS solar2,
       floor(((p.power + COALESCE(s1.solar1, 0.0) + COALESCE(s2.solar2, 0.0)) / 1000.0) * 1000000 + 0.5) / 1000000 AS usage,
       floor(((p.power + COALESCE(s1.solar1, 0.0) + COALESCE(s2.solar2, 0.0)) / 1000.0
             * COALESCE(pr.price, 0.0)) * 1000000 + 0.5) / 1000000 AS cost
FROM power p
LEFT JOIN price pr ON p.hour = pr.hour
LEFT JOIN solar1 s1 ON p.hour = s1.hour
LEFT JOIN solar2 s2 ON p.hour = s2.hour
"""

COST_TOTALS_ORACLE = f"""
WITH hourly AS ({FLAGSHIP_ORACLE})
SELECT count(*) AS n_hours,
       floor((100.0 * sum(CASE WHEN price != 0.0 THEN 1 ELSE 0 END) / count(*)) * 1000000 + 0.5) / 1000000 AS price_coverage_pct,
       floor((sum(usage)) * 1000000 + 0.5) / 1000000 AS total_usage,
       floor((sum(cost)) * 1000000 + 0.5) / 1000000 AS total_cost,
       floor((sum(cost) / sum(usage)) * 1000000 + 0.5) / 1000000 AS avg_rate
FROM hourly
"""
