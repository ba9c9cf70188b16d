"""Multi-valued entries: the reference's core data model (SURVEY §1.1).

A RavenDB time-series entry is ``(ts, Values: double[1..N], Tag)`` —
e.g. ``PowerPerPhase = [L1, L2, L3]`` (``P1/P1Logger.cs:134-138``) or
Kasa/Tapo ``PowerEnergy = [power_w, energy_kwh, energy_raw_kwh]``
(``Kasa/KasaLogger.cs:45-46``). Value-column names are *registered* per
series in an advisory schema (``P1/P1Logger.cs:103-125``) and consumers
project components BY INDEX: ``Last[1]`` is the Kasa offset-corrected
energy (``Kasa/KasaLogger.cs:68``), ``Last[2]`` the Tapo raw counter
(``Tapo/TapoLogger.cs:100``) — an off-by-one here silently corrupts
offsets, which is why the accessors below are name-driven.

Spark mapping: ``values array<double>`` on the long-format fact table +
a tiny ``series_schema(series, value_names)`` dimension; named access
compiles to ``element_at(values, array_position(value_names, name))``
after a broadcast join — an API-layer feature, zero engine changes, and
the array column costs nothing at scan time when pruned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Registered layouts observed in the reference (SURVEY §1.1 table).
SERIES_SCHEMAS: dict[str, list[str]] = {
    "PowerPerPhase": ["l1_w", "l2_w", "l3_w"],
    "EnergyCounters": [
        "energy_delivered_t1",
        "energy_delivered_t2",
        "energy_returned_t1",
        "energy_returned_t2",
    ],
    "CalculatedPower": ["power_w", "delta_t_k"],
    "PowerEnergy": ["power_w", "energy_kwh", "energy_raw_kwh"],
    "MPPT1": ["ipv_a", "vpv_v"],
    "FanSpeedPercentages": ["supply_pct", "extract_pct"],
    "Water": ["cumulative_qty", "rate_per_s"],
    "Wind": ["speed_ms", "direction_deg"],
}


def series_schema_dim(spark: SparkSession) -> DataFrame:
    """The ``series_schema`` dimension (K3 registration target). Always
    broadcast-joined — it is bytes, never a shuffle."""
    rows = [(s, names) for s, names in SERIES_SCHEMAS.items()]
    return spark.createDataFrame(rows, "series string, value_names array<string>")


def component(values: Column | str, index: int) -> Column:
    """F7 positional projection, 1-based like ``element_at`` (the
    reference's ``Last[i]`` is 0-based: reference index i == our i+1)."""
    c = F.col(values) if isinstance(values, str) else values
    return F.element_at(c, index)


def named_component(
    values: Column | str, value_names: Column | str, name: str
) -> Column:
    """Name-driven projection via the registered layout: resolves the
    index with ``array_position`` (NULL when the series never registered
    that name — advisory schema, not enforced, matching the reference)."""
    v = F.col(values) if isinstance(values, str) else values
    n = F.col(value_names) if isinstance(value_names, str) else value_names
    pos = F.array_position(n, name)
    return F.when(pos > 0, F.element_at(v, pos.cast("int")))


def with_named_components(
    readings: DataFrame, spark: SparkSession, names: list[str]
) -> DataFrame:
    """Attach one column per requested component name to a long-format
    readings frame (must carry ``series`` and ``values`` columns)."""
    dim = F.broadcast(series_schema_dim(spark))
    joined = readings.join(dim, "series", "left")
    for name in names:
        joined = joined.withColumn(
            name, named_component("values", "value_names", name)
        )
    return joined.drop("value_names")
