"""Multi-valued data model tests (F7/K3): index semantics, name-driven
accessors, advisory (unenforced) schema behavior."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from homelogging_spark.functions.values import (
    SERIES_SCHEMAS,
    component,
    named_component,
    series_schema_dim,
    with_named_components,
)


@pytest.fixture()
def readings(spark):
    # Kasa-style PowerEnergy entry: [power W, energy+offset kWh, raw kWh]
    rows = [
        ("meters/kasa1", datetime(2024, 4, 1, 0, 0), "PowerEnergy", [240.0, 10.5, 3.5]),
        ("meters/kasa1", datetime(2024, 4, 1, 0, 1), "PowerEnergy", [250.0, 10.6, 3.6]),
        ("meters/p1", datetime(2024, 4, 1, 0, 0), "PowerPerPhase", [100.0, 200.0, 300.0]),
    ]
    return spark.createDataFrame(
        rows, "meter_id string, ts timestamp, series string, values array<double>"
    )


class TestComponent:
    def test_positional_1_based(self, readings):
        row = readings.where("series = 'PowerEnergy'").orderBy("ts").select(
            component("values", 1).alias("p"),
            component("values", 2).alias("e"),
            component("values", 3).alias("raw"),
        ).first()
        # reference Last[1] (0-based) == our index 2; Last[2] == our 3
        assert (row.p, row.e, row.raw) == (240.0, 10.5, 3.5)

    def test_kasa_vs_tapo_indices_differ(self, readings):
        # the off-by-one trap: energy_kwh (Kasa reads) != energy_raw_kwh (Tapo reads)
        row = readings.where("series = 'PowerEnergy'").select(
            component("values", 2).alias("kasa"), component("values", 3).alias("tapo")
        ).first()
        assert row.kasa != row.tapo


class TestNamedComponent:
    def test_resolves_by_registered_name(self, spark, readings):
        named = with_named_components(readings, spark, ["energy_raw_kwh", "l2_w"])
        rows = {r.series: r for r in named.collect()}
        assert rows["PowerEnergy"].energy_raw_kwh == 3.5 or rows["PowerEnergy"].energy_raw_kwh == 3.6
        assert rows["PowerPerPhase"].l2_w == 200.0
        # names not registered for a series -> NULL (advisory schema)
        assert rows["PowerPerPhase"].energy_raw_kwh is None
        assert rows["PowerEnergy"].l2_w is None

    def test_unknown_name_is_null(self, spark, readings):
        dim = series_schema_dim(spark)
        out = readings.join(F.broadcast(dim), "series").select(
            named_component("values", "value_names", "no_such_name").alias("x")
        ).collect()
        assert all(r.x is None for r in out)

    def test_dim_covers_observed_layouts(self, spark):
        dim = {r.series: r.value_names for r in series_schema_dim(spark).collect()}
        assert dim["EnergyCounters"] == SERIES_SCHEMAS["EnergyCounters"]
        assert len(dim["PowerPerPhase"]) == 3
        assert dim["PowerEnergy"][1] == "energy_kwh"
