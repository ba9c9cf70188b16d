"""EP3 end-to-end: heterogeneous device payloads -> source parsers ->
long-format readings -> partitioned deduped sink -> analytic query.

The 'switch from the reference' narrative in one test: a DSMR telegram,
an M-Bus XML telegram, and a Kasa binary frame all land in the same
``readings(meter_id, series, ts, values, tag)`` table and are served by
the same operators (A3 latest-per-meter here).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.aggregations import latest_per_key
from homelogging_spark.operators.ingest import append_readings, read_readings
from homelogging_spark.sources import dsmr, kasa, mbus

TELEGRAM = "/ISK5\\2M550T-1013\n\n1-0:1.7.0(00.244*kW)\n1-0:2.7.0(00.000*kW)\n!"

MBUS_XML = (
    "<MBusData><SlaveInformation><Id>10758808</Id>"
    "<Manufacturer>ZRI</Manufacturer><Medium>Heat</Medium></SlaveInformation>"
    '<DataRecord id="1"><Unit>kWh</Unit><Value>1220</Value></DataRecord>'
    '<DataRecord id="9"><Unit>C</Unit><Value>4211</Value></DataRecord>'
    '<DataRecord id="10"><Unit>C</Unit><Value>3458</Value></DataRecord>'
    '<DataRecord id="12"><Unit>W</Unit><Value>49</Value></DataRecord>'
    '<DataRecord id="13"><Unit>m3/h</Unit><Value>0.6</Value></DataRecord>'
    "</MBusData>"
)

KASA_JSON = '{"emeter":{"get_realtime":{"power_mw":2414,"total_wh":1234}}}'

T0 = datetime(2024, 4, 1, 12, 0, 0)
READING_COLS = ["meter_id", "series", "ts", "values", "tag"]


def test_three_sources_one_table_one_query(spark, tmp_path):
    ts = F.lit("2024-04-01 12:00:00").cast("timestamp")

    p1 = dsmr.parse_telegram(
        spark.createDataFrame([(TELEGRAM,)], "telegram string")
    ).select(
        "meter_id",
        F.lit("Power").alias("series"),
        ts.alias("ts"),
        F.array("power_w").alias("values"),
        F.lit("W").alias("tag"),
    )

    heat = mbus.mbus_series(
        mbus.parse_mbus(spark.createDataFrame([(MBUS_XML,)], "xml string"))
    ).select(
        "meter_id",
        F.lit("CalculatedPower").alias("series"),
        ts.alias("ts"),
        F.array("calculated_power_w", "delta_t_k").alias("values"),
        F.lit("W;K").alias("tag"),
    )

    plug = kasa.parse_kasa(
        spark.createDataFrame(
            [(kasa.xor_autokey_encrypt(KASA_JSON.encode()),)], "payload binary"
        )
    ).select(
        F.lit("meters/kasa-1").alias("meter_id"),
        F.lit("PowerEnergy").alias("series"),
        ts.alias("ts"),
        F.array("power_w", "energy_kwh", "energy_kwh").alias("values"),
        F.lit("W;kWh").alias("tag"),
    )

    batch = p1.unionByName(heat).unionByName(plug)
    table = str(tmp_path / "readings")
    append_readings(batch, table)
    # duplicate re-append of the same batch: the idempotent key dedups
    # within each write; same-key rows across appends share (series, ts)
    append_readings(batch, table)

    back = read_readings(spark, table)
    assert back.count() == 6  # 3 rows x 2 appends (append mode keeps both)
    latest = latest_per_key(
        back.select(*READING_COLS).dropDuplicates(["meter_id", "series", "ts"]),
        ["meter_id", "series"],
        "ts",
    )
    rows = {(r.meter_id, r.series): r for r in latest.collect()}
    assert len(rows) == 3
    assert rows[("meters/ISK5\\2M550T-1013", "Power")].values == [pytest.approx(244.0)]
    d_t = (4211 - 3458) * 0.01
    expect_power = round(4186 * d_t * 0.6 / 3600)
    got = rows[("meters/10758808", "CalculatedPower")].values
    assert got[0] == pytest.approx(expect_power) and got[1] == pytest.approx(d_t)
    assert rows[("meters/kasa-1", "PowerEnergy")].values[0] == pytest.approx(2.414)
    # tag-as-data survives the whole path (SURVEY §7 watch-list)
    assert rows[("meters/10758808", "CalculatedPower")].tag == "W;K"
