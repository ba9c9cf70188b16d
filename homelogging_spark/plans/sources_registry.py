"""Source-parser and controller queries + oracles.

Pattern: each query CONSTRUCTS a payload in the device's wire format
from integer-derived testdata columns (deterministic in both engines),
then runs the real parser over it. The oracle rebuilds the same payload
and either parses it with the same regex (DSMR, weewx) or — where
DuckDB lacks the facility (XML, base64 decode direction) — computes the
expected output directly from the same integer inputs, making the
parse a verified round-trip.

Construction arithmetic is integer-only (floor/cast/lpad/concat) so the
payload strings are bit-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from homelogging_spark.functions.numeric import quantize, quantize_sql
from homelogging_spark.operators.controllers import flow_temp_decision, pv_mode_decision
from homelogging_spark.sources import dsmr, ebusd, kasa, mbus, tapo, weewx
from homelogging_spark.tables import load_table, spread


def _ints(df: DataFrame) -> DataFrame:
    """Deterministic small integers derived from events (identical SQL:
    see _INTS_SQL). ``spread`` parallelizes the payload construct+parse
    work across cores (single-split local input; no-op at scale)."""
    df = spread(df)
    return df.withColumns(
        {
            "iv": F.floor(F.col("value")).cast("bigint"),
            "mv": F.floor(F.col("value") * 1000).cast("bigint") % 1000,
        }
    )


_INTS_SQL = """
  SELECT *, CAST(floor(value) AS BIGINT) AS iv,
         CAST(floor(value * 1000) AS BIGINT) % 1000 AS mv
  FROM events
"""


# --- S3: DSMR telegram -------------------------------------------------------

def q_dsmr_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    telegram = F.concat(
        F.lit("/ISK5\\2M550T-"),
        F.col("user_id").cast("string"),
        F.lit("\n\n1-0:1.7.0(0"),
        F.lpad(F.col("iv").cast("string"), 4, "0"),
        F.lit("*W)\n1-0:1.8.1("),
        F.lpad(F.col("iv").cast("string"), 6, "0"),
        F.lit("."),
        F.lpad(F.col("mv").cast("string"), 3, "0"),
        F.lit("*kWh)\n!"),
    )
    parsed = dsmr.parse_telegram(
        ev.select("event_id", telegram.alias("telegram")), "telegram"
    )
    return parsed.select(
        "event_id",
        "meter_id",
        quantize(F.col("power_delivered_kw")).alias("power_delivered"),
        quantize(F.col("energy_delivered_t1_kwh")).alias("energy_t1"),
    )


_DSMR_TELEGRAM_SQL = (
    "'/ISK5\\2M550T-' || CAST(user_id AS VARCHAR) || chr(10) || chr(10) || "
    "'1-0:1.7.0(0' || lpad(CAST(iv AS VARCHAR), 4, '0') || '*W)' || chr(10) || "
    "'1-0:1.8.1(' || lpad(CAST(iv AS VARCHAR), 6, '0') || '.' || "
    "lpad(CAST(mv AS VARCHAR), 3, '0') || '*kWh)' || chr(10) || '!'"
)

ORACLE_DSMR_PARSE = f"""
WITH e AS ({_INTS_SQL}),
t AS (SELECT event_id, {_DSMR_TELEGRAM_SQL} AS telegram FROM e)
SELECT event_id,
       'meters/' || regexp_extract(telegram, '/(\\S+)', 1) AS meter_id,
       {quantize_sql(dsmr.obis_value_sql('telegram', dsmr.OBIS['power_delivered_kw']))} AS power_delivered,
       {quantize_sql(dsmr.obis_value_sql('telegram', dsmr.OBIS['energy_delivered_t1_kwh']))} AS energy_t1
FROM t
"""


# --- S6: weewx value cascade -------------------------------------------------

def q_weewx_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    wind = F.concat(
        F.col("iv").cast("string"), F.lit("."),
        (F.col("mv") % 10).cast("string"),
        F.lit(" m/s ESE ("), (F.col("iv") % 360).cast("string"), F.lit("°)"),
    )
    plain = F.concat(F.col("iv").cast("string"), F.lit("."), (F.col("mv") % 10).cast("string"))
    data = (
        F.when(F.col("user_id") % 3 == 0, wind)
        .when(F.col("user_id") % 3 == 1, plain)
        .otherwise(F.lit("N/A"))
    )
    src = ev.select("event_id", F.lit("Wind Speed").alias("label"), data.alias("data"))
    parsed = weewx.parse_weather_data(F.col("data"))
    return src.select(
        "event_id",
        weewx.normalize_label("label").alias("series"),
        F.try_element_at(parsed["values"], F.lit(1)).alias("v1"),
        F.try_element_at(parsed["values"], F.lit(2)).alias("v2"),
        parsed["unit"].alias("unit"),
    )


_WEEWX_DATA_SQL = """
CASE WHEN user_id % 3 = 0 THEN
       CAST(iv AS VARCHAR) || '.' || CAST(mv % 10 AS VARCHAR)
       || ' m/s ESE (' || CAST(iv % 360 AS VARCHAR) || '°)'
     WHEN user_id % 3 = 1 THEN CAST(iv AS VARCHAR) || '.' || CAST(mv % 10 AS VARCHAR)
     ELSE 'N/A' END
"""

_WX = r"(-?\d+[.]?\d*)\s?(\S+)[^(]*\(?([^)]*)"

ORACLE_WEEWX_PARSE = f"""
WITH e AS ({_INTS_SQL}),
d AS (SELECT event_id, {_WEEWX_DATA_SQL} AS data FROM e),
p AS (
  SELECT event_id, data,
         TRY_CAST(data AS DOUBLE) AS as_num,
         regexp_extract(data, '{_WX}', 1) AS g1,
         regexp_extract(data, '{_WX}', 2) AS g2,
         regexp_extract(data, '{_WX}', 3) AS g3
  FROM d
), s AS (
  SELECT *,
         TRY_CAST(trim(g3) AS DOUBLE) AS g3_num,
         COALESCE(TRY_CAST(trim(g3) AS DOUBLE),
                  TRY_CAST(nullif(regexp_extract(g3, '{_WX}', 1), '') AS DOUBLE)) AS s1,
         CASE WHEN TRY_CAST(trim(g3) AS DOUBLE) IS NOT NULL THEN ''
              ELSE regexp_extract(g3, '{_WX}', 2) END AS s2
  FROM p
)
SELECT event_id, 'WindSpeed' AS series,
       CASE WHEN as_num IS NOT NULL THEN as_num
            WHEN g1 != '' THEN CAST(g1 AS DOUBLE) END AS v1,
       CASE WHEN as_num IS NOT NULL THEN NULL
            WHEN g1 != '' AND trim(g3) != '' AND s1 IS NOT NULL THEN s1 END AS v2,
       CASE WHEN as_num IS NOT NULL THEN ''
            WHEN g1 != '' AND trim(g3) != '' AND s1 IS NOT NULL THEN g2 || ';' || s2
            WHEN g1 != '' THEN g2 END AS unit
FROM s
"""


# --- S2: M-Bus XML -----------------------------------------------------------

def q_mbus_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))

    def record(rid: int, value: F.Column) -> F.Column:
        return F.concat(
            F.lit(f'<DataRecord id="{rid}"><Function>Instantaneous value</Function>'
                  "<Unit>u</Unit><Value>"),
            value.cast("string"),
            F.lit("</Value></DataRecord>"),
        )

    # energy=iv kWh; flow/return temp in centi-degrees; power in centi-W;
    # volume flow integer m3/h — all integers, mirroring the meter's wire
    # units before the logger's scale factors.
    xml = F.concat(
        F.lit("<MBusData><SlaveInformation><Id>"),
        F.col("user_id").cast("string"),
        F.lit("</Id><Manufacturer>ZRI</Manufacturer><Medium>Heat</Medium></SlaveInformation>"),
        record(1, F.col("iv")),
        record(9, F.lit(4000) + F.col("mv")),
        record(10, F.lit(3000) + (F.col("mv") % 500)),
        record(12, F.col("iv") * 10),
        record(13, F.col("iv") % 10),
        F.lit("</MBusData>"),
    )
    parsed = mbus.mbus_series(
        mbus.parse_mbus(ev.select("event_id", xml.alias("xml")), "xml"), "mbus"
    )
    return parsed.select(
        "event_id",
        "meter_id",
        quantize("FlowTemperature").alias("flow_temp_c"),
        quantize("ReturnTemperature").alias("return_temp_c"),
        quantize("Power").alias("power_w"),
        quantize("delta_t_k").alias("delta_t_k"),
        quantize("calculated_power_w").alias("calculated_power_w"),
    )


ORACLE_MBUS_PARSE = f"""
WITH e AS ({_INTS_SQL}),
v AS (
  SELECT event_id, user_id,
         CAST(iv AS DOUBLE) AS r1,
         CAST(4000 + mv AS DOUBLE) AS r9,
         CAST(3000 + (mv % 500) AS DOUBLE) AS r10,
         CAST(iv * 10 AS DOUBLE) AS r12,
         CAST(iv % 10 AS DOUBLE) AS r13
  FROM e
)
SELECT event_id,
       'meters/' || CAST(user_id AS VARCHAR) AS meter_id,
       {quantize_sql('r9 * 0.01')} AS flow_temp_c,
       {quantize_sql('r10 * 0.01')} AS return_temp_c,
       {quantize_sql('r12 * 100.0')} AS power_w,
       {quantize_sql('(r9 - r10) * 0.01')} AS delta_t_k,
       {quantize_sql('round(4186.0 * ((r9 - r10) * 0.01) * (r13 / 3600.0), 0)')} AS calculated_power_w
FROM v
"""


# --- S1: ebusd JSON dot-paths + staleness ------------------------------------

EBUS_NOW = "2024-02-01 00:00:00"


def q_ebusd_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    json = F.concat(
        F.lit('{"hmu":{"messages":{"FlowTemp":{"fields":{"temp0":{"value":'),
        F.col("iv").cast("string"),
        F.lit('}},"lastup":'),
        F.unix_seconds(F.col("ts")).cast("string"),
        F.lit("}}}}"),
    )
    src = ev.select("event_id", json.alias("json"))
    path = "hmu.messages.FlowTemp"
    now = F.lit(EBUS_NOW).cast("timestamp")
    return src.select(
        "event_id",
        ebusd.get_numeric("json", f"{path}.fields.temp0.value").alias("flow_temp"),
        ebusd.lastup_timestamp("json", path).alias("event_ts"),
        ebusd.is_fresh("json", path, F.unix_seconds(now), 7 * 86400.0).alias("fresh"),
    )


ORACLE_EBUSD_PARSE = f"""
WITH e AS ({_INTS_SQL}),
j AS (
  SELECT event_id,
         '{{"hmu":{{"messages":{{"FlowTemp":{{"fields":{{"temp0":{{"value":'
         || CAST(iv AS VARCHAR) || '}}}},"lastup":'
         || CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || '}}}}}}}}' AS json
  FROM e
)
SELECT event_id,
       CAST(json_extract_string(json, '$.hmu.messages.FlowTemp.fields.temp0.value') AS DOUBLE) AS flow_temp,
       to_timestamp(CAST(json_extract_string(json, '$.hmu.messages.FlowTemp.lastup') AS DOUBLE)) AS event_ts,
       (epoch(TIMESTAMP '{EBUS_NOW}') - CAST(json_extract_string(json, '$.hmu.messages.FlowTemp.lastup') AS DOUBLE)) <= {7 * 86400.0} AS fresh
FROM j
"""


# --- S8: Tapo JSON + base64 nickname -----------------------------------------

def q_tapo_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    nick_b64 = F.base64(F.encode(F.col("event_type"), "UTF-8"))
    json = F.concat(
        F.lit('{"device_info":{"result":{"model":"P110","mac":"aa-bb-cc-'),
        F.col("user_id").cast("string"),
        F.lit('","nickname":"'),
        nick_b64,
        F.lit('"}},"energy_usage":{"result":{"current_power":'),
        F.col("iv").cast("string"),
        F.lit(',"month_energy":'),
        F.col("mv").cast("string"),
        F.lit("}}}"),
    )
    parsed = tapo.parse_tapo(ev.select("event_id", json.alias("json")), "json")
    return parsed.select(
        "event_id",
        "model",
        kasa.normalize_mac("mac").alias("mac_key"),
        "nickname",
        quantize("current_power_w").alias("current_power_w"),
        quantize("month_energy_kwh").alias("month_energy_kwh"),
    )


ORACLE_TAPO_PARSE = f"""
WITH e AS ({_INTS_SQL})
SELECT event_id,
       'P110' AS model,
       upper(replace('aa-bb-cc-' || CAST(user_id AS VARCHAR), '-', '')) AS mac_key,
       event_type AS nickname,
       {quantize_sql('CAST(iv AS DOUBLE)')} AS current_power_w,
       {quantize_sql('CAST(mv AS DOUBLE)')} AS month_energy_kwh
FROM e
"""


# --- ST5: flow-temp controller decision table --------------------------------

def q_flow_temp_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    src = ev.select(
        "event_id",
        (24.0 + (F.col("user_id") % 4).cast("double")).alias("current_min"),
        (20.0 + (F.col("iv") % 15).cast("double")).alias("actual_flow"),
        ((F.col("mv") % 32).cast("double")).alias("desired_flow"),
        ((F.col("user_id") % 25).cast("double")).alias("speed"),
    )
    decision = flow_temp_decision(
        F.col("current_min"),
        F.col("actual_flow"),
        F.col("desired_flow"),
        F.col("speed"),
        settings_min=24.0,
        settings_max=30.0,
        desired_modulation=10.0,
    )
    return src.select(
        "event_id", "current_min", "actual_flow", "desired_flow", "speed",
        quantize(decision).alias("new_min"),
    )


ORACLE_FLOW_TEMP_DECISION = f"""
WITH e AS ({_INTS_SQL}),
s AS (
  SELECT event_id,
         24.0 + CAST(user_id % 4 AS DOUBLE) AS current_min,
         20.0 + CAST(iv % 15 AS DOUBLE) AS actual_flow,
         CAST(mv % 32 AS DOUBLE) AS desired_flow,
         CAST(user_id % 25 AS DOUBLE) AS speed
  FROM e
), d AS (
  SELECT *,
         CASE WHEN current_min < 24.0 THEN 24.0
              WHEN desired_flow < 1 AND current_min > 24.0 THEN 24.0
              WHEN speed < 10.0 AND actual_flow < 30.0
                   AND actual_flow >= desired_flow AND desired_flow >= 1
                THEN desired_flow + 0.5
              WHEN speed > 15.0 AND actual_flow > 24.0
                   AND actual_flow <= desired_flow AND desired_flow <= current_min
                THEN current_min - 0.5
         END AS proposal
  FROM s
)
SELECT event_id, current_min, actual_flow, desired_flow, speed,
       CASE WHEN proposal >= 24.0 AND proposal <= 30.0
                 AND abs(proposal - current_min) >= 0.4
            THEN {quantize_sql('proposal')} END AS new_min
FROM d
"""


# --- ST7: PV bang-bang with hysteresis ---------------------------------------

def q_pv_mode_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        (F.col("value") * 20.0 - 1000.0).alias("median_power"),
        F.when(F.col("user_id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias(
            "prev_mode"
        ),
    )
    return src.select(
        "event_id",
        quantize("median_power").alias("median_power"),
        pv_mode_decision(F.col("median_power"), F.col("prev_mode")).alias("pv_mode"),
    )


ORACLE_PV_MODE_DECISION = f"""
SELECT event_id,
       {quantize_sql('(value * 20.0 - 1000.0)')} AS median_power,
       CASE WHEN (value * 20.0 - 1000.0) < -300.0 THEN 1.0
            WHEN (value * 20.0 - 1000.0) > 30.0 THEN 0.0
            ELSE CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END END AS pv_mode
FROM events
"""


SOURCES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dsmr_parse": q_dsmr_parse,
    "weewx_parse": q_weewx_parse,
    "mbus_parse": q_mbus_parse,
    "ebusd_parse": q_ebusd_parse,
    "tapo_parse": q_tapo_parse,
    "flow_temp_decision": q_flow_temp_decision,
    "pv_mode_decision": q_pv_mode_decision,
}

SOURCES_ORACLES: dict[str, str] = {
    "dsmr_parse": ORACLE_DSMR_PARSE,
    "weewx_parse": ORACLE_WEEWX_PARSE,
    "mbus_parse": ORACLE_MBUS_PARSE,
    "ebusd_parse": ORACLE_EBUSD_PARSE,
    "tapo_parse": ORACLE_TAPO_PARSE,
    "flow_temp_decision": ORACLE_FLOW_TEMP_DECISION,
    "pv_mode_decision": ORACLE_PV_MODE_DECISION,
}
