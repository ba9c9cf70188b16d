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
from homelogging_spark.sources import (
    dsmr,
    ebusd,
    goodwe,
    kasa,
    mbus,
    sdm,
    tapo,
    vents,
    weewx,
    zyco2,
)
from homelogging_spark.sources.zyco2 import OP_CO2, OP_TEMP
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
       CAST(to_timestamp(CAST(json_extract_string(json, '$.hmu.messages.FlowTemp.lastup') AS DOUBLE)) AS TIMESTAMP) AS event_ts,
       (epoch(TIMESTAMP '{EBUS_NOW}') - CAST(json_extract_string(json, '$.hmu.messages.FlowTemp.lastup') AS DOUBLE)) <= {7 * 86400.0} AS fresh
FROM j
"""


# --- S1b: config-driven series extraction (LogItems / Registers) -------------

# Mirrors EbusMeter.LogItem rows (Path, ChildPath, TimeseriesName, Tag) —
# the reference's default config plus the State message carrying two
# series (``EbusLogger.cs:77-79`` appends Modulation AND
# ThermalEnergyToday from one message). Single-sourced: the Spark query
# builds its config dim from this tuple and the oracle inlines the same
# rows as a VALUES table.
_LOG_ITEMS = (
    ("hmu.messages.FlowTemp", "fields.temp0.value", "FlowTemperature", "°C"),
    ("hmu.messages.ReturnTemp", "fields.temp0.value", "ReturnTemperature", "°C"),
    ("hmu.messages.State", "fields.modulation.value", "Modulation", "%"),
    ("hmu.messages.State", "fields.energy.value", "ThermalEnergyToday", "*100W"),
)


def q_config_driven_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.10: the reference is DRIVEN by per-meter config tables —
    ``EbusMeter.LogItems`` / ``SdmMeter.Registers`` rows decide which
    series get extracted, not code. This query holds the config in a dim
    table, reads it ONCE at plan-build time (O(10) rows of metadata, the
    batch analog of the reference loading the meter document before its
    foreach — ``EbusLogger.cs:89-110``), and generates the extraction
    expressions from it: config row → column exprs → series output.

    The generated plan is a SINGLE scan of the payload with an inline
    projection (see ``ebusd.log_items_series``) — adding a config row
    adds zero scans. The plan-build ``collect()`` is metadata, not a
    data-path action: it never touches the events table."""
    ev = _ints(load_table(spark, sf_dir, "events"))
    ep = F.unix_seconds(F.col("ts"))
    json = F.concat(
        F.lit('{"hmu":{"messages":{"FlowTemp":{"fields":{"temp0":{"value":'),
        F.col("iv").cast("string"),
        F.lit('}},"lastup":'),
        ep.cast("string"),
        F.lit('},"ReturnTemp":{"fields":{"temp0":{"value":'),
        (F.col("iv") - 5).cast("string"),
        F.lit('}},"lastup":'),
        (ep + 60).cast("string"),
        F.lit('},"State":{"fields":{"modulation":{"value":'),
        (F.col("mv") % 100).cast("string"),
        F.lit('},"energy":{"value":'),
        F.col("mv").cast("string"),
        F.lit('}},"lastup":'),
        (ep + 120).cast("string"),
        F.lit("}}}}"),
    )
    src = ev.select("event_id", json.alias("json"))
    config = spark.createDataFrame(
        list(_LOG_ITEMS), "path string, child_path string, series string, tag string"
    )
    items = [
        (r.path, r.child_path, r.series, r.tag) for r in config.collect()
    ]
    return ebusd.log_items_series(src, "json", items)


_LOG_ITEMS_VALUES = ",\n  ".join(
    "('{}', '{}', '{}', '{}')".format(*row) for row in _LOG_ITEMS
)

_CONFIG_JSON_SQL = (
    """'{"hmu":{"messages":{"FlowTemp":{"fields":{"temp0":{"value":'"""
    """ || CAST(iv AS VARCHAR)"""
    """ || '}},"lastup":' || CAST(ep AS VARCHAR)"""
    """ || '},"ReturnTemp":{"fields":{"temp0":{"value":'"""
    """ || CAST(iv - 5 AS VARCHAR)"""
    """ || '}},"lastup":' || CAST(ep + 60 AS VARCHAR)"""
    """ || '},"State":{"fields":{"modulation":{"value":'"""
    """ || CAST(mv % 100 AS VARCHAR)"""
    """ || '},"energy":{"value":' || CAST(mv AS VARCHAR)"""
    """ || '}},"lastup":' || CAST(ep + 120 AS VARCHAR)"""
    """ || '}}}}'"""
)

ORACLE_CONFIG_DRIVEN_SERIES = f"""
WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM ({_INTS_SQL})),
j AS (SELECT event_id, {_CONFIG_JSON_SQL} AS json FROM e),
cfg AS (SELECT * FROM (VALUES
  {_LOG_ITEMS_VALUES}) AS t(path, child_path, series, tag))
SELECT j.event_id, cfg.series, cfg.tag,
       CAST(json_extract_string(j.json, '$.' || cfg.path || '.' || cfg.child_path) AS DOUBLE) AS value,
       CAST(to_timestamp(CAST(json_extract_string(j.json, '$.' || cfg.path || '.lastup') AS DOUBLE)) AS TIMESTAMP) AS event_ts
FROM j CROSS JOIN cfg
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


# (The retired single-controller oracles were folded verbatim into
# ORACLE_CONTROLLER_PANEL below — one live copy, no drift surface.)


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


# --- ST5 + ST7: controller decision panel (r10 window consolidation) ---------

def q_controller_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both per-row controller decision tables on ONE normalized panel —
    the r10 window consolidation funding the ``doc_upsert`` (K2)
    registration. Every output column of the former ``flow_temp_decision``
    and ``pv_mode_decision`` driver queries appears verbatim in the
    (controller, event_id, c1..c4, decision) layout, so this one row set
    certifies BOTH decision tables (ST5 ``HeatingLogging/Program.cs``
    flow-temp hysteresis incl. the deadband/validity gates; ST7 Kasa PV
    bang-bang) at full per-row fidelity; the retired single-controller
    queries remain as the helper functions above."""
    null_d = F.lit(None).cast("double")
    ft = q_flow_temp_decision(spark, sf_dir).select(
        F.lit("flow_temp").alias("controller"),
        "event_id",
        F.col("current_min").alias("c1"),
        F.col("actual_flow").alias("c2"),
        F.col("desired_flow").alias("c3"),
        F.col("speed").alias("c4"),
        F.col("new_min").alias("decision"),
    )
    pv = q_pv_mode_decision(spark, sf_dir).select(
        F.lit("pv_mode").alias("controller"),
        "event_id",
        F.col("median_power").alias("c1"),
        null_d.alias("c2"),
        null_d.alias("c3"),
        null_d.alias("c4"),
        F.col("pv_mode").alias("decision"),
    )
    return ft.unionByName(pv)


ORACLE_CONTROLLER_PANEL = f"""
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
SELECT 'flow_temp' AS controller, event_id,
       current_min AS c1, actual_flow AS c2, desired_flow AS c3, speed AS c4,
       CASE WHEN proposal >= 24.0 AND proposal <= 30.0
                 AND abs(proposal - current_min) >= 0.4
            THEN {quantize_sql('proposal')} END AS decision
FROM d
UNION ALL
SELECT 'pv_mode', event_id,
       {quantize_sql('(value * 20.0 - 1000.0)')},
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CASE WHEN (value * 20.0 - 1000.0) < -300.0 THEN 1.0
            WHEN (value * 20.0 - 1000.0) > 30.0 THEN 0.0
            ELSE CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END END
FROM events
"""


# --- binary-frame sources (S4/S5/S7/S9/S11) ----------------------------------
#
# Same construct-then-parse pattern as the text sources: the query builds
# the device's wire frame from integer-derived columns (hex-string concat
# -> unhex, all JVM-side), runs the REAL parser — CRC/checksum gates,
# decrypt UDFs, IEEE-754 reassembly included — and the oracle computes
# the expected readings directly from the same integers. A hash match
# therefore proves the parser exactly inverts the construction.


def _hexn(c: F.Column, n: int) -> F.Column:
    """Fixed-width lowercase hex of a non-negative integer column."""
    return F.lpad(F.lower(F.hex(c)), n, "0")


# --- S5: SDM Modbus u16-pair -> float32 --------------------------------------

def q_sdm_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register pairs constructed so the u32 is a *normal* float32
    (exponent byte in [117, 137]) — its exact value is then representable
    in double on both engines, so even the bit-reinterpretation step
    hash-matches (``SdmLogger.cs:90-94`` semantics)."""
    ev = _ints(load_table(spark, sf_dir, "events"))
    src = ev.select(
        "event_id",
        (F.col("iv") % 2).alias("sign"),
        (F.lit(117) + F.col("mv") % 21).alias("expb"),
        (F.col("iv") % 128).alias("m_hi7"),
        ((F.col("iv") * 131 + F.col("mv") * 17) % 65536).alias("lo"),
    ).withColumn(
        "hi", F.col("sign") * 32768 + F.col("expb") * 128 + F.col("m_hi7")
    )
    out = sdm.parse_registers(
        src, {"power_w": ("hi", "lo", 0.0), "voltage_v": ("hi", "lo", 1.5)}
    )
    return out.select(
        "event_id",
        quantize("power_w").alias("power_w"),
        quantize("voltage_v").alias("voltage_v"),
    )


def _pow2_case(expr: str) -> str:
    """2.0^(expb-127) as literal doubles (exact; no cross-engine pow)."""
    whens = " ".join(
        f"WHEN {e} THEN {2.0 ** (e - 127)!r}" for e in range(117, 138)
    )
    return f"(CASE {expr} {whens} END)"


ORACLE_SDM_PARSE = f"""
WITH e AS ({_INTS_SQL}),
r AS (SELECT event_id, iv % 2 AS sign, 117 + mv % 21 AS expb, iv % 128 AS m_hi7,
             (iv * 131 + mv * 17) % 65536 AS lo
      FROM e),
v AS (SELECT event_id,
             (CASE WHEN sign = 1 THEN -1.0 ELSE 1.0 END)
             * (1.0 + (m_hi7 * 65536 + lo) / 8388608.0)
             * {_pow2_case('expb')} AS val
      FROM r)
SELECT event_id,
       {quantize_sql('round(val, 4)')} AS power_w,
       {quantize_sql('round(val, 4) + 1.5')} AS voltage_v
FROM v
"""


# --- S7: Kasa XOR-autokey TCP payload ----------------------------------------

def q_kasa_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encrypt the plug's JSON with the real forward autokey, decrypt
    with the real parser (pandas-UDF path), and additionally prove the
    JVM-expression decode path returns the identical plaintext."""
    ev = _ints(load_table(spark, sf_dir, "events"))
    plain = F.concat(
        F.lit('{"emeter":{"get_realtime":{"power_mw":'),
        F.col("iv").cast("string"),
        F.lit(',"total_wh":'),
        F.col("mv").cast("string"),
        F.lit("}}}"),
    )
    src = ev.select("event_id", plain.alias("plain")).withColumn(
        "payload", kasa.encrypt_payload(F.encode(F.col("plain"), "UTF-8"))
    )
    parsed = kasa.parse_kasa(src, "payload")
    return parsed.select(
        "event_id",
        quantize("power_w").alias("power_w"),
        quantize("energy_kwh").alias("energy_kwh"),
        (kasa.decrypt_payload_expr("payload") == F.col("plain")).alias(
            "expr_decode_ok"
        ),
    )


ORACLE_KASA_PARSE = f"""
WITH e AS ({_INTS_SQL})
SELECT event_id,
       {quantize_sql('iv / 1000.0')} AS power_w,
       {quantize_sql('mv / 1000.0')} AS energy_kwh,
       TRUE AS expr_decode_ok
FROM e
"""


# --- S4: Goodwe UDP inverter frame -------------------------------------------

def q_goodwe_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 101-byte frame: AA55 header, packed device-local timestamp,
    big-endian fields at the reference offsets, trailing CRC16-Modbus
    computed by the column-expression CRC — then parsed by the real
    header+CRC-gated parser."""
    ev = _ints(load_table(spark, sf_dir, "events"))
    iv, mv = F.col("iv"), F.col("mv")

    def b(c: F.Column) -> F.Column:
        return _hexn(c, 2)

    def w(c: F.Column) -> F.Column:
        return _hexn(c, 4)

    head_hex = F.concat(
        F.lit("aa55" + "00" * 3),
        b(F.lit(24)), b(iv % 12 + 1), b(mv % 28 + 1),
        b(iv % 24), b(mv % 60), b((iv + mv) % 60),
        w((iv * 30 + mv) % 5000),            # vpv   @11
        w(mv % 200),                         # ipv   @13
        F.lit("00" * 26),
        w(iv % 300 + 2200),                  # vac   @41
        F.lit("00" * 4),
        w((iv + mv) % 300),                  # iac   @47
        F.lit("00" * 4),
        w(mv % 100 + 4950),                  # hz    @53
        F.lit("00" * 6),
        w((iv * 13 + mv * 7) % 10000),       # power @61
        b(iv % 4),                           # status @63
        F.lit("00" * 23),
        w(mv % 500 + 200),                   # temp  @87
        F.lit("00" * 4),
        w(mv % 1000),                        # etoday @93
        _hexn((iv % 100) * 100000 + mv, 8),  # elifetime @95
    )
    # materialize head+crc as named columns so the CRC is planned once,
    # not inlined into both checksum bytes. r21: the synthesis-side CRC
    # runs as the Arrow-batch numpy twin (bit-exact integer table fold;
    # guide §4) — the 97-step aggregate expression dominated this
    # query's plan construction AND execution; the PARSER's gate
    # (crc_ok, the certified feature) is untouched.
    src = ev.select("event_id", head_hex.alias("hh")).withColumn(
        "crc", goodwe.crc16_modbus_hex_batch(3, 99, 99)(F.col("hh"))
    )
    crc = F.col("crc")
    frame = F.unhex(
        F.concat(F.col("hh"), b(crc.bitwiseAND(F.lit(255))), b(F.shiftright(crc, 8)))
    )
    parsed = goodwe.parse_inverter_frame(
        src.select("event_id", frame.alias("payload")), "payload"
    )
    return parsed.select(
        "event_id",
        "crc_valid",
        "event_ts",
        quantize("vpv_v").alias("vpv_v"),
        quantize("iac_a").alias("iac_a"),
        quantize("grid_hz").alias("grid_hz"),
        quantize("power_w").alias("power_w"),
        F.col("status").cast("bigint").alias("status"),
        quantize("temperature_c").alias("temperature_c"),
        quantize("energy_lifetime_kwh").alias("energy_lifetime_kwh"),
    )


ORACLE_GOODWE_PARSE = f"""
WITH e AS ({_INTS_SQL}),
f AS (SELECT event_id,
             iv % 12 + 1 AS mo, mv % 28 + 1 AS dy,
             iv % 24 AS hh, mv % 60 AS mi, (iv + mv) % 60 AS ss,
             (iv * 30 + mv) % 5000 AS vpv, (iv + mv) % 300 AS iac,
             mv % 100 + 4950 AS hz, (iv * 13 + mv * 7) % 10000 AS pw,
             iv % 4 AS st, mv % 500 + 200 AS tp,
             (iv % 100) * 100000 + mv AS el
      FROM e)
SELECT event_id,
       TRUE AS crc_valid,
       make_timestamp(2024, mo, dy, hh, mi, CAST(ss AS DOUBLE)) AS event_ts,
       {quantize_sql('round(vpv * 0.1, 1)')} AS vpv_v,
       {quantize_sql('round(iac * 0.1, 1)')} AS iac_a,
       {quantize_sql('round(hz * 0.01, 2)')} AS grid_hz,
       {quantize_sql('CAST(pw AS DOUBLE)')} AS power_w,
       CAST(st AS BIGINT) AS status,
       {quantize_sql('round(tp * 0.1, 1)')} AS temperature_c,
       {quantize_sql('round(el * 0.1, 1)')} AS energy_lifetime_kwh
FROM f
"""


# --- S9: Vents item decode + frame checksum ----------------------------------

def q_vents_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ints(load_table(spark, sf_dir, "events"))
    iv, mv = F.col("iv"), F.col("mv")
    raw = (iv * 100 + mv) % 4000 - 2000
    u16 = ((raw + 65536) % 65536).cast("int")
    temp_payload = F.unhex(
        F.concat(_hexn(u16.bitwiseAND(F.lit(255)), 2), _hexn(F.shiftright(u16, 8), 2))
    )
    b1, b2, b3, b4 = iv % 256, mv % 256, (iv * 7) % 256, (mv * 3) % 256
    s = (b1 + b2 + b3 + b4).cast("int")
    body_hex = F.concat(_hexn(b1, 2), _hexn(b2, 2), _hexn(b3, 2), _hexn(b4, 2))
    ck = lambda t: F.concat(  # noqa: E731
        _hexn(t.bitwiseAND(F.lit(255)), 2), _hexn(F.shiftright(t, 8), 2)
    )
    good = F.unhex(F.concat(F.lit("fdfd"), body_hex, ck(s)))
    bad = F.unhex(F.concat(F.lit("fdfd"), body_hex, ck(((s + 1) % 65536).cast("int"))))
    src = ev.select(
        "event_id",
        temp_payload.alias("pt"),
        F.unhex(_hexn(iv % 2, 2)).alias("pb"),
        F.unhex(_hexn(mv % 256, 2)).alias("py"),
        good.alias("good_frame"),
        bad.alias("bad_frame"),
    )
    return src.select(
        "event_id",
        quantize(vents.item_temperature("pt")).alias("temp_c"),
        vents.item_bool("pb").alias("on"),
        vents.item_byte("py").cast("bigint").alias("speed"),
        vents.frame_checksum_ok("good_frame").alias("ck_ok"),
        vents.frame_checksum_ok("bad_frame").alias("ck_bad"),
    )


ORACLE_VENTS_PARSE = f"""
WITH e AS ({_INTS_SQL})
SELECT event_id,
       {quantize_sql('((iv * 100 + mv) % 4000 - 2000) / 10.0')} AS temp_c,
       (iv % 2) != 0 AS on,
       CAST(mv % 256 AS BIGINT) AS speed,
       TRUE AS ck_ok,
       FALSE AS ck_bad
FROM e
"""


# --- S11: ZyAura obfuscated HID frame ----------------------------------------

def q_zyco2_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain opcode frames (CO₂ on even events, temperature on odd) run
    through the real forward obfuscation, then the real decrypt + opcode
    dispatch."""
    ev = _ints(load_table(spark, sf_dir, "events"))
    iv, mv = F.col("iv"), F.col("mv")
    even = F.col("event_id") % 2 == 0
    op = F.when(even, F.lit(OP_CO2)).otherwise(F.lit(OP_TEMP))
    raw = F.when(even, (iv * 3 + mv) % 1600 + 400).otherwise(mv % 2000 + 4000).cast(
        "int"
    )
    hi, lo = F.shiftright(raw, 8), raw.bitwiseAND(F.lit(255))
    cs = (op + hi + lo).cast("int").bitwiseAND(F.lit(255))
    plain = F.unhex(
        F.concat(_hexn(op, 2), _hexn(hi, 2), _hexn(lo, 2), _hexn(cs, 2), F.lit("0d000000"))
    )
    src = ev.select("event_id", zyco2.make_encrypt_udf()(plain).alias("frame"))
    parsed = zyco2.parse_frames(src, "frame")
    return parsed.select(
        "event_id", "series", quantize("value").alias("value"), "unit"
    )


ORACLE_ZYCO2_PARSE = f"""
WITH e AS ({_INTS_SQL})
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN 'CO2' ELSE 'RoomTemperature' END AS series,
       CASE WHEN event_id % 2 = 0
            THEN {quantize_sql('CAST((iv * 3 + mv) % 1600 + 400 AS DOUBLE)')}
            ELSE {quantize_sql('(mv % 2000 + 4000) / 16.0 - 273.15')} END AS value,
       CASE WHEN event_id % 2 = 0 THEN 'ppm' ELSE '°C' END AS unit
FROM e
"""


SOURCES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dsmr_parse": q_dsmr_parse,
    "weewx_parse": q_weewx_parse,
    "mbus_parse": q_mbus_parse,
    "ebusd_parse": q_ebusd_parse,
    "config_driven_series": q_config_driven_series,
    "tapo_parse": q_tapo_parse,
    "sdm_parse": q_sdm_parse,
    "kasa_parse": q_kasa_parse,
    "goodwe_parse": q_goodwe_parse,
    "vents_parse": q_vents_parse,
    "zyco2_parse": q_zyco2_parse,
    "controller_panel": q_controller_panel,
}

SOURCES_ORACLES: dict[str, str] = {
    "dsmr_parse": ORACLE_DSMR_PARSE,
    "weewx_parse": ORACLE_WEEWX_PARSE,
    "mbus_parse": ORACLE_MBUS_PARSE,
    "ebusd_parse": ORACLE_EBUSD_PARSE,
    "config_driven_series": ORACLE_CONFIG_DRIVEN_SERIES,
    "tapo_parse": ORACLE_TAPO_PARSE,
    "sdm_parse": ORACLE_SDM_PARSE,
    "kasa_parse": ORACLE_KASA_PARSE,
    "goodwe_parse": ORACLE_GOODWE_PARSE,
    "vents_parse": ORACLE_VENTS_PARSE,
    "zyco2_parse": ORACLE_ZYCO2_PARSE,
    "controller_panel": ORACLE_CONTROLLER_PANEL,
}
