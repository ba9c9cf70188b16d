"""S3: DSMR P1 smart-meter telegram parsing (``P1/P1Logger.cs:19-93``,
sample format ``P1/p1sample.txt``).

A telegram is a text frame between ``/`` and ``!``: a header line
``/<identification>`` then one OBIS line per measurement, e.g.::

    1-0:1.7.0(00.244*kW)      actual power delivered
    1-0:1.8.1(000004.426*kWh) energy delivered tariff 1

The reference delegates to a parser library; the grammar itself is the
public DSMR standard. Here each OBIS code is one ``regexp_extract`` —
pure column expressions, map-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# OBIS codes used by the reference's telegram consumption
# (``P1/P1Logger.cs:131-156`` series mapping).
OBIS = {
    "power_delivered_kw": "1-0:1.7.0",
    "power_returned_kw": "1-0:2.7.0",
    "energy_delivered_t1_kwh": "1-0:1.8.1",
    "energy_delivered_t2_kwh": "1-0:1.8.2",
    "energy_returned_t1_kwh": "1-0:2.8.1",
    "energy_returned_t2_kwh": "1-0:2.8.2",
    "voltage_l1_v": "1-0:32.7.0",
    "voltage_l2_v": "1-0:52.7.0",
    "voltage_l3_v": "1-0:72.7.0",
    "current_l1_a": "1-0:31.7.0",
    "current_l2_a": "1-0:51.7.0",
    "current_l3_a": "1-0:71.7.0",
}


def obis_pattern(code: str) -> str:
    """Regex for one OBIS line: numeric value, optional ``*unit`` suffix.
    Escapes the dots in the code (they are literal in OBIS)."""
    return code.replace(".", "[.]").replace(":", ":") + r"\(([-0-9.]+)\*?[^)]*\)"


def obis_value(telegram: Column | str, code: str) -> Column:
    """Extract one OBIS measurement as double (NULL when absent —
    telegrams vary by meter generation)."""
    c = F.col(telegram) if isinstance(telegram, str) else telegram
    extracted = F.regexp_extract(c, obis_pattern(code), 1)
    return F.when(extracted != "", extracted.cast("double"))


def obis_value_sql(expr: str, code: str) -> str:
    """DuckDB twin of ``obis_value`` (same regex, same cast)."""
    pat = obis_pattern(code)
    return (
        f"CASE WHEN regexp_extract({expr}, '{pat}', 1) != '' "
        f"THEN CAST(regexp_extract({expr}, '{pat}', 1) AS DOUBLE) END"
    )


def identification(telegram: Column | str) -> Column:
    """Meter identification from the ``/`` header line (doc id source:
    ``meters/<identification>``, ``P1/P1Logger.cs:98``)."""
    c = F.col(telegram) if isinstance(telegram, str) else telegram
    return F.regexp_extract(c, r"/(\S+)", 1)


def parse_telegram(df: DataFrame, telegram_col: str = "telegram") -> DataFrame:
    """All reference-consumed OBIS fields + derived series columns:
    net power in W (``1000 * (delivered - returned)``) and the
    EnergyCounters 4-vector (``P1/P1Logger.cs:131-156``)."""
    fields = {name: obis_value(telegram_col, code) for name, code in OBIS.items()}
    out = df.withColumns(fields)
    return out.withColumns(
        {
            "meter_id": F.concat(F.lit("meters/"), identification(F.col(telegram_col))),
            "power_w": 1000.0
            * (F.col("power_delivered_kw") - F.col("power_returned_kw")),
            "energy_counters": F.array(
                "energy_delivered_t1_kwh",
                "energy_delivered_t2_kwh",
                "energy_returned_t1_kwh",
                "energy_returned_t2_kwh",
            ),
        }
    )
