"""S8: Tapo smart-plug JSON parsing (``Tapo/TapoLogger.cs:163-173,
221-249``; fixture shape ``TelemetryTests/tapo.json``).

The poll helper emits ``{device_info: {result: {...}}, energy_usage:
{result: {current_power, month_energy}}}``. The nickname is
base64-encoded UTF-8 (``TapoLogger.cs:238-246``). Missing energy fields
map to NaN in the reference; here they stay NULL (Spark-idiomatic
missingness — coalesce to NaN only where C# parity matters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELDS = {
    "model": "$.device_info.result.model",
    "ip": "$.device_info.result.ip",
    "mac": "$.device_info.result.mac",
    "nickname_raw": "$.device_info.result.nickname",
    "current_power_w": "$.energy_usage.result.current_power",
    "month_energy_kwh": "$.energy_usage.result.month_energy",
}


def decode_nickname(raw: Column | str) -> Column:
    """Base64 -> UTF-8 nickname (``TapoLogger.cs:238-246``)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    return F.decode(F.unbase64(c), "UTF-8")


def parse_tapo(df: DataFrame, json_col: str = "json") -> DataFrame:
    cols = {
        name: F.get_json_object(F.col(json_col), path) for name, path in FIELDS.items()
    }
    out = df.withColumns(cols)
    return out.withColumns(
        {
            "current_power_w": F.col("current_power_w").cast("double"),
            "month_energy_kwh": F.col("month_energy_kwh").cast("double"),
            "nickname": decode_nickname(F.col("nickname_raw")),
        }
    )
