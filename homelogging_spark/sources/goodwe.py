"""S4: Goodwe solar-inverter UDP binary telemetry
(``Goodwe/GoodwePoller.cs:20-99``, ``Goodwe/Extensions.cs:19-42``,
``Goodwe/InverterTelemetry.cs:48-68``).

The inverter answers a UDP query with a fixed-layout big-endian frame:
u16/u32 fields at known offsets, scaled x0.1 / x0.01, a device-local
timestamp in packed bytes, and a trailing CRC16-Modbus (poly 0xA001,
init 0xFFFF, little-endian appended).

Field extraction stays JVM-side: ``substring`` slices the binary column
and ``conv(hex(...), 16, 10)`` reads big-endian integers — no Python in
the per-field path. Only the CRC (a bit-loop) is a pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def be_uint(payload: Column | str, offset: int, nbytes: int) -> Column:
    """Big-endian unsigned int at a 0-based byte offset, JVM-side
    (``Extensions.cs:19-26`` To16Bit/To32Bit)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.conv(F.hex(F.substring(c, offset + 1, nbytes)), 16, 10).cast("bigint")


def scaled16(payload: Column | str, offset: int, scale: float, digits: int) -> Column:
    """``Math.Round(u16 * scale, digits)`` (``Extensions.cs:28-42``)."""
    return F.round(be_uint(payload, offset, 2) * F.lit(scale), digits)


def scaled32(payload: Column | str, offset: int, scale: float, digits: int) -> Column:
    return F.round(be_uint(payload, offset, 4) * F.lit(scale), digits)


def crc16_modbus(data: bytes) -> int:
    """CRC16-Modbus (``InverterTelemetry.GoodweCrc``): init 0xFFFF,
    reflected poly 0xA001."""
    crc = 0xFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            odd = crc & 1
            crc >>= 1
            if odd:
                crc ^= 0xA001
    return crc


@F.pandas_udf(BooleanType())
def crc_ok(payload: pd.Series) -> pd.Series:
    """Frame check: last two bytes are the little-endian CRC of the rest."""

    def check(b: bytes) -> bool:
        if len(b) < 3:
            return False
        crc = crc16_modbus(b[:-2])
        return b[-2] == (crc & 0xFF) and b[-1] == (crc >> 8)

    return payload.map(check)


# Telemetry field layout for the reference's consumed series
# (``GoodweLogger.cs:74-83``): offsets into the response payload.
def parse_inverter_frame(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """CRC-gate then field extraction. Offsets follow the frame layout the
    reference decodes: Vpv/Ipv (MPPT1), Vac/Iac, grid frequency, power,
    temperature, lifetime/daily energy."""
    p = F.col(payload_col)
    return df.withColumn("crc_valid", crc_ok(p)).withColumns(
        {
            "vpv_v": scaled16(p, 7, 0.1, 1),
            "ipv_a": scaled16(p, 9, 0.1, 1),
            "vac_v": scaled16(p, 11, 0.1, 1),
            "iac_a": scaled16(p, 13, 0.1, 1),
            "grid_hz": scaled16(p, 15, 0.01, 2),
            "power_w": be_uint(p, 17, 2).cast("double"),
            "temperature_c": scaled16(p, 19, 0.1, 1),
            "energy_lifetime_kwh": scaled32(p, 21, 0.1, 1),
            "energy_today_kwh": scaled16(p, 25, 0.1, 1),
        }
    )
