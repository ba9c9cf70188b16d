"""S9: Vents Micra ventilation-unit item decoding
(``Vents/Device.cs:34-161``, ``Vents/ItemDictionaryExtensions.cs:8-26``).

The unit answers page/item requests with per-item byte payloads: 1-byte
booleans and bytes, and little-endian signed int16 values scaled /10
(temperatures). Items arrive as (item_address, payload) rows; decoding
is pure column expressions over the binary payload — the protocol's
framing/checksum lives in the connector, out of batch scope.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _byte_at(payload: Column, pos: int) -> Column:
    return F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("int")


def item_bool(payload: Column | str) -> Column:
    """1-byte item -> boolean (``ItemDictionaryExtensions.cs:8-13``)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.when(F.length(c) == 1, _byte_at(c, 1) != 0)


def item_byte(payload: Column | str) -> Column:
    """1-byte item -> unsigned byte (``:21-26``)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.when(F.length(c) == 1, _byte_at(c, 1))


def item_temperature(payload: Column | str) -> Column:
    """2-byte item -> little-endian signed int16 / 10.0 (``:15-20``,
    ``BitConverter.ToInt16`` on little-endian hosts)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    raw = _byte_at(c, 1) + _byte_at(c, 2) * 256  # little-endian
    signed = F.when(raw >= 32768, raw - 65536).otherwise(raw)
    return F.when(F.length(c) == 2, signed / 10.0)


def frame_checksum_ok(frame: Column | str) -> Column:
    """Protocol frame check (``Vents/Device.cs:131-143``): the trailing
    two bytes are the little-endian 16-bit sum of the frame body (bytes
    after the 2-byte preamble, before the checksum). Pure column
    arithmetic via an unrolled byte fold — no UDF.

    Note: Spark lacks a per-byte fold over binary without exploding, so
    this uses aggregate over a position sequence — still JVM-side.
    """
    c = F.col(frame) if isinstance(frame, str) else frame
    body_len = F.length(c) - 4  # minus preamble and checksum
    positions = F.sequence(F.lit(3), F.length(c) - 2)  # 1-based body span
    sum16 = F.aggregate(
        positions,
        F.lit(0),
        lambda acc, p: acc + F.conv(F.hex(F.substring(c, p, 1)), 16, 10).cast("int"),
    ) % 65536
    stored = (
        F.conv(F.hex(F.substring(c, F.length(c) - 1, 1)), 16, 10).cast("int")
        + F.conv(F.hex(F.substring(c, F.length(c), 1)), 16, 10).cast("int") * 256
    )
    return F.when(body_len > 0, sum16 == stored)
