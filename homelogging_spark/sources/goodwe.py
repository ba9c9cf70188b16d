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
    reflected poly 0xA001 — table-driven (8x fewer ops than the bit
    loop; the table is shared with the column-expression variant)."""
    crc = 0xFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC16_TABLE[(crc ^ byte) & 0xFF]
    return crc


@F.pandas_udf(BooleanType())
def crc_ok(payload: pd.Series) -> pd.Series:
    """Frame check (``GoodwePoller.cs:70-80``): header must be 0xAA55 and
    the last two bytes are the little-endian CRC of everything between
    header and CRC.

    When an Arrow batch is all same-length frames (the normal case — the
    inverter's frame layout is fixed), the CRC runs vectorized across the
    batch: one numpy table-step per byte *position*, not per byte."""
    import numpy as np

    lens = payload.map(lambda b: len(b) if b is not None else -1)
    if len(payload) and lens.nunique() == 1 and lens.iloc[0] >= 5:
        mat = np.frombuffer(b"".join(payload), dtype=np.uint8).reshape(
            len(payload), lens.iloc[0]
        )
        table = np.array(_CRC16_TABLE, dtype=np.uint32)
        crc = np.full(len(payload), 0xFFFF, dtype=np.uint32)
        for j in range(2, mat.shape[1] - 2):
            crc = (crc >> 8) ^ table[(crc ^ mat[:, j]) & 0xFF]
        ok = (
            (mat[:, 0] == 0xAA)
            & (mat[:, 1] == 0x55)
            & (mat[:, -2] == (crc & 0xFF))
            & (mat[:, -1] == (crc >> 8))
        )
        return pd.Series(ok)

    def check(b: bytes) -> bool:
        if b is None or len(b) < 5 or b[0] != 0xAA or b[1] != 0x55:
            return False
        crc = crc16_modbus(b[2:-2])
        return b[-2] == (crc & 0xFF) and b[-1] == (crc >> 8)

    return payload.map(check)


def _crc16_table() -> list[int]:
    out = []
    for i in range(256):
        t = i
        for _ in range(8):
            t = (t >> 1) ^ 0xA001 if t & 1 else t >> 1
        out.append(t)
    return out


_CRC16_TABLE = _crc16_table()


def crc16_modbus_col(payload: Column | str, lo: int, hi: Column | int) -> Column:
    """CRC16-Modbus as a pure column expression: ``aggregate`` folds the
    byte positions ``[lo, hi]`` (1-based, inclusive) through the classic
    256-entry table step ``(crc >> 8) ^ table[(crc ^ byte) & 0xFF]`` —
    whole-stage-codegen JVM bytecode, no Python. (Unrolling the 8 bit
    steps instead triples the ``crc`` subtree per step — a 3^8-node
    lambda that stalls Catalyst; the table keeps the lambda O(1).)
    Used to *construct* valid frames in tests/oracle queries; at scale it
    doubles as a UDF-free alternative to ``crc_ok``."""
    c = F.col(payload) if isinstance(payload, str) else payload
    hi_col = F.lit(hi) if isinstance(hi, int) else hi
    table = F.array(*[F.lit(t) for t in _CRC16_TABLE])

    def fold(acc: Column, p: Column) -> Column:
        byte = F.conv(F.hex(c.substr(p, F.lit(1))), 16, 10).cast("int")
        idx = acc.bitwiseXOR(byte).bitwiseAND(F.lit(255)).cast("int")
        return F.shiftright(acc, 8).bitwiseXOR(F.element_at(table, idx + 1))

    return F.aggregate(F.sequence(F.lit(lo), hi_col), F.lit(0xFFFF), fold)


def crc16_modbus_hex_batch(lo: int, hi: int, width: int):
    """Arrow-batch numpy twin of :func:`crc16_modbus_col` over a
    CONSTANT-width hex string column (r21, the r20 Arrow-twin pattern):
    the expression form folds ~(hi-lo) aggregate steps with a 256-literal
    table per row — a large interpreted tree that dominates both plan
    construction and execution in the frame-SYNTHESIS paths. The table
    fold is pure integer arithmetic, so the numpy replay is bit-exact.
    ``lo``/``hi`` are the 1-based inclusive BYTE positions the expression
    form folds; ``width`` is the constant byte width of the payload.
    Returns a column function: ``crc16_modbus_hex_batch(3, 99, 99)(col)``.
    Positions are validated per batch (reshape fails loudly on a width
    drift instead of mis-folding)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("integer")
    def _crc(s: pd.Series) -> pd.Series:
        import numpy as np

        if len(s) == 0:
            return pd.Series([], dtype="int32")
        mat = np.frombuffer(
            bytes.fromhex("".join(s)), dtype=np.uint8
        ).reshape(len(s), width)
        table = np.array(_CRC16_TABLE, dtype=np.uint32)
        crc = np.full(len(s), 0xFFFF, dtype=np.uint32)
        for j in range(lo - 1, hi):
            crc = (crc >> 8) ^ table[(crc ^ mat[:, j]) & 0xFF]
        return pd.Series(crc.astype("int32"))

    return _crc


def device_timestamp(payload: Column | str) -> Column:
    """Device-local timestamp packed as bytes 5-10: (year-2000, month,
    day, hour, minute, second) — ``GoodwePoller.cs:84-86``. The inverter
    clock is local time (``DateTimeKind.Local``); callers convert with
    the site zone."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.make_timestamp(
        (be_uint(c, 5, 1) + 2000).cast("int"),
        be_uint(c, 6, 1).cast("int"),
        be_uint(c, 7, 1).cast("int"),
        be_uint(c, 8, 1).cast("int"),
        be_uint(c, 9, 1).cast("int"),
        be_uint(c, 10, 1).cast("decimal(8,6)"),
    )


# Field offsets follow the reference's frame decode exactly
# (``GoodwePoller.cs:82-97``).
def parse_inverter_frame(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Header+CRC gate, device timestamp, then field extraction: Vpv/Ipv
    (MPPT1), Vac/Iac, grid frequency, power, status, temperature,
    daily/lifetime energy."""
    p = F.col(payload_col)
    return df.withColumn("crc_valid", crc_ok(p)).withColumns(
        {
            "event_ts": device_timestamp(p),
            "vpv_v": scaled16(p, 11, 0.1, 1),
            "ipv_a": scaled16(p, 13, 0.1, 1),
            "vac_v": scaled16(p, 41, 0.1, 1),
            "iac_a": scaled16(p, 47, 0.1, 1),
            "grid_hz": scaled16(p, 53, 0.01, 2),
            "power_w": be_uint(p, 61, 2).cast("double"),
            "status": be_uint(p, 63, 1).cast("int"),
            "temperature_c": scaled16(p, 87, 0.1, 1),
            "energy_today_kwh": scaled16(p, 93, 0.1, 1),
            "energy_lifetime_kwh": scaled32(p, 95, 0.1, 1),
        }
    )
