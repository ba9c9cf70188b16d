"""S5: Eastron SDM Modbus energy-meter reads (``Sdm/SdmLogger.cs:79-98``).

Each measurement is two 16-bit input registers reassembled into an
IEEE-754 float32 (``data[0] << 16 | data[1]``, ``:90-94``), rounded to 4
digits, plus a per-register configured offset. The register list itself
is configuration (``SdmMeter.Registers`` — config-driven scan
definition), which here is just a mapping the caller applies.

Bit-reinterpretation (u32 -> float32) has no JVM column expression, so
it is the one pandas-UDF step; rounding and offsets are built-ins.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def u16_pair_to_float(hi: int, lo: int) -> float:
    """``BitConverter.Int32BitsToSingle(hi << 16 | lo)``."""
    return struct.unpack(">f", struct.pack(">I", ((hi & 0xFFFF) << 16) | (lo & 0xFFFF)))[0]


@F.pandas_udf(DoubleType())
def registers_to_float(hi: pd.Series, lo: pd.Series) -> pd.Series:
    """Vectorized over the Arrow batch: build the u32 words in numpy and
    bit-reinterpret the whole array (``view(float32)``) — identical
    bits to per-row ``struct.unpack``, no Python loop."""
    import numpy as np

    mask = hi.isna() | lo.isna()
    h = hi.fillna(0).to_numpy(dtype="int64")
    l = lo.fillna(0).to_numpy(dtype="int64")
    u32 = (((h & 0xFFFF) << 16) | (l & 0xFFFF)).astype(np.uint32)
    vals = pd.Series(u32.view(np.float32).astype(np.float64))
    return vals.mask(mask.to_numpy())


def sdm_value(hi: Column | str, lo: Column | str, offset: float = 0.0) -> Column:
    """``round(float32(hi, lo), 4) + offset`` (``SdmLogger.cs:91-94``)."""
    h = F.col(hi) if isinstance(hi, str) else hi
    l = F.col(lo) if isinstance(lo, str) else lo
    return F.round(registers_to_float(h, l), 4) + F.lit(offset)


def parse_registers(
    df: DataFrame,
    register_map: dict[str, tuple[str, str, float]],
) -> DataFrame:
    """Apply a config-driven register map: series name ->
    (hi_col, lo_col, offset) — the ``SdmMeter.Registers`` analog."""
    return df.withColumns(
        {name: sdm_value(hi, lo, off) for name, (hi, lo, off) in register_map.items()}
    )
