"""S11: ZyAura CO₂ monitor HID frames
(``ZyCO2/ZGm053/ZGm053Service.cs:81-165``).

An 8-byte feature report is obfuscated with a device-key XOR, a byte
shuffle, a 3-bit rotation, and a fixed salt ("Htemp99e" nibble-swapped)
— a publicly documented scheme for these sensors. Decoded frames are
``[opcode, hi, lo, ...]``; opcode 'P' is CO₂ ppm raw, opcode 'B' is
temperature ``raw / 16 - 273.15`` K->°C.

Decrypt is a pandas UDF (byte twiddling); opcode dispatch and unit math
are column expressions (``when``/arithmetic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

SHUFFLE = (2, 4, 0, 7, 1, 6, 5, 3)
SALT = b"Htemp99e"

# The fixed key the reference service uses for this device family
# (``ZGm053Service.cs:79``). Frames captured from real hardware decode
# with THIS key; an all-zero key silently yields garbage opcodes (NULL
# series), so it is the default everywhere below.
ZG_DEFAULT_KEY = bytes((0xC4, 0xC6, 0xC0, 0x92, 0x40, 0x23, 0xDC, 0x96))

OP_CO2 = ord("P")
OP_TEMP = ord("B")
OP_HUMIDITY = ord("A")


def decrypt_frame(data: bytes, key: bytes = ZG_DEFAULT_KEY) -> bytes:
    """Inverse of the device obfuscation (``ZGm053Service.cs:81-111``):
    unshuffle+XOR, 3-bit cross-byte rotate, salt subtraction."""
    temp = bytearray(8)
    for i in range(8):
        di = SHUFFLE[i]
        temp[di] = data[i] ^ key[di]
    temp1 = bytearray(8)
    for i in range(8):
        oi = (i - 1) & 7
        temp1[i] = (((temp[i] >> 3) & 31) | (temp[oi] << 5)) & 0xFF
    ctemp = bytes(((c >> 4) & 15) | ((c << 4) & 0xFF) for c in SALT)
    return bytes((0x100 + temp1[i] - ctemp[i]) & 0xFF for i in range(8))


def encrypt_frame(plain: bytes, key: bytes = ZG_DEFAULT_KEY) -> bytes:
    """Forward obfuscation — the exact inverse of ``decrypt_frame``
    (salt addition, 3-bit cross-byte left rotate, XOR+shuffle). The
    device does this in firmware; we need it to construct wire frames
    for round-trip tests and oracle queries."""
    ctemp = bytes(((c >> 4) & 15) | ((c << 4) & 0xFF) for c in SALT)
    temp1 = [(plain[i] + ctemp[i]) & 0xFF for i in range(8)]
    temp = [
        ((temp1[i] << 3) & 0xFF) | (temp1[(i + 1) & 7] >> 5) for i in range(8)
    ]
    return bytes(temp[SHUFFLE[i]] ^ key[SHUFFLE[i]] for i in range(8))


def _frame_matrix(frames: pd.Series):
    """(n, 8) uint8 matrix of a batch of 8-byte frames, or None if any
    frame has a different length (fall back to the per-row path)."""
    import numpy as np

    if frames.empty or any(f is None or len(f) != 8 for f in frames):
        return None
    return np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(len(frames), 8)


def make_encrypt_udf(key: bytes = ZG_DEFAULT_KEY):
    @F.pandas_udf(BinaryType())
    def encrypt(frames: pd.Series) -> pd.Series:
        import numpy as np

        mat = _frame_matrix(frames)
        if mat is None:
            return frames.map(lambda b: encrypt_frame(b, key))
        ctemp = np.array(
            [((c >> 4) & 15) | ((c << 4) & 0xFF) for c in SALT], dtype=np.uint8
        )
        temp1 = mat + ctemp  # uint8 wraps mod 256
        temp = ((temp1 << 3) | (np.roll(temp1, -1, axis=1) >> 5)).astype(np.uint8)
        out = temp[:, SHUFFLE] ^ np.frombuffer(key, dtype=np.uint8)[list(SHUFFLE)]
        return pd.Series([r.tobytes() for r in out])

    return encrypt


def make_decrypt_udf(key: bytes = ZG_DEFAULT_KEY):
    @F.pandas_udf(BinaryType())
    def decrypt(frames: pd.Series) -> pd.Series:
        import numpy as np

        mat = _frame_matrix(frames)
        if mat is None:
            return frames.map(lambda b: decrypt_frame(b, key))
        kb = np.frombuffer(key, dtype=np.uint8)
        temp = np.empty_like(mat)
        temp[:, list(SHUFFLE)] = mat ^ kb[list(SHUFFLE)]
        temp1 = ((temp >> 3) | (np.roll(temp, 1, axis=1) << 5)).astype(np.uint8)
        ctemp = np.array(
            [((c >> 4) & 15) | ((c << 4) & 0xFF) for c in SALT], dtype=np.uint8
        )
        out = temp1 - ctemp  # uint8 wraps mod 256
        return pd.Series([r.tobytes() for r in out])

    return decrypt


def opcode(decoded: Column | str) -> Column:
    c = F.col(decoded) if isinstance(decoded, str) else decoded
    return F.conv(F.hex(F.substring(c, 1, 1)), 16, 10).cast("int")


def raw_value(decoded: Column | str) -> Column:
    """``(data[1] << 8) | data[2]`` big-endian raw (``:134``)."""
    c = F.col(decoded) if isinstance(decoded, str) else decoded
    return F.conv(F.hex(F.substring(c, 2, 2)), 16, 10).cast("bigint")


def parse_frames(df: DataFrame, frame_col: str = "frame", key: bytes = ZG_DEFAULT_KEY) -> DataFrame:
    """Decrypt + opcode dispatch: (series, value, unit) per frame, NULL
    series for unsupported opcodes (the reference's debug-and-skip)."""
    decoded = make_decrypt_udf(key)(F.col(frame_col))
    out = df.withColumn("decoded", decoded).withColumns(
        {"op": opcode("decoded"), "raw": raw_value("decoded")}
    )
    return out.withColumns(
        {
            "series": F.when(F.col("op") == OP_CO2, F.lit("CO2"))
            .when(F.col("op") == OP_TEMP, F.lit("RoomTemperature")),
            "value": F.when(F.col("op") == OP_CO2, F.col("raw").cast("double"))
            .when(F.col("op") == OP_TEMP, F.col("raw") / 16.0 - 273.15),
            "unit": F.when(F.col("op") == OP_CO2, F.lit("ppm"))
            .when(F.col("op") == OP_TEMP, F.lit("°C")),
        }
    )
