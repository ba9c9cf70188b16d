"""S7: Kasa HS110 smart-plug protocol (``Kasa/HS110Device.cs:25-65``,
``Kasa/Extensions.cs:41-77``).

The plug speaks length-prefixed TCP with an XOR-autokey "cipher"
(initial key 171; encrypting XORs each plaintext byte into the running
key, decrypting runs the inverse) — a documented, publicly analyzed
scheme. The decrypted payload is JSON; the readings are
``power_mw / 1000`` W and ``total_wh / 1000`` kWh.

Decrypt is a byte-loop -> Arrow-batched pandas UDF; everything after is
column expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def xor_autokey_decrypt(data: bytes, key: int = 171) -> bytes:
    """Pure-python inverse autokey (``Extensions.cs:54-64``)."""
    out = bytearray(len(data))
    for i, b in enumerate(data):
        out[i] = b ^ key
        key = b
    return bytes(out)


def xor_autokey_encrypt(data: bytes, key: int = 171) -> bytes:
    """Forward autokey (``Extensions.cs:41-52``) — for round-trip tests
    and for writing commands if a connector ever needs it."""
    out = bytearray(len(data))
    for i, b in enumerate(data):
        key ^= b
        out[i] = key
    return bytes(out)


@F.pandas_udf(StringType())
def decrypt_payload(payload: pd.Series) -> pd.Series:
    return payload.map(lambda b: xor_autokey_decrypt(b).decode("utf-8", "replace"))


def parse_kasa(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """binary payload -> decrypted JSON -> power/energy readings
    (``Extensions.cs:75-77`` millis scaling)."""
    decrypted = decrypt_payload(F.col(payload_col))
    out = df.withColumn("json", decrypted)
    rt = "$.emeter.get_realtime"
    return out.withColumns(
        {
            "power_w": F.get_json_object("json", f"{rt}.power_mw").cast("double")
            / 1000.0,
            "energy_kwh": F.get_json_object("json", f"{rt}.total_wh").cast("double")
            / 1000.0,
        }
    )


def normalize_mac(mac: Column | str) -> Column:
    """J3 identity-key normalization: case/separator-insensitive MAC
    (``Tapo/TapoLogger.cs:158-161``, ``Kasa/KasaLogger.cs:114-120``)."""
    c = F.col(mac) if isinstance(mac, str) else mac
    return F.upper(F.translate(c, ":-.", ""))
