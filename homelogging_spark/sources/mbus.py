"""S2: M-Bus heat-meter XML parsing (``Mbus/MbusLogger.cs:46-114``,
model ``Mbus/MBusData.cs``, sample shape ``Mbus/mbus_sample.xml``).

The meter exports ``<MBusData>`` with ``<SlaveInformation>`` (id,
manufacturer, medium) and numbered ``<DataRecord id="N">`` elements.
The reference selects records by numeric id and applies per-record scale
factors (temperatures x0.01, power x100), then derives CalculatedPower
from the thermodynamic formula ``P = 4186 * dT * (flow / 3600)``
(``MbusLogger.cs:92-93``).

Spark 4 parses the XML natively with ``from_xml`` — schema-projected,
JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MBUS_SCHEMA = StructType(
    [
        StructField(
            "SlaveInformation",
            StructType(
                [
                    StructField("Id", LongType()),
                    StructField("Manufacturer", StringType()),
                    StructField("Medium", StringType()),
                ]
            ),
        ),
        StructField(
            "DataRecord",
            ArrayType(
                StructType(
                    [
                        StructField("_id", LongType()),  # attribute
                        StructField("Function", StringType()),
                        StructField("Unit", StringType()),
                        StructField("Value", StringType()),
                        StructField("Timestamp", TimestampType()),
                    ]
                )
            ),
        ),
    ]
)

# record-id -> (series, tag, scale) table (``MbusLogger.cs:83-90``)
RECORD_MAP = {
    1: ("HeatEnergyRaw", "kWh", 1.0),
    9: ("FlowTemperature", "°C", 0.01),
    10: ("ReturnTemperature", "°C", 0.01),
    12: ("Power", "W", 100.0),
    13: ("VolumeFlow", "m³/h", 1.0),
}


def parse_mbus(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Parsed struct column + meter identity columns."""
    parsed = F.from_xml(F.col(xml_col), MBUS_SCHEMA)
    return df.withColumn("mbus", parsed).withColumns(
        {
            "meter_id": F.concat(
                F.lit("meters/"), F.col("mbus.SlaveInformation.Id").cast("string")
            ),
            "vendor_info": F.col("mbus.SlaveInformation.Manufacturer"),
            "medium": F.col("mbus.SlaveInformation.Medium"),
        }
    )


def record_value(mbus: Column, record_id: int) -> Column:
    """Numeric value of the DataRecord with the given id (the reference's
    ``records[N]`` dictionary lookup), unscaled."""
    rec = F.filter(mbus["DataRecord"], lambda r: r["_id"] == record_id)
    return F.try_element_at(rec, F.lit(1))["Value"].try_cast("double")


def mbus_series(df: DataFrame, mbus_col: str = "mbus") -> DataFrame:
    """The reference's full record->series mapping plus CalculatedPower:
    one wide row per telegram with every scaled series value."""
    m = F.col(mbus_col)
    cols = {
        name: record_value(m, rid) * F.lit(scale)
        for rid, (name, _tag, scale) in RECORD_MAP.items()
    }
    out = df.withColumns(cols)
    d_t = (record_value(m, 9) - record_value(m, 10)) * 0.01
    calc = 4186.0 * d_t * (record_value(m, 13) / 3600.0)
    return out.withColumns(
        {"delta_t_k": d_t, "calculated_power_w": F.round(calc, 0)}
    )
