"""S6: weewx weather-station HTML value parsing
(``Weewx/WeewxLogger.cs:26-104``).

The station page renders label/data cell pairs like ``("Wind",
"0.9 m/s ESE (110°)")``. The reference parses the data cell with the
regex ``(-?\\d+[.]?\\d*)\\s?(\\S+)[^(]*\\(?([^)]*)`` — group 1 the value,
group 2 the unit, group 3 a parenthesized remainder parsed *recursively*
(one extra value+unit, e.g. wind direction), units joined with ``;``.
Plain numeric cells short-circuit to (value, "") before the regex.

Re-expressed as column expressions with the recursion unrolled one level
(the observed data never nests deeper — a second value has no further
parenthesized tail). N/A and other non-numeric cells yield NULLs, the
reference's "skip item" behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALUE_REGEX = r"(-?\d+[.]?\d*)\s?(\S+)[^(]*\(?([^)]*)"


def _num(c: Column) -> Column:
    return F.when(c != "", c.cast("double"))


def parse_weather_data(data: Column | str) -> Column:
    """Struct(values: array<double>, unit: string) for one data cell,
    mirroring ``WeewxLogger.GetItem``. NULL when unparseable."""
    c = F.col(data) if isinstance(data, str) else data
    as_num = c.try_cast("double")  # TryParse short-circuit (":67")

    g1 = _num(F.regexp_extract(c, VALUE_REGEX, 1))
    g2 = F.regexp_extract(c, VALUE_REGEX, 2)
    g3 = F.regexp_extract(c, VALUE_REGEX, 3)
    # one-level recursion into the parenthesized remainder — which itself
    # TryParses first (a bare number like "(-1.7)" is value + empty unit)
    g3_num = F.trim(g3).try_cast("double")
    s1 = F.coalesce(g3_num, _num(F.regexp_extract(g3, VALUE_REGEX, 1)))
    s2 = F.when(g3_num.isNotNull(), F.lit("")).otherwise(
        F.regexp_extract(g3, VALUE_REGEX, 2)
    )

    sub_ok = (F.trim(g3) != "") & s1.isNotNull()
    values = F.when(
        sub_ok, F.array(g1, s1)
    ).otherwise(F.array(g1))
    unit = F.when(sub_ok, F.concat(g2, F.lit(";"), s2)).otherwise(g2)

    return (
        F.when(as_num.isNotNull(), F.struct(F.array(as_num).alias("values"), F.lit("").alias("unit")))
        .when(g1.isNotNull(), F.struct(values.alias("values"), unit.alias("unit")))
    )


def normalize_label(label: Column | str) -> Column:
    """Series name from the label cell: spaces removed
    (``WeewxLogger.cs:99``)."""
    c = F.col(label) if isinstance(label, str) else label
    return F.replace(c, F.lit(" "), F.lit(""))


ROW_REGEX = r"(?s)<tr[^>]*>.*?</tr>"
CELL_REGEX = r'(?s)<td[^>]*class="label"[^>]*>\s*([^<]*?)\s*</td>.*?<td[^>]*class="data"[^>]*>\s*([^<]*?)\s*</td>'
LASTUPDATE_REGEX = r'(?s)class="lastupdate"[^>]*>\s*([^<]*?)\s*<'


def extract_widget_rows(df: DataFrame, html_col: str = "html") -> DataFrame:
    """The HTML-scrape stage (``WeewxLogger.cs:26-53`` CSS-selects
    ``#current_widget tr`` label/data cell pairs): one row per widget
    table row with raw (label, data) strings plus the page's
    ``lastupdate`` cell — ``dd/MM/yy HH:mm:ss`` local, parsed with
    ``to_timestamp`` by the caller that knows its zone.

    Regex-based extraction (Spark-side, codegen'd) instead of a DOM
    parser: the widget markup is machine-generated and regular; an
    lxml/AngleSharp pass would force every page through Python.
    """
    c = F.col(html_col)
    rows = F.regexp_extract_all(c, F.lit(ROW_REGEX), F.lit(0))
    exploded = df.withColumn(
        "lastupdate_raw", F.regexp_extract(c, LASTUPDATE_REGEX, 1)
    ).select(
        "*", F.explode(rows).alias("__row")
    )
    out = exploded.withColumns(
        {
            "label": F.regexp_extract(F.col("__row"), CELL_REGEX, 1),
            "data": F.regexp_extract(F.col("__row"), CELL_REGEX, 2),
        }
    ).where(F.col("label") != "")
    return out.drop("__row")


def parse_weather_rows(df: DataFrame, label_col: str = "label", data_col: str = "data") -> DataFrame:
    """(series, values, unit) per label/data pair; unparseable rows keep
    NULL parsed fields (caller filters, as the reference skips)."""
    parsed = parse_weather_data(F.col(data_col))
    return df.select(
        normalize_label(F.col(label_col)).alias("series"),
        parsed["values"].alias("values"),
        parsed["unit"].alias("unit"),
    )
