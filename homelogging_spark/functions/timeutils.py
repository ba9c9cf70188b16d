"""Date/time scalar utilities.

Parity targets (reference, for semantics only — see SURVEY.md §2.8):
- truncate-to-second / truncate-to-arbitrary-interval at ingest
  (``TelemetryToRaven/Meter.cs:14-21``: .NET tick modulo, i.e. floor to a
  multiple of the interval since epoch — including sub-second intervals such
  as 500 ms / 100 ms / 10 ms, tested in ``TelemetryTests/ExtensionTest.cs:9-31``)
- tumbling bucket keys for group-by (``RandomQueries/Program.cs:73``).

``date_trunc`` can't express sub-second or odd intervals, so the general
form floors epoch-millis — whole-stage-codegen arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_to_interval(ts: Column, interval_ms: int) -> Column:
    """Floor a timestamp to a multiple of ``interval_ms`` since epoch.

    Equivalent of the reference's tick-modulo truncation
    (``Meter.cs:18-21``): works for 10 ms, 500 ms, 1 s, 90 s, ... —
    anything expressible in whole milliseconds.
    """
    millis = F.unix_millis(ts)
    return F.timestamp_millis((millis - millis % interval_ms).cast("long"))


def truncate_to_seconds(ts: Column) -> Column:
    """Whole-second truncation (``Meter.cs:14-17``)."""
    return truncate_to_interval(ts, 1000)


def time_bucket(ts: Column, bucket: str) -> Column:
    """Tumbling-bucket key for group-by aggregation.

    ``bucket`` is a ``date_trunc`` unit (``hour``, ``minute``, ``day``, ...).
    For calendar units this is the idiomatic (codegen'd, pushdown-friendly)
    form; for non-calendar intervals use :func:`truncate_to_interval`.
    """
    return F.date_trunc(bucket, ts)


def in_time_of_day_period(ts: Column, on_minute: int, off_minute: int) -> Column:
    """Membership of ts's local time-of-day in [on, off) given as minutes
    since midnight; wraps past midnight when on > off
    (``Ebus/EbusThermostatSwitcher.cs:84-92`` semantics)."""
    mod = F.hour(ts) * 60 + F.minute(ts)
    wraps = on_minute > off_minute
    if wraps:
        return (mod >= F.lit(on_minute)) | (mod < F.lit(off_minute))
    return (mod >= F.lit(on_minute)) & (mod < F.lit(off_minute))
