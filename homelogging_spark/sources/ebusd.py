"""S1: ebusd heat-pump JSON polling (``Ebus/EbusLogger.cs:49-124``).

ebusd serves a JSON tree; the reference walks config-driven dot-paths
(``GetChild``, ``:113-119``), reads the value at ``<path>.<child_path>``
and the epoch-seconds staleness stamp at ``<path>.lastup`` (``:121-124``),
and applies a per-item ``maxage`` freshness budget when re-fetching
(``:92``).

Batch mapping: dot-path -> ``get_json_object`` JSONPath; ``lastup`` ->
``timestamp_seconds``; maxage -> a freshness predicate relative to a
reference 'now' (the poll time).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_path(dot_path: str) -> str:
    """``hmu.messages.FlowTemp.fields.temp0.value`` -> JSONPath."""
    return "$." + dot_path


def get_path(json: Column | str, dot_path: str) -> Column:
    """String value at a dot-path (NULL when absent, like ``GetChild``)."""
    c = F.col(json) if isinstance(json, str) else json
    return F.get_json_object(c, json_path(dot_path))


def get_numeric(json: Column | str, dot_path: str) -> Column:
    return get_path(json, dot_path).cast("double")


def lastup_timestamp(json: Column | str, message_path: str) -> Column:
    """Event time from the message's ``lastup`` epoch-seconds field
    (``EbusLogger.cs:121-124``) — device-supplied, not arrival time."""
    return F.timestamp_seconds(
        get_path(json, f"{message_path}.lastup").cast("double")
    )


def is_fresh(
    json: Column | str, message_path: str, now: Column, maxage_seconds: float
) -> Column:
    """The maxage staleness gate: the reference requests
    ``maxage = 0.8 * read_interval`` from ebusd (``EbusLogger.cs:92``);
    the batch analog drops rows whose lastup is older than that budget."""
    age = now.cast("double") - get_path(json, f"{message_path}.lastup").cast("double")
    return age <= F.lit(maxage_seconds)
