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


def log_items_series(
    df,
    json_col: str,
    items,
    id_cols: tuple[str, ...] = ("event_id",),
):
    """Config-driven series extraction: the reference's ``LogItems`` /
    ``Registers`` pattern, where a per-meter CONFIG table — not code —
    decides which series get extracted (``Ebus/EbusMeter.cs:23-30``
    ``LogItem {Path, ChildPath, TimeseriesName, Tag, ReadInterval}``,
    applied by the foreach at ``Ebus/EbusLogger.cs:89-110``; same shape
    as ``Sdm/SdmLogger.cs:112-117`` ``RegisterDefinition``).

    Each config row ``(path, child_path, series, tag)`` GENERATES the
    extraction expressions for one output series; the generated structs
    are assembled into ONE inline projection, so the whole config
    extracts in a single scan of the payload — no per-item self-union,
    no shuffle, stays inside whole-stage codegen.

    ``items`` is the deserialized config: plan-build-time METADATA
    (O(10) rows — the reference loads it once from the meter document
    before its foreach), not a per-row data path. Callers holding the
    config in a dim table collect it once at plan construction; see
    ``plans/sources_registry.q_config_driven_series``."""
    entries = [
        F.struct(
            F.lit(series).alias("series"),
            F.lit(tag).alias("tag"),
            get_numeric(json_col, f"{path}.{child_path}").alias("value"),
            lastup_timestamp(json_col, path).alias("event_ts"),
        )
        for path, child_path, series, tag in items
    ]
    return df.select(*id_cols, F.inline(F.array(*entries)))


def is_fresh(
    json: Column | str, message_path: str, now: Column, maxage_seconds: float
) -> Column:
    """The maxage staleness gate: the reference requests
    ``maxage = 0.8 * read_interval`` from ebusd (``EbusLogger.cs:92``);
    the batch analog drops rows whose lastup is older than that budget."""
    age = now.cast("double") - get_path(json, f"{message_path}.lastup").cast("double")
    return age <= F.lit(maxage_seconds)
