"""Structured Streaming ingest (EP3): see ``pipeline``."""

from homelogging_spark.streaming.pipeline import (  # noqa: F401
    read_reading_stream,
    start_append_stream,
)
