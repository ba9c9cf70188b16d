"""homelogging_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of koen-lee/HomeLogging.

The reference system is a home-telemetry stack: pollers append named time
series (multi-valued rows ``(ts, values[], tag)``) per device document into
a document store, and analytic programs run bucketed aggregation, bucket-
aligned joins, counter correction, and a battery simulation over them
(see SURVEY.md). This package re-expresses that data model and every one of
those operators Spark-first:

- data model: long-format ``readings`` fact table + ``meters``/``series_schema``
  dims (``homelogging_spark.tables``, ``homelogging_spark.functions.values``)
- operators: pure ``pyspark.sql`` column expressions wherever possible
  (``operators/``), ``applyInPandas`` only for the genuinely sequential folds
- sources: parser stages for each telemetry wire format (``sources/``)
- streaming: Structured Streaming ingest with dedup + watermark (``streaming/``)
- scale extensions: dedup, similarity search, text analysis, multimodal
  plumbing for large-scale training-data pipelines (``operators/``)
"""

__version__ = "0.1.0"

from homelogging_spark.session import get_spark  # noqa: F401
from homelogging_spark.tables import load_tables  # noqa: F401
