from homelogging_spark.functions.timeutils import (  # noqa: F401
    truncate_to_interval,
    time_bucket,
)
