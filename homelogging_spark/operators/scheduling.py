"""Adaptive poll scheduling (SURVEY §2.7 ST8): the reference's logger
service reschedules each device poll at ``delay = interval - elapsed``
floored at 5 s, and DOUBLES the delay per consecutive failure, capped at
1 hour (reference: TelemetryToRaven/LoggerService.cs:28-50 — delay
arithmetic at :39-47). ST9's retry-once wrapper stays an orchestration
concern (LoggerService.cs:62-73): it retries a failed poll immediately
once before the backoff applies, which in this data model simply means
the attempt log carries both attempts as rows.

Spark-first restatement: scheduling state is a pure function of the
per-device attempt log, so instead of porting the imperative timer loop
we DERIVE the schedule declaratively — one aggregation for the latest
success/attempt per device, one co-keyed count for the failure streak,
and closed-form backoff arithmetic. At 100 TB the attempt log is an
append-only table partitioned by day; both shuffles key on the device
id and the output is one row per device (dim-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FLOOR_S = 5.0
DEFAULT_CAP_S = 3600.0


def backoff_delay(
    interval_s: Column, fail_streak: Column, cap_s: float = DEFAULT_CAP_S
) -> Column:
    """Backoff restated in closed form: ``min(interval * 2^streak,
    cap)``. This matches the reference (LoggerService.cs:45-46) only in
    the healthy-baseline case where the delay equals the configured
    interval before the first failure; the reference doubles the
    CURRENT delay (which after a success is ``interval - elapsed``,
    possibly the 5 s floor) and checks the 1 h cap BEFORE doubling, so
    its delays can overshoot to just under 2 h. We deliberately
    hard-cap at exactly ``cap`` — a declarative restatement, not a
    bug-for-bug port of the mutable ``_delay *= 2`` loop."""
    return F.least(interval_s * F.pow(F.lit(2.0), fail_streak), F.lit(cap_s))


def next_poll_schedule(
    attempts: DataFrame,
    now_ts,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    ok_col: str = "ok",
    interval_col: str = "interval_s",
    floor_s: float = DEFAULT_FLOOR_S,
    cap_s: float = DEFAULT_CAP_S,
    retry_window_ms: int = 0,
) -> DataFrame:
    """Derive each device's next poll time from its attempt log.

    ``attempts``: one row per poll attempt — key column(s), ``ts_col``
    timestamp, ``ok_col`` boolean, ``interval_col`` the device's
    configured poll interval in seconds (constant per device).

    Output, one row per device: ``last_attempt_ts``, ``last_ok_ts``
    (null if never succeeded), ``fail_streak`` (consecutive failures
    since the last success), ``delay_s`` (backoff-doubled, capped),
    ``next_poll_ts`` = last_attempt + delay, and ``due_in_s`` =
    max(next_poll - now, floor) — the reference's ``interval - elapsed``
    with its 5 s floor (LoggerService.cs:39-43).

    ``retry_window_ms``: ST9's exact retry-once accounting
    (LoggerService.cs:62-73): the ``Retry`` wrapper re-runs a failed
    poll immediately, and only the SET (attempt + failed retry) counts
    as one failure toward the backoff doubling. With a non-zero window,
    post-success failures within ``retry_window_ms`` of the previous
    failure collapse into that failure's set, and ``fail_streak``
    counts sets — so a fail + failed-retry pair doubles the delay ONCE,
    exactly like the reference. The default 0 counts every attempt row
    (each attempt its own set).

    Two shuffles, both keyed on the device id: the per-device extrema
    aggregation and the failure-streak count (an anti-filtered co-keyed
    aggregation; the retry-window form adds a per-device lag window
    over the post-success failures — partitioned, never global).
    """
    keys = keys or ["meter_id"]
    now = F.lit(now_ts).cast("timestamp")

    per_dev = attempts.groupBy(*keys).agg(
        F.max(F.col(ts_col)).alias("last_attempt_ts"),
        F.max(F.when(F.col(ok_col), F.col(ts_col))).alias("last_ok_ts"),
        # interval from the LATEST attempt, not max over history: if a
        # device's configured interval is ever lowered, stale rows with
        # the old larger value must not dominate the schedule forever
        F.max_by(F.col(interval_col), F.col(ts_col)).alias("__interval_s"),
    )
    # consecutive failures since the last success: count attempts that
    # are strictly later than last_ok_ts (all of them if never ok)
    post_ok = attempts.join(per_dev.select(*keys, "last_ok_ts"), keys).where(
        F.col("last_ok_ts").isNull() | (F.col(ts_col) > F.col("last_ok_ts"))
    )
    if retry_window_ms > 0:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
        gap_ms = F.unix_millis(F.col(ts_col)) - F.unix_millis(
            F.lag(F.col(ts_col)).over(w)
        )
        new_set = gap_ms.isNull() | (gap_ms > F.lit(retry_window_ms))
        streak = (
            post_ok.withColumn("__new_set", new_set)
            .groupBy(*keys)
            .agg(
                F.sum(F.when(F.col("__new_set"), 1).otherwise(0))
                .cast("bigint")
                .alias("fail_streak")
            )
        )
    else:
        streak = post_ok.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("fail_streak")
        )
    out = (
        per_dev.join(streak, keys, "left")
        .withColumn("fail_streak", F.coalesce("fail_streak", F.lit(0).cast("bigint")))
        .withColumn(
            "delay_s", backoff_delay(F.col("__interval_s"), F.col("fail_streak"), cap_s)
        )
        .withColumn(
            "next_poll_ts",
            F.timestamp_millis(
                F.unix_millis("last_attempt_ts")
                + (F.col("delay_s") * 1000.0).cast("bigint")
            ),
        )
        .withColumn(
            "due_in_s",
            F.greatest(
                (F.unix_millis("next_poll_ts") - F.unix_millis(now)) / 1000.0,
                F.lit(float(floor_s)),
            ),
        )
    )
    return out.select(
        *keys,
        "last_attempt_ts",
        "last_ok_ts",
        "fail_streak",
        "delay_s",
        "next_poll_ts",
        "due_in_s",
    )
