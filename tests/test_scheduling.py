"""ST8 adaptive poll scheduling: the schedule is a pure function of the
attempt log, pinned against hand-computed values mirroring the
reference's delay arithmetic (LoggerService.cs:28-50)."""

from __future__ import annotations

from datetime import datetime

from homelogging_spark.operators.scheduling import next_poll_schedule

NOW = "2024-05-01 12:00:00"


def _attempts(spark, rows):
    return spark.createDataFrame(
        [(m, datetime.fromisoformat(ts), ok, iv) for m, ts, ok, iv in rows],
        "meter_id string, ts timestamp, ok boolean, interval_s double",
    )


class TestNextPollSchedule:
    def test_healthy_device_keeps_base_interval(self, spark):
        df = _attempts(
            spark,
            [
                ("m1", "2024-05-01 11:58:00", True, 60.0),
                ("m1", "2024-05-01 11:59:00", True, 60.0),
            ],
        )
        r = next_poll_schedule(df, NOW).collect()[0]
        assert r.fail_streak == 0
        assert r.delay_s == 60.0
        assert str(r.next_poll_ts) == "2024-05-01 12:00:00"
        # next poll is exactly now -> floored to the 5 s minimum
        assert r.due_in_s == 5.0

    def test_backoff_doubles_per_consecutive_failure(self, spark):
        # ok, fail, fail, fail -> streak 3, delay 60 * 2^3 = 480
        rows = [
            ("m1", "2024-05-01 11:50:00", True, 60.0),
            ("m1", "2024-05-01 11:51:00", False, 60.0),
            ("m1", "2024-05-01 11:52:00", False, 60.0),
            ("m1", "2024-05-01 11:53:00", False, 60.0),
        ]
        r = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r.fail_streak == 3
        assert r.delay_s == 480.0
        assert str(r.last_ok_ts) == "2024-05-01 11:50:00"
        assert str(r.next_poll_ts) == "2024-05-01 12:01:00"
        assert r.due_in_s == 60.0  # 12:01 is 60 s past NOW, above floor

    def test_backoff_caps_at_one_hour(self, spark):
        # 8 straight failures: 60 * 2^8 = 15360 -> capped to 3600
        rows = [
            ("m1", f"2024-05-01 11:{50 + i}:00", False, 60.0) for i in range(8)
        ]
        r = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r.fail_streak == 8
        assert r.last_ok_ts is None
        assert r.delay_s == 3600.0

    def test_success_resets_streak(self, spark):
        rows = [
            ("m1", "2024-05-01 11:50:00", False, 60.0),
            ("m1", "2024-05-01 11:51:00", False, 60.0),
            ("m1", "2024-05-01 11:55:00", True, 60.0),
        ]
        r = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r.fail_streak == 0 and r.delay_s == 60.0

    def test_st9_retry_rows_count_into_streak(self, spark):
        """ST9's immediate retry lands as a second attempt row; both
        count toward the streak, so a poll that failed and failed its
        retry backs off by 2 doublings — the reference behavior after
        the retry wrapper re-raises."""
        rows = [
            ("m1", "2024-05-01 11:50:00", True, 60.0),
            ("m1", "2024-05-01 11:51:00", False, 60.0),
            ("m1", "2024-05-01 11:51:05", False, 60.0),  # the retry
        ]
        r = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r.fail_streak == 2 and r.delay_s == 240.0

    def test_st9_retry_window_counts_sets_not_attempts(self, spark):
        """The exact reference accounting (LoggerService.cs:62-73): the
        Retry wrapper re-runs a failed poll immediately, and only the
        SET counts toward the doubling — a fail + failed-retry pair 5 s
        apart is ONE failure (delay x2, not x4); two independent failed
        sets are two (x4)."""
        rows = [
            ("m1", "2024-05-01 11:40:00", True, 60.0),
            ("m1", "2024-05-01 11:41:00", False, 60.0),
            ("m1", "2024-05-01 11:41:05", False, 60.0),  # the retry
        ]
        r = next_poll_schedule(
            _attempts(spark, rows), NOW, retry_window_ms=10_000
        ).collect()[0]
        assert r.fail_streak == 1 and r.delay_s == 120.0
        # two failed sets a minute apart -> streak 2
        rows2 = rows + [
            ("m1", "2024-05-01 11:42:10", False, 60.0),
            ("m1", "2024-05-01 11:42:15", False, 60.0),  # its retry
        ]
        r2 = next_poll_schedule(
            _attempts(spark, rows2), NOW, retry_window_ms=10_000
        ).collect()[0]
        assert r2.fail_streak == 2 and r2.delay_s == 240.0
        # default window 0 keeps the per-attempt accounting
        r0 = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r0.fail_streak == 2 and r0.delay_s == 240.0

    def test_lowered_interval_takes_effect(self, spark):
        """The interval comes from the LATEST attempt row: lowering a
        device's configured interval must change the schedule even
        though older rows still carry the larger value."""
        rows = [
            ("m1", "2024-05-01 11:50:00", True, 300.0),
            ("m1", "2024-05-01 11:59:00", True, 60.0),  # config lowered
        ]
        r = next_poll_schedule(_attempts(spark, rows), NOW).collect()[0]
        assert r.delay_s == 60.0
        assert str(r.next_poll_ts) == "2024-05-01 12:00:00"

    def test_per_device_independence(self, spark):
        rows = [
            ("a", "2024-05-01 11:59:00", True, 30.0),
            ("b", "2024-05-01 11:30:00", False, 120.0),
            ("b", "2024-05-01 11:40:00", False, 120.0),
        ]
        out = {r.meter_id: r for r in next_poll_schedule(_attempts(spark, rows), NOW).collect()}
        assert out["a"].delay_s == 30.0 and out["a"].fail_streak == 0
        assert out["b"].delay_s == 480.0 and out["b"].fail_streak == 2
