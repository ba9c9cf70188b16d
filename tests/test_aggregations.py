"""Aggregation-operator tests not covered by oracle parity: the
percentile_approx scale path (A5) and gate guards (A7)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.aggregations import all_gate, trailing_percentile


def series(spark, values):
    t0 = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [("s", t0 + timedelta(seconds=i), float(v)) for i, v in enumerate(values)],
        "key string, ts timestamp, value double",
    )


class TestTrailingPercentile:
    def test_exact_and_approx_agree_on_small_groups(self, spark):
        df = series(spark, range(101))
        cutoff = F.lit("2023-01-01").cast("timestamp")
        exact = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p"
        ).first().p
        approx = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p", approx=True
        ).first().p
        assert exact == pytest.approx(50.0)
        # GK sketch at default accuracy is exact for groups << accuracy
        assert approx == pytest.approx(exact)

    def test_cutoff_excludes_old_rows(self, spark):
        df = series(spark, [1000, 1, 2, 3])
        cutoff = F.lit("2024-01-01 00:00:01").cast("timestamp")
        got = trailing_percentile(
            df, F.col("value"), 0.5, cutoff, keys=["key"], alias="p"
        ).first().p
        assert got == pytest.approx(2.0)


class TestAllGateGuards:
    def test_min_count_guard(self, spark):
        df = series(spark, [10, 20, 30])  # all > 5 but only 3 samples
        out = all_gate(df, ["key"], F.col("value") > 5.0, min_count=10).first()
        assert out.n_true == 3
        assert out.all_true is False  # guard: too few samples to conclude
        assert out.none_true is False


class TestAsofAndRangeJoins:
    def test_asof_basic_and_no_earlier_row(self, spark):
        from homelogging_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
            "k long, ts long, tag string",
        )
        right = spark.createDataFrame(
            [(1, 10, 100.0), (1, 15, 150.0), (2, 9, 90.0)],
            "k long, ts long, price double",
        )
        out = {
            r.tag: r.right_price
            for r in asof_join(left, right, ["k"], "ts", "ts", ["price"]).collect()
        }
        assert out["a"] == 100.0  # equal ts -> included (<= semantics)
        assert out["b"] == 150.0  # most recent earlier row wins
        assert out["c"] is None  # no right row at-or-before -> NULL

    def test_asof_keys_are_isolated(self, spark):
        from homelogging_spark.operators.joins import asof_join

        left = spark.createDataFrame([(1, 50, "x")], "k long, ts long, tag string")
        right = spark.createDataFrame([(2, 10, 1.0)], "k long, ts long, price double")
        rows = asof_join(left, right, ["k"], "ts", "ts", ["price"]).collect()
        assert rows[0].right_price is None  # other key's rows never leak

    def test_range_join_boundaries_and_multibucket(self, spark):
        import datetime as dt

        from homelogging_spark.operators.joins import bucketed_range_join

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        events = spark.createDataFrame(
            [(1, ts(0), "at_start"), (1, ts(119), "inside"),
             (1, ts(120), "at_end"), (1, ts(500), "outside")],
            "k long, ts timestamp, tag string",
        )
        # one 2h interval spanning 3 hourly buckets; bucket_seconds=3600
        intervals = spark.createDataFrame(
            [(1, ts(0), ts(120), 7)],
            "k long, start_ts timestamp, end_ts timestamp, iid long",
        )
        got = sorted(
            r.tag
            for r in bucketed_range_join(
                events, intervals, ["k"], "ts", "start_ts", "end_ts", 3600
            ).collect()
        )
        assert got == ["at_start", "inside"]  # start inclusive, end exclusive

    def test_range_join_interval_shorter_than_bucket(self, spark):
        import datetime as dt

        from homelogging_spark.operators.joins import bucketed_range_join

        t0 = dt.datetime(2024, 1, 1, 10, 30, 0)
        events = spark.createDataFrame(
            [(1, t0 + dt.timedelta(minutes=5), "hit")],
            "k long, ts timestamp, tag string",
        )
        intervals = spark.createDataFrame(
            [(1, t0, t0 + dt.timedelta(minutes=10), 1)],
            "k long, start_ts timestamp, end_ts timestamp, iid long",
        )
        out = bucketed_range_join(
            events, intervals, ["k"], "ts", "start_ts", "end_ts", 3600
        ).collect()
        assert [r.tag for r in out] == ["hit"]


class TestSkewSplitJoin:
    """skew_split_join must be row-identical to the plain equi join —
    the hot/cold split is a physical rewrite only."""

    def _skewed(self, spark):
        # key 1 owns 80% of the fact; dim has matched, unmatched-in-fact,
        # and NULL keys; fact has a key absent from dim and a NULL key.
        fact = spark.createDataFrame(
            [(1, i) for i in range(80)]
            + [(k, 100 + k) for k in range(2, 22)]
            + [(99, 999), (None, 0)],
            "k long, payload long",
        )
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(1, 22)] + [(50, "d50"), (None, "dnull")],
            "k long, attr string",
        )
        return fact, dim

    def _rows(self, df):
        return sorted(
            (tuple(r) for r in df.select("k", "payload", "attr").collect()),
            key=repr,
        )

    def test_matches_plain_join_inner_and_left(self, spark):
        from homelogging_spark.operators.joins import skew_split_join

        fact, dim = self._skewed(spark)
        for how in ("inner", "left"):
            plain = fact.join(dim, ["k"], how)
            split = skew_split_join(
                fact, dim, ["k"], hot_threshold=50, how=how
            )
            assert self._rows(split) == self._rows(plain), how

    def test_caller_supplied_hot_keys_and_empty_hot(self, spark):
        from homelogging_spark.operators.joins import skew_split_join

        fact, dim = self._skewed(spark)
        plain = self._rows(fact.join(dim, ["k"], "inner"))
        assert self._rows(
            skew_split_join(fact, dim, ["k"], hot_keys=[(1,)])
        ) == plain
        # threshold nothing reaches -> degenerates to the plain join
        assert self._rows(
            skew_split_join(fact, dim, ["k"], hot_threshold=10_000)
        ) == plain

    def test_multi_column_keys(self, spark):
        from homelogging_spark.operators.joins import skew_split_join

        fact = spark.createDataFrame(
            [("a", 1, i) for i in range(40)] + [("a", 2, 1), ("b", 1, 2)],
            "g string, k long, payload long",
        )
        dim = spark.createDataFrame(
            [("a", 1, "hot"), ("a", 2, "c1"), ("b", 1, "c2"), ("b", 9, "x")],
            "g string, k long, attr string",
        )
        plain = sorted(tuple(r) for r in fact.join(dim, ["g", "k"]).collect())
        split = skew_split_join(fact, dim, ["g", "k"], hot_threshold=10)
        assert sorted(tuple(r) for r in split.collect()) == plain

    def test_plan_has_broadcast_hot_and_shuffled_cold(self, spark):
        from homelogging_spark.operators.joins import skew_split_join

        fact, dim = self._skewed(spark)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = skew_split_join(
                fact, dim, ["k"], hot_keys=[(1,)]
            )._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" in plan  # hot branch never shuffles
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_detect_hot_keys_head_and_sampled(self, spark):
        from homelogging_spark.operators.joins import detect_hot_keys

        fact, _ = self._skewed(spark)
        assert detect_hot_keys(fact, ["k"], hot_threshold=50) == [(1,)]
        # sampled census still finds an 80%-of-rows key
        assert detect_hot_keys(
            fact, ["k"], hot_threshold=50, sample_fraction=0.5
        ) == [(1,)]

    def test_unsupported_how_refused(self, spark):
        from homelogging_spark.operators.joins import skew_split_join

        fact, dim = self._skewed(spark)
        with pytest.raises(ValueError, match="inner/left"):
            skew_split_join(fact, dim, ["k"], hot_keys=[(1,)], how="right")


class TestSessionizeAndTimeWindows:
    def test_sessionize_gap_boundary_is_strict(self, spark):
        import datetime as dt

        from homelogging_spark.operators.aggregations import sessionize

        t0 = dt.datetime(2024, 1, 1)

        def ts(s):
            return t0 + dt.timedelta(seconds=s)

        # gaps: 1800s (== gap, same session), 1801s (> gap, new session)
        df = spark.createDataFrame(
            [(1, ts(0)), (1, ts(1800)), (1, ts(3601))], "k long, ts timestamp"
        )
        out = sessionize(df, ["k"], "ts", gap_seconds=1800.0)
        idx = [r.session_idx for r in out.orderBy("ts").collect()]
        assert idx == [1, 1, 2]

    def test_trailing_window_includes_exact_boundary(self, spark):
        import datetime as dt

        from homelogging_spark.operators.aggregations import (
            trailing_time_window_agg,
        )

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, t0, 10.0), (1, t0 + dt.timedelta(seconds=3600), 20.0),
             (1, t0 + dt.timedelta(seconds=3601), 30.0)],
            "k long, ts timestamp, value double",
        )
        out = trailing_time_window_agg(df, ["k"], "value", "ts", 3600)
        rows = {r.value: (r.trailing_avg, r.n_in_window) for r in out.collect()}
        assert rows[20.0] == (15.0, 2)  # exactly 1h back is IN the frame
        assert rows[30.0] == (25.0, 2)  # the t0 row has aged out


class TestGridResampleLocf:
    def test_gaps_filled_leading_nulls_stay_null(self, spark, tmp_path):
        """LOCF semantics through the registered query shape: a reading
        at hours 0 and 3 fills 1-2 with hour-0's value; hours before a
        meter's first reading stay NULL (nothing to carry)."""
        import datetime as dt

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # meter 1: readings at h0 and h3
            (1, t0, 10.0),
            (1, t0 + dt.timedelta(hours=3), 40.0),
            # meter 2: first reading only at h2 -> h0/h1 stay null
            (2, t0 + dt.timedelta(hours=2), 7.0),
        ]
        r = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        r = r.select(
            "user_id", F.date_trunc("hour", "ts").alias("h"), "ts", "value"
        )
        obs = r.groupBy("user_id", "h").agg(
            F.max(F.struct("ts", "value")).alias("m")
        ).select(
            F.col("user_id").alias("obs_uid"),
            F.col("h").alias("obs_h"),
            F.col("m.value").alias("obs_value"),
        )
        bounds = r.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        grid = (
            r.select("user_id").distinct()
            .crossJoin(F.broadcast(bounds))
            .select(
                "user_id",
                F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias(
                    "grid_h"
                ),
            )
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("grid_h")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            grid.join(
                obs,
                (F.col("user_id") == F.col("obs_uid"))
                & (F.col("grid_h") == F.col("obs_h")),
                "left",
            )
            .select(
                "user_id",
                "grid_h",
                F.last("obs_value", ignorenulls=True).over(w).alias("locf"),
            )
        )
        got = {
            (r.user_id, r.grid_h.hour): r.locf for r in out.collect()
        }
        assert got[(1, 0)] == 10.0
        assert got[(1, 1)] == 10.0 and got[(1, 2)] == 10.0  # gap filled
        assert got[(1, 3)] == 40.0
        assert got[(2, 0)] is None and got[(2, 1)] is None  # leading nulls
        assert got[(2, 2)] == 7.0 and got[(2, 3)] == 7.0


class TestEwmaSmooth:
    def test_recurrence_and_residuals(self, spark):
        from datetime import datetime

        from homelogging_spark.operators.aggregations import ewma_smooth

        rows = [
            (1, datetime(2024, 1, 1, 0, 0, m), v)
            for m, v in enumerate([10.0, 20.0, 20.0, 0.0])
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        out = sorted(
            ewma_smooth(df, ["user_id"], alpha=0.25).collect(), key=lambda r: r.ts
        )
        # s1=10; s2=.25*20+.75*10=12.5; s3=.25*20+.75*12.5=14.375; s4=.75*14.375
        assert [r.ewma for r in out] == [10.0, 12.5, 14.375, 10.78125]
        assert [r.resid for r in out] == [0.0, 10.0, 7.5, -14.375]

    def test_keys_do_not_mix(self, spark):
        from datetime import datetime

        from homelogging_spark.operators.aggregations import ewma_smooth

        rows = [
            (1, datetime(2024, 1, 1), 100.0),
            (2, datetime(2024, 1, 1), 0.0),
            (1, datetime(2024, 1, 2), 100.0),
            (2, datetime(2024, 1, 2), 0.0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        out = {(r.user_id, r.ts.day): r.ewma for r in ewma_smooth(
            df, ["user_id"]).collect()}
        assert out[(1, 2)] == 100.0 and out[(2, 2)] == 0.0


class TestProfileAndRollingCorr:
    SF = "/root/testdata/sf0.001"

    def test_table_profile_shape_and_invariants(self, spark):
        from homelogging_spark.plans.registry import q_table_profile

        rows = {r.col_name: r for r in q_table_profile(spark, self.SF).collect()}
        assert set(rows) == {
            "event_id", "ts", "user_id", "event_type", "value", "props",
        }
        for r in rows.values():
            assert r.n_null >= 0 and r.n_distinct <= r.n_rows
        assert rows["event_type"].min_num is None  # plain string: no bounds
        assert rows["event_id"].n_distinct == rows["event_id"].n_rows  # pk
        assert rows["ts"].min_num <= rows["ts"].max_num

    def test_table_profile_approx_dial(self, spark):
        """The 100 TB dial: approx=True must keep the exact schema,
        report distincts within the HLL++ rsd tolerance, and drop the
        Expand from the plan (the exact multi-distinct's row-multiplier
        — the whole point of the dial)."""
        from homelogging_spark.operators.profiling import table_profile
        from homelogging_spark.tables import load_table

        events = load_table(spark, self.SF, "events")
        kw = dict(
            cols=("event_id", "user_id", "event_type"),
            numeric_cols=("event_id", "user_id"),
        )
        exact = table_profile(events, **kw)
        approx = table_profile(events, approx=True, rsd=0.05, **kw)
        assert exact.schema == approx.schema
        e = {r.col_name: r for r in exact.collect()}
        a = {r.col_name: r for r in approx.collect()}
        for c in kw["cols"]:
            assert a[c].n_rows == e[c].n_rows and a[c].n_null == e[c].n_null
            assert a[c].min_num == e[c].min_num and a[c].max_num == e[c].max_num
            # HLL++ rsd=0.05 → generous 5-sigma-ish band
            assert abs(a[c].n_distinct - e[c].n_distinct) <= max(
                5, 0.25 * e[c].n_distinct
            )
        exact_plan = exact._jdf.queryExecution().executedPlan().toString()
        approx_plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in exact_plan  # the deliberate exact-mode cost
        assert "Expand" not in approx_plan  # the dial removes it

    def test_rolling_corr_bounded_and_full_windows_only(self, spark):
        from homelogging_spark.plans.registry import q_rolling_corr

        rows = q_rolling_corr(spark, self.SF).collect()
        assert rows, "expected at least one full 24h window"
        for r in rows:
            assert r.n_window == 24
            if r.corr_24h is not None:
                assert -1.0 - 1e-9 <= r.corr_24h <= 1.0 + 1e-9


class TestAnalyticsQueries:
    SF = "/root/testdata/sf0.001"

    def test_snapshot_diff_partitions_rows(self, spark):
        from homelogging_spark.plans.registry import q_snapshot_diff

        rows = q_snapshot_diff(spark, self.SF).collect()
        by = {}
        for r in rows:
            by.setdefault(r.change_type, []).append(r)
        # every 10th key was dropped from old -> added in new
        assert all(r.c_custkey % 10 == 0 for r in by["added"])
        assert all(r.old_bal is None for r in by["added"])
        # every 7th key's balance shifted by +100 (unless also added)
        assert all(r.c_custkey % 7 == 0 for r in by["changed"])
        for r in by["changed"]:
            assert r.new_bal == pytest.approx(r.old_bal + 100.0, abs=1e-5)
        assert "removed" not in by  # new snapshot is a superset
        assert len(rows) == sum(len(v) for v in by.values())

    def test_funnel_is_monotone(self, spark):
        from homelogging_spark.plans.registry import q_funnel_stages

        rows = {r.stage: r for r in q_funnel_stages(spark, self.SF).collect()}
        n1 = rows["1_view"].n
        n2 = rows["2_click_after_view"].n
        n3 = rows["3_purchase_after_click"].n
        assert n1 >= n2 >= n3 >= 0
        assert rows["1_view"].rate_vs_first == pytest.approx(1.0)

    def test_seasonal_residuals_flags_only_outliers(self, spark):
        from homelogging_spark.plans.registry import q_seasonal_residuals

        rows = q_seasonal_residuals(spark, self.SF).collect()
        for r in rows[:50]:
            assert abs(r.value - r.cell_mean) == pytest.approx(abs(r.resid), abs=1e-5)


class TestCubeProfile:
    def test_grouping_sets_consistent(self, spark):
        from homelogging_spark.plans.registry import q_cube_profile

        rows = q_cube_profile(spark, "/root/testdata/sf0.001").collect()
        by_gid = {}
        for r in rows:
            by_gid.setdefault(r.gid, []).append(r)
        assert set(by_gid) == {0, 1, 2, 3}
        total = by_gid[3]
        assert len(total) == 1 and total[0].event_type is None
        # margins sum to the grand total
        assert sum(r.n for r in by_gid[1]) == total[0].n  # per-series
        assert sum(r.n for r in by_gid[2]) == total[0].n  # per-weekday
        assert sum(r.n for r in by_gid[0]) == total[0].n  # full cross


class TestSpecDrivenAgg:
    def test_specs_answered_from_one_pass(self, spark):
        from homelogging_spark.plans.registry import q_spec_driven_agg

        df = q_spec_driven_agg(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        by_spec = {}
        for r in rows:
            by_spec.setdefault(r.spec_id, []).append(r)
        assert set(by_spec) == {1, 2, 3, 4, 5}
        # count specs produce integral doubles; day buckets are midnight
        for r in by_spec[3]:
            assert r.result == int(r.result)
            assert (r.bucket.hour, r.bucket.minute) == (0, 0)
        # single fact scan in the physical plan (specs come from a
        # LocalTableScan, not a file)
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE prints both
        assert final.count("FileScan parquet") == 1


class TestRollingCorrGuard:
    """r6 regression (ADVICE r5): a series constant over the whole 24h
    window rounds its variance term to ~-7e-15; unguarded, DuckDB's
    sqrt() hard-errors and Spark emits a NaN row. Both engines must emit
    NULL corr instead."""

    def _flat_events(self):
        import pandas as pd

        rows = []
        base = pd.Timestamp("2024-01-01")
        for h in range(30):
            ts = base + pd.Timedelta(hours=h)
            rows.append(("view", ts, 5.0))        # constant x
            rows.append(("click", ts, float(h)))  # varying y
        return pd.DataFrame(rows, columns=["event_type", "ts", "value"])

    def test_duckdb_oracle_survives_flat_series(self):
        import duckdb

        from homelogging_spark.plans.registry import ORACLE_ROLLING_CORR

        con = duckdb.connect()
        con.register("events", self._flat_events())
        out = con.execute(ORACLE_ROLLING_CORR).fetchdf()  # must not raise
        assert len(out) == 7  # hours 23..29 have full windows
        assert out["corr_24h"].isna().all()

    def test_spark_emits_null_not_nan(self, spark, tmp_path):
        pdf = self._flat_events()
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )
        from homelogging_spark.plans.registry import q_rolling_corr

        rows = q_rolling_corr(spark, str(tmp_path)).collect()
        assert len(rows) == 7
        assert all(r.corr_24h is None for r in rows)


class TestRobustOutliers:
    def test_mad_semantics_and_degenerate_key(self, spark):
        """Modified z = 0.6745(x-med)/MAD; a key with MAD=0 (majority
        constant) emits NULL robust_z and flags any departure."""
        from homelogging_spark.operators.aggregations import robust_outliers

        rows = (
            # key a: values 1..9 plus a wild 1000 -> med 5.5, MAD 2.5
            [("a", i, float(v)) for i, v in enumerate([1,2,3,4,5,6,7,8,9,1000])]
            # key b: constant 7 except one 8 -> MAD 0
            + [("b", 100 + i, 7.0) for i in range(5)] + [("b", 199, 8.0)]
        )
        df = spark.createDataFrame(rows, "k string, rid bigint, value double")
        out = {r.rid: r for r in robust_outliers(df, ["k"], "value").collect()}
        assert out[9].is_outlier is True
        assert out[9].robust_z == pytest.approx(0.6745 * (1000 - 5.5) / 2.5)
        assert all(out[i].is_outlier is False for i in range(9))
        # degenerate key: NULL z, departure flagged
        assert out[199].is_outlier is True and out[199].robust_z is None
        assert out[100].is_outlier is False

    def test_approx_dial_tolerance_and_schema(self, spark):
        from homelogging_spark.operators.aggregations import robust_outliers
        from pyspark.sql import functions as F

        df = spark.range(5000).select(
            (F.col("id") % 5).cast("string").alias("k"),
            F.col("id").alias("rid"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        exact = robust_outliers(df, ["k"], "value")
        approx = robust_outliers(df, ["k"], "value", approx=True)
        assert exact.schema == approx.schema
        e = exact.select("k", "med", "mad").distinct().collect()
        a = {(r.k): (r.med, r.mad) for r in approx.select("k", "med", "mad").distinct().collect()}
        for r in e:
            assert abs(a[r.k][0] - r.med) <= 2 and abs(a[r.k][1] - r.mad) <= 2
