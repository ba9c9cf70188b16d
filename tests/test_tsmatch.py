"""Pattern-match (time-series subsequence similarity) pins."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from homelogging_spark.operators.tsmatch import pattern_match_topk

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)


def _hourly(spark, series):
    """series: {key: [values]} on a contiguous hourly grid."""
    rows = [
        (k, BASE + dt.timedelta(hours=i), float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "series string, bucket timestamp, value double"
    )


def _znorm(x):
    x = np.asarray(x, dtype=float)
    sd = x.std()
    return (x - x.mean()) / sd if sd > 0 else np.zeros_like(x)


def _ref_topk(series, pattern, k):
    """numpy reference: z-normalized distance at every full offset."""
    zp = _znorm(pattern)
    L = len(pattern)
    out = []
    for key, vals in sorted(series.items()):
        for s in range(0, len(vals) - L + 1):
            win = vals[s : s + L]
            if np.asarray(win).std() == 0 and np.asarray(pattern).std() != 0:
                continue
            d = float(np.sqrt(((np.asarray(_znorm(win)) - zp) ** 2).sum()))
            out.append((d, key, s))
    out.sort()
    return out[:k]


class TestPatternMatch:
    def test_matches_numpy_reference(self, spark):
        rng = np.random.RandomState(7)
        series = {
            "a": list(rng.uniform(0, 10, 48)),
            "b": list(rng.uniform(0, 10, 48)),
        }
        pattern = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0]
        got = pattern_match_topk(
            _hourly(spark, series), pattern, k=5
        ).collect()
        want = _ref_topk(series, pattern, 5)
        assert len(got) == 5
        for row, (d, key, s) in zip(got, want):
            assert row.key == key
            assert row.window_start == BASE + dt.timedelta(hours=s)
            assert row.window_end == BASE + dt.timedelta(hours=s + len(pattern) - 1)
            assert math.isclose(row.dist, d, rel_tol=1e-9, abs_tol=1e-9)

    def test_exact_shape_match_scores_zero(self, spark):
        """An amplitude/offset-scaled copy of the pattern is a PERFECT
        z-normalized match (dist 0) — the invariance the z-norm buys."""
        pattern = [1.0, 4.0, 2.0, 8.0, 3.0]
        scaled = [100 + 7 * v for v in pattern]  # offset + amplitude
        vals = [5.0, 5.5, 6.0, 5.2, 4.8] + scaled + [9.9, 1.1, 7.3, 2.2, 6.6]
        got = pattern_match_topk(
            _hourly(spark, {"s": vals}), pattern, k=1
        ).collect()[0]
        assert got.dist == pytest.approx(0.0, abs=1e-12)
        assert got.window_start == BASE + dt.timedelta(hours=5)

    def test_gappy_windows_skipped_not_misscored(self, spark):
        """A gap in the hourly grid must produce NO candidate spanning
        it: the L latest rows would otherwise be non-contiguous and
        score a wrong window."""
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        df = _hourly(spark, {"s": vals})
        # drop hour 2: windows spanning it must vanish
        gappy = df.where("bucket != timestamp '2026-01-01 02:00:00'")
        got = pattern_match_topk(gappy, [1.0, 2.0, 3.0], k=10).collect()
        starts = {r.window_start.hour for r in got}
        assert starts == {3}  # only hours 3-5 is a contiguous window
        # ungapped control: 0-2, 1-3, 2-4, 3-5 all present
        full = pattern_match_topk(df, [1.0, 2.0, 3.0], k=10).collect()
        assert {r.window_start.hour for r in full} == {0, 1, 2, 3}

    def test_flat_windows_dropped_against_shaped_pattern(self, spark):
        vals = [5.0] * 6 + [1.0, 9.0, 2.0]
        got = pattern_match_topk(
            _hourly(spark, {"s": vals}), [1.0, 9.0, 2.0], k=10
        ).collect()
        # no all-flat window may appear; the true match ranks first
        assert all(len(set(r.window_values)) > 1 for r in got)
        assert got[0].dist == pytest.approx(0.0, abs=1e-12)

    def test_plan_is_partitioned_and_take_ordered(self, spark):
        df = _hourly(spark, {"a": [float(i % 5) for i in range(30)],
                             "b": [float(i % 7) for i in range(30)]})
        plan = (
            pattern_match_topk(df, [1.0, 2.0, 3.0], k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject(limit=3" in plan  # never a full sort
        # the sliding frame is keyed: windowspecdefinition leads with the
        # series key, and the only exchange hash-partitions on it — no
        # unpartitioned window over the raw stream
        assert "windowspecdefinition(key#" in plan
        assert "Exchange hashpartitioning(key#" in plan
        assert "Exchange rangepartitioning" not in plan


class TestRegistrationDraft:
    """END-TO-END draft of a future driver registration: the exact
    pattern_match_topk query shape AND a complete DuckDB oracle
    (windowed list() frames + lateral-alias z-norm), over the real
    sf0.01 events table. The grid metric is an hourly event COUNT —
    integer-exact in both engines, so no float-summation-order hazard
    enters before the (identically-ordered) distance fold. Promotion
    blocked only by the registry's 100-query cap (COVERAGE.md runway)."""

    SF = "/root/testdata/sf0.01"
    PATTERN = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0]
    K = 7

    def test_matches_full_duckdb_oracle(self, spark):
        import duckdb

        from homelogging_spark.functions.numeric import quantize, quantize_sql
        from homelogging_spark.operators.tsmatch import (
            _znorm_literal,
            pattern_match_topk,
        )
        from homelogging_spark.tables import load_table

        L = len(self.PATTERN)
        events = load_table(spark, self.SF, "events")
        grid = events.groupBy(
            (F.col("user_id") % 20).cast("string").alias("series"),
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        ).agg(F.count(F.lit(1)).cast("double").alias("value"))
        out = pattern_match_topk(grid, self.PATTERN, k=self.K).select(
            "key",
            "window_start",
            "window_end",
            quantize("dist").alias("dist"),
        )
        got = out.toPandas()

        zp = _znorm_literal(self.PATTERN)
        zp_sql = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in zp) + "]"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{self.SF}/events.parquet'"
        )
        oracle = f"""
WITH grid AS (
  SELECT CAST(user_id % 20 AS VARCHAR) AS key,
         date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2),
idxd AS (SELECT key, bucket, CAST(floor(epoch(bucket) / 3600) AS BIGINT) AS idx, v FROM grid),
framed AS (
  SELECT key, bucket, idx,
         list(v) OVER w AS win,
         min(idx) OVER w AS first_idx,
         count(*) OVER w AS n
  FROM idxd
  WINDOW w AS (PARTITION BY key ORDER BY idx ROWS BETWEEN {L - 1} PRECEDING AND CURRENT ROW)),
cand AS (SELECT * FROM framed WHERE n = {L} AND first_idx = idx - {L - 1}),
z AS (
  SELECT key, bucket, win,
         list_aggregate(win, 'sum') / {L} AS mu,
         sqrt(list_aggregate(list_transform(win, x -> (x - mu) * (x - mu)), 'sum') / {L}) AS sd,
         CASE WHEN sd > 0 THEN list_transform(win, x -> (x - mu) / sd)
              ELSE list_transform(win, x -> CAST(0.0 AS DOUBLE)) END AS zw
  FROM cand),
scored AS (
  SELECT key,
         bucket - INTERVAL {L - 1} HOURS AS window_start,
         bucket AS window_end,
         sqrt(list_aggregate(
             list_transform(generate_series(1, {L}), i -> (zw[i] - ({zp_sql})[i]) * (zw[i] - ({zp_sql})[i])),
             'sum')) AS dist,
         len(list_filter(win, x -> x != win[1])) AS n_nonflat
  FROM z)
SELECT key, window_start, window_end, {quantize_sql('dist')} AS dist
FROM scored
WHERE n_nonflat > 0
ORDER BY scored.dist ASC, key, window_start
LIMIT {self.K}
"""
        want = con.execute(oracle).df()
        assert len(got) == len(want) == self.K
        import pandas as pd

        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        for c in ("key", "window_start", "window_end", "dist"):
            pd.testing.assert_series_equal(
                got[c], want[c], check_dtype=False, check_exact=True
            )
