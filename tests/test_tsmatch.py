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


class TestNullValueGate:
    def test_null_value_inside_frame_skips_window(self, spark):
        """collect_list drops nulls, so the completeness gate must count
        the VALUE column (r7 ADVICE): a null at hour 2 shrinks __n below
        L for every frame containing it — no null-padded window may
        reach scoring (where its NULL distance would sort into the
        top-k)."""
        import datetime as dt

        rows = [
            ("s", BASE + dt.timedelta(hours=i), None if i == 2 else float(v))
            for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        ]
        df = spark.createDataFrame(
            rows, "series string, bucket timestamp, value double"
        )
        got = pattern_match_topk(df, [1.0, 2.0, 3.0], k=10).collect()
        # identical verdict to physically removing the row: only the
        # hours 3-5 window survives, and no NULL distance appears
        assert {r.window_start.hour for r in got} == {3}
        assert all(r.dist is not None for r in got)


class TestRegistration:
    """The draft this file carried in r7 was promoted verbatim into
    ``plans/registry`` (query ``pattern_match_topk``) in r8 — the full
    windowed-list DuckDB oracle now runs under ``test_oracle_parity``
    and ``tools/check_oracle.py`` (PASS at promotion time, sf0.01).
    This pin keeps the registration itself red/green."""

    def test_registered_with_oracle(self):
        from homelogging_spark.plans.registry import ORACLES, QUERIES

        assert "pattern_match_topk" in QUERIES
        assert "pattern_match_topk" in ORACLES
