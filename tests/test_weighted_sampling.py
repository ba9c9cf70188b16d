"""Efraimidis–Spirakis weighted exactly-k sampling pins (r16,
unit-only — r17 registration candidate, COVERAGE.md r16 moves).

Expected draws are recomputed in pure Python from the same md5
uniforms and the same quantized A-ES key, and the DuckDB twin must
emit identical rows — the registered-query discipline applied at unit
level."""

from __future__ import annotations

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from homelogging_spark.operators.sampling import (
    weighted_group_topk_sample,
    weighted_group_topk_sql,
)

ROWS = [
    # (grp, id, weight) — weights span 3 orders of magnitude; one zero,
    # one NULL-ish (negative) that must never be drawn
    ("a", 1, 100.0), ("a", 2, 1.0), ("a", 3, 10.0), ("a", 4, 0.5),
    ("a", 5, 0.0), ("a", 6, -3.0), ("a", 7, 25.0), ("a", 8, 2.0),
    ("b", 10, 1.0), ("b", 11, 1.0), ("b", 12, 1000.0),
]
K, SALT = 3, "wtopk"


def _u(key: int) -> float:
    hx = hashlib.md5(f"{SALT}|{key}".encode()).hexdigest()
    return int(hx[:13], 16) / float(1 << 52)


def _expected(rows=ROWS):
    out = {}
    for grp in {g for g, _, _ in rows}:
        pos = [(i, w) for g, i, w in rows if g == grp and w > 0]
        if not pos:
            continue
        wmax = max(w for _, w in pos)
        scored = []
        for i, w in pos:
            # r17: group-max-normalized exponent (order-preserving;
            # keeps huge raw weights from flattening the key to 1.0)
            aes = math.floor((_u(i) ** (wmax / w)) * 1e9 + 0.5) / 1e9
            scored.append((-aes, i))
        scored.sort()
        out[grp] = [(i, rank + 1, -neg) for rank, (neg, i) in enumerate(scored[:K])]
    return out


class TestWeightedGroupTopk:
    def _run(self, spark):
        df = spark.createDataFrame(ROWS, "grp string, id long, w double")
        return weighted_group_topk_sample(
            df, "grp", "id", F.col("w"), K, salt=SALT
        ).collect()

    def test_matches_python_reference(self, spark):
        exp = _expected()
        got = {}
        for r in self._run(spark):
            got.setdefault(r.grp, []).append((r.id, r.rank, r.aes_key))
        for grp in exp:
            assert sorted(got[grp], key=lambda t: t[1]) == exp[grp], grp

    def test_nonpositive_weights_never_drawn(self, spark):
        drawn = {r.id for r in self._run(spark)}
        assert 5 not in drawn and 6 not in drawn

    def test_high_weight_dominates(self, spark):
        # w=1000 vs w=1: u^(1/1000) is near 1 for any u — id 12 must
        # lead group b under any uniform draw
        by_b = [r for r in self._run(spark) if r.grp == "b"]
        assert min(by_b, key=lambda r: r.rank).id == 12

    def test_huge_weights_do_not_flatten_key(self, spark):
        """r16 ADVICE: byte-count-sized weights (~1e8-1e9) used to all
        quantize to aes_key 1.0, silently degrading the draw to id
        order. With group-max normalization the keys must spread and
        match the Python reference exactly."""
        rows = [("g", i, float(w)) for i, w in enumerate(
            [3e8, 5e8, 1e9, 2e8, 9e8, 7e8, 4e8, 6e8], start=1
        )]
        df = spark.createDataFrame(rows, "grp string, id long, w double")
        got = weighted_group_topk_sample(
            df, "grp", "id", F.col("w"), K, salt=SALT
        ).collect()
        keys = {r.aes_key for r in got}
        assert len(keys) == len(got), "rank keys collapsed to ties"
        exp = _expected(rows)["g"]
        assert sorted(
            ((r.id, r.rank, r.aes_key) for r in got), key=lambda t: t[1]
        ) == exp

    def test_scale_invariance_power_of_two(self, spark):
        """A-ES ordering is invariant under weight scaling (u^(1/(cw))
        is a monotone transform of u^(1/w)); with the r17 group-max
        normalization the rank KEY itself is scale-invariant — exactly
        so for power-of-two scales, where (c*wmax)/(c*w) is IEEE-equal
        to wmax/w. The drawn (id, rank, key) triples must be
        bit-identical across c in {1, 2^-8, 2^20}."""
        base = None
        for c in (1.0, 2.0 ** -8, 2.0 ** 20):
            df = spark.createDataFrame(
                [(g, i, w * c) for g, i, w in ROWS], "grp string, id long, w double"
            )
            got = sorted(
                (r.grp, r.id, r.rank, r.aes_key)
                for r in weighted_group_topk_sample(
                    df, "grp", "id", F.col("w"), K, salt=SALT
                ).collect()
            )
            if base is None:
                base = got
            else:
                assert got == base, f"scale {c} changed the draw"

    def test_negligible_weight_boundary_quantizes_to_zero_tie(self, spark):
        """r18 (r17 verdict #4): the documented weight-magnitude bound
        at ``sampling.py`` — rows whose relative weight is negligible
        (w_max/w ≳ 1e9) still quantize to an aes_key 0.0 tie — pinned
        AT the boundary, on both engines, not just documented. The
        0.0-tie rows must (a) carry key exactly 0.0, (b) rank strictly
        after every row with a positive key (they lose the draw), and
        (c) tie-break among themselves by id — and the whole draw must
        still match the Python reference and the DuckDB twin
        bit-for-bit, so the boundary is engine-independent."""
        rows = [
            ("g", 1, 1e10), ("g", 2, 1e10 / 2),  # exponent 1 and 2
            # negligible tail: exponents 1e10 and 2e10 — u^exp underflows
            # the 9-decimal quantization to 0.0 for any u < 1
            ("g", 3, 1.0), ("g", 4, 0.5),
        ]
        df = spark.createDataFrame(rows, "grp string, id long, w double")
        got = sorted(
            (r.id, r.rank, r.aes_key)
            for r in weighted_group_topk_sample(
                df, "grp", "id", F.col("w"), 4, salt=SALT
            ).collect()
        )
        keys = dict((i, k) for i, _, k in got)
        assert keys[3] == 0.0 and keys[4] == 0.0
        assert keys[1] > 0.0 and keys[2] > 0.0
        ranks = dict((i, rk) for i, rk, _ in got)
        assert max(ranks[1], ranks[2]) < min(ranks[3], ranks[4])
        assert ranks[3] < ranks[4]  # 0.0 tie broken by id
        # the Python reference truncates at the module K=3; the 4th row
        # is pinned by the explicit rank/key asserts and the DuckDB twin
        exp = _expected(rows)["g"]
        assert sorted(got, key=lambda t: t[1])[: len(exp)] == exp
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE tb AS SELECT * FROM (VALUES "
            + ",".join(f"('{g}', {i}, {w})" for g, i, w in rows)
            + ") v(grp, id, w)"
        )
        duck = sorted(
            (r[1], r[4], r[3])
            for r in con.execute(
                weighted_group_topk_sql("tb", "grp", "id", "w", 4, salt=SALT)
            ).fetchall()
        )
        assert got == duck

    def test_duckdb_twin_identical(self, spark):
        spark_rows = sorted(
            (r.grp, r.id, r.rank, r.aes_key) for r in self._run(spark)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"('{g}', {i}, {w})" for g, i, w in ROWS)
            + ") v(grp, id, w)"
        )
        sql = weighted_group_topk_sql("t", "grp", "id", "w", K, salt=SALT)
        duck_rows = sorted(
            (r[0], r[1], r[4], r[3])
            for r in con.execute(sql).fetchall()
        )
        assert spark_rows == duck_rows
