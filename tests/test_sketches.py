"""KMV / count-min sketch pins.

The properties that make these sketches trustworthy at 100 TB, each
pinned mechanically:

- KMV merge closure: sketch(A) ⊎ sketch(B) == sketch(A ∪ B) EXACTLY
  (array equality) — per-day sketches roll up without rescans.
- KMV exactness below saturation, bounded error above it.
- Overlap estimates track exact Jaccard/intersection within the ~1/√k
  band on a constructed overlap.
- Count-min one-sided error: cm_est ≥ n_exact for EVERY key, with
  equality when the register table is collision-free.
- Count-min merge = register-wise sum, exactly.
- The ``*_sql`` twins reproduce the Spark values bit-for-bit in DuckDB
  (pre-certifying the r8 driver-oracle registration).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from homelogging_spark.operators import sketches as sk


def _docs(spark, groups):
    """rows (grp, key) from {group: [keys]}."""
    rows = [(g, k) for g, keys in groups.items() for k in keys]
    return spark.createDataFrame(rows, "grp string, key string")


class TestKmv:
    def test_exact_below_saturation(self, spark):
        df = _docs(spark, {"a": [f"k{i}" for i in range(10)] * 3})
        out = sk.kmv_sketch(df, "key", ["grp"], k=64).collect()
        assert len(out) == 1
        assert out[0].n_kept == 10  # duplicates collapse
        est = (
            sk.kmv_sketch(df, "key", ["grp"], k=64)
            .select(sk.kmv_estimate(F.col("kmv"), 64).alias("e"))
            .collect()[0]
            .e
        )
        assert est == 10.0

    def test_estimate_above_saturation(self, spark):
        n, k = 2000, 64
        df = _docs(spark, {"a": [f"key{i}" for i in range(n)]})
        est = (
            sk.kmv_sketch(df, "key", ["grp"], k=k)
            .select(sk.kmv_estimate(F.col("kmv"), k).alias("e"))
            .collect()[0]
            .e
        )
        # standard error ~ n/sqrt(k-2) ≈ 254; allow 4 sigma
        assert abs(est - n) < 4 * n / (k - 2) ** 0.5

    def test_merge_closure(self, spark):
        a = [f"a{i}" for i in range(300)]
        b = [f"b{i}" for i in range(200)] + a[:100]  # overlap
        k = 32
        sa = sk.kmv_sketch(_docs(spark, {"g": a}), "key", [], k=k)
        sb = sk.kmv_sketch(_docs(spark, {"g": b}), "key", [], k=k)
        both = sa.crossJoin(sb.select(F.col("kmv").alias("kmv2"))).select(
            sk.kmv_merge_arrays(F.col("kmv"), F.col("kmv2"), k).alias("m")
        )
        merged = both.collect()[0].m
        direct = (
            sk.kmv_sketch(_docs(spark, {"g": a + b}), "key", [], k=k)
            .collect()[0]
            .kmv
        )
        assert merged == direct  # exact array equality

    def test_overlap_estimates(self, spark):
        # |A| = |B| = 600, |A ∩ B| = 200 → union 1000, jaccard 0.2
        shared = [f"s{i}" for i in range(200)]
        a = shared + [f"a{i}" for i in range(400)]
        b = shared + [f"b{i}" for i in range(400)]
        k = 256
        s = sk.kmv_sketch(
            _docs(spark, {"A": a, "B": b}), "key", ["grp"], k=k
        )
        row = sk.kmv_overlap(s, "grp", k=k).collect()[0]
        assert (row.group_a, row.group_b) == ("A", "B")
        assert abs(row.jaccard_est - 0.2) < 4 * 0.5 / k**0.5
        assert abs(row.union_est - 1000) < 4 * 1000 / (k - 2) ** 0.5
        assert abs(row.intersection_est - 200) < 0.35 * 200 + 40

    def test_overlap_plans_bnlj_not_cartesian(self, spark):
        """The non-equi pair join must plan as a broadcast nested-loop
        over the dim-sized sketch table. A CartesianProduct here costs
        |partsA|*|partsB| tasks of pure scheduling overhead (measured
        ~10 s for 20 groups on local[32]) and is the one join shape the
        repo-wide anti-pattern sweep forbids."""
        df = _docs(spark, {"A": ["x", "y"], "B": ["y", "z"]})
        s = sk.kmv_sketch(df, "key", ["grp"], k=8)
        plan = sk.kmv_overlap(s, "grp", k=8)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan

    def test_estimate_sql_twin_bit_identical(self, spark):
        df = _docs(spark, {"a": [f"key{i}" for i in range(500)]})
        k = 64
        spark_rows = (
            sk.kmv_sketch(df, "key", ["grp"], k=k)
            .select("kmv", sk.kmv_estimate(F.col("kmv"), k).alias("e"))
            .collect()
        )
        kmv, e_spark = spark_rows[0].kmv, spark_rows[0].e
        con = duckdb.connect()
        # build the same sketch in DuckDB from scratch, then estimate
        keys = ", ".join(f"('key{i}')" for i in range(500))
        e_sql = sk.kmv_estimate_sql("l", k)
        got = con.execute(
            f"""
            WITH raw(key) AS (VALUES {keys}),
            h AS (SELECT DISTINCT {sk._hash52_sql('key', 'kmv')} AS h FROM raw),
            s AS (SELECT list_sort(list(h)) AS fl FROM h),
            t AS (SELECT list_slice(fl, 1, {k}) AS l FROM s)
            SELECT l, {e_sql} FROM t
            """
        ).fetchone()
        assert list(got[0]) == list(kmv)
        assert got[1] == e_spark  # identical doubles


class TestCountMin:
    DEPTH, WIDTH = 4, 512

    def _skewed(self, spark):
        rows = (
            [("hot",)] * 400
            + [("warm",)] * 120
            + [(f"tail{i}",) for i in range(300)]
        )
        return spark.createDataFrame(rows, "key string")

    def test_never_undercounts(self, spark):
        df = self._skewed(spark)
        sketch = sk.cm_sketch(df, "key", self.DEPTH, self.WIDTH)
        exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
        est = sk.cm_query(
            sketch, exact.select("key"), "key", self.DEPTH, self.WIDTH
        )
        rows = exact.join(est, "key").collect()
        assert len(rows) == 302
        assert all(r.cm_est >= r.n for r in rows)

    def test_register_count_bounded(self, spark):
        sketch = sk.cm_sketch(self._skewed(spark), "key", self.DEPTH, self.WIDTH)
        assert sketch.count() <= self.DEPTH * self.WIDTH
        # total per hash row conserves the input row count
        per_row = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
        assert {r.s for r in per_row} == {820}

    def test_merge_is_register_sum(self, spark):
        df = self._skewed(spark)
        s_all = sk.cm_sketch(df, "key", self.DEPTH, self.WIDTH)
        # split deterministically by key: hot vs rest
        hot = df.where("key = 'hot'")
        rest = df.where("key != 'hot'")
        merged = sk.cm_merge(
            sk.cm_sketch(hot, "key", self.DEPTH, self.WIDTH),
            sk.cm_sketch(rest, "key", self.DEPTH, self.WIDTH),
        )
        a = {(r.row, r.col): r.cnt for r in s_all.collect()}
        m = {(r.row, r.col): r.cnt for r in merged.collect()}
        assert a == m

    def test_heavy_hitters_report(self, spark):
        out = sk.heavy_hitters_report(
            self._skewed(spark), "key", k=2, depth=self.DEPTH, width=self.WIDTH
        ).collect()
        assert [(r.key, r.n_exact) for r in out] == [("hot", 400), ("warm", 120)]
        assert all(r.overestimate >= 0 for r in out)

    def test_register_coords_sql_twin(self, spark):
        """The DuckDB coordinate expression places every key in the same
        (row, col) cells as the Spark build — register tables built by
        the two engines are identical."""
        df = self._skewed(spark).distinct()
        coords_spark = sorted(
            (r.key, r.row, r.col)
            for r in df.select(
                "key",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(rr).cast("int").alias("row"),
                                sk._cm_col(F.col("key"), rr, self.WIDTH, "cm")
                                .cast("int")
                                .alias("col"),
                            )
                            for rr in range(self.DEPTH)
                        ]
                    )
                ).alias("c"),
            )
            .select("key", "c.row", "c.col")
            .collect()
        )
        con = duckdb.connect()
        keys = ", ".join(
            f"('{k}')" for k in sorted({r[0] for r in coords_spark})
        )
        sql_rows = []
        for rr in range(self.DEPTH):
            got = con.execute(
                f"WITH raw(key) AS (VALUES {keys}) "
                f"SELECT key, {rr}, {sk._cm_col_sql('key', rr, self.WIDTH, 'cm')} "
                f"FROM raw"
            ).fetchall()
            sql_rows.extend((k, r, c) for k, r, c in got)
        assert sorted(sql_rows) == coords_spark


class TestBloom:
    M, J = 1 << 12, 5

    def _keys(self, spark, prefix, n):
        return spark.createDataFrame(
            [(f"{prefix}{i}",) for i in range(n)], "key string"
        )

    def test_no_false_negatives(self, spark):
        """Every inserted key probes maybe_present=True — the Bloom
        guarantee that makes the filter safe as a dedup pre-gate."""
        inserted = self._keys(spark, "in", 500)
        filt = sk.bloom_build(inserted, "key", self.M, self.J)
        out = sk.bloom_contains(filt, inserted, "key", self.M, self.J).collect()
        assert len(out) == 500
        assert all(r.maybe_present for r in out)

    def test_false_positive_rate_in_band(self, spark):
        """Non-members mostly probe absent: with n=500, m=4096, j=5 the
        theoretical FPR is (1-e^{-jn/m})^j ≈ 2.9%; allow generous slack
        (deterministic hashes — this pins a fixed value, no flake)."""
        filt = sk.bloom_build(self._keys(spark, "in", 500), "key", self.M, self.J)
        out = sk.bloom_contains(
            filt, self._keys(spark, "out", 1000), "key", self.M, self.J
        ).collect()
        fpr = sum(r.maybe_present for r in out) / len(out)
        assert fpr < 0.10

    def test_merge_closure(self, spark):
        """bloom_merge(build(A), build(B)) == build(A ∪ B) — exact word
        table equality, the per-day rollup contract."""
        a, b = self._keys(spark, "a", 300), self._keys(spark, "b", 200)
        merged = sk.bloom_merge(
            sk.bloom_build(a, "key", self.M, self.J),
            sk.bloom_build(b, "key", self.M, self.J),
        )
        direct = sk.bloom_build(a.unionByName(b), "key", self.M, self.J)
        as_map = lambda df: {r.word: r.bits for r in df.collect()}
        assert as_map(merged) == as_map(direct)

    def test_word_table_bounded_and_sign_bit_free(self, spark):
        filt = sk.bloom_build(self._keys(spark, "x", 5000), "key", self.M, self.J)
        rows = filt.collect()
        assert len(rows) <= -(-self.M // 63)  # ceil(m/63)
        assert all(r.bits > 0 for r in rows)  # bit 63 never set

    def test_build_sql_twin_bit_identical(self, spark):
        """DuckDB replicates the word table exactly from bloom_word_sql
        — pre-certifying an oracle-checked registration."""
        keys = [f"k{i}" for i in range(200)]
        filt = {
            r.word: r.bits
            for r in sk.bloom_build(
                spark.createDataFrame([(k,) for k in keys], "key string"),
                "key",
                self.M,
                self.J,
            ).collect()
        }
        con = duckdb.connect()
        vals = ", ".join(f"('{k}')" for k in keys)
        coords = sk.bloom_word_sql("key", self.J, self.M, "bloom")
        got = dict(
            con.execute(
                f"""
                WITH raw(key) AS (VALUES {vals}),
                c AS (SELECT unnest({coords}) AS wm FROM raw)
                SELECT wm.word, bit_or(wm.mask) FROM c GROUP BY 1
                """
            ).fetchall()
        )
        assert got == filt

    def test_probe_broadcasts_filter(self, spark):
        filt = sk.bloom_build(self._keys(spark, "x", 100), "key", self.M, self.J)
        plan = (
            sk.bloom_contains(filt, self._keys(spark, "q", 10), "key", self.M, self.J)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_inline_probe_matches_panel_form(self, spark):
        """bloom_contains_inline (j broadcast joins, streaming-legal) ==
        bloom_contains (explode+groupBy panel form) verdict-for-verdict,
        and it preserves the input's row identity and extra columns."""
        filt = sk.bloom_build(self._keys(spark, "in", 300), "key", self.M, self.J)
        panel = self._keys(spark, "in", 150).unionByName(
            self._keys(spark, "out", 150)
        ).withColumn("extra", F.length("key"))
        inline = {
            r.key: (r.maybe_present, r.extra)
            for r in sk.bloom_contains_inline(
                panel, filt, "key", self.M, self.J
            ).collect()
        }
        grouped = {
            r.key: r.maybe_present
            for r in sk.bloom_contains(
                filt, panel.select("key"), "key", self.M, self.J
            ).collect()
        }
        assert len(inline) == 300
        assert {k: v[0] for k, v in inline.items()} == grouped
        assert all(v[1] == len(k) for k, v in inline.items())


class TestKmvSaltedSelection:
    def test_output_invariant_under_n_salts(self, spark):
        """The two-stage salted k-selection is EXACT for every n_salts:
        each global minimum is in its own salt bucket's top-k, so the
        survivor union always contains the answer."""
        df = _docs(spark, {"a": [f"k{i}" for i in range(500)],
                           "b": [f"x{i}" for i in range(30)]})
        base = {
            r.grp: (list(r.kmv), r.n_kept)
            for r in sk.kmv_sketch(df, "key", ["grp"], k=32, n_salts=1).collect()
        }
        for s in (2, 32, 1000):
            got = {
                r.grp: (list(r.kmv), r.n_kept)
                for r in sk.kmv_sketch(
                    df, "key", ["grp"], k=32, n_salts=s
                ).collect()
            }
            assert got == base, f"n_salts={s}"
        # unsaturated group is the exact distinct set at every dial
        assert base["b"][1] == 30

    def test_no_group_build_has_no_unsalted_global_window(self, spark):
        """With no group columns the FIRST selection stage must still
        partition by the salt — the raw distinct-hash stream never
        funnels through a single task's sort (the curriculum_order
        lesson). Only the bounded survivor re-selection (≤ n_salts·k
        rows) may run unpartitioned."""
        df = _docs(spark, {"a": [f"k{i}" for i in range(100)]})
        plan = (
            sk.kmv_sketch(df, "key", [], k=8, n_salts=16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # stage 1 partitions on (hash % n_salts), and Spark's
        # WindowGroupLimit prunes to top-k in a Partial phase BEFORE the
        # exchange — the selection is map-side, the shuffle carries at
        # most k rows per salt bucket per task
        assert "% 16)], [__h" in plan and "row_number(), 8, Partial" in plan
        # stage 2 (the unpartitioned re-selection) exists but only over
        # the bounded survivors
        assert plan.count("Window [row_number()") == 2


class TestR8Registrations:
    """The r7 drafts (kmv_source_overlap, token_heavy_hitters) were
    promoted verbatim into ``plans/llm_registry`` in r8, alongside
    ``bloom_seen_probe`` — their full DuckDB oracles now run under
    ``test_oracle_parity`` (sf0.001) and ``tools/check_oracle.py``
    (sf0.01, both PASS at promotion time). This pin keeps the
    registration itself red/green."""

    def test_sketch_queries_registered_with_oracles(self):
        from homelogging_spark.plans.llm_registry import LLM_ORACLES, LLM_QUERIES

        for name in ("kmv_source_overlap", "token_heavy_hitters", "bloom_seen_probe"):
            assert name in LLM_QUERIES and name in LLM_ORACLES, name


class TestKmvOverlapCandidates:
    def test_candidates_form_equals_all_pairs_on_overlapping(self, spark):
        """candidates_only drops EXACTLY the pairs with zero shared
        sketch hashes (the sketch's no-evidence floor); every emitted
        row is identical to the all-pairs form."""
        groups = {
            "a": [f"s{i}" for i in range(50)] + [f"a{i}" for i in range(50)],
            "b": [f"s{i}" for i in range(50)] + [f"b{i}" for i in range(50)],
            "c": [f"c{i}" for i in range(80)],      # disjoint from all
            "d": [f"b{i}" for i in range(25)] + [f"d{i}" for i in range(30)],
        }
        s = sk.kmv_sketch(_docs(spark, groups), "key", ["grp"], k=64)
        full = {
            (r.group_a, r.group_b): r
            for r in sk.kmv_overlap(s, "grp", k=64).collect()
        }
        cand = {
            (r.group_a, r.group_b): r
            for r in sk.kmv_overlap(
                s, "grp", k=64, candidates_only=True
            ).collect()
        }
        # every candidate row matches the all-pairs row exactly
        for key, row in cand.items():
            assert tuple(row) == tuple(full[key])
        # the dropped pairs are exactly those with zero sample overlap
        dropped = set(full) - set(cand)
        assert dropped and all(
            full[p].n_both_in_sample == 0 for p in dropped
        )
        # and every zero-overlap-evidence pair was dropped
        assert all(
            p in cand for p in full if full[p].n_both_in_sample > 0
        )
