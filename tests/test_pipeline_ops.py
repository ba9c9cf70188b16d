"""Unit tests for the training-pipeline assembly tier: sequence packing
(``operators/packing.py``) and deterministic sampling
(``operators/sampling.py``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.packing import pack_greedy, pack_stats
from homelogging_spark.operators.sampling import (
    group_topk_sample,
    mixture_weights,
    stratified_hash_sample,
)


def _pack_rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    out = pack_greedy(df, **kw)
    return {r.doc_id: r for r in out.collect()}


class TestPackGreedy:
    def test_basic_first_fit(self, spark):
        # one shard: docs of 300+200 fit a 512 pack, 400 opens the next
        rows = [(0, 300), (8, 200), (16, 400)]
        by_id = _pack_rows(spark, rows, capacity=512, n_shards=8)
        assert (by_id[0].pack_id, by_id[0].pack_pos, by_id[0].pack_fill) == (0, 1, 300)
        assert (by_id[8].pack_id, by_id[8].pack_pos, by_id[8].pack_fill) == (0, 2, 500)
        assert (by_id[16].pack_id, by_id[16].pack_pos, by_id[16].pack_fill) == (1, 1, 400)

    def test_oversize_doc_gets_own_pack(self, spark):
        # a doc longer than capacity is NOT dropped: it opens its own
        # pack with fill > capacity (callers truncate/split upstream)
        rows = [(0, 100), (8, 9000), (16, 100)]
        by_id = _pack_rows(spark, rows, capacity=512, n_shards=8)
        assert by_id[8].pack_id == 1 and by_id[8].pack_fill == 9000
        # the oversize pack is closed immediately — next doc starts fresh
        assert by_id[16].pack_id == 2 and by_id[16].pack_fill == 100
        stats = {
            r.pack_id: r
            for r in pack_stats(
                pack_greedy(
                    spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint"),
                    capacity=512,
                    n_shards=8,
                ),
                512,
            ).collect()
        }
        assert stats[1].waste_frac == 0.0  # clamped at capacity

    def test_exact_fit_boundary(self, spark):
        # fill == capacity exactly: next doc must open a new pack only
        # if it overflows; an exact fit stays
        rows = [(0, 256), (8, 256), (16, 1)]
        by_id = _pack_rows(spark, rows, capacity=512, n_shards=8)
        assert by_id[8].pack_id == 0 and by_id[8].pack_fill == 512
        assert by_id[16].pack_id == 1

    def test_shards_pack_independently(self, spark):
        # same token sequence in two shards → identical per-shard packing
        rows = [(0, 300), (8, 300), (1, 300), (9, 300)]
        out = pack_greedy(
            spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint"),
            capacity=512,
            n_shards=8,
        ).collect()
        shard0 = sorted((r.doc_id, r.pack_id, r.pack_pos) for r in out if r.shard == 0)
        shard1 = sorted((r.doc_id - 1, r.pack_id, r.pack_pos) for r in out if r.shard == 1)
        assert shard0 == shard1 == [(0, 0, 1), (8, 1, 1)]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id bigint, n_tokens bigint")
        assert pack_greedy(df).count() == 0

    def test_determinism_across_repartition(self, spark):
        rows = [(i, 50 + (i * 37) % 400) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        a = sorted(map(tuple, pack_greedy(df).collect()))
        b = sorted(map(tuple, pack_greedy(df.repartition(7)).collect()))
        assert a == b


class TestSampling:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
        return spark.createDataFrame(rows, "doc_id bigint, lang string")

    def test_stratified_rate_accuracy(self, spark, docs):
        out = stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.5, "de": 0.1}, default_rate=0.0
        )
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # 1000 docs per stratum; Bernoulli(p) with n=1000 → ±5σ bounds
        assert 400 <= counts["en"] <= 600
        assert 55 <= counts.get("de", 0) <= 155
        assert "zh" not in counts  # default rate 0 drops the stratum

    def test_stratified_deterministic_and_repartition_stable(self, spark, docs):
        kw = dict(rates={"en": 0.3, "de": 0.2}, default_rate=0.1)
        a = sorted(r.doc_id for r in stratified_hash_sample(docs, "doc_id", "lang", **kw).collect())
        b = sorted(
            r.doc_id
            for r in stratified_hash_sample(
                docs.repartition(13), "doc_id", "lang", **kw
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_stratified_nested_subsample(self, spark, docs):
        # u < 0.1 selection is a subset of u < 0.3 (same salt) — the
        # composability the exposed u column exists for
        big = set(
            r.doc_id
            for r in stratified_hash_sample(docs, "doc_id", "lang", {}, 0.3).collect()
        )
        small = set(
            r.doc_id
            for r in stratified_hash_sample(docs, "doc_id", "lang", {}, 0.1).collect()
        )
        assert small <= big

    def test_group_topk_exact_k(self, spark, docs):
        out = group_topk_sample(docs, "lang", "doc_id", k=7)
        counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 7, "de": 7, "zh": 7}

    def test_group_topk_deterministic(self, spark, docs):
        a = sorted((r.lang, r.rank, r.doc_id) for r in group_topk_sample(docs, "lang", "doc_id", 5).collect())
        b = sorted(
            (r.lang, r.rank, r.doc_id)
            for r in group_topk_sample(docs.repartition(11), "lang", "doc_id", 5).collect()
        )
        assert a == b

    def test_group_topk_small_group(self, spark):
        # a group smaller than k returns all its rows, ranks 1..n
        rows = [(1, "en"), (2, "en"), (3, "de")]
        df = spark.createDataFrame(rows, "doc_id bigint, lang string")
        out = group_topk_sample(df, "lang", "doc_id", k=10).collect()
        assert sorted(r.doc_id for r in out) == [1, 2, 3]

    def test_mixture_weights_shares(self, spark, docs):
        tokens = (F.col("doc_id") % 100 + 1).cast("bigint")
        out = mixture_weights(docs, "lang", tokens, {"en": 0.6, "de": 0.2, "zh": 0.2})
        rows = {r.lang: r for r in out.collect()}
        total = sum(r.n_tokens for r in rows.values())
        for lang, share in [("en", 0.6), ("de", 0.2), ("zh", 0.2)]:
            expected = share * total / rows[lang].n_tokens
            assert rows[lang].rate == pytest.approx(expected)
            assert rows[lang].epochs == pytest.approx(max(expected, 1.0))
        # rate * n_tokens sums back to the total budget
        assert sum(r.rate * r.n_tokens for r in rows.values()) == pytest.approx(total)


class TestClusterBalancedSample:
    """sampling.cluster_balanced_sample — nearest-centroid assignment +
    deterministic exactly-k per cluster with a pre-sample census."""

    @pytest.fixture(scope="class")
    def fixture(self, spark):
        from homelogging_spark.operators.sampling import cluster_balanced_sample

        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
             (2, [0.0, 0.0, 1.0, 0.0])],
            "vec_id bigint, embedding array<double>",
        )
        # well-separated synthetic clusters: 30 / 5 / 10 members
        rows = (
            [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(30)]
            + [(100 + i, [0.0, 1.0, 0.001 * i, 0.0]) for i in range(5)]
            + [(200 + i, [0.001 * i, 0.0, 1.0, 0.0]) for i in range(10)]
        )
        corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        return corpus, cents, cluster_balanced_sample

    def test_cut_and_keep_all_branches_with_census(self, spark, fixture):
        corpus, cents, cbal = fixture
        out = cbal(corpus, cents, k_per_cell=8).collect()
        by_cell = {}
        for r in out:
            by_cell.setdefault(r.cell, []).append(r)
        # big cells cut to k, small cell kept whole; census is PRE-sample
        assert len(by_cell[0]) == 8 and all(r.cell_n == 30 for r in by_cell[0])
        assert len(by_cell[1]) == 5 and all(r.cell_n == 5 for r in by_cell[1])
        assert len(by_cell[2]) == 8 and all(r.cell_n == 10 for r in by_cell[2])
        # ranks are 1..n_kept within each cell
        for cell, rows in by_cell.items():
            assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))

    def test_assignment_is_nearest_centroid(self, spark, fixture):
        corpus, cents, cbal = fixture
        out = cbal(corpus, cents, k_per_cell=100).collect()
        for r in out:
            assert r.cell == (r.vec_id // 100), r

    def test_deterministic_under_repartition(self, spark, fixture):
        corpus, cents, cbal = fixture
        a = sorted((r.vec_id, r.cell, r.cell_n, r.rank)
                   for r in cbal(corpus, cents, 4).collect())
        b = sorted((r.vec_id, r.cell, r.cell_n, r.rank)
                   for r in cbal(corpus.repartition(7), cents, 4).collect())
        assert a == b and len(a) == 4 + 4 + 4

    def test_rejects_bad_k(self, spark, fixture):
        corpus, cents, cbal = fixture
        with pytest.raises(ValueError, match="k_per_cell"):
            cbal(corpus, cents, 0)


class TestWeightedSampling:
    def test_kept_token_mass_tracks_budget(self, spark):
        from homelogging_spark.operators.sampling import weighted_hash_sample

        rows = [(i, 10 + (i * 13) % 190) for i in range(4000)]  # w in [10, 200)
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        rate = 0.002  # E[kept w] = sum(w * min(1, rate*w)) — no cap hit here
        out = weighted_hash_sample(df, "doc_id", F.col("w"), rate)
        got = out.agg(F.sum("w").alias("s")).collect()[0].s
        exp = sum(w * min(1.0, rate * w) for _, w in rows)
        assert abs(got - exp) / exp < 0.15  # ±5sigma-ish at this n

    def test_heavier_rows_kept_more_often(self, spark):
        from homelogging_spark.operators.sampling import weighted_hash_sample

        rows = [(i, 10 if i % 2 == 0 else 200) for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        out = weighted_hash_sample(df, "doc_id", F.col("w"), 0.003).collect()
        light = sum(1 for r in out if r.w == 10)
        heavy = sum(1 for r in out if r.w == 200)
        # p=0.03 vs p=0.6 → heavy kept ~20x more often
        assert heavy > 10 * max(light, 1)

    def test_deterministic_and_p_capped(self, spark):
        from homelogging_spark.operators.sampling import weighted_hash_sample

        rows = [(i, 10_000) for i in range(50)]  # rate*w >> 1 → p capped at 1
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        out = weighted_hash_sample(df, "doc_id", F.col("w"), 0.01)
        got = out.collect()
        assert len(got) == 50 and all(r.p == 1.0 for r in got)
        again = weighted_hash_sample(df.repartition(7), "doc_id", F.col("w"), 0.01)
        assert sorted(r.doc_id for r in again.collect()) == list(range(50))


class TestSplitAssign:
    FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_cluster_coherent_and_deterministic(self, spark):
        """Keying by cluster_id must give every cluster member the same
        split (the leakage-safety property), independent of partitioning
        and of which other rows exist."""
        from homelogging_spark.operators.sampling import split_assign

        rows = [(i, i % 40) for i in range(400)]  # 40 clusters of 10
        df = spark.createDataFrame(rows, "doc_id bigint, cluster_id bigint")
        out = df.withColumn(
            "split", split_assign(F.col("cluster_id"), self.FRACS)
        )
        per_cluster = (
            out.groupBy("cluster_id")
            .agg(F.count_distinct("split").alias("n"))
            .collect()
        )
        assert all(r.n == 1 for r in per_cluster)
        # subset + repartition invariance: each key's split is a pure
        # function of (key, salt)
        sub = df.where(F.col("doc_id") % 3 == 0).repartition(7)
        again = {
            r.cluster_id: r.split
            for r in sub.withColumn(
                "split", split_assign(F.col("cluster_id"), self.FRACS)
            ).select("cluster_id", "split").distinct().collect()
        }
        full = {r.cluster_id: r.split for r in out.select("cluster_id", "split").distinct().collect()}
        assert all(full[k] == v for k, v in again.items())

    def test_fractions_approximate_and_all_present(self, spark):
        from homelogging_spark.operators.sampling import split_assign

        df = spark.range(5000).select(F.col("id").alias("k"))
        got = {
            r.split: r.n
            for r in df.withColumn("split", split_assign(F.col("k"), self.FRACS))
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert set(got) == {"train", "val", "test"}
        assert abs(got["train"] / 5000 - 0.8) < 0.03
        assert abs(got["val"] / 5000 - 0.1) < 0.02
        assert abs(got["test"] / 5000 - 0.1) < 0.02

    def test_validation(self, spark):
        from homelogging_spark.operators.sampling import split_assign

        with pytest.raises(ValueError, match="sum to 1.0"):
            split_assign(F.col("k"), {"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="at least 2"):
            split_assign(F.col("k"), {"a": 1.0})
        with pytest.raises(ValueError, match="must be > 0"):
            split_assign(F.col("k"), {"a": 0.8, "b": -0.1, "c": 0.3})
        with pytest.raises(ValueError, match="must be > 0"):
            split_assign(F.col("k"), {"a": 0.9, "b": 0.0, "c": 0.1})

    def test_null_key_yields_null_split_both_forms(self, spark):
        """A NULL key must yield a NULL split, not silently land in the
        LAST split (NULL uniform → every band predicate NULL → otherwise
        fires): null cluster_ids concentrating in 'test' is the exact
        leakage/skew hazard the operator exists to prevent."""
        import duckdb

        from homelogging_spark.operators.sampling import (
            split_assign,
            split_assign_sql,
        )

        df = spark.createDataFrame(
            [(1, 7), (2, None), (3, 9)], "doc_id bigint, k bigint"
        )
        got = {
            r.doc_id: r.split
            for r in df.withColumn(
                "split", split_assign(F.col("k"), self.FRACS)
            ).collect()
        }
        assert got[2] is None and got[1] is not None and got[3] is not None
        sql = (
            f"SELECT k, {split_assign_sql('k', self.FRACS)} AS split "
            "FROM (VALUES (7), (NULL), (9)) t(k)"
        )
        via_sql = dict(duckdb.sql(sql).fetchall())
        assert via_sql[None] is None and via_sql[7] == got[1] and via_sql[9] == got[3]

    def test_sql_name_escaping(self, spark):
        """A split name containing a single quote must produce valid SQL
        (quotes doubled), not broken/injectable text."""
        import duckdb

        from homelogging_spark.operators.sampling import split_assign_sql

        fr = {"train's": 0.8, "b": 0.1, "it's": 0.1}
        sql = f"SELECT {split_assign_sql('k', fr)} AS split FROM (VALUES (7)) t(k)"
        (val,) = duckdb.sql(sql).fetchone()
        assert val in {"train's", "b", "it's"}

    def test_sql_twin_matches(self, spark):
        """split_assign_sql must agree with the Column form row for row.
        The SQL twin is DuckDB dialect (uniform_sql's hex cast), so the
        cross-check runs on DuckDB against Spark-computed rows — the
        same comparison the driver oracle performs, pinned here at unit
        granularity with raw integer keys."""
        import duckdb

        from homelogging_spark.operators.sampling import (
            split_assign,
            split_assign_sql,
        )

        df = spark.range(500).select(F.col("id").alias("k"))
        via_col = {
            r.k: r.split
            for r in df.withColumn(
                "split", split_assign(F.col("k"), self.FRACS)
            ).collect()
        }
        sql = (
            f"SELECT k, {split_assign_sql('k', self.FRACS)} AS split "
            "FROM range(500) t(k)"
        )
        via_sql = {int(k): s for k, s in duckdb.sql(sql).fetchall()}
        assert via_col == via_sql


class TestContamination:
    def test_known_overlap_flagged(self, spark):
        from homelogging_spark.operators.textops import benchmark_contamination

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id bigint, text string",
        )
        corpus = spark.createDataFrame(
            [
                # 4 shared trigrams (alpha beta gamma / beta gamma delta /
                # gamma delta epsilon / delta epsilon zeta) -> flagged
                (1, "alpha beta gamma delta epsilon zeta eta"),
                # only 1 shared trigram -> below min_shared=3
                (2, "alpha beta gamma completely different text here"),
                # no overlap at all
                (3, "one two three four five six seven"),
            ],
            "doc_id bigint, text string",
        )
        out = {r.corpus_id: r for r in benchmark_contamination(corpus, bench).collect()}
        assert list(out) == [1]
        assert out[1].n_bench_hits == 1
        assert out[1].max_shared == 4
        assert out[1].first_bench_id == 100

    def test_max_gram_df_drops_stop_grams(self, spark):
        """Stop-gram guard: a gram every corpus doc shares fans the join
        out D*B and carries no signal. With the cutoff, docs whose only
        overlap is the stop-gram are no longer flagged; genuinely
        contaminated docs (rare grams) still are. Cutoff off -> output
        identical to the unguarded form."""
        from homelogging_spark.operators.textops import benchmark_contamination

        boiler = "the quick brown fox jumps over"  # in EVERY corpus doc
        secret = "zanzibar quorum hexadecimal lattice preamble osmosis"
        bench = spark.createDataFrame(
            [(100, boiler + " " + secret)], "doc_id bigint, text string"
        )
        corpus = spark.createDataFrame(
            [(i, boiler + f" filler{i} padding") for i in range(1, 9)]
            + [(9, boiler + " " + secret)],  # the truly contaminated doc
            "doc_id bigint, text string",
        )
        unguarded = {
            r.corpus_id
            for r in benchmark_contamination(corpus, bench, min_shared=3).collect()
        }
        assert unguarded == {1, 2, 3, 4, 5, 6, 7, 8, 9}  # boilerplate flags all
        guarded = {
            r.corpus_id
            for r in benchmark_contamination(
                corpus, bench, min_shared=3, max_gram_df=3
            ).collect()
        }
        assert guarded == {9}  # only the rare-gram contamination survives
        # cutoff high enough to catch nothing -> identical to unguarded
        same = {
            r.corpus_id
            for r in benchmark_contamination(
                corpus, bench, min_shared=3, max_gram_df=1000
            ).collect()
        }
        assert same == unguarded
        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_gram_df"):
            benchmark_contamination(corpus, bench, max_gram_df=0)

    def test_multiple_bench_hits_counted(self, spark):
        from homelogging_spark.operators.textops import benchmark_contamination

        shared = "red orange yellow green blue indigo"
        bench = spark.createDataFrame(
            [(100, shared), (200, shared + " violet")],
            "doc_id bigint, text string",
        )
        corpus = spark.createDataFrame(
            [(1, shared + " ultraviolet")], "doc_id bigint, text string"
        )
        out = benchmark_contamination(corpus, bench).collect()
        assert len(out) == 1 and out[0].n_bench_hits == 2
        assert out[0].first_bench_id == 100


class TestDedupLines:
    def test_first_occurrence_kept_in_order(self, spark):
        from homelogging_spark.operators.textops import dedup_lines

        text = "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter"
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        r = dedup_lines(df).first()
        assert r.n_lines == 7 and r.n_unique_lines == 4
        assert r.line_deduped == "nav\nbody one\nbody two\nfooter"

    def test_sql_twin_matches(self, spark):
        import duckdb

        from homelogging_spark.operators.textops import dedup_lines, dedup_lines_sql

        rows = [
            (1, "a\nb\na\nb\nc"),
            (2, "single line"),
            (3, "\n\nx\n\n"),  # empty lines dedup too
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.n_lines, r.n_unique_lines, r.line_deduped)
            for r in dedup_lines(df).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{t}')".replace("\n", "' || chr(10) || '") for i, t in rows
            )
            + ") t(doc_id, text)"
        )
        via_sql = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(dedup_lines_sql("d")).fetchall()
        }
        assert got == via_sql
