"""Unit tests for the real-BPE tokenizer (``operators/tokenize``):
the wrapped-string replace fold, learner determinism on a hand-computed
corpus (Sennrich 2016's low/lower example), expression-vs-pandas-UDF
parity, and edge cases the driver corpus can't exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.tokenize import (
    DEFAULT_MERGES,
    SEP,
    bpe_token_count,
    bpe_token_count_sql,
    bpe_token_count_udf,
    learn_bpe_merges,
    word_bpe_tokens,
)


def _tokens(spark, word, merges):
    return (
        spark.range(1)
        .select(word_bpe_tokens(F.lit(word), merges).alias("t"))
        .collect()[0]["t"]
    )


class TestMergeFold:
    def test_single_replace_pass_equals_exhaustive_merge(self, spark):
        """The module's core claim: one leftmost non-overlapping replace
        on the wrapped form equals the exhaustive merge-this-pair loop —
        [a,a,a,a] with merge (a,a) gives [aa,aa], not [aa,a,a]."""
        assert _tokens(spark, "aaaa", [("a", "a")]) == ["aa", "aa"]
        assert _tokens(spark, "aaa", [("a", "a")]) == ["aa", "a"]
        # and the same fold in Python str.replace (the UDF path)
        s = SEP + (SEP + SEP).join("aaaa") + SEP
        s = s.replace(f"{SEP}a{SEP}{SEP}a{SEP}", f"{SEP}aa{SEP}")
        assert s.strip(SEP).split(SEP + SEP) == ["aa", "aa"]

    def test_no_match_inside_longer_tokens(self, spark):
        """Pair (a,b) must not fire inside an already-merged token that
        merely CONTAINS 'ab' — boundaries are explicit sentinels."""
        # merge (x,a) first so 'xa' exists, then (a,b): the 'a' inside
        # 'xa' must not pair with the following 'b'
        assert _tokens(spark, "xab", [("x", "a"), ("a", "b")]) == ["xa", "b"]

    def test_rank_order_chains(self, spark):
        merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
        assert _tokens(spark, "lower", merges) == ["lower"]
        assert _tokens(spark, "low", merges) == ["low"]
        assert _tokens(spark, "slow", merges) == ["s", "low"]


class TestLearner:
    def test_hand_computed_merges(self, spark):
        """Sennrich's example, hand-computed: corpus {low x3, lower x2}.
        Pair counts round 1: (l,o)=5, (o,w)=5, (w,e)=2, (e,r)=2 — tie on
        5 broken lexicographically -> (l,o); then (lo,w)=5; then the
        2-2 tie (low,e)/(e,r) -> (e,r); then (low,er); then no pair has
        freq >= 2 -> early stop at 4 merges."""
        df = spark.createDataFrame(
            [(0, "low low low lower lower")], "doc_id long, text string"
        )
        merges = learn_bpe_merges(df, "text", n_merges=10, min_freq=2)
        assert merges == [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]

    def test_learner_is_case_and_punct_insensitive(self, spark):
        df1 = spark.createDataFrame(
            [(0, "Low LOW low! lower, LOWER?")], "doc_id long, text string"
        )
        merges = learn_bpe_merges(df1, "text", n_merges=10, min_freq=2)
        assert merges == [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]


class TestBatchedLearner:
    """r16 (r15 verdict #2): the batched learner must emit the EXACT
    sequential merge list — its whole point is taking provably-safe
    prefixes of each round's ranked pair table — while spending far
    fewer Spark jobs than one-per-merge."""

    def test_equals_sequential_on_corpus(self, spark, sf_dir):
        from homelogging_spark.operators.tokenize import (
            learn_bpe_merges_batched,
        )
        from homelogging_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        seq = learn_bpe_merges(docs, "text", n_merges=40)
        stats: dict = {}
        bat = learn_bpe_merges_batched(docs, "text", n_merges=40, stats=stats)
        assert bat == seq
        assert stats["learned"] == len(seq)
        # the scaling claim, measured not asserted-by-faith: strictly
        # fewer pair-count jobs than merges learned
        assert stats["rounds"] < len(seq)

    def test_equals_sequential_on_tie_heavy_fixture(self, spark):
        """Ties at the top and self-pairs are the degenerate paths —
        the batch must shrink to the exact sequential step, never
        reorder. 'aaaa bb' makes (a,a)/(b,b) contests; the Sennrich
        fixture makes freq ties."""
        from homelogging_spark.operators.tokenize import (
            learn_bpe_merges_batched,
        )

        for text in (
            "aaaa aaaa bb abab",
            "low low low lower lower",
            "xy xy yx yx xx yy",
        ):
            df = spark.createDataFrame([(0, text)], "doc_id long, text string")
            seq = learn_bpe_merges(df, "text", n_merges=12, min_freq=2)
            bat = learn_bpe_merges_batched(df, "text", n_merges=12, min_freq=2)
            assert bat == seq, f"fixture {text!r}: {bat} != {seq}"

    def test_continuation_from_initial_prefix(self, spark, sf_dir):
        """`initial=` continues an existing frozen vocabulary: learning
        k more merges on top of the first m sequential merges equals
        the first m+k sequential merges — the v2 -> v3 extension path."""
        from homelogging_spark.operators.tokenize import (
            learn_bpe_merges_batched,
        )
        from homelogging_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        seq = learn_bpe_merges(docs, "text", n_merges=30)
        cont = learn_bpe_merges_batched(
            docs, "text", n_merges=len(seq) - 10, initial=seq[:10]
        )
        assert cont == seq

    def test_broad_head_batches_many_merges_per_round(self, spark):
        """Where the pair-frequency head is broad and token-disjoint
        (real web-scale vocabularies; here 13 disjoint two-letter words
        at strictly descending counts), one round must learn MANY
        merges — this is the scaling case the batch rule exists for,
        and the fixture where a rounds==merges regression would show."""
        from homelogging_spark.operators.tokenize import (
            learn_bpe_merges_batched,
        )

        words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr",
                 "st", "uv", "wx", "yz"]
        text = " ".join(
            " ".join([w] * (100 - 3 * i)) for i, w in enumerate(words)
        )
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        seq = learn_bpe_merges(df, "text", n_merges=13, min_freq=2)
        stats: dict = {}
        bat = learn_bpe_merges_batched(
            df, "text", n_merges=13, min_freq=2, stats=stats
        )
        assert bat == seq and len(bat) == 13
        assert stats["rounds"] <= 2  # 13 sequential jobs collapse to <=2

    def test_min_freq_stop_matches_sequential(self, spark):
        from homelogging_spark.operators.tokenize import (
            learn_bpe_merges_batched,
        )

        df = spark.createDataFrame(
            [(0, "low low low lower lower")], "doc_id long, text string"
        )
        bat = learn_bpe_merges_batched(df, "text", n_merges=10, min_freq=2)
        assert bat == [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]


class TestTokenCount:
    def test_count_edges(self, spark):
        df = spark.createDataFrame(
            [
                (0, "lower low"),
                (1, ""),
                (2, None),
                (3, "?!—"),
                (4, "LoWeR"),
            ],
            "doc_id long, text string",
        )
        merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
        got = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
            ).collect()
        }
        assert got == {0: 2, 1: 0, 2: 0, 3: 0, 4: 1}

    def test_expression_equals_udf_and_oracle(self, spark):
        """The three implementations — JVM expression chain, Arrow
        pandas-UDF fold, DuckDB nested-replace oracle — must agree
        bit-for-bit on adversarial inputs under the frozen merges."""
        import duckdb

        rows = [
            (0, "customer order vector batch join hash"),
            (1, "Lower-case? YES: 100 columns, 3 rows."),
            (2, "aaaa bbbb abab xaxb"),
            (3, None),
            (4, "   "),
            (5, "slowslowslow smallfilter"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        expr = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id",
                bpe_token_count(F.col("text"), DEFAULT_MERGES).alias("n"),
            ).collect()
        }
        udf = {
            r.doc_id: r.n_tokens
            for r in bpe_token_count_udf(df, "text", DEFAULT_MERGES).select(
                "doc_id", "n_tokens"
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (doc_id BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        oracle = dict(
            con.execute(
                f"SELECT doc_id, {bpe_token_count_sql('text', DEFAULT_MERGES)} FROM t"
            ).fetchall()
        )
        assert expr == udf == oracle
        # sanity anchors under the frozen merges: whole-vocab words are
        # single tokens
        assert expr[0] == 6


class TestExprChainCeiling:
    """The expression chain's measured compile ceiling (SCALE.md r13:
    hard Catalyst stack overflow between 200 and 500 merges) is guarded:
    the raw chain refuses, the public entries auto-dispatch to the
    bit-equal Arrow fold."""

    # no-op filler merges (multi-char symbols never appear as single
    # tokens, so the fold's output is unchanged) — pads a merge list
    # past the ceiling without changing its semantics
    FILLER = [(f"x{i}", f"y{i}") for i in range(200)]

    def test_apply_merges_raises_beyond_ceiling(self, spark):
        import pytest

        from homelogging_spark.operators.tokenize import (
            MAX_EXPR_MERGES,
            _apply_merges,
        )

        too_many = DEFAULT_MERGES + self.FILLER[: MAX_EXPR_MERGES + 1 - len(DEFAULT_MERGES)]
        assert len(too_many) == MAX_EXPR_MERGES + 1
        with pytest.raises(ValueError, match="compile ceiling"):
            _apply_merges(F.lit("a"), too_many)

    def test_dispatch_boundary_plan_shapes(self, spark):
        """AT the ceiling: pure JVM plan (no Python eval node). ONE
        past it: the same call silently takes the Arrow path instead of
        crashing Catalyst."""
        from homelogging_spark.operators.tokenize import MAX_EXPR_MERGES

        df = spark.createDataFrame([(0, "order vector")], "doc_id long, text string")
        at = DEFAULT_MERGES + self.FILLER[: MAX_EXPR_MERGES - len(DEFAULT_MERGES)]
        over = at + self.FILLER[len(at) - len(DEFAULT_MERGES) :][:1]
        assert len(at) == MAX_EXPR_MERGES and len(over) == MAX_EXPR_MERGES + 1
        plan_at = df.select(
            bpe_token_count(F.col("text"), at).alias("n")
        )._jdf.queryExecution().executedPlan().toString()
        plan_over = df.select(
            bpe_token_count(F.col("text"), over).alias("n")
        )._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan_at
        assert "ArrowEvalPython" in plan_over

    def test_bit_equality_across_the_boundary(self, spark):
        """Padding with no-op merges past the ceiling flips the
        implementation, never the answer — expression(48) ==
        auto-dispatched-UDF(248) == explicit bpe_token_count_udf(248),
        for counts and for word tokenization."""
        rows = [
            (0, "customer order vector batch join hash"),
            (1, "aaaa bbbb abab"),
            (2, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        big = DEFAULT_MERGES + self.FILLER
        expr = df.select(
            "doc_id", bpe_token_count(F.col("text"), DEFAULT_MERGES).alias("n")
        ).collect()
        auto = df.select(
            "doc_id", bpe_token_count(F.col("text"), big).alias("n")
        ).collect()
        explicit = bpe_token_count_udf(df, "text", big).select(
            "doc_id", F.col("n_tokens").alias("n")
        ).collect()
        assert sorted(map(tuple, expr)) == sorted(map(tuple, auto))
        assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
        toks_small = _tokens(spark, "vectororder", DEFAULT_MERGES)
        toks_big = _tokens(spark, "vectororder", big)
        assert toks_small == toks_big


class TestOracleSqlEscaping:
    def test_quote_bearing_merge_symbols_are_escaped(self, spark):
        """A caller-supplied merge containing a single quote must emit
        valid (non-injectable) DuckDB SQL that still matches the Spark
        fold — learned merges are [a-z0-9]+ so this is pure misuse
        hardening."""
        import duckdb

        weird = [("a", "b"), ("o'", "x"), ("'", "'")]
        rows = [(0, "ab cd a b"), (1, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", bpe_token_count(F.col("text"), weird).alias("n")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        oracle = dict(
            con.execute(
                f"SELECT doc_id, {bpe_token_count_sql('text', weird)} FROM t"
            ).fetchall()
        )
        # "ab" merges to one token; "cd" stays two chars; "a" and "b"
        # are single chars — 1+2+1+1
        assert got == oracle == {0: 5, 1: 0}


class TestVersionedMergeConfig:
    """r15 (r13 stretch): the merge list as a versioned config dim —
    tokenizer upgrades are data changes with an audit row."""

    def test_versions_are_prefix_extensions(self):
        from homelogging_spark.operators.tokenize import (
            CURRENT_VOCAB_VERSION,
            DEFAULT_MERGES,
            MERGE_VERSIONS,
            merges_for,
        )

        versions = sorted(MERGE_VERSIONS)
        assert versions == [1, 2, 3] and CURRENT_VOCAB_VERSION == 3
        # deterministic learner => every version extends its
        # predecessor (counts computed under v1 stay reproducible from
        # the v2 dim by truncating at v1's rank)
        for lo, hi in zip(versions, versions[1:]):
            assert MERGE_VERSIONS[hi][: len(MERGE_VERSIONS[lo])] == MERGE_VERSIONS[lo]
        assert merges_for() == DEFAULT_MERGES == list(MERGE_VERSIONS[3])
        with pytest.raises(ValueError, match="unknown vocab_version"):
            merges_for(99)

    def test_audit_row_digests_content(self):
        from homelogging_spark.operators.tokenize import vocab_audit

        a1, a2, a3 = vocab_audit(1), vocab_audit(2), vocab_audit(3)
        assert a1["n_merges"] == 48 and a2["n_merges"] == 64
        assert a3["n_merges"] == 89  # r16: the corpus's full vocab at min_freq=2
        assert len({a1["merges_md5"], a2["merges_md5"], a3["merges_md5"]}) == 3
        assert vocab_audit(1) == a1  # stable

    def test_dim_round_trips_every_version(self, spark):
        from homelogging_spark.operators.tokenize import (
            MERGE_VERSIONS,
            merges_dim,
        )

        dim = merges_dim(spark)
        got: dict[int, list[tuple[str, str]]] = {}
        for r in dim.orderBy("vocab_version", "rank").collect():
            got.setdefault(r.vocab_version, []).append((r.lhs, r.rhs))
        assert got == {v: list(m) for v, m in MERGE_VERSIONS.items()}

    def test_vocab_bump_changes_counts_monotonically(self, spark):
        """The v2 extension can only merge further: token counts under
        v2 are <= v1's on every doc, and strictly lower somewhere on a
        fixture containing v2-only merge targets ('table', 'value')."""
        from pyspark.sql import functions as F

        from homelogging_spark.operators.tokenize import (
            bpe_token_count,
            merges_for,
        )

        df = spark.createDataFrame(
            [(1, "merge the customer table"), (2, "a key value row"),
             (3, "zzz qqq")],
            "doc_id long, text string",
        )
        rows = df.select(
            "doc_id",
            bpe_token_count(F.col("text"), merges_for(1)).alias("v1"),
            bpe_token_count(F.col("text"), merges_for(2)).alias("v2"),
        ).collect()
        assert all(r.v2 <= r.v1 for r in rows)
        assert any(r.v2 < r.v1 for r in rows)
