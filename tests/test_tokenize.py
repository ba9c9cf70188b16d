"""Unit tests for the real-BPE tokenizer (``operators/tokenize``):
the wrapped-string replace fold, learner determinism on a hand-computed
corpus (Sennrich 2016's low/lower example), expression-vs-pandas-UDF
parity, and edge cases the driver corpus can't exercise."""

from __future__ import annotations

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
