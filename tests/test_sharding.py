"""Shard assignment + manifest pins (operators/sharding.py)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from homelogging_spark.operators.sharding import (
    shard_assign,
    shard_manifest,
    shard_manifest_sql,
)


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )


class TestShardAssign:
    def test_deterministic_round_robin_over_size_order(self, spark):
        sizes = [50, 40, 40, 30, 20, 10, 5]
        out = {
            r.doc_id: (r.size_rank, r.shard)
            for r in shard_assign(_docs(spark, sizes), 3).collect()
        }
        # rank follows (size desc, id asc); shard = (rank-1) % 3
        assert out == {
            0: (1, 0), 1: (2, 1), 2: (3, 2), 3: (4, 0),
            4: (5, 1), 5: (6, 2), 6: (7, 0),
        }

    def test_rerun_is_bit_identical(self, spark):
        sizes = [7, 7, 3, 9, 1, 4, 4, 8] * 5
        a = shard_assign(_docs(spark, sizes), 4).collect()
        b = shard_assign(_docs(spark, sizes), 4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_balance_bound_on_spark(self, spark):
        """max shard sum - min shard sum <= max item size (the provable
        round-robin-over-descending bound), on a skewed corpus."""
        sizes = [2 ** (i % 11) + i % 7 for i in range(200)]
        m = shard_manifest(shard_assign(_docs(spark, sizes), 8)).collect()
        assert len(m) == 8
        spread = max(r.total_tokens for r in m) - min(r.total_tokens for r in m)
        assert spread <= max(sizes)

    def test_manifest_matches_duckdb_twin(self, spark):
        """Spark assign+manifest == the SQL oracle, including the md5
        bit-XOR content fingerprint — driver-registration pre-certified."""
        sizes = [(i * 37) % 101 for i in range(120)]
        got = [
            (r.shard, r.n_docs, r.total_tokens, r.min_tokens, r.max_tokens,
             r.content_fingerprint)
            for r in shard_manifest(shard_assign(_docs(spark, sizes), 5)).collect()
        ]
        con = duckdb.connect()
        vals = ", ".join(f"({i}, {n})" for i, n in enumerate(sizes))
        con.execute(f"CREATE TABLE docs(doc_id BIGINT, n_tokens BIGINT)")
        con.execute(f"INSERT INTO docs VALUES {vals}")
        want = con.execute(shard_manifest_sql("docs", 5)).fetchall()
        assert got == [tuple(r) for r in want]

    def test_fingerprint_detects_membership_change(self, spark):
        base = shard_manifest(shard_assign(_docs(spark, [10, 9, 8, 7]), 2))
        swapped = shard_manifest(
            shard_assign(
                spark.createDataFrame(
                    [(0, 10), (1, 9), (2, 8), (9, 7)],  # doc 3 -> doc 9
                    "doc_id long, n_tokens long",
                ),
                2,
            )
        )
        fp = lambda df: {r.shard: r.content_fingerprint for r in df.collect()}
        a, b = fp(base), fp(swapped)
        assert a != b
        # and the difference is localized to the shard doc 9 landed in
        assert sum(a[s] != b[s] for s in a) == 1


class TestShardBalanceLaw:
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300),
        st.integers(min_value=1, max_value=16),
    )
    @settings(max_examples=300, deadline=None)
    def test_round_robin_spread_bounded_by_max_item(self, sizes, n):
        """Pure restatement of the assignment law: dealing the
        size-descending order cyclically bounds the shard-sum spread by
        the largest item, for EVERY input."""
        order = sorted(sizes, reverse=True)
        sums = [0] * n
        for i, s in enumerate(order):
            sums[i % n] += s
        assert max(sums) - min(sums) <= (max(sizes) if sizes else 0)
