"""urlops unit pins — the normalization contract corner-by-corner
(driver parity is the `domain_curation` oracle row; these pin the cases
the synthesized fixture may not densely cover)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators import urlops

CASES = [
    # (raw, expected url_norm, expected domain)
    (
        "HTTP://News.Example.COM:80/Articles/item7?utm_source=x&id=3#frag",
        "http://news.example.com/Articles/item7?id=3",
        "example.com",
    ),
    # https default port stripped; path case preserved
    ("https://A.B.org:443/Path/Q", "https://a.b.org/Path/Q", "b.org"),
    # non-default port survives, even :80 on https
    ("https://h.example.net:80/x", "https://h.example.net:80/x", "example.net"),
    ("http://h.example.net:8080/x", "http://h.example.net:8080/x", "example.net"),
    # all params tracking -> '?' dropped entirely
    ("http://a.com/p?gclid=1&utm_medium=z", "http://a.com/p", "a.com"),
    # param ORDER preserved, only trackers removed; values keep case
    (
        "http://a.com/p?b=2&fbclid=xx&a=1&ref=side",
        "http://a.com/p?b=2&a=1",
        "a.com",
    ),
    # bare root path with no query collapses; with query it stays
    ("http://a.com/", "http://a.com", "a.com"),
    ("http://a.com/?id=1", "http://a.com/?id=1", "a.com"),
    # deeper trailing slash is PRESERVED (can be semantic)
    ("http://a.com/dir/", "http://a.com/dir/", "a.com"),
    # multi-label public suffixes -> three-label registrable domain
    ("http://shop.retail.co.uk/x", "http://shop.retail.co.uk/x", "retail.co.uk"),
    ("http://blog.sample.com.au", "http://blog.sample.com.au", "sample.com.au"),
    # deep subdomain under a plain TLD -> two labels
    ("http://docs.sub.example.io/y", "http://docs.sub.example.io/y", "example.io"),
    # fragment-only suffix dropped; 'ref' tracker without '=' dropped
    ("http://a.com/p#s", "http://a.com/p", "a.com"),
    ("http://a.com/p?ref&x=1", "http://a.com/p?x=1", "a.com"),
    # tracking-NAME prefix must not over-match real params
    ("http://a.com/p?reference=1", "http://a.com/p?reference=1", "a.com"),
    ("http://a.com/p?id=gclid", "http://a.com/p?id=gclid", "a.com"),
]


class TestUrlNormalization:
    def test_contract_cases_spark(self, spark):
        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i int, url string"
        )
        cols = urlops.url_columns(F.col("url"))
        rows = {
            r.i: r
            for r in df.select(
                "i", cols["url_norm"].alias("n"), cols["domain"].alias("d")
            ).collect()
        }
        for i, (raw, norm, dom) in enumerate(CASES):
            assert rows[i].n == norm, f"case {i}: {raw!r} -> {rows[i].n!r}"
            assert rows[i].d == dom, f"case {i}: {raw!r} domain {rows[i].d!r}"

    def test_contract_cases_duckdb_twin(self):
        norm = urlops.normalize_url_sql("url")
        dom = urlops.registrable_domain_sql(urlops.host_sql(norm))
        vals = ", ".join(
            f"({i}, '{raw}')" for i, (raw, _, _) in enumerate(CASES)
        )
        got = duckdb.sql(
            f"SELECT i, {norm} AS n, {dom} AS d "
            f"FROM (VALUES {vals}) AS t(i, url) ORDER BY i"
        ).fetchall()
        for (i, n, d), (raw, norm_e, dom_e) in zip(got, CASES):
            assert n == norm_e, f"case {i}: {raw!r} -> {n!r}"
            assert d == dom_e, f"case {i}: {raw!r} domain {d!r}"

    def test_single_label_host_degrades(self, spark):
        """No dot in the host: registrable domain degrades to the host
        itself (Spark side; the oracle never sees this by construction)."""
        df = spark.createDataFrame([("http://localhost:8080/x",)], "url string")
        cols = urlops.url_columns(F.col("url"))
        row = df.select(cols["domain"].alias("d")).collect()[0]
        assert row.d == "localhost"

    def test_blocklist_config(self, spark):
        with pytest.raises(ValueError, match="unknown domain blocklist"):
            urlops.blocklist_for(99)
        dim = urlops.blocklist_dim(spark).collect()
        assert {(r.blocklist_version, r.domain) for r in dim} == {
            (1, "spam-mill.com"),
            (1, "tracker-farm.net"),
        }
        assert urlops.blocked_sql("d") == "(d IN ('spam-mill.com', 'tracker-farm.net'))"

    def test_domain_curation_is_map_side_plus_one_rollup(self, spark, sf_dir):
        """Plan shape: the doc leg is exchange-free (pure projection on
        the scan); the whole panel adds only the domain rollup's
        aggregate exchanges (pre/post-shuffle HashAggregate pairs) and
        the union — no joins, no Python."""
        from homelogging_spark.plans.pipeline_registry import q_domain_curation

        plan = (
            q_domain_curation(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan and "Join" not in plan