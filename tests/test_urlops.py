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
    # r17: default-port strip is scheme-gated — non-http(s) schemes
    # keep :443 / :80 verbatim (scheme still lowercases)
    ("ftp://Files.example.com:443/pub", "ftp://files.example.com:443/pub", "example.com"),
    ("ftp://files.example.com:80/pub", "ftp://files.example.com:80/pub", "example.com"),
    ("ws://live.example.com:80/feed", "ws://live.example.com:80/feed", "example.com"),
    # r17: widened MULTI_LABEL_SUFFIXES corners
    ("http://shop.brand.co.kr/x", "http://shop.brand.co.kr/x", "brand.co.kr"),
    ("http://news.portal.com.tr", "http://news.portal.com.tr", "portal.com.tr"),
    ("http://www.lab.ac.jp/y", "http://www.lab.ac.jp/y", "lab.ac.jp"),
    ("http://a.b.ne.jp", "http://a.b.ne.jp", "b.ne.jp"),
    ("http://x.uni.edu.au/z", "http://x.uni.edu.au/z", "uni.edu.au"),
    # a host that IS a two-label suffix stays two labels (n >= 3 gate)
    ("http://co.kr/x", "http://co.kr/x", "co.kr"),
    # r18: suffix table v2 corners (the fuller ICANN subset imported as
    # versioned config — SUFFIX_VERSIONS[2])
    ("http://www.canada.gc.ca/en", "http://www.canada.gc.ca/en", "canada.gc.ca"),
    (
        "https://portal.ville.gouv.fr:443/x",
        "https://portal.ville.gouv.fr/x",
        "ville.gouv.fr",
    ),
    ("http://x.university.edu.pl", "http://x.university.edu.pl", "university.edu.pl"),
    ("http://a.company.co.ke/y", "http://a.company.co.ke/y", "company.co.ke"),
    ("http://news.site.com.np", "http://news.site.com.np", "site.com.np"),
    ("http://b.agency.gob.mx/z", "http://b.agency.gob.mx/z", "agency.gob.mx"),
    ("http://w.tata.firm.in", "http://w.tata.firm.in", "tata.firm.in"),
]

# adversarial URLs for the staged-vs-single-tree equivalence pin
# (r16 ADVICE: nothing guarded drift between the two hand-duplicated
# expression trees): fragments, ports, no-scheme, empty, NULL,
# multi-label suffixes, tracker-only queries, case soup
EQUIV_URLS = [raw for raw, _, _ in CASES] + [
    "",
    None,
    "no-scheme-at-all",
    "relative/path?utm_source=x#f",
    "HTTPS://MIXED.Case.CO.UK:443/A/B?REF=1&Utm_Campaign=2&keep=Me#Frag",
    "http://trailing.dot.example.com./x",
    "https://h:443",
    "https://h:443/?utm_source=1",
    "http://h:80#only-frag",
    "http://h:80?x=1",
    "http://user@pass.example.com:80/x",  # userinfo lands in the 'host' blob
    "http://a.com/p?a=1&&b=2",  # empty param survives the filter
    "http://a.com/p??" ,  # '?' inside query
    "ftp://h.example.org:2121/f",
]


def _py_normalize(u: str) -> str:
    """Pure-Python articulation of the 5-step contract (module
    docstring) — an implementation INDEPENDENT of all three engine
    forms (single-tree expr / staged expr / DuckDB SQL), so a bug
    shared by the hand-duplicated trees can't hide (r17; this contract
    drew three findings in two rounds)."""
    import re

    u1 = re.sub(r"#.*$", "", u)  # (1) fragment
    m = re.match(r"^[^:/?#]+://[^/?#]*", u1)
    head = m.group(0) if m else ""
    tail = u1[len(head):]
    head = head.lower()  # (2) scheme + host
    if head.startswith("http://"):  # (3) scheme-gated default ports
        head = re.sub(r":80$", "", head)
    elif head.startswith("https://"):
        head = re.sub(r":443$", "", head)
    qi = tail.find("?")
    if qi >= 0:
        path, query = tail[:qi], tail[qi + 1:]
    else:
        path, query = tail, ""
    kept = [
        p
        for p in query.split("&")
        if not re.match(urlops.TRACKING_PARAM_RE, p.lower())
    ]  # (4) tracking params
    q_n = "?" + "&".join(kept) if (query != "" and len(kept) > 0) else ""
    if path == "/" and q_n == "":  # (5) bare root collapse
        path = ""
    return head + path + q_n


def _py_domain(url_norm: str) -> str:
    import re

    m = re.match(r"^[^:/?#]+://([^/?#]*)", url_norm)
    host = re.sub(r":[0-9]+$", "", m.group(1) if m else "")
    labels = host.split(".")
    if len(labels) < 2:
        return host
    last2 = ".".join(labels[-2:])
    if len(labels) >= 3 and last2 in urlops.MULTI_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return last2


def _composed_urls(n=400, seed=42):
    """Deterministic cross-product sampler over the contract's axes —
    corners the hand-picked fixtures can't densely cover."""
    import random

    rng = random.Random(seed)
    schemes = ["http://", "https://", "HTTP://", "HtTpS://", "ftp://",
               "ws://", "FTP://", ""]
    hosts = ["news.Example.COM", "EXAMPLE.com", "shop.retail.CO.UK",
             "a.b.ne.jp", "localhost", "co.kr", "sub.domain.com.tr",
             "h", "x.y.z.example.io", "trailing.dot.example.com.",
             "pass.example.com", "128.0.0.1"]
    ports = ["", ":80", ":443", ":8080", ":0080", ":443 ", ":08"]
    paths = ["", "/", "/A/b", "/dir/", "/p%20q", "//double", "/?x",
             "/UPPER/Case7"]
    queries = ["", "?", "?utm_source=x", "?a=1&REF=2&b=3", "?gclid",
               "?a=1&&b=2", "?ref_src=t&x=1", "?id=gclid",
               "?UTM_CAMPAIGN=Z", "?reference=1&fbclid=q", "?ref",
               "?keep=Me&utm_x"]
    frags = ["", "#f", "#Frag/with?stuff", "#", "#utm_source=x"]
    out = []
    for _ in range(n):
        u = (rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
             + rng.choice(paths) + rng.choice(queries) + rng.choice(frags))
        out.append(u)
    return out


class TestContractReference:
    """Every engine form vs the independent Python articulation, over
    the composed adversarial corpus — one Spark batch, one DuckDB
    query, never per-example round-trips."""

    def test_all_three_engine_forms_match_python_reference(self, spark):
        urls = _composed_urls()
        exp = [(i, _py_normalize(u), _py_domain(_py_normalize(u)))
               for i, u in enumerate(urls)]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "i int, url string"
        )
        cols = urlops.url_columns(F.col("url"))
        single = sorted(
            (r.i, r.n, r.d)
            for r in df.select(
                "i", cols["url_norm"].alias("n"), cols["domain"].alias("d")
            ).collect()
        )
        assert single == exp
        staged = sorted(
            (r.i, r.url_norm, r.domain)
            for r in urlops.with_url_columns(df, "url")
            .select("i", "url_norm", "domain")
            .collect()
        )
        assert staged == exp
        import duckdb

        norm = urlops.normalize_url_sql("url")
        dom = urlops.registrable_domain_sql(urlops.host_sql(norm))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (i int, url varchar)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
        duck = sorted(
            con.execute(
                f"SELECT i, {norm} AS n, {dom} AS d FROM t ORDER BY i"
            ).fetchall()
        )
        # the SQL twin's documented asymmetry (registrable_domain_col
        # comment): single-label hosts degrade to the host Spark-side
        # but NULL in DuckDB's 1-indexed list arithmetic — the oracle
        # only sees >=2-label hosts by construction. Norm always
        # matches; domain matches wherever the host has a dot.
        for (di, dn, dd), (ei, en, ed) in zip(duck, exp):
            assert (di, dn) == (ei, en)
            if "." in ed:
                assert dd == ed, (di, dd, ed)
            else:
                assert dd is None or dd == ed


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

    def test_staged_equals_single_tree(self, spark):
        """`with_url_columns` output is row-for-row identical to the
        `url_columns` projection on the adversarial fixture (r16 ADVICE:
        the two hand-duplicated expression trees had no drift guard)."""
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(EQUIV_URLS)], "i int, url string"
        )
        cols = urlops.url_columns(F.col("url"))
        single = df.select(
            "i", *(cols[c].alias(c) for c in ("url_norm", "host", "domain", "blocked"))
        )
        staged = urlops.with_url_columns(df, "url").select(
            "i", "url_norm", "host", "domain", "blocked"
        )
        s_rows = sorted(single.collect())
        t_rows = sorted(staged.collect())
        assert s_rows == t_rows

    def test_suffix_table_versioned_config(self, spark):
        """r18 (r17 verdict #5): the suffix table is versioned config —
        append-only (v1 ⊂ v2 exactly), unknown versions refused, the
        joinable dim carries every version, and pinning
        ``suffix_version=1`` reproduces the pre-widening extraction on
        a v2-only corner (upgrades are data changes AND reversible per
        query)."""
        v1, v2, v3 = (
            urlops.suffixes_for(1),
            urlops.suffixes_for(2),
            urlops.suffixes_for(3),
        )
        assert set(v1) < set(v2) < set(v3)
        assert len(v1) == 31  # the r17 table, frozen
        assert len(set(v2)) == len(v2)  # no duplicate entries
        assert all(s == s.lower() and s.count(".") == 1 for s in v2)
        # v3 = v2 + the rule-grammar entries, nothing else
        assert set(v3) - set(v2) == set(urlops._SUFFIX_RULES_V3_ADDED)
        assert urlops.suffixes_for() == v3  # CURRENT_SUFFIXES == 3
        # the back-compat plain table is v3's plain entries == v2
        assert urlops.MULTI_LABEL_SUFFIXES == urlops.plain_suffixes_for(3)
        assert set(urlops.MULTI_LABEL_SUFFIXES) == set(v2)
        assert urlops.plain_suffixes_for(2) == v2  # pre-v3 versions: all plain
        assert urlops.wildcard_tlds_for(2) == ()
        assert urlops.exception_hosts_for(2) == ()
        # r20 (r19 ADVICE #2): the frozen v3 wildcard set — *.fj/*.gu
        # were dropped before freezing (both registries left the PSL
        # wildcard section when they moved to enumerated second-level
        # suffixes: gu in 2018, fj in 2019)
        assert urlops.wildcard_tlds_for(3) == (
            "bd", "ck", "er", "kh", "mm", "np", "pg",
        )
        assert urlops.exception_hosts_for(3) == ("www.ck",)
        with pytest.raises(ValueError, match="unknown suffix-table"):
            urlops.suffixes_for(99)
        dim = urlops.suffix_dim(spark)
        counts = {
            r.suffix_version: r.n
            for r in dim.groupBy("suffix_version")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts == {1: len(v1), 2: len(v2), 3: len(v3)}
        # gc.ca is v2-only: v1 extraction degrades to the 2-label tail
        df = spark.createDataFrame([("www.canada.gc.ca",)], "host string")
        got = df.select(
            urlops.registrable_domain_col(F.col("host"), 1).alias("d1"),
            urlops.registrable_domain_col(F.col("host"), 2).alias("d2"),
        ).collect()[0]
        assert (got.d1, got.d2) == ("gc.ca", "canada.gc.ca")
        # the SQL twin versions identically
        d1 = duckdb.sql(
            "SELECT "
            + urlops.registrable_domain_sql("'www.canada.gc.ca'", 1)
        ).fetchone()[0]
        assert d1 == "gc.ca"

    def test_wildcard_and_exception_rules_v3(self, spark):
        """r19 (r18 verdict #5): the PSL rule grammar — `*.tld`
        wildcards and the `!www.ck` exception — pinned on the spec's
        own canonical cases, identical on all THREE engine forms
        (expression, staged, DuckDB twin), and reversible: pinning
        ``suffix_version=2`` reproduces the pre-wildcard extraction."""
        cases = [
            # (host, v3 expected, v2 expected)
            # the wildcard: any label directly under .ck is a public
            # suffix, so the registrable domain takes three labels
            ("bar.foo.ck", "bar.foo.ck", "foo.ck"),
            ("a.bar.foo.ck", "bar.foo.ck", "foo.ck"),
            # the exception re-opens www.ck: it IS the registrable
            # domain, and deeper hosts resolve to it
            ("www.ck", "www.ck", "www.ck"),
            ("foo.www.ck", "www.ck", "www.ck"),
            # a 2-label host under a wildcard is itself a public
            # suffix — degrades to the 2-label tail (documented)
            ("foo.ck", "foo.ck", "foo.ck"),
            # another wildcard TLD, no exception
            ("shop.example.mm", "shop.example.mm", "example.mm"),
            # v2's enumerated children agree with the v3 wildcard
            ("x.gov.bd", "x.gov.bd", "x.gov.bd"),
            # plain rules unaffected by the grammar
            ("shop.retail.co.uk", "retail.co.uk", "retail.co.uk"),
            ("a.b.example.com", "example.com", "example.com"),
        ]
        df = spark.createDataFrame(
            [(h,) for h, _, _ in cases], "host string"
        )
        got = {
            r.host: (r.d3, r.d2)
            for r in df.select(
                "host",
                urlops.registrable_domain_col(F.col("host"), 3).alias("d3"),
                urlops.registrable_domain_col(F.col("host"), 2).alias("d2"),
            ).collect()
        }
        for host, exp3, exp2 in cases:
            assert got[host] == (exp3, exp2), host
            s3 = duckdb.sql(
                "SELECT " + urlops.registrable_domain_sql(f"'{host}'", 3)
            ).fetchone()[0]
            s2 = duckdb.sql(
                "SELECT " + urlops.registrable_domain_sql(f"'{host}'", 2)
            ).fetchone()[0]
            assert (s3, s2) == (exp3, exp2), host
        # staged form matches the expression form under v3 (the
        # staged≡single-tree equivalence held on the new disjunct too)
        urls = spark.createDataFrame(
            [(f"http://{h}/p",) for h, _, _ in cases], "url string"
        )
        staged = {
            r.url: r.domain
            for r in urlops.with_url_columns(urls, "url").collect()
        }
        for host, exp3, _ in cases:
            assert staged[f"http://{host}/p"] == exp3, host

    def test_staging_columns_do_not_swallow_caller_dunders(self, spark):
        """A caller's own '__'-prefixed column survives; a collision with
        an actual staging name raises instead of silently overwriting
        (r16 ADVICE fix)."""
        df = spark.createDataFrame(
            [("http://a.com/", "keep-me")], "url string, __mine string"
        )
        out = urlops.with_url_columns(df, "url")
        assert "__mine" in out.columns
        assert out.select("__mine").collect()[0][0] == "keep-me"
        bad = spark.createDataFrame([("http://a.com/", "x")], "url string, __head string")
        with pytest.raises(ValueError, match="staging columns already present"):
            urlops.with_url_columns(bad, "url")

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