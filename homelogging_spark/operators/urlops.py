"""URL normalization + registrable-domain curation (r16).

The one common training-data pipeline stage family the engine lacked
(r15 verdict gap #3): the FineWeb/CCNet-style pre-filter that runs
AHEAD of text quality — URL canonicalization, registrable-domain
extraction, domain blocklisting, and the per-domain rollup whose token
shares feed :func:`sampling.mixture_weights`.

Everything here is a map-side column expression (zero shuffle, no
UDF); only the domain rollup aggregates, and its key space is the
registrable-domain set (web-scale ~10^7 — a bounded partial-agg
shuffle, nothing scales with corpus size except the scan). Every
expression has a DuckDB twin built from the same regex/list-function
subset, so the driver's hash gate verifies the normalized STRINGS, not
row counts.

Normalization contract (documented, deterministic, engine-identical):

1. fragment dropped (``#...``);
2. scheme and host (incl. port digits) lowercased — path/query case is
   PRESERVED (path case is significant per RFC 3986; host is not);
3. default ports stripped (``:80`` for http, ``:443`` for https —
   non-default ports survive, including ``https://h:80``; other
   schemes keep their port untouched, including ``ftp://h:443`` —
   r17, the r16 verdict's over-wide ELSE branch);
4. tracking query parameters removed (``TRACKING_PARAM_RE``: utm_*,
   gclid, fbclid, msclkid, mc_eid, igshid, ref, ref_src), other
   parameters kept in original order; an emptied query loses its
   ``?``;
5. a bare root path with no surviving query collapses
   (``http://h/`` -> ``http://h``) — deeper trailing slashes are
   preserved (they can be semantic).

Registrable domain = last two host labels, or last three when the
two-label tail is a multi-label public suffix (``SUFFIX_VERSIONS`` — a
documented config SUBSET of the Mozilla public-suffix list, versioned
append-only since r18: v1 is the r17 31-entry table, v2 imports the
fuller ICANN-section second-level registries, v3 (r19) adds the PSL
wildcard/exception RULE GRAMMAR — `*.tld` entries and the `!www.ck`
carve-out; extending it is a data
change, and ``suffix_version=`` pins any query to a table generation).
Blocklists are versioned config the same way (``BLOCKLIST_VERSIONS``).

Reference scope note: the reference has no web-curation surface; this
family extends the commissioned LLM-pipeline tier (BASELINE.md
north-star), modeled on the C4/CCNet/FineWeb pre-filter stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- config dims --------------------------------------------------------

# lowercase-match regex for query parameters that never change content
# identity (analytics/attribution); matched against "name" or "name=..."
TRACKING_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$"
)

# two-label public suffixes under which the registrable domain takes
# THREE labels — VERSIONED config since r18 (the MERGE_VERSIONS /
# BLOCKLIST_VERSIONS design: suffix-table upgrades are data changes;
# append-only — a version's entries are never removed, and version N is
# always a subset of N+1, pinned in test_urlops). Scope note through
# v2: the table holds plain TWO-label entries only; PSL wildcard rules
# were representable only by enumerating their common children
# (com.bd, com.np, ... below). v3 (r19, r18 verdict #5) adds the PSL
# RULE GRAMMAR itself: `*.tld` wildcard entries (any label directly
# under the TLD is a public suffix) and `!host` exception entries
# (carve-outs from a wildcard — `!www.ck` makes www.ck registrable
# again), parsed by the accessors below.
_SUFFIXES_V1: tuple[str, ...] = (
    "ac.jp", "ac.uk", "co.id", "co.il", "co.in", "co.jp", "co.kr",
    "co.nz", "co.th", "co.uk", "co.za", "com.ar", "com.au", "com.br",
    "com.cn", "com.hk", "com.mx", "com.my", "com.pl", "com.sg",
    "com.tr", "com.tw", "com.vn", "edu.au", "gov.au", "gov.uk",
    "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)

# r18 (r17 verdict #5): the fuller ICANN-section subset — second-level
# registries of the major ccTLDs, entries taken verbatim from the
# public Mozilla list (publicsuffix.org); only plain two-label entries,
# no wildcard or exception rules
_SUFFIXES_V2_ADDED: tuple[str, ...] = (
    # Canada (provinces + federal)
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    # United Kingdom (remaining ICANN entries)
    "ltd.uk", "me.uk", "net.uk", "nhs.uk", "plc.uk", "police.uk",
    # Japan (remaining generic second-levels)
    "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    # Australia / New Zealand
    "asn.au", "id.au", "ac.nz", "geek.nz", "gen.nz", "govt.nz",
    "net.nz", "org.nz", "school.nz",
    # Western Europe
    "ac.at", "co.at", "gv.at", "or.at",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.se", "org.se", "pp.se", "press.se",
    "com.ro", "firm.ro", "info.ro", "nom.ro", "org.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu",
    # Eastern Europe / Caucasus / Central Asia
    "biz.pl", "edu.pl", "gov.pl", "info.pl", "net.pl", "org.pl",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    "com.by", "gov.by",
    "com.ee", "edu.ee", "gov.ee", "org.ee", "pri.ee",
    "com.lv", "edu.lv", "gov.lv", "id.lv", "net.lv", "org.lv",
    "gov.lt",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    "com.hr", "name.hr",
    "com.ge", "edu.ge", "gov.ge", "net.ge", "org.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "com.az", "edu.az", "gov.az", "net.az", "org.az",
    "com.kz", "edu.kz", "gov.kz", "net.kz", "org.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    # Middle East
    "ac.il", "gov.il", "k12.il", "muni.il", "net.il", "org.il",
    "av.tr", "bel.tr", "gen.tr", "gov.tr", "k12.tr", "mil.tr",
    "net.tr", "org.tr", "web.tr",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "net.ae", "org.ae", "sch.ae",
    "com.qa", "edu.qa", "gov.qa", "net.qa", "org.qa", "sch.qa",
    "com.kw", "edu.kw", "gov.kw", "net.kw", "org.kw",
    "com.bh", "edu.bh", "gov.bh", "net.bh", "org.bh",
    "co.om", "com.om", "edu.om", "gov.om", "net.om", "org.om",
    "com.jo", "edu.jo", "gov.jo", "net.jo", "org.jo", "sch.jo",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    # South / Southeast Asia
    "ac.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "nic.in", "org.in", "res.in",
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    "ac.lk", "com.lk", "edu.lk", "gov.lk", "net.lk", "org.lk",
    "sch.lk",
    "com.np", "edu.np", "gov.np", "net.np", "org.np",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk", "web.pk",
    "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.ph", "edu.ph", "gov.ph", "net.ph", "ngo.ph", "org.ph",
    "ac.id", "biz.id", "go.id", "net.id", "or.id", "sch.id", "web.id",
    "edu.my", "gov.my", "net.my", "org.my",
    "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    "ac.kr", "go.kr", "mil.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    "ac.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "edu.vn", "gov.vn", "int.vn", "net.vn", "org.vn",
    # Africa
    "ac.ma", "co.ma", "gov.ma", "net.ma", "org.ma", "press.ma",
    "com.dz", "edu.dz", "gov.dz", "net.dz", "org.dz",
    "com.tn", "gov.tn", "ind.tn", "info.tn", "net.tn", "org.tn",
    "com.eg", "edu.eg", "gov.eg", "net.eg", "org.eg", "sci.eg",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng", "sch.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh",
    "ac.ke", "co.ke", "go.ke", "me.ke", "ne.ke", "or.ke", "sc.ke",
    "ac.tz", "co.tz", "go.tz", "ne.tz", "or.tz", "sc.tz",
    "ac.ug", "co.ug", "go.ug", "ne.ug", "or.ug", "org.ug", "sc.ug",
    "ac.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "org.zm",
    "ac.zw", "co.zw", "gov.zw", "org.zw",
    "ac.za", "edu.za", "gov.za", "net.za", "org.za", "web.za",
    "com.et", "edu.et", "gov.et", "net.et", "org.et",
    # Latin America
    "edu.ar", "gob.ar", "int.ar", "net.ar", "org.ar", "tur.ar",
    "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    "gob.cl", "gov.cl", "mil.cl",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    "com.ec", "edu.ec", "gob.ec", "gov.ec", "net.ec", "org.ec",
    "com.ve", "co.ve", "edu.ve", "gob.ve", "net.ve", "org.ve",
    "com.bo", "edu.bo", "gob.bo", "net.bo", "org.bo",
    "com.py", "edu.py", "gov.py", "net.py", "org.py",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy",
    "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "net.gt", "org.gt",
    "com.do", "edu.do", "gob.do", "gov.do", "net.do", "org.do",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
)

# r19 (r18 verdict #5): the PSL rule grammar — the ICANN-section
# single-label wildcard rules from the public Mozilla list
# (publicsuffix.org), plus its one exception rule. A `*.tld` rule makes
# EVERY label directly under the tld a public suffix (so registrable
# domains there take three labels); a `!host` exception re-opens one
# wildcard match (its public suffix drops the leftmost label, so the
# exception host itself is the registrable domain). The v2 enumerated
# children (com.bd, com.np, ...) stay — append-only — and agree with
# the wildcard on every host they both match.
# r20 (r19 ADVICE #2): `*.fj` and `*.gu` were dropped from the frozen
# v3 BEFORE shipping — both registries moved to enumerated second-level
# suffixes and the PSL removed their wildcard rules (gu in 2018, fj in
# 2019), so treating all of .fj/.gu as wildcard public suffixes would
# mis-split directly-registered domains there (www.example.fj ->
# 'www.example.fj' instead of 'example.fj') — and the table's
# append-only policy would have made the wrong entries permanent.
_SUFFIX_RULES_V3_ADDED: tuple[str, ...] = (
    "*.bd", "*.ck", "*.er", "*.kh", "*.mm", "*.np", "*.pg",
    "!www.ck",
)

SUFFIX_VERSIONS: dict[int, tuple[str, ...]] = {
    1: _SUFFIXES_V1,
    2: tuple(sorted(set(_SUFFIXES_V1) | set(_SUFFIXES_V2_ADDED))),
    3: tuple(
        sorted(
            set(_SUFFIXES_V1)
            | set(_SUFFIXES_V2_ADDED)
            | set(_SUFFIX_RULES_V3_ADDED)
        )
    ),
}
CURRENT_SUFFIXES = 3


def suffixes_for(version: int = CURRENT_SUFFIXES) -> tuple[str, ...]:
    """The raw rule table of a version — plain two-label suffixes
    plus (v3+) `*.tld` / `!host` grammar entries. Matching code uses
    the parsed accessors below."""
    if version not in SUFFIX_VERSIONS:
        raise ValueError(
            f"unknown suffix-table version {version!r}; "
            f"known: {sorted(SUFFIX_VERSIONS)}"
        )
    return SUFFIX_VERSIONS[version]


def plain_suffixes_for(version: int = CURRENT_SUFFIXES) -> tuple[str, ...]:
    """The plain two-label entries of a version's rule table."""
    return tuple(
        s for s in suffixes_for(version) if not s.startswith(("*.", "!"))
    )


def wildcard_tlds_for(version: int = CURRENT_SUFFIXES) -> tuple[str, ...]:
    """TLDs under a `*.tld` wildcard rule (empty before v3)."""
    return tuple(
        s[2:] for s in suffixes_for(version) if s.startswith("*.")
    )


def exception_hosts_for(version: int = CURRENT_SUFFIXES) -> tuple[str, ...]:
    """`!host` exception entries, bang stripped (empty before v3)."""
    return tuple(s[1:] for s in suffixes_for(version) if s.startswith("!"))


def suffix_dim(spark: SparkSession) -> DataFrame:
    """The suffix tables as a joinable config table
    ``(suffix_version, suffix)`` — dim-sized, broadcast by joins; v3
    rows include the rule-grammar entries verbatim."""
    rows = [
        (v, s) for v in sorted(SUFFIX_VERSIONS) for s in suffixes_for(v)
    ]
    return spark.createDataFrame(rows, "suffix_version int, suffix string")


# back-compat module constant: the CURRENT version's PLAIN two-label
# table (the pre-v3 meaning — callers that membership-test a host tail
# against it, like the test reference implementation, keep working)
MULTI_LABEL_SUFFIXES: tuple[str, ...] = plain_suffixes_for()

# versioned domain blocklists (the MERGE_VERSIONS / QUALITY_MODEL_VERSIONS
# design: curation policy upgrades are data changes; append-only)
BLOCKLIST_VERSIONS: dict[int, tuple[str, ...]] = {
    1: ("spam-mill.com", "tracker-farm.net"),
}
CURRENT_BLOCKLIST = 1


def blocklist_for(version: int = CURRENT_BLOCKLIST) -> tuple[str, ...]:
    if version not in BLOCKLIST_VERSIONS:
        raise ValueError(
            f"unknown domain blocklist version {version!r}; "
            f"known: {sorted(BLOCKLIST_VERSIONS)}"
        )
    return BLOCKLIST_VERSIONS[version]


def blocklist_dim(spark: SparkSession) -> DataFrame:
    """The blocklists as a joinable config table
    ``(blocklist_version, domain)`` — dim-sized, broadcast by joins."""
    rows = [
        (v, d) for v in sorted(BLOCKLIST_VERSIONS) for d in blocklist_for(v)
    ]
    return spark.createDataFrame(rows, "blocklist_version int, domain string")


# --- normalization columns ----------------------------------------------

def normalize_url_col(url: Column) -> Column:
    """The five-step normalization above as one JVM expression tree."""
    u1 = F.regexp_replace(url, r"#.*$", "")  # (1) fragment
    head = F.regexp_extract(u1, r"^[^:/?#]+://[^/?#]*", 0)
    tail = F.substring(u1, F.length(head) + 1, F.lit(1 << 30))
    head = F.lower(head)  # (2) scheme+host
    head = (
        F.when(  # (3) default ports — scheme-gated both ways (r17)
            head.startswith("http://"), F.regexp_replace(head, r":80$", "")
        )
        .when(head.startswith("https://"), F.regexp_replace(head, r":443$", ""))
        .otherwise(head)
    )
    qi = F.instr(tail, "?")
    path = F.when(qi > 0, F.substring(tail, F.lit(1), qi - 1)).otherwise(tail)
    query = F.when(qi > 0, F.substring(tail, qi + 1, F.lit(1 << 30))).otherwise(
        F.lit("")
    )
    kept = F.filter(  # (4) tracking params
        F.split(query, "&"),
        lambda p: ~F.lower(p).rlike(TRACKING_PARAM_RE),
    )
    q_n = F.when(
        (query != "") & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    path_n = F.when((path == "/") & (q_n == ""), F.lit("")).otherwise(path)  # (5)
    return F.concat(head, path_n, q_n)


def host_col(url_norm: Column) -> Column:
    """Host of an already-normalized URL, port stripped."""
    return F.regexp_replace(
        F.regexp_extract(url_norm, r"^[^:/?#]+://([^/?#]*)", 1),
        r":[0-9]+$",
        "",
    )


def _multi_label_cond(
    labels: Column, n: Column, last2: Column, suffix_version: int
) -> Column:
    """True when the host's registrable domain takes THREE labels:
    its 2-label tail is a plain multi-label suffix, or (v3+) its TLD
    is under a `*.tld` wildcard rule and the tail is not an `!host`
    exception (the PSL prevailing-rule algorithm restricted to this
    table's rule shapes — single-label wildcard bases, 2-label
    exceptions). A 2-label host under a wildcard (e.g. ``foo.ck`` —
    itself a public suffix, no registrable domain per PSL) degrades to
    the 2-label tail like every other suffix-only host here,
    documented behavior."""
    cond = (n >= 3) & last2.isin(*plain_suffixes_for(suffix_version))
    wild = wildcard_tlds_for(suffix_version)
    if wild:
        w = F.try_element_at(labels, F.lit(-1)).isin(*wild)
        exc = exception_hosts_for(suffix_version)
        if exc:
            w = w & ~last2.isin(*exc)
        cond = cond | ((n >= 3) & w)
    return cond


def registrable_domain_col(
    host: Column, suffix_version: int = CURRENT_SUFFIXES
) -> Column:
    """eTLD+1 under the config suffix subset (module docstring);
    ``suffix_version`` pins the table generation (r18); v3 applies the
    wildcard/exception rule grammar (r19)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: a single-label host (no dot) must degrade to the
    # host itself, not an ANSI out-of-range error (concat_ws skips the
    # NULL); the oracle twin only sees >=2-label hosts by construction
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    return F.when(
        _multi_label_cond(labels, n, last2, suffix_version),
        F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2),
    ).otherwise(last2)


def url_columns(
    url: Column,
    blocklist_version: int = CURRENT_BLOCKLIST,
    suffix_version: int = CURRENT_SUFFIXES,
) -> dict[str, Column]:
    """``url_norm`` / ``host`` / ``domain`` / ``blocked`` in one dict —
    callers project them in a single map-side select."""
    url_norm = normalize_url_col(url)
    host = host_col(url_norm)
    domain = registrable_domain_col(host, suffix_version)
    return {
        "url_norm": url_norm,
        "host": host,
        "domain": domain,
        "blocked": domain.isin(*blocklist_for(blocklist_version)),
    }


def with_url_columns(
    df: DataFrame,
    url_col: str | Column,
    blocklist_version: int = CURRENT_BLOCKLIST,
    suffix_version: int = CURRENT_SUFFIXES,
) -> DataFrame:
    """Staged form of :func:`url_columns` for corpus-sized scans:
    appends ``url_norm`` / ``host`` / ``domain`` / ``blocked``.

    Why this exists (the r15 classifier-scoring lesson, SCALE.md):
    :func:`url_columns` hands back ONE expression tree per output, and
    Column trees copy their sub-expressions at every reference site —
    ``domain`` re-derives ``host``, which re-derives ``url_norm``,
    which re-derives the fragment-stripped URL at each of its ~15
    internal references, so the four outputs together evaluate the
    same regexes hundreds of times per row (measured 5+ s at sf0.1 for
    a "map-side" projection). Here every shared subtree is staged as a
    real column that the NEXT layer references at least twice — the
    exact condition under which CollapseProject keeps the stage
    instead of silently inlining it back — so each regex runs once per
    row. Output values are bit-identical to :func:`url_columns` (same
    expressions, same order); only the physical plan differs.
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    # drop exactly the staging columns THIS function adds — never a
    # caller's own '__'-prefixed columns (r17 ADVICE fix); a colliding
    # input name would be silently overwritten by withColumn, so refuse
    collide = _STAGING_COLUMNS.intersection(df.columns)
    if collide:
        raise ValueError(
            f"with_url_columns staging columns already present in input: "
            f"{sorted(collide)}; rename them before calling"
        )
    out = df.withColumn("__u1", F.regexp_replace(u, r"#.*$", ""))
    out = out.withColumn(
        "__head0", F.regexp_extract(F.col("__u1"), r"^[^:/?#]+://[^/?#]*", 0)
    )
    out = out.withColumn(
        "__tail",
        F.substring(F.col("__u1"), F.length("__head0") + 1, F.lit(1 << 30)),
    ).withColumn("__head1", F.lower(F.col("__head0")))
    out = out.withColumn(
        "__head",
        F.when(
            F.col("__head1").startswith("http://"),
            F.regexp_replace(F.col("__head1"), r":80$", ""),
        )
        .when(
            F.col("__head1").startswith("https://"),
            F.regexp_replace(F.col("__head1"), r":443$", ""),
        )
        .otherwise(F.col("__head1")),
    ).withColumn("__qi", F.instr(F.col("__tail"), "?"))
    out = out.withColumn(
        "__path",
        F.when(
            F.col("__qi") > 0,
            F.substring(F.col("__tail"), F.lit(1), F.col("__qi") - 1),
        ).otherwise(F.col("__tail")),
    ).withColumn(
        "__query",
        F.when(
            F.col("__qi") > 0,
            F.substring(F.col("__tail"), F.col("__qi") + 1, F.lit(1 << 30)),
        ).otherwise(F.lit("")),
    )
    out = out.withColumn(
        "__kept",
        F.filter(
            F.split(F.col("__query"), "&"),
            lambda p: ~F.lower(p).rlike(TRACKING_PARAM_RE),
        ),
    )
    out = out.withColumn(
        "__q_n",
        F.when(
            (F.col("__query") != "") & (F.size("__kept") > 0),
            F.concat(F.lit("?"), F.array_join(F.col("__kept"), "&")),
        ).otherwise(F.lit("")),
    )
    out = out.withColumn(
        "__path_n",
        F.when(
            (F.col("__path") == "/") & (F.col("__q_n") == ""), F.lit("")
        ).otherwise(F.col("__path")),
    )
    out = out.withColumn(
        "url_norm", F.concat(F.col("__head"), F.col("__path_n"), F.col("__q_n"))
    )
    out = out.withColumn("host", host_col(F.col("url_norm")))
    out = out.withColumn("__labels", F.split(F.col("host"), r"\."))
    out = out.withColumn(
        "__last2",
        F.concat_ws(
            ".",
            F.try_element_at(F.col("__labels"), F.lit(-2)),
            F.try_element_at(F.col("__labels"), F.lit(-1)),
        ),
    )
    out = out.withColumn(
        "domain",
        F.when(
            _multi_label_cond(
                F.col("__labels"),
                F.size("__labels"),
                F.col("__last2"),
                suffix_version,
            ),
            F.concat_ws(
                ".", F.try_element_at(F.col("__labels"), F.lit(-3)), F.col("__last2")
            ),
        ).otherwise(F.col("__last2")),
    )
    out = out.withColumn(
        "blocked", F.col("domain").isin(*blocklist_for(blocklist_version))
    )
    return out.drop(*sorted(_STAGING_COLUMNS))


# the fixed set of intermediate columns with_url_columns stages (and
# drops); kept as data so the drop can never swallow caller columns
_STAGING_COLUMNS: frozenset[str] = frozenset(
    {
        "__u1", "__head0", "__tail", "__head1", "__head", "__qi",
        "__path", "__query", "__kept", "__q_n", "__path_n",
        "__labels", "__last2",
    }
)


# --- DuckDB twins --------------------------------------------------------

def normalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`normalize_url_col` — same step order, same
    regex subset (RE2-safe: no backrefs/lookaround)."""
    u1 = f"regexp_replace({expr}, '#.*$', '')"
    head0 = f"COALESCE(regexp_extract({u1}, '^[^:/?#]+://[^/?#]*', 0), '')"
    tail = f"substr({u1}, length({head0}) + 1)"
    head1 = f"lower({head0})"
    head = (
        f"(CASE WHEN {head1} LIKE 'http://%' "
        f"THEN regexp_replace({head1}, ':80$', '') "
        f"WHEN {head1} LIKE 'https://%' "
        f"THEN regexp_replace({head1}, ':443$', '') "
        f"ELSE {head1} END)"
    )
    qi = f"strpos({tail}, '?')"
    path = f"(CASE WHEN {qi} > 0 THEN substr({tail}, 1, {qi} - 1) ELSE {tail} END)"
    query = f"(CASE WHEN {qi} > 0 THEN substr({tail}, {qi} + 1) ELSE '' END)"
    kept = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> NOT regexp_matches(lower(p), '{TRACKING_PARAM_RE}'))"
    )
    q_n = (
        f"(CASE WHEN {query} <> '' AND len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END)"
    )
    path_n = (
        f"(CASE WHEN {path} = '/' AND {q_n} = '' THEN '' ELSE {path} END)"
    )
    return f"({head} || {path_n} || {q_n})"


def host_sql(url_norm_expr: str) -> str:
    return (
        f"regexp_replace(COALESCE(regexp_extract({url_norm_expr}, "
        f"'^[^:/?#]+://([^/?#]*)', 1), ''), ':[0-9]+$', '')"
    )


def registrable_domain_sql(
    host_expr: str, suffix_version: int = CURRENT_SUFFIXES
) -> str:
    """DuckDB twin of :func:`registrable_domain_col`, version-gated the
    same way: the wildcard/exception disjunct is emitted only for
    versions whose rule table carries those entries."""
    suffixes = ", ".join(f"'{s}'" for s in plain_suffixes_for(suffix_version))
    labels = f"string_split({host_expr}, '.')"
    n = f"len({labels})"
    last2 = f"({labels}[{n} - 1] || '.' || {labels}[{n}])"
    cond = f"{last2} IN ({suffixes})"
    wild = wildcard_tlds_for(suffix_version)
    if wild:
        tlds = ", ".join(f"'{t}'" for t in wild)
        w = f"{labels}[{n}] IN ({tlds})"
        exc = exception_hosts_for(suffix_version)
        if exc:
            hosts = ", ".join(f"'{h}'" for h in exc)
            w = f"({w} AND {last2} NOT IN ({hosts}))"
        cond = f"({cond} OR {w})"
    return (
        f"(CASE WHEN {n} >= 3 AND {cond} "
        f"THEN {labels}[{n} - 2] || '.' || {last2} "
        f"ELSE {last2} END)"
    )


def blocked_sql(domain_expr: str, blocklist_version: int = CURRENT_BLOCKLIST) -> str:
    doms = ", ".join(f"'{d}'" for d in blocklist_for(blocklist_version))
    return f"({domain_expr} IN ({doms}))"
