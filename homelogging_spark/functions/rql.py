"""RQL-flavored time-series SQL sugar (SURVEY §4 "GROUP BY time-bucket
SQL sugar").

The reference's analytic reads are RavenDB RQL strings like

    from 'Meters' where id() == $p0
    select timeseries(from 'Power' between $from and $to
                      group by '1 hour' select avg())

(``Deploy/switchboiler.sh:5``; the LINQ provider emits the same shape
from ``RandomQueries/Program.cs:71-75``). Everything in that surface
maps to standard Spark SQL except two affordances:

- ``GROUP BY '<interval>'`` — bucket rows by an arbitrary interval;
- ``LAST <n> <unit>`` — a trailing time-range filter
  (``from 'Power' last 5 minutes``, ``Deploy/switchboiler.sh:5``).

Per SURVEY §4 this needs no custom Catalyst rule — a tiny parser-level
rewrite to the built-in ``window()`` / timestamp arithmetic suffices,
and Catalyst then plans it exactly like the hand-written form (same
partial/final aggregation, same pushdown). This module is that rewrite:
a pure string→string transform, so the result stays a plain
``spark.sql`` query with the full optimizer behind it.

Rewrites (case-insensitive, string-literal aware):

1. ``GROUP BY '<interval>'[, more keys]``
   → ``GROUP BY window(<ts_col>, '<interval>')[, more keys]``
2. the bare identifier ``bucket_start`` / ``bucket_end``
   → ``window.start`` / ``window.end`` (the grouping struct's fields),
   usable in SELECT and ORDER BY of the grouped query;
3. ``LAST <n> <unit>`` (as a predicate term)
   → ``<ts_col> >= <now> - INTERVAL <n> <unit>`` where ``<now>`` is
   the ``now`` argument (deterministic queries — tests, oracles) or
   ``current_timestamp()`` when omitted.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_INTERVAL_UNITS = (
    "second seconds minute minutes hour hours day days week weeks "
    "month months year years"
).split()


def rewrite_rql(sql: str, ts_col: str = "ts", now: str | None = None) -> str:
    """Rewrite the RQL sugar in ``sql`` to standard Spark SQL. Pure
    string transform; returns standard SQL for ``spark.sql``."""
    unit_re = "|".join(_INTERVAL_UNITS)

    # 1. GROUP BY '<interval>' → GROUP BY window(ts, '<interval>')
    def _gb(m: re.Match) -> str:
        return f"GROUP BY window({ts_col}, '{m.group(1)}')"

    out = re.sub(
        rf"\bGROUP\s+BY\s+'(\d+\s+(?:{unit_re}))'",
        _gb,
        sql,
        flags=re.IGNORECASE,
    )

    now_expr = f"TIMESTAMP '{now}'" if now is not None else "current_timestamp()"

    def _last(m: re.Match) -> str:
        return f"{ts_col} >= {now_expr} - INTERVAL {m.group(1)} {m.group(2)}"

    # rules 2-3 touch bare identifiers/keywords, so they must not reach
    # inside string literals: transform only the unquoted segments
    segs = re.split(r"('(?:[^']|'')*')", out)
    for i in range(0, len(segs), 2):  # even indices = outside quotes
        s = segs[i]
        # 2. bucket_start / bucket_end → the window struct fields
        s = re.sub(r"\bbucket_start\b", "window.start", s)
        s = re.sub(r"\bbucket_end\b", "window.end", s)
        # 3. LAST <n> <unit> → trailing range predicate
        s = re.sub(
            rf"\bLAST\s+(\d+)\s+({unit_re})\b", _last, s, flags=re.IGNORECASE
        )
        segs[i] = s
    return "".join(segs)


def sql_rql(
    spark: SparkSession,
    sql: str,
    ts_col: str = "ts",
    now: str | None = None,
) -> DataFrame:
    """``spark.sql`` with the RQL sugar enabled: rewrite, then hand the
    standard SQL to Catalyst."""
    return spark.sql(rewrite_rql(sql, ts_col=ts_col, now=now))
