"""Numeric scalar helpers.

``quantize`` exists for cross-engine determinism: Spark's ``round()``
rounds the decimal rendering of a double (BigDecimal HALF_UP) while most
engines (DuckDB, Postgres) round in double math — the two disagree at
digit boundaries. ``floor(x * 10^d + 0.5) / 10^d`` is pure IEEE double
arithmetic, so any engine evaluating the same formula on the same input
produces the same bits. Use it whenever a result column must hash-match
an external oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, decimals: int = 6) -> Column:
    """Deterministic cross-engine rounding: floor(x*10^d + 0.5)/10^d."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**decimals)
    return F.floor(col * scale + F.lit(0.5)) / scale


def quantize_sql(expr: str, decimals: int = 6) -> str:
    """The same formula as ANSI SQL text, for oracle queries."""
    scale = 10**decimals
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
