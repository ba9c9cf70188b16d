"""Join operators (SURVEY.md §2.5).

The reference's flagship join is a *bucket-aligned equi join* (hourly series
dict-joined by truncated hour — ``RandomQueries/Program.cs:33-45``), NOT an
interpolating as-of join: missing right-hand buckets become 0.0.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aligned_left_join(
    left: DataFrame,
    rights: Sequence[tuple[DataFrame, Sequence[str], float]],
    on: Sequence[str],
    broadcast_right: bool = True,
) -> DataFrame:
    """Left-join one or more bucket-keyed series onto ``left`` with
    missing-as-default semantics (J1 + F6 — ``RandomQueries/Program.cs:38-45``
    dict ``TryGetValue`` → 0.0).

    ``rights``: (df, value_columns, default) triples. Each right side is a
    bucketed aggregate (hours/minutes), i.e. tiny relative to the fact scan,
    so we broadcast it — no shuffle of the big side. At 100 TB the left is
    the only large input and it streams through N broadcast hash joins in a
    single stage.
    """
    out = left
    for right, value_cols, default in rights:
        r = F.broadcast(right) if broadcast_right else right
        out = out.join(r, on=list(on), how="left")
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return out


def key_normalized_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Identity lookup with normalized keys (J3 — MAC matched
    case/separator-insensitively, ``Tapo/TapoLogger.cs:158-161``)."""

    def norm(c):
        return F.upper(F.translate(F.col(c), ":-.", ""))

    return left.join(right, norm(left_key) == norm(right_key), how)
