"""Time-series subsequence pattern matching (similarity search).

"Find the stretches that look like THIS" — the query the reference's
dashboards answer by eye (flow-temperature curves, battery cycles,
defrost dips) and the retrieved corpus treats as a first-class
distributed problem (Time Series Similarity Search for Streaming Data
in Distributed Systems, EDBT 2019). Given a length-L query pattern,
score every length-L contiguous hourly subsequence of every series by
z-normalized Euclidean distance — shape match, invariant to each
window's offset and amplitude — and return the global top-k.

Spark shape (scale notes):

- The sliding windows come from a per-series ``rowsBetween(-(L-1), 0)``
  frame over the hourly grid — partitioned by series, never global;
  state per task is the L-row frame. Contiguity is enforced by
  comparing the frame's first bucket index to ``current - (L-1)``
  (gappy stretches produce no candidate rather than a wrong one).
- The z-normalized distance is pure column algebra over the collected
  window array (``aggregate``/``zip_with`` — JVM-side, no UDF):
  dist² = Σ (ẑ_w[i] − ẑ_p[i])², with the pattern's ẑ_p a literal
  array broadcast in the plan. μ comes from the SAME window frame as
  the array (``avg().over(w)`` — bit-identical to the sequential fold:
  both add the frame in order from 0.0, then divide by L), and σ is
  staged as a real column in an intermediate projection, so every
  per-element lambda references plain attributes. The naive form —
  μ/σ as aggregate EXPRESSIONS embedded in the lambdas — re-evaluates
  those folds per element (O(L²)+ per row; measured ~2x slower at
  sf0.1, SCALE.md r15). The expanded closed form (dist² = L + Σẑ_p²
  − 2Σw·ẑ_p/σ …) was measured and REJECTED: one fewer fold, but the
  ≈L−L cancellation leaves a ~√(L·ε) ≈ 1e-7 noise floor exactly at
  the perfect-match distances the query ranks by.
- Top-k is a global ``orderBy(dist).limit(k)`` —
  TakeOrderedAndProject, per-partition heaps then one k-row merge,
  never a full sort.
- Flat windows (std = 0) carry no shape: scored only if the pattern is
  also flat (then dist 0 by convention), else skipped — mirrors the
  z-norm domain. Flatness is the exact element-equality test, never a
  σ≈0 threshold.

At 100 TB the hourly grid per series is ~9k rows/year — the window
frame stays tiny; the candidate stream is one row per (series, hour)
and the top-k heap bounds what survives each task.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _znorm_literal(pattern: Sequence[float]) -> list[float]:
    mu = sum(pattern) / len(pattern)
    var = sum((x - mu) ** 2 for x in pattern) / len(pattern)
    sd = math.sqrt(var)
    if sd == 0.0:
        return [0.0] * len(pattern)
    return [(x - mu) / sd for x in pattern]




def pattern_match_topk(
    hourly: DataFrame,
    pattern: Sequence[float],
    key_col: str = "series",
    bucket_col: str = "bucket",
    value_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Global top-``k`` z-normalized matches of ``pattern`` over every
    series' hourly sequence.

    ``hourly``: one row per (key, bucket) with ``bucket`` a timestamp
    on a regular hourly grid (`q_grid_resample_locf`'s output contract;
    gaps allowed — gappy windows are skipped, not mis-scored).

    Output: ``key, window_start, window_end, dist, window_values`` —
    ascending distance, ties broken by (key, window_start) so the
    result is deterministic.
    """
    L = len(pattern)
    if L < 2:
        raise ValueError("pattern needs at least 2 points")
    zp = _znorm_literal(pattern)
    pat_flat = all(v == 0.0 for v in zp)
    idx = F.floor(F.unix_timestamp(F.col(bucket_col)) / 3600).cast("bigint")
    renamed = hourly.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col),
        idx.alias("__idx"),
        F.col(value_col).cast("double").alias("__v"),
    )
    w = Window.partitionBy("key").orderBy(F.col("__idx").asc()).rowsBetween(
        -(L - 1), 0
    )
    framed = renamed.select(
        "key",
        F.col(bucket_col),
        "__idx",
        F.collect_list("__v").over(w).alias("__win"),
        # same frame, same order, same 0.0-seeded sequential adds as the
        # fold the naive form embedded — bit-identical μ, zero re-eval
        F.avg("__v").over(w).alias("__mu"),
        F.min("__idx").over(w).alias("__first_idx"),
        # count the VALUE, not rows: collect_list drops nulls, so a null
        # value inside the frame must shrink __n below L and fail the
        # completeness gate — counting rows would let a null-padded
        # window through with a NULL distance that sorts into the top-k
        # (r7 ADVICE finding)
        F.count("__v").over(w).alias("__n"),
    )
    # full AND contiguous: L rows whose first bucket is exactly L-1 back
    cand = framed.where(
        (F.col("__n") == L) & (F.col("__first_idx") == F.col("__idx") - (L - 1))
    )
    # staged scoring (module docstring): μ is already a column from the
    # window stage; σ becomes one here. Each later lambda references
    # plain attributes, so no aggregate subtree is re-evaluated per
    # element — O(L) per row, arithmetic unchanged from the naive form.
    n = F.lit(float(L))
    zp_lit = F.array(*[F.lit(float(v)) for v in zp])
    with_sd = cand.withColumn(
        "__sd",
        F.sqrt(
            F.aggregate(
                F.col("__win"),
                F.lit(0.0),
                lambda a, x: a + (x - F.col("__mu")) * (x - F.col("__mu")),
            )
            / n
        ),
    )
    # ẑ_w elementwise, referencing the staged μ/σ; flat windows (σ = 0)
    # z-norm to all-zeros exactly as before
    znorm = lambda x: F.when(  # noqa: E731
        F.col("__sd") > 0, (x - F.col("__mu")) / F.col("__sd")
    ).otherwise(F.lit(0.0))
    dist2 = F.aggregate(
        F.zip_with(
            F.col("__win"), zp_lit, lambda x, p: (znorm(x) - p) * (znorm(x) - p)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = with_sd.select(
        "key",
        (F.col(bucket_col) - F.expr(f"INTERVAL {L - 1} HOURS")).alias(
            "window_start"
        ),
        F.col(bucket_col).alias("window_end"),
        F.sqrt(dist2).alias("dist"),
        F.col("__win").alias("window_values"),
    )
    if not pat_flat:
        # flat windows z-norm to all-zeros; against a non-flat pattern
        # their distance is the pattern's norm — a degenerate "match
        # anything flat" artifact. Drop them (exact element equality).
        scored = scored.where(
            F.exists(
                F.col("window_values"),
                lambda x: x != F.element_at(F.col("window_values"), 1),
            )
        )
    return scored.orderBy(F.asc("dist"), "key", "window_start").limit(k)
