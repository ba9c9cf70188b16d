"""Shuffle shaping for Pandas-fold operators.

``groupBy(keys).applyInPandas(...)`` inserts its own hash exchange, and
AQE's partition coalescing then sizes the post-shuffle partitions by
BYTES. For a fold, bytes are the wrong cost model: each GROUP costs a
Python interpreter round-trip (Arrow slice + pandas construction + the
fold body), so a "small" shuffle of a few MB holding thousands of
groups coalesces to one task and serializes every per-group call behind
a single Python worker — measured 6× on the Kasa offset fold at sf0.1
(5.2 s → 0.8 s).

The fix: repartition on the fold keys with an EXPLICIT partition count
before the groupBy. An exchange with a user-specified partition count
is exempt from AQE coalescing, and ``applyInPandas`` reuses it (its
required HashClusteredDistribution is already satisfied), so the fold
runs at the session's full parallelism. At 100 TB the same exchange is
what the fold needs anyway — this only pins the floor on parallelism,
never adds a second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_partitioned(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Hash-partition ``df`` on ``keys`` at the session's default
    parallelism so a following ``groupBy(keys).applyInPandas`` spreads
    its per-group Python calls across every core (see module docstring)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])
