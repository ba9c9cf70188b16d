"""Hot-bucket cap observability — "no silent caps" for PRODUCTION runs.

Every candidate-pair stage in the dedup/ANN tier is bounded by a
deterministic hot-bucket guard (``band_cap`` / ``bucket_cap`` /
``cell_cap``): buckets over the cap are hash-split and a qualifying
pair can lose that bucket's chance. The guards are measured and
documented (SCALE.md), but a production run should also SEE when a cap
actually fired — a corpus whose density peaks grow over time silently
loses a little more recall each cycle otherwise.

Mechanism: ``pyspark.sql.Observation`` attached to the (dim-sized)
splits census inside the guarded operator — metrics ride the SAME
action that executes the consumer, zero extra jobs, no change to the
emitted rows. Opt-in via the operators' ``observe_caps=True`` so
registered-query plans stay byte-identical by default.

Usage::

    pairs = lsh_near_dup_pairs(df, 0.9, bucket_cap=50, observe_caps=True)
    pairs.count()                      # any action
    for line in drain_cap_stats():     # logged + returned
        ...  # {'guard': 'bucket_cap', 'buckets': 64, 'buckets_split': 3,
             #  'max_splits': 7}

``drain_cap_stats`` blocks on ``Observation.get`` — call it AFTER the
consuming action (its documented contract). In a streaming foreachBatch
loop, drain once per batch."""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOG = logging.getLogger("homelogging_spark.capstats")

_PENDING: list[tuple[str, object]] = []


def observe_cap_splits(
    splits: DataFrame, guard: str, n_splits_col: str = "_n_splits"
) -> DataFrame:
    """Attach a cap-guard observation to a splits census frame:
    total buckets, buckets the cap actually split, and the worst split
    factor. Returns the frame with the observe node attached."""
    from pyspark.sql import Observation

    obs = Observation()
    out = splits.observe(
        obs,
        F.count(F.lit(1)).alias("buckets"),
        F.sum((F.col(n_splits_col) > 1).cast("long")).alias("buckets_split"),
        F.coalesce(F.max(n_splits_col), F.lit(0)).alias("max_splits"),
    )
    _PENDING.append((guard, obs))
    return out


def drain_cap_stats() -> list[dict]:
    """Collect (and log) the metrics of every observation attached since
    the last drain. Call after the consuming action has run — each
    ``Observation.get`` blocks until its plan executes."""
    out: list[dict] = []
    while _PENDING:
        guard, obs = _PENDING.pop(0)
        row = dict(obs.get)
        row["guard"] = guard
        out.append(row)
        LOG.info(
            "cap guard %s: %s/%s buckets split (max split factor %s)",
            guard,
            row.get("buckets_split"),
            row.get("buckets"),
            row.get("max_splits"),
        )
    return out


def pending_cap_observations() -> int:
    return len(_PENDING)
