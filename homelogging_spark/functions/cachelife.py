"""Cache lifecycle for per-query persisted intermediates.

Operators that reuse a frame across two sides of a self-join (LSH
signature tables, bucket frames) persist() it so the projection folds
run once — but the operator returns a lazy DataFrame, so it cannot
unpersist before the caller has executed the plan. Left alone, each
invocation leaks one cached frame for the session lifetime (a slow
memory leak in a long-lived driver).

``tracked_persist`` registers every such frame; a driver calls
``release_caches()`` at its own safe point — after an action has
consumed the query (bench does this per query, the oracle checker per
comparison). Frames memoized across queries on purpose (the battery
sim, ``plans/battery_registry._SIM_CACHE``) do NOT use this tracker:
releasing them would silently turn the memo into a recompute-every-use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for a later bulk release."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (blocking=False: executors free the
    blocks asynchronously). Returns how many were released. Safe to call
    any time — an unpersisted frame that is re-executed later is merely
    recomputed, never wrong."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
    _TRACKED.clear()
    return n
