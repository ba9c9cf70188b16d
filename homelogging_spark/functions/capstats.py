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

Threading: the pending queue is scoped PER THREAD (the
``cachelife.cache_scope`` precedent) — ``foreachBatch`` bodies run on
stream-execution threads, so two concurrent streams each observe and
drain only their own attachments, never each other's. Attach and drain
must therefore happen on the same thread (they do naturally: the
operator call and the consuming action live in the same foreachBatch
body / driver loop).

Usage::

    pairs = lsh_near_dup_pairs(df, 0.9, bucket_cap=50, observe_caps=True)
    pairs.count()                      # any action
    for line in drain_cap_stats():     # logged + returned
        ...  # {'guard': 'bucket_cap', 'buckets': 64, 'buckets_split': 3,
             #  'max_splits': 7}

``drain_cap_stats()`` blocks on ``Observation.get`` — call it AFTER the
consuming action (its documented contract). Pass ``timeout_s`` when the
action might not have run (a caller that may error between attach and
action — e.g. a guarded streaming batch body): observations whose plan
hasn't executed by the deadline are dropped with a logged warning and
returned as ``{'guard': ..., 'timed_out': True}`` rows instead of
blocking the thread forever. In a streaming foreachBatch loop, drain
once per batch."""

from __future__ import annotations

import logging
import threading
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOG = logging.getLogger("homelogging_spark.capstats")

_LOCK = threading.RLock()
# thread ident -> that thread's attach-ordered (guard, Observation) queue
_PENDING: dict[int, list[tuple[str, object]]] = {}


def _rehome(df: DataFrame, anchor: DataFrame) -> DataFrame:
    """Re-plan ``df`` onto ``anchor``'s SparkSession when they differ.

    Observation metrics are delivered through the listener bus of the
    session that EXECUTES the plan — inside ``foreachBatch`` that is a
    per-stream CLONED session, so an observation attached to a frame of
    the main session never fires there (measured r14). Re-homing the
    census's logical plan onto the executing session (the batch frame
    is the anchor) makes the registration land on the right bus.
    Classic py4j sessions only; on any failure the original frame is
    returned and the drain's timeout backstop reports the observation
    as timed out rather than wedging."""
    try:
        if anchor is None or anchor.sparkSession is df.sparkSession:
            return df
        jvm = df.sparkSession._jvm
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            anchor._jdf.sparkSession(), df._jdf.logicalPlan()
        )
        return DataFrame(jdf, anchor.sparkSession)
    except Exception:
        return df


def observe_cap_splits(
    splits: DataFrame,
    guard: str,
    n_splits_col: str = "_n_splits",
    session_of: DataFrame | None = None,
) -> DataFrame:
    """Attach a cap-guard observation to a splits census frame:
    total buckets, buckets the cap actually split, and the worst split
    factor. Returns the frame with the observe node attached. The
    observation is queued for THIS thread's ``drain_cap_stats``.

    ``session_of``: anchor frame whose SparkSession will execute the
    consuming action — pass the micro-batch frame from a foreachBatch
    body so the observation registers on the executing (cloned)
    session's listener bus (see :func:`_rehome`)."""
    from pyspark.sql import Observation

    splits = _rehome(splits, session_of)
    obs = Observation()
    out = splits.observe(
        obs,
        F.count(F.lit(1)).alias("buckets"),
        F.sum((F.col(n_splits_col) > 1).cast("long")).alias("buckets_split"),
        F.coalesce(F.max(n_splits_col), F.lit(0)).alias("max_splits"),
    )
    with _LOCK:
        _PENDING.setdefault(threading.get_ident(), []).append((guard, obs))
    return out


def _metrics_ready(obs) -> bool:
    """Non-blocking-ish readiness probe: the JVM ``getRowOrEmpty``
    waits at most ~100 ms and returns an empty ``Option`` when the
    observed plan hasn't executed. Classic (py4j) sessions only;
    anything without the hook reports ready and falls through to the
    blocking ``get``."""
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return True
    try:
        return not jo.getRowOrEmpty().isEmpty()
    except Exception:  # unexpected JVM surface — don't break the drain
        return True


def drain_cap_stats(timeout_s: float | None = None) -> list[dict]:
    """Collect (and log) the metrics of every observation THIS thread
    attached since its last drain, in attach order. With the default
    ``timeout_s=None`` each ``Observation.get`` blocks until its plan
    executes — call after the consuming action (module docstring). With
    a timeout, observations still unexecuted at the deadline are dropped
    (warning logged) and reported as ``{'guard': ..., 'timed_out':
    True}`` rows, so a caller that errored between attach and action
    cannot hang the drain."""
    with _LOCK:
        mine = _PENDING.pop(threading.get_ident(), [])
    deadline = None if timeout_s is None else time.monotonic() + timeout_s
    out: list[dict] = []
    for guard, obs in mine:
        if deadline is not None:
            while not _metrics_ready(obs):
                if time.monotonic() >= deadline:
                    break
                time.sleep(0.05)
            if not _metrics_ready(obs):
                LOG.warning(
                    "cap guard %s: observed plan never executed within "
                    "%.1fs — observation dropped",
                    guard,
                    timeout_s,
                )
                out.append({"guard": guard, "timed_out": True})
                continue
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
    """Count of THIS thread's not-yet-drained observations."""
    with _LOCK:
        return len(_PENDING.get(threading.get_ident(), ()))
