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

``drain_cap_stats()`` blocks until the observed plan executes — call it
AFTER the consuming action (its documented contract). Pass ``timeout_s``
when the action might not have run (a caller that may error between
attach and action — e.g. a guarded streaming batch body): observations
whose plan hasn't executed by the deadline are dropped with a logged
warning and returned as ``{'guard': ..., 'timed_out': True}`` rows
instead of blocking the thread forever. In a streaming foreachBatch
loop, drain once per batch; on a failure path where the action never
ran, ``discard_cap_stats()`` instead (no timeout burned, no leak to a
reused thread ident).

The drain is FAIL-OPEN and returns one row per attached observation,
always with ``guard`` plus one of: the census values (delivered),
``timed_out`` (plan never executed / no readiness probe under a
deadline), ``pruned`` (AQE empty-relation propagation dropped the
executed census stage from the final plan — wrap the consuming action
in ``cap_observation_scope`` to prevent this), or ``error`` (metrics
extraction failed; logged, never raised — an observability failure must
never take down the observed pipeline).

Metrics are read JVM-side via py4j getters on the observation row, not
through ``Observation.get``'s pickler — on this Spark build
``PythonSQLUtils.toPyRow`` asserts on the row a ``_rehome``-replanted
observation delivers inside ``foreachBatch`` (measured r14)."""

from __future__ import annotations

import contextlib
import logging
import threading
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOG = logging.getLogger("homelogging_spark.capstats")

_LOCK = threading.RLock()
# thread ident -> that thread's attach-ordered queue of
# (guard, Observation, metric names in attach order) — the names are
# the positional fallback when the JVM row arrives schemaless
# (see _jvm_metrics)
_PENDING: dict[int, list[tuple[str, object, tuple[str, ...]]]] = {}

# observe_cap_splits' fixed census shape, in attach order
_METRIC_NAMES = ("buckets", "buckets_split", "max_splits")


_EMPTY_PROP_RULE = (
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
)
_EXCLUDED_RULES_KEY = "spark.sql.adaptive.optimizer.excludedRules"


@contextlib.contextmanager
def cap_observation_scope(spark):
    """Guarantee cap-observation DELIVERY for actions run inside the
    scope: excludes AQE's empty-relation propagation on ``spark`` and
    restores the previous setting on exit.

    Why: the census rides the consumer's plan via a row-preserving
    carrier join. When a runtime stage of that plan turns out EMPTY (a
    micro-batch with zero near-dup candidates), AQEPropagateEmptyRelation
    replaces the joins above it with an empty relation and DROPS the
    already-executed census stage from the final plan — the
    ObservationManager then completes the observation with ``Row.empty``
    (the drain reports ``pruned``) even though the census ran. Excluding
    the rule keeps the executed stage in the final plan. Cost: empty
    branches execute as (trivially cheap) joins over empty shuffle
    outputs instead of being short-circuited — rows are identical either
    way; only plan-shortcutting is lost, and only inside the scope.

    Scoping: conf changes are session-wide, so inside ``foreachBatch``
    pass the micro-batch frame's session (stream-private clone — no
    other query can race it). On a shared session a concurrent query
    that overlaps the scope merely loses the same optimization."""
    try:
        prev = spark.conf.get(_EXCLUDED_RULES_KEY)
    except Exception:
        prev = None
    rules = [r for r in (prev or "").split(",") if r]
    if _EMPTY_PROP_RULE not in rules:
        rules.append(_EMPTY_PROP_RULE)
    spark.conf.set(_EXCLUDED_RULES_KEY, ",".join(rules))
    try:
        yield
    finally:
        try:
            if prev is None:
                spark.conf.unset(_EXCLUDED_RULES_KEY)
            else:
                spark.conf.set(_EXCLUDED_RULES_KEY, prev)
        except Exception:
            LOG.warning("could not restore %s", _EXCLUDED_RULES_KEY, exc_info=True)


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
    return observe_metrics(
        splits,
        guard,
        {
            "buckets": F.count(F.lit(1)),
            "buckets_split": F.sum((F.col(n_splits_col) > 1).cast("long")),
            "max_splits": F.coalesce(F.max(n_splits_col), F.lit(0)),
        },
        session_of=session_of,
    )


def observe_metrics(
    df: DataFrame,
    guard: str,
    metrics: dict[str, Column],
    session_of: DataFrame | None = None,
) -> DataFrame:
    """Attach a named-aggregate observation to ``df`` and queue it for
    THIS thread's ``drain_cap_stats`` — the general form behind
    :func:`observe_cap_splits`, used by the streaming hygiene gates for
    per-batch gate stats (rows / dups / Bloom probes) that ride the
    batch's own write action, zero extra jobs, rows unchanged.

    ``metrics``: insertion-ordered ``{name: aggregate Column}`` — the
    names double as the positional fallback when the JVM delivers the
    observation row schemaless (see :func:`_jvm_metrics`).

    ``session_of``: anchor frame whose SparkSession will execute the
    consuming action — pass the micro-batch frame from a foreachBatch
    body when ``df`` was built on a different session (see
    :func:`_rehome`)."""
    from pyspark.sql import Observation

    df = _rehome(df, session_of)
    obs = Observation()
    out = df.observe(
        obs, *(col.alias(name) for name, col in metrics.items())
    )
    with _LOCK:
        _PENDING.setdefault(threading.get_ident(), []).append(
            (guard, obs, tuple(metrics))
        )
    return out


def _jvm_metrics(obs, fallback_names: tuple[str, ...] = _METRIC_NAMES) -> tuple[str, dict | None]:
    """Probe + extract an observation's metrics JVM-side, without the
    Python pickler. Returns ``('ready', {name: value})`` when the
    observed plan has executed, ``('pending', None)`` when it provably
    hasn't yet (the JVM ``getRowOrEmpty`` waits at most ~100 ms), and
    ``('unknown', None)`` when there is no classic-py4j hook to probe
    (Spark Connect) or the JVM surface errored.

    Why not ``obs.get``: inside ``foreachBatch`` the observation row of
    a :func:`_rehome`-replanted frame exists JVM-side but this Spark
    build's ``PythonSQLUtils.toPyRow`` throws ``AssertionError``
    materializing it (measured r14 — the drain crashed the stream).
    The values here are three longs with a fixed schema; py4j getters
    on the JVM ``Row`` need no pickling at all."""
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return ("unknown", None)
    try:
        opt = jo.getRowOrEmpty()
        if opt.isEmpty():
            return ("pending", None)
        jrow = opt.get()
        n = jrow.length()
        if n == 0:
            # the ObservationManager completes with Row.empty when the
            # consuming query's ANALYZED plan contained the observe
            # node but the EXECUTED plan did not — AQE's empty-relation
            # propagation dropped the observed subtree at runtime (a
            # zero-candidate batch). Terminal: the manager already
            # unregistered the observation, no retry can deliver.
            return ("pruned", None)
        schema = jrow.schema()  # null for the GenericRow a _rehome'd
        # CollectMetrics delivers — fall back to the attach-order names
        # recorded when the observation was queued
        if schema is not None:
            names = [schema.apply(i).name() for i in range(schema.size())]
        else:
            names = [
                fallback_names[i] if i < len(fallback_names) else f"_c{i}"
                for i in range(n)
            ]
        vals = {
            names[i]: None if jrow.isNullAt(i) else jrow.get(i) for i in range(n)
        }
        return ("ready", vals)
    except Exception:  # unexpected JVM surface — don't break the drain
        return ("unknown", None)


def drain_cap_stats(timeout_s: float | None = None) -> list[dict]:
    """Collect (and log) the metrics of every observation THIS thread
    attached since its last drain, in attach order. With the default
    ``timeout_s=None`` each observation blocks until its plan executes —
    call after the consuming action (module docstring). With a timeout,
    observations still unexecuted at the deadline are dropped (warning
    logged) and reported as ``{'guard': ..., 'timed_out': True}`` rows,
    so a caller that errored between attach and action cannot hang the
    drain. When the readiness probe itself is unavailable (Spark
    Connect has no ``_jo``), the timeout path still attempts delivery —
    ``Observation.get`` on a daemon thread joined to the deadline — and
    reports ``timed_out`` only if it doesn't return in time, so the
    cannot-hang guarantee is honored on every session type without
    giving up on metrics the session could in fact deliver.

    FAIL-OPEN: this function never raises. Any per-observation metrics
    failure is logged and returned as ``{'guard': ..., 'error': ...}``
    — observability must never take down the observed pipeline (a
    foreachBatch drain exception would terminate the whole stream)."""
    with _LOCK:
        mine = _PENDING.pop(threading.get_ident(), [])
    deadline = None if timeout_s is None else time.monotonic() + timeout_s
    out: list[dict] = []
    for guard, obs, names in mine:
        try:
            state, vals = _jvm_metrics(obs, names)
            while state == "pending" and (
                deadline is None or time.monotonic() < deadline
            ):
                time.sleep(0.05)
                state, vals = _jvm_metrics(obs, names)
            if state == "pruned":
                LOG.warning(
                    "cap guard %s: observed subtree was optimized out of "
                    "the executed plan (AQE empty-relation propagation) — "
                    "run the consuming action inside cap_observation_scope "
                    "to guarantee delivery",
                    guard,
                )
                out.append({"guard": guard, "pruned": True})
                continue
            if state == "pending":
                LOG.warning(
                    "cap guard %s: plan never executed within %.1fs — "
                    "observation dropped",
                    guard,
                    timeout_s,
                )
                out.append({"guard": guard, "timed_out": True})
                continue
            if state == "unknown" and deadline is not None:
                # No readiness probe on this session (Spark Connect has
                # no py4j _jo) — still ATTEMPT delivery, bounded: run
                # the blocking Observation.get on a daemon thread and
                # join it to the deadline (r15 ADVICE: reporting
                # timed_out without ever trying was a delivery
                # regression). On deadline the getter thread is
                # abandoned (daemonized, so it cannot pin shutdown).
                holder: dict = {}

                def _blocking_get(o=obs, h=holder):
                    try:
                        h["vals"] = dict(o.get)
                    except BaseException as exc:  # noqa: BLE001
                        h["exc"] = exc

                getter = threading.Thread(target=_blocking_get, daemon=True)
                getter.start()
                getter.join(max(0.0, deadline - time.monotonic()))
                if "vals" in holder:
                    state, vals = "ready", holder["vals"]
                elif "exc" in holder:
                    raise holder["exc"]  # -> the fail-open error row
                else:
                    LOG.warning(
                        "cap guard %s: no py4j readiness probe on this "
                        "session and Observation.get did not return "
                        "within %.1fs — observation dropped",
                        guard,
                        timeout_s,
                    )
                    out.append({"guard": guard, "timed_out": True})
                    continue
            elif state == "unknown":
                # no JVM hook and no deadline: honor the documented
                # blocking contract via the stock pickler path
                vals = dict(obs.get)
            row = dict(vals)
            row["guard"] = guard
            out.append(row)
            LOG.info(
                "cap guard %s: %s/%s buckets split (max split factor %s)",
                guard,
                row.get("buckets_split"),
                row.get("buckets"),
                row.get("max_splits"),
            )
        except Exception as exc:  # noqa: BLE001 — fail-open by contract
            LOG.warning("cap guard %s: metrics extraction failed: %r", guard, exc)
            out.append({"guard": guard, "error": repr(exc)})
    return out


def discard_cap_stats() -> int:
    """Drop THIS thread's pending observations without reading them;
    returns how many were dropped. For failure paths: when the
    consuming action raised between attach and drain, the metrics will
    never materialize — waiting out a drain timeout buys nothing, and
    leaving the queue behind leaks it to whichever future thread
    inherits this thread ident (CPython reuses them). Also the
    batch-entry hygiene call: clear anything a dead predecessor thread
    left before attaching this batch's observations."""
    with _LOCK:
        dropped = _PENDING.pop(threading.get_ident(), [])
    if dropped:
        LOG.warning(
            "discarded %d undrained cap observation(s): %s",
            len(dropped),
            [g for g, _, _ in dropped],
        )
    return len(dropped)


def pending_cap_observations() -> int:
    """Count of THIS thread's not-yet-drained observations."""
    with _LOCK:
        return len(_PENDING.get(threading.get_ident(), ()))
