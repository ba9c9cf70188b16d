"""Stateful streaming operators (SURVEY §2.9: ST2/ST3 as streams).

In batch, counter-rollover correction is a window function
(``operators/counters.py``). As a *stream*, the (last_raw, offset)
pair must survive across micro-batches per meter — exactly what
``applyInPandasWithState`` provides: grouped state keyed by meter,
Arrow-batched updates, GroupStateTimeout handling left to the caller's
watermark policy.

This is the streaming form of the reference's mutable ``EnergyOffset``
document state (``Kasa/KasaLogger.cs:55-75``, ``Tapo/TapoLogger.cs:
87-107``): the device doc carried the offset between polls; here the
state store does.

Scale notes: state is per meter (thousands of keys, ~3 doubles each —
trivially small); the shuffle is the same groupBy-meter exchange the
batch form pays. State store default (HDFS-backed) is fine at this
size; RocksDB for millions of keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from homelogging_spark.protoshim import ensure_protobuf

OUTPUT_DDL = "meter_id string, ts timestamp, raw double, offset double, corrected double"
STATE_DDL = "last_raw double, offset double"


def _collect_sorted(batches) -> pd.DataFrame | None:
    """Concatenate a key's Arrow chunk iterator and sort ONCE by ts.

    A key's micro-batch arrives as multiple Arrow chunks when it exceeds
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (~10k rows default);
    sorting each chunk independently would fold rows out of global ts
    order and silently break the documented drain==batch exact equality
    (ADVICE r5). Returns None for an empty iterator (timeout tick)."""
    frames = [pdf for pdf in batches if len(pdf)]
    if not frames:
        return None
    merged = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
    return merged.sort_values("ts")


def _apply_rollover(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-meter update: detect raw-counter drops, accumulate the
    pre-reset raw into the running offset (ST3 accumulate semantics),
    emit corrected = raw + offset. State = (last_raw, offset)."""
    last_raw, offset = state.get if state.exists else (None, 0.0)
    pdf = _collect_sorted(batches)
    if pdf is not None:
        out_offset = []
        out_corrected = []
        for raw in pdf["raw"]:
            if last_raw is not None and raw < last_raw:
                offset += last_raw
            out_offset.append(offset)
            out_corrected.append(raw + offset)
            last_raw = raw
        pdf = pdf.assign(offset=out_offset, corrected=out_corrected)
        yield pdf[["meter_id", "ts", "raw", "offset", "corrected"]]
    state.update((last_raw, offset))


def streaming_counter_rollover(stream: DataFrame) -> DataFrame:
    """Counter-rollover correction over a streaming frame with columns
    (meter_id, ts, raw). Offsets persist across micro-batches via the
    state store; output schema adds (offset, corrected)."""
    return stream.groupBy("meter_id").applyInPandasWithState(
        _apply_rollover,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_DDL = (
    "meter_id string, ts timestamp, value double, ewma double, resid double"
)
EWMA_STATE_DDL = "s double"


def make_ewma_apply(alpha: float = 0.25):
    """Build the per-meter EWMA state update for ``alpha``.

    Streaming form of ``operators/aggregations.ewma_smooth``: the single
    smoothed value ``s`` survives micro-batches in the state store, and
    every row emits (ewma, resid) with the identical
    ``alpha*x + (1-alpha)*s`` double arithmetic as the batch fold — so
    draining the stream over a fixture equals the batch operator bit
    for bit (pinned by test_streaming_stateful.py)."""
    beta = 1.0 - alpha

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (s,) = state.get if state.exists else (None,)
        pdf = _collect_sorted(batches)
        if pdf is not None:
            smoothed, resids = [], []
            for x in pdf["value"]:
                if s is None:
                    s, r = x, 0.0
                else:
                    r = x - s
                    s = alpha * x + beta * s
                smoothed.append(s)
                resids.append(r)
            yield pdf.assign(ewma=smoothed, resid=resids)[
                ["meter_id", "ts", "value", "ewma", "resid"]
            ]
        state.update((s,))

    return _apply


def streaming_ewma(stream: DataFrame, alpha: float = 0.25) -> DataFrame:
    """EWMA smoothing over a streaming frame with columns
    (meter_id, ts, value); state is ONE double per meter."""
    return stream.groupBy("meter_id").applyInPandasWithState(
        make_ewma_apply(alpha),
        outputStructType=EWMA_OUTPUT_DDL,
        stateStructType=EWMA_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_DDL = (
    "meter_id string, ts timestamp, value double,"
    " cusum_hi double, cusum_lo double, alarm boolean"
)
CUSUM_STATE_DDL = "hi double, lo double"


def make_cusum_apply(
    target: float = 35.0, slack: float = 5.0, threshold: float = 50.0
):
    """Streaming form of ``controllers.cusum_alarms``: the (hi, lo)
    sums survive micro-batches in the state store, restart-on-alarm
    included, with the identical max/+/- double sequence as the batch
    fold — drain equals batch exactly."""
    up, dn = target + slack, target - slack

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hi, lo = state.get if state.exists else (0.0, 0.0)
        pdf = _collect_sorted(batches)
        if pdf is not None:
            his, los, alarms = [], [], []
            for x in pdf["value"]:
                s_hi = max(0.0, hi + (x - up))
                s_lo = max(0.0, lo + (dn - x))
                alarm = s_hi > threshold or s_lo > threshold
                his.append(s_hi)
                los.append(s_lo)
                alarms.append(alarm)
                hi, lo = (0.0, 0.0) if alarm else (s_hi, s_lo)
            yield pdf.assign(cusum_hi=his, cusum_lo=los, alarm=alarms)[
                ["meter_id", "ts", "value", "cusum_hi", "cusum_lo", "alarm"]
            ]
        state.update((hi, lo))

    return _apply


BATTERY_OUTPUT_DDL = (
    "meter_id string, ts timestamp, power double,"
    " soc double, total_charged double, total_discharged double, cycles double"
)
BATTERY_STATE_DDL = "soc double, charged double, discharged double"


def make_battery_apply(
    capacity: float = 2.7,
    efficiency: float = 0.9,
    max_power_kw: float = 0.8,
    step_minutes: float = 1.0,
):
    """Streaming form of ST4, the zero-export battery simulation
    (``operators/battery.battery_zero_export``, reference
    ``RandomQueries/ZeroExport.cs:33-73``): the nonlinear SoC recurrence
    folds per meter with (soc, total_charged, total_discharged) — three
    doubles — surviving micro-batches in the state store; ``cycles`` is
    derived per row. The per-step math is the SAME
    ``simulate_battery_series`` double sequence as the batch operator,
    seeded from state, so draining a stream equals the batch fold bit
    for bit (pinned in test_streaming_stateful.py)."""
    from homelogging_spark.operators.battery import simulate_battery_series

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        soc, charged, discharged = (
            state.get if state.exists else (0.0, 0.0, 0.0)
        )
        pdf = _collect_sorted(batches)
        if pdf is not None:
            states = simulate_battery_series(
                pdf["power"].tolist(),
                capacity,
                efficiency,
                max_power_kw,
                step_minutes,
                initial=(soc, charged, discharged),
            )
            soc, charged, discharged, _ = states[-1]
            yield pdf.assign(
                soc=[s[0] for s in states],
                total_charged=[s[1] for s in states],
                total_discharged=[s[2] for s in states],
                cycles=[s[3] for s in states],
            )[
                [
                    "meter_id",
                    "ts",
                    "power",
                    "soc",
                    "total_charged",
                    "total_discharged",
                    "cycles",
                ]
            ]
        state.update((soc, charged, discharged))

    return _apply


def streaming_battery(
    stream: DataFrame,
    capacity: float = 2.7,
    efficiency: float = 0.9,
    max_power_kw: float = 0.8,
    step_minutes: float = 1.0,
) -> DataFrame:
    """ST4 battery zero-export simulation over a streaming frame with
    columns (meter_id, ts, power); state is three doubles per meter."""
    return stream.groupBy("meter_id").applyInPandasWithState(
        make_battery_apply(capacity, efficiency, max_power_kw, step_minutes),
        outputStructType=BATTERY_OUTPUT_DDL,
        stateStructType=BATTERY_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(
    stream: DataFrame,
    target: float = 35.0,
    slack: float = 5.0,
    threshold: float = 50.0,
) -> DataFrame:
    """CUSUM change-point alarms over a streaming frame with columns
    (meter_id, ts, value); state is two doubles per meter."""
    return stream.groupBy("meter_id").applyInPandasWithState(
        make_cusum_apply(target, slack, threshold),
        outputStructType=CUSUM_OUTPUT_DDL,
        stateStructType=CUSUM_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCHED_OUTPUT_DDL = (
    "meter_id string, last_attempt_ts timestamp, last_ok_ts timestamp,"
    " fail_streak bigint, delay_s double, next_poll_ts timestamp"
)
SCHED_STATE_DDL = (
    "last_attempt_ms long, last_ok_ms long, fail_streak long, interval_s double"
)


def make_poll_schedule_apply(cap_s: float = 3600.0):
    """Per-device schedule state update — the streaming form of
    ``operators/scheduling.next_poll_schedule`` (ST8, reference
    ``LoggerService.cs:28-50``): as attempt rows land, each device's
    (last attempt, last success, consecutive-failure streak, configured
    interval) survives micro-batches in the state store, and every
    micro-batch emits ONE updated schedule row per touched device with
    the same closed-form backoff ``min(interval * 2^streak, cap)`` and
    millisecond-truncated ``next_poll_ts`` arithmetic as the batch
    aggregation — so draining a fixture equals the batch operator
    exactly (pinned in test_streaming_stateful.py; rows with IDENTICAL
    timestamps have engine-dependent fold order in both forms — attempt
    logs are tie-free by construction, one row per poll attempt)."""

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_ms, ok_ms, streak, interval = (
            state.get if state.exists else (None, None, 0, None)
        )
        pdf = _collect_sorted(batches)
        if pdf is not None:
            for row in pdf.itertuples():
                ts_ms = int(row.ts.value // 1_000_000)  # ns -> ms truncation
                last_ms = ts_ms
                interval = float(row.interval_s)
                if bool(row.ok):
                    ok_ms, streak = ts_ms, 0
                else:
                    streak += 1
            delay = min(interval * (2.0 ** streak), cap_s)
            yield pd.DataFrame(
                {
                    "meter_id": [key[0]],
                    "last_attempt_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "last_ok_ts": [
                        pd.Timestamp(ok_ms, unit="ms") if ok_ms is not None else pd.NaT
                    ],
                    "fail_streak": [streak],
                    "delay_s": [delay],
                    "next_poll_ts": [
                        pd.Timestamp(last_ms + int(delay * 1000.0), unit="ms")
                    ],
                }
            )
        state.update((last_ms, ok_ms, streak, interval))

    return _apply


def streaming_poll_schedule(stream: DataFrame, cap_s: float = 3600.0) -> DataFrame:
    """Adaptive poll schedule over a streaming attempt log with columns
    (meter_id, ts, ok, interval_s); state is four scalars per device,
    output mode append — one schedule row per device per micro-batch
    that touched it (the LATEST row per device is the live schedule).
    ``due_in_s`` is wall-clock-relative and left to the consumer (the
    batch form takes an explicit ``now_ts`` for it)."""
    return stream.groupBy("meter_id").applyInPandasWithState(
        make_poll_schedule_apply(cap_s),
        outputStructType=SCHED_OUTPUT_DDL,
        stateStructType=SCHED_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_OUTPUT_DDL = (
    "k string, version bigint, valid_from timestamp, valid_to timestamp, "
    "attr string, n_obs bigint"
)
SCD2_STATE_DDL = "version bigint, valid_from_us bigint, attr string, n_obs bigint"


def make_scd2_apply():
    """Per-key SCD2 state update — the streaming form of
    ``operators/ingest.scd2_history``. State is the OPEN version
    (version, valid_from, attr, n_obs); each micro-batch folds its
    observations in ts order: a null-safe-equal attr extends the open
    version, a change CLOSES it (emitted with valid_to = the changing
    observation's ts) and opens the next.

    Emission contract: the stream emits CLOSED versions only — the open
    version lives in the state store until its closing observation
    arrives (emitting it early would need a retraction when it closes,
    which append mode cannot express). Draining a fixture therefore
    equals the batch operator's rows WHERE valid_to IS NOT NULL,
    exactly — pinned in test_streaming_stateful.py. Consumers that need
    the live open version read it from the latest state (or union the
    batch form over the retained table).

    Timestamps fold as integer microseconds (state schema keeps the
    epoch-us bigint), so stream/batch agree to parquet's native
    precision with no float rounding."""

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        version, vf_us, attr, n_obs = (
            state.get if state.exists else (0, None, None, 0)
        )
        pdf = _collect_sorted(batches)
        closed: list[tuple] = []
        if pdf is not None:
            for row in pdf.itertuples():
                ts_us = int(row.ts.value // 1_000)  # ns -> us
                a = None if pd.isna(row.attr) else row.attr
                if version == 0:  # first observation ever for this key
                    version, vf_us, attr, n_obs = 1, ts_us, a, 1
                elif a == attr or (a is None and attr is None):
                    n_obs += 1  # null-safe unchanged: extend open version
                else:
                    closed.append((key[0], version, vf_us, ts_us, attr, n_obs))
                    version, vf_us, attr, n_obs = version + 1, ts_us, a, 1
        state.update((version, vf_us, attr, n_obs))
        if closed:
            yield pd.DataFrame(
                {
                    "k": [c[0] for c in closed],
                    "version": [c[1] for c in closed],
                    "valid_from": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "valid_to": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "attr": [c[4] for c in closed],
                    "n_obs": [c[5] for c in closed],
                }
            )

    return _apply


def streaming_scd2(stream: DataFrame) -> DataFrame:
    """SCD2 history over a streaming observation log with columns
    (k, ts, attr); emits each version row the moment the observation
    that closes it arrives. State is four scalars per key — constant
    size regardless of history length, since closed versions leave the
    store the moment they are emitted."""
    return stream.groupBy("k").applyInPandasWithState(
        make_scd2_apply(),
        outputStructType=SCD2_OUTPUT_DDL,
        stateStructType=SCD2_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


GRID_LOCF_OUTPUT_DDL = (
    "k string, grid_h timestamp, obs_value double, locf_value double, "
    "filled boolean"
)
GRID_LOCF_STATE_DDL = "cur_h_us bigint, cur_val double"


def make_grid_locf_apply(grid_seconds: int = 3600):
    """Per-key LOCF grid resampling state update — the streaming form of
    the registered ``grid_resample_locf`` plan: the dashboard's
    "value between readings" emitted live as grid slots CLOSE. A slot
    closes when an observation lands in a LATER slot: the closing emits
    the finished slot (its last observation, ``filled`` false) plus one
    carried-forward row per empty slot in the gap (``filled`` true,
    ``obs_value`` NULL). The OPEN slot lives in state (two scalars per
    key — constant regardless of gap length) until a later observation
    closes it, the same emission contract as ``make_scd2_apply``:
    append mode never needs a retraction because nothing provisional is
    emitted.

    Drain == batch equality (pinned in test_streaming_stateful.py): the
    drained rows equal the batch plan's rows restricted to each key's
    own observed span minus its open tail — the batch form also pads
    every key to the GLOBAL grid bounds, which an unbounded stream
    cannot know. Out-of-order rows older than the open slot are dropped
    (the in-order-per-key contract every twin here documents; bound
    lateness with a watermark upstream)."""
    step_us = grid_seconds * 1_000_000

    def _apply(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur_h_us, cur_val = state.get if state.exists else (None, None)
        pdf = _collect_sorted(batches)
        out: list[tuple] = []
        if pdf is not None:
            for row in pdf.itertuples():
                ts_us = int(row.ts.value // 1_000)
                h_us = ts_us - ts_us % step_us
                v = float(row.value)
                if cur_h_us is None:
                    cur_h_us, cur_val = h_us, v
                elif h_us == cur_h_us:
                    cur_val = v  # later ts in the open slot wins
                elif h_us > cur_h_us:
                    out.append((key[0], cur_h_us, cur_val, cur_val, False))
                    gap = cur_h_us + step_us
                    while gap < h_us:
                        out.append((key[0], gap, None, cur_val, True))
                        gap += step_us
                    cur_h_us, cur_val = h_us, v
                # h_us < cur_h_us: late row older than the open slot — drop
        state.update((cur_h_us, cur_val))
        if out:
            yield pd.DataFrame(
                {
                    "k": [o[0] for o in out],
                    "grid_h": [pd.Timestamp(o[1], unit="us") for o in out],
                    "obs_value": [o[2] for o in out],
                    "locf_value": [o[3] for o in out],
                    "filled": [o[4] for o in out],
                }
            )

    return _apply


def streaming_grid_locf(stream: DataFrame, grid_seconds: int = 3600) -> DataFrame:
    """LOCF grid resampling over a streaming observation log with
    columns (k, ts, value); emits each grid slot the moment a later
    observation closes it, gap slots carried forward. State is two
    scalars per key."""
    return stream.groupBy("k").applyInPandasWithState(
        make_grid_locf_apply(grid_seconds),
        outputStructType=GRID_LOCF_OUTPUT_DDL,
        stateStructType=GRID_LOCF_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas successor (Spark 4 TWS, r15) -----------------
#
# applyInPandasWithState has no timer facility, so every twin above
# documents the same limitation: a key's OPEN slot/interval can only be
# emitted when a LATER observation arrives — a meter that goes quiet
# holds its tail forever. Spark 4's transformWithState adds event-time
# TIMERS: the processor registers an expiry at the open slot's close
# boundary, and when the WATERMARK passes it (no row that could still
# land in the slot can exist anymore) the slot is emitted as final
# without waiting for the next observation. streaming_grid_locf_tws is
# the LOCF twin migrated onto that API; the fold is line-for-line
# make_grid_locf_apply, the timer path is the only addition (pinned:
# classic-twin rows are a subset, the extras are exactly the
# watermark-passed tails).
#
# Requirements (Spark 4): timeMode="eventTime" needs an upstream
# withWatermark on ts, and transformWithState runs only on the RocksDB
# state store provider (spark.sql.streaming.stateStore.providerClass =
# ...state.RocksDBStateStoreProvider) — the provider a production
# deployment at millions of keys wants anyway (the module docstring's
# scale note).

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

GRID_LOCF_TWS_STATE_DDL = "cur_h_us bigint, cur_val double, flushed boolean"


class GridLocfProcessor(StatefulProcessor):
    """Per-key LOCF grid resample with a watermark-driven open-tail
    flush. State = (open slot hour, its latest value, whether the timer
    already emitted it). Emission contract is append-safe like the
    classic twin: a slot row is emitted exactly once — either when a
    later observation closes it, or when the watermark passes its close
    boundary (the timer), whichever happens first; after a timer flush
    the value stays in state so later gap slots still carry it
    forward."""

    def __init__(self, grid_seconds: int = 3600):
        self._step_us = grid_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._slot = handle.getValueState("open_slot", GRID_LOCF_TWS_STATE_DDL)

    @staticmethod
    def _frame(out: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": [o[0] for o in out],
                "grid_h": [pd.Timestamp(o[1], unit="us") for o in out],
                "obs_value": [o[2] for o in out],
                "locf_value": [o[3] for o in out],
                "filled": [o[4] for o in out],
            }
        )

    def _expiry_ms(self, h_us: int) -> int:
        return (h_us + self._step_us) // 1_000

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        cur = self._slot.get() if self._slot.exists() else None
        cur_h_us, cur_val, flushed = cur if cur is not None else (None, None, False)
        pdf = _collect_sorted(rows)
        out: list[tuple] = []
        if pdf is not None:
            for row in pdf.itertuples():
                ts_us = int(row.ts.value // 1_000)
                h_us = ts_us - ts_us % self._step_us
                v = float(row.value)
                if cur_h_us is None:
                    cur_h_us, cur_val, flushed = h_us, v, False
                    self._handle.registerTimer(self._expiry_ms(h_us))
                elif h_us == cur_h_us:
                    if not flushed:
                        cur_val = v  # later ts in the open slot wins
                    # flushed: the slot was already emitted as final —
                    # unreachable for non-late rows (the timer only
                    # fires once the watermark passes the slot), kept
                    # as a drop guard for late data
                elif h_us > cur_h_us:
                    if not flushed:
                        out.append((key[0], cur_h_us, cur_val, cur_val, False))
                        self._handle.deleteTimer(self._expiry_ms(cur_h_us))
                    gap = cur_h_us + self._step_us
                    while gap < h_us:
                        out.append((key[0], gap, None, cur_val, True))
                        gap += self._step_us
                    cur_h_us, cur_val, flushed = h_us, v, False
                    self._handle.registerTimer(self._expiry_ms(h_us))
                # h_us < cur_h_us: late row older than the open slot — drop
        if cur_h_us is not None:
            self._slot.update((cur_h_us, cur_val, flushed))
        if out:
            yield self._frame(out)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        cur = self._slot.get() if self._slot.exists() else None
        if cur is None:
            return
        cur_h_us, cur_val, flushed = cur
        if (
            cur_h_us is not None
            and not flushed
            and expiredTimerInfo.getExpiryTimeInMs() == self._expiry_ms(cur_h_us)
        ):
            # the watermark passed the slot's close boundary: no row
            # that could still land in it can exist — final, emit now;
            # keep the value so later gap slots still carry it forward
            self._slot.update((cur_h_us, cur_val, True))
            yield self._frame([(key[0], cur_h_us, cur_val, cur_val, False)])

    def close(self) -> None:
        pass


def streaming_grid_locf_tws(
    stream: DataFrame, grid_seconds: int = 3600
) -> DataFrame:
    """:func:`streaming_grid_locf` on ``transformWithStateInPandas``
    with the open-tail flush the classic twin cannot express (see the
    section comment). ``stream`` needs ``withWatermark("ts", ...)``
    applied upstream, and the session must run the RocksDB state store
    provider. Output schema and all non-tail rows are identical to the
    classic twin; the additional rows are exactly the open slots whose
    close boundary the watermark passed.

    Runtime dependency: Spark's TransformWithStateInPySpark workers
    speak a protobuf state protocol — ``protobuf`` must be installed on
    driver and executors or the stream crashes opaquely at start; fail
    here with the real reason instead."""
    if ensure_protobuf() == "missing":
        raise ImportError(
            "transformWithStateInPandas requires a 'google.protobuf' "
            "runtime (Spark's TWS state-server protocol); neither the "
            "wheel nor the repo's vendored shim (vendor/google/protobuf) "
            "is available — install protobuf or use the "
            "applyInPandasWithState twin streaming_grid_locf (identical "
            "semantics minus the watermark-driven open-tail flush)"
        )
    return stream.groupBy("k").transformWithStateInPandas(
        statefulProcessor=GridLocfProcessor(grid_seconds),
        outputStructType=GRID_LOCF_OUTPUT_DDL,
        outputMode="append",
        timeMode="eventTime",
    )


SCHED_TWS_OUTPUT_DDL = SCHED_OUTPUT_DDL + ", overdue boolean"
SCHED_TWS_STATE_DDL = (
    "last_ms bigint, ok_ms bigint, streak bigint, interval double, "
    "next_ms bigint, overdue_emitted boolean"
)


class PollScheduleProcessor(StatefulProcessor):
    """ST8/ST9 adaptive poll schedule with a timer-driven DEAD-POLLER
    alert — the second twin migrated onto transformWithState, and the
    one whose timer is a genuinely new capability rather than an
    emission-latency fix: the classic twin can only ever REACT to
    attempt rows, so a device that stops polling entirely (crashed
    logger, dead network — exactly the failure the reference's retry
    accounting exists to surface, ``LoggerService.cs:62-73``) goes
    silent in the output forever. Here the processor registers an
    event-time timer at each device's ``next_poll_ts``; if the
    WATERMARK passes it with no attempt row having landed, the device
    provably missed its own schedule and an ``overdue=true`` row is
    emitted exactly once (re-armed by the next real attempt).

    Fold arithmetic is line-for-line ``make_poll_schedule_apply``
    (ms-truncated timestamps, ``min(interval * 2^streak, cap)``), so
    the non-overdue rows equal the classic twin's exactly — pinned
    runtime-free in test_streaming_stateful.py, same harness as
    ``GridLocfProcessor``."""

    def __init__(self, cap_s: float = 3600.0):
        self._cap_s = cap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sched = handle.getValueState("sched", SCHED_TWS_STATE_DDL)

    @staticmethod
    def _frame(
        key: str,
        last_ms: int,
        ok_ms: int | None,
        streak: int,
        delay: float,
        next_ms: int,
        overdue: bool,
    ) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "meter_id": [key],
                "last_attempt_ts": [pd.Timestamp(last_ms, unit="ms")],
                "last_ok_ts": [
                    pd.Timestamp(ok_ms, unit="ms") if ok_ms is not None else pd.NaT
                ],
                "fail_streak": [streak],
                "delay_s": [delay],
                "next_poll_ts": [pd.Timestamp(next_ms, unit="ms")],
                "overdue": [overdue],
            }
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        cur = self._sched.get() if self._sched.exists() else None
        last_ms, ok_ms, streak, interval, prev_next_ms, _ = (
            cur if cur is not None else (None, None, 0, None, None, False)
        )
        pdf = _collect_sorted(rows)
        if pdf is None:
            return
        for row in pdf.itertuples():
            ts_ms = int(row.ts.value // 1_000_000)  # ns -> ms truncation
            last_ms = ts_ms
            interval = float(row.interval_s)
            if bool(row.ok):
                ok_ms, streak = ts_ms, 0
            else:
                streak += 1
        delay = min(interval * (2.0 ** streak), self._cap_s)
        next_ms = last_ms + int(delay * 1000.0)
        if prev_next_ms is not None:
            # re-arm: the old deadline is superseded by the new attempt
            self._handle.deleteTimer(prev_next_ms)
        self._handle.registerTimer(next_ms)
        self._sched.update((last_ms, ok_ms, streak, interval, next_ms, False))
        yield self._frame(key[0], last_ms, ok_ms, streak, delay, next_ms, False)

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        cur = self._sched.get() if self._sched.exists() else None
        if cur is None:
            return
        last_ms, ok_ms, streak, interval, next_ms, overdue_emitted = cur
        if (
            next_ms is not None
            and not overdue_emitted
            and expiredTimerInfo.getExpiryTimeInMs() == next_ms
        ):
            # the watermark passed the device's own next_poll_ts with no
            # attempt row landing first: the poller provably missed its
            # schedule. Emit the alert once; the next real attempt
            # resets the flag and re-arms the timer.
            delay = min(interval * (2.0 ** streak), self._cap_s)
            self._sched.update(
                (last_ms, ok_ms, streak, interval, next_ms, True)
            )
            yield self._frame(
                key[0], last_ms, ok_ms, streak, delay, next_ms, True
            )

    def close(self) -> None:
        pass


def streaming_poll_schedule_tws(
    stream: DataFrame, cap_s: float = 3600.0
) -> DataFrame:
    """:func:`streaming_poll_schedule` on ``transformWithStateInPandas``
    with the watermark-driven ``overdue`` alert the classic twin cannot
    express (see :class:`PollScheduleProcessor`). ``stream`` needs
    ``withWatermark("ts", ...)`` applied upstream and the RocksDB state
    store provider. Non-overdue rows carry the classic twin's exact
    schema plus ``overdue=false``; the extras are exactly the devices
    whose ``next_poll_ts`` the watermark passed without a new attempt."""
    if ensure_protobuf() == "missing":
        raise ImportError(
            "transformWithStateInPandas requires a 'google.protobuf' "
            "runtime (Spark's TWS state-server protocol); neither the "
            "wheel nor the repo's vendored shim (vendor/google/protobuf) "
            "is available — install protobuf or use the "
            "applyInPandasWithState twin streaming_poll_schedule "
            "(identical schedule rows minus the overdue alert)"
        )
    return stream.groupBy("meter_id").transformWithStateInPandas(
        statefulProcessor=PollScheduleProcessor(cap_s),
        outputStructType=SCHED_TWS_OUTPUT_DDL,
        outputMode="append",
        timeMode="eventTime",
    )


ROLLOVER_TWS_OUTPUT_DDL = OUTPUT_DDL + ", stalled boolean"
ROLLOVER_TWS_STATE_DDL = (
    "last_raw double, offset double, deadline_ms bigint, "
    "stalled_emitted boolean"
)


class CounterRolloverProcessor(StatefulProcessor):
    """ST2/ST3 counter-rollover correction with a timer-driven
    STALLED-COUNTER alert — the third twin graduated onto
    transformWithState (r20, r19 verdict #8 stretch), and like
    :class:`PollScheduleProcessor` one whose timer is a genuinely new
    capability: downstream of a cumulative counter, a meter that stops
    reporting is indistinguishable from a meter consuming nothing (the
    corrected series just holds its last value), so coverage and cost
    queries silently treat dead hardware as zero usage. Here the
    processor arms an event-time timer ``stall_s`` past each meter's
    latest reading; if the WATERMARK passes that deadline with no new
    reading, the counter provably stalled for the full window and ONE
    ``stalled=true`` row is emitted carrying the last corrected value
    (ts = the deadline, the moment the stall became provable) — re-armed
    by the next real reading.

    Fold arithmetic is line-for-line ``_apply_rollover`` (drop detected
    as ``raw < last_raw``, pre-reset raw accumulated into the running
    offset — the reference's mutable EnergyOffset semantics,
    ``Tapo/TapoLogger.cs:87-107``), so non-stalled rows equal the
    classic twin's exactly — pinned runtime-free in
    test_streaming_stateful.py, the PollScheduleProcessor harness."""

    def __init__(self, stall_s: float = 3600.0):
        self._stall_s = stall_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._st = handle.getValueState("roll", ROLLOVER_TWS_STATE_DDL)

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        cur = self._st.get() if self._st.exists() else None
        last_raw, offset, deadline_ms, _ = (
            cur if cur is not None else (None, 0.0, None, False)
        )
        pdf = _collect_sorted(rows)
        if pdf is None:
            return
        out_offset, out_corrected = [], []
        last_ms = None
        for row in pdf.itertuples():
            raw = float(row.raw)
            if last_raw is not None and raw < last_raw:
                offset += last_raw
            out_offset.append(offset)
            out_corrected.append(raw + offset)
            last_raw = raw
            last_ms = int(row.ts.value // 1_000_000)  # ns -> ms truncation
        if deadline_ms is not None:
            # re-arm: the old stall deadline is superseded by new data
            self._handle.deleteTimer(deadline_ms)
        deadline_ms = last_ms + int(self._stall_s * 1000.0)
        self._handle.registerTimer(deadline_ms)
        self._st.update((last_raw, offset, deadline_ms, False))
        yield pd.DataFrame(
            {
                "meter_id": key[0],
                "ts": pdf["ts"].values,
                "raw": pdf["raw"].values,
                "offset": out_offset,
                "corrected": out_corrected,
                "stalled": False,
            }
        )

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        cur = self._st.get() if self._st.exists() else None
        if cur is None:
            return
        last_raw, offset, deadline_ms, emitted = cur
        if (
            deadline_ms is not None
            and not emitted
            and expiredTimerInfo.getExpiryTimeInMs() == deadline_ms
        ):
            # the watermark passed last_reading + stall_s with no new
            # reading landing first: the counter provably stalled for
            # the full window. Emit the alert once; the next real
            # reading resets the flag and re-arms the timer.
            self._st.update((last_raw, offset, deadline_ms, True))
            yield pd.DataFrame(
                {
                    "meter_id": [key[0]],
                    "ts": [pd.Timestamp(deadline_ms, unit="ms")],
                    "raw": [last_raw],
                    "offset": [offset],
                    "corrected": [
                        last_raw + offset if last_raw is not None else None
                    ],
                    "stalled": [True],
                }
            )

    def close(self) -> None:
        pass


def streaming_counter_rollover_tws(
    stream: DataFrame, stall_s: float = 3600.0
) -> DataFrame:
    """:func:`streaming_counter_rollover` on
    ``transformWithStateInPandas`` with the watermark-driven
    ``stalled`` alert the classic twin cannot express (see
    :class:`CounterRolloverProcessor`). ``stream`` needs
    ``withWatermark("ts", ...)`` applied upstream and the RocksDB
    state store provider. Non-stalled rows carry the classic twin's
    exact schema plus ``stalled=false``; the extras are exactly the
    meters whose last reading the watermark left ``stall_s`` behind."""
    if ensure_protobuf() == "missing":
        raise ImportError(
            "transformWithStateInPandas requires a 'google.protobuf' "
            "runtime (Spark's TWS state-server protocol); neither the "
            "wheel nor the repo's vendored shim (vendor/google/protobuf) "
            "is available — install protobuf or use the "
            "applyInPandasWithState twin streaming_counter_rollover "
            "(identical corrected rows minus the stalled alert)"
        )
    return stream.groupBy("meter_id").transformWithStateInPandas(
        statefulProcessor=CounterRolloverProcessor(stall_s),
        outputStructType=ROLLOVER_TWS_OUTPUT_DDL,
        outputMode="append",
        timeMode="eventTime",
    )
