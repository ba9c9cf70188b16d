"""applyInPandasWithState: counter offsets must survive micro-batch
boundaries (the streaming form of the reference's persisted
EnergyOffset doc state)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from homelogging_spark.protoshim import ensure_protobuf
from homelogging_spark.streaming.stateful import streaming_counter_rollover


class TestStreamingCounterRollover:
    def test_offset_persists_across_micro_batches(self, spark, tmp_path):
        src = tmp_path / "landing"
        src.mkdir()
        # batch 1: counter climbs then the device resets (drop 30 -> 5)
        (src / "a.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"meter_id": "m1", "ts": "2024-04-01T00:00:00Z", "raw": 10.0},
                    {"meter_id": "m1", "ts": "2024-04-01T00:01:00Z", "raw": 30.0},
                    {"meter_id": "m1", "ts": "2024-04-01T00:02:00Z", "raw": 5.0},
                ]
            )
        )
        # batch 2 (separate file, one file per trigger): continues after
        # the reset — correction only works if state crossed the batches
        (src / "b.json").write_text(
            "\n".join(
                json.dumps(r)
                for r in [
                    {"meter_id": "m1", "ts": "2024-04-01T00:03:00Z", "raw": 7.0},
                    {"meter_id": "m2", "ts": "2024-04-01T00:03:00Z", "raw": 1.0},
                ]
            )
        )

        stream = (
            spark.readStream.format("json")
            .schema("meter_id string, ts timestamp, raw double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_counter_rollover(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        rows = {
            (r.meter_id, r.ts.isoformat()): r
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        assert len(rows) == 5
        get = lambda m, t: rows[(m, f"2024-04-01T00:0{t}:00")]  # noqa: E731
        assert get("m1", 0).corrected == pytest.approx(10.0)
        assert get("m1", 1).corrected == pytest.approx(30.0)
        # reset detected: offset jumps to the pre-reset raw (30)
        assert get("m1", 2).offset == pytest.approx(30.0)
        assert get("m1", 2).corrected == pytest.approx(35.0)
        # next micro-batch still carries the offset
        assert get("m1", 3).offset == pytest.approx(30.0)
        assert get("m1", 3).corrected == pytest.approx(37.0)
        # other meters' state independent
        assert get("m2", 3).offset == pytest.approx(0.0)

    def test_stream_drain_equals_batch_operator(self, spark, tmp_path):
        """Semantics pin: draining the stateful stream over a fixture
        must equal the batch window operator on the same data — the two
        forms are one contract (ST3), not two operators. Same sequential
        double arithmetic on both paths, so equality is exact."""
        from homelogging_spark.operators.counters import counter_rollover_correct

        src = tmp_path / "landing"
        src.mkdir()
        # 4 meters x 40 readings with deterministic resets, split into 4
        # time-ordered files -> 4 micro-batches crossing state boundaries
        per_file = {i: [] for i in range(4)}
        for m in range(4):
            raw = 0.0
            for t in range(40):
                raw += (t * 7 + m * 3) % 11
                if t > 0 and (t + m) % 13 == 0:
                    raw = float(m)  # device reset
                per_file[t // 10].append(
                    {
                        "meter_id": f"m{m}",
                        "ts": f"2024-04-01T00:{t:02d}:00Z",
                        "raw": raw,
                    }
                )
        # The file source orders micro-batches by modification time; four
        # writes in the same mtime tick would arrive in arbitrary order,
        # so pin strictly increasing mtimes to get time-ordered batches.
        for i, rows in per_file.items():
            p = src / f"{i}.json"
            p.write_text("\n".join(json.dumps(r) for r in rows))
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = "meter_id string, ts timestamp, raw double"
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_counter_rollover(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.meter_id, r.ts): (r.offset, r.corrected)
            for r in spark.read.parquet(str(out_dir)).collect()
        }

        batch_in = spark.read.format("json").schema(schema).load(str(src))
        batched = {
            (r.meter_id, r.ts): (r.offset, r.corrected)
            for r in counter_rollover_correct(
                batch_in, ["meter_id"], "raw", "ts"
            ).collect()
        }
        assert len(streamed) == 160
        assert streamed == batched


class TestStreamingEwma:
    def test_stream_drain_equals_batch_ewma(self, spark, tmp_path):
        """Streaming EWMA drained over a fixture must equal the batch
        fold exactly — identical alpha*x + (1-alpha)*s double sequence,
        with the smoothed state crossing micro-batch boundaries."""
        from homelogging_spark.operators.aggregations import ewma_smooth
        from homelogging_spark.streaming.stateful import streaming_ewma

        src = tmp_path / "landing"
        src.mkdir()
        per_file = {i: [] for i in range(4)}
        for m in range(3):
            for t in range(40):
                v = ((t * 13 + m * 5) % 97) / 7.0
                per_file[t // 10].append(
                    {
                        "meter_id": f"m{m}",
                        "ts": f"2024-04-01T00:{t:02d}:00Z",
                        "value": v,
                    }
                )
        for i, rows in per_file.items():
            p = src / f"{i}.json"
            p.write_text("\n".join(json.dumps(r) for r in rows))
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = "meter_id string, ts timestamp, value double"
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_ewma(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.meter_id, r.ts): (r.ewma, r.resid)
            for r in spark.read.parquet(str(out_dir)).collect()
        }

        batch_in = spark.read.format("json").schema(schema).load(str(src))
        batched = {
            (r.meter_id, r.ts): (r.ewma, r.resid)
            for r in ewma_smooth(batch_in, ["meter_id"], "value", "ts").collect()
        }
        assert len(streamed) == 120
        assert streamed == batched


class TestStreamingCusum:
    def test_stream_drain_equals_batch_cusum(self, spark, tmp_path):
        """Streaming CUSUM drained over a fixture equals the batch fold
        exactly, including restart-on-alarm state crossing micro-batch
        boundaries."""
        from homelogging_spark.operators.controllers import cusum_alarms
        from homelogging_spark.streaming.stateful import streaming_cusum

        src = tmp_path / "landing"
        src.mkdir()
        per_file = {i: [] for i in range(4)}
        for m in range(3):
            for t in range(40):
                # values swinging around the target with drifts that
                # trigger alarms at different batch offsets per meter
                v = 35.0 + ((t * 11 + m * 17) % 9) - 4.0 + (
                    15.0 if 20 <= t < 32 else 0.0
                )
                per_file[t // 10].append(
                    {
                        "meter_id": f"m{m}",
                        "ts": f"2024-04-01T00:{t:02d}:00Z",
                        "value": v,
                    }
                )
        for i, rows in per_file.items():
            p = src / f"{i}.json"
            p.write_text("\n".join(json.dumps(r) for r in rows))
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = "meter_id string, ts timestamp, value double"
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_cusum(stream, target=35.0, slack=5.0, threshold=20.0)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.meter_id, r.ts): (r.cusum_hi, r.cusum_lo, r.alarm)
            for r in spark.read.parquet(str(out_dir)).collect()
        }

        batch_in = spark.read.format("json").schema(schema).load(str(src))
        batched = {
            (r.meter_id, r.ts): (r.cusum_hi, r.cusum_lo, r.alarm)
            for r in cusum_alarms(
                batch_in, ["meter_id"], target=35.0, slack=5.0, threshold=20.0
            ).collect()
        }
        assert len(streamed) == 120
        assert streamed == batched

    def test_alarms_actually_fire_in_fixture(self, spark, tmp_path):
        # guard: the equivalence above is vacuous if no alarm ever fires
        from homelogging_spark.operators.controllers import cusum_alarms

        from datetime import datetime

        rows = []
        for t in range(40):
            v = 35.0 + ((t * 11) % 9) - 4.0 + (15.0 if 20 <= t < 32 else 0.0)
            rows.append(("m0", datetime(2024, 4, 1, 0, t), v))
        df = spark.createDataFrame(rows, "meter_id string, ts timestamp, value double")
        out = cusum_alarms(df, ["meter_id"], target=35.0, slack=5.0, threshold=20.0)
        assert out.where("alarm").count() > 0


class TestStreamingBattery:
    def test_stream_drain_equals_batch_battery_sim(self, spark, tmp_path):
        """ST4 as a stream: the zero-export battery fold drained over a
        fixture equals the batch applyInPandas operator exactly — the
        same simulate_battery_series double sequence, with
        (soc, charged, discharged) crossing micro-batch boundaries in
        the state store (ZeroExport.cs:33-73 math)."""
        from homelogging_spark.operators.battery import battery_zero_export
        from homelogging_spark.streaming.stateful import streaming_battery

        src = tmp_path / "landing"
        src.mkdir()
        per_file = {i: [] for i in range(4)}
        for m in range(3):
            for t in range(40):
                # swings between import (+) and export (-), amplitudes
                # chosen so SoC hits both clamps within the fixture
                p = ((t * 37 + m * 101) % 1900) - 900.0
                per_file[t // 10].append(
                    {
                        "meter_id": f"m{m}",
                        "ts": f"2024-04-01T00:{t:02d}:00Z",
                        "power": p,
                    }
                )
        for i, rows in per_file.items():
            f = src / f"{i}.json"
            f.write_text("\n".join(json.dumps(r) for r in rows))
            os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = "meter_id string, ts timestamp, power double"
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            # capacity small enough that a few consecutive export
            # minutes fill it (charge step = 0.9 * 0.8/60 = 0.012 kWh)
            streaming_battery(stream, capacity=0.05)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.meter_id, r.ts): (r.soc, r.total_charged, r.total_discharged, r.cycles)
            for r in spark.read.parquet(str(out_dir)).collect()
        }

        batch_in = spark.read.format("json").schema(schema).load(str(src))
        batched = {
            (r.meter_id, r.ts): (r.soc, r.total_charged, r.total_discharged, r.cycles)
            for r in battery_zero_export(
                batch_in, ["meter_id"], power_col="power", ts_col="ts",
                capacity=0.05,
            ).collect()
        }
        assert len(streamed) == 120
        assert streamed == batched
        # guard: vacuous if the battery never clamps — both SoC limits
        # must be exercised inside the fixture
        socs = [v[0] for v in streamed.values()]
        assert min(socs) == 0.0 and max(socs) == 0.05


class TestCollectSorted:
    """_collect_sorted is the ADVICE-r5 fix: a key whose micro-batch
    exceeds spark.sql.execution.arrow.maxRecordsPerBatch arrives as
    MULTIPLE Arrow chunks, and sorting each chunk independently would
    fold rows out of global ts order. Pure-pandas pin of the merge."""

    def test_merges_chunks_into_global_ts_order(self):
        import pandas as pd

        from homelogging_spark.streaming.stateful import _collect_sorted

        # chunk boundaries deliberately interleave timestamps: chunk 1
        # holds ts 0,2,4..., chunk 2 holds 1,3,5... — per-chunk sorting
        # alone would emit 0,2,4,...,1,3,5,...
        c1 = pd.DataFrame({"ts": [4, 0, 2], "raw": [40.0, 0.0, 20.0]})
        c2 = pd.DataFrame({"ts": [1, 5, 3], "raw": [10.0, 50.0, 30.0]})
        merged = _collect_sorted(iter([c1, c2]))
        assert list(merged["ts"]) == [0, 1, 2, 3, 4, 5]
        assert list(merged["raw"]) == [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]

    def test_empty_iterator_is_timeout_tick(self):
        from homelogging_spark.streaming.stateful import _collect_sorted

        assert _collect_sorted(iter([])) is None

    def test_single_chunk_not_copied(self):
        import pandas as pd

        from homelogging_spark.streaming.stateful import _collect_sorted

        c1 = pd.DataFrame({"ts": [2, 1], "raw": [2.0, 1.0]})
        merged = _collect_sorted(iter([c1]))
        assert list(merged["ts"]) == [1, 2]


class TestStreamingMultimodalDecode:
    def test_stream_decode_audio_equals_batch(self, spark, tmp_path):
        """The multimodal decode stages are stateless mapInPandas, so
        they must compose with Structured Streaming unchanged: draining
        decode_audio over a parquet file stream of WAV payloads equals
        the batch run exactly (header parse + RMS are deterministic)."""
        import struct

        from homelogging_spark.operators.multimodal import decode_audio

        def wav(doc_id: int) -> bytes:
            n = 20 + doc_id * 3
            pcm = b"".join(
                struct.pack("<h", ((i * 2654435761 + doc_id) % 65536) - 32768)
                for i in range(n)
            )
            fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
            chunks = (
                b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm
            )
            return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

        src = tmp_path / "landing"
        src.mkdir()
        schema = "doc_id long, payload binary"
        for batch in range(3):
            rows = [(i, bytearray(wav(i))) for i in range(batch * 4, batch * 4 + 4)]
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            decode_audio(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            r.doc_id: (r.n_channels, r.sample_rate, r.n_samples, r.rms)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        batched = {
            r.doc_id: (r.n_channels, r.sample_rate, r.n_samples, r.rms)
            for r in decode_audio(spark.read.parquet(str(src))).collect()
        }
        assert len(streamed) == 12
        assert streamed == batched


class TestStreamingPollSchedule:
    def test_drain_equals_batch_schedule(self, spark, tmp_path):
        """ST8 streaming twin: draining the attempt log through the
        state-store fold, the LAST emitted row per device equals the
        batch next_poll_schedule aggregation on the same data — streak
        carried across micro-batch boundaries, interval from the latest
        attempt, identical ms-truncated next_poll arithmetic."""
        import json as _json

        from homelogging_spark.operators.scheduling import next_poll_schedule
        from homelogging_spark.streaming.stateful import streaming_poll_schedule

        rows = [
            # m1: ok, then fails split ACROSS batches -> streak must
            # survive the state store
            {"meter_id": "m1", "ts": "2024-05-01T11:50:00Z", "ok": True, "interval_s": 60.0},
            {"meter_id": "m1", "ts": "2024-05-01T11:51:00Z", "ok": False, "interval_s": 60.0},
            # m2: interval lowered on the latest attempt
            {"meter_id": "m2", "ts": "2024-05-01T11:40:00Z", "ok": True, "interval_s": 300.0},
        ]
        rows2 = [
            {"meter_id": "m1", "ts": "2024-05-01T11:52:00Z", "ok": False, "interval_s": 60.0},
            {"meter_id": "m2", "ts": "2024-05-01T11:59:00Z", "ok": True, "interval_s": 60.0},
            # m3: never succeeded
            {"meter_id": "m3", "ts": "2024-05-01T11:58:00Z", "ok": False, "interval_s": 30.0},
        ]
        src = tmp_path / "landing"
        src.mkdir()
        (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
        (src / "b.json").write_text("\n".join(_json.dumps(r) for r in rows2))

        stream = (
            spark.readStream.format("json")
            .schema("meter_id string, ts timestamp, ok boolean, interval_s double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_poll_schedule(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        drained = spark.read.parquet(str(out_dir))
        # live schedule = the latest emitted row per device
        import datetime

        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        latest = {
            r.meter_id: r
            for r in drained.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("meter_id").orderBy(
                        F.col("last_attempt_ts").desc()
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .collect()
        }

        batch_df = spark.createDataFrame(
            [
                (
                    r["meter_id"],
                    datetime.datetime.fromisoformat(
                        r["ts"].replace("Z", "+00:00")
                    ).replace(tzinfo=None),
                    r["ok"],
                    r["interval_s"],
                )
                for r in rows + rows2
            ],
            "meter_id string, ts timestamp, ok boolean, interval_s double",
        )
        batch = {
            r.meter_id: r
            for r in next_poll_schedule(batch_df, "2024-05-01 12:00:00").collect()
        }

        assert set(latest) == set(batch) == {"m1", "m2", "m3"}
        for m in sorted(batch):
            s, b = latest[m], batch[m]
            assert s.fail_streak == b.fail_streak, m
            assert s.delay_s == b.delay_s, m
            assert s.last_attempt_ts == b.last_attempt_ts, m
            assert s.last_ok_ts == b.last_ok_ts, m
            assert s.next_poll_ts == b.next_poll_ts, m
        # the specific semantics the fixture exercises
        assert batch["m1"].fail_streak == 2 and batch["m1"].delay_s == 240.0
        assert batch["m2"].delay_s == 60.0  # lowered interval took effect
        assert batch["m3"].last_ok_ts is None and batch["m3"].fail_streak == 1


class TestStreamingSketches:
    """Streaming twins for the mergeable-sketch family: the batch
    operators compose with Structured Streaming through the two shapes
    mergeability allows — foreachBatch state-merge (KMV) and a
    bounded-key streaming aggregation (count-min)."""

    def _write_chunks(self, spark, src, n_chunks=3, per=40):
        schema = "grp string, key string"
        for c in range(n_chunks):
            rows = [
                (f"g{i % 2}", f"key{(c * per + i) % 70}") for i in range(per)
            ]
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
        return schema

    def test_kmv_rollup_stream_equals_batch(self, spark, tmp_path):
        """Drained foreachBatch KMV state == batch sketch of all rows,
        EXACTLY (merge closure), including groups absent from some
        micro-batches."""
        from homelogging_spark.operators.sketches import kmv_sketch
        from homelogging_spark.streaming.pipeline import start_kmv_rollup_stream

        src = tmp_path / "landing"
        src.mkdir()
        schema = self._write_chunks(spark, src)
        state = str(tmp_path / "kmv_state")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = start_kmv_rollup_stream(
            stream, "key", ("grp",), state, str(tmp_path / "ckpt"), k=16
        )
        q.awaitTermination(180)
        streamed = {
            r.grp: (list(r.kmv), r.n_kept)
            for r in spark.read.parquet(state).collect()
        }
        batch = {
            r.grp: (list(r.kmv), r.n_kept)
            for r in kmv_sketch(
                spark.read.parquet(str(src)), "key", ["grp"], k=16
            ).collect()
        }
        assert streamed == batch
        assert len(streamed) == 2

    def test_kmv_rollup_replay_idempotent(self, spark, tmp_path):
        """Re-delivering every micro-batch (fresh checkpoint over the
        same source) leaves the state bit-identical: array_distinct
        absorbs duplicate hashes, so at-least-once delivery gives
        exactly-once sketch semantics."""
        from homelogging_spark.streaming.pipeline import start_kmv_rollup_stream

        src = tmp_path / "landing"
        src.mkdir()
        schema = self._write_chunks(spark, src)
        state = str(tmp_path / "kmv_state")

        def drain(ckpt):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            q = start_kmv_rollup_stream(
                stream, "key", ("grp",), state, str(tmp_path / ckpt), k=16
            )
            q.awaitTermination(180)

        drain("ckpt1")
        first = {
            r.grp: (list(r.kmv), r.n_kept)
            for r in spark.read.parquet(state).collect()
        }
        drain("ckpt2")  # full replay: every file re-delivered
        second = {
            r.grp: (list(r.kmv), r.n_kept)
            for r in spark.read.parquet(state).collect()
        }
        assert first == second

    def test_cm_sketch_streams_bounded_state(self, spark, tmp_path):
        """cm_sketch IS a streaming aggregation with bounded state: the
        register key space is depth x width regardless of input
        cardinality, so complete-mode output is a constant-size table.
        Drained registers == batch registers."""
        from homelogging_spark.operators.sketches import cm_sketch

        src = tmp_path / "landing"
        src.mkdir()
        schema = self._write_chunks(spark, src)
        depth, width = 3, 64
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            cm_sketch(stream, "key", depth, width)
            .writeStream.format("memory")
            .queryName("cm_stream_regs")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        streamed = {
            (r.row, r.col): r.cnt
            for r in spark.sql("select * from cm_stream_regs").collect()
        }
        batch = {
            (r.row, r.col): r.cnt
            for r in cm_sketch(
                spark.read.parquet(str(src)), "key", depth, width
            ).collect()
        }
        assert streamed == batch
        assert len(streamed) <= depth * width

    def test_windowed_cm_append_finalization(self, spark, tmp_path):
        """Watermark-closed windows emit their count-min registers
        exactly once (append mode), each window's registers equal the
        batch cm_sketch over that window's rows, and state never holds
        more than open_windows x depth x width."""
        import datetime as dt

        from pyspark.sql import functions as F

        from homelogging_spark.operators.sketches import cm_sketch
        from homelogging_spark.streaming.pipeline import streaming_windowed_cm

        depth, width = 3, 32
        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        rows = []
        for h in (0, 1):  # two full hourly windows
            for i in range(40):
                rows.append((base + dt.timedelta(hours=h, minutes=i % 50),
                             f"key{i % 7}"))
        # sentinel far in the future: drives the watermark past hours 0-1
        rows.append((base + dt.timedelta(hours=6), "sentinel"))
        schema = "ts timestamp, key string"
        src = tmp_path / "landing"
        src.mkdir()
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_windowed_cm(
                stream, "key", bucket="1 hour", watermark="10 minutes",
                depth=depth, width=width,
            )
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(str(out_dir)).collect()
        emitted = {}
        for r in got:
            emitted.setdefault(r.window_start.hour, {})[(r.row, r.col)] = r.cnt
        # hours 0 and 1 finalized; the sentinel's own window did not
        assert set(emitted) == {0, 1}
        batch_df = spark.createDataFrame(rows, schema)
        for h in (0, 1):
            window_rows = batch_df.where(
                (F.col("ts") >= str(base + dt.timedelta(hours=h)))
                & (F.col("ts") < str(base + dt.timedelta(hours=h + 1)))
            )
            want = {
                (r.row, r.col): r.cnt
                for r in cm_sketch(window_rows, "key", depth, width).collect()
            }
            assert emitted[h] == want
            assert len(emitted[h]) <= depth * width

    def test_kmv_rollup_recovers_mid_swap_crash(self, spark, tmp_path):
        """If a crash lands between the state swap's two renames (live
        moved aside, staged copy not yet promoted), the next batch must
        restore the trash — NOT silently rebuild from itself alone."""
        import os

        from homelogging_spark.streaming.pipeline import start_kmv_rollup_stream

        src = tmp_path / "landing"
        src.mkdir()
        schema = self._write_chunks(spark, src, n_chunks=2)
        state = str(tmp_path / "kmv_state")

        def drain(ckpt):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            q = start_kmv_rollup_stream(
                stream, "key", ("grp",), state, str(tmp_path / ckpt), k=16
            )
            q.awaitTermination(180)

        drain("ckpt1")
        committed = {
            r.grp: list(r.kmv) for r in spark.read.parquet(state).collect()
        }
        # simulate the crash window: live state sits in .__trash
        os.rename(state, state + ".__trash")
        # a later chunk arrives; the new drain must restore then merge
        self._write_chunks(spark, src, n_chunks=1, per=25)
        drain("ckpt2_fresh")  # fresh checkpoint: all 3 chunks redeliver
        recovered = {
            r.grp: list(r.kmv) for r in spark.read.parquet(state).collect()
        }
        # every committed hash survives (restored + replay-idempotent),
        # and the batch equivalence still holds over ALL rows
        from homelogging_spark.operators.sketches import kmv_sketch

        want = {
            r.grp: list(r.kmv)
            for r in kmv_sketch(
                spark.read.parquet(str(src)), "key", ["grp"], k=16
            ).collect()
        }
        assert recovered == want
        for g, kmv in committed.items():
            assert set(kmv) <= set(recovered[g]) | set(want[g])


class TestStreamingScd2:
    def test_versions_close_across_micro_batches_and_equal_batch(
        self, spark, tmp_path
    ):
        """State must carry the OPEN version across the batch boundary
        (A..A | A,B -> version 1 spans both batches, n_obs counts all
        three A's), and the drained closed versions must equal the batch
        operator's valid_to IS NOT NULL rows exactly."""
        from homelogging_spark.operators.ingest import scd2_history
        from homelogging_spark.streaming.stateful import streaming_scd2

        src = tmp_path / "landing"
        src.mkdir()
        b1 = [
            {"k": "m1", "ts": "2024-04-01T00:00:00Z", "attr": "A"},
            {"k": "m1", "ts": "2024-04-01T00:01:00Z", "attr": "A"},
            {"k": "m2", "ts": "2024-04-01T00:00:00Z", "attr": None},
        ]
        b2 = [
            {"k": "m1", "ts": "2024-04-01T00:02:00Z", "attr": "A"},
            {"k": "m1", "ts": "2024-04-01T00:03:00Z", "attr": "B"},
            {"k": "m1", "ts": "2024-04-01T00:04:00Z", "attr": "A"},
            {"k": "m2", "ts": "2024-04-01T00:01:00Z", "attr": None},
            {"k": "m2", "ts": "2024-04-01T00:02:00Z", "attr": "X"},
        ]
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in b1))
        (src / "b.json").write_text("\n".join(json.dumps(r) for r in b2))

        stream = (
            spark.readStream.format("json")
            .schema("k string, ts timestamp, attr string")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_scd2(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        drained = {
            (r.k, r.version): (r.valid_from, r.valid_to, r.attr, r.n_obs)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        # m1: A-version spans the batch boundary with n_obs=3, closes at
        # the B observation; B closes at the re-observed A; the final A
        # is OPEN -> not emitted. m2: NULL-attr version (null-safe
        # extension) closes at X; X open -> not emitted.
        assert set(drained) == {("m1", 1), ("m1", 2), ("m2", 1)}
        assert drained[("m1", 1)][2] == "A" and drained[("m1", 1)][3] == 3
        assert drained[("m1", 2)][2] == "B" and drained[("m1", 2)][3] == 1
        assert drained[("m2", 1)][2] is None and drained[("m2", 1)][3] == 2

        # exact drain == batch equality on the closed subset
        batch_rows = spark.createDataFrame(
            [(r["k"], r["ts"].replace("Z", ""), r["attr"]) for r in b1 + b2],
            "k string, ts string, attr string",
        ).select("k", F.col("ts").cast("timestamp").alias("ts"), "attr")
        expected = {
            (r.k, r.version): (r.valid_from, r.valid_to, r.attr, r.n_obs)
            for r in scd2_history(batch_rows, ["k"], ["attr"]).collect()
            if r.valid_to is not None
        }
        assert drained == expected


class TestStreamingGridLocf:
    def test_gap_fill_across_micro_batches(self, spark, tmp_path):
        """A 3-hour silence spanning a micro-batch boundary must emit the
        closed slot plus carried-forward gap rows when the next
        observation lands; the open slot is withheld; within-slot later
        observations win."""
        from homelogging_spark.streaming.stateful import streaming_grid_locf

        src = tmp_path / "landing"
        src.mkdir()
        b1 = [
            {"k": "m1", "ts": "2024-04-01T00:10:00Z", "value": 5.0},
            {"k": "m1", "ts": "2024-04-01T00:40:00Z", "value": 7.0},  # same slot, later
        ]
        b2 = [
            {"k": "m1", "ts": "2024-04-01T03:05:00Z", "value": 9.0},  # closes h0, fills h1-h2
            {"k": "m2", "ts": "2024-04-01T00:30:00Z", "value": 1.0},  # open -> nothing
        ]
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in b1))
        (src / "b.json").write_text("\n".join(json.dumps(r) for r in b2))
        stream = (
            spark.readStream.format("json")
            .schema("k string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_grid_locf(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = {
            (r.k, r.grid_h.hour): (r.obs_value, r.locf_value, r.filled)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        assert rows == {
            ("m1", 0): (7.0, 7.0, False),   # last obs in slot wins
            ("m1", 1): (None, 7.0, True),   # carried forward
            ("m1", 2): (None, 7.0, True),
        }  # m1 h3 open, m2 h0 open -> withheld

    def test_drain_equals_batch_plan_on_observed_span(self, spark, tmp_path):
        """Drained rows == the registered grid_resample_locf plan's rows
        restricted to each key's own observed span minus the open tail
        (the batch form pads every key to the GLOBAL bounds, which an
        unbounded stream cannot know)."""
        from homelogging_spark.plans.registry import q_grid_resample_locf
        from homelogging_spark.streaming.stateful import streaming_grid_locf

        sf = "/root/testdata/sf0.001"
        from homelogging_spark.tables import load_table

        ev = (
            load_table(spark, sf, "events")
            .where((F.col("event_type") == "click") & (F.col("user_id") < 10))
            .select(
                F.col("user_id").cast("string").alias("k"), "ts", "value"
            )
        )
        landing = tmp_path / "landing"
        # two micro-batches split mid-timeline, in event-time order per key
        ev.where(F.dayofmonth("ts") <= 15).coalesce(1).write.json(
            str(landing / "a")
        )
        ev.where(F.dayofmonth("ts") > 15).coalesce(1).write.json(
            str(landing / "b")
        )
        stream = (
            spark.readStream.format("json")
            .schema("k string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .load(str(landing / "*"))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_grid_locf(stream)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        drained = {
            (r.k, r.grid_h): (r.obs_value, r.locf_value, r.filled)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        # batch plan, restricted to each key's observed span minus the
        # open (max-hour) slot
        span = ev.groupBy("k").agg(
            F.date_trunc("hour", F.min("ts")).alias("first_h"),
            F.date_trunc("hour", F.max("ts")).alias("last_h"),
        )
        batch = (
            q_grid_resample_locf(spark, sf)
            .withColumn("k", F.col("user_id").cast("string"))
            .join(span, "k")
            .where(
                (F.col("grid_h") >= F.col("first_h"))
                & (F.col("grid_h") < F.col("last_h"))
            )
        )
        expected = {
            (r.k, r.grid_h): (r.obs_value, r.locf_value, r.filled)
            for r in batch.collect()
        }
        assert drained == expected and len(drained) > 50


class TestStreamingGridLocfTws:
    def test_tws_twin_flushes_open_tail_on_watermark(self, spark, tmp_path):
        """r15 (r13/r14 stretch): the transformWithStateInPandas twin
        must emit every classic-twin row identically AND flush the open
        tail once the watermark passes its slot's close boundary — the
        exact limitation the applyInPandasWithState twin documents.
        Keys whose tail the watermark has NOT passed stay withheld.

        Skipped where protobuf is unavailable (Spark's TWS workers speak
        a protobuf state protocol); the processor's fold+timer logic is
        pinned runtime-free below in test_processor_logic_* either way.
        Runs on a real google.protobuf runtime where installed, else on
        the repo's vendored wire-format shim (vendor/google/protobuf) -
        skipped only where neither exists."""
        if ensure_protobuf() == "missing":
            pytest.skip("no google.protobuf runtime (wheel or vendored shim)")
        from homelogging_spark.streaming.stateful import streaming_grid_locf_tws

        src = tmp_path / "landing"
        src.mkdir()
        # same fixture as the classic twin's gap-fill test...
        b1 = [
            {"k": "m1", "ts": "2024-04-01T00:10:00Z", "value": 5.0},
            {"k": "m1", "ts": "2024-04-01T00:40:00Z", "value": 7.0},
        ]
        b2 = [
            {"k": "m1", "ts": "2024-04-01T03:05:00Z", "value": 9.0},
            {"k": "m2", "ts": "2024-04-01T00:30:00Z", "value": 1.0},
        ]
        # ...plus a watermark-advancing sentinel key: 10:00 pushes the
        # watermark (delay 0) past m1's open-slot boundary (04:00) and
        # m2's (01:00), but not past its own (11:00)
        b3 = [{"k": "wm", "ts": "2024-04-01T10:00:00Z", "value": 0.0}]
        for name, batch in (("a", b1), ("b", b2), ("c", b3)):
            (src / f"{name}.json").write_text(
                "\n".join(json.dumps(r) for r in batch)
            )
        stream = (
            spark.readStream.format("json")
            .schema("k string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withWatermark("ts", "0 seconds")
        )
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        try:
            out_dir = tmp_path / "out"
            q = (
                streaming_grid_locf_tws(stream)
                .writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        rows = {
            (r.k, r.grid_h.hour): (r.obs_value, r.locf_value, r.filled)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        assert rows == {
            # identical to the classic twin's drain...
            ("m1", 0): (7.0, 7.0, False),
            ("m1", 1): (None, 7.0, True),
            ("m1", 2): (None, 7.0, True),
            # ...plus the tails the classic twin withholds forever:
            ("m1", 3): (9.0, 9.0, False),   # timer-flushed (04:00 < wm)
            ("m2", 0): (1.0, 1.0, False),   # timer-flushed (01:00 < wm)
            # wm's own slot (close 11:00 > wm 10:00) stays open
        }

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def clear(self):
            self._v = None

    class _FakeHandle:
        def __init__(self):
            self.state = TestStreamingGridLocfTws._FakeValueState()
            self.timers: set[int] = set()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

        def registerTimer(self, ms):
            self.timers.add(ms)

        def deleteTimer(self, ms):
            self.timers.discard(ms)

    def _drive(self, batches, fire_watermark_ms=None):
        """Run GridLocfProcessor's handlers directly (no TWS runtime):
        feed each batch through handleInputRows, then fire every
        registered timer the given watermark passed, in expiry order —
        exactly the engine's contract."""
        import pandas as pd

        from homelogging_spark.streaming.stateful import GridLocfProcessor

        proc = GridLocfProcessor()
        handle = self._FakeHandle()
        proc.init(handle)
        out = []
        for batch in batches:
            pdf = pd.DataFrame(
                {
                    "ts": [pd.Timestamp(r[0]) for r in batch],
                    "value": [r[1] for r in batch],
                }
            )
            out += list(proc.handleInputRows(("m1",), iter([pdf]), None))
        if fire_watermark_ms is not None:
            class _Exp:
                def __init__(self, ms):
                    self._ms = ms

                def getExpiryTimeInMs(self):
                    return self._ms

            for ms in sorted(t for t in handle.timers if t <= fire_watermark_ms):
                out += list(proc.handleExpiredTimer(("m1",), None, _Exp(ms)))
        rows = [
            (r.grid_h.hour, r.obs_value if pd.notna(r.obs_value) else None,
             r.locf_value, bool(r.filled))
            for frame in out
            for r in frame.itertuples()
        ]
        return rows, handle

    def test_processor_logic_matches_classic_twin(self):
        """Runtime-free pin: without any timer firing, the TWS
        processor's fold emits exactly the classic twin's rows on the
        classic test's fixture (closed slot + gap fills, open withheld,
        later obs in slot wins)."""
        import pandas as pd

        rows, handle = self._drive(
            [
                [("2024-04-01T00:10:00", 5.0), ("2024-04-01T00:40:00", 7.0)],
                [("2024-04-01T03:05:00", 9.0)],
            ]
        )
        assert rows == [(0, 7.0, 7.0, False), (1, None, 7.0, True),
                        (2, None, 7.0, True)]
        # exactly one live timer: the open slot's close boundary (04:00)
        assert handle.timers == {
            int(pd.Timestamp("2024-04-01T04:00:00").value // 1_000_000)
        }

    def test_processor_logic_timer_flushes_tail_once(self):
        """Runtime-free pin of the timer path: the watermark passing the
        open slot's boundary emits it exactly once (idempotent against a
        duplicate firing), and a LATER observation after the flush emits
        gap fills carried from the flushed value without re-emitting the
        slot."""
        import pandas as pd

        from homelogging_spark.streaming.stateful import GridLocfProcessor

        rows, handle = self._drive(
            [[("2024-04-01T03:05:00", 9.0)]],
            fire_watermark_ms=int(
                pd.Timestamp("2024-04-01T10:00:00").value // 1_000_000
            ),
        )
        assert rows == [(3, 9.0, 9.0, False)]  # tail flushed, once
        # duplicate firing is a no-op (flushed guard)
        proc = GridLocfProcessor()
        handle2 = self._FakeHandle()
        proc.init(handle2)
        pdf = pd.DataFrame(
            {"ts": [pd.Timestamp("2024-04-01T03:05:00")], "value": [9.0]}
        )
        list(proc.handleInputRows(("m1",), iter([pdf]), None))

        class _Exp:
            def getExpiryTimeInMs(self):
                return int(
                    pd.Timestamp("2024-04-01T04:00:00").value // 1_000_000
                )

        first = list(proc.handleExpiredTimer(("m1",), None, _Exp()))
        second = list(proc.handleExpiredTimer(("m1",), None, _Exp()))
        assert len(first) == 1 and second == []
        # post-flush: a row at 06 emits ONLY the gaps (04, 05) carried
        # from the flushed value, never the already-final slot 03
        pdf2 = pd.DataFrame(
            {"ts": [pd.Timestamp("2024-04-01T06:30:00")], "value": [2.0]}
        )
        frames = list(proc.handleInputRows(("m1",), iter([pdf2]), None))
        got = [
            (r.grid_h.hour, None if pd.isna(r.obs_value) else r.obs_value,
             r.locf_value, bool(r.filled))
            for f in frames
            for r in f.itertuples()
        ]
        assert got == [(4, None, 9.0, True), (5, None, 9.0, True)]


class TestStreamingPollScheduleTws:
    """PollScheduleProcessor — the ST8/ST9 twin on transformWithState:
    fold parity with the classic twin pinned runtime-free, plus the
    timer-driven overdue alert the classic twin cannot express."""

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def clear(self):
            self._v = None

    class _FakeHandle:
        def __init__(self):
            self.state = TestStreamingPollScheduleTws._FakeValueState()
            self.timers: set[int] = set()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

        def registerTimer(self, ms):
            self.timers.add(ms)

        def deleteTimer(self, ms):
            self.timers.discard(ms)

    class _FakeGroupState:
        """Minimal applyInPandasWithState GroupState double for driving
        make_poll_schedule_apply outside a stream."""

        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    @staticmethod
    def _batch_pdf(rows):
        import pandas as pd

        return pd.DataFrame(
            {
                "ts": [pd.Timestamp(r[0]) for r in rows],
                "ok": [r[1] for r in rows],
                "interval_s": [r[2] for r in rows],
            }
        )

    def test_fold_rows_match_classic_twin(self):
        """Line-for-line parity: driving the SAME batches through the
        classic make_poll_schedule_apply and the TWS processor emits
        identical schedule rows (the TWS rows minus the overdue
        column)."""
        from homelogging_spark.streaming.stateful import (
            PollScheduleProcessor,
            make_poll_schedule_apply,
        )

        batches = [
            [("2024-04-01T00:00:07", True, 60.0)],
            [("2024-04-01T00:01:10", False, 60.0),
             ("2024-04-01T00:02:00", False, 60.0)],
            [("2024-04-01T00:09:00", True, 300.0)],
        ]
        classic_apply = make_poll_schedule_apply()
        gstate = self._FakeGroupState()
        classic_rows = []
        for b in batches:
            for frame in classic_apply(
                ("m1",), iter([self._batch_pdf(b)]), gstate
            ):
                classic_rows += [tuple(r) for r in frame.itertuples(index=False)]

        proc = PollScheduleProcessor()
        handle = self._FakeHandle()
        proc.init(handle)
        tws_rows = []
        for b in batches:
            for frame in proc.handleInputRows(
                ("m1",), iter([self._batch_pdf(b)]), None
            ):
                assert not frame.overdue.any()
                tws_rows += [
                    tuple(r)
                    for r in frame.drop(columns=["overdue"]).itertuples(index=False)
                ]
        assert tws_rows == classic_rows and len(tws_rows) == 3
        # exactly ONE live timer: the latest schedule's next_poll_ts
        # (each re-arm deletes the superseded deadline)
        import pandas as pd

        expect_next = pd.Timestamp("2024-04-01T00:09:00") + pd.Timedelta(
            seconds=300.0
        )
        assert handle.timers == {int(expect_next.value // 1_000_000)}

    def test_timer_emits_overdue_once_and_rearms(self):
        """The watermark passing next_poll_ts with no new attempt emits
        exactly one overdue=true row (duplicate firing is a no-op); the
        next real attempt resets the flag, re-arms the timer, and emits
        a normal schedule row again."""
        import pandas as pd

        from homelogging_spark.streaming.stateful import PollScheduleProcessor

        proc = PollScheduleProcessor()
        handle = self._FakeHandle()
        proc.init(handle)
        list(
            proc.handleInputRows(
                ("m1",),
                iter([self._batch_pdf([("2024-04-01T00:00:00", True, 60.0)])]),
                None,
            )
        )
        next_ms = int(
            pd.Timestamp("2024-04-01T00:01:00").value // 1_000_000
        )
        assert handle.timers == {next_ms}

        class _Exp:
            def __init__(self, ms):
                self._ms = ms

            def getExpiryTimeInMs(self):
                return self._ms

        first = list(proc.handleExpiredTimer(("m1",), None, _Exp(next_ms)))
        second = list(proc.handleExpiredTimer(("m1",), None, _Exp(next_ms)))
        assert len(first) == 1 and second == []
        row = first[0].iloc[0]
        assert bool(row.overdue) and row.fail_streak == 0
        assert row.next_poll_ts == pd.Timestamp("2024-04-01T00:01:00")
        # a stale timer (wrong expiry) never emits
        assert list(proc.handleExpiredTimer(("m1",), None, _Exp(123))) == []
        # next real attempt: normal row again, flag reset, new deadline
        frames = list(
            proc.handleInputRows(
                ("m1",),
                iter([self._batch_pdf([("2024-04-01T00:10:00", False, 60.0)])]),
                None,
            )
        )
        assert len(frames) == 1 and not frames[0].iloc[0].overdue
        assert frames[0].iloc[0].fail_streak == 1  # delay 120 s
        new_next = int(
            pd.Timestamp("2024-04-01T00:12:00").value // 1_000_000
        )
        assert handle.timers == {new_next}

    def test_tws_stream_emits_overdue_on_watermark(self, spark, tmp_path):
        """e2e: a device that stops polling gets exactly one
        overdue=true row once the watermark passes its next_poll_ts.
        Skipped where protobuf is unavailable (the processor logic is
        pinned runtime-free above either way). Runs on the vendored
        protobuf shim where the wheel is absent."""
        if ensure_protobuf() == "missing":
            pytest.skip("no google.protobuf runtime (wheel or vendored shim)")
        from homelogging_spark.streaming.stateful import (
            streaming_poll_schedule_tws,
        )

        src = tmp_path / "landing"
        src.mkdir()
        b1 = [
            {"meter_id": "p1", "ts": "2024-04-01T00:00:00Z", "ok": True,
             "interval_s": 60.0},
        ]
        # watermark-advancing sentinel: 01:00 pushes the watermark
        # (delay 0) past p1's next_poll_ts (00:01) but not its own (01:01)
        b2 = [
            {"meter_id": "wm", "ts": "2024-04-01T01:00:00Z", "ok": True,
             "interval_s": 60.0},
        ]
        for name, batch in (("a", b1), ("b", b2)):
            (src / f"{name}.json").write_text(
                "\n".join(json.dumps(r) for r in batch)
            )
        stream = (
            spark.readStream.format("json")
            .schema("meter_id string, ts timestamp, ok boolean, interval_s double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withWatermark("ts", "0 seconds")
        )
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        try:
            out_dir = tmp_path / "out"
            q = (
                streaming_poll_schedule_tws(stream)
                .writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        rows = sorted(
            (r.meter_id, bool(r.overdue), r.fail_streak)
            for r in spark.read.parquet(str(out_dir)).collect()
        )
        # p1: its schedule row + exactly one overdue row; wm: schedule
        # row only (its own deadline is past the final watermark)
        assert rows == [("p1", False, 0), ("p1", True, 0), ("wm", False, 0)]


class TestStreamingCounterRolloverTws:
    """CounterRolloverProcessor — the ST2/ST3 twin on transformWithState
    (r20): fold parity with the classic twin pinned runtime-free, plus
    the timer-driven stalled-counter alert the classic twin cannot
    express."""

    _FakeValueState = TestStreamingPollScheduleTws._FakeValueState
    _FakeHandle = TestStreamingPollScheduleTws._FakeHandle
    _FakeGroupState = TestStreamingPollScheduleTws._FakeGroupState

    @staticmethod
    def _batch_pdf(rows):
        import pandas as pd

        return pd.DataFrame(
            {
                "meter_id": ["m1"] * len(rows),
                "ts": [pd.Timestamp(r[0]) for r in rows],
                "raw": [r[1] for r in rows],
            }
        )

    def test_fold_rows_match_classic_twin(self):
        """Line-for-line parity: the SAME batches through the classic
        _apply_rollover and the TWS processor emit identical corrected
        rows (the TWS rows minus the stalled column) — including a
        mid-batch reset and a cross-batch reset."""
        from homelogging_spark.streaming.stateful import (
            CounterRolloverProcessor,
            _apply_rollover,
        )

        batches = [
            [("2024-04-01T00:00:00", 100.0), ("2024-04-01T00:10:00", 120.0)],
            [("2024-04-01T00:20:00", 5.0),  # reset: offset += 120
             ("2024-04-01T00:30:00", 25.0)],
            [("2024-04-01T00:40:00", 3.0)],  # reset again: offset += 25
        ]
        gstate = self._FakeGroupState()
        classic_rows = []
        for b in batches:
            for frame in _apply_rollover(
                ("m1",), iter([self._batch_pdf(b)]), gstate
            ):
                classic_rows += [
                    tuple(r) for r in frame.itertuples(index=False)
                ]

        proc = CounterRolloverProcessor(stall_s=3600.0)
        handle = self._FakeHandle()
        proc.init(handle)
        tws_rows = []
        for b in batches:
            for frame in proc.handleInputRows(
                ("m1",), iter([self._batch_pdf(b)]), None
            ):
                assert not frame.stalled.any()
                tws_rows += [
                    tuple(r)
                    for r in frame.drop(columns=["stalled"]).itertuples(
                        index=False
                    )
                ]
        assert tws_rows == classic_rows and len(tws_rows) == 5
        assert [r[3] for r in tws_rows] == [0.0, 0.0, 120.0, 120.0, 145.0]
        # exactly ONE live timer: last reading + stall_s
        import pandas as pd

        expect = pd.Timestamp("2024-04-01T00:40:00") + pd.Timedelta(hours=1)
        assert handle.timers == {int(expect.value // 1_000_000)}

    def test_timer_emits_stall_once_and_rearms(self):
        """The watermark passing last_reading + stall_s with no new
        reading emits exactly one stalled=true row carrying the last
        corrected value (duplicate firing is a no-op; a stale timer
        never emits); the next real reading resets the flag and
        re-arms."""
        import pandas as pd

        from homelogging_spark.streaming.stateful import (
            CounterRolloverProcessor,
        )

        proc = CounterRolloverProcessor(stall_s=600.0)
        handle = self._FakeHandle()
        proc.init(handle)
        list(
            proc.handleInputRows(
                ("m1",),
                iter([self._batch_pdf(
                    [("2024-04-01T00:00:00", 100.0),
                     ("2024-04-01T00:05:00", 7.0)]  # offset 100
                )]),
                None,
            )
        )
        deadline = int(
            pd.Timestamp("2024-04-01T00:15:00").value // 1_000_000
        )
        assert handle.timers == {deadline}

        class _Exp:
            def __init__(self, ms):
                self._ms = ms

            def getExpiryTimeInMs(self):
                return self._ms

        first = list(proc.handleExpiredTimer(("m1",), None, _Exp(deadline)))
        second = list(proc.handleExpiredTimer(("m1",), None, _Exp(deadline)))
        assert len(first) == 1 and second == []
        row = first[0].iloc[0]
        assert bool(row.stalled)
        assert (row.raw, row.offset, row.corrected) == (7.0, 100.0, 107.0)
        assert row.ts == pd.Timestamp("2024-04-01T00:15:00")
        assert list(proc.handleExpiredTimer(("m1",), None, _Exp(123))) == []
        # next real reading: normal row, offset arithmetic continues
        frames = list(
            proc.handleInputRows(
                ("m1",),
                iter([self._batch_pdf([("2024-04-01T00:30:00", 9.0)])]),
                None,
            )
        )
        r = frames[0].iloc[0]
        assert (bool(r.stalled), r.offset, r.corrected) == (False, 100.0, 109.0)
        new_deadline = int(
            pd.Timestamp("2024-04-01T00:40:00").value // 1_000_000
        )
        assert handle.timers == {new_deadline}

    def test_tws_stream_emits_stall_on_watermark(self, spark, tmp_path):
        """e2e on RocksDB: a meter that stops reporting gets exactly
        one stalled=true row once the watermark passes its
        last_reading + stall_s; its corrected rows equal the classic
        twin's. Skipped where protobuf is unavailable (the processor
        logic is pinned runtime-free above either way)."""
        if ensure_protobuf() == "missing":
            pytest.skip("no google.protobuf runtime (wheel or vendored shim)")
        from homelogging_spark.streaming.stateful import (
            streaming_counter_rollover_tws,
        )

        src = tmp_path / "landing"
        src.mkdir()
        b1 = [
            {"meter_id": "c1", "ts": "2024-04-01T00:00:00Z", "raw": 50.0},
            {"meter_id": "c1", "ts": "2024-04-01T00:10:00Z", "raw": 2.0},
        ]
        # watermark-advancing sentinel: 02:00 pushes the watermark past
        # c1's stall deadline (01:10) but not its own (03:00)
        b2 = [
            {"meter_id": "wm", "ts": "2024-04-01T02:00:00Z", "raw": 1.0},
        ]
        for name, batch in (("a", b1), ("b", b2)):
            (src / f"{name}.json").write_text(
                "\n".join(json.dumps(r) for r in batch)
            )
        stream = (
            spark.readStream.format("json")
            .schema("meter_id string, ts timestamp, raw double")
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withWatermark("ts", "0 seconds")
        )
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        try:
            out_dir = tmp_path / "out"
            q = (
                streaming_counter_rollover_tws(stream)
                .writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        finally:
            if prev is None:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
        rows = sorted(
            (r.meter_id, bool(r.stalled), r.raw, r.offset, r.corrected)
            for r in spark.read.parquet(str(out_dir)).collect()
        )
        # c1: two corrected rows (reset folds 50 into the offset) +
        # exactly one stalled row holding the last corrected value;
        # wm: its own deadline is past the final watermark
        assert rows == [
            ("c1", False, 2.0, 50.0, 52.0),
            ("c1", False, 50.0, 0.0, 50.0),
            ("c1", True, 2.0, 50.0, 52.0),
            ("wm", False, 1.0, 0.0, 1.0),
        ]
