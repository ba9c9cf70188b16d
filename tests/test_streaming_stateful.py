"""applyInPandasWithState: counter offsets must survive micro-batch
boundaries (the streaming form of the reference's persisted
EnergyOffset doc state)."""

from __future__ import annotations

import json

import pytest

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
