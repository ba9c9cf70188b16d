"""Native session_window: the streaming form (watermark + append mode)
must emit exactly the sessions the batch form computes — one contract,
two execution modes (the point of registering `session_window_agg`)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _session_agg(df):
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


class TestStreamingSessionWindow:
    def test_streamed_sessions_equal_batch(self, spark, tmp_path):
        src = tmp_path / "landing"
        src.mkdir()
        # 3 users, sessions separated by >30min gaps, split across 3
        # time-ordered micro-batches; then two far-future sentinel rows
        # whose only job is to advance the watermark so every real
        # session closes and flushes in append mode (the sentinel's own
        # session stays open and must NOT appear in the output).
        files: dict[int, list] = {i: [] for i in range(5)}
        for u in range(3):
            minute = u
            for i in range(24):
                # 7-min cadence with a 54-min silence every 5th event —
                # each silence closes a session (> the 30-min gap)
                minute += 7 + (47 if i % 5 == 0 else 0)
                files[min(i // 8, 2)].append(
                    {
                        "user_id": f"u{u}",
                        "ts": f"2024-04-01T{minute // 60:02d}:{minute % 60:02d}:00Z",
                        "value": float(i + u),
                    }
                )
        files[3].append(
            {"user_id": "zz", "ts": "2024-04-03T00:00:00Z", "value": 0.0}
        )
        files[4].append(
            {"user_id": "zz", "ts": "2024-04-05T00:00:00Z", "value": 0.0}
        )
        for i, rows in files.items():
            p = src / f"{i}.json"
            p.write_text("\n".join(json.dumps(r) for r in rows))
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        schema = "user_id string, ts timestamp, value double"
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(src))
            .withWatermark("ts", "0 seconds")
        )
        out_dir = tmp_path / "out"
        q = (
            _session_agg(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        streamed = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        batch_in = (
            spark.read.format("json").schema(schema).load(str(src))
            .where(F.col("user_id") != "zz")
        )
        batched = {
            (r.user_id, r.session_start, r.session_end): (r.n_events, r.value_sum)
            for r in _session_agg(batch_in).collect()
        }
        assert len(batched) > 3  # the gap construction made real sessions
        # the still-open final sentinel session must not be emitted (the
        # first sentinel's session closes when the second advances the
        # watermark — that one may appear and is filtered with the rest)
        import datetime

        open_start = datetime.datetime(2024, 4, 5)
        assert not any(
            k[0] == "zz" and k[1] == open_start for k in streamed
        )
        streamed_real = {k: v for k, v in streamed.items() if k[0] != "zz"}
        assert streamed_real == batched
