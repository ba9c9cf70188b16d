"""Spark 4 Python DataSource for DSMR captures: framing, partitioning,
and end-to-end format("dsmr_telegram") -> parse_telegram integration."""

from __future__ import annotations

import pytest

from homelogging_spark.sources.dsmr_datasource import frame_telegrams

TELEGRAM = (
    "/ISK5\\2M550T-1012\n"
    "\n"
    "1-0:1.7.0(00.244*kW)\n"
    "1-0:2.7.0(00.000*kW)\n"
    "1-0:1.8.1(000004.426*kWh)\n"
    "!5B4C\n"
)


class TestFraming:
    def test_basic_frames_and_resync(self):
        noise = "garbage before\n"
        partial = "/ISK5\\X\n1-0:1.7.0(00.100*kW)\n"  # no '!' -> resync
        text = noise + partial + TELEGRAM + TELEGRAM + "/TRAILING\nunfinished\n"
        frames = frame_telegrams(text)
        assert len(frames) == 2
        assert all(f.startswith("/ISK5") and "!5B4C" in f for f in frames)

    def test_empty_and_noise_only(self):
        assert frame_telegrams("") == []
        assert frame_telegrams("no telegrams here\nat all\n") == []


class TestDataSourceRead:
    def test_read_and_parse_end_to_end(self, spark, tmp_path):
        from homelogging_spark.sources.dsmr import parse_telegram
        from homelogging_spark.sources.dsmr_datasource import DsmrTelegramDataSource

        (tmp_path / "cap1.p1").write_text(TELEGRAM + TELEGRAM)
        (tmp_path / "cap2.p1").write_text(TELEGRAM)

        spark.dataSource.register(DsmrTelegramDataSource)
        raw = spark.read.format("dsmr_telegram").load(str(tmp_path))
        rows = raw.collect()
        assert len(rows) == 3
        # one partition per file, telegram_idx restarts per file
        assert {(r.path.split("/")[-1], r.telegram_idx) for r in rows} == {
            ("cap1.p1", 0), ("cap1.p1", 1), ("cap2.p1", 0),
        }
        assert all(r.identification == "ISK5\\2M550T-1012" for r in rows)
        assert raw.rdd.getNumPartitions() == 2

        parsed = parse_telegram(raw).collect()
        for r in parsed:
            assert r.power_delivered_kw == pytest.approx(0.244)
            assert r.energy_delivered_t1_kwh == pytest.approx(4.426)
            assert r.meter_id == "meters/ISK5\\2M550T-1012"
            assert r.power_w == pytest.approx(244.0)

    def test_missing_path_raises(self, spark, tmp_path):
        from homelogging_spark.sources.dsmr_datasource import DsmrTelegramDataSource

        spark.dataSource.register(DsmrTelegramDataSource)
        with pytest.raises(Exception, match="no files match|does not exist"):
            spark.read.format("dsmr_telegram").load(
                str(tmp_path / "nope" / "*.p1")
            ).collect()


class TestDataSourceStream:
    def test_tail_resumes_from_offsets_across_runs(self, spark, tmp_path):
        from homelogging_spark.sources.dsmr_datasource import DsmrTelegramDataSource

        cap = tmp_path / "captures"
        cap.mkdir()
        (cap / "cap1.p1").write_text(TELEGRAM)

        spark.dataSource.register(DsmrTelegramDataSource)
        out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"

        def drain():
            q = (
                spark.readStream.format("dsmr_telegram")
                .load(str(cap))
                .writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain()
        first = spark.read.parquet(str(out_dir)).collect()
        assert len(first) == 1 and first[0].telegram_idx == 0

        # the current file GROWS and a rotated file lands; a resumed run
        # must emit only the new frames (offsets = per-file frame counts)
        (cap / "cap1.p1").write_text(TELEGRAM + TELEGRAM)
        (cap / "cap2.p1").write_text(TELEGRAM)
        drain()
        rows = spark.read.parquet(str(out_dir)).collect()
        assert len(rows) == 3  # 1 old + 1 appended + 1 rotated, no re-emits
        emitted = {(r.path.split("/")[-1], r.telegram_idx) for r in rows}
        assert emitted == {("cap1.p1", 0), ("cap1.p1", 1), ("cap2.p1", 0)}


class TestAdviceRegressions:
    """r5 ADVICE items: NUL scrub (P1/P1Logger.cs:64) and subdirectory
    entries in the capture dir must not become InputPartitions."""

    def test_nul_characters_scrubbed_before_framing(self):
        noisy = TELEGRAM.replace("(00.244", "(00\0.244") + "\0" + TELEGRAM
        frames = frame_telegrams(noisy)
        assert len(frames) == 2
        assert all("\0" not in f for f in frames)
        assert "1-0:1.7.0(00.244*kW)" in frames[0]

    def test_subdirectory_skipped_batch_and_stream(self, spark, tmp_path):
        from homelogging_spark.sources.dsmr_datasource import (
            DsmrTelegramDataSource,
            DsmrTelegramStreamReader,
        )

        (tmp_path / "cap1.p1").write_text(TELEGRAM)
        (tmp_path / "rotated").mkdir()  # subdir must be ignored

        spark.dataSource.register(DsmrTelegramDataSource)
        rows = spark.read.format("dsmr_telegram").load(str(tmp_path)).collect()
        assert len(rows) == 1

        rdr = DsmrTelegramStreamReader({"path": str(tmp_path)})
        assert [p.split("/")[-1] for p in rdr._files()] == ["cap1.p1"]
        out, off = rdr.read(rdr.initialOffset())
        assert len(list(out)) == 1
        assert off == {"files": {str(tmp_path / "cap1.p1"): 1}}
