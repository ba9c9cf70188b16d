"""Compaction round-trip tests for the K1 sink maintenance operator."""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.ingest import append_readings
from homelogging_spark.operators.maintenance import (
    compact_readings,
    partition_file_stats,
    plan_compaction,
)


def _mk_batch(spark, series, day, start, n):
    base = datetime.datetime(2024, 1, day)
    rows = [
        (f"m{i % 3}", series, base + datetime.timedelta(seconds=start + i), float(i))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "meter_id string, series string, ts timestamp, value double"
    )


def _table_fingerprint(spark, path):
    df = spark.read.parquet(path)
    return (
        df.count(),
        df.agg(
            F.sum(F.hash("meter_id", "series", "ts", "value")).alias("h")
        ).collect()[0].h,
    )


def _data_files(path):
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    )


class TestCompaction:
    def test_compacts_fragmented_partition_and_preserves_rows(self, spark, tmp_path):
        path = str(tmp_path / "readings")
        # 8 micro-batch appends into one (series, date) partition → >=8 files
        for b in range(8):
            append_readings(_mk_batch(spark, "PowerEnergy", 1, b * 1000, 50), path)
        # one healthy single-append partition that must NOT be rewritten
        append_readings(_mk_batch(spark, "MPPT1", 2, 0, 50), path)

        before = _table_fingerprint(spark, path)
        stats = {s.partition: s for s in partition_file_stats(spark, path)}
        frag = stats["series=PowerEnergy/date=2024-01-01"]
        assert frag.n_files >= 8
        healthy_files = [
            f for f in _data_files(path) if "series=MPPT1" in f
        ]

        rewritten = compact_readings(spark, path, target_file_bytes=1 << 30)
        assert [s.partition for s in rewritten] == [
            "series=PowerEnergy/date=2024-01-01"
        ]

        after_stats = {s.partition: s for s in partition_file_stats(spark, path)}
        assert after_stats["series=PowerEnergy/date=2024-01-01"].n_files == 1
        # rows byte-identical, healthy partition's files untouched
        assert _table_fingerprint(spark, path) == before
        assert [f for f in _data_files(path) if "series=MPPT1" in f] == healthy_files

    def test_second_run_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "readings")
        for b in range(6):
            append_readings(_mk_batch(spark, "PowerEnergy", 1, b * 1000, 30), path)
        assert compact_readings(spark, path, target_file_bytes=1 << 30) != []
        assert compact_readings(spark, path, target_file_bytes=1 << 30) == []

    def test_plan_leaves_right_sized_partitions_alone(self):
        from homelogging_spark.operators.maintenance import PartitionStat

        stats = [
            PartitionStat("series=A/date=1", n_files=10, total_bytes=10 * 200),
            # few files → skip regardless of size
            PartitionStat("series=B/date=1", n_files=2, total_bytes=2 * 10),
            # many files but already target-sized → skip (convergence)
            PartitionStat("series=C/date=1", n_files=10, total_bytes=10 * 4096),
        ]
        picked = plan_compaction(stats, target_file_bytes=4096, min_files=4)
        assert [s.partition for s in picked] == ["series=A/date=1"]

    def test_empty_or_missing_table(self, spark, tmp_path):
        assert partition_file_stats(spark, str(tmp_path / "nope")) == []
        assert compact_readings(spark, str(tmp_path / "nope")) == []

    def test_escaped_partition_values_survive_compaction(self, spark, tmp_path):
        """Partition dirs carry Hadoop %XX escaping (space, colon, %);
        re-attaching the raw dir string would corrupt those rows."""
        path = str(tmp_path / "readings")
        for b in range(6):
            append_readings(
                _mk_batch(spark, "Power Energy:50%", 1, b * 1000, 30), path
            )
        before = _table_fingerprint(spark, path)
        rewritten = compact_readings(spark, path, target_file_bytes=1 << 30)
        assert len(rewritten) == 1
        assert _table_fingerprint(spark, path) == before
        vals = [
            r.series
            for r in spark.read.parquet(path).select("series").distinct().collect()
        ]
        assert vals == ["Power Energy:50%"]

    def test_null_partition_skipped_not_corrupted(self, spark, tmp_path):
        """A null partition value (__HIVE_DEFAULT_PARTITION__ dir) is left
        fragmented rather than rewritten with the sentinel string."""
        path = str(tmp_path / "readings")
        batch = _mk_batch(spark, "PowerEnergy", 1, 0, 30).withColumn(
            "series", F.lit(None).cast("string")
        )
        for b in range(6):
            append_readings(batch, path)
        n_before = spark.read.parquet(path).where(F.col("series").isNull()).count()
        rewritten = compact_readings(spark, path, target_file_bytes=1 << 30)
        assert rewritten == []
        assert (
            spark.read.parquet(path).where(F.col("series").isNull()).count()
            == n_before
        )


class TestCompactedFixture:
    def test_fixture_partitions_within_policy(self, spark, sf_dir):
        """The compaction_report fixture's partitions must actually have
        been compacted: every (series, date) leaf within file-count policy
        (the invariant DuckDB cannot check)."""
        from homelogging_spark.tables import compacted_readings_table, _fixture_path

        compacted_readings_table(spark, sf_dir)  # ensure built
        path = _fixture_path(sf_dir, "compacted")
        stats = partition_file_stats(spark, path)
        assert len(stats) == 20  # 2 series x 10 days
        assert plan_compaction(stats, target_file_bytes=64 * 1024 * 1024, min_files=2) == []
        assert all(s.n_files <= 2 for s in stats)


class TestCrashAtomicCommit:
    """r6: kill-between-steps coverage of the journaled swap protocol.
    The test performs the EXACT steps compact_readings runs (stage →
    journal → rename live→trash → rename tmp→live → clean), stopping at
    each boundary, and asserts readers see the old rows or the new rows
    — never a lost partition — once recovery (automatic at the next
    compact_readings) has run."""

    def _fragmented_table(self, spark, tmp_path):
        path = str(tmp_path / "readings")
        for i in range(6):
            append_readings(_mk_batch(spark, "P", 1, i * 100, 20), path)
        append_readings(_mk_batch(spark, "Q", 1, 0, 20), path)
        return path

    def _steps(self, spark, path, stop_after):
        """Replicate the per-partition commit steps, stopping early."""
        import os as _os

        from homelogging_spark.operators.maintenance import (
            JOURNAL_DIR,
            TMP_DIR,
            TRASH_DIR,
            _flat_name,
            partition_file_stats,
            plan_compaction,
        )

        s = plan_compaction(partition_file_stats(spark, path), 1 << 20, 4)[0]
        flat = _flat_name(s.partition)
        live = _os.path.join(path, s.partition)
        tmp = _os.path.join(path, TMP_DIR, flat)
        trash = _os.path.join(path, TRASH_DIR, flat)
        marker = _os.path.join(path, JOURNAL_DIR, flat)
        _os.makedirs(_os.path.join(path, JOURNAL_DIR), exist_ok=True)
        _os.makedirs(_os.path.join(path, TRASH_DIR), exist_ok=True)
        spark.read.parquet(live).coalesce(1).write.mode("overwrite").parquet(tmp)
        if stop_after == "stage":
            return
        open(marker, "w").close()
        if stop_after == "journal":
            return
        _os.rename(live, trash)
        if stop_after == "rename_out":
            return
        _os.rename(tmp, live)
        if stop_after == "rename_in":
            return
        raise AssertionError(f"unknown stop point {stop_after}")

    @staticmethod
    def _visible_now(spark, path, fingerprint):
        """Old-or-new check WITHOUT recovery: a reader hitting the table
        at this instant must still see every row (hidden dirs ignored)."""
        import pytest as _pytest

        assert _table_fingerprint(spark, path) == fingerprint

    def test_every_kill_point_preserves_rows(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            compact_readings,
            partition_file_stats,
        )

        for stop in ("stage", "journal", "rename_out", "rename_in"):
            base = tmp_path / stop
            base.mkdir()
            path = self._fragmented_table(spark, base)
            before = _table_fingerprint(spark, path)
            self._steps(spark, path, stop)
            if stop in ("stage", "journal"):
                # live partition untouched: readers see OLD immediately
                self._visible_now(spark, path, before)
            # next maintenance run repairs and completes
            compact_readings(spark, path, target_file_bytes=1 << 20, min_files=4)
            assert _table_fingerprint(spark, path) == before, stop
            # and the partition ends up actually compacted + clean
            stats = {s.partition: s for s in partition_file_stats(spark, path)}
            frag = [s for s in stats.values() if s.n_files > 4]
            assert not frag, (stop, stats)
            for d in (".compact_tmp", ".compact_trash", ".compact_journal"):
                leftovers = list((base / "readings" / d).glob("*")) if (
                    base / "readings" / d
                ).exists() else []
                assert not leftovers, (stop, d, leftovers)

    def test_recovery_restores_from_trash_when_staging_lost(self, spark, tmp_path):
        """Defensive path: staging dir vanished mid-window (e.g. a
        concurrent cleanup) — the trashed old files must come back."""
        import os as _os
        import shutil

        from homelogging_spark.operators.maintenance import recover_compaction

        path = self._fragmented_table(spark, tmp_path)
        before = _table_fingerprint(spark, path)
        self._steps(spark, path, "rename_out")
        # simulate the staging copy being lost
        shutil.rmtree(_os.path.join(path, ".compact_tmp"))
        rolled = recover_compaction(spark, path)
        assert rolled  # the partition was repaired
        assert _table_fingerprint(spark, path) == before


class TestClusterRewrite:
    def test_clustering_shrinks_admitting_rowgroups_and_preserves_rows(
        self, spark, tmp_path
    ):
        """The data-skipping claim, measured from parquet footers: after
        cluster_rewrite on user_id, a point predicate's admitting
        row-group fraction drops from ~100% (random layout: every file's
        [min,max] spans the whole key range) to ~1/n_files, and rows
        survive byte-for-byte."""
        from homelogging_spark.operators.maintenance import (
            cluster_rewrite,
            rowgroups_admitting,
        )

        df = spark.range(20_000).select(
            (F.col("id") % 200).alias("user_id"),
            F.col("id").alias("event_id"),
            (F.col("id") * 7 % 1000).cast("double").alias("value"),
        )
        shuffled = str(tmp_path / "shuffled")
        clustered = str(tmp_path / "clustered")
        # adversarial baseline: hash-scatter the rows so every file
        # spans the full user_id range (what streaming appends produce)
        df.repartition(8, "event_id").write.parquet(shuffled)
        cluster_rewrite(spark.read.parquet(shuffled), clustered, ["user_id"], n_files=8)

        adm_before, tot_before = rowgroups_admitting(shuffled, "user_id", 42)
        adm_after, tot_after = rowgroups_admitting(clustered, "user_id", 42)
        assert adm_before == tot_before  # every row group admits
        assert adm_after * 2 <= tot_after  # at least half skipped
        assert adm_after <= 2  # ~1/n_files band actually admits

        # rows preserved exactly
        a = spark.read.parquet(shuffled)
        b = spark.read.parquet(clustered)
        assert a.count() == b.count() == 20_000
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_composes_with_hive_partitions(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            cluster_rewrite,
            rowgroups_admitting,
        )

        df = spark.range(4_000).select(
            (F.col("id") % 2).cast("string").alias("shard"),
            (F.col("id") % 100).alias("user_id"),
            F.col("id").alias("event_id"),
        )
        out = str(tmp_path / "parts")
        cluster_rewrite(df, out, ["user_id"], n_files=4, partition_cols=["shard"])
        import os as _os

        assert sorted(
            d for d in _os.listdir(out) if d.startswith("shard=")
        ) == ["shard=0", "shard=1"]
        adm, tot = rowgroups_admitting(out, "user_id", 7)
        assert adm < tot  # stats still prune inside each hive partition


class TestZorderRewrite:
    def test_zorder_prunes_on_both_keys(self, spark, tmp_path):
        """Single-key clustering prunes only its own key; Z-order must
        make point predicates on BOTH ordered columns prunable, and
        preserve rows exactly."""
        from homelogging_spark.operators.maintenance import (
            cluster_rewrite,
            rowgroups_admitting,
            zorder_rewrite,
        )

        df = spark.range(20_000).select(
            (F.col("id") % 200).alias("a"),
            ((F.col("id") * 7919) % 331).alias("b"),  # independent of a
            F.col("id").alias("rowid"),
        )
        single = str(tmp_path / "single")
        zord = str(tmp_path / "zord")
        cluster_rewrite(df, single, ["a"], n_files=16)
        zorder_rewrite(df, zord, ["a", "b"], n_files=16, bits=4)

        sa, st = rowgroups_admitting(single, "a", 42)
        sb, _ = rowgroups_admitting(single, "b", 100)
        za, zt = rowgroups_admitting(zord, "a", 42)
        zb, _ = rowgroups_admitting(zord, "b", 100)
        assert sa <= 2          # single-key: its own key prunes hard
        assert sb == st         # ...but the other key not at all
        assert za * 2 <= zt     # z-order: BOTH keys prune
        assert zb * 2 <= zt
        # rows preserved exactly
        back = spark.read.parquet(zord)
        assert back.count() == 20_000
        assert df.exceptAll(back).count() == 0 and back.exceptAll(df).count() == 0

    def test_zorder_validation(self, spark, tmp_path):
        import pytest

        from homelogging_spark.operators.maintenance import zorder_rewrite

        df = spark.range(10).select(F.col("id").alias("a"))
        with pytest.raises(ValueError, match="1-4 columns"):
            zorder_rewrite(df, str(tmp_path / "x"), [], n_files=2)
        with pytest.raises(ValueError, match="bits"):
            zorder_rewrite(df, str(tmp_path / "x"), ["a"], bits=0)

    def test_zorder_sign_bit_guard(self, spark, tmp_path):
        """bits=16 with 4 columns would put the top interleaved bit at
        shift 63 — the bigint sign bit — silently inverting the curve
        order for the highest quantiles. Must be rejected; the largest
        combos that fit 63 bits must still work."""
        import pytest

        from homelogging_spark.operators.maintenance import zorder_rewrite

        df = spark.range(64).select(
            F.col("id").alias("a"),
            (F.col("id") * 3 % 64).alias("b"),
            (F.col("id") * 5 % 64).alias("c"),
            (F.col("id") * 7 % 64).alias("d"),
        )
        with pytest.raises(ValueError, match="signed bigint"):
            zorder_rewrite(df, str(tmp_path / "x"), ["a", "b", "c", "d"], bits=16)
        # boundary combos inside the 63-bit budget are accepted
        zorder_rewrite(
            df, str(tmp_path / "ok3x16"), ["a", "b", "c"], n_files=2, bits=16
        )
        zorder_rewrite(
            df,
            str(tmp_path / "ok4x15"),
            ["a", "b", "c", "d"],
            n_files=2,
            bits=15,
        )
        assert spark.read.parquet(str(tmp_path / "ok4x15")).count() == 64

    def test_zorder_quantile_stats_single_pass(self, spark, tmp_path, monkeypatch):
        """Quantile boundary collection must be ONE approxQuantile action
        over all ordered columns (one input scan), not one per column —
        k full scans before a 100 TB rewrite is real cost."""
        from homelogging_spark.operators.maintenance import zorder_rewrite

        df = spark.range(1_000).select(
            (F.col("id") % 50).alias("a"), (F.col("id") % 7).alias("b")
        )
        # patch the CONCRETE class (pyspark 4's classic DataFrame overrides
        # the base method, so patching pyspark.sql.DataFrame misses)
        cls = type(df)
        calls: list = []
        orig = cls.approxQuantile

        def spy(self, col, probabilities, relativeError):
            calls.append(col)
            return orig(self, col, probabilities, relativeError)

        monkeypatch.setattr(cls, "approxQuantile", spy)
        zorder_rewrite(df, str(tmp_path / "z"), ["a", "b"], n_files=4, bits=2)
        assert len(calls) == 1
        assert list(calls[0]) == ["a", "b"]


class TestIncrementalLayoutRewrite:
    """Partition-scoped maintenance: only fragmented partitions are
    rewritten, untouched partitions stay byte-identical, rows are
    conserved, the rewritten layout prunes like the full rewrite, and a
    second run is a no-op (footer-audit convergence)."""

    def _table(self, spark, tmp_path, n_batches=6):
        path = str(tmp_path / "readings")
        # fragmented partition: every append file spans the full value
        # range (the layout a day of micro-batch appends produces)
        for b in range(n_batches):
            append_readings(_mk_batch(spark, "P", 1, b * 1000, 200), path)
        # healthy single-file partition: no separable band pairs → skipped
        append_readings(_mk_batch(spark, "Q", 2, 0, 200), path)
        return path

    def test_targets_only_fragmented_and_converges(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            incremental_layout_rewrite,
            rowgroups_admitting,
        )

        path = self._table(spark, tmp_path)
        before = _table_fingerprint(spark, path)
        healthy = [f for f in _data_files(path) if "series=Q" in f]
        done = incremental_layout_rewrite(spark, path, ["value"], n_files=4)
        assert done == ["series=P/date=2024-01-01"]
        # rows conserved; the healthy partition's files untouched
        assert _table_fingerprint(spark, path) == before
        assert [f for f in _data_files(path) if "series=Q" in f] == healthy
        # the rewritten partition prunes like the full cluster_rewrite
        part = os.path.join(path, "series=P/date=2024-01-01")
        adm, tot = rowgroups_admitting(part, "value", 42.0)
        assert tot >= 4 and adm * 2 <= tot
        # convergence: the audit now sees disjoint bands → second run no-op
        assert incremental_layout_rewrite(spark, path, ["value"], n_files=4) == []

    def test_multicol_zorder_per_partition(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            incremental_layout_rewrite,
            rowgroups_admitting,
        )

        path = str(tmp_path / "zt")
        base = spark.range(40_000).select(
            (F.col("id") % 2).cast("string").alias("shard"),
            (F.col("id") % 100).cast("double").alias("a"),
            ((F.col("id") * 7919) % 331).cast("double").alias("b"),
        )
        for _ in range(5):  # five fragmented appends per shard
            base.repartition(2).write.mode("append").partitionBy(
                "shard"
            ).parquet(path)
        before = _table_fingerprint_cols(spark, path, ["a", "b"])
        # 16 files per partition: curve segments approximate 4-bit octant
        # prefixes, giving both columns real bands (8 files leaves the
        # sampled range boundaries too coarse for the secondary column)
        done = incremental_layout_rewrite(
            spark, path, ["a", "b"], n_files=16, bits=4
        )
        assert sorted(done) == ["shard=0", "shard=1"]
        assert _table_fingerprint_cols(spark, path, ["a", "b"]) == before
        # BOTH ordered columns prune inside a rewritten partition
        part = os.path.join(path, "shard=0")
        aa, at = rowgroups_admitting(part, "a", 42.0)
        ba, bt = rowgroups_admitting(part, "b", 100.0)
        assert aa * 2 <= at
        assert ba * 2 <= bt
        # converges under the same parameters
        assert (
            incremental_layout_rewrite(spark, path, ["a", "b"], n_files=16, bits=4)
            == []
        )

    def test_repairs_interrupted_commit_first(self, spark, tmp_path):
        """An interrupted journaled commit (crash after the journal
        marker) is repaired by the shared recovery before the audit —
        incremental rewrite uses the same protocol as compaction."""
        import os as _os
        import shutil

        from homelogging_spark.operators.maintenance import (
            JOURNAL_DIR,
            TMP_DIR,
            _flat_name,
            incremental_layout_rewrite,
        )

        path = self._table(spark, tmp_path)
        before = _table_fingerprint(spark, path)
        # simulate: staged copy complete + journal marker written, crash
        # before the swap (the 'journal' kill point)
        part = "series=P/date=2024-01-01"
        flat = _flat_name(part)
        tmp = _os.path.join(path, TMP_DIR, flat)
        # staged copy is itself fragmented (hash-scattered), so after the
        # roll-forward the audit still picks the partition for rewrite
        spark.read.parquet(_os.path.join(path, part)).repartition(3).write.mode(
            "overwrite"
        ).parquet(tmp)
        _os.makedirs(_os.path.join(path, JOURNAL_DIR), exist_ok=True)
        open(_os.path.join(path, JOURNAL_DIR, flat), "w").close()
        done = incremental_layout_rewrite(spark, path, ["value"], n_files=4)
        assert done == [part]  # rolled forward, then audited + rewritten
        assert _table_fingerprint(spark, path) == before
        for d in (".compact_tmp", ".compact_trash", ".compact_journal"):
            p = _os.path.join(path, d)
            assert not _os.path.exists(p) or not _os.listdir(p)

    def test_validation(self, spark, tmp_path):
        import pytest

        from homelogging_spark.operators.maintenance import (
            incremental_layout_rewrite,
        )

        with pytest.raises(ValueError, match="at least one"):
            incremental_layout_rewrite(spark, str(tmp_path), [])
        with pytest.raises(ValueError, match="cannot converge"):
            incremental_layout_rewrite(
                spark, str(tmp_path), ["a"], n_files=2, max_overlap_frac=0.5
            )
        with pytest.raises(ValueError, match="signed bigint"):
            incremental_layout_rewrite(
                spark, str(tmp_path), ["a", "b", "c", "d"], bits=16
            )

    def test_rejects_hive_partition_layout_columns(self, spark, tmp_path):
        """A hive partition column is constant within each rewritten
        partition and absent from data files — laying out on it used to
        die with a bare KeyError mid-cycle (r13 ADVICE)."""
        import pytest

        from homelogging_spark.operators.maintenance import (
            incremental_layout_rewrite,
            plan_layout_rewrite,
        )

        path = self._table(spark, tmp_path)
        with pytest.raises(ValueError, match="PARTITION column"):
            incremental_layout_rewrite(spark, path, ["series"], n_files=4)
        with pytest.raises(ValueError, match="PARTITION column"):
            incremental_layout_rewrite(
                spark, path, ["value", "date"], n_files=4, bits=2
            )
        with pytest.raises(ValueError, match="PARTITION column"):
            plan_layout_rewrite(spark, path, "series")


class TestAuditFilesystem:
    """The footer audits must address the same store the rewrite
    commits to (r13 ADVICE): URI-resolved filesystem, never a bare
    local glob, with descriptive errors for absent columns and
    unresolvable schemes."""

    def _part(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.range(100).select(
            F.col("id").cast("double").alias("value")
        ).coalesce(2).write.parquet(path)
        return path

    def test_file_uri_equals_local_path(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            partition_band_overlap,
            rowgroups_admitting,
        )

        path = self._part(spark, tmp_path)
        assert partition_band_overlap(f"file://{path}", "value") == (
            partition_band_overlap(path, "value")
        )
        assert rowgroups_admitting(f"file://{path}", "value", 42.0) == (
            rowgroups_admitting(path, "value", 42.0)
        )

    def test_hidden_maintenance_dirs_invisible_to_audit(self, spark, tmp_path):
        import shutil

        from homelogging_spark.operators.maintenance import (
            partition_band_overlap,
        )

        path = self._part(spark, tmp_path)
        before = partition_band_overlap(path, "value")
        # a staged copy under .compact_tmp must not double the bands
        shutil.copytree(path, os.path.join(path, ".compact_tmp", "stage"))
        assert partition_band_overlap(path, "value") == before

    def test_absent_column_raises_descriptive(self, spark, tmp_path):
        import pytest

        from homelogging_spark.operators.maintenance import (
            partition_band_overlap,
            rowgroups_admitting,
        )

        path = self._part(spark, tmp_path)
        with pytest.raises(ValueError, match="'nope' is not in the schema"):
            partition_band_overlap(path, "nope")
        with pytest.raises(ValueError, match="'nope' is not in the schema"):
            rowgroups_admitting(path, "nope", 1)

    def test_unresolvable_scheme_raises_not_silent_noop(self):
        import pytest

        from homelogging_spark.operators.maintenance import (
            partition_band_overlap,
        )

        with pytest.raises(ValueError, match="cannot address"):
            partition_band_overlap("weird://bucket/table", "value")

    def test_missing_local_path_is_empty_not_error(self, tmp_path):
        from homelogging_spark.operators.maintenance import (
            partition_band_overlap,
        )

        assert partition_band_overlap(str(tmp_path / "nope"), "v") == (0, 0)


class TestMaintenanceCycle:
    def _table(self, spark, tmp_path):
        path = str(tmp_path / "readings")
        for b in range(6):
            append_readings(_mk_batch(spark, "P", 1, b * 1000, 200), path)
        append_readings(_mk_batch(spark, "Q", 2, 0, 200), path)
        return path

    def test_compact_then_layout_and_converge(self, spark, tmp_path):
        """The composed nightly cycle: with compaction effectively off
        (high min_files) the layout leg fixes the fragmented partition;
        rows conserved; a second cycle is a complete no-op."""
        from homelogging_spark.operators.maintenance import maintenance_cycle

        path = self._table(spark, tmp_path)
        before = _table_fingerprint(spark, path)
        rep = maintenance_cycle(
            spark, path, layout_cols=["value"], min_files=10, n_files=4
        )
        assert rep["compacted"] == []
        assert rep["rewritten"] == ["series=P/date=2024-01-01"]
        assert _table_fingerprint(spark, path) == before
        rep2 = maintenance_cycle(
            spark, path, layout_cols=["value"], min_files=10, n_files=4
        )
        assert rep2 == {"recovered": [], "compacted": [], "rewritten": []}

    def test_small_partition_compacts_without_ping_pong(self, spark, tmp_path):
        """When compaction merges the fragmented partition into one tiny
        file (single row group), the layout audit must leave it alone —
        nothing footer pruning could skip — so the cycle stabilizes
        instead of alternating coalesce/sort forever."""
        from homelogging_spark.operators.maintenance import maintenance_cycle

        path = self._table(spark, tmp_path)
        before = _table_fingerprint(spark, path)
        rep = maintenance_cycle(
            spark, path, layout_cols=["value"], target_file_bytes=1 << 30,
            min_files=2, n_files=4,
        )
        assert rep["compacted"] == ["series=P/date=2024-01-01"]
        assert rep["rewritten"] == []  # one row group: unseparable, skipped
        assert _table_fingerprint(spark, path) == before
        rep2 = maintenance_cycle(
            spark, path, layout_cols=["value"], target_file_bytes=1 << 30,
            min_files=2, n_files=4,
        )
        assert rep2 == {"recovered": [], "compacted": [], "rewritten": []}


def _table_fingerprint_cols(spark, path, cols):
    df = spark.read.parquet(path)
    return (
        df.count(),
        df.agg(F.sum(F.hash(*cols)).alias("h")).collect()[0].h,
    )


class TestRowgroupsAdmittingRange:
    def test_range_predicate_overlap(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import (
            cluster_rewrite,
            rowgroups_admitting,
        )

        df = spark.range(8_000).select((F.col("id") % 80).alias("a"))
        out = str(tmp_path / "c")
        cluster_rewrite(df, out, ["a"], n_files=8)
        # each file covers ~10 values of a; a 20-value range admits ~2-3
        adm, tot = rowgroups_admitting(out, "a", 30, 49)
        assert 1 <= adm <= 4 and tot == 8
        # degenerate range == point form
        p1 = rowgroups_admitting(out, "a", 42)
        p2 = rowgroups_admitting(out, "a", 42, 42)
        assert p1 == p2
        import pytest

        with pytest.raises(ValueError, match="empty range"):
            rowgroups_admitting(out, "a", 10, 5)


class TestIndexCycle:
    """Nightly embedding-index maintenance (r14): occupancy-triggered
    quantizer refresh + stage-then-switch re-materialization of every
    dependent artifact, so readers never see a new quantizer with old
    cells."""

    DIM = 8

    def _corpus(self, spark, n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.col("id") * (i + 3)) % 17).cast("double") + F.lit(0.1)
                    for i in range(self.DIM)
                ]
            ).alias("embedding"),
        )

    def _cycle(self, spark, corpus, root, **kw):
        from homelogging_spark.operators.maintenance import index_cycle

        args = dict(
            target_cell_rows=8, k_min=2, n_iters=1, pq_subspaces=2,
            pq_centroids=4, dim=self.DIM, sample_mod=None,
        )
        args.update(kw)
        return index_cycle(spark, corpus, root, **args)

    def test_builds_consistent_generation(self, spark, tmp_path):
        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.maintenance import load_index

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        out = self._cycle(spark, corpus, root)
        assert out == {
            "refreshed": True, "k": 8, "target_k": 8, "n_vectors": 64,
            "opq": False,
        }
        idx = load_index(spark, root)
        assert idx["centroids"].count() == 8
        # every vector assigned and encoded exactly once
        assert idx["cells"].count() == 64
        assert idx["codes"].count() == 64
        assert idx["codebook"].count() == 2 * 4  # subspaces x centroids
        # cells are CONSISTENT with the served centroids: re-deriving
        # the assignment from the stored quantizer matches bit-for-bit
        rederived = similarity.ivf_assign(
            corpus, idx["centroids"], 1
        ).select("vec_id", "centroid_id")
        assert sorted(map(tuple, idx["cells"].collect())) == sorted(
            map(tuple, rederived.collect())
        )
        # r15: the SQ8 tier is maintained in the SAME generation — one
        # bounds row, one code row per vector, codes consistent with
        # the stored bounds (re-encoding against them matches exactly)
        assert idx["sq8_bounds"].count() == 1
        assert idx["sq8_codes"].count() == 64
        re_codes = similarity.sq8_codes(
            corpus, bounds=idx["sq8_bounds"]
        ).select("vec_id", "codes")
        assert sorted(
            (r.vec_id, tuple(r.codes))
            for r in idx["sq8_codes"].select("vec_id", "codes").collect()
        ) == sorted(
            (r.vec_id, tuple(r.codes)) for r in re_codes.collect()
        )
        # ...and sq8_topk serves from the committed artifacts
        served = similarity.sq8_topk(
            corpus.where(F.col("vec_id") < 2),
            corpus.where(F.col("vec_id") >= 2),
            k=3,
            bounds=idx["sq8_bounds"],
        )
        assert served.count() == 6

    def test_cluster_balanced_sample_serves_from_cycle_artifacts(
        self, spark, tmp_path
    ):
        """The curation sampler serves from the cycle's committed
        generation two ways, consistently: re-assigning against the
        stored centroids, or (the production shape) straight from the
        stored ``cells`` artifact with NO embedding read — identical
        samples, and the census equals the artifact's cell counts."""
        from homelogging_spark.operators.maintenance import load_index
        from homelogging_spark.operators.sampling import (
            cluster_balanced_sample,
        )

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root)
        idx = load_index(spark, root)
        via_centroids = sorted(
            map(tuple, cluster_balanced_sample(
                corpus, idx["centroids"], k_per_cell=3
            ).collect())
        )
        via_cells = sorted(
            map(tuple, cluster_balanced_sample(
                None, None, k_per_cell=3, cells=idx["cells"]
            ).collect())
        )
        assert via_centroids == via_cells and len(via_cells) > 0
        # census column equals the committed artifact's cell populations
        counts = {
            r.centroid_id: r.n
            for r in idx["cells"].groupBy("centroid_id").count()
            .withColumnRenamed("count", "n").collect()
        }
        for vec_id, cell, cell_n, rank in via_cells:
            assert cell_n == counts[cell] and rank <= 3

    def test_no_growth_is_noop_and_drift_retriggers(self, spark, tmp_path):
        import glob

        root = str(tmp_path / "index")
        self._cycle(spark, self._corpus(spark, 64), root)
        listing = sorted(glob.glob(root + "/**", recursive=True))
        # same corpus (and anything under 2x drift): deterministic no-op
        again = self._cycle(spark, self._corpus(spark, 64), root)
        assert again == {
            "refreshed": False, "k": 8, "target_k": 8, "n_vectors": 64,
            "opq": False,
        }
        under = self._cycle(spark, self._corpus(spark, 100), root)
        assert under["refreshed"] is False and under["target_k"] == 13
        assert sorted(glob.glob(root + "/**", recursive=True)) == listing
        # 4x corpus → target K drifted 2x past the served K → rebuild
        grown = self._cycle(spark, self._corpus(spark, 256), root)
        assert grown == {
            "refreshed": True, "k": 32, "target_k": 32, "n_vectors": 256,
            "opq": False,
        }
        from homelogging_spark.operators.maintenance import load_index

        assert load_index(spark, root)["centroids"].count() == 32
        assert load_index(spark, root)["cells"].count() == 256

    def test_opq_tier_builds_serves_and_repairs(self, spark, tmp_path):
        """r17 (r16 verdict #3): ``opq_seed`` materializes the rotated-
        PQ tier in the SAME generation — signs frozen as data, codes
        consistent with a recompute from the committed artifacts — and
        ``opq_search`` ranks from them with the rotation applied
        query-side only. Generation consistency and crash repair cover
        the new artifacts because they ride the same swap."""
        import shutil

        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.maintenance import (
            index_cycle, load_index, opq_search,
        )

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        out = self._cycle(spark, corpus, root, opq_seed="gen1")
        assert out["refreshed"] is True and out["opq"] is True
        idx = load_index(spark, root)
        # signs artifact == the seed derivation, frozen as data
        signs = [r.sign for r in idx["opq_signs"].orderBy("i").collect()]
        assert signs == similarity.hd_signs(self.DIM, "gen1")
        assert idx["opq_codes"].count() == 64
        assert idx["opq_codebook"].count() == 2 * 4
        # codes consistent with the committed generation: re-encoding
        # the rotated corpus against the STORED codebook matches
        rot = corpus.select(
            "vec_id",
            similarity.hd_rotate(
                F.col("embedding"), self.DIM, signs=signs
            ).alias("embedding"),
        )
        re_codes = similarity.pq_codes(
            rot, 2, 4, 1, self.DIM, sample_mod=None,
            codebook=idx["opq_codebook"],
        )
        code_cols = [c for c in re_codes.columns if c.startswith("code_")]
        assert sorted(
            map(tuple, idx["opq_codes"].select("vec_id", *code_cols).collect())
        ) == sorted(map(tuple, re_codes.select("vec_id", *code_cols).collect()))
        # serving: query-side rotation + ADC from the committed codes
        # equals in-memory pq_adc_topk over the same rotated frames
        queries = corpus.where(F.col("vec_id") < 3)
        served = opq_search(
            queries, idx, k=4, n_subspaces=2, dim=self.DIM
        )
        in_mem = similarity.pq_adc_topk(
            rot.where(F.col("vec_id") < 3),
            idx["opq_codes"],
            idx["opq_codebook"],
            k=4, n_subspaces=2, dim=self.DIM, rank_decimals=6,
        )
        assert sorted(
            (r.query_id, r.rank, r.vec_id) for r in served.collect()
        ) == sorted((r.query_id, r.rank, r.vec_id) for r in in_mem.collect())
        # an opq-less generation refuses to serve with a pointed error
        self._cycle(spark, corpus, str(tmp_path / "plain"))
        plain = load_index(spark, str(tmp_path / "plain"))
        assert "opq_signs" not in plain
        with pytest.raises(KeyError, match="no OPQ tier"):
            opq_search(queries, plain, dim=self.DIM)
        # enabling opq on an in-band pre-OPQ index forces the rebuild
        # the occupancy check alone would skip
        out2 = index_cycle(
            spark, corpus, str(tmp_path / "plain"),
            target_cell_rows=8, k_min=2, n_iters=1, pq_subspaces=2,
            pq_centroids=4, dim=self.DIM, sample_mod=None, opq_seed="gen1",
        )
        assert out2 == {
            "refreshed": True, "k": 8, "target_k": 8, "n_vectors": 64,
            "opq": True,
        }
        # ...and the crash window repairs the opq artifacts with the rest
        served_codes = sorted(
            map(tuple, idx["opq_codes"].select("vec_id", *code_cols).collect())
        )
        shutil.move(root, root + ".__trash")
        rep = self._cycle(spark, corpus, root, opq_seed="gen1")
        assert rep["refreshed"] is False and rep["opq"] is True
        assert sorted(
            map(
                tuple,
                load_index(spark, root)["opq_codes"]
                .select("vec_id", *code_cols)
                .collect(),
            )
        ) == served_codes

    def test_opq_learned_tier_and_ivf_opq_search(
        self, spark, tmp_path, monkeypatch
    ):
        """r19 (r18 verdict #8): opq_impl='learned' commits the frozen
        rotation MATRIX as data beside the rotated codebook/codes, and
        ``ivf_opq_search`` composes the generation's raw-space coarse
        prune with the learned-rotation ADC re-rank. With nprobe
        covering every cell the composition collapses to pq_adc_topk
        over the rotated frames (the prune-free equivalence); the
        provenance guards carry over (impl change refused, torn
        generation refused, opq_search pointed at the right server)."""
        import math

        import homelogging_spark.operators.opq_rotations as opqr
        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.maintenance import (
            index_cycle,
            ivf_opq_search,
            load_index,
            opq_search,
        )

        c, s = math.cos(0.5), math.sin(0.5)
        R = [[0.0] * self.DIM for _ in range(self.DIM)]
        for b in range(self.DIM // 2):
            R[2 * b][2 * b] = c
            R[2 * b][2 * b + 1] = -s
            R[2 * b + 1][2 * b] = s
            R[2 * b + 1][2 * b + 1] = c
        monkeypatch.setitem(
            opqr.OPQ_ROTATION_VERSIONS, 99, tuple(tuple(r) for r in R)
        )
        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        out = self._cycle(
            spark, corpus, root, opq_seed="v99", opq_impl="learned"
        )
        assert out["refreshed"] is True and out["opq"] is True
        idx = load_index(spark, root)
        assert "opq_signs" not in idx
        # the matrix artifact is the config, frozen as data
        assert idx["opq_rotation"].count() == self.DIM * self.DIM
        got = {
            (r.i, r.j): r.val for r in idx["opq_rotation"].collect()
        }
        assert all(
            got[(i, j)] == R[i][j]
            for i in range(self.DIM)
            for j in range(self.DIM)
        )
        meta = idx["opq_meta"].collect()[0]
        assert (meta.opq_impl, meta.opq_seed) == ("learned", "v99")
        # codes consistent with a re-encode of the rotated corpus
        rot = corpus.select(
            "vec_id",
            similarity.rotate_by_matrix(F.col("embedding"), R).alias(
                "embedding"
            ),
        )
        re_codes = similarity.pq_codes(
            rot, 2, 4, 1, self.DIM, sample_mod=None,
            codebook=idx["opq_codebook"],
        )
        code_cols = [c for c in re_codes.columns if c.startswith("code_")]
        assert sorted(
            map(tuple, idx["opq_codes"].select("vec_id", *code_cols).collect())
        ) == sorted(map(tuple, re_codes.select("vec_id", *code_cols).collect()))
        # prune-free equivalence: nprobe = K collapses to pq_adc_topk
        queries = corpus.where(F.col("vec_id") < 3)
        served_all = ivf_opq_search(
            queries, idx, k=4, nprobe=int(out["k"]), n_subspaces=2,
            dim=self.DIM,
        )
        in_mem = similarity.pq_adc_topk(
            rot.where(F.col("vec_id") < 3),
            idx["opq_codes"],
            idx["opq_codebook"],
            k=4, n_subspaces=2, dim=self.DIM, rank_decimals=6,
        )
        assert sorted(
            (r.query_id, r.rank, r.vec_id) for r in served_all.collect()
        ) == sorted((r.query_id, r.rank, r.vec_id) for r in in_mem.collect())
        # ...and a pruned serve returns pair-restricted rows from the
        # same chain (k per query, every distance a candidate's)
        served = ivf_opq_search(
            queries, idx, k=4, nprobe=2, n_subspaces=2, dim=self.DIM
        )
        assert served.groupBy("query_id").count().agg(
            F.max("count")
        ).collect()[0][0] <= 4
        # occupancy-in-band + matching provenance: no-op
        again = self._cycle(
            spark, corpus, root, opq_seed="v99", opq_impl="learned"
        )
        assert again["refreshed"] is False and again["opq"] is True
        # impl change refused without the force flag
        with pytest.raises(ValueError, match="opq_impl"):
            self._cycle(spark, corpus, root, opq_seed="gen1", opq_impl="expr")
        # the signs server points at the right one for this layout
        with pytest.raises(KeyError, match="ivf_opq_search"):
            opq_search(queries, idx, dim=self.DIM)
        # torn generation: meta version that does not re-derive the
        # committed matrix refuses to serve
        monkeypatch.setitem(
            opqr.OPQ_ROTATION_VERSIONS,
            99,
            tuple(
                tuple(-v for v in row) for row in R
            ),
        )
        with pytest.raises(ValueError, match="re-derive"):
            ivf_opq_search(queries, idx, k=4, n_subspaces=2, dim=self.DIM)
        # unknown rotation version refused up front, before training
        with pytest.raises(ValueError, match="unknown OPQ rotation"):
            self._cycle(
                spark, corpus, str(tmp_path / "other"),
                opq_seed="v123", opq_impl="learned",
            )
        with pytest.raises(ValueError, match="v<version>"):
            self._cycle(
                spark, corpus, str(tmp_path / "other"),
                opq_seed="gen1", opq_impl="learned",
            )

    def test_opq_fwht_impl_generation_is_self_consistent(self, spark, tmp_path):
        """r17: the O(d log d) butterfly encode dial builds a servable
        generation — codes recompute identically UNDER THE SAME IMPL
        (deterministic numpy), opq_search ranks from them, and an
        unknown impl name is refused."""
        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.maintenance import (
            index_cycle, load_index, opq_search,
        )

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        out = self._cycle(spark, corpus, root, opq_seed="g", opq_impl="fwht")
        assert out["opq"] is True
        idx = load_index(spark, root)
        signs = [r.sign for r in idx["opq_signs"].orderBy("i").collect()]
        rot = similarity.hd_rotate_fwht(corpus, self.DIM, signs=signs)
        re_codes = similarity.pq_codes(
            rot, 2, 4, 1, self.DIM, sample_mod=None,
            codebook=idx["opq_codebook"],
        )
        code_cols = [c for c in re_codes.columns if c.startswith("code_")]
        assert sorted(
            map(tuple, idx["opq_codes"].select("vec_id", *code_cols).collect())
        ) == sorted(map(tuple, re_codes.select("vec_id", *code_cols).collect()))
        served = opq_search(
            corpus.where(F.col("vec_id") < 2), idx, k=3,
            n_subspaces=2, dim=self.DIM,
        )
        assert served.count() == 6
        with pytest.raises(ValueError, match="opq_impl"):
            self._cycle(
                spark, corpus, str(tmp_path / "x"),
                opq_seed="g", opq_impl="nope",
            )

    def test_opq_provenance_persisted_and_enforced(self, spark, tmp_path):
        """r18 (r17 verdict #2): each OPQ generation records which
        rotation impl encoded it (one-row ``opq_meta``); a recompute
        request under the OTHER impl is refused unless explicitly
        forced (then fully re-encoded — never mixed-impl codes), and a
        changed seed on an in-band index rebuilds instead of silently
        serving the old rotation (the r17 ADVICE finding)."""
        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.maintenance import load_index

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root, opq_seed="g", opq_impl="fwht")
        idx = load_index(spark, root)
        meta = idx["opq_meta"].collect()[0]
        assert (meta.opq_impl, meta.opq_seed, meta.dim) == (
            "fwht", "g", self.DIM,
        )
        with pytest.raises(ValueError, match="never mix"):
            self._cycle(spark, corpus, root, opq_seed="g", opq_impl="expr")
        # forced: a full re-encode under the new impl, provenance updated
        out = self._cycle(
            spark, corpus, root, opq_seed="g", opq_impl="expr",
            allow_opq_impl_change=True,
        )
        assert out["refreshed"] is True and out["opq"] is True
        assert (
            load_index(spark, root)["opq_meta"].collect()[0].opq_impl
            == "expr"
        )
        # in-band seed change: rebuild, new signs committed + recorded
        out2 = self._cycle(spark, corpus, root, opq_seed="g2")
        assert out2["refreshed"] is True
        idx2 = load_index(spark, root)
        signs = [r.sign for r in idx2["opq_signs"].orderBy("i").collect()]
        assert signs == similarity.hd_signs(self.DIM, "g2")
        assert idx2["opq_meta"].collect()[0].opq_seed == "g2"

    def test_opq_pre_provenance_generation_falls_back_to_signs(
        self, spark, tmp_path
    ):
        """A pre-r18 generation (tier present, no opq_meta) still loads
        and still detects seed drift via the committed signs artifact;
        the next rebuild backfills the provenance row."""
        import shutil

        from homelogging_spark.operators.maintenance import load_index

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root, opq_seed="g")
        shutil.rmtree(os.path.join(root, "opq_meta"))
        idx = load_index(spark, root)
        assert "opq_meta" not in idx and "opq_signs" in idx
        # same seed: the signs-compare fallback keeps the in-band no-op
        out = self._cycle(spark, corpus, root, opq_seed="g")
        assert out["refreshed"] is False and out["opq"] is True
        # changed seed: rebuild + provenance backfilled
        out2 = self._cycle(spark, corpus, root, opq_seed="h")
        assert out2["refreshed"] is True
        meta = load_index(spark, root)["opq_meta"].collect()[0]
        assert (meta.opq_impl, meta.opq_seed) == ("expr", "h")

    def test_opq_search_asserts_meta_signs_consistency(self, spark, tmp_path):
        """Serving refuses a generation whose provenance row no longer
        derives the committed diagonal (torn/hand-edited state)."""
        from homelogging_spark.operators.maintenance import (
            load_index, opq_search,
        )

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root, opq_seed="g")
        spark.createDataFrame(
            [("expr", "WRONG-SEED", self.DIM)],
            "opq_impl string, opq_seed string, dim int",
        ).write.mode("overwrite").parquet(os.path.join(root, "opq_meta"))
        idx = load_index(spark, root)
        with pytest.raises(ValueError, match="torn or hand-edited"):
            opq_search(
                corpus.where(F.col("vec_id") < 2), idx,
                k=3, n_subspaces=2, dim=self.DIM,
            )

    def test_ivf_opq_search_signs_branch_meta_consistency(
        self, spark, tmp_path
    ):
        """r20 (r19 ADVICE #3): ``ivf_opq_search`` over a SIGNS-based
        generation enforces the same opq_meta provenance checks
        ``opq_search`` does — a torn/hand-edited generation (seed that
        no longer derives the diagonal, impl claiming 'learned' beside
        a signs artifact, or a dim mismatch) is refused by BOTH
        servers, not just one."""
        from homelogging_spark.operators.maintenance import (
            ivf_opq_search, load_index,
        )

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root, opq_seed="g")
        queries = corpus.where(F.col("vec_id") < 2)
        # intact generation serves
        ok = ivf_opq_search(
            queries, load_index(spark, root),
            k=3, nprobe=1, n_subspaces=2, dim=self.DIM,
        )
        assert ok.count() > 0

        def _meta(impl, seed, dim):
            spark.createDataFrame(
                [(impl, seed, dim)],
                "opq_impl string, opq_seed string, dim int",
            ).write.mode("overwrite").parquet(os.path.join(root, "opq_meta"))
            return load_index(spark, root)

        with pytest.raises(ValueError, match="torn or hand-edited"):
            ivf_opq_search(
                queries, _meta("expr", "WRONG-SEED", self.DIM),
                k=3, nprobe=1, n_subspaces=2, dim=self.DIM,
            )
        with pytest.raises(ValueError, match="signs-diagonal"):
            ivf_opq_search(
                queries, _meta("learned", "g", self.DIM),
                k=3, nprobe=1, n_subspaces=2, dim=self.DIM,
            )
        with pytest.raises(ValueError, match="different"):
            ivf_opq_search(
                queries, _meta("expr", "g", self.DIM * 2),
                k=3, nprobe=1, n_subspaces=2, dim=self.DIM,
            )

    def test_crash_between_swap_renames_is_repaired(self, spark, tmp_path):
        import os as _os
        import shutil

        from homelogging_spark.operators.maintenance import load_index

        root = str(tmp_path / "index")
        corpus = self._corpus(spark, 64)
        self._cycle(spark, corpus, root)
        served = sorted(map(tuple, load_index(spark, root)["cells"].collect()))
        # simulate the crash window: live moved to trash, staged copy
        # never promoted (and lost)
        shutil.move(root, root + ".__trash")
        out = self._cycle(spark, corpus, root)
        # recovery restored the committed generation, then no-op'd
        assert out["refreshed"] is False
        assert not _os.path.exists(root + ".__trash")
        assert sorted(
            map(tuple, load_index(spark, root)["cells"].collect())
        ) == served

    def test_validation(self, spark, tmp_path):
        import pytest

        with pytest.raises(ValueError, match="target_cell_rows"):
            self._cycle(
                spark, self._corpus(spark, 4), str(tmp_path / "i"),
                target_cell_rows=0,
            )
        with pytest.raises(ValueError, match="growth_factor"):
            self._cycle(
                spark, self._corpus(spark, 4), str(tmp_path / "i"),
                growth_factor=1.0,
            )

    def test_refuses_non_atomic_rename_scheme(self, spark, tmp_path):
        """r14 ADVICE (maintenance.py:806): the stage-then-switch swap
        is atomic on local/HDFS only — an object-store root is refused
        up front, before any filesystem call, the way _audit_filesystem
        validates schemes."""
        import pytest

        with pytest.raises(ValueError, match="non-atomic"):
            self._cycle(
                spark, self._corpus(spark, 4), "s3a://bucket/index"
            )


class TestRenameHardening:
    def test_failed_swap_rename_raises_and_preserves_trash(
        self, spark, tmp_path
    ):
        """r14 ADVICE (maintenance.py:851): Hadoop rename signals
        failure by returning FALSE — a swap that ignored it would
        delete the only committed generation after a silent no-op
        rename. _rename_or_raise must raise and leave both sides
        untouched."""
        import pytest

        from homelogging_spark.operators.maintenance import (
            _fs,
            _rename_or_raise,
        )

        hadoop, fs = _fs(spark, str(tmp_path))
        P = hadoop.Path
        src = tmp_path / "gen"
        src.mkdir()
        (src / "part-0.parquet").write_bytes(b"x")
        # an existing destination file -> Hadoop rename returns false
        # (never raises); the helper must turn that into an error
        dst = tmp_path / "occupied"
        dst.write_bytes(b"committed generation")
        with pytest.raises(IOError, match="returned false"):
            _rename_or_raise(fs, P(str(src)), P(str(dst)), "unit swap")
        assert (src / "part-0.parquet").exists()  # source intact
        assert dst.read_bytes() == b"committed generation"  # dest intact

    def test_scheme_gate_allows_local_and_hdfs(self):
        from homelogging_spark.operators.maintenance import (
            _require_rename_atomic,
        )

        _require_rename_atomic("/plain/posix/path", "t")
        _require_rename_atomic("file:///x/y", "t")
        _require_rename_atomic("hdfs://nn:8020/warehouse/idx", "t")

    def test_scheme_gate_rejects_object_stores(self):
        import pytest

        from homelogging_spark.operators.maintenance import (
            _require_rename_atomic,
        )

        for uri in ("s3a://b/k", "s3://b/k", "gs://b/k", "wasbs://c@a/k"):
            with pytest.raises(ValueError, match="non-atomic"):
                _require_rename_atomic(uri, "t")


class TestNightlyCycle:
    """r16 (r15 verdict #5): ONE composed nightly entry — layout cycle +
    ANN index cycle + rollup refresh — returning a single maintenance-
    log frame; any stage ordering yields the identical final state, and
    crash repair holds across the composition."""

    DIM = 8

    def _corpus(self, spark, n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    ((F.col("id") * (i + 3)) % 17).cast("double") + F.lit(0.1)
                    for i in range(self.DIM)
                ]
            ).alias("embedding"),
        )

    def _readings(self, spark, tmp_path, name):
        path = str(tmp_path / name)
        for b in range(6):
            append_readings(_mk_batch(spark, "P", 1, b * 1000, 200), path)
        append_readings(_mk_batch(spark, "Q", 2, 0, 200), path)
        return path

    def _index_kwargs(self):
        return dict(
            target_cell_rows=8, k_min=2, n_iters=1, pq_subspaces=2,
            pq_centroids=4, dim=self.DIM, sample_mod=None,
        )

    def _run(self, spark, readings, index_root, rollup, order):
        from homelogging_spark.operators.maintenance import nightly_cycle

        return nightly_cycle(
            spark,
            readings_path=readings,
            layout_cols=["value"],
            corpus=self._corpus(spark, 64),
            index_root=index_root,
            rollup_path=rollup,
            order=order,
            layout_kwargs=dict(min_files=10, n_files=4),
            index_kwargs=self._index_kwargs(),
        )

    def test_both_orderings_identical_state_and_log(self, spark, tmp_path):
        from homelogging_spark.operators.maintenance import load_index

        states = {}
        for order in (("layout", "index", "rollup"), ("index", "rollup", "layout")):
            tag = "_".join(order)
            readings = self._readings(spark, tmp_path, f"r_{tag}")
            index_root = str(tmp_path / f"idx_{tag}")
            rollup = str(tmp_path / f"roll_{tag}")
            before = _table_fingerprint(spark, readings)
            log = {
                (r.stage, r.action): (r.n, r.detail)
                for r in self._run(spark, readings, index_root, rollup, order).collect()
            }
            assert log[("layout", "recovered")][0] == 0
            assert log[("layout", "rewritten")] == (1, "series=P/date=2024-01-01")
            assert log[("index", "refreshed")][0] == 8  # k
            assert log[("rollup", "refreshed")] == (-1, "full")
            assert _table_fingerprint(spark, readings) == before
            states[tag] = (
                before,
                load_index(spark, index_root)["centroids"].count(),
                spark.read.parquet(rollup).count(),
            )
        assert len(set(states.values())) == 1  # ordering-independent

    def test_second_run_is_noop_and_logged_as_such(self, spark, tmp_path):
        readings = self._readings(spark, tmp_path, "r_idem")
        index_root = str(tmp_path / "idx_idem")
        rollup = str(tmp_path / "roll_idem")
        order = ("layout", "index", "rollup")
        self._run(spark, readings, index_root, rollup, order)
        log2 = {
            (r.stage, r.action): r.n
            for r in self._run(spark, readings, index_root, rollup, order).collect()
        }
        assert log2[("layout", "compacted")] == 0
        assert log2[("layout", "rewritten")] == 0
        assert ("index", "noop") in log2  # occupancy gate: no re-train
        # rollup refresh is idempotent by dynamic-overwrite (same rows)
        assert log2[("rollup", "refreshed")] == -1

    def test_state_leg_relayout_logged_then_noop(self, spark, tmp_path):
        """r20 (r19 verdict #8): the streaming-state relayout leg joins
        the audited maintenance log — first run folds the partitioned
        BM25 state to the legacy layout and logs the key count; the
        second run logs the no-op (the occupancy-gate discipline)."""
        from homelogging_spark.operators.maintenance import nightly_cycle
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state")
        merger = bm25_stats_batch_merger(state, n_partitions=4)
        merger(
            spark.createDataFrame(
                [(1, "grid power"), (2, "power meter")],
                "doc_id long, text string",
            ),
            0,
        )
        spec = dict(
            state_path=state, table="dfreq", key_cols=["term"],
            cnt_col="df", n_partitions=None,
        )
        log = {
            (r.stage, r.action): (r.n, r.detail)
            for r in nightly_cycle(
                spark, state_relayouts=[spec]
            ).collect()
        }
        assert log == {
            ("state", "relayout"): (3, f"{state}:dfreq 4->None"),
        }
        log2 = {
            (r.stage, r.action): r.n
            for r in nightly_cycle(
                spark, state_relayouts=[spec]
            ).collect()
        }
        assert log2 == {("state", "noop"): -1}

    def test_crash_repair_holds_with_index_first(self, spark, tmp_path):
        """A layout crash from a previous run (complete staging + journal
        marker, live partition still old) must be rolled FORWARD by the
        composed cycle even when the index stage runs first — the legs
        touch disjoint roots, so ordering cannot lose the repair."""
        import os as _os
        import shutil as _shutil

        from homelogging_spark.operators.maintenance import (
            JOURNAL_DIR,
            TMP_DIR,
            _flat_name,
        )

        readings = self._readings(spark, tmp_path, "r_crash")
        part = "series=Q/date=2024-01-02"
        flat = _flat_name(part)
        live = _os.path.join(readings, part)
        staged = _os.path.join(readings, TMP_DIR, flat)
        # simulate: staging fully written + marker, crash before swap
        _shutil.copytree(live, staged)
        _os.makedirs(_os.path.join(readings, JOURNAL_DIR), exist_ok=True)
        open(_os.path.join(readings, JOURNAL_DIR, flat), "w").close()
        before = _table_fingerprint(spark, readings)
        log = {
            (r.stage, r.action): (r.n, r.detail)
            for r in self._run(
                spark, readings, str(tmp_path / "idx_crash"),
                str(tmp_path / "roll_crash"), ("index", "layout", "rollup"),
            ).collect()
        }
        assert log[("layout", "recovered")] == (1, part)
        assert _table_fingerprint(spark, readings) == before
        assert not _os.path.exists(_os.path.join(readings, JOURNAL_DIR, flat))

    def test_order_validation_and_partial_configs(self, spark, tmp_path):
        import pytest as _pytest

        from homelogging_spark.operators.maintenance import nightly_cycle

        with _pytest.raises(ValueError, match="order must be distinct"):
            nightly_cycle(spark, order=("layout", "layout"))
        with _pytest.raises(ValueError, match="without a corpus"):
            nightly_cycle(spark, index_root=str(tmp_path / "i"))
        with _pytest.raises(ValueError, match="without readings_path"):
            nightly_cycle(spark, rollup_path=str(tmp_path / "r"))
        # layout-only config: the other legs silently absent
        readings = self._readings(spark, tmp_path, "r_partial")
        log = nightly_cycle(
            spark, readings_path=readings, layout_cols=["value"],
            layout_kwargs=dict(min_files=10, n_files=4),
        ).collect()
        assert {r.stage for r in log} == {"layout"}
