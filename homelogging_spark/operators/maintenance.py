"""Table-maintenance operators for the K1 readings sink: small-file
compaction (SURVEY §7 Phase 4).

Every streaming micro-batch / polling-cycle append (the reference polls
devices every few seconds — ``LoggerService`` cadence) writes at least
one parquet file per touched ``(series, date)`` partition. After a day
of 10-second polls that is ~8 k files per partition; at 100 TB the
resulting file-listing and footer-read overhead dominates scan cost
long before data volume does. The fix is the standard one (what
Delta/Iceberg call OPTIMIZE / rewrite_data_files): periodically rewrite
fragmented partitions into target-sized files.

Scale contract: compaction is **partition-pruned and incremental** — it
lists partition directories (driver-side metadata work, proportional to
partition count, never data), picks only partitions whose file count /
average file size violate the policy, and rewrites exactly those via
dynamic partition overwrite. A day of fresh appends never triggers a
full-history rewrite. Concurrent READERS of an untouched sibling
partition are unaffected; for the partition being rewritten, dynamic
partition overwrite is delete-then-commit — a crash between the two
steps can leave that one partition empty until the next compaction
run, so production deployments pair this with a table format whose
commits are atomic (Delta/Iceberg OPTIMIZE). Rewriting preserves rows
byte-for-byte (same columns, no re-dedup: the K1 sink already deduped
on append)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from homelogging_spark.operators.ingest import _dynamic_partition_overwrite


@dataclass
class PartitionStat:
    """One leaf partition's file layout."""

    partition: str  # e.g. "series=PowerEnergy/date=2024-01-01"
    n_files: int
    total_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def partition_file_stats(spark: SparkSession, path: str) -> list[PartitionStat]:
    """List leaf partitions of a partitioned parquet table with their
    file counts and sizes. Driver-side filesystem metadata only — cost
    is O(partitions + files listed), independent of row counts. Uses the
    Hadoop FileSystem API so the same code addresses HDFS/S3A in a
    cluster (local paths here)."""
    sc = spark.sparkContext
    hadoop = sc._jvm.org.apache.hadoop.fs  # py4j: driver-side metadata calls
    conf = sc._jsc.hadoopConfiguration()
    root = hadoop.Path(path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return []
    stats: list[PartitionStat] = []

    def walk(dir_path, rel: str) -> None:
        files, subdirs = [], []
        for st in fs.listStatus(dir_path):
            name = st.getPath().getName()
            if st.isDirectory():
                subdirs.append((st.getPath(), name))
            elif not name.startswith(("_", ".")):
                files.append(st.getLen())
        if subdirs:
            for p, name in subdirs:
                walk(p, f"{rel}/{name}" if rel else name)
        elif files:
            stats.append(PartitionStat(rel, len(files), int(sum(files))))

    walk(root, "")
    return sorted(stats, key=lambda s: s.partition)


def plan_compaction(
    stats: list[PartitionStat],
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[PartitionStat]:
    """Pick the partitions worth rewriting: more than ``min_files`` files
    AND average file size under half the target. Both conditions — a
    partition of a few right-sized files is left alone no matter how
    old, so repeated compaction converges instead of rewriting forever."""
    return [
        s
        for s in stats
        if s.n_files > min_files and s.avg_bytes < target_file_bytes / 2
    ]


def compact_readings(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[PartitionStat]:
    """Compact fragmented partitions of a K1 readings table in place.

    For each partition chosen by :func:`plan_compaction`, reads ONLY that
    partition (partition-pruned scan), coalesces to
    ``ceil(total_bytes / target_file_bytes)`` files, and overwrites just
    that partition (dynamic partition overwrite — sibling partitions'
    files untouched). Returns the list of partitions rewritten.

    Idempotent: a second run finds every rewritten partition already
    within policy and does nothing."""
    todo = plan_compaction(
        partition_file_stats(spark, path), target_file_bytes, min_files
    )
    if not todo:
        return []
    # One read+write per fragmented partition: the loop is over METADATA
    # (a handful of partitions per maintenance cycle), each iteration a
    # fully distributed pruned scan→write. Batching all partitions into
    # one job would forfeit per-partition coalesce factors.
    part_cols: list[str] | None = None
    compacted: list[PartitionStat] = []
    for s in todo:
        kv = [seg.split("=", 1) for seg in s.partition.split("/")]
        # Directory names carry Hadoop's partition-path escaping: special
        # chars are %XX-encoded and a null value is the sentinel
        # __HIVE_DEFAULT_PARTITION__. Re-attaching the RAW directory string
        # would rewrite those rows with the wrong literal (e.g. "a%20b"
        # instead of "a b", or the sentinel instead of NULL) — unescape,
        # and skip null partitions entirely (left fragmented, never
        # corrupted).
        if any(v == "__HIVE_DEFAULT_PARTITION__" for _, v in kv):
            continue
        kv = [(k, unquote(v)) for k, v in kv]
        if part_cols is None:
            part_cols = [k for k, _ in kv]
        sub = spark.read.parquet(os.path.join(path, s.partition))
        # re-attach partition columns (constant within the partition)
        for k, v in kv:
            sub = sub.withColumn(k, F.lit(v))
        n_out = max(1, -(-s.total_bytes // target_file_bytes))  # ceil
        with _dynamic_partition_overwrite(spark):
            sub.coalesce(n_out).write.mode("overwrite").partitionBy(
                *part_cols
            ).parquet(path)
        compacted.append(s)
    return compacted
