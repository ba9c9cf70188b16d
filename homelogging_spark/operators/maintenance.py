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
average file size violate the policy, and rewrites exactly those. A day
of fresh appends never triggers a full-history rewrite. Rewriting
preserves rows byte-for-byte (same columns, no re-dedup: the K1 sink
already deduped on append).

Crash atomicity (r6): each partition commits via a journaled
write-temp-then-swap protocol — compacted files land in a hidden
``.compact_tmp`` staging dir, a journal marker records the intent, and
the visibility switch is two directory renames (live→trash, tmp→live),
each atomic on POSIX and HDFS. A crash at ANY step is repaired by
:func:`recover_compaction` (run automatically at the start of every
``compact_readings``): marker present ⇒ staging is complete ⇒ roll
forward; staging without a marker ⇒ incomplete write ⇒ roll back
(live was never touched). No crash point loses rows — readers see the
old files or the new files, and the only neither-window is the
sub-millisecond gap between the two renames, which the journal closes
on recovery. (An object-store deployment at 100 TB swaps this
directory protocol for a table format with manifest-atomic commits —
Delta/Iceberg OPTIMIZE — unchanged planning/policy code.)"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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
                # hidden dirs are maintenance internals (.compact_tmp /
                # .compact_trash / .compact_journal), not partitions
                if not name.startswith(("_", ".")):
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


TMP_DIR = ".compact_tmp"
TRASH_DIR = ".compact_trash"
JOURNAL_DIR = ".compact_journal"


def _flat_name(partition: str) -> str:
    """Journal/staging-safe single-segment name for a partition path."""
    from urllib.parse import quote

    return quote(partition, safe="")


def _fs(spark: SparkSession, path: str):
    sc = spark.sparkContext
    hadoop = sc._jvm.org.apache.hadoop.fs
    root = hadoop.Path(path)
    return hadoop, root.getFileSystem(sc._jsc.hadoopConfiguration())


def _rename_or_raise(fs, src, dst, what: str) -> None:
    """Hadoop ``FileSystem.rename`` signals failure by RETURNING FALSE
    (missing parent dir, existing destination, cross-filesystem move) —
    it does not raise. A swap protocol that ignores the boolean can
    follow a silently-failed tmp→live rename with ``delete(trash)`` and
    destroy the only committed generation — the exact failure the
    stage-then-switch discipline exists to prevent. Raise instead,
    leaving the source (and any trash generation) intact for the
    recovery path."""
    if not fs.rename(src, dst):
        raise IOError(
            f"{what}: rename {src} -> {dst} returned false — "
            "source and any prior generation left intact; run the "
            "operation's recovery path after resolving the filesystem "
            "state (missing parent, pre-existing destination, or a "
            "cross-filesystem move are the usual causes)"
        )


# object-store schemes whose directory "rename" is a non-atomic
# copy+delete — a concurrent reader can observe partial or mixed
# generations mid-swap, violating the stage-then-switch contract
_NON_ATOMIC_RENAME_SCHEMES = {
    "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift",
}


def _require_rename_atomic(path: str, what: str) -> None:
    """Refuse to run a rename-swap commit protocol on a filesystem whose
    rename is not atomic (the scheme-validation discipline of
    :func:`_audit_filesystem`). On these stores the right tool is a
    manifest-atomic table/index format (Delta, Iceberg) — failing loudly
    here beats readers silently seeing mixed generations."""
    scheme = urlparse(path).scheme.lower()
    if scheme in _NON_ATOMIC_RENAME_SCHEMES:
        raise ValueError(
            f"{what} commits generations via atomic directory renames, "
            f"but scheme {scheme!r} ({path!r}) implements rename as a "
            "non-atomic copy+delete — concurrent readers could observe "
            "partial or mixed generations. Use a local/HDFS root, or a "
            "manifest-atomic table format for object stores."
        )


def recover_compaction(spark: SparkSession, path: str) -> list[str]:
    """Repair any interrupted compaction commits under ``path``.

    The journal marker is created only AFTER a partition's staging dir is
    fully written, so its presence proves the staged copy is complete:
    roll FORWARD (finish the swap, then clean trash + marker). A staging
    dir without a marker is an incomplete write: roll BACK (delete the
    orphan — the live partition was never touched). Returns the list of
    partitions rolled forward. Safe to run any time; no-op on a clean
    table.

    Subject to the same atomic-rename requirement as the commit path it
    repairs (r15 ADVICE): recovery performs the identical live<->trash/
    staging renames, so running it on an object-store root would expose
    concurrent readers to the same mid-swap mixed generations the
    commit-side guard exists to prevent."""
    _require_rename_atomic(path, "recover_compaction")
    hadoop, fs = _fs(spark, path)
    P = hadoop.Path
    journal = P(os.path.join(path, JOURNAL_DIR))
    tmp_root = P(os.path.join(path, TMP_DIR))
    rolled: list[str] = []
    if fs.exists(journal):
        for st in fs.listStatus(journal):
            flat = st.getPath().getName()
            partition = unquote(flat)
            live = P(os.path.join(path, partition))
            tmp = P(os.path.join(path, TMP_DIR, flat))
            trash = P(os.path.join(path, TRASH_DIR, flat))
            if fs.exists(tmp):
                # staged copy complete — finish the swap
                if fs.exists(live):
                    fs.delete(trash, True)
                    fs.mkdirs(P(os.path.join(path, TRASH_DIR)))
                    _rename_or_raise(fs, live, trash, "recover_compaction")
                _rename_or_raise(fs, tmp, live, "recover_compaction")
                rolled.append(partition)
            elif not fs.exists(live) and fs.exists(trash):
                # crashed inside the rename window with no staging left
                # (cleaned by a concurrent recovery?) — restore the old
                # files rather than lose the partition
                _rename_or_raise(fs, trash, live, "recover_compaction")
                rolled.append(partition)
            fs.delete(trash, True)
            fs.delete(st.getPath(), False)
    if fs.exists(tmp_root):
        for st in fs.listStatus(tmp_root):
            # orphan staging without a marker: incomplete write, roll back
            marker = P(os.path.join(path, JOURNAL_DIR, st.getPath().getName()))
            if not fs.exists(marker):
                fs.delete(st.getPath(), True)
    return rolled


def compact_readings(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[PartitionStat]:
    """Compact fragmented partitions of a K1 readings table in place.

    For each partition chosen by :func:`plan_compaction`, reads ONLY that
    partition (partition-pruned scan), coalesces to
    ``ceil(total_bytes / target_file_bytes)`` files, and commits via the
    journaled write-temp-then-swap protocol (module docstring) so a
    crash at any step never loses the partition. Returns the list of
    partitions rewritten.

    Idempotent: a second run finds every rewritten partition already
    within policy and does nothing (after first repairing any
    interrupted commit via :func:`recover_compaction`)."""
    recover_compaction(spark, path)
    todo = plan_compaction(
        partition_file_stats(spark, path), target_file_bytes, min_files
    )

    def stage(sub, s: PartitionStat):
        n_out = max(1, -(-s.total_bytes // target_file_bytes))  # ceil
        return sub.coalesce(n_out)

    return _commit_partition_rewrites(spark, path, todo, stage)


def _commit_partition_rewrites(
    spark: SparkSession, path: str, todo: list[PartitionStat], stage
) -> list[PartitionStat]:
    """Shared journaled per-partition rewrite commit (module docstring
    protocol) used by :func:`compact_readings` and
    :func:`incremental_layout_rewrite`. ``stage(sub_df, stat)`` returns
    the transformed frame to write for one partition; everything else —
    staging dir, journal marker, the two atomic renames, cleanup — is
    identical across rewrite kinds, so crash recovery
    (:func:`recover_compaction`) repairs any of them the same way."""
    if not todo:
        return []
    _require_rename_atomic(path, "compaction")
    hadoop, fs = _fs(spark, path)
    P = hadoop.Path
    # rename() needs existing destination parents (HDFS semantics)
    fs.mkdirs(P(os.path.join(path, JOURNAL_DIR)))
    fs.mkdirs(P(os.path.join(path, TRASH_DIR)))
    # One read+write per picked partition: the loop is over METADATA
    # (a handful of partitions per maintenance cycle), each iteration a
    # fully distributed pruned scan→write. Batching all partitions into
    # one job would forfeit per-partition layout factors.
    done: list[PartitionStat] = []
    for s in todo:
        kv = [seg.split("=", 1) for seg in s.partition.split("/")]
        # Null partitions carry the __HIVE_DEFAULT_PARTITION__ sentinel in
        # the directory name; skip them entirely (left fragmented, never
        # corrupted). Other special chars are %XX-escaped in the dir name
        # only — the swap moves whole directories, so the data files and
        # the partition value they imply are untouched by escaping.
        if any(v == "__HIVE_DEFAULT_PARTITION__" for _, v in kv):
            continue
        flat = _flat_name(s.partition)
        live = os.path.join(path, s.partition)
        tmp = os.path.join(path, TMP_DIR, flat)
        trash = os.path.join(path, TRASH_DIR, flat)
        marker = os.path.join(path, JOURNAL_DIR, flat)
        # 1. stage: partition-pruned scan -> rewritten files in the
        #    hidden staging dir (data columns only, same layout as the
        #    live partition dir; readers never list hidden dirs)
        sub = spark.read.parquet(live)
        fs.delete(P(tmp), True)
        stage(sub, s).write.mode("overwrite").parquet(tmp)
        # 2. journal the intent — created only after staging is complete
        fs.createNewFile(P(marker))
        # 3+4. the swap: two atomic renames (boolean-checked — a false
        # return here must never be followed by the trash delete)
        fs.delete(P(trash), True)
        _rename_or_raise(fs, P(live), P(trash), "compaction commit")
        _rename_or_raise(fs, P(tmp), P(live), "compaction commit")
        # 5. clear the journal, then the old files
        fs.delete(P(marker), False)
        fs.delete(P(trash), True)
        done.append(s)
    return done


def cluster_rewrite(
    df,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
    partition_cols: Sequence[str] = (),
) -> None:
    """Data-skipping layout rewrite: range-cluster ``df`` on
    ``cluster_cols`` and sort within each output file, so every parquet
    file (and row group inside it) covers a NARROW min/max band of the
    cluster key. Parquet writes per-row-group min/max statistics in the
    footer; a point or range predicate on the cluster key then skips
    every file/row group whose band cannot match — at 100 TB that is
    the difference between scanning a full partition and touching a few
    row groups, before a single data page is read (the same lever
    Delta/Iceberg expose as OPTIMIZE ZORDER / sort-order rewrite, in
    its exact single-key form).

    ``repartitionByRange`` samples the key distribution (non-uniform
    keys still give balanced files), ``sortWithinPartitions`` orders
    rows inside each file so row-group bands nest inside file bands.
    One range shuffle; the write is otherwise a plain parquet write and
    composes with hive-style ``partition_cols``.

    Measured effect is asserted by ``TestClusterRewrite`` via footer
    statistics: after clustering, the fraction of row groups whose
    [min, max] band admits a point predicate drops from ~100% to
    ~1/n_files.
    """
    out = df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
    out = out.sortWithinPartitions(*[F.col(c) for c in cluster_cols])
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def _audit_filesystem(path: str):
    """Resolve ``(pyarrow filesystem, root path)`` for the footer
    audits, honoring the table URI's scheme — the rewrite/commit path
    goes through the Hadoop FS API (:func:`_fs`), and the audits must
    address the SAME store, or a remote table's audit silently matches
    nothing and the maintenance cycle becomes a no-op (r13 ADVICE).
    Local paths and ``file://`` map to the local filesystem; ``s3a://``
    maps to pyarrow's S3 (same store, different scheme name); any
    scheme pyarrow cannot resolve raises instead of returning empty."""
    from pyarrow import fs as pafs

    if "://" not in path:
        return pafs.LocalFileSystem(), path
    uri = path.replace("s3a://", "s3://", 1) if path.startswith("s3a://") else path
    try:
        return pafs.FileSystem.from_uri(uri)
    except Exception as exc:
        raise ValueError(
            f"footer audit cannot address filesystem scheme of {path!r} "
            f"({exc}); the layout audit must read the same store the "
            f"rewrite commits to — audit from a host with pyarrow "
            f"support for this scheme, or pass a local/file/s3 path"
        ) from exc


def _audit_footers(path: str):
    """Yield ``(file_path, pyarrow.parquet.FileMetaData)`` for every
    visible parquet data file under ``path`` (recursive), through the
    URI-resolved filesystem. Hidden segments (``.compact_tmp`` staging,
    ``_SUCCESS`` markers) are skipped — the same visibility rule the
    glob form applied implicitly and ``partition_file_stats`` applies
    explicitly."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    filesystem, root = _audit_filesystem(path)
    infos = filesystem.get_file_info(
        pafs.FileSelector(root, recursive=True, allow_not_found=True)
    )
    for info in sorted(infos, key=lambda i: i.path):
        if info.type != pafs.FileType.File or not info.path.endswith(".parquet"):
            continue
        rel = info.path[len(root) :]
        if any(seg.startswith((".", "_")) for seg in rel.split("/") if seg):
            continue
        with filesystem.open_input_file(info.path) as f:
            yield info.path, pq.ParquetFile(f).metadata


def _column_index(md, col: str, file_path: str) -> int:
    """Physical column index of ``col`` in one file's footer, with a
    descriptive error when absent — e.g. the caller passed a hive
    PARTITION column (never stored in data files) or the file predates
    a schema evolution."""
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if col not in idx:
        raise ValueError(
            f"audit column {col!r} is not in the schema of {file_path} "
            f"(has: {sorted(idx)}); hive partition columns live in "
            f"directory names, not data files — audit a data column"
        )
    return idx[col]


def rowgroups_admitting(path: str, col: str, value, hi=None) -> tuple[int, int]:
    """Footer-statistics audit: (admitting, total) parquet row groups
    under ``path`` whose [min, max] band for ``col`` admits the point
    predicate ``col = value`` — or, with ``hi``, overlaps the range
    predicate ``value <= col <= hi`` (the dashboard time-slice shape).
    These are exactly the row groups a stats-pruning reader must read.
    Driver-side metadata work only (footers, never data pages); used by
    tests and the SCALE harness to measure what :func:`cluster_rewrite`
    / :func:`zorder_rewrite` buy."""
    lo, hi = value, value if hi is None else hi
    if hi < lo:
        raise ValueError(f"empty range: [{lo}, {hi}]")
    admitting = total = 0
    for f, md in _audit_footers(path):
        idx = _column_index(md, col, f)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                admitting += 1  # no stats -> reader must read it
            elif st.min <= hi and lo <= st.max:  # band overlaps [lo, hi]
                admitting += 1
    return admitting, total


def _quantile_bucket(col: Column, boundaries: list[float]) -> Column:
    """Bucket id in [0, len(boundaries)] by counting boundaries <= value
    — a pure map-side fold over a literal array (no shuffle, no UDF).
    NULLs land in bucket 0 (they sort first, clustering together)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    d = col.cast("double")
    n = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(d >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.when(d.isNull(), F.lit(0)).otherwise(n)


def zorder_rewrite(
    df,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 4,
    partition_cols: Sequence[str] = (),
) -> None:
    """Multi-key data-skipping layout: the Z-ORDER upgrade of
    :func:`cluster_rewrite`. A single-key sort makes predicates on THAT
    key prunable but leaves every other column scattered; Z-ordering
    interleaves the bits of each column's quantile-bucket rank into one
    curve value, so a range/point predicate on ANY of the ordered
    columns maps to a bounded set of curve segments — every file/row
    group covers a narrow band of EVERY ordered column (Morton curve,
    the construction behind Delta/Iceberg OPTIMIZE ZORDER).

    Mechanics: per column, ``2^bits`` quantile boundaries come from one
    driver-side ``approxQuantile`` probe (metadata-sized — the
    config-table precedent; quantile buckets, not min/max width
    buckets, so skewed columns still spread evenly across the curve);
    bucketing and bit interleaving are pure map-side folds; then ONE
    range shuffle on the curve value + sort-within-file, identical
    write shape to ``cluster_rewrite``. Cost is the same one shuffle —
    the multi-key benefit is free at write time.

    The trade vs single-key: each column's band per file widens from
    ~1/n_files to ~(1/n_files)^(1/k) of its range for k ordered
    columns — Z-order helps every column somewhat rather than one
    column maximally (measured in SCALE.md r11)."""
    _validate_zorder(cols, bits)
    out = (
        df.withColumn("_z", _zorder_column(df, cols, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def partition_band_overlap(path: str, col: str) -> tuple[int, int]:
    """Footer-statistics LAYOUT audit for one partition directory:
    ``(overlapping, separable)`` pairs of row-group [min, max] bands for
    ``col`` across every parquet file under ``path``.

    A fragmented layout (micro-batch appends: every file spans the whole
    key range) has overlap fraction ~1.0; a clustered layout has only
    adjacent-boundary overlaps, ~2/n_rowgroups. Pairs where both bands
    are the SAME single point (duplicate-heavy keys: [v,v] vs [v,v])
    are excluded from both counts — no ordering can separate them, so
    counting them would make a perfectly-sorted skewed partition look
    forever-rewritable (the convergence hazard a plain admitting-
    fraction probe has). Row groups without stats are skipped for the
    same reason. Driver-side metadata only (footers, never data pages),
    read through the URI-resolved filesystem so remote tables audit the
    same store the rewrite commits to; O(rowgroups^2) per partition
    over in-memory tuples — row groups per partition are bounded by the
    compaction policy."""
    bands: list[tuple] = []
    for f, md in _audit_footers(path):
        idx = _column_index(md, col, f)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.min is not None:
                bands.append((st.min, st.max))
    overlapping = separable = 0
    for i in range(len(bands)):
        lo_i, hi_i = bands[i]
        for j in range(i + 1, len(bands)):
            lo_j, hi_j = bands[j]
            if lo_i == hi_i == lo_j == hi_j:
                continue  # identical point bands: unseparable
            separable += 1
            if lo_i <= hi_j and lo_j <= hi_i:
                overlapping += 1
    return overlapping, separable


def _hive_partition_keys(stats: list[PartitionStat]) -> set[str]:
    """Hive partition column names implied by the partition directory
    names (``k=v`` segments) of a listed table."""
    return {
        seg.split("=", 1)[0]
        for s in stats
        for seg in s.partition.split("/")
        if "=" in seg
    }


def plan_layout_rewrite(
    spark: SparkSession,
    path: str,
    audit_col: str,
    max_overlap_frac: float = 0.75,
    stats: list[PartitionStat] | None = None,
) -> list[PartitionStat]:
    """Pick the partitions whose row-group bands for ``audit_col``
    overlap more than ``max_overlap_frac`` of their separable pairs —
    the partitions where footer pruning on the layout key is broken
    (fresh micro-batch appends) and a layout rewrite will fix it.
    Driver-side metadata only.

    The default threshold separates the two regimes with margin on both
    sides: append-fragmented partitions sit at ~1.0 (every file spans
    the key range), post-rewrite layouts sit at ~2/n_files for the
    single-key sort and (measured) ~0.1-0.45 for the Z-order curve's
    primary column."""
    if not 0 < max_overlap_frac < 1:
        raise ValueError(f"max_overlap_frac in (0, 1), got {max_overlap_frac}")
    if stats is None:
        stats = [
            s
            for s in partition_file_stats(spark, path)
            if "__HIVE_DEFAULT_PARTITION__" not in s.partition
        ]
    if audit_col in _hive_partition_keys(stats):
        raise ValueError(
            f"audit column {audit_col!r} is a hive PARTITION column of "
            f"{path} — partition values live in directory names, not "
            f"data-file footers, so no layout rewrite can change their "
            f"pruning; audit (and lay out on) a data column"
        )
    # footer reads are independent IO — audit partitions concurrently
    # (bounded pool; at 100 TB partition counts the serial loop is the
    # planner's dominant cost, and pyarrow releases the GIL on reads)
    from concurrent.futures import ThreadPoolExecutor

    def audit(s: PartitionStat) -> tuple[PartitionStat, int, int]:
        ov, sep = partition_band_overlap(
            os.path.join(path, s.partition), audit_col
        )
        return s, ov, sep

    with ThreadPoolExecutor(max_workers=16) as pool:
        audited = list(pool.map(audit, stats))
    return [s for s, ov, sep in audited if sep and ov > sep * max_overlap_frac]


def incremental_layout_rewrite(
    spark: SparkSession,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 4,
    max_overlap_frac: float = 0.75,
) -> list[str]:
    """Partition-scoped incremental form of :func:`cluster_rewrite` /
    :func:`zorder_rewrite` for a hive-partitioned table: audit every
    leaf partition's parquet footers (:func:`plan_layout_rewrite`),
    rewrite ONLY the partitions whose layout fails the overlap
    threshold, and commit each through the same journaled
    write-temp-then-swap protocol as :func:`compact_readings` — so a
    crash at any step is repaired by the shared
    :func:`recover_compaction` and untouched partitions stay
    byte-identical. Single column → range-cluster; multiple columns →
    Z-order with per-partition quantile boundaries (a pruned scan of
    just that partition — local boundaries give a tighter curve than
    global ones).

    Why this exists: at 100 TB a maintenance cycle cannot re-shuffle
    the whole table the way ``zorder_rewrite`` does — a day of appends
    fragments only that day's partitions, and the audit finds exactly
    those from metadata (footers), never data. Convergence is by
    construction: a rewritten partition's bands overlap ~2/n_files
    (adjacent boundaries only), so with ``n_files > 2/max_overlap_frac``
    the next run's audit skips it; duplicate-skewed and single-row-group
    partitions can't oscillate because unseparable pairs are excluded
    from the audit (``partition_band_overlap``). The audit column is
    the rewrite's primary sort direction: ``cols[0]`` for the
    single-key sort, ``cols[-1]`` for the Morton curve (top interleaved
    bit — see :func:`_zorder_column`).

    Returns the rewritten partition names. Reference parity: the
    nightly-maintenance analogue of ``Deploy/`` cron scripts, which is
    incremental by nature (re-derives only what changed)."""
    if len(cols) > 1:
        _validate_zorder(cols, bits)
    elif not cols:
        raise ValueError("need at least one layout column")
    if n_files * max_overlap_frac < 2:
        raise ValueError(
            f"n_files={n_files} cannot converge below "
            f"max_overlap_frac={max_overlap_frac}: a clustered partition "
            f"keeps ~2/n_files adjacent overlaps; need n_files >= "
            f"{2 / max_overlap_frac:.0f}"
        )
    recover_compaction(spark, path)
    stats = [
        s
        for s in partition_file_stats(spark, path)
        if "__HIVE_DEFAULT_PARTITION__" not in s.partition
    ]
    pkeys = _hive_partition_keys(stats)
    bad = [c for c in cols if c in pkeys]
    if bad:
        raise ValueError(
            f"layout columns {bad} are hive PARTITION columns of {path} — "
            f"they are constant within each rewritten partition and absent "
            f"from its data files; cluster/Z-order on data columns only"
        )
    audit_col = cols[-1] if len(cols) > 1 else cols[0]
    todo = plan_layout_rewrite(spark, path, audit_col, max_overlap_frac, stats=stats)

    def stage(sub, s: PartitionStat):
        if len(cols) > 1:
            # Snap file boundaries to curve buckets: range-partition on
            # the top log2(n_files) curve bits FIRST (few distinct
            # values, so sampled boundaries land on bucket edges), full
            # curve value second (balance within a bucket). Raw-z
            # sampling leaves every file straddling two octants, which
            # widens each column's band enough to hover near the audit
            # threshold — measured in SCALE.md r13 (quantile buckets
            # make curve values ~uniform, so top-bit buckets are
            # near-equal sized and files stay balanced).
            shift = max(0, bits * len(cols) - max(1, (n_files - 1).bit_length()))
            return (
                sub.withColumn("_z", _zorder_column(sub, cols, bits))
                .withColumn("_zb", F.shiftright(F.col("_z"), shift))
                .repartitionByRange(n_files, F.col("_zb"), F.col("_z"))
                .sortWithinPartitions("_z")
                .drop("_z", "_zb")
            )
        key = [F.col(c) for c in cols]
        return sub.repartitionByRange(n_files, *key).sortWithinPartitions(*key)

    return [
        s.partition for s in _commit_partition_rewrites(spark, path, todo, stage)
    ]


def maintenance_cycle(
    spark: SparkSession,
    path: str,
    layout_cols: Sequence[str] = (),
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
    n_files: int = 8,
    bits: int = 4,
    max_overlap_frac: float = 0.75,
) -> dict:
    """One nightly-maintenance call for a K1 readings table — the
    engine's analogue of the reference's cron cycle (``Deploy/*.sh``):
    crash recovery, small-file compaction, then the partition-scoped
    layout rewrite (when ``layout_cols`` is given). All three steps are
    idempotent and metadata-driven, so the cycle is safe to run on any
    schedule and converges to a stable layout.

    Ordering: compaction FIRST. It merges the day's append files, which
    is safe for the layout audit because :func:`plan_layout_rewrite`
    works at ROW-GROUP granularity — a large compacted file still
    exposes its per-row-group bands, while a partition small enough to
    compact into a single row group has nothing footer-pruning could
    skip anyway (the audit's unseparable-skip leaves it alone, so the
    cycle never ping-pongs between coalescing and re-sorting it).

    Returns ``{"recovered": [...], "compacted": [...],
    "rewritten": [...]}`` partition lists — emit them to the
    maintenance log ("no silent maintenance", the cap-guard
    observability rule applied here)."""
    recovered = recover_compaction(spark, path)
    compacted = compact_readings(spark, path, target_file_bytes, min_files)
    rewritten: list[str] = []
    if layout_cols:
        rewritten = incremental_layout_rewrite(
            spark,
            path,
            layout_cols,
            n_files=n_files,
            bits=bits,
            max_overlap_frac=max_overlap_frac,
        )
    return {
        "recovered": recovered,
        "compacted": [s.partition for s in compacted],
        "rewritten": rewritten,
    }


def _validate_zorder(cols: Sequence[str], bits: int) -> None:
    if not 1 <= len(cols) <= 4:
        raise ValueError(f"zorder on 1-4 columns, got {len(cols)}")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if bits * len(cols) > 63:
        # the top interleaved bit must stay below the bigint sign bit:
        # at shift 63 the highest-quantile curve values go negative and
        # repartitionByRange orders them FIRST — a silent layout inversion
        raise ValueError(
            f"bits*len(cols) must be <= 63 to fit a signed bigint curve, "
            f"got {bits}*{len(cols)} = {bits * len(cols)}"
        )


def _zorder_column(df, cols: Sequence[str], bits: int) -> Column:
    """The Morton curve value for ``df`` over ``cols`` (docstring of
    :func:`zorder_rewrite`). Runs ONE driver ``approxQuantile`` action
    for ALL columns (one input scan, not k) to get the per-column bucket
    boundaries; the returned expression is then a pure map-side fold.
    Bit layout: column j's bit i lands at shift ``i*len(cols) + j`` —
    the HIGHEST interleaved bit belongs to ``cols[-1]``, making it the
    curve's primary sort direction (relied on by
    :func:`incremental_layout_rewrite`'s audit column choice)."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    all_bounds = df.approxQuantile(list(cols), probs, 0.01)
    buckets = [
        _quantile_bucket(F.col(c), bounds)
        for c, bounds in zip(cols, all_bounds)
    ]
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, i * len(buckets) + j).cast("bigint")
            )
    return z


# --- embedding-index maintenance (nightly cycle, r14) -------------------------

INDEX_ARTIFACTS = (
    "centroids", "cells", "codes", "codebook", "sq8_bounds", "sq8_codes",
)

# the OPQ rotated-PQ tier (r17, opt-in via index_cycle(opq_seed=...)):
# the rotation's ±1 diagonal frozen as data, plus the codebook/codes
# trained on hd_rotate'd vectors — same generation, same swap
OPQ_ARTIFACTS = ("opq_signs", "opq_codebook", "opq_codes")

# r19 (r18 verdict #8): generations built with opq_impl='learned'
# commit the trained rotation MATRIX as data ((i, j, val) rows — the
# opq_signs discipline applied to a dim x dim artifact) instead of the
# structured ±1 diagonal; serving derives the rotation from the
# artifact and asserts the config version in opq_meta re-derives it.
OPQ_ROTATION = "opq_rotation"

# r18 (r17 verdict #2): one-row provenance artifact written with the OPQ
# frames — (opq_impl, opq_seed, dim). The 'expr'/'fwht' rotation impls
# differ at fp-rounding level, so a generation's codes are only
# recompute-consistent under the impl that built them; the docstring
# discipline "per generation pick one impl and keep it" is now a row in
# the generation, asserted by index_cycle (impl change refused unless
# forced) and opq_search (seed→signs derivation verified). Kept out of
# OPQ_ARTIFACTS so pre-r18 generations (tier present, no meta) still
# load; they backfill provenance on their next rebuild.
OPQ_META = "opq_meta"

# r21 (r20 verdict #1): per-HANDLE memo keys for the COLLECTED serving
# artifacts (see opq_search / _generation_rotation) — the memo caches
# the Spark collect() jobs (signs/rotation rows + the opq_meta row),
# NEVER the verification outcome: the pure-Python provenance
# re-derivation comparison runs on EVERY serve, so a generation whose
# meta no longer re-derives the committed artifact is refused even
# from a warm handle. A fresh load_index() re-collects as before.
_COLLECTED_SIGNS = "__collected_signs"
_COLLECTED_ROTATION = "__collected_rotation"


def load_index(spark: SparkSession, index_root: str) -> dict:
    """Read the four IVF-PQ index artifacts a :func:`index_cycle` run
    maintains under ``index_root``: ``centroids`` (vec_id, embedding),
    ``cells`` (vec_id, centroid_id), ``codes`` (vec_id, code_*,
    recon_mse), ``codebook`` (subspace, cid, cemb) — exactly the inputs
    ``similarity.ivf_pq_topk`` serves from — plus (r15) the SQ8 pair
    ``sq8_bounds`` (one row: mins/maxs) and ``sq8_codes`` (vec_id,
    codes, recon_mse), the inputs ``similarity.sq8_topk(bounds=...)``
    serves from. One cycle maintains BOTH compression tiers, so a
    serving stack can A/B SQ8 against IVF-PQ from the same committed
    generation.

    r17: when the generation was built with ``opq_seed`` set, the OPQ
    tier (``opq_signs`` (i, sign), ``opq_codebook``, ``opq_codes`` —
    see :func:`opq_search`) loads under its artifact names too; absent
    otherwise, so pre-OPQ generations keep loading unchanged.

    r18: the ``opq_meta`` provenance row (opq_impl, opq_seed, dim)
    loads alongside the tier when present — absent only on pre-r18
    generations, which backfill it at their next rebuild."""
    idx = {
        a: spark.read.parquet(os.path.join(index_root, a))
        for a in INDEX_ARTIFACTS
    }
    hadoop, fs = _fs(spark, index_root)
    if fs.exists(hadoop.Path(os.path.join(index_root, OPQ_ARTIFACTS[0]))):
        for a in OPQ_ARTIFACTS:
            idx[a] = spark.read.parquet(os.path.join(index_root, a))
    elif fs.exists(hadoop.Path(os.path.join(index_root, OPQ_ROTATION))):
        # r19 learned-rotation tier: the matrix artifact replaces the
        # signs diagonal; codebook/codes load under the same names
        for a in (OPQ_ROTATION, "opq_codebook", "opq_codes"):
            idx[a] = spark.read.parquet(os.path.join(index_root, a))
    if "opq_codebook" in idx:
        meta_path = os.path.join(index_root, OPQ_META)
        if fs.exists(hadoop.Path(meta_path)):
            idx[OPQ_META] = spark.read.parquet(meta_path)
    return idx


def index_cycle(
    spark: SparkSession,
    corpus,
    index_root: str,
    target_cell_rows: int = 256,
    growth_factor: float = 2.0,
    k_min: int = 8,
    k_max: int = 1 << 16,
    n_iters: int = 2,
    pq_subspaces: int = 4,
    pq_centroids: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_mod: int | None = 16,
    exact_fold: bool = True,
    opq_seed: str | None = None,
    opq_impl: str = "expr",
    allow_opq_impl_change: bool = False,
) -> dict:
    """One nightly INDEX-maintenance call for an embedding corpus — the
    ANN-tier sibling of :func:`maintenance_cycle` (the reference's
    ``Deploy/`` cron analogue, applied to the index artifacts instead of
    the readings layout). Composes what SCALE.md r13 described in prose:
    ``similarity.refresh_centroids``' occupancy-tracking K (every
    cell-scoped consumer's cost is a function of cell occupancy, not
    corpus size — the measured 2.4x `semantic_dedup` recovery at 10x
    growth) plus stage-then-switch re-materialization of ALL dependent
    artifacts (``ivf_assign`` cells, PQ codebook, ``pq_codes``), so a
    refreshed quantizer can never serve against stale cell assignments.

    Occupancy trigger: ``target K = clamp(ceil(N / target_cell_rows),
    k_min, k_max)`` (one corpus count — the cheap check). The cycle
    rebuilds when the live quantizer's K has drifted ``growth_factor``x
    from the target in EITHER direction (growth or mass deletion), or
    when no index exists; otherwise it is a deterministic no-op that
    touches nothing. Rebuild cost is bounded by the trainers' id-mod
    sampling plus one assignment/encoding scan of the corpus — SCALE.md
    r13 measured retrain paying for itself within a single
    `semantic_dedup` run at 10x growth.

    Commit protocol: every artifact generation is written COMPLETELY
    into ``<index_root>.__tmp`` before the live directory is touched,
    then two atomic renames swap generations (the
    ``start_kmv_rollup_stream`` state-swap discipline; a crash between
    the renames is repaired on the next cycle by restoring the trash,
    and both renames are boolean-checked — Hadoop signals rename
    failure by returning false, and a silent tmp→live failure followed
    by the trash delete would destroy the only committed generation).
    Readers therefore always see one complete, mutually-consistent
    generation — never a new quantizer with old cells. Rename atomicity
    holds on local/HDFS only, so object-store roots are REFUSED up
    front (``_require_rename_atomic`` — on s3a/gs/... a directory
    rename is a non-atomic copy+delete and concurrent readers could see
    mixed generations; use a manifest-atomic index format there).

    r17 (``opq_seed``): when set, the SAME generation additionally
    materializes the OPQ rotated-PQ tier — ``opq_signs`` (the
    structured rotation's ±1 diagonal as (i, sign) rows: config frozen
    AS DATA so serving derives the rotation from the committed
    artifact, never from a seed that may have changed), plus
    ``opq_codebook``/``opq_codes`` trained on the
    ``similarity.hd_rotate``'d corpus. A generation that should carry
    the tier but doesn't (opq enabled on an existing pre-OPQ index)
    forces a rebuild even when occupancy is in band — otherwise the
    no-op path would never create it. Serving:
    :func:`opq_search` (rotation applied query-side only — queries are
    dim-sized; the corpus is read as codes). ``opq_impl``: 'expr' (the
    oracle-replicable O(dim²) column expression) or 'fwht' (the
    O(d log d) Arrow-batch butterfly, ``similarity.hd_rotate_fwht`` —
    the production-dim encode dial; outputs differ at fp-rounding
    level, so keep one impl per generation).

    r18 (r17 verdict #2 + ADVICE): the one-impl-per-generation
    discipline is ENFORCED from persisted provenance, not convention.
    Each OPQ generation carries a one-row ``opq_meta`` artifact
    (opq_impl, opq_seed, dim); on a live OPQ index the cycle compares
    the request against it BEFORE the occupancy no-op: a changed
    ``opq_seed`` is treated like a missing tier (rebuild — the stored
    codes would mismatch the requested rotation), while a changed
    ``opq_impl`` is REFUSED with a pointed error unless
    ``allow_opq_impl_change=True`` (which forces a full re-encode
    under the new impl — never a silent impl switch, never mixed-impl
    codes). Pre-r18 generations without the meta row fall back to
    comparing the committed ``opq_signs`` artifact against
    ``hd_signs(dim, opq_seed)`` (seed drift still rebuilds; impl drift
    is undetectable until the next rebuild backfills the meta).

    Returns ``{"refreshed": bool, "k": served K, "target_k": K the
    count demands, "n_vectors": N, "opq": tier maintained?}`` — emit
    it to the maintenance log ("no silent maintenance")."""
    from homelogging_spark.operators import similarity

    if target_cell_rows < 1:
        raise ValueError(f"target_cell_rows must be >= 1, got {target_cell_rows}")
    if growth_factor <= 1:
        raise ValueError(f"growth_factor must be > 1, got {growth_factor}")
    if opq_impl not in ("expr", "fwht", "learned"):
        # validated up front: the Lloyd-chain training below is eager,
        # so a late raise would come minutes into a rebuild
        raise ValueError(
            f"opq_impl must be 'expr', 'fwht' or 'learned', got {opq_impl!r}"
        )
    learned_rotation = None
    if opq_impl == "learned" and opq_seed is not None:
        # r19 (r18 verdict #8): the learned tier's "seed" is the frozen
        # rotation CONFIG version ("v1" -> opq_rotations v1) — validated
        # and resolved up front so an unknown version never costs a
        # training pass, and so the same opq_seed drift machinery below
        # covers rotation-version changes unmodified
        from homelogging_spark.operators.opq_rotations import rotation_for

        if not (opq_seed.startswith("v") and opq_seed[1:].isdigit()):
            raise ValueError(
                "opq_impl='learned' takes opq_seed='v<version>' naming a "
                f"frozen opq_rotations config version, got {opq_seed!r}"
            )
        learned_rotation = rotation_for(int(opq_seed[1:]))
        if len(learned_rotation) != dim:
            raise ValueError(
                f"opq_rotations {opq_seed} is "
                f"{len(learned_rotation)}-dimensional but dim={dim} was "
                "requested"
            )
    _require_rename_atomic(index_root, "index_cycle")
    hadoop, fs = _fs(spark, index_root)
    P = hadoop.Path
    tmp, trash = index_root + ".__tmp", index_root + ".__trash"
    if not fs.exists(P(index_root)) and fs.exists(P(trash)):
        # crash landed between the two swap renames: the trash IS the
        # last committed generation — restore it before deciding
        _rename_or_raise(fs, P(trash), P(index_root), "index_cycle repair")
    n = corpus.count()
    target_k = int(min(k_max, max(k_min, -(-n // target_cell_rows))))
    current_k = None
    cent_path = os.path.join(index_root, "centroids")
    if fs.exists(P(cent_path)):
        current_k = spark.read.parquet(cent_path).count()
    opq_live = fs.exists(
        P(os.path.join(index_root, OPQ_ARTIFACTS[0]))
    ) or fs.exists(P(os.path.join(index_root, OPQ_ROTATION)))
    opq_missing = opq_seed is not None and not opq_live
    if opq_seed is not None and opq_live:
        # r18: validate the request against the committed generation's
        # provenance BEFORE the occupancy no-op — a seed change must
        # rebuild (the stored codes were encoded under a different
        # rotation), an impl change must never happen silently.
        meta_path = os.path.join(index_root, OPQ_META)
        if fs.exists(P(meta_path)):
            meta = spark.read.parquet(meta_path).collect()[0]
            if meta.opq_impl != opq_impl and not allow_opq_impl_change:
                raise ValueError(
                    f"index generation at {index_root} was built with "
                    f"opq_impl={meta.opq_impl!r} but {opq_impl!r} was "
                    "requested; the two rotation impls differ at "
                    "fp-rounding level, so codes must never mix. Pass "
                    "allow_opq_impl_change=True to force a full "
                    "re-encode under the new impl."
                )
            if meta.opq_seed != opq_seed or meta.opq_impl != opq_impl:
                opq_missing = True  # provenance drift: rebuild the tier
        elif fs.exists(P(os.path.join(index_root, "opq_signs"))):
            # pre-r18 generation (tier present, no meta): the signs
            # artifact is the only provenance — seed drift rebuilds,
            # impl drift is undetectable until the rebuild records it
            stored_signs = [
                r.sign
                for r in spark.read.parquet(
                    os.path.join(index_root, "opq_signs")
                )
                .orderBy("i")
                .collect()
            ]
            if stored_signs != similarity.hd_signs(dim, opq_seed):
                opq_missing = True
        else:
            # rotation artifact without a meta row: torn/hand-edited
            # (learned generations always commit meta) — rebuild
            opq_missing = True
    if (
        current_k
        and not opq_missing
        and max(target_k, current_k) < growth_factor * min(target_k, current_k)
    ):
        return {
            "refreshed": False,
            "k": int(current_k),
            "target_k": target_k,
            "n_vectors": int(n),
            "opq": bool(opq_live),
        }

    vecs = corpus.select(F.col(id_col), F.col(emb_col))
    centroids = similarity.kmeans_lite_centroids(
        vecs,
        n_centroids=target_k,
        n_iters=n_iters,
        id_col=id_col,
        emb_col=emb_col,
        dim=dim,
        sample_mod=sample_mod,
        exact_fold=exact_fold,
    )
    cells = similarity.ivf_assign(vecs, centroids, 1, id_col, emb_col).select(
        F.col(id_col), "centroid_id"
    )
    codebook = similarity.pq_codebook(
        vecs, pq_subspaces, pq_centroids, n_iters, dim, id_col, emb_col, sample_mod
    )
    codes = similarity.pq_codes(
        vecs, pq_subspaces, pq_centroids, n_iters, dim, id_col, emb_col,
        sample_mod, codebook=codebook,
    )
    sq8_bounds = similarity.sq8_bounds(vecs, id_col, emb_col)
    sq8_codes = similarity.sq8_codes(
        vecs, bounds=sq8_bounds, id_col=id_col, emb_col=emb_col
    )
    frames = [
        ("centroids", centroids),
        ("cells", cells),
        ("codes", codes),
        ("codebook", codebook),
        ("sq8_bounds", sq8_bounds),
        ("sq8_codes", sq8_codes),
    ]
    if opq_seed is not None:
        if opq_impl == "learned":
            # r19: the frozen learned rotation (resolved up front); the
            # matrix commits as data so serving never depends on the
            # config module agreeing with the generation. r20: applied
            # via the Arrow-batch bit-exact twin of the
            # oracle-replayable expression (same committed codes).
            rot_of = lambda frame: similarity.rotate_by_matrix_rows(  # noqa: E731
                frame, learned_rotation, id_col=id_col, emb_col=emb_col
            )
            rotation_df = spark.createDataFrame(
                [
                    (i, j, float(v))
                    for i, row in enumerate(learned_rotation)
                    for j, v in enumerate(row)
                ],
                "i int, j int, val double",
            )
            rot_frame = (OPQ_ROTATION, rotation_df)
        elif opq_impl == "fwht":
            signs = similarity.hd_signs(dim, opq_seed)
            rot_of = lambda frame: similarity.hd_rotate_fwht(  # noqa: E731
                frame, dim, signs=signs, id_col=id_col, emb_col=emb_col
            )
            rot_frame = (
                "opq_signs",
                spark.createDataFrame(
                    list(enumerate(signs)), "i int, sign double"
                ),
            )
        else:
            signs = similarity.hd_signs(dim, opq_seed)
            # r20: Arrow-batch bit-exact twin of the hd_rotate
            # expression — generations stay 'expr'-impl (identical
            # codes), only the evaluation vehicle changes
            rot_of = lambda frame: similarity.hd_rotate_rows(  # noqa: E731
                frame, dim, signs=signs, id_col=id_col, emb_col=emb_col
            )
            rot_frame = (
                "opq_signs",
                spark.createDataFrame(
                    list(enumerate(signs)), "i int, sign double"
                ),
            )
        # training sample taken BEFORE the (pushdown-opaque) rotation —
        # same rows as the in-operator sample_mod filter, and only the
        # sample is rotated for training (r20)
        rot = rot_of(vecs)
        if sample_mod:
            rot_train = rot_of(vecs.where(F.col(id_col) % sample_mod == 0))
        else:
            rot_train = rot
        opq_codebook = similarity.pq_codebook(
            rot_train, pq_subspaces, pq_centroids, n_iters, dim, id_col,
            emb_col, None,
        )
        opq_codes = similarity.pq_codes(
            rot, pq_subspaces, pq_centroids, n_iters, dim, id_col, emb_col,
            sample_mod, codebook=opq_codebook,
        )
        # provenance row (r18): which impl encoded this generation's
        # codes, from which seed the signs derive (learned: which
        # rotation config version), at what dim — asserted by the next
        # cycle and by the serving paths
        meta_df = spark.createDataFrame(
            [(opq_impl, opq_seed, dim)],
            "opq_impl string, opq_seed string, dim int",
        )
        frames += [
            rot_frame,
            ("opq_codebook", opq_codebook),
            ("opq_codes", opq_codes),
            (OPQ_META, meta_df),
        ]
    fs.delete(P(tmp), True)
    for name, frame in frames:
        frame.write.mode("overwrite").parquet(os.path.join(tmp, name))
    fs.delete(P(trash), True)
    if fs.exists(P(index_root)):
        _rename_or_raise(fs, P(index_root), P(trash), "index_cycle commit")
    # boolean-checked: a silently-failed tmp→live rename followed by the
    # trash delete below would destroy the only committed generation
    _rename_or_raise(fs, P(tmp), P(index_root), "index_cycle commit")
    fs.delete(P(trash), True)
    return {
        "refreshed": True,
        "k": target_k,
        "target_k": target_k,
        "n_vectors": int(n),
        "opq": opq_seed is not None,
    }


def opq_search(
    queries,
    idx: dict,
    k: int = 5,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rank_decimals: int | None = 6,
):
    """Serve OPQ rotated-PQ top-k from a committed :func:`index_cycle`
    generation (r17, the r16 verdict's OPQ-serving task): rotate the
    QUERY vectors with the generation's own ``opq_signs`` artifact
    (queries are dim-sized — the corpus is never rotated at serve
    time, it already lives as rotated codes), then ADC-rank against
    the committed ``opq_codes``/``opq_codebook`` via
    ``similarity.pq_adc_topk``. Rotation is orthogonal, so ranking
    rotated-query-vs-rotated-reconstruction preserves the L2 geometry
    the PQ tables approximate.

    Deriving the diagonal from the ARTIFACT (not a seed argument)
    makes a seed change across generations structurally incapable of
    mismatching the stored codes. ``idx``: a :func:`load_index` result
    carrying the OPQ tier; raises KeyError with a pointed message when
    the generation was built without it.

    r18: when the generation carries the ``opq_meta`` provenance row,
    serving asserts it is mutually consistent with the signs artifact —
    the meta's dim matches the requested dim and its seed re-derives
    the committed diagonal exactly. A torn or hand-edited generation
    fails loudly here instead of ranking against the wrong rotation."""
    from homelogging_spark.operators import similarity

    if "opq_signs" not in idx:
        if OPQ_ROTATION in idx:
            raise KeyError(
                "index generation carries the LEARNED-rotation OPQ tier "
                "(opq_rotation matrix, no signs diagonal); serve it with "
                "ivf_opq_search (or pq_adc_topk over rotate_by_matrix'd "
                "queries), not opq_search"
            )
        raise KeyError(
            "index generation carries no OPQ tier; rebuild with "
            "index_cycle(opq_seed=...) first"
        )
    # r21: the per-HANDLE memo caches the COLLECTED artifacts (the
    # Spark jobs: signs rows + the opq_meta row), never the verification
    # outcome — the pure-Python seed→signs re-derivation below re-runs
    # on EVERY serve, so a torn generation is refused even from a warm
    # handle. The idx dict IS the loaded generation (the FAISS
    # in-memory-index posture: collect once per load, serve many
    # searches); a fresh load_index() always re-collects.
    cached = idx.get((_COLLECTED_SIGNS, dim))
    if cached is None:
        sign_rows = idx["opq_signs"].orderBy("i").collect()
        signs = [float(r.sign) for r in sign_rows]
        if len(signs) != dim:
            raise ValueError(
                f"opq_signs artifact has {len(signs)} rows, expected dim={dim}"
            )
        meta = idx[OPQ_META].collect()[0] if OPQ_META in idx else None
        cached = (signs, meta)
        idx[(_COLLECTED_SIGNS, dim)] = cached
    signs, meta = cached
    if meta is not None:
        if int(meta.dim) != dim:
            raise ValueError(
                f"opq_meta records dim={int(meta.dim)} but dim={dim} was "
                "requested; this generation serves a different dimension"
            )
        if similarity.hd_signs(dim, meta.opq_seed) != signs:
            raise ValueError(
                "opq_meta seed does not derive the committed opq_signs "
                "diagonal — the generation is torn or hand-edited; "
                "rebuild with index_cycle(opq_seed=...)"
            )
    # r20: Arrow-batch bit-exact twin of the hd_rotate expression — same
    # outputs, O(1) plan instead of a dim² HOF tree rebuilt+reanalyzed
    # per invocation (guide §4.2; see similarity.rotate_by_matrix_rows)
    rotated = similarity.hd_rotate_rows(
        queries, dim, signs=signs, id_col=id_col, emb_col=emb_col
    )
    return similarity.pq_adc_topk(
        rotated,
        idx["opq_codes"],
        idx["opq_codebook"],
        k=k,
        n_subspaces=n_subspaces,
        dim=dim,
        id_col=id_col,
        emb_col=emb_col,
        rank_decimals=rank_decimals,
    )


def _generation_rotation(idx: dict, dim: int):
    """Resolve a generation's OPQ rotation from its COMMITTED artifact
    (never from live config alone), with the opq_search provenance
    discipline: when the meta row is present it must RE-DERIVE the
    artifact exactly, so a torn or hand-edited generation fails loudly.
    Returns a DataFrame-level transform ``(df, id_col, emb_col) -> df``
    for query-side rotation (r20: the Arrow-batch bit-exact twins —
    same outputs as the expression forms, O(1) plan size).

    r21 (r20 verdict #1): the per-handle memo caches the COLLECTED
    artifacts (the Spark jobs: rotation/signs rows + the opq_meta row),
    never the verification outcome — the pure-Python re-derivation
    comparison (a config-dict lookup + an O(dim²) equality / dim md5
    hashes) re-runs on EVERY serve, so a generation whose meta no
    longer re-derives the committed artifact is refused even from a
    warm handle. A fresh load always re-collects."""
    from homelogging_spark.operators import similarity

    if OPQ_ROTATION in idx:
        cached = idx.get((_COLLECTED_ROTATION, dim))
        if cached is None:
            rows = idx[OPQ_ROTATION].orderBy("i", "j").collect()
            if len(rows) != dim * dim:
                raise ValueError(
                    f"opq_rotation artifact has {len(rows)} entries, expected "
                    f"dim*dim={dim * dim}"
                )
            mat = [[0.0] * dim for _ in range(dim)]
            for r in rows:
                mat[int(r.i)][int(r.j)] = float(r.val)
            meta = idx[OPQ_META].collect()[0] if OPQ_META in idx else None
            cached = (mat, meta)
            idx[(_COLLECTED_ROTATION, dim)] = cached
        mat, meta = cached
        if meta is not None:
            if int(meta.dim) != dim:
                raise ValueError(
                    f"opq_meta records dim={int(meta.dim)} but dim={dim} "
                    "was requested; this generation serves a different "
                    "dimension"
                )
            if meta.opq_impl != "learned":
                raise ValueError(
                    f"opq_meta records impl={meta.opq_impl!r} but the "
                    "generation carries a rotation-matrix artifact — torn "
                    "or hand-edited; rebuild with index_cycle"
                )
            from homelogging_spark.operators.opq_rotations import rotation_for

            cfg = rotation_for(int(meta.opq_seed[1:]))
            if [[float(v) for v in row] for row in cfg] != mat:
                raise ValueError(
                    "opq_meta rotation version does not re-derive the "
                    "committed opq_rotation matrix — the generation is "
                    "torn or hand-edited; rebuild with index_cycle"
                )
        return lambda df, i, e: similarity.rotate_by_matrix_rows(
            df, mat, id_col=i, emb_col=e
        )
    if "opq_signs" in idx:
        cached = idx.get((_COLLECTED_SIGNS, dim))
        if cached is None:
            signs = [
                float(r.sign) for r in idx["opq_signs"].orderBy("i").collect()
            ]
            if len(signs) != dim:
                raise ValueError(
                    f"opq_signs artifact has {len(signs)} rows, expected "
                    f"dim={dim}"
                )
            meta = idx[OPQ_META].collect()[0] if OPQ_META in idx else None
            cached = (signs, meta)
            idx[(_COLLECTED_SIGNS, dim)] = cached
        signs, meta = cached
        # r20 (r19 ADVICE #3): the signs branch enforces the SAME meta
        # consistency opq_search does — without it, ivf_opq_search over
        # a signs generation would serve a torn/hand-edited generation
        # that opq_search refuses (asymmetric provenance enforcement).
        if meta is not None:
            if int(meta.dim) != dim:
                raise ValueError(
                    f"opq_meta records dim={int(meta.dim)} but dim={dim} "
                    "was requested; this generation serves a different "
                    "dimension"
                )
            if meta.opq_impl not in ("expr", "fwht"):
                raise ValueError(
                    f"opq_meta records impl={meta.opq_impl!r} but the "
                    "generation carries a signs-diagonal artifact — torn "
                    "or hand-edited; rebuild with index_cycle"
                )
            if similarity.hd_signs(dim, meta.opq_seed) != signs:
                raise ValueError(
                    "opq_meta seed does not derive the committed "
                    "opq_signs diagonal — the generation is torn or "
                    "hand-edited; rebuild with index_cycle(opq_seed=...)"
                )
        return lambda df, i, e: similarity.hd_rotate_rows(
            df, dim, signs=signs, id_col=i, emb_col=e
        )
    raise KeyError(
        "index generation carries no OPQ tier; rebuild with "
        "index_cycle(opq_seed=...) first"
    )


def ivf_opq_search(
    queries,
    idx: dict,
    k: int = 5,
    nprobe: int = 2,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rank_decimals: int | None = 6,
):
    """Serve IVF-OPQ top-k from ONE committed :func:`index_cycle`
    generation (r19, the r18 verdict's stretch): the generation's
    coarse tier (``centroids``/``cells`` — raw space) prunes the
    search to ``nprobe`` cells per query, and its OPQ tier
    (``opq_codes``/``opq_codebook`` — rotated space, learned-rotation
    generations included) ADC-ranks the survivors, with the rotation
    resolved from the COMMITTED artifact and applied QUERY-side only
    (:func:`_generation_rotation`, the opq_search provenance
    discipline: meta must re-derive the artifact or serving refuses).

    The cross-space composition is sound because the rotation is
    orthogonal: raw-space cosine pruning selects exactly the cells a
    rotated-space prune would (inner products and norms invariant), so
    the best-quality code tier also rides the cheapest candidate path
    — probes are Q·nprobe rows, the corpus moves as codes only, and
    neither corpus nor query embeddings are materialized in rotated
    form beyond the Q dim-sized query rows."""
    from homelogging_spark.operators import similarity

    if "opq_codebook" not in idx:
        raise KeyError(
            "index generation carries no OPQ tier; rebuild with "
            "index_cycle(opq_seed=...) first"
        )
    rotate = _generation_rotation(idx, dim)
    return similarity.ivf_pq_topk(
        queries,
        idx["cells"],
        idx["opq_codes"],
        idx["opq_codebook"],
        idx["centroids"],
        k=k,
        nprobe=nprobe,
        n_subspaces=n_subspaces,
        dim=dim,
        id_col=id_col,
        emb_col=emb_col,
        rank_decimals=rank_decimals,
        rotate=rotate,
    )


def nightly_cycle(
    spark: SparkSession,
    readings_path: str | None = None,
    layout_cols: Sequence[str] = (),
    corpus=None,
    index_root: str | None = None,
    rollup_path: str | None = None,
    changed_dates: Sequence[str] | None = None,
    order: Sequence[str] = ("layout", "index", "rollup", "state"),
    layout_kwargs: dict | None = None,
    index_kwargs: dict | None = None,
    rollup_kwargs: dict | None = None,
    state_relayouts: Sequence[dict] | None = None,
):
    """THE nightly maintenance entry point (r16, r15 verdict #5): one
    idempotent call composing the maintenance cycles a production
    deployment runs together — the K1 layout cycle
    (:func:`maintenance_cycle`: recover → compact → incremental layout
    rewrite), the ANN index cycle (:func:`index_cycle`: occupancy-
    triggered artifact refresh), the continuous-aggregate rollup
    refresh (``ingest.refresh_rollup``), and (r20, r19 verdict #8) the
    streaming-state relayout/compaction leg
    (``streaming.pipeline.state_relayout``: fold a cooled
    high-P partitioned BM25/LM state's per-partition files into a
    smaller P or the legacy single-table layout, no-op when already
    there) — returning ONE maintenance-log DataFrame
    (``stage, action, n, detail``) for the maintenance journal ("no
    silent maintenance").

    Stages run in ``order`` and are INDEPENDENT by construction: they
    touch disjoint roots (readings table / index root / rollup table /
    streaming-state roots),
    so any ordering yields the identical final state — pinned in
    ``tests/test_maintenance.TestNightlyCycle`` for both orderings.
    Crash-repair is covered ACROSS the composition regardless of
    ordering: a layout-stage crash from a previous run is repaired by
    the layout leg's own ``recover_compaction`` entry whenever it runs
    (the index leg never reads the readings root, so running it first
    over a crashed layout state is safe), and an index-commit crash is
    repaired by the next index leg's stage-then-switch protocol. Each
    leg is a no-op when its inputs are absent (``None``), so one
    deployment config drives tables with any subset of the three
    surfaces.

    Scale: the composition adds nothing to the legs' own contracts —
    partition-pruned incremental rewrites, occupancy-gated retrains,
    changed-date-pruned rollup recompute; the log frame is
    created from a handful of driver-side counters (dim-sized)."""
    from homelogging_spark.operators.ingest import refresh_rollup

    known = {"layout", "index", "rollup", "state"}
    if set(order) - known or len(set(order)) != len(list(order)):
        raise ValueError(f"order must be distinct stages from {known}: {order!r}")
    rows: list[tuple[str, str, int, str]] = []

    def _csv(items: Sequence[str], cap: int = 20) -> str:
        items = list(items)
        head = ",".join(items[:cap])
        return head + (f",...(+{len(items) - cap})" if len(items) > cap else "")

    for stage in order:
        if stage == "layout" and readings_path is not None:
            rep = maintenance_cycle(
                spark, readings_path, layout_cols, **(layout_kwargs or {})
            )
            for action in ("recovered", "compacted", "rewritten"):
                rows.append(
                    ("layout", action, len(rep[action]), _csv(rep[action]))
                )
        elif stage == "index" and index_root is not None:
            if corpus is None:
                raise ValueError("index_root given without a corpus")
            rep = index_cycle(spark, corpus, index_root, **(index_kwargs or {}))
            rows.append(
                (
                    "index",
                    "refreshed" if rep["refreshed"] else "noop",
                    int(rep["k"]),
                    f"target_k={rep['target_k']},n_vectors={rep['n_vectors']}",
                )
            )
        elif stage == "rollup" and rollup_path is not None:
            if readings_path is None:
                raise ValueError("rollup_path given without readings_path")
            refresh_rollup(
                spark,
                readings_path,
                rollup_path,
                changed_dates=changed_dates,
                **(rollup_kwargs or {}),
            )
            rows.append(
                (
                    "rollup",
                    "refreshed",
                    -1 if changed_dates is None else len(list(changed_dates)),
                    "full" if changed_dates is None else _csv(list(changed_dates)),
                )
            )
        elif stage == "state" and state_relayouts is not None:
            # r20 (r19 verdict #8): partitioned-state compaction joins
            # the audited log — each spec is state_relayout's kwargs
            # (state_path, table, key_cols, cnt_col, n_partitions)
            from homelogging_spark.streaming.pipeline import state_relayout

            for spec in state_relayouts:
                rep = state_relayout(spark, **spec)
                rows.append(
                    (
                        "state",
                        "relayout" if rep["rewritten"] else "noop",
                        -1 if rep["n_keys"] is None else int(rep["n_keys"]),
                        f"{spec['state_path']}:{spec['table']} "
                        f"{rep['from']}->{rep['to']}",
                    )
                )
    return spark.createDataFrame(
        rows, "stage string, action string, n bigint, detail string"
    )
