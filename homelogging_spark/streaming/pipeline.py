"""Structured Streaming ingestion (SURVEY §2.9, EP3).

The reference's pollers produce a continuous append stream (1 row/min/
device, P1 at ~1 Hz). The streaming equivalent of EP3:

    source -> parse (sources/*) -> dedup on (meter_id, series, ts)
           -> foreachBatch append (operators/ingest) + dim MERGE

- Event time is the device timestamp (``ts``); a 10-minute watermark
  comfortably covers the reference's worst-case lateness (§2.9: nothing
  needs more than minutes).
- ``dropDuplicatesWithinWatermark`` gives the RavenDB idempotent-append
  semantics across micro-batches without unbounded state.
- ``foreachBatch`` writes the readings append and any mutable meter
  state (EnergyOffset) in the same batch — the reference's transactional
  SaveChanges boundary (``Kasa/KasaLogger.cs:73``).
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from homelogging_spark.operators.ingest import append_readings

LOG = logging.getLogger("homelogging_spark.streaming")

READINGS_DDL = (
    "meter_id string, series string, ts timestamp, value double, tag string"
)


def read_reading_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str = READINGS_DDL,
    fmt: str = "json",
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-based reading stream (the events testdata / any landing dir
    stands in for the live pollers) with watermarked dedup."""
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 16)
        .load(source_dir)
    )
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["meter_id", "series", "ts"]
    )


def windowed_downsample(
    stream: DataFrame,
    bucket: str = "1 minute",
    keys: tuple[str, ...] = ("meter_id", "series"),
    value_col: str = "value",
) -> DataFrame:
    """A2 as a stream: tumbling-window average with watermark-driven
    finalization — the streaming form of the reference's hand-rolled
    emit-on-bucket-change fold (``RandomQueries/ZeroExport.cs:86-104``).
    Late rows inside the watermark still amend their bucket; buckets
    older than the watermark finalize and emit (append mode)."""
    from pyspark.sql import functions as F

    return (
        stream.groupBy(F.window("ts", bucket).alias("w"), *keys)
        .agg(F.avg(value_col).alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            *keys,
            "avg_value",
            "n",
        )
    )


def start_append_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch append to the partitioned readings table. With
    ``available_now`` the query drains pending input then stops —
    batch-backfill mode; set False for continuous micro-batching."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        out = transform(batch) if transform is not None else batch
        append_readings(out, table_path)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DOCS_DDL = "doc_id long, text string"


def streaming_snapshot_dedup(stream: DataFrame, old_digests: DataFrame) -> DataFrame:
    """Stream-static join dedup: incoming docs (a crawl/snapshot stream)
    checked against the STATIC retained-corpus digest table — the
    streaming form of ``operators/dedup.incremental_dedup``'s exact
    gate. Structured Streaming re-plans the static side each micro-batch
    (so appends/compaction of the digest table are picked up), and the
    stream side keeps NO state: a stateless per-batch hash join, no
    watermark needed. At scale the digest table is the 16-byte-key
    artifact ingest maintains; only digests are joined, never text
    bodies.

    ``old_digests``: one ``content_hash`` column (distinct md5 digests).
    Returns the incoming docs annotated ``exact_dup`` / ``keep``."""
    from pyspark.sql import functions as F

    hashed = stream.withColumn("content_hash", F.md5(F.col("text")))
    hit = F.coalesce(F.col("_hit"), F.lit(False))
    return (
        hashed.join(
            old_digests.select("content_hash").distinct().withColumn(
                "_hit", F.lit(True)
            ),
            "content_hash",
            "left",
        )
        .select(
            "doc_id",
            "text",
            hit.alias("exact_dup"),
            (~hit).alias("keep"),
        )
    )


def build_probe_table(
    corpus_cells: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_probe_cap: int | None = None,
    observe_caps: bool = False,
    session_of: DataFrame | None = None,
) -> DataFrame:
    """Materializable probe side for :func:`streaming_semantic_dedup`:
    the cell-assigned retained corpus projected to
    ``(_b_id, _b_emb, _b_nrm, _b_cell)`` with norms precomputed and the
    optional ``cell_probe_cap`` hot-cell guard applied (deterministic
    per-cell ``group_topk_sample``, salt ``semdedup-probe-v1`` — the
    same rows the inline cap keeps, so verdicts are identical).

    Production shape: run this ONCE when the retained corpus changes
    (ingest / compaction), ``.write.parquet(...)`` the result bucketed
    on ``_b_cell``, and pass ``spark.read.parquet(...)`` to
    ``streaming_semantic_dedup(..., probe_table=...)``. The stream-
    static semi/anti pair plans its static side twice per micro-batch;
    with the inline cap that is two windows over the whole corpus table
    per trigger — materializing collapses both to a pruned scan of this
    precomputed table.

    ``observe_caps=True`` attaches a per-cell truncation census
    (``ceil(size/cap)``) via ``capstats.observe_cap_splits`` to ride
    the MATERIALIZING action (the ingest-time ``.write.parquet`` /
    count) — drain after it with ``capstats.drain_cap_stats``. This is
    the "no silent caps" hook for the streaming gate: Spark observations
    cannot attach under a streaming query, so the cap is observed where
    it is applied — at ingest, once per corpus generation — not per
    trigger."""
    from pyspark.sql import functions as F

    from homelogging_spark.operators.similarity import norm

    probe = corpus_cells.select(
        F.col(id_col).alias("_b_id"),
        F.col(emb_col).alias("_b_emb"),
        norm(F.col(emb_col)).alias("_b_nrm"),
        F.col("centroid_id").alias("_b_cell"),
    )
    if cell_probe_cap is not None:
        if cell_probe_cap < 1:
            raise ValueError(f"cell_probe_cap must be >= 1, got {cell_probe_cap}")
        from homelogging_spark.operators.sampling import group_topk_sample

        census = None
        if observe_caps:
            from homelogging_spark.functions.capstats import observe_cap_splits

            census = probe.groupBy("_b_cell").agg(
                F.ceil(F.count(F.lit(1)) / F.lit(float(cell_probe_cap)))
                .cast("bigint")
                .alias("_n_splits")
            )
            # session_of: when the consuming action runs on a cloned
            # foreachBatch session (the in-batch gate below), the
            # observation must register on that session's listener bus
            census = observe_cap_splits(
                census, "cell_probe_cap", session_of=session_of
            )
        # the deterministic per-cell top-k IS sampling.group_topk_sample
        # — same uniform_from_key order, same id tiebreak
        probe = group_topk_sample(
            probe, "_b_cell", "_b_id", cell_probe_cap, salt="semdedup-probe-v1"
        ).drop("u", "rank")
        if census is not None:
            # row-preserving inner join on the cell key carries the
            # observe node into the materializing action's plan, on the
            # Exchange the rank window needs anyway; reselect so the
            # emitted schema is byte-identical to the unobserved build
            probe = probe.join(census.select("_b_cell"), "_b_cell").select(
                "_b_id", "_b_emb", "_b_nrm", "_b_cell"
            )
    return probe


def streaming_semantic_dedup(
    stream: DataFrame,
    corpus_cells: DataFrame | None,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_probe_cap: int | None = None,
    probe_table: DataFrame | None = None,
    observe_caps: bool = False,
) -> DataFrame:
    """Stream-static SEMANTIC dedup — the embedding-tier twin of
    ``streaming_snapshot_dedup``'s exact gate: incoming vectors (a
    crawl's embedding stream) are checked against the STATIC retained
    corpus, cell-scoped exactly like batch ``similarity.semantic_dedup``
    (Abbas et al. 2023). Precedence is the natural streaming one: the
    retained corpus always wins — an incoming vector with ANY retained
    neighbor at cosine >= ``threshold`` in its cell is flagged
    ``semantic_dup``; new-vs-new pairs within a micro-batch are NOT
    checked (mirror of the exact gate; run batch semantic_dedup over the
    accepted set at compaction time for that).

    Streaming legality is the design constraint — append mode allows no
    stream-side aggregation or window, so:

    - **cell assignment is a pure map-side expression**: the K-row
      centroid dim is collected to the driver (the config-table
      precedent — ``plans/sources_registry`` config-driven series) and
      unrolled into an ``array_max`` over per-centroid cosine structs,
      bit-identical to batch ``ivf_assign``'s (cos DESC, centroid_id
      ASC) argmax because dot/norm literals fold in the same index
      order. The expression is K·dim literals — fine for the coarse
      quantizers a stream gate wants (tens to a few hundred cells);
      for K beyond that, gate inside ``foreachBatch`` with the batch
      ``ivf_assign`` instead.
    - **the dup verdict is a stream-static LEFT SEMI / LEFT ANTI join
      pair** on the cell key (plus the cosine predicate), unioned —
      "exists a qualifying neighbor" without a stream-side groupBy.
      The static side is re-planned every micro-batch, so corpus
      appends/compaction are picked up, as with the exact gate.

    ``corpus_cells`` is the cell-assigned retained corpus
    ``(id, embedding, centroid_id)`` — the artifact batch ``ivf_assign``
    maintains at ingest; at scale it is bucketed on ``centroid_id`` so
    the per-batch join prunes to touched cells. ``cell_probe_cap`` is
    the hot-cell guard for the STATIC side (the stream twin of batch
    ``cell_cap``): keep only a deterministic ``uniform_from_key``-
    ordered sample of each cell as probe targets, bounding per-row join
    work at the documented miss trade. The static side is planned
    TWICE per trigger (once under the semi join, once under the anti) on
    top of the per-batch re-plan — with the inline cap that doubles a
    window over the whole corpus table, so production builds the capped
    probe side ONCE at ingest via :func:`build_probe_table`, persists
    it (bucketed on ``_b_cell``), and passes it as ``probe_table=`` —
    each trigger's semi/anti pair then scans the precomputed table
    instead of re-deriving the cap. ``probe_table`` and
    ``corpus_cells`` (+``cell_probe_cap``) are mutually exclusive ways
    to provide the static side; verdicts are identical (pinned in
    ``test_corpus_ops``)."""
    from pyspark.sql import functions as F

    from homelogging_spark.operators.similarity import dot_product, norm

    if (probe_table is None) == (corpus_cells is None):
        raise ValueError(
            "provide exactly one of corpus_cells or probe_table"
        )
    if probe_table is not None and cell_probe_cap is not None:
        raise ValueError(
            "cell_probe_cap applies when building from corpus_cells; a "
            "probe_table was already capped by build_probe_table"
        )
    if probe_table is not None and observe_caps:
        raise ValueError(
            "observe_caps applies when building from corpus_cells; a "
            "probe_table's cap census was observable at its "
            "build_probe_table(observe_caps=True) materialization"
        )

    cents = centroids.select(
        F.col(id_col), F.col(emb_col), norm(F.col(emb_col)).alias("c_nrm")
    ).collect()
    if not cents:
        raise ValueError("centroids frame is empty")

    v_nrm = F.col("_v_nrm")
    scored = [
        F.struct(
            (
                dot_product(
                    F.col(emb_col),
                    F.array(*[F.lit(float(x)) for x in r[emb_col]]),
                )
                / (v_nrm * F.lit(float(r["c_nrm"])))
            ).alias("cos"),
            F.lit(-int(r[id_col])).cast("long").alias("neg_id"),
        )
        for r in cents
    ]
    assigned = (
        stream.withColumn("_v_nrm", norm(F.col(emb_col)))
        .withColumn("_best", F.array_max(F.array(*scored)))
        .withColumn("centroid_id", (-F.col("_best.neg_id")).cast("long"))
        .drop("_best")
    )

    # observe_caps is meaningful on the IN-BATCH path only (this
    # function applied to a micro-batch frame inside foreachBatch,
    # where the consumer is a batch action): the inline cell_probe_cap
    # census rides that action, anchored to the batch frame's (cloned)
    # session. Under a true streaming query Spark cannot attach
    # observations — use build_probe_table(observe_caps=True) at
    # ingest instead (its docstring), which is also where the cap is
    # actually applied in the production probe_table= shape.
    probe = (
        probe_table
        if probe_table is not None
        else build_probe_table(
            corpus_cells,
            id_col,
            emb_col,
            cell_probe_cap,
            observe_caps=observe_caps,
            session_of=stream,
        )
    )

    cond = (F.col("centroid_id") == F.col("_b_cell")) & (
        dot_product(F.col(emb_col), F.col("_b_emb"))
        / (F.col("_v_nrm") * F.col("_b_nrm"))
        >= F.lit(float(threshold))
    )
    out_cols = [id_col, emb_col, "centroid_id"]
    dups = (
        assigned.join(probe, cond, "left_semi")
        .select(*out_cols)
        .withColumn("semantic_dup", F.lit(True))
    )
    keeps = (
        assigned.join(probe, cond, "left_anti")
        .select(*out_cols)
        .withColumn("semantic_dup", F.lit(False))
    )
    return dups.unionByName(keeps).withColumn("keep", ~F.col("semantic_dup"))


def start_kmv_rollup_stream(
    stream: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...],
    state_path: str,
    checkpoint_dir: str,
    k: int = 64,
    salt: str = "kmv",
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental KMV distinct-sketch rollup: foreachBatch sketches each
    micro-batch and union-merges it into the persistent per-group sketch
    table at ``state_path``.

    Correct BY the merge-closure property (``operators/sketches``:
    k-smallest of concatenated sketches == sketch of concatenated
    inputs, pinned in ``test_sketches``): the drained state table equals
    the batch ``kmv_sketch`` over every row ever streamed, exactly.
    Two properties make it production-shaped:

    - **State is dim-sized** — one k-array row per group (k·8 bytes),
      never raw keys; a year of per-day micro-batches folds into the
      same constant-size table that answers distinct / overlap /
      Jaccard queries via ``kmv_estimate`` / ``kmv_overlap``.
    - **Idempotent under replay** — the merge dedups hashes
      (``array_distinct``), so re-delivering a micro-batch after a
      crash-restart is a no-op on the state; at-least-once foreachBatch
      delivery therefore yields exactly-once sketch semantics (pinned).

    The state swap follows ``operators/maintenance``'s stage-then-rename
    discipline: the merged table is fully written to a staging dir
    BEFORE the live dir is touched (never overwrite-while-reading), then
    two renames swap it in.
    """
    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise
    from homelogging_spark.operators.sketches import kmv_merge_arrays, kmv_sketch

    from pyspark.sql import functions as F

    groups = list(group_cols)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = kmv_sketch(batch, key_col, groups, k=k, salt=salt)
        hadoop, fs = _fs(spark, state_path)
        P = hadoop.Path
        trash0 = state_path + ".__trash"
        if not fs.exists(P(state_path)) and fs.exists(P(trash0)):
            # crash landed between the two swap renames (live moved to
            # trash, staged copy not yet promoted): the trash IS the
            # last committed state — restore it before merging, else
            # this batch would silently rebuild from itself alone
            _rename_or_raise(fs, P(trash0), P(state_path), "kmv state repair")
        exists = fs.exists(P(state_path))
        if exists:
            empty = F.array().cast("array<bigint>")
            merged = (
                spark.read.parquet(state_path)
                .select(*groups, F.col("kmv").alias("__old"))
                .join(
                    new.select(*groups, F.col("kmv").alias("__new")),
                    groups,
                    "full",
                )
                .select(
                    *groups,
                    kmv_merge_arrays(
                        F.coalesce(F.col("__old"), empty),
                        F.coalesce(F.col("__new"), empty),
                        k,
                    ).alias("kmv"),
                )
            )
        else:
            merged = new.select(*groups, "kmv")
        merged = merged.withColumn("n_kept", F.size("kmv").cast("bigint"))
        tmp, trash = state_path + ".__tmp", state_path + ".__trash"
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(P(trash), True)
        if exists:
            _rename_or_raise(fs, P(state_path), P(trash), "kmv state swap")
        # boolean-checked: a silently-failed tmp→live rename followed
        # by the trash delete below would destroy the only committed
        # state generation (Hadoop rename returns false, never raises)
        _rename_or_raise(fs, P(tmp), P(state_path), "kmv state swap")
        fs.delete(P(trash), True)

    writer = stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- partitioned state generations (r19, r18 verdict #2) ---------------------
# The r17/r18 statistics states (BM25 dfreq, ngram-LM bigrams) rewrite
# the FULL count table every micro-batch — correct, but the rewrite cost
# grows with STATE size, not batch size, so a long-lived stream over a
# growing vocabulary pays ever more per batch. The partitioned layout
# hash-partitions the count table by its leading key
# (`part = pmod(xxhash64(term), P)` — stable across batches, so a pair
# always lands in the same partition) and a micro-batch rewrites ONLY
# the partitions its keys touch: read old `part IN touched` (partition
# pruning keeps the scan to those directories), full-outer merge with
# the batch delta, stage under a dot-prefixed tmp root (invisible to
# partition discovery), then stage-then-rename PER PARTITION; the
# single stats row commits LAST and remains the generation's commit
# point. Per-batch cost becomes O(touched fraction of state), bounded
# by batch vocabulary — the measurement is in SCALE.md r19.
#
# Crash consistency (the whole-dir swap's guarantees, re-derived per
# partition):
# - every partition's files carry a constant ``pmax`` column — the
#   highest batch id folded into that partition. A crash AFTER some
#   partition swaps but BEFORE the stats commit leaves the checkpoint
#   unadvanced; on redelivery the merge SKIPS partitions whose pmax
#   already reached the batch id (they committed in the crashed
#   attempt), folds the rest, and then commits stats — each partition
#   folds each batch exactly once, no double counts.
# - a crash BETWEEN the two renames of one partition's swap leaves the
#   live dir missing and the trash dir holding the last committed
#   generation; :func:`_repair_partitioned_state` restores it, and runs
#   at the head of every merge AND load.
# - readers that load between partition commits and the stats commit
#   can observe counts from batch N+1 beside stats from batch N — the
#   documented cost of per-partition commits (the whole-dir layout
#   swapped both together). The stats row is the truth of what is
#   COMMITTED; serving paths that need strict generation consistency
#   verify against it (corpus-fingerprint checks catch exactly this
#   drift), and the fixture/serving flows here always merge-then-load.


def _part_expr(key_col: str, n_partitions: int):
    """Stable partition assignment for a partitioned state table.
    ``xxhash64`` is deterministic for a given input across Spark
    sessions, so a key's partition never moves between batches; the
    leading key (term / w1) keeps each context's rows colocated."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(int(n_partitions))).cast(
        "int"
    )


def _repair_partitioned_state(spark, state_path: str, table: str) -> None:
    """Restore a partitioned state interrupted between swap renames:
    any ``part=K`` sitting in the trash root while missing live IS the
    last committed generation (crash between live->trash and
    tmp->live) — move it back; one present in BOTH survived a crash
    after commit but before trash cleanup — drop the trash copy. Same
    for the stats dir. Idempotent; runs at merge and load time.

    r20 (r19 ADVICE #1): also restores the LEGACY layout's
    whole-generation swap (state dir missing, sibling ``.__trash``
    holding the last committed generation) — the repair the legacy
    mergers run inline — so the state LOADERS
    (:func:`textops.bm25_from_state`,
    :func:`textops.ngram_lm_from_state`) give the load-side repair
    guarantee on BOTH layouts through this one call."""
    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise

    hadoop, fs = _fs(spark, state_path)
    P = hadoop.Path
    if not fs.exists(P(state_path)) and fs.exists(P(state_path + ".__trash")):
        _rename_or_raise(
            fs,
            P(state_path + ".__trash"),
            P(state_path),
            "legacy state repair",
        )
        return
    table_root = os.path.join(state_path, table)
    trash_root = P(os.path.join(state_path, f".__trash_{table}"))
    if fs.exists(trash_root):
        for st in fs.listStatus(trash_root):
            name = st.getPath().getName()
            live = P(os.path.join(table_root, name))
            if not fs.exists(live):
                fs.mkdirs(P(table_root))
                _rename_or_raise(
                    fs, st.getPath(), live, f"{table} partition repair"
                )
            else:
                fs.delete(st.getPath(), True)
        fs.delete(trash_root, True)
    stats_live = P(os.path.join(state_path, "stats"))
    stats_trash = P(os.path.join(state_path, ".__trash_stats"))
    if fs.exists(stats_trash):
        if not fs.exists(stats_live):
            _rename_or_raise(fs, stats_trash, stats_live, "stats repair")
        else:
            fs.delete(stats_trash, True)


def _read_state_stats(spark, state_path: str) -> dict | None:
    """The committed stats row of a partitioned state, or None before
    the first commit."""
    from homelogging_spark.operators.maintenance import _fs

    hadoop, fs = _fs(spark, state_path)
    p = os.path.join(state_path, "stats")
    if not fs.exists(hadoop.Path(p)):
        return None
    return spark.read.parquet(p).collect()[0].asDict()


def _redelivery_guard(
    old: dict | None,
    batch_id: int,
    run_id: str | None,
    what: str,
    state_path: str,
) -> bool:
    """True when the batch is a same-lineage redelivery (merge must
    no-op); raises when a regressed batch id arrives under a DIFFERENT
    checkpoint lineage — a fresh stream renumbering from 0, whose
    batches a silent no-op would drop (the r17 ADVICE data-loss
    window)."""
    if old is None or int(batch_id) > int(old["max_batch_id"]):
        return False
    stored_run = old.get("run_id")
    if run_id is not None and stored_run is not None and stored_run != run_id:
        raise ValueError(
            f"{what} state at {state_path} was built by run "
            f"{stored_run!r} up to batch {old['max_batch_id']}; run "
            f"{run_id!r} delivered batch {int(batch_id)}, which would "
            "be silently skipped as redelivered. Resume the original "
            "checkpoint, or rebuild the state under a fresh state_path."
        )
    return True


def _layout_guard(
    old: dict | None, n_partitions: int | None, what: str, state_path: str
) -> None:
    """A merger configured for one layout must never fold into a state
    committed under another: a legacy merger appending root-level files
    beside ``part=K`` dirs (or vice versa) would double-count half the
    table on the next load. Raise; the operator rebuilds."""
    if old is None:
        return
    stored = old.get("n_partitions")
    if (stored or None) != (n_partitions or None):
        raise ValueError(
            f"{what} state at {state_path} is committed with "
            f"n_partitions={stored!r} but this merger is configured "
            f"with n_partitions={n_partitions!r}; state layout is fixed "
            "at creation — rebuild under a fresh state_path to change it."
        )


def _commit_stats(spark, state_path: str, stats_df) -> None:
    """Stage-then-rename of the stats subdir alone — the commit point
    of a partitioned generation (legacy layouts swap the whole state
    dir instead)."""
    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise

    hadoop, fs = _fs(spark, state_path)
    P = hadoop.Path
    live = os.path.join(state_path, "stats")
    tmp = os.path.join(state_path, ".__tmp_stats")
    trash = os.path.join(state_path, ".__trash_stats")
    fs.delete(P(tmp), True)
    stats_df.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(P(trash), True)
    if fs.exists(P(live)):
        _rename_or_raise(fs, P(live), P(trash), "stats swap")
    _rename_or_raise(fs, P(tmp), P(live), "stats swap")
    fs.delete(P(trash), True)


def _merge_partitioned_counts(
    spark,
    state_path: str,
    table: str,
    delta,
    key_cols: list[str],
    cnt_col: str,
    batch_id: int,
    n_partitions: int,
) -> list[int]:
    """Fold a keyed count delta into a hash-partitioned state table,
    rewriting ONLY touched partitions. Returns the partition ids
    actually rewritten (redelivered-to-a-partition skips excluded) —
    the observability hook the subset-rewrite pin asserts on.

    Scale shape: the old side reads `part IN touched` (directory-level
    partition pruning), the merge is one full-outer hash join keyed on
    the count key, and the write repartitions to one task per touched
    partition so each ``part=K`` dir stays one file per generation —
    no small-file accretion across batches."""
    from pyspark.sql import functions as F

    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise

    hadoop, fs = _fs(spark, state_path)
    P = hadoop.Path
    table_root = os.path.join(state_path, table)
    tmp_root = os.path.join(state_path, f".__tmp_{table}")
    trash_root = os.path.join(state_path, f".__trash_{table}")
    part = _part_expr(key_cols[0], n_partitions)
    delta = delta.withColumn("part", part)
    touched = sorted(
        int(r.part) for r in delta.select("part").distinct().collect()
    )
    if not touched:
        if not fs.exists(P(table_root)):
            # zero-key first batch: commit an EMPTY schema-bearing
            # partition so loaders (which read the table path) see the
            # empty table, matching the legacy layout's empty write.
            # r20 (r19 ADVICE #4): staged through the tmp root and
            # rename-committed like every real partition — a crash
            # mid-write must never leave a torn parquet file in the
            # live tree for loaders to fail on.
            fs.delete(P(tmp_root), True)
            delta.select(
                *key_cols, F.col(cnt_col).cast("bigint").alias(cnt_col)
            ).withColumn(
                "pmax", F.lit(int(batch_id)).cast("bigint")
            ).limit(0).write.mode("overwrite").parquet(
                os.path.join(tmp_root, "part=0")
            )
            fs.mkdirs(P(table_root))
            _rename_or_raise(
                fs,
                P(os.path.join(tmp_root, "part=0")),
                P(os.path.join(table_root, "part=0")),
                f"{table} empty-commit swap",
            )
            fs.delete(P(tmp_root), True)
        return []
    exists = fs.exists(P(table_root))
    skip: set[int] = set()
    if exists:
        # per-partition watermark: a partition whose pmax already
        # reached this batch id committed in a crashed attempt — fold
        # the remaining partitions only (exactly-once per partition)
        marks = (
            spark.read.parquet(table_root)
            .where(F.col("part").isin(touched))
            .groupBy("part")
            .agg(F.max("pmax").alias("pmax"))
            .collect()
        )
        skip = {
            int(r.part)
            for r in marks
            if r.pmax is not None and int(r.pmax) >= int(batch_id)
        }
    still = [t for t in touched if t not in skip]
    if not still:
        return []
    delta_still = delta.where(F.col("part").isin(still))
    if exists:
        old_still = (
            spark.read.parquet(table_root)
            .where(F.col("part").isin(still))
            .select(*key_cols, F.col(cnt_col).alias("__old"))
        )
        merged = (
            old_still.join(
                delta_still.select(*key_cols, F.col(cnt_col).alias("__new")),
                key_cols,
                "full",
            ).select(
                *key_cols,
                (
                    F.coalesce(F.col("__old"), F.lit(0))
                    + F.coalesce(F.col("__new"), F.lit(0))
                )
                .cast("bigint")
                .alias(cnt_col),
            )
        )
    else:
        merged = delta_still.select(
            *key_cols, F.col(cnt_col).cast("bigint").alias(cnt_col)
        )
    merged = merged.withColumn("part", part).withColumn(
        "pmax", F.lit(int(batch_id)).cast("bigint")
    )
    fs.delete(P(tmp_root), True)
    merged.repartition(len(still), "part").write.mode("overwrite").partitionBy(
        "part"
    ).parquet(tmp_root)
    fs.mkdirs(P(table_root))
    fs.delete(P(trash_root), True)
    fs.mkdirs(P(trash_root))
    for t in still:
        child = f"part={t}"
        live_p = P(os.path.join(table_root, child))
        tmp_p = P(os.path.join(tmp_root, child))
        trash_p = P(os.path.join(trash_root, child))
        if fs.exists(live_p):
            _rename_or_raise(fs, live_p, trash_p, f"{table} partition swap")
        _rename_or_raise(fs, tmp_p, live_p, f"{table} partition swap")
    fs.delete(P(trash_root), True)
    fs.delete(P(tmp_root), True)
    LOG.info(
        "%s: batch %s rewrote %d/%d partitions %s",
        table,
        batch_id,
        len(still),
        n_partitions,
        still,
    )
    return still


def state_relayout(
    spark,
    state_path: str,
    table: str,
    key_cols: list[str],
    cnt_col: str,
    n_partitions: int | None = None,
) -> dict:
    """Re-commit a count state under a different partition layout —
    the state-maintenance compaction leg (r20, r19 verdict #8): a
    steady-state partitioned table carries one file per ``part=K`` dir,
    so a generously-sized P (the right call while the stream is hot)
    leaves P small files for every loader to open once the state stops
    growing; folding it to a smaller P — or to the legacy single-table
    layout (``n_partitions=None``) — is the small-file compaction the
    readings table gets from ``compact_partition``. The same call
    migrates UP to a partitioned layout, closing the loop
    ``_layout_guard`` deliberately refuses at merge time ("rebuild
    under a fresh state_path to change it").

    Semantics: counts, stats, digest, run-id lineage and the
    ``max_batch_id`` watermark are preserved verbatim — only the
    layout changes. Every new partition's ``pmax`` is the committed
    ``max_batch_id`` (every folded batch is folded into every
    partition, so redelivery skipping stays exactly-once). Commit is
    the legacy whole-generation swap: the new state stages in a
    sibling tmp dir and the two renames are crash-covered by
    :func:`_repair_partitioned_state`'s legacy-restore path, which
    every merger and loader already runs.

    Returns ``{"rewritten", "n_keys", "from", "to"}`` — ``rewritten``
    False when the state is already at the target layout (no-op, the
    ``index_cycle`` occupancy-gate discipline). Scale: one scan of the
    vocabulary-bounded state table and one write; never touches the
    corpus."""
    from pyspark.sql import functions as F

    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise

    _repair_partitioned_state(spark, state_path, table)
    old = _read_state_stats(spark, state_path)
    if old is None:
        raise ValueError(
            f"state at {state_path} has no committed stats generation "
            "to re-layout"
        )
    stored = old.get("n_partitions") or None
    target = n_partitions or None
    if stored == target:
        return {
            "rewritten": False, "n_keys": None, "from": stored, "to": target,
        }
    hadoop, fs = _fs(spark, state_path)
    P = hadoop.Path
    counts = spark.read.parquet(os.path.join(state_path, table)).select(
        *key_cols, F.col(cnt_col).cast("bigint").alias(cnt_col)
    )
    n_keys = counts.count()
    tmp = state_path + ".__tmp_relayout"
    fs.delete(P(tmp), True)
    if target is None:
        counts.write.mode("overwrite").parquet(os.path.join(tmp, table))
    else:
        counts.withColumn("part", _part_expr(key_cols[0], target)).withColumn(
            "pmax", F.lit(int(old["max_batch_id"])).cast("bigint")
        ).repartition(int(target), "part").write.mode("overwrite").partitionBy(
            "part"
        ).parquet(os.path.join(tmp, table))
    stats = spark.read.parquet(os.path.join(state_path, "stats")).withColumn(
        "n_partitions",
        F.lit(target).cast("int"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "stats")
    )
    trash = state_path + ".__trash"
    fs.delete(P(trash), True)
    _rename_or_raise(fs, P(state_path), P(trash), "state relayout swap")
    _rename_or_raise(fs, P(tmp), P(state_path), "state relayout swap")
    fs.delete(P(trash), True)
    LOG.info(
        "%s: relayout %s -> %s (%d keys)", state_path, stored, target, n_keys
    )
    return {"rewritten": True, "n_keys": n_keys, "from": stored, "to": target}


def bm25_stats_batch_merger(
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    run_id: str | None = None,
    n_partitions: int | None = None,
):
    """The ``foreachBatch`` body of :func:`start_bm25_stats_stream`,
    exposed so replay idempotency is directly testable (the
    ``incremental_dedup_batch_writer`` discipline): calling it twice
    with the same ``batch_id`` must leave the state unchanged.

    State is ONE generation directory holding two mutually-consistent
    parquet tables (a df table served against the wrong N skews every
    idf, so they swap together, stage-then-rename):

    - ``dfreq``: (term, df) — per-term count of docs containing the
      term, the full-vocabulary inverted-index statistic (bounded by
      vocabulary size, not corpus size; additive across doc-disjoint
      batches because each doc contributes 0/1 per term);
    - ``stats``: one row (n_docs, total_dl, max_batch_id, and — r18 —
      corpus_digest, run_id) — corpus size and total token mass (avgdl
      = total_dl / n_docs at serve time, the same integer-exact
      division the batch path computes), plus the order-insensitive
      md5-XOR fingerprint of every folded doc id
      (``textops.corpus_digest_col``; XOR-accumulated per batch, so it
      stays exact across any batch slicing) — the serve-time drift
      check ``bm25_topk(verify_state=True)`` compares it against the
      scored frame. Merging over a LEGACY state (no digest column)
      propagates NULL — honest "unknown", refused by the verifier —
      until a rebuild re-folds the corpus.

    Exactly-once: the additive merge is guarded by ``max_batch_id`` —
    foreachBatch ids are monotonic per checkpoint, so an at-least-once
    redelivery (batch_id <= watermark) is a no-op on the state. r18
    (r17 ADVICE): that monotonicity holds per CHECKPOINT LINEAGE only —
    a stream restarted against a fresh checkpoint re-numbers batches
    from 0, and the bare watermark would silently classify genuinely
    new batches as redelivered, losing data with no error. The state
    therefore records ``run_id`` (the checkpoint identity;
    :func:`start_bm25_stats_stream` passes its checkpoint dir) and a
    batch-id REGRESSION under a DIFFERENT run id raises instead of
    no-opping — the operator must either resume the original
    checkpoint or rebuild the state to a fresh ``state_path``. With
    ``run_id=None`` (direct/backfill use, and legacy states) the check
    degrades to the bare watermark, documented here. The
    input contract is append-only docs (each doc streamed once), the
    same contract the index-maintenance tier holds — with non-NULL
    text: NULL-text docs would count toward n_docs but contribute no
    length, so the served avgdl would divide by ALL docs where the
    batch path's avg divides by non-NULL ones; the recompute-identity
    pin applies to non-NULL-text corpora.

    ``n_partitions`` (r19, r18 verdict #2): None keeps the r18
    whole-generation swap; an int selects the hash-partitioned dfreq
    layout (see the partitioned-state block above) where a micro-batch
    rewrites only the term partitions it touches. Layout is fixed at
    state creation and recorded in the stats row; a mismatched merger
    raises instead of corrupting the table.

    Sizing P (r20, r19 verdict #5 — measured in SCALE.md r19): the
    touched fraction per batch follows the birthday formula
    ``1 - exp(-V_batch/P)``, so P should sit well above the per-batch
    vocabulary for the write elision to bite — LOW THOUSANDS for
    production text streams (P=2048: a 50-term batch rewrites ~2% of a
    full-vocabulary state). Below ~1e6 state keys the per-partition
    job overhead dominates and the legacy whole-swap layout is the
    right default — which is why the sf0.01 fixtures use P=8 (plan
    certification, not throughput). Dir count scales with TOUCHED
    vocabulary, not P: a high P never fans a small batch into P
    writes (pinned at P=1024 in
    ``TestBm25StatsStream.test_high_partition_count_layout``)."""
    from homelogging_spark.functions.texthash import tokens
    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise

    from pyspark.sql import functions as F

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        hadoop, fs = _fs(spark, state_path)
        P = hadoop.Path
        if n_partitions is not None:
            _repair_partitioned_state(spark, state_path, "dfreq")
            old = _read_state_stats(spark, state_path)
            _layout_guard(old, n_partitions, "bm25", state_path)
            if _redelivery_guard(old, batch_id, run_id, "bm25", state_path):
                return  # redelivered micro-batch: additive merge skipped
            exists = old is not None
        else:
            tmp, trash = state_path + ".__tmp", state_path + ".__trash"
            if not fs.exists(P(state_path)) and fs.exists(P(trash)):
                # crash landed between the swap renames: trash IS the
                # last committed generation — restore before merging
                _rename_or_raise(
                    fs, P(trash), P(state_path), "bm25 state repair"
                )
            exists = fs.exists(P(state_path))
            old = None
            if exists:
                old = (
                    spark.read.parquet(os.path.join(state_path, "stats"))
                    .collect()[0]
                    .asDict()
                )
                _layout_guard(old, None, "bm25", state_path)
                if _redelivery_guard(
                    old, batch_id, run_id, "bm25", state_path
                ):
                    return  # redelivered micro-batch: merge skipped
        staged = batch.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        ).select(
            id_col,
            F.size("__toks").cast("bigint").alias("__dl"),
            F.array_distinct("__toks").alias("__terms"),
        )
        from homelogging_spark.operators.textops import corpus_digest_col

        agg = staged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum("__dl"), F.lit(0)).cast("bigint").alias("dl"),
            F.coalesce(
                F.bit_xor(corpus_digest_col(F.col(id_col))), F.lit(0)
            ).alias("digest"),
        ).collect()[0]
        df_b = (
            staged.select(F.explode("__terms").alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        )
        if exists:
            n_docs = int(old["n_docs"]) + int(agg.n)
            total_dl = int(old["total_dl"]) + int(agg.dl)
            # XOR-accumulate the corpus fingerprint; a legacy state
            # without one propagates NULL (honest unknown) rather than
            # inventing a digest that misses its docs
            old_digest = old.get("corpus_digest")
            digest = (
                None
                if old_digest is None
                else int(old_digest) ^ int(agg.digest)
            )
        else:
            n_docs, total_dl = int(agg.n), int(agg.dl)
            digest = int(agg.digest)
        if n_partitions is not None:
            _merge_partitioned_counts(
                spark,
                state_path,
                "dfreq",
                df_b,
                ["term"],
                "df",
                batch_id,
                n_partitions,
            )
            stats = spark.createDataFrame(
                [
                    (
                        n_docs,
                        total_dl,
                        int(batch_id),
                        digest,
                        run_id,
                        int(n_partitions),
                    )
                ],
                "n_docs bigint, total_dl bigint, max_batch_id bigint, "
                "corpus_digest bigint, run_id string, n_partitions int",
            )
            _commit_stats(spark, state_path, stats)
            return
        if exists:
            dfreq = (
                spark.read.parquet(os.path.join(state_path, "dfreq"))
                .withColumnRenamed("df", "__old")
                .join(df_b.withColumnRenamed("df", "__new"), "term", "full")
                .select(
                    "term",
                    (
                        F.coalesce(F.col("__old"), F.lit(0))
                        + F.coalesce(F.col("__new"), F.lit(0))
                    ).cast("bigint").alias("df"),
                )
            )
        else:
            dfreq = df_b
        stats = spark.createDataFrame(
            [(n_docs, total_dl, int(batch_id), digest, run_id)],
            "n_docs bigint, total_dl bigint, max_batch_id bigint, "
            "corpus_digest bigint, run_id string",
        )
        fs.delete(P(tmp), True)
        dfreq.write.mode("overwrite").parquet(os.path.join(tmp, "dfreq"))
        stats.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "stats")
        )
        fs.delete(P(trash), True)
        if exists:
            _rename_or_raise(fs, P(state_path), P(trash), "bm25 state swap")
        # boolean-checked: a silently-failed tmp→live rename followed by
        # the trash delete would destroy the only committed generation
        _rename_or_raise(fs, P(tmp), P(state_path), "bm25 state swap")
        fs.delete(P(trash), True)

    return merge_batch


def start_bm25_stats_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    n_partitions: int | None = None,
) -> StreamingQuery:
    """Incremental BM25 corpus-statistics maintenance (r17, the r16
    verdict's stretch): foreachBatch folds each micro-batch of docs
    into the persistent (df, N, total_dl) state the lexical leg serves
    from — ``textops.bm25_topk(dfreq=..., stats=...)`` — the way the
    ANN leg serves from ``index_cycle`` artifacts. Pinned: the served
    ranking from streamed state is row-identical to the batch
    computation over the same corpus (``test_retrieval``).

    r18: the checkpoint dir doubles as the state's run identity — the
    merger raises (instead of silently no-opping) when a later stream
    with a DIFFERENT checkpoint delivers regressed batch ids, the r17
    ADVICE data-loss window."""
    writer = stream.writeStream.foreachBatch(
        bm25_stats_batch_merger(
            state_path,
            id_col,
            text_col,
            run_id=checkpoint_dir,
            n_partitions=n_partitions,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ngram_lm_batch_merger(
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    run_id: str | None = None,
    n_partitions: int | None = None,
):
    """The ``foreachBatch`` body of :func:`start_ngram_lm_stream` —
    incremental maintenance of the bigram-LM statistics
    ``textops.ngram_lm_score`` serves from, following
    :func:`bm25_stats_batch_merger` exactly (stage-then-rename
    generations, max_batch_id exactly-once watermark, run-id lineage
    guard, corpus fingerprint):

    - ``bigrams``: (w1, w2, c) — RAW adjacent-pair counts, additive
      across doc-disjoint batches. Deliberately UNCUT: ``min_count``
      is not additive-safe (a pair cut per batch could cross the
      threshold globally), so the cut — and the contexts/n_vocab that
      must stay consistent with it — is applied at LOAD time by
      :func:`ngram_lm_from_state`.
    - ``stats``: one row (n_docs, max_batch_id, corpus_digest,
      run_id) — the same drift/lineage guards as the BM25 state —
      plus (r19, the capstats "no silent growth" discipline) the
      state-size honesty metrics ``n_bigrams`` / ``n_hapax`` /
      ``state_bytes``: the raw table is deliberately uncut, so its
      growth — and the hapax mass a ``min_count=2`` load would shed —
      is OBSERVABLE on every merge, before it hurts. The metrics are
      a single count/filtered-count scan of the committed table's `c`
      column (columnar prune, no shuffle beyond the partial agg) plus
      one filesystem content summary; at LM-state scale (vocabulary-
      bounded, not corpus-bounded) that is noise next to the merge.

    ``n_partitions`` (r19, r18 verdict #2): None keeps the r18
    whole-generation swap; an int selects the hash-partitioned layout
    (see the partitioned-state block above) where a micro-batch
    rewrites only the partitions its bigrams touch — per-batch cost
    bounded by batch vocabulary instead of state size. Layout is fixed
    at state creation and recorded in the stats row; a mismatched
    merger raises instead of corrupting the table. Sizing P: same rule
    as :func:`bm25_stats_batch_merger` (low thousands for production
    text streams, legacy layout below ~1e6 keys — SCALE.md r19); note
    the bigram key space is vocabulary², so steady-state LM states hit
    the partitioned regime sooner than df tables."""
    from homelogging_spark.functions.texthash import tokens
    from homelogging_spark.operators.maintenance import _fs, _rename_or_raise
    from homelogging_spark.operators.textops import corpus_digest_col

    from pyspark.sql import functions as F

    def _size_metrics(bigrams_df, fs, hadoop, path: str) -> tuple:
        row = bigrams_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.coalesce(
                F.sum((F.col("c") == 1).cast("bigint")), F.lit(0)
            ).cast("bigint").alias("nh"),
        ).collect()[0]
        nbytes = int(fs.getContentSummary(hadoop.Path(path)).getLength())
        return int(row.nb), int(row.nh), nbytes

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        hadoop, fs = _fs(spark, state_path)
        P = hadoop.Path
        if n_partitions is not None:
            _repair_partitioned_state(spark, state_path, "bigrams")
            old = _read_state_stats(spark, state_path)
            _layout_guard(old, n_partitions, "ngram-lm", state_path)
            if _redelivery_guard(
                old, batch_id, run_id, "ngram-lm", state_path
            ):
                return
            exists = old is not None
        else:
            tmp, trash = state_path + ".__tmp", state_path + ".__trash"
            if not fs.exists(P(state_path)) and fs.exists(P(trash)):
                _rename_or_raise(
                    fs, P(trash), P(state_path), "lm state repair"
                )
            exists = fs.exists(P(state_path))
            old = None
            if exists:
                old = (
                    spark.read.parquet(os.path.join(state_path, "stats"))
                    .collect()[0]
                    .asDict()
                )
                _layout_guard(old, None, "ngram-lm", state_path)
                if _redelivery_guard(
                    old, batch_id, run_id, "ngram-lm", state_path
                ):
                    return
        toks = tokens(F.col(text_col))
        agg = batch.select(
            corpus_digest_col(F.col(id_col)).alias("__h")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.bit_xor(F.col("__h")), F.lit(0)).alias("digest"),
        ).collect()[0]
        pairs = (
            batch.select(toks.alias("__toks"))
            .where(F.size("__toks") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__toks") - 1),
                        lambda p: F.struct(
                            F.element_at(F.col("__toks"), p).alias("w1"),
                            F.element_at(F.col("__toks"), p + 1).alias("w2"),
                        ),
                    )
                ).alias("pair")
            )
            .select("pair.w1", "pair.w2")
        )
        big_b = pairs.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        if exists:
            n_docs = int(old["n_docs"]) + int(agg.n)
            old_digest = old.get("corpus_digest")
            digest = (
                None
                if old_digest is None
                else int(old_digest) ^ int(agg.digest)
            )
        else:
            n_docs, digest = int(agg.n), int(agg.digest)

        def _stats_df(nb: int, nh: int, nbytes: int):
            return spark.createDataFrame(
                [
                    (
                        n_docs,
                        int(batch_id),
                        digest,
                        run_id,
                        nb,
                        nh,
                        nbytes,
                        None if n_partitions is None else int(n_partitions),
                    )
                ],
                "n_docs bigint, max_batch_id bigint, "
                "corpus_digest bigint, run_id string, "
                "n_bigrams bigint, n_hapax bigint, state_bytes bigint, "
                "n_partitions int",
            )

        if n_partitions is not None:
            _merge_partitioned_counts(
                spark,
                state_path,
                "bigrams",
                big_b,
                ["w1", "w2"],
                "c",
                batch_id,
                n_partitions,
            )
            live = os.path.join(state_path, "bigrams")
            nb, nh, nbytes = _size_metrics(
                spark.read.parquet(live).select("c"), fs, hadoop, live
            )
            _commit_stats(spark, state_path, _stats_df(nb, nh, nbytes))
            return
        if exists:
            bigrams = (
                spark.read.parquet(os.path.join(state_path, "bigrams"))
                .withColumnRenamed("c", "__old")
                .join(big_b.withColumnRenamed("c", "__new"), ["w1", "w2"], "full")
                .select(
                    "w1",
                    "w2",
                    (
                        F.coalesce(F.col("__old"), F.lit(0))
                        + F.coalesce(F.col("__new"), F.lit(0))
                    ).cast("bigint").alias("c"),
                )
            )
        else:
            bigrams = big_b
        fs.delete(P(tmp), True)
        bigrams.write.mode("overwrite").parquet(os.path.join(tmp, "bigrams"))
        # metrics over the staged (about-to-commit) table — read back
        # the columnar file rather than recomputing the merge lineage
        nb, nh, nbytes = _size_metrics(
            spark.read.parquet(os.path.join(tmp, "bigrams")).select("c"),
            fs,
            hadoop,
            os.path.join(tmp, "bigrams"),
        )
        _stats_df(nb, nh, nbytes).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "stats")
        )
        fs.delete(P(trash), True)
        if exists:
            _rename_or_raise(fs, P(state_path), P(trash), "lm state swap")
        _rename_or_raise(fs, P(tmp), P(state_path), "lm state swap")
        fs.delete(P(trash), True)

    return merge_batch


def start_ngram_lm_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
    n_partitions: int | None = None,
) -> StreamingQuery:
    """Incremental bigram-LM statistics maintenance (r18): the
    reference corpus a CCNet-style perplexity filter scores against is
    itself a maintained artifact — foreachBatch folds doc micro-batches
    into the raw-count state generation
    (:func:`ngram_lm_batch_merger`), and
    :func:`ngram_lm_from_state` loads it with the ``min_count`` cut
    applied consistently. Same guarantees as the BM25 stats stream:
    stage-then-rename generations, max_batch_id exactly-once, run-id
    lineage guard; served scores pinned row-identical to the batch
    computation (``TestNgramLmStream``)."""
    writer = stream.writeStream.foreachBatch(
        ngram_lm_batch_merger(
            state_path,
            id_col,
            text_col,
            run_id=checkpoint_dir,
            n_partitions=n_partitions,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_dedup_batch_writer(
    old_df: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
    old_bucket_cap: int | None = None,
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body of ``start_incremental_dedup_stream``,
    exposed so replay idempotency is directly testable: calling it twice
    with the same ``batch_id`` must leave the sink unchanged.

    With ``observe_caps=True`` the ``old_bucket_cap`` guard's census
    rides each batch's write action and is DRAINED per batch — the
    capstats queue is thread-scoped, and foreachBatch bodies run on
    stream-execution threads, so attach and drain pair up inside this
    body by construction. Drained stats go to the log and, when given,
    to ``cap_stats_sink(batch_id, stats)`` — a production stream is
    exactly where silent recall loss accumulates, so the cap census is
    surfaced per trigger, not once at setup."""
    from pyspark.sql import functions as F

    from homelogging_spark.functions.cachelife import cache_scope
    from homelogging_spark.operators.dedup import incremental_dedup

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        import contextlib

        from homelogging_spark.functions.capstats import (
            cap_observation_scope,
            discard_cap_stats,
            drain_cap_stats,
        )

        if observe_caps:
            # batch-entry hygiene: CPython reuses thread idents, so a
            # stream-execution thread can inherit the undrained queue
            # of a dead predecessor — clear it before attaching this
            # batch's observations or the drain below misattributes
            # (or times out on) someone else's census
            discard_cap_stats()
        # cap_observation_scope: a zero-candidate micro-batch otherwise
        # lets AQE empty-relation propagation drop the executed census
        # stage from the final plan, completing the observation with an
        # empty row (drain reports 'pruned' instead of the census).
        # batch.sparkSession is the stream-private cloned session, so
        # the conf toggle cannot race another query.
        obs_scope = (
            cap_observation_scope(batch.sparkSession)
            if observe_caps
            else contextlib.nullcontext()
        )
        # cache_scope (not release_caches): foreachBatch runs on a
        # stream execution thread, and the global release would
        # unpersist a CONCURRENT job's tracked frames mid-computation.
        with obs_scope, cache_scope():
            try:
                out = incremental_dedup(
                    batch,
                    old_df,
                    id_col=id_col,
                    text_col=text_col,
                    shingle_n=shingle_n,
                    n_hashes=n_hashes,
                    n_bands=n_bands,
                    threshold=threshold,
                    old_bucket_cap=old_bucket_cap,
                    observe_caps=observe_caps,
                ).withColumn("batch_id", F.lit(int(batch_id)))
                # per-WRITE dynamic overwrite (not the session conf — a
                # scoped session-conf toggle can race a concurrent writer
                # in the same session back to static mode, turning the
                # partition rewrite into a full-sink wipe)
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(out_path)
                )
            except BaseException:
                # the observed plan will never execute now — drop the
                # attachments without burning the drain timeout, so the
                # queue can't leak to a reused thread ident
                if observe_caps:
                    discard_cap_stats()
                raise
            if observe_caps:
                # the write above executed the observed plan; the
                # timeout is a backstop so a short-circuited batch
                # (e.g. an empty micro-batch pruned by AQE) can never
                # wedge the stream thread; drain_cap_stats itself is
                # fail-open — a metrics error surfaces as an 'error'
                # row, never as a stream-terminating exception
                stats = drain_cap_stats(timeout_s=60)
                if cap_stats_sink is not None:
                    cap_stats_sink(int(batch_id), stats)

    return write_batch


def start_incremental_dedup_stream(
    stream: DataFrame,
    old_df: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
    old_bucket_cap: int | None = None,
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming NEAR-dup gate against the retained corpus — the MinHash
    complement of ``streaming_snapshot_dedup``'s exact hash check,
    completing the hygiene gate set (exact / Bloom-pre-gated exact /
    semantic / banded-LSH near).

    Why ``foreachBatch`` and not a transformation: the banded verdict is
    existential PER DOC over its band-bucket matches (a doc is a
    near-dup when ANY of its bands collides with an old doc's band AND
    the hashed-shingle Jaccard verifies) — after the mandatory band
    explode that is a stream-side groupBy, which append mode forbids;
    and a semi-join formulation would need an array-contains join
    condition that degrades the banded equi-join to a nested-loop scan
    of the corpus band table. ``foreachBatch`` gives each micro-batch
    full batch semantics, so the certified ``dedup.incremental_dedup``
    runs unchanged (old-vs-old pairs never form), and the drained sink
    equals the batch operator over all streamed docs exactly — the
    verdict for a doc depends only on (doc, retained corpus), never on
    batch boundaries.

    Exactly-once: the sink is partitioned by ``batch_id`` and written
    with dynamic partition overwrite, so an at-least-once foreachBatch
    replay after a crash rewrites its own partition with identical rows
    instead of appending duplicates (pinned by calling the writer twice
    in ``TestStreamingIncrementalDedup``).

    Scale note (same contract as the batch operator): ``old_df`` is
    re-planned every micro-batch, so pass the retained corpus's
    maintained tables — at production scale the digest + signature
    frames ingest materializes — rather than re-deriving text-side
    shingles per batch. Caveat on "re-planned": per-batch re-planning
    re-resolves CATALOG tables (``spark.table``/Delta), so appends to
    the retained corpus are picked up between batches only in that
    form; a path-loaded frame (``spark.read.parquet``) caches its file
    listing in the plan's InMemoryFileIndex, so files appended after
    the stream starts are NOT seen until the frame is re-resolved."""
    writer = stream.writeStream.foreachBatch(
        incremental_dedup_batch_writer(
            old_df,
            out_path,
            id_col=id_col,
            text_col=text_col,
            shingle_n=shingle_n,
            n_hashes=n_hashes,
            n_bands=n_bands,
            threshold=threshold,
            old_bucket_cap=old_bucket_cap,
            observe_caps=observe_caps,
            cap_stats_sink=cap_stats_sink,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _gate_write_batch(
    annotate,
    out_path: str,
    guard: str,
    gate_metrics,
    observe_caps: bool,
    cap_stats_sink: Callable[[int, list[dict]], None] | None,
) -> Callable[[DataFrame, int], None]:
    """Shared foreachBatch body for the stateless hygiene gates
    (exact snapshot / Bloom-pre-gated): annotate the micro-batch,
    write it exactly-once (batch_id-partitioned dynamic overwrite),
    and — with ``observe_caps=True`` — ride per-batch gate stats on
    the write action and drain them to the log / ``cap_stats_sink``,
    the uniform observability surface of the near-dup gate's writer.

    Unlike the near-dup census (a carrier-joined side branch that AQE
    can prune on zero-candidate batches), the gate stats here observe
    the OUTPUT frame itself — the write consumes it, so the observe
    node is the plan's top and cannot be optimized out; no
    ``cap_observation_scope`` needed."""
    from pyspark.sql import functions as F

    from homelogging_spark.functions.cachelife import cache_scope
    from homelogging_spark.functions.capstats import (
        discard_cap_stats,
        drain_cap_stats,
        observe_metrics,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if observe_caps:
            discard_cap_stats()  # thread-ident reuse hygiene
        with cache_scope():
            try:
                out = annotate(batch).withColumn(
                    "batch_id", F.lit(int(batch_id))
                )
                if observe_caps:
                    out = observe_metrics(
                        out, guard, gate_metrics(), session_of=batch
                    )
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(out_path)
                )
            except BaseException:
                if observe_caps:
                    discard_cap_stats()
                raise
            if observe_caps:
                stats = drain_cap_stats(timeout_s=60)
                if cap_stats_sink is not None:
                    cap_stats_sink(int(batch_id), stats)

    return write_batch


def snapshot_dedup_batch_writer(
    old_digests: DataFrame,
    out_path: str,
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body of :func:`start_snapshot_dedup_stream` —
    the exact gate in the writer form of
    :func:`incremental_dedup_batch_writer`, with the same
    ``observe_caps``/``cap_stats_sink`` surface: per batch a
    ``snapshot_gate`` row ``{rows, exact_dups, kept}`` rides the write
    action (zero extra jobs; the exact gate has no cap to fire, so the
    observable is gate throughput — a dup-rate collapse or spike is the
    silent-failure signal for a seen-set gate: it means the digest
    table stopped reflecting the retained corpus)."""
    from pyspark.sql import functions as F

    def metrics():
        return {
            "rows": F.count(F.lit(1)),
            "exact_dups": F.sum(F.col("exact_dup").cast("long")),
            "kept": F.sum(F.col("keep").cast("long")),
        }

    return _gate_write_batch(
        lambda batch: streaming_snapshot_dedup(batch, old_digests),
        out_path,
        "snapshot_gate",
        metrics,
        observe_caps,
        cap_stats_sink,
    )


def start_snapshot_dedup_stream(
    stream: DataFrame,
    old_digests: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Started-stream form of :func:`streaming_snapshot_dedup` with the
    exactly-once partitioned sink and per-batch gate observability of
    :func:`start_incremental_dedup_stream` — completing the uniform
    ``observe_caps`` surface across all four hygiene gates (exact /
    Bloom-pre-gated exact / semantic / banded-LSH near)."""
    writer = stream.writeStream.foreachBatch(
        snapshot_dedup_batch_writer(
            old_digests,
            out_path,
            observe_caps=observe_caps,
            cap_stats_sink=cap_stats_sink,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bloom_dedup_batch_writer(
    old_digests: DataFrame,
    out_path: str,
    m_bits: int = 1 << 20,
    j: int = 5,
    salt: str = "bloom",
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body of :func:`start_bloom_dedup_stream`.

    The filter is built ONCE here (factory time, ``tracked_persist`` +
    count — NOT per batch: rebuilding the word table every trigger
    would out-cost the exact join it exists to skip), so the writer
    closes over the same broadcastable word table for every batch.

    Observability (``observe_caps=True``):

    - setup: one ``bloom_fill`` row ``{m_bits, n_words, bits_set,
      fill_ratio, est_fpr}`` from the already-materialized word table
      (``bit_count`` over ≤ m_bits/63 cached rows — negligible),
      delivered to ``cap_stats_sink`` with ``batch_id = -1``. This is
      the gate's silent-degradation dial: the filter is sized once,
      but the corpus keeps growing — fill ratio drift is exactly the
      "cap quietly eroding" failure mode, here as FPR erosion
      (est_fpr = fill_ratio**j) that turns the pre-gate into a
      pass-through and the exact join back into the bottleneck.
    - per batch: a ``bloom_gate`` row ``{rows, bloom_probed,
      exact_dups, bloom_false_pos}`` rides the write action —
      ``bloom_false_pos/bloom_probed`` is the OBSERVED FPR, the
      ground truth the est_fpr dial predicts."""
    from pyspark.sql import functions as F

    from homelogging_spark.functions.cachelife import tracked_persist
    from homelogging_spark.operators.sketches import bloom_build

    digests = old_digests.select("content_hash").distinct()
    filt = tracked_persist(bloom_build(digests, "content_hash", m_bits, j, salt))
    filt.count()
    if observe_caps:
        fill = filt.agg(
            F.count(F.lit(1)).alias("n_words"),
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0)).alias("bits_set"),
        ).collect()[0]
        ratio = fill.bits_set / float(m_bits)
        row = {
            "guard": "bloom_fill",
            "m_bits": int(m_bits),
            "n_words": int(fill.n_words),
            "bits_set": int(fill.bits_set),
            "fill_ratio": ratio,
            "est_fpr": ratio**j,
        }
        LOG.info(
            "bloom gate filter: %.1f%% full, est FPR %.2e",
            100 * ratio,
            row["est_fpr"],
        )
        if cap_stats_sink is not None:
            cap_stats_sink(-1, [row])

    def metrics():
        probed = F.col("bloom_probed").cast("long")
        return {
            "rows": F.count(F.lit(1)),
            "bloom_probed": F.sum(probed),
            "exact_dups": F.sum(F.col("exact_dup").cast("long")),
            "bloom_false_pos": F.sum(
                (F.col("bloom_probed") & ~F.col("exact_dup")).cast("long")
            ),
        }

    return _gate_write_batch(
        lambda batch: _bloom_gate(batch, digests, filt, m_bits, j, salt),
        out_path,
        "bloom_gate",
        metrics,
        observe_caps,
        cap_stats_sink,
    )


def start_bloom_dedup_stream(
    stream: DataFrame,
    old_digests: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 20,
    j: int = 5,
    salt: str = "bloom",
    observe_caps: bool = False,
    cap_stats_sink: Callable[[int, list[dict]], None] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Started-stream form of :func:`streaming_bloom_dedup` — same
    exactly-once sink and ``observe_caps`` surface as the other gate
    writers, plus the setup-time ``bloom_fill`` saturation row (see
    :func:`bloom_dedup_batch_writer`)."""
    writer = stream.writeStream.foreachBatch(
        bloom_dedup_batch_writer(
            old_digests,
            out_path,
            m_bits=m_bits,
            j=j,
            salt=salt,
            observe_caps=observe_caps,
            cap_stats_sink=cap_stats_sink,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_bloom_dedup(
    stream: DataFrame,
    old_digests: DataFrame,
    m_bits: int = 1 << 20,
    j: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """``streaming_snapshot_dedup`` with a Bloom pre-gate — the 100 TB
    form of the seen-set check. The retained corpus's digest table may
    hold billions of 16-byte keys (too big to broadcast, so the exact
    anti-hit is a SHUFFLE join per micro-batch); its Bloom filter is
    m_bits/8 bytes REGARDLESS of corpus size and broadcasts once.

    Per micro-batch each doc is probed against the broadcast filter
    (``sketches.bloom_contains_inline`` — stateless, streaming-legal):

    - ``bloom_probed = false`` ⇒ definitely new (no false negatives):
      the exact join's condition short-circuits, so these rows null-
      extend WITHOUT matching against the digest table. For a mostly-
      novel stream this is most rows.
    - ``bloom_probed = true`` ⇒ duplicate OR false positive
      (FPR-bounded): resolved by the exact digest join.

    The OUTPUT is therefore bit-identical to
    ``streaming_snapshot_dedup`` (pinned in tests) — the filter changes
    the plan, never the answer; ``bloom_probed`` is emitted so the
    saved exact-join traffic is observable per batch.
    """
    from pyspark.sql import functions as F

    from homelogging_spark.operators.sketches import (
        bloom_build,
        bloom_contains_inline,
    )

    digests = old_digests.select("content_hash").distinct()
    # MATERIALIZE the word table before the stream starts:
    # bloom_contains_inline references it in j differently-aliased
    # broadcast joins, and a lazy plan would re-execute the full digest
    # scan + distinct + bit-OR aggregation once per alias per
    # micro-batch — for a billions-of-digests corpus that costs more
    # than the exact join the filter exists to skip (r7 ADVICE). The
    # persisted frame is ≤ ceil(m_bits/63) rows by construction; the
    # count() forces it now, so every micro-batch's j broadcasts read
    # the cached table. tracked_persist so a caller's release_caches()
    # after the stream stops frees it (a mid-stream release only costs
    # one recompute, never correctness).
    from homelogging_spark.functions.cachelife import tracked_persist

    filt = tracked_persist(bloom_build(digests, "content_hash", m_bits, j, salt))
    filt.count()
    return _bloom_gate(stream, digests, filt, m_bits, j, salt)


def _bloom_gate(
    frame: DataFrame,
    digests: DataFrame,
    filt: DataFrame,
    m_bits: int,
    j: int,
    salt: str,
) -> DataFrame:
    """The Bloom-pre-gated exact-dedup annotate step shared by the
    stream transformation (:func:`streaming_bloom_dedup`) and the
    per-batch writer (:func:`bloom_dedup_batch_writer`): probe the
    broadcast word table, then resolve probed rows with the exact
    digest join whose condition short-circuits on ``bloom_probed``."""
    from pyspark.sql import functions as F

    from homelogging_spark.operators.sketches import bloom_contains_inline

    hashed = frame.withColumn("content_hash", F.md5(F.col("text")))
    probed = bloom_contains_inline(
        hashed, filt, "content_hash", m_bits, j, salt
    ).withColumnRenamed("maybe_present", "bloom_probed")
    right = digests.withColumn("_hit", F.lit(True))
    hit = F.coalesce(F.col("_hit"), F.lit(False))
    return (
        probed.join(
            right,
            (probed["content_hash"] == right["content_hash"])
            & F.col("bloom_probed"),
            "left",
        )
        .select(
            "doc_id",
            "text",
            "bloom_probed",
            hit.alias("exact_dup"),
            (~hit).alias("keep"),
        )
    )


def streaming_windowed_cm(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    watermark: str = "10 minutes",
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Per-event-time-window count-min registers with watermark-driven
    finalization — the trending-keys shape ("what was hot each hour").

    The batch ``cm_sketch`` composes with streaming in complete mode,
    but complete re-emits the ENTIRE register table every micro-batch —
    unbounded output over time. This form groups by
    ``window(ts, bucket)`` alongside the register coordinates and runs
    in APPEND mode: late rows inside the watermark still amend their
    window's registers; once the watermark passes a window closes and
    its ≤ depth·width register rows emit exactly once. State is
    bounded at open_windows × depth × width regardless of key
    cardinality — the sketch keeps the per-window state constant where
    exact per-key counting would grow with the vocabulary.

    Downstream, each finalized window's registers answer point queries
    via ``sketches.cm_query`` and roll up across windows via
    ``sketches.cm_merge`` (register-sum) without rescanning events —
    the same merge law the batch pins certify.

    Output: ``window_start, window_end, row, col, cnt``.
    """
    from pyspark.sql import functions as F

    from homelogging_spark.operators.sketches import _hash52 as _sk_hash52

    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                (_sk_hash52(key, f"{salt}|{r}") % width).cast("int").alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(coords).alias("c"))
        .groupBy(
            F.window(ts_col, bucket).alias("w"),
            F.col("c.row").alias("row"),
            F.col("c.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "row",
            "col",
            "cnt",
        )
    )
