"""Mergeable set sketches: KMV (k-minimum-values) and count-min.

Completes the engine's mergeable-sketch family for 100 TB rollups:

- ``hll_distinct_rollup`` (plans/registry.py) answers *how many
  distinct* per group and merges by register-max — but HLL can only
  UNION. The **KMV / theta sketch** here (Bar-Yossef et al. 2002; Beyer
  et al. SIGMOD 2007 "On synopses for distinct-value estimation") also
  estimates **intersections and Jaccard** between groups — the question
  a corpus curator actually asks ("how much does source A overlap
  source B?") without ever forming the cross join.
- ``histogram_quantile_rollup`` merges quantile histograms by
  bucket-sum; the **count-min sketch** here (Cormode & Muthukrishnan
  2005) is the frequency analogue: a constant-size ``depth × width``
  counter table answering per-key frequency queries with a one-sided
  (over-estimate only) error, merged by element-wise register sum.

Determinism contract (same as the HLL rollup): every hash derives from
md5 of a salted key — no RNG, no seed to ship — so register tables,
sketch arrays, estimates, and merges are bit-for-bit replicable in any
engine with ``md5`` (the ``*_sql`` twins emit the DuckDB form; r8
registers the driver queries in the two spare window slots).

Scale design:

- **KMV build** shuffles ``(group, 52-bit hash)`` pairs — never the
  values themselves — with a map-side ``distinct`` combine; the
  per-group k-selection sorts only each group's distinct hashes. The
  sketch is one array<bigint> row per group (k·8 bytes), so any
  downstream set algebra (union, intersection, Jaccard, pairwise
  overlap matrices) runs on dim-sized data with array expressions.
- **KMV merge is closed**: k smallest of the concatenated sketches is
  EXACTLY the sketch of the concatenated inputs (pinned in tests) —
  per-partition / per-day sketches roll up without rescanning raw data.
- **Count-min build** explodes ``depth`` register coordinates per row,
  but the groupBy partial-aggregates map-side to at most depth·width
  counters per task before the shuffle — the exchange carries
  registers, not rows. Point queries broadcast the register table
  (depth·width rows) onto the key panel; merge = register-wise sum.

Reference scope note: the reference system never needed set sketches
(its corpus is one household's telemetry); this module is part of the
LLM-training-data tier (SURVEY.md "beyond the reference" extensions),
sitting beside the dedup/similarity operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from homelogging_spark.operators.sampling import _U_DENOM

# 52-bit hash domain (first 13 md5 hex digits) — the same convention as
# sampling.uniform_from_key, kept as BIGINT so ordering/dedup are exact.


def _hash52(key: Column, salt: str) -> Column:
    hx = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return F.conv(F.substring(hx, 1, 13), 16, 10).cast("bigint")


def _hash52_sql(key: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}|' || CAST({key} AS VARCHAR)), 1, 13) "
        f"AS BIGINT)"
    )


# --- KMV / theta sketch --------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
    salt: str = "kmv",
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 52-bit hashes of
    ``key_col``, as one sorted array<bigint> row per group.

    Output: ``group_cols... , kmv array<bigint>, n_kept bigint`` where
    ``n_kept < k`` means the group had fewer than k distinct keys and
    the sketch IS the exact distinct hash set.

    Plan (two-stage salted k-selection — output independent of
    ``n_salts``, pinned): a single per-group window would sort EVERY
    distinct hash of a group in one task — with few large groups (or
    no groups at all, where it degrades to a global window) that is
    the single-task funnel ``curriculum_order`` had to shed. Instead
    stage 1 selects k-smallest per (group, hash % n_salts) — n_salts×
    the parallelism, and each of a group's k global minima is
    necessarily in its own bucket's top-k, so the union of bucket
    winners is a superset of the answer; stage 2 re-selects k over the
    ≤ n_salts·k survivors per group, a bounded sort. Shuffles: the
    map-side-combined distinct on (group, hash), then two bounded
    exchanges.
    """
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, _hash52(F.col(key_col), salt).alias("__h")
    ).distinct()
    w1 = Window.partitionBy(
        *group_cols, (F.col("__h") % n_salts).alias("__s")
    ).orderBy("__h")
    survivors = (
        hashed.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*group_cols or [F.lit(1)]).orderBy("__h")
    kept = survivors.withColumn("__rn", F.row_number().over(w2)).where(
        F.col("__rn") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )


def kmv_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV array: exact ``size`` when the
    sketch is unsaturated, else ``(k-1) / u_(k)`` with ``u_(k)`` the
    k-th smallest hash scaled to (0,1). Pure double arithmetic — the
    oracle twin evaluates the identical expression."""
    kth_u = F.element_at(kmv, k).cast("double") / F.lit(_U_DENOM)
    return F.when(F.size(kmv) < k, F.size(kmv).cast("double")).otherwise(
        F.lit(float(k - 1)) / kth_u
    )


def kmv_estimate_sql(kmv: str, k: int) -> str:
    return (
        f"CASE WHEN len({kmv}) < {k} THEN CAST(len({kmv}) AS DOUBLE) "
        f"ELSE {float(k - 1)} / (CAST(({kmv})[{k}] AS DOUBLE) / {_U_DENOM}) END"
    )


def kmv_merge_arrays(a: Column, b: Column, k: int) -> Column:
    """Union-merge two KMV arrays: k smallest of the deduplicated
    concatenation. CLOSED under the sketch definition — identical to
    sketching the concatenated raw inputs (pinned in tests)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_merge_arrays_sql(a: str, b: str, k: int) -> str:
    return f"list_slice(list_sort(list_distinct(list_concat({a}, {b}))), 1, {k})"


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
    candidates_only: bool = False,
) -> DataFrame:
    """Pairwise set-overlap estimates between every two groups, from
    sketches alone (Beyer et al. 2007 §4): for groups A, B with sketch
    arrays S_A, S_B,

    - L = the k smallest of S_A ∪ S_B  (= the KMV sketch of A ∪ B),
    - ``union_est``    from ``kmv_estimate(L)``,
    - ``jaccard_est``  = |L ∩ S_A ∩ S_B| / |L|  (fraction of the union
      sample that landed in both sets — L is a uniform sample of the
      union's hash domain),
    - ``intersection_est`` = jaccard_est · union_est.

    Input is the ``kmv_sketch`` output (one row per group): the pair
    join is dim-sized — |G|² sketch rows, never corpus rows. Standard
    error ~ 1/√k on the Jaccard; callers pick k for the tolerance.

    Plan shape (``candidates_only=False``, right for up to a few
    hundred groups): the right side is an explicit ``broadcast`` so the
    non-equi pair condition plans a BroadcastNestedLoopJoin over the
    dim-sized sketch table (the adjudicated constant-side-broadcast
    shape) — NEVER a CartesianProduct, whose |partsₐ|·|partsᵦ| task
    grid costs ~10 s of pure scheduling overhead even for 20 groups.
    The merged sketch ``L`` and the counts over it are staged through
    intermediate projections so each is evaluated once per pair, not
    re-expanded inside every downstream estimate expression.

    ``candidates_only=True`` is the MANY-groups scale path (10k groups
    → 50M all-pairs is exactly the blow-up the dedup tier's banded
    joins exist to avoid): candidate pairs come from an EQUI join on
    the exploded sketch elements — two groups pair iff they share at
    least one sketch hash — so the pair space is bounded by shared-
    element co-occurrence, not |G|². A pair sharing no sketch hash has
    ``n_both_in_sample = 0`` (jaccard_est 0, the sketch's resolution
    floor), so the omitted rows are exactly the no-evidence-of-overlap
    pairs; every emitted row is IDENTICAL to the all-pairs form
    (pinned). Dial guidance (measured, SCALE.md): the pruning only
    bites when group CONTENTS are mostly disjoint — per-shard digest
    sets, URL partitions — where it collapses the output to the true
    overlap structure (25 of 124 750 pairs at 500 digest groups).
    Shared-vocabulary token sketches share hashes almost surely, so
    every pair survives and the candidate join is pure overhead — keep
    the default there. Skew note: a hash shared by m groups
    contributes C(m, 2) candidates; an all-groups-identical corpus
    degrades to the full pair set, which is then the true answer.
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("kmv_a")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("kmv_b")
    )
    if candidates_only:
        elems = sketches.select(
            F.col(group_col).alias("g"), F.explode("kmv").alias("__h")
        )
        cand = (
            elems.select(F.col("g").alias("group_a"), "__h")
            .join(
                elems.select(F.col("g").alias("group_b"), "__h"),
                "__h",
            )
            .where(F.col("group_a") < F.col("group_b"))
            .select("group_a", "group_b")
            .distinct()
        )
        pairs = cand.join(F.broadcast(a), "group_a").join(
            F.broadcast(b), "group_b"
        )
    else:
        pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    staged = pairs.select(
        "group_a",
        "group_b",
        kmv_merge_arrays(F.col("kmv_a"), F.col("kmv_b"), k).alias("__l"),
        F.array_intersect(F.col("kmv_a"), F.col("kmv_b")).alias("__both"),
    ).select(
        "group_a",
        "group_b",
        F.size("__l").alias("__n_l"),
        F.size(F.array_intersect(F.col("__l"), F.col("__both"))).alias(
            "__n_both"
        ),
        kmv_estimate(F.col("__l"), k).alias("union_est"),
    )
    jac = F.col("__n_both").cast("double") / F.col("__n_l").cast("double")
    return staged.select(
        "group_a",
        "group_b",
        F.col("__n_l").cast("bigint").alias("n_union_sample"),
        F.col("__n_both").cast("bigint").alias("n_both_in_sample"),
        "union_est",
        jac.alias("jaccard_est"),
        (jac * F.col("union_est")).alias("intersection_est"),
    )


# --- count-min sketch ----------------------------------------------------------


def _cm_col(key: Column, row: int, width: int, salt: str) -> Column:
    """Register column for hash row ``row``: md5('<salt>|<row>|' || key)
    taken as a 52-bit integer mod width. Rows are independent salted
    hashes — the standard pairwise-independent family substitute, same
    trick as the MinHash permutations."""
    return _hash52(key, f"{salt}|{row}") % width


def _cm_col_sql(key: str, row: int, width: int, salt: str) -> str:
    return f"({_hash52_sql(key, f'{salt}|{row}')} % {width})"


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min register table: ``(row, col, cnt)`` with exactly
    depth·width possible coordinates. ``weight_col`` switches from
    counting rows to summing a non-negative weight (e.g. token counts).

    The explode is depth rows per input row, but partial aggregation
    collapses each task's contribution to ≤ depth·width counters before
    the exchange — the shuffle is register-sized regardless of input
    rows. Merging two sketches = unioning their register tables and
    re-summing (pinned in tests).
    """
    key = F.col(key_col)
    wt = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    coords = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cm_col(key, r, width, salt).cast("int").alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"), wt.alias("__w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise register sum — the count-min merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cm_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Frequency estimate per key: min over the key's ``depth`` register
    cells. The register table (≤ depth·width rows) is broadcast; the
    key panel streams through one scan + a bounded-fanout join. The
    estimate NEVER under-counts (the count-min guarantee; pinned).

    ``carry_cols``: extra ``keys`` columns carried through the probe
    verbatim (functionally dependent on the key, e.g. its exact count)
    — this lets a caller probe ON its key frame instead of joining the
    estimate back, which would embed the key frame's subtree twice
    (guide §2.4)."""
    carry = list(carry_cols)
    key = F.col(key_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                _cm_col(key, r, width, salt).cast("int").alias("col"),
            )
            for r in range(depth)
        ]
    )
    exploded = keys.select(key_col, *carry, F.explode(coords).alias("c")).select(
        key_col, *carry, F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    joined = exploded.join(F.broadcast(sketch), ["row", "col"], "left").select(
        key_col,
        *carry,
        F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")).alias("cnt"),
    )
    return joined.groupBy(key_col, *carry).agg(F.min("cnt").alias("cm_est"))


def heavy_hitters_report(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Top-k frequent keys with the count-min estimate and its
    overestimate alongside the exact count — the honesty-column
    convention (`hll_distinct_rollup`'s rel_err). The exact pass is a
    partial-agg + TakeOrderedAndProject (same shape as ``topk_ngrams``);
    the sketch pass is the constant-size structure a 100 TB rollup
    would keep per partition/day and merge.

    Output: ``key, n_exact, cm_est, overestimate`` (≥ 0 always).
    """
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.col(key_col))
        .limit(k)
    )
    sk = cm_sketch(df, key_col, depth, width, salt)
    # r21 (guide §2.4): probe ON the exact frame, carrying n_exact —
    # the former exact.join(est) embedded the exact top-k subtree (a
    # full scan + aggregation of df) twice, once as the join's left
    # side and once under the probe.
    est = cm_query(
        sk, exact, key_col, depth, width, salt, carry_cols=["n_exact"]
    )
    return (
        est.select(
            key_col,
            "n_exact",
            F.col("cm_est").cast("bigint").alias("cm_est"),
            (F.col("cm_est") - F.col("n_exact")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("n_exact"), F.col(key_col))
    )


# --- Bloom filter --------------------------------------------------------------
#
# The membership member of the summary family (HLL answers cardinality,
# KMV set algebra, count-min frequency, the histogram rollup quantiles;
# Bloom answers "have we seen this key?"). The canonical 100 TB use is
# the crawl/ingest seen-set: gate an incoming key stream against the
# retained corpus WITHOUT joining the full digest table — the filter is
# m bits regardless of corpus size, broadcasts to every executor, and
# never returns a false negative, so only "maybe" keys proceed to the
# exact digest join (`dedup.incremental_dedup`'s anti-hit stage).
#
# Words hold 63 bits (positions 0..62): bit 63 is the BIGINT sign bit,
# and signed-shift semantics at the sign boundary are the one place
# Spark and DuckDB could diverge — excluded by construction so the
# register tables are bit-identical in both engines.

_BLOOM_WORD_BITS = 63


def _bloom_positions(key: Column, j: int, m_bits: int, salt: str) -> list[Column]:
    """j independent bit positions in [0, m_bits) — salted md5 per hash
    function, the same family substitute as count-min's rows."""
    return [_hash52(key, f"{salt}|{i}") % m_bits for i in range(j)]


def _bloom_positions_sql(key: str, j: int, m_bits: int, salt: str) -> list[str]:
    return [f"({_hash52_sql(key, f'{salt}|{i}')} % {m_bits})" for i in range(j)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    j: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter as a word table ``(word int, bits bigint)`` with
    at most ceil(m_bits/63) rows. The explode is j positions per input
    row, but the groupBy partial-aggregates bit-OR map-side, so the
    exchange carries ≤ word-table-sized data per task regardless of
    input rows (the count-min shape). Merge two filters built with the
    same (m_bits, j, salt) via ``bloom_merge``."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_bloom_positions(key, j, m_bits, salt))).alias("__p")
    return (
        df.select(pos)
        .select(
            (F.col("__p") / _BLOOM_WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, CAST(__p % {_BLOOM_WORD_BITS} AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Word-wise bit-OR — union semantics, closed under the filter
    definition (merge of builds == build of the concatenated inputs,
    pinned in tests)."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    filt: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    j: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Membership probe: ``key, maybe_present boolean``. False ⇒ the key
    was DEFINITELY never inserted (no false negatives — pinned); True ⇒
    present with false-positive rate ≈ (1 - e^{-jn/m})^j, the caller's
    dial via m_bits/j. The word table broadcasts; the key panel streams
    through one scan + a j-fanout join + an all-bits-set gate."""
    key = F.col(key_col)
    coords = keys.select(
        key_col,
        F.explode(F.array(*_bloom_positions(key, j, m_bits, salt))).alias("__p"),
    ).select(
        key_col,
        (F.col("__p") / _BLOOM_WORD_BITS).cast("int").alias("word"),
        (F.col("__p") % _BLOOM_WORD_BITS).cast("int").alias("__bit"),
    )
    probed = coords.join(F.broadcast(filt), ["word"], "left").select(
        key_col,
        F.coalesce(
            F.getbit(F.col("bits"), F.col("__bit")) == 1, F.lit(False)
        ).alias("__hit"),
    )
    return probed.groupBy(key_col).agg(
        F.min("__hit").alias("maybe_present")
    )


def bloom_word_sql(key: str, j: int, m_bits: int, salt: str) -> str:
    """DuckDB twin of one key's (word, mask) coordinate set as a list of
    STRUCT(word, mask) — unnest it to replicate ``bloom_build``'s
    register table bit-for-bit."""
    items = ", ".join(
        f"{{'word': CAST({p} // {_BLOOM_WORD_BITS} AS INT), "
        f"'mask': (CAST(1 AS BIGINT) << CAST({p} % {_BLOOM_WORD_BITS} AS INT))}}"
        for p in _bloom_positions_sql(key, j, m_bits, salt)
    )
    return f"[{items}]"


def bloom_contains_inline(
    df: DataFrame,
    filt: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    j: int = 5,
    salt: str = "bloom",
) -> DataFrame:
    """Stateless membership probe: ``df`` with a ``maybe_present``
    column appended — j broadcast hash joins against the word table,
    one per hash function, folded into a conjunction. No explode, no
    groupBy: unlike ``bloom_contains`` (the batch panel form) this
    keeps the input's row identity and is legal mid-stream (stream-
    static broadcast joins only; Structured Streaming forbids the
    aggregation the panel form uses). j is small (3-7) so the join
    chain is j probes of an ≤ m/63-row broadcast table."""
    out = df
    key = F.col(key_col)
    hits = []
    for i, pos_col in enumerate(_bloom_positions(key, j, m_bits, salt)):
        w, b, bits = f"__bw{i}", f"__bb{i}", f"__bbits{i}"
        out = (
            out.withColumn(w, (pos_col / _BLOOM_WORD_BITS).cast("int"))
            .withColumn(b, (pos_col % _BLOOM_WORD_BITS).cast("int"))
            .join(
                F.broadcast(
                    filt.select(
                        F.col("word").alias(w), F.col("bits").alias(bits)
                    )
                ),
                w,
                "left",
            )
        )
        hits.append(
            F.coalesce(F.getbit(F.col(bits), F.col(b)) == 1, F.lit(False))
        )
    maybe = hits[0]
    for h in hits[1:]:
        maybe = maybe & h
    drop = [c for i in range(j) for c in (f"__bw{i}", f"__bb{i}", f"__bbits{i}")]
    return out.withColumn("maybe_present", maybe).drop(*drop)
