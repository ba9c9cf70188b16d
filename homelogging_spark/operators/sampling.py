"""Deterministic sampling operators for training-corpus assembly.

A 100 TB corpus is never trained on wholesale: pipelines take stratified
samples (per-language/per-source rates), fixed-size per-group samples,
and domain-mixture reweights. All three need to be *deterministic* —
re-running the pipeline must pick the same rows (resumable jobs,
reproducible ablations) — so none of this uses ``rand()``. Selection is
driven by md5 of the row key, the same salted-hash trick the MinHash
tier uses (``functions/texthash.py``), which also makes every operator
here replicable in the DuckDB oracle bit-for-bit.

Scale: hash-filter sampling is a pure map-side column predicate (no
shuffle, pushdown-friendly); per-group top-k shuffles once on the group
key with partial top-k per map partition (Spark's window TopK); mixture
weights shuffle only partial aggregation state (one row per stratum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^52: first 13 md5 hex digits as a 52-bit integer — exactly
# representable in a double, so u = bits / 2^52 is exact dyadic math in
# any IEEE engine.
_U_DENOM = float(1 << 52)


def uniform_from_key(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1) from a row key: 52 bits of
    md5('<salt>|' || key) scaled by 2^-52. Mirrors :func:`uniform_sql`."""
    hx = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return F.conv(F.substring(hx, 1, 13), 16, 10).cast("bigint") / F.lit(_U_DENOM)


def uniform_sql(key: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}|' || CAST({key} AS VARCHAR)), 1, 13) "
        f"AS BIGINT) / {int(_U_DENOM)}.0"
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row iff its key-hash uniform is below its stratum's
    rate — a per-stratum Bernoulli sample that is a pure column
    predicate: no shuffle, no RNG state, stable under re-runs and
    repartitioning. ``u`` is exposed so downstream stages can take
    nested sub-samples (u < r2 < r1 composes)."""
    u = uniform_from_key(F.col(key_col), salt)
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.withColumn("u", u).where(F.col("u") < rate)


def split_assign(key: Column, fractions: dict[str, float], salt: str = "split") -> Column:
    """Deterministic train/val/test(/...) split assignment: the key's
    hash-uniform lands in cumulative fraction bands, in the dict's
    insertion order. A pure column expression — no shuffle, no RNG
    state, stable under re-runs, repartitioning, and corpus growth
    (a key's split never changes when other rows arrive, the property
    ``random_split`` cannot give).

    The LEAKAGE-SAFE usage is to key by the near-dup CLUSTER id
    (``clustering.assign_dedup_clusters``), not the doc id: every
    member of a duplicate cluster shares the cluster key, so a
    near-duplicate of a training doc can never land in the eval split —
    the train/test contamination path ``textops.contamination_scan``
    audits, closed off at split time.

    A NULL key yields NULL (not a silent bucket): without the explicit
    leading branch, a NULL uniform makes every band predicate NULL, so
    all NULL-key rows would fall through ``otherwise`` into the LAST
    split — concentrating exactly the rows with missing cluster ids in
    the eval split, the skew/leakage hazard this operator exists to
    prevent. Callers must either guarantee a non-null key or filter /
    quarantine the NULL-split rows explicitly."""
    _validate_fractions(fractions)
    u = uniform_from_key(key, salt)
    names = list(fractions)
    expr = F.when(key.isNull(), F.lit(None).cast("string"))
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        expr = expr.when(u < F.lit(acc), name)
    return expr.otherwise(names[-1])


def _validate_fractions(fractions: dict[str, float]) -> None:
    """Shared validation for :func:`split_assign` / :func:`split_assign_sql`."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if len(fractions) < 2:
        raise ValueError("need at least 2 splits")
    bad = {n: f for n, f in fractions.items() if not f > 0.0}
    if bad:  # a zero/negative band silently empties a split — reject
        raise ValueError(f"fractions must be > 0, got {bad}")


def _sql_str_literal(name: str) -> str:
    """Single-quoted SQL string literal with embedded quotes doubled —
    a split name like ``test's`` must not break (or inject into) the
    generated CASE expression."""
    return "'" + name.replace("'", "''") + "'"


def split_assign_sql(key: str, fractions: dict[str, float], salt: str = "split") -> str:
    """The same cumulative-band CASE as ANSI SQL (mirrors uniform_sql,
    including the NULL-key → NULL branch and quote-escaped names)."""
    _validate_fractions(fractions)
    u = uniform_sql(key, salt)
    names = list(fractions)
    parts = [f"WHEN ({key}) IS NULL THEN CAST(NULL AS VARCHAR)"]
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        parts.append(f"WHEN {u} < {acc!r} THEN {_sql_str_literal(name)}")
    return "CASE " + " ".join(parts) + f" ELSE {_sql_str_literal(names[-1])} END"


def group_topk_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "topk",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank rows inside each
    group by their key-hash uniform and keep the first ``k``. Equivalent
    in distribution to a reservoir sample but reproducible and
    order-insensitive. One shuffle on the group key; Spark inserts a
    partial (map-side) top-k below the window when a limit-like rank
    filter follows it, so the shuffle carries O(k) rows per group per
    partition, not the whole group."""
    from pyspark.sql import Window

    u = uniform_from_key(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy("u", key_col)
    return (
        df.withColumn("u", u)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def weighted_group_topk_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight: Column,
    k: int,
    salt: str = "wtopk",
) -> DataFrame:
    """Exactly-k-per-group sample WEIGHTED without replacement
    (Efraimidis–Spirakis 2006 A-ES): rank rows by ``u^(1/w)``
    descending with the deterministic key-hash uniform ``u`` — the
    size-biased complement to :func:`group_topk_sample` (uniform) and
    :func:`weighted_hash_sample` (Bernoulli, random size). Rows with
    ``w <= 0`` or NULL weight never qualify (their key is NULL and
    NULLs sort last under DESC in both engines — filtered anyway for
    explicitness).

    Same scale shape as group_topk_sample: one shuffle on the group
    key, rank-k window. Cross-engine determinism: ``pow`` is a libm
    call whose last ulp is engine-specific, so the rank key is
    QUANTIZED (9 decimals — far above the ~1e-16 relative libm
    disagreement) and ties break by ``key_col`` — the tfidf_top_terms
    rule. ``aes_key`` is emitted so callers can audit the draw.

    Weights are NORMALIZED by the group maximum before exponentiation
    (r17, r16 ADVICE): the rank key is ``u^(w_max/w)``. A-ES ordering
    is scale-invariant (``u^(1/(c*w))`` is a monotone transform of
    ``u^(1/w)`` for ``c > 0``), so the draw distribution is unchanged,
    but raw byte-count-sized weights (w ~ 1e8, where every ``u^(1/w)``
    rounds to 1.0 at 9 decimals) can no longer flatten the key to
    all-ties. Post-normalization the heaviest rows have exponent ~1
    (keys spread like u itself); only negligible-relative-weight rows
    (w_max/w ≳ 1e9) can still quantize to a 0.0 tie, and those lose
    the draw anyway — pinned AT that boundary on both engines
    (r18, ``test_weighted_sampling.
    test_negligible_weight_boundary_quantizes_to_zero_tie``). The
    group max is a window over the same partitioning as the rank — no
    extra exchange."""
    from pyspark.sql import Window

    from homelogging_spark.functions.numeric import quantize

    u = uniform_from_key(F.col(key_col), salt)
    wd = weight.cast("double")
    wmax = F.max(wd).over(Window.partitionBy(group_col))
    aes = quantize(F.pow(u, wmax / wd), decimals=9)
    w = Window.partitionBy(group_col).orderBy(F.col("aes_key").desc(), key_col)
    return (
        df.where(wd > 0)
        .withColumn("aes_key", aes)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def weighted_group_topk_sql(
    source: str,
    group_col: str,
    key_col: str,
    weight_expr: str,
    k: int,
    salt: str = "wtopk",
) -> str:
    """DuckDB twin of :func:`weighted_group_topk_sample` — same
    group-max weight normalization, same quantized key."""
    from homelogging_spark.functions.numeric import quantize_sql

    u = uniform_sql(key_col, salt)
    aes = quantize_sql(
        f"pow({u}, __wmax / CAST({weight_expr} AS DOUBLE))", decimals=9
    )
    return f"""
SELECT * EXCLUDE (__wmax) FROM (
  SELECT *, {aes} AS aes_key,
         CAST(row_number() OVER (
              PARTITION BY {group_col}
              ORDER BY {aes} DESC, {key_col}) AS BIGINT) AS rank
  FROM (
    SELECT *, max(CAST({weight_expr} AS DOUBLE)) OVER (
                  PARTITION BY {group_col}) AS __wmax
    FROM {source}
    WHERE CAST({weight_expr} AS DOUBLE) > 0
  )
) WHERE rank <= {k}
"""


def mixture_weights(
    df: DataFrame,
    stratum_col: str,
    token_count: Column,
    target_shares: dict[str, float],
) -> DataFrame:
    """Domain-mixing plan: given target token shares per stratum,
    compute each stratum's observed token mass and the acceptance rate
    that achieves the target share of the total budget. A rate > 1
    means the stratum must be *upsampled* (multiple epochs over it) —
    reported as ``epochs`` rather than clamped away, matching how
    mixture boards actually consume these numbers.

    rate_s = target_share_s * total_tokens / tokens_s

    One aggregation (rows → one per stratum) plus a scalar total via a
    window over the tiny aggregate — nothing scales with corpus size
    except the first scan."""
    agg = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_count).cast("bigint").alias("n_tokens"),
    )
    return mixture_weights_from_agg(agg, stratum_col, target_shares)


def mixture_weights_from_agg(
    agg: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
) -> DataFrame:
    """:func:`mixture_weights` from a pre-built per-stratum aggregate
    (``stratum, n_docs, n_tokens`` — extra columns pass through the
    caller's own groupBy, not this one). Exists so callers can
    aggregate FIRST and filter strata on the dim-sized result: a
    pre-agg predicate like ``where(~blocked)`` gets pushed below the
    corpus projection by PushDownPredicate, which re-inlines every
    staged subtree the predicate references into a per-row Filter —
    the q_domain_curation 3.2 s lesson (SCALE.md r16). Filtering the
    aggregate costs |strata| rows and leaves the scan's staged
    projection intact."""
    from pyspark.sql import Window

    share = F.lit(0.0)
    for stratum, s in sorted(target_shares.items()):
        share = F.when(F.col(stratum_col) == stratum, F.lit(float(s))).otherwise(share)
    total = F.sum("n_tokens").over(Window.partitionBy())
    rate = share * total / F.col("n_tokens")
    return agg.select(
        stratum_col,
        "n_docs",
        "n_tokens",
        share.alias("target_share"),
        rate.alias("rate"),
        F.greatest(rate, F.lit(1.0)).alias("epochs"),
    )


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    rate_per_weight: float,
    salt: str = "wsamp",
) -> DataFrame:
    """Weight-proportional deterministic Bernoulli sample: keep each row
    with probability ``min(1, rate_per_weight * weight)`` — the standard
    size-biased draw (sample documents proportional to their token
    count, so the kept TOKEN mass, not document count, follows the
    budget). Selection stays a pure map-side predicate on the md5
    uniform; ``p`` is exposed (like ``u``) so downstream stages can
    compute inclusion-probability corrections (Horvitz-Thompson
    weighting)."""
    u = uniform_from_key(F.col(key_col), salt)
    p = F.least(F.lit(1.0), F.lit(float(rate_per_weight)) * weight)
    return df.withColumn("u", u).withColumn("p", p).where(F.col("u") < F.col("p"))


def weighted_sql(key: str, weight: str, rate_per_weight: float, salt: str = "wsamp") -> str:
    """Predicate + projections mirroring :func:`weighted_hash_sample`:
    emits ``u``/``p`` select expressions and the keep predicate."""
    u = uniform_sql(key, salt)
    p = f"least(1.0, {float(rate_per_weight)!r} * {weight})"
    return f"{u} AS u, {p} AS p"


def budget_select(
    df: DataFrame,
    order_cols: list[Column],
    weight_col: Column,
    budget: float,
    n_ranges: int = 32,
    filter_to_budget: bool = True,
) -> DataFrame:
    """Greedy budget selection: rank rows by ``order_cols`` (best first,
    must be a TOTAL order — include a unique tiebreak) and keep rows
    while the running ``weight_col`` total stays within ``budget`` —
    how a corpus gets assembled against a token budget ("take the
    best docs until N tokens").

    Scale: a naive ``Window.orderBy`` with no partition key executes
    the whole cumsum on ONE task. This uses the distributed two-pass
    prefix sum instead:

    1. range-repartition + sort within partitions on the rank order,
       so partition ids ascend with rank (Spark's own distributed sort
       machinery, same shape ``ORDER BY`` compiles to);
    2. per-partition weight totals (one tiny row per partition) get a
       prefix sum on a single task — N_partitions rows, metadata-sized;
    3. broadcast the offsets back and add the within-partition running
       sum (a per-partition window, fully parallel).

    The only single-task step touches one row per partition, never the
    data. Output: input columns + ``cum_weight`` (running total
    INCLUDING the row), filtered to ``cum_weight <= budget`` unless
    ``filter_to_budget=False`` (callers that need the over-budget rows
    too, e.g. to label WHY a row was dropped, filter themselves).

    The ranked frame is persisted (tracked — released by the caller's
    ``release_caches`` point): a two-pass algorithm evaluates its input
    three times (repartitionByRange's sampling job, the per-partition
    totals, the offset join), and when the order keys carry expensive
    lineage (quality text-ops) the recompute costs more than the
    materialization — measured 5x on curriculum_order (SCALE.md r7)."""
    from pyspark.sql import Window

    from homelogging_spark.functions.cachelife import tracked_persist

    ranked = df.repartitionByRange(n_ranges, *order_cols).sortWithinPartitions(
        *order_cols
    )
    with_pid = tracked_persist(
        ranked.withColumn("_pid", F.spark_partition_id())
    )
    totals = with_pid.groupBy("_pid").agg(F.sum(weight_col).alias("_part_total"))
    # prefix over the partition totals: N_ranges rows on one task —
    # metadata, not data. This unpartitioned Window is INTENTIONAL and
    # trips Spark's "No Partition Defined for Window operation" WARN at
    # runtime (WindowExec can't see that its input is <= n_ranges rows);
    # the frame is the per-partition-offset table, never the data, so
    # the warning is expected and harmless here — don't "fix" it by
    # partitioning, that would break the global prefix.
    w_pid = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_part_total").over(w_pid), F.lit(0.0))
    ).select("_pid", "_offset")
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_weight", F.col("_offset") + F.sum(weight_col).over(w_in))
        .drop("_pid", "_offset")
    )
    if filter_to_budget:
        out = out.where(F.col("cum_weight") <= F.lit(budget))
    return out


def distributed_row_number(
    df: DataFrame,
    order_cols: list[Column],
    alias: str = "rank",
    n_ranges: int = 32,
) -> DataFrame:
    """Global 1-based ``row_number`` over a TOTAL order (include a unique
    tiebreak) without the single-task global-window funnel: the
    :func:`budget_select` two-pass prefix-sum shape with weight ≡ 1 —
    range-repartition + sort on the order, per-partition row counts
    (one metadata row each) prefixed on a single tiny task, offsets
    broadcast back onto the fully parallel within-partition
    ``row_number``. The only single-task step touches one row per
    partition, never the data."""
    out = budget_select(
        df,
        order_cols,
        F.lit(1.0),
        budget=0.0,
        n_ranges=n_ranges,
        filter_to_budget=False,
    )
    return out.withColumn(alias, F.col("cum_weight").cast("bigint")).drop(
        "cum_weight"
    )


def cluster_balanced_sample(
    corpus: DataFrame | None,
    centroids: DataFrame | None,
    k_per_cell: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    salt: str = "cbal",
    cells: DataFrame | None = None,
) -> DataFrame:
    """Cluster-balanced (diversity-preserving) sample: assign every
    vector to its nearest centroid in embedding space, then keep a
    deterministic exactly-``k_per_cell`` sample PER CLUSTER — the
    curation step that keeps a corpus's long-tail topics alive where a
    uniform sample would hand the budget to the dominant modes
    (SemDeDup/DCLM-style cluster-balanced selection; the sampling twin
    of ``similarity.semantic_dedup``'s cell partitioning).

    ``centroids``: a (id, embedding) dim from
    ``similarity.kmeans_lite_centroids`` / ``refresh_centroids`` — the
    caller owns training so one quantizer generation serves dedup,
    ANN, and sampling consistently (``maintenance.index_cycle``).

    Output: ``id_col, cell, cell_n, rank`` — ``cell_n`` is the cluster's
    PRE-sample population (the honesty column: consumers see exactly how
    skewed the original mass was and how hard each cell was cut), rank
    ∈ [1, k_per_cell] the deterministic md5-uniform pick order.

    Scale shape: centroid dim broadcast (K rows), assignment is one
    corpus scan with a map-side partial argmax (``similarity.
    ivf_assign``), then ONE shuffle on ``cell`` where the census count
    and the top-k rank share the same window partitioning. Skew =
    cluster imbalance; at pathological K the same salting dial as the
    dedup tier applies, but the rank filter bounds what any cell emits
    downstream at ``k_per_cell`` rows.

    ``cells``: optionally serve from a PRE-COMPUTED (id, centroid_id)
    assignment — ``maintenance.index_cycle``'s committed ``cells``
    artifact (the same convention as ``sq8_topk(bounds=...)`` /
    ``index_cycle_search``). Skips the assignment scan entirely:
    sampling a maintained corpus costs one shuffle over the cells
    frame, no embedding is ever read, and the sample is consistent
    with whatever generation the cycle committed."""
    from pyspark.sql import Window

    from homelogging_spark.operators.similarity import ivf_assign

    if k_per_cell < 1:
        raise ValueError(f"k_per_cell must be >= 1, got {k_per_cell}")
    if cells is not None:
        assigned = cells.select(
            id_col, F.col("centroid_id").cast("bigint").alias("cell")
        )
    elif corpus is None or centroids is None:
        raise ValueError("need (corpus, centroids) to assign, or cells=")
    else:
        assigned = ivf_assign(corpus, centroids, 1, id_col, emb_col).select(
            id_col, F.col("centroid_id").cast("bigint").alias("cell")
        )
    u = uniform_from_key(F.col(id_col), salt)
    w = Window.partitionBy("cell")
    w_rank = w.orderBy("u", id_col)
    return (
        assigned.withColumn("u", u)
        .withColumn("cell_n", F.count(F.lit(1)).over(w))
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= k_per_cell)
        .select(id_col, "cell", "cell_n", "rank")
    )
