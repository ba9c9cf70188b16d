"""Vector-similarity operators over an embedding column (array<float>).

The training-data-pipeline tier for embeddings: exact cosine top-k as the
correctness baseline, and random-hyperplane LSH (SRP — sign random
projections, Charikar 2002) as the scale path for both ANN search and
near-duplicate pair mining.

Determinism contract: hyperplanes are *derived from md5*, not drawn from
an RNG — component ``i`` of plane ``j`` is ``md5int(f"{j}|{i}") / 2^31 -
1``, precomputed driver-side and embedded as double literals in the plan.
The DuckDB oracle embeds the identical literals, so bucket assignments
and cosines are bit-for-bit replicable (all folds are sequential
left-associated double additions on both engines).

Scale design:
- **Exact top-k** is O(Q·N) with the query side broadcast: a single scan
  of the corpus, no shuffle of the big side, a per-partition top-k then a
  tiny final merge (window over Q·N_partition rows). Right answer for
  small query sets; never for pair mining.
- **LSH** shuffles on (table, bucket): a vector emits ``n_tables`` rows;
  candidate pairs form inside buckets only. Cost is O(N·tables +
  candidates), tunable via (tables, planes) along the standard S-curve —
  more planes → smaller buckets → higher precision, more tables → higher
  recall. All-pairs at 1e9 vectors is 5e17 — the bucket join is what
  survives scale-up.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_unit(s: str) -> float:
    """Deterministic pseudo-uniform double in [-1, 1) from a string key."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2147483648.0 - 1.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """md5-derived hyperplane matrix (n_planes x dim), identical on any
    engine that evaluates the same literals — no RNG seed to ship."""
    return [[_md5_unit(f"{j}|{i}") for i in range(dim)] for j in range(n_planes)]


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold — same bracketing as SQL ``list_reduce``:
    (0.0 + p1) + p2 + ... ≡ (p1 + p2) + ... bit-for-bit (0.0 + x == x)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """Euclidean norm with index-order summation — the exact
    sub-expression ``cosine`` uses, exposed so per-vector norms can be
    computed ONCE and joined instead of re-derived per candidate pair
    (bit-identical values, 3x less fold work in pair mining)."""
    d = lambda c: c.cast("double")  # noqa: E731
    return F.sqrt(_fold_sum(F.transform(a, lambda x: d(x) * d(x))))


def dot_product(a: Column, b: Column) -> Column:
    """Index-order dot product (cross-engine reproducible)."""
    d = lambda c: c.cast("double")  # noqa: E731
    return _fold_sum(F.zip_with(a, b, lambda x, y: d(x) * d(y)))


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine similarity, computed entirely in double precision with
    index-order summation (cross-engine reproducible)."""
    return dot_product(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str, dim: int) -> str:
    prod = (
        f"list_reduce(list_transform(range({dim}), "
        f"i -> CAST(({a})[i+1] AS DOUBLE) * CAST(({b})[i+1] AS DOUBLE)), (x, y) -> x + y)"
    )
    norm = lambda v: (  # noqa: E731
        f"sqrt(list_reduce(list_transform(range({dim}), "
        f"i -> CAST(({v})[i+1] AS DOUBLE) * CAST(({v})[i+1] AS DOUBLE)), (x, y) -> x + y))"
    )
    return f"({prod} / ({norm(a)} * {norm(b)}))"


def _plane_literal_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in plane) + "]"


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Bucket id from sign bits of the projections onto ``planes``."""
    bits = []
    for j, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(v) for v in plane])
        dot = _fold_sum(F.zip_with(emb, plane_col, lambda x, y: x.cast("double") * y))
        bits.append(F.when(dot > 0, F.lit(2**j)).otherwise(F.lit(0)))
    return reduce(lambda x, y: x + y, bits).cast("bigint")


def lsh_bucket_sql(emb: str, planes: list[list[float]]) -> str:
    terms = []
    for j, plane in enumerate(planes):
        lit = _plane_literal_sql(plane)
        dot = (
            f"list_reduce(list_transform(range({len(plane)}), "
            f"i -> CAST(({emb})[i+1] AS DOUBLE) * ({lit})[i+1]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**j} ELSE 0 END)")
    return f"CAST({' + '.join(terms)} AS BIGINT)"


def lsh_table_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 2,
    planes_per_table: int = 6,
    dim: int = 64,
) -> DataFrame:
    """(id, table_idx, bucket) — one row per LSH table. The shuffle key of
    every downstream candidate join.

    r20: Arrow-batch evaluation (``mapInPandas`` + numpy) replacing the
    per-plane ``lsh_bucket`` expression columns — bucket ids identical
    bit-for-bit (each dot is the same index-order left-fold the
    expression and the DuckDB twin compute — :func:`_fold_matmul` — and
    the bucket is integer arithmetic on its exact sign), while the plan
    drops the n_planes·dim literal arrays whose py4j construction +
    analysis dominated the LSH legs' per-invocation cost. Row ORDER
    within a partition differs from the ``posexplode`` form (grouped by
    table instead of interleaved); every consumer keys on
    (table_idx, bucket) or aggregates, so order is immaterial.

    Edge-semantics scope (applies to every r20 Arrow twin here —
    ``lsh_table_buckets``, ``pq_codes``, ``rotate_by_matrix_rows``,
    ``hd_rotate_rows``): the bit-equality claim vs the expression/
    DuckDB forms holds for FINITE, dense, dim-length embeddings. A
    null embedding raises in the numpy stack (the expression form
    yielded null dots → bucket 0 / null d2), and a NaN projection
    flips the sign test (Spark evaluates ``NaN > 0`` true, numpy
    false). Registry inputs are generated finite-dense, so neither
    case is reachable from a declared query."""
    all_planes = hyperplanes(n_tables * planes_per_table, dim)
    p_cols = [
        [float(all_planes[j][i]) for j in range(n_tables * planes_per_table)]
        for i in range(dim)
    ]  # dim x n_planes: row i = every plane's i-th component

    def bucket_batches(batches):
        import numpy as np
        import pandas as pd

        p_arr = np.asarray(p_cols, dtype=np.float64)
        pow2 = 1 << np.arange(planes_per_table, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            if m.shape[1] != dim:
                raise ValueError(
                    f"embedding length {m.shape[1]} != dim {dim}"
                )
            dots = _fold_matmul(m, p_arr)
            bits = dots > 0
            ids = pdf[id_col].values
            frames = []
            for t in range(n_tables):
                sl = bits[:, t * planes_per_table : (t + 1) * planes_per_table]
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: ids,
                            "table_idx": np.full(len(ids), t, dtype=np.int32),
                            "bucket": (sl * pow2).sum(axis=1).astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        bucket_batches,
        schema=f"{id_col} {id_type}, table_idx int, bucket bigint",
    )


def exact_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side over one corpus
    scan, rank per query. Returns (query_id, rank, vec_id, cosine).

    r20: norms are computed once per VECTOR (each side projects its own
    norm before the pair join) instead of once per PAIR — the
    :func:`norm` docstring's own prescription, bit-identical values
    (the cosine is the same dot/(q_norm·c_norm) expression, only the
    norm sub-expressions moved below the join), 3x less fold work in
    the Q·N scoring stage."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col), F.col(emb_col), norm(F.col(emb_col)).alias("__cn")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        id_col,
        (
            dot_product(F.col("q_emb"), F.col(emb_col))
            / (F.col("__qn") * F.col("__cn"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), id_col, "cosine")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 2,
    planes_per_table: int = 6,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: candidates = corpus vectors sharing an LSH bucket with
    the query in any table; verified by exact cosine; top-k per query.
    Recall < 1 by design — the tradeoff is the (tables, planes) S-curve
    (see module docstring); cost is the bucket join, not N·Q."""
    qb = lsh_table_buckets(queries, id_col, emb_col, n_tables, planes_per_table, dim)
    cb = lsh_table_buckets(corpus, id_col, emb_col, n_tables, planes_per_table, dim)
    cand = (
        qb.select(F.col(id_col).alias("query_id"), "table_idx", "bucket")
        .join(cb.withColumnRenamed(id_col, "cand_id"), ["table_idx", "bucket"])
        .select("query_id", "cand_id")
        .distinct()
    )
    # norms once per vector (r20, bit-identical — see exact_topk)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("__cn"),
    )
    scored = cand.join(F.broadcast(q), "query_id").join(c, "cand_id").select(
        "query_id",
        "cand_id",
        (
            dot_product(F.col("q_emb"), F.col("c_emb"))
            / (F.col("__qn") * F.col("__cn"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"), "cand_id", "cosine"
        )
    )


def topk_recall(
    ann: DataFrame,
    exact: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Attach the honesty metric to an ANN result: per-query recall@k
    against the exact top-k (``exact_topk`` output). Both inputs are
    deterministic here, so an SQL oracle replicates the number exactly —
    the same convention as ``hll_distinct_rollup``'s rel_err column.

    Scale shape: the truth side is |Q|·k rows (queries are the small
    side by construction) and broadcasts onto the ANN rows as a hit
    marker; the per-query hit count is a window sum over the bounded
    (|Q|·k) ANN result. At 100 TB the exact side is priced per probe
    query — production runs it over a sampled query panel, which this
    operator expresses unchanged (pass the sampled exact frame).

    r21 (guide §2.4): the former semi-join + join-back referenced
    ``ann`` twice, so the ENTIRE ANN search subtree (bucketing/probing/
    scoring) executed twice per leg just to attach one ratio. The hit
    marker + window form references it once; the window's exchange
    moves only the |Q|·k result rows. n_hits is an integer either way,
    so recall_at_k is bit-identical."""
    truth = exact.where(F.col("rank") <= k).select(
        "query_id",
        F.col(id_col).alias("cand_id"),
        F.lit(True).alias("__hit"),
    )
    marked = ann.join(F.broadcast(truth), ["query_id", "cand_id"], "left")
    n_hits = F.sum(
        F.when(F.col("__hit"), F.lit(1)).otherwise(F.lit(0))
    ).over(Window.partitionBy("query_id"))
    return marked.withColumn(
        "recall_at_k", n_hits / F.lit(float(k))
    ).drop("__hit")


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    n_cells: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: each vector mapped to its ``n_cells``
    nearest centroids by cosine (1 for indexing, >1 for query-side
    multi-probe). Centroids broadcast — the corpus streams through one
    scan, no shuffle until the final rank-per-vector.

    Centroid choice is the caller's: real systems run k-means; for
    deterministic oracle parity any fixed seed set works (the index is
    an *accelerator* — correctness comes from the exact-cosine verify).
    """
    # norms once per side BELOW the join (bit-identical cosines — same op
    # sequence per value; K dots instead of K full cosine folds per row)
    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_nrm"),
    )
    vecs = df.select(
        F.col(id_col), F.col(emb_col), norm(F.col(emb_col)).alias("v_nrm")
    )
    # zero-norm guard (r17): a vector (or PQ subspace SLICE — zero
    # slices are routine on sparse/rotated data; the FWHT encode path
    # surfaced it) with ||v||=0 has no direction — define its cosine as
    # 0 instead of letting ANSI mode abort the whole training job on
    # 0/0. Non-degenerate values are bit-identical (the when() guards,
    # it never re-brackets the division).
    nrm_prod = F.col("v_nrm") * F.col("c_nrm")
    scored = vecs.crossJoin(F.broadcast(c)).select(
        id_col, emb_col, "centroid_id",
        F.when(
            nrm_prod != 0.0,
            dot_product(F.col(emb_col), F.col("c_emb")) / nrm_prod,
        ).otherwise(F.lit(0.0)).alias("c_cos"),
    )
    if n_cells == 1:
        # argmax per vector via a partially-aggregated struct max: the
        # map-side combine cuts the shuffle from N*K scored rows to N —
        # the window form below shuffles every scored row. (cos DESC,
        # centroid_id ASC) == max of (cos, -centroid_id); centroid_id is
        # unique so later struct fields never decide.
        best = scored.groupBy(id_col).agg(
            F.max(
                F.struct(
                    F.col("c_cos").alias("cos"),
                    (-F.col("centroid_id")).alias("neg_cid"),
                    F.col(emb_col).alias("e"),
                )
            ).alias("b")
        )
        return best.select(
            F.col(id_col),
            F.col("b.e").alias(emb_col),
            (-F.col("b.neg_cid")).alias("centroid_id"),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_cos"), F.col("centroid_id"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_cells)
        .select(id_col, emb_col, "centroid_id")
    )


def seed_centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """md5-seeded initial centroids (n_centroids x dim) — literal-
    embeddable on any engine, same contract as ``hyperplanes``."""
    return [
        [_md5_unit(f"ivf-seed|{j}|{i}") for i in range(dim)]
        for j in range(n_centroids)
    ]


def kmeans_lite_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    sample_mod: int | None = 16,
    exact_fold: bool = True,
) -> DataFrame:
    """Deterministic k-means-lite: a FIXED number of Lloyd iterations from
    md5-seeded initial centroids — the self-contained centroid builder for
    IVF indexing (no caller-provided seed set, no RNG state to ship).

    Cross-engine determinism, piece by piece:
    - init centroids are md5-derived literals (``seed_centroids``);
    - assignment is exact cosine + (cos DESC, centroid_id) tie-break —
      bit-identical on both engines because centroid values are;
    - the centroid update folds members in ``id`` order via
      ``sort_array(collect_list(...))`` + a sequential left fold, the same
      bracketing DuckDB's ``list(x ORDER BY id)`` + ``list_reduce`` uses —
      bit-for-bit reproducible sums, unlike a parallel ``avg()``.

    Scale notes: the quantizer trains on a deterministic ``id %
    sample_mod`` SAMPLE of the corpus — the standard IVF practice (the
    coarse quantizer only needs the density shape, and training cost
    drops by the sample factor; the *index* still assigns every vector).
    Each iteration is one broadcast of K tiny centroids over the sample
    plus a K-group shuffle; the collect_list-per-cell exists to pin
    summation order for the oracle gate. ``exact_fold=False`` is the
    100 TB dial: a tree-aggregated PARTIAL per-dimension mean (plain
    ``avg`` columns — map-side combine, no per-cell member list ever
    materializes, cell size bounded only by the combiner). It gives up
    bit-for-bit oracle replay (float addition order varies with
    partitioning) but not quality — the index is an accelerator and
    correctness comes from the exact verify; on well-separated data the
    resulting ASSIGNMENTS match the exact fold (pinned in
    ``TestKmeansLite``).
    """
    spark = corpus.sparkSession
    seeds = seed_centroids(n_centroids, dim)
    cents = spark.createDataFrame(
        [(j, seeds[j]) for j in range(n_centroids)],
        f"{id_col} bigint, {emb_col} array<double>",
    )
    vecs = corpus.select(F.col(id_col), F.col(emb_col))
    if sample_mod:
        vecs = vecs.where(F.col(id_col) % sample_mod == 0)
    for _ in range(n_iters):
        assigned = ivf_assign(vecs, cents, 1, id_col, emb_col)
        if not exact_fold:
            # production path: partial-aggregated per-dim means; the
            # K x dim result is the only thing that crosses the exchange
            means = assigned.groupBy("centroid_id").agg(
                F.array(
                    *[
                        F.avg(F.col(emb_col)[i].cast("double"))
                        for i in range(dim)
                    ]
                ).alias("new_emb")
            )
            cents = (
                cents.alias("c")
                .join(means, F.col(f"c.{id_col}") == means["centroid_id"], "left")
                .select(
                    F.col(f"c.{id_col}").alias(id_col),
                    F.coalesce(F.col("new_emb"), F.col(f"c.{emb_col}")).alias(
                        emb_col
                    ),
                )
                .localCheckpoint(eager=True)
            )
            continue
        grouped = assigned.groupBy("centroid_id").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("i"), F.col(emb_col).alias("e"))
                )
            ).alias("members"),
            F.count(F.lit(1)).alias("n"),
        )
        # ONE fold over the members with an array accumulator (elementwise
        # zip_with) — not dim separate folds, whose 64 aggregate subtrees
        # made Catalyst analysis + codegen the dominant cost. Bracketing
        # ((0+e1)+e2)+... == DuckDB's list_reduce (e1+e2)+... elementwise
        # since 0.0 + x == x.
        sums = F.aggregate(
            F.col("members"),
            F.array_repeat(F.lit(0.0), dim),
            lambda acc, m: F.zip_with(
                acc, m["e"], lambda a, x: a + x.cast("double")
            ),
        )
        means = grouped.select(
            "centroid_id",
            F.transform(sums, lambda s: s / F.col("n")).alias("new_emb"),
        )
        # empty cells keep their previous centroid (deterministic on both
        # engines via the same LEFT JOIN + coalesce)
        cents = (
            cents.alias("c")
            .join(means, F.col(f"c.{id_col}") == means["centroid_id"], "left")
            .select(
                F.col(f"c.{id_col}").alias(id_col),
                F.coalesce(F.col("new_emb"), F.col(f"c.{emb_col}")).alias(emb_col),
            )
            # K rows; truncate lineage per iteration — without this,
            # iteration N's plan nests every prior iteration's subtree and
            # Catalyst re-analyzes the whole stack (plan cost grows with
            # n_iters), and the two downstream broadcast consumers would
            # re-run the full Lloyd chain.
            .localCheckpoint(eager=True)
        )
    return cents


def refresh_centroids(
    corpus: DataFrame,
    target_cell_rows: int = 256,
    k_min: int = 8,
    k_max: int = 1 << 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    sample_mod: int | None = 16,
    exact_fold: bool = True,
) -> DataFrame:
    """IVF coarse-quantizer MAINTENANCE: re-train the centroid dim
    sized to the CURRENT corpus — ``K = clamp(ceil(N /
    target_cell_rows), k_min, k_max)`` — so mean cell occupancy stays
    ~constant as the corpus grows. This is the maintenance-cycle twin of
    the layout rewrites: every cell-scoped consumer's cost is a function
    of occupancy, not corpus size — ``semantic_dedup``'s pair stage is
    Σ cell² (fixed K at 10x data measured 101.9 s vs 37.0 s retrained,
    SCALE.md r6), and ``ivf_pq_topk``'s ADC stage scans nprobe/K of the
    corpus per query (fixed K=8 at 10x measured in SCALE.md r13) — so a
    growing corpus needs K to grow with it, which a one-time trained
    quantizer silently doesn't.

    Run it when the corpus has grown past ~2x the occupancy target
    (cheap to check: one count), then re-materialize ``ivf_assign`` /
    ``pq_codes`` index artifacts against the new centroids — old and
    new index generations are separate artifacts, so the swap follows
    the same stage-then-switch discipline as ``operators/maintenance``.
    Deterministic: same corpus → same K → same md5-seeded
    ``kmeans_lite_centroids`` training (on the ``id % sample_mod``
    sample). Returns the new (vec_id, embedding) centroid dim."""
    if target_cell_rows < 1:
        raise ValueError(f"target_cell_rows must be >= 1, got {target_cell_rows}")
    n = corpus.count()
    k = min(k_max, max(k_min, -(-n // target_cell_rows)))
    return kmeans_lite_centroids(
        corpus,
        n_centroids=int(k),
        n_iters=n_iters,
        id_col=id_col,
        emb_col=emb_col,
        dim=dim,
        sample_mod=sample_mod,
        exact_fold=exact_fold,
    )


def kmeans_lite_sql(
    corpus_sql: str,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    sample_mod: int | None = 16,
    prefix: str = "",
) -> str:
    """DuckDB CTE chain replicating ``kmeans_lite_centroids`` bit-for-bit;
    returns CTE definitions whose final CTE ``{prefix}c{n_iters}`` is
    ``(centroid_id, c_emb)``. ``prefix`` namespaces the CTEs so several
    chains (e.g. one per PQ subspace) can coexist in one WITH clause."""
    if sample_mod:
        corpus_sql = f"SELECT * FROM ({corpus_sql}) WHERE vec_id % {sample_mod} = 0"
    seeds = seed_centroids(n_centroids, dim)
    values = ", ".join(
        f"({j}, {_plane_literal_sql(seeds[j])})" for j in range(n_centroids)
    )
    ctes = [f"{prefix}c0 AS (SELECT * FROM (VALUES {values}) AS t(centroid_id, c_emb))"]
    for it in range(1, n_iters + 1):
        prev = f"{prefix}c{it - 1}"
        cos = cosine_sql("t.embedding", "c.c_emb", dim)
        ctes.append(
            f"""{prefix}a{it} AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT t.vec_id, t.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY t.vec_id
                              ORDER BY {cos} DESC, c.centroid_id) AS r
    FROM ({corpus_sql}) t, {prev} c) WHERE r = 1)"""
        )
        ctes.append(
            f"{prefix}m{it} AS (SELECT centroid_id, list(embedding ORDER BY vec_id) AS embs, "
            f"count(*) AS n FROM {prefix}a{it} GROUP BY 1)"
        )
        ctes.append(
            f"{prefix}u{it} AS (SELECT centroid_id, list_transform("
            f"list_reduce(list_transform(embs, e -> list_transform(e, x -> CAST(x AS DOUBLE))), "
            f"(a, b) -> list_transform(range({dim}), i -> a[i+1] + b[i+1])), "
            f"s -> s / n) AS c_emb FROM {prefix}m{it})"
        )
        ctes.append(
            f"{prefix}c{it} AS (SELECT p.centroid_id, coalesce(u.c_emb, p.c_emb) AS c_emb "
            f"FROM {prev} p LEFT JOIN {prefix}u{it} u USING (centroid_id))"
        )
    return ",\n".join(ctes)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN top-k: corpus bucketed into centroid cells (one
    each), queries probe their ``nprobe`` nearest cells, candidates
    verified by exact cosine. The scale shape: shuffle on centroid_id
    (cells ~ corpus/K vectors), query work ~ nprobe/K of the corpus —
    the classic recall/cost dial alongside the LSH variant."""
    # norms once per vector (r20, bit-identical — see exact_topk)
    cells = ivf_assign(corpus, centroids, 1, id_col, emb_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("__cn"),
        "centroid_id",
    )
    probes = ivf_assign(queries, centroids, nprobe, id_col, emb_col).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("__qn"),
        "centroid_id",
    )
    scored = probes.join(cells, "centroid_id").select(
        "query_id",
        "cand_id",
        (
            dot_product(F.col("q_emb"), F.col("c_emb"))
            / (F.col("__qn") * F.col("__cn"))
        ).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("bigint").alias("rank"), "cand_id", "cosine"
        )
    )


LSH_SPLIT_SALT = "lsh_bucket_split"


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 4,
    planes_per_table: int = 4,
    dim: int = 64,
    bucket_cap: int | None = None,
    observe_caps: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucketed candidates (self-join
    on (table, bucket), id_a < id_b), exact-cosine verified against
    ``threshold``. More tables of fewer planes than top-k search — pair
    mining wants recall at moderate similarity, so the S-curve is shifted
    left ((1 - θ/π)^4 per table, 4 chances).

    ``bucket_cap`` is the hot-bucket guard (the LSH twin of
    ``semantic_dedup``'s ``cell_cap``): the candidate stage is
    sum(bucket_size^2) over (table, bucket), and the bucket COUNT is
    fixed by ``planes_per_table`` — it does not grow with N — so
    without a cap the stage trends quadratic as the corpus scales past
    buckets' worth of vectors. With a cap, any bucket of size S > cap
    is hash-split into ceil(S/cap) sub-buckets by a salted md5 of the
    id (deterministic, oracle-replicable) and candidates form only
    within a sub-bucket, bounding the stage by N*cap per table. The
    trade: a qualifying pair hashed into different sub-buckets of ONE
    hot table-bucket loses that table's chance, but keeps its chance in
    every other table — the multi-table OR already built for S-curve
    recall also softens the cap's recall cost. Buckets at or under the
    cap are byte-identical to the uncapped form. (The no-cap scale
    alternative is raising ``planes_per_table`` with log2(N), which
    shifts the S-curve right — a recall trade this operator's moderate
    thresholds usually can't afford; capping degrades only the
    overflowing density peaks.)"""
    # persist: the bucket frame feeds both sides of the self-join; without
    # it the 16 projection folds run twice over the corpus. Tracked so a
    # long-lived driver reclaims it via cachelife.release_caches().
    from homelogging_spark.functions.cachelife import tracked_persist

    b = tracked_persist(
        lsh_table_buckets(df, id_col, emb_col, n_tables, planes_per_table, dim)
    )
    if bucket_cap is not None:
        if bucket_cap < 1:
            raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
        from homelogging_spark.operators.sampling import uniform_from_key

        # <= n_tables * 2^planes rows: how many hash-splits each bucket
        # needs. Broadcast back so the split is a map-side column.
        splits = b.groupBy("table_idx", "bucket").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(float(bucket_cap)))
            .cast("bigint")
            .alias("_n_splits")
        )
        if observe_caps:
            from homelogging_spark.functions.capstats import observe_cap_splits

            splits = observe_cap_splits(splits, "bucket_cap")
        # persist the CAPPED frame too: it feeds both sides of the
        # candidate self-join, and without it the splits aggregation +
        # broadcast join re-run once per side
        b = tracked_persist(
            b.join(F.broadcast(splits), ["table_idx", "bucket"]).withColumn(
                "_sub",
                F.floor(
                    uniform_from_key(F.col(id_col), LSH_SPLIT_SALT)
                    * F.col("_n_splits")
                ).cast("bigint"),
            )
        )
    else:
        b = b.withColumn("_sub", F.lit(0).cast("bigint"))
    left = b.select(F.col(id_col).alias("id_a"), "table_idx", "bucket", "_sub")
    right = b.select(F.col(id_col).alias("id_b"), "table_idx", "bucket", "_sub")
    cand = (
        left.join(right, ["table_idx", "bucket", "_sub"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # norms once per VECTOR, not per pair: the verify step then does one
    # dot product per candidate instead of dot + two norms — bit-identical
    # cosines (same op sequence per value), 3x less fold work where the
    # cost actually lives (candidates >> vectors)
    withnorm = df.select(
        F.col(id_col), F.col(emb_col), norm(F.col(emb_col)).alias("nrm")
    )
    ea = withnorm.select(
        F.col(id_col).alias("id_a"), F.col(emb_col).alias("emb_a"), F.col("nrm").alias("norm_a")
    )
    eb = withnorm.select(
        F.col(id_col).alias("id_b"), F.col(emb_col).alias("emb_b"), F.col("nrm").alias("norm_b")
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn(
            "cosine",
            dot_product(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .where(F.col("cosine") > F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


# --- product quantization ----------------------------------------------------

def l2_sq(a: Column, b: Column) -> Column:
    """Index-order squared L2 distance (cross-engine reproducible — same
    left-fold bracketing as ``dot_product``)."""
    d = lambda c: c.cast("double")  # noqa: E731
    return _fold_sum(F.zip_with(a, b, lambda x, y: (d(x) - d(y)) * (d(x) - d(y))))


def l2_sq_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_transform(range({dim}), "
        f"i -> (CAST(({a})[i+1] AS DOUBLE) - CAST(({b})[i+1] AS DOUBLE)) "
        f"* (CAST(({a})[i+1] AS DOUBLE) - CAST(({b})[i+1] AS DOUBLE))), (x, y) -> x + y)"
    )


def pq_codebook(
    corpus: DataFrame,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_mod: int | None = 16,
) -> DataFrame:
    """Train the per-subspace codebooks: (subspace, cid, cemb), K*M tiny
    rows, lineage-truncated by the k-means builder. Exposed separately
    from :func:`pq_codes` so callers can train ONCE and encode many
    batches — the codebook is an artifact, not a per-query computation
    (the registry memoizes it per (session, sf_dir))."""
    from concurrent.futures import ThreadPoolExecutor

    sub_dim = dim // n_subspaces

    def train(m: int) -> DataFrame:
        sub_corpus = corpus.select(
            F.col(id_col),
            F.slice(F.col(emb_col), m * sub_dim + 1, sub_dim).alias(emb_col),
        )
        cents = kmeans_lite_centroids(
            sub_corpus,
            n_centroids,
            n_iters,
            id_col,
            emb_col,
            dim=sub_dim,
            sample_mod=sample_mod,
        )
        return cents.select(
            F.lit(m).alias("subspace"),
            F.col(id_col).cast("bigint").alias("cid"),
            F.col(emb_col).alias("cemb"),
        )

    # The subspace chains are independent (training decomposes exactly
    # per subspace) and each is a sequence of TINY eager jobs dominated
    # by per-job fixed overhead — submit them concurrently (standard
    # multi-threaded Spark job submission; results are deterministic
    # regardless of completion order since each chain is self-contained).
    with ThreadPoolExecutor(max_workers=n_subspaces) as pool:
        cbs = list(pool.map(train, range(n_subspaces)))
    codebook = cbs[0]
    for cb in cbs[1:]:
        codebook = codebook.unionByName(cb)
    return codebook


def pq_codes(
    corpus: DataFrame,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_mod: int | None = 16,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``n_subspaces`` contiguous sub-vectors, learn a small codebook per
    subspace (the deterministic k-means-lite, trained on an id-mod
    sample), and store each vector as ``n_subspaces`` centroid ids —
    64 doubles become 4 bytes here, the compression that makes
    100 TB-scale vector search RAM-resident. Returns per-vector codes
    plus the reconstruction MSE (the quality dial).

    Scale shape (r20 map-side encode): the K·M-row codebook — metadata-
    sized by construction, the FAISS posture of RAM-resident codebooks —
    is collected to the DRIVER once per encode (a Spark job at call
    time, so ``pq_codes`` is eager even inside query builders) and
    shipped into an Arrow ``mapInPandas`` encode: the argmin runs in
    numpy per batch, zero exchanges, one corpus pass. The corpus itself
    is never collected; only the O(K·M) codebook crosses the driver."""
    sub_dim = dim // n_subspaces
    if codebook is None:
        codebook = pq_codebook(
            corpus, n_subspaces, n_centroids, n_iters, dim, id_col, emb_col, sample_mod
        )

    # r20: MAP-SIDE Arrow-batch encode. The old shape scored N·K·M
    # (id, subspace, cid, d2) rows through a per-(id, subspace) window
    # argmin plus a groupBy pivot — two full shuffles of the code
    # stream whose only job was an argmin. The codebook is K·M
    # metadata-sized rows (the FAISS posture: codebooks live in RAM),
    # so collect it once per encode and assign codes in numpy over
    # Arrow batches: zero exchanges, one corpus pass. Bit-equality
    # with the window form: d2 replays l2_sq's exact op order
    # (subtract, square, index-order left-fold — one vectorized add
    # per sub-dimension), np.argmin keeps the FIRST minimum over cids
    # scanned in ascending order == the window's (d2, cid) ordering,
    # so codes are bit-identical. recon_mse sums the M subspace minima
    # in fixed subspace order (the old groupBy summed them in shuffle
    # arrival order — both land on the same quantized value, which is
    # all any consumer emits; re-proved against the unchanged
    # window-based DuckDB twin at 3 SFs).
    cb = sorted(
        (int(r["subspace"]), int(r["cid"]), [float(v) for v in r["cemb"]])
        for r in codebook.select("subspace", "cid", "cemb").collect()
    )
    cents = {m: [(cid, c) for s, cid, c in cb if s == m] for m in range(n_subspaces)}
    for m, lst in cents.items():
        if not lst:
            raise ValueError(f"codebook has no centroids for subspace {m}")
        if any(len(c) != sub_dim for _, c in lst):
            raise ValueError(f"subspace {m} centroid length != {sub_dim}")
    cid_lists = [[cid for cid, _ in cents[m]] for m in range(n_subspaces)]
    cent_lists = [[c for _, c in cents[m]] for m in range(n_subspaces)]

    def encode_batches(batches):
        import numpy as np
        import pandas as pd

        cids = [np.asarray(v, dtype=np.int64) for v in cid_lists]
        mats = [np.asarray(v, dtype=np.float64) for v in cent_lists]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            if x.shape[1] != dim:
                raise ValueError(f"embedding length {x.shape[1]} != dim {dim}")
            n = x.shape[0]
            out = {id_col: pdf[id_col].values}
            total = np.zeros(n)
            for m in range(n_subspaces):
                sub = x[:, m * sub_dim : (m + 1) * sub_dim]
                d2 = np.zeros((n, mats[m].shape[0]))
                for i in range(sub_dim):
                    diff = sub[:, i : i + 1] - mats[m][:, i]
                    d2 = d2 + diff * diff
                best = np.argmin(d2, axis=1)
                out[f"code_{m}"] = cids[m][best]
                total = total + d2[np.arange(n), best]
            out["recon_mse"] = total / float(dim)
            yield pd.DataFrame(out)

    id_type = corpus.schema[id_col].dataType.simpleString()
    code_schema = ", ".join(f"code_{m} bigint" for m in range(n_subspaces))
    return corpus.select(F.col(id_col), F.col(emb_col)).mapInPandas(
        encode_batches,
        schema=f"{id_col} {id_type}, {code_schema}, recon_mse double",
    )


def _pq_codebook_ctes(
    corpus_sql: str,
    n_subspaces: int,
    n_centroids: int,
    n_iters: int,
    dim: int,
    sample_mod: int | None,
) -> tuple[list[str], list[str]]:
    """Shared CTE scaffolding for the PQ oracle twins: per-subspace
    prefixed k-means chains plus the SELECTs that union them into the
    (subspace, cid, cemb) codebook. Factored out so :func:`pq_codes_sql`
    and :func:`pq_adc_topk_sql` derive the identical codebook."""
    sub_dim = dim // n_subspaces
    chains, cb_selects = [], []
    for m in range(n_subspaces):
        sub_sql = (
            f"SELECT vec_id, array_slice(embedding, {m * sub_dim + 1}, "
            f"{(m + 1) * sub_dim}) AS embedding FROM ({corpus_sql})"
        )
        chains.append(
            kmeans_lite_sql(
                sub_sql, n_centroids, n_iters, sub_dim, sample_mod, prefix=f"s{m}_"
            )
        )
        cb_selects.append(
            f"SELECT {m} AS subspace, CAST(centroid_id AS BIGINT) AS cid, "
            f"c_emb AS cemb FROM s{m}_c{n_iters}"
        )
    return chains, cb_selects


def pq_codes_sql(
    corpus_sql: str,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    sample_mod: int | None = 16,
) -> str:
    """DuckDB twin of :func:`pq_codes`: per-subspace prefixed k-means
    chains, a unioned codebook, L2 argmin per (vector, subspace), and
    the code pivot. ``corpus_sql`` must yield (vec_id, embedding)."""
    sub_dim = dim // n_subspaces
    chains, cb_selects = _pq_codebook_ctes(
        corpus_sql, n_subspaces, n_centroids, n_iters, dim, sample_mod
    )
    d2 = l2_sq_sql(
        f"array_slice(v.embedding, cb.subspace * {sub_dim} + 1, "
        f"(cb.subspace + 1) * {sub_dim})",
        "cb.cemb",
        sub_dim,
    )
    code_cols = ", ".join(
        f"CAST(max(CASE WHEN subspace = {m} THEN cid END) AS BIGINT) AS code_{m}"
        for m in range(n_subspaces)
    )
    return f"""
WITH {",".join(chains)},
cb AS ({" UNION ALL ".join(cb_selects)}),
scored AS (
  SELECT v.vec_id, cb.subspace, cb.cid, {d2} AS d2
  FROM ({corpus_sql}) v, cb
),
best AS (
  SELECT vec_id, subspace, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d2, cid) AS rn
    FROM scored) WHERE rn = 1
)
SELECT vec_id, {code_cols}, sum(d2) / {float(dim)} AS recon_mse
FROM best GROUP BY 1
"""


def pq_adc_topk_sql(
    train_sql: str,
    encode_sql: str,
    queries_sql: str,
    k: int = 5,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    sample_mod: int | None = 16,
    rank_decimals: int = 6,
) -> str:
    """DuckDB twin of :func:`pq_adc_topk` end-to-end: codebooks trained
    on ``train_sql``, codes for ``encode_sql``, per-query K·M distance
    tables for ``queries_sql``, the M-lookup sum, and the per-query
    top-k. Ranking uses the ``rank_decimals``-quantized distance (id
    tiebreak) on BOTH sides — the raw 4-term float sum is evaluated in
    engine-specific addition order, so two codes-equal candidates can
    differ by ULPs between engines; quantizing the sort key makes the
    tie (and therefore the id tiebreak) deterministic. Returns
    (query_id, rank, vec_id, adc_d2 raw)."""
    from homelogging_spark.functions.numeric import quantize_sql

    sub_dim = dim // n_subspaces
    chains, cb_selects = _pq_codebook_ctes(
        train_sql, n_subspaces, n_centroids, n_iters, dim, sample_mod
    )
    enc_d2 = l2_sq_sql(
        f"array_slice(v.embedding, cb.subspace * {sub_dim} + 1, "
        f"(cb.subspace + 1) * {sub_dim})",
        "cb.cemb",
        sub_dim,
    )
    q_d2 = l2_sq_sql(
        f"array_slice(q.q_emb, cb.subspace * {sub_dim} + 1, "
        f"(cb.subspace + 1) * {sub_dim})",
        "cb.cemb",
        sub_dim,
    )
    unpiv = "\n  UNION ALL ".join(
        f"SELECT vec_id, {m} AS subspace, code_{m} AS cid FROM codes"
        for m in range(n_subspaces)
    )
    code_cols = ", ".join(
        f"CAST(max(CASE WHEN subspace = {m} THEN cid END) AS BIGINT) AS code_{m}"
        for m in range(n_subspaces)
    )
    return f"""
WITH {",".join(chains)},
cb AS ({" UNION ALL ".join(cb_selects)}),
scored AS (
  SELECT v.vec_id, cb.subspace, cb.cid, {enc_d2} AS d2
  FROM ({encode_sql}) v, cb
),
best AS (
  SELECT vec_id, subspace, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d2, cid) AS rn
    FROM scored) WHERE rn = 1
),
codes AS (SELECT vec_id, {code_cols} FROM best GROUP BY 1),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM ({queries_sql})),
dtab AS (SELECT query_id, cb.subspace, cb.cid, {q_d2} AS d2 FROM q, cb),
unpiv AS ({unpiv}),
summed AS (
  SELECT d.query_id, u.vec_id, sum(d.d2) AS adc_d2
  FROM unpiv u JOIN dtab d USING (subspace, cid)
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, adc_d2, row_number() OVER (
           PARTITION BY query_id
           ORDER BY {quantize_sql('adc_d2', rank_decimals)}, vec_id) AS rank
  FROM summed
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_d2
FROM r WHERE rank <= {k}
"""


def ivf_pq_topk_sql(
    train_sql: str,
    encode_sql: str,
    queries_sql: str,
    k: int = 5,
    nprobe: int = 2,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_iters: int = 2,
    coarse_k: int = 8,
    coarse_iters: int = 2,
    dim: int = 64,
    sample_mod: int | None = 16,
    rank_decimals: int = 6,
    rotation=None,
) -> str:
    """DuckDB twin of :func:`ivf_pq_topk` end-to-end: the coarse
    quantizer (``kmeans_lite_sql`` chain on the corpus, ``g_`` prefix —
    the per-subspace PQ chains use ``s{m}_``, so both k-means families
    coexist in one WITH clause), cosine cell assignment for the corpus,
    ``nprobe`` probes per query, and the :func:`pq_adc_topk_sql` ADC
    lookup restricted to the probed candidate pairs. Ranking quantized
    as in the ADC twin. Returns (query_id, rank, vec_id, adc_d2 raw).

    ``rotation`` (r19): twin of the Spark side's ``rotate`` dial — the
    coarse chain and both cell assignments stay in the RAW space while
    the PQ train/encode/distance-table sides run on
    :func:`rotate_by_matrix_sql`-rotated sources, the IVF-OPQ
    composition's exact shape."""
    from homelogging_spark.functions.numeric import quantize_sql

    sub_dim = dim // n_subspaces
    if rotation is not None:
        rot_train = rotate_by_matrix_sql(train_sql, rotation)
        rot_encode = rotate_by_matrix_sql(encode_sql, rotation)
        rot_queries = rotate_by_matrix_sql(queries_sql, rotation)
    else:
        rot_train, rot_encode, rot_queries = train_sql, encode_sql, queries_sql
    chains, cb_selects = _pq_codebook_ctes(
        rot_train, n_subspaces, n_centroids, n_iters, dim, sample_mod
    )
    coarse = kmeans_lite_sql(
        encode_sql, coarse_k, coarse_iters, dim, sample_mod, prefix="g_"
    )
    cos_assign = cosine_sql("t.embedding", "c.c_emb", dim)
    enc_d2 = l2_sq_sql(
        f"array_slice(v.embedding, cb.subspace * {sub_dim} + 1, "
        f"(cb.subspace + 1) * {sub_dim})",
        "cb.cemb",
        sub_dim,
    )
    q_d2 = l2_sq_sql(
        f"array_slice(q.q_emb, cb.subspace * {sub_dim} + 1, "
        f"(cb.subspace + 1) * {sub_dim})",
        "cb.cemb",
        sub_dim,
    )
    unpiv = "\n  UNION ALL ".join(
        f"SELECT vec_id, {m} AS subspace, code_{m} AS cid FROM codes"
        for m in range(n_subspaces)
    )
    code_cols = ", ".join(
        f"CAST(max(CASE WHEN subspace = {m} THEN cid END) AS BIGINT) AS code_{m}"
        for m in range(n_subspaces)
    )
    return f"""
WITH {",".join(chains)},
cb AS ({" UNION ALL ".join(cb_selects)}),
{coarse},
cc AS (SELECT centroid_id, c_emb FROM g_c{coarse_iters}),
assign_c AS (
  SELECT vec_id, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos_assign} DESC, centroid_id) AS r
  FROM ({encode_sql}) t, cc c
),
cells AS (SELECT vec_id, centroid_id FROM assign_c WHERE r = 1),
assign_q AS (
  SELECT vec_id AS query_id, centroid_id, row_number() OVER (
           PARTITION BY vec_id ORDER BY {cos_assign} DESC, centroid_id) AS r
  FROM ({queries_sql}) t, cc c
),
probes AS (SELECT query_id, centroid_id FROM assign_q WHERE r <= {nprobe}),
cand AS (SELECT DISTINCT p.query_id, cl.vec_id
         FROM probes p JOIN cells cl USING (centroid_id)),
scored AS (
  SELECT v.vec_id, cb.subspace, cb.cid, {enc_d2} AS d2
  FROM ({rot_encode}) v, cb
),
best AS (
  SELECT vec_id, subspace, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY d2, cid) AS rn
    FROM scored) WHERE rn = 1
),
codes AS (SELECT vec_id, {code_cols} FROM best GROUP BY 1),
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM ({rot_queries})),
dtab AS (SELECT query_id, cb.subspace, cb.cid, {q_d2} AS d2 FROM q, cb),
unpiv AS ({unpiv}),
summed AS (
  SELECT c.query_id, c.vec_id, sum(d.d2) AS adc_d2
  FROM cand c
  JOIN unpiv u ON u.vec_id = c.vec_id
  JOIN dtab d ON d.query_id = c.query_id
            AND d.subspace = u.subspace AND d.cid = u.cid
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, vec_id, adc_d2, row_number() OVER (
           PARTITION BY query_id
           ORDER BY {quantize_sql('adc_d2', rank_decimals)}, vec_id) AS rank
  FROM summed
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_d2
FROM r WHERE rank <= {k}
"""


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rank_decimals: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k (Jégou et al. 2011 §IV): rank the
    ENCODED corpus against raw query vectors without ever decoding —
    the memory-bounded ANN path where 100 TB of float vectors live as
    M-byte codes and only the K·M-entry distance tables are computed
    per query.

    Per query, a distance table ``d2(q_m, c_{m,cid})`` over the tiny
    broadcast codebook (Q·M·K rows); the approximate distance to a
    vector is the sum of table lookups at its codes — by construction
    EXACTLY the L2 of the query to the vector's codebook
    reconstruction, which is what the unit pin asserts against a
    reconstruct-then-measure reference.

    Scale shape: codes unpivot to N·M (vec, subspace, cid) rows, join
    the broadcast table (constant-width lookup, no shuffle), one
    shuffle on the vector id for the M-term sum, one partitioned
    window for per-query top-k. Nothing touches the raw corpus
    embeddings and no stage exceeds O(N·M·Q) rows.

    Returns (query_id, rank, vec_id, adc_d2) — ascending approximate
    distance, id tiebreak. ``rank_decimals`` (None = raw) quantizes the
    SORT KEY: the M-term float sum is evaluated in engine-specific
    addition order, so codes-equal candidates can differ by ULPs and
    flip the id tiebreak vs an external oracle — quantizing the key
    makes ties deterministic (adc_d2 itself is returned raw)."""
    sub_dim = dim // n_subspaces
    q_sub = F.slice(
        F.col("q_emb"), F.col("subspace") * sub_dim + F.lit(1), F.lit(sub_dim)
    )
    dtab = (
        queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
        .crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "subspace", "cid", l2_sq(q_sub, F.col("cemb")).alias("d2")
        )
    )
    unpivoted = codes.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("subspace"),
                        F.col(f"code_{m}").alias("cid"),
                    )
                    for m in range(n_subspaces)
                ]
            )
        ).alias("sc"),
    ).select(id_col, F.col("sc.subspace").alias("subspace"), F.col("sc.cid").alias("cid"))
    summed = (
        unpivoted.join(F.broadcast(dtab), ["subspace", "cid"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    if rank_decimals is not None:
        from homelogging_spark.functions.numeric import quantize

        rank_key = quantize(F.col("adc_d2"), rank_decimals)
    else:
        rank_key = F.col("adc_d2")
    w = Window.partitionBy("query_id").orderBy(rank_key, F.col(id_col))
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            id_col,
            "adc_d2",
        )
    )


def ivf_pq_topk(
    queries: DataFrame,
    cell_assignments: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rank_decimals: int | None = None,
    rotate=None,
) -> DataFrame:
    """The FAISS IVF-PQ architecture (Jégou et al. 2011 §V) as a
    DataFrame composition: a coarse quantizer prunes the search to the
    query's ``nprobe`` nearest cells, then PQ asymmetric distance ranks
    the surviving CODES — raw corpus embeddings appear in neither stage,
    which is the whole point at 100 TB (the index is cell ids + M-byte
    codes, both built once at ingest).

    ``cell_assignments``: (vec_id, centroid_id) — `ivf_assign(corpus,
    centroids, 1)` materialized at ingest. ``codes``: `pq_codes`
    output. Non-residual variant: codes quantize the raw vectors, not
    the cell residuals — the recall/simplicity tradeoff documented in
    the paper; the exact-rerank stage of a production pipeline sits
    downstream either way.

    Scale shape: probes are Q·nprobe rows joined to the cell index on
    centroid_id (shuffle bounded by the probed cells ~ nprobe/K of the
    corpus), candidates then ride the `pq_adc_topk` lookup path.
    Returns (query_id, rank, vec_id, adc_d2).

    ``rotate`` (r19, the IVF-OPQ composition — r18 verdict #8; r20: a
    DataFrame-level transform ``(df, id_col, emb_col) -> df`` so the
    Arrow-batch bit-exact rotation twins can serve here): applied to
    the QUERY side for the ADC distance table ONLY. Pass the
    generation's OPQ
    rotation when ``codes``/``codebook`` live in rotated space while
    ``centroids``/``cell_assignments`` live in the raw space: the
    rotation is orthogonal, so raw-space coarse pruning selects
    exactly the cells a rotated-space prune would (inner products and
    norms are invariant), and only the dim-sized query vectors are
    ever rotated — the corpus is touched in neither space at serve
    time."""
    sub_dim = dim // n_subspaces
    probes = ivf_assign(queries, centroids, nprobe, id_col, emb_col).select(
        F.col(id_col).alias("query_id"), "centroid_id"
    )
    # candidate PAIRS: this query's probed cells only — scoring is
    # pair-restricted, so one query's candidates never displace
    # another's ranking
    cand = (
        probes.join(
            cell_assignments.select(F.col(id_col), "centroid_id"), "centroid_id"
        )
        .select("query_id", id_col)
        .distinct()
    )
    q_sub = F.slice(
        F.col("q_emb"), F.col("subspace") * sub_dim + F.lit(1), F.lit(sub_dim)
    )
    q_src = queries if rotate is None else rotate(queries, id_col, emb_col)
    dtab = (
        q_src.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
        )
        .crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "subspace", "cid", l2_sq(q_sub, F.col("cemb")).alias("d2")
        )
    )
    unpivoted = (
        codes.join(cand.select(id_col).distinct(), id_col)
        .select(
            F.col(id_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("subspace"),
                            F.col(f"code_{m}").alias("cid"),
                        )
                        for m in range(n_subspaces)
                    ]
                )
            ).alias("sc"),
        )
        .select(
            id_col,
            F.col("sc.subspace").alias("subspace"),
            F.col("sc.cid").alias("cid"),
        )
    )
    summed = (
        unpivoted.join(cand, id_col)
        .join(F.broadcast(dtab), ["query_id", "subspace", "cid"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    if rank_decimals is not None:
        # same cross-engine tie rationale as pq_adc_topk
        from homelogging_spark.functions.numeric import quantize

        rank_key = quantize(F.col("adc_d2"), rank_decimals)
    else:
        rank_key = F.col("adc_d2")
    w = Window.partitionBy("query_id").orderBy(rank_key, F.col(id_col))
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            id_col,
            "adc_d2",
        )
    )


# Salt for the hot-cell hash-split — module-level so the DuckDB oracle
# twin (plans/llm_registry.py) derives the identical sub-cell ids.
SEMDEDUP_SPLIT_SALT = "semdedup_cell_split"


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cell_cap: int | None = None,
    observe_caps: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): vectors are assigned to coarse k-means cells and
    duplicate pairs are searched ONLY within a cell — the cluster
    scoping that makes semantic dedup tractable at corpus scale. A
    vector is dropped when some SMALLER-id vector in its cell has
    cosine >= ``threshold`` (pairwise min-id survivor rule — no
    transitive closure, so the verdict is a pure function of the pair
    set and oracle-replicable).

    ``cell_cap`` is the hot-cell guard: without it the pair stage is
    sum(cell_size^2) — ~N^2/K for balanced cells but quadratic in a
    density peak (a near-identical boilerplate cluster, a real shape in
    web corpora, can drag one cell toward all-pairs). With a cap, any
    cell of size S > cap is hash-split into ceil(S/cap) sub-cells by a
    salted md5 of the id (deterministic, oracle-replicable) and pairs
    form only within a sub-cell, so the expected pair count per cell is
    <= S*cap and the whole stage is bounded by N*cap regardless of how
    skewed the cell histogram gets. The trade is the standard SemDeDup
    one, sharpened: a duplicate pair hashed into different sub-cells of
    a hot cell is missed — acceptable for dedup (a density peak that
    overflows the cap keeps at most ~1/ceil(S/cap) of its mass either
    way), fatal never (cells at or under the cap are untouched, and the
    survivor rule is unchanged). Cells <= cap produce byte-identical
    output to the uncapped form.

    Scale: one broadcast-assign pass over the corpus (centroids are
    K rows), a K-row cell-size frame broadcast back for the split, a
    shuffle on (centroid_id, sub), and the bounded pair stage. The
    per-vector verdict is a groupBy over candidate pairs. Returns one
    row per input vector: ``(id, cell, n_dups, kept)``."""
    from homelogging_spark.functions.cachelife import tracked_persist

    # Persisted: the assign frame feeds BOTH pair-join sides, the final
    # verdict join, and (capped) the cell-size census — unpersisted,
    # Spark recomputes the N·K assignment for each consumer (measured
    # 1.9x wall on a 20k balanced fixture for the capped form alone).
    cells = tracked_persist(
        ivf_assign(corpus, centroids, 1, id_col, emb_col).select(
            F.col(id_col), F.col(emb_col), "centroid_id"
        )
    )
    if cell_cap is not None:
        if cell_cap < 1:
            raise ValueError(f"cell_cap must be >= 1, got {cell_cap}")
        from homelogging_spark.operators.sampling import uniform_from_key

        # K-row frame: how many hash-splits each cell needs. Broadcast
        # back so the split is a map-side column, not a shuffle.
        splits = cells.groupBy("centroid_id").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(float(cell_cap)))
            .cast("bigint")
            .alias("_n_splits")
        )
        if observe_caps:
            from homelogging_spark.functions.capstats import observe_cap_splits

            splits = observe_cap_splits(splits, "cell_cap")
        cells = cells.join(F.broadcast(splits), "centroid_id").withColumn(
            "_sub",
            F.floor(
                uniform_from_key(F.col(id_col), SEMDEDUP_SPLIT_SALT)
                * F.col("_n_splits")
            ).cast("bigint"),
        )
    else:
        cells = cells.withColumn("_sub", F.lit(0).cast("bigint"))
    a = cells.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("emb_a"),
        norm(F.col(emb_col)).alias("nrm_a"),
        "centroid_id",
        "_sub",
    )
    b = cells.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("emb_b"),
        norm(F.col(emb_col)).alias("nrm_b"),
        "centroid_id",
        "_sub",
    )
    pairs = (
        a.join(b, ["centroid_id", "_sub"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot_product(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cos"),
        )
        .where(F.col("cos") >= F.lit(threshold))
    )
    partners = pairs.select(
        F.col("id_a").alias("vid"), F.col("id_b").alias("other")
    ).unionByName(pairs.select(F.col("id_b").alias("vid"), F.col("id_a").alias("other")))
    verdict = partners.groupBy("vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.min("other").alias("min_partner"),
    )
    return (
        cells.join(verdict, cells[id_col] == verdict.vid, "left")
        .select(
            F.col(id_col),
            F.col("centroid_id").alias("cell"),
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce(F.col("min_partner") > F.col(id_col), F.lit(True)).alias(
                "kept"
            ),
        )
    )


# --- SQ8 scalar quantization (r15) -------------------------------------------
#
# The OTHER standard ANN memory lever beside PQ (FAISS
# IndexScalarQuantizer SQ8 / Milvus SQ8): each dimension is linearly
# mapped to one uint8 against per-dimension [min, max] bounds trained
# on the corpus — 4x smaller than float32 at dim bytes per vector, far
# cheaper to encode than PQ (no codebook training, one bounds pass),
# and the decode is two flops/dim. Where PQ's M-byte codes win on
# compression, SQ8 wins on encode cost and accuracy near the top of
# the ranking; serving stacks commonly run SQ8 as the first
# memory-reduction step and move to PQ only when RAM forces it.
#
# Every arithmetic step (clamp, round-half-up, dequantize, cosine) is
# index-ordered double math, reproduced verbatim by the SQL twins — the
# driver oracle replays the full train → encode → decode → rank chain
# bit-for-bit (the pq_codes discipline).


def sq8_bounds(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_mod: int | None = None,
) -> DataFrame:
    """Per-dimension training bounds as ONE row ``(mins array<double>,
    maxs array<double>)`` — the SQ8 "codebook". One posexplode +
    bounded-key shuffle (dim rows), then a fold to position-ordered
    arrays; dim-sized output, broadcast by every consumer.

    By default the FULL corpus is scanned (exact bounds — what
    ``index_cycle`` commits, so encode/decode is deterministic across
    engines). ``sample_mod`` is the 100 TB dial, mirroring the PQ
    trainer's ``id % sample_mod == 0`` sample (r15 ADVICE: the
    docstring used to claim sampling the implementation didn't do):
    bounds are order statistics, so a sample pins them within clamp
    noise at a fraction of the scan — but sampled bounds are only
    min/max-correct over the sample, so codes of out-of-sample extremes
    clamp (the standard FAISS ScalarQuantizer trade-off)."""
    if sample_mod:
        corpus = corpus.where(F.col(id_col) % sample_mod == 0)
    per_dim = (
        corpus.select(F.posexplode(F.col(emb_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    return per_dim.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
        ).alias("maxs"),
    )


def sq8_code_col(emb: Column, mins: Column, maxs: Column) -> Column:
    """uint8 code array: ``floor(clamp((x-mn)/(mx-mn), 0, 1)*255 + 0.5)``
    per dimension (round-half-up — the ``quantize`` discipline, so the
    SQL twin is bit-identical); a degenerate dimension (mx == mn)
    codes to 0 and decodes to mn exactly."""
    xm = F.zip_with(
        emb,
        mins,
        lambda x, mn: F.struct(x.cast("double").alias("x"), mn.alias("mn")),
    )
    return F.zip_with(
        xm,
        maxs,
        lambda s, mx: F.when(mx - s["mn"] == 0, F.lit(0)).otherwise(
            F.floor(
                F.least(
                    F.greatest((s["x"] - s["mn"]) / (mx - s["mn"]), F.lit(0.0)),
                    F.lit(1.0),
                )
                * 255
                + F.lit(0.5)
            ).cast("int")
        ),
    )


def sq8_dequant_col(codes: Column, mins: Column, maxs: Column) -> Column:
    """Decode: ``mn + code/255.0*(mx-mn)`` per dimension, double math in
    the same operation order as the SQL twin."""
    cm = F.zip_with(
        codes,
        mins,
        lambda c, mn: F.struct(c.cast("double").alias("c"), mn.alias("mn")),
    )
    return F.zip_with(
        cm, maxs, lambda s, mx: s["mn"] + s["c"] / F.lit(255.0) * (mx - s["mn"])
    )


def sq8_codes(
    corpus: DataFrame,
    bounds: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus: ``(id, codes array<int>, recon_mse double)``
    with the per-vector reconstruction MSE as the honesty column (the
    ``pq_codes`` convention — compression error published by data).
    Plan: one corpus scan against the broadcast 1-row bounds (constant
    width — the same benign BNLJ as the PQ codebook lookup); pass a
    precomputed/persisted ``bounds`` frame to reuse ingest-time
    training, exactly like ``pq_codes(codebook=...)``."""
    if bounds is None:
        bounds = sq8_bounds(corpus, id_col, emb_col)
    withb = corpus.select(F.col(id_col), F.col(emb_col)).crossJoin(
        F.broadcast(bounds)
    )
    coded = withb.withColumn(
        "codes", sq8_code_col(F.col(emb_col), F.col("mins"), F.col("maxs"))
    ).withColumn(
        "_hat", sq8_dequant_col(F.col("codes"), F.col("mins"), F.col("maxs"))
    )
    err = F.zip_with(
        F.col(emb_col), F.col("_hat"), lambda x, h: (x.cast("double") - h) ** 2
    )
    return coded.select(
        F.col(id_col),
        "codes",
        (_fold_sum(err) / F.size(F.col(emb_col))).alias("recon_mse"),
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bounds: DataFrame | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ8 search: float queries ranked against the DECODED
    corpus codes (queries are never quantized — the FAISS asymmetric
    convention, better accuracy at zero extra cost since the query side
    is tiny). Returns ``(query_id, rank, vec_id, cosine_sq8)``; compose
    with :func:`topk_recall` for the honesty column.

    Plan shape: bounds are trained ONCE (one dim-row aggregate scan);
    encode+decode fuse into a single broadcast-bounds projection over
    one corpus scan (at scale the codes table is the ingest-maintained
    artifact and only the two-flop decode runs per probe — pass
    ``bounds`` to skip the training scan entirely), scoring is the
    same broadcast-query BNLJ as ``exact_topk``, rank is one window
    over |Q|·|corpus| scores."""
    if bounds is None:
        bounds = sq8_bounds(corpus, id_col, emb_col)
    hat = (
        corpus.select(F.col(id_col), F.col(emb_col))
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col(id_col),
            sq8_dequant_col(
                sq8_code_col(F.col(emb_col), F.col("mins"), F.col("maxs")),
                F.col("mins"),
                F.col("maxs"),
            ).alias("_hat"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
    )
    scored = hat.crossJoin(F.broadcast(q)).select(
        "query_id",
        id_col,
        cosine(F.col("q_emb"), F.col("_hat")).alias("cosine_sq8"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sq8"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine_sq8")
    )


def sq8_bounds_sql(corpus_sql: str, dim: int) -> str:
    """DuckDB twin of :func:`sq8_bounds` as a CTE body: one row
    ``(mins, maxs)`` of position-ordered lists."""
    return f"""SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
FROM (SELECT i, min(CAST(embedding[i+1] AS DOUBLE)) AS mn,
             max(CAST(embedding[i+1] AS DOUBLE)) AS mx
      FROM ({corpus_sql}) _c, range({dim}) t(i) GROUP BY i)"""


def sq8_codes_sql(emb: str, dim: int) -> str:
    """Per-dimension uint8 code list — identical arithmetic to
    :func:`sq8_code_col` (clamp, *255, round-half-up) against ``mins``/
    ``maxs`` lists in scope."""
    x = f"CAST(({emb})[i+1] AS DOUBLE)"
    span = "(maxs[i+1] - mins[i+1])"
    clamped = f"least(greatest(({x} - mins[i+1]) / {span}, 0), 1)"
    return (
        f"list_transform(range({dim}), i -> CASE WHEN {span} = 0 THEN 0 "
        f"ELSE CAST(floor({clamped} * 255 + 0.5) AS INT) END)"
    )


def sq8_dequant_sql(codes: str, dim: int) -> str:
    """Decode twin of :func:`sq8_dequant_col`."""
    return (
        f"list_transform(range({dim}), i -> mins[i+1] + "
        f"CAST(({codes})[i+1] AS DOUBLE) / 255.0 * (maxs[i+1] - mins[i+1]))"
    )


# --- OPQ-style structured rotation (r16) --------------------------------------
#
# Ge et al. 2013 (Optimized Product Quantization) rotate vectors before
# PQ so variance spreads evenly across subspaces — contiguous slices of
# raw embeddings often concentrate energy in a few subspaces, wasting
# codebook entropy. The learned-R variant needs an SVD per iteration;
# the standard cheap stand-in (FALCONN / fast-JL practice) is the
# STRUCTURED rotation y = (1/sqrt(d)) * H * (s ⊙ x): a deterministic
# ±1 diagonal followed by a Walsh–Hadamard transform. H entries are
# ±1 ((-1)^popcount(i AND j)), so the rotation is exactly orthogonal,
# L2 distances are preserved to fp rounding, and — the property
# everything here hangs on — BOTH engines can replay it bit-for-bit
# from `bit_count`, with md5-derived signs frozen as literals (the LSH
# plane discipline). Requires dim to be a power of two.

def hd_signs(dim: int, seed: str = "opq") -> list[float]:
    """The rotation's ±1 diagonal: md5-derived per dimension, embedded
    as literals on both engines (deterministic config, not data)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), 16) % 2 == 0
        else -1.0
        for i in range(dim)
    ]


def hd_rotate(
    emb: Column, dim: int, seed: str = "opq", signs: list[float] | None = None
) -> Column:
    """``y_j = (1/sqrt(dim)) * sum_i (-1)^popcount(i & j) * s_i * x_i``
    — map-side expression, index-order summation (``_fold_sum``), scale
    exact for power-of-two dims. O(dim^2) flops per vector: fine for
    encode/train passes (one corpus scan each); production at large dim
    would use the O(d log d) butterfly, which is a per-batch numpy
    Pandas-UDF swap with identical semantics.

    ``signs``: explicit ±1 diagonal overriding the seed derivation —
    pass the COMMITTED ``opq_signs`` artifact when serving against a
    :func:`maintenance.index_cycle` generation, so a later seed change
    can never silently mismatch the stored codes (r17)."""
    if dim & (dim - 1):
        raise ValueError(f"hd_rotate needs a power-of-two dim, got {dim}")
    sign_list = hd_signs(dim, seed) if signs is None else list(signs)
    if len(sign_list) != dim or any(s not in (1.0, -1.0) for s in sign_list):
        raise ValueError("signs must be a dim-length list of +/-1.0")
    signs = F.array(*[F.lit(s) for s in sign_list])
    sx = F.zip_with(emb, signs, lambda x, s: x.cast("double") * s)
    scale = 1.0 / float(dim) ** 0.5
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: _fold_sum(
            F.transform(
                sx,
                lambda x, i: F.when(
                    F.bit_count(i.cast("long").bitwiseAND(j.cast("long"))) % 2
                    == 1,
                    -x,
                ).otherwise(x),
            )
        )
        * F.lit(scale),
    )


def hd_rotate_fwht(
    df: DataFrame,
    dim: int,
    seed: str = "opq",
    signs: list[float] | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """O(d log d) form of :func:`hd_rotate`: the fast Walsh–Hadamard
    butterfly over Arrow batches (``mapInPandas`` + numpy) — the
    production-dim encode path the r16 round documented as hypothetical
    and r17 ships (the serving path made it real: ``index_cycle`` now
    rotates the WHOLE corpus per OPQ generation, and at dim 1024 the
    expression form is ~1M flops/vector vs ~10K here).

    Same transform, same frozen signs, but BUTTERFLY summation order —
    float addition is non-associative, so outputs differ from the
    expression form at the ~1e-15 relative level (pinned ≤ 1e-9 abs in
    ``TestHdRotation``). Therefore: per GENERATION pick one impl and
    keep it — codes recomputed under the other impl can flip an argmin
    on a knife-edge vector. The oracle-replicable expression form stays
    the default everywhere the DuckDB twin must replay rotation
    bit-for-bit; this one is the throughput dial
    (``index_cycle(opq_impl='fwht')``), measured in SCALE.md r17.

    Emits ``(id_col, emb_col array<double>)`` with the id column's
    INPUT dtype (r18, ADVICE fix: the schema was hard-coded ``long``,
    so non-bigint id corpora — which the 'expr' path and ``index_cycle``
    otherwise accept — failed or miscast only on this dial); other
    columns drop (the encode path needs nothing else)."""
    if dim & (dim - 1):
        raise ValueError(f"hd_rotate_fwht needs a power-of-two dim, got {dim}")
    sign_list = hd_signs(dim, seed) if signs is None else list(signs)
    if len(sign_list) != dim or any(s not in (1.0, -1.0) for s in sign_list):
        raise ValueError("signs must be a dim-length list of +/-1.0")
    sign_arr = [float(s) for s in sign_list]
    scale = 1.0 / float(dim) ** 0.5

    def rotate_batches(batches):
        import numpy as np
        import pandas as pd

        s = np.asarray(sign_arr, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            ) * s
            h = 1
            while h < dim:
                # vectorized butterfly: pair lanes i and i+h per block —
                # exactly H_{ij} = (-1)^popcount(i AND j) in natural order
                m = m.reshape(-1, dim // (2 * h), 2, h)
                a = m[:, :, 0, :].copy()
                b = m[:, :, 1, :]
                m[:, :, 0, :] = a + b
                m[:, :, 1, :] = a - b
                m = m.reshape(-1, dim)
                h *= 2
            m *= scale
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, emb_col: list(m)}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        rotate_batches, schema=f"{id_col} {id_type}, {emb_col} array<double>"
    )


def hd_rotate_sql(
    corpus_sql: str,
    dim: int,
    seed: str = "opq",
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`hd_rotate` — identical sign literals,
    identical summation bracketing (``list_reduce``), identical scale.
    Yields ``(id_col, emb_col)`` with the rotated embedding."""
    if dim & (dim - 1):
        raise ValueError(f"hd_rotate_sql needs a power-of-two dim, got {dim}")
    signs = "[" + ", ".join(repr(s) for s in hd_signs(dim, seed)) + "]"
    scale = repr(1.0 / float(dim) ** 0.5)
    return f"""
SELECT {id_col}, list_transform(range({dim}), j ->
         list_reduce(list_transform(range({dim}), i ->
             CASE WHEN bit_count(i & j) % 2 = 1 THEN -sx[i+1] ELSE sx[i+1] END),
           (x, y) -> x + y) * {scale}) AS {emb_col}
FROM (SELECT {id_col},
             list_transform(range({dim}),
               i -> CAST({emb_col}[i+1] AS DOUBLE) * ({signs})[i+1]) AS sx
      FROM ({corpus_sql}))
"""


def _np_hd_matrix(dim: int, signs):
    """The HD transform as an explicit dim×dim matrix (numpy):
    ``R[i, j] = (1/sqrt d) * (-1)^popcount(i AND j) * s_i`` — row i of
    the input maps through sign i, matching :func:`hd_rotate`'s
    ``y = (1/sqrt d) H (s ⊙ x)`` exactly (pinned in TestHdRotation)."""
    import numpy as np

    i = np.arange(dim)
    pop = np.array(
        [[bin(a & b).count("1") & 1 for b in i] for a in i], dtype=np.float64
    )
    h = np.where(pop == 1.0, -1.0, 1.0) / float(dim) ** 0.5
    return np.asarray(signs, dtype=np.float64)[:, None] * h


def _np_pq_train(
    y, n_subspaces: int, n_centroids: int, n_iters: int, init_books=None
):
    """Deterministic per-subspace Lloyd k-means on a training matrix
    (numpy twin of the :func:`pq_codebook` discipline: fixed iteration
    count, deterministic init — the K smallest-row-index training
    vectors — first-min tie-break). ``init_books`` WARM-STARTS the
    centroids from a previous alternation (Ge et al. §3.1: the
    warm start is what makes the alternating objective monotone —
    re-initializing each iteration could regress). Returns
    (codebooks[M][K][sub_dim], recon) where recon is the training-set
    reconstruction."""
    import numpy as np

    n, dim = y.shape
    sub = dim // n_subspaces
    recon = np.empty_like(y)
    books = []
    for m in range(n_subspaces):
        ym = y[:, m * sub : (m + 1) * sub]
        if init_books is not None:
            cents = np.asarray(init_books[m], dtype=np.float64).copy()
        else:
            cents = ym[: min(n_centroids, n)].copy()
            if len(cents) < n_centroids:  # degenerate tiny sample: pad
                cents = np.vstack(
                    [cents] + [cents[-1:]] * (n_centroids - len(cents))
                )
        for _ in range(n_iters):
            d2 = ((ym[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for kk in range(n_centroids):
                members = ym[assign == kk]
                if len(members):
                    cents[kk] = members.mean(axis=0)
        d2 = ((ym[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        recon[:, m * sub : (m + 1) * sub] = cents[d2.argmin(axis=1)]
        books.append(cents)
    return books, recon


def opq_learn_rotation(
    corpus: DataFrame,
    dim: int = 64,
    n_subspaces: int = 4,
    n_centroids: int = 8,
    n_kmeans_iters: int = 2,
    n_alt_iters: int = 4,
    sample_mod: int | None = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    init: str = "identity",
    seed: str = "opq",
) -> dict:
    """LEARNED-rotation OPQ training (r18 stretch — Ge et al. 2013
    §3.1, the non-parametric alternating optimization the ``opq_panel``
    HD transform approximates structurally): alternate (a) training the
    per-subspace PQ codebooks on the rotated sample with (b) the
    orthogonal-Procrustes rotation update ``R = U Vᵀ`` from
    ``SVD(Xᵀ X̂)``, minimizing the single objective
    ``‖X R − X̂‖²`` — so the training reconstruction error is
    MONOTONE NON-INCREASING across iterations (pinned), and with
    ``init='identity'`` iteration 1's error IS plain PQ's: the learned
    rotation can only match or beat it on the training sample.

    Scale/drivers contract: training runs DRIVER-side in numpy on the
    deterministic ``id % sample_mod`` sample — the exact contract the
    Spark PQ trainer already holds ("the quantizer only needs the
    density shape"), with the same dial: at 100 TB size ``sample_mod``
    so the sample fits driver memory (a dim-64 float64 sample of 1M
    rows is 512 MB; the artifacts returned are a dim×dim matrix and
    K·M sub-centroids — kilobytes). This is the zorder_rewrite
    approxQuantile pattern: bounded training state on the driver,
    nothing corpus-sized. The sample must also be LARGE ENOUGH:
    ``n_train < 2·dim`` is refused — an underdetermined Procrustes
    step overfits the sample and DEGRADES the corpus (measured on the
    fixture: n_train=31 at dim 64 → recon MSE worse than plain PQ and
    recall@5 0.0; n_train=495 → MSE parity with the HD transform and
    the best recall of the three methods — SCALE.md r18). Practical
    guidance: ≳ 8·dim. Serving applies R corpus-side
    (:func:`opq_rotate`, Arrow-batch BLAS matmul — the fwht shape) and
    the unchanged PQ machinery downstream.

    Registered-form honesty: the SVD step is not SQL-replayable, so
    this ships UNIT-pinned (orthogonality, objective monotonicity,
    determinism, beats-or-equals-PQ on the train sample, end-to-end
    Spark serving). The registration path — freezing a trained R as
    versioned config literals, the BPE DEFAULT_MERGES design, which
    makes the encode/recall chain oracle-replayable — is scoped in
    COVERAGE.md for a funded slot.

    ``init``: 'identity' (the monotonicity baseline) or 'hd' (start
    from the structured transform — never worse than the HD panel leg
    on the train objective). Returns ``{"rotation": dim×dim nested
    list, "codebooks": M×K×sub_dim nested list, "train_mse": per-
    iteration list, "n_train": sample size}``."""
    import numpy as np

    if dim & (dim - 1) and init == "hd":
        raise ValueError(f"init='hd' needs a power-of-two dim, got {dim}")
    if init not in ("identity", "hd"):
        raise ValueError(f"init must be 'identity' or 'hd', got {init!r}")
    vecs = corpus.select(F.col(id_col), F.col(emb_col))
    if sample_mod:
        vecs = vecs.where(F.col(id_col) % sample_mod == 0)
    rows = vecs.orderBy(id_col).collect()  # deterministic sample order
    if not rows:
        raise ValueError("empty training sample; lower sample_mod")
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    if x.shape[1] != dim:
        raise ValueError(f"embeddings have dim {x.shape[1]}, expected {dim}")
    if len(x) < 2 * dim:
        # with n_train <~ dim the Procrustes step is underdetermined: R
        # can rotate the sample onto its reconstructions while scrambling
        # every held-out vector. MEASURED on the sf0.01 fixture (dim 64):
        # n_train=31 -> full-corpus recon MSE 0.01549 (worse than plain
        # PQ's 0.01456) and recall@5 0.0; n_train=495 -> 0.01433 / 0.20.
        # Refuse rather than silently train a corpus-degrading rotation.
        raise ValueError(
            f"n_train={len(x)} < 2*dim={2 * dim}: the rotation would "
            "overfit the sample (see docstring); lower sample_mod"
        )
    r_mat = (
        np.eye(dim)
        if init == "identity"
        else _np_hd_matrix(dim, hd_signs(dim, seed))
    )
    mses = []
    books = None
    for _ in range(n_alt_iters):
        y = x @ r_mat
        books, recon = _np_pq_train(
            y, n_subspaces, n_centroids, n_kmeans_iters, init_books=books
        )
        mses.append(float(((y - recon) ** 2).sum() / (len(x) * dim)))
        # orthogonal Procrustes: min_R ||X R - recon||_F over orthogonal
        # R has the closed form R = U V^T from SVD(X^T recon)
        u, _, vt = np.linalg.svd(x.T @ recon)
        r_mat = u @ vt
    return {
        "rotation": [[float(v) for v in row] for row in r_mat],
        "codebooks": [
            [[float(v) for v in c] for c in cb] for cb in books
        ],
        "train_mse": mses,
        "n_train": len(x),
    }


def rotate_by_matrix(emb: Column, rotation) -> Column:
    """Apply an EXPLICIT rotation matrix as a map-side column
    expression: ``y_j = Σ_i x_i · R[i][j]`` with index-order summation
    (``_fold_sum`` — the exact bracketing DuckDB's ``list_reduce``
    uses, so :func:`rotate_by_matrix_sql` replays it bit-for-bit).
    This is the oracle-replayable serving form for a LEARNED rotation
    frozen as config (``opq_rotations.rotation_for``): unlike the HD
    transform there is no popcount closed form, so the matrix itself
    is the config — dim² literals, the ``hd_rotate`` expression-size
    precedent at dim 64. O(dim²) flops per vector; production swaps in
    :func:`opq_rotate` (Arrow-batch dgemm) where no oracle must replay
    the rotation, same discipline as expr-vs-fwht."""
    r = [[float(v) for v in row] for row in rotation]
    dim = len(r)
    if any(len(row) != dim for row in r):
        raise ValueError("rotation must be a square dim x dim matrix")
    x = F.transform(emb, lambda v: v.cast("double"))
    cols = [
        F.array(*[F.lit(r[i][j]) for i in range(dim)]) for j in range(dim)
    ]
    return F.array(
        *[_fold_sum(F.zip_with(x, cols[j], lambda a, b: a * b)) for j in range(dim)]
    )


def rotate_by_matrix_sql(
    corpus_sql: str,
    rotation,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`rotate_by_matrix` — identical matrix
    literals, identical summation bracketing (``list_reduce`` over the
    index-ordered products). Yields ``(id_col, emb_col)``."""
    r = [[float(v) for v in row] for row in rotation]
    dim = len(r)
    if any(len(row) != dim for row in r):
        raise ValueError("rotation must be a square dim x dim matrix")
    # literals in SCIENTIFIC notation: DuckDB parses plain decimal
    # literals as DECIMAL(19,18) — 18 fraction digits, which silently
    # rounds the 17-significant-digit repr of a double and breaks
    # bit-equality by an ulp per product; exponent form parses as
    # DOUBLE directly (17 sig digits round-trips every double)
    lit = lambda v: f"{v:.16e}"  # noqa: E731
    comps = []
    for j in range(dim):
        col_j = "[" + ", ".join(lit(r[i][j]) for i in range(dim)) + "]"
        comps.append(
            f"list_reduce(list_transform(range({dim}), i -> "
            f"CAST({emb_col}[i+1] AS DOUBLE) * ({col_j})[i+1]), "
            f"(x, y) -> x + y)"
        )
    arr = "[" + ", ".join(comps) + "]"
    return f"SELECT {id_col}, {arr} AS {emb_col} FROM ({corpus_sql})"


def _fold_matmul(m, r_arr):
    """``y = x · R`` with INDEX-ORDER LEFT-FOLD summation — the numpy
    twin of :func:`_fold_sum` over ``zip_with`` products: one vectorized
    add per input dimension, ``((0.0 + x_0·R[0,:]) + x_1·R[1,:]) + …``,
    so every output element reproduces the Catalyst expression's IEEE
    op sequence bit-for-bit (multiplies are element-independent; adds
    happen in the same order with the same 0.0 seed). NOT a dgemm —
    BLAS reorders the reduction; this form trades a constant factor of
    throughput for bit-equality with the SQL-replayable expression."""
    import numpy as np

    acc = np.zeros((m.shape[0], r_arr.shape[1]))
    for i in range(r_arr.shape[0]):
        acc = acc + m[:, i : i + 1] * r_arr[i]
    return acc


def _rotate_rows_foldexact(
    df: DataFrame,
    r_list: list[list[float]],
    dim: int,
    id_col: str,
    emb_col: str,
    pre_scale: list[float] | None = None,
    post_scale: float | None = None,
) -> DataFrame:
    """Shared Arrow-batch driver for the bit-exact rotation twins:
    ``y = fold_matmul(x ⊙ pre_scale, R) · post_scale`` over
    ``mapInPandas`` batches. Emits ``(id_col, emb_col array<double>)``
    exactly like :func:`opq_rotate`; embeddings must be non-null and
    dim-length (the expression forms would produce nulls there — the
    corpora this serves are dense by construction, so fail loudly
    instead)."""
    pre = None if pre_scale is None else [float(v) for v in pre_scale]

    def rotate_batches(batches):
        import numpy as np
        import pandas as pd

        r_arr = np.asarray(r_list, dtype=np.float64)
        pre_arr = None if pre is None else np.asarray(pre, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            if m.shape[1] != dim:
                raise ValueError(
                    f"embedding length {m.shape[1]} != dim {dim}"
                )
            if pre_arr is not None:
                m = m * pre_arr
            out = _fold_matmul(m, r_arr)
            if post_scale is not None:
                out = out * post_scale
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, emb_col: list(out)}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        rotate_batches, schema=f"{id_col} {id_type}, {emb_col} array<double>"
    )


def rotate_by_matrix_rows(
    df: DataFrame,
    rotation,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Arrow-batch twin of :func:`rotate_by_matrix` — bit-for-bit the
    same outputs (same cast-to-double widening, same index-order
    left-fold via :func:`_fold_matmul`), evaluated as ``dim`` vectorized
    numpy adds per batch instead of a dim² Catalyst HOF tree.

    Why it exists (r20 optimization): the expression form costs three
    ways the plan never shows — ~dim² py4j round-trips to BUILD the
    expression per invocation, Catalyst analysis/codegen of the ~60 KB
    plan per invocation, and interpreted lambda evaluation of dim²
    products PER ROW at execution (higher-order functions don't
    codegen their lambdas). This form is O(1) plan size and hands whole
    Arrow batches to numpy (guide §4.2) while keeping the DuckDB
    oracle's bit-exact replay, so it is also the 100 TB posture — the
    same shape as :func:`opq_rotate` minus BLAS's reduction reorder.
    Trade-off: ``mapInPandas`` is an opaque boundary, so filters no
    longer push below the rotation — callers must filter/sample BEFORE
    rotating (they do: rotate-then-filter ≡ filter-then-rotate on an
    id column the rotation doesn't touch)."""
    r = [[float(v) for v in row] for row in rotation]
    dim = len(r)
    if any(len(row) != dim for row in r):
        raise ValueError("rotation must be a square dim x dim matrix")
    return _rotate_rows_foldexact(df, r, dim, id_col, emb_col)


def hd_rotate_rows(
    df: DataFrame,
    dim: int,
    seed: str = "opq",
    signs: list[float] | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Arrow-batch twin of :func:`hd_rotate` (the EXPRESSION form, not
    the butterfly): ``y = (1/sqrt(dim)) · H · (s ⊙ x)`` with the
    expression's exact op order — pre-multiply by the ±1 diagonal
    (zip_with's ``x·s``), per-output-j index-order left-fold of
    ``±sx_i`` (multiplying by ±1.0 is IEEE-exact identity/negation, the
    same bits as the expression's conditional negate), then the final
    ``· 1/sqrt(dim)``. Unlike :func:`hd_rotate_fwht` this keeps
    bit-equality with the SQL-replayable form, so it can serve oracle
    queries; see :func:`rotate_by_matrix_rows` for why (plan-size +
    interpreted-HOF cost of the expression form)."""
    if dim & (dim - 1):
        raise ValueError(f"hd_rotate_rows needs a power-of-two dim, got {dim}")
    sign_list = hd_signs(dim, seed) if signs is None else list(signs)
    if len(sign_list) != dim or any(s not in (1.0, -1.0) for s in sign_list):
        raise ValueError("signs must be a dim-length list of +/-1.0")
    h = [
        [-1.0 if (i & j).bit_count() % 2 else 1.0 for j in range(dim)]
        for i in range(dim)
    ]
    return _rotate_rows_foldexact(
        df,
        h,
        dim,
        id_col,
        emb_col,
        pre_scale=sign_list,
        post_scale=1.0 / float(dim) ** 0.5,
    )


def opq_rotate(
    df: DataFrame,
    rotation,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Apply a learned OPQ rotation corpus-side: ``y = x R`` per vector
    via Arrow-batch BLAS matmul over ``mapInPandas`` — the
    :func:`hd_rotate_fwht` shape (O(dim²) flops but one dgemm per
    batch; at dim 64 the matmul is memory-bound, and unlike the HD
    butterfly a LEARNED dense matrix has no O(d log d) shortcut).
    Emits ``(id_col, emb_col array<double>)`` with the id column's
    input dtype; other columns drop (the encode path needs nothing
    else)."""
    import numpy as np

    r_mat = np.asarray(rotation, dtype=np.float64)
    if r_mat.shape != (dim, dim):
        raise ValueError(
            f"rotation must be {dim}x{dim}, got {r_mat.shape}"
        )
    r_list = [[float(v) for v in row] for row in r_mat]  # picklable

    def rotate_batches(batches):
        import numpy as np
        import pandas as pd

        r_arr = np.asarray(r_list, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[emb_col]]
            )
            out = m @ r_arr
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, emb_col: list(out)}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, emb_col).mapInPandas(
        rotate_batches, schema=f"{id_col} {id_type}, {emb_col} array<double>"
    )
