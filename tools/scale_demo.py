"""Scale-headroom demo: run headline queries against a synthetically
blown-up copy of the sf0.1 tables and compare observed scaling with the
cost models the operator docstrings claim.

Usage: python tools/scale_demo.py [factor]   (default 10)

The blow-up replicates each source row ``factor`` times with shifted
keys/timestamps (i-th copy offset by i days and a disjoint id range), so
group counts, join fan-ins, and LSH bucket populations all grow ~linearly
— a stand-in for "what does 10x more data do to the plan" on a single
box. Writes the blown-up tables once under spark-warehouse/ and reuses
them on re-runs. Prints one JSON line per query:
{"query": ..., "factor": N, "rows_in": ..., "sec": ...} plus a summary
comparing per-row throughput at 1x vs Nx.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from homelogging_spark.session import get_spark
from homelogging_spark.tables import _FIXTURE_ROOT, load_table

BASE_SF = "/root/testdata/sf0.1"


def blow_up_events(spark, factor: int) -> str:
    out = os.path.join(_FIXTURE_ROOT, f"scale_demo_x{factor}")
    if os.path.exists(os.path.join(out, "events.parquet", "_SUCCESS")):
        # dirs cached by pre-r6 runs lack the embeddings blow-up — add it
        _blow_up_embeddings(spark, factor, out)
        return out
    ev = load_table(spark, BASE_SF, "events")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    big = (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
            (F.col("ts") + F.make_interval(days=F.col("copy").cast("int"))).alias("ts"),
            (F.col("user_id") + F.col("copy") * n_users).alias("user_id"),
            "event_type",
            # per-copy jitter so aggregates don't fold to x1 values
            (F.col("value") + F.col("copy") * 0.001).alias("value"),
            "props",
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    _blow_up_embeddings(spark, factor, out)
    docs = load_table(spark, BASE_SF, "documents")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # shift text content per copy so near-dup structure is
            # replicated, not collapsed into one giant duplicate class
            F.concat(F.col("text"), F.lit(" c"), F.col("copy").cast("string")).alias(
                "text"
            ),
            "lang",
            "source",
            "n_chars",
        )
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    # remaining tables: symlink-free copy-through reads from sf0.1
    return out


def _blow_up_embeddings(spark, factor: int, out: str) -> None:
    """Replicate embeddings ``factor``x with disjoint id ranges and a
    per-copy deterministic direction jitter (amplitude ~ the element
    scale, so a copy sits at cosine ~0.5 from its original — DISTINCT
    vectors, not semantic duplicates). LSH bucket populations and IVF
    cell sizes therefore grow ~linearly, without densifying the dup
    graph the way the text blow-up deliberately does."""
    dest = os.path.join(out, "embeddings.parquet")
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return
    emb = load_table(spark, BASE_SF, "embeddings")
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    copies = spark.range(factor).withColumnRenamed("id", "copy")
    big = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * n_vecs).alias("vec_id"),
            F.when(F.col("copy") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x.cast("double")
                        + F.sin(
                            F.col("vec_id") * 0.37
                            + i.cast("double") * 0.71
                            + F.col("copy").cast("double") * 2.13
                        )
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(dest)


def _seed_centroid_frame(spark, n_centroids: int, dim: int):
    """seed_centroids as an ivf_assign-ready frame. The scale demo uses
    md5-seeded centroids directly (no Lloyd pass): over the blown-up
    near-random corpus they give ~balanced Voronoi cells, and the demo
    measures the assign/pair/probe stages, not quantizer training.
    (Training K with Lloyd is itself O(N*K) per iteration — at real
    scale the quantizer trains on a sample, not the corpus.)"""
    from homelogging_spark.operators.similarity import seed_centroids

    rows = [(j, vec) for j, vec in enumerate(seed_centroids(n_centroids, dim))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def embedding_tier(spark, factor: int, results: list) -> None:
    """Embedding-tier scale runs: semantic_dedup / embedding_near_dup /
    ann_ivf_topk at 1x and Nx. Each operator runs the big input twice —
    once with its dial SCALED the way the docstring prescribes for more
    data (K ~ N cells for SemDeDup / IVF; +log2(N) hyperplanes per LSH
    table), once with the 1x dial FIXED, to expose the cell/bucket
    occupancy penalty the dial exists to cancel."""
    import math

    from homelogging_spark.operators.similarity import (
        ivf_topk,
        lsh_near_dup_pairs,
        semantic_dedup,
    )

    big_dir = blow_up_events(spark, factor)
    base_k, base_planes, dim = 8, 4, 64

    def timed(name, sf_dir, fn, rows_in):
        # one untimed warm-up (bench.py convention): first execution pays
        # plan compilation + first-touch costs that depend on loop
        # position, not the plan — r4's lesson, SCALE.md "bench loop-order"
        fn().write.format("noop").mode("overwrite").save()
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        results.append(
            {"query": name, "dir": os.path.basename(sf_dir), "rows_in": rows_in, "sec": sec}
        )
        print(json.dumps(results[-1]))

    from homelogging_spark.functions.cachelife import release_caches
    from homelogging_spark.tables import spread

    for sf_dir, f in ((BASE_SF, 1), (big_dir, factor)):
        # spread() mirrors the registry entry (q_embedding_near_dup): the
        # 1x fixture is a single parquet split, and without the
        # repartition the 16 projection folds run on ONE thread
        emb = spread(spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")))
        n = emb.count()
        queries = emb.where(F.col("vec_id") < 5)
        corpus = emb.where(F.col("vec_id") >= 5).select("vec_id", "embedding")
        if f > 1:
            # the headline dial for SemDeDup: K ~ N cells AND a trained
            # quantizer — Lloyd on a 1/16 sample halves the hot cell and
            # the sum(cell^2) pair bill vs md5-seed centroids (SCALE.md
            # hot-cell census); timed with the training cost reported
            # separately since production trains once at ingest
            from homelogging_spark.operators.similarity import (
                kmeans_lite_centroids,
            )

            t0 = time.time()
            trained = kmeans_lite_centroids(
                corpus, n_centroids=base_k * f, n_iters=2, dim=dim
            )
            print(json.dumps({"train_centroids_sec": round(time.time() - t0, 2)}))
            timed(
                "semantic_dedup[scaled+trained]",
                sf_dir,
                lambda c=corpus, ce=trained: semantic_dedup(c, ce, threshold=0.9),
                n,
            )
        # IVF-PQ: the code-only search path — index (cells + codes +
        # codebook) built once per dir like an ingest artifact, then the
        # probe+ADC query timed; recall@k vs exact cosine reported so
        # the speed has an honesty number attached
        from pyspark.sql import Window

        from homelogging_spark.operators.similarity import (
            ivf_assign,
            ivf_pq_topk,
            l2_sq,
            pq_codebook,
            pq_codes,
        )

        # dials: M=16 subspaces x K=32 centroids = 80-bit codes, the
        # budget at which the isotropic-gaussian fixture (the PQ
        # adversarial case — no cluster structure, vanishing true-NN
        # margins) yields non-floor recall; see SCALE.md "IVF-PQ
        # honesty" for the measured dial curve
        pq_m, pq_k, n_probe = 16, 32, 4
        k_cells = base_k * f
        cents = _seed_centroid_frame(spark, k_cells, dim)
        t0 = time.time()
        from homelogging_spark.functions.cachelife import tracked_persist

        cells = tracked_persist(
            ivf_assign(corpus, cents, 1).select("vec_id", "centroid_id")
        )
        cb = tracked_persist(
            pq_codebook(corpus, n_subspaces=pq_m, n_centroids=pq_k, dim=dim)
        )
        pcodes = tracked_persist(
            pq_codes(
                corpus, n_subspaces=pq_m, n_centroids=pq_k, dim=dim, codebook=cb
            )
        )
        cells.count(), cb.count(), pcodes.count()
        print(json.dumps({"ivfpq_index_build_sec": round(time.time() - t0, 2)}))
        timed(
            f"ivf_pq_topk[x{f}]",
            sf_dir,
            lambda q=queries, ce=cents, cl=cells, co=pcodes, c=cb: ivf_pq_topk(
                q, cl, co, c, ce, k=3, nprobe=n_probe, n_subspaces=pq_m, dim=dim
            ),
            n,
        )
        # exact-L2 reference (ADC approximates L2, so the honest recall
        # baseline is L2 top-k, not the cosine ranker)
        q_side = queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        l2_scored = corpus.crossJoin(F.broadcast(q_side)).select(
            "query_id",
            "vec_id",
            l2_sq(F.col("q_emb"), F.col("embedding")).alias("d2"),
        )
        w_l2 = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("vec_id"))
        exact = {
            (r.query_id, r.vec_id)
            for r in l2_scored.withColumn("rn", F.row_number().over(w_l2))
            .where(F.col("rn") <= 3)
            .collect()
        }
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_topk(
                queries, cells, pcodes, cb, cents, k=3, nprobe=n_probe,
                n_subspaces=pq_m, dim=dim,
            ).collect()
        }
        print(
            json.dumps(
                {
                    "ivf_pq_recall_at_3": round(
                        len(exact & got) / max(len(exact), 1), 3
                    ),
                    "dir": os.path.basename(sf_dir),
                }
            )
        )
        release_caches()

        dials = [("scaled", f)] if f == 1 else [("scaled", f), ("fixed", 1)]
        for dial, df_ in dials:
            cents = _seed_centroid_frame(spark, base_k * df_, dim)
            planes = base_planes + (round(math.log2(df_)) if df_ > 1 else 0)
            suffix = "" if f == 1 else f"[{dial}]"
            timed(
                f"semantic_dedup{suffix}",
                sf_dir,
                lambda c=corpus, ce=cents: semantic_dedup(c, ce, threshold=0.9),
                n,
            )
            timed(
                f"embedding_near_dup{suffix}",
                sf_dir,
                lambda e=emb, p=planes: lsh_near_dup_pairs(
                    e, threshold=0.4, planes_per_table=p
                ),
                n,
            )
            release_caches()  # near_dup tracked-persists its bucket frame
            timed(
                f"ann_ivf_topk{suffix}",
                sf_dir,
                lambda q=queries, c=corpus, ce=cents: ivf_topk(
                    q, c, ce, k=3, nprobe=2
                ),
                n,
            )


def curriculum_tier(spark, factor: int) -> None:
    """A/B the r7 distributed curriculum_order plan against the naive
    global-window plan it replaced (r6 form: ntile + row_number over an
    unpartitioned Window — the whole corpus through ONE task) at 1x and
    Nx. Outputs are identical (same oracle); the measurement shows what
    removing the single-task funnel buys as the corpus grows."""
    from pyspark.sql import Window

    from homelogging_spark.functions.numeric import quantize
    from homelogging_spark.operators import textops
    from homelogging_spark.plans.llm_registry import q_curriculum_order
    from homelogging_spark.tables import spread

    def naive(sf_dir):
        # the pre-r7 plan, verbatim shape (llm_registry.py history)
        docs = spread(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        )
        q = quantize(textops.quality_columns(F.col("text"))["quality_score"])
        base = docs.select("doc_id", "source", q.alias("quality"))
        w_stage = Window.orderBy(F.col("quality").desc(), "doc_id")
        staged = base.withColumn(
            "stage", F.ntile(5).over(w_stage).cast("bigint")
        )
        w_src = Window.partitionBy("stage", "source").orderBy(
            F.col("quality").desc(), "doc_id"
        )
        pos = staged.withColumn(
            "pos_in_source", F.row_number().over(w_src).cast("bigint")
        )
        w_glob = Window.orderBy("stage", "pos_in_source", "source", "doc_id")
        return pos.withColumn(
            "global_pos", F.row_number().over(w_glob).cast("bigint")
        ).select(
            "doc_id", "source", "stage", "pos_in_source", "global_pos", "quality"
        )

    big_dir = blow_up_events(spark, factor)
    for sf_dir in (BASE_SF, big_dir):
        doc_rows = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        from homelogging_spark.functions.cachelife import release_caches

        for name, fn in (
            ("curriculum_distributed", lambda d=sf_dir: q_curriculum_order(spark, d)),
            ("curriculum_naive_window", lambda d=sf_dir: naive(d)),
        ):
            fn().write.format("noop").mode("overwrite").save()  # warm
            release_caches()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {
                        "query": name,
                        "dir": os.path.basename(sf_dir),
                        "rows_in": doc_rows,
                        "sec": round(time.time() - t0, 2),
                    }
                )
            )
            release_caches()


def sketch_tier(spark, factor: int) -> None:
    """Scale runs for the mergeable-sketch family (operators/sketches.py)
    over the blown-up documents' token stream (docs x ~54 word tokens):

    - ``kmv_build``: per-source KMV sketches of the token vocabulary.
      Cost model: one scan + map-side distinct combine + per-group
      k-select; rows grow Nx but the DISTINCT token set per source is
      ~flat under the blow-up (copies share the base text), so the
      exchange after the combine is ~constant and wall should grow
      well UNDER Nx (scan-dominated).
    - ``kmv_overlap``: pairwise Jaccard/intersection between all 20
      sources from the sketch rows alone — 190 pairs regardless of
      corpus size. The measurement pins the headline claim: overlap
      cost is CONSTANT in corpus size (it never touches raw rows).
    - ``cm_heavy_hitters``: exact top-10 + count-min estimates.
      Register table bounded at depth*width at any size; wall tracks
      the scan+partial-agg like any bounded-key aggregation.
    """
    from homelogging_spark.functions.cachelife import release_caches
    from homelogging_spark.operators import sketches as sk
    from homelogging_spark.tables import spread

    big_dir = blow_up_events(spark, factor)
    for sf_dir in (BASE_SF, big_dir):
        docs = spread(
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        )
        toks = docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        ).where(F.length("tok") > 0)
        n = toks.count()

        def timed(name, fn, rows_in=n, d=sf_dir):
            fn().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {
                        "query": name,
                        "dir": os.path.basename(d),
                        "rows_in": rows_in,
                        "sec": round(time.time() - t0, 2),
                    }
                )
            )

        timed("kmv_build", lambda t=toks: sk.kmv_sketch(t, "tok", ["source"], k=256))
        # overlap runs on the MATERIALIZED sketch rows (20 rows) — the
        # production shape: sketches are the stored rollup artifact;
        # set algebra never rescans the corpus
        sketch_rows = sk.kmv_sketch(toks, "tok", ["source"], k=256).collect()
        sk_df = spark.createDataFrame(sketch_rows)
        timed(
            "kmv_overlap",
            lambda s=sk_df: sk.kmv_overlap(s, "source", k=256),
            rows_in=len(sketch_rows),
        )
        timed(
            "cm_heavy_hitters",
            lambda t=toks: sk.heavy_hitters_report(
                t, "tok", k=10, depth=4, width=1024
            ),
        )
        # Bloom: build the seen-set filter over the corpus digests, then
        # probe a half-novel key panel inline. The claims measured: the
        # word table stays <= ceil(m/63) rows at any corpus size, and
        # the maybe-fraction (rows the exact join would still see) stays
        # at dup_share + FPR rather than growing with the corpus.
        digests = docs.select(F.md5(F.col("text")).alias("content_hash"))
        m_bits, j = 1 << 20, 5
        timed(
            "bloom_build",
            lambda d=digests: sk.bloom_build(d, "content_hash", m_bits, j),
        )
        filt = sk.bloom_build(digests, "content_hash", m_bits, j)
        panel = digests.limit(2000).unionByName(
            spark.range(4000).select(
                F.md5(F.concat(F.lit("novel"), F.col("id").cast("string"))).alias(
                    "content_hash"
                )
            )
        )
        probed = sk.bloom_contains_inline(
            panel, filt, "content_hash", m_bits, j
        )
        n_words = filt.count()
        maybe = probed.where("maybe_present").count()
        total = panel.count()
        print(
            json.dumps(
                {
                    "query": "bloom_probe_stats",
                    "dir": os.path.basename(sf_dir),
                    "filter_words": n_words,
                    "maybe_fraction": round(maybe / total, 4),
                }
            )
        )
        release_caches()


def kmv_candidates_tier(spark, factor: int, n_groups: int = 5000) -> None:
    """Measure the ``kmv_overlap(candidates_only=True)`` dial at its
    DESIGN POINT (r7 verdict task: the 500-group measurement was
    overhead-dominated; the dial's claim is |G| in the thousands over
    disjoint-ish contents). Groups are ``doc_id % n_groups`` over the
    blown-up corpus's content digests — mostly-disjoint digest sets,
    the per-shard-digest/URL-partition shape the dial exists for. At
    5 000 groups the all-pairs form emits |G|·(|G|−1)/2 ≈ 12.5 M sketch
    pairs; the candidate form touches only pairs sharing a sketch hash
    (true exact-dup structure). Reports wall time AND emitted rows for
    both forms."""
    from homelogging_spark.operators import sketches as sk
    from homelogging_spark.tables import spread

    big_dir = blow_up_events(spark, factor)
    docs = spread(
        spark.read.parquet(os.path.join(big_dir, "documents.parquet"))
    )
    keyed = docs.select(
        (F.col("doc_id") % n_groups).cast("string").alias("grp"),
        F.md5(F.col("text")).alias("key"),
    )
    K = 64
    # materialized sketch rows — the production shape (stored rollup
    # artifact); the dial measurement is about the PAIR stage only
    sketch_rows = sk.kmv_sketch(keyed, "key", ["grp"], k=K).collect()
    sk_df = spark.createDataFrame(sketch_rows)
    print(json.dumps({"n_groups": len(sketch_rows), "k": K, "docs": docs.count()}))
    for name, kwargs in (
        ("kmv_overlap_all_pairs", {}),
        ("kmv_overlap_candidates", {"candidates_only": True}),
    ):
        fn = lambda kw=kwargs: sk.kmv_overlap(sk_df, "grp", k=K, **kw)
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        n_out = fn().count()
        print(
            json.dumps(
                {"query": name, "n_groups": len(sketch_rows), "pairs_out": n_out, "sec": sec}
            )
        )


def _clustered_embeddings(spark, n_vecs: int, salt: str, n_clusters: int = 400,
                          dim: int = 64, noise: float = 0.15,
                          cluster_of=lambda v, k: v % k):
    """Low-intrinsic-dimension fixture: a deterministic mixture of
    ``n_clusters`` tight gaussian-ish blobs (center + per-dim md5
    jitter) — the regime real embedding corpora occupy (meaningful
    local neighborhoods with real margins), vs the isotropic-gaussian
    fixture that is PQ's documented adversarial case (SCALE.md 'IVF-PQ
    honesty'). Centers come from ``seed_centroids`` (norm ~ sqrt(dim/3)
    ≈ 4.6); jitter norm ~ noise·sqrt(dim/3) ≈ 0.7, so intra-cluster
    distances (~1) sit far under inter-center distances (~6.5): a
    query's true NNs are exactly its cluster-mates, with a margin
    quantization must merely preserve, not a lottery among hundreds of
    equidistant candidates (a 20-cluster × 100-member first draft
    measured recall 0.067 at EVERY dial incl. probe-all-cells — tiny
    intra-cluster margins reproduce the gaussian pathology, teaching
    that margin structure, not clusteredness alone, is the variable)."""
    from homelogging_spark.operators.similarity import _md5_unit, seed_centroids

    centers = seed_centroids(n_clusters, dim)
    rows = []
    for v in range(n_vecs):
        c = centers[cluster_of(v, n_clusters)]
        rows.append(
            (
                v,
                [
                    c[i] + noise * _md5_unit(f"{salt}|{v}|{i}")
                    for i in range(dim)
                ],
            )
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def emb_clustered_tier(spark) -> None:
    """IVF-PQ recall on the clustered fixture across the same dial grid
    as the gaussian table (r7 verdict task 6): recall-vs-bits in the
    regime real corpora occupy. 2 000 corpus vectors in 400 clusters of
    5; 5 held-out queries jittered from the centers of clusters 0–4
    (different jitter salt), so each query's exact-L2 top-3 are its
    5 cluster-mates. Cells/codebook built exactly like the gaussian
    measurement (seed centroids, k-means-lite PQ codebooks) so the only
    variable is the fixture's margin structure."""
    from pyspark.sql import Window

    from homelogging_spark.functions.cachelife import release_caches, tracked_persist
    from homelogging_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_topk,
        l2_sq,
        pq_codebook,
        pq_codes,
    )

    dim, n_cells = 64, 8
    corpus = tracked_persist(_clustered_embeddings(spark, 2000, "clust"))
    queries = tracked_persist(
        _clustered_embeddings(
            spark, 5, "clustq", cluster_of=lambda v, k: v
        ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    corpus.count(), queries.count()
    # exact L2 truth
    q_side = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    l2_scored = corpus.crossJoin(F.broadcast(q_side)).select(
        "query_id", "vec_id", l2_sq(F.col("q_emb"), F.col("embedding")).alias("d2")
    )
    w_l2 = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in l2_scored.withColumn("rn", F.row_number().over(w_l2))
        .where(F.col("rn") <= 3)
        .collect()
    }
    cents = _seed_centroid_frame(spark, n_cells, dim)
    cells = tracked_persist(
        ivf_assign(corpus, cents, 1).select("vec_id", "centroid_id")
    )
    cells.count()
    for pq_m, pq_k, n_probe in ((4, 8, 2), (8, 16, 4), (16, 32, 4), (16, 32, 8)):
        cb = pq_codebook(corpus, n_subspaces=pq_m, n_centroids=pq_k, dim=dim)
        pcodes = pq_codes(
            corpus, n_subspaces=pq_m, n_centroids=pq_k, dim=dim, codebook=cb
        )
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_topk(
                queries, cells, pcodes, cb, cents, k=3, nprobe=n_probe,
                n_subspaces=pq_m, dim=dim,
            ).collect()
        }
        import math

        print(
            json.dumps(
                {
                    "fixture": "clustered-400x5",
                    "bits": pq_m * int(math.log2(pq_k)),
                    "dial": f"{pq_m}x{pq_k}",
                    "nprobe": n_probe,
                    "recall_at_3": round(len(exact & got) / max(len(exact), 1), 3),
                }
            )
        )
    release_caches()


def semdedup_cap_tier(spark, n_vecs: int = 20000, cap: int = 256) -> None:
    """A/B the semantic_dedup hot-cell guard on a deliberately PEAKED
    fixture (r9 verdict task 1): ~90% of vectors jitter around ONE
    center (the near-identical-boilerplate shape real web corpora
    produce), the rest spread over 7 other cells. Uncapped, the hot
    cell alone contributes ~(0.9N)^2/2 candidate pairs; capped, every
    cell hash-splits to <= ceil(S/cap) sub-cells so the pair stage is
    bounded by ~N*cap/2. Prints the EXACT pair counts (computed from
    the cell/sub-cell histograms — the same arithmetic the pair join
    performs) plus measured wall time both ways."""
    import math

    from homelogging_spark.functions.cachelife import release_caches, tracked_persist
    from homelogging_spark.operators.sampling import uniform_from_key
    from homelogging_spark.operators.similarity import (
        SEMDEDUP_SPLIT_SALT,
        ivf_assign,
        semantic_dedup,
    )

    dim, n_cells = 64, 8
    # 90% of ids hash into cluster 0 -> one hot cell, rest uniform 1..7
    corpus = tracked_persist(
        _clustered_embeddings(
            spark,
            n_vecs,
            "peak",
            n_clusters=n_cells,
            noise=0.05,
            cluster_of=lambda v, k: 0 if v % 10 else 1 + (v // 10) % (k - 1),
        )
    )
    corpus.count()
    cents = _seed_centroid_frame(spark, n_cells, dim)

    cells = ivf_assign(corpus, cents, 1).select("vec_id", "centroid_id")
    hist = {r.centroid_id: r.n for r in
            cells.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    pairs_uncapped = sum(s * (s - 1) // 2 for s in hist.values())
    sub_hist = (
        cells.join(
            F.broadcast(
                cells.groupBy("centroid_id").agg(
                    F.ceil(F.count(F.lit(1)) / F.lit(float(cap)))
                    .cast("bigint")
                    .alias("ns")
                )
            ),
            "centroid_id",
        )
        .select(
            "centroid_id",
            F.floor(
                uniform_from_key(F.col("vec_id"), SEMDEDUP_SPLIT_SALT) * F.col("ns")
            ).alias("sub"),
        )
        .groupBy("centroid_id", "sub")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    pairs_capped = sum(r.n * (r.n - 1) // 2 for r in sub_hist)
    bound = n_vecs * cap  # the documented sum(cell^2) <= N*cap guarantee

    for label, kw in (("uncapped", {}), (f"cap={cap}", {"cell_cap": cap})):
        t0 = time.time()
        # .count() alone is NOT a valid timer here: the output's final
        # LEFT JOIN is against a groupBy frame (unique on the key), so
        # Catalyst prunes the whole verdict branch — pair join included
        # — for a pure row count. Summing n_dups/kept forces the pair
        # stage to actually run.
        row = (
            semantic_dedup(corpus, cents, threshold=0.9, **kw)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_dups").alias("nd"),
                F.sum(F.col("kept").cast("long")).alias("nk"),
            )
            .collect()[0]
        )
        n_out = row.n
        print(
            json.dumps(
                {
                    "tier": "semdedup_cap",
                    "variant": label,
                    "n_vecs": n_vecs,
                    "hot_cell": max(hist.values()),
                    "pairs": pairs_uncapped if not kw else pairs_capped,
                    "n_cap_bound": bound if kw else None,
                    "rows_out": n_out,
                    "n_kept": row.nk,
                    "sec": round(time.time() - t0, 2),
                }
            )
        )
    assert pairs_capped <= bound, (pairs_capped, bound)
    print(
        json.dumps(
            {
                "tier": "semdedup_cap",
                "pair_reduction": f"{pairs_uncapped / max(pairs_capped, 1):.1f}x",
                "bound_holds": pairs_capped <= bound,
                "bound_slack": round(pairs_capped / bound, 3),
            }
        )
    )
    release_caches()


def lsh_cap_tier(spark, n_vecs: int = 5000, cap: int = 50) -> None:
    """A/B the r11 hot-bucket guards on deliberately PEAKED fixtures.

    Leg 1 (`bucket_cap`, hyperplane LSH pair mining): 20% background
    gaussian vectors + an 80% near-identical peak — every peak member
    lands in the same bucket of all 4 tables, so the uncapped candidate
    stage carries the full C(peak, 2) quadratic. Capped, each hot
    (table, bucket) hash-splits to ceil(S/cap) sub-buckets.

    Leg 2 (`band_cap`, MinHash banding): a near-identical boilerplate
    doc cluster (the post-exact-dedup residue shape) sharing every band
    hash, same arithmetic one hash family over.

    Prints emitted-pair counts and wall both ways per leg; asserts the
    capped pair count shrank. Emitted pairs (post cosine/Jaccard
    verify) understate the candidate reduction — the peak is all true
    dups, so survivors track candidates ~1:1, which is exactly why the
    uncapped form is the scale hazard."""
    import random

    from homelogging_spark.functions.cachelife import release_caches
    from homelogging_spark.operators.dedup import minhash_near_dup_pairs
    from homelogging_spark.operators.similarity import lsh_near_dup_pairs

    rng = random.Random(17)
    base = [rng.gauss(0, 1) for _ in range(64)]
    n_bg = n_vecs // 5
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(n_bg)]
    rows += [
        (n_bg + i, [v + rng.gauss(0, 1e-4) for v in base])
        for i in range(n_vecs - n_bg)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16).cache()
    vecs.count()
    for label, kw in (("uncapped", {}), (f"cap={cap}", {"bucket_cap": cap})):
        t0 = time.time()
        n = lsh_near_dup_pairs(vecs, threshold=0.99, **kw).count()
        print(json.dumps({
            "tier": "lsh_cap", "leg": "bucket_cap", "variant": label,
            "n_vecs": n_vecs, "peak": n_vecs - n_bg,
            "emitted_pairs": n, "sec": round(time.time() - t0, 2),
        }))
        if kw:
            assert n * 2 <= (n_vecs - n_bg) * (n_vecs - n_bg - 1) // 2
    vecs.unpersist()

    n_docs = max(200, n_vecs // 10)
    boiler = "the quick brown fox jumps over the lazy dog near the riverbank"
    docs = spark.createDataFrame(
        [(i, boiler + f" trailer{i % 2}") for i in range(n_docs)],
        "doc_id long, text string",
    ).repartition(16).cache()
    docs.count()
    doc_cap = max(10, cap // 2)
    for label, kw in (("uncapped", {}), (f"cap={doc_cap}", {"band_cap": doc_cap})):
        t0 = time.time()
        n = minhash_near_dup_pairs(docs, threshold=0.5, **kw).count()
        print(json.dumps({
            "tier": "lsh_cap", "leg": "band_cap", "variant": label,
            "n_docs": n_docs, "emitted_pairs": n,
            "sec": round(time.time() - t0, 2),
        }))
        if kw:
            assert n * 2 <= n_docs * (n_docs - 1) // 2
    release_caches()


def tsmatch_tier(spark, factor: int) -> None:
    """Scale run for subsequence pattern matching: events -> per-series
    hourly grid (user_id-bucketed series so the key count is realistic)
    -> top-5 z-normalized matches of a 6-hour pattern. The blow-up
    shifts copies by whole days, so the grid's hour span — and with it
    the candidate-window count — grows with the factor; the claim is
    wall tracking the candidate count (keyed frames + TakeOrdered heap,
    no global sort)."""
    from homelogging_spark.operators.tsmatch import pattern_match_topk

    big_dir = blow_up_events(spark, factor)
    pattern = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0]
    for sf_dir in (BASE_SF, big_dir):
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        grid = (
            ev.groupBy(
                (F.col("user_id") % 50).cast("string").alias("series"),
                F.date_trunc("hour", F.col("ts")).alias("bucket"),
            )
            .agg(F.avg("value").alias("value"))
        )
        n = grid.count()
        fn = lambda g=grid: pattern_match_topk(g, pattern, k=5)
        fn().write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {
                    "query": "pattern_match_topk",
                    "dir": os.path.basename(sf_dir),
                    "grid_rows": n,
                    "sec": round(time.time() - t0, 2),
                }
            )
        )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tier = sys.argv[2] if len(sys.argv) > 2 else "text"
    spark = get_spark("scale-demo")
    spark.sparkContext.setLogLevel("ERROR")

    if tier == "sketch":
        sketch_tier(spark, factor)
        return

    if tier == "tsmatch":
        tsmatch_tier(spark, factor)
        return

    if tier == "kmvcand":
        n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
        kmv_candidates_tier(spark, factor, n_groups)
        return

    if tier == "embclust":
        emb_clustered_tier(spark)
        return

    if tier == "semdedupcap":
        n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
        semdedup_cap_tier(spark, n_vecs)
        return

    if tier == "lshcap":
        n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
        lsh_cap_tier(spark, n_vecs)
        return

    if tier == "emb":
        results: list = []
        embedding_tier(spark, factor, results)
        print(json.dumps({"factor": factor, "tier": "emb", "n": len(results)}))
        return

    if tier == "curriculum":
        curriculum_tier(spark, factor)
        return

    big_dir = blow_up_events(spark, factor)

    from homelogging_spark.operators.dedup import (
        incremental_dedup,
        minhash_near_dup_pairs,
    )
    from homelogging_spark.plans.flagship import hourly_cost_analysis
    from homelogging_spark.plans.llm_registry import q_corpus_build_pipeline

    results = []

    def timed(name, sf_dir, fn, rows_in):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        results.append(
            {"query": name, "dir": os.path.basename(sf_dir), "rows_in": rows_in, "sec": sec}
        )
        print(json.dumps(results[-1]))

    for sf_dir in (BASE_SF, big_dir):
        ev_path = os.path.join(sf_dir, "events.parquet")
        ev_rows = spark.read.parquet(ev_path).count()
        # flagship reads events via load_table(sf_dir)
        timed(
            "flagship_hourly_cost",
            sf_dir,
            lambda d=sf_dir: hourly_cost_analysis(spark, d),
            ev_rows,
        )
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        doc_rows = docs.count()
        timed(
            "minhash_near_dup",
            sf_dir,
            lambda dd=docs: minhash_near_dup_pairs(dd, threshold=0.7),
            doc_rows,
        )
        # snapshot-incremental dedup: 25% of docs play the new snapshot
        timed(
            "incremental_dedup",
            sf_dir,
            lambda dd=docs: incremental_dedup(
                dd.where(F.col("doc_id") % 4 == 0),
                dd.where(F.col("doc_id") % 4 != 0),
            ),
            doc_rows,
        )
        # the end-to-end corpus build (hygiene -> cluster keep-best ->
        # budget); needs documents.parquet in sf_dir layout, which both
        # dirs have
        timed(
            "corpus_build_pipeline",
            sf_dir,
            lambda d=sf_dir: q_corpus_build_pipeline(spark, d),
            doc_rows,
        )
        # exact duplicated-passage stats: stride-1 positional shingles,
        # one shuffle on the gram hash — the volume-heaviest text op
        from homelogging_spark.operators.chunking import (
            chunk_documents,
            duplicated_passages,
        )

        timed(
            "passage_dedup",
            sf_dir,
            lambda dd=docs: duplicated_passages(dd),
            doc_rows,
        )
        timed(
            "doc_chunks",
            sf_dir,
            lambda dd=docs: chunk_documents(dd),
            doc_rows,
        )

    by = {(r["query"], r["dir"]): r for r in results}
    summary = {}
    for q in (
        "flagship_hourly_cost",
        "minhash_near_dup",
        "incremental_dedup",
        "corpus_build_pipeline",
        "passage_dedup",
        "doc_chunks",
    ):
        a = by[(q, os.path.basename(BASE_SF))]
        b = by[(q, os.path.basename(big_dir))]
        summary[q] = {
            "rows_ratio": round(b["rows_in"] / a["rows_in"], 2),
            "time_ratio": round(b["sec"] / a["sec"], 2),
            "per_row_throughput_ratio": round(
                (b["rows_in"] / b["sec"]) / (a["rows_in"] / a["sec"]), 2
            ),
        }
    print(json.dumps({"factor": factor, "summary": summary}))


if __name__ == "__main__":
    main()
