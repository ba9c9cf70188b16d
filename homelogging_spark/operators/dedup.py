"""Deduplication operators for large-scale text corpora.

The training-data-pipeline tier: exact dedup, MinHash-LSH near-dedup,
and SimHash fingerprinting over a ``documents(doc_id, text, ...)`` table.
The reference system never needed these (its dedup is the idempotent
``(series, ts)`` append key — see SURVEY.md §2.9); they are the
engine-side extensions a 100 TB corpus requires.

Scale design (the part that matters more than the math):

- **Never all-pairs.** Candidate generation shuffles on *band-hash
  buckets*: a doc emits ``n_bands`` (bucket-key, doc) rows, pairs are
  formed only inside a bucket, and the expected bucket size at uniform
  hashing is ``n_docs / 16^32`` per distinct band value — collisions are
  almost exclusively true near-dups. The verify join then touches only
  candidate pairs. An all-pairs cross join at 1e9 docs is 1e18 rows; this
  plan is ``O(docs * bands + candidates)``.
- **Column expressions end-to-end.** Signatures are md5 built-ins
  (``functions/texthash.py``) inside whole-stage codegen — no Python in
  the hot path, and every stage is oracle-replicable in SQL.
- **Skew**: a degenerate band value (e.g. empty docs sharing one
  signature) creates a hot bucket; AQE skew-join splitting handles the
  join, and upstream hygiene (drop empty docs) handles the cause.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from homelogging_spark.functions.cachelife import tracked_persist
from homelogging_spark.functions.texthash import (
    band_hashes,
    char_ngrams,
    minhash_from_base,
    shingle_base_hash,
    simhash16,
    token_md5,
    tokens,
    word_shingles,
)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: every row keyed by ``md5(text)`` with
    its duplicate-group size and the canonical (minimum) id of the group.

    One shuffle on the content hash; at 100 TB hash first, shuffle the
    16-byte digest + id only — never the text bodies.
    """
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingles) with distinct word n-gram shingles per doc."""
    return df.select(
        F.col(id_col), word_shingles(tokens(F.col(text_col)), n=n).alias("shingles")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def band_frame(
    base: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_hash) rows: MinHash signature over the
    materialized base-hash column ``bh``, split into LSH bands."""
    rows_per_band = n_hashes // n_bands
    sigs = base.withColumn("sig", minhash_from_base(F.col("bh"), n_hashes))
    return sigs.select(
        F.col(id_col),
        F.posexplode(band_hashes(F.col("sig"), n_bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )


def hashed_shingle_base(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    with_content_hash: bool = False,
) -> DataFrame:
    """(id, bh): distinct 60-bit hashes of a doc's word shingles — the
    frame every LSH stage (signatures, bands, Jaccard verify) consumes.
    At production scale this is the materialized signatures table.

    ``with_content_hash`` adds the exact-dup digest (md5 of the text)
    as a ``content_hash`` column, so a caller that persists this base
    serves its exact-digest stage from the SAME materialized scan
    instead of re-reading the raw corpus (guide §2.4)."""
    cols = [F.col(id_col)]
    if with_content_hash:
        cols.append(F.md5(F.col(text_col)).alias("content_hash"))
    sets = df.select(
        *cols, word_shingles(tokens(F.col(text_col)), n=shingle_n).alias("shingles")
    )
    return sets.select(
        *[c for c in sets.columns if c != "shingles"],
        F.array_distinct(shingle_base_hash(F.col("shingles"))).alias("bh"),
    )


BAND_SPLIT_SALT = "band_bucket_split"


def band_candidate_pairs(
    base: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    band_cap: int | None = None,
    observe_caps: bool = False,
) -> DataFrame:
    """LSH candidate generation shared by every near-dup verifier:
    MinHash signature over a materialized base-hash column ``bh``,
    banding, shuffle on (band_idx, band_hash), in-bucket pairs with
    ``id_a < id_b``. Never all-pairs — cost is O(docs * bands +
    candidates).

    ``band_cap`` is the hot-bucket guard (the MinHash twin of
    ``similarity.lsh_near_dup_pairs``' ``bucket_cap``): a NEAR-identical
    boilerplate cluster of S docs shares every band hash, so one bucket
    yields S^2 candidates — the exact density-peak shape web corpora
    have even after exact dedup removed the byte-identical copies. With
    a cap, buckets of size S > cap hash-split into ceil(S/cap) md5
    sub-buckets (deterministic salt, oracle-replicable) and pairs form
    only within a sub-bucket, bounding the stage by docs*cap per band;
    a pair split apart in one band keeps its chance in the other
    n_bands-1 (the same multi-table OR softening as the hyperplane
    form). Buckets at or under the cap are byte-identical to the
    uncapped output. The census join is deliberately NOT broadcast:
    unlike hyperplane buckets (fixed 2^planes rows) the band-hash
    census is ~one row per distinct signature, unbounded at corpus
    scale — but it shuffles on the same (band_idx, band_hash) key the
    candidate self-join needs, so the Exchange is shared, not added."""
    bands = band_frame(base, id_col, n_hashes, n_bands)
    if band_cap is not None:
        if band_cap < 1:
            raise ValueError(f"band_cap must be >= 1, got {band_cap}")
        from homelogging_spark.operators.sampling import uniform_from_key

        splits = bands.groupBy("band_idx", "band_hash").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(float(band_cap)))
            .cast("bigint")
            .alias("_n_splits")
        )
        if observe_caps:
            # "no silent caps": metrics ride the consumer's own action
            from homelogging_spark.functions.capstats import observe_cap_splits

            splits = observe_cap_splits(splits, "band_cap")
        bands = bands.join(splits, ["band_idx", "band_hash"]).withColumn(
            "_sub",
            F.floor(
                uniform_from_key(F.col(id_col), BAND_SPLIT_SALT)
                * F.col("_n_splits")
            ).cast("bigint"),
        )
    else:
        bands = bands.withColumn("_sub", F.lit(0).cast("bigint"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._sub") == F.col("b._sub"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
    band_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact-Jaccard verify.

    Pipeline: shingle -> 16-hash MinHash signature -> 4 bands of 4 ->
    shuffle on (band_idx, band_hash) -> in-bucket candidate pairs ->
    join back the shingle sets -> keep pairs with Jaccard >= threshold.
    With (b=4, r=4) the LSH S-curve centers at (1/4)^(1/4) ≈ 0.71, so the
    candidate set at threshold 0.7 has high recall; verification makes
    precision exact.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    # ONE md5 pass: hash the shingle set to 60-bit ints, persist, and run
    # everything downstream (signature, bands, Jaccard verify) over the
    # hashed sets. The frame is referenced by four plan branches (two
    # sides of the band self-join, two sides of the verify join); without
    # persist each branch would re-scan and re-hash the corpus. At real
    # scale this frame is a materialized signatures table.
    base = tracked_persist(hashed_shingle_base(df, id_col, text_col, shingle_n))
    pairs = band_candidate_pairs(base, id_col, n_hashes, n_bands, band_cap=band_cap)
    # verify on the hashed sets (8-byte elements, not shingle strings);
    # Jaccard over 60-bit hashes == shingle Jaccard up to negligible
    # collision mass, and the oracle replicates the same hashed form.
    sa = base.select(F.col(id_col).alias("doc_a"), F.col("bh").alias("sh_a"))
    sb = base.select(F.col(id_col).alias("doc_b"), F.col("bh").alias("sh_b"))
    verified = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    threshold: float = 0.5,
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    band_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs verified by exact *character* n-gram Jaccard
    — robust to tokenization differences (punctuation, casing artifacts)
    that word shingles miss. Candidate generation is the same MinHash-LSH
    banding as ``minhash_near_dup_pairs`` (all-pairs is never an option);
    only the verify metric differs: Jaccard over distinct char n-grams.

    The verify join ships 60-bit *hashes* of the grams (8-byte ints, the
    same ``shingle_base_hash`` trick as the MinHash path), never the gram
    strings themselves: Jaccard over hashed grams equals string-gram
    Jaccard up to negligible collision mass, and a candidate pair's
    payload drops from two ~n_chars string arrays to two long arrays.

    Returns (doc_a, doc_b, ngram_jaccard) with doc_a < doc_b.
    """
    base = tracked_persist(
        df.select(
            F.col(id_col),
            F.array_distinct(
                shingle_base_hash(word_shingles(tokens(F.col(text_col)), shingle_n))
            ).alias("bh"),
            F.array_distinct(
                shingle_base_hash(char_ngrams(F.col(text_col), ngram_n))
            ).alias("grams"),
        )
    )
    pairs = band_candidate_pairs(base, id_col, n_hashes, n_bands, band_cap=band_cap)
    ga = base.select(F.col(id_col).alias("doc_a"), F.col("grams").alias("g_a"))
    gb = base.select(F.col(id_col).alias("doc_b"), F.col("grams").alias("g_b"))
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("ngram_jaccard", jaccard(F.col("g_a"), F.col("g_b")))
        .where(F.col("ngram_jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "ngram_jaccard")
    )


def near_dup_pairs_dual(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    ngram_n: int = 3,
    word_threshold: float = 0.7,
    char_threshold: float = 0.5,
    n_hashes: int = 16,
    n_bands: int = 4,
    band_cap: int | None = None,
) -> DataFrame:
    """Both near-dup verify metrics over ONE shared LSH candidate pass —
    the r8 window-slot consolidation of ``minhash_near_dup_pairs`` and
    ``ngram_jaccard_pairs`` (COVERAGE.md registry-growth policy): the
    word-shingle Jaccard and the char-n-gram Jaccard are computed on the
    same candidate pairs, so one driver row certifies both verify paths
    end to end (candidates, hashed-set join, both metrics, both
    thresholds).

    Emits every candidate pair passing EITHER threshold, with both
    (raw-threshold) verdict flags alongside both similarity values.
    Plan: identical to the single-metric forms — one persisted hashed
    base frame (both hash families materialized in the same scan), the
    banded candidate join, one verify join carrying two long arrays per
    side. Never all-pairs.
    """
    base = tracked_persist(
        df.select(
            F.col(id_col),
            F.array_distinct(
                shingle_base_hash(word_shingles(tokens(F.col(text_col)), shingle_n))
            ).alias("bh"),
            F.array_distinct(
                shingle_base_hash(char_ngrams(F.col(text_col), ngram_n))
            ).alias("grams"),
        )
    )
    pairs = band_candidate_pairs(base, id_col, n_hashes, n_bands, band_cap=band_cap)
    a = base.select(
        F.col(id_col).alias("doc_a"),
        F.col("bh").alias("sh_a"),
        F.col("grams").alias("g_a"),
    )
    b = base.select(
        F.col(id_col).alias("doc_b"),
        F.col("bh").alias("sh_b"),
        F.col("grams").alias("g_b"),
    )
    verified = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .withColumn("ngram_jaccard", jaccard(F.col("g_a"), F.col("g_b")))
        .where(
            (F.col("jaccard") >= F.lit(word_threshold))
            | (F.col("ngram_jaccard") >= F.lit(char_threshold))
        )
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "jaccard",
        "ngram_jaccard",
        (F.col("jaccard") >= F.lit(word_threshold)).alias("word_dup"),
        (F.col("ngram_jaccard") >= F.lit(char_threshold)).alias("char_dup"),
    )


def fingerprint_panel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_anchors: int = 4,
) -> DataFrame:
    """Both fingerprint families in one corpus scan — the r8 window-slot
    consolidation of ``fingerprint_anchors`` and ``simhash_fingerprints``
    (COVERAGE.md registry-growth policy): the winnowing-style anchor
    fingerprint AND the 16-bit SimHash (with its exact-fingerprint
    bucket size) are projected from the same tokenization, so one driver
    row certifies both. One scan; the only shuffle is the simhash bucket
    window (bounded: 2^16 possible fingerprints)."""
    toks = tokens(F.col(text_col))
    sh = word_shingles(toks, n=shingle_n)
    anchors = F.slice(F.array_sort(F.transform(sh, F.md5)), 1, n_anchors)
    # Two-stage projection, per token_md5's contract: simhash16 references
    # its input 16 times (one vote() per bit), and higher-order functions
    # get no codegen subexpression elimination — inlining would recompute
    # the per-token md5 pass (and the split) ~16× per row.
    hashed = df.select(
        F.col(id_col),
        F.concat_ws(",", anchors).alias("anchors"),
        F.md5(F.concat_ws(",", anchors)).alias("fingerprint"),
        token_md5(toks).alias("__hmd5"),
    )
    base = hashed.select(
        F.col(id_col),
        "anchors",
        "fingerprint",
        simhash16(F.col("__hmd5")).alias("simhash"),
    )
    w = Window.partitionBy("simhash")
    return base.withColumn("bucket_size", F.count(F.lit(1)).over(w))


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc 16-bit SimHash + bucket size (docs sharing the exact
    fingerprint). At scale, Hamming-distance<=k search splits the
    fingerprint into k+1 bands (pigeonhole: a pair within distance k
    matches at least one band exactly) — same shuffle-on-bucket shape as
    MinHash-LSH, never all-pairs.
    """
    w = Window.partitionBy("simhash")
    hashed = df.select(
        F.col(id_col), token_md5(tokens(F.col(text_col))).alias("__hmd5")
    )
    return (
        hashed.select(F.col(id_col), simhash16(F.col("__hmd5")).alias("simhash"))
        .withColumn("bucket_size", F.count(F.lit(1)).over(w))
    )


def fingerprint_anchors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_anchors: int = 4,
) -> DataFrame:
    """Document fingerprint from the ``n_anchors`` smallest shingle hashes
    (winnowing-style selection: content-defined, stable under reordering
    of unrelated edits). ``fingerprint`` digests the anchor set; two docs
    sharing it agree on their most extreme shingle hashes.
    """
    sh = word_shingles(tokens(F.col(text_col)), n=shingle_n)
    anchors = F.slice(F.array_sort(F.transform(sh, F.md5)), 1, n_anchors)
    return df.select(
        F.col(id_col),
        anchors.alias("anchors"),
        F.md5(F.concat_ws(",", anchors)).alias("fingerprint"),
    ).select(
        id_col, F.concat_ws(",", "anchors").alias("anchors"), "fingerprint"
    )


def incremental_dedup(
    new_df: DataFrame,
    old_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    n_hashes: int = 16,
    n_bands: int = 4,
    threshold: float = 0.7,
    old_bucket_cap: int | None = None,
    observe_caps: bool = False,
) -> DataFrame:
    """Snapshot-incremental dedup: check a NEW snapshot against the
    EXISTING corpus without ever forming old-vs-old pairs — how a
    production crawl pipeline actually runs (each incremental snapshot
    dedups against everything already kept, never re-deduping the
    retained corpus).

    Two gates per new doc:
    - exact: content digest seen in the old corpus (one shuffle on the
      16-byte digest — text bodies never move);
    - near: LSH band buckets of the new side joined against the OLD
      side's buckets (a cross-frame join, not a self-join — candidate
      cost is O(new·bands + cross-candidates)), then exact-Jaccard
      verify on hashed shingle sets.

    ``old_bucket_cap`` is this join's hot-bucket guard — a DIFFERENT
    shape from the self-join ``band_cap``: old-vs-old pairs never form,
    so there is no corpus-quadratic term; the hazard is a hot OLD
    bucket (a retained boilerplate cluster of S docs) fanning every
    colliding new doc into S verify candidates. Hash-splitting would be
    lossless but pointless here (a new doc must still meet every
    sub-bucket — that is AQE skew-join's job, and the join key is
    AQE-splittable as is); instead the cap keeps the ``cap``
    smallest-uniform (salted-md5, deterministic) OLD representatives
    per (band_idx, band_hash), bounding verify work at new·cap per
    bucket. For a truly near-identical retained cluster any
    representative verifies, so the keep/drop verdict is unchanged in
    the shape that matters; ``dup_of`` may name a different (still
    matching) old id when the bucket's minimum id was pruned — the
    documented trade. The rank window runs on the same
    (band_idx, band_hash) key the join shuffles on: no extra Exchange.
    With ``observe_caps=True`` a bucket census (truncation factor
    ``ceil(size/cap)`` per old bucket) rides the consumer's action
    through ``capstats.observe_cap_splits`` — rows unchanged, and the
    census groupBy shares the window's Exchange.

    At production scale the old side's digests and band frame are the
    materialized signatures tables maintained at ingest; only the new
    snapshot is hashed fresh. Returns one row per NEW doc:
    ``(id, exact_dup, near_dup, dup_of, best_jaccard, keep)`` with
    ``dup_of`` = the smallest matching old id and ``best_jaccard`` the
    highest verified similarity (NULL when no near-match)."""
    # r21 (guide §2.4): both sides' exact-dup digests ride the SAME
    # persisted signature base the LSH stages consume (content_hash
    # folded into the materialized scan) — the digest legs previously
    # re-scanned the raw corpus just to md5 it.
    base_new = tracked_persist(
        hashed_shingle_base(
            new_df, id_col, text_col, shingle_n, with_content_hash=True
        )
    )
    base_old = tracked_persist(
        hashed_shingle_base(
            old_df, id_col, text_col, shingle_n, with_content_hash=True
        )
    )
    old_dig = base_old.select("content_hash").distinct()
    new_dig = base_new.select(id_col, "content_hash")
    exact = new_dig.join(
        old_dig.withColumn("_hit", F.lit(True)), "content_hash", "left"
    ).select(id_col, F.coalesce("_hit", F.lit(False)).alias("exact_dup"))
    nb = band_frame(base_new, id_col, n_hashes, n_bands).alias("n")
    ob_frame = band_frame(base_old, id_col, n_hashes, n_bands)
    if old_bucket_cap is not None:
        if old_bucket_cap < 1:
            raise ValueError(f"old_bucket_cap must be >= 1, got {old_bucket_cap}")
        from homelogging_spark.operators.sampling import uniform_from_key

        w_rep = Window.partitionBy("band_idx", "band_hash").orderBy(
            uniform_from_key(F.col(id_col), BAND_SPLIT_SALT), F.col(id_col)
        )
        if observe_caps:
            from homelogging_spark.functions.capstats import observe_cap_splits

            census = ob_frame.groupBy("band_idx", "band_hash").agg(
                F.ceil(F.count(F.lit(1)) / F.lit(float(old_bucket_cap)))
                .cast("bigint")
                .alias("_n_splits")
            )
            # session_of=new_df: under foreachBatch the NEW side is the
            # micro-batch frame of the executing cloned session — the
            # old-side census must register its observation there
            census = observe_cap_splits(
                census, "old_bucket_cap", session_of=new_df
            )
            # inner join on the bucket key is a row-preserving no-op
            # (every bucket is in its own census) that carries the
            # observe node into the consumer's executed plan, on the
            # same Exchange the rank window needs anyway
            ob_frame = ob_frame.join(
                census.select("band_idx", "band_hash"), ["band_idx", "band_hash"]
            )
        ob_frame = (
            ob_frame.withColumn("_rep", F.row_number().over(w_rep))
            .where(F.col("_rep") <= old_bucket_cap)
            .drop("_rep")
        )
    ob = ob_frame.alias("o")
    cand = (
        nb.join(
            ob,
            (F.col("n.band_idx") == F.col("o.band_idx"))
            & (F.col("n.band_hash") == F.col("o.band_hash")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"o.{id_col}").alias("old_id"),
        )
        .distinct()
    )
    sa = base_new.select(F.col(id_col).alias("new_id"), F.col("bh").alias("sh_n"))
    sb = base_old.select(F.col(id_col).alias("old_id"), F.col("bh").alias("sh_o"))
    verified = (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .withColumn("jaccard", jaccard(F.col("sh_n"), F.col("sh_o")))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    near = verified.groupBy("new_id").agg(
        F.min("old_id").alias("dup_of"),
        F.max("jaccard").alias("best_jaccard"),
    )
    out = (
        exact.join(near, exact[id_col] == near.new_id, "left")
        .select(
            F.col(id_col),
            "exact_dup",
            F.col("dup_of").isNotNull().alias("near_dup"),
            "dup_of",
            "best_jaccard",
            (~F.col("exact_dup") & F.col("dup_of").isNull()).alias("keep"),
        )
    )
    return out
