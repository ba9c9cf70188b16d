"""Unit tests for the r5 corpus-pipeline operators: repetition scores,
PII scrubbing, token-budget selection, incremental snapshot dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators import dedup, sampling, textops


class TestRepetitionScores:
    def test_repeated_bigram_lights_up(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "spam ham " * 10),          # one bigram dominates
                (2, "a b c d e f g h i j"),     # all distinct
                (3, "x"),                        # too short for bigrams
                (4, ""),                         # empty
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in textops.repetition_scores(docs).collect()}
        # doc 1: 20 tokens; top bigram "spam ham" occurs 10x -> cover 1.0
        assert rows[1].top_bigram_cover == pytest.approx(1.0)
        assert rows[1].dup_trigram_frac > 0.8
        assert rows[1].keep is False
        assert rows[2].top_bigram_cover == pytest.approx(0.2)  # 2*1/10
        assert rows[2].dup_trigram_frac == pytest.approx(0.0)
        assert rows[2].keep is True
        assert rows[3].top_bigram_cover == 0.0 and rows[3].keep is True
        assert rows[4].n_tokens == 0 and rows[4].keep is True


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "mail a@b.com and c.d@e.org call +1-555-1234 ip 10.0.0.1 ok"),
                (2, "clean text only"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in textops.pii_scrub(docs).collect()}
        assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (2, 1, 1)
        assert rows[1].redacted == (
            "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP> ok"
        )
        assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 0, 0)
        assert rows[2].redacted == "clean text only"


class TestBudgetSelect:
    def _frame(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 10).cast("double").alias("score"),
            (F.lit(10) + F.col("id") % 7).cast("double").alias("w"),
        )

    def test_budget_honored_and_greedy(self, spark):
        df = self._frame(spark)
        # the score-9 stratum holds 20 docs totalling ~260 weight; a 150
        # budget must stay strictly inside it
        out = sampling.budget_select(
            df, [F.col("score").desc(), F.col("doc_id")], F.col("w"), budget=150.0
        ).collect()
        total = sum(r.w for r in out)
        assert total <= 150.0
        kept_scores = sorted((r.score for r in out), reverse=True)
        # greedy: every kept row's score >= any dropped row's score except
        # possibly at the budget boundary — all kept rows are 9s here
        assert all(s == 9.0 for s in kept_scores)
        # running totals are correct and include the row itself
        by_order = sorted(out, key=lambda r: (-r.score, r.doc_id))
        run = 0.0
        for r in by_order:
            run += r.w
            assert r.cum_weight == pytest.approx(run)

    def test_deterministic_across_runs(self, spark):
        df = self._frame(spark)
        a = sampling.budget_select(
            df, [F.col("score").desc(), F.col("doc_id")], F.col("w"), budget=500.0
        )
        ids1 = sorted(r.doc_id for r in a.collect())
        ids2 = sorted(r.doc_id for r in a.collect())
        assert ids1 == ids2 and len(ids1) > 0

    def test_no_global_single_task_window(self, spark):
        """The data-bearing window must be partitioned (by _pid); only the
        per-partition totals frame may see an unpartitioned window."""
        df = self._frame(spark, n=50)
        out = sampling.budget_select(
            df, [F.col("score").desc(), F.col("doc_id")], F.col("w"), budget=100.0
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan  # sanity: windows exist
        # the unpartitioned window's input is the tiny totals aggregate,
        # never the ranged data: its subtree must contain an aggregate on
        # _pid before any scan
        assert "_pid" in plan


class TestIncrementalDedup:
    def test_exact_near_and_keep(self, spark):
        # 30 tokens; one changed word shifts 3 of 28 shingles ->
        # jaccard 25/31 ~ 0.81, comfortably above the 0.7 threshold
        base = (
            "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four"
        )
        near = base.replace("oscar", "oswald")
        old = spark.createDataFrame(
            [(1, base), (3, "completely different content here entirely")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (10, base),                      # exact dup of 1
                (11, near),                      # near dup of 1
                (12, "nothing like anything else at all truly unique"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in dedup.incremental_dedup(new, old).collect()}
        assert rows[10].exact_dup is True and rows[10].keep is False
        assert rows[11].exact_dup is False
        assert rows[11].near_dup is True and rows[11].dup_of == 1
        assert rows[11].best_jaccard >= 0.7
        assert rows[11].keep is False
        assert rows[12].keep is True and rows[12].dup_of is None

    def test_no_old_vs_old_pairs(self, spark):
        """Two identical OLD docs must not interact: the check is new-vs-old
        only, so a new unique doc survives regardless of old-side dups."""
        old = spark.createDataFrame(
            [(1, "dup dup dup dup one two three"), (2, "dup dup dup dup one two three")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "some new words never seen in the corpus before")],
            "doc_id long, text string",
        )
        rows = dedup.incremental_dedup(new, old).collect()
        assert len(rows) == 1 and rows[0].keep is True

    def test_old_bucket_cap_verdict_stable_on_boilerplate_cluster(self, spark):
        """A retained boilerplate cluster of 30 near-identical old docs
        fans every colliding new doc into 30 verify candidates; with
        old_bucket_cap=5 only 5 deterministic representatives per band
        bucket are joined, and the keep/drop verdict must not change —
        any representative of a truly near-identical cluster verifies.
        dup_of may legitimately move to another matching old id."""
        boiler = (
            "terms of service apply to all users of this site without "
            "exception please read carefully before continuing to browse"
        )
        old = spark.createDataFrame(
            [(i, boiler + f" rev{i % 3}") for i in range(1, 31)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(100, boiler + " rev0"), (101, "entirely unrelated fresh content here")],
            "doc_id long, text string",
        )
        unc = {r.doc_id: r for r in dedup.incremental_dedup(new, old).collect()}
        cap = {
            r.doc_id: r
            for r in dedup.incremental_dedup(new, old, old_bucket_cap=5).collect()
        }
        for d in (100, 101):
            assert cap[d].keep == unc[d].keep
            assert cap[d].near_dup == unc[d].near_dup
        assert cap[100].keep is False and cap[100].dup_of is not None
        assert cap[101].keep is True
        # inert when buckets fit under the cap
        same = {
            r.doc_id: (r.keep, r.dup_of, r.best_jaccard)
            for r in dedup.incremental_dedup(new, old, old_bucket_cap=1000).collect()
        }
        assert same == {
            k: (v.keep, v.dup_of, v.best_jaccard) for k, v in unc.items()
        }
        import pytest as _pytest

        with _pytest.raises(ValueError, match="old_bucket_cap"):
            dedup.incremental_dedup(new, old, old_bucket_cap=0)


class TestSemanticDedup:
    def test_copy_dropped_original_kept(self, spark):
        from homelogging_spark.operators import similarity

        # two orthogonal 4-d directions as centroids; vectors near each
        base = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),   # semantic dup of 1 (cos ~1)
            (3, [0.0, 1.0, 0.0, 0.0]),     # other cell, unique
            (4, [1.5, 0.0, 0.0, 0.0]),     # scaled copy of 1 -> dup
        ]
        vecs = spark.createDataFrame(base, "vec_id long, embedding array<double>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r.vec_id: r
            for r in similarity.semantic_dedup(vecs, cents, threshold=0.9).collect()
        }
        assert rows[1].kept is True and rows[1].n_dups == 2
        assert rows[2].kept is False          # 1 is a smaller-id partner
        assert rows[4].kept is False
        assert rows[3].kept is True and rows[3].n_dups == 0
        # cells: 1,2,4 share cell 0; 3 in cell 1
        assert rows[1].cell == rows[2].cell == rows[4].cell
        assert rows[3].cell != rows[1].cell

    def test_cell_cap_inert_below_cap(self, spark):
        """Cells at or under the cap must be byte-identical to the
        uncapped form — the guard only engages on a density peak."""
        from homelogging_spark.operators import similarity

        base = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [1.5, 0.0, 0.0, 0.0]),
        ]
        vecs = spark.createDataFrame(base, "vec_id long, embedding array<double>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        uncapped = sorted(
            map(tuple, similarity.semantic_dedup(vecs, cents, 0.9).collect())
        )
        capped = sorted(
            map(
                tuple,
                similarity.semantic_dedup(vecs, cents, 0.9, cell_cap=10).collect(),
            )
        )
        assert capped == uncapped

    def test_cell_cap_rejects_nonpositive(self, spark):
        import pytest as _pytest

        from homelogging_spark.operators import similarity

        vecs = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="cell_cap"):
            similarity.semantic_dedup(vecs, cents, cell_cap=0)

    def test_cell_cap_scopes_pairs_to_sub_cells(self, spark):
        """Hot-cell guard semantics: one cell of 12 mutually-duplicate
        vectors with cap 4 splits into ceil(12/4)=3 md5 sub-cells; each
        vector's n_dups must equal (its sub-cell size - 1) and kept must
        be (is min id of its sub-cell) — pairs never cross a split."""
        import hashlib
        import math

        from homelogging_spark.operators import similarity
        from homelogging_spark.operators.similarity import SEMDEDUP_SPLIT_SALT

        n, cap = 12, 4
        vecs = spark.createDataFrame(
            [(i, [1.0 + 0.001 * i, 0.0]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        n_splits = math.ceil(n / cap)

        def sub(i: int) -> int:
            hx = hashlib.md5(f"{SEMDEDUP_SPLIT_SALT}|{i}".encode()).hexdigest()
            return int((int(hx[:13], 16) / float(1 << 52)) * n_splits)

        groups: dict[int, list[int]] = {}
        for i in range(n):
            groups.setdefault(sub(i), []).append(i)
        # the md5 split must actually spread this fixture (sanity)
        assert len(groups) > 1
        rows = {
            r.vec_id: r
            for r in similarity.semantic_dedup(
                vecs, cents, threshold=0.9, cell_cap=cap
            ).collect()
        }
        for s, members in groups.items():
            for i in members:
                assert rows[i].n_dups == len(members) - 1
                assert rows[i].kept is (i == min(members))


class TestRepetitionFoldProperty:
    def test_fold_matches_counter_on_random_docs(self, spark):
        """The run-length fold over the sorted bigram array must equal
        the straightforward Counter-max on arbitrary token streams —
        a small repetitive vocabulary stresses long and tied runs."""
        import random
        from collections import Counter

        rng = random.Random(42)
        vocab = ["a", "b", "c", "d", "aa", "bb"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r.doc_id: r for r in textops.repetition_scores(df).collect()}
        for i, text in docs:
            toks = [t for t in text.split(" ") if t]
            n = len(toks)
            bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            tris = [" ".join(toks[j : j + 3]) for j in range(max(0, n - 2))]
            cover = 2.0 * max(Counter(bigs).values()) / n if n >= 2 else 0.0
            dup = 1.0 - len(set(tris)) / (n - 2) if n >= 3 else 0.0
            assert rows[i].top_bigram_cover == pytest.approx(cover), (i, text)
            assert rows[i].dup_trigram_frac == pytest.approx(dup), (i, text)
            assert rows[i].n_tokens == n


class TestStreamingSnapshotDedup:
    def test_stream_drain_equals_batch_exact_gate(self, spark, tmp_path):
        """Draining the stream-static dedup over a landing dir must flag
        exactly the docs the batch incremental_dedup exact gate flags."""
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            streaming_snapshot_dedup,
        )

        old_rows = [(1, "kept corpus doc one"), (2, "kept corpus doc two")]
        old = spark.createDataFrame(old_rows, "doc_id long, text string")
        old_digests = old.select(F.md5(F.col("text")).alias("content_hash"))

        src = tmp_path / "landing"
        src.mkdir()
        new_rows = [
            {"doc_id": 10, "text": "kept corpus doc one"},   # dup
            {"doc_id": 11, "text": "a genuinely new doc"},
            {"doc_id": 12, "text": "kept corpus doc two"},   # dup
            {"doc_id": 13, "text": "another new doc"},
        ]
        for i, r in enumerate(new_rows):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        stream = (
            spark.readStream.format("json")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = (
            streaming_snapshot_dedup(stream, old_digests)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {r.doc_id: r for r in spark.read.parquet(str(out_dir)).collect()}
        assert set(got) == {10, 11, 12, 13}
        assert got[10].exact_dup is True and got[10].keep is False
        assert got[12].exact_dup is True and got[12].keep is False
        assert got[11].keep is True and got[13].keep is True

        # parity with the batch operator's exact gate on the same data
        from homelogging_spark.operators import dedup

        new_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in new_rows], "doc_id long, text string"
        )
        batch = {
            r.doc_id: r.exact_dup
            for r in dedup.incremental_dedup(new_df, old).collect()
        }
        assert batch == {k: v.exact_dup for k, v in got.items()}

    def test_started_stream_drains_gate_stats_per_batch(self, spark, tmp_path):
        """r15: the exact gate's writer form — same observe_caps /
        cap_stats_sink surface as the near-dup writer: one snapshot_gate
        row per micro-batch (rows / exact_dups / kept) riding the write
        action, verdicts unchanged."""
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            start_snapshot_dedup_stream,
        )

        old = spark.createDataFrame(
            [(1, "kept corpus doc one"), (2, "kept corpus doc two")],
            "doc_id long, text string",
        )
        old_digests = old.select(F.md5(F.col("text")).alias("content_hash"))
        src = tmp_path / "landing"
        src.mkdir()
        new_rows = [
            {"doc_id": 10, "text": "kept corpus doc one"},   # dup -> batch 0
            {"doc_id": 11, "text": "a genuinely new doc"},   # batch 0
            {"doc_id": 12, "text": "kept corpus doc two"},   # dup -> batch 1
            {"doc_id": 13, "text": "another new doc"},       # batch 1
        ]
        for i, r in enumerate(new_rows):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        drained: list[tuple[int, list[dict]]] = []
        out_dir = tmp_path / "out"
        q = start_snapshot_dedup_stream(
            stream,
            old_digests,
            str(out_dir),
            str(tmp_path / "ckpt"),
            observe_caps=True,
            cap_stats_sink=lambda bid, stats: drained.append((bid, stats)),
        )
        q.awaitTermination(180)
        assert sorted(b for b, _ in drained) == [0, 1]
        for _, stats in drained:
            assert [s["guard"] for s in stats] == ["snapshot_gate"]
            s = stats[0]
            assert s["rows"] == 2 and s["exact_dups"] == 1 and s["kept"] == 1
        got = {r.doc_id: r for r in spark.read.parquet(str(out_dir)).collect()}
        assert {d: got[d].keep for d in got} == {
            10: False, 11: True, 12: False, 13: True
        }
        assert len({r.batch_id for r in got.values()}) == 2


class TestStreamingSemanticDedup:
    CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
             (2, [0.0, 0.0, 1.0, 0.0])]
    CORPUS = [(1, [0.9, 0.1, 0.0, 0.0]), (2, [1.0, 0.05, 0.0, 0.0]),
              (3, [0.1, 1.0, 0.0, 0.0])]
    NEW = [
        {"vec_id": 10, "embedding": [1.8, 0.2, 0.0, 0.0]},   # 2x corpus 1 -> dup
        {"vec_id": 11, "embedding": [0.0, 0.0, 1.0, 0.05]},  # empty cell -> keep
        {"vec_id": 12, "embedding": [0.05, 0.9, 0.1, 0.0]},  # near corpus 3
        {"vec_id": 13, "embedding": [0.7, 0.7, 0.1, 0.0]},   # boundary case
    ]
    DDL = "vec_id long, embedding array<double>"

    def _frames(self, spark):
        cents = spark.createDataFrame(self.CENTS, self.DDL)
        corpus = spark.createDataFrame(self.CORPUS, self.DDL)
        from homelogging_spark.operators.similarity import ivf_assign

        corpus_cells = ivf_assign(corpus, cents, 1).select(
            "vec_id", "embedding", "centroid_id"
        )
        return cents, corpus, corpus_cells

    def _batch_reference(self, spark, probe, thr=0.9):
        """Exists-a-qualifying-retained-neighbor verdict via the BATCH
        operators — what each streamed row's flag must equal."""
        from homelogging_spark.operators.similarity import cosine, ivf_assign

        cents, _, _ = self._frames(spark)
        new_df = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for r in self.NEW], self.DDL
        )
        new_cells = ivf_assign(new_df, cents, 1).select(
            F.col("vec_id").alias("n_id"),
            F.col("embedding").alias("n_emb"),
            F.col("centroid_id").alias("cell"),
        )
        hits = new_cells.join(
            probe.select(
                F.col("embedding").alias("b_emb"),
                F.col("centroid_id").alias("cell"),
            ),
            "cell",
        ).where(cosine(F.col("n_emb"), F.col("b_emb")) >= thr)
        dup_ids = {r.n_id for r in hits.select("n_id").distinct().collect()}
        cells = {r.n_id: r.cell for r in new_cells.collect()}
        return dup_ids, cells

    def _drain(self, spark, tmp_path, cap=None, materialize=False):
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            build_probe_table,
            streaming_semantic_dedup,
        )

        cents, _, corpus_cells = self._frames(spark)
        sub = f"cap{cap or 0}" + ("_mat" if materialize else "")
        src = tmp_path / f"landing_{sub}"
        src.mkdir(parents=True)
        for i, r in enumerate(self.NEW):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(self.DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        if materialize:
            # the production path: build the capped probe ONCE, persist,
            # pass the materialized table instead of corpus_cells
            probe_path = tmp_path / f"probe_{sub}"
            build_probe_table(
                corpus_cells, cell_probe_cap=cap
            ).write.parquet(str(probe_path))
            gated = streaming_semantic_dedup(
                stream,
                None,
                cents,
                threshold=0.9,
                probe_table=spark.read.parquet(str(probe_path)),
            )
        else:
            gated = streaming_semantic_dedup(
                stream, corpus_cells, cents, threshold=0.9, cell_probe_cap=cap
            )
        out_dir = tmp_path / f"out_{sub}"
        q = (
            gated.writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sub}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r.vec_id: r for r in spark.read.parquet(str(out_dir)).collect()}

    def test_drain_equals_batch_reference(self, spark, tmp_path):
        """Draining the stream-static gate must flag exactly the rows
        with a qualifying retained neighbor per the batch operators, and
        the map-side literal-unrolled cell assignment must equal batch
        ``ivf_assign``'s argmax row for row."""
        _, _, corpus_cells = self._frames(spark)
        got = self._drain(spark, tmp_path)
        dup_ids, cells = self._batch_reference(spark, corpus_cells)
        assert set(got) == {10, 11, 12, 13}
        for vid, row in got.items():
            assert row.semantic_dup is (vid in dup_ids), vid
            assert row.keep is (vid not in dup_ids), vid
            assert row.centroid_id == cells[vid], vid
        # the hard-pinned anchors: a scaled copy IS a dup (cosine exact
        # under scaling), an empty-cell vector IS a keep
        assert got[10].semantic_dup is True
        assert got[11].keep is True

    def test_cell_probe_cap_matches_capped_reference(self, spark, tmp_path):
        """With ``cell_probe_cap=1`` the verdicts must equal the batch
        reference computed on the SAME deterministically-capped probe
        set — and the cap must actually drop probe rows (cell 0 holds
        two corpus vectors)."""
        from homelogging_spark.operators.sampling import group_topk_sample

        _, _, corpus_cells = self._frames(spark)
        capped = group_topk_sample(
            corpus_cells, "centroid_id", "vec_id", 1, salt="semdedup-probe-v1"
        ).drop("u", "rank")
        assert capped.count() < corpus_cells.count()
        got = self._drain(spark, tmp_path, cap=1)
        dup_ids, _ = self._batch_reference(spark, capped)
        assert {v for v, r in got.items() if r.semantic_dup} == dup_ids

    def test_materialized_probe_table_matches_inline(self, spark, tmp_path):
        """The production path — build_probe_table once, persist to
        parquet, pass as ``probe_table=`` — must drain to verdicts
        identical to the inline corpus_cells path, capped and uncapped."""
        import pytest

        from homelogging_spark.streaming.pipeline import streaming_semantic_dedup

        for cap in (None, 1):
            inline = self._drain(spark, tmp_path / f"i{cap or 0}", cap=cap)
            mat = self._drain(
                spark, tmp_path / f"m{cap or 0}", cap=cap, materialize=True
            )
            assert set(inline) == set(mat) == {10, 11, 12, 13}
            for vid in inline:
                assert inline[vid].semantic_dup == mat[vid].semantic_dup, (cap, vid)
                assert inline[vid].keep == mat[vid].keep, (cap, vid)
                assert inline[vid].centroid_id == mat[vid].centroid_id, (cap, vid)

        # misuse guards: exactly one static side; cap only with corpus_cells
        cents, _, corpus_cells = self._frames(spark)
        stream = spark.readStream.format("rate").load()  # placeholder stream
        with pytest.raises(ValueError, match="exactly one"):
            streaming_semantic_dedup(stream, None, cents)
        from homelogging_spark.streaming.pipeline import build_probe_table

        probe = build_probe_table(corpus_cells)
        with pytest.raises(ValueError, match="exactly one"):
            streaming_semantic_dedup(stream, corpus_cells, cents, probe_table=probe)
        with pytest.raises(ValueError, match="already capped"):
            streaming_semantic_dedup(
                stream, None, cents, cell_probe_cap=1, probe_table=probe
            )

    def test_probe_build_cap_is_observable_at_ingest(self, spark, tmp_path):
        """'No silent caps' for the streaming gate: the cell_probe_cap
        census rides the probe table's MATERIALIZING action (the
        ingest-time write) — rows unchanged, stats drained after it."""
        from homelogging_spark.functions import capstats
        from homelogging_spark.streaming.pipeline import build_probe_table

        _, _, corpus_cells = self._frames(spark)
        plain = build_probe_table(corpus_cells, cell_probe_cap=1)
        observed = build_probe_table(
            corpus_cells, cell_probe_cap=1, observe_caps=True
        )
        assert capstats.pending_cap_observations() == 1
        observed.write.parquet(str(tmp_path / "probe"))  # the ingest action
        stats = capstats.drain_cap_stats(timeout_s=60)
        assert [s["guard"] for s in stats] == ["cell_probe_cap"]
        # corpus: cell 0 holds vectors 1+2 (truncated 2x by cap=1),
        # cell 1 holds vector 3
        assert stats[0]["buckets"] == 2
        assert stats[0]["buckets_split"] == 1
        assert stats[0]["max_splits"] == 2
        # observation never changes the emitted probe rows
        assert sorted(
            map(tuple, spark.read.parquet(str(tmp_path / "probe")).collect())
        ) == sorted(map(tuple, plain.collect()))

    def test_in_batch_gate_drains_cap_census_per_batch(self, spark, tmp_path):
        """r15 (r14 verdict #1 tail): the semantic gate composed INSIDE a
        foreachBatch body with the inline cell_probe_cap must deliver
        the census per micro-batch — the observation re-homes onto the
        cloned batch session (the incremental_dedup fix path) and
        delivery is guaranteed by cap_observation_scope. Verdicts equal
        the transformation-form drain on the same capped probe."""
        import json as _json
        import os as _os

        from homelogging_spark.functions.capstats import (
            cap_observation_scope,
            discard_cap_stats,
            drain_cap_stats,
        )
        from homelogging_spark.streaming.pipeline import (
            streaming_semantic_dedup,
        )

        cents, _, corpus_cells = self._frames(spark)
        src = tmp_path / "landing_inbatch"
        src.mkdir()
        for i, r in enumerate(self.NEW):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(self.DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        out_dir = tmp_path / "out_inbatch"
        drained: list[tuple[int, list[dict]]] = []

        def gate_batch(batch, batch_id):
            discard_cap_stats()
            with cap_observation_scope(batch.sparkSession):
                out = streaming_semantic_dedup(
                    batch,
                    corpus_cells,
                    cents,
                    threshold=0.9,
                    cell_probe_cap=1,
                    observe_caps=True,
                ).withColumn("batch_id", F.lit(int(batch_id)))
                (
                    out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(str(out_dir))
                )
                drained.append((int(batch_id), drain_cap_stats(timeout_s=60)))

        q = (
            stream.writeStream.foreachBatch(gate_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt_inbatch"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert sorted(b for b, _ in drained) == [0, 1]
        for _, stats in drained:
            assert [s["guard"] for s in stats] == ["cell_probe_cap"]
            # cell 0 holds corpus vectors 1+2: cap=1 splits it 2x
            assert stats[0]["buckets"] == 2
            assert stats[0]["buckets_split"] == 1
            assert stats[0]["max_splits"] == 2
        got = {
            r.vec_id: r for r in spark.read.parquet(str(out_dir)).collect()
        }
        ref = self._drain(spark, tmp_path / "ref_inbatch", cap=1)
        assert set(got) == set(ref) == {10, 11, 12, 13}
        for vid in got:
            assert got[vid].semantic_dup == ref[vid].semantic_dup, vid
            assert got[vid].keep == ref[vid].keep, vid

    def test_observe_caps_with_probe_table_is_refused(self, spark):
        import pytest

        from homelogging_spark.streaming.pipeline import (
            build_probe_table,
            streaming_semantic_dedup,
        )

        cents, _, corpus_cells = self._frames(spark)
        stream = spark.readStream.format("rate").load()
        probe = build_probe_table(corpus_cells)
        with pytest.raises(ValueError, match="observe_caps"):
            streaming_semantic_dedup(
                stream, None, cents, probe_table=probe, observe_caps=True
            )


class TestStreamingIncrementalDedup:
    OLD = [(1, "the quick brown fox jumps over the lazy dog"),
           (2, "pack my box with five dozen liquor jugs")]
    NEW = [
        {"doc_id": 10, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 11, "text": "the quick brown fox jumps over the lazy cat"},
        {"doc_id": 12, "text": "completely different content about spark streaming pipelines"},
        {"doc_id": 13, "text": "pack my box with five dozen liquor jugs today"},
    ]

    def _row_key(self, r):
        return (r.exact_dup, r.near_dup, r.dup_of, r.best_jaccard, r.keep)

    def test_drain_equals_batch_near_gate(self, spark, tmp_path):
        """Draining the foreachBatch near-dup gate must write exactly the
        batch incremental_dedup verdicts for every streamed doc — batch
        boundaries can never change a verdict (it depends only on the
        doc and the retained corpus)."""
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            start_incremental_dedup_stream,
        )

        old = spark.createDataFrame(self.OLD, "doc_id long, text string")
        src = tmp_path / "landing"
        src.mkdir()
        for i, r in enumerate(self.NEW):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        out_dir = tmp_path / "out"
        q = start_incremental_dedup_stream(
            stream, old, str(out_dir), str(tmp_path / "ckpt")
        )
        q.awaitTermination(180)
        got = {r.doc_id: r for r in spark.read.parquet(str(out_dir)).collect()}
        assert set(got) == {10, 11, 12, 13}
        # multiple batches actually ran (2 files per trigger, 4 files)
        assert len({r.batch_id for r in got.values()}) == 2

        from homelogging_spark.operators import dedup

        new_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in self.NEW], "doc_id long, text string"
        )
        batch = {r.doc_id: r for r in dedup.incremental_dedup(new_df, old).collect()}
        assert {k: self._row_key(v) for k, v in got.items()} == {
            k: self._row_key(v) for k, v in batch.items()
        }
        # anchors: verbatim copy -> exact dup; one-word change -> near
        # dup of old 1; novel doc -> keep
        assert got[10].exact_dup is True and got[10].keep is False
        assert got[11].near_dup is True and got[11].dup_of == 1
        assert got[12].keep is True

    def test_per_batch_cap_stats_drain(self, spark, tmp_path):
        """The production observability loop: old_bucket_cap census
        drained once per micro-batch on the stream-execution thread,
        surfaced through cap_stats_sink — and observation never changes
        the written verdicts."""
        import json as _json
        import os as _os

        from homelogging_spark.operators import dedup
        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            start_incremental_dedup_stream,
        )

        # a verbatim-duplicate retained pair shares every band bucket,
        # so old_bucket_cap=1 deterministically truncates those buckets
        old_rows = self.OLD + [(3, self.OLD[0][1])]
        old = spark.createDataFrame(old_rows, "doc_id long, text string")
        src = tmp_path / "landing"
        src.mkdir()
        for i, r in enumerate(self.NEW):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 2)
            .load(str(src))
        )
        drained: list[tuple[int, list[dict]]] = []
        out_dir = tmp_path / "out"
        q = start_incremental_dedup_stream(
            stream,
            old,
            str(out_dir),
            str(tmp_path / "ckpt"),
            old_bucket_cap=1,
            observe_caps=True,
            cap_stats_sink=lambda bid, stats: drained.append((bid, stats)),
        )
        q.awaitTermination(180)
        # one drain per micro-batch (4 files, 2 per trigger), each with
        # exactly this batch's census — thread-scoping keeps concurrent
        # attachments apart
        assert sorted(b for b, _ in drained) == [0, 1]
        for _, stats in drained:
            assert [s["guard"] for s in stats] == ["old_bucket_cap"]
            assert stats[0]["buckets"] >= 1
            assert stats[0]["max_splits"] >= 2  # the duplicate pair
            assert "timed_out" not in stats[0]
        got = {r.doc_id: r for r in spark.read.parquet(str(out_dir)).collect()}
        new_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in self.NEW], "doc_id long, text string"
        )
        batch = {
            r.doc_id: r
            for r in dedup.incremental_dedup(
                new_df, old, old_bucket_cap=1
            ).collect()
        }
        assert {k: self._row_key(v) for k, v in got.items()} == {
            k: self._row_key(v) for k, v in batch.items()
        }

    def test_replay_is_idempotent(self, spark, tmp_path):
        """At-least-once foreachBatch delivery: re-running a batch with
        the same batch_id must rewrite its partition identically, never
        append duplicates."""
        from homelogging_spark.streaming.pipeline import (
            incremental_dedup_batch_writer,
        )

        old = spark.createDataFrame(self.OLD, "doc_id long, text string")
        new_df = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in self.NEW], "doc_id long, text string"
        )
        out_dir = str(tmp_path / "out")
        writer = incremental_dedup_batch_writer(old, out_dir)
        writer(new_df, 7)
        once = sorted(
            (r.doc_id, self._row_key(r), r.batch_id)
            for r in spark.read.parquet(out_dir).collect()
        )
        writer(new_df, 7)
        twice = sorted(
            (r.doc_id, self._row_key(r), r.batch_id)
            for r in spark.read.parquet(out_dir).collect()
        )
        assert once == twice and len(once) == len(self.NEW)


class TestStreamingBloomDedup:
    def test_bloom_gate_output_identical_and_gate_effective(self, spark, tmp_path):
        """streaming_bloom_dedup must emit bit-identical exact_dup/keep
        verdicts to the ungated streaming_snapshot_dedup (the filter
        changes the plan, never the answer), every true duplicate must
        probe bloom_probed=True (no false negatives), and at least one
        genuinely-new doc must probe False (the gate actually skips
        exact-join work for novel rows at this m/j)."""
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            streaming_bloom_dedup,
            streaming_snapshot_dedup,
        )

        old = spark.createDataFrame(
            [(i, f"kept corpus doc {i}") for i in range(50)],
            "doc_id long, text string",
        )
        old_digests = old.select(F.md5(F.col("text")).alias("content_hash"))

        src = tmp_path / "landing"
        src.mkdir()
        new_rows = [
            {"doc_id": 100 + i, "text": f"kept corpus doc {i}"} for i in range(0, 6)
        ] + [
            {"doc_id": 200 + i, "text": f"novel doc number {i}"} for i in range(20)
        ]
        for i, r in enumerate(new_rows):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

        def drain(make, name):
            stream = (
                spark.readStream.format("json")
                .schema(DOCS_DDL)
                .option("maxFilesPerTrigger", 7)
                .load(str(src))
            )
            out_dir = tmp_path / f"out_{name}"
            q = (
                make(stream)
                .writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {r.doc_id: r for r in spark.read.parquet(str(out_dir)).collect()}

        gated = drain(
            lambda s: streaming_bloom_dedup(s, old_digests, m_bits=1 << 12, j=5),
            "bloom",
        )
        plain = drain(lambda s: streaming_snapshot_dedup(s, old_digests), "plain")

        assert set(gated) == set(plain) == {r["doc_id"] for r in new_rows}
        for did in plain:
            assert (gated[did].exact_dup, gated[did].keep) == (
                plain[did].exact_dup,
                plain[did].keep,
            )
        # no false negatives: every true dup probed positive
        assert all(gated[d].bloom_probed for d in gated if gated[d].exact_dup)
        # the gate is effective: some novel docs skip the exact join
        assert any(
            not gated[d].bloom_probed for d in gated if gated[d].keep
        )

    def test_started_stream_drains_fill_and_gate_stats(self, spark, tmp_path):
        """r15: the Bloom gate's writer form — the bloom_fill saturation
        row at setup (batch_id -1: the FPR-erosion dial for a filter
        sized once against a growing corpus) plus one bloom_gate row per
        micro-batch whose counts reconcile with the written verdicts."""
        import json as _json
        import os as _os

        from homelogging_spark.streaming.pipeline import (
            DOCS_DDL,
            start_bloom_dedup_stream,
        )

        old = spark.createDataFrame(
            [(i, f"kept corpus doc {i}") for i in range(50)],
            "doc_id long, text string",
        )
        old_digests = old.select(F.md5(F.col("text")).alias("content_hash"))
        src = tmp_path / "landing"
        src.mkdir()
        new_rows = [
            {"doc_id": 100 + i, "text": f"kept corpus doc {i}"} for i in range(6)
        ] + [
            {"doc_id": 200 + i, "text": f"novel doc number {i}"} for i in range(20)
        ]
        for i, r in enumerate(new_rows):
            p = src / f"{i}.json"
            p.write_text(_json.dumps(r))
            _os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.format("json")
            .schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 13)
            .load(str(src))
        )
        drained: list[tuple[int, list[dict]]] = []
        out_dir = tmp_path / "out_started"
        q = start_bloom_dedup_stream(
            stream,
            old_digests,
            str(out_dir),
            str(tmp_path / "ckpt_started"),
            m_bits=1 << 12,
            j=5,
            observe_caps=True,
            cap_stats_sink=lambda bid, stats: drained.append((bid, stats)),
        )
        q.awaitTermination(180)
        by_bid = dict(drained)
        # setup-time saturation row: 50 digests * 5 positions in 4096
        # bits -> a partially-filled, non-degenerate filter
        fill = by_bid[-1][0]
        assert fill["guard"] == "bloom_fill" and fill["m_bits"] == 1 << 12
        assert 0 < fill["bits_set"] <= 250
        assert 0 < fill["fill_ratio"] < 0.1
        assert fill["est_fpr"] == pytest.approx(fill["fill_ratio"] ** 5)
        # per-batch gate rows reconcile with the written verdicts
        got = spark.read.parquet(str(out_dir)).collect()
        assert sorted(b for b in by_bid if b >= 0) == [0, 1]
        for bid in (0, 1):
            stats = by_bid[bid]
            assert [s["guard"] for s in stats] == ["bloom_gate"]
            s = stats[0]
            rows = [r for r in got if r.batch_id == bid]
            assert s["rows"] == len(rows)
            assert s["bloom_probed"] == sum(r.bloom_probed for r in rows)
            assert s["exact_dups"] == sum(r.exact_dup for r in rows)
            assert s["bloom_false_pos"] == sum(
                r.bloom_probed and not r.exact_dup for r in rows
            )
        assert sum(r.exact_dup for r in got) == 6
        assert sum(r.keep for r in got) == 20


class TestNgramLm:
    """r18 (r19 registration runway): CCNet-style bigram perplexity
    filter — hand-computed smoothing arithmetic, DuckDB twin identity,
    min_count self-consistency, degenerate-doc convention."""

    REF = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat"),
    ]
    # ref bigrams (min_count=1): the cat x2, cat sat, sat on, on the,
    # the mat, cat ran, a dog, dog sat
    SCORE = [
        (10, "the cat sat"),        # all in-model bigrams
        (11, "purple elephants"),   # fully OOV pair
        (12, "single"),             # 1 token: degenerate
        (13, ""),                   # empty: degenerate
    ]

    def _lm(self, spark, min_count=1):
        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        return textops.ngram_lm_counts(ref, min_count=min_count)

    def test_counts_and_hand_computed_score(self, spark):
        import math

        lm = self._lm(spark)
        big = {(r.w1, r.w2): r.c for r in lm["bigrams"].collect()}
        assert big[("the", "cat")] == 2 and big[("cat", "sat")] == 1
        ctx = {r.w1: r.c for r in lm["contexts"].collect()}
        assert ctx["the"] == 3  # the cat x2 + the mat
        n_vocab = lm["stats"].collect()[0].n_vocab
        assert n_vocab == len(ctx)
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        got = {
            r.doc_id: r
            for r in textops.ngram_lm_score(docs, lm, k=0.5).collect()
        }

        def p(w1, w2):
            return (big.get((w1, w2), 0) + 0.5) / (
                ctx.get(w1, 0) + 0.5 * n_vocab
            )

        exp_nll = -(math.log(p("the", "cat")) + math.log(p("cat", "sat"))) / 2
        q = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
        assert got[10].n_bigrams == 2
        assert got[10].nll == pytest.approx(q(exp_nll), abs=1e-9)
        assert got[10].ppl == pytest.approx(q(math.exp(exp_nll)), abs=1e-9)
        # fully-OOV pair: both counts 0 -> P = 0.5 / (0.5 V) = 1/V
        oov_nll = math.log(n_vocab)
        assert got[11].nll == pytest.approx(q(oov_nll), abs=1e-9)
        # degenerate docs: no bigrams, NULL scores
        for d in (12, 13):
            assert got[d].n_bigrams == 0
            assert got[d].nll is None and got[d].ppl is None

    def test_threshold_keep_and_degenerate_convention(self, spark):
        lm = self._lm(spark)
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        got = {
            r.doc_id: r
            for r in textops.ngram_lm_score(
                docs, lm, k=0.5, ppl_threshold=5.0
            ).collect()
        }
        assert got[10].keep is True       # in-model: ppl ~2.83
        # fully OOV: P = 1/V with V = 6 context types -> ppl 6.0 > 5
        assert got[11].ppl == 6.0 and got[11].keep is False
        assert got[12].keep is True and got[13].keep is True  # no evidence

    def test_min_count_cut_keeps_model_self_consistent(self, spark):
        lm = self._lm(spark, min_count=2)
        big = {(r.w1, r.w2): r.c for r in lm["bigrams"].collect()}
        assert big == {("the", "cat"): 2}  # every hapax bigram cut
        ctx = {r.w1: r.c for r in lm["contexts"].collect()}
        assert ctx == {"the": 2}  # contexts sum the KEPT table only
        assert lm["stats"].collect()[0].n_vocab == 1

    def test_duckdb_twin_identical(self, spark):
        import duckdb

        lm = self._lm(spark)
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        spark_rows = sorted(
            tuple(r)
            for r in textops.ngram_lm_score(
                docs, lm, k=0.5, ppl_threshold=12.0
            ).collect()
        )
        con = duckdb.connect()
        for name, rows in (("ref", self.REF), ("score", self.SCORE)):
            con.execute(f"CREATE TABLE {name} (doc_id BIGINT, text VARCHAR)")
            con.executemany(f"INSERT INTO {name} VALUES (?, ?)", rows)
        duck_rows = sorted(
            tuple(r)
            for r in con.execute(
                textops.ngram_lm_score_sql(
                    "ref", "score", k=0.5, ppl_threshold=12.0
                )
            ).fetchall()
        )
        assert spark_rows == duck_rows


class TestNgramLmStream:
    """r18: the perplexity filter's reference statistics as a
    maintained artifact — the bm25_stats_batch_merger discipline
    applied to bigram counts (raw counts in state, min_count cut at
    load so the cut stays additive-safe)."""

    REF = TestNgramLm.REF
    SCORE = TestNgramLm.SCORE

    def _merge_all(self, spark, state, run_id=None):
        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        merger = ngram_lm_batch_merger(state, run_id=run_id)
        chunks = [self.REF[:1], self.REF[1:2], self.REF[2:]]
        for i, chunk in enumerate(chunks):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        return merger

    def test_state_loaded_model_scores_identically(self, spark, tmp_path):
        """Stream-merged state + load-time cut == batch-trained model,
        at BOTH min_count dials (the cut is load-time exactly so this
        holds)."""
        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        for mc in (1, 2):
            batch_lm = textops.ngram_lm_counts(ref, min_count=mc)
            state_lm = textops.ngram_lm_from_state(spark, state, min_count=mc)
            assert sorted(map(tuple, batch_lm["bigrams"].collect())) == sorted(
                map(tuple, state_lm["bigrams"].collect())
            )
            b = sorted(
                tuple(r)
                for r in textops.ngram_lm_score(
                    docs, batch_lm, ppl_threshold=5.0
                ).collect()
            )
            s = sorted(
                tuple(r)
                for r in textops.ngram_lm_score(
                    docs, state_lm, ppl_threshold=5.0
                ).collect()
            )
            assert b == s

    def test_replay_noop_and_run_identity_guard(self, spark, tmp_path):
        import pytest as _pytest

        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        state = str(tmp_path / "lm_state")
        merger = self._merge_all(spark, state, run_id="ckpt-A")
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert (stats.n_docs, stats.max_batch_id, stats.run_id) == (
            3, 2, "ckpt-A",
        )
        before = sorted(
            map(tuple, spark.read.parquet(state + "/bigrams").collect())
        )
        # same-run replay: exactly-once no-op
        merger(
            spark.createDataFrame(self.REF[:1], "doc_id long, text string"), 0
        )
        assert sorted(
            map(tuple, spark.read.parquet(state + "/bigrams").collect())
        ) == before
        # fresh checkpoint restarting at 0: loud error, never data loss
        with _pytest.raises(ValueError, match="redelivered"):
            ngram_lm_batch_merger(state, run_id="ckpt-B")(
                spark.createDataFrame(
                    self.REF[:1], "doc_id long, text string"
                ),
                0,
            )

    def test_crash_between_swap_renames_is_repaired(self, spark, tmp_path):
        import shutil

        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        before = sorted(
            map(tuple, spark.read.parquet(state + "/bigrams").collect())
        )
        shutil.move(state, state + ".__trash")
        ngram_lm_batch_merger(state)(
            spark.createDataFrame(self.REF[2:], "doc_id long, text string"), 2
        )
        assert sorted(
            map(tuple, spark.read.parquet(state + "/bigrams").collect())
        ) == before

    def test_stream_e2e_equals_direct_merges(self, spark, tmp_path):
        from homelogging_spark.streaming.pipeline import start_ngram_lm_stream

        src = tmp_path / "landing"
        src.mkdir()
        for chunk in (self.REF[:1], self.REF[1:2], self.REF[2:]):
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(str(src))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        state = str(tmp_path / "lm_state")
        q = start_ngram_lm_stream(stream, state, str(tmp_path / "ckpt"))
        q.awaitTermination(180)
        ref_state = str(tmp_path / "ref_state")
        self._merge_all(spark, ref_state)
        assert sorted(
            map(tuple, spark.read.parquet(state + "/bigrams").collect())
        ) == sorted(
            map(tuple, spark.read.parquet(ref_state + "/bigrams").collect())
        )
        got = spark.read.parquet(state + "/stats").collect()[0]
        exp = spark.read.parquet(ref_state + "/stats").collect()[0]
        assert (got.n_docs, got.corpus_digest) == (exp.n_docs, exp.corpus_digest)

    def test_size_metrics_emitted_per_merge(self, spark, tmp_path):
        """r19 (r18 verdict #4, the capstats 'no silent growth'
        discipline): every merge's stats row carries the raw table's
        size honesty metrics — row count, hapax mass (what a
        min_count=2 load would shed), and on-disk bytes — hand-checked
        against the fixture corpus."""
        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        stats = spark.read.parquet(state + "/stats").collect()[0]
        rows = spark.read.parquet(state + "/bigrams").collect()
        exp_nb = len(rows)
        exp_nh = sum(1 for r in rows if r.c == 1)
        assert (stats.n_bigrams, stats.n_hapax) == (exp_nb, exp_nh)
        assert exp_nh > 0  # fixture has hapax mass — the metric is live
        assert stats.state_bytes > 0
        assert stats.n_partitions is None  # legacy layout recorded as such


class TestNgramLmStreamPartitioned:
    """r19 (r18 verdict #2): the hash-partitioned state layout — a
    micro-batch rewrites only the bigram partitions it touches, with
    the whole-dir swap's crash guarantees re-derived per partition and
    the single stats row still the commit point."""

    REF = TestNgramLm.REF
    SCORE = TestNgramLm.SCORE
    NP = 4

    def _merge_all(self, spark, state, run_id=None):
        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        merger = ngram_lm_batch_merger(
            state, run_id=run_id, n_partitions=self.NP
        )
        chunks = [self.REF[:1], self.REF[1:2], self.REF[2:]]
        for i, chunk in enumerate(chunks):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        return merger

    def _pmax(self, spark, state):
        return {
            int(r.part): int(r.pmax)
            for r in spark.read.parquet(state + "/bigrams")
            .groupBy("part")
            .agg(F.max("pmax").alias("pmax"))
            .collect()
        }

    def test_partitioned_state_scores_identically(self, spark, tmp_path):
        """Layout is invisible to serving: partitioned stream-merged
        state + load-time cut == batch-trained model at both dials."""
        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        for mc in (1, 2):
            batch_lm = textops.ngram_lm_counts(ref, min_count=mc)
            state_lm = textops.ngram_lm_from_state(spark, state, min_count=mc)
            b = sorted(
                tuple(r)
                for r in textops.ngram_lm_score(
                    docs, batch_lm, ppl_threshold=5.0
                ).collect()
            )
            s = sorted(
                tuple(r)
                for r in textops.ngram_lm_score(
                    docs, state_lm, ppl_threshold=5.0
                ).collect()
            )
            assert b == s

    def test_small_batch_rewrites_strict_subset(self, spark, tmp_path):
        """The layout's whole point (r18 verdict #2's Done pin): after
        a full fold, a small batch rewrites a STRICT subset of
        partitions — untouched partitions keep their old pmax
        watermark — and the folded state still scores identically to
        the batch trainer over the union corpus."""
        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        state = str(tmp_path / "lm_state")
        merger = self._merge_all(spark, state)
        before = self._pmax(spark, state)
        assert len(before) == self.NP  # fixture vocabulary covers all parts
        extra = [(99, "zebra quokka")]
        merger(spark.createDataFrame(extra, "doc_id long, text string"), 3)
        after = self._pmax(spark, state)
        rewritten = {p for p, m in after.items() if m == 3}
        assert rewritten  # the batch landed somewhere
        assert len(rewritten) < self.NP  # strict subset
        untouched = {p: m for p, m in after.items() if p not in rewritten}
        assert untouched == {p: m for p, m in before.items() if p not in rewritten}
        # parity on the union corpus is unchanged by the partial rewrite
        ref = spark.createDataFrame(
            self.REF + extra, "doc_id long, text string"
        )
        batch_lm = textops.ngram_lm_counts(ref, min_count=1)
        state_lm = textops.ngram_lm_from_state(spark, state, min_count=1)
        assert sorted(map(tuple, batch_lm["bigrams"].collect())) == sorted(
            map(tuple, state_lm["bigrams"].collect())
        )

    def test_crashed_attempt_partitions_not_double_folded(
        self, spark, tmp_path
    ):
        """Crash AFTER some partition swaps but BEFORE the stats
        commit: on redelivery the per-partition pmax watermark skips
        the already-committed partitions, so no bigram is folded
        twice. Simulated by restoring the pre-batch stats dir (the
        commit point) after a completed merge, then redelivering."""
        import shutil

        state = str(tmp_path / "lm_state")
        merger = self._merge_all(spark, state)
        shutil.copytree(state + "/stats", str(tmp_path / "stats_snapshot"))
        extra = spark.createDataFrame(
            [(99, "zebra quokka")], "doc_id long, text string"
        )
        merger(extra, 3)
        good = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/bigrams")
                .select("w1", "w2", "c")
                .collect(),
            )
        )
        # crash simulation: partitions committed, stats row rolled back
        shutil.rmtree(state + "/stats")
        shutil.copytree(str(tmp_path / "stats_snapshot"), state + "/stats")
        merger(extra, 3)  # redelivery
        again = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/bigrams")
                .select("w1", "w2", "c")
                .collect(),
            )
        )
        assert again == good  # exactly-once per partition held
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert stats.max_batch_id == 3  # and the commit point advanced

    def test_crash_between_partition_swap_renames_is_repaired(
        self, spark, tmp_path
    ):
        """A partition sitting in the trash root while missing live IS
        the last committed generation — both the next merge and the
        loader restore it before reading."""
        import os
        import shutil

        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        before = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/bigrams")
                .select("w1", "w2", "c")
                .collect(),
            )
        )
        part = sorted(os.listdir(state + "/bigrams"))[0]
        os.makedirs(state + "/.__trash_bigrams", exist_ok=True)
        shutil.move(
            state + "/bigrams/" + part,
            state + "/.__trash_bigrams/" + part,
        )
        state_lm = textops.ngram_lm_from_state(spark, state, min_count=1)
        assert sorted(
            map(tuple, state_lm["bigrams"].collect())
        ) == before
        assert not os.path.exists(state + "/.__trash_bigrams")

    def test_state_relayout_preserves_lm_scoring(self, spark, tmp_path):
        """r20 (r19 verdict #8): relayouting the LM state (whose stats
        row carries the extra size-honesty columns) to the legacy
        layout preserves bigrams, stats and digest verbatim — a
        state-loaded model over the relayouted generation scores
        row-identically to the batch-trained one."""
        from homelogging_spark.streaming.pipeline import state_relayout

        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        before_stats = spark.read.parquet(state + "/stats").collect()[0]
        rep = state_relayout(spark, state, "bigrams", ["w1", "w2"], "c", None)
        assert (rep["rewritten"], rep["from"], rep["to"]) == (
            True, self.NP, None,
        )
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert stats.n_partitions is None
        assert (stats.n_docs, stats.max_batch_id, stats.corpus_digest) == (
            before_stats.n_docs,
            before_stats.max_batch_id,
            before_stats.corpus_digest,
        )
        assert (stats.n_bigrams, stats.n_hapax) == (
            before_stats.n_bigrams, before_stats.n_hapax,
        )
        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        docs = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        batch_lm = textops.ngram_lm_counts(ref, min_count=2)
        state_lm = textops.ngram_lm_from_state(
            spark, state, min_count=2, verify_corpus=ref
        )
        b = sorted(
            tuple(r)
            for r in textops.ngram_lm_score(
                docs, batch_lm, ppl_threshold=5.0
            ).collect()
        )
        s = sorted(
            tuple(r)
            for r in textops.ngram_lm_score(
                docs, state_lm, ppl_threshold=5.0
            ).collect()
        )
        assert b == s

    def test_layout_mismatch_raises(self, spark, tmp_path):
        """A merger configured for the other layout must refuse to
        fold — appending root files beside part= dirs (or vice versa)
        would double-count half the table on load."""
        import pytest as _pytest

        from homelogging_spark.streaming.pipeline import ngram_lm_batch_merger

        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        batch = spark.createDataFrame(
            [(99, "zebra quokka")], "doc_id long, text string"
        )
        with _pytest.raises(ValueError, match="n_partitions"):
            ngram_lm_batch_merger(state)(batch, 3)
        legacy = str(tmp_path / "legacy_state")
        ngram_lm_batch_merger(legacy)(batch, 0)
        with _pytest.raises(ValueError, match="n_partitions"):
            ngram_lm_batch_merger(legacy, n_partitions=self.NP)(batch, 1)

    def test_verify_corpus_gate(self, spark, tmp_path):
        """The bm25 verify_state discipline on the LM tier: loading
        with the exact reference frame passes; a lagging/leading frame
        raises instead of silently shifting every conditional."""
        import pytest as _pytest

        state = str(tmp_path / "lm_state")
        self._merge_all(spark, state)
        ref = spark.createDataFrame(self.REF, "doc_id long, text string")
        lm = textops.ngram_lm_from_state(
            spark, state, min_count=2, verify_corpus=ref
        )
        assert lm["bigrams"].count() > 0
        with _pytest.raises(ValueError, match="drift"):
            textops.ngram_lm_from_state(
                spark, state, min_count=2, verify_corpus=ref.limit(2)
            )

    def test_metrics_and_replay(self, spark, tmp_path):
        """Partitioned stats rows carry the size metrics and the
        layout marker; same-run replay stays the exactly-once no-op."""
        state = str(tmp_path / "lm_state")
        merger = self._merge_all(spark, state, run_id="ckpt-A")
        stats = spark.read.parquet(state + "/stats").collect()[0]
        rows = (
            spark.read.parquet(state + "/bigrams")
            .select("w1", "w2", "c")
            .collect()
        )
        assert stats.n_bigrams == len(rows)
        assert stats.n_hapax == sum(1 for r in rows if r.c == 1)
        assert stats.state_bytes > 0
        assert stats.n_partitions == self.NP
        before = sorted(map(tuple, rows))
        merger(
            spark.createDataFrame(self.REF[:1], "doc_id long, text string"), 0
        )
        assert sorted(
            map(
                tuple,
                spark.read.parquet(state + "/bigrams")
                .select("w1", "w2", "c")
                .collect(),
            )
        ) == before
