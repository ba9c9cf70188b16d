"""BM25 top-k + reciprocal-rank fusion pins (r16, unit-only — the
registered panel is an r17 runway candidate, COVERAGE.md r16 moves).

The BM25 scores are hand-computed against the Robertson formula with
the Lucene idf, and the Spark plan is cross-checked against the DuckDB
twin on the same fixture — the same two-engine discipline the oracle
rows enforce for registered queries."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators.textops import bm25_topk, bm25_topk_sql, rrf_fuse

DOCS = [
    (1, "grid power grid power grid"),
    (2, "power meter reading"),
    (3, "the quick brown fox"),
    (4, "grid"),
    (5, "power power power power power power"),
]
QUERY = [(0, "grid"), (0, "power"), (1, "fox")]
K1, B = 1.2, 0.75


def _bm25_expected():
    toks = {d: t.split() for d, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {}
    for term in {t for _, t in QUERY}:
        dfreq[term] = float(sum(1 for v in toks.values() if term in v))
    out = {}
    for qid in {q for q, _ in QUERY}:
        terms = [t for q, t in QUERY if q == qid]
        for d, v in toks.items():
            s, hits = 0.0, 0
            for t in terms:
                tf = float(v.count(t))
                if tf == 0:
                    continue
                hits += 1
                idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * (tf * (K1 + 1.0)) / (
                    tf + K1 * (1.0 - B + B * len(v) / avgdl)
                )
            if hits:
                out[(qid, d)] = (s, hits)
    return out


class TestBm25:
    def _run(self, spark, k=10):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        return bm25_topk(docs, q, k=k, k1=K1, b=B).collect()

    def test_scores_match_hand_computation(self, spark):
        expected = _bm25_expected()
        rows = self._run(spark)
        got = {(r.query_id, r.doc_id): (r.score, r.n_terms_hit) for r in rows}
        assert set(got) == set(expected)
        for key, (s, hits) in expected.items():
            # emitted scores are quantized to 6 decimals (cross-engine rule)
            assert got[key][0] == pytest.approx(s, abs=5.1e-7), key
            assert got[key][1] == hits, key

    def test_ranks_and_k_cutoff(self, spark):
        rows = self._run(spark, k=2)
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id))
        # query 0: doc 1 (3x grid + 2x power) beats the one-term docs;
        # doc 5 spams the LOW-idf term (power, df=3) so saturation +
        # idf keep it under doc 1
        assert sorted(by_q[0])[0] == (1, 1)
        assert len(by_q[0]) == 2  # k cutoff applied
        assert by_q[1] == [(1, 3)]  # 'fox' matches only doc 3

    def test_duplicate_query_terms_do_not_double_count(self, spark):
        """r16 ADVICE: a duplicated (query_id, term) row used to
        double-count that term in score AND n_terms_hit; both engines
        now dedup the panel before the scoring join."""
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        dup = spark.createDataFrame(
            QUERY + [(0, "grid"), (1, "fox")], "query_id long, term string"
        )
        clean = sorted(tuple(r) for r in self._run(spark))
        got = sorted(
            tuple(r) for r in bm25_topk(docs, dup, k=10, k1=K1, b=B).collect()
        )
        assert got == clean
        # the SQL twin applies the same dedup
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({d}, '{t}')" for d, t in DOCS)
            + ") v(doc_id, text)"
        )
        q_cte = (
            "SELECT * FROM (VALUES "
            + ",".join(f"({q}, '{t}')" for q, t in QUERY + [(0, "grid"), (1, "fox")])
            + ") q(query_id, term)"
        )
        duck = sorted(
            tuple(r)
            for r in con.execute(bm25_topk_sql(q_cte, k=10, k1=K1, b=B)).fetchall()
        )
        assert duck == clean

    def test_duckdb_twin_emits_identical_rows(self, spark):
        spark_rows = sorted(
            tuple(r) for r in self._run(spark)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({d}, '{t}')" for d, t in DOCS)
            + ") v(doc_id, text)"
        )
        q_cte = (
            "SELECT * FROM (VALUES "
            + ",".join(f"({q}, '{t}')" for q, t in QUERY)
            + ") q(query_id, term)"
        )
        duck_rows = sorted(
            tuple(r)
            for r in con.execute(bm25_topk_sql(q_cte, k=10, k1=K1, b=B)).fetchall()
        )
        assert spark_rows == duck_rows

    def test_stored_doc_len_dial_identical(self, spark):
        # the 100 TB dial: a stored token-count column must reproduce
        # the default (re-tokenizing) path row for row
        docs = spark.createDataFrame(
            [(d, t, len(t.split())) for d, t in DOCS],
            "doc_id long, text string, n_toks long",
        )
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        default = sorted(tuple(r) for r in bm25_topk(docs, q, k1=K1, b=B).collect())
        dialed = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k1=K1, b=B, doc_len_col="n_toks"
            ).collect()
        )
        assert default == dialed

    def test_query_pruning_never_builds_full_vocab(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        plan = (
            bm25_topk(docs, q)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the query-term prune must be a broadcast join (the explode
        # output never shuffles at full width)
        assert "BroadcastHashJoin" in plan


class TestBm25StatsStream:
    """r17 stretch (r16 verdict #8): incremental df / N / total_dl
    maintenance via the KMV-rollup foreachBatch pattern, so the lexical
    leg serves from maintained artifacts the way the ANN leg does."""

    def _chunks(self):
        return [DOCS[:2], DOCS[2:4], DOCS[4:]]

    def _merge_all(self, spark, state, chunks=None, start_id=0, run_id=None):
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        merger = bm25_stats_batch_merger(state, run_id=run_id)
        for i, chunk in enumerate(chunks or self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"),
                start_id + i,
            )
        return merger

    def _state(self, spark, state):
        dfreq = {
            r.term: r.df
            for r in spark.read.parquet(state + "/dfreq").collect()
        }
        stats = spark.read.parquet(state + "/stats").collect()[0]
        return dfreq, stats

    def test_state_equals_batch_stats_and_serves_identically(
        self, spark, tmp_path
    ):
        state = str(tmp_path / "bm25_state")
        self._merge_all(spark, state)
        dfreq, stats = self._state(spark, state)
        # hand-checked corpus statistics over the full fixture
        toks = {d: t.split() for d, t in DOCS}
        exp_df = {}
        for v in toks.values():
            for t in set(v):
                exp_df[t] = exp_df.get(t, 0) + 1
        assert dfreq == exp_df
        assert stats.n_docs == len(DOCS)
        assert stats.total_dl == sum(len(v) for v in toks.values())
        assert stats.max_batch_id == 2
        # serving from the maintained state == the recomputing path
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        recomputed = sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        served = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k=10, k1=K1, b=B,
                dfreq=spark.read.parquet(state + "/dfreq"),
                stats=spark.read.parquet(state + "/stats"),
            ).collect()
        )
        assert served == recomputed

    def test_empty_corpus_state_serves_empty_not_crash(self, spark, tmp_path):
        """Serving from a zero-doc state emits the same empty result
        the recomputing path emits — not an ANSI divide-by-zero from
        avgdl = 0/0 (Spark raises on double zero-division)."""
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state")
        empty = spark.createDataFrame([], "doc_id long, text string")
        bm25_stats_batch_merger(state)(empty, 0)
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert (stats.n_docs, stats.total_dl) == (0, 0)
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        out = bm25_topk(
            empty, q, k=10, k1=K1, b=B,
            dfreq=spark.read.parquet(state + "/dfreq"),
            stats=spark.read.parquet(state + "/stats"),
        ).collect()
        assert out == []

    def test_redelivered_batch_is_noop(self, spark, tmp_path):
        state = str(tmp_path / "bm25_state")
        merger = self._merge_all(spark, state)
        before = self._state(spark, state)
        # at-least-once redelivery: replay batches 0..2 (ids <= watermark)
        for i, chunk in enumerate(self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        assert self._state(spark, state) == before

    def test_crash_between_swap_renames_is_repaired(self, spark, tmp_path):
        import shutil

        state = str(tmp_path / "bm25_state")
        self._merge_all(spark, state)
        before = self._state(spark, state)
        # crash window: live moved to trash, staged copy never promoted
        shutil.move(state, state + ".__trash")
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        bm25_stats_batch_merger(state)(
            spark.createDataFrame(DOCS[:1], "doc_id long, text string"), 2
        )
        # repair restored the committed generation; the redelivered
        # id-2 batch then hit the watermark and was skipped
        assert self._state(spark, state) == before

    def test_verify_state_detects_corpus_drift(self, spark, tmp_path):
        """r18 (r17 verdict #3): the state generation fingerprints the
        corpus it folded (n_docs + md5-XOR digest of doc ids);
        ``verify_state=True`` serves normally when the scored frame
        matches and raises when it drifts — a lagging/leading state can
        no longer silently shift every idf."""
        import pytest

        state = str(tmp_path / "bm25_state")
        self._merge_all(spark, state)
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        kw = dict(
            k=10, k1=K1, b=B,
            dfreq=spark.read.parquet(state + "/dfreq"),
            stats=spark.read.parquet(state + "/stats"),
        )
        verified = sorted(
            tuple(r)
            for r in bm25_topk(docs, q, verify_state=True, **kw).collect()
        )
        assert verified == sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        # the state LEADS this frame (one doc filtered out): refused
        subset = docs.where(F.col("doc_id") != DOCS[0][0])
        with pytest.raises(ValueError, match="drift"):
            bm25_topk(subset, q, verify_state=True, **kw)
        # ...while the documented subset-corpus contract (the hybrid
        # panel shape) stays expressible without verification
        assert bm25_topk(subset, q, **kw).count() > 0

    def test_run_identity_guards_fresh_checkpoint_restart(
        self, spark, tmp_path
    ):
        """r18 (r17 ADVICE): batch ids are monotonic per CHECKPOINT —
        a fresh checkpoint restarts at 0, and the bare watermark would
        silently classify its genuinely new batches as redelivered.
        A regressed id under a different run identity now raises; a
        same-run replay stays the exactly-once no-op."""
        import pytest

        from homelogging_spark.streaming.pipeline import (
            bm25_stats_batch_merger,
        )

        state = str(tmp_path / "bm25_state")
        merger_a = self._merge_all(spark, state, run_id="ckpt-A")
        before = self._state(spark, state)
        assert before[1].run_id == "ckpt-A"
        # same lineage redelivery: no-op, state unchanged
        merger_a(
            spark.createDataFrame(DOCS[:2], "doc_id long, text string"), 0
        )
        assert self._state(spark, state) == before
        # fresh checkpoint (ids restart at 0): raise, never silently drop
        merger_b = bm25_stats_batch_merger(state, run_id="ckpt-B")
        with pytest.raises(ValueError, match="redelivered"):
            merger_b(
                spark.createDataFrame(
                    DOCS[:2], "doc_id long, text string"
                ),
                0,
            )

    def test_legacy_state_without_digest_merges_but_refuses_verify(
        self, spark, tmp_path
    ):
        """A pre-r18 state (no corpus_digest / run_id columns) keeps
        merging — the digest propagates as NULL (honest unknown) — and
        the verifier refuses it with a pointed error instead of
        pretending to check."""
        import pytest

        state = str(tmp_path / "bm25_state")
        self._merge_all(spark, state, chunks=[DOCS[:2], DOCS[2:4]])
        # rewrite the stats generation in the legacy shape
        legacy = spark.read.parquet(state + "/stats").select(
            "n_docs", "total_dl", "max_batch_id"
        )
        legacy.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "legacy_stats")
        )
        spark.read.parquet(str(tmp_path / "legacy_stats")).coalesce(
            1
        ).write.mode("overwrite").parquet(state + "/stats")
        self._merge_all(spark, state, chunks=[DOCS[4:]], start_id=2)
        dfreq, stats = self._state(spark, state)
        assert stats.n_docs == len(DOCS) and stats.corpus_digest is None
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        with pytest.raises(ValueError, match="no\\s+corpus_digest"):
            bm25_topk(
                docs, q, k=10, k1=K1, b=B, verify_state=True,
                dfreq=spark.read.parquet(state + "/dfreq"),
                stats=spark.read.parquet(state + "/stats"),
            )

    def test_stream_e2e_equals_direct_merges(self, spark, tmp_path):
        from homelogging_spark.streaming.pipeline import start_bm25_stats_stream

        src = tmp_path / "landing"
        src.mkdir()
        for chunk in self._chunks():
            spark.createDataFrame(
                chunk, "doc_id long, text string"
            ).coalesce(1).write.mode("append").parquet(str(src))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        state = str(tmp_path / "bm25_state")
        q = start_bm25_stats_stream(stream, state, str(tmp_path / "ckpt"))
        q.awaitTermination(180)
        dfreq, stats = self._state(spark, state)
        ref_state = str(tmp_path / "ref_state")
        self._merge_all(spark, ref_state)
        ref_dfreq, ref_stats = self._state(spark, ref_state)
        assert dfreq == ref_dfreq
        assert (stats.n_docs, stats.total_dl) == (
            ref_stats.n_docs, ref_stats.total_dl,
        )

    def test_partitioned_dfreq_layout_serves_identically(
        self, spark, tmp_path
    ):
        """r19 (r18 verdict #2): the hash-partitioned dfreq layout — a
        micro-batch rewrites only the term partitions it touches (the
        pmax watermark shows untouched partitions keeping their old
        batch id) and serving from the partitioned state stays
        row-identical to the recomputing path."""
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state_part")
        merger = bm25_stats_batch_merger(state, n_partitions=4)
        for i, chunk in enumerate(self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        table = spark.read.parquet(state + "/dfreq")
        dfreq = {r.term: r.df for r in table.select("term", "df").collect()}
        toks = {d: t.split() for d, t in DOCS}
        exp_df = {}
        for v in toks.values():
            for t in set(v):
                exp_df[t] = exp_df.get(t, 0) + 1
        assert dfreq == exp_df
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert (stats.n_docs, stats.n_partitions) == (len(DOCS), 4)
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        recomputed = sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        served = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k=10, k1=K1, b=B,
                dfreq=spark.read.parquet(state + "/dfreq"),
                stats=spark.read.parquet(state + "/stats"),
                verify_state=True,
            ).collect()
        )
        assert served == recomputed
        # subset rewrite: a one-term batch leaves other partitions'
        # pmax watermarks untouched
        before = {
            int(r.part): int(r.pmax)
            for r in table.groupBy("part").agg(
                F.max("pmax").alias("pmax")
            ).collect()
        }
        assert len(before) == 4
        merger(
            spark.createDataFrame(
                [(99, "zebra")], "doc_id long, text string"
            ),
            3,
        )
        after = {
            int(r.part): int(r.pmax)
            for r in spark.read.parquet(state + "/dfreq")
            .groupBy("part")
            .agg(F.max("pmax").alias("pmax"))
            .collect()
        }
        rewritten = {p for p, m in after.items() if m == 3}
        assert rewritten and len(rewritten) < 4

    def test_high_partition_count_layout(self, spark, tmp_path):
        """r20 (r19 verdict #5): the production P sizing (low
        thousands for text streams, SCALE.md r19) holds at P=1024 —
        the dir count tracks TOUCHED vocabulary, not P (no
        1024-dir fan-out on a small batch), the committed layout pins
        P=1024 against mismatched mergers, swap repair works over the
        high-P layout, and serving stays row-identical to the
        recomputing path."""
        import os
        import shutil

        from homelogging_spark.operators.textops import bm25_from_state
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state_p1024")
        merger = bm25_stats_batch_merger(state, n_partitions=1024)
        for i, chunk in enumerate(self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        parts = [
            d for d in os.listdir(state + "/dfreq") if d.startswith("part=")
        ]
        vocab = {t for _, txt in DOCS for t in txt.split()}
        assert 0 < len(parts) <= len(vocab)  # touched-bounded, not P
        stats = spark.read.parquet(state + "/stats").collect()[0]
        assert (stats.n_docs, stats.n_partitions) == (len(DOCS), 1024)
        with pytest.raises(ValueError, match="n_partitions"):
            bm25_stats_batch_merger(state, n_partitions=8)(
                spark.createDataFrame(
                    [(99, "zebra")], "doc_id long, text string"
                ),
                3,
            )
        # torn-swap repair under the high-P layout
        full = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/dfreq")
                .select("term", "df")
                .collect(),
            )
        )
        os.makedirs(state + "/.__trash_dfreq", exist_ok=True)
        shutil.move(
            state + "/dfreq/" + parts[0],
            state + "/.__trash_dfreq/" + parts[0],
        )
        st = bm25_from_state(spark, state)
        assert sorted(map(tuple, st["dfreq"].collect())) == full
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        served = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k=10, k1=K1, b=B,
                dfreq=st["dfreq"], stats=st["stats"], verify_state=True,
            ).collect()
        )
        recomputed = sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        assert served == recomputed

    def test_loader_repairs_torn_partition_swap(self, spark, tmp_path):
        """r20 (r19 ADVICE #1): the BM25 state LOADER gives the same
        load-side repair guarantee the LM loader has — a partition
        sitting in the trash root while missing live (crash between the
        two swap renames) is restored before reading, where a raw
        ``spark.read.parquet(state + '/dfreq')`` would silently drop
        that partition's terms (and verify_state would still pass:
        n_docs/digest live in the untouched stats row)."""
        import os
        import shutil

        from homelogging_spark.operators.textops import bm25_from_state
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state_part")
        merger = bm25_stats_batch_merger(state, n_partitions=4)
        for i, chunk in enumerate(self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        full = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/dfreq")
                .select("term", "df")
                .collect(),
            )
        )
        part = sorted(os.listdir(state + "/dfreq"))[0]
        os.makedirs(state + "/.__trash_dfreq", exist_ok=True)
        shutil.move(
            state + "/dfreq/" + part, state + "/.__trash_dfreq/" + part
        )
        # the raw read really would drop the torn partition's terms
        torn = spark.read.parquet(state + "/dfreq").select("term", "df")
        assert torn.count() < len(full)
        st = bm25_from_state(spark, state)
        assert sorted(map(tuple, st["dfreq"].collect())) == full
        assert not os.path.exists(state + "/.__trash_dfreq")
        # and serving through the loader matches the recomputing path
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        served = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k=10, k1=K1, b=B,
                dfreq=st["dfreq"], stats=st["stats"], verify_state=True,
            ).collect()
        )
        recomputed = sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        assert served == recomputed

    def test_partitioned_zero_key_first_batch_rename_committed(
        self, spark, tmp_path
    ):
        """r20 (r19 ADVICE #4): the zero-key first batch's empty
        schema-bearing commit rides the same tmp-root stage + rename
        as real partitions — no tmp residue, loaders see the empty
        table, and a later real batch folds normally on top."""
        import os

        from homelogging_spark.operators.textops import bm25_from_state
        from homelogging_spark.streaming.pipeline import bm25_stats_batch_merger

        state = str(tmp_path / "bm25_state_part")
        merger = bm25_stats_batch_merger(state, n_partitions=4)
        empty = spark.createDataFrame([], "doc_id long, text string")
        merger(empty, 0)
        assert not os.path.exists(state + "/.__tmp_dfreq")
        assert os.path.isdir(state + "/dfreq/part=0")
        st = bm25_from_state(spark, state)
        assert st["dfreq"].count() == 0
        stats = st["stats"].collect()[0]
        assert (stats.n_docs, stats.total_dl) == (0, 0)
        merger(
            spark.createDataFrame(DOCS[:2], "doc_id long, text string"), 1
        )
        st2 = bm25_from_state(spark, state)
        toks = {d: t.split() for d, t in DOCS[:2]}
        exp = {}
        for v in toks.values():
            for t in set(v):
                exp[t] = exp.get(t, 0) + 1
        assert {r.term: r.df for r in st2["dfreq"].collect()} == exp

    def test_state_relayout_roundtrip(self, spark, tmp_path):
        """r20 (r19 verdict #8): ``state_relayout`` folds a cooled
        partitioned state to the legacy layout (small-file compaction)
        and migrates back up, preserving counts, stats, digest and the
        batch watermark verbatim; the mergers accept the new layout
        and refuse the old; a same-layout call no-ops."""
        import os

        from homelogging_spark.operators.textops import bm25_from_state
        from homelogging_spark.streaming.pipeline import (
            bm25_stats_batch_merger,
            state_relayout,
        )

        state = str(tmp_path / "bm25_state")
        merger4 = bm25_stats_batch_merger(state, n_partitions=4)
        for i, chunk in enumerate(self._chunks()):
            merger4(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        before_df, before_stats = self._state(spark, state)
        rep = state_relayout(spark, state, "dfreq", ["term"], "df", None)
        assert (rep["rewritten"], rep["from"], rep["to"]) == (True, 4, None)
        assert rep["n_keys"] == len(before_df)
        assert not any(
            d.startswith("part=") for d in os.listdir(state + "/dfreq")
        )
        st = bm25_from_state(spark, state)
        assert {r.term: r.df for r in st["dfreq"].collect()} == before_df
        stats = st["stats"].collect()[0]
        assert stats.n_partitions is None
        assert (stats.n_docs, stats.total_dl, stats.max_batch_id) == (
            before_stats.n_docs,
            before_stats.total_dl,
            before_stats.max_batch_id,
        )
        assert stats.corpus_digest == before_stats.corpus_digest
        # the legacy merger now accepts the state (layout guard green)
        extra = [(99, "zebra quokka")]
        bm25_stats_batch_merger(state)(
            spark.createDataFrame(extra, "doc_id long, text string"), 3
        )
        # ...and the same call migrates back UP to a partitioned layout
        rep2 = state_relayout(spark, state, "dfreq", ["term"], "df", 8)
        assert (rep2["rewritten"], rep2["from"], rep2["to"]) == (
            True, None, 8,
        )
        with pytest.raises(ValueError, match="n_partitions"):
            bm25_stats_batch_merger(state, n_partitions=4)(
                spark.createDataFrame(extra, "doc_id long, text string"), 4
            )
        rep3 = state_relayout(spark, state, "dfreq", ["term"], "df", 8)
        assert rep3["rewritten"] is False
        # watermark preserved: redelivering batch 3 under P=8 no-ops,
        # and serving equals the recomputing path on the union corpus
        merger8 = bm25_stats_batch_merger(state, n_partitions=8)
        merger8(
            spark.createDataFrame(extra, "doc_id long, text string"), 3
        )
        docs = spark.createDataFrame(
            DOCS + extra, "doc_id long, text string"
        )
        q = spark.createDataFrame(QUERY, "query_id long, term string")
        st2 = bm25_from_state(spark, state)
        served = sorted(
            tuple(r)
            for r in bm25_topk(
                docs, q, k=10, k1=K1, b=B,
                dfreq=st2["dfreq"], stats=st2["stats"], verify_state=True,
            ).collect()
        )
        recomputed = sorted(
            tuple(r) for r in bm25_topk(docs, q, k=10, k1=K1, b=B).collect()
        )
        assert served == recomputed

    def test_state_relayout_crash_window_repaired(self, spark, tmp_path):
        """A crash between the relayout's two swap renames leaves the
        committed generation in the sibling trash; the next relayout
        (or any merger/loader) restores it before proceeding."""
        import shutil

        from homelogging_spark.streaming.pipeline import (
            bm25_stats_batch_merger,
            state_relayout,
        )

        state = str(tmp_path / "bm25_state")
        merger = bm25_stats_batch_merger(state, n_partitions=4)
        for i, chunk in enumerate(self._chunks()):
            merger(
                spark.createDataFrame(chunk, "doc_id long, text string"), i
            )
        before = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/dfreq")
                .select("term", "df")
                .collect(),
            )
        )
        shutil.move(state, state + ".__trash")
        rep = state_relayout(spark, state, "dfreq", ["term"], "df", None)
        assert rep["rewritten"] is True
        after = sorted(
            map(
                tuple,
                spark.read.parquet(state + "/dfreq")
                .select("term", "df")
                .collect(),
            )
        )
        assert after == before

    def test_loader_repairs_legacy_whole_generation_swap(
        self, spark, tmp_path
    ):
        """The legacy layout's crash window (whole state dir in the
        sibling trash) repairs through the same loader call — both
        layouts get repair-on-read from one entry point."""
        import os
        import shutil

        from homelogging_spark.operators.textops import bm25_from_state

        state = str(tmp_path / "bm25_state")
        self._merge_all(spark, state)
        before = self._state(spark, state)
        shutil.move(state, state + ".__trash")
        st = bm25_from_state(spark, state)
        assert {r.term: r.df for r in st["dfreq"].collect()} == before[0]
        assert os.path.exists(state) and not os.path.exists(
            state + ".__trash"
        )


class TestRrfFuse:
    def test_fusion_hand_check_and_leg_counts(self, spark):
        lex = spark.createDataFrame(
            [(0, 10, 1), (0, 20, 2), (0, 30, 3)],
            "query_id long, doc_id long, rank long",
        )
        vec = spark.createDataFrame(
            [(0, 20, 1), (0, 40, 2)],
            "query_id long, doc_id long, rank long",
        )
        rows = {r.doc_id: r for r in rrf_fuse([lex, vec], k=10, c=60).collect()}
        # doc 20: rank 2 lexical + rank 1 vector
        assert rows[20].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=5.1e-7)
        assert rows[20].n_legs == 2
        assert rows[20].rank == 1  # two-leg doc outranks any single-leg
        assert rows[10].n_legs == 1
        assert rows[40].rrf_score == pytest.approx(1 / 62, abs=5.1e-7)
        # exact fused order: 1/61+1/62 > 1/61 > 1/62 > 1/63
        assert [
            r.doc_id for r in sorted(rows.values(), key=lambda r: r.rank)
        ] == [20, 10, 40, 30]

    def test_k_cutoff(self, spark):
        leg = spark.createDataFrame(
            [(0, d, r) for r, d in enumerate(range(100, 110), start=1)],
            "query_id long, doc_id long, rank long",
        )
        assert rrf_fuse([leg], k=3).count() == 3
