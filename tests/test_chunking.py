"""Unit tests for document chunking and exact duplicated-passage stats."""

from __future__ import annotations

import hashlib

import pytest

from homelogging_spark.operators import chunking


class TestChunkDocuments:
    def test_grid_covers_all_tokens_with_overlap(self, spark):
        # 10 tokens, chunk=4, stride=3 -> starts 1,4,7 (ceil(6/3)+1 = 3)
        docs = spark.createDataFrame(
            [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")], "doc_id long, text string"
        )
        rows = sorted(
            chunking.chunk_documents(docs, chunk=4, stride=3).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [(r.start, r.chunk_tokens) for r in rows] == [(1, 4), (4, 4), (7, 4)]
        # md5 of the actual window text
        exp = hashlib.md5(b"t4 t5 t6 t7").hexdigest()
        assert rows[1].chunk_md5 == exp

    def test_tail_chunk_is_short_not_dropped(self, spark):
        # 11 tokens, chunk=4, stride=3 -> starts 1,4,7,10; last has 2 tokens
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(1, 12)))], "doc_id long, text string"
        )
        rows = sorted(
            chunking.chunk_documents(docs, chunk=4, stride=3).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert [(r.start, r.chunk_tokens) for r in rows] == [
            (1, 4), (4, 4), (7, 4), (10, 2),
        ]

    def test_short_and_empty_docs_emit_one_chunk(self, spark):
        docs = spark.createDataFrame(
            [(1, "only two"), (2, "")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in chunking.chunk_documents(docs).collect()}
        assert rows[1].chunk_tokens == 2 and rows[1].chunk_idx == 0
        assert rows[2].chunk_tokens == 0

    def test_identical_windows_share_md5(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d x y"), (2, "a b c d p q")], "doc_id long, text string"
        )
        out = chunking.chunk_documents(docs, chunk=4, stride=4).collect()
        first = {r.doc_id: r.chunk_md5 for r in out if r.chunk_idx == 0}
        assert first[1] == first[2]


class TestDuplicatedPassages:
    def test_cross_doc_spans_marked(self, spark):
        shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one k=8 span
        docs = spark.createDataFrame(
            [
                (1, shared + " unique1 tail1 here1"),
                (2, "lead2 text2 " + shared),
                (3, "totally different words without any overlap at all"),
                (4, "tiny"),  # < k tokens -> zero spans
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in chunking.duplicated_passages(docs, k=8).collect()}
        # doc1: 11 tokens -> 4 spans; only the span at pos 1 is shared
        assert rows[1].n_spans == 4 and rows[1].n_dup_spans == 1
        assert rows[1].dup_tokens == 8
        assert rows[1].dup_frac == pytest.approx(0.25)
        # doc2: shared span sits at pos 3 of 10 tokens -> 3 spans, 1 dup
        assert rows[2].n_spans == 3 and rows[2].n_dup_spans == 1
        assert rows[2].dup_tokens == 8
        assert rows[3].n_dup_spans == 0 and rows[3].dup_frac == 0.0
        assert rows[4].n_spans == 0 and rows[4].dup_frac == 0.0

    def test_overlapping_dup_spans_union_not_double_counted(self, spark):
        # docs share a 9-token run -> two overlapping k=8 spans; the union
        # covers 9 tokens, not 16.
        run = " ".join(f"s{i}" for i in range(9))
        docs = spark.createDataFrame(
            [(1, run + " endA"), (2, run + " endB")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in chunking.duplicated_passages(docs, k=8).collect()}
        assert rows[1].n_dup_spans == 2
        assert rows[1].dup_tokens == 9

    def test_within_doc_repeat_is_not_cross_doc_dup(self, spark):
        # the same span twice inside ONE doc only -> not duplicated
        run = " ".join(f"r{i}" for i in range(8))
        docs = spark.createDataFrame(
            [(1, run + " mid " + run), (2, "other words " * 6)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in chunking.duplicated_passages(docs, k=8).collect()}
        assert rows[1].n_dup_spans == 0


class TestPassageStride:
    def test_stride_one_default_unchanged_and_stride_cuts_grid(self, spark):
        """pos_stride=1 must equal the old exhaustive behavior;
        pos_stride=4 samples every 4th start, cutting n_spans ~4x while
        aligned shared passages are still flagged."""
        from homelogging_spark.operators import chunking

        shared = " ".join(f"w{i}" for i in range(16))  # 16-token shared run
        docs = spark.createDataFrame(
            [(1, shared + " taila tailb"), (2, shared + " tailc taild")],
            "doc_id long, text string",
        )
        exhaustive = {
            r.doc_id: r
            for r in chunking.duplicated_passages(docs, k=8, pos_stride=1).collect()
        }
        strided = {
            r.doc_id: r
            for r in chunking.duplicated_passages(docs, k=8, pos_stride=4).collect()
        }
        # 18 tokens, k=8 -> 11 exhaustive starts; stride 4 -> starts 1,5,9
        assert exhaustive[1].n_spans == 11
        assert strided[1].n_spans == 3
        # both docs sample identical offsets into the shared run -> the
        # aligned duplicated spans are still found
        assert strided[1].n_dup_spans >= 2 and strided[2].n_dup_spans >= 2
        assert strided[1].dup_tokens <= exhaustive[1].dup_tokens
