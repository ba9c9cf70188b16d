"""Unit tests for the LLM-data-pipeline tier (dedup, text analysis,
similarity, multimodal) on small hand-built frames — the oracle parity
tests in ``plans/llm_registry.py`` cover the driver tables; these cover
the semantics the synthetic corpus can't (real duplicates, real
multilingual text, planted nearest neighbors, decoder injection)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from homelogging_spark.operators import dedup, multimodal, similarity, textops
from homelogging_spark.functions.texthash import tokens


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun every single day"
)


class TestExactDedup:
    def test_groups_and_canonical(self, spark):
        df = docs_df(spark, [BASE, "unique one", BASE, "unique two", BASE])
        out = dedup.exact_dedup(df).orderBy("doc_id").collect()
        assert [r.n_copies for r in out] == [3, 1, 3, 1, 3]
        assert [r.canonical_id for r in out] == [0, 1, 0, 3, 0]
        assert [r.is_canonical for r in out] == [True, True, False, True, False]
        # same text -> same hash; different -> different
        assert out[0].content_hash == out[2].content_hash
        assert out[0].content_hash != out[1].content_hash


class TestMinHashLSH:
    def test_near_dup_pair_found_and_verified(self, spark):
        near = BASE.replace("lazy", "sleepy")  # one-token edit, J ~ 0.76
        far = "completely different content about spark shuffle partitions and hash joins at scale"
        df = docs_df(spark, [BASE, near, far])
        # J~0.76 sits below the default (b=4, r=4) S-curve knee (~0.71 with
        # sharp falloff); moderate-similarity mining shifts the curve left
        # with more, narrower bands: (b=8, r=2) centers at ~0.35.
        pairs = dedup.minhash_near_dup_pairs(
            df, threshold=0.5, n_hashes=16, n_bands=8
        ).collect()
        assert [(p.doc_a, p.doc_b) for p in pairs] == [(0, 1)]
        assert 0.5 <= pairs[0].jaccard < 1.0

    def test_identical_docs_jaccard_one(self, spark):
        df = docs_df(spark, [BASE, BASE])
        pairs = dedup.minhash_near_dup_pairs(df, threshold=0.9).collect()
        assert len(pairs) == 1 and pairs[0].jaccard == 1.0

    def test_band_cap_inert_when_buckets_fit(self, spark):
        """Buckets at or under the cap must yield byte-identical pairs
        to the uncapped form."""
        near = BASE.replace("lazy", "sleepy")
        df = docs_df(spark, [BASE, near, "unrelated text about joins"])
        unc = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.minhash_near_dup_pairs(
                df, threshold=0.5, n_bands=8
            ).collect()
        )
        cap = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.minhash_near_dup_pairs(
                df, threshold=0.5, n_bands=8, band_cap=100
            ).collect()
        )
        assert cap == unc

    def test_band_cap_bounds_boilerplate_cluster(self, spark):
        """A 40-doc near-identical boilerplate cluster shares every band
        hash; with band_cap=10 each band splits into 4 md5 sub-buckets,
        so emitted pairs are a strict subset of the uncapped quadratic
        set and at least halved."""
        docs = [BASE + f" trailer{i % 2}" for i in range(40)]
        df = docs_df(spark, docs)
        unc = set(
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_near_dup_pairs(df, threshold=0.5).collect()
        )
        assert len(unc) == 40 * 39 // 2  # the full quadratic cluster
        capped = set(
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_near_dup_pairs(
                df, threshold=0.5, band_cap=10
            ).collect()
        )
        assert capped and capped < unc
        assert len(capped) * 2 <= len(unc)

    def test_band_cap_rejects_nonpositive(self, spark):
        df = docs_df(spark, [BASE])
        with pytest.raises(ValueError, match="band_cap"):
            dedup.minhash_near_dup_pairs(df, band_cap=0).collect()

    def test_jaccard_exact_value(self, spark):
        df = spark.range(1).select(
            dedup.jaccard(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                F.array(F.lit("b"), F.lit("c"), F.lit("d")),
            ).alias("j")
        )
        assert df.first().j == pytest.approx(2 / 4)


class TestSimHash:
    def test_identical_same_hash_small_edit_small_distance(self, spark):
        near = BASE.replace("lazy", "sleepy")
        far = "totally unrelated words about columnar execution engines and arrow buffers everywhere"
        df = docs_df(spark, [BASE, BASE, near, far])
        rows = dedup.simhash_fingerprints(df).orderBy("doc_id").collect()
        assert rows[0].simhash == rows[1].simhash
        assert rows[0].bucket_size >= 2
        # one-token edit flips few (here: zero) of 16 bits ...
        assert bin(rows[0].simhash ^ rows[2].simhash).count("1") <= 4
        # ... while unrelated content lands far away
        assert bin(rows[0].simhash ^ rows[3].simhash).count("1") >= 4

    def test_range(self, spark):
        df = docs_df(spark, [BASE])
        h = dedup.simhash_fingerprints(df).first().simhash
        assert 0 <= h < 2**16


class TestFingerprint:
    def test_stable_and_content_defined(self, spark):
        df = docs_df(spark, [BASE, BASE, "other words entirely here now"])
        rows = dedup.fingerprint_anchors(df).orderBy("doc_id").collect()
        assert rows[0].fingerprint == rows[1].fingerprint
        assert rows[0].fingerprint != rows[2].fingerprint
        assert len(rows[0].anchors.split(",")) == 4


class TestLanguageId:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("the cat sat on the mat and it is happy", "en"),
            ("der Hund ist nicht mit der Katze und das ist gut", "de"),
            ("el perro es grande y la casa de los gatos", "es"),
            ("le chien est dans les jardins pour une promenade", "fr"),
        ],
    )
    def test_real_sentences(self, spark, text, expected):
        df = docs_df(spark, [text])
        pred = df.select(textops.language_id(tokens(F.col("text"))).alias("p")).first().p
        assert pred == expected

    def test_tie_breaks_to_order(self, spark):
        df = docs_df(spark, ["xyzzy plugh"])  # zero hits everywhere
        pred = df.select(textops.language_id(tokens(F.col("text"))).alias("p")).first().p
        assert pred == "en"


class TestQualityAndTokens:
    def test_quality_components(self, spark):
        df = docs_df(spark, ["the cat!! sat?? on,, the mat"])
        cols = textops.quality_columns(F.col("text"))
        row = df.select(*[c.alias(n) for n, c in cols.items()]).first()
        assert row.n_tokens == 6
        assert row.punct_ratio == pytest.approx(6 / 28)
        assert row.stopword_ratio == pytest.approx(2 / 6)
        assert 0.0 <= row.quality_score <= 1.0

    def test_bpe_ish_counts(self, spark):
        df = docs_df(spark, ["hello world42!"])
        n = df.select(textops.bpe_ish_token_count(F.col("text")).alias("n")).first().n
        assert n == 4  # hello, world, 42, !

    def test_per_doc_token_measures(self, spark):
        # the former token_counts driver query's per-doc grain (merged
        # into text_stats' per-lang sums in r6) stays pinned here
        df = docs_df(spark, ["the cat sat", "hello world42!"])
        rows = df.select(
            F.size(tokens(F.col("text"))).alias("ws"),
            textops.bpe_ish_token_count(F.col("text")).alias("bpe"),
            F.length("text").alias("chars"),
        ).collect()
        assert [(r.ws, r.bpe, r.chars) for r in rows] == [(3, 3, 11), (2, 4, 14)]

    def test_corpus_stats_include_bpe_single_scan(self, spark):
        df = docs_df(spark, ["the cat sat", "hello world42!"]).withColumn(
            "lang", F.lit("en")
        )
        out = textops.corpus_stats(df, "text", "lang", include_bpe=True)
        row = out.first()
        assert row.total_bpe_tokens == 7
        assert row.avg_bpe_tokens == pytest.approx(3.5)
        # single-scan shape: exactly one aggregate pair, no join
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_corpus_stats_approx_median_dial(self, spark):
        """The very-large-group dial: approx_median=True keeps the schema
        and lands within GK-sketch tolerance of the exact median (exact
        equality at this tiny n — the sketch is lossless until its
        accuracy bound), still in one scan."""
        texts = ["x " * n for n in range(1, 40)]
        df = docs_df(spark, texts).withColumn("lang", F.lit("en"))
        exact = textops.corpus_stats(df, "text", "lang")
        approx = textops.corpus_stats(df, "text", "lang", approx_median=True)
        assert exact.schema == approx.schema
        e, a = exact.first(), approx.first()
        assert abs(a.median_chars - e.median_chars) <= 2
        assert a.n_docs == e.n_docs and a.total_chars == e.total_chars
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestSimilarity:
    def vectors_df(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )

    def test_cosine_identities(self, spark):
        df = self.vectors_df(spark, [[1, 0, 0], [1, 0, 0]])
        a = df.where("vec_id=0").select(F.col("embedding").alias("a"))
        b = df.where("vec_id=1").select(F.col("embedding").alias("b"))
        row = a.crossJoin(b).select(
            similarity.cosine(F.col("a"), F.col("b")).alias("c")
        ).first()
        assert row.c == pytest.approx(1.0)

    def test_exact_topk_finds_planted_neighbor(self, spark):
        base = [1.0, 2.0, -1.0, 0.5]
        near = [1.01, 2.0, -1.0, 0.5]
        ortho = [-2.0, 1.0, 0.0, 0.0]
        anti = [-1.0, -2.0, 1.0, -0.5]
        df = self.vectors_df(spark, [base, near, ortho, anti])
        out = similarity.exact_topk(
            df.where("vec_id = 0"), df.where("vec_id > 0"), k=3
        ).collect()
        assert [r.vec_id for r in out] == [1, 2, 3]
        assert out[0].cosine > 0.999
        assert out[2].cosine == pytest.approx(-1.0)

    def test_lsh_near_dup_finds_duplicate_vector(self, spark):
        import random

        rng = random.Random(7)
        vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(20)]
        vecs.append(list(vecs[0]))  # exact duplicate of vec 0 -> id 20
        df = self.vectors_df(spark, vecs)
        pairs = similarity.lsh_near_dup_pairs(df, threshold=0.99).collect()
        assert (0, 20) in [(p.id_a, p.id_b) for p in pairs]

    def test_bucket_cap_inert_when_buckets_fit(self, spark):
        """Buckets at or under the cap must yield byte-identical pairs
        to the uncapped form — the guard engages only on overflow."""
        import random

        rng = random.Random(11)
        vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(30)]
        vecs.append(list(vecs[3]))
        df = self.vectors_df(spark, vecs)
        unc = sorted(
            (r.id_a, r.id_b)
            for r in similarity.lsh_near_dup_pairs(df, threshold=0.9).collect()
        )
        cap = sorted(
            (r.id_a, r.id_b)
            for r in similarity.lsh_near_dup_pairs(
                df, threshold=0.9, bucket_cap=1000
            ).collect()
        )
        assert cap == unc

    def test_bucket_cap_bounds_candidates_on_density_peak(self, spark):
        """A density peak (60 near-identical vectors, all landing in the
        same bucket of every table) must split under the cap: emitted
        pairs are a SUBSET of the uncapped pairs and per-sub-bucket pair
        work is bounded — the uncapped peak yields the full quadratic
        pair set, the capped form strictly fewer."""
        import random

        rng = random.Random(13)
        base = [rng.gauss(0, 1) for _ in range(64)]
        vecs = [
            [v + rng.gauss(0, 1e-4) for v in base] for _ in range(60)
        ]  # one hot bucket everywhere
        df = self.vectors_df(spark, vecs)
        unc = set(
            (r.id_a, r.id_b)
            for r in similarity.lsh_near_dup_pairs(df, threshold=0.99).collect()
        )
        assert len(unc) == 60 * 59 // 2  # the quadratic peak, all dups
        capped = set(
            (r.id_a, r.id_b)
            for r in similarity.lsh_near_dup_pairs(
                df, threshold=0.99, bucket_cap=15
            ).collect()
        )
        assert capped and capped < unc
        # bound: each table splits 60 into ceil(60/15)=4 sub-buckets;
        # worst case (identical split in all 4 tables, md5 is shared) is
        # sum over sub-buckets of s*(s-1)/2 <= C(60,2); expected scale is
        # ~1/4 of the peak. Assert the work actually shrank by >= 2x.
        assert len(capped) * 2 <= len(unc)

    def test_bucket_cap_rejects_nonpositive(self, spark):
        df = self.vectors_df(spark, [[1.0] * 64])
        with pytest.raises(ValueError, match="bucket_cap"):
            similarity.lsh_near_dup_pairs(df, threshold=0.5, bucket_cap=0)

    def test_hyperplanes_deterministic(self):
        a = similarity.hyperplanes(2, 8)
        b = similarity.hyperplanes(2, 8)
        assert a == b
        assert all(-1.0 <= v < 1.0 for row in a for v in row)


class TestMultimodal:
    def test_byte_stats_match_python(self, spark):
        df = multimodal.with_payload(docs_df(spark, ["abc", "aaa", "hello world"]))
        rows = {r.doc_id: r for r in multimodal.byte_stats(df).collect()}
        for i, text in enumerate(["abc", "aaa", "hello world"]):
            raw = text.encode()
            assert rows[i].n_bytes == len(raw)
            assert rows[i].byte_sum == sum(raw)
            assert rows[i].n_unique_bytes == len(set(raw))
            assert rows[i].head_hex == raw[:8].hex()

    def test_decode_image_unknown_format_raises(self, spark):
        # non-image payloads still fail loudly (text is neither PPM nor BMP)
        df = multimodal.with_payload(docs_df(spark, ["x"]))
        with pytest.raises(Exception) as exc_info:
            multimodal.decode_image(df).collect()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )

    def test_decode_checked_in_ppm_fixture(self, spark):
        """r6: the default decode path is a REAL dependency-free PPM/BMP
        decoder — drive it end-to-end through mapInPandas on the
        checked-in fixture image."""
        import os

        fixture = os.path.join(
            os.path.dirname(__file__), "fixtures", "gradient_4x2.ppm"
        )
        with open(fixture, "rb") as f:
            payload = f.read()
        df = spark.createDataFrame(
            [(0, bytearray(payload))], "doc_id long, payload binary"
        )
        row = multimodal.decode_image(df).collect()[0]
        assert (row.width, row.height) == (4, 2)
        assert row.mean_luma == pytest.approx(130.335625)

    def test_decode_bmp_bytes(self):
        """Pure-python check of the BMP branch: hand-built 2x2 24-bit
        uncompressed BMP (4-byte row padding, bottom-up, BGR order)."""
        import struct

        # rows bottom-up: file row 0 = image bottom row
        bottom = bytes([0, 0, 255, 255, 255, 255]) + b"\x00\x00"  # red, white + pad
        top = bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"  # blue, green + pad
        raster = bottom + top
        pix_off = 14 + 40
        header = struct.pack(
            "<2sIHHI", b"BM", pix_off + len(raster), 0, 0, pix_off
        ) + struct.pack(
            "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 2835, 2835, 0, 0
        )
        w, h, luma = multimodal.decode_basic_image(header + raster)
        assert (w, h) == (2, 2)
        expected = (
            0.299 * 255  # red
            + (0.299 + 0.587 + 0.114) * 255  # white
            + 0.114 * 255  # blue
            + 0.587 * 255  # green
        ) / 4.0
        assert luma == pytest.approx(expected)

    @staticmethod
    def _png(w, h, nch, color_type, rows):
        """Hand-assembled PNG: IHDR/IDAT/IEND with real CRCs, stdlib
        zlib deflate. ``rows`` = list of (filter_type, filtered_bytes)
        — filtering is done BY THE TEST per the spec, so the decoder's
        unfilter logic is what's exercised."""
        import struct
        import zlib

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body))
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(bytes([ft]) + fb for ft, fb in rows)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def test_decode_png_rgb_all_simple_filters(self):
        """r18: the PNG branch — 3x2 RGB raster filtered with None /
        Sub / Up across rows (hand-filtered per spec §6); the decoder
        must reconstruct the exact raster (checked via mean luma
        computed independently from the intended pixels)."""
        import numpy as np

        px = np.array(
            [
                [[10, 20, 30], [60, 40, 20], [200, 100, 0]],
                [[15, 25, 35], [65, 45, 25], [205, 105, 5]],
            ],
            dtype=np.int32,
        )
        # row 0: filter 1 (Sub) — filtered[x] = raw[x] - raw[x-3]
        r0 = px[0].reshape(-1)
        f0 = (
            ((r0 - np.concatenate([[0, 0, 0], r0[:-3]])) & 0xFF)
            .astype(np.uint8)
            .tobytes()
        )
        # row 1: filter 2 (Up) — filtered[x] = raw[x] - above[x]
        f1 = ((px[1].reshape(-1) - r0) & 0xFF).astype(np.uint8).tobytes()
        data = self._png(3, 2, 3, 2, [(1, f0), (2, f1)])
        w, h, luma = multimodal.decode_basic_image(data)
        assert (w, h) == (3, 2)
        exp = (
            px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114
        ).mean()
        assert luma == pytest.approx(float(exp))

    def test_decode_png_gray_average_and_paeth(self):
        """Grayscale rows filtered with Average (3) and Paeth (4) —
        the left-dependent fold branch."""
        import numpy as np

        top = np.array([8, 250, 13, 77], dtype=np.int32)
        bot = np.array([100, 3, 255, 40], dtype=np.int32)
        # row 0 Average: pred = (left + 0)//2
        f0, left = [], 0
        for v in top:
            f0.append((int(v) - (left >> 1)) & 0xFF)
            left = int(v)
        # row 1 Paeth: pred = paeth(left, above, upper-left)
        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

        f1 = []
        for x, v in enumerate(bot):
            a = int(bot[x - 1]) if x else 0
            c = int(top[x - 1]) if x else 0
            f1.append((int(v) - paeth(a, int(top[x]), c)) & 0xFF)
        data = self._png(4, 2, 1, 0, [(3, bytes(f0)), (4, bytes(f1))])
        w, h, luma = multimodal.decode_basic_image(data)
        assert (w, h) == (4, 2)
        assert luma == pytest.approx(float(np.concatenate([top, bot]).mean()))

    def test_decode_png_unsupported_shapes_raise(self):
        import struct
        import zlib

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body))
            )

        # 16-bit depth refused with the reason
        ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
        bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        with pytest.raises(NotImplementedError, match="bit depth"):
            multimodal.decode_basic_image(bad)
        # interlaced refused
        ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
        bad_i = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_i)
        with pytest.raises(NotImplementedError, match="interlaced"):
            multimodal.decode_basic_image(bad_i)

    def test_decode_png_end_to_end(self, spark):
        """Drive the PNG path through mapInPandas beside PPM — one
        decode stage, mixed formats in one batch."""
        import numpy as np

        px = np.full((2, 2, 3), 120, dtype=np.int32)
        raw_row = (px[0].reshape(-1) & 0xFF).astype(np.uint8).tobytes()
        png = self._png(2, 2, 3, 2, [(0, raw_row), (0, raw_row)])
        ppm = b"P6\n2 1\n255\n" + bytes([120] * 6)
        df = spark.createDataFrame(
            [(0, bytearray(png)), (1, bytearray(ppm))],
            "doc_id long, payload binary",
        )
        rows = {r.doc_id: r for r in multimodal.decode_image(df).collect()}
        assert (rows[0].width, rows[0].height) == (2, 2)
        assert rows[0].mean_luma == pytest.approx(120.0)
        assert rows[1].mean_luma == pytest.approx(120.0)

    @staticmethod
    def _wav(pcm: bytes, n_channels: int, rate: int, bits: int, extra_chunk=True):
        """Canonical RIFF/WAVE bytes; optionally inserts a LIST chunk
        between fmt and data (real encoders do — the walker must skip)."""
        import struct

        block = n_channels * bits // 8
        fmt = struct.pack(
            "<HHIIHH", 1, n_channels, rate, rate * block, block, bits
        )
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if extra_chunk:
            meta = b"INFOsoft"  # odd-sized body exercises word alignment
            chunks += b"LIST" + struct.pack("<I", len(meta) + 1) + meta + b"\x00" + b"\x00"
        chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def test_decode_wav_pcm16_stereo_square_wave(self):
        """±A square wave has RMS exactly A (after [-1,1] normalization);
        stereo interleave and the interposed LIST chunk must not move it."""
        import struct

        amp = 8192  # 0.25 of full scale
        frames = [(amp, -amp), (-amp, amp)] * 50
        pcm = b"".join(struct.pack("<hh", l, r) for l, r in frames)
        n_ch, rate, n_samples, rms = multimodal.decode_basic_audio(
            self._wav(pcm, 2, 44100, 16)
        )
        assert (n_ch, rate, n_samples) == (2, 44100, 100)
        assert rms == pytest.approx(amp / 32768.0)

    def test_decode_wav_pcm8_unsigned_midpoint(self):
        # constant 128 is digital silence in unsigned 8-bit
        pcm = bytes([128] * 64)
        n_ch, rate, n_samples, rms = multimodal.decode_basic_audio(
            self._wav(pcm, 1, 8000, 8, extra_chunk=False)
        )
        assert (n_ch, rate, n_samples, rms) == (1, 8000, 64, 0.0)

    def test_decode_audio_non_wav_raises(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_basic_audio(b"ID3\x04not a wav")

    def test_decode_audio_end_to_end(self, spark):
        """Drive the default RIFF/WAVE path through mapInPandas."""
        import struct

        pcm = b"".join(struct.pack("<h", v) for v in [16384, -16384] * 10)
        payload = self._wav(pcm, 1, 16000, 16)
        df = spark.createDataFrame(
            [(7, bytearray(payload))], "doc_id long, payload binary"
        )
        row = multimodal.decode_audio(df).collect()[0]
        assert (row.doc_id, row.n_channels, row.sample_rate, row.n_samples) == (
            7, 1, 16000, 20,
        )
        assert row.rms == pytest.approx(0.5)

    def test_decode_image_with_injected_decoder(self, spark):
        df = multimodal.with_payload(docs_df(spark, ["abcd", "xy"]))

        def fake_decoder(b: bytes):
            return (len(b), 2, float(b[0]) / 255.0)

        rows = {
            r.doc_id: r
            for r in multimodal.decode_image(df, decoder=fake_decoder).collect()
        }
        assert rows[0].width == 4 and rows[0].height == 2
        assert rows[0].mean_luma == pytest.approx(ord("a") / 255.0)
        assert rows[1].width == 2


class TestNgramJaccard:
    def test_char_ngrams_basic(self, spark):
        from homelogging_spark.functions.texthash import char_ngrams

        df = spark.createDataFrame([("abcd",), ("ab",)], "t string")
        rows = df.select(char_ngrams("t", 3, distinct=False).alias("g")).collect()
        assert rows[0].g == ["abc", "bcd"]
        assert rows[1].g == ["ab"]  # shorter than n -> whole text

    def test_near_identical_docs_pair_found(self, spark):
        from homelogging_spark.operators.dedup import ngram_jaccard_pairs

        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = a.replace("today", "tonight")
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, "completely different words entirely here")],
            "doc_id long, text string",
        )
        out = ngram_jaccard_pairs(df, threshold=0.5).collect()
        assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]
        assert out[0].ngram_jaccard > 0.7


class TestClustering:
    def pairs_df(self, spark, pairs):
        return spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def test_chain_graph_single_component(self, spark):
        # 1-2, 2-3, 3-4: diameter-3 chain -> one cluster labeled 1
        from homelogging_spark.operators.clustering import connected_components

        cc = connected_components(
            self.pairs_df(spark, [(1, 2), (2, 3), (3, 4)]),
            src="doc_a",
            dst="doc_b",
        ).collect()
        assert {(r.node, r.cluster_id) for r in cc} == {
            (1, 1), (2, 1), (3, 1), (4, 1)
        }

    def test_two_disjoint_cliques(self, spark):
        from homelogging_spark.operators.clustering import connected_components

        edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
        cc = connected_components(
            self.pairs_df(spark, edges), src="doc_a", dst="doc_b"
        ).collect()
        labels = {r.node: r.cluster_id for r in cc}
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_convergence_bound_enforced(self, spark):
        # A diameter-3 chain cannot converge in 1 iteration; the operator
        # must fail loudly rather than return a non-fixed-point labeling.
        from homelogging_spark.operators.clustering import connected_components

        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                self.pairs_df(spark, [(1, 2), (2, 3), (3, 4)]),
                src="doc_a",
                dst="doc_b",
                max_iters=1,
            ).collect()

    def test_assign_clusters_with_singletons(self, spark):
        from homelogging_spark.operators.clustering import assign_dedup_clusters

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
        )
        pairs = self.pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
        out = assign_dedup_clusters(docs, pairs).collect()
        got = {r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical) for r in out}
        assert got == {
            0: (0, 3, True),
            1: (0, 3, False),
            2: (0, 3, False),
            3: (3, 1, True),  # singleton: its own cluster
            4: (4, 2, True),
            5: (4, 2, False),
        }


class TestKmeansLite:
    def test_deterministic_and_shaped(self, spark):
        from homelogging_spark.operators.similarity import kmeans_lite_centroids

        rows = [
            (i, [1.0 + 0.01 * i] * 4) for i in range(0, 32, 2)
        ] + [(i, [-1.0 - 0.01 * i] * 4) for i in range(1, 32, 2)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = kmeans_lite_centroids(df, n_centroids=2, n_iters=2, dim=4, sample_mod=None)
        b = kmeans_lite_centroids(df, n_centroids=2, n_iters=2, dim=4, sample_mod=None)
        ra, rb = sorted(a.collect()), sorted(b.collect())
        assert len(ra) == 2 and all(len(r.embedding) == 4 for r in ra)
        assert ra == rb  # bit-for-bit deterministic across builds

    def test_centroids_separate_planted_clusters(self, spark):
        from homelogging_spark.operators.similarity import (
            ivf_assign,
            kmeans_lite_centroids,
        )

        # two tight opposite-sign clusters -> after Lloyd steps, assignment
        # by cosine must split them cleanly
        rows = [(i, [1.0, 1.0, 0.9 + 0.001 * i, 1.1]) for i in range(20)] + [
            (i, [-1.0, -1.0, -0.9 - 0.001 * i, -1.1]) for i in range(20, 40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_lite_centroids(df, n_centroids=2, n_iters=2, dim=4, sample_mod=None)
        assigned = ivf_assign(df, cents, 1).collect()
        by_cluster = {}
        for r in assigned:
            by_cluster.setdefault(r.centroid_id, set()).add(r.vec_id)
        assert sorted(len(v) for v in by_cluster.values()) == [20, 20]
        assert set(range(20)) in by_cluster.values()

    def test_partial_mean_fold_matches_assignments(self, spark):
        """exact_fold=False (the 100 TB dial: tree-aggregated per-dim
        avg, no per-cell member list) gives up bit-for-bit oracle replay
        but must produce the SAME cluster structure on separated data —
        identical assignments, centroids equal to ~1e-12."""
        from homelogging_spark.operators.similarity import (
            ivf_assign,
            kmeans_lite_centroids,
        )

        rows = [(i, [1.0, 1.0, 0.9 + 0.001 * i, 1.1]) for i in range(20)] + [
            (i, [-1.0, -1.0, -0.9 - 0.001 * i, -1.1]) for i in range(20, 40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        exact = kmeans_lite_centroids(
            df, n_centroids=2, n_iters=2, dim=4, sample_mod=None
        )
        approx = kmeans_lite_centroids(
            df, n_centroids=2, n_iters=2, dim=4, sample_mod=None, exact_fold=False
        )
        ce = {r.vec_id: r.embedding for r in exact.collect()}
        ca = {r.vec_id: r.embedding for r in approx.collect()}
        assert set(ce) == set(ca)
        for cid in ce:
            for a, b in zip(ce[cid], ca[cid]):
                assert abs(a - b) < 1e-9, (cid, ce[cid], ca[cid])
        ae = sorted((r.vec_id, r.centroid_id) for r in ivf_assign(df, exact, 1).collect())
        aa = sorted((r.vec_id, r.centroid_id) for r in ivf_assign(df, approx, 1).collect())
        assert ae == aa


class TestRefreshCentroids:
    def _corpus(self, spark, n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(4)),
                lambda i: (F.col("id") % 7 + i).cast("double"),
            ).alias("embedding"),
        )

    def test_k_tracks_corpus_size(self, spark):
        """The maintenance op's whole point: K = clamp(ceil(N / target),
        k_min, k_max), so a 10x corpus gets a 10x quantizer — constant
        mean cell occupancy instead of the fixed-K penalty."""
        from homelogging_spark.operators.similarity import refresh_centroids

        small = refresh_centroids(
            self._corpus(spark, 100),
            target_cell_rows=25,
            k_min=2,
            dim=4,
            sample_mod=None,
        )
        big = refresh_centroids(
            self._corpus(spark, 1_000),
            target_cell_rows=25,
            k_min=2,
            dim=4,
            sample_mod=None,
        )
        assert small.count() == 4  # ceil(100/25)
        assert big.count() == 40  # ceil(1000/25): K grew 10x with N
        # clamps
        from homelogging_spark.operators.similarity import kmeans_lite_centroids

        floor = refresh_centroids(
            self._corpus(spark, 10), target_cell_rows=25, k_min=8, dim=4,
            sample_mod=None,
        )
        assert floor.count() == 8
        cap = refresh_centroids(
            self._corpus(spark, 100), target_cell_rows=1, k_min=2, k_max=16,
            dim=4, sample_mod=None,
        )
        assert cap.count() == 16
        # equivalence: refresh at the derived K IS the deterministic
        # trainer at that K (same seeds, same folds)
        direct = kmeans_lite_centroids(
            self._corpus(spark, 100), n_centroids=4, n_iters=2, dim=4,
            sample_mod=None,
        )
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, direct.collect())
        )


class TestCapObservability:
    def test_split_metrics_ride_the_consumer_action(self, spark):
        """'No silent caps' (r13): with observe_caps=True the guarded
        operator attaches an Observation to its splits census — metrics
        (buckets, buckets_split, max split factor) ride the consumer's
        own action, zero extra jobs, rows unchanged."""
        from homelogging_spark.functions import capstats
        from homelogging_spark.operators.similarity import (
            kmeans_lite_centroids,
            semantic_dedup,
        )

        # one dense cell (30 near-identical vectors) + one tiny cell:
        # cell_cap=8 must split the dense cell into ceil(30/8)=4 subcells
        rows = [(i, [1.0, 1.0, 0.5 + 1e-4 * i, 1.0]) for i in range(30)] + [
            (100 + i, [-1.0, -1.0, -0.5, -1.0]) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_lite_centroids(
            df, n_centroids=2, n_iters=2, dim=4, sample_mod=None
        )
        out = semantic_dedup(
            df, cents, threshold=0.999, cell_cap=8, observe_caps=True
        )
        plain = semantic_dedup(df, cents, threshold=0.999, cell_cap=8)
        assert capstats.pending_cap_observations() == 1
        got = out.collect()  # the consumer action
        stats = capstats.drain_cap_stats()
        assert [s["guard"] for s in stats] == ["cell_cap"]
        s = stats[0]
        assert s["buckets"] == 2
        assert s["buckets_split"] == 1
        assert s["max_splits"] == 4  # ceil(30/8)
        assert capstats.pending_cap_observations() == 0
        # rows unchanged by observation
        assert sorted(map(tuple, got)) == sorted(map(tuple, plain.collect()))

    def test_pending_queue_is_thread_scoped(self, spark):
        """foreachBatch bodies run on stream-execution threads: two
        concurrent contexts must each drain only their OWN observations
        (r13 ADVICE — the process-global queue cross-drained them)."""
        import threading

        from homelogging_spark.functions import capstats
        from homelogging_spark.functions.capstats import observe_cap_splits

        def attach_and_drain(tag: str, results: dict) -> None:
            splits = spark.createDataFrame(
                [(tag, 2)], "bucket string, _n_splits int"
            )
            observed = observe_cap_splits(splits, f"guard_{tag}")
            results[f"{tag}_pending"] = capstats.pending_cap_observations()
            observed.count()
            results[tag] = capstats.drain_cap_stats(timeout_s=30)

        results: dict = {}
        t = threading.Thread(target=attach_and_drain, args=("worker", results))
        # main thread attaches FIRST, drains AFTER the worker finished —
        # with a shared queue the worker would have stolen main's entry
        splits = spark.createDataFrame([("m", 3)], "bucket string, _n_splits int")
        observed = observe_cap_splits(splits, "guard_main")
        t.start()
        t.join()
        observed.count()
        main_stats = capstats.drain_cap_stats(timeout_s=30)
        assert results["worker_pending"] == 1  # never saw main's entry
        assert [s["guard"] for s in results["worker"]] == ["guard_worker"]
        assert [s["guard"] for s in main_stats] == ["guard_main"]
        assert main_stats[0]["max_splits"] == 3
        assert capstats.pending_cap_observations() == 0

    def test_unexecuted_observation_times_out_instead_of_hanging(self, spark):
        """A caller that errors between attach and action must not hang
        the drain: with timeout_s the dead observation is dropped and
        reported, and later observations still drain."""
        from homelogging_spark.functions import capstats
        from homelogging_spark.functions.capstats import observe_cap_splits

        never_run = observe_cap_splits(
            spark.createDataFrame([("a", 1)], "bucket string, _n_splits int"),
            "dead_guard",
        )
        ran = observe_cap_splits(
            spark.createDataFrame([("b", 5)], "bucket string, _n_splits int"),
            "live_guard",
        )
        ran.count()
        del never_run  # plan never executed
        stats = capstats.drain_cap_stats(timeout_s=0.5)
        assert [s["guard"] for s in stats] == ["dead_guard", "live_guard"]
        assert stats[0] == {"guard": "dead_guard", "timed_out": True}
        assert stats[1]["max_splits"] == 5
        assert capstats.pending_cap_observations() == 0

    def _enqueue(self, guard, obs):
        import threading

        from homelogging_spark.functions import capstats

        with capstats._LOCK:
            capstats._PENDING.setdefault(threading.get_ident(), []).append(
                (guard, obs, capstats._METRIC_NAMES)
            )

    def test_drain_is_fail_open(self):
        """r15 pin (r14 verdict #1): a metrics failure must surface as
        an 'error' row, NEVER as an exception — inside foreachBatch a
        drain exception terminates the whole stream."""
        from homelogging_spark.functions import capstats

        class BrokenObs:
            _jo = None  # no JVM probe -> blocking-get path

            @property
            def get(self):
                raise RuntimeError("pickler exploded")

        self._enqueue("boom_guard", BrokenObs())
        stats = capstats.drain_cap_stats()  # no timeout: worst case
        assert stats == [
            {"guard": "boom_guard", "error": "RuntimeError('pickler exploded')"}
        ]
        assert capstats.pending_cap_observations() == 0

    def test_pruned_completion_is_classified(self):
        """When the ObservationManager completes with Row.empty (AQE
        empty-relation propagation dropped the executed census stage),
        the drain reports 'pruned' — not a guard-only row, not a hang,
        and never the r14 toPyRow crash."""
        from homelogging_spark.functions import capstats

        class FakeRow:
            def length(self):
                return 0

        class FakeOpt:
            def isEmpty(self):
                return False

            def get(self):
                return FakeRow()

        class FakeJo:
            def getRowOrEmpty(self):
                return FakeOpt()

        class PrunedObs:
            _jo = FakeJo()

        self._enqueue("pruned_guard", PrunedObs())
        stats = capstats.drain_cap_stats(timeout_s=5)
        assert stats == [{"guard": "pruned_guard", "pruned": True}]

    def test_unavailable_probe_with_timeout_attempts_bounded_delivery(self):
        """r14 ADVICE (capstats.py:120) + r15 ADVICE (capstats.py:303):
        when there is no usable py4j readiness probe (Spark Connect, or
        an erroring JVM surface) the timeout path must still ATTEMPT
        delivery — Observation.get on a daemon thread joined to the
        deadline — so metrics the session can deliver are delivered,
        while a get that never returns still cannot hang the drain."""
        import time as _time

        from homelogging_spark.functions import capstats

        class ErrJo:
            def getRowOrEmpty(self):
                raise OSError("connection torn down")

        class QuickObs:  # get returns promptly -> metrics delivered
            _jo = ErrJo()

            @property
            def get(self):
                return {"buckets": 3, "buckets_split": 1, "max_splits": 2}

        class StuckObs:  # get never returns -> bounded timed_out
            _jo = ErrJo()

            @property
            def get(self):
                _time.sleep(60)
                return {}

        self._enqueue("quick_guard", QuickObs())
        stats = capstats.drain_cap_stats(timeout_s=5)
        assert stats == [
            {
                "guard": "quick_guard",
                "buckets": 3,
                "buckets_split": 1,
                "max_splits": 2,
            }
        ]
        self._enqueue("stuck_guard", StuckObs())
        t0 = _time.monotonic()
        stats = capstats.drain_cap_stats(timeout_s=0.5)
        assert _time.monotonic() - t0 < 5  # bounded despite the stuck get
        assert stats == [{"guard": "stuck_guard", "timed_out": True}]

    def test_discard_clears_pending_without_blocking(self, spark):
        """Failure-path hygiene (r14 ADVICE pipeline.py:490): a caller
        that errored between attach and action clears its queue with
        discard_cap_stats — no timeout burned, nothing leaks to a
        future thread that inherits this thread ident."""
        from homelogging_spark.functions import capstats
        from homelogging_spark.functions.capstats import observe_cap_splits

        observe_cap_splits(
            spark.createDataFrame([("a", 1)], "bucket string, _n_splits int"),
            "abandoned_guard",
        )
        assert capstats.pending_cap_observations() == 1
        assert capstats.discard_cap_stats() == 1
        assert capstats.pending_cap_observations() == 0
        assert capstats.drain_cap_stats(timeout_s=1) == []

    def test_failed_batch_write_does_not_leak_observations(self, spark, tmp_path):
        """The foreachBatch writer's failure path: when the write action
        raises AFTER incremental_dedup attached the census, the pending
        entry is discarded with the exception propagating — CPython
        reuses thread idents, so a leaked entry would surface in (and
        time out) a later stream's drain."""
        import pytest as _pytest
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType

        from homelogging_spark.functions import capstats
        from homelogging_spark.streaming.pipeline import (
            incremental_dedup_batch_writer,
        )

        old = spark.createDataFrame(
            [(1, "retained text one"), (2, "retained text two")],
            "doc_id long, text string",
        )
        boom = F.udf(lambda s: (_ for _ in ()).throw(ValueError("boom")), StringType())
        batch = spark.createDataFrame(
            [(10, "x")], "doc_id long, text string"
        ).withColumn("text", boom("text"))
        writer = incremental_dedup_batch_writer(
            old, str(tmp_path / "out"), old_bucket_cap=1, observe_caps=True
        )
        with _pytest.raises(Exception):
            writer(batch, 0)
        assert capstats.pending_cap_observations() == 0

    def test_cap_observation_scope_excludes_and_restores(self, spark):
        """cap_observation_scope toggles only the AQE empty-relation
        rule and restores the previous conf exactly — including the
        previously-unset case."""
        from homelogging_spark.functions.capstats import (
            _EMPTY_PROP_RULE,
            _EXCLUDED_RULES_KEY,
            cap_observation_scope,
        )

        key = _EXCLUDED_RULES_KEY
        prev = spark.conf.get(key, None)
        try:
            spark.conf.unset(key)
            with cap_observation_scope(spark):
                assert _EMPTY_PROP_RULE in (spark.conf.get(key) or "")
            assert spark.conf.get(key, None) in (None, "<undefined>")
            spark.conf.set(key, "some.other.Rule")
            with cap_observation_scope(spark):
                got = spark.conf.get(key)
                assert "some.other.Rule" in got and _EMPTY_PROP_RULE in got
            assert spark.conf.get(key) == "some.other.Rule"
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def test_zero_candidate_consumer_delivers_census_under_scope(
        self, spark, tmp_path
    ):
        """The r15 fix end-to-end in batch form: a consumer whose
        candidate join is empty at runtime (all-novel snapshot) lets AQE
        drop the executed census stage — under cap_observation_scope the
        stage stays in the final plan and the census is delivered."""
        from homelogging_spark.functions import capstats
        from homelogging_spark.functions.capstats import cap_observation_scope
        from homelogging_spark.operators import dedup

        old = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog again"),
                (2, "the quick brown fox jumps over the lazy dog again"),
                (3, "completely different retained document about inverters"),
            ],
            "doc_id long, text string",
        )
        novel = spark.createDataFrame(
            [(10, "novel text one two three"), (11, "novel text four five six")],
            "doc_id long, text string",
        )
        with cap_observation_scope(spark):
            out = dedup.incremental_dedup(
                novel, old, old_bucket_cap=1, observe_caps=True
            )
            out.write.mode("overwrite").parquet(str(tmp_path / "scoped"))
            stats = capstats.drain_cap_stats(timeout_s=60)
        assert [s["guard"] for s in stats] == ["old_bucket_cap"]
        assert stats[0]["buckets"] >= 1
        assert stats[0]["max_splits"] >= 2  # the duplicate retained pair
        assert all(r.keep for r in spark.read.parquet(str(tmp_path / "scoped")).collect())


class TestFrameSample:
    def test_frames_and_sampling_rate(self, spark):
        import hashlib

        from homelogging_spark.operators import multimodal

        # 300 ASCII bytes -> 4 full 64-byte frames (idx 0..3), rate=2
        # samples frames 0 and 2; 40-byte doc emits nothing
        text = "".join(chr(65 + (i % 26)) for i in range(300))
        docs = spark.createDataFrame(
            [(1, text), (2, "x" * 40)], "doc_id long, text string"
        )
        out = multimodal.frame_sample(multimodal.with_payload(docs))
        rows = sorted(out.collect(), key=lambda r: r.frame_idx)
        assert [(r.doc_id, r.frame_idx, r.frame_off) for r in rows] == [
            (1, 0, 0), (1, 2, 128),
        ]
        payload = text.encode()
        assert rows[1].frame_md5 == hashlib.md5(payload[128:192]).hexdigest()


class TestCurriculumOrder:
    def test_ordering_invariants(self, spark):
        from homelogging_spark.plans.llm_registry import q_curriculum_order

        rows = q_curriculum_order(spark, "/root/testdata/sf0.001").collect()
        n = len(rows)
        assert n > 0
        # global_pos is a permutation of 1..N
        assert sorted(r.global_pos for r in rows) == list(range(1, n + 1))
        ordered = sorted(rows, key=lambda r: r.global_pos)
        # stages are contiguous and non-decreasing in the global order
        assert [r.stage for r in ordered] == sorted(r.stage for r in ordered)
        # within (stage, source) the interleave preserves quality rank
        from collections import defaultdict

        last = defaultdict(int)
        for r in ordered:
            assert r.pos_in_source == last[(r.stage, r.source)] + 1
            last[(r.stage, r.source)] += 1
        # ntile balance: stage sizes differ by at most 1
        sizes = defaultdict(int)
        for r in rows:
            sizes[r.stage] += 1
        assert max(sizes.values()) - min(sizes.values()) <= 1


class TestIndexCycleSearchPanel:
    """r20: the method-labeled served-search panel (the
    opq_index_search → index_cycle_search stale-stale consolidation
    funding the ivf_opq_search registration) must hash-match the
    two-leg union oracle at sf0.001 — the registered-query gate
    applied at unit level, exactly as the driver would run it."""

    def test_panel_matches_duckdb_twin(self, spark, sf_dir):
        import os

        import duckdb

        from homelogging_spark.plans.llm_registry import (
            ORACLE_INDEX_CYCLE_SEARCH,
            q_index_cycle_search,
        )
        from homelogging_spark.tables import TABLE_NAMES
        from tools.check_oracle import compare

        spark_pdf = q_index_cycle_search(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        duck_pdf = con.execute(ORACLE_INDEX_CYCLE_SEARCH).fetchdf()
        assert len(spark_pdf) > 0
        # both legs present with equal row counts (same Q·k shape)
        methods = spark_pdf.groupby("method").size().to_dict()
        assert set(methods) == {"ivf_pq", "opq"}
        assert methods["ivf_pq"] == methods["opq"]
        assert compare("index_cycle_search", spark_pdf, duck_pdf)

    def test_generation_artifact_set_includes_opq(self, spark, sf_dir):
        """The shared fixture generation now carries the OPQ trio, and
        the staleness gate rebuilds a root missing any of them."""
        import os

        from homelogging_spark.operators.maintenance import OPQ_ARTIFACTS
        from homelogging_spark.plans.llm_registry import _ivf_index_root

        root = _ivf_index_root(spark, sf_dir)
        for a in OPQ_ARTIFACTS:
            assert os.path.exists(os.path.join(root, a)), a


class TestBm25StateServed:
    """r17 runway: BM25 served from the stream-merged state generation
    must hash-match the plain recomputing BM25 SQL at sf0.001 — the
    driver gate run at unit level (registration candidate next round)."""

    def test_served_matches_recomputing_oracle(self, spark, sf_dir):
        import os

        import duckdb

        from homelogging_spark.plans.llm_registry import (
            ORACLE_BM25_STATE_SERVED,
            q_bm25_state_served,
        )
        from homelogging_spark.tables import TABLE_NAMES
        from tools.check_oracle import compare

        spark_pdf = q_bm25_state_served(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        duck_pdf = con.execute(ORACLE_BM25_STATE_SERVED).fetchdf()
        assert len(spark_pdf) > 0
        assert compare("bm25_state_served", spark_pdf, duck_pdf)


class TestOpqLearnedSearch:
    """r18 runway: learned-rotation OPQ under the config-frozen matrix
    must hash-match its DuckDB twin at sf0.001 — the driver gate at
    unit level (registration candidate for a funded r19/r20 slot)."""

    def test_rotation_config_is_orthogonal_and_audited(self):
        import numpy as np

        from homelogging_spark.operators.opq_rotations import (
            rotation_audit,
            rotation_for,
        )

        r = np.asarray(rotation_for())
        assert r.shape == (64, 64)
        assert np.max(np.abs(r.T @ r - np.eye(64))) < 1e-9
        a = rotation_audit()
        assert a["dim"] == 64 and len(a["digest"]) == 32
        with pytest.raises(ValueError, match="unknown OPQ rotation"):
            rotation_for(99)

    def test_matrix_rotation_twins_bit_equal(self, spark):
        """rotate_by_matrix vs its DuckDB twin: BIT-equal (the whole
        oracle chain hangs on it), and both equal numpy x @ R to
        fp-rounding."""
        import duckdb
        import numpy as np

        from homelogging_spark.operators import similarity as S
        from homelogging_spark.operators.opq_rotations import rotation_for

        r = rotation_for()
        import random

        rng = random.Random(5)
        vecs = [
            [round(rng.gauss(0, 1), 3) for _ in range(64)] for _ in range(4)
        ]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            row.vec_id: list(row.r)
            for row in df.select(
                "vec_id", S.rotate_by_matrix(F.col("embedding"), r).alias("r")
            ).collect()
        }
        vals = ", ".join(
            "(%d, [%s])" % (i, ",".join(repr(float(x)) for x in v))
            for i, v in enumerate(vecs)
        )
        sql = S.rotate_by_matrix_sql(
            f"SELECT vec_id, embedding FROM (VALUES {vals}) t(vec_id, embedding)",
            r,
        )
        duck = {row[0]: row[1] for row in duckdb.sql(sql).fetchall()}
        assert duck == got  # bit-equal
        ref = np.asarray(vecs) @ np.asarray(r)
        for i in range(4):
            assert np.max(np.abs(np.asarray(got[i]) - ref[i])) < 1e-9

    def test_matches_duckdb_twin(self, spark, sf_dir):
        import os

        import duckdb

        from homelogging_spark.plans.llm_registry import (
            ORACLE_OPQ_LEARNED_SEARCH,
            q_opq_learned_search,
        )
        from homelogging_spark.tables import TABLE_NAMES
        from tools.check_oracle import compare

        spark_pdf = q_opq_learned_search(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        duck_pdf = con.execute(ORACLE_OPQ_LEARNED_SEARCH).fetchdf()
        assert len(spark_pdf) > 0
        assert compare("opq_learned_search", spark_pdf, duck_pdf)


class TestIvfOpqSearch:
    """r19 stretch (r18 verdict #8): the IVF-OPQ composition served
    from ONE committed learned-rotation generation must hash-match its
    DuckDB coarse-prune + rotated-ADC twin — the driver gate run at
    unit level (registration candidate for an r20 funded slot)."""

    def test_matches_duckdb_twin(self, spark, sf_dir):
        import os

        import duckdb

        from homelogging_spark.plans.llm_registry import (
            ORACLE_IVF_OPQ_SEARCH,
            q_ivf_opq_search,
        )
        from homelogging_spark.tables import TABLE_NAMES
        from tools.check_oracle import compare

        spark_pdf = q_ivf_opq_search(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        duck_pdf = con.execute(ORACLE_IVF_OPQ_SEARCH).fetchdf()
        assert len(spark_pdf) > 0
        assert compare("ivf_opq_search", spark_pdf, duck_pdf)


class TestLmPerplexityFilter:
    """r18 runway: the CCNet-style bigram-perplexity filter must
    hash-match its DuckDB train→smooth→score→threshold twin at sf0.001
    — the driver gate run at unit level (registration candidate for
    the r19 free cap slot)."""

    def test_matches_duckdb_twin_and_both_verdicts_fire(self, spark, sf_dir):
        import os

        import duckdb

        from homelogging_spark.plans.llm_registry import (
            ORACLE_LM_PERPLEXITY_FILTER,
            q_lm_perplexity_filter,
        )
        from homelogging_spark.tables import TABLE_NAMES
        from tools.check_oracle import compare

        spark_pdf = q_lm_perplexity_filter(spark, sf_dir).toPandas()
        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        duck_pdf = con.execute(ORACLE_LM_PERPLEXITY_FILTER).fetchdf()
        assert len(spark_pdf) > 0
        assert compare("lm_perplexity_filter", spark_pdf, duck_pdf)
        # the threshold is not vacuous on the fixture: both verdicts fire
        assert set(spark_pdf["keep"].unique()) == {True, False}


class TestPqAdcTopk:
    """PQ asymmetric-distance search: ADC(q, v) must equal the L2 of q
    to v's codebook reconstruction EXACTLY (that is its definition),
    and the ranking must surface the planted nearest vector."""

    def _fixture(self, spark, dim=8, n=24, seed=11):
        import random

        rng = random.Random(seed)
        vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        return df, vecs

    def test_adc_equals_reconstruction_distance(self, spark):
        dim, m = 8, 2
        corpus, vecs = self._fixture(spark, dim=dim)
        cb = similarity.pq_codebook(
            corpus, n_subspaces=m, n_centroids=4, dim=dim, sample_mod=None
        )
        codes = similarity.pq_codes(
            corpus, n_subspaces=m, n_centroids=4, dim=dim, codebook=cb
        )
        q = corpus.where("vec_id = 0")
        out = similarity.pq_adc_topk(
            q, codes, cb, k=len(vecs), n_subspaces=m, dim=dim
        ).collect()
        assert len(out) == len(vecs)

        # numpy reference: reconstruct each vector from its codes, then
        # measure true L2^2 to the query — must match ADC exactly
        import numpy as np

        cents = {
            (r.subspace, r.cid): np.array(r.cemb) for r in cb.collect()
        }
        code_rows = {r.vec_id: r for r in codes.collect()}
        q0 = np.array(vecs[0])
        sub = dim // m
        for r in out:
            cr = code_rows[r.vec_id]
            recon = np.concatenate(
                [cents[(s, getattr(cr, f"code_{s}"))] for s in range(m)]
            )
            want = float(((q0 - recon) ** 2).sum())
            assert r.adc_d2 == pytest.approx(want, rel=1e-9), r.vec_id

    def test_planted_neighbor_ranks_first(self, spark):
        dim, m = 8, 2
        corpus, vecs = self._fixture(spark, dim=dim)
        # plant an exact duplicate of vec 0 as id 100 -> same codes,
        # ADC distance identical to vec 0's own, ranks at the top
        dup = spark.createDataFrame(
            [(100, [float(x) for x in vecs[0]])],
            "vec_id long, embedding array<double>",
        )
        full = corpus.unionByName(dup)
        cb = similarity.pq_codebook(
            full, n_subspaces=m, n_centroids=4, dim=dim, sample_mod=None
        )
        codes = similarity.pq_codes(
            full, n_subspaces=m, n_centroids=4, dim=dim, codebook=cb
        )
        out = similarity.pq_adc_topk(
            corpus.where("vec_id = 0"), codes, cb, k=2, n_subspaces=m, dim=dim
        ).collect()
        top_ids = {r.vec_id for r in out}
        assert 0 in top_ids and 100 in top_ids  # query and its double
        assert out[0].adc_d2 == out[1].adc_d2  # identical codes


class TestIvfPqTopk:
    def test_matches_manual_cell_restricted_adc(self, spark):
        """IVF-PQ == (probe cells -> pair-restricted ADC): verified
        against a numpy reference that reconstructs candidates from
        their codes and ranks true L2 within the probed cells only."""
        import random

        import numpy as np

        dim, m, n = 8, 2, 30
        rng = random.Random(3)
        vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n)]
        corpus = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        cents = similarity.kmeans_lite_centroids(
            corpus, n_centroids=4, n_iters=1, dim=dim, sample_mod=None
        )
        cells = similarity.ivf_assign(corpus, cents, 1).select(
            "vec_id", "centroid_id"
        )
        cb = similarity.pq_codebook(
            corpus, n_subspaces=m, n_centroids=4, dim=dim, sample_mod=None
        )
        codes = similarity.pq_codes(
            corpus, n_subspaces=m, n_centroids=4, dim=dim, codebook=cb
        )
        queries = corpus.where("vec_id < 2")
        out = similarity.ivf_pq_topk(
            queries, cells, codes, cb, cents, k=3, nprobe=2,
            n_subspaces=m, dim=dim,
        ).collect()

        # numpy reference
        cell_of = {r.vec_id: r.centroid_id for r in cells.collect()}
        cent_rows = {
            (r.subspace, r.cid): np.array(r.cemb) for r in cb.collect()
        }
        code_rows = {r.vec_id: r for r in codes.collect()}
        probe_rows = similarity.ivf_assign(queries, cents, 2).select(
            "vec_id", "centroid_id"
        ).collect()
        probes = {}
        for r in probe_rows:
            probes.setdefault(r.vec_id, set()).add(r.centroid_id)
        sub = dim // m
        for qid in (0, 1):
            q = np.array(vecs[qid])
            cand = [v for v in range(n) if cell_of[v] in probes[qid]]
            dists = {}
            for v in cand:
                cr = code_rows[v]
                recon = np.concatenate(
                    [cent_rows[(s, getattr(cr, f"code_{s}"))] for s in range(m)]
                )
                dists[v] = float(((q - recon) ** 2).sum())
            want = sorted(cand, key=lambda v: (dists[v], v))[:3]
            got = [r.vec_id for r in out if r.query_id == qid]
            assert got == want, qid
            for r in out:
                if r.query_id == qid:
                    assert r.adc_d2 == pytest.approx(dists[r.vec_id], rel=1e-9)


class TestSq8:
    """SQ8 scalar quantization (r15): codes/decode must match the numpy
    reference exactly, degenerate dimensions are safe, and asymmetric
    search keeps near-exact recall at the top of the ranking."""

    def _fixture(self, spark, dim=8, n=30, seed=7):
        import random

        rng = random.Random(seed)
        vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        return df, vecs

    def test_bounds_sample_mod_dial(self, spark):
        """r15 ADVICE (similarity.py:1393): sample_mod is now a real
        parameter mirroring the PQ trainer's id-mod sample — sampled
        bounds equal full-corpus bounds computed over the same subset,
        and the default remains the exact full scan."""
        from homelogging_spark.operators import similarity as S

        df, vecs = self._fixture(spark)
        full = S.sq8_bounds(df).collect()[0]
        sampled = S.sq8_bounds(df, sample_mod=4).collect()[0]
        subset = [v for i, v in enumerate(vecs) if i % 4 == 0]
        for d in range(len(vecs[0])):
            assert full.mins[d] == min(v[d] for v in vecs)
            assert sampled.mins[d] == min(v[d] for v in subset)
            assert sampled.maxs[d] == max(v[d] for v in subset)

    def test_codes_match_numpy_reference(self, spark):
        import numpy as np

        from homelogging_spark.operators.similarity import sq8_codes

        df, vecs = self._fixture(spark)
        a = np.array(vecs)
        mn, mx = a.min(axis=0), a.max(axis=0)
        span = mx - mn
        ref = np.floor(np.clip((a - mn) / span, 0, 1) * 255 + 0.5).astype(int)
        got = {r.vec_id: r for r in sq8_codes(df).collect()}
        for i in range(len(vecs)):
            assert list(got[i].codes) == list(ref[i]), i
            hat = mn + ref[i] / 255.0 * span
            assert got[i].recon_mse == pytest.approx(
                float(((a[i] - hat) ** 2).mean())
            )
        # uint8 range + honest compression error: small but nonzero
        assert all(0 <= c <= 255 for r in got.values() for c in r.codes)
        assert all(0 < r.recon_mse < 1e-3 for r in got.values())

    def test_degenerate_dimension_codes_zero_decodes_min(self, spark):
        from homelogging_spark.operators.similarity import (
            sq8_bounds,
            sq8_codes,
        )

        df = spark.createDataFrame(
            [(0, [1.0, 5.0]), (1, [1.0, 9.0]), (2, [1.0, 7.0])],
            "vec_id long, embedding array<double>",
        )
        got = {r.vec_id: list(r.codes) for r in sq8_codes(df).collect()}
        assert [g[0] for g in got.values()] == [0, 0, 0]  # constant dim
        b = sq8_bounds(df).collect()[0]
        assert b.mins == [1.0, 5.0] and b.maxs == [1.0, 9.0]
        # exact endpoints survive the round trip on the live dim
        assert got[0][1] == 0 and got[1][1] == 255

    def test_topk_recall_is_near_exact(self, spark):
        from homelogging_spark.operators.similarity import (
            exact_topk,
            sq8_topk,
            topk_recall,
        )

        df, _ = self._fixture(spark, dim=16, n=40)
        queries = df.where(F.col("vec_id") < 3)
        corpus = df.where(F.col("vec_id") >= 3)
        ann = sq8_topk(queries, corpus, k=5).withColumnRenamed(
            "vec_id", "cand_id"
        )
        exact = exact_topk(queries, corpus, k=5)
        out = topk_recall(ann, exact, k=5).collect()
        assert len(out) == 15  # 3 queries x top-5
        # 8-bit decode barely perturbs cosine: near-exact top of ranking
        assert all(r.recall_at_k >= 0.8 for r in out)
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        for rows in by_q.values():
            assert sorted(r.rank for r in rows) == [1, 2, 3, 4, 5]

    def test_bounds_reuse_skips_retraining(self, spark):
        """The ingest-artifact path: codes computed against a passed
        bounds frame equal the self-trained ones (pq_codes codebook=
        convention)."""
        from homelogging_spark.operators.similarity import sq8_bounds, sq8_codes

        df, _ = self._fixture(spark)
        bounds = sq8_bounds(df)
        a = {r.vec_id: list(r.codes) for r in sq8_codes(df).collect()}
        b = {r.vec_id: list(r.codes) for r in sq8_codes(df, bounds=bounds).collect()}
        assert a == b


class TestQualityModel:
    """textops versioned linear quality model — config-dim machinery
    and scoring semantics (driver parity is test_oracle_parity's
    model_quality_filter row)."""

    def test_score_matches_hand_computation(self, spark):
        from homelogging_spark.operators import textops as T

        df = spark.createDataFrame(
            [(1, "the cat sat on the mat and it is a good day for all")],
            "doc_id bigint, text string",
        )
        row = T.classifier_quality_filter(df).collect()[0]
        feats = {
            k: c for k, c in T._model_feature_columns(F.col("text")).items()
        }
        got = df.select(*[c.alias(k) for k, c in feats.items()]).collect()[0]
        m = T.model_for()
        expect = float(m["bias"])
        for f in sorted(m["weights"]):
            expect = expect + m["weights"][f] * got[f]
        assert row.score == expect  # identical fold order -> bit-equal
        assert row.kept == (expect >= 0.0)
        assert row.model_version == T.CURRENT_QUALITY_MODEL

    def test_degenerate_doc_is_deterministically_dropped(self, spark):
        """r15 ADVICE (textops.py:862): a doc with zero tokens (or zero
        chars) has NULL ratio features hence a NULL logit — the verdict
        must coalesce to kept=false in BOTH engines (score stays NULL:
        the model honestly has no opinion), and the corpus pipeline's
        stage CASE must attribute the drop instead of falling through
        to 'budget'."""
        import duckdb

        from homelogging_spark.operators import textops as T

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "!!!"), (4, "a normal document here")],
            "doc_id bigint, text string",
        )
        rows = {r.doc_id: r for r in T.classifier_quality_filter(df).collect()}
        for d in (1, 2):  # zero tokens AND (doc 1) zero chars
            assert rows[d].score is None and rows[d].kept is False
        assert rows[4].score is not None
        # SQL twin agrees on the degenerate rows
        sql = T.classifier_score_sql("text")
        got = duckdb.sql(
            "SELECT doc_id, "
            f"{sql['score']} AS score, {sql['kept']} AS kept "
            "FROM (VALUES (1, ''), (2, '   ')) AS t(doc_id, text) "
            "ORDER BY doc_id"
        ).fetchall()
        assert [(r[1], r[2]) for r in got] == [(None, False), (None, False)]

    def test_unknown_version_refused_and_feature_set_pinned(self):
        import pytest as _pytest

        from homelogging_spark.operators import textops as T

        with _pytest.raises(ValueError, match="unknown quality model"):
            T.model_for(99)
        # every version must carry exactly the canonical feature set
        for v in T.QUALITY_MODEL_VERSIONS:
            assert set(T.model_for(v)["weights"]) == set(T._MODEL_FEATURES)

    def test_audit_digest_tracks_content(self):
        from homelogging_spark.operators import textops as T

        a = T.model_audit()
        assert a["n_features"] == len(T._MODEL_FEATURES)
        # digest is a pure function of the coefficients: recompute
        assert a == T.model_audit(T.CURRENT_QUALITY_MODEL)

    def test_model_dim_is_joinable_config(self, spark):
        from homelogging_spark.operators import textops as T

        dim = T.model_dim(spark)
        rows = dim.collect()
        # one bias row + one row per feature, per version
        assert len(rows) == sum(
            1 + len(T.model_for(v)["weights"]) for v in T.QUALITY_MODEL_VERSIONS
        )
        v1 = {r.feature: r.weight for r in rows if r.model_version == 1}
        assert v1["__bias__"] == T.model_for(1)["bias"]

    def test_filter_is_zero_shuffle_projection(self, spark, sf_dir):
        from homelogging_spark.operators.textops import classifier_quality_filter
        from homelogging_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = (
            classifier_quality_filter(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestHdRotation:
    """r16 OPQ stretch: the structured rotation must be exactly
    orthogonal, numpy-exact, and bit-equal across engines (the whole
    OPQ oracle chain hangs on the last property)."""

    DIM = 8

    def _vecs(self):
        import random

        rng = random.Random(11)
        return [
            [round(rng.gauss(0, 1), 3) for _ in range(self.DIM)]
            for _ in range(6)
        ]

    def test_numpy_exact_and_orthogonal(self, spark):
        import numpy as np

        from homelogging_spark.operators import similarity as S

        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: r.r
            for r in df.select(
                "vec_id", S.hd_rotate(F.col("embedding"), self.DIM).alias("r")
            ).collect()
        }
        signs = np.array(S.hd_signs(self.DIM))
        H = np.array(
            [
                [(-1) ** bin(i & j).count("1") for i in range(self.DIM)]
                for j in range(self.DIM)
            ],
            dtype=float,
        )
        a = np.array(vecs)
        ref = (H @ (a * signs).T).T / np.sqrt(self.DIM)
        assert np.allclose(np.array([got[i] for i in range(6)]), ref, atol=1e-12)
        # orthogonality: norms and pairwise L2 distances preserved
        for i in range(6):
            assert abs(np.linalg.norm(got[i]) - np.linalg.norm(a[i])) < 1e-9
        d_orig = np.linalg.norm(a[0] - a[1])
        d_rot = np.linalg.norm(np.array(got[0]) - np.array(got[1]))
        assert abs(d_orig - d_rot) < 1e-9

    def test_duckdb_twin_bit_equal(self, spark):
        import duckdb

        from homelogging_spark.operators import similarity as S

        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: list(r.r)
            for r in df.select(
                "vec_id", S.hd_rotate(F.col("embedding"), self.DIM).alias("r")
            ).collect()
        }
        vals = ", ".join(
            "(%d, [%s])" % (i, ",".join(repr(float(x)) for x in v))
            for i, v in enumerate(vecs)
        )
        sql = S.hd_rotate_sql(
            f"SELECT vec_id, embedding FROM (VALUES {vals}) t(vec_id, embedding)",
            self.DIM,
        )
        duck = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
        assert duck == got  # bit-equal, not approximately equal

    def test_power_of_two_required_and_signs_frozen(self):
        import pytest as _pytest

        from homelogging_spark.operators import similarity as S

        with _pytest.raises(ValueError, match="power-of-two"):
            S.hd_rotate_sql("SELECT 1", 12)
        s1, s2 = S.hd_signs(16), S.hd_signs(16)
        assert s1 == s2 and set(s1) == {1.0, -1.0}
        assert S.hd_signs(16, seed="other") != s1

    def test_fwht_butterfly_matches_expression_form(self, spark):
        """r17 (r16 verdict wrong #2): the O(d log d) Arrow-batch
        butterfly computes the SAME transform as the O(d²) expression
        (same frozen signs, same scale) — equal to ~fp-rounding (the
        bracketing differs, so bit-equality is NOT expected and the
        docstring forbids mixing impls within a generation)."""
        import numpy as np

        from homelogging_spark.operators import similarity as S

        vecs = self._vecs()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        expr = {
            r.vec_id: np.array(r.r)
            for r in df.select(
                "vec_id", S.hd_rotate(F.col("embedding"), self.DIM).alias("r")
            ).collect()
        }
        fwht = {
            r.vec_id: np.array(r.embedding)
            for r in S.hd_rotate_fwht(df, self.DIM).collect()
        }
        assert set(fwht) == set(expr)
        for i in expr:
            assert np.max(np.abs(fwht[i] - expr[i])) <= 1e-9

    def test_fwht_production_dim_preserves_geometry(self, spark):
        """dim 1024 (the scale where the expression form is ~1M
        flops/vector): butterfly output preserves norms and pairwise
        distances to 1e-9 — orthogonality at the dim the dial exists
        for, where building the H matrix explicitly is already silly."""
        import random

        import numpy as np

        from homelogging_spark.operators import similarity as S

        dim = 1024
        rng = random.Random(7)
        vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.vec_id: np.array(r.embedding)
            for r in S.hd_rotate_fwht(df, dim).collect()
        }
        a = np.array(vecs)
        for i in range(4):
            assert abs(np.linalg.norm(got[i]) - np.linalg.norm(a[i])) < 1e-9
        assert (
            abs(
                np.linalg.norm(got[0] - got[1])
                - np.linalg.norm(a[0] - a[1])
            )
            < 1e-9
        )


class TestRotateRowsBitExact:
    """r20 optimization: the Arrow-batch rotation twins must be
    BIT-equal to the expression forms they replace (the oracle chain —
    PQ training argmins downstream — hangs on exact equality, not
    closeness). repr() comparison so -0.0 vs 0.0 or a last-ulp drift
    fails loudly."""

    DIM = 8

    def _vecs(self, n=7):
        import random

        rng = random.Random(23)
        # unrounded gaussians: full 52-bit mantissas, negatives included
        return [[rng.gauss(0, 1) for _ in range(self.DIM)] for _ in range(n)]

    def _matrix(self):
        import random

        rng = random.Random(31)
        # deliberately NOT orthogonal — the twin must not assume it
        return [
            [rng.gauss(0, 1) for _ in range(self.DIM)] for _ in range(self.DIM)
        ]

    def _cmp(self, spark, df, expr_col, rows_df):
        expr = {
            r.vec_id: r.embedding
            for r in df.select("vec_id", expr_col.alias("embedding")).collect()
        }
        rows = {r.vec_id: r.embedding for r in rows_df.collect()}
        assert set(expr) == set(rows)
        for k in expr:
            assert repr(expr[k]) == repr(rows[k])

    def test_rotate_by_matrix_rows_bitexact(self, spark):
        from homelogging_spark.operators import similarity as S

        m = self._matrix()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._vecs())],
            "vec_id long, embedding array<double>",
        )
        self._cmp(
            spark,
            df,
            S.rotate_by_matrix(F.col("embedding"), m),
            S.rotate_by_matrix_rows(df, m),
        )

    def test_rotate_by_matrix_rows_float32_input(self, spark):
        # array<float> source: the expression casts per element, the
        # twin widens via numpy — both exact, results bit-equal
        from homelogging_spark.operators import similarity as S

        m = self._matrix()
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._vecs())],
            "vec_id long, embedding array<float>",
        )
        self._cmp(
            spark,
            df,
            S.rotate_by_matrix(F.col("embedding"), m),
            S.rotate_by_matrix_rows(df, m),
        )

    def test_hd_rotate_rows_bitexact(self, spark):
        from homelogging_spark.operators import similarity as S

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._vecs())],
            "vec_id long, embedding array<double>",
        )
        self._cmp(
            spark,
            df,
            S.hd_rotate(F.col("embedding"), self.DIM),
            S.hd_rotate_rows(df, self.DIM),
        )

    def test_hd_rotate_rows_explicit_signs(self, spark):
        from homelogging_spark.operators import similarity as S

        signs = S.hd_signs(self.DIM, seed="other")
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._vecs(3))],
            "vec_id long, embedding array<double>",
        )
        self._cmp(
            spark,
            df,
            S.hd_rotate(F.col("embedding"), self.DIM, signs=signs),
            S.hd_rotate_rows(df, self.DIM, signs=signs),
        )

    def test_validation(self, spark):
        import pytest as _pytest

        from homelogging_spark.operators import similarity as S

        df = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="square"):
            S.rotate_by_matrix_rows(df, [[1.0, 0.0]])
        with _pytest.raises(ValueError, match="power-of-two"):
            S.hd_rotate_rows(df, 3)
        with _pytest.raises(ValueError, match="signs"):
            S.hd_rotate_rows(df, 2, signs=[0.5, 1.0])
        # wrong embedding length fails loudly at execution
        bad = S.rotate_by_matrix_rows(
            df, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        with _pytest.raises(Exception, match="embedding length"):
            bad.collect()

    def test_lsh_table_buckets_matches_expression(self, spark):
        # the Arrow-batch lsh_table_buckets must reproduce the
        # lsh_bucket EXPRESSION's bucket ids exactly (same fold, same
        # sign test, integer bucket arithmetic) — lsh_bucket stays as
        # the reference twin this pin evaluates
        from homelogging_spark.operators import similarity as S

        n_tables, ppt = 2, 6
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self._vecs())],
            "vec_id long, embedding array<double>",
        )
        planes = S.hyperplanes(n_tables * ppt, self.DIM)
        expr_rows = set()
        for t in range(n_tables):
            got = df.select(
                "vec_id",
                S.lsh_bucket(
                    F.col("embedding"), planes[t * ppt : (t + 1) * ppt]
                ).alias("b"),
            ).collect()
            expr_rows |= {(r.vec_id, t, r.b) for r in got}
        arrow_rows = {
            (r.vec_id, r.table_idx, r.bucket)
            for r in S.lsh_table_buckets(
                df, n_tables=n_tables, planes_per_table=ppt, dim=self.DIM
            ).collect()
        }
        assert arrow_rows == expr_rows


class TestOpqLearnedRotation:
    """r18 stretch (r17 verdict #8): Ge et al. 2013 non-parametric OPQ —
    alternating codebook training and orthogonal-Procrustes rotation
    updates, driver-side numpy on the deterministic id-mod sample (the
    PQ trainer's sampling contract). Pins: orthogonality, objective
    monotonicity (the warm-start property), identity-init iteration 1 ==
    plain PQ, a strict win on anisotropic data (the case the rotation
    exists for), determinism, and Spark-side serving parity."""

    DIM = 16
    N = 96

    def _aniso_vecs(self):
        """Deterministic anisotropic corpus: latent coordinates with
        geometrically decaying scales, MIXED off-axis by the HD
        transform — per-subspace energy is then badly imbalanced in the
        ambient basis, which is exactly what a learned rotation fixes
        (Ge et al. §1)."""
        import numpy as np

        from homelogging_spark.operators import similarity as S

        rng = np.random.RandomState(17)
        scales = 2.0 ** -(np.arange(self.DIM) / 2.0)
        z = rng.randn(self.N, self.DIM) * scales
        q = S._np_hd_matrix(self.DIM, S.hd_signs(self.DIM, "mix"))
        return np.round(z @ q, 6)

    def _df(self, spark, x):
        return spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(x)],
            "vec_id long, embedding array<double>",
        )

    def _train(self, spark, **kw):
        from homelogging_spark.operators import similarity as S

        x = self._aniso_vecs()
        args = dict(
            dim=self.DIM, n_subspaces=4, n_centroids=8,
            n_kmeans_iters=2, n_alt_iters=5, sample_mod=None,
        )
        args.update(kw)
        return x, S.opq_learn_rotation(self._df(spark, x), **args)

    def test_rotation_is_orthogonal(self, spark):
        import numpy as np

        _, out = self._train(spark)
        r = np.asarray(out["rotation"])
        assert np.max(np.abs(r.T @ r - np.eye(self.DIM))) < 1e-9

    def test_objective_monotone_and_beats_plain_pq(self, spark):
        """identity init: iteration 1's training MSE IS plain PQ's
        (same trainer, unrotated data); the alternation must never
        increase it, and on this anisotropic corpus the learned
        rotation must win STRICTLY."""
        _, out = self._train(spark, init="identity")
        mses = out["train_mse"]
        assert all(b <= a + 1e-15 for a, b in zip(mses, mses[1:])), mses
        assert mses[-1] < mses[0] * 0.95, mses  # strict, with margin

    def test_hd_init_never_worse_than_structured_transform(self, spark):
        """init='hd': iteration 1 is exactly the opq_panel HD leg's
        objective (structured rotation + PQ); further alternation can
        only improve it — the learned-vs-structured comparison the
        panel's measured-honesty note asks for."""
        _, out = self._train(spark, init="hd")
        mses = out["train_mse"]
        assert all(b <= a + 1e-15 for a, b in zip(mses, mses[1:])), mses

    def test_deterministic(self, spark):
        _, out1 = self._train(spark)
        _, out2 = self._train(spark)
        assert out1["rotation"] == out2["rotation"]
        assert out1["train_mse"] == out2["train_mse"]

    def test_identity_init_first_iteration_is_plain_pq(self, spark):
        import numpy as np

        from homelogging_spark.operators import similarity as S

        x, out = self._train(spark, init="identity", n_alt_iters=1)
        books, recon = S._np_pq_train(x, 4, 8, 2)
        pq_mse = float(((x - recon) ** 2).sum() / (len(x) * self.DIM))
        assert out["train_mse"][0] == pytest.approx(pq_mse, rel=0, abs=0)
        # and the returned codebooks are the plain-PQ ones exactly
        assert np.allclose(np.asarray(out["codebooks"]), np.asarray(books))

    def test_hd_matrix_matches_expression_rotation(self, spark):
        """The numpy HD matrix used for init='hd' computes the same
        transform as the hd_rotate expression (row-vector convention
        x @ R == the expr's y), so the two OPQ families share one
        geometry."""
        import numpy as np

        from homelogging_spark.operators import similarity as S

        x = self._aniso_vecs()[:5]
        df = self._df(spark, x)
        expr = {
            r.vec_id: np.array(r.r)
            for r in df.select(
                "vec_id", S.hd_rotate(F.col("embedding"), self.DIM).alias("r")
            ).collect()
        }
        r_mat = S._np_hd_matrix(self.DIM, S.hd_signs(self.DIM))
        ref = np.asarray(x) @ r_mat
        for i in range(5):
            assert np.max(np.abs(expr[i] - ref[i])) < 1e-9

    def test_spark_serving_parity_and_end_to_end_adc(self, spark):
        """opq_rotate (Arrow-batch matmul) equals the numpy rotation;
        the rotated corpus encodes through the UNCHANGED Spark PQ
        machinery against the trained codebooks and ADC-ranks end to
        end — the serving chain a learned generation would use."""
        import numpy as np

        from homelogging_spark.operators import similarity as S

        x, out = self._train(spark)
        r = np.asarray(out["rotation"])
        df = self._df(spark, x)
        served = {
            row.vec_id: np.array(row.embedding)
            for row in S.opq_rotate(df, out["rotation"], self.DIM).collect()
        }
        ref = np.asarray(x) @ r
        for i in range(self.N):
            assert np.max(np.abs(served[i] - ref[i])) < 1e-12
        codebook = spark.createDataFrame(
            [
                (m, k, [float(v) for v in cent])
                for m, cb in enumerate(out["codebooks"])
                for k, cent in enumerate(cb)
            ],
            "subspace int, cid bigint, cemb array<double>",
        )
        rotated = S.opq_rotate(df, out["rotation"], self.DIM)
        codes = S.pq_codes(
            rotated, 4, 8, 2, self.DIM, sample_mod=None, codebook=codebook
        )
        queries = rotated.where(F.col("vec_id") < 3)
        top = S.pq_adc_topk(
            queries, codes, codebook, k=4, n_subspaces=4, dim=self.DIM,
            rank_decimals=6,
        )
        assert top.count() == 12  # 3 queries x k
        # ADC over codes must surface each query's own (zero-distance)
        # code as rank 1 or tied — sanity that the chain is coherent
        r1 = {r.query_id: r.vec_id for r in top.where(F.col("rank") == 1).collect()}
        assert set(r1) == {0, 1, 2}

    def test_validation(self, spark):
        import pytest as _pytest

        from homelogging_spark.operators import similarity as S

        x = self._aniso_vecs()
        with _pytest.raises(ValueError, match="init"):
            S.opq_learn_rotation(
                self._df(spark, x), dim=self.DIM, init="nope", sample_mod=None
            )
        with _pytest.raises(ValueError, match="rotation must be"):
            S.opq_rotate(self._df(spark, x), [[1.0, 0.0], [0.0, 1.0]], self.DIM)
        # the overfit guard (measured on the fixture: an n_train < 2*dim
        # rotation DEGRADES the corpus — SCALE.md r18): refused up front
        with _pytest.raises(ValueError, match="overfit"):
            S.opq_learn_rotation(
                self._df(spark, x[: self.DIM]), dim=self.DIM, sample_mod=None
            )
