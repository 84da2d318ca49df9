"""Decontamination family semantics: the three spellings (same-table
window, external broadcast semi-join, Bloom prefilter + exact verify) must
agree row-for-row, and the Bloom filter itself must have zero false
negatives with the designed false-positive rate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    _BLOOM_BITS_PER_KEY,
    _bloom_build,
    _bloom_probe,
    q_decontaminate,
    q_decontaminate_bloom,
    q_decontaminate_external,
)

SF_DIR = "/root/testdata/sf0.001"


class TestBloomMath:
    def test_no_false_negatives(self):
        keys = np.arange(0, 200_000, 7, dtype=np.int64)  # ~28.5k keys
        words, m = _bloom_build(keys)
        assert _bloom_probe(words, m, keys).all()

    def test_fpr_within_design(self):
        """bits-per-key 16, k=11 → theoretical FPR ≈ 5e-4; assert an order
        of magnitude of slack against a disjoint probe set."""
        keys = np.arange(1_000_000, 1_050_000, dtype=np.int64)
        words, m = _bloom_build(keys)
        probes = np.arange(0, 500_000, dtype=np.int64)  # disjoint from keys
        fpr = _bloom_probe(words, m, probes).mean()
        assert fpr < 5e-3, f"observed FPR {fpr} far above design point"

    def test_deterministic_across_builds(self):
        keys = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.int64)
        w1, m1 = _bloom_build(keys)
        w2, m2 = _bloom_build(keys[::-1])  # order-insensitive
        assert m1 == m2 and (w1 == w2).all()

    def test_sizing_is_pow2_and_bounded(self):
        for n in (1, 100, 10_000):
            keys = np.arange(n, dtype=np.int64)
            words, m = _bloom_build(keys)
            assert m & (m - 1) == 0  # power of two (mask addressing)
            assert m >= n * _BLOOM_BITS_PER_KEY
            assert words.size == m // 64


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "matched_shingles": "int64"})
    )


@pytest.mark.usefixtures("spark")
class TestSpellingsAgree:
    def test_external_equals_window_spelling(self, spark):
        """With bench = the same doc_id<10 cut, the broadcast semi-join
        spelling must reproduce the window spelling exactly."""
        a = _sorted_pdf(q_decontaminate(spark, SF_DIR))
        b = _sorted_pdf(q_decontaminate_external(spark, SF_DIR))
        pd.testing.assert_frame_equal(a, b)

    def test_bloom_equals_exact_external(self, spark):
        """The Bloom prefilter + exact verify must be byte-identical to the
        exact spelling — false positives die in the verify join."""
        a = _sorted_pdf(q_decontaminate_external(spark, SF_DIR))
        b = _sorted_pdf(q_decontaminate_bloom(spark, SF_DIR))
        pd.testing.assert_frame_equal(a, b)

    def test_external_accepts_a_genuinely_external_bench(self, spark):
        """Pass a hand-built bench relation (NOT a cut of documents): only
        docs sharing an 8-gram with it are flagged, with exact counts."""
        corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        # leak: the first 8 tokens of doc 42's text, plus a never-matching row
        row = corpus.where("doc_id = 42").select("text").first()
        leak_text = " ".join(row["text"].lower().split()[:8])
        bench = spark.createDataFrame(
            [(0, leak_text), (1, "zz yy xx ww vv uu tt ss")],
            "doc_id long, text string",
        )
        out = q_decontaminate_external(spark, SF_DIR, bench=bench).collect()
        flagged = {r["doc_id"] for r in out}
        assert 42 in flagged
        for r in out:
            assert r["matched_shingles"] >= 1


class TestDistributedBloomBuild:
    def test_bit_identical_to_driver_build(self, spark):
        """The cluster-side build must produce the SAME bit array as the
        driver build, regardless of partitioning — same m, same words."""
        import numpy as np

        from pdf_extractor_spark.queries import (
            _bloom_build,
            _shingle_hashes,
            bloom_build_distributed,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        bench_hashes = (
            _shingle_hashes(docs.where("doc_id < 10")).select("hg").distinct()
        )
        keys = np.fromiter(
            (r["hg"] for r in bench_hashes.collect()), dtype=np.int64
        )
        w_driver, m_driver = _bloom_build(keys)
        w_dist, m_dist = bloom_build_distributed(bench_hashes.repartition(7))
        assert m_driver == m_dist
        assert (w_driver == w_dist).all()

    def test_bloom_query_identical_under_distributed_build(self, spark):
        a = _sorted_pdf(q_decontaminate_bloom(spark, SF_DIR))
        b = _sorted_pdf(
            q_decontaminate_bloom(spark, SF_DIR, distributed_build=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_empty_bench_yields_empty_filter_and_no_matches(self, spark):
        import numpy as np

        from pdf_extractor_spark.queries import bloom_build_distributed

        empty = spark.createDataFrame([], "hg bigint")
        words, m = bloom_build_distributed(empty)
        assert words.sum() == 0 and m >= 64
        # the full query with an empty bench flags nothing
        from pdf_extractor_spark.queries import q_decontaminate_bloom

        bench = spark.createDataFrame([], "doc_id long, text string")
        assert q_decontaminate_bloom(spark, SF_DIR, bench=bench).count() == 0
