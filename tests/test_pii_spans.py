"""PII scrubbing + duplicated-span detection.

The synthetic corpus carries no PII, so the catalog oracle row only proves
the no-match path; these tests route PII-BEARING fixtures through BOTH
engines using the exact pattern strings the catalog query uses, proving
the redaction itself is correct and engine-identical.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    PII_PATTERNS,
    _pii_counts_sql,
    _pii_redact_sql,
    q_dup_spans,
)

FIXTURES = [
    (0, "contact me at john.doe+spam@example.co.uk or jane@sub.domain.org today"),
    (1, "card 1234567812345678 expires soon; backup 9999888877776666 ."),
    (2, "ssn 123-45-6789 and phone 555-867-5309 plus 555.123.4567 dialed"),
    (3, "server at 192.168.1.100 and 10.0.0.1 responded"),
    (4, "mixed: a@b.io 1111222233334444 111-22-3333 222-333-4444 8.8.8.8 end"),
    (5, "clean text with no sensitive content at all"),
    (6, "17 digits 12345678123456789 is not a card; 12-34 is not an ssn"),
]

EXPECTED_COUNTS = {
    # (email, card, ssn, phone, ipv4)
    0: (2, 0, 0, 0, 0),
    1: (0, 2, 0, 0, 0),
    2: (0, 0, 1, 2, 0),
    3: (0, 0, 0, 0, 2),
    4: (1, 1, 1, 1, 1),
    5: (0, 0, 0, 0, 0),
    6: (0, 0, 0, 0, 0),
}


def _spark_pii(spark):
    df = spark.createDataFrame(
        pd.DataFrame(FIXTURES, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("pii_fixture")
    counts = ", ".join(_pii_counts_sql("text", "spark"))
    return spark.sql(
        f"SELECT doc_id, {counts}, {_pii_redact_sql('text', 'spark')} AS redacted "
        "FROM pii_fixture"
    ).toPandas().sort_values("doc_id").reset_index(drop=True)


def _duck_pii():
    con = duckdb.connect()
    con.register(
        "pii_fixture", pd.DataFrame(FIXTURES, columns=["doc_id", "text"])
    )
    counts = ", ".join(_pii_counts_sql("text", "duck"))
    return con.sql(
        f"SELECT doc_id, {counts}, {_pii_redact_sql('text', 'duck')} AS redacted "
        "FROM pii_fixture ORDER BY doc_id"
    ).df().reset_index(drop=True)


class TestPiiRedaction:
    def test_counts_match_hand_expected(self, spark):
        got = _spark_pii(spark)
        for _, row in got.iterrows():
            want = EXPECTED_COUNTS[row["doc_id"]]
            have = tuple(int(row[f"n_{n}"]) for n, _p, _t in PII_PATTERNS)
            assert have == want, f"doc {row['doc_id']}: {have} != {want}"

    def test_redaction_replaces_every_match(self, spark):
        got = _spark_pii(spark)
        red = {r["doc_id"]: r["redacted"] for _, r in got.iterrows()}
        assert "<EMAIL>" in red[0] and "@" not in red[0]
        assert red[1].count("<CARD>") == 2 and "12345678" not in red[1]
        assert "<SSN>" in red[2] and "<PHONE>" in red[2]
        assert red[3].count("<IPV4>") == 2
        assert red[5] == FIXTURES[5][1]  # clean text untouched
        assert "<CARD>" not in red[6]  # 17-digit run is not a card

    def test_both_engines_identical(self, spark):
        g = _spark_pii(spark)
        d = _duck_pii()
        for col in g.columns:
            if col.startswith("n_"):
                g[col] = g[col].astype("int64")
                d[col] = d[col].astype("int64")
        pd.testing.assert_frame_equal(g, d)


class TestDupSpans:
    def test_shared_span_flagged_in_both_docs_only(self, spark):
        """Two docs sharing a 16-word run must both show dup spans; an
        unrelated doc must show zero."""
        shared = " ".join(f"tok{i}" for i in range(16))
        rows = [
            (0, shared + " tailA specific to zero"),
            (1, "headB unique " + shared),
            (2, " ".join(f"other{i}" for i in range(20))),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"]),
            "doc_id long, text string",
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "documents.parquet"))
            out = {
                r["doc_id"]: r
                for r in q_dup_spans(spark, tmp).collect()
            }
        assert out[0]["n_dup_spans"] >= 1
        assert out[1]["n_dup_spans"] >= 1
        assert out[2]["n_dup_spans"] == 0
        assert out[2]["dup_fraction"] == 0.0
        assert 0 < out[0]["dup_fraction"] <= 1.0
