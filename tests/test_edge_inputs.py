"""Edge-input contract of the Spark pipeline: NULL text, duplicate and
gapped turn_idx, empty input — the malformed rows a 10^12-turn lake WILL
contain must degrade deterministically, never throw.
"""

from __future__ import annotations

from pdf_extractor_spark.operators.chunk import SENTINEL_INDEX, chunk_conversations
from pdf_extractor_spark.operators.enrich import split_chunks, split_documents
from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.sources.transcripts import TRANSCRIPT_DDL


def _pipeline(spark, rows):
    df = spark.createDataFrame(rows, TRANSCRIPT_DDL)
    return chunk_conversations(extract_turns(df, with_first_extract=True))


def test_null_text_turn_is_parse_failure_not_crash(spark):
    rows = [
        ("c1", 0, "user", "Real content here. More of it follows now.", None, None),
        ("c1", 1, "assistant", None, None, None),
        ("c1", 2, "user", "Tail content sentence.", None, None),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_DDL)
    ex = {r["turn_idx"]: r for r in extract_turns(df).collect()}
    assert ex[1]["parse_ok"] is False
    assert ex[1]["clean_text"] == ""
    assert ex[0]["parse_ok"] is True

    mx = _pipeline(spark, rows)
    docs = split_documents(mx).collect()
    assert docs[0]["status"] == "embedded"  # null turn doesn't reject the conv
    chunks = split_chunks(mx).collect()
    assert len(chunks) >= 1


def test_duplicate_turn_idx_deterministic(spark):
    """Duplicate turn_idx (upstream dedup failure): both rows flow through
    stage 1; the chunker sorts stably, so output is deterministic."""
    rows = [
        ("c1", 0, "user", "First version of the turn text here.", None, None),
        ("c1", 0, "user", "First version of the turn text here.", None, None),
        ("c1", 1, "user", "Second turn closes the conversation.", None, None),
    ]
    a = sorted(r["content"] for r in split_chunks(_pipeline(spark, rows)).collect())
    b = sorted(r["content"] for r in split_chunks(_pipeline(spark, rows)).collect())
    assert a == b


def test_gapped_turn_idx_preserves_order(spark):
    rows = [
        ("c1", 100, "user", "Turn one hundred comes first in order.", None, None),
        ("c1", 5, "user", "Turn five precedes it despite input order.", None, None),
    ]
    chunks = split_chunks(_pipeline(spark, rows)).collect()
    blob = " ".join(c["content"] for c in chunks)
    assert blob.index("Turn five") < blob.index("Turn one hundred")
    assert chunks[0]["start_turn"] == 5


def test_empty_input_yields_no_rows(spark):
    mx = _pipeline(spark, [])
    assert mx.count() == 0
    assert split_documents(mx).count() == 0


def test_whitespace_only_conversation(spark):
    rows = [("c1", 0, "user", "   \n\t  ", None, None)]
    mx = _pipeline(spark, rows)
    sent = [r for r in mx.collect() if r["chunk_index"] == SENTINEL_INDEX]
    assert len(sent) == 1
    assert sent[0]["status"] == "embedded"  # empty but not rejected
    assert split_chunks(mx).count() == 0    # nothing to chunk
