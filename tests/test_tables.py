"""core/tables.py — the S4 whitespace-grid table detector (pure Python).

Reference shape parity: tables → rows → cells nested lists, num_tables per
turn (/root/reference/pdf_extractor.py:419-460).
"""

from __future__ import annotations

from pdf_extractor_spark.core.tables import (
    detect_tables,
    is_table_line,
    split_table_cells,
    table_stats,
)


def test_cell_split_rules():
    assert split_table_cells("a  b\tc") == ["a", "b", "c"]
    assert split_table_cells("one  two   three") == ["one", "two", "three"]
    assert split_table_cells("single spaced words stay one cell") == [
        "single spaced words stay one cell"
    ]
    assert split_table_cells("   lead  trail   ") == ["lead", "trail"]


def test_is_table_line():
    assert is_table_line("col1  col2")
    assert is_table_line("a\tb")
    assert not is_table_line("plain prose line")
    assert not is_table_line("")


def test_two_consecutive_aligned_lines_form_a_table():
    text = "header prose\nrpm  torque\n1000  89\n2000  143\ntail prose"
    tables = detect_tables(text)
    assert tables == [[["rpm", "torque"], ["1000", "89"], ["2000", "143"]]]


def test_single_aligned_line_is_noise():
    assert detect_tables("prose\ncol1  col2\nprose again") == []


def test_multiple_tables_and_stats():
    text = (
        "a  b\nc  d\n"          # table 1: 2x2
        "prose\n"
        "x  y  z\np  q  r\nm  n  o\n"  # table 2: 3x3
    )
    tables = detect_tables(text)
    assert len(tables) == 2
    assert table_stats(text) == (2, 5, 13)


def test_empty_and_none_safe():
    assert detect_tables("") == []
    assert table_stats("") == (0, 0, 0)


def test_trailing_table_flushes():
    text = "prose\nk1  v1\nk2  v2"
    assert detect_tables(text) == [[["k1", "v1"], ["k2", "v2"]]]


def test_spark_tables_udf_matches_core(spark):
    """with_tables over real transcript turns == detect_tables row-by-row;
    the fixture grammar guarantees table-positive turns (two-column pages,
    'col1 col2 col3' pathological-ws turns)."""
    from pdf_extractor_spark.operators.extract import with_tables
    from pdf_extractor_spark.sources.transcripts import (
        TRANSCRIPT_DDL, generate_rows, rows_to_pandas,
    )

    pdf = rows_to_pandas(generate_rows(8, seed=42))
    df = spark.createDataFrame(pdf, TRANSCRIPT_DDL)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["tables"], r["num_tables"])
        for r in with_tables(df).collect()
    }
    assert len(got) == len(pdf)
    n_positive = 0
    for _, row in pdf.iterrows():
        want = detect_tables(row["text"])
        tables, num = got[(row["conv_id"], row["turn_idx"])]
        got_tables = [[list(cells) for cells in t] for t in tables]
        assert got_tables == want
        assert num == len(want)
        n_positive += bool(want)
    assert n_positive > 0, "fixture should contain table-positive turns"
