"""Pathological-input sweep over the ENTIRE query catalog: every
registry entry must MATERIALIZE (never throw) on degenerate documents
and embeddings — empty/whitespace/unicode/identical texts, zero and
identical vectors, a tokenless source.  Found-by-this-class bug: Spark 4
ANSI divide-by-zero in the mix queries on a zero-token source.

Output VALUES are not asserted here (the oracle gate owns parity); the
contract is no-crash + a well-formed result on inputs a 100 TB crawl
WILL contain.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from pdf_extractor_spark.queries import QUERY_REGISTRY

SRC = "/root/testdata/sf0.001"

_PATHO_TEXTS = [
    "",                                     # empty
    "   \t\n  ",                            # whitespace only
    "x",                                    # single char
    "word",                                 # single token
    "same same same same same same",        # pure repetition
    "ALL CAPS HEADER LINE",                 # header-shaped
    "🎉 emoji 漢字 mixed مرحبا text",        # unicode mix
    "a. b! c? d.",                          # sentence-boundary soup
    "- bullet\n- bullet\n- bullet",         # all bullet lines
    "#### #### ...... ####",                # symbol storm, no alpha
    "dup text", "dup text", "dup text",     # exact triplicate
    "the and of to with that have be",      # all stopwords
    "0 1 2 3 4 5 6 7 8 9",                  # all digits
]


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("patho")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events"):
        shutil.copy(f"{SRC}/{name}.parquet", root / f"{name}.parquet")

    n = len(_PATHO_TEXTS)
    docs = pd.DataFrame(
        {
            "doc_id": list(range(n)),
            "text": _PATHO_TEXTS,
            "lang": (["en", "de", "fr"] * n)[:n],
            "source": ["empty_src" if not t.strip() else "src0"
                       for t in _PATHO_TEXTS],
            "n_chars": [len(t) for t in _PATHO_TEXTS],
        }
    )
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))

    # 20 vectors of dim 64: a zero vector, identical pairs, one-hot axes
    dim = 64
    vecs = [[0.0] * dim]                                    # all-zero
    vecs += [[1.0] + [0.0] * (dim - 1)] * 3                 # identical trio
    for i in range(16):
        v = [0.0] * dim
        v[i % dim] = float(i + 1)
        vecs.append(v)
    rows = [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_catalog_query_survives_pathological_inputs(spark, patho_dir, name):
    fn = QUERY_REGISTRY[name][0]
    df = fn(spark, patho_dir)
    rows = df.collect()          # materialize fully — laziness hides throws
    assert rows is not None      # no-crash contract; row COUNT may be 0
    assert len(df.columns) > 0
