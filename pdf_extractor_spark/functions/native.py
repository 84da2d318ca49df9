"""Native (JVM-side) Column expressions for the QA/metrics path.

The golden extraction path keeps every regex in Python ``re`` inside
pandas UDFs (byte parity — see core/textnorm.py); THIS module is the
opposite contract: pure ``pyspark.sql.functions`` Column builders that
stay inside whole-stage codegen for QA, metrics and corpus-analytics
pipelines where Java-regex semantics are acceptable.  They are the
Column-API equivalents of the SQL used by the driver catalog
(queries.py), and tests pin the two surfaces to each other.

Reference lineage: N1-N3 whitespace normalization (api.py:720-766),
N7 sentence boundaries (api.py:921), N4 header shape (api.py:872-884).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(col: Column | str) -> Column:
    r"""N1-style whitespace normalization: collapse runs of spaces/tabs to
    one space, squeeze 3+ newlines to a paragraph break, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, r"[ \t]+", " "), r"\n{3,}", "\n\n")
    )


def sentence_marks(col: Column | str) -> Column:
    """Count of sentence-boundary punctuation (N7 split-point estimate)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[.!?]"), F.lit(0)))


def first_line(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, r"\n", 2), 1)


def is_header_shape(col: Column | str, max_chars: int = 100) -> Column:
    """N4 header-block classifier, native form: first line short AND fully
    uppercase (the ALL-CAPS branch of api.py:872-884)."""
    line = first_line(col)
    return (F.length(line) <= max_chars) & (line == F.upper(line)) & (
        F.length(F.regexp_replace(line, r"[^A-Za-z]", "")) > 0
    )


def tokens(col: Column | str) -> Column:
    """Lowercase word tokens (the shared tokenizer of the text-analysis
    query family): split on non-alphanumerics, drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def md5_int(col: Column | str) -> Column:
    """First 32 hash bits of md5 as a bigint — the cross-engine-stable
    cheap hash used by the minhash/simhash family."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
