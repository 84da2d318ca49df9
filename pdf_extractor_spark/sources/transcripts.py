"""Deterministic synthetic transcript generator.

Produces the engine's primary input table (BASELINE.json ``input_hint``):

    transcripts(conv_id:string, turn_idx:int32, role:string,
                text:string, tool:string, ts:timestamp)

Content grammar follows FIXTURES.md §1: every reference operator is
exercised — header page-number/chapter lines, CID artifacts, hyphenation
breaks, watermark footers, ALL-CAPS/Title-Case headers, bullet/numbered
lists (short + split-length), >1200-char paragraphs, whitespace pathology,
XSS payload conversations, empty turns, multi-line title openers, Unicode,
two-column layouts, HTML-ish turns, and one heavily skewed conversation.

Determinism: each conversation seeds its own ``random.Random(f"{seed}:{i}")``
so any subset of conversations can be generated independently and in
parallel (Spark range + mapInPandas) with identical content.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone
from typing import Iterator, Optional

from pyspark.sql import types as T  # pure-Python module; no JVM started

EPOCH_S = 1_704_067_200  # 2024-01-01T00:00:00Z — fixed fixture epoch
ROLES = ("user", "assistant", "tool")
TOOLS = (None, "search", None, "browser", None, None, "calculator", None)

_WORDS = (
    "engine torque manifold sensor coolant piston valve gasket throttle spark "
    "ignition filter bracket assembly harness relay module chassis bearing seal "
    "clutch differential axle rotor caliper spindle linkage damper spring bolt "
    "procedure inspection removal installation adjustment specification warning "
    "caution system pressure temperature voltage resistance circuit connector "
    "terminal diagram section figure reference maintenance service interval fluid"
).split()

_UNICODE_BITS = ("°C", "–", "—", "“quoted”", "’s", "±0.5", "Ω", "µm", "日本語", "naïve")

_CHAPTERS = (
    "ENGINE", "TRANSMISSION", "BRAKES", "SUSPENSION", "ELECTRICAL",
    "Cooling System", "Fuel Injection", "BODY PANELS",
)

_XSS_SNIPPETS = (
    "<script>alert(document.cookie)</script>",
    '<img src=x onerror="steal()">',
    "click javascript:void(0) now",
    "/OpenAction (this.run)",
)

_FOOTERS = (
    "Downloaded from www.manualslib.com manuals search engine",
    "– CONTINUED –",
)


def _sentence(rng: random.Random, n_lo: int = 6, n_hi: int = 14) -> str:
    n = rng.randint(n_lo, n_hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    if rng.random() < 0.12:
        words[rng.randrange(n)] = rng.choice(_UNICODE_BITS)
    words[0] = words[0].capitalize()
    return " ".join(words) + rng.choice("..........!?")


def _paragraph(rng: random.Random, min_chars: int, max_chars: int) -> str:
    parts: list[str] = []
    total = 0
    target = rng.randint(min_chars, max_chars)
    while total < target:
        s = _sentence(rng)
        parts.append(s)
        total += len(s) + 1
    return " ".join(parts)


def _wrap(rng: random.Random, text: str, width: int) -> list[str]:
    """Greedy word-wrap so prose spans several virtual-page lines."""
    out: list[str] = []
    line: list[str] = []
    used = 0
    for w in text.split(" "):
        if used and used + 1 + len(w) > width:
            out.append(" ".join(line))
            line, used = [w], len(w)
        else:
            line.append(w)
            used += len(w) + (1 if used else 0)
    if line:
        out.append(" ".join(line))
    return out


def _header_line(rng: random.Random) -> str:
    chap = rng.choice(_CHAPTERS)
    kind = rng.random()
    if kind < 0.4:
        return f"{chap} {rng.randint(1, 20)}-{rng.randint(1, 99)}"
    if kind < 0.65:
        return f"{rng.randint(1, 400)} {chap}"
    if kind < 0.8:
        return f"{chap} {rng.randint(1985, 2030)}"  # year → must NOT parse as page
    return chap


def _decorate_prose(rng: random.Random, text: str) -> str:
    """Sprinkle CID artifacts and a hyphenation line-break into prose."""
    if rng.random() < 0.35:
        cid = rng.choice(["(cid:121)", "(cid:150)", "(cid:146)", "(cid:999)", "(cid:84)"])
        ws = text.split(" ")
        ws.insert(rng.randrange(len(ws)), cid)
        text = " ".join(ws)
    return text


def _hyphen_break(rng: random.Random, lines: list[str]) -> list[str]:
    """Split a word across two lines with a trailing hyphen."""
    for i, ln in enumerate(lines[:-1]):
        ws = ln.split(" ")
        long_idx = [j for j, w in enumerate(ws) if len(w) >= 8 and w.isalpha()]
        if long_idx:
            j = rng.choice(long_idx)
            cut = len(ws[j]) // 2
            head, tail = ws[j][:cut], ws[j][cut:]
            # broken word must END its line for the repair regex to see it
            lines[i] = " ".join(ws[:j] + [head + "-"])
            carry = " ".join([tail] + ws[j + 1 :])
            lines[i + 1] = carry + " " + lines[i + 1]
            break
    return lines


def _bullet_block(rng: random.Random, long: bool) -> str:
    marker_pool = ["-", "*", "•", "o", "▶", "►"]
    n = rng.randint(8, 14) if long else rng.randint(3, 6)
    items = []
    for _ in range(n):
        m = rng.choice(marker_pool)
        body = _paragraph(rng, 80, 220) if long else _sentence(rng)
        items.append(f"{m} {body}")
    return "\n".join(items)


def _numbered_block(rng: random.Random, long: bool) -> str:
    n = rng.randint(8, 14) if long else rng.randint(3, 6)
    items = []
    for k in range(1, n + 1):
        sep = rng.choice([".", ")"])
        body = _paragraph(rng, 80, 220) if long else _sentence(rng)
        items.append(f"{k}{sep} {body}")
    return "\n".join(items)


def _two_column_turn(rng: random.Random) -> str:
    """Two dense 60-char columns with a 14-space gutter (virtual-page split)."""
    n_lines = rng.randint(8, 14)
    left = _wrap(rng, _paragraph(rng, 400, 700), 58)
    right = _wrap(rng, _paragraph(rng, 400, 700), 58)
    rows = []
    for i in range(n_lines):
        l = left[i] if i < len(left) else ""
        r = right[i] if i < len(right) else ""
        rows.append(f"{l:<60}" + " " * 14 + r)
    return _header_line(rng) + "\n" + "\n".join(rows)


def _html_turn(rng: random.Random) -> str:
    body = _paragraph(rng, 300, 900)
    side = " ".join(rng.choice(_WORDS) for _ in range(6))
    links = "".join(
        f'<li><a href="/x/{w}">{w} {w}</a></li>' for w in rng.sample(_WORDS, 5)
    )
    return (
        "<html><head><title>Service Portal</title></head><body>"
        f"<nav><ul>{links}</ul></nav>"
        f"<header><h1>{rng.choice(_CHAPTERS).title()} Guide</h1></header>"
        f"<div class='main'><p>{body}</p>"
        f"<p>{_paragraph(rng, 150, 400)}</p></div>"
        f"<aside>{side}</aside>"
        f"<footer><a href='/tos'>terms</a> <a href='/priv'>privacy</a></footer>"
        "</body></html>"
    )


def _pathological_ws(rng: random.Random) -> str:
    return (
        _sentence(rng)
        + "\n" * rng.randint(3, 12)
        + "col1    \t  col2      col3\n"
        + "\x07" + _sentence(rng) + "\x1f\n"
        + "   " + _sentence(rng) + "\t\t" + _sentence(rng)
    )


def _title_opener(rng: random.Random) -> str:
    return (
        f"{rng.choice(_CHAPTERS).title()} Workshop Manual\n"
        f"{_sentence(rng, 4, 8)}\n"
        f"Service Publication {rng.randint(100, 999)}\n\n"
        + _paragraph(rng, 300, 600)
    )


def build_turn_text(rng: random.Random, turn_idx: int, xss_turn: bool) -> str:
    """One turn's payload, drawn from the FIXTURES.md content grammar."""
    if xss_turn:
        return _paragraph(rng, 100, 250) + " " + rng.choice(_XSS_SNIPPETS)
    if turn_idx == 0 and rng.random() < 0.5:
        return _title_opener(rng)

    roll = rng.random()
    if roll < 0.30:  # plain prose page with header + footer furniture
        lines = [_header_line(rng)]
        for _ in range(rng.randint(1, 3)):
            para = _decorate_prose(rng, _paragraph(rng, 200, 900))
            lines.extend(_wrap(rng, para, rng.randint(68, 92)))
        lines = _hyphen_break(rng, lines)
        if rng.random() < 0.3:
            lines.append(rng.choice(_FOOTERS))
        return "\n".join(lines)
    if roll < 0.40:  # very long paragraph → sentence repacking path
        return "\n".join(_wrap(rng, _paragraph(rng, 1400, 2600), 88))
    if roll < 0.50:
        return _bullet_block(rng, long=rng.random() < 0.4)
    if roll < 0.58:
        return _numbered_block(rng, long=rng.random() < 0.4)
    if roll < 0.65:  # header-shaped short blocks
        pick = rng.random()
        if pick < 0.4:
            return rng.choice(_CHAPTERS).upper()
        if pick < 0.7:
            return f"Chapter {rng.randint(1, 30)} {rng.choice(_WORDS).title()}"
        return " ".join(w.title() for w in rng.sample(_WORDS, 4))
    if roll < 0.73:
        return _two_column_turn(rng)
    if roll < 0.83:
        return _html_turn(rng)
    if roll < 0.88:
        return _pathological_ws(rng)
    if roll < 0.92:
        return rng.choice(["", "   ", "\n\n", " \t \n "])  # empty/ws-only turn
    lines = [_header_line(rng)]
    lines.extend(_wrap(rng, _decorate_prose(rng, _paragraph(rng, 150, 500)), 80))
    return "\n".join(lines)


def conv_turn_count(seed: int, conv_i: int, lo: int, hi: int, skew_every: int) -> int:
    """Skewed conversations get ~40× the median turn count (salting test)."""
    rng = random.Random(f"{seed}:{conv_i}:n")
    if skew_every and conv_i % skew_every == skew_every - 1:
        return rng.randint(30 * hi, 40 * hi)
    return rng.randint(lo, hi)


def is_xss_conv(conv_i: int) -> bool:
    return conv_i % 13 == 7


def generate_conversation(
    seed: int, conv_i: int, lo: int = 5, hi: int = 40, skew_every: int = 0
) -> Iterator[tuple[str, int, str, str, Optional[str], datetime]]:
    """Yield (conv_id, turn_idx, role, text, tool, ts) rows for one conv."""
    rng = random.Random(f"{seed}:{conv_i}")
    n_turns = conv_turn_count(seed, conv_i, lo, hi, skew_every)
    xss = is_xss_conv(conv_i)
    xss_at = rng.randrange(n_turns) if xss else -1
    conv_id = f"conv-{conv_i:06d}"
    for t in range(n_turns):
        text = build_turn_text(rng, t, xss_turn=(t == xss_at))
        ts = datetime.fromtimestamp(EPOCH_S + conv_i * 86_400 + t * 60, tz=timezone.utc)
        yield (conv_id, t, ROLES[t % 3], text, TOOLS[t % len(TOOLS)], ts)


def generate_rows(
    n_convs: int, seed: int = 42, lo: int = 5, hi: int = 40, skew_every: int = 0
) -> list[tuple]:
    """All rows for n_convs conversations, shuffled to prove that nothing
    downstream relies on input order (FIXTURES.md §1)."""
    rows: list[tuple] = []
    for i in range(n_convs):
        rows.extend(generate_conversation(seed, i, lo, hi, skew_every))
    random.Random(seed).shuffle(rows)
    return rows


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def rows_to_pandas(rows: list[tuple]):
    import pandas as pd

    df = pd.DataFrame(rows, columns=TRANSCRIPT_COLUMNS)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


# Canonical transcript schema.  The StructType is the source of truth —
# the DDL string and the column->type cast map (sources/formats.py) both
# derive from it, so a future type containing commas or angle brackets
# (decimal(10,2), map<string,string>) can never be mis-split by ad-hoc
# string parsing.
TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

TRANSCRIPT_DDL = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in TRANSCRIPT_SCHEMA.fields
)


def transcripts_spark_df(
    spark,
    n_convs: int,
    seed: int = 42,
    lo: int = 5,
    hi: int = 40,
    skew_every: int = 0,
    partitions: Optional[int] = None,
):
    """Generate the transcripts table distributed: one task generates a
    range of conversations (per-conv seeding makes any split identical to
    single-process generation)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for cid in pdf["id"].tolist():
                rows.extend(generate_conversation(seed, int(cid), lo, hi, skew_every))
            yield rows_to_pandas(rows)

    return spark.range(0, n_convs, 1, parts).mapInPandas(gen, TRANSCRIPT_DDL)
