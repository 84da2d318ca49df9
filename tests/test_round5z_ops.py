"""Round-5 batch-28 operators on crafted inputs, verified against
independent Python computations: hll_cumulative_users (merged-register
HLL timeline vs a from-scratch sketch), lsh_band_planner (S-curve
integration vs closed-form math), cdc_chunk_dedup (content-defined
chunking vs a sequential Python chunker)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    _CDC_MASK,
    _HLL_M,
    _LSH_PLAN_GRID,
    q_cdc_chunk_dedup,
    q_hll_cumulative_users,
    q_lsh_band_planner,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_user_days(spark, path, day_users):
    rows, eid = [], 0
    for d, users in enumerate(day_users):
        for u in users:
            eid += 1
            rows.append(
                (eid, _EPOCH + dt.timedelta(days=d, seconds=eid), u,
                 "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------------- hll_cumulative_users


def _hll_estimate(users) -> float:
    """From-scratch HLL over the op's exact register rule."""
    m = _HLL_M
    regs: dict[int, int] = {}
    for u in users:
        h = _md5int(str(u))
        idx, rest = h % m, h // m
        rho = 25 if rest == 0 else 25 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    c = len(regs)
    v = m - c
    s = sum(2.0 ** -mr for mr in regs.values())
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / (s + v)
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def test_hll_cum_exact_counts_and_sketch(spark, tmp_path):
    day_users = [[1, 2], [2], [3, 1], [9]]
    _write_user_days(spark, tmp_path, day_users)
    rows = q_hll_cumulative_users(spark, str(tmp_path)).collect()
    assert [r["day_index"] for r in rows] == [0, 1, 2, 3]
    assert [r["new_users"] for r in rows] == [2, 0, 1, 1]
    assert [r["cum_users_exact"] for r in rows] == [2, 2, 3, 4]
    seen: set[int] = set()
    for r, users in zip(rows, day_users):
        seen |= set(users)
        want = round(_hll_estimate(seen), 2)
        assert r["hll_estimate"] == want
        assert r["rel_error"] == round(
            abs(_hll_estimate(seen) - len(seen)) / len(seen), 4)


def test_hll_cum_gap_days_skipped_and_monotone(spark, tmp_path):
    # active days only appear; estimate is nondecreasing (register merge
    # can only raise registers)
    _write_user_days(spark, tmp_path, [[5], [], [5, 6], [], [7]])
    rows = q_hll_cumulative_users(spark, str(tmp_path)).collect()
    assert [r["day_index"] for r in rows] == [0, 2, 4]
    assert [r["cum_users_exact"] for r in rows] == [1, 2, 3]
    ests = [r["hll_estimate"] for r in rows]
    assert ests == sorted(ests)


# ----------------------------------------------------------- lsh_band_planner


def test_lsh_band_planner_closed_form(spark, tmp_path):
    # doc1 == doc2 (jaccard 1 -> bin 19); doc3 disjoint from doc2 (bin 0)
    same = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six"
    _write_docs(spark, tmp_path, [same, same, other])
    rows = {(r["rows_per_band"], r["n_bands"]): r
            for r in q_lsh_band_planner(spark, str(tmp_path)).collect()}
    assert set(rows) == {(r, b) for r, b in _LSH_PLAN_GRID}
    for (r, b), row in rows.items():
        p19 = 1.0 - (1.0 - ((19 + 0.5) / 20.0) ** r) ** b
        p0 = 1.0 - (1.0 - (0.5 / 20.0) ** r) ** b
        assert row["n_pairs"] == 2
        assert row["s50"] == round((1.0 / b) ** (1.0 / r), 4)
        assert row["exp_missed_dups"] == round(1.0 - p19, 4)
        assert row["exp_false_candidates"] == round(p0, 4)
        assert row["fn_rate"] == round(1.0 - p19, 4)
        assert row["fp_rate"] == round(p0, 4)


def test_lsh_band_planner_monotone_tradeoff(spark, tmp_path):
    same = "alpha beta gamma delta epsilon zeta"
    other = "one two three four five six"
    _write_docs(spark, tmp_path, [same, same, other])
    rows = q_lsh_band_planner(spark, str(tmp_path)).collect()
    fn = [r["fn_rate"] for r in rows]  # ordered by r
    fp = [r["fp_rate"] for r in rows]
    assert fn == sorted(fn)            # more rows/band -> more misses
    assert fp == sorted(fp, reverse=True)  # ... and fewer false candidates


# ------------------------------------------------------------ cdc_chunk_dedup


def _cdc_chunks(text: str) -> list[str]:
    toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    out: list[list[str]] = []
    cur: list[str] = []
    for w in toks:
        cur.append(w)
        if _md5int(w) % _CDC_MASK == 0:
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return [" ".join(c) for c in out]


def _cdc_expect(texts):
    chunks: list[str] = []
    for t in texts:
        chunks.extend(_cdc_chunks(t))
    groups: dict[str, int] = {}
    for c in chunks:
        groups[c] = groups.get(c, 0) + 1
    n, d = len(chunks), len(groups)
    chars_total = sum(len(c) * k for c, k in groups.items())
    chars_dedupable = sum(len(c) * (k - 1) for c, k in groups.items())
    return {
        "n_chunks": n,
        "n_distinct_chunks": d,
        "dup_chunk_rate": round(1.0 - d / n, 4),
        "mean_chunk_words": round(
            sum(len(c.split(" ")) * k for c, k in groups.items()) / n, 2),
        "chars_total": chars_total,
        "chars_dedupable": chars_dedupable,
        "savings_rate": round(chars_dedupable / chars_total, 4),
    }


def _boundary_word() -> str:
    for i in range(10000):
        w = f"w{i}"
        if _md5int(w) % _CDC_MASK == 0:
            return w
    raise AssertionError("no boundary word found")


def test_cdc_matches_sequential_python_chunker(spark, tmp_path):
    bw = _boundary_word()
    texts = [
        f"shared prefix {bw} unique tail one",
        f"shared prefix {bw} unique tail one",   # exact duplicate doc
        f"shared prefix {bw} different ending two",  # shares chunk 1 only
        "totally unrelated content here",
    ]
    # the crafted boundary must actually split: chunk 1 of the first three
    # docs is identical, their tails differ
    assert _cdc_chunks(texts[0])[0] == _cdc_chunks(texts[2])[0]
    assert len(_cdc_chunks(texts[0])) >= 2
    _write_docs(spark, tmp_path, texts)
    row = q_cdc_chunk_dedup(spark, str(tmp_path)).collect()[0]
    want = _cdc_expect(texts)
    assert {k: row[k] for k in want} == want


def test_cdc_insertion_shifts_only_one_chunk(spark, tmp_path):
    # the CDC property itself: an insertion BEFORE the boundary word
    # changes the first chunk but every later chunk still dedups
    bw = _boundary_word()
    a = f"intro words {bw} stable middle {bw} stable tail"
    b = f"intro inserted words {bw} stable middle {bw} stable tail"
    ca, cb = _cdc_chunks(a), _cdc_chunks(b)
    assert ca[0] != cb[0] and ca[1:] == cb[1:]
    _write_docs(spark, tmp_path, [a, b])
    row = q_cdc_chunk_dedup(spark, str(tmp_path)).collect()[0]
    want = _cdc_expect([a, b])
    assert {k: row[k] for k in want} == want
    assert row["dup_chunk_rate"] > 0.0


def test_cdc_no_tokens_docs_yield_no_chunks(spark, tmp_path):
    _write_docs(spark, tmp_path, ["!!! ???", "real words live here"])
    row = q_cdc_chunk_dedup(spark, str(tmp_path)).collect()[0]
    want = _cdc_expect(["real words live here"])
    assert {k: row[k] for k in want} == want
