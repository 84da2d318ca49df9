"""Round-5 batch-47 operators on crafted inputs, verified against
independent Python computations: textrank_keywords (damped centrality
over the co-occurrence graph), ipf_raking_weights (3-round raking onto
reference marginals), dunn_posthoc_sources (tie-corrected pairwise
rank z after Kruskal-Wallis)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from pdf_extractor_spark.queries import (
    q_dunn_posthoc_sources,
    q_ipf_raking_weights,
    q_textrank_keywords,
)

_STOP = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
         "on", "as", "with", "was", "are"}


def _write_docs(spark, path, rows):
    """rows: (doc_id, text, lang, source)"""
    spark.createDataFrame(
        [(i, t, lg, s, len(t) if t else 0) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_nchars(spark, path, pairs):
    """pairs: (source, n_chars)"""
    spark.createDataFrame(
        [(i + 1, "x", "en", s, n) for i, (s, n) in enumerate(pairs)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# -------------------------------------------------------- textrank_keywords


def _textrank_ref(texts, vocab_cap=50, topk=20):
    toks = [[w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for t in texts]
    uni = Counter(w for ts in toks for w in ts
                  if len(w) >= 2 and w not in _STOP)
    vocab = set(w for w, _ in sorted(
        uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap])
    w = defaultdict(float)
    for ts in toks:
        for x, y in zip(ts, ts[1:]):
            if x in vocab and y in vocab and x != y:
                w[(x, y)] += 1.0
                w[(y, x)] += 1.0
    deg = defaultdict(float)
    for (x, _), c in w.items():
        deg[x] += c
    nodes = sorted(deg)
    v = float(len(nodes))
    r = {x: 1.0 / v for x in nodes}
    for _ in range(3):
        r = {y: 0.15 / v + 0.85 * sum(w[(x, y)] / deg[x] * r[x]
                                      for x in nodes if (x, y) in w)
             for y in nodes}
    ranked = sorted(nodes, key=lambda x: (-round(r[x], 6), x))[:topk]
    return [(x, round(r[x], 6), int(deg[x])) for x in ranked]


def test_textrank_hub_word_wins(spark, tmp_path):
    texts = [
        "engine tuning guide engine tuning",
        "engine noise report engine noise",
        "tuning noise engine tuning noise",
        "unrelated words elsewhere entirely",
    ]
    _write_docs(spark, tmp_path,
                [(i + 1, t, "en", "s") for i, t in enumerate(texts)])
    got = [(r["word"], r["textrank"], r["degree_w"])
           for r in q_textrank_keywords(spark, str(tmp_path)).collect()]
    expect = _textrank_ref(texts)
    assert got == expect
    assert got[0][0] == "engine"  # the hub


def test_textrank_stopwords_and_short_tokens_excluded(spark, tmp_path):
    texts = ["the cat and the dog in a box", "cat dog cat dog"]
    _write_docs(spark, tmp_path,
                [(i + 1, t, "en", "s") for i, t in enumerate(texts)])
    words = {r["word"]
             for r in q_textrank_keywords(spark, str(tmp_path)).collect()}
    assert "the" not in words and "a" not in words and "in" not in words
    assert {"cat", "dog"} <= words
    # 'box' is only ever adjacent to stopwords -> isolated, not ranked
    assert "box" not in words


# ------------------------------------------------------- ipf_raking_weights


def _ipf_ref(old_cells, new_cells, rounds=3):
    t1 = sum(old_cells.values())
    t2 = sum(new_cells.values())
    srcs = {s for s, _ in old_cells} | {s for s, _ in new_cells}
    lgs = {l for _, l in old_cells} | {l for _, l in new_cells}
    t_row = {s: sum(old_cells.get((s, l), 0) for l in lgs) * t2 / t1
             for s in srcs}
    t_col = {l: sum(old_cells.get((s, l), 0) for s in srcs) * t2 / t1
             for l in lgs}
    cells = {k: float(v) for k, v in new_cells.items()}
    # include zero-n2 cells present only in the old half
    for k in old_cells:
        cells.setdefault(k, 0.0)
    w = {k: 1.0 for k in cells}
    for _ in range(rounds):
        for s in srcs:
            tot = sum(cells[k] * w[k] for k in cells if k[0] == s)
            f = t_row[s] / tot if tot else 0.0
            for k in cells:
                if k[0] == s:
                    w[k] = w[k] * f if tot else 0.0
        for l in lgs:
            tot = sum(cells[k] * w[k] for k in cells if k[1] == l)
            f = t_col[l] / tot if tot else 0.0
            for k in cells:
                if k[1] == l:
                    w[k] = w[k] * f if tot else 0.0
    gaps_row = {s: abs(sum(cells[k] * w[k] for k in cells if k[0] == s)
                       - t_row[s]) for s in srcs}
    gaps_col = {l: abs(sum(cells[k] * w[k] for k in cells if k[1] == l)
                       - t_col[l]) for l in lgs}
    return w, gaps_row, gaps_col


def test_ipf_matches_python_reference(spark, tmp_path):
    # ids 0..99, cut = floor(99*0.8) = 79: old = 0..78, new = 79..99
    # old half: balanced 2x2-ish; new half: skewed toward (s1, en)
    plan_old = [("s1", "en")] * 30 + [("s1", "de")] * 10 \
        + [("s2", "en")] * 19 + [("s2", "de")] * 20
    plan_new = [("s1", "en")] * 14 + [("s1", "de")] * 2 \
        + [("s2", "en")] * 2 + [("s2", "de")] * 3
    rows = [(i, "x", l, s) for i, (s, l) in enumerate(plan_old + plan_new)]
    _write_docs(spark, tmp_path, rows)
    old_cells = Counter(plan_old)
    new_cells = Counter(plan_new)
    w, gr, gc = _ipf_ref(old_cells, new_cells)
    out = {(r["source"], r["lang"]): r
           for r in q_ipf_raking_weights(spark, str(tmp_path)).collect()}
    assert set(out) == set(new_cells)
    for k, r in out.items():
        assert r["n_new"] == new_cells[k]
        assert r["weight"] == round(w[k], 6), k
        assert r["row_gap"] == round(gr[k[0]], 4)
        assert r["col_gap"] == round(gc[k[1]], 4)
    # raking must pull the skewed batch back toward the old mix:
    # (s1, en) was over-represented -> weight < 1
    assert out[("s1", "en")]["weight"] < 1.0
    assert out[("s2", "de")]["weight"] > 1.0


def test_ipf_converges_on_matchable_margins(spark, tmp_path):
    # max_id = 75 -> cut = floor(75*0.8) = 60: old = 0..59, new = 60..75;
    # new joint exactly proportional to old -> weights 1, zero gaps
    plan = [("s1", "en")] * 30 + [("s2", "de")] * 30
    new = [("s1", "en")] * 8 + [("s2", "de")] * 8
    rows = [(i, "x", l, s) for i, (s, l) in enumerate(plan + new)]
    _write_docs(spark, tmp_path, rows)
    out = q_ipf_raking_weights(spark, str(tmp_path)).collect()
    assert len(out) == 2
    for r in out:
        assert r["weight"] == 1.0
        assert r["row_gap"] == 0.0 and r["col_gap"] == 0.0


# ----------------------------------------------------- dunn_posthoc_sources


def _dunn_ref(pairs):
    from collections import Counter as C
    vals = sorted({n for _, n in pairs})
    cnt = C(n for _, n in pairs)
    mid, cum = {}, 0
    for v in vals:
        mid[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    n = float(len(pairs))
    tie = sum(t**3 - t for t in cnt.values())
    s2 = n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))
    groups = defaultdict(list)
    for s, v in pairs:
        groups[s].append(mid[v])
    out = {}
    for a in sorted(groups):
        for b in sorted(groups):
            if b > a:
                ra = sum(groups[a]) / len(groups[a])
                rb = sum(groups[b]) / len(groups[b])
                z = (ra - rb) / math.sqrt(
                    s2 * (1 / len(groups[a]) + 1 / len(groups[b])))
                out[(a, b)] = (z, z / math.sqrt(n))
    return out


def test_dunn_pairwise_z_matches_python(spark, tmp_path):
    pairs = ([("low", v) for v in (10, 12, 12, 14, 16)]
             + [("mid", v) for v in (14, 16, 18, 20)]
             + [("high", v) for v in (30, 32, 34, 36, 38, 40)])
    _write_docs_nchars(spark, tmp_path, pairs)
    expect = _dunn_ref(pairs)
    rows = q_dunn_posthoc_sources(spark, str(tmp_path)).collect()
    assert len(rows) == 3 and all(r["m_pairs"] == 3 for r in rows)
    got = {(r["source_a"], r["source_b"]):
           (r["dunn_z"], r["effect_r"], r["sig_unadj"]) for r in rows}
    for k, (z, er) in expect.items():
        gz, ger, sig = got[k]
        assert gz == round(z, 4)
        assert ger == round(er, 6)
        assert sig == (abs(z) >= 1.96)
    # the well-separated pair is significant (sanity on the scenario)
    assert abs(expect[("high", "low")][0]) >= 1.96
    assert got[("high", "low")][2]


def test_dunn_identical_values_null_guarded(spark, tmp_path):
    pairs = [("a", 5)] * 4 + [("b", 5)] * 4  # all tied: sigma^2 = 0
    _write_docs_nchars(spark, tmp_path, pairs)
    row = q_dunn_posthoc_sources(spark, str(tmp_path)).collect()[0]
    assert row["dunn_z"] is None and row["sig_unadj"] is False
