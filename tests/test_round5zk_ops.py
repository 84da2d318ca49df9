"""Round-5 batch-39 operators on crafted inputs, verified against
independent Python computations: normalization_ladder_dedup (which
rung reveals which duplicate), wasserstein_length_matrix (closed-form
and reference W1), rmst_survival (KM step-integral incl. censoring)."""

from __future__ import annotations

import datetime as dt
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _RMST_HORIZON,
    q_normalization_ladder_dedup,
    q_rmst_survival,
    q_wasserstein_length_matrix,
)

_EPOCH = dt.datetime(1970, 1, 1)
_WEEK = 604800


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_nchars(spark, path, rows):
    spark.createDataFrame(
        [(i, "x", "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_user_weeks(spark, path, user_weeks):
    rows, eid = [], 0
    for u, weeks in user_weeks.items():
        for w in weeks:
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=w * _WEEK + u),
                         u, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --------------------------------------------------- normalization_ladder_dedup


def _ladder_py(texts):
    def alnum(t):
        return " ".join(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)

    rungs = {
        1: [t for t in texts],
        2: [re.sub(r"\s+", " ", t).strip() for t in texts],
        3: [re.sub(r"\s+", " ", t).strip().lower() for t in texts],
        4: [alnum(t) for t in texts],
    }
    out = {}
    prev = 0
    for rid in sorted(rungs):
        vals = rungs[rid]
        dups = len(vals) - len(set(vals))
        out[rid] = {"n_docs": len(vals), "n_distinct": len(set(vals)),
                    "n_dups": dups,
                    "dup_rate": round(dups / len(vals), 4),
                    "extra_dups_vs_prev": dups - prev}
        prev = dups
    return out


def test_ladder_attributes_each_dup_to_its_rung(spark, tmp_path):
    texts = [
        "hello world example",
        "hello world example",          # raw dup
        "hello   world\texample",       # whitespace-only variant
        "HELLO World Example",          # case variant
        "hello, world... example!",     # punctuation variant
        "a completely different doc",
    ]
    _write_docs(spark, tmp_path, texts)
    want = _ladder_py(texts)
    got = {r["rung_id"]: r
           for r in q_normalization_ladder_dedup(spark,
                                                 str(tmp_path)).collect()}
    assert [got[i]["rung"] for i in (1, 2, 3, 4)] == [
        "raw", "whitespace", "lowercase", "alnum_tokens"]
    for rid, w in want.items():
        for k, v in w.items():
            assert got[rid][k] == v, (rid, k, got[rid][k], v)
    # each rung reveals exactly one more duplicate in this fixture
    assert [got[i]["n_dups"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert all(got[i]["extra_dups_vs_prev"] == 1 for i in (2, 3, 4))


def test_ladder_monotone_by_construction(spark, tmp_path):
    texts = [f"doc number {i} body" for i in range(10)]
    _write_docs(spark, tmp_path, texts)
    rows = q_normalization_ladder_dedup(spark, str(tmp_path)).collect()
    dups = [r["n_dups"] for r in rows]
    assert dups == sorted(dups)       # coarser digest never un-dups
    assert dups[0] == 0


# ---------------------------------------------------- wasserstein_length_matrix


def _w1_py(rows):
    per_src: dict[str, list[int]] = {}
    for s, n in rows:
        per_src.setdefault(s, []).append(n)
    names = sorted(per_src)
    out = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            xa, xb = per_src[a], per_src[b]
            vs = sorted(set(xa) | set(xb))
            ca = Counter(xa)
            cb = Counter(xb)
            cuma = cumb = 0
            w1 = 0.0
            for v, vn in zip(vs, vs[1:]):
                cuma += ca.get(v, 0)
                cumb += cb.get(v, 0)
                w1 += abs(cuma / len(xa) - cumb / len(xb)) * (vn - v)
            out[(a, b)] = round(w1, 3)
    return out


def test_w1_closed_form_shift(spark, tmp_path):
    rows = [("a", 10), ("a", 10), ("b", 20), ("b", 20)]
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_wasserstein_length_matrix(spark, str(tmp_path)).collect()
    assert len(r) == 1
    assert r[0]["source_a"] == "a" and r[0]["source_b"] == "b"
    assert r[0]["w1_chars"] == 10.0     # pure translation by 10 chars
    assert r[0]["n_a"] == 2 and r[0]["n_b"] == 2


def test_w1_matrix_matches_python(spark, tmp_path):
    rows = [("a", v) for v in (10, 20, 30, 30, 50)]
    rows += [("b", v) for v in (15, 25, 35, 45)]
    rows += [("c", v) for v in (10, 20, 30, 30, 50)]  # identical to a
    _write_docs_nchars(spark, tmp_path, rows)
    want = _w1_py(rows)
    got = {(r["source_a"], r["source_b"]): r["w1_chars"]
           for r in q_wasserstein_length_matrix(spark,
                                                str(tmp_path)).collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got[("a", "c")] == 0.0       # identical distributions


# --------------------------------------------------------------- rmst_survival


def _rmst_py(user_weeks):
    w_end = max(max(ws) for ws in user_weeks.values())
    ages: Counter = Counter()
    deaths: Counter = Counter()
    for ws in user_weeks.values():
        t = max(ws) - min(ws)
        ages[t] += 1
        if max(ws) != w_end:
            deaths[t] += 1
    s_tab = {}
    s = 1.0
    remaining = sum(ages.values())
    n_users = remaining
    for a in sorted(ages):
        r = sum(c for t, c in ages.items() if t >= a)
        s *= max(1 - deaths.get(a, 0) / r, 1e-15)
        s_tab[a] = round(s, 4)

    def s_at(k):
        cands = [a for a in s_tab if a <= k]
        return s_tab[max(cands)] if cands else 1.0

    rmst = sum(s_at(k - 1) for k in range(_RMST_HORIZON))
    med = next((a for a in sorted(s_tab) if s_tab[a] < 0.5), None)
    return {
        "n_users": n_users,
        "horizon_weeks": _RMST_HORIZON,
        "km_entering_final_week": round(s_at(_RMST_HORIZON - 2), 4),
        "rmst_weeks": round(rmst, 4),
        "median_survival_week": med,
    }


def test_rmst_matches_python_km_integral(spark, tmp_path):
    user_weeks = {}
    # heavy churn at ages 1-2, a few long-lived users, censored tails
    for u in range(1, 7):
        user_weeks[u] = [0, 1]           # die at age 1
    for u in range(7, 10):
        user_weeks[u] = [0, 1, 2]        # die at age 2
    for u in range(10, 12):
        user_weeks[u] = [0, 4]           # die at age 4
    user_weeks[12] = [2, 10]             # censored (alive at final week)
    user_weeks[13] = [0, 10]             # censored
    _write_user_weeks(spark, tmp_path, user_weeks)
    want = _rmst_py(user_weeks)
    r = q_rmst_survival(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    assert 0 < r["rmst_weeks"] <= _RMST_HORIZON


def test_rmst_no_churn_median_null_full_horizon(spark, tmp_path):
    w_end = 9
    user_weeks = {u: [0, w_end] for u in range(1, 6)}  # all censored
    _write_user_weeks(spark, tmp_path, user_weeks)
    r = q_rmst_survival(spark, str(tmp_path)).collect()[0]
    assert r["median_survival_week"] is None
    assert r["rmst_weeks"] == float(_RMST_HORIZON)
    assert r["km_entering_final_week"] == 1.0
