"""Round-5 batch-35 operators on crafted inputs, verified against
independent Python computations: triplet_margin_mine (same/diff-label
nearest neighbors + violations), kmv_distinct_error (k-minimum-values
estimates incl. the degenerate-exact branch and the union row),
split_distinguishability_auc (midrank Mann-Whitney AUC of classifier
scores across a hash split)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _KMV_K,
    _KMV_SCALE,
    _SPLIT_TEST_MOD,
    _TRIPLET_SAMPLE_MOD,
    q_kmv_distinct_error,
    q_split_distinguishability_auc,
    q_triplet_margin_mine,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _write_embeddings(spark, path, rows):
    """rows: (vec_id, [floats], label)."""
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_events_users(spark, path, type_users):
    rows, eid = [], 0
    for t, users in type_users.items():
        for u in users:
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(seconds=eid), u,
                         t, 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# --------------------------------------------------------- triplet_margin_mine


def _triplet_py(rows):
    out = {}
    for qid, qv, ql in rows:
        if qid % _TRIPLET_SAMPLE_MOD != 0:
            continue
        same, diff = None, None
        for oid, ov, ol in rows:
            if oid == qid:
                continue
            d2 = round(sum((a - b) ** 2 for a, b in zip(qv, ov)), 4)
            if ol == ql:
                same = d2 if same is None else min(same, d2)
            else:
                diff = d2 if diff is None else min(diff, d2)
        if same is not None and diff is not None:
            out[qid] = {
                "label": ql, "d2_same": same, "d2_diff": diff,
                "margin": round(diff - same, 4),
                "violated": int(diff < same),
            }
    return out


def test_triplet_margins_and_violation(spark, tmp_path):
    rows = [
        (0, [0.0], 0), (1, [1.0], 0), (2, [2.0], 0),
        (4, [9.0], 0),                 # label-0 anchor stranded near label 1
        (10, [10.0], 1), (11, [11.0], 1),
        (8, [10.5], 1),                # label-1 anchor inside its own cluster
    ]
    _write_embeddings(spark, tmp_path, rows)
    want = _triplet_py(rows)
    got = {r["query_id"]: r
           for r in q_triplet_margin_mine(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for qid, w in want.items():
        for k, v in w.items():
            assert got[qid][k] == v, (qid, k, got[qid][k], v)
    assert got[0]["violated"] == 0 and got[0]["margin"] > 0
    assert got[4]["violated"] == 1 and got[4]["margin"] < 0


def test_triplet_single_label_emits_nothing(spark, tmp_path):
    _write_embeddings(
        spark, tmp_path, [(0, [0.0], 7), (1, [1.0], 7), (4, [2.0], 7)])
    assert q_triplet_margin_mine(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------- kmv_distinct_error


def _kmv_py(type_users):
    def est(users):
        hs = sorted({_md5int(str(u)) for u in users})
        n = len(hs)
        if n < _KMV_K:
            return float(n), n, 1
        return (_KMV_K - 1) * float(_KMV_SCALE) / hs[_KMV_K - 1], n, 0
    out = {}
    for t, users in type_users.items():
        e, n, deg = est(users)
        out[t] = {"n_exact": n, "kmv_estimate": round(e, 2),
                  "rel_err": round(abs(e - n) / n, 4),
                  "degenerate_exact": deg}
    all_users = set().union(*type_users.values())
    e, n, deg = est(all_users)
    out["(all)"] = {"n_exact": n, "kmv_estimate": round(e, 2),
                    "rel_err": round(abs(e - n) / n, 4),
                    "degenerate_exact": deg}
    return out


def test_kmv_estimates_and_union_row(spark, tmp_path):
    type_users = {
        "view": set(range(1, 151)),       # 150 > k: real estimate
        "click": set(range(1, 21)),       # 20 < k: degenerate exact
        "purchase": set(range(100, 260)),  # overlaps view partially
    }
    _write_events_users(
        spark, tmp_path,
        {t: sorted(u) + sorted(u)[:5] for t, u in type_users.items()})
    want = _kmv_py(type_users)
    got = {r["scope"]: r
           for r in q_kmv_distinct_error(spark, str(tmp_path)).collect()}
    assert set(got) == set(want)
    for scope, w in want.items():
        for k, v in w.items():
            assert got[scope][k] == v, (scope, k, got[scope][k], v)
    assert got["click"]["degenerate_exact"] == 1
    assert got["click"]["rel_err"] == 0.0
    assert got["view"]["degenerate_exact"] == 0
    # a 64-minima sketch lands within ~35% at n=150 with this fixed hash
    assert got["view"]["rel_err"] < 0.35


# ------------------------------------------------ split_distinguishability_auc


def _split_auc_py(texts):
    recs = []
    for i, t in enumerate(texts, 1):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        is_test = int(_md5int(str(i)) % _SPLIT_TEST_MOD == 0)
        recs.append((prob, is_test))
    per_v = sorted(Counter(recs).items())
    # collapse to per-prob (ct, cr, c) in prob order
    by_prob: dict[float, list[int]] = {}
    for (prob, is_test), c in per_v:
        cell = by_prob.setdefault(prob, [0, 0, 0])
        cell[0] += c * is_test
        cell[1] += c * (1 - is_test)
        cell[2] += c
    cum = 0
    r2t = 0
    nt = sum(v[0] for v in by_prob.values())
    nr = sum(v[1] for v in by_prob.values())
    for prob in sorted(by_prob):
        ct, cr, c = by_prob[prob]
        r2t += ct * (2 * cum + c + 1)
        cum += c
    auc = (r2t / 2.0 - nt * (nt + 1) / 2.0) / (nt * float(nr))
    se = math.sqrt((nt + nr + 1) / (12.0 * nt * nr))
    return {
        "n_train": nr, "n_test": nt, "auc": round(auc, 4),
        "abs_dev": round(abs(auc - 0.5), 4), "h0_se": round(se, 4),
        "split_clean": int(round(abs(auc - 0.5), 4)
                           <= round(1.96 * se, 4)),
    }


def test_split_auc_matches_python_and_is_clean(spark, tmp_path):
    texts = []
    for i in range(60):
        words = [f"tok{i}x{j}" for j in range(4 + i % 9)]
        body = " ".join(words)
        texts.append((body + ". " + body.upper() + ",") * (3 + i % 5))
    _write_docs(spark, tmp_path, texts)
    want = _split_auc_py(texts)
    assert want["n_test"] >= 3  # the hash split actually selected docs
    r = q_split_distinguishability_auc(spark, str(tmp_path)).collect()[0]
    for k, v in want.items():
        assert r[k] == v, (k, r[k], v)
    # a pure hash split carries no signal: AUC must sit in the H0 band
    assert r["split_clean"] == 1
    assert 0.0 <= r["auc"] <= 1.0
