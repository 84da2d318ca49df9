"""Round-5 batch-67 operators on crafted inputs, verified against
independent Python computations: alignment_uniformity_audit
(Wang-Isola pair metrics with deterministic pairings),
cow_write_amplification (copy-on-write vs merge-on-read rewrite
model), split_half_reliability (Spearman-Brown split-half of the
hashed classifier).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    _COW_BUCKETS,
    q_alignment_uniformity_audit,
    q_cow_write_amplification,
    q_split_half_reliability,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _r2(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.01"),
                                     rounding=ROUND_HALF_UP))



def _r4(x):
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.0001"),
                                     rounding=ROUND_HALF_UP))


def _md5u(s, lo=0):
    return int(hashlib.md5(s.encode()).hexdigest()[lo:lo + 8], 16)


def _write_emb(spark, path, rows):
    """rows: (vec_id, [floats], label)"""
    spark.createDataFrame(
        [(i, [float(x) for x in v], lb) for i, v, lb in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _write_events(spark, path, rows):
    """rows: (day, user_id, n_copies)"""
    out, eid = [], 0
    for day, uid, n in rows:
        for _ in range(n):
            eid += 1
            out.append((eid, _EPOCH + dt.timedelta(days=day, seconds=eid),
                        uid, "e", 1.0, "{}"))
    spark.createDataFrame(
        out,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, texts):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------- alignment / uniformity


def _f32(v):
    import numpy as np

    return [float(np.float32(x)) for x in v]


def _au_ref(rows):
    zs = {}
    for vid, v, lb in rows:
        v = _f32(v)
        nrm = max(math.sqrt(sum(x * x for x in v)), 1e-30)
        zs[vid] = ([x / nrm for x in v], lb)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    pos = []
    bylab = {}
    for vid in sorted(zs):
        bylab.setdefault(zs[vid][1], []).append(vid)
    for lab, ids in bylab.items():
        for a, b in zip(ids, ids[1:]):
            pos.append(d2(zs[a][0], zs[b][0]))
    rnd_order = sorted(zs, key=lambda vid: (
        hashlib.md5(f"{vid}:au".encode()).hexdigest(), vid))
    rnd = [d2(zs[a][0], zs[b][0])
           for a, b in zip(rnd_order, rnd_order[1:])]
    align = sum(pos) / len(pos)
    unif = math.log(sum(math.exp(-2 * d) for d in rnd) / len(rnd))
    verdict = ("aligned_and_uniform" if align < 0.5 and unif < -1
               else "aligned_but_collapsed" if align < 0.5
               else "uniform_but_scattered" if unif < -1
               else "poor_geometry")
    return (len(zs), len(pos), _r4(align), len(rnd), _r4(unif), verdict)


def test_au_matches_reference(spark, tmp_path):
    # four orthogonal label clusters on the sphere: same-label pairs
    # nearly coincide, cross-label pairs sit at distance sqrt(2)
    rows = []
    for i in range(24):
        lb = i % 4
        v = [0.0, 0.0, 0.0, 0.0, 0.02 * i]
        v[lb] = 1.0
        rows.append((i, v, lb))
    _write_emb(spark, tmp_path, rows)
    got = q_alignment_uniformity_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _au_ref(rows)
    assert got[0]["verdict"] == "aligned_and_uniform"


def test_au_collapse_detected(spark, tmp_path):
    # everything in one tight cone regardless of label: aligned pairs
    # are close (good) but random pairs are TOO close (collapse)
    rows = [(i, [1.0, 0.001 * i, 0.001 * (i % 3)], i % 2)
            for i in range(20)]
    _write_emb(spark, tmp_path, rows)
    r = q_alignment_uniformity_audit(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _au_ref(rows)
    assert r["verdict"] == "aligned_but_collapsed"


# ------------------------------------------------------------------- COW


def _cow_ref(rows):
    bd = {}
    for day, uid, n in rows:
        b = _md5u(str(uid)) % _COW_BUCKETS
        bd[(b, day)] = bd.get((b, day), 0) + n
    buckets = sorted({b for b, _ in bd})
    days = sorted({d for _, d in bd})
    total = float(sum(bd.values()))
    cow = 0.0
    finals = 0.0
    for b in buckets:
        c = 0.0
        for d in days:
            r = bd.get((b, d), 0)
            if r:
                c += r
                cow += c
        finals += c
    return {
        "n_days": len(days), "n_buckets": len(buckets),
        "total_rows": int(total),
        "cow_rewritten_rows": int(cow),
        "cow_amplification": _r2(cow / total),
        "mor_delta_rows": int(total),
        "mor_compact_rows": int(finals),
        "mor_amplification": _r2((total + finals) / total),
        "cow_over_mor": _r2(cow / (total + finals)),
    }


def test_cow_matches_reference(spark, tmp_path):
    rows = [(d, 100 + (d * 7 + j) % 9, 5 + d + j)
            for d in range(8) for j in range(4)]
    _write_events(spark, tmp_path, rows)
    got = q_cow_write_amplification(spark, str(tmp_path)).collect()
    assert len(got) == 1
    ref = _cow_ref(rows)
    for k, v in ref.items():
        assert got[0][k] == v, k


def test_cow_hot_bucket_amplifies(spark, tmp_path):
    # one user hammered every day: its bucket rewrites cumulatively
    rows = [(d, 42, 100) for d in range(10)]
    _write_events(spark, tmp_path, rows)
    r = q_cow_write_amplification(spark, str(tmp_path)).collect()[0]
    ref = _cow_ref(rows)
    assert r["cow_amplification"] == ref["cow_amplification"]
    # sum_{d<=10} d*100 / 1000 = 5.5
    assert r["cow_amplification"] == 5.5
    assert r["mor_amplification"] == 2.0
    assert r["cow_over_mor"] > 2.0


# ------------------------------------------------------------- split half


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _clf_sum(words):
    return sum(_md5u(f"w:{_md5u(w) % 4096}") % 2001 - 1000
               for w in words)


def _shr_ref(texts):
    se, so = [], []
    for t in texts:
        ws = _toks(t)
        se.append(float(_clf_sum(ws[0::2])))
        so.append(float(_clf_sum(ws[1::2])))
    n = float(len(texts))
    me, mo = sum(se) / n, sum(so) / n
    cee = sum(x * x for x in se) - n * me * me
    coo = sum(x * x for x in so) - n * mo * mo
    ceo = sum(x * y for x, y in zip(se, so)) - n * me * mo
    r = ceo / math.sqrt(cee * coo)
    sb = 2 * r / (1 + r)
    verdict = ("reliable" if sb >= 0.8 else
               "questionable" if sb >= 0.6 else "unreliable")
    return (int(n), _r4(r), _r4(sb), verdict)


def test_shr_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
             " lam mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = []
    for i in range(25):
        # docs that repeat a base word many times: halves correlate
        w = words[i % len(words)]
        filler = words[(i * 7 + 3) % len(words)]
        texts.append(((w + " ") * (6 + i % 5) + filler + " " + w).strip())
    _write_docs(spark, tmp_path, texts)
    got = q_split_half_reliability(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _shr_ref(texts)
    # repeating docs -> halves nearly identical scores
    assert got[0]["spearman_brown"] > 0.8


def test_shr_alternating_tokens_decorrelate(spark, tmp_path):
    # even positions always one word, odd positions another: the two
    # halves measure DIFFERENT constant signals per doc
    words = ("alpha beta gamma delta epsilon zeta eta theta"
             " iota kappa lam mu").split()
    texts = []
    for i in range(20):
        a, b = words[i % 6], words[6 + i % 6]
        texts.append(" ".join([a, b] * (3 + i % 4)))
    _write_docs(spark, tmp_path, texts)
    r = q_split_half_reliability(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _shr_ref(texts)


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    _write_emb(spark, tmp_path,
               [(i, [1.0 + i, float(i % 3), -0.5 * i], i % 2)
                for i in range(8)])
    _write_events(spark, tmp_path,
                  [(d, 10 + d % 3, 4) for d in range(6)])
    _write_docs(spark, tmp_path,
                ["alpha beta gamma delta"] * 4 + ["zeta eta"] * 3)
    for fn, mx in ((q_alignment_uniformity_audit, 1),
                   (q_cow_write_amplification, 1),
                   (q_split_half_reliability, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
