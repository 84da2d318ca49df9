"""Round-5 batch-82 operators on crafted inputs, verified against
independent Python computations: tukey_nonadditivity (1-df interaction
test on the source x lang grid), quantizer_metric_disagreement (L2 vs
dot medoid routing), winners_curse_audit (Blom max-of-K selection-bias
correction).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pdf_extractor_spark.queries import (
    _QNORM_A,
    _QNORM_B,
    _QNORM_C,
    _QNORM_D,
    _QNORM_PHIGH,
    q_quantizer_metric_disagreement,
    q_tukey_nonadditivity,
    q_winners_curse_audit,
)


def _r(x, n=4):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _md5u(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _qnorm(p):
    a, b, c, d = _QNORM_A, _QNORM_B, _QNORM_C, _QNORM_D
    if p <= _QNORM_PHIGH:
        q = p - 0.5
        r = q * q
        return ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                  + a[4]) * r + a[5]) * q
                / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                    + b[4]) * r + 1))
    u = math.sqrt(-2.0 * math.log(1.0 - p))
    return (-(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u
              + c[4]) * u + c[5])
            / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1))


def _write_docs(spark, path, rows):
    """rows: (doc_id, lang, source, n_chars)"""
    spark.createDataFrame(
        [(i, "w", l, s, n) for i, l, s, n in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ------------------------------------------------------------------- tukey


def _tukey_ref(rows):
    cells = defaultdict(list)
    for _i, l, s, n in rows:
        if n > 0:
            cells[(s, l)].append(math.log(n))
    y = {k: sum(v) / len(v) for k, v in cells.items()}
    srcs = sorted({s for s, _ in y})
    langs = sorted({l for _, l in y})
    g = sum(y.values()) / len(y)
    rm = {s: sum(y[(s, l)] for l in langs) / len(langs) for s in srcs}
    cm = {l: sum(y[(s, l)] for s in srcs) / len(srcs) for l in langs}
    ss_res = sum((y[(s, l)] - rm[s] - cm[l] + g) ** 2
                 for s in srcs for l in langs)
    num = sum((rm[s] - g) * (cm[l] - g) * y[(s, l)]
              for s in srcs for l in langs)
    ssr = sum((rm[s] - g) ** 2 for s in srcs)
    ssc = sum((cm[l] - g) ** 2 for l in langs)
    ss_na = num * num / (ssr * ssc)
    df2 = (len(srcs) - 1) * (len(langs) - 1) - 1
    f = ss_na / ((ss_res - ss_na) / df2)
    verdict = ("interaction_present" if f > 3.84 + 8.53 / df2
               else "additive_ok")
    return (len(srcs), len(langs), _r(ss_res, 6), _r(ss_na, 6),
            _r(f), df2, verdict)


def _grid_rows(interaction=False):
    # multiplicative structure with the SAME per-index noise factor in
    # every cell: exactly additive in logs (up to integer rounding), so
    # the null fixture genuinely satisfies the additive model
    rows, did = [], 0
    for s, base in [("a", 200), ("b", 400), ("c", 300)]:
        for l, mult in [("en", 1.0), ("de", 1.3), ("fr", 0.8)]:
            for i in range(12):
                did += 1
                n = int(round(base * mult * (100 + (i * 37) % 40) / 100.0))
                if interaction and s == "b" and l == "de":
                    n *= 4
                rows.append((did, l, s, n))
    return rows


def test_tukey_interaction_detected(spark, tmp_path):
    rows = _grid_rows(interaction=True)
    _write_docs(spark, tmp_path, rows)
    got = q_tukey_nonadditivity(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _tukey_ref(rows)
    assert got[0]["verdict"] == "interaction_present"


def test_tukey_additive_grid_ok(spark, tmp_path):
    rows = _grid_rows(interaction=False)
    _write_docs(spark, tmp_path, rows)
    r = q_tukey_nonadditivity(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _tukey_ref(rows)
    # multiplicative base*mult IS additive in logs: residuals tiny
    assert r["verdict"] == "additive_ok"
    assert r["ss_residual"] < 0.01


# -------------------------------------------------- metric disagreement


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(vid, [float(x) for x in v], 0) for vid, v in vecs],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet")


def _qmd_ref(vecs):
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    emap = {vid: [f32(x) for x in v] for vid, v in vecs}
    meds = sorted(emap, key=lambda vid: (_md5u(str(vid)), vid))[:8]
    nd = 0
    for _vid, v in emap.items():
        l2a = min(meds, key=lambda m: (
            round(sum((a - b) ** 2 for a, b in zip(v, emap[m])), 6), m))
        dta = sorted(meds, key=lambda m: (
            -round(sum(a * b for a, b in zip(v, emap[m])), 6), m))[0]
        nd += l2a != dta
    n = len(emap)
    share = _r(nd / n)
    verdict = ("normalize_before_ivf" if share > 0.1
               else "metric_choice_immaterial")
    return (n, 8, nd, share, verdict)


def test_qmd_varied_norms_disagree(spark, tmp_path):
    vecs = [(vid,
             [(1.0 + 0.8 * ((vid % 7) / 7.0))
              * math.sin(vid * 0.37 + j * 0.91) for j in range(12)])
            for vid in range(1, 61)]
    _write_embeddings(spark, tmp_path, vecs)
    got = q_quantizer_metric_disagreement(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _qmd_ref(vecs)
    assert got[0]["verdict"] == "normalize_before_ivf"


def test_qmd_unit_norm_agrees(spark, tmp_path):
    vecs = []
    for vid in range(1, 41):
        raw = [math.sin(vid * 0.37 + j * 0.91) for j in range(12)]
        nrm = math.sqrt(sum(x * x for x in raw))
        vecs.append((vid, [x / nrm for x in raw]))
    _write_embeddings(spark, tmp_path, vecs)
    r = q_quantizer_metric_disagreement(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _qmd_ref(vecs)
    # on the unit sphere argmin L2 == argmax dot exactly
    assert r["n_disagree"] == 0
    assert r["verdict"] == "metric_choice_immaterial"


# --------------------------------------------------------- winner's curse


def _wc_ref(rows):
    per = defaultdict(list)
    for _i, _l, s, n in rows:
        if n > 0:
            per[s].append(math.log(n))
    stats = {}
    for s, xs in per.items():
        if len(xs) < 2:
            continue
        n = len(xs)
        m = sum(xs) / n
        s2 = (sum(x * x for x in xs) - sum(xs) * sum(xs) / n) / (n - 1)
        stats[s] = (m, math.sqrt(s2 / n))
    ordered = sorted(stats, key=lambda s: (-stats[s][0], s))
    kk = len(ordered)
    se_bar = sum(se for _m, se in stats.values()) / kk
    bias = se_bar * _qnorm((kk - 0.375) / (kk + 0.25))
    m1, m2 = stats[ordered[0]][0], stats[ordered[1]][0]
    verdict = ("winner_robust" if m1 - bias > m2
               else "winner_within_selection_noise")
    return (ordered[0], kk, _r(m1), _r(m2), _r(bias), _r(m1 - bias),
            verdict)


def test_wc_clear_winner_robust(spark, tmp_path):
    rows, did = [], 0
    for s, base in [("a", 100), ("b", 900), ("c", 150), ("d", 120)]:
        for i in range(25):
            did += 1
            rows.append((did, "en", s, base + (i * 37) % 30))
    _write_docs(spark, tmp_path, rows)
    got = q_winners_curse_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _wc_ref(rows)
    assert got[0]["winner"] == "b"
    assert got[0]["verdict"] == "winner_robust"


def test_wc_noisy_tie_not_robust(spark, tmp_path):
    # six sources drawn from the same noisy distribution: the "best"
    # is pure selection noise and must not survive the correction
    rows, did = [], 0
    for si, s in enumerate("abcdef"):
        for i in range(12):
            did += 1
            n = int(200 * math.exp(1.2 * _qnorm(
                ((si * 12 + i) * 37 % 71 + 0.5) / 71)))
            rows.append((did, "en", s, max(n, 1)))
    _write_docs(spark, tmp_path, rows)
    r = q_winners_curse_audit(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _wc_ref(rows)
    assert r["verdict"] == "winner_within_selection_noise"
    assert r["shrunk_winner_mean"] < r["winner_mean"]


# ------------------------------------------------------------ plan shapes


def test_plans_bounded_no_cartesian(spark, tmp_path):
    _write_docs(spark, tmp_path, _grid_rows())
    for fn, cap in ((q_tukey_nonadditivity, 1),
                    (q_winners_curse_audit, 1)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= cap, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
    _write_embeddings(spark, tmp_path,
                      [(vid, [float(j + vid) for j in range(8)])
                       for vid in range(1, 30)])
    plan = q_quantizer_metric_disagreement(spark, str(tmp_path)) \
        ._jdf.queryExecution().executedPlan().toString()
    # one scan builds the 8-medoid sample, one scores the corpus
    assert plan.count("Scan parquet") <= 2
    assert "CartesianProduct" not in plan
