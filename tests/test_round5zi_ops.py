"""Round-5 batch-37 operators on crafted inputs, verified against
independent Python computations: cochran_q_filters (matched-sample Q
over the three gates vs a per-doc flag walk), welch_anova_lengths
(heteroskedastic F*, df2, Wilson-Hilferty criterion vs direct moment
algebra), padding_waste_audit (three padding policies vs a sequential
fold).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    _PACK_BUDGET,
    q_cochran_q_filters,
    q_padding_waste_audit,
    q_welch_anova_lengths,
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_docs_nchars(spark, path, rows):
    """rows: (source, n_chars); text is a synthetic pad of that size."""
    spark.createDataFrame(
        [(i, "x" * n, "en", s, n) for i, (s, n) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# -------------------------------------------------------- cochran_q_filters


def _cq_expected(texts):
    g = [0, 0, 0]
    sl = sl2 = 0
    for t in texts:
        n = len(t)
        punct = len(re.findall(r"[.!?,;:]", t))
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000
            for w in _toks(t))
        flags = [
            1 if 200 <= n <= 50000 else 0,
            1 if 0.005 <= punct / max(n, 1) <= 0.2 else 0,
            1 if score >= 0 else 0,
        ]
        for j, f in enumerate(flags):
            g[j] += f
        li = sum(flags)
        sl += li
        sl2 += li * li
    denom = 3.0 * sl - sl2
    q = (2.0 * (3.0 * sum(x * x for x in g) - sum(g) ** 2) / denom
         if denom else None)
    verdict = ("gates_disagree" if q is not None and q > 5.9915
               else "gates_equivalent")
    return (len(texts), g[0], g[1], g[2],
            round(q, 4) if q is not None else None, verdict)


def test_cochran_q_matches_python(spark, tmp_path):
    texts = [
        ("alpha beta gamma. " * 20)[:250],     # len ok, punct ok
        "tiny.",                                # len fails
        ("delta epsilon " * 30)[:350],          # no punct
        ("zeta eta theta, iota. " * 16)[:300],
        ("kappa " * 60)[:280],                  # no punct
        ("lam mu nu. xi! " * 25)[:310],
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = q_cochran_q_filters(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _cq_expected(texts)


def test_cochran_q_disagreeing_gates_flagged(spark, tmp_path):
    """Length gate passes everything, punct gate fails everything:
    maximal disagreement on matched docs -> Q = 2k per-doc discordance
    blows past the chi2 criterion."""
    texts = [(f"word{i} " * 60)[:260] for i in range(12)]   # no punct
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    r = q_cochran_q_filters(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _cq_expected(texts)
    assert r.pass_len == 12
    assert r.pass_punct == 0
    assert r.verdict == "gates_disagree"


# ------------------------------------------------------ welch_anova_lengths


def _welch_expected(rows):
    per: dict[str, list[int]] = {}
    for s, n in rows:
        per.setdefault(s, []).append(n)
    groups = []
    for s in sorted(per):
        v = per[s]
        nj = float(len(v))
        if nj < 2:
            continue
        mj = sum(v) / nj
        s2 = sum((x - mj) ** 2 for x in v) / (nj - 1)
        if s2 > 0:
            groups.append((nj, mj, s2))
    k = float(len(groups))
    n = sum(nj for nj, _, _ in groups)
    wsum = sum(nj / s2 for nj, _, s2 in groups)
    xw = sum((nj / s2) * mj for nj, mj, s2 in groups) / wsum
    num = sum((nj / s2) * (mj - xw) ** 2 for nj, mj, s2 in groups) / (k - 1)
    hsum = sum((1.0 - (nj / s2) / wsum) ** 2 / (nj - 1)
               for nj, _, s2 in groups)
    fstat = num / (1.0 + 2.0 * (k - 2) / (k * k - 1) * hsum)
    df2 = (k * k - 1) / (3.0 * hsum)
    df1 = k - 1
    crit = df1 * (1.0 - 2.0 / (9.0 * df1)
                  + 1.6449 * math.sqrt(2.0 / (9.0 * df1))) ** 3
    verdict = "means_differ" if fstat > crit / df1 else "means_consistent"
    return (int(n), int(k), round(fstat, 4), int(df1), round(df2, 2),
            round(crit / df1, 4), verdict)


def _welch_rows(shift):
    rows = []
    for i in range(40):
        rows.append(("tight", 1000 + (i * 7) % 50))
    for i in range(25):
        rows.append(("wide", 1000 + shift + (i * 97) % 900))
    for i in range(30):
        rows.append(("mid", 1000 + shift // 2 + (i * 31) % 200))
    return rows


def test_welch_matches_python_and_flags_shift(spark, tmp_path):
    rows = _welch_rows(shift=800)
    _write_docs_nchars(spark, tmp_path, rows)
    got = q_welch_anova_lengths(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _welch_expected(rows)
    assert got[0].verdict == "means_differ"


def test_welch_equal_means_consistent(spark, tmp_path):
    """Same-mean groups with very different variances: classical ANOVA's
    failure case, Welch stays calm."""
    rows = []
    for i in range(40):
        rows.append(("tight", 1000 + (-1) ** i * (i % 5)))       # ~1000
    for i in range(40):
        rows.append(("wide", 1000 + (-1) ** i * ((i * 37) % 400)))  # ~1000
    _write_docs_nchars(spark, tmp_path, rows)
    r = q_welch_anova_lengths(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _welch_expected(rows)
    assert r.verdict == "means_consistent"


# ------------------------------------------------------ padding_waste_audit


def _pad_expected(texts):
    docs = 0
    tok = 0.0
    w128 = wgeo = wfix = 0.0
    for t in texts:
        n = min(float(len(_toks(t))), float(_PACK_BUDGET))
        docs += 1
        tok += n
        w128 += math.ceil(n / 128.0) * 128.0 - n
        for b in (128.0, 256.0, 512.0, 1024.0, 2048.0):
            if n <= b:
                wgeo += b - n
                break
        wfix += _PACK_BUDGET - n
    return (docs, int(tok),
            round(wfix / (tok + wfix), 4),
            round(wgeo / (tok + wgeo), 4),
            round(w128 / (tok + w128), 4),
            round(wfix / w128, 2) if w128 else None,
            int(math.ceil(tok / _PACK_BUDGET)))


def test_padding_waste_matches_python(spark, tmp_path):
    texts = [
        "w " * 50,            # 50 tokens -> bucket 128
        "x " * 300,           # 300 -> bucket 512
        "y " * 1100,          # 1100 -> bucket 2048
        "z " * 3000,          # clamped to 2048 -> zero waste everywhere
        "a b c",              # 3 tokens
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = q_padding_waste_audit(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert tuple(got[0]) == _pad_expected(texts)


def test_padding_policy_ordering(spark, tmp_path):
    """Fixed-length padding always wastes >= geometric buckets >=
    pad-to-128 (policies are strictly nested refinements)."""
    texts = [("tok " * (37 * i + 11))[: (37 * i + 11) * 4]
             for i in range(1, 15)]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    r = q_padding_waste_audit(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _pad_expected(texts)
    assert r.pad_share_fixed >= r.pad_share_buckets >= r.pad_share_mult128
    assert r.fixed_over_mult128 >= 1.0


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_cochran_q_single_scan(spark):
    final = _final(q_cochran_q_filters(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_welch_rides_checkpoint(spark):
    final = _final(q_welch_anova_lengths(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_padding_waste_single_scan(spark):
    final = _final(q_padding_waste_audit(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final
