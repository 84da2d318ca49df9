"""Round-5 batch-64 operators on crafted inputs, verified against
independent Python computations: doremi_mix_update (exponentiated
-gradient domain reweighting off the hashed-classifier gate),
curriculum_schedule_audit (phase-wise quality/provenance profile of
the quality-sorted schedule), keyness_log_odds (Monroe et al.
informative-Dirichlet fightin' words between the two largest
sources).  Plan pins at the bottom."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pdf_extractor_spark.queries import (
    _DOREMI_ETA,
    _DOREMI_SMOOTH,
    _KEYNESS_ALPHA0,
    _KEYNESS_K,
    q_curriculum_schedule_audit,
    q_doremi_mix_update,
    q_keyness_log_odds,
)


def _write_docs(spark, path, rows):
    """rows: (text, source)"""
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _clf(text):
    return sum(_md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000
               for w in _toks(text))


# ------------------------------------------------------------------ doremi


def _doremi_ref(rows):
    per = {}
    for t, s in rows:
        d = per.setdefault(s, [0.0, 0.0, 0.0])   # docs, toks, fails
        d[0] += 1
        d[1] += len(_toks(t))
        d[2] += 0 if _clf(t) >= 0 else 1
    tot = sum(d[1] for d in per.values())
    k = float(len(per))
    raw = {}
    for s, (docs, toks, fails) in per.items():
        alpha = toks / tot
        loss = fails / docs
        raw[s] = (docs, alpha, loss,
                  alpha * math.exp(_DOREMI_ETA * loss))
    z = sum(r[3] for r in raw.values())
    out = []
    for s in sorted(raw):
        docs, alpha, loss, r = raw[s]
        w = (1 - _DOREMI_SMOOTH) * r / z + _DOREMI_SMOOTH / k
        out.append((s, int(docs), round(alpha, 4), round(loss, 4),
                    round(w, 4), round(w - alpha, 4)))
    return out


def test_doremi_matches_reference(spark, tmp_path):
    rows = ([("alpha beta gamma delta", "big")] * 6
            + [("epsilon zeta", "big")] * 2
            + [("eta theta iota kappa lam mu", "mid")] * 4
            + [("nu xi", "sml")] * 2)
    _write_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_doremi_mix_update(spark, str(tmp_path)).collect()]
    assert got == _doremi_ref(rows)
    # weights form a distribution
    assert abs(sum(r[4] for r in got) - 1.0) < 5e-3


def test_doremi_lossy_source_gains(spark, tmp_path):
    # find two word pools with opposite classifier signs
    good = [w for w in ("alpha beta gamma delta epsilon zeta eta theta"
                        " iota kappa").split()
            if _clf(w) >= 0][:3]
    bad = [w for w in ("omicron sigma upsilon phi chi psi omega rho"
                       " tau lambda2").split()
           if _clf(w) < 0][:3]
    assert good and bad, "fixture needs both signs"
    rows = ([(" ".join(good), "clean")] * 6
            + [(" ".join(bad), "dirty")] * 6)
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in
           q_doremi_mix_update(spark, str(tmp_path)).collect()}
    assert out["dirty"]["loss_proxy"] == 1.0
    assert out["clean"]["loss_proxy"] == 0.0
    # equal token shares, so the lossy source must gain weight
    assert out["dirty"]["weight_delta"] > 0
    assert out["clean"]["weight_delta"] < 0


# -------------------------------------------------------------- curriculum


def _curriculum_ref(rows):
    scored = [(i + 1, s, float(_clf(t)))
              for i, (t, s) in enumerate(rows)]
    order = sorted(scored, key=lambda r: (-r[2], r[0]))
    n = len(order)
    base, extra = divmod(n, 10)
    phases = {}
    pos = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if pos < n:
                phases.setdefault(b, []).append(order[pos])
                pos += 1
    k_all = len({s for _, s, _ in scored})
    out = []
    for b in sorted(phases):
        rowsb = phases[b]
        nn = len(rowsb)
        srcs = Counter(s for _, s, _ in rowsb)
        ent = -sum((c / nn) * math.log(c / nn) for c in srcs.values())
        out.append((b, nn,
                    round(sum(sc for _, _, sc in rowsb) / nn, 4),
                    len(srcs),
                    round(ent / math.log(k_all), 4) if k_all > 1 else None,
                    round(max(srcs.values()) / nn, 4)))
    return out


def test_curriculum_matches_reference(spark, tmp_path):
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa"
             " lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(40):
        text = " ".join(words[(i * 3 + j) % len(words)]
                        for j in range(3 + i % 5))
        rows.append((text, ["web", "wiki", "chat"][i % 3]))
    _write_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_curriculum_schedule_audit(spark, str(tmp_path)).collect()]
    assert got == _curriculum_ref(rows)
    # schedule invariant: phase mean scores must be non-increasing
    means = [g[2] for g in got]
    assert all(a >= b for a, b in zip(means, means[1:]))


def test_curriculum_source_cliff_detected(spark, tmp_path):
    # source A exclusively high scorers, B exclusively low: early
    # phases pure A, late phases pure B -> entropy 0 everywhere
    good = [w for w in ("alpha beta gamma delta epsilon zeta eta theta"
                        " iota kappa lam mu nu xi omicron pi").split()
            if _clf(w) >= 0]
    bad = [w for w in ("omicron sigma upsilon phi chi psi omega rho"
                       " tau alef bet gimel dalet he vav zayin").split()
           if _clf(w) < 0]
    rows = ([(" ".join(good[i % len(good)] for i in range(j, j + 3)), "A")
             for j in range(20)]
            + [(" ".join(bad[i % len(bad)] for i in range(j, j + 3)), "B")
               for j in range(20)])
    _write_docs(spark, tmp_path, rows)
    got = q_curriculum_schedule_audit(spark, str(tmp_path)).collect()
    ref = _curriculum_ref(rows)
    assert [tuple(r) for r in got] == ref
    assert all(r["top_source_share"] == 1.0 for r in got)
    assert all(r["source_entropy_norm"] == 0.0 for r in got)


# ----------------------------------------------------------------- keyness


def _keyness_ref(rows):
    tok_by_src = Counter()
    for t, s in rows:
        tok_by_src[s] += len(_toks(t))
    top2 = sorted(tok_by_src, key=lambda s: (-tok_by_src[s], s))[:2]
    sa, sb = top2
    ca, cb = Counter(), Counter()
    for t, s in rows:
        if s == sa:
            ca.update(_toks(t))
        elif s == sb:
            cb.update(_toks(t))
    bg = ca + cb
    support = sorted(bg, key=lambda w: (-bg[w], w))[:500]
    bgtot = sum(bg[w] for w in support)
    na = sum(ca[w] for w in support)
    nb = sum(cb[w] for w in support)
    zs = {}
    for w in support:
        aw = _KEYNESS_ALPHA0 * bg[w] / bgtot
        ya, yb = ca[w], cb[w]
        delta = (math.log((ya + aw) / (na + _KEYNESS_ALPHA0 - ya - aw))
                 - math.log((yb + aw) / (nb + _KEYNESS_ALPHA0 - yb - aw)))
        sd = math.sqrt(1.0 / (ya + aw) + 1.0 / (yb + aw))
        zs[w] = (ya, yb, round(delta, 4), round(delta / sd, 4))
    by_desc = sorted(zs, key=lambda w: (-zs[w][3], w))
    by_asc = sorted(zs, key=lambda w: (zs[w][3], w))
    mark_a = set(by_desc[:_KEYNESS_K])
    mark_b = set(by_asc[:_KEYNESS_K])
    picked = mark_a | mark_b
    out = []
    for w in sorted(picked, key=lambda w: (-zs[w][3], w)):
        ya, yb, lo, z = zs[w]
        out.append((w, ya, yb, lo, z,
                    "source_a" if w in mark_a else "source_b"))
    return out


def test_keyness_matches_reference(spark, tmp_path):
    rows = ([("spark cluster shuffle spark executor", "eng")] * 8
            + [("alpha beta cluster gamma", "eng")] * 4
            + [("recipe butter sugar flour recipe", "food")] * 7
            + [("cluster oven butter", "food")] * 5
            + [("noise", "tiny")])
    _write_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in
           q_keyness_log_odds(spark, str(tmp_path)).collect()]
    ref = _keyness_ref(rows)
    assert got == ref
    # the distinctive vocab must mark the right sides
    marks = {w: m for w, _, _, _, _, m in got}
    assert marks.get("spark") == "source_a"      # eng-only term
    assert marks.get("recipe") == "source_b"     # food-only term


# -------------------------------------------------------------- plan shapes


def test_plans_bounded_scans_no_cartesian(spark, tmp_path):
    rows = [("alpha beta spark", "a")] * 5 + [("gamma delta", "b")] * 4
    _write_docs(spark, tmp_path, rows)
    # curriculum's k_all distinct-source subquery re-scans parquet but
    # column-pruned to `source` alone (ReadSchema shows it) — cheap at
    # any scale; the token-scoring pass itself runs once.
    for fn, mx in ((q_doremi_mix_update, 1),
                   (q_curriculum_schedule_audit, 2),
                   (q_keyness_log_odds, 3)):
        plan = fn(spark, str(tmp_path))._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Scan parquet") <= mx, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
