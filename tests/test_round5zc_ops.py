"""Round-5 batch-31 operators on crafted inputs, verified against
independent Python computations: ece_calibration (ECE/MCE/signed gap vs
a from-scratch reliability fold over the exact classifier + heuristic
signal definitions), post_stratified_mean (SRS vs post-stratified
estimator, SEs, deff, true-mean audit), fellegi_sunter_weights (blocked
m/u estimation with add-one smoothing vs a sequential pair walk).
Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

from pdf_extractor_spark.queries import (
    q_ece_calibration,
    q_fellegi_sunter_weights,
    q_post_stratified_mean,
)


def _write_docs(spark, path, rows):
    """rows: (text, lang, source) tuples; n_chars = len(text)."""
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# --------------------------------------------------------- ece_calibration


def _clf_rows(texts):
    """Per-doc (bucket, prob, ok) under the op's exact definitions."""
    out = []
    for t in texts:
        toks = _toks(t)
        score = sum(
            _md5int(f"w:{_md5int(w) % 4096}") % 2001 - 1000 for w in toks)
        prob = round(
            1.0 / (1.0 + math.exp(-score / (1000.0 * max(len(toks), 1)))), 4)
        b = min(int(prob * 10), 9)
        punct = len(re.findall(r"[.!?,;:]", t))
        ok = (200 <= len(t) <= 50000
              and 0.005 <= punct / max(len(t), 1) <= 0.2)
        out.append((b, prob, ok))
    return out


def _ece_expected(texts):
    rows = _clf_rows(texts)
    buckets: dict[int, list] = {}
    for b, p, ok in rows:
        buckets.setdefault(b, []).append((p, ok))
    n_total = len(rows)
    ece = mce = signed = 0.0
    for b, members in buckets.items():
        n = len(members)
        mean_prob = round(sum(p for p, _ in members) / n, 4)
        ok_rate = sum(1 for _, ok in members if ok) / n
        gap = ok_rate - mean_prob
        ece += n * abs(gap)
        mce = max(mce, abs(gap))
        signed += n * (mean_prob - ok_rate)
    return (n_total, len(buckets), round(ece / n_total, 4),
            round(mce, 4), round(signed / n_total, 4))


def test_ece_matches_python_reliability_fold(spark, tmp_path):
    texts = [
        ("alpha beta gamma. " * 20)[:250],        # long, punctuated -> ok
        ("delta epsilon zeta, " * 30)[:400],
        "short snippet.",                          # too short -> not ok
        ("eta theta iota " * 40)[:500],            # no punct -> not ok
        ("kappa lam mu. nu xi omicron? " * 15)[:320],
        ("pi rho sigma! " * 25)[:290],
        "tau upsilon phi chi psi omega " * 3,
    ]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    got = q_ece_calibration(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_docs, r.n_bins, r.ece, r.mce, r.signed_gap) \
        == _ece_expected(texts)


def test_ece_perfect_and_broken_calibration_bounds(spark, tmp_path):
    """All docs fail the heuristic: ok_rate = 0 in every bin, so ECE is
    the prob-weighted mean itself and signed_gap = +ece exactly
    (pure overconfidence)."""
    texts = ["tiny.", "also tiny.", "still tiny!"]
    _write_docs(spark, tmp_path, [(t, "en", "a") for t in texts])
    r = q_ece_calibration(spark, str(tmp_path)).collect()[0]
    assert r.signed_gap == r.ece
    assert r.mce >= r.ece


# ----------------------------------------------------- post_stratified_mean


def _insample(doc_id):
    return _md5int(str(doc_id)) % 10 == 0


def _ps_expected(rows):
    """rows: (doc_id, source, n_chars)."""
    per: dict[str, dict] = {}
    for doc_id, src, n in rows:
        h = per.setdefault(
            src, {"np": 0.0, "s1p": 0.0, "n": 0.0, "s1": 0.0, "s2": 0.0})
        h["np"] += 1
        h["s1p"] += n
        if _insample(doc_id):
            h["n"] += 1
            h["s1"] += n
            h["s2"] += float(n) * n
    n_pop = sum(h["np"] for h in per.values())
    t1_pop = sum(h["s1p"] for h in per.values())
    n = sum(h["n"] for h in per.values())
    t1 = sum(h["s1"] for h in per.values())
    t2 = sum(h["s2"] for h in per.values())
    var_srs = ((t2 - t1 * t1 / n) / (n - 1)) / n
    inc = [h for h in per.values() if h["n"] >= 2]
    wsum = sum(h["np"] for h in inc)
    num = sum(h["np"] * h["s1"] / h["n"] for h in inc)
    varnum = sum(
        h["np"] * h["np"]
        * ((h["s2"] - h["s1"] * h["s1"] / h["n"]) / (h["n"] - 1)) / h["n"]
        for h in inc)
    var_ps = varnum / (wsum * wsum)
    return (int(n_pop), int(n), round(t1_pop / n_pop, 2),
            round(t1 / n, 2), round(math.sqrt(var_srs), 4),
            round(num / wsum, 2), round(math.sqrt(var_ps), 4),
            round(var_ps / var_srs, 4))


def _ps_rows():
    """Two sources with very different length regimes: stratification
    must cut the variance (deff < 1)."""
    rows = []
    doc_id = 0
    for i in range(120):
        doc_id += 1
        rows.append((doc_id, "short_src", 100 + (i * 7) % 60))
    for i in range(80):
        doc_id += 1
        rows.append((doc_id, "long_src", 3000 + (i * 13) % 200))
    return rows


def test_post_stratified_matches_python(spark, tmp_path):
    rows = _ps_rows()
    _write_docs(
        spark, tmp_path,
        [("x" * n, "en", s) for _, s, n in rows],
    )
    r = q_post_stratified_mean(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _ps_expected(rows)


def test_post_stratified_beats_srs_on_stratified_lengths(spark, tmp_path):
    rows = _ps_rows()
    _write_docs(
        spark, tmp_path,
        [("x" * n, "en", s) for _, s, n in rows],
    )
    r = q_post_stratified_mean(spark, str(tmp_path)).collect()[0]
    # source explains almost all length variance here
    assert r.deff < 0.2
    assert r.se_ps < r.se_srs
    # the post-stratified estimate lands closer to the truth
    assert abs(r.mean_ps - r.true_mean) <= abs(r.mean_srs - r.true_mean)


# -------------------------------------------------- fellegi_sunter_weights


def _fs_expected(rows):
    """rows: (text, lang, source); returns field rows as the op emits."""
    docs = []
    for i, (t, l, s) in enumerate(rows, 1):
        norm = re.sub(r"[^a-z0-9]+", " ", t.lower())
        docs.append({
            "id": i, "lang": l, "source": s, "n": len(t), "text": t,
            "bucket": f"{norm[:8]}|{len(t) // 64}",
        })
    by_bucket: dict[str, list] = {}
    for d in sorted(docs, key=lambda d: d["id"]):
        mem = by_bucket.setdefault(d["bucket"], [])
        if len(mem) < 20:
            mem.append(d)
    agg = {"nm": 0, "nu": 0}
    for f in ("lang", "len", "source"):
        agg[f"am_{f}"] = agg[f"au_{f}"] = 0
    for mem in by_bucket.values():
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                a, b = mem[x], mem[y]
                m = a["text"] == b["text"]
                ag = {
                    "lang": a["lang"] == b["lang"],
                    "source": a["source"] == b["source"],
                    "len": abs(a["n"] - b["n"]) * 10 <= max(a["n"], b["n"]),
                }
                agg["nm" if m else "nu"] += 1
                for f, v in ag.items():
                    if v:
                        agg[("am_" if m else "au_") + f] += 1
    out = []
    for field, c in (("lang", "lang"), ("length", "len"),
                     ("source", "source")):
        mp = round((agg[f"am_{c}"] + 1.0) / (agg["nm"] + 2.0), 6)
        up = round((agg[f"au_{c}"] + 1.0) / (agg["nu"] + 2.0), 6)
        out.append((
            field, agg["nm"], agg["nu"], mp, up,
            round(math.log(mp / up) / math.log(2.0), 4),
            round(math.log((1.0 - mp) / (1.0 - up)) / math.log(2.0), 4),
        ))
    return out


_FS_ROWS = [
    # one blocking bucket: same 8-char normalized prefix, same 64-band
    ("alpha beta gamma one two", "en", "s1"),
    ("alpha beta gamma one two", "en", "s2"),   # dup across sources
    ("alpha beta gamma one two", "fr", "s1"),   # dup across langs
    ("alpha beta delta nine ten", "en", "s1"),  # near length, non-dup
    ("alpha beta zzz", "en", "s1"),             # same prefix, shorter
    # a second, isolated bucket (no pairs)
    ("completely different text that stands alone here", "en", "s3"),
]


def test_fellegi_sunter_matches_python(spark, tmp_path):
    _write_docs(spark, tmp_path, _FS_ROWS)
    got = [tuple(r) for r in
           q_fellegi_sunter_weights(spark, str(tmp_path)).collect()]
    exp = _fs_expected(_FS_ROWS)
    assert got == exp
    assert [f for f, *_ in got] == ["lang", "length", "source"]


def test_fellegi_sunter_discriminating_field_gets_weight(spark, tmp_path):
    """Length agreement holds for all 3 match pairs but fewer non-match
    pairs, so weight_agree(length) > 0; a field that agrees equally in
    both classes (here: none of lang/source is that clean) stays
    smaller than the length weight."""
    _write_docs(spark, tmp_path, _FS_ROWS)
    rows = {r.field: r for r in
            q_fellegi_sunter_weights(spark, str(tmp_path)).collect()}
    assert rows["length"].n_match == 3
    assert rows["length"].m_prob > rows["length"].u_prob
    assert rows["length"].weight_agree > 0


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_ece_single_scan(spark):
    final = _final(q_ece_calibration(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final


def test_post_stratified_rides_checkpoint(spark):
    """Population counts and sampled moments share one conditional
    aggregate that is eagerly checkpointed — the returned plan shows
    zero parquet scans (the frame is read exactly once, upstream)."""
    final = _final(q_post_stratified_mean(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_fellegi_sunter_rides_checkpoint(spark):
    """The per-field unpivot runs over the checkpointed 1-row agreement
    fold — zero parquet scans in the returned plan."""
    final = _final(q_fellegi_sunter_weights(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final
