"""Round-5 batch-30 operators on crafted inputs, verified against
independent Python computations that re-derive the hash-deterministic
designs from hashlib.md5: poisson_bootstrap_ci (Poisson(1)-weight
replicate means + normal CI), permutation_test_lengths (binomial
randomization p-value for the two-source mean gap, third source must be
ignored), page_hinkley_monitor (running-mean PH walk with a crafted
level shift; stable series stays quiet)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pandas as pd

from pdf_extractor_spark.queries import (
    _BOOT_B,
    _PERM_B,
    _PH_DELTA,
    _PH_LAMBDA,
    _POIS1_CUM,
    q_page_hinkley_monitor,
    q_permutation_test_lengths,
    q_poisson_bootstrap_ci,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_documents(spark, path, rows):
    # rows: (doc_id, n_chars, source)
    pdf = pd.DataFrame(rows, columns=["doc_id", "n_chars", "source"])
    pdf["text"] = pdf["n_chars"].map(lambda n: "a" * int(n))
    pdf["lang"] = "en"
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_daily_counts(spark, path, counts):
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for i in range(c):
            eid += 1
            rows.append((eid, _EPOCH + dt.timedelta(days=d, seconds=i),
                         1, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _pois_weight(u: float) -> int:
    for k, c in enumerate(_POIS1_CUM):
        if u < c:
            return k
    return 5


# ----------------------------------------------------------- poisson_bootstrap


def test_poisson_bootstrap_matches_hash_mirror(spark, tmp_path):
    lens = [100, 150, 200, 250, 300, 320, 340, 380, 420, 500,
            90, 110, 130, 170, 190, 210, 230, 270, 290, 310]
    _write_documents(
        spark, tmp_path,
        [(i + 1, ln, "s") for i, ln in enumerate(lens)])
    r = q_poisson_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    means = []
    for b in range(_BOOT_B):
        sw = swx = 0.0
        for i, ln in enumerate(lens):
            # four 32-bit uniforms sliced per md5 digest
            hx = hashlib.md5(f"{i + 1}:{b // 4}".encode()).hexdigest()
            u = int(hx[8 * (b % 4):8 * (b % 4) + 8], 16) / 4294967296.0
            w = _pois_weight(u)
            sw += w
            swx += w * float(ln)
        means.append(swx / sw if sw else None)
    ms = [m for m in means if m is not None]
    nb = float(len(ms))
    sm, smm = sum(ms), sum(m * m for m in ms)
    se = math.sqrt((smm - sm * sm / nb) / (nb - 1))
    mean = sum(map(float, lens)) / len(lens)
    assert r["n_docs"] == 20 and r["n_replicates"] == _BOOT_B
    assert r["mean_chars"] == round(mean, 4)
    assert r["boot_se"] == round(se, 4)
    assert r["ci_lo"] == round(mean - 1.96 * se, 4)
    assert r["ci_hi"] == round(mean + 1.96 * se, 4)
    assert r["boot_min"] == round(min(ms), 4)
    assert r["boot_max"] == round(max(ms), 4)
    # the envelope must bracket the point estimate
    assert r["boot_min"] < r["mean_chars"] < r["boot_max"]
    assert r["ci_lo"] < r["mean_chars"] < r["ci_hi"]


# ------------------------------------------------------ permutation_test_lengths


def test_permutation_test_two_sources_only(spark, tmp_path):
    # sources a (short) and b (long) differ hugely; source z is noise
    # that must NOT enter (only the two lexically-first sources count)
    rows = ([(i, 100 + i, "a") for i in range(1, 9)]
            + [(i, 900 + i, "b") for i in range(9, 17)]
            + [(99, 55555, "z")])
    _write_documents(spark, tmp_path, rows)
    r = q_permutation_test_lengths(spark, str(tmp_path)).collect()[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    mean_a = sum(100 + i for i in range(1, 9)) / 8
    mean_b = sum(900 + i for i in range(9, 17)) / 8
    assert r["mean_a"] == round(mean_a, 4)
    assert r["mean_b"] == round(mean_b, 4)
    assert r["observed_diff"] == round(mean_a - mean_b, 4)
    xs = {i: 100.0 + i for i in range(1, 9)}
    xs.update({i: 900.0 + i for i in range(9, 17)})
    def bit(doc, b):
        # 32 relabeling bits sliced per md5 digest
        return (_md5int(f"{doc}|{b // 32}") >> (b % 32)) & 1

    n_ext, diffs = 0, []
    for b in range(_PERM_B):
        ga = [x for d, x in xs.items() if bit(d, b) == 0]
        gb = [x for d, x in xs.items() if bit(d, b) == 1]
        d = (sum(ga) / len(ga) if ga else None) \
            - (sum(gb) / len(gb) if gb else None)
        diffs.append(d)
        if abs(d) >= abs(mean_a - mean_b):
            n_ext += 1
    assert r["n_more_extreme"] == n_ext
    assert r["n_permutations"] == _PERM_B
    assert r["p_value"] == round((n_ext + 1) / (_PERM_B + 1), 4)
    nb = float(len(diffs))
    sd, sdd = sum(diffs), sum(d * d for d in diffs)
    assert r["perm_diff_sd"] == round(
        math.sqrt((sdd - sd * sd / nb) / (nb - 1)), 4)
    # a ~800-char real gap must be beyond every random relabeling
    assert r["p_value"] <= round(1 / (_PERM_B + 1), 4) + 1e-9


# -------------------------------------------------------- page_hinkley_monitor


def _ph_mirror(counts):
    xs = [float(c) for c in counts]
    mean = sum(xs) / len(xs)
    zs = [x / mean for x in xs]
    out, u = [], 0.0
    v, umin, vmin, zsum = 0.0, 0.0, 0.0, 0.0
    umin = vmin = float("inf")
    first = None
    for t, z in enumerate(zs, 1):
        zsum += z
        zbar = zsum / t
        u += z - zbar - _PH_DELTA
        v += zbar - z - _PH_DELTA
        umin, vmin = min(umin, u), min(vmin, v)
        inc, dec = u - umin, v - vmin
        state = ("rate_up" if inc > _PH_LAMBDA
                 else "rate_down" if dec > _PH_LAMBDA else "stable")
        if state != "stable" and first is None:
            first = t
        out.append((t, inc, dec, state))
    return out, first


def test_page_hinkley_detects_level_shift(spark, tmp_path):
    counts = [10] * 10 + [25] * 6
    _write_daily_counts(spark, tmp_path, counts)
    out = q_page_hinkley_monitor(spark, str(tmp_path)).collect()
    mirror, first = _ph_mirror(counts)
    assert len(out) == len(counts)
    for r, (t, inc, dec, state) in zip(out, mirror):
        assert r["day_index"] == t
        assert r["ph_increase"] == round(inc, 4)
        assert r["ph_decrease"] == round(dec, 4)
        assert r["state"] == state
        assert r["first_alarm_day"] == (1 if t == first else 0)
    # the jump must raise a rate_up alarm shortly after day 10
    assert first is not None and 11 <= first <= 13
    assert out[first - 1]["state"] == "rate_up"


def test_page_hinkley_stable_series_stays_quiet(spark, tmp_path):
    counts = [12, 13, 11, 12, 14, 12, 11, 13, 12, 12]
    _write_daily_counts(spark, tmp_path, counts)
    out = q_page_hinkley_monitor(spark, str(tmp_path)).collect()
    assert all(r["state"] == "stable" for r in out)
    assert all(r["first_alarm_day"] == 0 for r in out)
