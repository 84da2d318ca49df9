"""Round-5 batch-32 operators on crafted inputs, verified against
independent Python computations: stump_split_scan (prefix-sum Gini scan
finds the crafted en/fr length boundary with an exact-split gain),
repeated_epochs_value (Muennighoff decay plan over a measured 350-char
unique mass), position_based_attribution (U-shaped 40/20/40 credit with
1-touch and 2-touch degradations; non-converters excluded)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd

from pdf_extractor_spark.queries import (
    _EPOCHS_MAX,
    _EPOCHS_RSTAR,
    q_position_based_attribution,
    q_repeated_epochs_value,
    q_stump_split_scan,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_documents(spark, path, rows):
    # rows: (doc_id, text, lang, n_chars)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "n_chars"])
    pdf["source"] = "crafted"
    spark.createDataFrame(
        pdf[["doc_id", "text", "lang", "source", "n_chars"]],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    # rows: (user_id, second_offset, event_type)
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


# --------------------------------------------------------------- stump_split_scan


def test_stump_scan_finds_language_length_boundary(spark, tmp_path):
    # 60 short en docs + 40 long fr docs: majority class is en, and the
    # class boundary lands exactly on the decile-6 edge (100 docs ->
    # 10-row buckets) so one cut separates the classes perfectly
    rows = ([(i, "t", "en", 100 + i) for i in range(1, 61)]
            + [(100 + i, "t", "fr", 500 + i) for i in range(1, 41)])
    _write_documents(spark, tmp_path, rows)
    out = q_stump_split_scan(spark, str(tmp_path)).collect()
    assert len(out) == 9
    docs = sorted(((r[3], r[0], 1.0 if r[2] == "en" else 0.0)
                   for r in rows))
    n = len(docs)
    base, rem = divmod(n, 10)
    buckets, s = [], 0
    for b in range(10):
        size = base + (1 if b < rem else 0)
        blk = docs[s:s + size]
        s += size
        buckets.append((len(blk), sum(d[2] for d in blk),
                        max(d[0] for d in blk)))
    nt = float(n)
    npt = sum(b[1] for b in buckets)
    pp = npt / nt
    nl = npl = 0.0
    for i, r in enumerate(out):
        nl += buckets[i][0]
        npl += buckets[i][1]
        nr = nt - nl
        pl, pr = npl / nl, (npt - npl) / nr
        gs = (nl / nt) * 2 * pl * (1 - pl) + (nr / nt) * 2 * pr * (1 - pr)
        assert r["cut_decile"] == i + 1
        assert r["threshold_chars"] == float(buckets[i][2])
        assert (r["n_left"], r["n_right"]) == (int(nl), int(nr))
        assert r["pos_rate_left"] == round(pl, 4)
        assert r["pos_rate_right"] == round(pr, 4)
        assert r["gini_weighted"] == round(gs, 4)
        assert r["gini_gain"] == round(2 * pp * (1 - pp) - gs, 4)
    # deciles 1-6 are all-en: the perfect cut has gini 0 and the
    # is_best_cut flag must land on (all) zero-impurity cuts
    best = [r for r in out if r["is_best_cut"] == 1]
    assert best and all(r["gini_weighted"] == 0.0 for r in best)
    assert all(r["pos_rate_left"] == 1.0 and r["pos_rate_right"] == 0.0
               for r in best)


# ---------------------------------------------------------- repeated_epochs_value


def test_repeated_epochs_plan_from_measured_unique_mass(spark, tmp_path):
    # texts: A x3 (100 chars), B x1 (50), C x2 (200) -> unique mass 350
    rows = ([(1, "A" * 100, "en", 100), (2, "A" * 100, "en", 100),
             (3, "A" * 100, "en", 100), (4, "B" * 50, "en", 50),
             (5, "C" * 200, "en", 200), (6, "C" * 200, "en", 200)])
    _write_documents(spark, tmp_path, rows)
    out = q_repeated_epochs_value(spark, str(tmp_path)).collect()
    assert len(out) == _EPOCHS_MAX
    prev = 0.0
    for r, k in zip(out, range(1, _EPOCHS_MAX + 1)):
        eff = 350.0 * (1 + _EPOCHS_RSTAR
                       * (1 - math.exp(-(k - 1) / _EPOCHS_RSTAR)))
        assert r["epochs"] == k
        assert r["unique_chars"] == 350
        assert r["chars_seen"] == 350 * k
        assert r["effective_chars"] == int(round(eff, 0))
        assert r["epoch_efficiency"] == round(eff / (350.0 * k), 4)
        assert r["marginal_epoch_value"] == round((eff - prev) / 350.0, 4)
        prev = eff
    # epoch 1 is worth exactly 1.0x; later epochs decay monotonically
    assert out[0]["marginal_epoch_value"] == 1.0
    marginals = [r["marginal_epoch_value"] for r in out[1:]]
    assert all(a >= b for a, b in zip(marginals, marginals[1:]))
    assert all(0 < m < 1 for m in marginals)


# ----------------------------------------------------- position_based_attribution


def test_u_shaped_attribution_credits(spark, tmp_path):
    rows = [
        # u1: view,click,view,click -> purchase (0.4/0.1/0.1/0.4)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "view"),
        (1, 40, "click"), (1, 50, "purchase"),
        # u2: single view -> purchase (1.0)
        (2, 10, "view"), (2, 20, "purchase"),
        # u3: click,view -> purchase (0.5/0.5)
        (3, 10, "click"), (3, 20, "view"), (3, 30, "purchase"),
        # u4: never purchases -> excluded entirely
        (4, 10, "view"), (4, 20, "click"),
        # u5: purchase with no prior touches -> contributes nothing
        (5, 10, "purchase"), (5, 20, "view"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {r["event_type"]: r
           for r in q_position_based_attribution(spark, str(tmp_path)).collect()}
    assert sorted(out) == ["click", "view"]
    v, c = out["view"], out["click"]
    # view: u1 0.4+0.1, u2 1.0, u3 0.5 = 2.0; click: u1 0.1+0.4, u3 0.5
    assert v["credit_total"] == 2.0 and c["credit_total"] == 1.0
    assert v["credit_share"] == round(2 / 3, 4)
    assert c["credit_share"] == round(1 / 3, 4)
    assert (v["n_touches"], v["n_users"]) == (4, 3)
    assert (c["n_touches"], c["n_users"]) == (3, 2)
