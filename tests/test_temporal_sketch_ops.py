"""Temporal joins + sketch operators on crafted inputs: as-of join tie
and no-match semantics, range-join boundary inclusion across bucket
edges, rollup level consistency, HLL accuracy bounds, count-min
never-underestimate.  Engine-vs-oracle parity is covered by the contract
gate; these pin the SEMANTICS on inputs small enough to verify by hand."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extractor_spark.queries import (
    q_asof_join,
    q_cms_heavy_hitters,
    q_hll_distinct,
    q_range_join,
    q_rollup_multires,
)

SF_DIR = "/root/testdata/sf0.001"

_EVENT_DDL = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _write_events(spark, path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    pdf["props"] = "{}"
    spark.createDataFrame(pdf, _EVENT_DDL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/events.parquet")


def _write_documents(spark, path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["crafted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------- as-of join


def test_asof_join_most_recent_tie_and_no_match(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            # user 1: purchases at 10:00 (v 5.0) and 11:00 (v 7.0)
            (100, "2024-01-01 10:00:00", 1, "purchase", 5.0),
            (101, "2024-01-01 11:00:00", 1, "purchase", 7.0),
            # clicks: before any purchase / tie / between / after second
            (1, "2024-01-01 09:00:00", 1, "click", 0.0),
            (2, "2024-01-01 10:00:00", 1, "click", 0.0),
            (3, "2024-01-01 10:30:00", 1, "click", 0.0),
            (4, "2024-01-01 11:30:00", 1, "click", 0.0),
            # user 2: click with no purchases at all
            (5, "2024-01-01 10:30:00", 2, "click", 0.0),
            # user 3: purchase only — must not leak into user 2's clicks
            (300, "2024-01-01 09:00:00", 3, "purchase", 9.0),
        ],
    )
    out = {
        r["click_id"]: (r["purchase_id"], r["purchase_value"])
        for r in q_asof_join(spark, str(tmp_path)).collect()
    }
    # inner as-of: clicks 1 (no prior) and 5 (no purchases for user) drop
    assert set(out) == {2, 3, 4}
    assert out[2] == (100, 5.0)  # ref.ts == probe.ts is INCLUSIVE
    assert out[3] == (100, 5.0)
    assert out[4] == (101, 7.0)  # most recent, not first


# ---------------------------------------------------------------- range join


def test_range_join_boundaries_and_bucket_crossing(spark, tmp_path):
    _write_events(
        spark,
        tmp_path,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0),
            (2, "2024-01-01 10:30:00", 1, "click", 0.0),
            # gap 0 — EXCLUDED (strict lower bound)
            (100, "2024-01-01 10:00:00", 1, "purchase", 1.0),
            (101, "2024-01-01 10:30:00", 1, "purchase", 2.0),
            # exactly +3600 s from click 1 — INCLUDED (closed upper bound)
            (102, "2024-01-01 11:00:00", 1, "purchase", 3.0),
            # 1 microsecond past click 1's window; inside click 2's
            (103, "2024-01-01 11:00:00.000001", 1, "purchase", 4.0),
            # same-user purchase in the NEXT hour bucket of click 2
            (104, "2024-01-01 11:25:00", 1, "purchase", 8.0),
            # other user inside the window — must not count
            (200, "2024-01-01 10:15:00", 2, "purchase", 99.0),
        ],
    )
    out = {
        r["click_id"]: (r["n_purchases"], r["total_value"])
        for r in q_range_join(spark, str(tmp_path)).collect()
    }
    # click 1 (10:00): 101 (10:30), 102 (+3600 exactly) — not 100, not 103
    assert out[1] == (2, 5.0)
    # click 2 (10:30): 102, 103 (sub-second), 104 (crosses into bucket b+1)
    assert out[2] == (3, 15.0)


# ------------------------------------------------------------------- rollup


def test_rollup_levels_are_consistent(spark):
    rows = q_rollup_multires(spark, SF_DIR).collect()
    grand = [r for r in rows if r["event_type"] == "ALL"]
    assert len(grand) == 1 and grand[0]["day_bucket"] == -1
    leaf = [r for r in rows if r["hour_bucket"] != -1]
    assert sum(r["n_events"] for r in leaf) == grand[0]["n_events"]
    # per-type totals match their day-level breakdown
    per_type = {
        r["event_type"]: r["n_events"]
        for r in rows
        if r["event_type"] != "ALL" and r["day_bucket"] == -1
    }
    day = [r for r in rows if r["day_bucket"] != -1 and r["hour_bucket"] == -1]
    for t in per_type:
        assert sum(r["n_events"] for r in day if r["event_type"] == t) == per_type[t]


# ---------------------------------------------------------------------- HLL


def test_hll_estimate_within_sketch_error(spark):
    row = q_hll_distinct(spark, SF_DIR).collect()[0]
    exact = spark.sql(
        """
        SELECT count(DISTINCT tok) AS d FROM (
          SELECT explode(filter(split(lower(text), '[^a-z0-9]+'),
                                t -> t != '')) AS tok
          FROM parquet.`/root/testdata/sf0.001/documents.parquet`)
        """
    ).collect()[0]["d"]
    assert row["m"] == 256 and 0 < row["n_nonzero"] <= 256
    # standard error for m=256 is 1.04/sqrt(m) = 6.5%; allow 3 sigma
    assert abs(row["hll_estimate"] - exact) / exact < 0.20


def test_hll_small_range_linear_counting(spark, tmp_path):
    _write_documents(spark, tmp_path, ["alpha beta gamma", "alpha beta", ""])
    row = q_hll_distinct(spark, str(tmp_path)).collect()[0]
    # 3 distinct tokens → 3 registers; linear counting is exact-ish here
    assert row["n_nonzero"] == 3
    assert abs(row["hll_estimate"] - 3) < 0.1


# ---------------------------------------------------------------- count-min


def test_cms_never_underestimates_and_ranks_true_top(spark, tmp_path):
    texts = [
        " ".join(["alpha"] * 10 + ["beta"] * 6 + ["gamma"] * 2)
        for _ in range(5)
    ]
    _write_documents(spark, tmp_path, texts)
    out = {r["token"]: r["est_count"] for r in
           q_cms_heavy_hitters(spark, str(tmp_path)).collect()}
    exact = {"alpha": 50, "beta": 30, "gamma": 10}
    for tok, c in exact.items():
        assert out[tok] >= c  # classic CMS one-sided bound
    top = max(out, key=lambda t: (out[t], t))
    assert top == "alpha" and out["alpha"] >= 50


# --------------------------------------------------------- dup-span scrub


def test_dup_span_scrub_removes_shared_spans_only(spark, tmp_path):
    import hashlib

    shared = " ".join(f"s{i}" for i in range(16))   # one exact 16-gram
    texts = [
        f"alpha beta {shared} gamma delta",          # doc 0: span + 4 own
        f"{shared} epsilon",                         # doc 1: span + 1 own
        "totally unique text with no duplicate spans at all",  # doc 2
    ]
    _write_documents(spark, tmp_path, texts)
    from pdf_extractor_spark.queries import q_dup_span_scrub

    out = {r["doc_id"]: r for r in
           q_dup_span_scrub(spark, str(tmp_path)).collect()}
    assert out[0]["n_tokens"] == 20 and out[0]["n_removed"] == 16
    assert out[1]["n_tokens"] == 17 and out[1]["n_removed"] == 16
    assert out[2]["n_removed"] == 0
    exp0 = hashlib.md5("alpha beta gamma delta".encode()).hexdigest()
    exp1 = hashlib.md5("epsilon".encode()).hexdigest()
    exp2 = hashlib.md5(texts[2].encode()).hexdigest()
    assert out[0]["scrub_digest"] == exp0
    assert out[1]["scrub_digest"] == exp1
    assert out[2]["scrub_digest"] == exp2


def test_dup_span_scrub_overlapping_spans_union_coverage(spark, tmp_path):
    import hashlib

    # 17 shared tokens → TWO overlapping dup 16-grams covering all 17
    shared = " ".join(f"s{i}" for i in range(17))
    _write_documents(
        spark, tmp_path, [f"head {shared} tail", f"{shared}", "unrelated words"]
    )
    from pdf_extractor_spark.queries import q_dup_span_scrub

    out = {r["doc_id"]: r for r in
           q_dup_span_scrub(spark, str(tmp_path)).collect()}
    assert out[0]["n_removed"] == 17                 # union, not double count
    assert out[0]["scrub_digest"] == hashlib.md5(b"head tail").hexdigest()
    assert out[1]["n_removed"] == 17
    assert out[1]["scrub_digest"] == hashlib.md5(b"").hexdigest()


# ----------------------------------------------------- hashed classifier


def test_hashed_classifier_integer_exactness_and_verdict(spark, tmp_path):
    import hashlib

    def md5int(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def weight(tok: str) -> int:
        return md5int(f"w:{md5int(tok) % 4096}") % 2001 - 1000

    texts = ["alpha beta gamma", "zzz qqq", ""]
    _write_documents(spark, tmp_path, texts)
    from pdf_extractor_spark.queries import q_hashed_classifier

    out = {r["doc_id"]: r for r in
           q_hashed_classifier(spark, str(tmp_path)).collect()}
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]
        exp = sum(weight(t) for t in toks)
        r = out[doc_id]
        assert r["score_raw"] == exp
        assert r["keep"] == (exp >= 0)
        n = max(len(toks), 1)
        sign = -1 if exp < 0 else 1
        assert r["mean_weight_bp"] == sign * ((10000 * abs(exp)) // (1000 * n))
    # empty doc: neutral score, sigmoid exactly 0.5, kept
    assert out[2]["score_raw"] == 0 and out[2]["quality_prob"] == 0.5
    assert out[2]["keep"] is True


# ------------------------------------------------ seeded fuzz vs pandas


def _random_events(seed, n_users=5, n_events=120):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for eid in range(n_events):
        rows.append(
            (
                eid,
                str(base + pd.Timedelta(microseconds=int(rng.integers(0, 6 * 3600 * 1_000_000)))),
                int(rng.integers(0, n_users)),
                str(rng.choice(["click", "purchase", "view"])),
                round(float(rng.uniform(0, 10)), 2),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_asof_join_matches_bruteforce(spark, tmp_path_factory, seed):
    rows = _random_events(seed)
    path = tmp_path_factory.mktemp(f"asof{seed}")
    _write_events(spark, path, rows)
    got = {
        r["click_id"]: (r["purchase_id"], r["purchase_value"])
        for r in q_asof_join(spark, str(path)).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    exp = {}
    clicks = pdf[pdf.event_type == "click"]
    pur = pdf[pdf.event_type == "purchase"]
    for _, c in clicks.iterrows():
        prior = pur[(pur.user_id == c.user_id) & (pur.ts <= c.ts)]
        if len(prior):
            best = prior.sort_values("ts").iloc[-1]
            exp[c.event_id] = (best.event_id, best.value)
    assert got == exp


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_range_join_matches_bruteforce(spark, tmp_path_factory, seed):
    rows = _random_events(seed)
    path = tmp_path_factory.mktemp(f"rng{seed}")
    _write_events(spark, path, rows)
    got = {
        r["click_id"]: (r["n_purchases"], r["total_value"])
        for r in q_range_join(spark, str(path)).collect()
    }
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], format="ISO8601")
    exp = {}
    clicks = pdf[pdf.event_type == "click"]
    pur = pdf[pdf.event_type == "purchase"]
    for _, c in clicks.iterrows():
        hit = pur[
            (pur.user_id == c.user_id)
            & (pur.ts > c.ts)
            & (pur.ts <= c.ts + pd.Timedelta(hours=1))
        ]
        if len(hit):
            exp[c.event_id] = (len(hit), round(float(hit.value.sum()), 4))
    assert got == exp
