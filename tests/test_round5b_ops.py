"""Round-5 batch-2 operators on crafted inputs, verified against
independent Python computations (not just the DuckDB oracles the contract
suite replays): bm25_topk (lexical retrieval baseline),
filter_ablation_cube (curation-gate interaction grid),
context_truncation_sweep / turn_alternation_audit (transcript-side
context-budget and protocol audits over the synthetic conversation view),
signal_rank_correlation (Spearman redundancy between quality signals);
batch 3: pmi_collocations, partition_skew_sweep, window_stride_inflation,
bloom_fpr_sweep (phrase mining, shuffle planning, chunking-regime and
bloom-budget sizing)."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd

from pdf_extractor_spark.queries import (
    _BM25_B,
    _BM25_K1,
    _CONV_MOD,
    _CTX_BUDGETS,
    q_bloom_fpr_sweep,
    q_bm25_topk,
    q_context_truncation_sweep,
    q_filter_ablation_cube,
    q_partition_skew_sweep,
    q_pmi_collocations,
    q_signal_rank_correlation,
    q_turn_alternation_audit,
    q_window_stride_inflation,
)

_STOPS = {
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "are",
}


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------- bm25_topk


def _bm25_scores(rows, terms=("spark", "scan", "dup")):
    docs = {i: _toks(t) for i, t, *_ in rows}
    n = len(docs)
    total = sum(len(v) for v in docs.values())
    df = {
        q: sum(1 for ts in docs.values() if q in ts) for q in terms
    }
    out = {}
    for i, ts in docs.items():
        s = 0.0
        matched = 0
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(ts) * n / total)
            )
        if matched:
            out[i] = (round(s, 4), matched)
    return out


def test_bm25_hand_scores_and_ranking(spark, tmp_path):
    rows = [
        (0, "spark spark spark scan", "en", "s0"),      # high tf on both
        (1, "spark filter join merge window", "en", "s0"),
        (2, "dup dup detection notes", "en", "s0"),     # rare term -> big idf
        (3, "scan scan scan scan scan scan", "en", "s0"),
        (4, "nothing relevant here at all", "en", "s0"),
        (5, "spark scan dup", "en", "s0"),              # all three terms
        (6, "a much longer document about spark " * 5, "en", "s0"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["bm25"], r["n_terms_matched"])
        for r in q_bm25_topk(spark, str(tmp_path)).collect()
    }
    exp = _bm25_scores(rows)
    assert set(got) == set(exp)  # doc 4 matches nothing -> absent
    for i, (score, matched) in exp.items():
        assert got[i][1] == matched
        assert got[i][0] == _approx(score)
    # rare-term doc outranks the common-term-only doc: idf('dup') >> idf
    # of near-ubiquitous 'spark'/'scan' in this corpus
    assert exp[5][0] > exp[1][0]


def _approx(x):
    import pytest

    return pytest.approx(x, abs=1e-9)


def test_bm25_length_normalisation_downranks_padding(spark, tmp_path):
    # identical tf of 'spark', one doc padded 10x longer -> lower score
    rows = [
        (0, "spark query", "en", "s0"),
        (1, "spark query " + "pad word list " * 10, "en", "s0"),
        (2, "unrelated text body", "en", "s0"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["bm25"]
        for r in q_bm25_topk(spark, str(tmp_path)).collect()
    }
    assert got[0] > got[1] > 0.0


def test_bm25_plan_is_takeordered_merge(spark, tmp_path):
    rows = [(i, f"spark doc {i}", "en", "s0") for i in range(30)]
    _write_documents(spark, tmp_path, rows)
    df = q_bm25_topk(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-20 never a full global sort


# ---------------------------------------------------- filter_ablation_cube


def test_filter_ablation_cube_hand_grid(spark, tmp_path):
    long_txt = "the quick brown fox jumps over the lazy dog " * 4  # stopword+long
    rows = [
        (0, long_txt, "en", "s0"),                       # len yes uniq yes stop yes
        (1, "short", "en", "s0"),                        # len no  uniq yes stop no
        (2, "x " * 80, "en", "s0"),                      # len yes(160) uniq no stop no
        (3, "x " * 80, "en", "s0"),                      # dup of 2
        (4, "the " + "z " * 60, "en", "s0"),             # len yes uniq yes stop yes
    ]
    _write_documents(spark, tmp_path, rows)
    out = q_filter_ablation_cube(spark, str(tmp_path)).collect()
    by_key = {
        (r["len_ok"], r["uniq_ok"], r["stop_ok"]): r for r in out
    }
    flags = {
        0: (True, True, True),
        1: (False, True, False),
        2: (True, False, False),
        3: (True, False, False),
        4: (True, True, True),
    }
    chars = {i: len(t) for i, t, *_ in rows}
    total_chars = sum(chars.values())
    # fully-specified cells (gid 0)
    import collections

    cell = collections.Counter(flags.values())
    for key, n in cell.items():
        r = by_key[key]
        assert r["gid"] == 0
        assert r["n_docs"] == n
        exp_chars = sum(chars[i] for i, f in flags.items() if f == key)
        assert r["n_chars_total"] == exp_chars
        assert r["doc_share"] == round(n / 5, 4)
        assert r["char_share"] == round(exp_chars / total_chars, 4)
    # grand total row: all three dims rolled up -> gid 7
    grand = by_key[(None, None, None)]
    assert grand["gid"] == 7
    assert grand["n_docs"] == 5 and grand["doc_share"] == 1.0
    # one-dim marginal: len_ok=True rolled over the other two -> gid 3
    marg = next(
        r for r in out
        if r["len_ok"] is True and r["uniq_ok"] is None and r["stop_ok"] is None
    )
    assert marg["gid"] == 3
    assert marg["n_docs"] == 4
    # cube row count: one row per DISTINCT projected tuple per grouping set
    exp_rows = 0
    for gid in range(8):
        keep = [gid & 4 == 0, gid & 2 == 0, gid & 1 == 0]
        exp_rows += len({
            tuple(v if k else None for v, k in zip(f, keep))
            for f in flags.values()
        })
    assert len(out) == exp_rows


def test_filter_ablation_cube_single_scan(spark, tmp_path):
    rows = [(i, f"text body {i} " * 10, "en", "s0") for i in range(20)]
    _write_documents(spark, tmp_path, rows)
    df = q_filter_ablation_cube(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # flags + totals come from one pass over documents (AQE may reuse the
    # exchange; there must be no third scan)
    assert plan.count("Scan parquet") <= 2
    assert "Expand" in plan  # the CUBE grouping-set expansion


# ------------------------------------------------ context_truncation_sweep


def _ctx_expected(rows):
    convs = {}
    for i, t, *_ in rows:
        convs.setdefault(i % _CONV_MOD, []).append((i, len(_toks(t))))
    exp = {}
    for b in _CTX_BUDGETS:
        tk = tt = kk = kt = ov = 0
        for turns in convs.values():
            turns = sorted(turns)
            cum = 0
            tot = sum(n for _, n in turns)
            tt += len(turns)
            kt += tot
            if tot > b:
                ov += 1
            for _, n in turns:
                cum += n
                if cum <= b:
                    tk += 1
                    kk += n
        exp[b] = dict(
            n_convs=len(convs), n_overflow=ov, turns_total=tt, turns_kept=tk,
            tokens_total=kt, tokens_kept=kk,
            token_keep_share=round(kk / max(kt, 1), 4),
        )
    return exp


def test_context_truncation_hand_walk(spark, tmp_path):
    # two conversations (doc_id % 53 in {0, 1}), wildly different sizes
    rows = []
    for k in range(4):  # conv 0: doc_ids 0,53,106,159 — 40 tokens/turn
        rows.append((k * _CONV_MOD, "tok " * 40, "en", "s0"))
    for k in range(3):  # conv 1: doc_ids 1,54,107 — 10 tokens/turn
        rows.append((k * _CONV_MOD + 1, "tok " * 10, "en", "s0"))
    _write_documents(spark, tmp_path, rows)
    got = {
        r["budget"]: r.asDict()
        for r in q_context_truncation_sweep(spark, str(tmp_path)).collect()
    }
    exp = _ctx_expected(rows)
    assert set(got) == set(exp)
    for b, e in exp.items():
        for k, v in e.items():
            assert got[b][k] == v, (b, k, got[b][k], v)
    # hand-check one cell: budget 64 keeps 1 of conv-0's 40-token turns
    # (cum 40, 80>64) and all 3 of conv-1's (cum 10,20,30)
    assert got[64]["turns_kept"] == 1 + 3
    assert got[64]["tokens_kept"] == 40 + 30
    assert got[64]["n_overflow"] == 1


def test_context_truncation_prefix_policy_drops_tail_only(spark, tmp_path):
    # a turn that crosses the budget is dropped and so is everything after,
    # even if a LATER small turn would still fit (strict prefix semantics)
    rows = [
        (0, "tok " * 30, "en", "s0"),                  # cum 30 <= 64 kept
        (_CONV_MOD, "tok " * 50, "en", "s0"),          # cum 80 > 64 dropped
        (2 * _CONV_MOD, "tok", "en", "s0"),            # cum 81 > 64 dropped
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        r["budget"]: r.asDict()
        for r in q_context_truncation_sweep(spark, str(tmp_path)).collect()
    }
    assert got[64]["turns_kept"] == 1
    assert got[64]["tokens_kept"] == 30
    assert got[256]["turns_kept"] == 3  # whole conversation fits


# ------------------------------------------------- turn_alternation_audit


def test_turn_alternation_audit_hand_roles(spark, tmp_path):
    # conv 0 <- doc_ids 0,53,106,159; roles follow md5int(doc_id) parity
    ids = [0, 53, 106, 159]
    roles = [
        "user" if _md5int(str(i)) % 2 == 0 else "assistant" for i in ids
    ]
    rows = [(i, f"turn body {i}", "en", "s0") for i in ids]
    _write_documents(spark, tmp_path, rows)
    out = q_turn_alternation_audit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    same = sum(1 for a, b in zip(roles, roles[1:]) if a == b)
    assert r["conv"] == 0
    assert r["n_turns"] == 4 and r["n_pairs"] == 3
    assert r["n_same_role_pairs"] == same
    assert r["first_role"] == roles[0] and r["last_role"] == roles[-1]
    assert r["same_role_rate"] == round(same / 3, 4)
    assert r["protocol_clean"] == (same == 0 and roles[0] == "user")


def test_turn_alternation_single_turn_conv_rate_zero(spark, tmp_path):
    _write_documents(spark, tmp_path, [(7, "only turn", "en", "s0")])
    r = q_turn_alternation_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_turns"] == 1 and r["n_pairs"] == 0
    assert r["n_same_role_pairs"] == 0 and r["same_role_rate"] == 0.0


# ---------------------------------------------- signal_rank_correlation


def _avg_ranks(vals):
    order = sorted(vals)
    first = {}
    for idx, v in enumerate(order, start=1):
        first.setdefault(v, idx)
    cnt = {v: order.count(v) for v in set(order)}
    return [first[v] + (cnt[v] - 1) / 2.0 for v in vals]


def _spearman(xs, ys):
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    return (n * sxy - sx * sy) / den if den else 0.0


def test_signal_rank_correlation_hand_spearman(spark, tmp_path):
    rows = [
        (0, "the the the a of and to in", "en", "s0"),
        (1, "alpha beta gamma delta", "en", "s0"),
        (2, "one two two three three three", "en", "s0"),
        (3, "the data is in the table", "en", "s0"),
        (4, "zz", "en", "s0"),
    ]
    _write_documents(spark, tmp_path, rows)
    sig = {
        "n_chars": [len(t) for _, t, *_ in rows],
        "n_tokens": [len(_toks(t)) for _, t, *_ in rows],
        "n_distinct": [len(set(_toks(t))) for _, t, *_ in rows],
        "n_stop": [
            sum(1 for w in _toks(t) if w in _STOPS) for _, t, *_ in rows
        ],
    }
    got = {
        (r["signal_a"], r["signal_b"]): r
        for r in q_signal_rank_correlation(spark, str(tmp_path)).collect()
    }
    names = sorted(sig)
    assert len(got) == 6
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            r = got[(a, b)]
            rho = _spearman(sig[a], sig[b])
            assert r["n_docs"] == 5
            assert r["spearman_rho"] == _approx(round(rho, 4))
            assert r["redundant"] == (abs(rho) > 0.8)


def test_signal_rank_correlation_monotone_pair_is_one(spark, tmp_path):
    # token count and char count perfectly co-ranked -> rho exactly 1.0
    rows = [
        (i, "word " * (i + 1), "en", "s0") for i in range(6)
    ]
    _write_documents(spark, tmp_path, rows)
    got = {
        (r["signal_a"], r["signal_b"]): r["spearman_rho"]
        for r in q_signal_rank_correlation(spark, str(tmp_path)).collect()
    }
    assert got[("n_chars", "n_tokens")] == 1.0


# ------------------------------------------------------- pmi_collocations


def test_pmi_collocations_hand_pmi(spark, tmp_path):
    # "new york" always together (6x); filler tokens keep them rare overall
    rows = [
        (i, "new york " + f"filler{i} common word list body", "en", "s0")
        for i in range(6)
    ]
    _write_documents(spark, tmp_path, rows)
    out = q_pmi_collocations(spark, str(tmp_path)).collect()
    toks_all = [_toks(t) for _, t, *_ in rows]
    nu = sum(len(ts) for ts in toks_all)
    nb = sum(len(ts) - 1 for ts in toks_all)
    uni = {}
    for ts in toks_all:
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
    big = {}
    for ts in toks_all:
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    exp = {}
    for (a, b), c in big.items():
        if c >= 5:
            pmi = math.log((c / nb) / ((uni[a] / nu) * (uni[b] / nu)))
            exp[(a, b)] = (c, uni[a], uni[b], round(pmi, 4))
    got = {(r["tok"], r["nxt"]): (r["c_bigram"], r["c_tok"], r["c_nxt"], r["pmi"])
           for r in out}
    assert got == exp
    # the glued pair sits at the maximal PMI (other always-glued pairs tie)
    assert got[("new", "york")][3] == max(v[3] for v in got.values())


def test_pmi_min_count_floor_drops_rare_pairs(spark, tmp_path):
    # "rare pair" appears 4x (< floor), "hot pair" 5x -> only hot survives
    rows = [(i, "hot pair tail" + str(i), "en", "s0") for i in range(5)]
    rows += [(10 + i, "rare pair2 tail" + str(i), "en", "s0") for i in range(4)]
    _write_documents(spark, tmp_path, rows)
    got = {(r["tok"], r["nxt"]) for r in
           q_pmi_collocations(spark, str(tmp_path)).collect()}
    assert ("hot", "pair") in got
    assert all(a != "rare" for a, _ in got)


# --------------------------------------------------- partition_skew_sweep


def test_partition_skew_sweep_hand_assignment(spark, tmp_path):
    # three conversations with loads 40, 10, 5 tokens
    rows = (
        [(k * _CONV_MOD, "t " * 10, "en", "s0") for k in range(4)]
        + [(k * _CONV_MOD + 1, "t " * 5, "en", "s0") for k in range(2)]
        + [(2, "t " * 5, "en", "s0")]
    )
    _write_documents(spark, tmp_path, rows)
    loads = {0: 40, 1: 10, 2: 5}
    got = {r["n_partitions"]: r.asDict()
           for r in q_partition_skew_sweep(spark, str(tmp_path)).collect()}
    from pdf_extractor_spark.queries import _SKEW_PARTS

    for p in _SKEW_PARTS:
        per = {}
        for conv, load in loads.items():
            part = _md5int(str(conv)) % p
            per[part] = per.get(part, 0) + load
        r = got[p]
        assert r["parts_used"] == len(per)
        assert r["total_load"] == 55
        assert r["max_load"] == max(per.values())
        assert r["skew_ratio"] == round(max(per.values()) / (55 / p), 4)


def test_partition_skew_single_hot_conv_ratio_is_p(spark, tmp_path):
    # one conversation only: max_load == total -> skew ratio == P exactly
    rows = [(k * _CONV_MOD, "tok " * 8, "en", "s0") for k in range(3)]
    _write_documents(spark, tmp_path, rows)
    for r in q_partition_skew_sweep(spark, str(tmp_path)).collect():
        assert r["parts_used"] == 1
        assert r["skew_ratio"] == float(r["n_partitions"])


# ------------------------------------------------ window_stride_inflation


def test_window_stride_hand_window_math(spark, tmp_path):
    rows = [
        (0, "t " * 10, "en", "s0"),    # L=10: 1 window everywhere
        (1, "t " * 100, "en", "s0"),   # L=100
        (2, "", "en", "s0"),           # L=0: excluded
    ]
    _write_documents(spark, tmp_path, rows)
    got = {(r["window"], r["stride"]): r.asDict()
           for r in q_window_stride_inflation(spark, str(tmp_path)).collect()}
    # (64, 32): doc1 -> n = 1 + ceil(36/32) = 3 windows,
    # tokens_out = 64*2 + min(64, 100-64) = 164; doc0 -> 1 window, 10 tokens
    r = got[(64, 32)]
    assert r["n_docs"] == 2
    assert r["windows_total"] == 1 + 3
    assert r["tokens_in"] == 110
    assert r["tokens_out"] == 10 + 164
    assert r["inflation"] == round(174 / 110, 4)
    # (128, 64): both docs fit in one window -> no inflation
    r = got[(128, 64)]
    assert r["windows_total"] == 2
    assert r["tokens_out"] == 110 and r["inflation"] == 1.0


def test_window_stride_exact_boundary_single_window(spark, tmp_path):
    # L == W exactly -> 1 window, zero inflation
    rows = [(0, "t " * 64, "en", "s0")]
    _write_documents(spark, tmp_path, rows)
    got = {(r["window"], r["stride"]): r.asDict()
           for r in q_window_stride_inflation(spark, str(tmp_path)).collect()}
    assert got[(64, 32)]["windows_total"] == 1
    assert got[(64, 32)]["tokens_out"] == 64


# --------------------------------------------------------- bloom_fpr_sweep


def test_bloom_fpr_matches_python_bloom(spark, tmp_path):
    rows = [(i, f"document body number {i}", "en", "s0") for i in range(40)]
    _write_documents(spark, tmp_path, rows)
    digests = {i: hashlib.md5(t.encode()).hexdigest() for i, t, *_ in rows}
    members = {d for i, d in digests.items() if i % 10 == 0}
    probes = {d for d in digests.values() if d not in members}
    got = {r["m_bits"]: r.asDict()
           for r in q_bloom_fpr_sweep(spark, str(tmp_path)).collect()}
    from pdf_extractor_spark.queries import _BLOOM_GRID

    for m in _BLOOM_GRID:
        bits = set()
        for d in members:
            bits.add(_md5int(d) % m)
            bits.add(_md5int(d + "#2") % m)
        fp = sum(
            1 for d in probes
            if _md5int(d) % m in bits and _md5int(d + "#2") % m in bits
        )
        r = got[m]
        assert r["n_members"] == len(members)
        assert r["n_probes"] == len(probes)
        assert r["n_bits_set"] == len(bits)
        assert r["n_fp"] == fp
        assert r["measured_fpr"] == round(fp / len(probes), 4)
        theo = (1.0 - math.exp(-2.0 * len(members) / m)) ** 2
        assert r["theoretical_fpr"] == _approx(round(theo, 4))


def test_bloom_fpr_shrinks_with_bits(spark, tmp_path):
    # tiny filter saturates (high fpr); big filter nearly clean
    rows = [(i, f"text {i} " * 3, "en", "s0") for i in range(60)]
    _write_documents(spark, tmp_path, rows)
    got = sorted(
        (r["m_bits"], r["measured_fpr"])
        for r in q_bloom_fpr_sweep(spark, str(tmp_path)).collect()
    )
    fprs = [f for _, f in got]
    assert fprs[0] >= fprs[-1]  # monotone-ish: more bits never worse here


# -------------------------------------------------------- session_gap_sweep


def _write_events(spark, path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["props"] = "{}"
    spark.createDataFrame(
        pdf,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_session_gap_sweep_hand_gaps(spark, tmp_path):
    from pdf_extractor_spark.queries import _GAP_GRID, q_session_gap_sweep

    # user 1 gaps: 120s, 2000s; user 2 gaps: 30s; user 3: single event
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (2, "2024-01-01 10:02:00", 1, "a", 1.0),
        (3, "2024-01-01 10:35:20", 1, "a", 1.0),
        (4, "2024-01-01 09:00:00", 2, "b", 1.0),
        (5, "2024-01-01 09:00:30", 2, "b", 1.0),
        (6, "2024-01-01 08:00:00", 3, "c", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    gaps = [120, 2000, 30]
    got = {r["threshold_s"]: r.asDict()
           for r in q_session_gap_sweep(spark, str(tmp_path)).collect()}
    for t in _GAP_GRID:
        over = sum(1 for g in gaps if g > t)
        r = got[t]
        assert r["n_gaps"] == 3
        assert r["gaps_over"] == over
        assert r["n_sessions"] == 3 + over
        assert r["sessions_per_user"] == round((3 + over) / 3, 4)
        assert r["share_gaps_broken"] == round(over / 3, 4)


def test_session_gap_monotone_in_threshold(spark, tmp_path):
    from pdf_extractor_spark.queries import q_session_gap_sweep

    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1, "a", 1.0) for i in range(30)
    ]
    _write_events(spark, tmp_path, rows)
    out = sorted(
        (r["threshold_s"], r["n_sessions"])
        for r in q_session_gap_sweep(spark, str(tmp_path)).collect()
    )
    ns = [n for _, n in out]
    assert ns == sorted(ns, reverse=True)  # bigger gap -> fewer sessions


# ----------------------------------------------------- file_compaction_plan


def test_file_compaction_hand_math(spark, tmp_path):
    from pdf_extractor_spark.queries import (
        _COMPACT_TARGETS, q_file_compaction_plan,
    )

    # source sizes: s0 = 10000 chars, s1 = 3000 chars
    rows = [(0, "x" * 10000, "en", "s0"), (1, "y" * 3000, "en", "s1")]
    _write_documents(spark, tmp_path, rows)
    got = {r["target_bytes"]: r.asDict()
           for r in q_file_compaction_plan(spark, str(tmp_path)).collect()}
    for t in _COMPACT_TARGETS:
        sizes = {"s0": 10000, "s1": 3000}
        files = {s: -(-b // t) for s, b in sizes.items()}  # ceil
        r = got[t]
        assert r["n_sources"] == 2
        assert r["total_bytes"] == 13000
        assert r["files_total"] == sum(files.values())
        assert r["avg_fill"] == round(13000 / (sum(files.values()) * t), 4)
        assert r["n_small_sources"] == sum(
            1 for b in sizes.values() if 2 * b < t
        )
    # sanity of the sweep's story: small targets fragment, big ones strand
    assert got[4096]["files_total"] > got[262144]["files_total"]
    assert got[262144]["n_small_sources"] == 2


# --------------------------------------------------------- loss_mask_stats


def test_loss_mask_stats_hand_roles(spark, tmp_path):
    from pdf_extractor_spark.queries import q_loss_mask_stats

    ids = [0, 53, 106, 159]
    rows = [(i, "tok " * (5 * (k + 1)), "en", "s0")
            for k, i in enumerate(ids)]
    _write_documents(spark, tmp_path, rows)
    toks = {i: 5 * (k + 1) for k, i in enumerate(ids)}
    assistant = {i for i in ids if _md5int(str(i)) % 2 == 1}
    total = sum(toks.values())
    a_tok = sum(toks[i] for i in assistant)
    r = q_loss_mask_stats(spark, str(tmp_path)).collect()[0]
    assert r["conv"] == 0 and r["n_turns"] == 4
    assert r["tokens_total"] == total
    assert r["tokens_assistant"] == a_tok
    assert r["assistant_share"] == round(a_tok / total, 4)
    assert r["balanced"] == (0.2 * total <= a_tok <= 0.8 * total)


def test_loss_mask_all_user_conv_unbalanced(spark, tmp_path):
    from pdf_extractor_spark.queries import q_loss_mask_stats

    # find doc_ids in conv 0 whose md5 parity is 'user' (even)
    ids = [k * _CONV_MOD for k in range(40)
           if _md5int(str(k * _CONV_MOD)) % 2 == 0][:3]
    assert len(ids) == 3
    rows = [(i, "tok tok tok", "en", "s0") for i in ids]
    _write_documents(spark, tmp_path, rows)
    r = q_loss_mask_stats(spark, str(tmp_path)).collect()[0]
    assert r["tokens_assistant"] == 0
    assert r["assistant_share"] == 0.0 and r["balanced"] is False


# ------------------------------------------- positional_stopword_profile


def test_positional_stopword_hand_counts(spark, tmp_path):
    from pdf_extractor_spark.queries import q_positional_stopword_profile

    # 20 tokens -> head = first 2; stopwords 'the' at positions 1, 2 and
    # 'of' mid-body
    txt = "the the body word list " + "word " * 10 + "of tail body word end"
    rows = [(0, txt, "en", "boiler")]
    _write_documents(spark, tmp_path, rows)
    ts = _toks(txt)
    head_n = -(-len(ts) // 10)
    head = ts[:head_n]
    body = ts[head_n:]
    r = q_positional_stopword_profile(spark, str(tmp_path)).collect()[0]
    assert r["head_tokens"] == len(head)
    assert r["head_stopwords"] == sum(1 for t in head if t in _STOPS)
    assert r["body_tokens"] == len(body)
    assert r["body_stopwords"] == sum(1 for t in body if t in _STOPS)
    exp = round(
        sum(1 for t in head if t in _STOPS) / max(len(head), 1)
        - sum(1 for t in body if t in _STOPS) / max(len(body), 1), 4,
    )
    assert r["head_excess"] == exp
    assert r["head_excess"] > 0  # boilerplate head flagged


def test_positional_stopword_integer_sums_not_ratio_avg(spark, tmp_path):
    from pdf_extractor_spark.queries import q_positional_stopword_profile

    # two docs, very different lengths: corpus-level pooled rates, NOT the
    # mean of per-doc ratios (pooled weights the long doc more)
    rows = [
        (0, "the of and to in is it that for on as with was are the "
            "word " * 1, "en", "s0"),
        (1, "plain words only here " * 50, "en", "s0"),
    ]
    _write_documents(spark, tmp_path, rows)
    r = q_positional_stopword_profile(spark, str(tmp_path)).collect()[0]
    ts0, ts1 = (_toks(t) for _, t, *_ in rows)
    h0, h1 = -(-len(ts0) // 10), -(-len(ts1) // 10)
    head = ts0[:h0] + ts1[:h1]
    body = ts0[h0:] + ts1[h1:]
    assert r["head_tokens"] == len(head)
    assert r["head_stopwords"] == sum(1 for t in head if t in _STOPS)
    assert r["body_stopwords"] == sum(1 for t in body if t in _STOPS)


# --------------------------------------------- extraction_quality_report


def test_extraction_quality_report_matches_golden_pandas(spark):
    """Aggregate the byte-pinned stage-1 golden in PANDAS (third engine,
    independent of both Spark and the DuckDB oracle) and compare."""
    from pdf_extractor_spark.queries import (
        _GOLDEN_PIPELINE_DIR, q_extraction_quality_report,
    )
    import os

    g = pd.read_parquet(
        os.path.join(_GOLDEN_PIPELINE_DIR, "extract_turns.parquet")
    )
    exp = g.groupby("conv_id").apply(
        lambda d: pd.Series({
            "n_turns": len(d),
            "parse_failures": int((~d.parse_ok).sum()),
            "any_rejected": bool(d.rejected_xss.max()),
            "struct_warnings": int(d.struct_warn.sum()),
            "bytes_in": int(d.bytes_in.sum()),
            "chars_out": int(d.char_count.sum()),
            "parse_ok_rate": round(d.parse_ok.sum() / max(len(d), 1), 4),
        }),
        include_groups=False,
    )
    got = {r["conv_id"]: r.asDict()
           for r in q_extraction_quality_report(spark, "").collect()}
    assert set(got) == set(exp.index)
    for conv, e in exp.iterrows():
        r = got[conv]
        for k in ("n_turns", "parse_failures", "struct_warnings",
                  "bytes_in", "chars_out"):
            assert r[k] == e[k], (conv, k, r[k], e[k])
        assert r["any_rejected"] == e["any_rejected"]
        assert r["parse_ok_rate"] == _approx(e["parse_ok_rate"])
    # the seeded XSS conversations are flagged, clean ones are not
    assert any(r["any_rejected"] for r in got.values())
    assert any(not r["any_rejected"] for r in got.values())


# ------------------------------------------------------ token_heavy_change


def test_token_heavy_change_hand_shift(spark, tmp_path):
    from pdf_extractor_spark.queries import q_token_heavy_change

    # doc_ids 0..9, cut = floor(9*0.8) = 7 -> old: 0-6, new: 7-9.
    # 'stable' everywhere; 'legacy' only old; 'surge' only new.
    rows = [(i, "stable legacy filler", "en", "s0") for i in range(7)]
    rows += [(i, "stable surge surge", "en", "s0") for i in range(7, 10)]
    _write_documents(spark, tmp_path, rows)
    old = [t for i, txt, *_ in rows if i < 7 for t in _toks(txt)]
    new = [t for i, txt, *_ in rows if i >= 7 for t in _toks(txt)]
    got = {r["tok"]: r.asDict()
           for r in q_token_heavy_change(spark, str(tmp_path)).collect()}
    for tok in {"stable", "legacy", "filler", "surge"}:
        co, cn = old.count(tok), new.count(tok)
        delta = round(cn / len(new) - co / len(old), 6)
        r = got[tok]
        assert (r["c_old"], r["c_new"]) == (co, cn)
        assert r["share_delta"] == _approx(delta)
        assert r["abs_delta"] == _approx(abs(delta))
    # surge is the top mover (2/9 new share from zero)
    top = max(got.values(), key=lambda r: r["abs_delta"])
    assert top["tok"] == "surge"


# --------------------------------------------------- conv_depth_histogram


def test_conv_depth_histogram_hand_depths(spark, tmp_path):
    from pdf_extractor_spark.queries import q_conv_depth_histogram

    # conv 0: 3 turns, conv 1: 3 turns, conv 2: 1 turn
    rows = (
        [(k * _CONV_MOD, "a", "en", "s0") for k in range(3)]
        + [(k * _CONV_MOD + 1, "a", "en", "s0") for k in range(3)]
        + [(2, "a", "en", "s0")]
    )
    _write_documents(spark, tmp_path, rows)
    got = {r["n_turns"]: (r["n_convs"], r["cum_share"])
           for r in q_conv_depth_histogram(spark, str(tmp_path)).collect()}
    assert got == {1: (1, round(1 / 3, 4)), 3: (2, 1.0)}


# ------------------------------------------------------- code_share_profile


def test_code_share_profile_hand_flags(spark, tmp_path):
    from pdf_extractor_spark.queries import q_code_share_profile

    code = "def f(x): return g(x); h(x); { a; b; }"       # dense markers
    prose = "plain sentence with no structural punctuation " * 3
    rows = [
        (0, code, "en", "s0"),
        (1, prose, "en", "s0"),
        (2, prose + " more", "en", "s1"),
    ]
    _write_documents(spark, tmp_path, rows)

    def markers(t):
        return sum(t.count(m) for m in (";", "{", "}", "("))

    got = {r["source"]: r.asDict()
           for r in q_code_share_profile(spark, str(tmp_path)).collect()}
    assert markers(code) * 20 >= len(code)          # fixture sanity
    assert markers(prose) * 20 < len(prose)
    r = got["s0"]
    assert (r["n_docs"], r["n_code_docs"]) == (2, 1)
    assert r["code_doc_share"] == 0.5
    assert r["code_char_share"] == round(len(code) / (len(code) + len(prose)), 4)
    assert got["s1"]["n_code_docs"] == 0 and got["s1"]["code_char_share"] == 0.0


# ----------------------------------------------------------- markdown_stats


def test_markdown_stats_hand_counts(spark, tmp_path):
    from pdf_extractor_spark.queries import q_markdown_stats

    md = ("# Title\n## Sub\ntext [link](http://x) and [two](y)\n"
          "```\ncode\n```\nplain tail")
    plain = "no markdown at all here"
    odd_fence = "```\nunclosed fence"
    rows = [(0, md, "en", "s0"), (1, plain, "en", "s0"),
            (2, odd_fence, "en", "s1")]
    _write_documents(spark, tmp_path, rows)
    got = {r["source"]: r.asDict()
           for r in q_markdown_stats(spark, str(tmp_path)).collect()}
    r = got["s0"]
    assert r["headers_total"] == md.count("# ")      # '# ' and '## ' -> 2
    assert r["fenced_blocks_total"] == md.count("```") // 2
    assert r["links_total"] == md.count("](")
    assert r["n_md_docs"] == 1 and r["md_doc_share"] == 0.5
    # odd fence count floors to 0 complete blocks in BOTH engines
    assert got["s1"]["fenced_blocks_total"] == 0
    assert got["s1"]["n_md_docs"] == 1  # the lone fence still marks it


# ----------------------------------------------------------- conv_lang_mix


def test_conv_lang_mix_dominant_and_ties(spark, tmp_path):
    from pdf_extractor_spark.queries import q_conv_lang_mix

    # conv 0: en x2, de x1 -> dominant en; conv 1: de x1, en x1 -> tie,
    # alphabetical winner 'de'; conv 2: single lang
    rows = [
        (0, "a", "en", "s0"), (_CONV_MOD, "a", "en", "s0"),
        (2 * _CONV_MOD, "a", "de", "s0"),
        (1, "a", "de", "s0"), (_CONV_MOD + 1, "a", "en", "s0"),
        (2, "a", "zh", "s0"),
    ]
    _write_documents(spark, tmp_path, rows)
    got = {r["conv"]: r.asDict()
           for r in q_conv_lang_mix(spark, str(tmp_path)).collect()}
    assert got[0]["top_lang"] == "en" and got[0]["n_langs"] == 2
    assert got[0]["top_share"] == round(2 / 3, 4) and got[0]["mixed"]
    assert got[1]["top_lang"] == "de"  # deterministic tiebreak
    assert got[1]["top_share"] == 0.5 and got[1]["mixed"]
    assert got[2]["top_lang"] == "zh" and not got[2]["mixed"]
    assert got[2]["n_langs"] == 1 and got[2]["top_share"] == 1.0


# ------------------------------------------------------------ quality_trend


def _ntile(n_rows, buckets=10):
    """Replicate SQL ntile: earlier buckets take the remainder."""
    base, rem = divmod(n_rows, buckets)
    out = []
    for b in range(1, buckets + 1):
        out.extend([b] * (base + (1 if b <= rem else 0)))
    return out


def test_quality_trend_hand_ntile_and_gate(spark, tmp_path):
    from pdf_extractor_spark.queries import q_quality_trend

    # 12 docs in one source: first 6 pass (long + stopword), last 6 fail
    good = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(i, good, "en", "s0") for i in range(6)]
    rows += [(i, "short junk", "en", "s0") for i in range(6, 12)]
    _write_documents(spark, tmp_path, rows)
    tiles = _ntile(12)
    exp = {}
    for i, t in enumerate(tiles):
        p = i < 6
        n, np_ = exp.get(t, (0, 0))
        exp[t] = (n + 1, np_ + (1 if p else 0))
    got = {r["decile"]: (r["n_docs"], r["n_pass"], r["pass_rate"])
           for r in q_quality_trend(spark, str(tmp_path)).collect()}
    assert set(got) == set(exp)
    for d, (n, np_) in exp.items():
        assert got[d] == (n, np_, round(np_ / n, 4))
    # the trend is visible: early deciles pass, late ones fail
    assert got[1][2] == 1.0 and got[10][2] == 0.0


# -------------------------------------------------- digest_collision_check


def test_digest_collision_check_clean_corpus(spark, tmp_path):
    from pdf_extractor_spark.queries import q_digest_collision_check

    rows = [(i, f"unique text {i}", "en", "s0") for i in range(50)]
    rows += [(100 + i, "repeated text", "en", "s0") for i in range(5)]
    _write_documents(spark, tmp_path, rows)
    r = q_digest_collision_check(spark, str(tmp_path)).collect()[0]
    # 51 DISTINCT texts (the 5 repeats collapse before hashing)
    assert r["n_texts"] == 51
    assert r["n_collisions"] == 0 and r["collision_rate"] == 0.0
    assert r["n_distinct_h32"] == 51
    assert r["birthday_expected"] == round(51 * 50 / 2**33, 6)


# ------------------------------------------------------- arrival_mix_trend


def test_arrival_mix_trend_hand_deciles(spark, tmp_path):
    from pdf_extractor_spark.queries import q_arrival_mix_trend

    # doc_ids 1..20, max=20 -> decile = ceil(id*10/20): two ids per decile.
    # Odd ids source 'a', even ids source 'b' -> every decile is 50/50
    rows = [(i, "txt", "en", "a" if i % 2 else "b") for i in range(1, 21)]
    _write_documents(spark, tmp_path, rows)
    out = q_arrival_mix_trend(spark, str(tmp_path)).collect()
    got = {(r["decile"], r["source"]): (r["n_docs"], r["decile_share"])
           for r in out}
    assert len(got) == 20  # 10 deciles x 2 sources
    for d in range(1, 11):
        assert got[(d, "a")] == (1, 0.5)
        assert got[(d, "b")] == (1, 0.5)


def test_arrival_mix_trend_flooding_source_detected(spark, tmp_path):
    from pdf_extractor_spark.queries import q_arrival_mix_trend

    # source 'flood' only appears in the last 20% of doc_ids
    rows = [(i, "txt", "en", "base") for i in range(1, 81)]
    rows += [(i, "txt", "en", "flood") for i in range(81, 101)]
    _write_documents(spark, tmp_path, rows)
    got = {(r["decile"], r["source"]): r["decile_share"]
           for r in q_arrival_mix_trend(spark, str(tmp_path)).collect()}
    assert got[(10, "flood")] == 1.0
    assert (1, "flood") not in got
    assert got[(1, "base")] == 1.0
