"""Round-5 batch-53 operators on crafted inputs, verified against
independent Python computations: tool_retry_bursts (same-tool run
detection), conv_vocab_drift (half-vs-half vocabulary Jaccard),
dangling_tool_audit (terminal-turn protocol states).

The synthetic conversation view is deterministic — conv = doc_id % 53,
role/tool from independent md5 streams — so the reference computations
replay the exact same call sites from doc_ids alone."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pdf_extractor_spark.queries import (
    _CONV_MOD,
    q_conv_vocab_drift,
    q_dangling_tool_audit,
    q_tool_retry_bursts,
)

_TOOLS = ["search", "python", "browser", "fetch"]


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _role(doc_id: int) -> str:
    return "user" if _md5int(str(doc_id)) % 2 == 0 else "assistant"


def _tool_hash(doc_id: int) -> int:
    return _md5int(f"tool{doc_id}")


def _write_docs(spark, path, doc_ids, texts=None):
    rows = [
        (d, (texts or {}).get(d, f"filler text {d}"), "en", "s",
         len((texts or {}).get(d, f"filler text {d}")))
        for d in doc_ids
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _calls(doc_ids):
    """(conv, doc_id, tool) rows in the synthetic view, ordered."""
    out = []
    for d in sorted(doc_ids):
        th = _tool_hash(d)
        if _role(d) == "assistant" and th % 3 == 0:
            out.append((d % _CONV_MOD, d, _TOOLS[(th // 3) % 4]))
    return out


# -------------------------------------------------------------- retry bursts


def _bursts_ref(doc_ids):
    per_conv = defaultdict(list)
    for conv, d, tool in _calls(doc_ids):
        per_conv[conv].append(tool)
    agg = defaultdict(lambda: {"calls": 0, "runs": 0, "bursts": 0,
                               "maxlen": 0, "in_burst": 0})
    for seq in per_conv.values():
        i = 0
        while i < len(seq):
            j = i
            while j < len(seq) and seq[j] == seq[i]:
                j += 1
            ln, t = j - i, seq[i]
            a = agg[t]
            a["calls"] += ln
            a["runs"] += 1
            a["maxlen"] = max(a["maxlen"], ln)
            if ln >= 2:
                a["bursts"] += 1
                a["in_burst"] += ln
            i = j
    return agg


def test_tool_retry_bursts_matches_reference(spark, tmp_path):
    doc_ids = list(range(1, 1201))  # dense ids -> adjacent same-conv turns
    _write_docs(spark, tmp_path, doc_ids)
    ref = _bursts_ref(doc_ids)
    rows = {r["tool"]: r
            for r in q_tool_retry_bursts(spark, str(tmp_path)).collect()}
    assert set(rows) == set(ref)
    assert any(a["bursts"] > 0 for a in ref.values())  # fixture exercises it
    for t, a in ref.items():
        r = rows[t]
        assert r["n_calls"] == a["calls"]
        assert r["n_runs"] == a["runs"]
        assert r["n_bursts"] == a["bursts"]
        assert r["max_burst_len"] == a["maxlen"]
        assert r["retry_share"] == round(a["in_burst"] / a["calls"], 4)


def test_tool_retry_no_bursts_when_convs_are_singletons(spark, tmp_path):
    # one turn per conversation -> every run has length 1
    doc_ids = list(range(1, _CONV_MOD + 1))
    _write_docs(spark, tmp_path, doc_ids)
    for r in q_tool_retry_bursts(spark, str(tmp_path)).collect():
        assert r["n_bursts"] == 0 and r["retry_share"] == 0.0
        assert r["n_runs"] == r["n_calls"]


# ---------------------------------------------------------- conv vocab drift


def test_conv_vocab_drift_exact_jaccard(spark, tmp_path):
    # one conversation of 4 turns: conv = doc_id % 53, use ids 53,106,159,212
    ids = [53, 106, 159, 212]
    texts = {
        53: "alpha beta gamma",
        106: "beta delta",
        159: "beta epsilon",
        212: "zeta alpha",
    }
    _write_docs(spark, tmp_path, ids, texts)
    # halves: first 2 turns vs last 2.  A={alpha,beta,gamma,delta},
    # B={beta,epsilon,zeta,alpha} -> inter={alpha,beta}=2, union=6
    rows = q_conv_vocab_drift(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["depth_bucket"] == "depth_2_4"
    assert r["n_convs"] == 1
    assert r["avg_jaccard"] == round(2 / 6, 4)
    assert r["min_jaccard"] == round(2 / 6, 4)
    assert r["drifted_share"] == 0.0


def test_conv_vocab_drift_buckets_and_disjoint(spark, tmp_path):
    # conv A: 2 turns, disjoint vocab -> jaccard 0, drifted
    # conv B: 9 turns, identical vocab -> jaccard 1, deep bucket
    ids_a = [1, 54]
    ids_b = [2 + 53 * k for k in range(9)]
    texts = {1: "aaa bbb", 54: "ccc ddd"}
    texts.update({d: "same words here" for d in ids_b})
    _write_docs(spark, tmp_path, ids_a + ids_b, texts)
    rows = {r["depth_bucket"]: r
            for r in q_conv_vocab_drift(spark, str(tmp_path)).collect()}
    assert rows["depth_2_4"]["avg_jaccard"] == 0.0
    assert rows["depth_2_4"]["drifted_share"] == 1.0
    assert rows["depth_9plus"]["avg_jaccard"] == 1.0
    assert rows["depth_9plus"]["drifted_share"] == 0.0
    # single-turn conversations are excluded entirely
    _write_docs(spark, tmp_path, [7], {7: "lonely"})
    assert q_conv_vocab_drift(spark, str(tmp_path)).count() == 0


# -------------------------------------------------------- dangling tool audit


def _final_state(doc_ids):
    per_conv = defaultdict(list)
    for d in sorted(doc_ids):
        per_conv[d % _CONV_MOD].append(d)
    out = defaultdict(list)
    for conv, ds in per_conv.items():
        last = ds[-1]
        if _role(last) == "user":
            st = "ends_user"
        elif _tool_hash(last) % 3 == 0:
            st = "ends_tool_call"
        else:
            st = "ends_assistant"
        out[st].append(len(ds))
    return out


def test_dangling_tool_audit_matches_reference(spark, tmp_path):
    doc_ids = list(range(1, 401))
    _write_docs(spark, tmp_path, doc_ids)
    ref = _final_state(doc_ids)
    rows = {r["final_state"]: r
            for r in q_dangling_tool_audit(spark, str(tmp_path)).collect()}
    assert set(rows) == set(ref)
    assert len(ref) == 3  # fixture exercises all three states
    n_total = sum(len(v) for v in ref.values())
    for st, lens in ref.items():
        r = rows[st]
        assert r["n_convs"] == len(lens)
        assert r["share"] == round(len(lens) / n_total, 4)
        assert r["avg_turns"] == round(sum(lens) / len(lens), 2)
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 3e-4
