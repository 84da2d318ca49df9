"""Round-5 batch-33 operators on crafted inputs, verified against
independent Python computations: shapley_attribution (exact set-Shapley
over the subset lattice vs a direct itertools enumeration, plus the
efficiency axiom), morisita_horn_overlap (abundance overlap vs direct
frequency algebra), histogram_bin_plan (FD/Scott/Sturges widths vs
numpy percentiles).  Plan pins at the bottom."""

from __future__ import annotations

import datetime as dt
import math
import re
from itertools import combinations
from statistics import stdev

import numpy as np

from pdf_extractor_spark.queries import (
    q_histogram_bin_plan,
    q_morisita_horn_overlap,
    q_shapley_attribution,
)

_EPOCH = dt.datetime(1970, 1, 1)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(rows, 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, _EPOCH + dt.timedelta(seconds=s), u, et, 0.0, "{}")
         for i, (u, s, et) in enumerate(rows, 1)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


# ------------------------------------------------------ shapley_attribution


def _sh_expected(paths):
    """paths: per-user event lists.  Returns the op's rows."""
    sets = []
    reach: dict[str, int] = {}
    for p in paths:
        if "purchase" not in p:
            continue
        pre = set(p[: p.index("purchase")])
        sets.append(pre)
        for c in pre:
            reach[c] = reach.get(c, 0) + 1
    channels = sorted(reach, key=lambda c: (-reach[c], c))[:12]
    idx = {c: i for i, c in enumerate(channels)}
    k = len(channels)
    umasks = [sum(1 << idx[c] for c in s if c in idx) for s in sets]
    n = len(umasks)

    def v(smask):
        return sum(1 for u in umasks if (u & smask) == u) / n

    rows = []
    for c in channels:
        bit = 1 << idx[c]
        phi = 0.0
        for s in range(1 << k):
            if s & bit:
                continue
            b = bin(s).count("1")
            w = (math.factorial(b) * math.factorial(k - b - 1)
                 / math.factorial(k))
            phi += w * (v(s | bit) - v(s))
        rows.append((c, reach[c], phi))
    tot = sum(phi for *_, phi in rows)
    return sorted(
        (c, r, round(phi, 4), round(phi / tot, 4) if tot else None)
        for c, r, phi in rows
    )


_SH_PATHS = [
    ["view", "click", "purchase"],
    ["view", "purchase"],
    ["click", "error"],                      # never converts
    ["view", "click", "view", "purchase"],
    ["error"],                               # never converts
    ["click", "purchase"],
    ["purchase", "view", "view"],            # empty pre-purchase set
    ["signup", "view", "purchase"],
]


def _path_rows(paths):
    rows = []
    for u, path in enumerate(paths, 1):
        rows.extend((u, u * 10000 + i, et) for i, et in enumerate(path))
    return rows


def test_shapley_matches_python_enumeration(spark, tmp_path):
    _write_events(spark, tmp_path, _path_rows(_SH_PATHS))
    got = [tuple(r) for r in
           q_shapley_attribution(spark, str(tmp_path)).collect()]
    assert got == _sh_expected(_SH_PATHS)


def test_shapley_efficiency_axiom(spark, tmp_path):
    """Sum of Shapley values = v(full) - v(empty): here 1 - 1/6 (one
    converter has an empty pre-purchase set and is covered by every
    coalition including the empty one)."""
    _write_events(spark, tmp_path, _path_rows(_SH_PATHS))
    rows = q_shapley_attribution(spark, str(tmp_path)).collect()
    total = sum(r.shapley_value for r in rows)
    n_conv = sum(1 for p in _SH_PATHS if "purchase" in p)
    assert abs(total - (1.0 - 1.0 / n_conv)) < 0.001
    shares = sum(r.shapley_share for r in rows)
    assert abs(shares - 1.0) < 0.001


def test_shapley_dummy_channel_gets_zero(spark, tmp_path):
    """A channel appearing ONLY on non-converting paths never enters any
    converter's set, so it is not a player at all; a channel present in
    EVERY converter's set is the biggest player."""
    paths = [
        ["view", "click", "purchase"],
        ["view", "purchase"],
        ["view", "signup", "purchase"],
        ["error", "error"],                  # error only on non-conv
    ]
    _write_events(spark, tmp_path, _path_rows(paths))
    rows = {r.channel: r for r in
            q_shapley_attribution(spark, str(tmp_path)).collect()}
    assert "error" not in rows
    assert rows["view"].shapley_value == max(
        r.shapley_value for r in rows.values())


# ---------------------------------------------------- morisita_horn_overlap


def _mh_expected(rows):
    freqs: dict[str, dict[str, int]] = {}
    for text, src in rows:
        f = freqs.setdefault(src, {})
        for w in _toks(text):
            f[w] = f.get(w, 0) + 1
    out = []
    for a, b in combinations(sorted(freqs), 2):
        fa, fb = freqs[a], freqs[b]
        xy = sum(fa[t] * fb[t] for t in fa.keys() & fb.keys())
        if xy == 0:
            continue
        na, nb = sum(fa.values()), sum(fb.values())
        da = sum(x * x for x in fa.values()) / (na * na)
        db = sum(x * x for x in fb.values()) / (nb * nb)
        out.append((a, b, na, nb,
                    round(2.0 * xy / ((da + db) * na * nb), 4)))
    return out


def test_morisita_horn_matches_python(spark, tmp_path):
    rows = [
        ("the cat sat on the mat", "a"),
        ("the cat ran off", "a"),
        ("the dog sat on the log the dog", "b"),
        ("completely disjoint lexicon here", "c"),
    ]
    _write_docs(spark, tmp_path, [(t, "en", s) for t, s in rows])
    got = [tuple(r) for r in
           q_morisita_horn_overlap(spark, str(tmp_path)).collect()]
    exp = _mh_expected(rows)
    assert got == exp
    # c shares no token with a or b: both pairs omitted
    assert {(x[0], x[1]) for x in got} == {("a", "b")}


def test_morisita_horn_identical_rates_equal_one(spark, tmp_path):
    """Two sources with the same tokens at the same rates: MH = 1."""
    rows = [
        ("x x y z", "a"),
        ("x x y z x x y z", "b"),   # same rates, double mass
        ("x w w w", "c"),           # shares only x with a/b
    ]
    _write_docs(spark, tmp_path, [(t, "en", s) for t, s in rows])
    got = {(r.src_a, r.src_b): r.morisita_horn
           for r in q_morisita_horn_overlap(spark, str(tmp_path)).collect()}
    assert got[("a", "b")] == 1.0
    assert 0 < got[("a", "c")] < 1.0
    assert [tuple(r) for r in
            q_morisita_horn_overlap(spark, str(tmp_path)).collect()] \
        == _mh_expected(rows)


# ------------------------------------------------------- histogram_bin_plan


def _histbin_expected(lengths):
    n = float(len(lengths))
    mn, mx = min(lengths), max(lengths)
    sd = stdev(float(x) for x in lengths)
    q75 = float(np.percentile(lengths, 75))
    q25 = float(np.percentile(lengths, 25))
    iqr = q75 - q25
    fd_w = 2.0 * iqr / n ** (1.0 / 3.0)
    scott_w = 3.49 * sd / n ** (1.0 / 3.0)
    sturges = int(math.ceil(math.log(n) / math.log(2.0))) + 1
    fd_bins = int(math.ceil((mx - mn) / fd_w)) if fd_w > 0 else None
    scott_bins = int(math.ceil((mx - mn) / scott_w)) if scott_w > 0 else None
    return (int(n), mn, mx, round(iqr, 2), round(fd_w, 2), fd_bins,
            round(scott_w, 2), scott_bins, sturges,
            fd_bins if fd_bins is not None else sturges)


def test_histogram_bin_plan_matches_python(spark, tmp_path):
    lengths = [120, 340, 220, 980, 450, 610, 75, 1500, 330, 410,
               260, 720, 95, 880, 510]
    _write_docs(
        spark, tmp_path,
        [("x" * n, "en", "a") for n in lengths],
    )
    r = q_histogram_bin_plan(spark, str(tmp_path)).collect()[0]
    assert tuple(r) == _histbin_expected(lengths)


def test_histogram_bin_plan_degenerate_spike_falls_back(spark, tmp_path):
    """All docs the same length: IQR = 0, FD undefined (null), and the
    recommendation falls back to Sturges."""
    _write_docs(spark, tmp_path, [("x" * 300, "en", "a")] * 9)
    r = q_histogram_bin_plan(spark, str(tmp_path)).collect()[0]
    assert r.iqr == 0.0
    assert r.fd_bins is None
    assert r.recommended_bins == r.sturges_bins
    assert r.sturges_bins == math.ceil(math.log2(9)) + 1


# ------------------------------------------------------------- plan shapes

SF_DIR = "/root/testdata/sf0.001"


def _final(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_shapley_rides_checkpoints(spark):
    """Subset enumeration and the Shapley fold run over the checkpointed
    channel/mask-histogram tables — no parquet in the returned plan,
    and the lattice joins are broadcast, never CartesianProduct."""
    final = _final(q_shapley_attribution(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_morisita_horn_rides_checkpoint(spark):
    final = _final(q_morisita_horn_overlap(spark, SF_DIR))
    assert final.count("Scan parquet") == 0
    assert "CartesianProduct" not in final


def test_histogram_bin_plan_single_scan(spark):
    final = _final(q_histogram_bin_plan(spark, SF_DIR))
    assert final.count("Scan parquet") == 1
    assert "CartesianProduct" not in final
