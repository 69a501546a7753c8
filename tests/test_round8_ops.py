"""Round-8 operator properties: temporal family (q299-q301), Brier
decomposition identity (q302), stump split brute-force (q303),
governance audits incl. the PLANTED-violation branches the clean
fixtures leave dead (q304-q305), and the dq operators."""

from __future__ import annotations

import pytest

import pandas as pd
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark import queries as Q
from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.dq import (
    fk_orphans,
    rule_violations,
)

Q.load_all_modules()


def _events_pdf(spark, sf_dir) -> pd.DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts_us", "value", "props")
        .toPandas()
    )


# ---------------------------------------------------------------------------
# temporal family: brute-force replays in pandas
# ---------------------------------------------------------------------------


def test_q299_scd2_chain_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q299_scd2_intervals"].fn(spark, sf_dir).toPandas()
    ev = _events_pdf(spark, sf_dir)
    sign = ev[ev.event_type == "signup"].sort_values(["user_id", "ts_us", "event_id"])
    rows = []
    for uid, g in sign.groupby("user_id"):
        ts = list(g.ts_us)
        for i, (_, r) in enumerate(g.iterrows()):
            nxt = ts[i + 1] if i + 1 < len(ts) else None
            rows.append((uid, r.event_id, int(r.ts_us), nxt, nxt is None))
    assert len(out) == len(rows)
    got = {(r.user_id, r.change_id): (r.valid_from_us, r.valid_to_us, r.is_current)
           for r in out.itertuples()}
    for uid, cid, frm, to, cur in rows:
        gf, gt, gc = got[(uid, cid)]
        assert gf == frm and gc == cur
        assert (gt is None or pd.isna(gt)) if to is None else gt == to
    # intervals tile: within a user, valid_to == next valid_from
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("valid_from_us")
        for a, b in zip(g.valid_to_us[:-1], g.valid_from_us[1:]):
            assert a == b


def test_q300_pit_never_uses_future_change(spark, sf_dir):
    out = Q.REGISTRY["q300_pit_enrich"].fn(spark, sf_dir).toPandas()
    ev = _events_pdf(spark, sf_dir)
    ev["k"] = ev.props.str.extract(r'"k": (\d+)').astype(float)
    sign = ev[ev.event_type == "signup"]
    pur = ev[ev.event_type == "purchase"]
    expected = {}
    for r in pur.itertuples():
        cand = sign[(sign.user_id == r.user_id) & (sign.ts_us <= r.ts_us)]
        if len(cand):
            best = cand.sort_values(["ts_us", "event_id"]).iloc[-1]
            expected[r.event_id] = int(best.k)
    assert len(out) == len(expected)
    for r in out.itertuples():
        assert expected[r.event_id] == r.attr


def test_q301_coverage_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q301_interval_coverage"].fn(spark, sf_dir).toPandas()
    ev = _events_pdf(spark, sf_dir)
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["e"] = ev.ts_us + ev.cents * 600_000
    for r in out.itertuples():
        g = ev[ev.user_id == r.user_id].sort_values(["ts_us", "event_id"])
        islands, covered = 0, 0
        cur_s = cur_e = None
        for iv in g.itertuples():
            if cur_e is None or iv.ts_us > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands += 1
                cur_s, cur_e = iv.ts_us, iv.e
            else:
                cur_e = max(cur_e, iv.e)
        if cur_e is not None:
            covered += cur_e - cur_s
        assert (r.n_islands, r.covered_us) == (islands, covered)
        # union length can never exceed the sum of lengths or the span
        assert r.covered_us <= int(g.cents.sum()) * 600_000


# ---------------------------------------------------------------------------
# q302: the Murphy identity for the binned forecast system
# ---------------------------------------------------------------------------


def test_q302_murphy_identity(spark, sf_dir):
    row = Q.REGISTRY["q302_brier_decomposition"].fn(spark, sf_dir).toPandas().iloc[0]
    ev = _events_pdf(spark, sf_dir)
    s_bp = (ev.value * 10000 / (ev.value + 50)).apply(int)  # floor of positives
    y = (ev.event_type == "purchase").astype(int)
    df = pd.DataFrame({"bin": s_bp // 1000, "s": s_bp, "y": y})
    n = len(df)
    ybar = df.y.mean()
    rel = res = brier_binned = 0.0
    for _, g in df.groupby("bin"):
        p_k = g.s.mean() / 10000.0
        o_k = g.y.mean()
        rel += len(g) * (p_k - o_k) ** 2
        res += len(g) * (o_k - ybar) ** 2
        brier_binned += ((p_k - g.y) ** 2).sum()
    rel, res, brier_binned = rel / n, res / n, brier_binned / n
    unc = ybar * (1 - ybar)
    # the exact Murphy identity for a discrete (binned) forecast system
    assert abs((rel - res + unc) - brier_binned) < 1e-12
    assert abs(row.rel - rel) < 1e-6 + 1e-9
    assert abs(row.res - res) < 1e-6 + 1e-9
    assert abs(row.unc - unc) < 1e-6 + 1e-9
    brier_raw = (((df.s / 10000.0) - df.y) ** 2).mean()
    assert abs(row.brier_raw - brier_raw) < 1e-6 + 1e-9


# ---------------------------------------------------------------------------
# q303: brute-force split enumeration
# ---------------------------------------------------------------------------


def test_q303_stump_matches_exhaustive_search(spark, sf_dir):
    out = Q.REGISTRY["q303_stump_split"].fn(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_acctbal", "c_nationkey", "c_mktsegment"
    ).toPandas()
    y = (cust.c_mktsegment == "BUILDING").astype(int)
    feats = {
        "acctbal_cents": (cust.c_acctbal * 100).round().astype("int64"),
        "nationkey": cust.c_nationkey.astype("int64"),
    }
    for feature, x in feats.items():
        n, p = len(x), int(y.sum())
        best = None
        for v in sorted(x.unique()):
            left = x <= v
            nl, pl = int(left.sum()), int(y[left].sum())
            err = (nl - max(pl, nl - pl)) + ((n - nl) - max(p - pl, (n - nl) - (p - pl)))
            if best is None or (err, v) < best:
                best = (err, v)
        row = out[out.feature == feature].iloc[0]
        assert (row.err, row.split_value) == best
        assert row.base_err == n - max(p, n - p)
        assert row.err <= row.base_err  # a split never hurts this criterion


def test_q303_planted_perfect_split(spark):
    # a feature that separates the classes perfectly must reach err 0
    # at the boundary value (the branch the real fixture never hits)
    pdf = [(i, i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(pdf, "id long, v long, y long")
    from pyspark.sql import Window

    g = df.groupBy("v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    sweep = g.select(
        "v",
        F.sum("cnt").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
        F.sum("cnt").over(tot).alias("n"),
        F.sum("pos").over(tot).alias("p"),
    )
    nl, pl, n, p = F.col("nl"), F.col("pl"), F.col("n"), F.col("p")
    err = (nl - F.greatest(pl, nl - pl)) + (
        (n - nl) - F.greatest(p - pl, (n - nl) - (p - pl))
    )
    best = sweep.select("v", err.alias("err")).orderBy("err", "v").first()
    assert (best.err, best.v) == (0, 49)


# ---------------------------------------------------------------------------
# governance: planted-violation branches
# ---------------------------------------------------------------------------


def test_fk_orphans_planted(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,), (None,)], "pk long")
    orphans = fk_orphans(child, "fk", parent, "pk")
    assert {r.id for r in orphans.collect()} == {3, 4}  # missing AND NULL fk


def test_rule_violations_planted(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id long, qty double"
    )
    bad = rule_violations(df, F.col("qty") > 0)
    # violations: negative AND NULL (an expectation must not pass unknowns)
    assert {r.id for r in bad.collect()} == {2, 3}


def test_q305_all_clean_on_fixture_and_planted_orphan_counts(spark, sf_dir):
    out = Q.REGISTRY["q305_fk_integrity"].fn(spark, sf_dir).toPandas()
    assert len(out) == 7
    assert (out.n_violations == 0).all()  # the honest pass state
    # planted: two orphans + one NULL in a child of 5
    child = spark.createDataFrame(
        [(i, k) for i, k in enumerate([1, 1, 7, 8, None])], "id long, fk long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    assert fk_orphans(child, "fk", parent, "pk").count() == 3


def test_q304_planted_small_classes(spark):
    # 1 class of 6 (safe at k=5) + 2 classes of 2 (at risk)
    rows = [("a", i) for i in range(6)] + [("b", 0), ("b", 1)] + [("c", 0), ("c", 1)]
    df = spark.createDataFrame(rows, "qi string, id long")
    classes = df.groupBy("qi").agg(F.count(F.lit(1)).alias("k"))
    agg = classes.agg(
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0)).alias("risk"),
        F.sum("k").alias("n"),
        F.min("k").alias("min_k"),
    ).first()
    assert (agg.risk, agg.n, agg.min_k) == (4, 10, 2)


# ---------------------------------------------------------------------------
# m53: planted duplicates + the pigeonhole exactness property
# ---------------------------------------------------------------------------


def test_m53_pigeonhole_banding_exact_for_radius_2():
    # 4 bands x 8 bits over a 32-bit hash: any <=2-bit difference
    # leaves >=2 bands untouched, so band-bucketing finds EVERY
    # hamming<=2 pair — exhaustive over all C(32,2)+32+1 masks
    masks = [0] + [1 << i for i in range(32)] + [
        (1 << i) | (1 << j) for i in range(32) for j in range(i + 1, 32)
    ]
    for m in masks:
        assert any((m >> (8 * b)) & 255 == 0 for b in range(4)), hex(m)


def test_m53_planted_exact_duplicates(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["alpha doc", "alpha doc", "beta doc", "gamma doc"]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["web"] * 4),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = Q.REGISTRY["m53_phash_neardup"].fn(spark, str(tmp_path)).first()
    # identical payloads -> identical sha -> identical aHash -> one
    # confirmed near-dup pair; the two distinct docs stay un-paired
    # unless their random hashes collide in a band (possible) but can
    # never pass the hamming<=2 verification (2^-32-scale chance)
    assert out.n_docs == 4
    assert out.n_neardup == 1


# ---------------------------------------------------------------------------
# q311: planted-signal learning check (the fixture's honest null leaves
# the "model actually learns" branch unexercised)
# ---------------------------------------------------------------------------


def test_q311_irls_learns_planted_signal(spark):
    import math

    import random

    # deterministic planted logistic data: p(y|x) = sigmoid(-2 + 0.004x)
    # (a seeded PRNG, NOT a linear-congruence-of-the-index trick — the
    # first cut drew x and the uniform from the same linear sequence,
    # whose lattice correlation biased the recovered slope ~25%)
    rng = random.Random(42)
    rows = []
    for _ in range(4000):
        x = rng.randrange(4000)
        p = 1.0 / (1.0 + math.exp(-(-2.0 + 0.004 * x)))
        y = 1 if rng.random() < p else 0
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x long, y int")
    b0 = b1 = 0.0
    for _ in range(8):
        z = F.lit(b0) + F.lit(b1) * F.col("x")
        p_mil = F.floor(
            F.lit(1000000.0) / (F.lit(1.0) + F.exp(-z)) + F.lit(0.5)
        ).cast("long")
        w_mic = F.floor(
            (p_mil * (F.lit(1000000) - p_mil) + F.lit(500000))
            / F.lit(1000000.0)
        ).cast("long")
        diff = F.col("y") * 1000000 - p_mil
        r = df.agg(
            F.sum(diff).alias("g0"),
            F.sum(diff * F.col("x")).alias("g1"),
            F.sum(w_mic).alias("h00"),
            F.sum(w_mic * F.col("x")).alias("h01"),
            F.sum(w_mic * F.col("x") * F.col("x")).alias("h11"),
        ).first()
        det = float(r.h00) * float(r.h11) - float(r.h01) * float(r.h01)
        b0 = b0 + (float(r.h11) * r.g0 - float(r.h01) * r.g1) / det
        b1 = b1 + (float(r.h00) * r.g1 - float(r.h01) * r.g0) / det
    # 8 Newton rounds reach the MLE, which on 4000 points recovers the
    # planted coefficients closely (measured MLE: b1=0.00398, b0=-1.92)
    assert abs(b1 - 0.004) < 0.0003, b1
    assert abs(b0 - (-2.0)) < 0.2, b0


# ---------------------------------------------------------------------------
# round-8 session-2 batch 1: q313-q316 (t-closeness, McNemar, CA, BF)
# ---------------------------------------------------------------------------


def test_q313_emd_brute_force(spark, sf_dir):
    from fractions import Fraction

    out = Q.REGISTRY["q313_t_closeness"].fn(spark, sf_dir).first()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cents = (orders.o_totalprice * 100).round().astype("int64")
    spend = cents.groupby(orders.o_custkey).sum()
    sv = cust.c_custkey.map(lambda k: spend.get(k, -100000000) // 100000000)
    bal = ((cust.c_acctbal * 100).round().astype("int64") // 100000)
    import collections

    cls = collections.defaultdict(collections.Counter)
    for qi, v in zip(zip(cust.c_nationkey, cust.c_mktsegment, bal), sv):
        cls[qi][int(v)] += 1
    glob = collections.Counter()
    for c in cls.values():
        glob.update(c)
    vals = sorted(glob)
    n = sum(glob.values())
    m = len(vals)
    ts = []
    for c in cls.values():
        k = sum(c.values())
        cp = cq = 0
        num = 0
        for v in vals:
            cp += c.get(v, 0)
            cq += glob[v]
            num += abs(cp * n - cq * k)
        ts.append(Fraction(num, k * n * (m - 1)))
    assert out.n_classes == len(cls)
    assert out.m_values == m
    assert out.n_over_t == sum(t > Fraction(1, 5) for t in ts)
    assert abs(out.t_max - float(max(ts))) < 1e-9


def test_q314_planted_divergence_and_degenerate(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # A (n_chars > 306) always right, B (spaces > 60) always wrong:
    # en docs are long with few spaces, non-en short with many spaces
    texts = ["x" * 400] * 6 + [("y " * 70).strip()] * 6
    t = pa.table(
        {
            "doc_id": pa.array(range(12), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 6 + ["de"] * 6),
            "source": pa.array(["web"] * 12),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    d1 = tmp_path / "div"
    d1.mkdir()
    pq.write_table(t, str(d1 / "documents.parquet"))
    out = Q.REGISTRY["q314_mcnemar"].fn(spark, str(d1)).first()
    assert (out.n_only_a, out.n_only_b) == (12, 0)
    assert out.mcnemar_chi2 == round(11 * 11 / 12, 6)
    # degenerate: A and B always agree -> b+c=0 -> NULL statistic
    t2 = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([("y " * 250).strip(), "y z"]),
            "lang": pa.array(["en", "de"]),
            "source": pa.array(["web", "web"]),
            "n_chars": pa.array([499, 3], type=pa.int64()),
        }
    )
    d2 = tmp_path / "deg"
    d2.mkdir()
    pq.write_table(t2, str(d2 / "documents.parquet"))
    row = Q.REGISTRY["q314_mcnemar"].fn(spark, str(d2)).first()
    assert (row.n_only_a, row.n_only_b) == (0, 0)
    assert row.mcnemar_chi2 is None


def test_q315_planted_monotone_trend(spark, tmp_path):
    # success rate rises 10% -> 90% across priorities 1..5: the trend
    # branch the uniform fixture leaves at ~0 must light up
    rows = []
    for x in range(1, 6):
        succ = 2 * x - 1  # 1,3,5,7,9 of 10
        for i in range(10):
            rows.append((f"{x}-P", "F" if i < succ else "O"))
    df = spark.createDataFrame(rows, "o_orderpriority string, o_orderstatus string")
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = Q.REGISTRY["q315_cochran_armitage"].fn(spark, str(tmp_path)).first()
    assert out.n == 50 and out.n_success == 25
    assert out.trend_num > 0  # increasing trend
    # exact CA z^2 for this design: A=N*Sxr-R*Sxn, B=N*Sxxn-Sxn^2
    a = 50 * (1 * 1 + 2 * 3 + 3 * 5 + 4 * 7 + 5 * 9) - 25 * 150
    bb = 50 * 550 - 150 * 150
    expect = 50 * a * a / (25 * 25 * bb)
    assert abs(out.ca_z2 - round(expect, 6)) < 1e-9
    assert out.ca_z2 > 10  # decisively non-null


def test_q316_planted_variance_gap(spark, tmp_path):
    import datetime

    # two groups with equal medians, one 10x wider: BF must reject
    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(40):
        rows.append((i, t0, 0, "narrow", 100.0 + ((i % 5) - 2) * 0.01, "{}"))
    for i in range(40):
        rows.append((100 + i, t0, 0, "wide", 100.0 + ((i % 5) - 2) * 10.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = Q.REGISTRY["q316_brown_forsythe"].fn(spark, str(tmp_path)).first()
    assert out.n == 80 and out.k_groups == 2
    # z means: narrow 1 cent, wide 1000 cents (doubled: 2 and 2000)
    assert out.bf_f > 100


# ---------------------------------------------------------------------------
# round-8 session-2 batch 2: q317-q320 (ANOVA, CvM, Holm, Nelson-Aalen)
# ---------------------------------------------------------------------------


def test_q317_anova_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q317_anova_f"].fn(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).toPandas()
    q = li.l_quantity.astype("int64")
    n = len(q)
    groups = [g for _, g in q.groupby(li.l_returnflag)]
    k = len(groups)
    grand = q.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out.n == n and out.k_groups == k
    assert abs(out.f_stat - f) < 1e-4
    assert abs(out.eta2 - ssb / (ssb + ssw)) < 1e-6


def test_q318_cvm_brute_force_and_planted_shift(spark, sf_dir, tmp_path):
    import numpy as np

    out = Q.REGISTRY["q318_cvm_two_sample"].fn(spark, sf_dir).first()
    ev = _events_pdf(spark, sf_dir)
    x = (ev[ev.event_type == "click"].value * 100).round().astype("int64").to_numpy()
    y = (ev[ev.event_type == "view"].value * 100).round().astype("int64").to_numpy()
    n, m = len(x), len(y)
    pooled = np.concatenate([x, y])
    vals = np.unique(pooled)
    a = np.searchsorted(np.sort(x), vals, side="right")
    b = np.searchsorted(np.sort(y), vals, side="right")
    w = np.searchsorted(np.sort(pooled), vals, side="right") - np.searchsorted(
        np.sort(pooled), vals, side="left"
    )
    t_cvm = float((w * (a * m - b * n).astype("float64") ** 2).sum()) / (
        n * m * (n + m) ** 2
    )
    assert (out.n1, out.n2) == (n, m)
    assert abs(out.t_cvm - t_cvm) < 1e-6
    # planted: a hard location shift must blow the statistic up
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(200):
        rows.append((i, t0, 0, "click", 10.0 + (i % 5), "{}"))
        rows.append((1000 + i, t0, 0, "view", 200.0 + (i % 5), "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    shifted = Q.REGISTRY["q318_cvm_two_sample"].fn(spark, str(tmp_path)).first()
    # disjoint supports: T -> nm/N^2 * sum w * 1 over one side's mass
    assert shifted.t_cvm > 0.1
    assert shifted.t_cvm > 50 * out.t_cvm


def test_q319_holm_subset_of_bh_and_planted_rejections(spark):
    from osm_changesets_to_parquet_spark.operators.multitest import (
        bh_stepup,
        holm_stepdown,
    )

    # planted p-values with a clear signal block: Holm must reject a
    # (possibly strict) subset of BH's rejections at the same alpha
    ps = [0.0001, 0.0004, 0.002, 0.006, 0.011, 0.2, 0.5, 0.8, 0.9, 0.95]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(ps)], "hid long, pv double")
    hs = {r.hid: r.rejected for r in holm_stepdown(df, "pv", 0.05, ("hid",)).collect()}
    hb = {r.hid: r.rejected for r in bh_stepup(df, "pv", 0.05, ("hid",)).collect()}
    assert any(hs.values())  # reject branch exercised
    for hid, rej in hs.items():
        assert (not rej) or hb[hid]  # Holm subset of BH
    # hand-checked Holm at alpha=.05 over m=10:
    # thresholds .005, .00556, .00625, .00714, .00833 ...
    # p=(1e-4, 4e-4, 2e-3) pass; p=.006 at rank 4 (thr .00714) passes;
    # p=.011 at rank 5 (thr .00833) FAILS -> reject first 4 only
    assert [hs[i] for i in range(10)] == [True] * 4 + [False] * 6
    # fixture: both procedures all-false (honest null)
    out = Q.REGISTRY["q319_holm_stepdown"].fn(spark, "/root/testdata/sf0.001").toPandas()
    assert (~out.rejected_holm).all() and (~out.rejected_bh).all()


def test_q320_nelson_aalen_vs_km(spark, sf_dir):
    na = Q.REGISTRY["q320_nelson_aalen"].fn(spark, sf_dir).toPandas()
    km = Q.REGISTRY["q219_kaplan_meier"].fn(spark, sf_dir).toPandas()
    assert list(na.day) == list(km.day)
    assert (na.n_at_risk == km.n_at_risk).all()
    assert (na.n_events == km.n_events).all()
    # 1-x <= e^-x: Fleming-Harrington survival dominates KM pointwise
    for s_fh, s_km in zip(na.s_fleming, km.s_t):
        assert s_fh >= s_km - 1e-9
    # brute-force H(t): cumulative d/n over the life table
    h = 0.0
    for r in na.itertuples():
        h += r.n_events / r.n_at_risk
        assert abs(r.h_t - h) < 1e-6
    # monotone nonincreasing variance increments... variance itself is
    # nondecreasing in t
    assert (na.var_h.diff().dropna() >= -1e-12).all()


# ---------------------------------------------------------------------------
# round-8 session-2 batch 3: q321-q323 (backtest, Simpson, components)
# ---------------------------------------------------------------------------


def test_q321_backtest_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q321_forecast_backtest"].fn(spark, sf_dir).toPandas()
    ev = _events_pdf(spark, sf_dir)
    day = (ev.ts_us // 86_400_000_000) - (ev.ts_us // 86_400_000_000).min()
    # ts_us floor-div epoch-day aligns with date_diff from 2024-01-01
    # because the fixture starts on that date
    dmax = int(day.max())
    for r in out.itertuples():
        g = ev[ev.event_type == r.event_type]
        gd = (g.ts_us // 86_400_000_000) - (ev.ts_us // 86_400_000_000).min()
        y = [int((gd == t).sum()) for t in range(dmax + 1)]
        errs = [abs(y[t] - y[t - 7]) for t in range(7, dmax + 1)]
        naive = [abs(y[t] - y[t - 1]) for t in range(1, dmax + 1)]
        smape = [
            0.0 if y[t] + y[t - 7] == 0 else 2 * abs(y[t] - y[t - 7]) / (y[t] + y[t - 7])
            for t in range(7, dmax + 1)
        ]
        assert r.horizon == len(errs)
        assert abs(r.mae - sum(errs) / len(errs)) < 1e-6
        assert abs(r.smape - sum(smape) / len(smape)) < 1e-6
        assert abs(r.mase - (sum(errs) / len(errs)) / (sum(naive) / len(naive))) < 1e-6


def test_q322_planted_simpson_reversal(spark, tmp_path):
    # classic confounding: within each group quantity FALLS with
    # discount, but the high-discount group has much higher base
    # quantity -> the pooled slope rises.  The audit must flag it.
    rows = []
    for i in range(50):  # group A: x in {0..4}, y = 10 - x + small dither
        x = i % 5
        rows.append(("A", float(x) / 100.0, float(10 - x)))
    for i in range(50):  # group B: x in {6..10}, y = 100 - (x-6)
        x = 6 + (i % 5)
        rows.append(("B", float(x) / 100.0, float(100 - (x - 6))))
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_discount double, l_quantity double"
    )
    df.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = Q.REGISTRY["q322_simpson_paradox"].fn(spark, str(tmp_path)).first()
    assert out.n_groups == 2 and out.n_pos_groups == 0
    assert out.slope_within < 0 < out.slope_overall
    assert bool(out.reversal)


def test_q323_components_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q323_connected_components"].fn(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().toPandas()
    import collections

    per_order = collections.defaultdict(set)
    for r in li.itertuples():
        per_order[r.l_orderkey].add(r.l_partkey)
    cnt = collections.Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cnt[(ps[i], ps[j])] += 1
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (u, v), c in cnt.items():
        if c >= 2:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    comp = collections.Counter(find(x) for x in parent)
    hist = collections.Counter(comp.values())
    assert {int(r.size): int(r.n_components) for r in out.itertuples()} == dict(hist)


def test_q323_planted_two_chains(spark):
    from osm_changesets_to_parquet_spark.operators.clusters import (
        connected_components,
    )

    # two long chains exercise multi-round propagation; labels must be
    # each chain's minimum id
    pairs = [(i, i + 1) for i in range(0, 9)] + [(100 + i, 101 + i) for i in range(0, 5)]
    df = spark.createDataFrame(pairs, "p1 long, p2 long")
    lab = {r.id: r.label for r in connected_components(df, "p1", "p2").collect()}
    assert all(lab[i] == 0 for i in range(10))
    assert all(lab[100 + i] == 100 for i in range(6))


# ---------------------------------------------------------------------------
# round-8 session-2 batch 4: s25 streaming sketch + m54 scene cuts
# ---------------------------------------------------------------------------


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_s25_sketch_bound_holds(spark, sf_dir):
    out = Q.REGISTRY["s25_stream_quantile_sketch"].fn(spark, sf_dir).toPandas()
    assert list(out.q_bp) == [5000, 9000, 9900]
    # CMS-style guarantee for an equi-width histogram: the exact
    # quantile lies inside [bin_lo, bin_lo + 2*width)
    assert out.within_bound.all()
    assert ((out.err_cents >= 0) & (out.err_cents < 128)).all()
    # the read-off must sit on a bin boundary of the pinned domain
    assert (out.approx_lo_cents % 64 == 0).all()


def test_m54_scene_cuts_brute_force(spark, sf_dir):
    import hashlib

    out = Q.REGISTRY["m54_video_scene_cuts"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).where(F.col("text").isNotNull()).toPandas()
    expect = {}
    for r in docs.itertuples():
        strip = hashlib.sha256(r.text.encode()).digest()
        means = [sum(strip[4 * f : 4 * f + 4]) / 4.0 for f in range(8)]
        cuts = [
            f
            for f in range(1, 8)
            if abs(means[f] - means[f - 1]) > 48.0
        ]
        expect[r.doc_id] = (8, len(cuts), sum(1 << f for f in cuts))
    assert len(out) == len(expect)
    for r in out.itertuples():
        assert expect[r.doc_id] == (r.n_frames, r.n_cuts, r.cut_mask)
