"""Round-8 session-3 operator properties: brute-force replays of the
graph additions (q324 HITS, q331 WL refinement, q333 k-hop reach) in
plain Python over the sf fixture — independent of both engines."""

from __future__ import annotations

import collections
import hashlib

from osm_changesets_to_parquet_spark import queries as Q
from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.quality import ID_FOLD, KNUTH

Q.load_all_modules()


def _copurchase_edges(spark, sf_dir):
    """(u, v) part pairs sharing >= 2 distinct orders — q238's graph."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    by_order = collections.defaultdict(set)
    for r in li.itertuples():
        by_order[r.l_orderkey].add(r.l_partkey)
    cnt = collections.Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                cnt[(u, v)] += 1
    return {e for e, c in cnt.items() if c >= 2}


def test_q324_hits_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q324_hits"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li = li[li.l_partkey <= 200]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = set(zip(m.o_custkey, m.l_partkey))
    by_c = collections.defaultdict(set)
    by_p = collections.defaultdict(set)
    for c, p in edges:
        by_c[c].add(p)
        by_p[p].add(c)
    a1 = {p: len(cs) for p, cs in by_p.items()}
    h1 = {c: sum(a1[p] for p in ps) for c, ps in by_c.items()}
    th1 = sum(h1.values())
    h1q = {c: int(s * 1e9 / th1 + 0.5) for c, s in h1.items()}
    a2 = {p: sum(h1q[c] for c in cs) for p, cs in by_p.items()}
    ta2 = sum(a2.values())
    a2q = {p: int(s * 1e9 / ta2 + 0.5) for p, s in a2.items()}
    h2 = {c: sum(a2q[p] for p in ps) for c, ps in by_c.items()}
    th2 = sum(h2.values())
    got = {(r.side, r.id): r.score for r in out.itertuples()}
    assert len(got) == len(a2) + len(h2)
    for p, s in a2.items():
        assert abs(got[("auth", p)] - s / ta2) < 1e-6
    for c, s in h2.items():
        assert abs(got[("hub", c)] - s / th2) < 1e-6
    # each side's normalized scores sum to ~1
    assert abs(sum(s for (k, _), s in got.items() if k == "auth") - 1) < 1e-3
    assert abs(sum(s for (k, _), s in got.items() if k == "hub") - 1) < 1e-3


def test_q331_wl_brute_force_and_monotone(spark, sf_dir):
    out = Q.REGISTRY["q331_wl_refinement"].fn(spark, sf_dir).toPandas()
    edges = _copurchase_edges(spark, sf_dir)
    adj = collections.defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    colors = {v: str(len(ns)) for v, ns in adj.items()}
    rows = {}
    for r in range(3):
        sizes = collections.Counter(colors.values())
        rows[r] = (
            len(sizes),
            max(sizes.values()),
            sum(1 for n in sizes.values() if n == 1),
        )
        colors = {
            v: hashlib.md5(
                (
                    colors[v] + "|" + ",".join(sorted(colors[w] for w in ns))
                ).encode()
            ).hexdigest()
            for v, ns in adj.items()
        }
    assert len(out) == 3
    for rec in out.itertuples():
        assert rows[rec.r] == (rec.n_classes, rec.max_class, rec.n_singletons)
    # refinement is monotone: classes never merge round-over-round
    ncl = list(out.sort_values("r").n_classes)
    assert ncl == sorted(ncl)


def test_q333_khop_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q333_khop_reach"].fn(spark, sf_dir).toPandas()
    edges = _copurchase_edges(spark, sf_dir)
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = sorted(adj, key=lambda v: (((v % ID_FOLD) * KNUTH) % 1_000_000_007, v))[:16]
    assert sorted(out.seed) == sorted(seeds)
    for rec in out.itertuples():
        n1 = adj[rec.seed]
        n2 = set().union(*(adj[n] for n in n1)) - n1 - {rec.seed}
        assert rec.n_1hop == len(n1)
        assert rec.n_2hop_new == len(n2)
        assert rec.reach == 1 + len(n1) + len(n2)


def test_q326_credit_decomposition(spark, sf_dir):
    out = Q.REGISTRY["q326_position_attribution"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    win = 7 * 86_400_000_000
    p = ev[ev.event_type == "purchase"]
    t = ev[ev.event_type.isin(["view", "click"])]
    by_user = dict(tuple(t.groupby("user_id")))
    n_assisted, credit = collections.Counter(), collections.Counter()
    touches = collections.Counter()
    for r in p.itertuples():
        g = by_user.get(r.user_id)
        if g is None:
            continue
        tt = g[(g.ts_us < r.ts_us) & (g.ts_us >= r.ts_us - win)].sort_values(
            ["ts_us", "event_id"]
        )
        n = len(tt)
        if n == 0:
            continue
        chans = list(tt.event_type)
        for i, ch in enumerate(chans):
            touches[ch] += 1
            if n == 1:
                credit[ch] += 1.0
            elif n == 2:
                credit[ch] += 0.5
            elif i == 0 or i == n - 1:
                credit[ch] += 0.4
            else:
                credit[ch] += 0.2 / (n - 2)
        for ch in set(chans):
            n_assisted[ch] += 1
    got = {r.channel: r for r in out.itertuples()}
    assert set(got) == set(credit)
    for ch in credit:
        assert got[ch].n_touches == touches[ch]
        assert got[ch].n_assisted == n_assisted[ch]
        assert abs(got[ch].credit - credit[ch]) < 1e-3
    # credits decompose conversions: channel totals sum to the
    # attributed-purchase credit mass (each purchase contributes 1.0)
    total = sum(credit.values())
    assert abs(sum(r.credit for r in out.itertuples()) - total) < 1e-3


def test_q330_jsd_bounds_and_brute_force(spark, sf_dir):
    import math

    out = Q.REGISTRY["q330_js_divergence"].fn(spark, sf_dir).toPandas()
    d = load_table(spark, sf_dir, "documents").toPandas()
    counts = d.groupby(["source", "lang"]).size()
    totals = d.groupby("source").size()
    sources = sorted(totals.index)
    langs = sorted(d.lang.unique())
    exp = {}
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            jsd = 0.0
            for lg in langs:
                pp = counts.get((sa, lg), 0) / totals[sa]
                qq = counts.get((sb, lg), 0) / totals[sb]
                if pp > 0:
                    jsd += 0.5 * pp * math.log2(2 * pp / (pp + qq))
                if qq > 0:
                    jsd += 0.5 * qq * math.log2(2 * qq / (pp + qq))
            exp[(sa, sb)] = jsd
    assert len(out) == len(exp)
    for r in out.itertuples():
        assert 0.0 <= r.jsd_bits <= 1.0  # JSD in bits is bounded by 1
        assert abs(r.jsd_bits - exp[(r.source_a, r.source_b)]) < 1e-5


def test_q327_laplace_inverse_cdf(spark, sf_dir):
    import math

    out = Q.REGISTRY["q327_dp_noisy_counts"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    true_counts = ev.groupby("event_type").size()
    mod = 1_000_000_007
    for r in out.itertuples():
        h = 0
        for ch in r.event_type:
            h = (h * 31 + ord(ch)) % mod
        b = ((h % ID_FOLD) * KNUTH) % mod
        t = (b + 1) / 1_000_000_008 - 0.5
        noise = -math.copysign(1, t) * math.log(1 - 2 * abs(t)) if t != 0 else 0.0
        assert r.n_true == true_counts[r.event_type]
        assert abs(r.noise - noise) < 1e-3
        assert abs(r.n_noisy - (r.n_true + noise)) < 1e-3
        assert r.epsilon == 1.0
