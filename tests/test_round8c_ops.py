"""Round-8 session-3 operator properties: brute-force replays of the
graph additions (q324 HITS, q331 WL refinement, q333 k-hop reach) in
plain Python over the sf fixture — independent of both engines."""

from __future__ import annotations

import pytest

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


def test_q325_fs_weights_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q325_fellegi_sunter"].fn(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    import math

    recs = []
    for r in cust.itertuples():
        cents = math.floor(r.c_acctbal * 100 + 0.5)
        bkt = ((r.c_custkey % ID_FOLD) * KNUTH) % 100
        a = (r.c_custkey, r.c_nationkey, r.c_name, r.c_mktsegment,
             math.floor(cents / 10000.0))
        bname = r.c_name + "X" if bkt < 10 else r.c_name
        bseg = "__CORRUPT__" if 10 <= bkt < 30 else r.c_mktsegment
        bcents = cents + (3700 if 30 <= bkt < 40 else 0)
        b = (r.c_custkey, r.c_nationkey, bname, bseg,
             math.floor(bcents / 10000.0))
        recs.append((a, b))
    n_cand = n_match = 0
    agree = {k: [0, 0] for k in ("name", "segment", "balance")}
    for a, *_ in [(x[0],) for x in recs]:
        pass
    as_, bs_ = [x[0] for x in recs], [x[1] for x in recs]
    for a in as_:
        for b in bs_:
            if a[1] != b[1]:
                continue
            mt = a[0] == b[0]
            n_cand += 1
            n_match += mt
            for k, i in (("name", 2), ("segment", 3), ("balance", 4)):
                if a[i] == b[i]:
                    agree[k][0 if mt else 1] += 1
    got = {r.field: r for r in out.itertuples()}
    for k in agree:
        m = min(max(agree[k][0] / n_match, 0.001), 0.999)
        u = min(max(agree[k][1] / (n_cand - n_match), 0.001), 0.999)
        assert got[k].n_cand == n_cand and got[k].n_match == n_match
        assert abs(got[k].m - m) < 1e-3
        assert abs(got[k].u - u) < 1e-3
        assert abs(got[k].w_agree - math.log2(m / u)) < 1e-2
        assert abs(got[k].w_disagree - math.log2((1 - m) / (1 - u))) < 1e-2
    # corruption design: matches mostly agree, weights separate
    assert got["name"].m > 0.8 and got["name"].u < 0.1
    assert got["name"].w_agree > 0 > got["name"].w_disagree


def test_q328_shrinkage_property(spark, sf_dir):
    out = Q.REGISTRY["q328_empirical_bayes"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    alpha, beta = out.alpha.iloc[0], out.beta.iloc[0]
    assert alpha > 0 and beta > 0
    prior = alpha / (alpha + beta)
    for r in out.itertuples():
        lo, hi = sorted((r.raw_rate, prior))
        # posterior mean lies between the raw rate and the prior mean
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6
        # shrinkage is stronger for smaller n
        assert r.n > 0 and r.x <= r.n


def test_q329_qini_identities(spark, sf_dir):
    out = Q.REGISTRY["q329_uplift_qini"].fn(spark, sf_dir).toPandas()
    assert 1 <= len(out) <= 10
    # cumulative identity: qini at depth k recomputes from the cells
    o = out.sort_values("decile", ascending=False)
    cct = ccc = cnt = cnc = 0
    for r in o.itertuples():
        cct += r.conv_t
        ccc += r.conv_c
        cnt += r.n_t
        cnc += r.n_c
        if cnc > 0:
            assert abs(r.qini - (cct - ccc * cnt / cnc)) < 2e-4
        if r.n_t > 0 and r.n_c > 0:
            assert abs(r.uplift - (r.conv_t / r.n_t - r.conv_c / r.n_c)) < 2e-6


def test_q332_kn_beats_add1(spark, sf_dir):
    import math

    out = Q.REGISTRY["q332_lm_holdout"].fn(spark, sf_dir).toPandas()
    got = {r.model: r for r in out.itertuples()}
    assert set(got) == {"add1", "kneser_ney"}
    assert got["add1"].n_bigrams == got["kneser_ney"].n_bigrams > 0
    for r in got.values():
        assert abs(r.ppl - 2 ** r.mean_nll_bits) < max(0.01 * r.ppl, 0.01)
    # on this burstiness-free synthetic vocabulary the two smoothers
    # tie (the honest fixture answer) -- assert they agree closely and
    # both sit near the corpus entropy scale
    assert abs(got["kneser_ney"].mean_nll_bits - got["add1"].mean_nll_bits) < 0.1
    assert 1.0 < got["add1"].mean_nll_bits < 20.0


def test_m55_vad_brute_force(spark, sf_dir):
    import hashlib as hl

    out = Q.REGISTRY["m55_audio_vad"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").toPandas()
    docs = docs[docs.text.notna()]
    assert len(out) == len(docs)
    got = {r.doc_id: r for r in out.itertuples()}
    for d in docs.itertuples():
        strip = hl.sha256(d.text.encode()).digest()
        means = [
            sum(strip[4 * f + j] for j in range(4)) / 4.0 for f in range(8)
        ]
        active = [m >= 128.0 for m in means]
        runs, cur = [], 0
        for a in active:
            if a:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        r = got[d.doc_id]
        assert r.n_frames == 8
        assert r.n_active == sum(active)
        assert r.n_segments == len(runs)
        assert r.max_run == (max(runs) if runs else 0)


def test_q334_gmm_brute_force(spark, sf_dir):
    import math

    out = Q.REGISTRY["q334_gmm_em"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    cs = [int(math.floor(v * 100 + 0.5)) if (v * 100) % 1 == 0.5 else int(round(v * 100))
          for v in ev.value]
    n = len(cs)
    sx, sxx = sum(cs), sum(c * c for c in cs)
    sorted_c = sorted(cs)
    cum, q25, q75 = 0, None, None
    from collections import Counter

    cnt = Counter(cs)
    for c in sorted(cnt):
        cum += cnt[c]
        if q25 is None and cum >= math.ceil(n * 0.25):
            q25 = c
        if q75 is None and cum >= math.ceil(n * 0.75):
            q75 = c
    sig0 = math.sqrt((float(sxx) - float(sx) * float(sx) / float(n)) / float(n))
    w, mu1, s1, mu2, s2 = 0.5, float(q25), sig0, float(q75), sig0
    n1 = 0
    for _ in range(3):
        n1 = sx1 = sxx1 = 0
        for c in cs:
            z1 = (c - mu1) / s1
            z2 = (c - mu2) / s2
            l1 = w * math.exp(-0.5 * z1 * z1) / s1
            l2 = (1 - w) * math.exp(-0.5 * z2 * z2) / s2
            rq = int(math.floor(l1 / (l1 + l2) * 1000 + 0.5))
            n1 += rq
            sx1 += rq * c
            sxx1 += rq * c * c
        w = n1 * 1.0 / (1000.0 * n)
        mu1 = float(sx1) / float(n1)
        s1 = math.sqrt(max(float(sxx1) / float(n1)
                           - (float(sx1) / float(n1)) ** 2, 1.0))
        n2, sx2, sxx2 = 1000 * n - n1, 1000 * sx - sx1, 1000 * sxx - sxx1
        mu2 = float(sx2) / float(n2)
        s2 = math.sqrt(max(float(sxx2) / float(n2)
                           - (float(sx2) / float(n2)) ** 2, 1.0))
    got = {r.comp: r for r in out.itertuples()}
    assert abs(got[1].weight - w) < 1e-4
    assert abs(got[1].mu_dollars - mu1 / 100) < 1e-2
    assert abs(got[2].mu_dollars - mu2 / 100) < 1e-2
    assert got[1].n_milli == n1 and got[2].n_milli == 1000 * n - n1
    # the components actually separate: low-mean bulk vs high-mean tail
    assert got[1].mu_dollars < got[2].mu_dollars
    assert 0.0 < got[1].weight < 1.0


def test_q335_textrank_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q335_textrank_keywords"].fn(spark, sf_dir).toPandas()
    d = load_table(spark, sf_dir, "documents").toPandas()
    pairs = collections.Counter()
    for t in d.text:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    edges = set()
    for (a, b), c in pairs.items():
        if c >= 2:
            edges.add((a, b))
            edges.add((b, a))
    nodes = sorted({x for e in edges for x in e})
    out_nbrs = collections.defaultdict(list)
    for s, t in edges:
        out_nbrs[s].append(t)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        inmass = collections.defaultdict(float)
        for s in nodes:
            for t in out_nbrs[s]:
                inmass[t] += rank[s] / len(out_nbrs[s])
        rank = {v: 0.15 / n + 0.85 * inmass[v] for v in nodes}
    top = sorted(nodes, key=lambda v: (-round(rank[v], 6), v))[:20]
    assert list(out.word) == top
    for r in out.itertuples():
        assert abs(r.rank - round(rank[r.word], 6)) < 2e-6
    # ranks are a probability-mass decomposition (sum ~ 1)
    assert abs(sum(rank.values()) - 1.0) < 1e-6


def test_q336_item_cf_brute_force(spark, sf_dir):
    import math

    out = Q.REGISTRY["q336_item_cf"].fn(spark, sf_dir).toPandas()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    deg = li.groupby("l_partkey").size().to_dict()
    by_order = collections.defaultdict(set)
    for r in li.itertuples():
        by_order[r.l_orderkey].add(r.l_partkey)
    co = collections.Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    cand = collections.defaultdict(list)
    for (a, b), c in co.items():
        if c >= 2:
            cos = round(c / math.sqrt(float(deg[a] * deg[b])), 6)
            cand[a].append((cos, b, c))
            cand[b].append((cos, a, c))
    exp_rows = {}
    for p, lst in cand.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (cos, nbr, c) in enumerate(lst[:5], 1):
            exp_rows[(p, rnk)] = (nbr, c, cos)
    assert len(out) == len(exp_rows)
    for r in out.itertuples():
        nbr, c, cos = exp_rows[(r.p, r.rnk)]
        assert r.nbr == nbr and r.co_count == c
        assert abs(r.cosine - cos) < 1e-6


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_q337_dbscan_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q337_dbscan"].fn(spark, sf_dir).toPandas()
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    pts = {
        r.vec_id: (float(r.embedding[0]), float(r.embedding[1]))
        for r in emb.itertuples()
    }
    eps2 = 0.02 * 0.02
    nbrs = collections.defaultdict(set)
    ids = sorted(pts)
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 < eps2:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {p for p in ids if len(nbrs[p]) >= 4}
    # components of the core-core graph
    label = {}
    for p in sorted(core):
        if p in label:
            continue
        stack, comp = [p], []
        seen = {p}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    border = {}
    for p in ids:
        if p in core:
            continue
        cl = [label[q] for q in nbrs[p] if q in core]
        if cl:
            border[p] = min(cl)
    sizes = collections.Counter(label.values())
    for lbl in border.values():
        sizes[lbl] += 1
    r = out.iloc[0]
    assert r.n_points == len(ids)
    assert r.n_core == len(core)
    assert r.n_border == len(border)
    assert r.n_noise == len(ids) - len(core) - len(border)
    assert r.n_clusters == len(sizes)
    assert r.max_cluster == max(sizes.values())


def test_s26_boundary_partition_exact(spark, sf_dir):
    out = Q.REGISTRY["s26_backfill_cutover"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    cut = 1_705_276_800_000_000
    exp = {}
    for t, g in ev.groupby("event_type"):
        nb = int((g.ts_us <= cut).sum())
        ns = int((g.ts_us > cut).sum())
        cents = int(g.value.apply(lambda v: round(v * 100)).sum())
        exp[t] = (nb, ns, nb + ns, cents)
    assert len(out) == len(exp)
    for r in out.itertuples():
        nb, ns, n, cents = exp[r.event_type]
        # the <=/> pair partitions exactly: no boundary event is lost
        # or double-counted across the batch/stream seam
        assert (r.n_batch, r.n_stream, r.n_events) == (nb, ns, n)
        assert r.value_cents == cents
        assert r.n_batch + r.n_stream == r.n_events


def test_q338_cf_eval_brute_force(spark, sf_dir):
    import math

    out = Q.REGISTRY["q338_cf_eval"].fn(spark, sf_dir).toPandas()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    li["bkt"] = ((li.l_orderkey % ID_FOLD) * KNUTH) % 100
    tr = li[li.bkt < 80]
    te = li[li.bkt >= 80]
    deg = tr.groupby("l_partkey").size().to_dict()
    by_order = collections.defaultdict(set)
    for r in tr.itertuples():
        by_order[r.l_orderkey].add(r.l_partkey)
    co = collections.Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    cand = collections.defaultdict(list)
    for (a, b), c in co.items():
        if c >= 2:
            cos = round(c / math.sqrt(float(deg[a] * deg[b])), 6)
            cand[a].append((cos, b))
            cand[b].append((cos, a))
    rec = {}
    for p, lst in cand.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        rec[p] = {b for _, b in lst[:5]}
    pop = set(
        sorted(deg, key=lambda p: (-deg[p], p))[:5]
    )
    te_orders = collections.defaultdict(set)
    for r in te.itertuples():
        te_orders[r.l_orderkey].add(r.l_partkey)
    cf_cases = cf_hits = pop_cases = pop_hits = 0
    for o, parts in te_orders.items():
        if len(parts) < 2:
            continue
        for i in parts:
            cf_cases += 1
            pop_cases += 1
            if any(i in rec.get(j, set()) for j in parts if j != i):
                cf_hits += 1
            if i in pop:
                pop_hits += 1
    got = {r.method: r for r in out.itertuples()}
    assert got["itemcf"].n_cases == cf_cases == got["popularity"].n_cases
    assert got["itemcf"].n_hits == cf_hits
    assert got["popularity"].n_hits == pop_hits


def test_q339_knn_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q339_knn_classifier"].fn(spark, sf_dir).toPandas()
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    emb["bkt"] = ((emb.vec_id % ID_FOLD) * KNUTH) % 100
    tr = emb[emb.bkt < 80]
    te = emb[emb.bkt >= 80]
    panel = sorted(
        te.vec_id,
        key=lambda v: (((v % ID_FOLD) * KNUTH) % 1_000_000_007, v),
    )[:40]
    tr_rows = [
        (r.vec_id, int(r.label), [float(x) for x in r.embedding])
        for r in tr.itertuples()
    ]
    te_map = {
        r.vec_id: (int(r.label), [float(x) for x in r.embedding])
        for r in te.itertuples()
    }
    preds = {}
    for pid in panel:
        true_label, pv = te_map[pid]
        scored = []
        for rid, rl, rv in tr_rows:
            d = 0.0
            for x, y in zip(pv, rv):
                d += (x - y) * (x - y)
            scored.append((d, rid, rl))
        scored.sort(key=lambda t: (t[0], t[1]))
        votes = collections.Counter(rl for _, _, rl in scored[:5])
        pred = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0][0]
        preds[pid] = (true_label, pred)
    per_label = collections.defaultdict(lambda: [0, 0])
    for true_label, pred in preds.values():
        per_label[true_label][0] += 1
        per_label[true_label][1] += true_label == pred
    got = {r.label: r for r in out.itertuples()}
    assert set(got) == set(per_label)
    for lbl, (n, nc) in per_label.items():
        assert got[lbl].n == n and got[lbl].n_correct == nc


def test_q340_markov_attribution_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q340_markov_attribution"].fn(spark, sf_dir).toPandas()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts_us", "event_type")
        .toPandas()
    )
    cnt = collections.Counter()
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        states = []
        for t in g.event_type:
            if t == "purchase":
                states.append("conv")
                break
            states.append(t)
        seq = ["start"] + states
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
        if seq[-1] != "conv":
            cnt[(seq[-1], "null")] += 1
    tot = collections.Counter()
    for (f, _t), c in cnt.items():
        tot[f] += c

    def absorb(removed):
        p = collections.defaultdict(float)
        for (f, t), c in sorted(cnt.items()):
            if f == removed:
                continue
            t2 = "null" if t == removed else t
            p[(f, t2)] += c / tot[f]
        states = sorted({f for f, _ in p})
        v = {f: 0.0 for f in states}
        for _ in range(24):
            nv = {}
            for f in states:
                s = 0.0
                for (ff, t), pp in sorted(p.items()):
                    if ff == f:
                        s += pp if t == "conv" else pp * v.get(t, 0.0)
                nv[f] = s
            v = nv
        return v.get("start", 0.0)

    p_base = absorb(None)
    got = {r.channel: r for r in out.itertuples()}
    assert set(got) == {"click", "error", "signup", "view"}
    shares = 0.0
    for c, r in got.items():
        pr = absorb(c)
        assert abs(r.p_conv_base - p_base) < 1e-5
        assert abs(r.p_conv_removed - pr) < 1e-5
        # removing a channel can only lose conversion paths
        assert r.p_conv_removed <= r.p_conv_base + 1e-9
        shares += r.credit_share
    assert abs(shares - 1.0) < 1e-4


def test_q341_randomized_response_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q341_randomized_response"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    spend = ev.groupby("user_id").value.apply(
        lambda s: sum(round(v * 100) for v in s)
    )
    n = len(spend)
    truths = {u: c >= 250_000 for u, c in spend.items()}
    lies = {u: ((u % ID_FOLD) * KNUTH) % 4 == 3 for u in spend.index}
    n_true = sum(truths.values())
    n_yes = sum(
        (not truths[u]) if lies[u] else truths[u] for u in spend.index
    )
    r = out.iloc[0]
    assert r.n == n
    assert abs(r.true_share - n_true / n) < 1e-6
    assert abs(r.observed_yes - n_yes / n) < 1e-6
    est = (n_yes / n - 0.25) / 0.5
    assert abs(r.estimated_share - est) < 1e-6
    assert abs(r.abs_err - abs(est - n_true / n)) < 1e-6
    # the debias actually moves the observed share toward the truth
    assert abs(est - n_true / n) <= abs(n_yes / n - n_true / n) + 1e-9


def test_q342_modularity_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q342_modularity"].fn(spark, sf_dir).toPandas()
    edges = _copurchase_edges(spark, sf_dir)
    adj = collections.defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    lbl = {v: v for v in adj}
    for _ in range(4):
        new = {}
        for node, ns in adj.items():
            cnt = collections.Counter(lbl[w] for w in ns)
            new[node] = max(cnt.items(), key=lambda t: t[1] * 10**9 - t[0])[0]
        lbl = new
    m = len(edges)
    mc = collections.Counter()
    for u, v in edges:
        if lbl[u] == lbl[v]:
            mc[lbl[u]] += 1
    dg = collections.Counter()
    for v, ns in adj.items():
        dg[lbl[v]] += len(ns)
    q = sum(
        mc.get(c, 0) / m - (d / (2 * m)) ** 2 for c, d in sorted(dg.items())
    )
    r = out.iloc[0]
    assert r.n_edges == m
    assert r.n_communities == len(dg)
    assert abs(r.modularity - q) < 1e-5
    # modularity bounds: Q in [-1/2, 1)
    assert -0.5 <= r.modularity < 1.0


def test_q343_greedy_decode_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q343_greedy_decode"].fn(spark, sf_dir).toPandas()
    d = load_table(spark, sf_dir, "documents").toPandas()
    uni = collections.Counter()
    big = collections.Counter()
    for t in d.text:
        toks = t.split(" ")
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    seed = min(uni, key=lambda w: (-uni[w], w))
    words = [seed]
    cur = seed
    for _ in range(16):
        cands = [(c, w2) for (w1, w2), c in big.items() if w1 == cur]
        if not cands:
            words.extend([None] * (17 - len(words)))
            break
        cur = min(cands, key=lambda t: (-t[0], t[1]))[1]
        words.append(cur)
    assert list(out.step) == list(range(17))
    assert list(out.word) == words


def test_q345_iv_wald_brute_force(spark, sf_dir):
    import pandas as pd

    out = Q.REGISTRY["q345_iv_wald"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = (
        pd.to_datetime(ev.ts_us, unit="us").dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    post_n = ev[ev.day >= 14].groupby("user_id").size()
    post_y = ev[(ev.day >= 14) & (ev.event_type == "purchase")].groupby(
        "user_id"
    ).value.apply(lambda s: sum(round(v * 100) for v in s))
    arms = {0: [0, 0, 0], 1: [0, 0, 0]}  # n, nt, sy
    for u in ev.user_id.unique():
        z = 1 if ((int(u) % ID_FOLD) * KNUTH) % 100 >= 50 else 0
        qc = int(post_n.get(u, 0))
        bar = 34 if z == 1 else 38
        arms[z][0] += 1
        arms[z][1] += int(qc >= bar)
        arms[z][2] += int(post_y.get(u, 0))
    r = out.iloc[0]
    assert r.n1 == arms[1][0] and r.n0 == arms[0][0]
    t1, t0 = arms[1][1] / arms[1][0], arms[0][1] / arms[0][0]
    y1, y0 = arms[1][2] / arms[1][0], arms[0][2] / arms[0][0]
    assert abs(r.t_rate_z1 - t1) < 1e-5 and abs(r.t_rate_z0 - t0) < 1e-5
    assert abs(r.itt_dollars - (y1 - y0) / 100) < 1e-3
    assert abs(r.first_stage - (t1 - t0)) < 1e-5
    if abs(t1 - t0) > 1e-9:
        assert abs(r.wald_dollars - (y1 - y0) / (t1 - t0) / 100) < 1e-2
    # constructed compliance: the first stage is real by design
    assert r.first_stage > 0.03


def test_q346_rd_brute_force(spark, sf_dir):
    out = Q.REGISTRY["q346_regression_discontinuity"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    ycnt = li.groupby("l_orderkey").size().to_dict()
    sides = {"left": [], "right": []}
    for r in o.itertuples():
        u = round(r.o_totalprice * 100) - 25_000_000
        if -10_000_000 < u < 10_000_000:
            sides["right" if u >= 0 else "left"].append(
                (u, ycnt.get(r.o_orderkey, 0))
            )

    def fit(rows):
        n = len(rows)
        su = sum(u for u, _ in rows)
        suu = sum(u * u for u, _ in rows)
        sy = sum(y for _, y in rows)
        suy = sum(u * y for u, y in rows)
        det = float(n) * suu - float(su) * su
        return (
            (float(sy) * suu - float(su) * suy) / det,
            (float(n) * suy - float(su) * sy) / det,
        )

    al, bl = fit(sides["left"])
    ar, br = fit(sides["right"])
    r = out.iloc[0]
    assert r.n_left == len(sides["left"]) and r.n_right == len(sides["right"])
    assert abs(r.intercept_left - al) < 1e-4
    assert abs(r.intercept_right - ar) < 1e-4
    assert abs(r.rd_estimate - (ar - al)) < 1e-4
    # honest null: the synthetic generator has no price discontinuity
    assert abs(r.rd_estimate) < 1.0


def test_q347_rec_coverage_consistency(spark, sf_dir):
    out = Q.REGISTRY["q347_rec_coverage"].fn(spark, sf_dir).toPandas()
    rec = Q.REGISTRY["q336_item_cf"].fn(spark, sf_dir).toPandas()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    deg = li.groupby("l_partkey").size().to_dict()
    r = out.iloc[0]
    assert r.n_catalog == len(deg)
    assert r.n_items_with_recs == rec.p.nunique()
    assert r.n_recommended_distinct == rec.nbr.nunique()
    assert abs(r.coverage - rec.nbr.nunique() / len(deg)) < 1e-6
    avg_rec = sum(deg[n] for n in rec.nbr) / len(rec)
    avg_cat = sum(deg.values()) / len(deg)
    assert abs(r.avg_deg_recommended - avg_rec) < 1e-3
    assert abs(r.avg_deg_catalog - avg_cat) < 1e-3
    # popularity lift >= 1 is the expected bias of co-occurrence CF
    assert r.popularity_lift > 0


def test_q344_adaboost_brute_force(spark, sf_dir):
    import math

    import pandas as pd

    out = Q.REGISTRY["q344_adaboost_stumps"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    rows = []
    for r in ev.itertuples():
        x1 = round(r.value * 100)
        x2 = (r.ts_us // 3_600_000_000) % 24
        x3 = (
            pd.to_datetime(r.ts_us, unit="us").normalize()
            - pd.Timestamp("2024-01-01")
        ).days % 7
        y = 1 if r.event_type == "purchase" else -1
        rows.append([int(x1), int(x2), int(x3), y, 1000])
    picks = []
    for _ in range(3):
        wtot = sum(w for *_xs, w in rows)
        best = None
        for fid, xi in ((1, 0), (2, 1), (3, 2)):
            agg = {}
            for x1, x2, x3, y, w in rows:
                v = (x1, x2, x3)[xi]
                sp, sn = agg.get(v, (0, 0))
                agg[v] = (sp + (w if y == 1 else 0), sn + (w if y == -1 else 0))
            tp = sum(a for a, _ in agg.values())
            tn = sum(b for _, b in agg.values())
            csp = csn = 0
            for v in sorted(agg):
                csp += agg[v][0]
                csn += agg[v][1]
                for pol, err in ((1, csn + tp - csp), (0, csp + tn - csn)):
                    key = (err, fid, v, pol)
                    if best is None or key < best:
                        best = key
        err, fid, v, pol = best
        ec = max(min(float(err) / float(wtot), 1 - 1e-6), 1e-6)
        alpha = 0.5 * math.log((1 - ec) / ec)
        picks.append((fid, v, pol, err, wtot, alpha))
        for row in rows:
            xv = row[fid - 1]
            pred = (1 if pol == 1 else -1) if xv <= v else (-1 if pol == 1 else 1)
            row[4] = int(
                math.floor(row[4] * math.exp(-alpha if pred == row[3] else alpha) + 0.5)
            )
    correct = 0
    for x1, x2, x3, y, _w in rows:
        sc = 0.0
        for fid, v, pol, _e, _w2, alpha in picks:
            xv = (x1, x2, x3)[fid - 1]
            pred = (1 if pol == 1 else -1) if xv <= v else (-1 if pol == 1 else 1)
            sc += alpha if pred == 1 else -alpha
        correct += (1 if sc >= 0 else -1) == y
    acc = correct / len(rows)
    assert len(out) == 3
    names = {1: "cents", 2: "hour", 3: "dow"}
    for i, (fid, v, pol, err, wtot, alpha) in enumerate(picks):
        r = out.iloc[i]
        assert r.feature == names[fid]
        assert r.threshold == v and r.polarity == pol and r.err_milli == err
        assert abs(r.err_rate - err / wtot) < 1e-5
        assert abs(r.alpha - alpha) < 1e-5
        assert abs(r.ensemble_acc - acc) < 1e-5
        # boosting sanity: every picked stump beats random weighting
        assert r.err_rate < 0.5


def test_q348_als_brute_force(spark, sf_dir):
    import math

    out = Q.REGISTRY["q348_als_factorization"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    rt = m.groupby(["o_custkey", "l_partkey"]).size().reset_index(name="r")
    ratings = [(int(r.o_custkey), int(r.l_partkey), int(r.r)) for r in rt.itertuples()]
    items = sorted({p for _, p, _ in ratings})
    q = {p: (1_000_000, (((p % ID_FOLD) * KNUTH) % 1000) * 1000) for p in items}

    def solve(stats):
        outf = {}
        for k, (a11m, a12m, a22m, b1m, b2m) in stats.items():
            a11 = float(a11m) / 1e12 + 0.1
            a12 = float(a12m) / 1e12
            a22 = float(a22m) / 1e12 + 0.1
            b1 = float(b1m) / 1e6
            b2 = float(b2m) / 1e6
            det = a11 * a22 - a12 * a12
            f1 = (a22 * b1 - a12 * b2) / det
            f2 = (a11 * b2 - a12 * b1) / det
            outf[k] = (
                int(math.floor(f1 * 1e6 + 0.5)),
                int(math.floor(f2 * 1e6 + 0.5)),
            )
        return outf

    def half(fixed, by_fixed_key):
        stats = {}
        for u, p, r in ratings:
            fk, sk = (p, u) if by_fixed_key == "p" else (u, p)
            f1, f2 = fixed[fk]
            s = stats.setdefault(sk, [0, 0, 0, 0, 0])
            s[0] += f1 * f1
            s[1] += f1 * f2
            s[2] += f2 * f2
            s[3] += r * f1
            s[4] += r * f2
        return solve({k: tuple(v) for k, v in stats.items()})

    x = None
    for _ in range(2):
        x = half(q, "p")
        q = half(x, "u")
    se = 0.0
    for u, p, r in ratings:
        pred = (x[u][0] * q[p][0] + x[u][1] * q[p][1]) / 1e12
        se += (r - pred) * (r - pred)
    rmse = math.sqrt(se / len(ratings))
    row = out.iloc[0]
    assert row.n_users == len(x) and row.n_items == len(q)
    assert row.n_ratings == len(ratings)
    assert abs(row.rmse - rmse) < 1e-4
    # the factorization must beat the constant rating-mean baseline
    rs = [r for _, _, r in ratings]
    mean = sum(rs) / len(rs)
    base = math.sqrt(sum((r - mean) ** 2 for r in rs) / len(rs))
    assert row.rmse < base


def test_q349_bandit_replay_brute_force(spark, sf_dir):
    import pandas as pd

    out = Q.REGISTRY["q349_bandit_replay"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = (
        pd.to_datetime(ev.ts_us, unit="us").dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    ev["cents"] = ev.value.apply(lambda v: round(v * 100))
    days = sorted(ev.day.unique())
    types = sorted(ev.event_type.unique())
    cum = {a: [0, 0] for a in types}  # n, s
    picks = {}
    for d in days:
        cands = [
            (cum[a][1] / cum[a][0], a) for a in types if cum[a][0] > 0
        ]
        if cands:
            picks[d] = min(cands, key=lambda t: (-t[0], t[1]))[1]
        elif d > 0:
            # all-zero history after day 0: NULLS LAST ordering falls
            # back to the lexicographically smallest type
            picks[d] = types[0]
        g = ev[ev.day == d]
        for a, gg in g.groupby("event_type"):
            cum[a][0] += len(gg)
            cum[a][1] += int(gg.cents.sum())
    m = ev[(ev.day > 0) & (ev.day.map(picks) == ev.event_type)]
    allp = ev[ev.day > 0]
    r = out.iloc[0]
    assert r.n_days == len([d for d in picks if d > 0])
    assert r.n_matched == len(m)
    assert abs(r.match_rate - len(m) / len(allp)) < 1e-6
    assert abs(r.replay_value - m.cents.sum() / len(m) / 100) < 1e-3
    assert abs(r.logged_value - allp.cents.sum() / len(allp) / 100) < 1e-3
    # a 5-arm greedy policy matches roughly 1/5 of uniform logs
    assert 0.05 < r.match_rate < 0.6


def test_q350_holt_winters_brute_force(spark, sf_dir):
    import pandas as pd

    out = Q.REGISTRY["q350_holt_winters"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = (
        pd.to_datetime(ev.ts_us, unit="us").dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    got = {r.event_type: r for r in out.itertuples()}
    for et, g in ev.groupby("event_type"):
        ys = [float(c) for _, c in sorted(g.groupby("day").size().items())]
        n = len(ys)
        if n < 14:
            assert et not in got
            continue
        w1 = sum(ys[:7])
        w2 = sum(ys[7:14])
        l = w1 / 7
        b = (w2 / 7 - w1 / 7) / 7
        s = [ys[i] - w1 / 7 for i in range(7)]
        for t in range(7, n):
            y = ys[t]
            ln = 0.5 * (y - s[0]) + 0.5 * (l + b)
            bn = 0.5 * (ln - l) + 0.5 * b
            sn = 0.5 * (y - ln) + 0.5 * s[0]
            s = s[1:] + [sn]
            l, b = ln, bn
        r = got[et]
        assert r.n_days == n
        assert abs(r.level - l) < 1e-3
        assert abs(r.trend - b) < 1e-3
        assert abs(r.forecast_next - (l + b + s[0])) < 1e-3
        assert abs(r.forecast_7d_total - (7 * l + 28 * b + sum(s))) < 1e-2
        # the seasonal state is mean-ish-zero: forecasts stay near the
        # level scale, not the level+season-blowup scale
        assert abs(r.forecast_next - r.level) < max(5 * abs(r.level), 50)
