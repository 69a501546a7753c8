"""ANN quality gates: the approximate paths must agree with the exact
brute-force top-k (q36) well enough to be useful, and must actually
prune the scan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark import queries as Q
from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators.similarity import ivf_build, ivf_topk

Q.load_all_modules()


# recall/property/brute-force ladders: excluded from the fast
# default run (pytest.ini); the builder's full-suite gate runs
# them with -m ""
pytestmark = pytest.mark.slow


def _exact_ids(spark, sf_dir):
    return [r.vec_id for r in Q.REGISTRY["q36_cosine_topk"].fn(spark, sf_dir).collect()]


def test_lsh_ann_recall(spark, sf_dir):
    from osm_changesets_to_parquet_spark.operators.similarity import lsh_topk

    exact = set(_exact_ids(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    approx = {
        r.vec_id
        for r in lsh_topk(emb, query, k=10, dim=64, bits=4, n_tables=8).collect()
    }
    assert 0 in approx  # the query vector itself is always its own NN
    assert len(exact & approx) / len(exact) >= 0.6


def test_ann_verdict_queries_pass(spark, sf_dir):
    """The registered production-parameter ANN queries emit the
    all-true tolerance verdict their constant oracle expects."""
    for name in ("a51_lsh_ann_topk", "a52_ivf_ann_topk"):
        row = Q.REGISTRY[name].fn(spark, sf_dir).collect()
        assert len(row) == 1
        assert row[0].k == 10 and row[0].self_hit and row[0].recall_ok, name


def test_ivf_ann_recall_and_pruning(spark, sf_dir):
    exact = set(_exact_ids(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=16)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]

    approx = {r.vec_id for r in ivf_topk(assigned, centroids, qvec, k=10, nprobe=6).collect()}
    assert 0 in approx
    assert len(exact & approx) / len(exact) >= 0.5

    # pruning: probing 6/16 cells must scan strictly less than the corpus
    n_total = emb.count()
    probed = assigned.where(
        F.col("cell").isin(
            sorted(
                range(len(centroids)),
                key=lambda i: -sum(a * b for a, b in zip(qvec, centroids[i])),
            )[:6]
        )
    ).count()
    assert probed < n_total


def test_ivf_cells_partition_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=16)
    assert assigned.count() == emb.count()
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(16))


def test_ivf_plan_size_independent_of_n_cells(spark, sf_dir):
    """The centroid argmin is an Arrow-batched matmul against a broadcast
    matrix — the *plan* must not grow with n_cells (the old literal-tree
    spelling was O(n_cells x dim) and died around 4096 cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned16, _ = ivf_build(emb, n_cells=16)
    assigned256, cents256 = ivf_build(emb, n_cells=256)
    p16 = assigned16._jdf.queryExecution().optimizedPlan().toString()
    p256 = assigned256._jdf.queryExecution().optimizedPlan().toString()
    assert abs(len(p256) - len(p16)) < 200  # same shape, not 16x bigger
    assert len(cents256) == 256
    # every vector still lands in a valid cell
    assert assigned256.where(
        (F.col("cell") < 0) | (F.col("cell") >= 256)
    ).count() == 0


def test_ivf_recall_at_256_cells(spark, sf_dir):
    exact = set(_exact_ids(spark, sf_dir))
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(emb, n_cells=256)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    approx = {r.vec_id for r in ivf_topk(assigned, centroids, qvec, k=10, nprobe=96).collect()}
    assert 0 in approx
    assert len(exact & approx) / len(exact) >= 0.5


def test_quantized_rerank_exact_and_pruning(spark, sf_dir):
    """q146's contract from both sides: the quantized-prefilter +
    exact-rerank output equals per-query brute force, AND the tau
    prefilter actually prunes the code scan (else the "prefilter" is
    a full rerank in disguise)."""
    from osm_changesets_to_parquet_spark.operators.similarity import (
        cosine_similarity_col,
        cosine_topk,
        int8_codes,
        quantized_rerank_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = quantized_rerank_topk(emb, n_queries=4, k=10, tau=0.2).collect()
    assert len(got) == 40
    for qid in range(4):
        q = emb.where(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        exact = [(r.vec_id, r.sim) for r in cosine_topk(emb, q, k=10).collect()]
        mine = [(r.vec_id, r.sim) for r in got if r.qid == qid]
        assert mine == exact, f"qid={qid}"
    # pruning: candidates passing tau on the quantized score are a
    # small fraction of the corpus (near-random fixtures: ~5%)
    n = emb.count()
    codes = emb.select("vec_id", int8_codes(F.col("embedding")).alias("cv"))
    qc = (
        emb.where(F.col("vec_id") < 4)
        .select(int8_codes(F.col("embedding")).alias("qv"))
    )
    surv = (
        codes.crossJoin(F.broadcast(qc))
        .where(cosine_similarity_col(F.col("cv"), F.col("qv")) >= 0.2)
        .count()
    )
    assert surv < 0.2 * 4 * n


def test_ivf_index_append_idempotent_and_complete(spark, sf_dir):
    # a retried append (same gen) must overwrite only its own leaves —
    # index row counts unchanged; and base + increment together cover
    # every vector exactly once
    import tempfile

    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket
    from osm_changesets_to_parquet_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_write,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    b = hash_bucket("vec_id", 100)
    existing, inc = emb.where(b < 90), emb.where(b >= 90)
    idx = tempfile.mkdtemp(prefix="ivf_idem_")
    ivf_index_write(existing, idx, n_cells=16)
    ivf_index_append(spark, inc, idx, gen="inc1")
    cells = spark.read.parquet(f"{idx}/cells")
    n1 = cells.count()
    assert n1 == emb.count()
    assert cells.select("vec_id").distinct().count() == n1
    # retry: same gen overwrites itself, never the base
    ivf_index_append(spark, inc, idx, gen="inc1")
    cells2 = spark.read.parquet(f"{idx}/cells")
    assert cells2.count() == n1
    assert cells2.where(F.col("__gen") == "base").count() == existing.count()


def test_inverted_index_postings_complete_and_bounded(spark, sf_dir):
    """Exploding every posting list reconstructs exactly the distinct
    (token, doc_id) set, lists are sorted, and sharding bounds each
    row below the stop-word full-corpus size."""
    from osm_changesets_to_parquet_spark.queries.ann import build_postings

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    postings = build_postings(docs, n_shards=16)
    rebuilt = postings.select(
        "token", F.explode("plist").alias("doc_id")
    )
    truth = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    assert rebuilt.count() == truth.count()
    assert rebuilt.exceptAll(truth.select("token", "doc_id")).count() == 0
    bad_order = postings.where(
        F.col("plist") != F.sort_array("plist")
    ).count()
    assert bad_order == 0
    n_docs = docs.count()
    max_row = postings.agg(F.max(F.size("plist"))).collect()[0][0]
    assert max_row <= n_docs // 16 + 1


def test_k_center_greedy_invariants(spark, sf_dir):
    """Picks are distinct, selection distances are non-increasing
    (greedy min-dist monotonicity), and step 2 is the true farthest
    point from the seed by brute force."""
    from osm_changesets_to_parquet_spark.operators.similarity import (
        k_center_greedy,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = k_center_greedy(emb, 4, seed_id=0).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 4 and rows[0]["vec_id"] == 0
    dists = [r["dist"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    seed = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    brute = (
        emb.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.array(*[F.lit(float(x)) for x in seed]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d"),
        )
        .orderBy(F.col("d").desc(), "vec_id")
        .limit(1)
        .collect()[0]
    )
    assert brute["vec_id"] == rows[1]["vec_id"]


def test_pca_power_top_matches_numpy_replay(spark, sf_dir):
    """The 3-iteration iterate is unit-norm, matches a numpy replay of
    the identical rounded power iteration (cos > 0.999), and strictly
    improves the Rayleigh quotient over the e_1 start.  (The fixture
    spectrum is near-isotropic — l2/l1 ~ 0.93 — so 3 iterations do NOT
    reach the true top eigenvector; the contract is the deterministic
    3-step iterate, which the SQL oracle replays exactly.)"""
    import numpy as np

    from osm_changesets_to_parquet_spark.operators.similarity import (
        pca_power_top,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = pca_power_top(emb, iters=3).collect()
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["pos"])])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    x = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    mu = np.round(x.mean(axis=0), 6)
    xc = x - mu
    w = np.round(xc.T @ xc[:, 0], 6)          # s = c[1], v0 = e_1
    for _ in range(2):
        w = np.round(xc.T @ (xc @ w), 6)
    replay = w / np.linalg.norm(w)
    assert abs(float(v @ replay)) > 0.999
    cov = xc.T @ xc
    e1 = np.zeros(len(v)); e1[0] = 1.0
    assert float(v @ cov @ v) > float(e1 @ cov @ e1)


def test_q135_fixed_k_panel_nprobe_tradeoff(spark, sf_dir):
    """The round-8 recalibration sweep (VERDICT r07 item 7), pinned.

    Question: can q135 retire its %100 corpus-proportional anchor panel
    for the q132-style fixed-k hash panel without faking pruning
    headroom?  Measured answer: NOT on these fixtures — the fixed-k
    hash panel's contrastive argmaxes are exact only at nprobe=16/16 on
    the near-random synthetic embeddings (full scan, zero pruning),
    while the SAME machinery on a genuinely clustered fixture (16
    separated gaussians) is exact at nprobe=4/16.  So the limitation
    is the fixture's geometry, not the operator: q135 keeps the %100
    panel whose nprobe=12 calibration is honest, and this test pins
    both halves of the justification.
    """
    import numpy as np

    from osm_changesets_to_parquet_spark.operators.anchors import fixed_k_anchors
    from osm_changesets_to_parquet_spark.operators.similarity import (
        cosine_similarity_col,
        ivf_probe_cells_udf,
    )
    from osm_changesets_to_parquet_spark.queries.ann import _contrastive_argmax

    def exact_panel(e, anchors):
        d = (
            e.select(
                F.col("vec_id").alias("cid"),
                F.col("label").alias("clab"),
                F.col("v").alias("cv"),
            )
            .crossJoin(
                F.broadcast(
                    anchors.select(
                        F.col("vec_id").alias("qid"),
                        F.col("label").alias("qlab"),
                        F.col("v").alias("qv"),
                    )
                )
            )
            .where(F.col("cid") != F.col("qid"))
            .select(
                "qid",
                "qlab",
                "cid",
                "clab",
                F.round(
                    cosine_similarity_col(F.col("qv"), F.col("cv")), 4
                ).alias("sim"),
            )
        )
        return {tuple(r) for r in _contrastive_argmax(d).collect()}

    def pruned_panel(e, anchors, assigned, centroids, nprobe):
        probe = ivf_probe_cells_udf(spark, centroids, nprobe=nprobe)
        a = anchors.select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlab"),
            F.col("v").alias("qv"),
            F.explode(probe(F.col("v"))).alias("cell"),
        )
        cand = assigned.select(
            "cell",
            F.col("vec_id").alias("cid"),
            F.col("label").alias("clab"),
            F.col("v").alias("cv"),
        )
        d = (
            cand.join(F.broadcast(a), "cell")
            .where(F.col("cid") != F.col("qid"))
            .select(
                "qid",
                "qlab",
                "cid",
                "clab",
                F.round(
                    cosine_similarity_col(F.col("qv"), F.col("cv")), 4
                ).alias("sim"),
            )
        )
        return {tuple(r) for r in _contrastive_argmax(d).collect()}

    # (b) clustered fixture: the machinery PRUNES when geometry allows
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(16, 64))
    centers = centers / np.linalg.norm(centers, axis=1, keepdims=True) * 10.0
    rows = [
        (i, int((i % 16) % 10), [float(x) for x in centers[i % 16] + rng.normal(size=64)])
        for i in range(500)
    ]
    e_clu = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    e_clu = e_clu.cache()
    anchors = fixed_k_anchors(e_clu, "vec_id", 8)
    assigned, centroids = ivf_build(e_clu, n_cells=16, vec_col="v")
    assigned = assigned.cache()
    exact = exact_panel(e_clu, anchors)
    assert pruned_panel(e_clu, anchors, assigned, centroids, 4) == exact
    # and nprobe=2 genuinely prunes away some argmax (not trivially exact)
    assert pruned_panel(e_clu, anchors, assigned, centroids, 1) != exact
    e_clu.unpersist()
    assigned.unpersist()

    # (a) the real near-random fixture: a fixed-k hash panel has ZERO
    # pruning headroom — nprobe=12 (q135's calibrated setting for the
    # %100 panel) misses argmaxes, which is exactly why q135 does NOT
    # adopt the hash panel (measured min exact nprobe = 16/16)
    emb = load_table(spark, sf_dir, "embeddings")
    e_real = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).cache()
    anchors_r = fixed_k_anchors(e_real, "vec_id", 8)
    assigned_r, centroids_r = ivf_build(e_real, n_cells=16, vec_col="v")
    assigned_r = assigned_r.cache()
    exact_r = exact_panel(e_real, anchors_r)
    assert pruned_panel(e_real, anchors_r, assigned_r, centroids_r, 12) != exact_r
    assert pruned_panel(e_real, anchors_r, assigned_r, centroids_r, 16) == exact_r
    e_real.unpersist()
    assigned_r.unpersist()
