"""Dedup + similarity queries (SURVEY Q35 family + training-data extras).

The oracle SQL here is *generated* from the same integer constants the
Spark operators use (operators.dedup.MINHASH_A/B, HASH_MOD), so even the
MinHash-LSH candidate set is hash-matched exactly — both engines run the
same deterministic integer math, just spelled in their own lambda
dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import load_table
from osm_changesets_to_parquet_spark.operators import dedup as D
from osm_changesets_to_parquet_spark.queries import FixtureGateError, register

P = D.HASH_MOD

# --- SQL generators mirroring the portable hash ----------------------------


def _sql_charhash(expr: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {P})"
    )


# shingle hash = base-31 fold over the n token hashes (tokens hashed
# once) — must stay in lockstep with operators.dedup.shingles
_SQL_SHINGLE_HASHES = (
    "list_transform(range(1, len(th) - 1), i -> "
    f"(((th[i] * 31 + th[i+1]) % {P}) * 31 + th[i+2]) % {P})"
)

_SQL_TOK = (
    "SELECT doc_id, list_transform(string_split(text, ' '), t -> "
    + _sql_charhash("t")
    + ") AS th FROM documents"
)


def _sql_sig_entries() -> str:
    parts = [
        f"COALESCE(list_min(list_transform(hs, h -> ({a} * h + {b}) % {P})), {P})"
        for a, b in zip(D.MINHASH_A, D.MINHASH_B)
    ]
    return "[" + ", ".join(parts) + "]"


def _sql_band_fold(band: int) -> str:
    expr = f"(sig[{band * D.ROWS_PER_BAND + 1}] % {P})"
    for r in range(1, D.ROWS_PER_BAND):
        expr = f"(({expr} * 31 + sig[{band * D.ROWS_PER_BAND + r + 1}]) % {P})"
    return expr


_Q35_LSH_SQL = f"""
WITH tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, {_SQL_SHINGLE_HASHES} AS hs FROM tok),
sig AS (SELECT doc_id, {_sql_sig_entries()} AS sig FROM sh),
bands AS (
  SELECT doc_id,
         generate_subscripts([{", ".join(_sql_band_fold(b) for b in range(D.N_BANDS))}], 1) AS band,
         unnest([{", ".join(_sql_band_fold(b) for b in range(D.N_BANDS))}]) AS bkey
  FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""

# CTE block computing the exact-Jaccard truth pairs — shared between the
# q35a truth query and the q68 cluster-resolution oracle
_TRUTH_CTES = f"""tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tpairs AS (
  SELECT id_a, id_b,
         ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jac
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.6
)"""

_Q35_TRUTH_SQL = f"""
WITH {_TRUTH_CTES}
SELECT id_a, id_b, jac FROM tpairs
ORDER BY id_a, id_b
"""

_Q68_CLUSTERS_SQL = f"""
WITH RECURSIVE {_TRUTH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM tpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM tpairs
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "q35a_jaccard_truth",
    _Q35_TRUTH_SQL,
    doc=(
        "exact 3-gram Jaccard pairs >= 0.6 (the MinHash truth set): distinct-"
        "shingle explode + co-occurrence self-join — only overlapping pairs "
        "materialize, never the quadratic all-pairs"
    ),
    tables=("documents",),
)
def q35a(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, threshold=0.6).orderBy("id_a", "id_b")


@register(
    "q35b_minhash_lsh",
    _Q35_LSH_SQL,
    doc=(
        "MinHash-LSH candidate pairs (32 hashes, 8 bands x 4 rows) — "
        "deterministic integer math, hash-matched against a generated oracle "
        "with identical constants; recall property (candidates ⊇ truth at "
        "J>=0.6 w.h.p.) asserted in tests/test_dedup.py"
    ),
    tables=("documents",),
)
def q35b(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.lsh_candidates(docs).orderBy("id_a", "id_b")


@register(
    "q68_neardup_clusters",
    _Q68_CLUSTERS_SQL,
    doc=(
        "near-dup cluster resolution: connected components over the exact-"
        "Jaccard pair graph (iterative min-label propagation, one shuffle "
        "per round) -> deterministic canonical doc per cluster; oracle is "
        "a recursive-CTE transitive closure over the same pairs"
    ),
    tables=("documents",),
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact duplicates are collapsed to one node before pair generation —
    # provably the same components (identical texts are Jaccard-1 pairs
    # with identical neighbor sets), strictly less work on dup-heavy data
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs_collapsed,
    )

    docs = load_table(spark, sf_dir, "documents")
    return canonical_docs_collapsed(docs, threshold=0.6).orderBy("doc_id")


@register(
    "q106_neardup_clusters_star",
    _Q68_CLUSTERS_SQL,
    doc=(
        "same verdict as q68 but resolved with alternating small-star/"
        "large-star contraction (Kiveris et al. 2014) — O(log^2 n) rounds "
        "on ANY graph topology vs min-label's O(diameter); the variant to "
        "reach for when the pair graph can chain (transitive near-dups). "
        "Shares q68's recursive-CTE oracle, so both implementations are "
        "hash-pinned to the same transitive closure."
    ),
    tables=("documents",),
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.clusters import (
        connected_components_star,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.6)
    comp = connected_components_star(pairs).withColumnRenamed("id", "doc_id")
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


# --- SimHash ----------------------------------------------------------------

# sign-sum fold producing the 30-bit fingerprint from the token-hash
# list `hs` — shared by t45 (fingerprint table) and q110 (near-dup join)
_SQL_SIMHASH_EXPR = (
    "CAST("
    + " + ".join(
        f"CASE WHEN list_sum(list_transform(hs, h -> ((h // {1 << j}) % 2) * 2 - 1)) >= 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(D.SIMHASH_BITS)
    )
    + " AS BIGINT)"
)


def _sql_simhash_cte(where: str = "") -> str:
    return f"""th AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), t -> {_sql_charhash('t')}) AS hs
  FROM documents {where}
),
sh AS (SELECT doc_id, {_SQL_SIMHASH_EXPR} AS simhash FROM th)"""


_T45_SQL = f"""
WITH {_sql_simhash_cte()}
SELECT doc_id, simhash FROM sh ORDER BY doc_id
"""


@register(
    "t45_simhash",
    _T45_SQL,
    doc=(
        "30-bit SimHash per document (token-hash sign sums) — portable "
        "integer math; near-dup mining = hamming bit_count(a ^ b), tested in "
        "tests/test_dedup.py"
    ),
    tables=("documents",),
)
def t45(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return D.simhash(docs).select("doc_id", "simhash").orderBy("doc_id")


_Q110_MAX_HAM = 2

_Q110_SQL = f"""
WITH {_sql_simhash_cte("WHERE text IS NOT NULL")}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_Q110_MAX_HAM}
ORDER BY id_a, id_b
"""


@register(
    "q110_simhash_neardup",
    _Q110_SQL,
    doc=(
        "EXACT hamming-ball near-dup pairs (distance <= 2 on the 30-bit "
        "SimHash) via bit-band LSH: 3 disjoint 10-bit bands, pigeonhole "
        "completeness (<=2 flipped bits leave >=1 band identical), in-row "
        "bit_count verification — the oracle is the O(n^2) brute force, "
        "the Spark plan is one scan + one (band, key) shuffle of 16-byte "
        "structs"
    ),
    tables=("documents",),
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text => fingerprint 0 on both engines; excluded symmetrically
    # so a null-heavy corpus cannot form a degenerate all-zero bucket.
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    return (
        D.simhash_neardup_pairs(docs, max_hamming=_Q110_MAX_HAM, n_bands=3)
        .withColumn("hamming", F.col("hamming").cast("int"))
        .orderBy("id_a", "id_b")
    )


# --- Edit-distance similarity join (PassJoin blocking) ----------------------

_Q112_SQL = """
WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
FROM c a JOIN c b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
ORDER BY id_a, id_b
"""


@register(
    "q112_editdist_join",
    _Q112_SQL,
    doc=(
        "EXACT levenshtein<=1 similarity self-join over customer names via "
        "PassJoin segment blocking (pigeonhole: one of k+1 segments survives "
        "the edits verbatim) — candidates from an equi-join on (len, seg, "
        "substring), verified with the JVM levenshtein; the oracle is the "
        "O(n^2) brute force the blocking provably equals"
    ),
    tables=("customer",),
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.editdist import edit_distance_pairs

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        edit_distance_pairs(c, "c_name", "c_custkey", k=1)
        .withColumn("dist", F.col("dist").cast("int"))
        .orderBy("id_a", "id_b")
    )


# --- Embedding near-dup -----------------------------------------------------


_E46_ANCHORS = 8  # FIXED anchor count — independent of corpus size


@register(
    "e46_embedding_neardup",
    f"""
    WITH anchors AS (SELECT vec_id, embedding FROM embeddings
                     ORDER BY ((vec_id % 2147483648) * 2654435761) % 1000000007, vec_id
                     LIMIT {_E46_ANCHORS}),
    z AS (
      SELECT a.vec_id AS id_a, e.vec_id AS id_b,
             CAST(unnest(a.embedding) AS DOUBLE) AS x,
             CAST(unnest(e.embedding) AS DOUBLE) AS y
      FROM anchors a JOIN embeddings e ON e.vec_id != a.vec_id
    ),
    d AS (
      SELECT id_a, id_b, SUM(x*y) AS dot, SUM(x*x) AS nx, SUM(y*y) AS ny
      FROM z GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, ROUND(dot / (SQRT(nx) * SQRT(ny)), 4) AS sim
    FROM d
    WHERE ROUND(dot / (SQRT(nx) * SQRT(ny)), 4) >= 0.3
    ORDER BY id_a, id_b
    """,
    doc=(
        "embedding-cosine near-dup vs a FIXED-k hash-rank anchor set "
        "(operators.anchors.fixed_k_anchors — anchor count independent "
        "of corpus size, so the broadcast pass is Θ(k·n); VERDICT r06 "
        "item 3 respell), sim >= 0.3; the all-pairs scale path is "
        "operators.similarity.pairwise_cosine_neardup (SRP-LSH "
        "bucketed), property-tested"
    ),
    tables=("embeddings",),
)
def e46(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.anchors import fixed_k_anchors
    from osm_changesets_to_parquet_spark.operators.similarity import cosine_similarity_col

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = fixed_k_anchors(emb, "vec_id", _E46_ANCHORS).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    others = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sim = F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 4)
    return (
        F.broadcast(anchors)
        .join(others, F.col("id_b") != F.col("id_a"))
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.3)
        .orderBy("id_a", "id_b")
    )


# --- SemDeDup (semantic dedup: cluster-then-compare) ------------------------

# The oracle reproduces the ENTIRE IVF path in SQL — deterministic seed
# selection (16 smallest vec_ids), one Lloyd step (argmax-dot assign,
# per-cell/per-pos mean, empty cells keep their seed), final argmax
# assignment, within-cell cosine pairs, recursive-CTE components.  The
# only cross-engine freedom is float summation order (numpy matmul vs
# SQL SUM), which could in principle flip an argmax between two cells
# with dots equal to ~1e-15 — generically impossible on real data and
# verified exact on these fixtures, so no calibration gate is needed.
_Q102_SEMDEDUP_SQL = """
WITH RECURSIVE
ev AS (
  SELECT vec_id, generate_subscripts(embedding,1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
seed AS (
  SELECT vec_id AS cell, pos, v FROM ev
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
),
d1 AS (
  SELECT ev.vec_id, s.cell, SUM(ev.v * s.v) AS dot
  FROM ev JOIN seed s USING (pos) GROUP BY ev.vec_id, s.cell
),
a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM d1) WHERE rn = 1
),
m AS (
  SELECT a1.cell, ev.pos, AVG(ev.v) AS v
  FROM a1 JOIN ev USING (vec_id) GROUP BY a1.cell, ev.pos
),
c2 AS (
  SELECT s.cell, s.pos, COALESCE(m.v, s.v) AS v
  FROM seed s LEFT JOIN m ON m.cell = s.cell AND m.pos = s.pos
),
d2 AS (
  SELECT ev.vec_id, c.cell, SUM(ev.v * c.v) AS dot
  FROM ev JOIN c2 c USING (pos) GROUP BY ev.vec_id, c.cell
),
a2 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell) AS rn
    FROM d2) WHERE rn = 1
),
nrm AS (SELECT vec_id, SQRT(SUM(v*v)) AS n FROM ev GROUP BY vec_id),
pz AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, SUM(x.v*y.v) AS dot
  FROM ev x JOIN ev y USING (pos)
  JOIN a2 ax ON ax.vec_id = x.vec_id
  JOIN a2 ay ON ay.vec_id = y.vec_id AND ax.cell = ay.cell
  WHERE x.vec_id < y.vec_id
  GROUP BY x.vec_id, y.vec_id
),
tp AS (
  SELECT id_a, id_b
  FROM pz JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
  WHERE ROUND(dot/(na.n*nb.n), 4) >= 0.4
),
edges AS (SELECT id_a AS src, id_b AS dst FROM tp UNION SELECT id_b, id_a FROM tp),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
),
comp AS (SELECT src AS vec_id, MIN(dst) AS label FROM reach GROUP BY src)
SELECT v.vec_id, COALESCE(c.label, v.vec_id) = v.vec_id AS keep
FROM embeddings v LEFT JOIN comp c USING (vec_id) ORDER BY v.vec_id
"""


@register(
    "q102_semdedup",
    _Q102_SEMDEDUP_SQL,
    doc=(
        "SemDeDup (Abbas et al.): IVF-cluster the embeddings (16 cells, "
        "1 distributed Lloyd step over a broadcast centroid matrix), "
        "compare cosine pairs only WITHIN a cell, keep the min id of "
        "each connected group — the quadratic term is bounded by the "
        "largest cell, never the corpus; the oracle replays the whole "
        "IVF path (seeds, Lloyd step, argmax, pair graph, components) "
        "in SQL, so the production-parameter operator is hash-matched "
        "end to end"
    ),
    tables=("embeddings",),
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, threshold=0.4, n_cells=16).orderBy("vec_id")


# --- Containment (asymmetric subset duplication) ----------------------------

_Q101_SQL = f"""
WITH tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
ointer AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(n_inter / sa.n_sh, 4) AS containment
FROM ointer JOIN sizes sa ON sa.doc_id = id_a
WHERE ROUND(n_inter / sa.n_sh, 4) >= 0.9
ORDER BY id_a, id_b
"""


@register(
    "q101_containment_pairs",
    _Q101_SQL,
    doc=(
        "asymmetric containment dedup: |shingles(A) n shingles(B)| / "
        "|shingles(A)| >= 0.9 flags docs (nearly) contained in another "
        "— the subset-duplication mode Jaccard misses; same checkpointed "
        "shingle-index machinery as q35a, ordered pair stream"
    ),
    tables=("documents",),
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, threshold=0.9).orderBy("id_a", "id_b")


# --- LSH-verified cluster resolution (the 100 TB path for q68) --------------

# Calibration-gated like the ANN recall properties (queries/ann.py):
# the exact-Jaccard oracle only equals the LSH-candidate path on
# fixtures where banding recall at J>=0.6 was verified to be 1.0.
# sf0.1 swept round 4: lsh_jaccard_pairs == jaccard_pairs (256 pairs,
# 0 missed) — added so the benchmark can run q68b at bench scale.
_Q68B_CALIBRATED_SFS = frozenset({"sf0.001", "sf0.01", "sf0.1"})


@register(
    "q68b_neardup_clusters_lsh",
    _Q68_CLUSTERS_SQL,
    doc=(
        "near-dup clusters via MinHash-LSH candidates + exact in-row "
        "Jaccard verification — the 100 TB spelling of q68: pair "
        "enumeration is collision-bounded banding instead of the "
        "inverted-index self-join; at calibrated recall-1.0 fixtures "
        "the result hash-matches q68's exact recursive-CTE oracle"
    ),
    tables=("documents",),
)
def q68b(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from osm_changesets_to_parquet_spark.operators.clusters import canonical_docs

    base = os.path.basename(os.path.normpath(sf_dir))
    if base not in _Q68B_CALIBRATED_SFS:
        raise FixtureGateError(
            f"q68b_neardup_clusters_lsh is calibration-pinned (verified at "
            f"{sorted(_Q68B_CALIBRATED_SFS)}); fixture {base!r} needs an LSH "
            "recall re-sweep before the exact oracle is meaningful"
        )
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.lsh_jaccard_pairs(docs, threshold=0.6)
    return canonical_docs(docs, pairs).orderBy("doc_id")


# --- SimHash near-dup CLUSTERS (the linear-output spelling of q110) ---------

_Q117_SQL = f"""
WITH RECURSIVE {_sql_simhash_cte("WHERE text IS NOT NULL")},
tpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {_Q110_MAX_HAM}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM tpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM tpairs
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(c.cluster_id, d.doc_id) = d.doc_id AS keep
FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
LEFT JOIN comp c USING (doc_id)
ORDER BY d.doc_id
"""


@register(
    "q117_simhash_clusters",
    _Q117_SQL,
    doc=(
        "hamming near-dup CLUSTER resolution — the linear-output "
        "spelling of q110 for duplicate-heavy corpora, where the "
        "all-pairs contract is output-bound (a duplicate group of k "
        "docs is k(k-1)/2 pairs but ONE cluster row per doc): docs are "
        "contracted to their DISTINCT FINGERPRINTS before banding "
        "(same fingerprint = hamming 0 = trivially in-ball, so the "
        "quotient graph has identical components; this subsumes the "
        "old md5(text) collapse — identical text implies identical "
        "fingerprint — and also merges distinct texts that hash "
        "equal), banding + CC run on the fingerprint graph only "
        "(sf0.1: 2,498 fp-nodes / 31.6k edges vs 5,000 docs / 625k "
        "edges, r10), min-label propagation labels the verified pair "
        "graph (the contraction changed the CC regime: the old DOC "
        "graph at replica scale favored star contraction — 32 s vs "
        "100 s over ~9M edges — but the fp-graph stays small and "
        "clique-shallow at every measured scale, where min-label's "
        "cheaper rounds win: 4.3/4.5/5.4 s vs star 5.5/5.3/6.8 s "
        "end-to-end at 1x/4x/16x, identical labels; star remains the "
        "right call for long-chain graphs per clusters.py), "
        "members map back through their fingerprint's min-doc_id "
        "representative (component min over reps = component min "
        "over docs); the (doc_id, simhash) projection is lineage-cut "
        "once for its three consumers instead of re-executing the "
        "30-aggregate fingerprint expression per consumer (r11: "
        "7.97 -> 4.8 s warm at sf0.1); oracle is the recursive-CTE "
        "closure over the brute-force hamming pair graph of ALL docs"
    ),
    tables=("documents",),
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.clusters import (
        connected_components,
    )
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    # contract to distinct fingerprints: rep = min doc_id per simhash.
    # The (doc_id, simhash) projection is lineage-cut ONCE: it feeds
    # three consumers (fp contraction, the banding+verify pair build,
    # and the final member map-back join), and without the cut each
    # re-executes the 30-aggregate simhash expression over the corpus —
    # profiled r11 at sf0.1: 7.97 -> 4.8 s warm, identical rows.  The
    # materialized frame is two longs per doc (16 B/row — at 100 TB of
    # text this is ~0.01% of input, and truncate_lineage makes it a
    # reliable checkpoint when a checkpoint dir is configured).
    sh = truncate_lineage(
        D.simhash(docs, "text", "doc_id").select("doc_id", "simhash")
    )
    fp = sh.groupBy("simhash").agg(F.min("doc_id").alias("rep"))
    pairs = D.hamming_pairs_from_fingerprints(
        fp.select(F.col("rep").alias("doc_id"), "simhash"),
        max_hamming=_Q110_MAX_HAM,
        n_bands=3,
    ).select("id_a", "id_b")
    comp = connected_components(pairs).withColumnRenamed("id", "rep")
    return (
        sh.join(fp, "simhash")
        .join(comp, "rep", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("rep")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


@register(
    "q125_jaccard_prefix_filter",
    _Q35_TRUTH_SQL,
    doc=(
        "exact Jaccard pairs >= 0.6 via PPJoin prefix filtering — the "
        "index-reduction refinement of q35a: only each set's rarest "
        "|s|-ceil(t|s|)+1 shingles (global frequency order) are "
        "indexed, candidates are the prefix self-join (a strict subset "
        "of the full co-occurrence join, excluding most hot-shingle "
        "buckets), verification restricted to candidates; "
        "hash-matched against q35a's exact truth oracle"
    ),
    tables=("documents",),
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_prefix_pairs(docs, threshold=0.6).orderBy("id_a", "id_b")


# --- Leakage-safe train/test split ------------------------------------------

from osm_changesets_to_parquet_spark.operators.quality import (  # noqa: E402
    hash_bucket as _hb,
    sql_hash_bucket as _sql_hb,
)

_Q127_SQL = f"""
WITH RECURSIVE {_TRUTH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM tpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM tpairs
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
assigned AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         CASE WHEN {_sql_hb("COALESCE(c.cluster_id, d.doc_id)", 100)} < 80
              THEN 'train' ELSE 'test' END AS split
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaked FROM (
    SELECT cluster_id FROM assigned GROUP BY cluster_id
    HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       ANY_VALUE((SELECT n_leaked FROM leak)) AS n_leaked_clusters
FROM assigned GROUP BY split ORDER BY split
"""


@register(
    "q127_leakage_safe_split",
    _Q127_SQL,
    doc=(
        "near-dup-aware train/test split: the 80/20 assignment hashes "
        "the CLUSTER id (q68's exact-Jaccard components), never the "
        "doc id, so a near-duplicate group can never straddle the "
        "split — the leakage mode a plain per-doc split silently has; "
        "n_leaked_clusters is derived from the data (not assumed) and "
        "must hash-match the oracle's 0"
    ),
    tables=("documents",),
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs_collapsed,
    )

    docs = load_table(spark, sf_dir, "documents")
    assigned = canonical_docs_collapsed(docs, threshold=0.6).select(
        "doc_id",
        "cluster_id",
        F.when(_hb("cluster_id", 100) < 80, F.lit("train"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    leak = (
        assigned.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            F.col("n_leaked").alias("n_leaked_clusters"),
        )
        .orderBy("split")
    )


# --- Cross-source duplication matrix ----------------------------------------

_Q131_SQL = """
WITH h AS (
  SELECT md5(text) AS hh, source FROM documents WHERE text IS NOT NULL
),
hs AS (SELECT hh, list_sort(list_distinct(list(source))) AS srcs FROM h GROUP BY hh),
pairs AS (
  SELECT hh, unnest(srcs) AS src_a, srcs FROM hs WHERE len(srcs) >= 2
),
expanded AS (
  SELECT hh, src_a, unnest(srcs) AS src_b FROM pairs
)
SELECT src_a, src_b, COUNT(*) AS n_shared_texts
FROM expanded WHERE src_a < src_b
GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


@register(
    "q131_cross_source_dups",
    _Q131_SQL,
    doc=(
        "provenance analysis: for every pair of sources, how many "
        "DISTINCT texts appear verbatim in both — the contamination "
        "matrix that tells you which feeds mirror each other; group by "
        "md5(text) (16-byte keys), in-row source-set pair expansion, "
        "one aggregate"
    ),
    tables=("documents",),
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.md5("text").alias("hh"), "source")
    )
    hs = (
        docs.groupBy("hh")
        .agg(F.array_sort(F.array_distinct(F.collect_list("source"))).alias("srcs"))
        .where(F.size("srcs") >= 2)
    )
    members = hs.select("srcs", F.posexplode("srcs").alias("i", "src_a"))
    pairs = members.select(
        "src_a",
        F.explode(
            F.slice(F.col("srcs"), F.col("i") + F.lit(2), F.size("srcs"))
        ).alias("src_b"),
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
        .orderBy("src_a", "src_b")
    )


# --- Dedup funnel accounting -------------------------------------------------

_Q134_SQL = f"""
WITH RECURSIVE {_TRUTH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM tpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM tpairs
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
raw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_raw FROM documents),
exact_ AS (
  SELECT CAST(COUNT(DISTINCT md5(COALESCE(text, ''))) AS BIGINT) AS n_exact
  FROM documents
),
fin AS (
  SELECT CAST(COUNT(DISTINCT COALESCE(c.cluster_id, d.doc_id)) AS BIGINT)
           AS n_clusters
  FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT raw.n_raw, exact_.n_exact, fin.n_clusters,
       ROUND(1 - CAST(exact_.n_exact AS DOUBLE) / raw.n_raw, 6) AS exact_reduction,
       ROUND(1 - CAST(fin.n_clusters AS DOUBLE) / raw.n_raw, 6) AS total_reduction
FROM raw, exact_, fin
"""


@register(
    "q134_dedup_funnel",
    _Q134_SQL,
    doc=(
        "pipeline-level dedup accounting — the funnel every data team "
        "reports: raw docs -> distinct exact texts -> near-dup "
        "clusters (q68's exact-Jaccard components), with reduction "
        "rates; composes exact_dedup + canonical_docs_collapsed into "
        "one single-row report, hash-matched against the recursive-CTE "
        "closure"
    ),
    tables=("documents",),
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs_collapsed,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.agg(F.count(F.lit(1)).alias("n_raw"))
    exact = docs.agg(
        F.countDistinct(F.md5(F.coalesce(F.col("text"), F.lit("")))).alias("n_exact")
    )
    clusters = canonical_docs_collapsed(docs, threshold=0.6).agg(
        F.countDistinct("cluster_id").alias("n_clusters")
    )
    return (
        raw.crossJoin(exact)
        .crossJoin(clusters)
        .select(
            "n_raw",
            "n_exact",
            "n_clusters",
            F.round(1 - F.col("n_exact").cast("double") / F.col("n_raw"), 6).alias(
                "exact_reduction"
            ),
            F.round(1 - F.col("n_clusters").cast("double") / F.col("n_raw"), 6).alias(
                "total_reduction"
            ),
        )
    )


# --- Cluster-aware canonical selection (round 5) ----------------------------

_Q138_SQL = f"""
WITH RECURSIVE {_TRUTH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM tpairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM tpairs
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
scored AS (
  SELECT doc_id, CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
  FROM documents WHERE text IS NOT NULL
),
assigned AS (
  SELECT s.doc_id, COALESCE(c.cluster_id, s.doc_id) AS cluster_id, s.score
  FROM scored s LEFT JOIN comp c USING (doc_id)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn
  FROM assigned
)
SELECT cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(doc_id) FILTER (WHERE rn = 1) AS keep_id,
       MAX(score) FILTER (WHERE rn = 1) AS keep_score,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM ranked GROUP BY cluster_id ORDER BY cluster_id
"""


@register(
    "q138_cluster_canonical_pick",
    _Q138_SQL,
    doc=(
        "quality-aware canonical selection — the curation step after "
        "near-dup clustering: per exact-Jaccard cluster (q68's "
        "components via the collapsed spelling) keep the member with "
        "the HIGHEST quality score (distinct-word count; ties to the "
        "lower doc_id) instead of the arbitrary min-id — one "
        "max_by(struct) aggregate over the cluster assignment, so "
        "dedup drops the worst copies, not random ones"
    ),
    tables=("documents",),
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.clusters import (
        canonical_docs_collapsed,
    )

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    assigned = canonical_docs_collapsed(docs, threshold=0.6).select(
        "doc_id", "cluster_id"
    )
    scored = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("score"),
    )
    j = assigned.join(scored, "doc_id")
    best = F.max_by(
        F.struct(F.col("doc_id").alias("id"), F.col("score").alias("s")),
        F.struct(F.col("score").alias("a"), (-F.col("doc_id")).alias("b")),
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best.alias("__best"),
        )
        .select(
            "cluster_id",
            "n_members",
            F.col("__best.id").alias("keep_id"),
            F.col("__best.s").alias("keep_score"),
            (F.col("n_members") - 1).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


# --- Incremental near-dup: arriving batch vs existing corpus (round 5) ------

_Q139_SQL = f"""
WITH tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h
  WHERE {_sql_hb("a.doc_id", 100)} >= 90 AND {_sql_hb("b.doc_id", 100)} < 90
  GROUP BY 1, 2
)
SELECT new_id, old_id,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jac
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = old_id
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.6
ORDER BY new_id, old_id
"""


@register(
    "q139_incremental_neardup",
    _Q139_SQL,
    doc=(
        "incremental NEAR-dup check — the banded complement of q94's "
        "exact-hash incremental dedup: the arriving 10% batch (id-hash "
        "bucket >= 90) probes the existing corpus through MinHash-LSH "
        "band buckets (candidates are ONLY new x old band collisions — "
        "never new x new or old x old), each candidate verified with "
        "the exact in-row Jaccard.  At scale the existing side's "
        "banded signatures are the persisted index a daily increment "
        "probes (operators/dedup.py lsh_neardup_incremental); oracle "
        "is the brute-force cross-side Jaccard (calibrated recall-1.0 "
        "fixtures, the q68b discipline)"
    ),
    tables=("documents",),
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    base = os.path.basename(os.path.normpath(sf_dir))
    if base not in _Q68B_CALIBRATED_SFS:
        raise FixtureGateError(
            f"q139_incremental_neardup is calibration-pinned (verified at "
            f"{sorted(_Q68B_CALIBRATED_SFS)}); fixture {base!r} needs an LSH "
            "recall re-sweep before the exact oracle is meaningful"
        )
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 100)
    existing = docs.where(b < 90)
    incoming = docs.where(b >= 90)
    return D.lsh_neardup_incremental(existing, incoming, threshold=0.6).orderBy(
        "new_id", "old_id"
    )


@register(
    "q142_neardup_persisted_index",
    _Q139_SQL,
    doc=(
        "the q139 incremental near-dup probe against a PERSISTED "
        "banded-signature index (operators/dedup.py lsh_index_write / "
        "lsh_neardup_probe_index): the 90% corpus is banded ONCE and "
        "written as (id, band, bkey) + (id, shingle-hash) parquet; the "
        "arriving 10% batch computes its own bands and equi-joins the "
        "stored frame — the corpus text is never re-shingled, so the "
        "per-increment cost is independent of corpus growth since "
        "indexing.  Same brute-force cross-side Jaccard oracle as q139 "
        "(identical result contract, different corpus-side physics)"
    ),
    tables=("documents",),
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    base = os.path.basename(os.path.normpath(sf_dir))
    if base not in _Q68B_CALIBRATED_SFS:
        raise FixtureGateError(
            f"q142_neardup_persisted_index is calibration-pinned (verified at "
            f"{sorted(_Q68B_CALIBRATED_SFS)}); fixture {base!r} needs an LSH "
            "recall re-sweep before the exact oracle is meaningful"
        )
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 100)
    existing = docs.where(b < 90)
    incoming = docs.where(b >= 90)
    # one index build per (corpus, session lifetime): the _READY marker
    # makes repeated runs pure probes — exactly the daily-increment
    # shape the operator is for.  Rebuilt from scratch per fixture dir;
    # writes are overwrite-mode so a torn build self-heals.
    idx = os.path.join(tempfile.gettempdir(), f"lsh_neardup_index_{base}")
    ready = os.path.join(idx, "_READY")
    if not os.path.exists(ready):
        D.lsh_index_write(existing, idx)
        open(ready, "w").close()
    return D.lsh_neardup_probe_index(spark, idx, incoming, threshold=0.6).orderBy(
        "new_id", "old_id"
    )


_Q143_K, _Q143_MIN_SPAN = 8, 10

# The oracle groups duplicated grams by the raw k-token STRING — exact
# ground truth.  The engine keys the same grams on xxhash64 (the
# q86/q136 8-byte-shuffle-key discipline), so a 2^-64 hash collision
# would conjoin a false span AND show up here as a mismatch; the hash
# itself never reaches the output, so no cross-engine hash replay.
_Q143_SQL = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
gl AS (SELECT doc_id, list_transform(range(1, len(tk) - {_Q143_K - 2}),
         i -> array_to_string(list_slice(tk, i, i + {_Q143_K - 1}), ' ')) AS gh
       FROM tok WHERE len(tk) >= {_Q143_K}),
g AS (SELECT doc_id, generate_subscripts(gh, 1) AS pos, unnest(gh) AS h FROM gl),
dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
marked AS (SELECT doc_id, pos,
    CASE WHEN LAG(pos) OVER w IS NULL OR pos - LAG(pos) OVER w > {_Q143_K}
         THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
grp AS (SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid
  FROM marked),
spans AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_Q143_K - 1} AS span_end
          FROM grp GROUP BY doc_id, gid)
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
FROM spans
WHERE span_end - span_start + 1 >= {_Q143_MIN_SPAN}
ORDER BY doc_id, span_start
"""


@register(
    "q143_repeated_spans",
    _Q143_SQL,
    doc=(
        "span-level repeated-substring dedup (the Lee et al. 2022 "
        "suffix-array dedup, public, respelled relationally): maximal "
        "token spans >= 10 tokens whose every 8-token gram occurs at "
        ">= 2 (doc, pos) locations corpus-wide — in-row gram strings "
        "-> posexplode_outer -> xxhash64 keys -> duplicated-gram "
        "count -> semi-join -> gaps-and-islands per doc "
        "(operators/dedup.py repeated_spans).  q136 "
        "counts boilerplate burden; this returns the excisable spans"
    ),
    tables=("documents",),
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.repeated_spans(
        docs, k=_Q143_K, min_span=_Q143_MIN_SPAN
    ).orderBy("doc_id", "span_start")


# --- Span-level decontamination (q149) --------------------------------------

_Q149_SQL = f"""
WITH tok AS (SELECT doc_id, {_sql_hb('doc_id', 100)} AS b, string_split(text, ' ') AS tk FROM documents),
gl AS (SELECT doc_id, b, list_transform(range(1, len(tk) - {_Q143_K - 2}),
         i -> array_to_string(list_slice(tk, i, i + {_Q143_K - 1}), ' ')) AS gh
       FROM tok WHERE len(tk) >= {_Q143_K}),
g AS (SELECT doc_id, b, generate_subscripts(gh, 1) AS pos, unnest(gh) AS h FROM gl),
ev AS (SELECT DISTINCT h FROM g WHERE b >= 90),
hits AS (SELECT doc_id, pos FROM g WHERE b < 90 AND h IN (SELECT h FROM ev)),
marked AS (SELECT doc_id, pos,
    CASE WHEN LAG(pos) OVER w IS NULL OR pos - LAG(pos) OVER w > {_Q143_K}
         THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
grp AS (SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS gid
  FROM marked),
spans AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_Q143_K - 1} AS span_end
          FROM grp GROUP BY doc_id, gid)
SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end AS BIGINT) AS span_end,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
FROM spans
WHERE span_end - span_start + 1 >= {_Q143_MIN_SPAN}
ORDER BY doc_id, span_start
"""


@register(
    "q149_decontaminate_spans",
    _Q149_SQL,
    doc=(
        "span-level benchmark decontamination: q86 flags WHICH train "
        "docs share an 8-gram with a held-out eval split; this returns "
        "WHERE, on the 10% id-hash split (dense enough in fixture "
        "near-dups to yield spans at every SF) — the maximal train "
        "spans (>= 10 tokens) whose every "
        "8-gram occurs in the eval corpus, i.e. the excision targets "
        "(operators/dedup.py contaminated_spans — the q143 island "
        "machinery pointed across corpora; eval side reduced to "
        "DISTINCT 8-byte gram hashes before the semi-join)"
    ),
    tables=("documents",),
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = _hb("doc_id", 100)
    train, eval_df = docs.where(b < 90), docs.where(b >= 90)
    return D.contaminated_spans(
        train, eval_df, k=_Q143_K, min_span=_Q143_MIN_SPAN
    ).orderBy("doc_id", "span_start")


# ---------------------------------------------------------------------------
# Q153: corpus-overlap matrix — exact Jaccard between source token sets
# ---------------------------------------------------------------------------

# The oracle intersects the raw distinct word sets; the engine joins on
# xxhash64(word) (8-byte shuffle keys) — the hash never reaches the
# output, so a collision would MISmatch here rather than hide.
_Q153_SQL = """
WITH tok AS (
  SELECT DISTINCT source, word
  FROM (SELECT source,
               unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
        FROM documents)
),
sz AS (SELECT source, COUNT(*) AS sz FROM tok GROUP BY source),
inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_common
  FROM tok a JOIN tok b ON a.word = b.word AND a.source < b.source
  GROUP BY 1, 2
)
SELECT x.source AS group_a, y.source AS group_b,
       CAST(x.sz AS BIGINT) AS n_a, CAST(y.sz AS BIGINT) AS n_b,
       CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
       ROUND(COALESCE(i.n_common, 0)
             / CAST(x.sz + y.sz - COALESCE(i.n_common, 0) AS DOUBLE), 6)
         AS jaccard
FROM sz x JOIN sz y ON x.source < y.source
LEFT JOIN inter i ON i.sa = x.source AND i.sb = y.source
ORDER BY group_a, group_b
"""


@register(
    "q153_group_jaccard",
    _Q153_SQL,
    doc=(
        "corpus-overlap matrix: EXACT Jaccard between the distinct-"
        "token sets of every source pair (which domains are near-"
        "copies, which shard duplicates which).  DISTINCT (group, "
        "xxhash64 token) first — map-side partial dedup, 8-byte "
        "shuffle keys — then a self-EQUI-join on the hash bounds each "
        "token's contribution by #groups², never corpus size; set "
        "sizes broadcast to complete zero-overlap pairs "
        "(operators/dedup.py group_token_jaccard)"
    ),
    tables=("documents",),
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return D.group_token_jaccard(docs, "source").orderBy("group_a", "group_b")


# ---------------------------------------------------------------------------
# Q174: sorted-neighborhood blocking (entity-resolution candidate window)
# ---------------------------------------------------------------------------

_Q174_W = 4       # window: each record pairs with the next w-1 in sort order
_Q174_DIST = 4    # verification threshold on the blocked candidates

_Q174_SQL = f"""
WITH r AS (
  SELECT p_partkey, p_name,
         ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND {_Q174_W - 1}
WHERE levenshtein(a.p_name, b.p_name) <= {_Q174_DIST}
ORDER BY key_a, key_b
"""


@register(
    "q174_sorted_neighborhood",
    _Q174_SQL,
    doc=(
        "sorted-neighborhood blocking (Hernandez & Stolfo 1995, public "
        "— the entity-resolution complement of LSH banding): records "
        "rank globally by the blocking key (name) via the range-"
        "bucketed global_rank (first-char codepoint buckets the "
        "shuffle; never a single-task window), then each record pairs "
        "only with the next w-1 neighbors — candidates are O(n*w) by "
        "construction, never a self-join — and the JVM levenshtein "
        "verifies; the oracle replays the identical window"
    ),
    tables=("part",),
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.packing import global_rank

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    # first-char codepoint is a monotone numeric proxy for the
    # lexicographic order (lowercase-ascii names); equal codepoints
    # stay in one bucket where (p_name, p_partkey) breaks ties, so the
    # rank is the exact global ROW_NUMBER of the oracle
    keyed = part.withColumn("__ck", F.ascii(F.substring("p_name", 1, 1)))
    ranked = global_rank(
        keyed,
        ["__ck", "p_name", "p_partkey"],
        out_col="rk",
        bounds=[c + 0.5 for c in range(97, 122)],
    ).drop("__ck")
    left = (
        ranked.withColumn(
            "__off", F.explode(F.array(*[F.lit(i) for i in range(1, _Q174_W)]))
        )
        .select(
            F.col("p_partkey").alias("key_a"),
            F.col("p_name").alias("name_a"),
            (F.col("rk") + F.col("__off")).alias("rk_b"),
        )
    )
    right = ranked.select(
        F.col("rk").alias("rk_b"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        left.join(right, "rk_b")
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= _Q174_DIST)
        .orderBy("key_a", "key_b")
    )


# ---------------------------------------------------------------------------
# q285: dedup ROI curve (removal cost/benefit per Jaccard threshold)
# ---------------------------------------------------------------------------

_Q285_THRESHOLDS = (0.3, 0.5, 0.7, 0.9)

_Q285_SQL = f"""
WITH tok AS ({_SQL_TOK}),
sh AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tpairs AS (
  SELECT id_a, id_b,
         ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jac
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.3
),
ts(t) AS (
  SELECT * FROM (VALUES {", ".join(f"({t})" for t in _Q285_THRESHOLDS)}) v(t)
),
removed AS (
  SELECT ts.t, p.id_b
  FROM tpairs p JOIN ts ON p.jac >= ts.t
  GROUP BY ts.t, p.id_b
),
corpus AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                  CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT ts.t AS threshold,
       CAST(COUNT(r.id_b) AS BIGINT) AS n_removed,
       CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS chars_removed,
       ROUND(COALESCE(SUM(d.n_chars), 0) * 1.0
             / ANY_VALUE(corpus.total_chars), 4) AS pct_chars_removed
FROM ts
LEFT JOIN removed r ON r.t = ts.t
LEFT JOIN documents d ON d.doc_id = r.id_b
CROSS JOIN corpus
GROUP BY ts.t ORDER BY threshold
"""


@register(
    "q285_dedup_roi",
    _Q285_SQL,
    doc=(
        "dedup ROI curve — pick the near-dup aggressiveness by "
        "MEASURED cost/benefit, not folklore: exact 3-gram Jaccard "
        "pairs >= 0.3 (the q35a shingle machinery, co-occurrence "
        "self-join — never all-pairs) evaluated at 4 thresholds with "
        "the keep-min-id pairwise rule (removed = any doc that is "
        "the LARGER id of a qualifying pair — an upper bound on "
        "transitive-cluster removal, stated; q68 has the exact "
        "closure), reporting docs and corpus-char share removed per "
        "threshold; monotone decreasing in threshold by construction"
    ),
    tables=("documents",),
)
def q285(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.3)
    ts = docs.sparkSession.createDataFrame(
        [(t,) for t in _Q285_THRESHOLDS], "t DOUBLE"
    )
    removed = (
        pairs.crossJoin(F.broadcast(ts))
        .where(F.col("jac") >= F.col("t"))
        .select("t", "id_b")
        .distinct()
    )
    corpus = docs.agg(
        F.sum("n_chars").alias("total_chars"),
    )
    joined = removed.join(
        docs.select(F.col("doc_id").alias("id_b"), "n_chars"), "id_b"
    )
    per_t = joined.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_removed"),
        F.sum("n_chars").alias("chars_removed"),
    )
    return (
        ts.join(per_t, "t", "left")
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col("t").alias("threshold"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("chars_removed", F.lit(0)).cast("long").alias(
                "chars_removed"
            ),
            F.round(
                F.coalesce("chars_removed", F.lit(0)) * 1.0
                / F.col("total_chars"),
                4,
            ).alias("pct_chars_removed"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# q292: MinHash estimator error audit (estimated vs exact Jaccard)
# ---------------------------------------------------------------------------

_Q292_TRUTH_CTES = f"""tok AS ({_SQL_TOK}),
shd AS (SELECT doc_id, list_distinct({_SQL_SHINGLE_HASHES}) AS hs FROM tok),
ex AS (SELECT doc_id, unnest(hs) AS h FROM shd),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tpairs AS (
  SELECT id_a, id_b,
         ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) AS jac
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.3
)"""

_Q292_SQL = f"""
WITH {_Q292_TRUTH_CTES},
sh2 AS (SELECT doc_id, {_SQL_SHINGLE_HASHES} AS hs FROM tok),
sig AS (SELECT doc_id, {_sql_sig_entries()} AS sig FROM sh2),
est AS (
  SELECT t.id_a, t.id_b, t.jac,
         ROUND(len(list_filter(range(1, {D.N_HASHES} + 1),
                   i -> sa.sig[i] = sb.sig[i])) / {D.N_HASHES}.0, 4) AS jest
  FROM tpairs t
  JOIN sig sa ON sa.doc_id = t.id_a
  JOIN sig sb ON sb.doc_id = t.id_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(jest - jac), 4) AS mean_bias,
       ROUND(AVG(ABS(jest - jac)), 4) AS mean_abs_err,
       ROUND(MAX(ABS(jest - jac)), 4) AS max_abs_err
FROM est
"""


@register(
    "q292_minhash_error_audit",
    _Q292_SQL,
    doc=(
        f"MinHash estimator calibration audit: for every exact-"
        f"Jaccard pair >= 0.3, the {D.N_HASHES}-hash signature "
        "estimate (share of agreeing components) vs the true J — "
        "bias, MAE, and worst case; theory says SE ~ sqrt(J(1-J)/32) "
        "~ 0.09 at J=0.5, and this measures whether the engine's "
        "actual MINHASH_A/B constants deliver it (the audit q35b's "
        "recall test can't do — recall checks candidates, this "
        "checks the ESTIMATOR); signatures and truth share one "
        "shingle pass"
    ),
    tables=("documents",),
)
def q292(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, threshold=0.3)
    sigs = D.minhash_signature(D.shingles(docs)).select("doc_id", "sig")
    est = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .select(
            "jac",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "sig_a",
                        "sig_b",
                        lambda x, y: (x == y).cast("int"),
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / D.N_HASHES,
                4,
            ).alias("jest"),
        )
    )
    return est.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.col("jest") - F.col("jac")), 4).alias("mean_bias"),
        F.round(F.avg(F.abs(F.col("jest") - F.col("jac"))), 4).alias(
            "mean_abs_err"
        ),
        F.round(F.max(F.abs(F.col("jest") - F.col("jac"))), 4).alias(
            "max_abs_err"
        ),
    )


# ---------------------------------------------------------------------------
# q295: similarity-graph transitivity audit (round 7)
# ---------------------------------------------------------------------------

_Q295_SQL = f"""
WITH {_Q292_TRUTH_CTES},
sym AS (
  SELECT id_a AS u, id_b AS v FROM tpairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM tpairs
),
wedge AS (
  SELECT a.v AS x, b.v AS y
  FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
),
closed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_closed
  FROM wedge w
  WHERE EXISTS (SELECT 1 FROM tpairs t
                WHERE t.id_a = w.x AND t.id_b = w.y)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tpairs) AS n_pairs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedge) AS n_wedges,
       closed.n_closed,
       ROUND(CASE WHEN (SELECT COUNT(*) FROM wedge) > 0
             THEN closed.n_closed * 1.0 / (SELECT COUNT(*) FROM wedge)
             ELSE NULL END, 4) AS transitivity
FROM closed
"""


@register(
    "q295_similarity_transitivity",
    _Q295_SQL,
    doc=(
        "transitivity audit of the exact-Jaccard similarity graph "
        "(J >= 0.3): of all wedges a~b, a~c, what share close into "
        "a~c — HIGH transitivity justifies q68's connected-component "
        "clustering (members really are mutually similar), LOW means "
        "CC chains unrelated docs through hubs and the canonical-pick "
        "q138 discipline matters; wedges via the apex self-join of "
        "the symmetric pair list, closure via an equi-semi-join on "
        "the ordered pair key (the q218 triangle discipline applied "
        "to the similarity graph)"
    ),
    tables=("documents",),
)
def q295(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the pair table feeds FOUR consumers (both symmetrized sides, the
    # closing semi-join probe, and the pair count): jaccard_pairs
    # checkpoints its shingle SETS but not the co-occurrence join, so
    # without a cut the join subtree re-executes per consumer (r14)
    pairs = truncate_lineage(
        D.jaccard_pairs(docs, threshold=0.3).select("id_a", "id_b")
    )
    sym = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    a = sym.alias("a")
    b = sym.alias("b")
    wedge = (
        a.join(b, F.col("a.u") == F.col("b.u"))
        .where(F.col("a.v") < F.col("b.v"))
        .select(F.col("a.v").alias("id_a"), F.col("b.v").alias("id_b"))
    )
    closed = wedge.join(pairs, ["id_a", "id_b"], "semi")
    n_pairs = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    n_wedges = wedge.agg(F.count(F.lit(1)).alias("n_wedges"))
    n_closed = closed.agg(F.count(F.lit(1)).alias("n_closed"))
    return (
        n_pairs.crossJoin(F.broadcast(n_wedges))
        .crossJoin(F.broadcast(n_closed))
        .select(
            "n_pairs",
            "n_wedges",
            "n_closed",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    F.col("n_closed") * 1.0 / F.col("n_wedges"),
                ),
                4,
            ).alias("transitivity"),
        )
    )


# ---------------------------------------------------------------------------
# q298: LSH candidate-stage quality report (round 7)
# ---------------------------------------------------------------------------

_Q298_SQL = f"""
WITH {_TRUTH_CTES},
sh2 AS (SELECT doc_id, {_SQL_SHINGLE_HASHES} AS hs FROM tok),
sig AS (SELECT doc_id, {_sql_sig_entries()} AS sig FROM sh2),
bands AS (
  SELECT doc_id,
         generate_subscripts([{", ".join(_sql_band_fold(b) for b in range(D.N_BANDS))}], 1) AS band,
         unnest([{", ".join(_sql_band_fold(b) for b in range(D.N_BANDS))}]) AS bkey
  FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
hit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM cand c
  WHERE EXISTS (SELECT 1 FROM tpairs t
                WHERE t.id_a = c.id_a AND t.id_b = c.id_b)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tpairs) AS n_truth,
       hit.n_hit,
       ROUND(hit.n_hit * 1.0
             / NULLIF((SELECT COUNT(*) FROM cand), 0), 4) AS precision_,
       ROUND(hit.n_hit * 1.0
             / NULLIF((SELECT COUNT(*) FROM tpairs), 0), 4) AS recall_
FROM hit
"""


@register(
    "q298_lsh_stage_quality",
    _Q298_SQL,
    doc=(
        "LSH candidate-stage quality report — the PRODUCTION "
        "observability q35b's unit-test recall property can't give "
        "you: candidates from the 8x4 banding vs the exact J>=0.6 "
        "truth, reporting candidate count, precision (how much "
        "exact-verification work the bands save) and recall (what "
        "the bands MISS — the q288 planner's S-curve, measured); "
        "both sides reuse the engine's exact MINHASH constants; a "
        "recall drop in this query on fresh data means the banding "
        "no longer fits the corpus's similarity profile"
    ),
    tables=("documents",),
)
def q298(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = D.lsh_candidates(docs).select("id_a", "id_b")
    truth = D.jaccard_pairs(docs, threshold=0.6).select("id_a", "id_b")
    n_c = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_t = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_h = cand.join(truth, ["id_a", "id_b"], "semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_c.crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(n_h))
        .select(
            "n_candidates",
            "n_truth",
            "n_hit",
            F.round(
                F.col("n_hit") * 1.0 / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision_"),
            F.round(
                F.col("n_hit") * 1.0 / F.nullif(F.col("n_truth"), F.lit(0)), 4
            ).alias("recall_"),
        )
    )


# ---------------------------------------------------------------------------
# q325: Fellegi-Sunter record-linkage weight estimation (round 8)
# ---------------------------------------------------------------------------

# The probabilistic entity-resolution model (Fellegi & Sunter 1969)
# behind every production linker (Splink et al.): per comparison field
# k, estimate m_k = P(agree | match) and u_k = P(agree | non-match)
# and report the log2 agreement/disagreement weights that score
# candidate pairs.  The linkage fixture is the standard synthetic-
# corruption setup: file B is the customer table with DETERMINISTIC
# hash-bucketed field corruptions (10% names, 20% segments, 10%
# balances), so ground truth is the shared key and the true m vector
# is known by construction (~0.9/0.8/0.9 — the audit's honest
# answer).  Blocking on nation bounds candidate generation to
# within-block pairs (the quadratic-in-block-size cost every linker
# pays; q174 sorted-neighborhood is the documented alternative when
# blocks skew); the pair stream reduces to ONE aggregation row of
# integer agreement counts — map-side combinable, nothing pair-sized
# is ever shuffled.  m/u are clamped to [0.001, 0.999] before the
# log-odds (the Laplace-floor that keeps weights finite when a field
# never agrees on non-matches, e.g. unique names).
_Q325_CLAMP_LO = 0.001
_Q325_CLAMP_HI = 0.999

_Q325_B = "(((c_custkey % 2147483648) * 2654435761) % 100)"

_Q325_FILES = f"""
a AS (
  SELECT c_custkey AS key, c_nationkey AS nat, c_name AS name,
         c_mktsegment AS seg,
         CAST(FLOOR((CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
              / 10000.0) AS BIGINT) AS balb
  FROM customer
),
b AS (
  SELECT c_custkey AS key, c_nationkey AS nat,
         CASE WHEN {_Q325_B} < 10 THEN c_name || 'X' ELSE c_name END AS name,
         CASE WHEN {_Q325_B} >= 10 AND {_Q325_B} < 30
              THEN '__CORRUPT__' ELSE c_mktsegment END AS seg,
         CAST(FLOOR((CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
              + CASE WHEN {_Q325_B} >= 30 AND {_Q325_B} < 40
                     THEN 3700 ELSE 0 END) / 10000.0) AS BIGINT) AS balb
  FROM customer
)
"""

_Q325_SQL = f"""
WITH {_Q325_FILES},
pairs AS (
  SELECT CAST(a.key = b.key AS BIGINT) AS mt,
         CAST(a.name = b.name AS BIGINT) AS g1,
         CAST(a.seg = b.seg AS BIGINT) AS g2,
         CAST(a.balb = b.balb AS BIGINT) AS g3
  FROM a JOIN b ON a.nat = b.nat
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
         CAST(SUM(mt) AS BIGINT) AS n_match,
         CAST(SUM(mt * g1) AS BIGINT) AS m1, CAST(SUM((1 - mt) * g1) AS BIGINT) AS u1,
         CAST(SUM(mt * g2) AS BIGINT) AS m2, CAST(SUM((1 - mt) * g2) AS BIGINT) AS u2,
         CAST(SUM(mt * g3) AS BIGINT) AS m3, CAST(SUM((1 - mt) * g3) AS BIGINT) AS u3
  FROM pairs
),
w AS (
  SELECT field, n_cand, n_match,
         LEAST(GREATEST(ma * 1.0 / n_match, {_Q325_CLAMP_LO}),
               {_Q325_CLAMP_HI}) AS m,
         LEAST(GREATEST(ua * 1.0 / (n_cand - n_match), {_Q325_CLAMP_LO}),
               {_Q325_CLAMP_HI}) AS u
  FROM (
    SELECT 'name' AS field, n_cand, n_match, m1 AS ma, u1 AS ua FROM s
    UNION ALL
    SELECT 'segment', n_cand, n_match, m2, u2 FROM s
    UNION ALL
    SELECT 'balance', n_cand, n_match, m3, u3 FROM s
  )
)
SELECT field, n_cand, n_match,
       ROUND(m, 4) AS m, ROUND(u, 4) AS u,
       ROUND(log2(m / u), 4) AS w_agree,
       ROUND(log2((1 - m) / (1 - u)), 4) AS w_disagree
FROM w ORDER BY field
"""


@register(
    "q325_fellegi_sunter",
    _Q325_SQL,
    doc=(
        "Fellegi-Sunter record-linkage weight estimation (1969 — the "
        "probabilistic ER model behind Splink-style production "
        "linkers): m/u probabilities and log2 agreement/disagreement "
        "weights for three comparison fields (name, segment, balance-"
        "hundreds), estimated from nation-blocked candidate pairs of "
        "the customer file against its deterministically hash-"
        "corrupted twin (10%/20%/10% field corruption — truth is the "
        "shared key, so the honest m vector is ~0.9/0.8/0.9 by "
        "construction and u reflects within-block chance agreement).  "
        "The within-block pair stream collapses to ONE integer "
        "agreement-count row (map-side combinable — nothing pair-"
        "sized shuffles); probabilities are clamped to [0.001, 0.999] "
        "before the log-odds so a never-agreeing field (unique names) "
        "keeps finite weights"
    ),
    tables=("customer",),
)
def q325(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_changesets_to_parquet_spark.operators.iterutils import (
        truncate_lineage,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    cust = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    bkt = hash_bucket("c_custkey", 100)
    a = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(cents / F.lit(10000.0)).cast("long").alias("balb"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_nationkey").alias("nat"),
        F.when(bkt < 10, F.concat(F.col("c_name"), F.lit("X")))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when((bkt >= 10) & (bkt < 30), F.lit("__CORRUPT__"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.floor(
            (
                cents
                + F.when((bkt >= 30) & (bkt < 40), F.lit(3700)).otherwise(
                    F.lit(0)
                )
            )
            / F.lit(10000.0)
        )
        .cast("long")
        .alias("balb"),
    )
    pa = a.alias("a")
    pb = b.alias("b")
    pairs = pa.join(pb, F.col("a.nat") == F.col("b.nat")).select(
        (F.col("a.key") == F.col("b.key")).cast("long").alias("mt"),
        (F.col("a.name") == F.col("b.name")).cast("long").alias("g1"),
        (F.col("a.seg") == F.col("b.seg")).cast("long").alias("g2"),
        (F.col("a.balb") == F.col("b.balb")).cast("long").alias("g3"),
    )
    s = truncate_lineage(
        pairs.agg(
            F.count(F.lit(1)).cast("long").alias("n_cand"),
            F.sum("mt").cast("long").alias("n_match"),
            F.sum(F.col("mt") * F.col("g1")).cast("long").alias("ma1"),
            F.sum((1 - F.col("mt")) * F.col("g1")).cast("long").alias("ua1"),
            F.sum(F.col("mt") * F.col("g2")).cast("long").alias("ma2"),
            F.sum((1 - F.col("mt")) * F.col("g2")).cast("long").alias("ua2"),
            F.sum(F.col("mt") * F.col("g3")).cast("long").alias("ma3"),
            F.sum((1 - F.col("mt")) * F.col("g3")).cast("long").alias("ua3"),
        )
    )
    rows = None
    for field, mc, uc in (
        ("name", "ma1", "ua1"),
        ("segment", "ma2", "ua2"),
        ("balance", "ma3", "ua3"),
    ):
        r = s.select(
            F.lit(field).alias("field"),
            "n_cand",
            "n_match",
            F.col(mc).alias("ma"),
            F.col(uc).alias("ua"),
        )
        rows = r if rows is None else rows.unionByName(r)
    m = F.least(
        F.greatest(
            F.col("ma") * F.lit(1.0) / F.col("n_match"),
            F.lit(_Q325_CLAMP_LO),
        ),
        F.lit(_Q325_CLAMP_HI),
    )
    u = F.least(
        F.greatest(
            F.col("ua") * F.lit(1.0) / (F.col("n_cand") - F.col("n_match")),
            F.lit(_Q325_CLAMP_LO),
        ),
        F.lit(_Q325_CLAMP_HI),
    )
    w = rows.select("field", "n_cand", "n_match", m.alias("m"), u.alias("u"))
    return w.select(
        "field",
        "n_cand",
        "n_match",
        F.round("m", 4).alias("m"),
        F.round("u", 4).alias("u"),
        F.round(F.log2(F.col("m") / F.col("u")), 4).alias("w_agree"),
        F.round(
            F.log2((F.lit(1) - F.col("m")) / (F.lit(1) - F.col("u"))), 4
        ).alias("w_disagree"),
    ).orderBy("field")
