"""Similarity search over embedding columns (array<float>).

Two paths behind one API:

- :func:`cosine_topk` — exact brute force.  The dot/norm fold runs
  JVM-side (``F.zip_with`` + ``F.aggregate``, whole-stage codegen); the
  query vector is a broadcast one-row frame, and the final top-k
  executes as TakeOrderedAndProject (per-partition heap + driver merge
  of k rows — no global sort, no full shuffle).  This is the correct
  100 TB plan for single-query top-k: one scan, O(k) driver memory.
- :func:`lsh_topk` — random-hyperplane (SRP) LSH bucketing: candidates
  are rows sharing a signature bucket with the query; exact cosine is
  then computed only on candidates.  The scale path when QPS matters:
  the bucket join prunes the scan to a fixed expected fraction
  (2^-bits per table).

No Python/pandas in either path.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _sq_norm(a):
    return F.aggregate(
        a, F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine_similarity_col(a, b):
    """Column-level cosine similarity between two array<float|double> cols."""
    return _dot(a, b) / (F.sqrt(_sq_norm(a)) * F.sqrt(_sq_norm(b)))


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact top-k by cosine similarity to the single row in ``query``
    (a one-row frame with a ``q`` array column)."""
    sim = cosine_similarity_col(F.col(vec_col), F.col("q"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        embeddings.crossJoin(F.broadcast(query))
        .select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def srp_signature(vec_col, planes: list[list[float]]):
    """Signed-random-projection bit signature as a long (<=63 planes)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = _dot(vec_col, F.array(*[F.lit(float(v)) for v in plane]))
        sig = sig + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def make_planes(dim: int, bits: int, n_tables: int, seed: int = 42) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(n_tables)
    ]


def lsh_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine over the union of rows that share
    any of ``n_tables`` SRP bucket signatures with the query vector.

    Recall/scan tradeoff: expected candidate fraction ~ n_tables * 2^-bits.
    """
    tables = make_planes(dim, bits, n_tables, seed)
    cand = None
    for t, planes in enumerate(tables):
        e_sig = embeddings.select(
            id_col, vec_col, srp_signature(F.col(vec_col), planes).alias("sig")
        )
        q_sig = query.select("q", srp_signature(F.col("q"), planes).alias("sig"))
        c = e_sig.join(F.broadcast(q_sig), "sig").select(id_col, vec_col, "q")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates([id_col])
    sim = F.round(cosine_similarity_col(F.col(vec_col), F.col("q")), 4)
    return (
        cand.select(id_col, sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine_neardup(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    n_tables: int = 3,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).

    LSH-bucketed: only pairs sharing a bucket in some table are compared —
    the all-pairs quadratic join never materializes.  Returns
    (id_a, id_b, sim) with sim rounded to 4.
    """
    tables = make_planes(dim, bits, n_tables, seed)
    pairs = None
    for planes in tables:
        sigged = embeddings.select(
            F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), planes).alias("sig")
        )
        a = sigged.select(
            F.col("sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        b = sigged.select(
            F.col("sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        p = a.join(b, "sig").where(F.col("id_a") < F.col("id_b")).drop("sig")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    sim = F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 4)
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
