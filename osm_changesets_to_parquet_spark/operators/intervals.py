"""Interval overlap self-join with grid-bucket blocking.

An UNKEYED interval overlap join ("find every pair of time ranges that
intersect") has no equi-key, so the naive spelling is a theta join —
O(n^2) comparisons, the same trap as q16's literal theta pair join.
The standard scale path is grid blocking:

- quantize the timeline into fixed-width buckets;
- each interval explodes to the buckets it covers
  (``(end - start) / width + 2`` rows — a small constant when the
  bucket width is chosen near the typical interval length);
- candidates = equi-join on the bucket id (an ordinary hash join);
- de-duplicate (an interval pair can share several buckets) and verify
  the exact overlap predicate in-row.

Completeness: two overlapping intervals share at least one point, and
that point's bucket is covered by both — so every true pair collides.
Soundness: the verification predicate.  Output is EXACT.

Scale: shuffle rows are (bucket, id, start, end) — fixed width; the
per-bucket candidate term is bounded by interval density per bucket
(the LSH-bucket analogy: a bucket with m live intervals contributes
O(m^2) candidates, which is the true output's own lower bound for that
window).  Pair generation inside a bucket uses the same O(bucket)
member re-explode + tail-slice discipline as ``dedup.lsh_candidates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_lookup(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval lookup join (``lo <= p < hi``) with the same
    grid-bucket blocking as :func:`interval_overlap_pairs` — the
    IP-to-geo / price-to-tier / timestamp-to-epoch-window shape.

    A non-equi lookup has no join key, so the naive spelling is a
    nested-loop theta join (fine only while the dimension broadcasts
    AND the per-row scan of it is cheap).  Grid blocking makes it an
    ordinary hash equi-join at ANY dimension size: each interval
    explodes to the buckets it covers, each point maps to exactly ONE
    bucket (floor(p / width)), candidates join on the bucket id and the
    exact bound predicate verifies in-row.  A point lies in one bucket
    and an interval covers that bucket at most once, so no pair ever
    duplicates — no distinct needed (unlike the overlap join).

    Returns ``points`` columns + the matching interval's columns
    (inner semantics: points outside every interval drop; intervals are
    half-open ``[lo, hi)`` and may overlap — a point then matches each
    covering interval).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    w = F.lit(bucket_width)
    iv = intervals.where(F.col(hi_col) > F.col(lo_col))
    ibuckets = iv.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor((F.col(hi_col) - 1) / w).cast("long"),
            )
        ).alias("__b"),
    )
    pb = points.withColumn("__b", F.floor(F.col(point_col) / w).cast("long"))
    return (
        pb.join(ibuckets, "__b")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__b")
    )


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Exact pairs ``(id_a < id_b, overlap)`` of half-open intervals
    ``[start, end)`` that intersect.  ``overlap`` = intersection length
    (same unit as the inputs, > 0 by construction)."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    w = F.lit(bucket_width)
    iv = df.select(
        F.struct(
            F.col(id_col).alias("id"),
            F.col(start_col).cast("long").alias("s"),
            F.col(end_col).cast("long").alias("e"),
        ).alias("m")
    ).where(F.col("m.e") > F.col("m.s"))
    buckets = iv.select(
        "m",
        F.explode(
            F.sequence(
                F.floor(F.col("m.s") / w).cast("long"),
                F.floor((F.col("m.e") - 1) / w).cast("long"),
            )
        ).alias("b"),
    )
    grouped = (
        buckets.groupBy("b")
        .agg(F.array_sort(F.collect_list("m")).alias("ms"))
        .where(F.size("ms") >= 2)
    )
    members = grouped.select("ms", F.posexplode("ms").alias("i", "a"))
    pairs = members.select(
        "a",
        F.explode(F.slice(F.col("ms"), F.col("i") + F.lit(2), F.size("ms"))).alias("x"),
    )
    overlap = F.least(F.col("a.e"), F.col("x.e")) - F.greatest(
        F.col("a.s"), F.col("x.s")
    )
    return (
        pairs.where(overlap > 0)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("x.id").alias("id_b"),
            overlap.alias("overlap"),
        )
        .distinct()
    )
