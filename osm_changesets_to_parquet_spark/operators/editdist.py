"""Edit-distance similarity self-join with PassJoin segment blocking.

Brute force is O(n^2) levenshtein calls — unusable beyond ~10^5 rows.
The PassJoin family (Li, Deng, Feng — "PASS-JOIN: a partition-based
method for similarity joins", PVLDB 2011; public algorithm) gives an
EXACT result at near-linear candidate cost:

pigeonhole lemma: partition string ``s`` into ``k+1`` contiguous
segments; if ``ed(s, t) <= k`` then at least one segment of ``s`` is
untouched by the optimal edit script and therefore occurs VERBATIM in
``t``, at a start position shifted by at most ``k``.

So the plan is:
- index side: each string emits its own ``k+1`` segments
  ``(len, seg_idx, content)``;
- probe side: each string emits, for every hypothesised partner length
  ``l`` in ``[len-k, len+k]`` and every segment of the length-``l``
  partition scheme, its substrings at start positions within ``+-k`` of
  the segment's home position;
- equi-join on ``(l, seg_idx, content)`` — an ordinary hash/sort-merge
  join on short substring keys, NOT a cross join;
- canonicalise ``id_a < id_b``, distinct, verify with the built-in
  (JVM, codegen) ``levenshtein``.

Completeness is the pigeonhole lemma; soundness is the verification —
the output equals brute force (the q112 oracle IS the brute force).

Scale: per row the index side is ``k+1`` rows and the probe side at
most ``(2k+1)^2 (k+1)`` rows — constants, so candidate generation is
one linear explode + one equi-join shuffle keyed on (length, segment,
substring).  Short entity strings ride the shuffle directly; for long
strings carry only ids and join the text back for verification.

Degeneracy caveat (measured, not hypothetical): on template-ID corpora
where every string shares a constant prefix spanning a whole segment
(TPC-H's ``Customer#000000001``), that segment's join key takes ONE
value and the candidate set degenerates to near-all-pairs — the
blocking is still EXACT, just no longer sub-quadratic on that data.
This mirrors LSH's hot-bucket problem but CANNOT be fixed with a
max-bucket valve without losing completeness; the 100 TB remedy is to
strip the shared template upstream (block on the variable remainder)
or to accept the quadratic candidate stream for the affected template
group only (all other length-groups stay cheap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scheme(l: Column, j: int, k: int) -> tuple[Column, Column]:
    """(start0, seglen) of segment ``j`` in the k+1-partition of a
    length-``l`` string: the first ``k+1-r`` segments get ``q = l div
    (k+1)`` chars, the last ``r = l mod (k+1)`` get ``q+1`` (0-based
    start).  Pure integer column math — identical on index and probe
    sides by construction."""
    q = F.floor(l / F.lit(k + 1)).cast("int")
    r = (l % F.lit(k + 1)).cast("int")
    n_short = F.lit(k + 1) - r  # segments of length q before the q+1 run
    start = F.lit(j) * q + F.greatest(F.lit(0), F.lit(j) - n_short)
    seglen = q + F.when(F.lit(j) >= n_short, F.lit(1)).otherwise(F.lit(0))
    return start, seglen


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """Exact pairs ``(id_a < id_b, dist)`` with ``levenshtein <= k``."""
    if k < 1:
        raise ValueError("k must be >= 1 (k=0 is exact dedup — hash-groupBy)")
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("n"),
    ).where(F.col(str_col).isNotNull())

    # index side: own segments under scheme(n)
    idx_entries = []
    for j in range(k + 1):
        st, ln = _scheme(F.col("n"), j, k)
        idx_entries.append(
            F.struct(
                F.col("n").alias("l"),
                F.lit(j).alias("j"),
                F.substring(F.col("s"), st + F.lit(1), ln).alias("seg"),
            )
        )
    index = base.select(
        F.col("id").alias("id_a"),
        F.col("s").alias("s_a"),
        F.explode(F.array(*idx_entries)).alias("e"),
    ).select("id_a", "s_a", "e.l", "e.j", "e.seg")

    # probe side: substrings at +-k around each segment's home position,
    # for every partner length l in [n-k, n+k]
    probe_entries = []
    for dl in range(-k, k + 1):
        l = F.col("n") + F.lit(dl)
        for j in range(k + 1):
            st, ln = _scheme(l, j, k)
            for shift in range(-k, k + 1):
                p = st + F.lit(shift)
                valid = (
                    (l >= F.lit(1))
                    & (p >= F.lit(0))
                    & (p + ln <= F.col("n"))
                    & (ln >= F.lit(1))
                )
                probe_entries.append(
                    F.when(
                        valid,
                        F.struct(
                            l.alias("l"),
                            F.lit(j).alias("j"),
                            F.substring(F.col("s"), p + F.lit(1), ln).alias("seg"),
                        ),
                    )
                )
    probe = base.select(
        F.col("id").alias("id_b"),
        F.col("s").alias("s_b"),
        F.explode(
            F.filter(F.array(*probe_entries), lambda x: x.isNotNull())
        ).alias("e"),
    ).select("id_b", "s_b", "e.l", "e.j", "e.seg")

    cand = (
        index.join(probe, ["l", "j", "seg"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("ca"),
            F.greatest("id_a", "id_b").alias("cb"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_a")).otherwise(F.col("s_b")).alias("sa"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_b")).otherwise(F.col("s_a")).alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb"))
        .where(F.col("dist") <= F.lit(k))
        .select(F.col("ca").alias("id_a"), F.col("cb").alias("id_b"), "dist")
    )
