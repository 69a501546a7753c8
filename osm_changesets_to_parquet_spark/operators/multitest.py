"""Multiple-testing control operators (Benjamini-Hochberg step-up).

No reference-engine counterpart (/root/reference/src/main.rs is an
ingest converter); this is SURVEY §2.C analytics surface: a screening
pipeline that fits thousands of per-cell hypothesis tests wants the
FDR-controlled rejection set, not raw p-values.

Scale contract: the step-up runs on the POST-AGGREGATION frame (one
row per hypothesis/cell), which is orders of magnitude smaller than
the fact table — the unpartitioned rank/max windows here are bounded
by |hypotheses|, the documented house exception to the no-global-
window rule. For |hypotheses| beyond driver-window comfort (~1e7),
respell the rank via operators/packing.global_rank (range-bucketed)
— the comparison and max-k logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bh_stepup(
    hyps: DataFrame,
    p_col: str,
    alpha: float,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Benjamini-Hochberg step-up over one row per hypothesis.

    Orders by (p, *tie_cols) ascending, finds the largest rank k with
    p_k * m <= alpha * k, and marks rows with rank <= k as
    ``rejected``.  Equal p-values are ordered deterministically by
    ``tie_cols``; because equal p's are adjacent, the rejected set is
    tie-consistent (if any copy of a tied p passes, all
    smaller-ranked copies are <= k too).

    Adds columns: ``rn`` (1-based rank), ``m`` (hypothesis count),
    ``rejected`` (boolean).  All comparisons are on raw doubles —
    callers must supply an engine-deterministic ``p_col`` (rational
    surrogates or integer-derived statistics, not libm CDF tails).
    """
    order: list[Column] = [F.col(p_col).asc()]
    order += [F.col(c).asc() for c in tie_cols]
    w_rank = Window.orderBy(*order)
    whole = Window.partitionBy().orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = hyps.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(whole)
    )
    k = ranked.withColumn(
        "kmax",
        F.max(
            F.when(
                F.col(p_col) * F.col("m") <= F.lit(alpha) * F.col("rn"),
                F.col("rn"),
            ).otherwise(0)
        ).over(whole),
    )
    return k.withColumn("rejected", F.col("rn") <= F.col("kmax")).drop("kmax")


def holm_stepdown(
    hyps: DataFrame,
    p_col: str,
    alpha: float,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Holm step-down (FWER control) over one row per hypothesis.

    Orders by (p, *tie_cols) ascending and rejects the maximal PREFIX
    of ranks whose every member satisfies p_(i) <= alpha / (m - i + 1)
    — equivalently, everything strictly before the FIRST unmet
    threshold (Holm 1979).  Because the thresholds tighten as rank
    grows while p grows too, the reject set is always a subset of
    bh_stepup's at the same alpha (FWER <= FDR rejection power) —
    asserted by tests, not assumed.

    Adds columns: ``rn`` (1-based rank), ``m`` (hypothesis count),
    ``rejected`` (boolean).  Same scale contract as ``bh_stepup``:
    runs on the post-aggregation one-row-per-hypothesis frame, where
    the unpartitioned windows are bounded by |hypotheses|.
    """
    order: list[Column] = [F.col(p_col).asc()]
    order += [F.col(c).asc() for c in tie_cols]
    w_rank = Window.orderBy(*order)
    whole = Window.partitionBy().orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = hyps.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(whole)
    )
    # first rank whose Holm threshold is unmet; everything before it
    # is rejected (NULL => all met => reject everything)
    kfirst = F.min(
        F.when(
            F.col(p_col) * (F.col("m") - F.col("rn") + 1) > F.lit(alpha),
            F.col("rn"),
        )
    ).over(whole)
    k = ranked.withColumn("kfirst", kfirst)
    return k.withColumn(
        "rejected",
        F.col("rn") < F.coalesce(F.col("kfirst"), F.col("m") + 1),
    ).drop("kfirst")
