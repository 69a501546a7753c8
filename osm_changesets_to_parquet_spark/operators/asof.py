"""As-of join (nearest-prior / nearest-next match), Spark-first.

Spark has no native ASOF JOIN (DuckDB does; the oracle for q18 uses a
correlated subquery instead so tie semantics are explicit).  The classic
scalable spelling is union + running ``last`` over a window:

1. tag left rows side=0 and right rows side=1, union by name;
2. sort each ``by``-partition by ``(on, side, tie_break)``;
3. every left row's match is ``last(value, ignorenulls=true)`` over the
   frame up to the current row.

Cost: ONE shuffle on ``by`` and a linear scan — no row explosion, no
range-band blowup, independent of right-side density.  This is the plan
a 100 TB as-of needs: a band join (`t BETWEEN t-X AND t`) multiplies
rows before aggregating; this never materializes more than the union.

Strictness: with ``strict=True`` a right row at exactly the same ``on``
value as a left row is NOT a match (side=0 sorts before side=1 at equal
``on``); with ``strict=False`` it is (right sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str],
    strict: bool = False,
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Attach, to every left row, ``value_cols`` from the nearest right row.

    ``on``: ordering column present in both frames (use integer epoch
    micros for timestamps — never raw timestamps across engines).
    ``by``: equality key(s); the only shuffle is on these.
    ``tie_break``: column of ``right`` that totally orders right rows at
    equal ``on``; the greatest wins in BOTH directions (backward: ``last``
    over an ascending tie order; forward: ``first`` over a descending one).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # side ordering encodes strictness (see module docstring)
    if direction == "backward":
        left_side, right_side = (0, 1) if strict else (1, 0)
    else:
        left_side, right_side = (1, 0) if strict else (0, 1)

    lt = left.withColumn(_SIDE, F.lit(left_side))
    rt = right.select(*by_cols, on, *value_cols).withColumn(_SIDE, F.lit(right_side))
    u = lt.unionByName(rt, allowMissingColumns=True)

    order = [F.col(on).asc(), F.col(_SIDE).asc()]
    if tie_break is not None:
        order.append(
            F.col(tie_break).asc() if direction == "backward" else F.col(tie_break).desc()
        )
    w = Window.partitionBy(*by_cols).orderBy(*order)
    if direction == "backward":
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731

    matched = u.select(
        "*", *[pick(v).over(w).alias(f"__m_{v}") for v in value_cols]
    )
    out = matched.where(F.col(_SIDE) == left_side)
    for v in value_cols:
        out = out.drop(v).withColumnRenamed(f"__m_{v}", v)
    return out.drop(_SIDE)
