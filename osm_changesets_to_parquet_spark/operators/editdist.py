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
  partition scheme, its substrings at the multi-match-aware start
  positions (the paper's tight shift bounds — at most ``j`` ops can
  shift the match before segment ``j`` and ``k-j`` after, with the
  length difference fixing the net budget), O(k^2) substrings total
  instead of the naive ``(2k+1)^2 (k+1)``;
- equi-join on ``(l, seg_idx, content)`` — an ordinary hash/sort-merge
  join on short substring keys, NOT a cross join;
- canonicalise ``id_a < id_b``, distinct, verify with the built-in
  (JVM, codegen) ``levenshtein``.

Completeness is the pigeonhole lemma; soundness is the verification —
the output equals brute force (the q112 oracle IS the brute force).
Strings of length <= k have zero-width segments in some partition
schemes, and the "untouched segment" can be exactly the empty one —
those rows ride a dedicated empty-seg key (l, j, ""), still an
equi-join (the bucket holds only the length <= k strings), so the
operator is exact on 0/1/2-char corpora too.

Scale: per row the index side is ``k+1`` rows and the probe side at
most O(k^2) rows (6 at k=1, 19 at k=2 — the multi-match-aware
selection) — constants, so candidate generation is one linear explode
+ one equi-join shuffle keyed on (length, segment, substring).  Short entity strings ride the shuffle directly; for long
strings carry only ids and join the text back for verification.

Degeneracy caveat (measured, not hypothetical): on template-ID corpora
where every string shares a constant prefix spanning a whole segment
(TPC-H's ``Customer#000000001``), that segment's join key takes ONE
value and the candidate set degenerates to near-all-pairs — the
blocking stays EXACT, just no longer sub-quadratic.  This mirrors
LSH's hot-bucket problem but CANNOT be fixed with a max-bucket valve
without losing completeness.  Two exact mitigations are implemented
(both on by default under ``strip_common_affixes``): (1) the
corpus-wide common prefix/suffix is removed before blocking — exact
by the affix lemma ``ed(P·u·S, P·v·S) = ed(u, v)`` — collapsing the
constant template out of the segment keys; (2) the blocking
ORIENTATION is chosen data-driven — ``ed(s,t) = ed(rev s, rev t)``,
so when the stripped remainders' TAIL keys are richer than their
HEAD keys (zero-padded sequential IDs: leading digits near-constant,
trailing digits uniform) the whole pipeline runs on the reversed
remainders, spreading the hot head bucket across the high-entropy
end (sf0.1 customer names: raw candidates 18.4M -> 6.3M, identical
pair set; with the verify-before-distinct plan below, end-to-end
8.7 -> ~5 s warm).
Residually adversarial corpora (constant in the middle, e.g.
``<rand><template><rand>``) can still see candidate streams between
O(n) and O(n^2); the blocking stays exact there, just not
sub-quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.catalog import fan_out


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


def _common_affix_lengths(
    df: DataFrame, str_col: str, k: int
) -> tuple[int, int, int]:
    """(prefix_len, suffix_len, min_len) shared by EVERY string in the
    column, capped so every stripped remainder keeps length >= k+1
    (``min_len`` is the pre-strip minimum length, 0 on empty input —
    the orientation probe sizes its key width from it).

    The common prefix of a set equals the common prefix of its
    lexicographic min and max, so one tiny min/max aggregate (map-side
    partials, two short strings to the driver) suffices; the common
    suffix is the same trick on the reversed strings.  The >= k+1
    remainder floor keeps the segment scheme valid for every row
    (every segment stays >= 1 char), so the blocking path needs no
    empty/short special case — stripping LESS than the true common
    affix is always still exact."""
    row = df.agg(
        F.min(str_col).alias("lo"),
        F.max(str_col).alias("hi"),
        F.min(F.reverse(F.col(str_col))).alias("rlo"),
        F.max(F.reverse(F.col(str_col))).alias("rhi"),
        F.min(F.length(str_col)).alias("minlen"),
    ).first()
    if row is None or row.lo is None:
        return 0, 0, 0

    def lcp(a: str, b: str) -> int:
        i = 0
        while i < min(len(a), len(b)) and a[i] == b[i]:
            i += 1
        return i

    avail = row.minlen - (k + 1)
    if avail <= 0:
        return 0, 0, row.minlen
    p = min(lcp(row.lo, row.hi), avail)
    q = min(lcp(row.rlo, row.rhi), avail - p)
    return p, q, row.minlen


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str,
    k: int = 1,
    strip_common_affixes: bool = True,
) -> DataFrame:
    """Exact pairs ``(id_a < id_b, dist)`` with ``levenshtein <= k``.

    ``strip_common_affixes`` (default on) removes the corpus-wide
    common prefix and suffix before blocking — EXACT by the standard
    lemma ``ed(P·u·S, P·v·S) = ed(u, v)`` (a shared prefix/suffix can
    always be aligned to itself in an optimal script).  This is the
    template-ID mitigation from the module docstring: on
    ``Customer#000000001``-style corpora the constant template spans a
    whole segment, which otherwise degenerates the blocking to
    near-all-pairs; stripping it re-sparsifies the segment keys.

    When stripping is on, the operator also picks a BLOCKING
    ORIENTATION: ``ed(s, t) = ed(reverse(s), reverse(t))`` (reversing
    both strings reverses the optimal edit script), so the whole
    pipeline — segments, probes, verification — may equivalently run
    on the reversed remainders, and the output pair set is identical
    either way.  Orientation only changes PERFORMANCE: zero-padded
    sequential IDs survive affix stripping with a near-constant
    low-entropy HEAD (the leading digits) and a high-entropy TAIL, so
    forward segment-0 keys collapse into a handful of hot buckets
    while reversed keys spread uniformly (measured on sf0.1 customer
    names: 2.9x fewer raw candidates, byte-identical pairs).  The choice
    is data-driven — one ``approx_count_distinct`` aggregate compares
    head-vs-tail key cardinality at the first segment's width and
    reverses only when the tail is STRICTLY richer (HLL sketches are
    merge-order independent, so the choice is deterministic; and
    because both orientations are exact, even a bad choice can only
    cost time, never rows).

    Costs at most two tiny aggregates at operator construction — the
    affix-length probe, plus the orientation probe ONLY when an affix
    was actually stripped (p == q == 0 skips it; the low-entropy-head
    shape it detects is a product of stripping).  Known trade-off
    (ADVICE r11): a corpus with two or more template FAMILIES has
    low-entropy per-family heads but no corpus-wide common affix, so
    p == q == 0 skips the probe and such corpora keep the forward
    orientation even when reversal would spread segment-0 keys better.
    That is deliberate: both orientations are exact, the cost is only
    candidate volume, and gating on the stripped-affix signal keeps
    the default plan free of speculative eager scans; if a
    multi-template corpus measurably hot-spots, run with the probe by
    splitting per family upstream.  Pass ``strip_common_affixes=False``
    to keep the plan fully action-free."""
    if k < 1:
        raise ValueError("k must be >= 1 (k=0 is exact dedup — hash-groupBy)")
    src = df.where(F.col(str_col).isNotNull())
    s_expr = F.col(str_col)
    if strip_common_affixes:
        p, q, minlen = _common_affix_lengths(src, str_col, k)
        if p or q:
            s_expr = F.expr(
                f"substring({str_col}, {p + 1}, "
                f"greatest(0, length({str_col}) - {p + q}))"
            )
            # orientation probe: segment-0 width of the SHORTEST
            # remainder (every scheme's segment 0 is >= this wide, so
            # it is the most collision-prone key prefix the join will
            # see).  Only worth running when something WAS stripped —
            # the low-entropy-head shape the probe detects is produced
            # by affix stripping (ADVICE r10: with p == q == 0 the
            # probe was two eager scans buying nothing).
            w = max(1, (minlen - p - q) // (k + 1))
            card = src.agg(
                F.approx_count_distinct(F.substring(s_expr, 1, w)).alias("head"),
                F.approx_count_distinct(
                    F.substring(F.reverse(s_expr), 1, w)
                ).alias("tail"),
            ).first()
            if card is not None and (card.tail or 0) > (card.head or 0):
                s_expr = F.reverse(s_expr)
    # fan the single-row-group scan across the session's cores before
    # the segment/probe explodes (guide §2.5): the index side collapses
    # into a broadcast, so the probe-side substring generation, the
    # hash-join probe AND the banded-levenshtein verify all fuse into
    # this scan stage — measured at sf0.1 (15k customer names, 6.3M
    # candidates) the entire verify stream ran as ONE ~2.2 s task while
    # 31 cores idled
    base = fan_out(src, id_col).select(
        F.col(id_col).alias("id"),
        s_expr.alias("s"),
        F.length(s_expr).alias("n"),
    )

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

    # probe side: substrings around each segment's home position, for
    # every partner length l in [n-k, n+k] — with the MULTI-MATCH-AWARE
    # shift bounds (PASS-JOIN paper §4, Lemma 3: substring selection is
    # complete on start positions x with |x - p_i| <= i-1 AND
    # |x - p_i - delta| <= tau+1-i, delta = probe_len - partner_len).
    # In 0-based segment index j and shift = x - start_j this is
    #   max(-j, -dl-(k-j)) <= shift <= min(j, -dl+(k-j))   (dl = l - n)
    # instead of the naive |shift| <= k: at most one op can shift the
    # match point per error before (resp. after) the untouched segment,
    # and the length difference fixes the net shift budget.  At k=1
    # this is ONE shift per (dl, j) — 6 probe rows/string vs 18 naive
    # (k=2: 19 vs 75) — and each true pair is emitted by far fewer
    # duplicate candidate keys, so both the join input and the
    # levenshtein verify stream shrink ~3x with a byte-identical
    # result set (the bounds are the paper's completeness lemma;
    # soundness is unchanged — every candidate is still verified).
    probe_entries = []
    for dl in range(-k, k + 1):
        l = F.col("n") + F.lit(dl)
        for j in range(k + 1):
            st, ln = _scheme(l, j, k)
            shift_lo = max(-j, -dl - (k - j))
            shift_hi = min(j, -dl + (k - j))
            for shift in range(shift_lo, shift_hi + 1):
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
            # short-string completeness: when the length-l scheme gives
            # segment j ZERO width (only possible for l <= k), the
            # pigeonhole "untouched segment" can be exactly that empty
            # segment, and an empty string occurs in ANY partner — so
            # emit one empty-seg probe entry for (l, j).  The index side
            # never filters empty segments, so candidates stay a keyed
            # equi-join on (l, j, ""): the bucket holds only the <= k /
            # <= 2k length strings (empty by definition on non-degenerate
            # corpora), never a cross join.  Without this, true pairs
            # like ('a','b') at k=1 were silently dropped.
            probe_entries.append(
                F.when(
                    (l >= F.lit(0)) & (ln == F.lit(0)),
                    F.struct(
                        l.alias("l"), F.lit(j).alias("j"), F.lit("").alias("seg")
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

    # Verify BEFORE the distinct, with the banded levenshtein
    # (threshold=k => O(k*len) per pair, -1 when the distance exceeds
    # k).  A candidate pair is emitted once per shared segment key (up
    # to (k+1)(2k+1) times), so deduping first looks natural — but the
    # dedup is a SHUFFLE over the whole candidate stream carrying both
    # strings, while verification is codegen'd stream-side work that
    # kills ~97% of candidates on degenerate corpora (sf0.1 customer
    # names: 6.3M raw candidates -> 262.5k true pairs; the old
    # distinct-first plan shuffled 4.3M string-carrying rows).  After
    # the filter, the distinct shuffles only true pairs as three
    # integers.  levenshtein is symmetric, so the canonical (least,
    # greatest) projection needs no string swap.
    return (
        index.join(probe, ["l", "j", "seg"])
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn("dist", F.levenshtein("s_a", "s_b", k))
        .where(F.col("dist") >= 0)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "dist",
        )
        .distinct()
    )
