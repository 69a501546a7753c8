"""Vectorized (Arrow/NumPy) kernels for the portable text hashes.

The dedup/similarity family (MinHash-LSH, SimHash, shingle Jaccard)
is built on one *engine-portable* integer hash — a base-31 polynomial
fold over character codes mod ``HASH_MOD`` — so every operator can be
hash-matched against a DuckDB oracle running the same arithmetic.

The original spelling evaluated that fold with Spark higher-order
functions (``aggregate``/``transform`` lambdas).  HOF lambda bodies are
interpreted expression trees — they never enter whole-stage codegen —
so the per-character fold cost ~1 interpreted expression-tree walk per
character, and the MinHash/SimHash layers re-walked the token-hash
arrays 32/30 more times.  Measured at sf0.1 (5,000 docs, ~1.5 MB of
text!) the fingerprint passes alone cost seconds — orders of magnitude
off the hardware floor for hashing megabytes.

This module respells the same integer math as vectorized NumPy over
Arrow batches (guide §4.2 discipline: let Spark do distribution and
shuffles; hand whole columnar batches to native kernels).  The values
are BYTE-IDENTICAL by construction:

- tokenization is ``str.split(" ")`` == Spark ``split(col, " ")``
  (single-space regex, empty tokens preserved, ``""`` -> ``[""]``);
- character codes come from UTF-32 code points == Spark ``ascii()``
  per ``split(token, "")`` element (Java's codepoint-aware regex never
  splits surrogate pairs; the fixtures are ASCII anyway);
- every fold step is ``(acc * 31 + x) % HASH_MOD`` in int64 — exact
  (max intermediate ~2^35) — and the MinHash permutation
  ``(a*h + b) % HASH_MOD`` peaks below 2^60, inside int64.

NULL/empty semantics replicate the HOF spelling exactly:

- NULL text -> empty shingle array (ANSI ``size(NULL)`` is NULL, so
  the HOF ``when(size(th) >= n, ...)`` falls to its empty-array
  branch) / SimHash 0 (the ``when``/``otherwise`` sum collapses to 0
  on null folds);
- ``""`` text -> one empty token with hash 0;
- < n tokens -> empty shingle array;
- NULL/empty shingle array -> all-sentinel (HASH_MOD) signature.

Shipping: the pandas UDFs live at module level so closures pickle by
reference and resolve through the ``addPyFile`` package zip
(session.ship_package) on executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

HASH_MOD = 1_000_000_007
SIMHASH_BITS = 30


def _flat_token_hashes(
    texts: "pd.Series",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash every token of every row: (flat_hashes, counts, null_mask).

    ``flat_hashes`` concatenates the per-row token hash arrays;
    ``counts[i]`` is row i's token count (0 for NULL rows).
    """
    n_rows = len(texts)
    counts = np.zeros(n_rows, dtype=np.int64)
    nulls = np.zeros(n_rows, dtype=bool)
    all_tokens: list[str] = []
    for i, t in enumerate(texts):
        if t is None or (isinstance(t, float) and np.isnan(t)):
            nulls[i] = True
        else:
            tk = t.split(" ")
            counts[i] = len(tk)
            all_tokens.extend(tk)
    n_tok = len(all_tokens)
    th = np.zeros(n_tok, dtype=np.int64)
    if n_tok:
        lens = np.fromiter((len(t) for t in all_tokens), count=n_tok, dtype=np.int64)
        max_len = int(lens.max())
        if max_len:
            codes = np.frombuffer(
                "".join(all_tokens).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            offs = np.zeros(n_tok, dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            # Horner fold, position by position, over a SHRINKING index
            # of still-active tokens: total work is O(sum of lengths) =
            # O(total characters), independent of the longest token (a
            # full-width boolean mask per position would be
            # O(max_len * n_tokens) — measured 10x slower on corpora
            # with a few long unbroken tokens).
            idx = np.arange(n_tok)
            for j in range(max_len):
                idx = idx[lens[idx] > j]
                th[idx] = (th[idx] * 31 + codes[offs[idx] + j]) % HASH_MOD
    return th, counts, nulls


def _segment_starts(counts: np.ndarray) -> np.ndarray:
    starts = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=starts[1:])
    return starts


def _shingle_batch(texts: "pd.Series", n: int) -> "pd.Series":
    th, counts, nulls = _flat_token_hashes(texts)
    doc_off = _segment_starts(counts)
    s = np.maximum(counts - (n - 1), 0)
    s[nulls] = 0
    total = int(s.sum())
    if total:
        doc_idx = np.repeat(np.arange(len(counts)), s)
        first = np.repeat(np.cumsum(s) - s, s)
        within = np.arange(total, dtype=np.int64) - first
        pos = doc_off[doc_idx] + within
        acc = th[pos].copy()
        for j in range(1, n):
            acc = (acc * 31 + th[pos + j]) % HASH_MOD
    else:
        acc = np.zeros(0, dtype=np.int64)
    # NULL text -> [] (the HOF spelling's when/otherwise falls through
    # to the empty-array branch: ANSI size(NULL) is NULL, so the >= n
    # condition is never true), same as a < n-token document.
    parts = np.split(acc, np.cumsum(s)[:-1]) if len(counts) else []
    return pd.Series(list(parts), dtype=object)


def shingle_hashes_udf(n: int):
    """pandas UDF: text -> array<long> of word-``n``-gram shingle hashes
    (base-31 fold over the n token hashes — operators.dedup.shingles)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        return _shingle_batch(texts, n)

    return _shingles


@F.pandas_udf(LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """pandas UDF: text -> 30-bit SimHash (sign sums of token-hash bits
    — operators.dedup.simhash; NULL text -> 0 like the HOF spelling)."""
    th, counts, nulls = _flat_token_hashes(texts)
    n_rows = len(counts)
    fp = np.zeros(n_rows, dtype=np.int64)
    if th.size:
        starts = _segment_starts(counts)
        ends = starts + counts
        # per-document bit sums via 1-D prefix sums + boundary
        # differences, one bit at a time (np.add.reduceat along axis 0
        # of a 2-D array takes a slow per-segment path; a 2-D bit
        # matrix also triples the memory traffic)
        cs = np.zeros(th.size + 1, dtype=np.int64)
        for j in range(SIMHASH_BITS):
            np.cumsum((th >> j) & 1, out=cs[1:])
            vj = 2 * (cs[ends] - cs[starts]) - counts
            fp += np.where(vj >= 0, np.int64(1) << j, 0)
        fp[counts == 0] = 0
    return pd.Series(fp)


def minhash_sig_udf(a_consts: list[int], b_consts: list[int]):
    """pandas UDF: array<long> shingle hashes -> array<long> MinHash
    signature under ``h_j(x) = (a_j*x + b_j) % HASH_MOD`` (min per j;
    empty/NULL array -> all-HASH_MOD sentinel, as the
    ``coalesce(array_min(...), HASH_MOD)`` spelling)."""
    A = np.asarray(a_consts, dtype=np.int64)
    B = np.asarray(b_consts, dtype=np.int64)
    n_h = len(a_consts)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(arrays: pd.Series) -> pd.Series:
        n_rows = len(arrays)
        sizes = np.fromiter(
            ((0 if v is None else len(v)) for v in arrays),
            count=n_rows,
            dtype=np.int64,
        )
        out = np.full((n_rows, n_h), HASH_MOD, dtype=np.int64)
        total = int(sizes.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in arrays if v is not None and len(v)]
            )
            starts = _segment_starts(sizes)
            st = np.minimum(starts, flat.size - 1)
            nonempty = sizes > 0
            for j in range(n_h):
                v = (A[j] * flat + B[j]) % HASH_MOD
                mins = np.minimum.reduceat(v, st)
                out[nonempty, j] = mins[nonempty]
        return pd.Series(list(out), dtype=object)

    return _sig


@F.pandas_udf(LongType())
def char_hash_udf(strings: pd.Series) -> pd.Series:
    """pandas UDF: string -> base-31 polynomial char hash (the scalar
    :func:`operators.dedup.char_hash` — for per-token ROWS, e.g. the
    CMS token stream; NULL -> NULL like the HOF fold over a null
    split)."""
    n_rows = len(strings)
    vals = ["" if s is None else s for s in strings]
    lens = np.fromiter((len(s) for s in vals), count=n_rows, dtype=np.int64)
    acc = np.zeros(n_rows, dtype=np.int64)
    max_len = int(lens.max()) if n_rows else 0
    if max_len:
        codes = np.frombuffer(
            "".join(vals).encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        offs = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        for j in range(max_len):
            m = lens > j
            acc[m] = (acc[m] * 31 + codes[offs[m] + j]) % HASH_MOD
    out = pd.Series(acc, dtype="Int64")
    nulls = pd.Series([s is None for s in strings])
    return out.mask(nulls)
