"""Round-4 similarity operators: PassJoin edit-distance join and
SimHash bit-band near-dup — both EXACT (blocking is provably complete,
verification makes it sound), so each is tested against the brute
force it claims to equal."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm_changesets_to_parquet_spark.operators import dedup as D
from osm_changesets_to_parquet_spark.operators.editdist import edit_distance_pairs


def _brute_ed(rows, k):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa), (ib, sb) = rows[i], rows[j]
            d = lev(sa, sb)
            if d <= k:
                a, b = sorted((ia, ib))
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_edit_distance_pairs_equals_brute_force(spark, k):
    rng = random.Random(42)
    alphabet = "abcd"
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12))) for _ in range(60)]
    # salt in guaranteed near-neighbours: substitution, insertion, deletion
    mutated = []
    for s in base[:20]:
        i = rng.randrange(len(s))
        mutated.append(s[:i] + rng.choice(alphabet) + s[i + 1 :])  # sub
        mutated.append(s[:i] + rng.choice(alphabet) + s[i:])  # ins
        if len(s) > 3:
            mutated.append(s[:i] + s[i + 1 :])  # del
    strings = base + mutated
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", "id", k=k).collect()
    }
    assert got == _brute_ed(rows, k)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_edit_distance_pairs_short_strings(spark, k):
    # strings of length <= k exercise the zero-width-segment path: the
    # pigeonhole "untouched segment" can be the EMPTY segment, which the
    # pre-fix blocking silently dropped (['a','b'] at k=1, ['ab','cd']
    # at k=2, ['','a'] at k=1 all have true pairs with no candidates)
    strings = ["", "a", "b", "ab", "cd", "z", "abc", "abcd", "xyz"]
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, ["id", "s"])
    for strip in (True, False):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(
                df, "s", "id", k=k, strip_common_affixes=strip
            ).collect()
        }
        assert got == _brute_ed(rows, k), (k, strip)


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_edit_distance_pairs_id_corpus_orientation(spark, k):
    # zero-padded sequential IDs are the degenerate shape the
    # orientation probe exists for: after affix stripping the HEAD
    # (leading digits) is near-constant and the TAIL uniform, so the
    # operator blocks on the reversed remainders — exact either way
    # (ed(s,t) = ed(rev s, rev t)); this pins the flipped path against
    # brute force, and the suffix-degenerate mirror (reversed IDs)
    # pins the not-flipped path.
    strings = [f"Customer#{i:09d}" for i in range(0, 400, 3)]
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", "id", k=k).collect()
    }
    assert got == _brute_ed(rows, k)

    rrows = [(i, s[::-1]) for i, s in enumerate(strings)]
    rdf = spark.createDataFrame(rrows, ["id", "s"])
    rgot = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(rdf, "s", "id", k=k).collect()
    }
    assert rgot == _brute_ed(rrows, k)
    # reversal preserves every pairwise distance, so both corpora have
    # the same pair set — a cheap cross-check of the lemma itself
    assert rgot == got


def test_edit_distance_pairs_rejects_k0(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "s", "id", k=0)


def test_simhash_neardup_equals_brute_force(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_neardup_pairs(docs, max_hamming=2, n_bands=3).collect()
    }
    sh = D.simhash(docs).select("doc_id", "simhash")
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.id_a, r.id_b, r.h)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"),
        )
        .where(F.col("h") <= 2)
        .collect()
    }
    assert got == brute
    assert brute, "fixture corpus should contain hamming<=2 pairs"


def test_hamming_pairs_from_fingerprints_direct(spark):
    # the fingerprint-level half of simhash_neardup_pairs, used by q117
    # after contracting docs to distinct simhashes: brute-force parity
    # on handcrafted 30-bit fingerprints covering hamming 0 (distinct
    # ids, equal fingerprint), 1, 2 (kept) and 3 (dropped)
    fps = [
        (1, 0b101010101010101010101010101010),
        (2, 0b101010101010101010101010101010),  # ham 0 vs 1
        (3, 0b101010101010101010101010101011),  # ham 1 vs 1/2
        (4, 0b101010101010101010101010101000),  # ham 1 vs 1/2, ham 2 vs 3
        (5, 0b010101010101010101010101010101),  # far from everything
        (6, 0b101010101010101010101010010110),  # ham 4 vs 1 — dropped
    ]
    df = spark.createDataFrame(fps, ["doc_id", "simhash"])
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_pairs_from_fingerprints(
            df, max_hamming=2, n_bands=3
        ).collect()
    }
    brute = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            (ia, fa), (ib, fb) = fps[i], fps[j]
            h = bin(fa ^ fb).count("1")
            if h <= 2:
                brute.add((min(ia, ib), max(ia, ib), h))
    assert got == brute
    assert {(1, 2, 0), (1, 3, 1), (2, 3, 1)} <= brute  # fixture sanity
    with pytest.raises(ValueError):
        D.hamming_pairs_from_fingerprints(df, max_hamming=3, n_bands=3)


def test_simhash_neardup_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        D.simhash_neardup_pairs(df, max_hamming=3, n_bands=3)
    with pytest.raises(ValueError):
        D.simhash_neardup_pairs(df, n_bands=7)  # 30 % 7 != 0


def test_simhash_neardup_max_bucket_drops_hot_bucket(spark):
    # 40 identical docs => one all-identical bucket of 40 in every band;
    # max_bucket=10 must drop it entirely
    rows = [(i, "the same boilerplate text") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.simhash_neardup_pairs(df, max_hamming=2, n_bands=3, max_bucket=10)
    assert out.count() == 0


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_edit_distance_affix_stripping_equals_unstripped(spark):
    # template corpus: constant prefix AND suffix around a variable core;
    # stripped and unstripped spellings must produce identical pairs
    rows = [(i, f"ITEM-{i:04d}-END") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "s"])
    stripped = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", "id", k=1).collect()
    }
    plain = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(
            df, "s", "id", k=1, strip_common_affixes=False
        ).collect()
    }
    assert stripped == plain
    assert stripped  # 0001/0002-style substitution neighbours exist


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_edit_distance_affix_floor_keeps_remainder_blockable(spark):
    # near-total overlap: strings are prefix+suffix plus <= 1 middle char;
    # the k+1 remainder floor must keep blocking valid (no empty segments)
    rows = [(0, "abcXdef"), (1, "abcYdef"), (2, "abcdef"), (3, "abcdef")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, "s", "id", k=1).collect()
    }
    assert got == _brute_ed(rows, 1)
