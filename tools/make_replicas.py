"""Build N-times replica corpora under /tmp for scale testing.

Usage::

    python tools/make_replicas.py [factor] [out_dir] [kind]

``kind`` selects which table scales (everything else copies as-is):
``docs`` (default) scales documents; ``graph`` scales lineitem with
both keys shifted (disjoint co-purchase graph copies — the q218 /
round-9 iterative-graph fixture); ``ann`` scales embeddings with
shifted vec_ids; ``events`` scales events with shifted user/event ids
via duckdb COPY (preserving the fixtures' exact ``ts`` annotation,
INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) — verified post-write).

The default docs mode duplicates /root/testdata/sf0.1 ``factor`` times
with shifted doc ids.
25% of documents keep their literal text in every replica (exact
duplicate groups of size ``factor`` — the boilerplate-heavy web-corpus
shape that stresses dedup operators); the rest get a per-replica tag
token appended (near-duplicates of each other at 3-gram Jaccard ~0.9).
The non-document tables are copied as-is.

These fixtures back the SURVEY §8 replica-scaling measurements (q34 /
q35b / q68 / q68b / q86 / q97); regenerate them after any testdata
refresh, then re-run the timing block in SURVEY §8.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm_changesets_to_parquet_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"


def build(factor: int, out: str) -> None:
    spark = get_spark(
        "make-replicas", extra_conf={"spark.sql.shuffle.partitions": "32"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        print(f"{out} already built")
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(BASE + "/documents.parquet")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = []
    for i in range(factor):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.when(
                    (F.col("doc_id") % 4 == 0) | (F.lit(i) == 0), F.col("text")
                )
                .otherwise(F.concat(F.col("text"), F.lit(f" rep{i}")))
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    alld = reps[0]
    for r in reps[1:]:
        alld = alld.unionByName(r)
    alld.repartition(max(4, factor)).write.mode("overwrite").parquet(
        out + "/documents.parquet"
    )
    _copy_rest(out, "documents")
    open(done, "w").close()
    print(f"built {out}: {spark.read.parquet(out + '/documents.parquet').count()} docs")


def _copy_rest(out: str, scaled: str) -> None:
    # enumerate BASE at runtime (ADVICE r09): a hard-coded table list
    # would silently omit any fixture table a future round adds, and
    # queries over the replica dir would fail without an obvious cause
    import glob

    for src in sorted(glob.glob(f"{BASE}/*.parquet")):
        t = os.path.basename(src)[: -len(".parquet")]
        if t == scaled:
            continue
        dst = f"{out}/{t}.parquet"
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)


def build_graph(factor: int, out: str) -> None:
    """lineitem x factor with BOTH keys shifted — `factor` disjoint copies
    of the co-purchase graph (the q218/round-9 iterative-graph fixture)."""
    spark = get_spark("make-replicas", extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(os.path.join(out, "_DONE")):
        print(f"{out} already built")
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    li = spark.read.parquet(BASE + "/lineitem.parquet")
    mo = li.agg(F.max("l_orderkey")).first()[0] + 1
    mp = li.agg(F.max("l_partkey")).first()[0] + 1
    reps = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * mo))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * mp))
        for i in range(factor)
    ]
    alld = reps[0]
    for r in reps[1:]:
        alld = alld.unionByName(r)
    alld.write.mode("overwrite").parquet(out + "/lineitem.parquet")
    _copy_rest(out, "lineitem")
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"built {out}")


def build_ann(factor: int, out: str) -> None:
    """embeddings x factor with shifted vec_ids (round-9 ANN fixture)."""
    spark = get_spark("make-replicas", extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(os.path.join(out, "_DONE")):
        print(f"{out} already built")
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    emb = spark.read.parquet(BASE + "/embeddings.parquet")
    mv = emb.agg(F.max("vec_id")).first()[0] + 1
    reps = [emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * mv)) for i in range(factor)]
    alld = reps[0]
    for r in reps[1:]:
        alld = alld.unionByName(r)
    alld.write.mode("overwrite").parquet(out + "/embeddings.parquet")
    _copy_rest(out, "embeddings")
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"built {out}")


def build_events(factor: int, out: str) -> None:
    """events x factor with shifted user/event ids (round-9 behavioral
    fixture).  Replicated via duckdb COPY, NOT a Spark write: the driver
    fixtures' ``ts`` is INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (verified via parquet_schema on sf0.001/0.01/0.1, ADVICE r09 — NOT
    nanos as earlier rounds' docs claimed), and the engine's
    ``catalog.load_table`` casts that NTZ column to instant-semantics
    TIMESTAMP, so a load-then-write round-trip would flip the
    isAdjustedToUTC annotation.  DuckDB COPY reproduces the annotation
    byte-for-byte; the builder asserts it post-write below."""
    import duckdb

    if os.path.exists(os.path.join(out, "_DONE")):
        print(f"{out} already built")
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = f"{BASE}/events.parquet"
    mu = con.sql(f"SELECT MAX(user_id)+1 FROM read_parquet('{src}')").fetchone()[0]
    me = con.sql(f"SELECT MAX(event_id)+1 FROM read_parquet('{src}')").fetchone()[0]
    con.sql(
        f"""COPY (
              SELECT e.event_id + g.i * {me} AS event_id, e.ts,
                     e.user_id + g.i * {mu} AS user_id,
                     e.event_type, e.value, e.props
              FROM read_parquet('{src}') e CROSS JOIN range({factor}) g(i)
            ) TO '{out}/events.parquet' (FORMAT PARQUET, CODEC SNAPPY)"""
    )
    # verify the replica's ts annotation matches the source fixture
    import pyarrow.parquet as pq

    want = str(pq.read_schema(src).field("ts").type)
    got = str(pq.read_schema(f"{out}/events.parquet").field("ts").type)
    assert got == want == "timestamp[us]", f"ts annotation drift: {got} != {want}"
    _copy_rest(out, "events")
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"built {out}")


def build_customer(factor: int, out: str) -> None:
    """customer x factor with shifted keys AND names regenerated to the
    TPC-H template for the new key (``Customer#%09d``) — the round-10
    edit-distance fixture.  Shifting only the key would leave `factor`
    exact copies of every name (pairs at distance 0, a different
    problem); regenerating keeps the corpus exactly ID-shaped, i.e. the
    documented PassJoin adversarial case (zero-padded sequential IDs),
    at `factor`x the ID density."""
    spark = get_spark("make-replicas", extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(os.path.join(out, "_DONE")):
        print(f"{out} already built")
        return
    # read + probe BEFORE rmtree (ADVICE r10): an empty base table must
    # fail with a clear message, not a TypeError after the prior output
    # was already deleted
    cust = spark.read.parquet(BASE + "/customer.parquet")
    max_key = cust.agg(F.max("c_custkey")).first()[0]
    if max_key is None:
        raise SystemExit(f"{BASE}/customer.parquet is empty — nothing to replicate")
    mc = max_key + 1
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    reps = [
        cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * mc)).withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        )
        for i in range(factor)
    ]
    alld = reps[0]
    for r in reps[1:]:
        alld = alld.unionByName(r)
    alld.write.mode("overwrite").parquet(out + "/customer.parquet")
    _copy_rest(out, "customer")
    open(os.path.join(out, "_DONE"), "w").close()
    print(f"built {out}")


if __name__ == "__main__":
    # usage: make_replicas.py [factor] [out_dir]
    #        [kind: docs|graph|ann|events|customer]
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/replicas_{factor}x"
    kind = sys.argv[3] if len(sys.argv) > 3 else "docs"
    {
        "docs": build,
        "graph": build_graph,
        "ann": build_ann,
        "events": build_events,
        "customer": build_customer,
    }[kind](factor, out)
