"""Build N-times replica corpora under /tmp for scale testing.

Usage::

    python tools/make_replicas.py [factor] [out_dir]

Duplicates /root/testdata/sf0.1 ``factor`` times with shifted doc ids.
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
    for t in (
        "orders customer events lineitem part supplier nation region embeddings"
    ).split():
        src, dst = f"{BASE}/{t}.parquet", f"{out}/{t}.parquet"
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
    open(done, "w").close()
    print(f"built {out}: {spark.read.parquet(out + '/documents.parquet').count()} docs")


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/replicas_{factor}x"
    build(factor, out)
