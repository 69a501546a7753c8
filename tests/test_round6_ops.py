"""Round-6 operator tests: ADVICE fixes (pyds truncation guard, NULLS
FIRST contract, n_salts bool), then the round's new operators."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osm_changesets_to_parquet_spark.operators.packing import global_rank
from osm_changesets_to_parquet_spark.operators.skew import salted_join


def _write_big_element_xml(n_tags: int = 5000) -> str:
    """One small self-closing element, then one element whose <tag>
    children make it ~150 KB — so a byte-range split boundary lands
    inside it and a small overflow cannot complete it."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n',
        '  <changeset id="1" created_at="2024-01-01T00:00:00Z" open="false"'
        ' num_changes="5" comments_count="0"/>\n',
        '  <changeset id="2" created_at="2024-01-02T00:00:00Z" open="false"'
        ' user="bulk" uid="9" num_changes="1" comments_count="0">\n',
    ]
    parts.extend(
        f'    <tag k="key{i:06d}" v="value-{i:06d}-padding-padding"/>\n'
        for i in range(n_tags)
    )
    parts.append('    <tag k="comment" v="the big one"/>\n')
    parts.append("  </changeset>\n</osm>\n")
    fd, path = tempfile.mkstemp(suffix=".xml", prefix="big_element_")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    return path


def test_pyds_oversized_element_fails_loudly(spark):
    # ADVICE r5 (medium): an element spanning > overflow past its split
    # boundary must FAIL the read, not silently drop / force-close into
    # a partial row
    from osm_changesets_to_parquet_spark.sources import changesets_pyds

    changesets_pyds.register(spark)
    path = _write_big_element_xml()
    try:
        df = (
            spark.read.format("osm_changesets")
            .option("path", path)
            .option("partitions", "4")
            .option("overflow", "2048")
            .load()
        )
        with pytest.raises(Exception, match="refusing to drop|zero rows"):
            df.collect()
        # same file, overflow covering the element: complete parse, and
        # the big element's last-comment-wins description survives
        ok = (
            spark.read.format("osm_changesets")
            .option("path", path)
            .option("partitions", "4")
            .load()
        )
        rows = {r.id: r for r in ok.collect()}
        assert set(rows) == {1, 2}
        assert rows[2].description == "the big one"
    finally:
        os.unlink(path)


def test_pyds_truncated_file_fails_loudly(spark):
    # a file that simply ends mid-element (no split boundary involved)
    # must also raise, not vanish
    from osm_changesets_to_parquet_spark.sources import changesets_pyds
    from osm_changesets_to_parquet_spark.sources.fixtures import MALFORMED_XML

    changesets_pyds.register(spark)
    fd, path = tempfile.mkstemp(suffix=".xml", prefix="trunc_")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write(MALFORMED_XML)
    try:
        df = (
            spark.read.format("osm_changesets")
            .option("path", path)
            .option("partitions", "1")
            .load()
        )
        with pytest.raises(Exception, match="refusing to drop|zero rows"):
            df.collect()
    finally:
        os.unlink(path)


def test_global_rank_nulls_first(spark):
    # ADVICE r5 (low): the documented NULLS FIRST contract — null first
    # keys rank before every non-null row, matching Spark's ASC default
    df = spark.createDataFrame(
        [(None, 10), (1.0, 11), (None, 12), (3.0, 13), (2.0, 14)], "v double, id int"
    )
    got = {r.id: r.rank for r in global_rank(df, ["v", "id"], out_col="rank").collect()}
    w = Window.orderBy(F.col("v").asc_nulls_first(), "id")
    want = {
        r.id: r.rank
        for r in df.select(
            "id", F.row_number().over(w).cast("long").alias("rank")
        ).collect()
    }
    assert got == want
    assert {got[10], got[12]} == {1, 2}  # nulls first


def test_salted_join_rejects_bool_n_salts(spark):
    # ADVICE r5 (low): bool is an int subclass; n_salts=True must error
    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], n_salts=True)


def test_s13_reader_plans_multiple_partitions_per_batch(spark, sf_dir):
    # VERDICT r5 item 1: the partition-planned stream reader must map
    # one micro-batch (one chunk) to >1 InputPartitions (row groups),
    # and per-partition reads must reassemble exactly the chunk's rows
    import pyarrow.parquet as pq

    from osm_changesets_to_parquet_spark.sources.events_stream_partitioned_pyds import (
        EventsReplayPartitionedStreamReader,
    )
    from osm_changesets_to_parquet_spark.streaming.jobs import (
        prepare_partitioned_replay_dir,
    )

    base = prepare_partitioned_replay_dir(spark, sf_dir)
    reader = EventsReplayPartitionedStreamReader({"path": base})
    assert reader.initialOffset() == {"i": 0}
    # one chunk per latestOffset call — the replay determinism contract
    assert reader.latestOffset() == {"i": 1}
    assert reader.latestOffset() == {"i": 2}
    parts = reader.partitions({"i": 0}, {"i": 1})
    assert len(parts) >= 2, "a chunk must plan one partition per row group"
    # read() yields ARROW RECORD BATCHES since round 13 (columnar
    # end-to-end, no per-row pickling); the reassembly contract is the
    # same — the partitions of one chunk must cover exactly its rows
    batches = [b for p in parts for b in reader.read(p)]
    n_rows = sum(b.num_rows for b in batches)
    want = pq.read_table(
        sorted(
            f"{base}/{f}" for f in __import__("os").listdir(base)
            if f.endswith(".parquet")
        )[0]
    ).num_rows
    assert n_rows == want


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_s13_drained_counts_match_batch(spark, sf_dir):
    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.streaming import (
        run_s13_partitioned_stream_source,
    )

    got = sorted(
        (r.event_type, r.cnt)
        for r in run_s13_partitioned_stream_source(spark, sf_dir).collect()
    )
    want = sorted(
        (r.event_type, r.cnt)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt"))
        .collect()
    )
    assert got == want


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_persisted_index_probe_equals_in_session_incremental(spark, sf_dir):
    # VERDICT r5 item 2: probing the persisted banded index must return
    # exactly what the in-session incremental spelling returns
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators import dedup as D
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket("doc_id", 100)
    existing, incoming = docs.where(b < 90), docs.where(b >= 90)
    idx = tempfile.mkdtemp(prefix="lsh_idx_test_")
    D.lsh_index_write(existing, idx)
    got = sorted(
        map(
            tuple,
            D.lsh_neardup_probe_index(spark, idx, incoming, 0.6).collect(),
        )
    )
    want = sorted(
        map(tuple, D.lsh_neardup_incremental(existing, incoming, 0.6).collect())
    )
    assert got == want
    assert len(want) > 0  # fixture must actually exercise the probe


def _brute_repeated_spans(texts, k, min_span):
    # reference implementation: duplicated k-gram locations -> islands
    locs = {}
    for did, t in texts:
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            locs.setdefault(tuple(toks[p : p + k]), []).append((did, p + 1))
    dup_pos = {}
    for g, ps in locs.items():
        if len(ps) >= 2:
            for did, p in ps:
                dup_pos.setdefault(did, set()).add(p)
    out = []
    for did, ps in dup_pos.items():
        ps = sorted(ps)
        start = prev = ps[0]
        for p in ps[1:] + [None]:
            if p is None or p - prev > k:
                end = prev + k - 1
                if end - start + 1 >= min_span:
                    out.append((did, start, end, end - start + 1))
                if p is not None:
                    start = p
            if p is not None:
                prev = p
        # (loop handles flush via the None sentinel)
    return sorted(out)


def test_repeated_spans_matches_brute_force(spark):
    # VERDICT r5 item 4: property-test against a brute-force substring
    # scan — shared 12-token run between docs 1/2, an in-doc repeat in
    # doc 3, and unique text in doc 4
    from osm_changesets_to_parquet_spark.operators.dedup import repeated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    texts = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "x y z p q r s t u v w " * 3 + "tail unique words here"),
        (4, "entirely unique tokens qq ww ee rr tt yy uu ii oo pp aa ss dd"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(df, k=5, min_span=6).collect()
    )
    want = _brute_repeated_spans(texts, k=5, min_span=6)
    assert got == want
    assert any(d == 1 for d, *_ in got) and any(d == 2 for d, *_ in got)
    assert any(d == 3 for d, *_ in got)  # in-document repetition counts
    assert not any(d == 4 for d, *_ in got)


def test_bpe_merge_steps_hand_example(spark):
    # VERDICT r5 item 5: classic BPE hand example — corpus of words
    # low(x5) lower(x2) newest(x6) widest(x3); with ties broken by
    # (count DESC, l, r) the first merges are (e,s)=9, (es,t)=9, (t,</w>-less: lo)=7
    from osm_changesets_to_parquet_spark.operators.text import bpe_merge_steps

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_steps(docs, 3).orderBy("round").collect()
    ]
    # pair counts over the vocab {low:5, lower:2, newest:6, widest:3}:
    # round 1: (e,s)=9 wins over (s,t)=9 on lexicographic tie-break
    # round 2: (es,t)=9
    # round 3: (l,o)=7
    assert got == [(1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7)]


def test_bpe_merge_greedy_self_overlap(spark):
    # x x x x merges left-to-right non-overlapping: (x,x) count 3 in
    # round 1 (adjacent pairs), then round 2 sees [xx, xx]
    from osm_changesets_to_parquet_spark.operators.text import bpe_merge_steps

    docs = spark.createDataFrame([(1, "xxxx xxxx")], "doc_id long, text string")
    got = [
        (r["round"], r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_steps(docs, 2).orderBy("round").collect()
    ]
    # vocab {xxxx: 2}: (x,x) at 3 adjacent positions x 2 occurrences;
    # the merge is applied non-overlapping left-to-right -> [xx, xx]
    assert got == [(1, "x", "x", 6), (2, "xx", "xx", 2)]


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_bpe_kernel_equals_catalyst_spelling(spark, sf_dir):
    """The round-13 single-task training kernel (_bpe_rounds_kernel)
    must produce BYTE-IDENTICAL winners and encoded vocab to the
    retained per-round Catalyst chain — on the real fixture corpus
    plus the exhaustion / self-overlap / tie edge cases."""
    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators.text import _bpe_rounds

    fixture = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (90001, "xxxx xxxx"),   # self-overlapping runs
            (90002, "ab ba ab"),    # (a,b) vs (b,a) tie-breaking
            (90003, "a"),           # single-symbol word: exhausts pairs
            (90004, ""),            # empty doc
            (90005, "low lower newest widest"),
        ],
        "doc_id long, text string",
    )
    for docs, n in ((fixture, 3), (edge, 4)):
        v_new, w_new = _bpe_rounds(docs, n, "text")
        v_old, w_old = _bpe_rounds(docs, n, "text", use_kernel=False)
        assert (
            w_new.orderBy("round").collect() == w_old.orderBy("round").collect()
        )
        assert v_new.orderBy("w").collect() == v_old.orderBy("w").collect()


def test_bpe_encode_counts_hand_example(spark):
    # encode with the tokenizer the hand-example corpus trains: after
    # merges (e,s), (es,t), (l,o) the BPE lengths are
    # low -> [lo, w] = 2; lower -> [lo, w, e, r] = 4;
    # newest -> [n, e, w, est] = 4; widest -> [w, i, d, est] = 4;
    # an empty doc reports 0/0 through the left-join spine
    from osm_changesets_to_parquet_spark.operators.text import bpe_encode_counts

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame(
        [(1, text), (2, "low newest"), (3, "")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_counts(docs, 3).collect()
    }
    # doc 1: 16 words; 5*2 + 2*4 + 6*4 + 3*4 = 54 BPE tokens
    assert got == {1: (16, 54), 2: (2, 6), 3: (0, 0)}


def test_events_chunk_sink_manifest_visibility(spark, sf_dir):
    # VERDICT r5 item 6: the committed manifest, not the directory
    # listing, defines visibility — an orphan file (torn job residue)
    # must be invisible to the reader
    import json
    import shutil
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.sources import events_sink_pyds

    events_sink_pyds.register(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts_us"
    )
    n = ev.count()
    path = tempfile.mkdtemp(prefix="events_chunks_test_")
    try:
        (
            ev.repartition(3)
            .write.format("events_chunks")
            .mode("overwrite")
            .option("path", path)
            .save()
        )
        with open(f"{path}/_MANIFEST.json") as f:
            manifest = json.load(f)
        assert manifest["total_rows"] == n
        assert len(manifest["files"]) >= 2  # executor-parallel writes
        back = spark.read.format("events_chunks").option("path", path).load()
        assert back.count() == n
        # orphan a copy of a real chunk under a name the manifest lacks
        shutil.copy(
            f"{path}/{manifest['files'][0]['file']}", f"{path}/part-99999.parquet"
        )
        assert (
            spark.read.format("events_chunks").option("path", path).load().count()
            == n
        ), "orphan files outside the manifest must be invisible"
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.slow  # >8 s: full-suite gate only (pytest.ini)
def test_s14_streaming_neardup_index_append_idempotent(spark, sf_dir):
    # foreachBatch is at-least-once: a RETRIED batch must overwrite its
    # own __bid subdirectory, not double-append — index row counts are
    # unchanged after replaying the same append label
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators.dedup import (
        lsh_index_append,
        lsh_neardup_probe_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    idx = tempfile.mkdtemp(prefix="s14_idem_test_")
    lsh_index_append(half_a, idx, "__bid=0")
    n1 = spark.read.parquet(f"{idx}/bands").count()
    pairs1 = lsh_neardup_probe_index(spark, idx, half_b, threshold=0.6)
    got1 = sorted((r.new_id, r.old_id) for r in pairs1.collect())
    # retry the same batch id: same label, overwrite
    lsh_index_append(half_a, idx, "__bid=0")
    n2 = spark.read.parquet(f"{idx}/bands").count()
    pairs2 = lsh_neardup_probe_index(spark, idx, half_b, threshold=0.6)
    got2 = sorted((r.new_id, r.old_id) for r in pairs2.collect())
    assert n1 == n2 and got1 == got2
    # a second batch under a new label GROWS the index
    lsh_index_append(half_b, idx, "__bid=1")
    n3 = spark.read.parquet(f"{idx}/bands").count()
    assert n3 > n2


def test_contaminated_spans_hand_example(spark):
    # a train doc embedding an eval passage: only the copied region's
    # 5-grams hit the eval gram set, and the island reconstructs the
    # copied span's exact token bounds
    from osm_changesets_to_parquet_spark.operators.dedup import (
        contaminated_spans,
    )

    eval_text = "e1 e2 e3 e4 e5 e6 e7 e8"
    train_text = "t1 t2 t3 " + eval_text + " t4 t5 t6"  # copy at tokens 4..11
    train = spark.createDataFrame(
        [(1, train_text), (2, "clean a b c d e f g h i")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    got = [
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in contaminated_spans(train, ev, k=5, min_span=6).collect()
    ]
    # eval 5-grams are e1..e5 through e4..e8; in the train doc those
    # start at positions 4..7 -> island [4, 7+4] = tokens 4..11 (8 wide)
    assert got == [(1, 4, 11, 8)]


def test_group_token_jaccard_hand_example(spark):
    from osm_changesets_to_parquet_spark.operators.dedup import group_token_jaccard

    df = spark.createDataFrame(
        [
            ("s1", "a b c"),
            ("s1", "c d"),       # s1 tokens: {a,b,c,d}
            ("s2", "c d e"),     # s2 tokens: {c,d,e}
            ("s3", "x y"),       # s3 tokens: {x,y} — disjoint from both
        ],
        "source string, text string",
    )
    got = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.n_common, r.jaccard)
        for r in group_token_jaccard(df, "source").collect()
    }
    # zero-overlap pairs MUST appear (left join from the pair frame)
    assert got == {
        ("s1", "s2"): (4, 3, 2, round(2 / 5, 6)),
        ("s1", "s3"): (4, 2, 0, 0.0),
        ("s2", "s3"): (3, 2, 0, 0.0),
    }


def test_agg_state_merge_touches_only_delta_buckets(spark, tmp_path):
    from osm_changesets_to_parquet_spark.operators.merge import (
        agg_state_build,
        agg_state_merge,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    hist = spark.createDataFrame(
        [(k, float(10 * k + i)) for k in range(40) for i in range(3)],
        "k long, v double",
    )
    state = str(tmp_path / "state")
    agg_state_build(hist, "k", "v", state, n_buckets=16)
    # a delta confined to TWO keys — the merge must rewrite only the
    # buckets those keys hash to and leave every other bucket dir alone
    delta = spark.createDataFrame(
        [(7, 999.0), (7, 1.0), (1000, 5.0)], "k long, v double"  # 1000 = new key
    )
    tb = {
        r[0]
        for r in delta.select(hash_bucket("k", 16).alias("b")).distinct().collect()
    }
    out = str(tmp_path / "merged")
    full = agg_state_merge(spark, state, delta, "k", "v", out, n_buckets=16)
    written = {
        d.split("=")[1]
        for d in os.listdir(out)
        if d.startswith("__pb=")
    }
    assert written == {str(b) for b in tb}
    # and the state scan carries the partition filter (pruned read)
    plan = (
        spark.read.parquet(state)
        .where(F.col("__pb").isin(sorted(tb)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "__pb" in plan
    # merged numbers equal the full recompute, including the new key
    got = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in full.select("k", "n", "s", "mn", "mx").collect()
    }
    import collections

    agg = collections.defaultdict(list)
    for r in hist.collect():
        agg[r.k].append(r.v)
    for r in delta.collect():
        agg[r.k].append(r.v)
    want = {k: (len(v), sum(v), min(v), max(v)) for k, v in agg.items()}
    assert got == want


def test_rolling_median_interpolation_and_nulls(spark):
    from osm_changesets_to_parquet_spark.queries import analytics_metrics  # noqa: F401
    from osm_changesets_to_parquet_spark.queries import REGISTRY

    import datetime

    # one type, values 1..4 with a NULL in the middle; frame = 50 so
    # every row sees the whole prefix: medians over [1], [1,2] (=1.5 —
    # even-count interpolation), [1,2,NULL] (null drops), [1,2,3],
    # [1,2,3,10]
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=1), 7, "a", 2.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=2), 7, "a", None, "{}"),
        (4, t0 + datetime.timedelta(seconds=3), 7, "a", 3.0, "{}"),
        (5, t0 + datetime.timedelta(seconds=4), 7, "a", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="q157_fixture_")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r.event_id: r.roll_med
        for r in REGISTRY["q157_rolling_median"].fn(spark, d).collect()
    }
    assert out == {1: 1.0, 2: 1.5, 3: 1.5, 4: 2.0, 5: 2.5}


def test_event_transitions_hand_example(spark):
    from osm_changesets_to_parquet_spark.queries import analytics  # noqa: F401
    from osm_changesets_to_parquet_spark.queries import REGISTRY

    import datetime
    import os
    import tempfile

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, t0 + datetime.timedelta(seconds=i), u, typ, 0.0, "{}")

    # user 1: a -> b -> a ; user 2: a -> b  (chains never cross users)
    rows = [ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "a"), ev(4, 2, "a"), ev(5, 2, "b")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="q156_fixture_")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r.src, r.dst): (r.cnt, r.prob)
        for r in REGISTRY["q156_event_transitions"].fn(spark, d).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_manifest_skipping_prunes_and_stays_exact(spark, tmp_path):
    from osm_changesets_to_parquet_spark.operators.layout import (
        manifest_pruned_read,
        manifest_write,
    )

    df = spark.createDataFrame([(i, i * 10) for i in range(1000)], "k long, v long")
    path = str(tmp_path / "clustered")
    manifest_write(df, "k", path, n_files=10)
    # range [205, 395): straddles file boundaries — the residual
    # predicate must trim rows the kept files carry outside the range
    out, n_read, n_total = manifest_pruned_read(spark, path, "k", 205, 395)
    got = sorted(r.k for r in out.collect())
    assert got == list(range(205, 395))
    assert n_total == 10
    assert 1 <= n_read <= 3  # ~19% of a range-clustered domain
    # empty intersection: zero files, zero rows, schema intact
    out2, n_read2, _ = manifest_pruned_read(spark, path, "k", 5000, 6000)
    assert n_read2 == 0 and out2.count() == 0 and out2.columns == ["k", "v"]


def test_zorder_manifest_prunes_both_dimensions(spark, tmp_path):
    from osm_changesets_to_parquet_spark.operators.layout import (
        manifest_pruned_read_box,
        manifest_write_zordered,
    )

    # a 64x64 integer grid — every (x, y) exactly once
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    path = str(tmp_path / "zgrid")
    manifest_write_zordered(grid, ["x", "y"], path, n_files=16)
    # a 2-D box: both dimensions prune at once
    out, n_read, n_total = manifest_pruned_read_box(
        spark, path, {"x": (0, 16), "y": (0, 16)}
    )
    assert n_total == 16
    assert n_read <= 4  # a 1/16 z-region of 16 z-range files
    assert out.count() == 16 * 16
    # a single-dimension box on the SECOND column — the case a linear
    # (x-sorted) layout cannot prune at all (every file spans all y);
    # z-range files bound y too, so skipping still happens
    out2, n_read2, _ = manifest_pruned_read_box(spark, path, {"y": (0, 8)})
    assert n_read2 < 16
    assert out2.count() == 64 * 8


def test_mmr_prefers_diverse_over_redundant(spark):
    from osm_changesets_to_parquet_spark.operators.similarity import mmr_rerank

    # a and b are near-duplicates hugging the query; c is less relevant
    # but orthogonal-ish.  Pure top-2 = (a, b); MMR's second pick must
    # pay the redundancy penalty and choose c instead.
    rows = [
        (1, [1.0, 0.02]),   # a: sim(q) ~ 1
        (2, [1.0, 0.03]),   # b: ~ a
        (3, [0.72, 0.7]),   # c: diverse
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = spark.createDataFrame([([1.0, 0.0],)], "q array<float>")
    got = [
        (r.rank, r.vec_id)
        for r in mmr_rerank(emb, query, pool_k=3, select_k=2, lam=0.3).collect()
    ]
    assert got == [(1, 1), (2, 3)]


def test_targeted_delete_rewrites_only_touched_buckets(spark, tmp_path):
    from osm_changesets_to_parquet_spark.operators.merge import targeted_delete
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    rows = spark.createDataFrame(
        [(i, i % 40, float(i)) for i in range(400)], "row_id long, uid long, v double"
    )
    store = str(tmp_path / "store")
    rows.withColumn("__pb", hash_bucket("uid", 16)).write.partitionBy(
        "__pb"
    ).mode("overwrite").parquet(store)
    doomed = spark.createDataFrame([(3,), (17,)], "uid long")
    tb = {
        r[0]
        for r in doomed.select(hash_bucket("uid", 16).alias("b")).distinct().collect()
    }
    out = str(tmp_path / "after")
    surv = targeted_delete(spark, store, doomed, "uid", out, n_buckets=16)
    written = {d.split("=")[1] for d in os.listdir(out) if d.startswith("__pb=")}
    assert written == {str(b) for b in tb}
    got = sorted(r.row_id for r in surv.collect())
    want = sorted(i for i in range(400) if i % 40 not in (3, 17))
    assert got == want


def test_targeted_delete_emptied_bucket(spark, tmp_path):
    # deleting EVERY key in a bucket leaves that bucket dir with no
    # data files — the survivors read must not choke on inference
    from osm_changesets_to_parquet_spark.operators.merge import targeted_delete
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    rows = spark.createDataFrame([(1, 0, 1.0), (2, 1, 2.0)], "row_id long, uid long, v double")
    store = str(tmp_path / "store")
    rows.withColumn("__pb", hash_bucket("uid", 16)).write.partitionBy(
        "__pb"
    ).mode("overwrite").parquet(store)
    doomed = spark.createDataFrame([(0,)], "uid long")
    surv = targeted_delete(
        spark, store, doomed, "uid", str(tmp_path / "after"), n_buckets=16
    )
    assert [r.row_id for r in surv.collect()] == [2]


# ---------------------------------------------------------------------------
# Session-3 operator property tests (brute-force semantics guards —
# the DuckDB oracle pins cross-engine parity; these pin the MATH)
# ---------------------------------------------------------------------------


def test_q172_auc_equals_pairwise_probability(spark, sf_dir):
    """AUC from the rank statistic == P(score_pos > score_neg) +
    0.5*P(tie), counted pairwise over the raw events."""
    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.queries.analytics_metrics import q172

    got = q172(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .select("value", "event_type")
        .collect()
    )
    pos = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    neg = sorted(r["value"] for r in rows if r["event_type"] != "purchase")
    import bisect
    wins = ties = 0
    for p in pos:
        wins += bisect.bisect_left(neg, p)
        ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(got["auc"] - auc) < 1e-5
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_q182_cusum_closed_form_equals_recursion(spark, sf_dir):
    """csum - min(0, earlier csum) == the textbook recursion
    S_t = max(0, S_{t-1} + dev_t), replayed in Python per type."""
    from osm_changesets_to_parquet_spark.queries.analytics_metrics import q182, US_PER_DAY
    from osm_changesets_to_parquet_spark.catalog import load_table

    got = {r["event_type"]: r for r in q182(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") / US_PER_DAY).cast("long").alias("day"),
        "value",
    )
    d = (
        ev.groupBy("event_type", "day")
        .agg(F.round(F.avg("value"), 4).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in d:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    for et, pts in series.items():
        pts.sort()
        mu = round(sum(x for _, x in pts) / len(pts), 6)
        s, best = 0.0, None
        for day, x in pts:
            s = max(0.0, s + (x - mu))
            if best is None or s > best[1] + 1e-12:
                best = (day, s)
        assert got[et]["change_day"] == best[0]
        assert abs(got[et]["max_cusum"] - best[1]) < 1e-3


def test_q181_twap_matches_bruteforce(spark, sf_dir):
    """DECIMAL-accumulated TWAP == a per-user Python replay over the
    sorted event stream."""
    from osm_changesets_to_parquet_spark.queries.analytics_metrics import q181
    from osm_changesets_to_parquet_spark.catalog import load_table
    import math

    got = {r["user_id"]: r for r in q181(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_id", "value")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in rows:
        streams.setdefault(r["user_id"], []).append(
            (r["us"], r["event_id"], int(math.floor(r["value"] * 100 + 0.5)))
        )
    for uid, evs in streams.items():
        evs.sort()
        wsum = tdt = 0
        for (us, _, cents), (nus, _, _) in zip(evs, evs[1:]):
            wsum += cents * (nus - us)
            tdt += nus - us
        if tdt == 0:
            assert uid not in got
            continue
        assert got[uid]["total_dt_us"] == tdt
        assert abs(got[uid]["twap"] - wsum / tdt / 100.0) < 1e-5


def test_q192_emd_matches_bruteforce(spark, sf_dir):
    """Integer-accumulated EMD == direct CDF-difference integral in
    Python over the raw cohorts."""
    from osm_changesets_to_parquet_spark.queries.analytics_metrics import q192, US_PER_DAY
    from osm_changesets_to_parquet_spark.catalog import load_table
    import math
    from collections import Counter

    got = {r["event_type"]: r for r in q192(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", F.unix_micros("ts").alias("us"))
        .collect()
    )
    data: dict[str, tuple] = {}
    for r in rows:
        wk = ((r["us"] // US_PER_DAY) + 4) % 7 < 5
        cents = int(math.floor(r["value"] * 100 + 0.5))
        data.setdefault(r["event_type"], (Counter(), Counter()))[0 if wk else 1][
            cents
        ] += 1
    for et, (a, b) in data.items():
        na, nb = sum(a.values()), sum(b.values())
        support = sorted(set(a) | set(b))
        ca = cb = 0
        emd = 0.0
        for v, nv in zip(support, support[1:]):
            ca += a.get(v, 0)
            cb += b.get(v, 0)
            emd += abs(ca / na - cb / nb) * (nv - v)
        assert got[et]["n_weekday"] == na and got[et]["n_weekend"] == nb
        assert abs(got[et]["emd"] - emd / 100.0) < 1e-3


def test_q171_pairs_match_bruteforce(spark, sf_dir):
    """A-priori pair supports == brute-force counting over the distinct
    basket-item sets."""
    from osm_changesets_to_parquet_spark.queries.analytics import q171, _Q171_SUP
    from osm_changesets_to_parquet_spark.catalog import load_table
    from collections import Counter
    from itertools import combinations

    got = {(r["x"], r["y"]): r["support"] for r in q171(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    item_cnt: Counter = Counter()
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
        item_cnt[r["l_partkey"]] += 1
    freq = {i for i, c in item_cnt.items() if c >= _Q171_SUP}
    pair_cnt: Counter = Counter()
    for items in baskets.values():
        kept = sorted(i for i in items if i in freq)
        for a, b in combinations(kept, 2):
            pair_cnt[(a, b)] += 1
    want = {p: c for p, c in pair_cnt.items() if c >= _Q171_SUP}
    assert got == want


def test_q186_trigrams_match_bruteforce(spark, sf_dir):
    """Top-10 event trigrams == Python counting over per-user sorted
    streams (ties broken identically)."""
    from osm_changesets_to_parquet_spark.queries.analytics import q186
    from osm_changesets_to_parquet_spark.catalog import load_table
    from collections import Counter

    got = [(r["path"], r["n"]) for r in q186(spark, sf_dir).collect()]
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts_us", "event_id")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in rows:
        streams.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["event_id"], r["event_type"])
        )
    cnt: Counter = Counter()
    for evs in streams.values():
        evs.sort()
        seq = [t for _, _, t in evs]
        for i in range(len(seq) - 2):
            cnt[f"{seq[i]}>{seq[i+1]}>{seq[i+2]}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_q187_k80_matches_bruteforce(spark, sf_dir):
    """k80 == the prefix length reaching 80% of revenue in the exact
    integer-cents ranking."""
    import math

    from osm_changesets_to_parquet_spark.queries.analytics_metrics import q187
    from osm_changesets_to_parquet_spark.catalog import load_table
    from collections import defaultdict

    got = q187(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    rev: dict[int, int] = defaultdict(int)
    for r in rows:
        rev[r["o_custkey"]] += int(math.floor(r["o_totalprice"] * 100 + 0.5))
    cents = sorted(rev.values(), reverse=True)
    total = sum(cents)
    cum = k80 = 0
    for c in cents:
        if 5 * cum < 4 * total:
            k80 += 1
        cum += c
    assert got["n_customers"] == len(cents)
    assert got["total_cents"] == total
    assert got["k80"] == k80


def test_q174_blocking_pairs_complete(spark, sf_dir):
    """Every emitted pair is a true within-window neighbor pair in the
    (name, key) sort order, and every such pair below the distance
    threshold is emitted (completeness over the brute-force window)."""
    from osm_changesets_to_parquet_spark.queries.dedup_sim import (
        _Q174_DIST,
        _Q174_W,
        q174,
    )
    from osm_changesets_to_parquet_spark.catalog import load_table

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    got = {(r["key_a"], r["key_b"]) for r in q174(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "part").select("p_partkey", "p_name").collect()
    ordered = sorted(rows, key=lambda r: (r["p_name"], r["p_partkey"]))
    want = set()
    for i, a in enumerate(ordered):
        for b in ordered[i + 1 : i + _Q174_W]:
            if lev(a["p_name"], b["p_name"]) <= _Q174_DIST:
                want.add((a["p_partkey"], b["p_partkey"]))
    assert got == want


def test_q196_weights_follow_poisson_pmf(spark, sf_dir):
    """The hash-derived replicate weights are Poisson(1)-distributed:
    empirical frequencies of k=0,1,2 within 3 sigma of the pmf, and
    the mean weight within 2% of 1 (the bootstrap's resampling
    contract)."""
    import math

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators.quality import ID_FOLD, KNUTH

    ev = load_table(spark, sf_dir, "events").select("event_id")
    thr = [3679, 7358, 9197, 9810, 9963]
    rows = ev.collect()
    n = len(rows) * 32
    from collections import Counter
    cnt: Counter = Counter()
    for r in rows:
        for j in range(1, 33):
            h = (((r["event_id"] % ID_FOLD) * KNUTH + j * 9973) % ID_FOLD) % 10000
            cnt[sum(1 for t in thr if t <= h)] += 1
    pmf = [math.exp(-1) / math.factorial(k) for k in range(3)]
    for k in range(3):
        p = cnt[k] / n
        sigma = math.sqrt(pmf[k] * (1 - pmf[k]) / n)
        assert abs(p - pmf[k]) < 3 * sigma + 0.005, (k, p, pmf[k])
    mean_w = sum(k * c for k, c in cnt.items()) / n
    assert abs(mean_w - 1.0) < 0.02


def test_q205_patterns_match_bruteforce(spark, sf_dir):
    """Gap-constrained 2-sequence counts == Python enumeration over
    per-user sorted streams."""
    from osm_changesets_to_parquet_spark.queries.analytics import (
        _Q205_GAP,
        q205,
    )
    from osm_changesets_to_parquet_spark.catalog import load_table
    from collections import Counter

    got = [(r["pat"], r["n"]) for r in q205(spark, sf_dir).collect()]
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts_us", "event_id")
        .collect()
    )
    streams: dict[int, list] = {}
    for r in rows:
        streams.setdefault(r["user_id"], []).append(
            (r["ts_us"], r["event_id"], r["event_type"])
        )
    cnt: Counter = Counter()
    for evs in streams.values():
        evs.sort()
        seq = [t for _, _, t in evs]
        for i in range(len(seq) - 1):
            # j runs i+1 .. i+GAP inclusive (1-based LEAST(i+GAP, len))
            for j in range(i + 1, min(i + _Q205_GAP, len(seq) - 1) + 1):
                cnt[f"{seq[i]}>{seq[j]}"] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_lsh_write_then_append_then_probe_composes(spark, sf_dir):
    # ADVICE r06: lsh_index_write (base) and lsh_index_append
    # (increments) must form ONE discoverable parquet dataset — the
    # base now lands under __bid=base at the same partition depth as
    # __bid=N, so probing a write+append index equals the in-session
    # incremental result over the union corpus
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators.dedup import (
        lsh_index_append,
        lsh_index_write,
        lsh_neardup_incremental,
        lsh_neardup_probe_index,
    )
    from osm_changesets_to_parquet_spark.operators.quality import hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = hash_bucket("doc_id", 100)
    base_corpus = docs.where(b < 60)
    increment = docs.where((b >= 60) & (b < 90))
    incoming = docs.where(b >= 90)
    idx = tempfile.mkdtemp(prefix="lsh_mixed_test_")
    lsh_index_write(base_corpus, idx)
    lsh_index_append(increment, idx, "__bid=0")
    got = sorted(
        map(
            tuple,
            lsh_neardup_probe_index(spark, idx, incoming, 0.6).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            lsh_neardup_incremental(
                base_corpus.unionByName(increment), incoming, 0.6
            ).collect(),
        )
    )
    assert got == want
    assert len(want) > 0  # fixture must actually exercise the probe


@pytest.mark.slow  # >5 s brute-force/property check: full-suite gate only
def test_lsh_probe_before_bid_excludes_own_append(spark, sf_dir):
    # ADVICE r06 retry safety: a replayed foreachBatch batch that
    # already appended itself under __bid=N must not probe its own
    # prior append — before_bid=N filters it, so the probe result
    # equals the pre-append result and contains no self-pairs
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.operators.dedup import (
        lsh_index_append,
        lsh_neardup_probe_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch0 = docs.where(F.col("doc_id") % 2 == 0)
    batch1 = docs.where(F.col("doc_id") % 2 == 1)
    idx = tempfile.mkdtemp(prefix="lsh_retry_test_")
    lsh_index_append(batch0, idx, "__bid=0")
    clean = sorted(
        (r.new_id, r.old_id)
        for r in lsh_neardup_probe_index(
            spark, idx, batch1, 0.6, before_bid=1
        ).collect()
    )
    # simulate the failure-after-append: batch 1's append landed, then
    # the batch replays and probes again
    lsh_index_append(batch1, idx, "__bid=1")
    replay = sorted(
        (r.new_id, r.old_id)
        for r in lsh_neardup_probe_index(
            spark, idx, batch1, 0.6, before_bid=1
        ).collect()
    )
    assert replay == clean
    assert all(a != b for a, b in replay)  # no self-pairs
    # without the filter the poisoned probe DOES emit self-pairs —
    # the failure mode the parameter exists to prevent
    poisoned = lsh_neardup_probe_index(spark, idx, batch1, 0.6).collect()
    assert any(r.new_id == r.old_id for r in poisoned)


def test_events_chunks_overwrite_retracts_stale_stream_manifests(spark, sf_dir):
    # ADVICE r06: a batch OVERWRITE at a path previously used by a
    # streaming job must retract the stream's _MANIFEST-<id>.json
    # files — the union-of-manifests reader would otherwise
    # double-count rows
    import json
    import shutil
    import tempfile

    from osm_changesets_to_parquet_spark.catalog import load_table
    from osm_changesets_to_parquet_spark.sources import events_sink_pyds

    events_sink_pyds.register(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts_us"
    )
    n = ev.count()
    path = tempfile.mkdtemp(prefix="events_chunks_stale_test_")
    try:
        (
            ev.repartition(2)
            .write.format("events_chunks")
            .mode("overwrite")
            .option("path", path)
            .save()
        )
        # simulate a leftover streaming manifest naming a real file:
        # without retraction the reader unions it and double-counts
        with open(f"{path}/_MANIFEST.json") as f:
            first = json.load(f)["files"][0]
        with open(f"{path}/_MANIFEST-3.json", "w") as f:
            json.dump({"batch": 3, "files": [first], "total_rows": first["rows"]}, f)
        assert (
            spark.read.format("events_chunks").option("path", path).load().count()
            > n
        ), "precondition: the stale manifest must actually double-count"
        (
            ev.repartition(2)
            .write.format("events_chunks")
            .mode("overwrite")
            .option("path", path)
            .save()
        )
        import os as _os

        assert not _os.path.exists(f"{path}/_MANIFEST-3.json")
        assert (
            spark.read.format("events_chunks").option("path", path).load().count()
            == n
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
