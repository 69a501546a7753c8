"""Pin bench.py's driver-facing contract (pure helpers, no Spark).

The external driver runs bench.py per round and parses its final stdout
line; regressions here (a rotation class shifting, the partition rule
breaking its clamp, a gate type widening) silently corrupt the
cross-round comparability of BENCH_r{N}.json — so the invariants are
pinned as tests rather than trusted by convention.
"""

from __future__ import annotations

import zlib

import bench
from osm_changesets_to_parquet_spark.queries import FixtureGateError


def test_tier2_rotation_is_crc32_stable_and_disjoint_from_tier1():
    names = [f"q{i:03d}_fake" for i in range(300)] + bench.BENCH_QUERIES[:5]
    for rnd in (9, 10, 11):
        picked = bench.tier2_names(names, rnd)
        # never times a tier-1 query twice
        assert not set(picked) & set(bench.BENCH_QUERIES)
        assert not set(picked) & bench.TIER2_EXCLUDE
        # class membership is a pure function of the NAME, not position:
        # inserting new names can never shift an existing name's class
        for n in picked:
            assert zlib.crc32(n.encode()) % 3 == rnd % 3
    # the 3 classes partition the non-tier-1 names
    all_picked = set()
    for rnd in (0, 1, 2):
        all_picked |= set(bench.tier2_names(names, rnd))
    assert all_picked == set(names) - set(bench.BENCH_QUERIES) - bench.TIER2_EXCLUDE


def test_tier2_skip_gate_is_the_dedicated_type_only():
    """bench catches FixtureGateError (a ValueError subclass) for the
    tier2_skipped path; a PLAIN ValueError must not be the same type,
    so a genuine query bug still crashes the bench loudly."""
    assert issubclass(FixtureGateError, ValueError)
    try:
        raise ValueError("a genuine bug")
    except FixtureGateError:  # pragma: no cover - must not happen
        raise AssertionError("plain ValueError was caught as a gate")
    except ValueError:
        pass


def test_tier1_only_env_parsing_is_explicit():
    """ADVICE r12: any non-empty value used to enable tier-1-only mode,
    so '0'/'false' silently skipped the tier-2 canaries.  Pin the
    explicit parse: only 1/true (case/space-insensitive) enable it."""
    for raw in ("1", "true", "TRUE", " 1 ", "True"):
        assert bench._tier1_only_enabled(raw), raw
    for raw in (None, "", "0", "false", "FALSE", "no", "off", "2"):
        assert not bench._tier1_only_enabled(raw), raw


def test_anchor_gate_acceptance():
    """VERDICT r12 item 1: a tier-1 attempt is clean only when BOTH
    bracketing range-sum anchors and the q01 IO probe sit within
    ANCHOR_GATE_FACTOR of the committed clean maxima."""
    a_gate = bench.ANCHOR_RANGE_SUM_CLEAN_MAX * bench.ANCHOR_GATE_FACTOR
    q_gate = bench.ANCHOR_Q01_CLEAN_MAX * bench.ANCHOR_GATE_FACTOR
    ok_a, ok_q = a_gate * 0.9, q_gate * 0.9
    assert bench._attempt_clean(ok_a, ok_a, ok_q)
    # a missing q01 (query renamed out of tier-1) must not crash or block
    assert bench._attempt_clean(ok_a, ok_a, None)
    # any one probe over its gate rejects the attempt
    assert not bench._attempt_clean(a_gate * 1.1, ok_a, ok_q)
    assert not bench._attempt_clean(ok_a, a_gate * 1.1, ok_q)
    assert not bench._attempt_clean(ok_a, ok_a, q_gate * 1.1)
    # the r12 contention sample (anchor 0.104-0.153 during the wave)
    # would have been rejected; the clean-window sample accepted
    assert not bench._attempt_clean(0.153, 0.149, 0.123)
    assert bench._attempt_clean(0.053, 0.061, 0.105)


def test_anchor_gate_attempts_are_bounded():
    """Retries must terminate: bounded attempts, bounded backoff.

    The cap was raised 300 -> 900 s in r14 (VERDICT r13 item 7: the
    r13 waves outlasted the 90 s budget; geometric backoff to ~7.5 min
    is provisioned against documented wave lengths, still bounded)."""
    assert 1 <= bench.MAX_TIER1_ATTEMPTS <= 6
    assert len(bench.RETRY_BACKOFF_SEC) >= 1
    assert sum(bench.RETRY_BACKOFF_SEC) <= 900


def test_size_aware_shuffle_partitions_clamps(tmp_path):
    # empty dir -> lower clamp max(2, cpus // 4)
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 32) == 8
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 4) == 2
    # one giant file -> upper clamp 4 * cpus
    big = tmp_path / "t.parquet"
    big.write_bytes(b"\0" * (65 * 1024 * 1024))
    # 65 MiB -> want=1 -> still lower clamp with 32 cpus
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 32) == 8


def test_preview_write_guard():
    """BENCH_PREVIEW.json must be anchor-defended: never written from a
    contended pass, never clobbered by a worse same-round sample or by
    a different-sf builder iteration (the r13 regression: a flagged
    38.7 s retry overwrote the committed clean 32.45 s preview)."""
    g = bench._should_write_preview
    # no existing preview: only a clean pass lands
    assert g(None, True, 40.0, "0.1", 13)
    assert not g(None, False, 30.0, "0.1", 13)
    old = {"bench_round": 13, "sf": "0.1", "tier1_total": 32.45}
    # same round+sf: only a BETTER clean total replaces
    assert not g(old, True, 38.7, "0.1", 13)
    assert not g(old, False, 30.0, "0.1", 13)
    assert g(old, True, 31.9, "0.1", 13)
    # same round, SMALLER sf: never clobbers the driver-facing preview
    assert not g(old, True, 5.0, "0.001", 13)
    # same round, LARGER sf: supersedes a smaller-sf builder preview
    # (ADVICE r13 medium: an sf0.001 iteration must not freeze the slot)
    small = {"bench_round": 13, "sf": "0.001", "tier1_total": 5.0}
    assert g(small, True, 40.0, "0.1", 13)
    assert not g(small, False, 40.0, "0.1", 13)
    # legacy numeric sf in a committed preview compares correctly
    # (ADVICE r13: 0.1 != "0.1" froze the slot forever)
    legacy = {"bench_round": 13, "sf": 0.1, "tier1_total": 32.45}
    assert g(legacy, True, 31.9, "0.1", 13)
    assert not g(legacy, True, 38.7, "0.1", 13)
    # stale round: a clean pass for the new round replaces it
    assert g({"bench_round": 12, "sf": "0.1", "tier1_total": 39.0}, True, 40.0, "0.1", 13)
    # corrupt/absent fields degrade safely
    assert g({"bench_round": 13, "sf": "0.1"}, True, 40.0, "0.1", 13)


def test_emitted_timings_min_across_attempts_only_when_contended():
    # clean accepted attempt: verbatim (the r12->r13 behavior)
    a1 = {"clean": False, "t1": 44.0, "_timings": {"q01": 0.7, "q02": 1.0}}
    a2 = {"clean": True, "t1": 40.0, "_timings": {"q01": 0.3, "q02": 1.2}}
    assert bench._emitted_timings([a1, a2], a2) == {"q01": 0.3, "q02": 1.2}
    # all attempts contended: per-query min across attempts
    a3 = {"clean": False, "t1": 41.0, "_timings": {"q01": 0.4, "q02": 0.9}}
    assert bench._emitted_timings([a1, a3], a3) == {"q01": 0.4, "q02": 0.9}
    assert bench._emitted_timings([a1, a3], a1) == {"q01": 0.4, "q02": 0.9}
    # single contended attempt degrades to verbatim
    assert bench._emitted_timings([a1], a1) == {"q01": 0.7, "q02": 1.0}


def test_backoff_schedule_provisioned_for_waves():
    # VERDICT r13 item 7: total retry budget must reach multiple minutes
    assert bench.MAX_TIER1_ATTEMPTS >= 4
    assert sum(bench.RETRY_BACKOFF_SEC) >= 300
    assert len(bench.RETRY_BACKOFF_SEC) == bench.MAX_TIER1_ATTEMPTS - 1
