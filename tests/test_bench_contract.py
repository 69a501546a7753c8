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


def test_size_aware_shuffle_partitions_clamps(tmp_path):
    # empty dir -> lower clamp max(2, cpus // 4)
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 32) == 8
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 4) == 2
    # one giant file -> upper clamp 4 * cpus
    big = tmp_path / "t.parquet"
    big.write_bytes(b"\0" * (65 * 1024 * 1024))
    # 65 MiB -> want=1 -> still lower clamp with 32 cpus
    assert bench._size_aware_shuffle_partitions(str(tmp_path), 32) == 8
