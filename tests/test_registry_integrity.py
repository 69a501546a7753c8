"""Registry-wide structural invariants (no Spark session needed).

Pinned after the round-10 family regrouping: relocating a query
between modules can leave a function whose body references a global
that exists in the OLD module but not the new one — the import
succeeds (module-level constants evaluate fine) and the break only
surfaces when the query RUNS.  This scan caught two such latent
NameErrors during the round-10 split (_contrastive_argmax used by
q135 from ann_embeddings, pagerank used by q335 from graph_apps), so
it is a permanent gate now.
"""

from __future__ import annotations

import builtins
import dis
import sys
import types


def _load_registry():
    from osm_changesets_to_parquet_spark import queries as Q

    Q.load_all_modules()
    return Q


def test_every_query_fn_resolves_all_globals_in_its_module():
    Q = _load_registry()
    bad = []
    for name, spec in Q.REGISTRY.items():
        mod = sys.modules[spec.fn.__module__]
        codes, seen = [spec.fn.__code__], set()
        while codes:
            c = codes.pop()
            if id(c) in seen:
                continue
            seen.add(id(c))
            codes += [k for k in c.co_consts if isinstance(k, types.CodeType)]
            for ins in dis.get_instructions(c):
                if (
                    ins.opname == "LOAD_GLOBAL"
                    and not hasattr(mod, ins.argval)
                    and not hasattr(builtins, ins.argval)
                ):
                    bad.append((name, spec.fn.__module__, ins.argval))
    assert not bad, f"unresolvable globals (latent NameErrors): {bad}"


def test_every_module_helper_resolves_all_globals():
    """Same scan for NON-registered module-level functions (runtime
    helpers called from query bodies, SQL builders, pandas closures)."""
    Q = _load_registry()
    mods = {spec.fn.__module__ for spec in Q.REGISTRY.values()}
    bad = []
    for mname in sorted(mods):
        mod = sys.modules[mname]
        for attr, val in vars(mod).items():
            if not isinstance(val, types.FunctionType) or val.__module__ != mname:
                continue
            codes, seen = [val.__code__], set()
            while codes:
                c = codes.pop()
                if id(c) in seen:
                    continue
                seen.add(id(c))
                codes += [k for k in c.co_consts if isinstance(k, types.CodeType)]
                for ins in dis.get_instructions(c):
                    if (
                        ins.opname == "LOAD_GLOBAL"
                        and not hasattr(mod, ins.argval)
                        and not hasattr(builtins, ins.argval)
                    ):
                        bad.append((mname, attr, ins.argval))
    assert not bad, f"unresolvable helper globals: {bad}"


def test_registry_contract_shape():
    """Every declared query carries an oracle (zero rows-only — the
    current contract), _PRIORITY names are real and unique, and the
    driver window is exactly 50 names."""
    Q = _load_registry()
    qs = Q.queries()
    osql = Q.oracle_sql()
    assert set(osql) == set(qs), set(qs) - set(osql)
    from osm_changesets_to_parquet_spark.queries import _PRIORITY

    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate in _PRIORITY"
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not registered: {missing}"
    assert len(list(qs)[:50]) == 50


def test_window_follows_rotation_rule():
    """The committed _PRIORITY head must equal the standing
    oldest-witnessed-first rotation rule's choice (VERDICT r10 item 5),
    computed from the CORRECTNESS_r*.json ledger by
    tools/next_window.py.  Hermeticity (VERDICT r11 item 1): the tool
    computes the rule from git-TRACKED ledgers, and --check also
    accepts the window implied by the full on-disk ledger — so the
    suite stays green when the driver drops a new round's untracked
    CORRECTNESS file after the final commit.  The window can never
    silently drift from oldest-first: regenerating _PRIORITY when a
    ledger is committed is enforced the moment that commit lands."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "next_window.py"), "--check"],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_rotation_check_survives_round_boundary_ledger_drop():
    """Regression for VERDICT r11 item 1: the driver drops
    CORRECTNESS_r{N}.json UNTRACKED after the builder's final commit,
    which used to advance the rule's window past the committed
    _PRIORITY and turn the suite red at every round boundary.  Simulate
    the post-drop state — write an all-green ledger for a fictitious
    future round covering the current window — and require --check to
    still pass (the tracked-ledger rule is unchanged by an untracked
    file)."""
    import json
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    Q = _load_registry()
    window = list(Q.REGISTRY)[:50]
    ledger = {
        n: {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for n in window
    }
    fake = os.path.join(repo, "CORRECTNESS_r98.json")
    assert not os.path.exists(fake), "fixture round number collides"
    try:
        with open(fake, "w") as f:
            json.dump(ledger, f)
        proc = subprocess.run(
            [
                _sys.executable,
                os.path.join(repo, "tools", "next_window.py"),
                "--check",
            ],
            capture_output=True,
            text=True,
            cwd=repo,
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
    finally:
        os.remove(fake)
