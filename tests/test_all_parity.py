"""The all-oracles CI gate: the per-round driver only SAMPLES ~50 of the
queries, so an oracle-backed query could silently rot between rounds.
This test runs the driver-style queries()-vs-oracle_sql() comparison over
EVERY oracle-backed entry at sf0.001 — any parity break fails the suite
long before a driver round sees it."""

import importlib.util
import os
import sys


def _load_check_parity():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(root, "tools", "check_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["check_parity"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_backed_query_matches(ray_session):
    cp = _load_check_parity()
    old_cwd = os.getcwd()
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        # workers=4: the gate's wall time is per-query fixed overhead
        # (plan + tiny execute), so overlapping four queries fills the
        # 4-CPU test session instead of leaving it idle between plans
        failures = cp.run_parity(
            "/root/testdata/sf0.001", oracle_only=True, workers=4
        )
    finally:
        os.chdir(old_cwd)
    assert failures == []


def test_oracle_count_does_not_shrink():
    """Oracle coverage is a one-way ratchet: round 5 shipped 171
    SQL-checked queries; losing one silently would weaken the gate."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __ray_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    assert set(oracles) <= set(queries)
    assert len(oracles) >= 171
