"""Frozen-golden value gates for deterministic rows-only queries.

These queries have no SQL oracle (banding/bucketing/sketch shapes DuckDB
can't mirror) but are fully deterministic, so their canonicalized output is
pinned as a committed hash: any value change — not just a row-count change —
fails here.  Regenerate with ``python tools/make_goldens.py`` ONLY after
reviewing why the output legitimately changed (fixture regeneration or an
intentional semantic change).
"""

from __future__ import annotations

import json
import os

import pytest

SF = "/root/testdata/sf0.001"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens_sf0001.json")

with open(GOLDENS) as f:
    _GOLDEN = json.load(f)


@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_golden(ray_session, name):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __ray_entry__ as entrymod
    from tools.check_parity import to_pandas
    from tools.make_goldens import canon_hash

    rows, digest = canon_hash(to_pandas(entrymod.queries()[name](SF)))
    want = _GOLDEN[name]
    assert rows == want["rows"], f"{name}: rows {rows} != {want['rows']}"
    assert digest == want["md5"], f"{name}: value hash drifted"
