"""Full-board oracle sweep as a pytest target (opt-in).

``python verify_all.py`` is the one-command board; this wrapper makes it
a pytest node so CI-style runs can gate on it:

    ORACLE_SWEEP=1 python -m pytest tests/test_oracles_all.py -q

Skipped by default — the sweep runs every driver query (~4-5 min at
sf0.01), which would dominate the regular `pytest -x -q` wall.
"""

import json
import os

import pytest


@pytest.mark.skipif(not os.environ.get("ORACLE_SWEEP"),
                    reason="set ORACLE_SWEEP=1 to run the "
                           "full oracle board (~5 min)")
def test_all_queries_match_oracles(ray_session):
    from verify_all import run_sweep

    res = run_sweep(os.environ.get("ORACLE_SWEEP_SF",
                                   "/root/testdata/sf0.01"))
    bad = {n: r for n, r in res["board"].items()
           if r["err"] or (r.get("hash_match") is False)}
    assert not bad, json.dumps(bad, indent=1)
    assert res["pass"] + res["rows_only"] == res["total"]
