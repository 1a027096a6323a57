"""r6 verdict #8: stale registry counts in the docs are how a future
round mis-reads coverage. These tests assert the counts STATED in
QUERIES.md and README.md equal the live registry, so a registry change
whose commit skips `python tools/dump_queries.py` (and the README
line) fails CI in the same commit."""

from __future__ import annotations

import os
import re

from crane_spark.queries import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _counts():
    n_oracle = sum(1 for s in REGISTRY.values() if s.sql is not None)
    return len(REGISTRY), n_oracle


def test_queries_md_counts_match_registry():
    text = open(os.path.join(ROOT, "QUERIES.md")).read()
    n, n_oracle = _counts()
    m = re.search(r"(\d+) queries; (\d+) with an exact DuckDB oracle", text)
    assert m, "QUERIES.md lost its count line — regenerate with dump_queries"
    assert (int(m.group(1)), int(m.group(2))) == (n, n_oracle), (
        "QUERIES.md counts are stale: run `python tools/dump_queries.py`"
    )
    # one table row per registered query, none missing or extra
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert listed == set(REGISTRY), (
        sorted(set(REGISTRY) - listed),
        sorted(listed - set(REGISTRY)),
    )


def test_readme_counts_match_registry():
    text = open(os.path.join(ROOT, "README.md")).read()
    n, n_oracle = _counts()
    m = re.search(r"\((\d+) queries, (\d+) with exact DuckDB oracles\)", text)
    assert m, "README.md lost its registry count line"
    assert (int(m.group(1)), int(m.group(2))) == (n, n_oracle), (
        "README.md registry counts are stale — update the queries/ line"
    )


def test_sf1_oracle_run_counts_reconcile_with_registry():
    """SCALE.md's 'Oracle-verified at sf1' section records an actual
    sweep run; its stated total must account for every CURRENT
    registry query (total + the quadratic-oracle exclusions ==
    registry size, and the exact/rows-only split must match the live
    oracle map). A registry change that skips re-running the rung (or
    at least updating SF1_ORACLE_RUN) fails here in the same commit."""
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from scaling_report import _SF1_QUADRATIC_EXCLUSIONS, SF1_ORACLE_RUN

    n_total, n_oracle = _counts()
    for name in _SF1_QUADRATIC_EXCLUSIONS:
        assert name in REGISTRY
    assert SF1_ORACLE_RUN["total"] + len(_SF1_QUADRATIC_EXCLUSIONS) == n_total
    assert (
        SF1_ORACLE_RUN["exact"] + len(_SF1_QUADRATIC_EXCLUSIONS) == n_oracle
    )
    assert SF1_ORACLE_RUN["rows_only"] == n_total - n_oracle
