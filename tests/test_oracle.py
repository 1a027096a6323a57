"""Every registered query hash-matches its DuckDB oracle (the t2
contract, run at sf0.001 for speed; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

from crane_spark.queries import REGISTRY
from crane_spark.testing import diff_frames


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.sql is None:
        assert len(spark_pdf) >= 0  # rows-only contract
        return
    duck_pdf = duck.execute(spec.sql).fetchdf()
    problems = diff_frames(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_registry_complete():
    """Every query with an oracle has matching names, and the registry
    is non-trivial in every declared category."""
    tags = {t for spec in REGISTRY.values() for t in spec.tags}
    for required in ("reference", "join", "window", "agg", "llm", "dedup", "similarity"):
        assert required in tags, f"no queries tagged {required!r}"
    assert len(REGISTRY) >= 40


def test_rows_only_entries_all_anchored():
    """Every rows-only registry entry (sql=None) must declare a
    hash-exact anchor in ROWS_ONLY_ANCHORS — a registered query WITH a
    DuckDB oracle that exercises the same engine code path. A new
    rows-only entry without an anchor fails here (and in
    tools/check_oracle.py's output)."""
    from crane_spark.queries.core import ROWS_ONLY_ANCHORS

    rows_only = {n for n, s in REGISTRY.items() if s.sql is None}
    assert rows_only == set(ROWS_ONLY_ANCHORS), (
        f"anchor mapping out of sync: rows-only={sorted(rows_only)} "
        f"mapped={sorted(ROWS_ONLY_ANCHORS)}"
    )
    for name, anchor in ROWS_ONLY_ANCHORS.items():
        assert anchor in REGISTRY, f"{name}: anchor {anchor!r} not registered"
        assert REGISTRY[anchor].sql is not None, (
            f"{name}: anchor {anchor!r} is itself rows-only — anchors "
            "must carry a DuckDB oracle"
        )
