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
