"""Shuffle-BYTE guards: quantify what the plan asserts only shape-wise.

tests/test_plans.py proves a broadcast join exists or a window is
aggregate-fed; these tests read the measured shuffle-write bytes from
Spark's status store (the same source as tools/shuffle_report.py) and
pin the CLAIM behind those plans — that the bytes that would hit a
cluster's network are aggregate-sized, vocabulary-bounded, or flat
across a 10x data step. A regression that keeps the plan shape but
starts dragging data rows through an exchange (e.g. a lost broadcast
hint, a window re-plan reverting to data-sized partitions) moves
bytes by 10-1000x and fails here while the plan-string asserts might
still pass.

Guards are RATIO-based (ADVICE r7): each aggregate-sized claim is
checked against a data-sized shuffle measured in the SAME session at
the SAME rung — a Spark upgrade, codec change, or partition-count
default moves both numbers together, so the guards stay
version-portable where absolute byte thresholds would rot.

Measured on the tiny rungs (sf0.001 vs sf0.01) — seconds, not
minutes; the full ladder lives in SCALE.md's shuffle section.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crane_spark.queries import REGISTRY
from crane_spark.tables import table

from tools.shuffle_report import _group_shuffle_bytes

# derive both rungs from the same override conftest honors, so these
# guards stay portable to checkouts with relocated test data
SF_SMALL = os.environ.get("CRANE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_MED = os.path.join(os.path.dirname(SF_SMALL.rstrip("/")), "sf0.01")


def _run_tagged(spark, tag: str, make_df) -> int:
    """make_df is a THUNK: plan construction must happen inside the
    job group — exact_rank-style queries run eager offset-aggregate
    jobs while building the plan, and those jobs' shuffles belong in
    the measurement."""
    sc = spark.sparkContext
    assert sc.uiWebUrl, "conftest must enable spark.ui.enabled"
    sc.setJobGroup(tag, tag)
    try:
        make_df().write.mode("overwrite").format("noop").save()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return _group_shuffle_bytes(sc, tag)


def _shuffle_bytes(spark, name: str, sf_dir: str) -> int:
    tag = f"shufguard:{name}@{sf_dir}"
    return _run_tagged(spark, tag, lambda: REGISTRY[name].fn(spark, sf_dir))


def test_q5_broadcast_star_join_shuffles_only_aggregates(spark):
    """q5's five dimension joins are all broadcast: the ONLY exchange
    is the final 5-nation group-by. The guard compares against a
    DATA-sized exchange of the same fact table at the same rung — a
    dimension falling off the broadcast path drags at least fact-sized
    rows through a shuffle, i.e. the two numbers converge."""
    b = _shuffle_bytes(spark, "q5_local_supplier_volume", SF_MED)
    baseline = _run_tagged(
        spark,
        "shufguard:q5-baseline",
        lambda: table(spark, SF_MED, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .repartition(8, "l_orderkey"),
    )
    assert baseline > 0, "baseline repartition produced no shuffle"
    assert b < baseline / 10, (
        f"q5 shuffled {b} bytes vs data-sized baseline {baseline} — "
        "a join stopped broadcasting"
    )


def test_wordcount_map_side_combine_is_vocab_bounded(spark):
    """The token count's exchange carries per-partition PARTIALS of a
    31-word vocabulary, not the exploded token stream (~27k rows at
    sf0.01). The guard's baseline IS that exploded token stream pushed
    through a data-sized exchange — partial aggregation failing makes
    wordcount's bytes approach it."""
    b = _shuffle_bytes(spark, "wordcount", SF_MED)
    from crane_spark.functions.text import tokens

    baseline = _run_tagged(
        spark,
        "shufguard:wordcount-baseline",
        lambda: table(spark, SF_MED, "documents")
        .select(F.explode(tokens("text")).alias("w"))
        .repartition(8, "w"),
    )
    assert baseline > 0, "baseline token explode produced no shuffle"
    assert b < baseline / 10, (
        f"wordcount shuffled {b} bytes vs exploded-stream baseline "
        f"{baseline} — partials not combining"
    )


def test_window_analytics_shuffle_flat_across_data_step(spark):
    """The exact_rank re-plan shuffles (nation, range-bucket) CELL
    aggregates and per-cell offsets; doc rows cross once into bounded
    cells. Bytes must stay near-flat over a 10x input step — the old
    per-nation data-sized window sort grew linearly."""
    small = _shuffle_bytes(spark, "window_analytics", SF_SMALL)
    med = _shuffle_bytes(spark, "window_analytics", SF_MED)
    assert small > 0, "expected at least the aggregate exchange"
    assert med < max(4 * small, small + 256_000), (
        f"window_analytics shuffle grew {small} -> {med} bytes over a 10x "
        "data step — a data-sized window partition is back"
    )


@pytest.mark.parametrize("name", ["pack_by_budget"])
def test_cell_replans_stay_subquadratic(spark, name):
    """pack_by_budget shuffles each doc row once into its (source,
    range-bucket) cell plus aggregate offsets: growth across a 10x
    step must stay ~linear (<= 10x plus a fixed aggregate floor)."""
    small = _shuffle_bytes(spark, name, SF_SMALL)
    med = _shuffle_bytes(spark, name, SF_MED)
    assert med < 10 * small + 512_000, (
        f"{name} shuffle grew {small} -> {med} bytes over a 10x data step"
    )
