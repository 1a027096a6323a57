"""Property-based spot checks (SURVEY.md §5): invariants that hold for
ANY input, exercised through hypothesis-generated corpora in a single
Spark job per property (many generated rows per job, not one job per
example — Spark startup would dwarf the test otherwise)."""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from crane_spark.functions.aggregates import dsum
from crane_spark.operators.topology import wordcount

lines_strategy = st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=30), min_size=1, max_size=25
)


@settings(max_examples=5, deadline=None)
@given(lines=lines_strategy)
def test_wordcount_conserves_tokens(lines):
    spark = _session()
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    counts = wordcount(df).agg(F.sum("cnt").alias("total")).collect()[0]["total"]
    expected = sum(len(line.split(" ")) for line in lines)
    assert counts == expected


@settings(max_examples=5, deadline=None)
@given(
    vals=st.lists(
        st.decimals(
            min_value=-10**6, max_value=10**6, places=2, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=200,
    )
)
def test_dsum_is_exact(vals):
    """dsum over doubles == exact Decimal sum, regardless of order or
    partitioning — the invariant the whole oracle strategy rests on."""
    spark = _session()
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(7)
    got = df.agg(dsum("x", 2).alias("s")).collect()[0]["s"]
    assert Decimal(str(got)).quantize(Decimal("0.01")) == sum(vals).quantize(
        Decimal("0.01")
    )


def _session():
    from crane_spark import get_spark

    return get_spark("crane_spark_tests")
