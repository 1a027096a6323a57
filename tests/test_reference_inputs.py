"""Golden parity on the REFERENCE'S OWN committed input files
(/root/reference/app/*.csv, read-only): the engine's topologies must
agree with a pure-Python simulator of the bolt semantics on the exact
data the reference ships — including the documented boundary behaviors
(twitter_1k selects 0 rows; pagerank rows with <2 fields emit nothing).
Skipped gracefully if the reference snapshot is absent.
"""

from __future__ import annotations

import os
from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from crane_spark.operators.topology import (
    global_filter_count,
    pagerank_contributions,
    wordcount,
)
from crane_spark.sources import pagerank_edges_from_tsv, twitter_rows_from_csv

REF_APP = "/root/reference/app"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_APP), reason="reference snapshot not present"
)


def test_wordcount_on_reference_file(spark):
    path = f"{REF_APP}/wordcount2k.csv"
    got = {
        r["token"]: r["cnt"]
        for r in wordcount(spark.read.text(path)).collect()
    }
    expected: dict[str, int] = defaultdict(int)
    with open(path, encoding="utf-8") as fh:
        for line in fh.read().splitlines():
            for tok in line.split(" "):  # SplitBolt, word_count_topology.py:13
                expected[tok] += 1
    assert got == dict(expected)


@pytest.mark.parametrize(
    ("fname", "expected_over_50"),
    [
        ("twitter_1k.csv", None),  # boundary: the >50 filter selects 0 rows
        ("twitter_5k.csv", None),
    ],
)
def test_twitter_filter_on_reference_files(spark, fname, expected_over_50):
    path = f"{REF_APP}/{fname}"
    df = twitter_rows_from_csv(spark, path)
    got = global_filter_count(df, F.col("val") > 50).collect()[0]["result_count"]
    expected = 0
    with open(path, encoding="utf-8") as fh:
        for line in fh.read().splitlines():
            parts = line.split(",")  # FilterBolt, twitter_user_filter_topology.py:13-14
            if len(parts) > 1 and int(parts[1]) > 50:
                expected += 1
    assert got == expected
    if fname == "twitter_1k.csv":
        assert got == 0  # the documented zero-row boundary case


def test_pagerank_on_reference_file(spark):
    path = f"{REF_APP}/pagerank_42k.csv"
    edges = pagerank_edges_from_tsv(spark, path)
    got = {r["url"]: r["rank"] for r in pagerank_contributions(edges).collect()}
    expected: dict[str, float] = defaultdict(float)
    with open(path, encoding="utf-8") as fh:
        for line in fh.read().splitlines():
            fields = line.split("\t")  # ParseNeighborsBolt, page_rank_topology.py:13-17
            urls = fields[1:]
            if not urls:
                continue  # no-outlink rows emit nothing
            weight = len(urls) + 1
            for url in urls:
                expected[url] += 1 / weight
    assert set(got) == set(expected)
    for url, rank in expected.items():
        assert abs(got[url] - rank) < 1e-9, url
