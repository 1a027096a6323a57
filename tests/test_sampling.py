"""Deterministic sampling properties: layout-independence, split
disjointness, stratified rates (llm/sampling.py)."""

from pyspark.sql import functions as F

from crane_spark.llm.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split,
)
from crane_spark.tables import table


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_sample_is_layout_independent(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    base = _ids(deterministic_sample(docs, "doc_id", 0.2, salt="s1"))
    shuffled = _ids(
        deterministic_sample(docs.repartition(17), "doc_id", 0.2, salt="s1")
    )
    assert base == shuffled
    assert 0 < len(base) < docs.count()


def test_sample_monotone_in_fraction(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    small = set(_ids(deterministic_sample(docs, "doc_id", 0.1, salt="s1")))
    large = set(_ids(deterministic_sample(docs, "doc_id", 0.5, salt="s1")))
    assert small <= large  # larger fraction strictly extends the sample


def test_split_partitions_rows(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tagged = train_test_split(docs, "doc_id", test_fraction=0.25)
    counts = dict(
        tagged.groupBy("split").count().collect()
    )
    assert set(counts) <= {"train", "test"}
    assert sum(counts.values()) == docs.count()
    # same row never switches sides across runs/partitionings
    again = train_test_split(docs.repartition(13), "doc_id", test_fraction=0.25)
    assert _ids(tagged.filter(F.col("split") == "test")) == _ids(
        again.filter(F.col("split") == "test")
    )


def test_stratified_rates(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    # fraction 1.0 keeps every 'en' doc, default 0.0 drops all others
    assert kept.filter(F.col("lang") != "en").count() == 0
    assert kept.count() == docs.filter(F.col("lang") == "en").count()


def test_equal_mixture_sample_balances_groups(spark, sf_dir):
    from crane_spark.llm.sampling import equal_mixture_sample
    from crane_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    counts = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_min = min(counts.values())
    mixed = equal_mixture_sample(docs, "doc_id", "lang", salt="mix")
    kept = {r["lang"]: r["n"] for r in mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # The smallest group keeps everything; no group exceeds its size;
    # every group lands within binomial noise of the equal share.
    smallest = min(counts, key=counts.get)
    assert kept[smallest] == counts[smallest]
    for lang, n in counts.items():
        assert kept.get(lang, 0) <= n
        assert abs(kept.get(lang, 0) - n_min) <= max(6, int(0.5 * n_min))
    # Determinism: same inputs -> identical kept set.
    again = {r["lang"]: r["n"] for r in equal_mixture_sample(docs, "doc_id", "lang", salt="mix").groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == kept
