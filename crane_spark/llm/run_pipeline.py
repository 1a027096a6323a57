"""The end-to-end training-corpus build as an EXECUTABLE product
feature: every stage is an operator that is individually oracle-
checked elsewhere; this module chains them, materializes each stage as
a versioned snapshot (sources/versioned.py — auditable, resumable,
diffable), and returns the per-stage survivor report.

Stages (the standard LLM preprocessing funnel, identical to the
oracle-checked `corpus_funnel` registry query — the test asserts the
stage counts EQUAL that query's output):

    1 length gate      n_chars in [lo, hi]
    2 exact dedup      first-doc-wins per md5(text)
    3 decontaminate    drop docs sharing any 8-gram with the eval set
    4 mixing           equal-share language rebalance (downsample-only)
    5 shard            stable hash deal into n_shards

The published artifacts under ``{out_root}``:

    corpus/vNNNNNN     the final sharded corpus (doc_id, text, lang,
                       source, shard)
    report/vNNNNNN     one row per stage: (stage, n_docs)

Why snapshots: a 100 TB corpus build is re-run weekly against moving
inputs; versioned immutable outputs give reproducible training runs
(pin a version), auditable diffs between builds (versioned.diff), and
retention control (versioned.expire). The driver-facing numbers match
the `corpus_funnel` registry query, which states the same funnel as
one lazy plan and is hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.functions.text import exploded_word_grams
from crane_spark.llm.sampling import HASH_SPACE, hash_bucket
from crane_spark.queries.corpus import N_SHARDS
from crane_spark.sources import versioned as V
from crane_spark.tables import table


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    len_lo: int = 120,
    len_hi: int = 520,
    gram_n: int = 8,
    n_shards: int = N_SHARDS,
) -> dict[str, int]:
    """Run the funnel over ``{sf_dir}/documents.parquet`` (doc_id < 20
    standing in for the eval suite), publish the sharded corpus and the
    stage report as versioned snapshots, and return {stage: n_docs}."""
    docs = table(spark, sf_dir, "documents")
    bench = (
        exploded_word_grams(docs.filter(F.col("doc_id") < 20), gram_n, [], out="g")
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") >= 20)
    counts: dict[str, int] = {"0_raw": corpus.count()}

    length_ok = corpus.filter(F.col("n_chars").between(len_lo, len_hi))
    counts["1_length"] = length_ok.count()

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        length_ok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    ).localCheckpoint(eager=True)
    counts["2_exact_dedup"] = deduped.count()

    contaminated = (
        exploded_word_grams(deduped, gram_n, ["doc_id"], out="g")
        .select("doc_id", F.md5("g").alias("gh"))
        .join(F.broadcast(bench), "gh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    counts["3_decontaminated"] = clean.count()

    lang_counts = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    n_min = lang_counts.agg(F.min("n").alias("m"))
    thr = lang_counts.crossJoin(F.broadcast(n_min)).select(
        "lang", F.floor(F.lit(HASH_SPACE) * F.col("m") / F.col("n")).alias("thr")
    )
    mixed = clean.join(F.broadcast(thr), "lang").filter(
        hash_bucket("doc_id", "mix") < F.col("thr")
    )
    counts["4_mixed"] = mixed.count()

    sharded = mixed.select(
        "doc_id",
        "text",
        "lang",
        "source",
        (hash_bucket("doc_id", "shard") % n_shards).cast("int").alias("shard"),
    )
    corpus_v = V.put(sharded.repartition("shard"), out_root, "corpus")
    report = spark.createDataFrame(
        sorted(counts.items()), "stage string, n_docs long"
    )
    report_v = V.put(report, out_root, "report")
    counts["_corpus_version"] = corpus_v
    counts["_report_version"] = report_v
    return counts
