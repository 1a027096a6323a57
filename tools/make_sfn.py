"""Synthesize an sf1-scale test rung (~6M lineitem rows) from the
sf0.1 fixtures by deterministic 10x replication with key offsets.

The driver's ladder stops at sf0.1, where fixed per-query overhead
(~0.1-0.3 s of planning + dispatch) still dominates most runtimes and
growth factors under-resolve. One more decade makes the data path the
dominant cost, so SCALE.md's x10-3 column (sf0.1 -> sf1) is the
honest scaling evidence. Replication scheme (replica 0 is the
original data bit-for-bit; replicas 1..9 shift keys past the original
ranges):

  lineitem/orders  order keys offset per replica; dims are shared
                   (fact grows 10x against fixed dimensions — the
                   realistic shape of a growing fact table)
  events           event ids offset; same users and time range
                   (denser traffic, not a longer history)
  documents        doc ids offset; every token of replicas 1..9 gets
                   a replica suffix, so replicated docs are NOVEL
                   content (vocabulary grows, no cross-replica
                   duplicate pairs — a 10x corpus, not 10 copies)
  embeddings       vec ids offset; first component shifted by
                   replica*0.01 so no cross-replica exact-dup vectors
  dims             copied unchanged

Replicated tables are REPARTITIONED to defaultParallelism before the
write: a crossJoin against a broadcast preserves the (often
single-split) input partitioning, and a single write task produces
ONE file with ONE giant row group — which parquet cannot split, so
every downstream scan of the rung serializes into one task no matter
what the planner's byte-split count says (round 6: dup_span_ranges
read 137 s at sf10 purely from this; the engine was fine).

Usage: python tools/make_sfn.py [out_dir] [replicas]
(default /tmp/crane_sf1 with 10 replicas; the round-6 sf10 rung is
`python tools/make_sfn.py /tmp/crane_sf10 100` — ~60M lineitem rows,
500k novel-content docs). Writes {out}/{table}.parquet mirroring the
testdata layout; skips work if the output already exists (delete to
regenerate).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crane_spark import get_spark
from crane_spark.tables import TABLE_NAMES, table

SRC = "/root/testdata/sf0.1"


def build(out_dir: str, replicas: int = 10) -> None:
    spark = get_spark("make_sfn")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def dst(name: str) -> str:
        return os.path.join(out_dir, f"{name}.parquet")

    def done(name: str) -> bool:
        return os.path.exists(os.path.join(dst(name), "_SUCCESS"))

    # shared replica index frame: cross join against 10 rows, then
    # shift keys — one distributed pass per table, no driver loops
    reps = spark.range(replicas).withColumnRenamed("id", "rep")

    for name in ("region", "nation", "customer", "supplier", "part"):
        if not done(name):
            table(spark, SRC, name).write.mode("overwrite").parquet(dst(name))

    okey_off = table(spark, SRC, "orders").agg(
        F.max("o_orderkey") + 1
    ).collect()[0][0]

    if not done("orders"):
        (
            table(spark, SRC, "orders")
            .crossJoin(F.broadcast(reps))
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * okey_off)
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(dst("orders"))
        )
    if not done("lineitem"):
        (
            table(spark, SRC, "lineitem")
            .crossJoin(F.broadcast(reps))
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * okey_off)
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(dst("lineitem"))
        )
    if not done("events"):
        ev = table(spark, SRC, "events")
        eoff = ev.agg(F.max("event_id") + 1).collect()[0][0]
        (
            ev.crossJoin(F.broadcast(reps))
            .withColumn("event_id", F.col("event_id") + F.col("rep") * eoff)
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(dst("events"))
        )
    if not done("documents"):
        docs = table(spark, SRC, "documents")
        doff = docs.agg(F.max("doc_id") + 1).collect()[0][0]
        salted = F.when(
            F.col("rep") == 0, F.col("text")
        ).otherwise(
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat_ws("", t, F.lit("r"), F.col("rep").cast("string")),
                ),
                " ",
            )
        )
        (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * doff)
            .withColumn("text", salted)
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(dst("documents"))
        )
    if not done("embeddings"):
        emb = table(spark, SRC, "embeddings")
        voff = emb.agg(F.max("vec_id") + 1).collect()[0][0]
        shifted = F.transform(
            "embedding",
            lambda x, i: F.when(
                i == 0, x + (F.col("rep") * F.lit(0.01)).cast("float")
            ).otherwise(x),
        )
        (
            emb.crossJoin(F.broadcast(reps))
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * voff)
            .withColumn("embedding", shifted.cast("array<float>"))
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite")
            .parquet(dst("embeddings"))
        )

    for name in TABLE_NAMES:
        n = spark.read.parquet(dst(name)).count()
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    build(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/crane_sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )
