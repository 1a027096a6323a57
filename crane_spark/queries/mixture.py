"""Temperature-weighted corpus mixing and corpus-statistics regression.

* `temperature_mixture` — mT5-style temperature sampling (alpha = 0.5):
  source s keeps rate_s = (n_min / n_s)^alpha of its documents, the
  largest downsample-only rates realizing the alpha-tempered mix.
  Framed through `sqrt`, which IEEE-754 requires to be correctly
  rounded — so the per-source rate is BIT-identical in Spark and
  DuckDB and the hash-threshold sampling decision matches row for row
  (pow() has no such guarantee; see llm/sampling.py for the
  content-hash machinery).
* `zipf_slope` — least-squares slope of ln(freq) vs ln(rank) over the
  corpus vocabulary: the Zipf exponent, a one-number distribution
  fingerprint used to detect degenerate/boilerplate corpora. The five
  regression sums accumulate as DECIMAL over per-row values rounded
  to 9 decimals, so the result is independent of aggregation order in
  both engines — an exact-arithmetic regression aggregate (the
  built-in regr_slope sums doubles and is order-sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.functions.text import tokens
from crane_spark.llm.sampling import HASH_SPACE, hash_bucket, sql_hash_bucket
from crane_spark.queries.core import register
from crane_spark.tables import fan_out, table

# --------------------------------------------------------------------
# Temperature mixture (alpha = 0.5)
# --------------------------------------------------------------------

TEMPERATURE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_docs,
         sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE)
              / CAST(n_docs AS DOUBLE)) AS rate
  FROM counts
),
kept AS (
  SELECT d.source, count(*) AS k
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE {sql_hash_bucket('d.doc_id', 'temp')} < CAST(floor(r.rate * {HASH_SPACE}) AS BIGINT)
  GROUP BY d.source
)
SELECT r.source, r.n_docs,
       CAST(round(r.rate, 6) AS DOUBLE) AS rate,
       CAST(coalesce(k.k, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""


@register(
    "temperature_mixture",
    TEMPERATURE_MIXTURE_SQL,
    tags=("llm", "sampling", "mixing"),
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled source mixing: keep sqrt(n_min/n_s) of each
    source (alpha=0.5 tempering — softer than equal-share, keeps more
    of the big sources while boosting small ones' relative share).
    The per-source counts are one tiny aggregate; rates broadcast back
    onto the scan and each row decides membership from its content
    hash — the corpus never shuffles, the blend is layout-independent
    and reproducible incrementally. sqrt is correctly rounded by
    IEEE-754, so thresholds agree bit-for-bit across engines."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        "source",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double")).alias(
            "rate"
        ),
    )
    threshold = F.floor(F.col("rate") * HASH_SPACE).cast("long")
    kept = (
        docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket("doc_id", "temp") < threshold)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        F.round("rate", 6).alias("rate"),
        F.coalesce(F.col("k"), F.lit(0)).cast("long").alias("n_kept"),
    )


# --------------------------------------------------------------------
# Zipf slope (exact-decimal regression aggregate)
# --------------------------------------------------------------------

ZIPF_SQL = """
WITH tf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
  FROM tf
),
pts AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS xy,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS xx
  FROM ranked
),
sums AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       CAST(round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS DOUBLE) AS slope,
       CAST(round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
            AS DOUBLE) AS intercept
FROM sums
"""


@register("zipf_slope", ZIPF_SQL, tags=("llm", "text", "stats", "regression"))
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus token distribution via exact
    least squares on (ln rank, ln freq). Frequencies come from one
    tokenize + hash-agg pass (map-side combine shrinks the shuffle to
    vocabulary size); ranks from a vocabulary-sized sort. The four
    moment sums accumulate as DECIMAL over 9-decimal-rounded inputs
    — order-independent, so the slope is reproducible on any cluster
    layout and identical across engines. Slope ~ -1 is healthy
    natural text; slopes far steeper flag template/boilerplate
    corpora. At 100 TB only the tokenize pass sees the data; the
    regression runs on the vocabulary."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    tf = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Vocabulary-sized data: a single-partition rank window is fine
    # (vocab grows ~log with corpus size, not linearly).
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    lnx = F.log(F.col("rank").cast("double"))
    lny = F.log(F.col("freq").cast("double"))
    pts = (
        tf.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            F.round(lnx, 9).cast("decimal(28,9)").alias("x"),
            F.round(lny, 9).cast("decimal(28,9)").alias("y"),
            F.round(lnx * lny, 9).cast("decimal(28,9)").alias("xy"),
            F.round(lnx * lnx, 9).cast("decimal(28,9)").alias("xx"),
        )
    )
    sums = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("long").alias("vocab_size"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
    )
