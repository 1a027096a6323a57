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
    # Dense rank without a single-partition vocabulary sort: the
    # two-level bucketed index (operators/indexing) ordered by freq
    # desc. Ties (same freq) may take different ranks than a plain
    # token-tiebreak sort, but the regression is INVARIANT to that:
    # tied tokens share y = ln(freq) and permute within the same rank
    # set, so every moment sum — and the DuckDB oracle's — is
    # unchanged.
    from crane_spark.operators.indexing import dense_index

    ranked = dense_index(
        tf.withColumn("_negfreq", -F.col("freq")),
        tiebreak="token",
        major="_negfreq",
        out="rank",
        one_based=True,
        checkpoint=True,  # input is the tokenize+freq aggregate
    )
    lnx = F.log(F.col("rank").cast("double"))
    lny = F.log(F.col("freq").cast("double"))
    pts = (
        ranked
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


# --------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------

_WS_K = 50

WEIGHTED_SAMPLE_SQL = f"""
WITH pri AS (
  SELECT doc_id, n_chars,
         round(
           ln((CAST('0x' || substring(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) + 1.0) / 1152921504606846976.0)
           / CAST(n_chars AS DOUBLE), 9) AS priority
  FROM documents
)
SELECT doc_id, n_chars, rank FROM (
  SELECT doc_id, n_chars,
         CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT) AS rank
  FROM pri
) WHERE rank <= {_WS_K}
"""


@register(
    "weighted_sample", WEIGHTED_SAMPLE_SQL, tags=("llm", "sampling", "weighted")
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis
    A-ES: each row draws u from its content hash and gets key
    u^(1/w); the top-k keys are an exact weight-proportional sample.
    Ordering by ln(u)/w is the same ordering computed stably (u from
    md5 -> identical in both engines; priorities round to 9 decimals
    with doc_id tiebreak so a last-ulp ln() difference cannot flip a
    rank). One scan + TakeOrderedAndProject per-partition heaps — no
    global sort, no RNG state, reproducible on any layout. Weights
    here are document lengths (longer docs proportionally likelier)."""
    docs = table(spark, sf_dir, "documents")
    u64 = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (u64 + 1.0) / float(1 << 60)
    pri = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars").cast("double"), 9).alias("priority"),
    )
    top = pri.orderBy(F.desc("priority"), F.asc("doc_id")).limit(_WS_K)
    w = Window.orderBy(F.desc("priority"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "n_chars", "rank")
    )


# --------------------------------------------------------------------
# Equi-depth histogram (ntile) and k-fold assignment
# --------------------------------------------------------------------

EQUIDEPTH_SQL = """
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM (
  SELECT o_totalprice,
         CAST(ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
  FROM orders
)
GROUP BY bucket
"""


@register("equidepth_histogram", EQUIDEPTH_SQL, tags=("agg", "histogram", "window"))
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: 8 buckets of equal row count with
    data-dependent boundaries (`price_histogram` is the equi-width
    twin). ntile over a total order (price, orderkey tiebreak) makes
    bucket membership deterministic — the rank-arithmetic approach
    that avoids comparing data against interpolated quantile cuts
    (engine last-ulp differences would flip boundary rows). This is
    the optimizer-statistics / feature-binning primitive.

    Scale note: NOT the ntile window (which plans a data-sized
    Exchange SinglePartition — one task sorting every order). The
    bucket grid comes from `exact_ntile`: range-bucketed parallel
    rank + driver-side boundary arithmetic, bit-identical to ANSI
    ntile, every exchange bounded."""
    from crane_spark.operators.indexing import exact_ntile

    orders = table(spark, sf_dir, "orders")
    tiled = exact_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        8,
        key="o_totalprice",
        tiebreaks=["o_orderkey"],
        out="bucket",
    )
    return (
        tiled.select("o_totalprice", "bucket")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


KFOLD_SQL = f"""
SELECT {sql_hash_bucket('doc_id', 'fold')} % 5 AS fold,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY fold, lang
"""


@register("kfold_assign", KFOLD_SQL, tags=("llm", "sampling", "split"))
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold (k=5) cross-validation assignment by content hash:
    fold membership is a pure function of doc_id — stable across
    engines, layouts, and incremental corpus rebuilds (a re-ingested
    doc lands in the same fold). Per-(fold, lang) counts verify the
    folds are balanced and language-representative without
    materializing the split."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select((hash_bucket("doc_id", "fold") % 5).alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
