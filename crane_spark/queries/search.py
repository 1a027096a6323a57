"""Relevance search, sequence assembly, and list-aggregation queries.

Four capabilities the registry did not yet cover:

* ordered list / string aggregation (``collect_list`` + ``array_sort``
  + ``array_join`` — DuckDB ``string_agg(... ORDER BY ...)``),
* BM25 full-text relevance ranking over the ``documents`` corpus (the
  retrieval scorer a RAG / data-curation pipeline runs before ANN),
* per-user event-path assembly (the "build a training sequence per
  entity" shape: deterministic in-group ordering, one shuffle),
* token-level Shannon entropy (a model-free text-quality signal:
  low-entropy docs are repetitive boilerplate).

Float determinism: every cross-engine sum of doubles goes through
round -> DECIMAL so partial-aggregation order cannot move the result
(see functions/aggregates.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crane_spark.functions.text import tokens
from crane_spark.queries.core import register
from crane_spark.tables import fan_out, table

# --------------------------------------------------------------------
# Ordered list / string aggregation
# --------------------------------------------------------------------

STRING_AGG_SQL = """
SELECT r.r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("string_agg_nations", STRING_AGG_SQL, tags=("agg", "list"))
def q_string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation names per region, sorted and
    comma-joined. ``collect_list`` has nondeterministic arrival order
    under parallel partial aggregation, so the sort happens AFTER
    collection (``array_sort``) — the composed expression is
    order-insensitive and therefore safe under any shuffle plan. The
    group cardinality is tiny; the pattern is the scalable one (one
    hash aggregate, map-side partials carry partial arrays)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        )
    )


# --------------------------------------------------------------------
# BM25 relevance ranking
# --------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")
_K1 = 1.2
_B = 0.75

BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM tok
  WHERE token IN {tuple(_BM25_TERMS)!r}
  GROUP BY doc_id, token
),
df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_K1} + 1.0)
           / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl)),
           6) AS DECIMAL(28, 6)) AS term_score
  FROM tf
  JOIN df ON tf.token = df.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id,
         CAST(sum(term_score) AS DOUBLE) AS score,
         CAST(row_number() OVER (
              ORDER BY sum(term_score) DESC, doc_id) AS BIGINT) AS rank
  FROM scored GROUP BY doc_id
) WHERE rank <= 10
"""


@register("bm25_search", BM25_SQL, tags=("llm", "text", "search", "ranking"))
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed query (terms: spark, hash,
    window). Corpus statistics (doc length, avgdl, N) come from one
    tokenize pass; the term-frequency table filters to the query terms
    BEFORE aggregating, so the shuffled tf relation is query-sized,
    not corpus-sized. df is at most |query| rows and broadcasts; the
    (N, avgdl) scalar rides a broadcast too. At 100 TB the only
    corpus-wide work is the doc-length scan — exactly the part a real
    deployment precomputes once per corpus snapshot — and the scoring
    join touches only docs containing a query term. Per-term scores
    round to 6 decimals then sum as DECIMAL so accumulation order is
    irrelevant; ranking tiebreaks on doc_id.

    The corpus is never exploded: doc length is `size(split(...))` and
    each query term's tf is a codegen'd array-filter count — per-row
    expressions, no (doc, token) shuffle. Only query-matching rows
    (explode of a |query|-element array) leave the scan; measured 3.6s
    -> 1.7s at sf0.1 vs the tokenize-twice formulation."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = tokens("text")
    def term_matcher(term):
        # one-arg factory: a default-arg lambda would make the HOF
        # two-parameter and receive (element, index) instead
        return lambda x: x == F.lit(term)

    base = docs.select(
        "doc_id", F.size(toks).cast("double").alias("dl"), *[
            F.size(F.filter(toks, term_matcher(t))).cast("double").alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    term_structs = F.array(
        *[
            F.struct(F.lit(t).alias("token"), F.col(f"tf_{i}").alias("tf"))
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    tf = (
        base.select("doc_id", "dl", F.explode(term_structs).alias("e"))
        .select("doc_id", "dl", F.col("e.token").alias("token"), F.col("e.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * F.col("tf") * (_K1 + 1.0) / denom, 6)
            .cast("decimal(28,6)")
            .alias("term_score"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(F.sum("term_score").alias("dec_score"))
    # Top-k BEFORE ranking: orderBy+limit plans as TakeOrderedAndProject
    # (per-partition heaps, no global sort), so the single-partition
    # row_number window only ever sees 10 rows — the global-window
    # bottleneck never materializes at scale.
    top = ranked.orderBy(F.desc("dec_score"), F.asc("doc_id")).limit(10)
    w = Window.orderBy(F.desc("dec_score"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", F.col("dec_score").cast("double").alias("score"), "rank")
    )


# --------------------------------------------------------------------
# Per-user event-path assembly
# --------------------------------------------------------------------

EVENT_PATH_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM events
GROUP BY user_id
HAVING count(*) >= 8
"""


@register("event_path_sequences", EVENT_PATH_SQL, tags=("events", "sequence", "list"))
def q_event_path_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence assembly: each user's full event-type path in
    time order, one row per user (users with >= 8 events). The
    classic pre-training shape for behavioral models — group by
    entity, order within group, serialize. One shuffle on user_id;
    ordering is imposed AFTER collection by ``array_sort`` over
    (ts, event_id, event_type) structs (struct comparison is
    lexicographic, and event_id breaks ts ties), so the plan needs no
    sort-within-partitions step and partial aggregation stays
    order-insensitive."""
    events = table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(ordered, lambda s: s.event_type), ">"
            ).alias("path"),
        )
        .filter(F.col("n_events") >= 8)
    )


# --------------------------------------------------------------------
# Token entropy (text-quality signal)
# --------------------------------------------------------------------

ENTROPY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS c
       FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
              CAST(sum(CAST(c AS BIGINT)) AS BIGINT) AS n_tokens
       FROM tf GROUP BY doc_id)
SELECT tf.doc_id,
       dl.n_tokens,
       CAST(round(sum(
         CAST(round(-(tf.c / dl.n) * log2(tf.c / dl.n), 9) AS DECIMAL(28, 9))
       ), 5) AS DOUBLE) AS entropy
FROM tf JOIN dl ON tf.doc_id = dl.doc_id
GROUP BY tf.doc_id, dl.n_tokens
"""


@register("token_entropy", ENTROPY_SQL, tags=("llm", "text", "quality"))
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy per document — boilerplate/repetition
    scoring without a model: entropy far below log2(n_tokens) means a
    few tokens dominate. Single tokenize pass; per-(doc, token)
    counts aggregate map-side before the one shuffle on doc_id.
    Each term's -p*log2(p) contribution rounds to 9 decimals and sums
    as DECIMAL — entropy is a many-term double sum, so this is the
    only way the result is independent of partial-agg order in BOTH
    engines."""
    docs = fan_out(table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    dl = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("long")).alias("n_tokens"),
    )
    p = F.col("c") / F.col("n")
    contrib = F.round(-p * F.log2(p), 9).cast("decimal(28,9)")
    return (
        tf.join(dl, "doc_id")
        .groupBy("doc_id", "n_tokens")
        .agg(F.round(F.sum(contrib), 5).cast("double").alias("entropy"))
    )
