"""Sketch- and filter-accelerated corpus operators.

Three scale patterns over the `documents` table, each the fixed-space
twin of an exact operator that already exists in the registry:

* `bloom_contamination` — the contamination check (shared 8-grams with
  the eval set) with a broadcast Bloom filter pruning the training-gram
  stream BEFORE the exact verify join. Same oracle as
  `contamination_check`: the Bloom stage is lossless by construction
  (no false negatives + exact verify of survivors), and the oracle
  proves it.
* `cms_heavy_hitters` — top tokens by count-min-sketch estimate: the
  fixed-space frequency path for when exact per-key counts can't be
  afforded. Estimates are engine-specific only in principle (fixed
  seeds make them deterministic here, but the contract is the CMS
  bound, not equality) -> rows-only; tests/test_sketch_bloom.py proves
  est >= exact and est <= exact + 2N/width per key.
* `span_dedup` — cross-corpus repeated-span removal (CCNet line dedup
  generalized to a token grid), exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.functions.sketches import cms_build, cms_estimate
from crane_spark.functions.text import tokens
from crane_spark.llm.dedup import drop_duplicate_spans
from crane_spark.operators.bloom import build_bloom, filter_might_contain
from crane_spark.queries.core import register
from crane_spark.queries.corpus import CONTAMINATION_SQL
from crane_spark.tables import fan_out, table


@register("bloom_contamination", CONTAMINATION_SQL, tags=("llm", "contamination", "bloom", "sketch"))
def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contamination_check with a Bloom pre-filter: the eval set's
    8-gram hashes fold into a 32 KB bit array, the training-gram
    stream drops definite misses at scan speed (pure JVM bit probes,
    no join), and only the surviving sliver reaches the exact
    broadcast-semi-join that removes Bloom false positives. At 100 TB
    the pruned fraction is ~everything, so the verify join sees a few
    MB; identical results to the unpruned plan — same oracle SQL."""
    docs = table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = 8
    grams = F.expr(
        f"transform(slice(split(text,' '), 1, size(split(text,' ')) - {n - 1}), "
        f"(x, i) -> array_join(slice(split(text,' '), i + 1, {n}), ' '))"
    )
    bench = (
        docs.filter(F.col("doc_id") < 20)
        .select(F.explode(grams).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    bloom = build_bloom(bench, "gh", m_words=4096, k=3)
    train = (
        fan_out(docs.filter(F.col("doc_id") >= 20))
        .select(
            "doc_id",
            (F.size(toks) - (n - 1)).cast("long").alias("n_grams"),
            F.explode(grams).alias("g"),
        )
        .select("doc_id", "n_grams", F.md5("g").alias("gh"))
    )
    survivors = filter_might_contain(train, "gh", bloom, k=3)
    hits = survivors.join(F.broadcast(bench), "gh", "left_semi")
    return hits.groupBy("doc_id").agg(
        F.count_distinct("gh").alias("n_contaminated_grams"),
        (F.count_distinct("gh").cast("double") / F.first("n_grams")).alias(
            "contamination_ratio"
        ),
    )


CMS_TOPK = 20


@register("cms_heavy_hitters", None, tags=("llm", "sketch", "agg", "approx"))
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} corpus tokens by count-min-sketch ESTIMATE: build the
    4x2048 sketch in one exploded hash-aggregate (shuffle is
    sketch-sized), probe each candidate token via broadcast join, rank
    by estimate. The exact twin is `vocab_top_terms`; this is the path
    that still works when per-key exact counts would blow the shuffle
    (the sketch never grows). Rows-only: the contract is the CMS error
    bound, verified against exact counts in tests/test_sketch_bloom.py.
    """
    docs = table(spark, sf_dir, "documents")
    tok = fan_out(docs).select(F.explode(tokens("text")).alias("token"))
    sketch = cms_build(tok, "token")
    cand = tok.distinct()
    est = cms_estimate(cand, sketch, "token")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("est_count"), F.asc("token"))
    return (
        est.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= CMS_TOPK)
    )


SPAN, MIN_DOCS = 16, 2

SPAN_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
         array_to_string(list_slice(toks, i*{SPAN}+1, i*{SPAN}+{SPAN}), ' ') AS span
  FROM t, unnest(range(0, CAST(ceil(len(toks) / CAST({SPAN} AS DOUBLE)) AS BIGINT))) AS u(i)
),
dup AS (
  SELECT span FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= {MIN_DOCS}
),
kept AS (
  SELECT s.doc_id, s.span_idx, s.span FROM spans s ANTI JOIN dup d ON s.span = d.span
)
SELECT doc_id,
       string_agg(span, ' ' ORDER BY span_idx) AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_spans_kept
FROM kept GROUP BY doc_id
"""


@register("span_dedup", SPAN_DEDUP_SQL, tags=("llm", "dedup"))
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus repeated-span removal: every {SPAN}-token grid span
    occurring in >= {MIN_DOCS} distinct documents is dropped from all
    of them; documents reassemble in order. The duplicate-span set is
    one map-side-combined aggregate, broadcast for an anti-join — the
    corpus never shuffles by span (see llm/dedup.drop_duplicate_spans).
    """
    docs = table(spark, sf_dir, "documents")
    return drop_duplicate_spans(docs, span_tokens=SPAN, min_docs=MIN_DOCS)


# --------------------------------------------------------------------
# The full preprocessing funnel, end-to-end in one query
# --------------------------------------------------------------------

LEN_LO, LEN_HI = 120, 520

FUNNEL_SQL = f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id >= 20),
len AS (SELECT * FROM corpus WHERE n_chars BETWEEN {LEN_LO} AND {LEN_HI}),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM len
  ) WHERE rn = 1
),
bench AS (
  SELECT DISTINCT md5(g) AS gh
  FROM (
    SELECT unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+7), ' '))) AS g
    FROM documents WHERE doc_id < 20
  )
),
contaminated AS (
  SELECT DISTINCT doc_id
  FROM (
    SELECT doc_id,
           md5(unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
           i -> array_to_string(list_slice(string_split(text,' '), i, i+7), ' ')))) AS gh
    FROM dedup
  ) t SEMI JOIN bench USING (gh)
),
clean AS (SELECT * FROM dedup ANTI JOIN contaminated USING (doc_id)),
counts AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
m AS (SELECT min(n) AS n_min FROM counts),
mixed AS (
  SELECT d.* FROM clean d JOIN counts c ON d.lang = c.lang CROSS JOIN m
  WHERE {{hb}} < CAST(floor(65536.0 * m.n_min / c.n) AS BIGINT)
)
SELECT stage, n_docs FROM (
  SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM corpus
  UNION ALL SELECT '1_length', count(*) FROM len
  UNION ALL SELECT '2_exact_dedup', count(*) FROM dedup
  UNION ALL SELECT '3_decontaminated', count(*) FROM clean
  UNION ALL SELECT '4_mixed', count(*) FROM mixed
)
"""


from crane_spark.llm.sampling import sql_hash_bucket  # noqa: E402


@register(
    "corpus_funnel",
    FUNNEL_SQL.format(hb=sql_hash_bucket("doc_id", "mix")),
    tags=("llm", "pipeline", "funnel"),
)
def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preprocessing pipeline as ONE lazy plan: length
    filter -> exact dedup (first-doc-wins) -> benchmark
    decontamination (broadcast 8-gram semi-join) -> equal-share
    language mixing, reporting surviving doc counts per stage. Each
    stage is the already-verified operator; this proves they COMPOSE —
    the plan a user would actually run over 100 TB, where every stage
    is a scan-side predicate or broadcast join and the only wide ops
    are the dedup window and the tiny per-stage counts."""
    from pyspark.sql import Window

    from crane_spark.llm.sampling import equal_mixture_sample

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 20)
    lenf = corpus.filter(F.col("n_chars").between(LEN_LO, LEN_HI))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        lenf.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    n = 8
    grams = F.expr(
        f"transform(slice(split(text,' '), 1, size(split(text,' ')) - {n - 1}), "
        f"(x, i) -> array_join(slice(split(text,' '), i + 1, {n}), ' '))"
    )
    bench = (
        docs.filter(F.col("doc_id") < 20)
        .select(F.explode(grams).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )
    train_grams = dedup.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.md5("g").alias("gh")
    )
    contaminated = (
        train_grams.join(F.broadcast(bench), "gh", "left_semi").select("doc_id").distinct()
    )
    clean = dedup.join(contaminated, "doc_id", "left_anti")
    mixed = equal_mixture_sample(clean, "doc_id", "lang", salt="mix")

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("0_raw", corpus)
        .unionByName(stage("1_length", lenf))
        .unionByName(stage("2_exact_dedup", dedup))
        .unionByName(stage("3_decontaminated", clean))
        .unionByName(stage("4_mixed", mixed))
    )
