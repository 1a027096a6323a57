"""Iterative algorithms with exact oracles.

The reference computes ONE PageRank contribution round
(page_rank_topology.py:22-38); here the full iterative loop runs as a
driver-side DataFrame iteration (SURVEY.md §4 custom-work item 1) and
is verified against a DuckDB RECURSIVE CTE executing the identical
recursion — per-iteration contribution sums routed through
DECIMAL(38,12) on both engines so five rounds of float arithmetic stay
bit-identical.

Semantics note (shared by engine and oracle by construction): after
iteration 1 the rank set is the vertices with >=1 inbound edge; the
nation graph used here is dense enough that this equals the full vertex
set (asserted in tests). Damping 0.85, rank_0 = 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crane_spark.queries.core import register
from crane_spark.tables import table

N_ITER = 5
RESET = 0.15
DAMP = 0.85

PAGERANK_ITER_SQL = f"""
WITH RECURSIVE
edges AS (
  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
verts AS (
  -- NB: inside a WITH RECURSIVE block DuckDB 1.0 does NOT dedupe a
  -- bare `a UNION b` CTE (it parses as the recursive-union form);
  -- the DISTINCT wrapper is required for correct vertex seeding.
  SELECT DISTINCT vid
  FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst AS vid FROM edges)
),
pr AS (
  SELECT 0 AS iter, vid, CAST(1.0 AS DOUBLE) AS rank FROM verts
  UNION ALL
  SELECT pr.iter + 1, e.dst AS vid,
         CAST({RESET} AS DOUBLE) + CAST({DAMP} AS DOUBLE) *
           CAST(SUM(CAST(pr.rank / d.outdeg AS DECIMAL(38,12))) AS DOUBLE)
  FROM pr
  JOIN edges e ON pr.vid = e.src
  JOIN deg d ON e.src = d.src
  WHERE pr.iter < {N_ITER}
  GROUP BY pr.iter, e.dst
)
SELECT vid, rank FROM pr WHERE iter = {N_ITER}
"""


@register("pagerank_5iter_nations", PAGERANK_ITER_SQL, tags=("iterative", "join", "agg"))
def q_pagerank_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank iterations over the nation trade graph
    (edges: customer-nation -> supplier-nation through orders)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    edges = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
        # Materialize: the nation graph is ~625 edges, but every loop
        # iteration's nested plan would otherwise re-derive it from the
        # 600k-row fact join (exchange reuse only partly saves it).
        # Lazy (r11): the scale-gate count below is the first action
        # and materializes the frame inside its own job.
        .localCheckpoint(eager=False)
    )
    # Scale-adaptive (same policy as operators/graph.py union-find):
    # deriving the graph from the fact tables is the genuinely
    # distributed work; the ITERATION runs over the aggregated graph,
    # which for nation-level rollups is tiny. When it fits in one
    # partition, 5 rounds of join+agg are 10+ jobs of pure scheduler
    # barriers over ~625 rows — run the whole loop in one Arrow task
    # with bit-identical decimal quantization instead. The DataFrame
    # loop below remains the path for graphs that don't fit.
    if edges.count() < 100_000:
        return _local_pagerank(edges, N_ITER)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    verts = edges.select(F.col("src").alias("vid")).union(
        edges.select(F.col("dst"))
    ).distinct()
    ranks = verts.select("vid", F.lit(1.0).alias("rank"))
    edges_deg = edges.join(deg, "src")
    for _ in range(N_ITER):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.vid)
            .select(
                F.col("dst"),
                (F.col("rank") / F.col("outdeg")).cast("decimal(38,12)").alias("contrib"),
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(
                (
                    F.lit(RESET) + F.lit(DAMP) * F.sum("contrib").cast("double")
                ).alias("rank")
            )
        )
    return ranks


def _local_pagerank(edges: DataFrame, n_iter: int) -> DataFrame:
    """All n_iter rounds in one partition-local task, numerically
    identical to the distributed loop: per-edge contribution =
    HALF_UP-quantize(rank/outdeg) to 12 decimal places (Spark's
    cast(double AS decimal(38,12)) goes through the double's shortest
    decimal repr — Decimal(repr(x)) reproduces it), exact decimal sum,
    then rank = 0.15 + 0.85 * float(sum) in IEEE double. After round
    one the rank set is the vertices with inbound edges, exactly as the
    inner-join/groupBy(dst) loop computes."""
    import pandas as pd

    vtype = edges.schema["dst"].dataType.simpleString()

    def run(batches):
        from collections import Counter, defaultdict
        from decimal import ROUND_HALF_UP, Decimal

        q12 = Decimal(1).scaleb(-12)
        elist: list = []
        for pdf in batches:
            elist.extend(zip(pdf["src"], pdf["dst"]))
        outdeg = Counter(s for s, _ in elist)
        rank = {v: 1.0 for e in elist for v in e}
        for _ in range(n_iter):
            sums: dict = defaultdict(lambda: Decimal(0))
            for s, d in elist:
                if s in rank:
                    sums[d] += Decimal(repr(rank[s] / outdeg[s])).quantize(
                        q12, ROUND_HALF_UP
                    )
            rank = {d: RESET + DAMP * float(t) for d, t in sums.items()}
        verts = sorted(rank)
        yield pd.DataFrame({"vid": verts, "rank": [rank[v] for v in verts]})

    return edges.coalesce(1).mapInPandas(run, f"vid {vtype}, rank double")


TRIANGLE_SQL = """
WITH e AS (
  SELECT a.n_regionkey AS rk, a.n_nationkey AS s, b.n_nationkey AS d
  FROM nation a
  JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
)
SELECT CAST(e1.rk AS BIGINT) AS regionkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.d = e2.s AND e1.rk = e2.rk
JOIN e e3 ON e1.s = e3.s AND e2.d = e3.d
GROUP BY e1.rk
"""


@register("triangle_count_regions", TRIANGLE_SQL, tags=("graph", "join"))
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting via wedge join (operators/graph.triangle_count)
    on the same-region nation graph — each region is a 5-clique, so
    every region closes C(5,3)=10 triangles; the oracle enumerates the
    same 3-way self-join in SQL."""
    from crane_spark.operators.graph import triangle_count

    nation = table(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_regionkey").alias("rk"),
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
    )
    tri = triangle_count(edges)
    rk = edges.select(F.col("src").alias("a"), "rk").distinct()
    return (
        tri.join(rk, "a")
        .groupBy(F.col("rk").cast("long").alias("regionkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
