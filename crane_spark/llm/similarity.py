"""Embedding similarity search over array<float> columns.

Two tiers, as a 100 TB ANN pipeline needs:

* brute_force_topk — exact cosine top-k: broadcast the (small) query
  set against the candidate corpus; one pass, no index. The
  correctness baseline and the right answer whenever |queries| is
  small relative to the corpus.
* ivf_assign — the IVF building block: assign every vector to its
  nearest centroid. At scale the corpus is partitioned by centroid id
  (cluster-prune at query time: probe only the closest cells), turning
  an O(N) scan into O(N/cells * probes).

All math is JVM higher-order functions over double-cast arrays
(functions.vectors) — deterministic order, no Python, no shuffle for
the score computation itself. Cosines are rounded to 4 decimals and
ranked on the rounded value with an id tiebreaker so results are
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crane_spark.functions.vectors import cosine_similarity, dot, to_double_vec, vec_norm
from crane_spark.tables import fan_out

ROUND_DIGITS = 4


def _with_double_vec(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, to_double_vec(vec_col))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of each query against all candidates
    (excluding self-matches on id). Queries are broadcast."""
    q = _with_double_vec(queries, vec_col, "qv").select(
        F.col(id_col).alias("query_id"), "qv"
    )
    c = _with_double_vec(fan_out(candidates), vec_col, "cv").select(
        F.col(id_col).alias("neighbor_id"), "cv"
    )
    sim = F.round(cosine_similarity(F.col("qv"), F.col("cv")), ROUND_DIGITS)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def cosine_near_dup_pairs(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    All-pairs cosine is O(N^2) — unusable on a real corpus. Instead:
    assign every vector to its nearest centroid (one broadcast pass),
    then compare pairs only WITHIN a cell. Recall is bounded by the
    cell partition (near-identical vectors land in the same cell);
    cost is sum over cells of |cell|^2 instead of N^2.
    Returns (vec_a < vec_b, cosine) with cosine >= threshold.
    """
    assigned = ivf_assign(vectors, centroids, vec_col, id_col, centroid_id_col)
    v = _with_double_vec(vectors, vec_col, "v").select(F.col(id_col), "v")
    # Materialize the assignment + per-vector norm ONCE (localCheckpoint)
    # before the self-join — otherwise Spark recomputes the whole
    # centroid cross-join on both sides. At warehouse scale this step
    # would be a parquet write of the assignment table instead.
    # The norm is computed here (not inside the pair lambda) so each
    # vector is normalized once; the pair score then degenerates to a
    # plain dot product: d multiplies per pair instead of 3d + 2 sqrt.
    cell = (
        assigned.select(id_col, centroid_id_col)
        .join(v, id_col)
        .select(id_col, centroid_id_col, "v", vec_norm(F.col("v")).alias("nrm"))
        .localCheckpoint(eager=True)
    )
    celln = cell.select(
        id_col,
        centroid_id_col,
        F.transform("v", lambda x: x / F.col("nrm")).alias("vn"),
    )
    a = celln.select(
        F.col(id_col).alias("vec_a"), F.col(centroid_id_col), F.col("vn").alias("va")
    )
    b = celln.select(
        F.col(id_col).alias("vec_b"), F.col(centroid_id_col), F.col("vn").alias("vb")
    )
    sim = F.round(dot(F.col("va"), F.col("vb")), ROUND_DIGITS)
    return (
        a.join(b, centroid_id_col)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid.
    Centroids broadcast; ties break on centroid id."""
    v = _with_double_vec(fan_out(vectors), vec_col, "vv").select(F.col(id_col), "vv")
    c = _with_double_vec(centroids, vec_col, "cv").select(
        F.col(centroid_id_col), "cv"
    )
    sim = F.round(cosine_similarity(F.col("vv"), F.col("cv")), ROUND_DIGITS)
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col, centroid_id_col, sim.alias("cosine")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), F.asc(centroid_id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, centroid_id_col, "cosine")
    )


def ivf_probe_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    probes: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """ANN top-k via IVF cell probing — the scale path that replaces
    brute force once the corpus outgrows a full scan.

    Candidates are assigned to their nearest cell once (an index-build
    step; at warehouse scale, a parquet table partitioned by cell).
    Each query probes its `probes` nearest cells and re-ranks exactly
    within them: cost O(|corpus|/cells * probes) per query instead of
    O(|corpus|). Recall < 1 by construction — a neighbor whose cell
    isn't probed is missed — which is the standard IVF tradeoff.

    Scores are dot products of pre-normalized vectors, rounded to 4
    decimals with id tiebreakers (deterministic across engines).
    """
    cand_cells = ivf_assign(candidates, centroids, vec_col, id_col, centroid_id_col)
    cn = _with_double_vec(candidates, vec_col, "cv").select(
        F.col(id_col), vec_norm(F.col("cv")).alias("cnrm"), "cv"
    )
    # Checkpoint BEFORE the normalizing transform: CollapseProject
    # would otherwise inline the norm aggregate into the per-element
    # lambda (d x d interpreted ops per vector).
    cand_raw = (
        cand_cells.select(id_col, centroid_id_col)
        .join(cn, id_col)
        .localCheckpoint(eager=True)
    )
    cand = cand_raw.select(
        F.col(id_col).alias("neighbor_id"),
        centroid_id_col,
        F.transform("cv", lambda x: x / F.col("cnrm")).alias("cvn"),
    )

    q = _with_double_vec(queries, vec_col, "qv").select(
        F.col(id_col).alias("query_id"), "qv"
    )
    c = _with_double_vec(centroids, vec_col, "ctv").select(
        F.col(centroid_id_col), "ctv"
    )
    qsim = F.round(cosine_similarity(F.col("qv"), F.col("ctv")), ROUND_DIGITS)
    wq = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc(centroid_id_col))
    probed = (
        q.crossJoin(F.broadcast(c))
        .select("query_id", "qv", centroid_id_col, qsim.alias("qcos"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= probes)
        .select(
            "query_id",
            centroid_id_col,
            vec_norm(F.col("qv")).alias("qnrm"),
            "qv",
        )
        .select(
            "query_id",
            centroid_id_col,
            F.transform("qv", lambda x: x / F.col("qnrm")).alias("qvn"),
        )
    )

    sim = F.round(dot(F.col("qvn"), F.col("cvn")), ROUND_DIGITS)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(probed), centroid_id_col)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )
