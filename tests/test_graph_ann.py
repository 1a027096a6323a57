"""Graph-based ANN (llm/graph_ann.py): NN-Descent k-NN graph quality
and beam-search recall against the brute-force oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crane_spark.llm.graph_ann import graph_search_topk, knn_graph_build
from crane_spark.llm.similarity import brute_force_topk
from crane_spark.tables import table


def _clustered_vectors(spark, n_clusters=6, per=20, dim=16):
    """Deterministic well-clustered vectors: cluster c points along
    axis c with small per-point perturbation on a different axis —
    nearest neighbors are overwhelmingly within-cluster."""
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1 + i % (dim - 1)) % dim] = 0.05 + 0.01 * (i % 7)
            rows.append((c * per + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_graph_edges_are_k_best_and_exact_scores(spark):
    vecs = _clustered_vectors(spark)
    edges = knn_graph_build(vecs, k=4, n_iter=2).collect()
    per_src = {}
    for r in edges:
        per_src.setdefault(r["src"], []).append(r)
    n = vecs.count()
    assert len(per_src) == n  # every node keeps a neighborhood
    for src, es in per_src.items():
        assert len(es) <= 4
        cosines = [r["cosine"] for r in sorted(es, key=lambda r: -r["cosine"])]
        assert cosines == sorted(cosines, reverse=True)
    # clustered data: after refinement, essentially all edges stay
    # in-cluster (in-cluster cosine ~0.99 vs cross ~0.1; NN-Descent
    # converges with high probability, not certainty)
    in_cluster = sum(1 for r in edges if r["dst"] // 20 == r["src"] // 20)
    assert in_cluster / len(edges) >= 0.95


def test_knn_graph_eager_regime_matches_lazy(spark, monkeypatch):
    """The build loop's EAGER checkpoint regime (n past the lazy
    ceiling, or reliable_every > 0) must produce the same graph as the
    benched lazy regime. Regression for the r10 dedup-fusion plan: the
    two alias-swapped union branches (dst AS src / src AS dst) carried
    swap-equality alias constraints that crash Catalyst's
    UnionBase.rewriteConstraints ("key not found: dst#N") as soon as
    the round result is eagerly checkpointed — the benched small-n
    path stayed lazy and never saw it."""
    from crane_spark.llm import graph_ann

    vecs = _clustered_vectors(spark)
    lazy = sorted(map(tuple, knn_graph_build(vecs, k=4, n_iter=2).collect()))
    monkeypatch.setattr(graph_ann, "_LAZY_INIT_CKPT_MAX_N", 0)
    eager = sorted(map(tuple, knn_graph_build(vecs, k=4, n_iter=2).collect()))
    assert eager == lazy


def test_nn_descent_improves_over_init(spark):
    """Refinement rounds must not worsen the graph: the summed edge
    cosine (graph 'quality') is monotone non-decreasing from the
    blocked init to the refined graph, and the refined graph recovers
    MORE true top-k edges than the init."""
    vecs = _clustered_vectors(spark)
    exact = brute_force_topk(vecs, vecs, k=4)
    true_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def quality(n_iter):
        e = knn_graph_build(vecs, k=4, n_iter=n_iter, init_cells=3).collect()
        pairs = {(r["src"], r["dst"]) for r in e}
        return sum(r["cosine"] for r in e), len(pairs & true_pairs)

    q0, hits0 = quality(0)
    q2, hits2 = quality(2)
    assert q2 >= q0
    assert hits2 >= hits0
    assert hits2 / len(true_pairs) >= 0.9  # near-exact on clustered data


def test_graph_search_recall_vs_brute_force(spark):
    vecs = _clustered_vectors(spark)
    edges = knn_graph_build(vecs, k=4, n_iter=2)
    queries = vecs.filter(F.col("vec_id") % 17 == 0)
    ann = graph_search_topk(queries, vecs, edges, k=3, beam=8, hops=3).collect()
    exact = brute_force_topk(queries, vecs, k=3).collect()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    assert len(ann_pairs & exact_pairs) / len(exact_pairs) >= 0.8
    # contract: ordering within each query is by cosine desc
    by_q = {}
    for r in sorted(ann, key=lambda r: (r["query_id"], r["rn"])):
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    for cosines in by_q.values():
        assert cosines == sorted(cosines, reverse=True)


def test_graph_search_on_fixture_embeddings(spark, sf_dir):
    """Random fixture embeddings (the hard case for any ANN): the
    search must return exactly k rows per query, only genuine ids,
    and nonzero overlap with the exact answer."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    edges = knn_graph_build(emb, k=6, n_iter=1)
    queries = emb.filter(F.col("vec_id") < 5)
    ann = graph_search_topk(queries, emb, edges, k=3, beam=12, hops=2).collect()
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    per_q = {}
    for r in ann:
        assert r["neighbor_id"] in ids and r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 3 for v in per_q.values())
    exact = brute_force_topk(queries, emb, k=3).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert len(ann_pairs & exact_pairs) > 0


def test_graph_search_with_explicit_entry_nodes(spark):
    """IVF-route tiering: passing one well-placed entry node per
    cluster recovers full recall even with a tiny entry budget the
    strided default could not cover."""
    vecs = _clustered_vectors(spark)
    edges = knn_graph_build(vecs, k=4, n_iter=2)
    queries = vecs.filter(F.col("vec_id") % 17 == 0)
    anchors = vecs.filter(F.col("vec_id") % 20 == 0).select("vec_id")  # one per cluster
    ann = graph_search_topk(
        queries, vecs, edges, k=3, beam=12, hops=4, entry_nodes=anchors
    ).collect()
    exact = brute_force_topk(queries, vecs, k=3).collect()
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    assert len(ann_pairs & exact_pairs) / len(exact_pairs) >= 0.9


def test_knn_graph_persist_reload_roundtrip(spark, tmp_path):
    """The graph index is DATA: persist the edge table as a versioned
    snapshot, reload it cold, and serve a search — identical results
    to querying the freshly-built graph."""
    from crane_spark.sources import versioned as V

    vecs = _clustered_vectors(spark)
    edges = knn_graph_build(vecs, k=4, n_iter=1)
    root = str(tmp_path / "store")
    V.put(edges, root, "knn_edges")
    reloaded = V.get(spark, root, "knn_edges")
    queries = vecs.filter(F.col("vec_id") % 31 == 0)

    def serve(e):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rn"])
            for r in graph_search_topk(queries, vecs, e, k=3, beam=8, hops=2).collect()
        )

    assert serve(reloaded) == serve(edges)


def test_spread_sample_measures_density_when_estimate_is_marginal(spark):
    """ADVICE r4/r5 density gate: a clustered id space whose n/stride
    ESTIMATE passes the gate but whose measured residue-0 count is
    starved must fall back to the hash stride instead of silently
    shrinking the sample to one node."""
    import pyspark.sql.functions as F

    from crane_spark.llm.graph_ann import _spread_sample

    # ids: {0} plus odds 1..79 -> n=41, span=80, stride=10, est=4
    # (passes est*2 >= m for m=8) but only id 0 hits residue 0.
    ids = [0] + list(range(1, 80, 2))
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    out = _spread_sample(df, "vec_id", m=8, n=len(ids))
    cnt = out.count()
    assert cnt >= 4, f"starved sample: {cnt} nodes (old bug returned 1)"


def test_spread_sample_dense_ids_skip_the_extra_count(spark):
    """Comfortably dense layouts (est >= m) keep the single-aggregate
    cost: the value stride is returned without a measuring job and
    still yields exactly m spread nodes."""
    from crane_spark.llm.graph_ann import _spread_sample

    df = spark.range(1000).withColumnRenamed("id", "vec_id")
    sc = spark.sparkContext

    def jobs_during(build):
        group = f"spread_probe_{build.__name__}"
        sc.setJobGroup(group, "count construction jobs")
        build()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setLocalProperty("spark.jobGroup.id", None)
        return n_jobs

    def dense():
        return _spread_sample(df, "vec_id", m=10, n=1000)

    def marginal():
        ids = [0] + list(range(1, 80, 2))
        cdf = spark.createDataFrame([(i,) for i in ids], "vec_id long")
        return _spread_sample(cdf, "vec_id", m=8, n=len(ids))

    # the marginal estimate pays the extra measuring count(); the
    # comfortably dense layout must not
    assert jobs_during(dense) < jobs_during(marginal)
    rows = sorted(r["vec_id"] for r in dense().collect())
    assert len(rows) == 10 and rows[0] == 0 and rows[-1] == 900


def test_routed_assign_no_orphan_super_drops_vectors(spark):
    """Regression: two distinct supers whose cosine rounds to 1.0 at
    ROUND_DIGITS tie in ivf_assign, so WITHOUT structural self-routing
    the larger-id super's anchor routes away (min-id tiebreak) and its
    cell empties — a vector whose own argmax routes to that super was
    then silently dropped by the inner join, losing its blocked init
    edges. _routed_assign must return EVERY input vector exactly once
    and route the tied-super vector into the self-routed cell."""
    import math

    from crane_spark.llm.graph_ann import _normalized, _routed_assign

    theta = 0.009  # cos ~ 0.9999595 -> rounds to 1.0 at 4 decimals
    assert round(math.cos(theta), 4) == 1.0
    phi = 0.8  # round(cos(phi-theta),4)=0.7032 > round(cos(phi),4)=0.6967

    def v(a):
        return [math.cos(a), math.sin(a)]

    rows = [
        (1, v(0.0)),  # super + anchor
        (2, v(theta)),  # super + anchor: ties with super 1 at rounded 1.0
        (3, v(-0.5)),  # plain anchor that routes to super 1 too
        (10, v(phi)),  # routes to super 2 — ORPHANED without self-routing
        (11, v(-0.6)),  # routes to super 1, lands on anchor 3
    ]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = vectors.filter(F.col("vec_id") <= 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    supers = vectors.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("super_id"), "embedding"
    )
    nv = _normalized(vectors, "embedding", "vec_id")
    assigned = _routed_assign(nv, vectors, centroids, supers, "embedding", "vec_id")
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    # every vector present exactly once — the old inner join dropped 10
    assert sorted(got) == [1, 2, 3, 10, 11]
    # the tied super self-routes, so vector 10 lands in super 2's cell
    assert got[10] == 2


def test_knn_graph_build_string_ids_fall_back_to_flat_init(spark, monkeypatch):
    """Non-numeric id columns must never reach _routed_assign (its
    position map and negated-id argmax are integer arithmetic —
    ADVICE r8): with the routed crossover forced to zero, a string-id
    build takes the flat ivf_assign init and still returns a correct
    per-node neighborhood."""
    from crane_spark.llm import graph_ann

    monkeypatch.setattr(graph_ann, "_ROUTED_INIT_EVAL_THRESHOLD", 0)
    vecs = _clustered_vectors(spark).select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    edges = knn_graph_build(vecs, k=4, n_iter=1).collect()
    srcs = {r["src"] for r in edges}
    assert len(srcs) == 120 and all(s.startswith("doc-") for s in srcs)


def test_knn_graph_build_past_ceiling_routes_through_shuffle_level(
    spark, monkeypatch
):
    """Past the anchor-broadcast ceiling the routed init must SUCCEED
    through the third routing level (r9 verdict #2: the r8-r9 gate's
    loud failure became a working path) and produce the bit-identical
    edge set the under-ceiling broadcast level produces."""
    from crane_spark.llm import graph_ann

    monkeypatch.setattr(graph_ann, "_ROUTED_INIT_EVAL_THRESHOLD", 0)
    vecs = _clustered_vectors(spark)
    # init_cells=64 keeps route_supers (sqrt(c)=8) over the routed
    # branch's floor so the forced crossover actually routes
    monkeypatch.setattr(
        graph_ann, "_ANCHOR_BROADCAST_CEILING_BYTES", 128 << 20
    )
    ref = sorted(
        map(tuple, knn_graph_build(vecs, k=4, n_iter=1, init_cells=64).collect())
    )
    monkeypatch.setattr(graph_ann, "_ANCHOR_BROADCAST_CEILING_BYTES", 64)
    got = sorted(
        map(tuple, knn_graph_build(vecs, k=4, n_iter=1, init_cells=64).collect())
    )
    assert got == ref
    assert len({r[0] for r in got}) == 120


def test_cogroup_local_pairs_handles_vectorless_and_unmatched_supers(spark):
    """Third-level edge cases: a super whose anchors attract NO
    vectors emits nothing (its cogroup vector side is empty), and the
    near-max emission never loses a vector — every input vector with
    a matching anchor group appears in the output exactly once after
    the Spark-side argmax."""
    from pyspark.sql import functions as F

    from crane_spark.llm.graph_ann import (
        _argmax_rounded,
        _cogroup_local_pairs,
    )

    # supers 1 and 2; super 2 has an anchor but no routed vectors
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0], 1), (11, [0.8, 0.6], 1), (12, [0.0, 1.0], 1)],
        "vec_id long, nv array<double>, _grp long",
    )
    anchors = spark.createDataFrame(
        [(1, 100, [1.0, 0.0]), (1, 101, [0.0, 1.0]), (2, 200, [0.5, 0.5])],
        "_grp long, centroid_id long, cnv array<double>",
    )
    pairs = _cogroup_local_pairs(vecs, anchors, "vec_id")
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in _argmax_rounded(pairs, "vec_id", "centroid_id").collect()
    }
    # every vector resolved once; no anchor from the vectorless super
    assert sorted(assigned) == [10, 11, 12]
    assert assigned[10] == 100 and assigned[12] == 101
    assert 200 not in set(assigned.values())


def test_routed_assign_shuffle_anchors_parity_and_no_orphans(spark):
    """_routed_assign(shuffle_anchors=True) must return the exact
    assignment the broadcast level returns — including the no-orphan
    invariant's tied-super fixture (every vector present once, the
    tied super self-routed)."""
    import math

    from crane_spark.llm.graph_ann import _normalized, _routed_assign

    theta = 0.009
    phi = 0.8

    def v(a):
        return [math.cos(a), math.sin(a)]

    rows = [(1, v(0.0)), (2, v(theta)), (3, v(-0.5)), (10, v(phi)), (11, v(-0.6))]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = vectors.filter(F.col("vec_id") <= 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    supers = vectors.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("super_id"), "embedding"
    )
    nv = _normalized(vectors, "embedding", "vec_id")
    bcast = {
        r["vec_id"]: r["centroid_id"]
        for r in _routed_assign(
            nv, vectors, centroids, supers, "embedding", "vec_id"
        ).collect()
    }
    shuf = {
        r["vec_id"]: r["centroid_id"]
        for r in _routed_assign(
            nv,
            vectors,
            centroids,
            supers,
            "embedding",
            "vec_id",
            shuffle_anchors=True,
        ).collect()
    }
    assert shuf == bcast
    assert sorted(shuf) == [1, 2, 3, 10, 11] and shuf[10] == 2

    # larger clustered parity: 120 vectors, both levels identical
    vecs = _clustered_vectors(spark)
    nv2 = _normalized(vecs, "embedding", "vec_id")
    from crane_spark.llm.graph_ann import _spread_sample

    cents = _spread_sample(vecs, "vec_id", 16, 120).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    sups = _spread_sample(cents, "centroid_id", 4, 16).select(
        F.col("centroid_id").alias("super_id"), "embedding"
    )
    a = sorted(
        map(
            tuple,
            _routed_assign(nv2, vecs, cents, sups, "embedding", "vec_id").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            _routed_assign(
                nv2, vecs, cents, sups, "embedding", "vec_id", shuffle_anchors=True
            ).collect(),
        )
    )
    assert a == b
