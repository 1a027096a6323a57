"""Regenerate SCALE.md: measured wall-clock of headline queries across
the sf0.001 / sf0.01 / sf0.1 / sf1 ladder (1000x data range), with the
observed growth factor per decade of data.

The point of the artifact: a query whose runtime grows ~linearly (or
sub-linearly, for broadcast/top-k shapes) across three decades of input
is running a plan whose cost is dominated by the data path, not by
fixed overheads or super-linear blowups — the local evidence for the
100 TB design claims in TUNING.md. The sf1 rung (~6M lineitem rows) is
synthesized by tools/make_sfn.py (10x replication of sf0.1 with key
offsets and novel-content document salting); it is generated on demand
into /tmp/crane_sf1. Run: python tools/scaling_report.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crane_spark import get_spark
from crane_spark.queries import REGISTRY

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/crane_sf1")

# Headline queries spanning the operator families, with the scaling
# shape each plan should exhibit (see PLANS.md for the plans). Value =
# (shape, include_at_sf1) — the deliberate-quadratic brute-force oracle
# is excluded from the sf1 rung (400M candidate pairs by design; the
# IVF path is its scale twin and IS measured).
HEADLINERS: dict[str, tuple[str, bool]] = {
    "q1_pricing_summary": ("full-scan agg: linear in lineitem", True),
    "q5_local_supplier_volume": ("star join, broadcast dims: linear in fact", True),
    "q6_revenue_forecast": ("selective pushed-down scan: linear, small constant", True),
    "q18_large_volume": ("fact-fact join + HAVING: linear in lineitem", True),
    "topk_orders": ("TakeOrderedAndProject: linear scan, O(k) merge", True),
    "wordcount": ("explode + count: linear in tokens", True),
    "minhash_lsh_pairs": ("LSH dedup: linear signatures + bucket-local pairs", True),
    "embedding_topk": (
        "brute-force ANN: quadratic pairs by design (IVF is the scale path)",
        False,
    ),
    "ivf_probe_topk": ("IVF probe ANN: linear assign + probed-cell re-rank", True),
    "token_counts": ("tokenize + agg: linear in chars", True),
    "trigram_lm_quality": ("LM score: linear extract, broadcast model", True),
    "rolling_7d_active_users": ("bounded explode + distinct: linear in user-days", True),
    "dedup_clusters": ("LSH -> verify -> components: linear + pair-local", True),
    "prefix_jaccard_join": (
        "exact similarity join, regime-gated (see crossover table below)",
        True,
    ),
    "copurchase_pairs": (
        "basket pair-gen: two shuffles, no join, pair fan-out bounded by basket size",
        True,
    ),
    "corpus_funnel": ("multi-stage pipeline: linear per stage", True),
}


def timed(fn, *args) -> float:
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def similarity_regime_table(spark) -> list[str]:
    """Measure BOTH regimes of the exact similarity self-join on both
    corpus shapes at sf0.01 and sf0.1, with the gate's natural choice
    marked — the measured evidence that the dense/sparse crossover
    lands where the budgets put it."""
    from crane_spark.llm import dedup as D
    from crane_spark.tables import table

    saved = (D._DENSE_PAIR_OPS_BUDGET, D._DENSE_MATRIX_CELLS_BUDGET)
    out = [
        "",
        "## Exact similarity join: dense/sparse regime crossover (measured)",
        "",
        "`prefix_filter_jaccard_pairs` picks per input between a broadcast",
        "bitset popcount-GEMM (dense: small vocabulary, every shingle common,",
        "prefixes all collide) and indexed PPJoin prefix-bucket pairs (sparse:",
        "large vocabulary, rare shingles prune). Both regimes forced on both",
        "corpus shapes, best-of-two seconds; `gate` = the regime the budget",
        "gate selects naturally (pair-ops <= 2e11, matrix cells <= 6e6,",
        "vocab <= 2^24):",
        "",
        "| corpus shape | sf | n_docs | vocab | dense s | sparse s | gate | gate wins? |",
        "|---|---|---|---|---|---|---|---|",
    ]
    try:
        for label, shingle_n, t_num, t_den in (
            ("2-gram t=2/3 (dense vocab — the registered query)", 2, 2, 3),
            ("3-gram t=1/2 (sparse vocab)", 3, 1, 2),
        ):
            for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
                docs = table(spark, sf_dir, "documents")
                from crane_spark.llm.dedup import shingle_tokens

                tok = shingle_tokens(docs, "text", "doc_id", shingle_n)
                n = tok.select("doc_id").distinct().count()
                v = tok.select("token").distinct().count()
                gate_dense = (
                    n * n * v <= saved[0] and n * v <= saved[1] and v <= 2**24
                )
                secs = {}
                for dense in (True, False):
                    D._DENSE_PAIR_OPS_BUDGET = saved[0] if dense else 0
                    D._DENSE_MATRIX_CELLS_BUDGET = saved[1] if dense else 0
                    best = min(
                        timed(
                            lambda: D.prefix_filter_jaccard_pairs(
                                docs, shingle_n=shingle_n, t_num=t_num, t_den=t_den
                            )
                            .write.mode("overwrite")
                            .format("noop")
                            .save()
                        )
                        for _ in range(2)
                    )
                    secs[dense] = best
                gate = "dense" if gate_dense else "sparse"
                wins = (secs[True] <= secs[False]) == gate_dense
                sf = os.path.basename(sf_dir)
                out.append(
                    f"| {label} | {sf} | {n} | {v} | {secs[True]:.2f} "
                    f"| {secs[False]:.2f} | {gate} | {'yes' if wins else 'NO'} |"
                )
    finally:
        D._DENSE_PAIR_OPS_BUDGET, D._DENSE_MATRIX_CELLS_BUDGET = saved
    out += [
        "",
        "Reading: the gate selects the measured winner wherever the margin is",
        "real; a boundary-case row may flip on run-to-run noise (tens of ms at",
        "the crossover point, where both regimes cost the same by definition).",
        "The registered query's corpus is genuinely dense (synthetic",
        "31-word vocabulary -> every 2-gram is common), where prefix filtering",
        "degenerates and the GEMM path is the right plan; the 3-gram shape",
        "crosses the cell budget at sf0.1 and takes the sparse path, which",
        "measures faster there. Corpus-scale inputs always exceed the budgets",
        "and take the indexed sparse path.",
    ]
    return out


def main() -> int:
    spark = get_spark("crane_spark_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet", "_SUCCESS")):
        from tools.make_sfn import build

        build(SF1_DIR)
    ladder = SF_DIRS + [SF1_DIR]

    def run(name: str, sf_dir: str) -> None:
        REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Warm the JVM/codegen/Python-worker paths once.
    run("q6_revenue_forecast", SF_DIRS[0])

    results: dict[str, list[float | None]] = {}
    for name, (_, at_sf1) in HEADLINERS.items():
        row: list[float | None] = []
        for sf_dir in ladder:
            if sf_dir == SF1_DIR and not at_sf1:
                row.append(None)
                continue
            best = min(timed(run, name, sf_dir) for _ in range(2))
            row.append(best)
        results[name] = row

    lines = [
        "# SCALE — measured scaling across the sf ladder",
        "",
        "Generated by `python tools/scaling_report.py` on local[%s]: best-of-two"
        % spark.sparkContext.defaultParallelism,
        "wall-clock per query at sf0.001 / sf0.01 / sf0.1 / sf1 (10x data per",
        "step; lineitem ~6k / ~60k / ~600k / ~6M rows; sf1 synthesized by",
        "tools/make_sfn.py). `x10-N` are the runtime growth factors for each",
        "10x data step — data-bound linear plans show factors well under 10",
        "at the small rungs because fixed per-query overhead (~0.1-0.3 s of",
        "planning + task dispatch) dominates there; the sf0.1 -> sf1 step is",
        "where the data path takes over, and no query may grow FASTER than",
        "its declared shape.",
        "",
        "| query | shape | sf0.001 s | sf0.01 s | sf0.1 s | sf1 s | x10-1 | x10-2 | x10-3 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, (a, b, c, d) in results.items():
        d_s = f"{d:.2f}" if d is not None else "—"
        g3 = f"{d / c:.1f}" if d is not None else "—"
        lines.append(
            f"| {name} | {HEADLINERS[name][0]} | {a:.2f} | {b:.2f} | {c:.2f} "
            f"| {d_s} | {b / a:.1f} | {c / b:.1f} | {g3} |"
        )
    lines += [
        "",
        "Reading: growth factors stay at or below the declared shape for",
        "every query (brute-force `embedding_topk` is the one deliberate",
        "quadratic, kept as the correctness oracle for the ANN paths and",
        "excluded from the sf1 rung). At cluster scale the fixed overhead",
        "amortizes away and the same plans parallelize by partition count —",
        "see TUNING.md for the knob mapping.",
    ]
    lines += similarity_regime_table(spark)
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
        ),
        "w",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print(f"SCALE.md written ({len(results)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
