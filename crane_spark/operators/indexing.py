"""Dense order-preserving integer indexing WITHOUT single-partition
sorts — the DataFrame analogue of RDD ``zipWithIndex``.

The naive dense index, ``row_number().over(Window.orderBy(col))``,
plans as ``Exchange SinglePartition`` + one task sorting every row:
correct at fixture scale, a scale-killer on a 1000-executor cluster
(one straggler sorts the whole table while 999 executors idle). This
module replaces it with the classic two-level construction:

1. hash-bucket rows (``pmod(xxhash64(tiebreak), B)``) — a map-side
   projection, deterministic across runs;
2. rank within each bucket in parallel
   (``row_number over partitionBy(bucket)``) — B concurrent sorts of
   ~n/B rows each;
3. offset each bucket by the total count of the buckets before it.
   Bucket counts are an aggregate output (B rows, or #majors x B with
   a major column) — the prefix sums run over COUNTS, never data
   rows: bucket-level offsets are a bounded driver-side cumsum, and
   major-level offsets either collect (bounded, see below) or fall
   back to a window over the post-aggregate totals.

The resulting index is a deterministic bijection onto 0..n-1 (or
1..n), ordered by (major, bucket, tiebreak). Callers that need a
dense index for ANY total order (random-partner resolution, bitmap
bit positions) use it directly; callers that need a specific MAJOR
order (e.g. PPJoin's rarity ranks ordered by document frequency) pass
``major`` — the order within a major value is bucket-then-tiebreak
rather than plain tiebreak, which is equally deterministic and, for
rank schemes keyed on the major (rarity), semantically equivalent.

Bound on the major-totals collect: if the major column is a COUNT
(dfreq), D distinct values d1<...<dD each achieved by >=1 row imply
sum(counts) >= D(D+1)/2, so D <= sqrt(2 * total occurrences) — e.g.
<= ~4.5M distinct dfreqs at 10^13 corpus tokens, and in practice
(Zipfian counts) orders of magnitude fewer. Above ``major_cap`` the
code falls back to a window cumsum over the D aggregate rows — still
never a data-sized single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_ntile(
    df: DataFrame,
    k: int,
    key: str,
    tiebreaks: list[str],
    out: str = "bucket",
    buckets: int = 64,
    accuracy: int = 10_000,
    checkpoint: bool = False,
) -> DataFrame:
    """SQL ``ntile(k) OVER (ORDER BY key, *tiebreaks)`` — bit-exact
    bucket membership — WITHOUT the data-sized ``Exchange
    SinglePartition`` the window version plans.

    Construction (the RANGE-bucketed variant of :func:`dense_index`;
    hash buckets would scramble the value order, so bucketing here is
    by value range and the global order ``(range_bucket, key,
    tiebreaks)`` equals ``(key, tiebreaks)`` exactly):

    1. one aggregate job sketches ``buckets-1`` approximate cut points
       of ``key`` (``percentile_approx``; accuracy only affects load
       balance, never the result);
    2. each row maps to a range bucket via a codegen'd fold over the
       literal cut array with STRICT ``>`` — ties on ``key`` can
       never split across buckets, so within-bucket ``row_number``
       over ``(key, *tiebreaks)`` composes with bucket offsets into
       the exact global rank;
    3. bucket counts (<= ``buckets`` rows) collect to the driver for
       the offset cumsum AND the total n, making the ntile boundary
       arithmetic pure literals: with ``q, r = divmod(n, k)`` the
       first ``r`` buckets take ``q+1`` rows (ANSI ntile), so
       ``bucket = (rank-1) div (q+1) + 1`` for ranks in the head and
       ``r + (rank-1-r*(q+1)) div q + 1`` for the tail.

    The plan is: one sketch aggregate + one count aggregate + B
    parallel sorts of ~n/B rows — every exchange hash- or
    range-bounded, nothing data-sized in one task. Degenerate key
    distributions (one dominant value) collapse buckets and re-create
    the single big sort; that is inherent to ntile's tiebreak
    semantics, not this construction.

    ``checkpoint=True`` localCheckpoints the (narrow) input so the
    three passes don't recompute an expensive upstream; leave False
    when the input is a bare columnar scan (pushdown makes re-reads
    cheap) or for explain-only paths.
    """
    if k < 1:
        raise ValueError(f"ntile k must be >= 1, got {k}")
    spark = df.sparkSession
    if checkpoint:
        df = df.localCheckpoint(eager=True)
    fracs = [i / buckets for i in range(1, buckets)]
    cuts_row = df.select(
        F.percentile_approx(key, fracs, accuracy).alias("c")
    ).first()
    cuts = sorted({c for c in (cuts_row["c"] or []) if c is not None})
    if cuts:
        # Plain sum-of-whens, not an F.aggregate lambda: a HigherOrder
        # lambda capturing `key` breaks when Catalyst's constraint
        # inference copies the `_rb` definition across the broadcast
        # join below (ATTRIBUTE_NOT_FOUND on the build side). This is
        # a flat codegen'd expression with <= `buckets` terms.
        rb = sum(
            (F.when(F.col(key) > F.lit(c), 1).otherwise(0) for c in cuts),
            start=F.lit(0),
        )
    else:  # empty input or all-null/constant key: one bucket
        rb = F.lit(0)
    d = df.withColumn("_rb", rb)
    cnt = {
        r["_rb"]: r["n"]
        for r in d.groupBy("_rb").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(cnt.values())
    off, acc = [], 0
    for b in sorted(cnt):  # <= `buckets` rows by construction
        off.append((b, acc))
        acc += cnt[b]
    if not off:
        off = [(0, 0)]
    off_df = spark.createDataFrame(off, "_rb int, _off long")
    w = Window.partitionBy("_rb").orderBy(key, *tiebreaks)
    ranked = (
        d.join(F.broadcast(off_df), "_rb")
        .withColumn("_rank", F.col("_off") + F.row_number().over(w))
    )
    q, r = divmod(n, k)
    if q == 0:  # fewer rows than tiles: bucket == rank
        tile = F.col("_rank")
    elif r == 0:
        tile = F.expr(f"(_rank - 1) div {q}") + F.lit(1)
    else:
        head = r * (q + 1)
        tile = (
            F.when(
                F.col("_rank") <= F.lit(head),
                F.expr(f"(_rank - 1) div {q + 1}"),
            ).otherwise(F.lit(r) + F.expr(f"(_rank - 1 - {head}) div {q}"))
            + F.lit(1)
        )
    return ranked.withColumn(out, tile.cast("long")).drop("_rb", "_off", "_rank")


def dense_index(
    df: DataFrame,
    tiebreak: str,
    out: str = "_ix",
    major: str | None = None,
    buckets: int = 256,
    one_based: bool = False,
    major_cap: int = 2_000_000,
) -> DataFrame:
    """Add a dense integer index column ``out`` (0..n-1, or 1..n with
    ``one_based``) to ``df`` without any single-partition data sort.

    Index order is ``(major, hash_bucket(tiebreak), tiebreak)``; rows
    must be unique on ``(major, tiebreak)`` (callers index distinct
    ids / vocabulary rows). ``major``, when given, must be an
    ascending-orderable numeric column (its totals are cumsum'd
    driver-side with Python ``sorted``, which must agree with Spark's
    ascending sort).
    """
    spark = df.sparkSession
    hb = F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(buckets))
    # The input's lineage is typically an expensive aggregate (a
    # vocabulary build, an id distinct); the construction below reads
    # it 2-3 times (bucket counts, major totals, the final indexed
    # join). Checkpoint it ONCE so those passes read executor storage
    # instead of re-running the upstream scan per pass — without this,
    # a caller like zipf_slope re-tokenized its whole corpus three
    # times (measured 3.5x on the query). The copy is the frame being
    # indexed (vocabulary/id-table-sized, exactly what an iterative
    # cluster job would stage); it is freed by the ContextCleaner once
    # the caller's plan is executed and dropped.
    d = df.withColumn("_hb", hb).localCheckpoint(eager=True)
    base = F.lit(1) if one_based else F.lit(0)

    if major is None:
        w = Window.partitionBy("_hb").orderBy(tiebreak)
        cnt = {
            r["_hb"]: r["n"]
            for r in d.groupBy("_hb").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        off, acc = [], 0
        for b in sorted(cnt):  # <= `buckets` rows: bounded by construction
            off.append((b, acc))
            acc += cnt[b]
        off_df = spark.createDataFrame(off, "_hb long, _off long")
        return (
            d.join(F.broadcast(off_df), "_hb")
            .withColumn(out, F.col("_off") + F.row_number().over(w) - 1 + base)
            .drop("_hb", "_off")
        )

    w = Window.partitionBy(major, "_hb").orderBy(tiebreak)
    cnt = d.groupBy(major, "_hb").agg(F.count(F.lit(1)).alias("_n"))
    # exclusive prefix within each major value, ordered by bucket —
    # a PARTITIONED window over aggregate rows (<= buckets per group)
    w_in = (
        Window.partitionBy(major)
        .orderBy("_hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = cnt.withColumn("_woff", F.coalesce(F.sum("_n").over(w_in), F.lit(0)))
    totals = cnt.groupBy(major).agg(F.sum("_n").alias("_t"))
    # One job decides the regime AND fetches the driver-path data:
    # collect at most major_cap+1 total rows — a full result means all
    # majors are in hand (driver cumsum), an overflowing one falls back
    # to the post-aggregate window (the separate count() job this
    # replaces paid a full pass over `totals` just to learn the size).
    fetched = totals.limit(major_cap + 1).collect()
    if len(fetched) <= major_cap:
        rows = {r[major]: r["_t"] for r in fetched}
        moff, acc = [], 0
        for mv in sorted(rows):
            moff.append((mv, acc))
            acc += rows[mv]
        moff_df = F.broadcast(
            spark.createDataFrame(
                moff,
                f"{major} {df.schema[major].dataType.simpleString()}, _moff long",
            )
        )
    else:  # post-aggregate fallback: D rows, never data-sized; size is
        # data-dependent, so no forced broadcast — AQE decides.
        w_m = Window.orderBy(major).rowsBetween(Window.unboundedPreceding, -1)
        moff_df = totals.select(
            major, F.coalesce(F.sum("_t").over(w_m), F.lit(0)).alias("_moff")
        )
    return (
        d.join(within.select(major, "_hb", "_woff"), [major, "_hb"])
        .join(moff_df, major)
        .withColumn(
            out,
            F.col("_moff") + F.col("_woff") + F.row_number().over(w) - 1 + base,
        )
        .drop("_hb", "_woff", "_moff")
    )
