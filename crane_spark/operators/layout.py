"""Z-order (Morton-curve) data layout for multi-dimensional scan
pruning.

At 100 TB, which rows share a file decides how much of the table a
filtered scan reads: parquet readers prune row groups by min/max
statistics (and file-level footers prune whole files), and statistics
are only selective when the rows inside each file/row group are CLOSE
in the filtered dimension. Sorting the table by one column makes that
column's stats perfectly selective and every other column's useless;
interleaving the bits of several columns' bucket ranks — the Morton /
Z-order curve (Morton 1966; the layout behind lakehouse
``OPTIMIZE ZORDER`` implementations) — gives every participating
dimension ~k-th-root selectivity at once: with ``files`` output
splits over k dimensions, each split covers roughly a
``files**(-1/k)`` fraction of each dimension's range instead of one
dimension at ``1/files`` and the rest at ``1``.

Division of labor with :mod:`crane_spark.sources.sinks`:
``sinks.write_zordered`` is the WRITE-SIDE consumer (double-normalized
bitwise key, range-partitioned + sorted output; pruning proven from
real footer statistics in tests/test_storage.py and
tests/test_layout.py). This module holds the INTEGER-EXACT key: flat
div/mod arithmetic over uniform bucket ranks, no bit intrinsics, so
the exact same formula is expressible in ANSI SQL and the layout math
is differentially verifiable against DuckDB bit for bit
(queries/layout.zorder_locality). Same curve, two normalizations —
the exact one exists to be testable, the writer's to be cheap.

Beyond-reference extension: the reference engine has no layout
optimizer; this is part of the 100 TB data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INTEGRAL = ("tinyint", "smallint", "int", "bigint", "long")


def morton_expr(bucket_cols: list[str], bits: int, div: str = "div") -> str:
    """SQL fragment interleaving the low ``bits`` bits of each bucket
    column (all non-negative integers < 2**bits) into one Z-value.
    Dimension 0 takes the most significant bit of each interleaved
    group. Pure div/mod/multiply arithmetic — evaluates identically in
    Spark SQL (``div``) and DuckDB (``//``), which is what lets the
    locality query hash-match its oracle bit for bit.

    ``bits * len(bucket_cols)`` must fit a signed BIGINT: the largest
    bit weight is ``2**(bits*k - 1)``, so anything past 62 interleaved
    bits would silently wrap (ADVICE r6) — raises ``ValueError``
    instead. 62 bits is plenty: 8 dimensions x 7 bits (128 buckets
    each) or 4 x 15."""
    k = len(bucket_cols)
    if bits * k > 62:
        raise ValueError(
            f"morton key needs {bits * k} bits ({k} cols x {bits}) but a "
            "BIGINT holds 62 usable — lower bits or drop dimensions "
            "(k-th-root selectivity decays fast past ~4 dims anyway)"
        )
    terms = []
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            weight = 1 << (i * k + (k - 1 - j))
            terms.append(f"((({c} {div} {1 << i}) % 2) * {weight})")
    return "(" + " + ".join(terms) + ")"


def uniform_bucket_expr(
    col: str, mn: str, mx: str, buckets: int, div: str = "div"
) -> str:
    """SQL fragment for the uniform bucket rank of integral ``col``
    within [mn, mx]: ``(col - mn) * buckets div (mx - mn + 1)`` — in
    0..buckets-1 by construction (the +1 keeps col == mx below the
    cap), degenerate single-value ranges land in bucket 0. Operands
    must already be BIGINT to keep the multiply exact."""
    return f"((({col} - {mn}) * {buckets}) {div} ({mx} - {mn} + 1))"


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    extents: dict[str, tuple] | None = None,
    out: str = "_z",
) -> DataFrame:
    """Add a Z-order key column interleaving ``bits`` bits per
    dimension. ``extents`` maps col -> (min, max); when absent they
    are computed in ONE aggregate job over ``df`` (pass them to keep
    construction lazy, e.g. from table statistics). Integral columns
    use exact integer bucketing; fractional columns bucket through
    double arithmetic with a top-bucket cap. NULL dimension values
    land in bucket 0 (NULLS-FIRST placement) instead of propagating
    to a NULL key that would sort the row unplaced (ADVICE r6);
    ``bits * len(cols)`` > 62 raises in :func:`morton_expr` before
    any weight can exceed BIGINT."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (sort the one column instead)")
    if extents is None:
        row = df.agg(
            *[F.min(c).alias(f"_mn_{c}") for c in cols],
            *[F.max(c).alias(f"_mx_{c}") for c in cols],
        ).first()
        extents = {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}
    b = 1 << bits
    dtypes = dict(df.dtypes)
    d = df
    bcols = []
    for c in cols:
        mn, mx = extents[c]
        if mn is None:  # empty input: any constant key is fine
            expr = F.lit(0)
        elif dtypes[c] in _INTEGRAL:
            expr = F.expr(
                uniform_bucket_expr(
                    f"CAST({c} AS BIGINT)", str(int(mn)), str(int(mx)), b
                )
            )
        else:
            span = float(mx) - float(mn)
            if span <= 0:
                expr = F.lit(0)
            else:
                expr = F.least(
                    F.lit(b - 1),
                    F.floor((F.col(c) - F.lit(float(mn))) * b / F.lit(span)),
                )
        bc = f"_zb_{c}"
        d = d.withColumn(bc, F.coalesce(expr.cast("long"), F.lit(0)))
        bcols.append(bc)
    d = d.withColumn(out, F.expr(morton_expr(bcols, bits)))
    return d.drop(*bcols)
