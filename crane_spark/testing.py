"""Differential-testing helpers: DuckDB oracle connection + exact
DataFrame comparison (shared by tools/check_oracle.py and tests/)."""

from __future__ import annotations

import duckdb
import pandas as pd

from crane_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB with every test table registered as a view, UTC.
    `{name}.parquet` may be a single file (the driver's testdata) or a
    Spark-written DIRECTORY of part files (e.g. the generated sf1 rung
    from tools/make_sfn.py) — glob the parts in the directory case."""
    import os

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for cross-engine compare: columns sorted by name,
    timestamps at us precision, nullable ints as float, rows ordered by
    stringified values (robust to None/NaN in object columns)."""
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            non_null = df[c].dropna()
            if len(non_null) and isinstance(non_null.iloc[0], datetime.date):
                # DATE columns: Spark yields datetime.date, DuckDB
                # yields Timestamps — canonicalize to datetime64[us].
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype).startswith(("Int", "UInt")) or (
            pd.api.types.is_integer_dtype(df[c]) and df[c].isna().any()
        ):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
    order = df.astype(str).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def diff_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Exact comparison (floats bit-equal — the engine guarantees
    order-independent arithmetic). Returns a list of problems, empty
    when the frames match."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [
            f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
        ]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count {len(spark_pdf)} vs {len(duck_pdf)}"]
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]) or pd.api.types.is_float_dtype(d[c]):
            sv, dv = s[c].astype(float), d[c].astype(float)
            eq = (sv == dv) | (sv.isna() & dv.isna())
        else:
            sv = s[c].astype(object).where(s[c].notna(), None)
            dv = d[c].astype(object).where(d[c].notna(), None)
            eq = (sv == dv) | (sv.isna() & dv.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            problems.append(
                f"col {c} differs, e.g. row {bad}: {s[c][bad]!r} vs {d[c][bad]!r}"
            )
    return problems
