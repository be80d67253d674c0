"""Local mirror of the driver's DuckDB differential-oracle check.

Runs each ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` SQL
over the same parquet, then compares row-count + column names + values
order-insensitively. Floats compare with a tight absolute+relative
tolerance (the queries themselves round aggregates, so any real drift is a
bug, not FP noise).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(
    sf_dir: str,
    temp_directory: str | None = None,
    memory_limit: str | None = None,
) -> duckdb.DuckDBPyConnection:
    """Oracle connection over the SF dir's parquet views.

    ``temp_directory``/``memory_limit`` tune spill behavior for the
    heavy assurance sweeps (VERDICT r10 #4: the sf1.0dx stepwise graph
    oracles spilled past the volume's free space on their first pass
    under DuckDB's defaults — an explicit high memory_limit keeps the
    recursive joins in RAM, and an explicit temp_directory makes any
    residual spill land somewhere inspectable/cleanable). The driver's
    own oracle runs at sf0.01 and never needs either.
    """
    import os

    con = duckdb.connect()
    if temp_directory:
        os.makedirs(temp_directory, exist_ok=True)
        con.execute(f"SET temp_directory='{temp_directory}'")
    if memory_limit:
        con.execute(f"SET memory_limit='{memory_limit}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # unify int32/int64 for compare
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):

            def _canon_array(v):
                if v is None:
                    return None
                try:  # numeric arrays: round for fp-tolerant compare
                    return tuple(np.round(np.asarray(v, dtype="float64"), 6))
                except (ValueError, TypeError):  # string/struct arrays: as-is
                    return tuple(np.asarray(v).tolist())

            df[c] = s.map(_canon_array)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used for the strict driver-parity check."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamptz" if getattr(s.dtype, "tz", None) is not None else "timestamp"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    return "object"


def dtype_mismatches(sp: pd.DataFrame, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Strict raw-dtype comparison mirroring the driver's schema/hash check.

    The driver hashes raw values, so DuckDB HUGEINT→float64 vs Spark int64,
    or TIMESTAMPTZ vs naive timestamp, fail there even when every value is
    equal. Round 1 shipped 3 such reds because _canon masked them — this
    check makes local runs predict the driver (VERDICT.md round 1).
    """
    errs: list[str] = []
    for c in sorted(set(sp.columns) & set(duck_df.columns)):
        ks, kd = _dtype_kind(sp[c]), _dtype_kind(duck_df[c])
        if ks != kd:
            errs.append(
                f"{name}.{c}: raw dtype class differs spark={ks}({sp[c].dtype}) "
                f"duck={kd}({duck_df[c].dtype}) — would fail the driver's hash "
                f"even if values match; cast the oracle SQL"
            )
    return errs


def compare(spark_df, duck_df: pd.DataFrame, name: str, float_tol: float = 1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return [f"{name}: columns differ spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"]
    if len(sp) != len(duck_df):
        return [f"{name}: row count spark={len(sp)} duck={len(duck_df)}"]
    errs.extend(dtype_mismatches(sp, duck_df, name))
    a, b = _canon(sp), _canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.isclose(av.fillna(np.nan), bv.fillna(np.nan), rtol=float_tol, atol=float_tol, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                errs.append(f"{name}.{c}: {int((~ok).sum())} float mismatches, e.g. row {i}: {av.iloc[i]} vs {bv.iloc[i]}")
        else:
            eq = (av.fillna("<NULL>") == bv.fillna("<NULL>")) if av.dtype == object else (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                i = int(np.argmin(eq.values))
                errs.append(f"{name}.{c}: {int((~eq).sum())} mismatches, e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return errs
