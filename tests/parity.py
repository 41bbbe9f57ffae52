"""Local replica of the driver's DuckDB oracle gate (SURVEY.md §5).

Mirrors the documented comparison: row count + schema + order-insensitive
values. Stricter than the driver where cheap: exact (bitwise for floats)
value equality after canonical ordering — if this passes, any reasonable
hash the driver computes passes too.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from minerva_etl_46_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # strip tz if present, canonicalize to µs-epoch ints (NaT → -2**63)
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            s = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif s.dtype == object:
            s = s.fillna("\x00<NULL>")  # None == None is False elementwise
        out[c] = s
    res = pd.DataFrame(out)
    if len(res):
        res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(
            drop=True
        )
    return res


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    errs: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{key}: rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        errs.append(f"{key}: columns spark={s_cols} duck={d_cols}")
        return errs
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv) | (np.isnan(av.astype("float64")) & np.isnan(bv.astype("float64")))
        else:
            eq = av == bv
        bad = int((~eq).sum())
        if bad:
            idx = int(np.argmax(~eq))
            errs.append(
                f"{key}: col {c}: {bad} mismatched values "
                f"(first at row {idx}: spark={av[idx]!r} duck={bv[idx]!r})"
            )
    return errs
