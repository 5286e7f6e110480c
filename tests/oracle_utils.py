"""Order-insensitive Spark-vs-DuckDB result comparison, mirroring the
driver's correctness gate (row-count + sorted-by-name columns +
value-level equality)."""

from __future__ import annotations

import datetime as dt
import decimal
import math


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # duckdb fetchdf yields numpy arrays for LIST columns
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _norm_cell(v.item())
    except ImportError:
        pass
    return v


def _rows(records: list[dict], cols: list[str]) -> list[tuple]:
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in records]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def _dtype_kind(series) -> str:
    """Coarse pandas dtype kind: i/u -> 'i', f -> 'f', M -> 'M', else 'O'."""
    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k in "fMmb":
        return k
    return "O"


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        return False, f"column mismatch: spark={s_cols} duck={d_cols}"
    s_records = [row.asDict() for row in spark_df.collect()]
    import pandas as pd

    duck_df = duck_rel.fetchdf()
    # Driver-fidelity dtype gate: the driver canonicalizes BOTH results
    # through pandas and hashes dtype-sensitively, so a Spark BIGINT
    # column against a DuckDB HUGEINT (fetchdf -> float64) fails there
    # even when every value is numerically equal. Mirror that by
    # comparing coarse dtype kinds of the two pandas frames. (A
    # nullable int column with actual NULLs floats on BOTH sides, so
    # kinds still agree — no false alarm.)
    spark_pdf = pd.DataFrame.from_records(s_records, columns=s_cols) if s_records else None
    if spark_pdf is not None and len(duck_df):
        for c in s_cols:
            sk, dk = _dtype_kind(spark_pdf[c]), _dtype_kind(duck_df[c])
            if "O" not in (sk, dk) and sk != dk:
                return False, (
                    f"pandas dtype kind mismatch on {c!r}: spark={spark_pdf[c].dtype} "
                    f"duck={duck_df[c].dtype} — the driver hash will differ even if "
                    "values agree (CAST the oracle column, e.g. HUGEINT -> BIGINT)"
                )
    # astype(object) first: pandas silently re-coerces None back to
    # NaN/NaT inside float/datetime columns otherwise.
    duck_df = duck_df.astype(object).where(pd.notnull(duck_df), None)
    d_records = duck_df.to_dict("records")
    if len(s_records) != len(d_records):
        return False, f"row count: spark={len(s_records)} duck={len(d_records)}"
    s_rows = _rows(s_records, s_cols)
    d_rows = _rows(d_records, d_cols)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if not _row_eq(a, b):
            return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, "ok"


def _cell_eq(x, y) -> bool:
    if x is None or y is None:
        return x is None and y is None
    # Cell-level compare stays value-based (5 == 5.0): column-level
    # dtype mismatches are the compare() dtype gate's job, and a
    # nullable int column legitimately yields int-vs-float cells here.
    if isinstance(x, bool) != isinstance(y, bool):
        return False
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y  # exact: the driver hashes values
    if isinstance(x, tuple) and isinstance(y, tuple):
        return len(x) == len(y) and all(_cell_eq(a, b) for a, b in zip(x, y))
    return x == y


def _row_eq(a: tuple, b: tuple) -> bool:
    return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))
