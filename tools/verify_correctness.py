"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark and,
where an oracle exists, the matching ``oracle_sql()`` in DuckDB over
the same parquet fixtures; compares row-count, schema (canonical
types, column names sorted), and order-insensitive values (floats
compared to 1e-9 relative after sorting rows).

Usage: python tools/verify_correctness.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_dtype(s: pd.Series) -> str:
    import pandas.api.types as pt

    if pt.is_bool_dtype(s):
        return "bool"
    if pt.is_integer_dtype(s):
        return "int"
    if pt.is_float_dtype(s):
        return "float"
    if pt.is_datetime64_any_dtype(s):
        return "timestamp"
    non_null = s.dropna()
    if len(non_null) and isinstance(non_null.iloc[0], (list, np.ndarray)):
        return "list"
    return "str"


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if canon_dtype(df[c]) == "timestamp":
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif canon_dtype(df[c]) == "list":
            df[c] = df[c].map(lambda v: None if v is None else tuple(np.asarray(v).tolist()))
    sort_cols = [c for c in df.columns if canon_dtype(df[c]) != "list"]
    key = df[sort_cols].astype(str) if sort_cols else df.astype(str)
    order = np.lexsort([key[c].to_numpy() for c in reversed(key.columns)])
    return df.iloc[order].reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    a, b = canon_frame(a), canon_frame(b)
    for c in a.columns:
        ta, tb = canon_dtype(a[c]), canon_dtype(b[c])
        if ta != tb:
            return False, f"dtype[{c}] {ta} vs {tb}"
        if ta == "float":
            av, bv = a[c].to_numpy(float), b[c].to_numpy(float)
            tol = 0.0 if os.environ.get("SPARK_GRAFT_STRICT") else 1e-9
            ok = (
                np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)
                if tol == 0.0
                else np.isclose(av, bv, rtol=tol, atol=tol, equal_nan=True)
            )
            if not ok.all():
                i = int(np.argmin(ok))
                return False, f"value[{c}] row {i}: {av[i]} vs {bv[i]}"
        else:
            an = a[c].isna()
            bn = b[c].isna()
            if not (an == bn).all() or not (a[c][~an] == b[c][~bn]).all():
                bad = a[c].astype(str) != b[c].astype(str)
                i = int(np.argmax(bad.to_numpy()))
                return False, f"value[{c}] row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
    return True, ""


def main() -> int:
    import __spark_entry__ as entrymod
    from aws_dms_cdc_data_pipeline_spark.session import get_spark

    spark = get_spark("verify-correctness")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    passed = failed = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failed += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s, rows-only)")
            rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failed += 1
            continue
        ok, why = frames_equal(sdf, odf)
        if ok:
            print(f"PASS  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            passed += 1
        else:
            print(f"FAIL  {name}: {why}")
            failed += 1
    print(f"\n{passed} passed, {failed} failed, {rows_only} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
