"""Self-check harness mimicking the driver's correctness gate:
runs each queries() entry and its oracle_sql() side-by-side, compares
row count, schema (sorted column names) and values (rows sorted, exact
for non-floats, 1e-9 for floats).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0 and len(df) == 0:
            # Ray's to_pandas drops columns for 0-row datasets; rebuild
            # the typed empty frame from the dataset schema when known.
            sch = res.schema(fetch_if_missing=True)
            if sch is not None:
                df = pa.schema(list(zip(sch.names, sch.types))).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates from duckdb may come back as datetime.date
            try:
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"schema ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            bad = ~(np.isclose(av, bv, rtol=0, atol=1e-9) | (pd.isna(av) & pd.isna(bv)))
        else:
            bad = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        if bad.any():
            i = int(np.nonzero(bad)[0][0])
            problems.append(f"col {c}: {int(bad.sum())} diffs; first@{i}: ray={av[i]!r} sql={bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="error")
    from edkray import queries as Q

    qs, oracles = Q.queries(), Q.oracle_sql()
    con = duckdb.connect()
    for t in Q._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: sql error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(ray_df)} rows match ({time.time()-t0:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
