"""Local stand-in for the driver's correctness gate: run every queries()
entry against its oracle_sql() on DuckDB at a given sf and compare
row-count + schema + order-insensitive values.  Usage:

    python scripts/verify_queries.py [sf_dir] [name ...]
"""

import sys

import duckdb
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, oss = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = normalize(to_pandas(fn(sf_dir)))
        if name not in oss:
            print(f"{name:28s} rows-only: {len(got)} rows, cols={list(got.columns)}")
            continue
        exp = normalize(con.sql(oss[name]).df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                # dtype-strict: the driver hashes raw values, so int64 vs
                # float64 (or timestamp[s] vs [us]) is a real mismatch.
                pd.testing.assert_frame_equal(got, exp, check_dtype=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0]
                print(f"  value diff: {msg}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{name:28s} {status} rows {len(got)}/{len(exp)} cols_ok={ok_cols}")
            if not ok_cols:
                print(f"   got  cols: {list(got.columns)}\n   want cols: {list(exp.columns)}")
        else:
            print(f"{name:28s} OK   ({len(got)} rows)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
