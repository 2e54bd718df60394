"""Self-check: run every __ray_entry__ query and its DuckDB oracle at a
given sf, compare row count / schema / order-insensitive values (mimics the
driver's CORRECTNESS harness).

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} != {len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"COLS {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.allclose(av.astype(float).fillna(np.nan),
                             bv.astype(float).fillna(np.nan),
                             rtol=0, atol=1e-12, equal_nan=True)
        else:
            ok = av.astype(str).equals(bv.astype(str))
        if not ok:
            bad = (av != bv)
            return f"VALUES differ in col {c} ({int(bad.sum())} rows) e.g. {av[bad].head(3).tolist()} vs {bv[bad].head(3).tolist()}"
    return "OK"


def main():
    import ray
    from ray.data import DataContext

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # data-dependent oracle literals (IVF centroids, VALUES truths) must
    # replay against the SAME sf dir the queries run at
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
    log_cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "raylink", "data_logging.yaml")
    os.environ["RAY_DATA_LOGGING_CONFIG"] = log_cfg
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env={"env_vars": {"RAY_DATA_LOGGING_CONFIG": log_cfg}})
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            fails += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"{name:24s} rows-only: {len(ray_df)} rows  ({dt:.1f}s)")
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"{name:24s} SQL ERROR: {e}")
            fails += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:24s} {verdict}  ({len(ray_df)} rows, {dt:.1f}s)")
        if verdict != "OK":
            fails += 1
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
