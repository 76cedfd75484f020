"""Local replica of the driver's correctness gate: run every queries()[name]
on Spark and its oracle_sql()[name] on DuckDB at the same sf, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from moonlink_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(
                lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v
            )
        elif str(s.dtype).startswith(("int", "Int", "uint")):
            df[c] = s.astype("Int64")
        elif str(s.dtype).startswith("float"):
            df[c] = s.astype("float64")
    key = df.apply(lambda r: tuple(str(x) for x in r), axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        errs.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(spark_df) != len(duck_df):
        errs.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = _norm(spark_df), _norm(duck_df)
    n = min(len(a), len(b))
    for c in a.columns:
        av, bv = a[c].iloc[:n], b[c].iloc[:n]
        if str(av.dtype).startswith("float"):
            bad = ~(np.isclose(av.fillna(np.nan), bv.fillna(np.nan), rtol=0, atol=0, equal_nan=True))
        else:
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        nbad = int(bad.sum())
        if nbad:
            i = int(np.argmax(bad.to_numpy()))
            errs.append(f"col {c}: {nbad} mismatches, first at row {i}: "
                        f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:]) if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )
    spark = get_spark("check_correctness", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failed.append(name)
            continue
        errs = compare(name, sdf, ddf)
        if errs:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"     {e}")
            failed.append(name)
        else:
            tag = " (EMPTY)" if len(sdf) == 0 else ""
            print(f"PASS {name}: {len(sdf)} rows{tag} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failed" if failed else "\nall passed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
