"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir; compare row
count, column names, and order-insensitive values."""
import sys, os
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import numpy as np

import __spark_entry__ as entrymod
from jassjr_spark.session import get_spark

import argparse

_ap = argparse.ArgumentParser(description=__doc__)
_ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
_ap.add_argument("only", nargs="?", default=None,
                 help="comma-separated entry names (default: all)")
_args = _ap.parse_args()
SF_DIR = _args.sf_dir
ONLY = _args.only.split(",") if _args.only else None
if not os.path.isdir(SF_DIR):
    sys.exit(f"sf_dir does not exist: {SF_DIR!r}")

spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

qs, oracles = entrymod.queries(), entrymod.oracle_sql()
if ONLY:
    unknown = [n for n in ONLY if n not in qs]
    if unknown:
        sys.exit(f"unknown entry names (not in queries()): {unknown}")
fails = []
checked = 0
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    checked += 1
    try:
        sdf = fn(spark, SF_DIR).toPandas()
    except Exception as e:
        fails.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
        print(f"{name:24s} SPARK ERROR: {e}")
        continue
    if name not in oracles:
        print(f"{name:24s} rows={len(sdf)} (rows-only check, no oracle)")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE ERROR {type(e).__name__}: {e}"))
        print(f"{name:24s} ORACLE ERROR: {e}")
        continue
    status = []
    if len(sdf) != len(odf):
        status.append(f"rowcount {len(sdf)} vs {len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        status.append(f"cols {scols} vs {ocols}")
    else:
        a = sdf[scols].sort_values(scols).reset_index(drop=True)
        b = odf[ocols].sort_values(ocols).reset_index(drop=True)
        if len(a) == len(b):
            for c in scols:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                        bad = (av.astype(float) != bv.astype(float)).sum()
                        status.append(f"col {c}: {bad} value diffs (exact)")
                else:
                    if not (av.astype(str) == bv.astype(str)).all():
                        bad = (av.astype(str) != bv.astype(str)).sum()
                        status.append(f"col {c}: {bad} value diffs")
            # dtype report
            dt = {c: (str(a[c].dtype), str(b[c].dtype)) for c in scols if str(a[c].dtype) != str(b[c].dtype)}
            if dt:
                status.append(f"dtype diffs {dt}")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"{name:24s} MISMATCH: {'; '.join(status)}")
    else:
        print(f"{name:24s} OK rows={len(sdf)}")

print()
print(f"checked {checked}/{len(qs)} entries")
if checked == 0:
    sys.exit("nothing checked — bad ONLY filter?")
print("FAILURES:" if fails else "ALL MATCH")
for n, s in fails:
    print(" ", n, "->", s)
sys.exit(1 if fails else 0)
