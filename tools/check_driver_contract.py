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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

qs, oracles = entrymod.queries(), entrymod.oracle_sql()
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
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
print("FAILURES:" if fails else "ALL MATCH")
for n, s in fails:
    print(" ", n, "->", s)
sys.exit(1 if fails else 0)
