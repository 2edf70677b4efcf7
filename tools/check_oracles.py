"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir; compare
row-count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from crawley_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(srows)} rows, cols={scols}")
            if len(srows) == 0 and name != "robots":
                print(f"  !! WARNING {name}: 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{name:20s} DUCKDB ERROR: {e}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = value_hash(scols, [[r[c] for c in scols] for r in srows])
        dh = value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:20s} {status} rows {len(srows)}/{len(drows)} cols_ok={ok_cols} hash_ok={ok_hash}"
        )
        if not ok_cols:
            print(f"  spark cols: {sorted(scols)}\n  duck cols:  {sorted(dcols)}")
        if ok_cols and ok_count and not ok_hash:
            s_set = {tuple(_norm(r[c]) for c in sorted(scols)) for r in srows}
            d_set = {
                tuple(_norm(v) for v in [r[dcols.index(c)] for c in sorted(dcols)])
                for r in drows
            }
            diff_s = list(s_set - d_set)[:3]
            diff_d = list(d_set - s_set)[:3]
            print(f"  spark-only: {diff_s}\n  duck-only:  {diff_d}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
