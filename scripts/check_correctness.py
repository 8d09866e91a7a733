"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count + column names + order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
ONLY = set(a for a in sys.argv[1:] if not os.path.isdir(a))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime as dt
    import math

    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        t1 = time.time()
        if name not in oracles:
            results[name] = f"rows-only: {len(srows)} rows ({t1-t0:.1f}s)"
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {type(e).__name__}: {str(e)[:300]}"
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            hs = value_hash(srows, scols)
            ho = value_hash(orows, ocols)
            if hs != ho:
                # find a sample mismatch
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {tuple(norm_cell(r[i]) for i in so) for r in srows}
                oset = {tuple(norm_cell(r[i]) for i in oo) for r in orows}
                extra = list(sset - oset)[:2]
                missing = list(oset - sset)[:2]
                problems.append(f"value-hash mismatch; spark-extra={extra} oracle-extra={missing}")
        results[name] = ("OK" if not problems else "FAIL: " + "; ".join(problems)) + f" [{len(srows)} rows, {t1-t0:.1f}s]"

    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{n_ok}/{len(results)} OK")

    out_json = os.environ.get("CHECK_JSON_OUT")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump({
                "sf_dir": SF,
                "n_ok": n_ok,
                "n_total": len(results),
                "results": {k: results[k] for k in sorted(results)},
            }, f, indent=1)


if __name__ == "__main__":
    main()
