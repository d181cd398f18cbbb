"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and compare with the
oracle_sql() DuckDB result — row count, column names/types, and an
order-insensitive value hash (floats canonicalized via repr)."""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from top2vec_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])  # optional query names to restrict to
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return repr(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    spark = get_spark(parallelism=8, app_name="verify_entry")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        except Exception:
            pass

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = ONLY - qs.keys()
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        print(f"valid names: {sorted(qs)}")
        sys.exit(2)
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):6d}  (no oracle, rows-only) {elapsed:.1f}s")
            continue
        ddf = con.sql(oracles[name])
        drows = ddf.fetchall()
        dcols = [d[0] for d in ddf.description]
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh, dh = value_hash(srows, scols), value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:24s} {status} rows {len(srows)}/{len(drows)} cols={ok_cols} "
            f"hash {sh}/{dh} {elapsed:.1f}s"
        )
        if status == "FAIL" and len(srows) <= 20:
            print("  spark :", sorted(srows)[:10])
            print("  duckdb:", sorted(drows)[:10])

    if not ONLY:
        # smoke entry()
        e = entrymod.entry(spark)
        n = e.count()
        print(f"entry() rows={n} schema={e.schema.simpleString()}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
