"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 in Spark AND its oracle SQL in DuckDB,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_oracles.py [--window] [query ...]
  --window   check only the first 50 queries() entries — exactly the
             slice the external correctness driver records
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from marc_data_migration_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        "|".join(_norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _norm(v) -> str:
    import math

    if v is None:
        return "<N>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<N>"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def main(only: list[str]) -> int:
    # flags compose with query names: `check_oracles.py --window foo`
    # checks foo only if it sits inside the driver's first-50 window
    window = "--window" in only
    only = [q for q in only if q != "--window"]
    unknown_flags = [q for q in only if q.startswith("--")]
    if unknown_flags:
        raise SystemExit(f"unknown flag(s): {unknown_flags}")
    spark = get_spark("oracle-check", parallelism=CPUS, shuffle_partitions=CPUS)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for i, (name, fn) in enumerate(qs.items()):
        if window and i >= 50:
            break
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(got)} rows (no oracle)")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems:
                _diff_sample(got, want)
        else:
            print(f"ok   {name}: {len(got)} rows match")
    spark.stop()
    return failures


def _diff_sample(got, want):
    cols = sorted(got.columns)
    g = {"|".join(_norm(v) for v in r) for r in got[cols].itertuples(index=False, name=None)}
    w = {"|".join(_norm(v) for v in r) for r in want[cols].itertuples(index=False, name=None)}
    print(f"  cols: {cols}")
    for r in list(g - w)[:3]:
        print(f"  spark-only:  {r}")
    for r in list(w - g)[:3]:
        print(f"  duckdb-only: {r}")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
