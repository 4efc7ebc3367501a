#!/usr/bin/env python3
"""Self-check: run oracle_sql.json in DuckDB against the same parquet tables
and compare with the Verify parquet dumps the way the driver plausibly does
(sort columns by name, sort rows, compare value multisets). Usage:
   python3 tools/check_oracles.py <sfDir> <verifyOut>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            ddb = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        spark = pq.read_table(f"{out_dir}/{name}")
        dcols = sorted(ddb.column_names)
        scols = sorted(spark.column_names)
        if dcols != scols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
            continue
        stypes = {c: str(spark.schema.field(c).type) for c in scols}
        dtypes = {c: str(ddb.schema.field(c).type) for c in dcols}
        if stypes != dtypes:
            print(f"WARN {name}: dtypes spark={stypes} duckdb={dtypes}")
        srows = sorted(tuple(norm(r[c]) for c in scols) for r in spark.to_pylist())
        drows = sorted(tuple(norm(r[c]) for c in dcols) for r in ddb.to_pylist())
        if srows == drows:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            print(f"FAIL {name}: {len(srows)} vs {len(drows)} rows; "
                  f"first diff: {next(((a, b) for a, b in zip(srows, drows) if a != b), ('extra', 'rows'))}")
            failures += 1
    print("failures:", failures)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
