#!/usr/bin/env python3
"""DESCRIBE every oracle SQL through DuckDB (no execution) and print
one line per column: ``TYPE <query> <column> <duckdb_type>``.

Input: path to a JSON file {query_name: oracle_sql} (the exact map
``SparkEntry.oracleSql`` / ``Verify`` dumps) and an sf dir whose
parquet tables back the views. Used by OracleTypeContractSpec to pin
the oracle output-type contract (VARCHAR/BIGINT/DOUBLE/BOOLEAN only,
matching the Spark schema column-for-column) as an sbt test instead
of only a gate inside tools/local_verify.py.

Usage: python3 tools/oracle_describe.py <oracle_sql.json> [sf_dir]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    oracle_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    rc = 0
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(
                f"SELECT column_name, column_type FROM (DESCRIBE {sql})"
            ).fetchall()
        except Exception as e:  # surface as a parse failure line
            print(f"ERR {name} {type(e).__name__}: {e}")
            rc = 1
            continue
        for col, typ in cols:
            print(f"TYPE {name} {col} {typ}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
