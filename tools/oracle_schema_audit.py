#!/usr/bin/env python3
"""DESCRIBE every registered oracle SQL in DuckDB (no execution) and
emit its result schema as TSV: `name<TAB>col<TAB>duck_type`, or
`name<TAB>!ERROR<TAB>message` when the statement does not plan.

Usage: oracle_schema_audit.py <corpus_dir> <oracle_sql.json>

Driven by OracleSchemaAuditSpec (sbt test) to close the oracle-side
half of the r9 representation-fragility class: a DECIMAL/HUGEINT/FLOAT
final on the DUCKDB side diverges in the driver's pandas compare just
like a Spark-side decimal did. DESCRIBE plans but never executes, so
pinned-oracle corpus guards (error() CTEs) do not fire.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    corpus, sql_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{corpus}/{t}.parquet')")
    oracles = json.load(open(sql_json))
    for name in sorted(oracles):
        try:
            rows = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            for col, typ, *_ in rows:
                print(f"{name}\t{col}\t{typ}")
        except Exception as e:  # noqa: BLE001 - report, let Scala assert
            msg = str(e).replace("\t", " ").replace("\n", " ")
            print(f"{name}\t!ERROR\t{msg}")


if __name__ == "__main__":
    main()
