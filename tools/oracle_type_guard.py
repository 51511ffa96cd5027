#!/usr/bin/env python3
"""Oracle output-type guard: fail if any SparkEntry.oracleSql query produces
a DuckDB HUGEINT (Arrow decimal128(38,0)) or any other decimal column.

Why: DuckDB widens SUM(BIGINT) window/aggregate results to HUGEINT, which
Arrow serialises as decimal128(38,0); the driver's hash compare then
mismatches against Spark's int64 even when every value is identical. This
bit three separate rounds (q33, z1, d30) — each time a new oracle string
reintroduced an uncast SUM. This guard makes a fourth recurrence a test
failure instead of a red correctness row.

Usage: oracle_type_guard.py <oracle_sql.json> <sfDir>
Prints one line per offending column; exit 1 if any found.
"""
import sys, json, duckdb

oracle_path, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(oracle_path))
bad = 0
for name, sql in sorted(oracle.items()):
    try:
        # LIMIT 0 wrap: plans + resolves the schema without executing the
        # full query, so the guard stays cheap even for heavy oracles.
        schema = con.execute(
            f"SELECT * FROM ({sql.rstrip(';')}) _g LIMIT 0"
        ).fetch_arrow_table().schema
    except Exception as e:
        print(f"FAIL {name}: oracle SQL does not plan: {e}")
        bad += 1
        continue
    for field in schema:
        ts = str(field.type)
        if ts.startswith("decimal"):
            print(f"FAIL {name}: column '{field.name}' is {ts} "
                  f"(uncast HUGEINT/DECIMAL — add ::BIGINT / ::DOUBLE)")
            bad += 1
print(f"checked {len(oracle)} oracles; {bad} offending columns")
sys.exit(1 if bad else 0)
