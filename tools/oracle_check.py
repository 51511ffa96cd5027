#!/usr/bin/env python3
"""Local differential check mimicking the driver: for each SparkEntry query
output under <outDir>/<name>/, run the oracle SQL from oracle_sql.json in
DuckDB over the same sf tables, sort columns by name, and compare row sets."""
import sys, json, glob, duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:  # one malformed oracle must cost one row, not the gate
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols != wcols:
        print(f"FAIL {name}: cols {gcols} vs {wcols}"); fail += 1; continue
    def canon(tbl, cols):
        rows = [tuple(str(tbl.column(c)[i].as_py()) for c in cols)
                for i in range(tbl.num_rows)]
        return rows  # preserve order: queries carry ORDER BY
    g, w = canon(got, gcols), canon(want, wcols)
    if g == w: print(f"ok   {name}: {len(g)} rows")
    else:
        print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
        for a, b in list(zip(g, w))[:3]:
            if a != b: print(f"  spark={a}\n  duck ={b}")
        fail += 1
sys.exit(1 if fail else 0)
