#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare hashes (sorted columns,
sorted rows, exact values)."""
import sys, os, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
# bound DuckDB's memory and give it a spill dir: the generated-corpus
# oracles (sf10 containment's full word join) otherwise grow past RAM
# and get OOM-killed instead of spilling
mem = os.environ.get("GRAFT_DUCKDB_MEM", "48GB")
con.sql(f"SET memory_limit='{mem}'")
con.sql("SET temp_directory='/tmp/duckdb_spill'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver corpora are single files; GenData scale-ups are Spark
    # directories of part files — read either shape
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        results[name] = "MISSING_RESULT"
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ERROR {str(e)[:200]}"
        continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        results[name] = f"SCHEMA_MISMATCH spark={sc} duck={dc}"
        continue
    if len(spark_df) != len(duck_df):
        results[name] = f"ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}"
        continue
    a = spark_df[sc].sort_values(by=sc).reset_index(drop=True)
    b = duck_df[dc].sort_values(by=dc).reset_index(drop=True)
    try:
        import pandas as pd
        eq = a.equals(b)
        if not eq:
            # find first differing cell for diagnostics
            diffs = []
            for c in sc:
                av, bv = a[c], b[c]
                neq = ~(av.eq(bv) | (av.isna() & bv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[{i}]: spark={av[i]!r} duck={bv[i]!r} (dtype {av.dtype}/{bv.dtype})")
            results[name] = "VALUE_MISMATCH " + "; ".join(diffs[:4])
        else:
            results[name] = "OK"
    except Exception as e:
        results[name] = f"CMPERR {str(e)[:200]}"

# rows-only entries (queries without oracle)
for res in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(res.rstrip("/"))
    if name not in oracle and name not in results:
        try:
            n = con.sql(f"SELECT count(*) FROM '{res}/*.parquet'").fetchone()[0]
            results[name] = f"ROWS_ONLY n={n}"
        except Exception as e:
            results[name] = f"ROWS_ONLY_ERR {str(e)[:120]}"

ok = sum(1 for v in results.values() if v == "OK")
for k, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "---- ") + k + ": " + v)
print(f"\n{ok}/{len([k for k in results if k in oracle])} oracle-matched; {len(results)} total")
