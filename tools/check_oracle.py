#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under outDir: read spark parquet result, run the oracle
SQL from oracle_sql.json in DuckDB (views over the same parquet tables),
sort columns by name, compare row-by-row values (hash-style exact match).
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    return str(v)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            spark_tbl = pq.read_table(files[0])
        except Exception as e:
            print(f"READERR  {name}: {e}"); n_bad += 1; continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"SQLERR   {name}: {e}"); n_bad += 1; continue
        scols = sorted(spark_tbl.column_names)
        dcols = sorted(duck.column_names)
        if scols != dcols:
            print(f"SCHEMA   {name}: spark={scols} duck={dcols}"); n_bad += 1; continue
        srows = [[norm(spark_tbl.column(c)[i].as_py()) for c in scols]
                 for i in range(spark_tbl.num_rows)]
        drows = [[norm(duck.column(c)[i].as_py()) for c in dcols]
                 for i in range(duck.num_rows)]
        if len(srows) != len(drows):
            print(f"ROWS     {name}: spark={len(srows)} duck={len(drows)}"); n_bad += 1; continue
        # driver hashes values; compare both as-ordered and sorted
        if srows == drows or sorted(srows) == sorted(drows):
            print(f"OK       {name} ({len(srows)} rows)"); n_ok += 1
        else:
            diff = next(i for i in range(len(srows)) if sorted(srows)[i] != sorted(drows)[i])
            print(f"VALUES   {name}: first diff row {diff}:")
            print(f"  spark: {sorted(srows)[diff]}")
            print(f"  duck : {sorted(drows)[diff]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
