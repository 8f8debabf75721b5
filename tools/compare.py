#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each Spark
result parquet from the Verify outDir, run the matching oracle SQL in
DuckDB over the same testdata tables, and compare (schema + sorted-row
hash). Usage: compare.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(con, rel_sql):
    """Fetch a relation fully sorted by all columns (by name order), as
    stringified rows -> (schema, rows)."""
    rel = con.sql(rel_sql)
    cols = sorted(rel.columns)
    colrefs = ", ".join(f'"{c}"' for c in cols)
    q = f'SELECT {colrefs} FROM ({rel_sql}) ORDER BY {colrefs}'
    out = con.sql(q)
    schema = [(c, str(t)) for c, t in zip(out.columns, out.types)]
    rows = out.fetchall()
    def fmt(v):
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return schema, [tuple(fmt(v) for v in r) for r in rows]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*")
                   if os.path.isdir(p))
    for name in names:
        spark_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        try:
            s_schema, s_rows = canon(con, spark_sql)
        except Exception as e:
            results[name] = {"status": "SPARK_READ_FAIL", "err": str(e)[:200]}
            continue
        if name not in oracle:
            results[name] = {"status": "NO_ORACLE", "rows": len(s_rows)}
            continue
        try:
            o_schema, o_rows = canon(con, f"SELECT * FROM ({oracle[name]})")
        except Exception as e:
            results[name] = {"status": "ORACLE_FAIL", "err": str(e)[:300]}
            continue
        schema_ok = s_schema == o_schema
        rows_ok = s_rows == o_rows
        if schema_ok and rows_ok:
            results[name] = {"status": "MATCH", "rows": len(s_rows)}
        else:
            diff = {"status": "MISMATCH", "schema_ok": schema_ok,
                    "spark_rows": len(s_rows), "oracle_rows": len(o_rows)}
            if not schema_ok:
                diff["spark_schema"] = s_schema
                diff["oracle_schema"] = o_schema
            else:
                for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                    if a != b:
                        diff["first_diff_idx"] = i
                        diff["spark_row"] = a
                        diff["oracle_row"] = b
                        break
                else:
                    diff["note"] = "prefix equal; row-count differs"
                    if len(s_rows) > len(o_rows):
                        diff["extra_spark"] = s_rows[len(o_rows)][:6]
                    else:
                        diff["extra_oracle"] = o_rows[len(s_rows)][:6]
            results[name] = diff
    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(json.dumps(results, indent=1, default=str))
    print(f"\n== {n_match}/{len(results)} MATCH ==")
    for name, r in results.items():
        if r["status"] != "MATCH":
            print(f"  {name}: {r['status']}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
