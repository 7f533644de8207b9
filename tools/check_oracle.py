#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate: run each oracle_sql
entry in DuckDB over the sfDir parquet tables, compare against the Spark
parquet dumped by graft.Verify (columns sorted by name, rows sorted, values
compared). Not part of the engine -- a local feedback loop only.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft-verify
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return ds.dataset(f"{outdir}/{name}").to_table()

def norm_rows(table):
    cols = sorted(table.column_names)
    pyl = table.select(cols).to_pylist()
    def normval(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v
    rows = [tuple(normval(r[c]) for c in cols) for r in pyl]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_t = con.sql(sql).arrow()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(spark_t)
        dc, dr = norm_rows(duck_t)
        if sc != dc:
            print(f"SCHEMA   {name}: spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            diff_s = [r for r in sr if r not in set(dr)][:3]
            diff_d = [r for r in dr if r not in set(sr)][:3]
            print(f"ROWS     {name}: spark={len(sr)} duck={len(dr)}"
                  f" only_spark={diff_s} only_duck={diff_d}")
            n_fail += 1
        else:
            print(f"OK       {name}: {len(sr)} rows")
            n_pass += 1
    # rows-only queries (no oracle): report row counts
    for name in sorted(set(g.split('/')[-1] for g in glob.glob(f"{outdir}/*"))
                       - set(oracle) - {"oracle_sql.json"}):
        t = load_spark(outdir, name)
        n = t.num_rows if t is not None else -1
        flag = "rows>0" if n > 0 else "EMPTY!"
        print(f"{flag:8} {name}: {n} rows (rows-only check)")
    print(f"\n{n_pass} passed, {n_fail} failed of {len(oracle)} oracle-checked")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
