#!/usr/bin/env python3
"""Representation-level oracle audit (dev-only, driver-side python).

The driver's correctness hash is sensitive to the ARROW representation of
each value, not just its numeric value: round 4 flagged three queries whose
values were bit-exact vs DuckDB but whose representations differed
(un-CAST SUM -> decimal128 where Spark emits int64; ROUND(-ln(1.0)) -> -0.0
where Spark emits +0.0). check_oracle.py rounds floats and coerces types, so
it cannot catch that class. This tool can:

  for every query in <verifyOut>/oracle_sql.json with a Spark dump present:
    1. TYPE:    flag any column whose DuckDB arrow type and Spark arrow type
                fall in different comparison families (decimal vs int vs
                float vs string vs ...)  -- decimal128 from an un-CAST
                aggregate is the canonical hit;
    2. SIGNBIT: for float columns, pair rows after the driver's sort
                (columns sorted by name, rows sorted) and flag any pair
                where both values are zero but the IEEE sign bits differ,
                plus any -0.0 appearing on exactly one side.

Exit code 0 = zero hits (safe to commit); 1 = hits printed.

Usage: python3 tools/check_repr.py /root/testdata/sf0.01 /tmp/graft-verify
"""
import sys, json, glob, math, struct
import duckdb
import pyarrow as pa
import pyarrow.dataset as ds

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def family(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def is_neg_zero(v) -> bool:
    return isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0


def sorted_rows(table: pa.Table):
    cols = sorted(table.column_names)
    rows = [tuple(r[c] for c in cols) for c in [cols] for r in
            table.select(cols).to_pylist()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    hits = 0
    checked = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            continue
        spark = ds.dataset(f"{outdir}/{name}").to_table()
        try:
            duck = con.execute(oracle[name]).arrow()
        except Exception as e:  # oracle itself broken -> loud
            print(f"ORACLE-ERR {name}: {e}")
            hits += 1
            continue
        checked += 1
        stypes = {f.name: f.type for f in spark.schema}
        dtypes = {f.name: f.type for f in duck.schema}
        for c in sorted(set(stypes) & set(dtypes)):
            fs, fd = family(stypes[c]), family(dtypes[c])
            if fs != fd:
                print(f"TYPE     {name}.{c}: spark={stypes[c]} ({fs}) "
                      f"duckdb={dtypes[c]} ({fd})")
                hits += 1
        # sign-bit audit over paired sorted rows (float columns only)
        fcols = [c for c in set(stypes) & set(dtypes)
                 if family(stypes[c]) == "float" and family(dtypes[c]) == "float"]
        if fcols and spark.num_rows == duck.num_rows:
            scols, srows = sorted_rows(spark)
            dcols, drows = sorted_rows(duck)
            if scols == dcols:
                idx = {c: scols.index(c) for c in fcols}
                flagged = set()
                for sr, dr in zip(srows, drows):
                    for c, i in idx.items():
                        a, b = sr[i], dr[i]
                        if c in flagged or a is None or b is None:
                            continue
                        if is_neg_zero(a) != is_neg_zero(b) and a == 0.0 \
                                and b == 0.0:
                            print(f"SIGNBIT  {name}.{c}: spark={a!r} "
                                  f"duckdb={b!r} (paired row, zero with "
                                  f"differing sign bit)")
                            flagged.add(c)
                hits += len(flagged)
    print(f"\nchecked {checked} queries; {hits} representation hits")
    return 0 if hits == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
