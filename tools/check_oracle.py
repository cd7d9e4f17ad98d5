#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB correctness compare.

For each query dumped by graft.Verify: read the Spark parquet result, run the
oracle SQL in DuckDB over the same sf tables, sort columns by name + rows by
value, and diff. Exact match expected; floats report max-abs-diff so oracle
formulations can be hardened before the driver sees them.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# The driver hashes TYPED results. Empirically (CORRECTNESS_r02) it
# normalizes signed int widths <= 64 bit (Spark INT parquet vs DuckDB BIGINT
# aggregates hash equal) but NOT int128: a DuckDB HUGEINT from SUM(<int>)
# hash-mismatches a value-equal Spark BIGINT. Canonicalize exactly what the
# driver proved it tolerates; everything else (HUGEINT, DECIMAL, unsigned,
# FLOAT vs DOUBLE) stays strict.
_INT64_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def type_map(rel):
    """name -> canonical DuckDB type string (see width note above)."""
    return {c: ("INT64" if str(t) in _INT64_WIDTHS else str(t))
            for c, t in zip(rel.columns, rel.types)}


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    key = lambda t: tuple((v is None, str(v)) for v in t)
    return sorted(cols), sorted(out, key=key)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            o_rel = con.sql(sql)
            o_cols, o_rows = canon(o_rel.fetchall(), o_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}")
            failures += 1
            continue
        s_types, o_types = type_map(spark_rel), type_map(o_rel)
        drift = {c: (s_types[c], o_types[c]) for c in s_types
                 if s_types[c] != o_types[c]}
        if drift:
            print(f"FAIL {name}: type drift (spark, oracle): {drift}")
            failures += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            failures += 1
            continue
        bad = None
        max_f = 0.0
        for a, b in zip(s_rows, o_rows):
            if a == b:
                continue
            ok = True
            for x, y in zip(a, b):
                if x == y or (x is None and y is None):
                    continue
                if isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        continue
                    max_f = max(max_f, abs(x - y))
                    if abs(x - y) > 0:  # exact driver hash ⇒ any diff is a fail
                        ok = False
                else:
                    ok = False
            if not ok and bad is None:
                bad = (a, b)
        if bad:
            print(f"FAIL {name}: first diff\n  spark : {bad[0]}\n  oracle: {bad[1]}"
                  + (f"\n  max float diff {max_f:g}" if max_f else ""))
            failures += 1
        else:
            print(f"OK   {name}: {len(s_rows)} rows")
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
