#!/usr/bin/env python3
"""Local oracle harness: replicate the driver's DuckDB compare.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares row count, column names, and values
(rows sorted, columns sorted by name). Exact equality for ints/strings;
exact for floats too (we design queries to be bit-deterministic).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import math

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{out_dir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    try:
        spark_tbl = pq.read_table(pdir)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}")
        fails += 1
        continue
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
        fails += 1
        continue
    # Driver-hash hardening (round-5 lesson): the driver's hash is
    # format-sensitive where Python == is not. Two queries sat at
    # rows+schema+exact-value PASS locally yet hash-FAILed at the driver
    # for two rounds. Reproduce the strict part here:
    #  1) arrow TYPE mismatches with equal values (DuckDB SUM(BIGINT) →
    #     int128/hugeint vs Spark's int64; int vs float where 1 == 1.0)
    #  2) -0.0 vs 0.0 and NaN (== says equal / unordered; formats differ)
    def _norm_type(t):
        t = str(t)
        return {"large_string": "string", "large_binary": "binary"}.get(t, t)
    for c in s_cols:
        st = _norm_type(spark_tbl.schema.field(c).type)
        dt = _norm_type(duck.schema.field(c).type)
        if st != dt:
            print(f"WARN {name}: column '{c}' type spark={st} duck={dt} — "
                  "equal values may still hash-FAIL at the driver; CAST the "
                  "oracle (or emit fixed-point) so types agree")
    for tbl, side in ((spark_tbl, "spark"), (duck, "duck")):
        for c in s_cols:
            vals = tbl.column(c).to_pylist()
            if any(isinstance(v, float) and
                   (math.isnan(v) or (v == 0.0 and math.copysign(1, v) < 0))
                   for v in vals):
                print(f"WARN {name}: {side}.{c} contains NaN/-0.0 — "
                      "hash-unstable across engines")
    if spark_tbl.num_rows != duck.num_rows:
        print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
        fails += 1
        continue

    def norm(tbl):
        rows = []
        cols = [tbl.column(c).to_pylist() for c in s_cols]
        for i in range(tbl.num_rows):
            row = []
            for c in cols:
                v = c[i]
                if isinstance(v, float):
                    v = float(v)
                if isinstance(v, list):
                    v = tuple(round(x, 6) if isinstance(x, float) else x for x in v)
                row.append(v)
            rows.append(tuple(row))
        return sorted(rows, key=repr)

    sr, dr = norm(spark_tbl), norm(duck)
    bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    if bad:
        i = bad[0]
        print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:\n  spark={sr[i]}\n  duck ={dr[i]}")
        fails += 1
    else:
        print(f"PASS {name} ({spark_tbl.num_rows} rows)")

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len([n for n in oracle if not only or n in only])} checked")
sys.exit(1 if fails else 0)
