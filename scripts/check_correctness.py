#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_correctness.py [sfdir] [outdir]

1. Expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
   (or runs it when outdir is missing), producing one parquet dir per
   query plus oracle_sql.json.
2. Runs each oracle SQL in DuckDB over the same parquet tables.
3. Compares row counts, column names (sorted), and exact values.

Uses driver-side python tools (duckdb/pyarrow) — NOT part of the Scala
library; dev tooling only.
"""
import json
import math
import os
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

# Fail LOUDLY on swapped arguments (r11: (outdir, sfdir) made the
# compare loop vacuous — zero dumps compared still printed "all
# oracle-checked queries match" — and the auto-run below wrote into the
# read-only testdata dir). An sfdir must hold the fixture tables; an
# outdir must never be one.
if not os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
    sys.exit(f"sfdir {SF_DIR} has no documents.parquet — "
             "usage: check_correctness.py <sfdir> <outdir> (in that order)")
if os.path.exists(os.path.join(OUT_DIR, "documents.parquet")) or \
        os.path.abspath(OUT_DIR).startswith("/root/testdata"):
    sys.exit(f"outdir {OUT_DIR} looks like a fixture dir — "
             "usage: check_correctness.py <sfdir> <outdir> (in that order)")

if not os.path.exists(os.path.join(OUT_DIR, "oracle_sql.json")):
    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT_DIR}'],
        check=True)

con = duckdb.connect()
# big ScaleDataGen slices can make a list-heavy oracle spill without
# bound — cap the spill so a runaway query errors instead of filling
# the disk (observed: 54 GB of duckdb_temp at scale30)
con.execute("SET max_temp_directory_size='%s'"
            % os.environ.get("CHECK_TEMP_CAP", "30GB"))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        # driver fixtures are single files; ScaleDataGen slices are
        # Spark-written DIRECTORIES of part files — glob those
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
    oracle = json.load(f)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v


fails = []
compared = 0
# Optional comma-separated name-prefix filter (resume a big sweep past
# a query that errored, or isolate one): CHECK_ONLY=d08,t
only = [p for p in os.environ.get("CHECK_ONLY", "").split(",") if p]
for name in sorted(os.listdir(OUT_DIR)):
    path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(path):
        continue
    if only and not any(name.startswith(p) for p in only):
        continue
    compared += 1
    spark_tbl = pq.read_table(path)
    if name not in oracle:
        print(f"{name:24s} rows={spark_tbl.num_rows:>7} (no oracle)")
        continue
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        # an oracle-side resource failure is NOT a divergence — name it
        # and keep sweeping (a scale30 list-heavy oracle can out-spill
        # the temp cap while every other query compares fine)
        first = (str(e).splitlines() or ["<no message>"])[0]
        fails.append(f"{name}: oracle errored: {type(e).__name__}: {first}")
        print(f"{name:24s} ORACLE ERR")
        continue
    ok = True
    # Arrow-level TYPE parity (the r7 t23 failure class): the driver
    # hashes values column-wise, so a DuckDB decimal128/HUGEINT against
    # a Spark int64 hash-fails even when every value is equal. Compare
    # physical types up front so the mismatch is named, not a mystery.
    for c in duck.column_names:
        if c in spark_tbl.column_names:
            dt, st = str(duck.schema.field(c).type),                 str(spark_tbl.schema.field(c).type)
            if dt != st:
                ok = False
                fails.append(f"{name}: column {c} type duck={dt} spark={st}"
                             " (CAST the oracle or the Spark side)")
    if spark_tbl.num_rows != duck.num_rows:
        ok = False
        fails.append(f"{name}: rows {spark_tbl.num_rows} != {duck.num_rows}")
    s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if s_cols != d_cols:
        # name the one-side-only columns (renamed / unaliased aggregate)
        # instead of just printing both full lists
        only_duck = [c for c in d_cols if c not in s_cols]
        only_spark = [c for c in s_cols if c not in d_cols]
        ok = False
        fails.append(f"{name}: cols differ — oracle-only={only_duck}"
                     f" spark-only={only_spark}"
                     " (alias both sides identically)")
    if ok:
        # driver sorts columns by name, then hashes values; emulate with
        # exact value comparison in result order
        s_rows = list(zip(*[spark_tbl.column(c).to_pylist() for c in s_cols]))
        d_rows = list(zip(*[duck.column(c).to_pylist() for c in d_cols]))
        s_rows = [tuple(norm(v) for v in r) for r in s_rows]
        d_rows = [tuple(norm(v) for v in r) for r in d_rows]
        if s_rows != d_rows:
            ok = False
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows))
                       if a != b) if s_rows and d_rows else 0
            fails.append(
                f"{name}: values differ at row {bad}: "
                f"spark={s_rows[bad] if s_rows else None} "
                f"oracle={d_rows[bad] if d_rows else None}")
    print(f"{name:24s} rows={spark_tbl.num_rows:>7} "
          f"{'OK' if ok else 'MISMATCH'}")

print()
if fails:
    print("FAILURES:")
    for f_ in fails:
        print(" ", f_)
    sys.exit(1)
# A green verdict over ZERO dumps is the r11 swapped-args failure mode:
# never let an empty loop read as success.
if compared == 0:
    sys.exit(f"no query dumps found under {OUT_DIR} — nothing compared")
print(f"all oracle-checked queries match ({compared} compared)")
