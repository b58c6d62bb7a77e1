#!/usr/bin/env python3
"""Dev-loop correctness checker mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the corresponding
oracle SQL from oracle_sql.json in DuckDB (with each testdata table registered
as a view), sorts columns by name and rows by all columns, and compares values
exactly. Reports per-query PASS/FAIL with a diff preview.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def connect(sf_dir, threads):
    con = duckdb.connect()
    # bounded memory + disk spill: co-resident JVMs (sbt/Spark just exited)
    # leave the container memory-pressured, and DuckDB's default limit is
    # sized from total system RAM — heavy oracles then die with a spurious
    # "Out of Memory Error: failed to allocate" instead of spilling. Sized
    # from the host (never above half of physical RAM) so a small machine
    # isn't handed a budget bigger than its memory.
    total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
    con.sql(f"SET memory_limit='{max(1, min(8, int(total_gb / 2)))}GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # fewer concurrent allocators: the flake happens in the first run after
    # a big JVM exits, and high thread counts race DuckDB's budget accounting
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main(sf_dir, out_dir):
    con = connect(sf_dir, threads=8)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            try:
                expected = con.sql(sql).df()
            except duckdb.OutOfMemoryException:
                # documented container flake: DuckDB's first run after a big
                # JVM exit can fail one arbitrary allocation despite ample
                # free RAM. Self-heal with one fresh single-threaded retry so
                # the artifact records a verified result, not the flake.
                print(f"WARN {name}: DuckDB OOM — retrying on a fresh "
                      "connection with threads=1")
                rcon = connect(sf_dir, threads=1)
                try:
                    expected = rcon.sql(sql).df()
                finally:
                    rcon.close()
            actual = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            e, a = norm(expected), norm(actual)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(e) != len(a):
                print(f"FAIL {name}: rows {len(a)} != {len(e)}")
                n_fail += 1
                continue
            if len(e) == 0:
                print(f"WARN {name}: EMPTY result (rows=0) — driver wants rows")
            diff_cols = []
            for c in e.columns:
                ec, ac = e[c], a[c]
                if ec.dtype.kind == "f" or ac.dtype.kind == "f":
                    import numpy as np
                    eq = (ec.isna() & ac.isna()) | (ec == ac)
                    if not eq.all():
                        diff_cols.append((c, int((~eq).sum())))
                else:
                    if not ec.astype(str).equals(ac.astype(str)):
                        neq = (ec.astype(str) != ac.astype(str)).sum()
                        diff_cols.append((c, int(neq)))
            if diff_cols:
                print(f"FAIL {name}: value diffs {diff_cols}")
                for c, _ in diff_cols[:2]:
                    mask = ~((e[c].isna() & a[c].isna()) | (e[c].astype(str) == a[c].astype(str)))
                    print("  expected:", e[mask][c].head(3).tolist())
                    print("  actual:  ", a[mask][c].head(3).tolist())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(e)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: exception {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
