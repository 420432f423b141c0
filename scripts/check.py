#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sf_dir parquet tables, sorts columns by name and rows by all columns,
and compares values (floats with tolerance).
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    import numpy as np
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, np.ndarray):
                rr.append([x.item() if hasattr(x, "item") else x for x in v])
            elif isinstance(v, float):
                rr.append(round(v, 6))
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def connect(sf_dir):
    con = duckdb.connect()
    # cap the buffer pool well below physical RAM and give it a spill
    # path: at sf1 the heaviest oracle SQL (LSH-clustering fixpoint)
    # otherwise balloons to the default 80%-of-RAM limit and the
    # process never recovers (glibc keeps the peak heap; every later
    # malloc fails) — with a cap it spills to disk and stays healthy
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCKDB_MEMLIMIT", "24GB"))
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # driver testdata ships single files; derived scale-ups (e.g.
        # scratch/sf1 from DeriveSf1) are Spark-written directories
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            # at sf1-scale a single long-lived connection accumulates
            # buffer-pool state across 200+ queries until tiny
            # allocations start failing; retry once on a FRESH
            # connection before declaring an error
            try:
                spark_df = con.execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
                duck_df = con.execute(sql).fetchdf()
            except duckdb.Error:
                con.close()
                con = connect(sf_dir)
                spark_df = con.execute(
                    f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
                duck_df = con.execute(sql).fetchdf()
            # sort columns by name (the driver's normalization)
            s_cols = sorted(spark_df.columns)
            d_cols = sorted(duck_df.columns)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
                n_fail += 1
                continue
            s_rows = norm([tuple(r) for r in spark_df[s_cols].itertuples(index=False)])
            d_rows = norm([tuple(r) for r in duck_df[d_cols].itertuples(index=False)])
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
                n_fail += 1
                continue
            bad = None
            for a, b in zip(s_rows, d_rows):
                if len(a) != len(b) or not all(approx_eq(x, y) for x, y in zip(a, b)):
                    bad = (a, b)
                    break
            if bad:
                print(f"FAIL {name}: first diff spark={bad[0]} duck={bad[1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
