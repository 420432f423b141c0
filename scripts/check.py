#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate —
DRIVER-STRICT form (r12; VERDICT r11 "what's missing" #2).

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views of the
sf_dir parquet tables, and compares the two results the way the
driver's typed hash does.  The policy below was derived empirically
against CORRECTNESS_r11.json (which queries the driver passed/failed):

  * Rows are SORTED on all columns before comparing.  The driver
    normalizes row order: tpcds_q36/q67 return window-rank ties in
    engine-dependent order yet passed the driver in r11, so its hash
    is computed over sorted rows.  (ORDER BY totality is still
    audited separately — scripts/order_audit.py.)
  * Values are compared EXACTLY — no 1e-9 tolerance, no rounding.
    The lenient compare hid a genuine flake: tpch_q11's
    round(sum(double),4) sat on a half-boundary and flipped its 4th
    digit run-to-run.  Exact compare is what the driver does.
  * Spark-side DECIMAL against oracle-side DOUBLE FAILS even when
    values agree numerically — the r11 TPC-DS failure class (the
    driver reads the Spark parquet natively, keeping Decimal objects,
    while DuckDB results arrive as floats; the typed hash differs).
  * Oracle-side DECIMAL against Spark-side DOUBLE is COERCED to float
    (the driver's DuckDB fetch path coerces decimals; 20 r11-green
    queries — geo areas, agg pushdown — have this shape and pass).
  * Both-DECIMAL compares exact Decimal values; integer widths
    collapse (Python ints are width-agnostic); Spark DATE against
    oracle TIMESTAMP is accepted at midnight (fn_datetime/fn_interval
    have this shape and pass the driver).
"""
import json, math, os, re, sys
from decimal import Decimal
import datetime
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "HUGEINT"}
FLOAT_TYPES = {"FLOAT", "DOUBLE", "REAL"}


def base_type(t):
    t = t.strip().upper()
    if t in INT_TYPES:
        return "INT"
    if t in FLOAT_TYPES:
        return "FLOAT"
    if t.startswith("DECIMAL"):
        return "DECIMAL"
    m = re.fullmatch(r"(.*)\[\]", t)
    if m and m.group(1) in INT_TYPES:
        return "INT[]"
    return t


def col_policy(name, st, dt):
    """Return a value-coercion tag, or an error string on a pairing the
    driver's typed hash rejects."""
    sb, db = base_type(st), base_type(dt)
    if sb == db:
        return "exact"
    if sb == "DECIMAL" and db == "FLOAT":
        return (f"type mismatch on '{name}': spark={st} duck={dt} "
                f"(Spark DECIMAL vs oracle DOUBLE — the r11 failure class; "
                f"CAST the Spark-side expression to DOUBLE)")
    if sb == "FLOAT" and db == "DECIMAL":
        return "duck_to_float"
    if sb == "DATE" and db == "TIMESTAMP":
        return "duck_ts_to_date"
    if sb == "TIMESTAMP" and db == "DATE":
        return "duck_date_to_ts"
    return (f"type mismatch on '{name}': spark={st} duck={dt}")


def coerce(v, tag):
    if v is None:
        return None
    if tag == "duck_to_float":
        return float(v)
    if tag == "duck_ts_to_date":
        if isinstance(v, datetime.datetime):
            if v.time() != datetime.time(0, 0):
                return v  # non-midnight: will compare unequal vs a date
            return v.date()
        return v
    if tag == "duck_date_to_ts":
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return datetime.datetime(v.year, v.month, v.day)
        return v
    return v


def eq(a, b):
    """Exact equality with NaN==NaN and recursive list/dict handling.
    No tolerance."""
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(eq(v, b[k]) for k, v in a.items())
    if isinstance(a, Decimal) and isinstance(b, Decimal):
        return a == b  # value compare; declared widths already checked
    if type(a) is not type(b):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
        if isinstance(a, int) and isinstance(b, int):
            return a == b  # int widths collapse in Python
        return False
    return a == b


def sort_key(row):
    return tuple(str(x) for x in row)


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


def run_one(con, out_dir, name, sql):
    spark_sel = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
    s_desc = con.execute(f"DESCRIBE {spark_sel}").fetchall()
    d_desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    s_rows = con.execute(spark_sel).fetchall()
    d_rows = con.execute(sql).fetchall()
    return s_desc, d_desc, s_rows, d_rows


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
                s_desc, d_desc, s_rows, d_rows = run_one(
                    con, out_dir, name, sql)
            except duckdb.Error:
                con.close()
                con = connect(sf_dir)
                s_desc, d_desc, s_rows, d_rows = run_one(
                    con, out_dir, name, sql)
            s_types = {r[0]: r[1] for r in s_desc}
            d_types = {r[0]: r[1] for r in d_desc}
            s_cols = sorted(s_types)
            d_cols = sorted(d_types)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
                n_fail += 1
                continue
            policies = {}
            err = None
            for c in s_cols:
                p = col_policy(c, s_types[c], d_types[c])
                if p not in ("exact", "duck_to_float", "duck_ts_to_date",
                             "duck_date_to_ts"):
                    err = p
                    break
                policies[c] = p
            if err:
                print(f"FAIL {name}: {err}")
                n_fail += 1
                continue
            if len(s_rows) != len(d_rows):
                print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
                n_fail += 1
                continue
            s_order = [r[0] for r in s_desc]
            d_order = [r[0] for r in d_desc]
            s_idx = [s_order.index(c) for c in s_cols]
            d_idx = [d_order.index(c) for c in d_cols]
            s_proj = [tuple(r[i] for i in s_idx) for r in s_rows]
            d_proj = [tuple(coerce(r[i], policies[c]) for c, i in
                            zip(d_cols, d_idx)) for r in d_rows]
            s_proj.sort(key=sort_key)
            d_proj.sort(key=sort_key)
            bad = None
            for i, (a, b) in enumerate(zip(s_proj, d_proj)):
                if not eq(a, b):
                    bad = (i, a, b)
                    break
            if bad:
                i, a, b = bad
                print(f"FAIL {name}: sorted row {i} differs "
                      f"spark={a} duck={b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_proj)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
