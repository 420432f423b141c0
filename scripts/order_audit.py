#!/usr/bin/env python3
"""ORDER BY totality audit (r12; VERDICT r11 "next round" #3).

Usage: python3 scripts/order_audit.py <verify_out_dir>

For every gate query whose oracle SQL has a top-level ORDER BY, check
that the ordering is TOTAL over the produced rows: whenever two rows
share the full ORDER BY key tuple, they must be identical in every
projected column.  Otherwise their relative order is an engine
implementation detail and the driver's order-sensitive hash is a
latent coin flip (the r11 tpcds_q1 failure mode).

Reads the Spark-side parquet dumps written by graft.Verify (the actual
rows the gate hashes), so the audit is empirical at whatever SF the
dump was made — run it at sf0.01 and sf1, the two gate scales.

Exit 1 if any ordered query has a non-identical tie or an ORDER BY
key that cannot be resolved to a projected column (flagged for manual
review rather than silently skipped).
"""
import json, re, sys
import duckdb


def top_level_order_by(sql):
    """ORDER BY keys of the outermost query, or None. Logic shared
    with OrderTotalitySpec (r13, VERDICT r12 "what's wrong" #2): scan
    tracking paren depth with single-quoted literals skipped — the
    last ORDER BY at depth 0 is top-level, so sort keys containing
    function calls no longer drop a query from the audit. Keys split
    on top-level commas only; a top-level LIMIT/OFFSET ends them."""
    up = sql.upper()
    depth = 0
    i = 0
    found = -1
    while i < len(up):
        c = up[i]
        if c == "'":
            i += 1
            while i < len(up) and up[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and up.startswith("ORDER", i) \
                and re.match(r"ORDER\s+BY", up[i:]):
            found = i
        i += 1
    if found < 0:
        return None
    tail = sql[found:]
    tail = tail[tail.upper().index("BY") + 2:]
    items = [""]
    d = 0
    j = 0
    while j < len(tail):
        c = tail[j]
        if c == "'":
            k = j + 1
            while k < len(tail) and tail[k] != "'":
                k += 1
            items[-1] += tail[j:min(k + 1, len(tail))]
            j = k
        elif c == "(":
            d += 1
            items[-1] += c
        elif c == ")":
            d -= 1
            items[-1] += c
        elif c == "," and d == 0:
            items.append("")
        elif d == 0 and c in "LlOo" \
                and (j == 0 or not re.match(r"[\w]", tail[j - 1])) \
                and re.match(r"(?is)(LIMIT|OFFSET)\b", tail[j:]):
            break
        else:
            items[-1] += c
        j += 1
    keys = []
    for item in items:
        item = item.strip()
        item = re.sub(r"\s+(ASC|DESC)\b", "", item, flags=re.I)
        item = re.sub(r"\s+NULLS\s+(FIRST|LAST)\b", "", item, flags=re.I)
        keys.append(item.strip())
    return keys


def main():
    out_dir = sys.argv[1]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    n_ok = n_bad = n_unordered = 0
    for name, sql in sorted(oracle.items()):
        keys = top_level_order_by(sql)
        if keys is None:
            n_unordered += 1
            continue
        try:
            df_cols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet("
                f"'{out_dir}/{name}/*.parquet')").fetchall()]
        except duckdb.Error as e:
            print(f"SKIP {name}: no dump ({e})")
            continue
        # resolve table qualifiers: ORDER BY a.x orders the projected
        # column x when x is projected unaliased from relation a
        keys = [k.split(".")[-1] if "." in k and k.split(".")[-1] in df_cols
                else k for k in keys]
        unresolved = [k for k in keys if k not in df_cols]
        if unresolved:
            # ORDER BY on an expression / non-projected column: the
            # hash only sees projected columns, so the audit must run
            # on what IS projected — flag for a human to extend the
            # projection or rewrite the key.
            print(f"FAIL {name}: ORDER BY key(s) {unresolved} not in "
                  f"projected columns {df_cols}")
            n_bad += 1
            continue
        key_list = ", ".join(f'"{k}"' for k in keys)
        # rows sharing the full key tuple must be identical rows:
        # distinct full rows per key tuple == 1 everywhere
        bad = con.execute(
            f"""SELECT {key_list}, count(*) AS n
                FROM (SELECT DISTINCT * FROM read_parquet(
                        '{out_dir}/{name}/*.parquet'))
                GROUP BY {key_list} HAVING count(*) > 1
                LIMIT 3""").fetchall()
        if bad:
            print(f"FAIL {name}: ORDER BY ({', '.join(keys)}) is not "
                  f"total — tied keys with differing rows: {bad}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"== ordered: {n_ok} total-order OK, {n_bad} violations; "
          f"{n_unordered} unordered (driver sorts) ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
