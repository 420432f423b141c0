#!/usr/bin/env python3
"""Batch-stem words via PostgreSQL snowball: pg_stem(lang, words) -> dict.

Uses psql as the postgres user with a temp table + COPY for robustness
(words may contain quotes/backslashes). lang is our 2-letter code and
maps to the pure_<lang> dictionary created in the postgres db.
"""
import subprocess, sys, tempfile, os

def pg_stem(lang, words):
    words = list(dict.fromkeys(words))
    with tempfile.NamedTemporaryFile('w', suffix='.txt', delete=False,
                                     encoding='utf-8', dir='/tmp') as f:
        for w in words:
            # COPY text format: escape backslash; words are single tokens
            f.write(w.replace('\\', '\\\\') + '\n')
        inpath = f.name
    os.chmod(inpath, 0o644)
    sql = f"""
SET client_encoding = 'UTF8';
CREATE TEMP TABLE _in(w text);
COPY _in FROM '{inpath}';
\\copy (SELECT w, COALESCE((ts_lexize('pure_{lang}', w))[1], w) FROM _in) TO STDOUT
"""
    with tempfile.NamedTemporaryFile('w', suffix='.sql', delete=False,
                                     encoding='utf-8', dir='/tmp') as f:
        f.write(sql)
        sqlpath = f.name
    os.chmod(sqlpath, 0o644)
    out = subprocess.run(['su', 'postgres', '-c', f'psql -qAt -f {sqlpath}'],
                         capture_output=True, text=True, cwd='/tmp')
    if out.returncode != 0:
        raise RuntimeError(out.stderr)
    res = {}
    for line in out.stdout.splitlines():
        if '\t' in line:
            w, s = line.split('\t', 1)
            res[w.replace('\\\\', '\\')] = s.replace('\\\\', '\\')
    os.unlink(inpath); os.unlink(sqlpath)
    return res

if __name__ == '__main__':
    lang = sys.argv[1]
    words = sys.argv[2:] or [l.strip() for l in sys.stdin if l.strip()]
    for w, s in pg_stem(lang, words).items():
        print(f"{w}\t{s}")
