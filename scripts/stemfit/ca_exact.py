#!/usr/bin/env python3
"""Exact Catalan snowball stemmer, transcribed from the among tables and
control flow of PG 15's dict_snowball.so (so_extract.py; stem fn at
0x4ce10, tables in ca_tables.json). Verified vs live PG fuzz."""
import json, os

V = set("aeiouàáèéíïòóúü")

_d = json.load(open(os.path.join(os.path.dirname(__file__), "ca_tables.json")))
PRONOUN = sorted(_d["pronoun"], key=lambda p: len(p[0]), reverse=True)
STANDARD = sorted(_d["standard"], key=lambda p: len(p[0]), reverse=True)
VERB = sorted(_d["verb"], key=lambda p: len(p[0]), reverse=True)
RESIDUAL = sorted(_d["residual"], key=lambda p: len(p[0]), reverse=True)

CLEAN = {"à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
         "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": "."}


def mark_regions(w):
    n = len(w)
    r1 = r2 = n
    c = 0
    while c < n and w[c] not in V: c += 1
    if c >= n: return r1, r2
    c += 1
    while c < n and w[c] in V: c += 1
    if c >= n: return r1, r2
    c += 1
    r1 = c
    while c < n and w[c] not in V: c += 1
    if c >= n: return r1, r2
    c += 1
    while c < n and w[c] in V: c += 1
    if c >= n: return r1, r2
    c += 1
    r2 = c
    return r1, r2


def _find(w, table):
    """Longest suffix match; returns (suffix, result) or None."""
    for s, res in table:
        if w.endswith(s):
            return s, res
    return None


def stem(w):
    r1, r2 = mark_regions(w)
    # attached_pronoun: delete iff match start in R1
    m = _find(w, PRONOUN)
    if m and len(w) - len(m[0]) >= r1:
        w = w[:len(w) - len(m[0])]
    # standard_suffix or verb_suffix
    ok = False
    m = _find(w, STANDARD)
    if m:
        s, res = m
        start = len(w) - len(s)
        if res == 1 and start >= r1: w, ok = w[:start], True
        elif res == 2 and start >= r2: w, ok = w[:start], True
        elif res == 3 and start >= r2: w, ok = w[:start] + "log", True
        elif res == 4 and start >= r2: w, ok = w[:start] + "ic", True
        elif res == 5 and start >= r1: w, ok = w[:start] + "c", True
    if not ok:
        m = _find(w, VERB)
        if m:
            s, res = m
            start = len(w) - len(s)
            if res == 1 and start >= r1: w = w[:start]
            elif res == 2 and start >= r2: w = w[:start]
    # residual_suffix
    m = _find(w, RESIDUAL)
    if m:
        s, res = m
        start = len(w) - len(s)
        if res == 1 and start >= r1: w = w[:start]
        elif res == 2 and start >= r1: w = w[:start] + "ic"
    # cleaning
    return "".join(CLEAN.get(ch, ch) for ch in w)


if __name__ == "__main__":
    import random, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from pg_stem import pg_stem
    alpha = list("abcdefghijlmnopqrstuvxyzàáèéìíïòóúüç·'-")
    sufs = [p[0] for p in PRONOUN + STANDARD + VERB + RESIDUAL]
    tot_d = tot = 0
    for seed in range(8):
        rnd = random.Random(seed * 101 + 7)
        words = set()
        while len(words) < 20000:
            n = rnd.randint(1, 6)
            base = "".join(rnd.choice(alpha) for _ in range(n))
            k = rnd.randint(0, 3)
            wd = base + "".join(rnd.choice(sufs) for _ in range(k))
            words.add(wd[:40])
        res = pg_stem("ca", list(words))
        d = [(x, e) for x, e in res.items() if stem(x) != e]
        tot_d += len(d); tot += len(res)
        for x, e in d[:5]:
            print("DIFF", repr(x), "got", repr(stem(x)), "want", repr(e))
        print(f"seed {seed}: {len(d)}/{len(res)}")
    print(f"TOTAL {tot_d}/{tot}")
