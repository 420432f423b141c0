#!/usr/bin/env python3
"""Exact Hungarian snowball stemmer, transcribed from PG 15's
dict_snowball binary (stem fn 0x53550, double/undouble helpers
0x53450/0x534e0, tables in hu_tables.json). Verified vs live PG."""
import json, os

V = set("aeiouáéíóöúüőű")
DIGRAPHS = sorted("cs dzs gy ly ny sz ty zs".split(), key=len, reverse=True)
DOUBLES = sorted("""bb cc ccs dd ff gg ggy jj kk ll lly mm nn nny pp rr
ss ssz tt tty vv zz zzs""".split(), key=len, reverse=True)

_d = json.load(open(os.path.join(os.path.dirname(__file__), "hu_tables.json")))
def tab(name):
    return sorted(_d[name], key=lambda p: len(p[0]), reverse=True)

CASE = tab("case")
CASE_SPECIAL = tab("case_special")
CASE_OTHER = tab("case_other")
PLUR12 = tab("plur_owner12")
OWNED31 = tab("owned31")
OWNER42 = tab("owner42")
PLURAL7 = tab("plural7")


def mark_p1(w):
    n = len(w)
    if not n:
        return n
    if w[0] in V:
        i = 0
        while i < n and w[i] in V: i += 1
        if i >= n:
            return n
        for dg in DIGRAPHS:
            if w.startswith(dg, i):
                return i + len(dg)
        return i + 1
    else:
        i = 0
        while i < n and w[i] not in V: i += 1
        if i >= n:
            return n
        return i + 1


def double(s):
    return any(s.endswith(d) for d in DOUBLES)


def undouble(s):
    return s[:-2] + s[-1]


def stem(w):
    p1 = mark_p1(w)

    def find(table):
        for s, res in table:
            if w.endswith(s):
                return s, res
        return None

    # instrum: al/el, R1, preceded by a double consonant
    if w.endswith("al") or w.endswith("el"):
        if len(w) - 2 >= p1 and double(w[:-2]):
            w = undouble(w[:-2])
    # case (44) -> delete; then fold a remaining final á/é (R1)
    m = find(CASE)
    if m and len(w) - len(m[0]) >= p1:
        w = w[:len(w) - len(m[0])]
        if w.endswith("á") and len(w) - 1 >= p1:
            w = w[:-1] + "a"
        elif w.endswith("é") and len(w) - 1 >= p1:
            w = w[:-1] + "e"
    # case_special: án->a, én->e, ánként->a (R1)
    m = find(CASE_SPECIAL)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("e" if res == 1 else "a")
    # case_other: stul/astul/stül/estül del; ástul->a; éstül->e (R1)
    m = find(CASE_OTHER)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("" if res == 1 else "a" if res == 2 else "e")
    # factive: á/é, R1, preceded by double
    if w.endswith("á") or w.endswith("é"):
        if len(w) - 1 >= p1 and double(w[:-1]):
            w = undouble(w[:-1])
    # plur_owner (12): r1 del, r2 -> e, r3 -> a (R1)
    m = find(PLUR12)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("" if res == 1 else "e" if res == 2 else "a")
    # owned (31): r1 del, r2 -> a, r3 -> e (R1)
    m = find(OWNED31)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("" if res == 1 else "a" if res == 2 else "e")
    # owner (42): r1 del, r2 -> a, r3 -> e (R1)
    m = find(OWNER42)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("" if res == 1 else "a" if res == 2 else "e")
    # plural (7): ák -> a, ék -> e, else del (R1)
    m = find(PLURAL7)
    if m and len(w) - len(m[0]) >= p1:
        s, res = m
        w = w[:len(w) - len(s)] + ("a" if res == 1 else "e" if res == 2 else "")
    return w


if __name__ == "__main__":
    diffs = total = 0
    shown = 0
    for line in open("/tmp/hu_corpus.tsv", encoding="utf-8"):
        word, expect = line.rstrip("\n").split("\t")
        total += 1
        got = stem(word)
        if got != expect:
            diffs += 1
            if shown < 15:
                print(f"DIFF {word!r}: got {got!r} want {expect!r}")
                shown += 1
    print(f"{diffs}/{total} diffs")
