#!/usr/bin/env python3
"""Exact Basque snowball stemmer, transcribed from the among tables and
control flow of PG 15's dict_snowball.so (so_extract.py; stem fn at
0x4c840, tables in eu_tables.json). Verified vs live PG fuzz.

Structure: Spanish-style RV + p1/p2 marks, then backwards with a
NON-resetting cursor: repeat aditzak, repeat izenak, do adjetiboak.
slice_from keeps the cursor at the match start, so replacement text is
protected from further stripping (modeled with the (word, e) pair)."""
import json, os

V = set("aeiou")

_d = json.load(open(os.path.join(os.path.dirname(__file__), "eu_tables.json")))
ADITZAK = sorted(_d["aditzak"], key=lambda p: len(p[0]), reverse=True)
IZENAK = sorted(_d["izenak"], key=lambda p: len(p[0]), reverse=True)
ADJETIBOAK = sorted(_d["adjetiboak"], key=lambda p: len(p[0]), reverse=True)

# result -> (region, replacement); region: 0=RV 1=R1 2=R2; repl None=del
ADITZAK_ACT = {1: (0, None), 2: (2, None), 3: (None, "atseden"),
               4: (None, "arabera"), 5: (None, "baditu")}
IZENAK_ACT = {1: (0, None), 2: (2, None), 3: (None, "jok"), 4: (1, None),
              5: (None, "tra"), 6: (None, "minutu"), 7: (None, "zehar"),
              8: (None, "geldi"), 9: (None, "igaro"), 10: (None, "aurka")}
ADJ_ACT = {1: (0, None), 2: (None, "z")}


def mark_regions(w):
    n = len(w)
    pV = p1 = p2 = n
    # pV: Spanish-style RV
    if n >= 2:
        if w[0] in V:
            if w[1] not in V:
                c = 2
                while c < n and w[c] not in V: c += 1
                if c < n: pV = c + 1
            else:
                c = 2
                while c < n and w[c] in V: c += 1
                if c < n: pV = c + 1
        else:
            if w[1] not in V:
                c = 2
                while c < n and w[c] not in V: c += 1
                if c < n: pV = c + 1
            else:
                pV = 3 if n >= 3 else p1
    # p1/p2 from word start
    c = 0
    while c < n and w[c] not in V: c += 1
    if c < n:
        c += 1
        while c < n and w[c] in V: c += 1
        if c < n:
            c += 1
            p1 = c
            while c < n and w[c] not in V: c += 1
            if c < n:
                c += 1
                while c < n and w[c] in V: c += 1
                if c < n:
                    p2 = c + 1
    return pV, p1, p2


def stem(w):
    pV, p1, p2 = mark_regions(w)
    regions = {0: pV, 1: p1, 2: p2}
    e = len(w)

    def run(table, actions, repeat):
        nonlocal w, e
        while True:
            hit = None
            for s, res in table:
                start = e - len(s)
                if start >= 0 and w[start:e] == s:
                    hit = (start, res)
                    break
            if hit is None:
                return
            start, res = hit
            region, repl = actions[res]
            if region is not None and start < regions[region]:
                return  # condition failed -> routine fails -> repeat ends
            w = w[:start] + (repl or "") + w[e:]
            e = start
            if not repeat:
                return

    run(ADITZAK, ADITZAK_ACT, True)
    run(IZENAK, IZENAK_ACT, True)
    run(ADJETIBOAK, ADJ_ACT, False)
    return w


if __name__ == "__main__":
    import random, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from pg_stem import pg_stem
    alpha = list("abdefghijklmnoprstuxz")
    sufs = [p[0] for p in ADITZAK + IZENAK + ADJETIBOAK]
    tot_d = tot = 0
    for seed in range(8):
        rnd = random.Random(seed * 77 + 3)
        words = set()
        while len(words) < 20000:
            n = rnd.randint(1, 6)
            base = "".join(rnd.choice(alpha) for _ in range(n))
            k = rnd.randint(0, 3)
            wd = base + "".join(rnd.choice(sufs) for _ in range(k))
            words.add(wd[:40])
        res = pg_stem("eu", list(words))
        d = [(x, ex) for x, ex in res.items() if stem(x) != ex]
        tot_d += len(d); tot += len(res)
        for x, ex in d[:5]:
            print("DIFF", repr(x), "got", repr(stem(x)), "want", repr(ex))
        print(f"seed {seed}: {len(d)}/{len(res)}")
    print(f"TOTAL {tot_d}/{tot}")
