#!/usr/bin/env python3
"""Catalan snowball prototype v2 — converged against PG 15 pure_ca.

Pipeline: attached_pronoun (+vowel try); (standard or verb); residual;
cleaning (de-accent). Longest-match no-fallthrough per among.
"""

VOWELS = "aeiouàáèéíïòóúü"

def is_v(c): return c in VOWELS

def region_after(w, start):
    i = start
    while i < len(w) and not is_v(w[i]): i += 1
    while i < len(w) and is_v(w[i]): i += 1
    return i + 1 if i < len(w) else len(w)

# conditions
R1, R2, NOCOND = 1, 2, 0

import ca_tab
_COND = {'R1': R1, 'R2': R2}
STD = [(s, _COND[c], r, t) for s, c, r, t in ca_tab.SUFFIX]
RESIDUAL = [(s, _COND[c], r, t) for s, c, r, t in ca_tab.RESIDUAL]

PRONOUN = ["'ls", "'ns", "'hi", "'ho", "'l", "'m", "'n", "'s", "'t",
           "-nos", "-les", "-la", "-li", "-me", "-te", "-us",
           "los", "vos", "lo", "se", "ho", "hi"]
PRONOUN = sorted(PRONOUN, key=len, reverse=True)

CLEAN = str.maketrans("àáèéíïòóúü", "aaeeiioouu")


def apply_among(w, p1, p2, table):
    """Longest matching entry; condition tested on match start; no
    fallthrough. Returns (new_w, fired)."""
    best = None
    for s, cond, repl, try_tag in table:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, cond, repl, try_tag)
    if best is None:
        return w, False
    s, cond, repl, try_tag = best
    start = len(w) - len(s)
    limit = p1 if cond == R1 else (p2 if cond == R2 else 0)
    if start < limit:
        return w, False
    w = w[:start] + repl
    if try_tag == 'ic' and w.endswith("ic") and len(w) - 2 >= p1:
        w = w[:-2]
    elif try_tag == 'iqu' and w.endswith("iqu"):
        w = w[:-3] + "ic"
    return w, True


def stem(word):
    w = word.lower()
    p1 = region_after(w, 0)
    p2 = region_after(w, p1)
    # attached pronoun, with a vowel try after it
    for s in PRONOUN:
        if w.endswith(s) and len(w) - len(s) >= 2:
            w = w[:len(w) - len(s)]
            if w and w[-1] in "aeiíoàé":
                w = w[:-1]
            break
    w, _ = apply_among(w, p1, p2, STD)
    w, _ = apply_among(w, p1 + 1, p2, RESIDUAL)
    return w.translate(CLEAN)


if __name__ == '__main__':
    import sys
    for a in sys.argv[1:]:
        print(a, stem(a))
