#!/usr/bin/env python3
"""Deterministic stage assignment for multi-stage snowball pipelines.

Given entry set E and a long base B where all regions hold:
  M[x][y] = did y strip after x in stem(B + y + x)?
Entries with identical after-rows share a stage; stages are ordered by
the subset relation of their after-sets.
"""
import sys
import pg_stem

def probe_effects(code, base, cands):
    """singleton probe: which cands strip fully at base."""
    oracle = pg_stem.pg_stem(code, [base + s for s in cands])
    full, partial = set(), {}
    for s in cands:
        r = oracle.get(base + s)
        if r == base:
            full.add(s)
        elif r is not None and r != base + s:
            partial[s] = r
    return full, partial

def pair_matrix(code, base, entries, refs):
    """M[ref][y] = 1 iff y stripped (fully) after ref fired."""
    words = {}
    for x in refs:
        for y in entries:
            words[(x, y)] = base + y + x
    oracle = pg_stem.pg_stem(code, list(set(words.values())))
    M = {}
    for (x, y), w in words.items():
        r = oracle.get(w)
        # after x strips we expect base+y; y stripped iff result == base
        M.setdefault(x, {})[y] = 1 if r == base else (
            0 if r == base + y else None)
    return M
