#!/usr/bin/env python3
"""Deterministic per-entry placement for the Armenian stemmer (r13).

Replaces coordinate descent: each candidate ending X is MEASURED —
  strip?   oracle(B+X) == B for a long consonant-final base B
  cond     R2 (fails on a short base whose pV < start < R2),
           VB (needs a vowel before: strips after Bv, not after B),
           NONE otherwise
  stage    via anchor chaining: word B+A_k+X; after X strips at stage
           sx, anchor A_k (stage k) strips iff k > sx.
Anchors: A1='ատ' (verb, stage 1), A2='ք' (stage 2), A3='ական'
(stage 3) — verified below before use.
"""
import sys, json
import pg_stem, langfit
from hy_run import VOWELS, CAND

B = "կլոնկոնզ"      # long, consonant-final, R2 well inside
BV = "կլոնկոնզա"    # vowel-final variant (for VB endings)
S = "զի"            # pV=2; X at 2 is below R1/R2 but above the floor
A = {1: "ատ", 2: "ք", 3: "ական"}

def batch(words):
    return pg_stem.pg_stem('hy', sorted(set(words)))

def main():
    lang = langfit.Lang('hy', VOWELS, nstages=4, use_pv_floor=True)
    cand = sorted(set(CAND) | set(json.load(open('/tmp/hy_extra.json'))
                                  if __import__('os').path.exists('/tmp/hy_extra.json') else []))
    # sanity: bases and anchors behave
    pre = batch([B, BV, S] + [B + a for a in A.values()])
    print("base checks:", {w: pre[w] for w in pre}, file=sys.stderr)
    assert pre[B] == B and pre[S] == S, "unstable base"

    probes = []
    for x in cand:
        probes += [B + x, BV + x, S + x]
    o1 = batch(probes)

    entries = {}
    vb_only = []
    for x in cand:
        strips_b = o1[B + x] == B
        strips_bv = o1[BV + x] == BV
        if not strips_b and not strips_bv:
            continue  # not a unit ending (composite or never strips)
        if not strips_b and strips_bv:
            cond = 'VB'
            vb_only.append(x)
        else:
            # R2 test: on S+x the start (=2) is >= pV floor but < R2
            strips_s = o1[S + x] == S
            cond = 'NONE' if strips_s else 'R2'
        entries[x] = cond

    # stage probes (VB endings get the vowel-final base so they fire)
    probes2 = []
    for x, cond in entries.items():
        base = BV if cond == 'VB' else B
        probes2 += [base + A[k] + x for k in A]
    o2 = batch(probes2)

    model_entries = {}
    for x, cond in entries.items():
        base = BV if cond == 'VB' else B
        stripped_after = {k: o2[base + A[k] + x] == base for k in A}
        # stage(X) = smallest k with NOT stripped_after(k); all
        # stripped -> stage 0
        if stripped_after[1]:
            st = 0
        elif stripped_after[2]:
            st = 1
        elif stripped_after[3]:
            st = 2
        else:
            st = 3
        model_entries[x] = [(st, cond, '')]

    model = langfit.Model(lang, model_entries)
    oracle = json.load(open('/tmp/hy_oracle.json'))
    bad = [(w, model.stem(w), e) for w, e in oracle.items()
           if model.stem(w) != e]
    print(f"placed {len(model_entries)} entries; "
          f"{len(bad)}/{len(oracle)} diffs")
    for d in bad[:60]:
        print(*d)
    json.dump(model_entries, open('/tmp/hy_placed.json', 'w'),
              ensure_ascii=False, indent=0)

if __name__ == '__main__':
    main()
