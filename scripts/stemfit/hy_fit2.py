#!/usr/bin/env python3
"""Armenian refit under the r13-recovered semantics.

Probing (see round-13 transcript) corrected the r12 model class:
  - stage 0 = case-ending among, R2 tested ONCE on the longest match
    (a fail kills the stage; no VB anywhere);
  - stages 1-3 (verb/adjective/noun) have NO per-entry conditions,
    only the global pV matching floor;
  - the aorist ց-family are FULL-FORM entries (ացա/եցա/ացի/...)
    plus a few bare forms (ցի, ցանք, ...), not vowel-before ցX;
  - single vowels (ա, ե) hold dual memberships (ending R2 + a late
    stage), which the duplication pass finds.
Key evidence: ամցի→ամ vs կլոնկոնզցի→կլոնկոնզց (stage-0 R2 strips ի
first only when R2 reaches it), կլոնկացանք→կլոնկ vs կլոնկեցանք→կլոնկե
('ացանք' is an entry, 'եցանք' is not — only bare 'ցանք').
"""
import sys, json, os, random
import pg_stem, langfit
from hy_run import VOWELS, CAND, BASES, STEMS, gen_probes

EXTRA = """
ա ե ո ու
ցի ցիր ցին ցինք ցիք ցա ցար ցան ցանք ցաք
ացա ացար ացանք ացաք ացան եցա եցար եցանք եցաք եցան
ացի ացիր ացինք ացիք ացին եցի եցիր եցինք եցիք եցին
ար իր ացել եցել ալիս ելիս
չել ցնել ցվել ացնել եցնել
անամ անաս անա անանք անաք անան
ենամ ենաս ենա ենանք ենաք ենան
անակ գին վեցինք վեցի վեցիր վեցին վեցիք
աք վի վան վե սա ալիսա
""".split()

def probes2(seed=5):
    rng = random.Random(seed)
    fam = [c for c in EXTRA]
    out = set()
    bases = BASES + STEMS + ["ամ", "բա", "զի", "կլոնկ", "աշխատ", "ժըւժա"]
    for b in bases:
        for s in fam:
            out.add(b + s)
        for _ in range(6):
            out.add(b + rng.choice(fam) + rng.choice(sorted(CAND)))
    return sorted(out)

def main():
    lang = langfit.Lang('hy', VOWELS, nstages=4, use_pv_floor=True)
    lang.stage_conds = ['R2', ['NONE', 'R2', 'CB', 'VB'], ['NONE', 'R2', 'CB', 'VB'], ['NONE', 'R2', 'CB', 'VB']]
    cand = sorted(set(CAND) | set(EXTRA))

    oracle = json.load(open('/tmp/hy_oracle.json'))
    extra_words = [w for w in probes2() if w not in oracle]
    if extra_words:
        oracle.update(pg_stem.pg_stem('hy', extra_words))
        json.dump(oracle, open('/tmp/hy_oracle.json', 'w'),
                  ensure_ascii=False)
    print(f"{len(oracle)} oracle words", file=sys.stderr)

    entries = {s: [(3, 'NONE', '')] for s in cand}
    if os.path.exists('/tmp/hy_model2.json'):
        prev = json.load(open('/tmp/hy_model2.json'))
        for s in entries:
            if s in prev:
                entries[s] = [tuple(m) for m in prev[s]]
    elif os.path.exists('/tmp/hy_model.json'):
        prev = json.load(open('/tmp/hy_model.json'))
        for s in entries:
            mems = []
            for st, cond, repl in prev.get(s, []):
                sc = lang.stage_conds[st]
                allowed = sc if isinstance(sc, list) else [sc]
                mems.append((st, cond if cond in allowed else allowed[0], repl))
            if mems:
                entries[s] = mems
    for k, v in {'ք': [(2, 'NONE', '')], 'ու': [(3, 'NONE', '')],
                 'իչ': [(3, 'NONE', '')], 'ա': [(0, 'R2', ''), (3, 'NONE', '')],
                 'ը': [(0, 'R2', ''), (3, 'R2', '')],
                 'վեց': [(1, 'NONE', '')], 'աք': [(1, 'NONE', '')],
                 'ան': [(1, 'NONE', ''), (3, 'NONE', '')],
                 'վի': [(0, 'R2', '')],
                 'ես': [(2, 'R2', '')], 'ատ': [(2, 'NONE', '')],
                 'ումդ': [(3, 'NONE', '')], 'պես': [(2, 'NONE', '')],
                 'ում': [(1, 'CB', ''), (3, 'NONE', '')],
                 'ց': [(0, 'R2', '')], 'եց': [(1, 'NONE', '')],
                 'արան': [(1, 'NONE', '')],
                 'ար': [(1, 'NONE', '')]}.items():
        entries[k] = v

    best = None
    for sd in (1, 7, 13):
        e2 = {s: list(v) for s, v in entries.items()}
        m, f = langfit.fit(lang, e2, oracle, sweeps=8, seed=sd)
        if best is None or f < best[1]:
            best = (m, f)
        entries = {s: list(v) for s, v in best[0].entries.items()}
    model, final = best
    print("final:", final)
    for d in langfit.diffs(model, oracle, 60):
        print(*d)
    json.dump(model.entries, open('/tmp/hy_model2.json', 'w'),
              ensure_ascii=False, indent=0)

if __name__ == '__main__':
    main()
