#!/usr/bin/env python3
"""Pairwise stage-order recovery for Armenian (r13).

For entries X, Y probe B+Y+X: after X strips, Y strips iff
stage(Y) > stageFire(X). The sets S(X) = {Y stripped after X} are
nested by stage, so entries cluster into the 4 amongs by signature.
Pairs where X fails to strip (condition/shadow) are skipped.
"""
import sys, json, itertools
import pg_stem

B = "կլոնկոնզ"

def main():
    model = json.load(open('/tmp/hy_work.json'))
    ents = sorted([s for s, v in model.items() if v], key=len)
    print(len(ents), "entries", file=sys.stderr)
    # which X strip cleanly on B?
    o = pg_stem.pg_stem('hy', [B + x for x in ents])
    strippers = [x for x in ents if o[B + x] == B]
    print(len(strippers), "strip on B", file=sys.stderr)
    pairs = [(y, x) for y in strippers for x in strippers if x != y]
    words = {B + y + x: (y, x) for (y, x) in pairs}
    res = pg_stem.pg_stem('hy', list(words))
    S = {x: set() for x in strippers}
    weird = []
    for w, (y, x) in words.items():
        r = res[w]
        if r == B:
            S[x].add(y)
        elif r == B + y:
            pass
        else:
            weird.append((w, r))
    json.dump({x: sorted(v) for x, v in S.items()},
              open('/tmp/hy_S.json', 'w'), ensure_ascii=False)
    # cluster by |S(x)| and report
    from collections import defaultdict
    by_sig = defaultdict(list)
    for x, v in S.items():
        by_sig[len(v)].append(x)
    for n in sorted(by_sig):
        print(n, ' '.join(sorted(by_sig[n])))
    print(len(weird), "weird pairs", file=sys.stderr)
    for w, r in weird[:30]:
        print("WEIRD", w, r)

if __name__ == '__main__':
    main()
