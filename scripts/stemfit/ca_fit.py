#!/usr/bin/env python3
"""Fit per-entry region conditions for the Catalan tables by
coordinate descent against PG, using multi-geometry synthetic stems."""
import json, itertools, sys
import pg_stem

VOWELS = "aeiouàáèéíïòóúü"
def is_v(c): return c in VOWELS
def region_after(w, start):
    i = start
    while i < len(w) and not is_v(w[i]): i += 1
    while i < len(w) and is_v(w[i]): i += 1
    return i + 1 if i < len(w) else len(w)

CONDS = ['R1', 'R1m3', 'R2', 'R2m3', 'NONE']

def limit(cond, w):
    p1 = region_after(w, 0)
    if cond == 'NONE':
        return 0
    if cond == 'R1':
        return p1
    if cond == 'R1m3':
        return max(p1, 3)
    if cond == 'R2':
        return region_after(w, p1)
    if cond == 'R2m3':
        return region_after(w, max(p1, 3))
    raise ValueError(cond)

class Tables:
    def __init__(self, suffix, residual):
        self.suffix = dict(suffix)     # s -> (cond, repl)
        self.residual = dict(residual)

    def apply(self, w, table):
        best = None
        for s in table:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        if best is None:
            return w, False
        cond, repl = table[best]
        if len(w) - len(best) < limit(cond, w):
            return w, False
        return w[:len(w) - len(best)] + repl, True

    def stem_noclean(self, w):
        w, _ = self.apply(w, self.suffix)
        w, _ = self.apply(w, self.residual)
        return w

CLEAN = str.maketrans("àáèéíïòóúü", "aaeeiioouu")

def stemmed(tabs, w):
    return tabs.stem_noclean(w).translate(CLEAN)

STEMS = ["klonkonz", "klonk", "kan", "kans", "an", "tan", "traf",
         "trafnal", "ko", "bri", "klo", "planta", "forn", "fornit"]

def main():
    d = json.load(open('/tmp/ca_stages.json'))
    d2 = json.load(open('/tmp/ca_stages2.json'))
    suffix_set = sorted((set(d['suffix']) | {'ando', 'acions', 'iques',
                        'iqu', 'ble', 'bles', 'logia', 'logies', 'logía',
                        'ador', 'adores', 'edor', 'edora'}) - {'ais'})
    residual_set = sorted(set(d['residual']) | set(d2['both']) |
                          {'iqu', 's', 'ador', 'adores', 'edor', 'edora'})
    repl_s = {'iques': 'ic', 'iqu': 'ic', 'ble': 'b', 'bles': 'b',
              'logia': 'log', 'logies': 'log', 'logía': 'log'}
    # initial conditions
    suffix = {s: ('R1', repl_s.get(s, '')) for s in suffix_set}
    residual = {s: ('R1', repl_s.get(s, '')) for s in residual_set}
    suffix['acions'] = ('R2', ''); suffix['ando'] = ('R2', '')
    suffix['iques'] = ('R2', 'ic')

    # oracle over all stem+entry probes
    allsfx = sorted(set(suffix_set) | set(residual_set))
    probes = [st + s for st in STEMS for s in allsfx]
    oracle = pg_stem.pg_stem('ca', probes)
    print(f"oracle: {len(oracle)}", file=sys.stderr)

    tabs = Tables(suffix.items(), residual.items())

    words = list(oracle.items())
    def affected(s):
        return [(w, e) for w, e in words if s in w[-(len(s) + 8):]]

    def score_on(subset):
        return sum(1 for w, exp in subset if stemmed(tabs, w) != exp)

    def score():
        return score_on(words)

    cur = score()
    print("initial mismatches:", cur, file=sys.stderr)
    for sweep in range(4):
        improved = False
        for s in allsfx:
            # try conditions for suffix membership (incl. absent)
            sub = affected(s)
            base_sub = score_on(sub)
            best = (base_sub, None)
            orig_sfx = tabs.suffix.get(s)
            orig_res = tabs.residual.get(s)
            options = []
            rp = repl_s.get(s, '')
            for cs in CONDS + ['ABSENT']:
                for cr in CONDS + ['ABSENT']:
                    options.append((cs, cr))
            for cs, cr in options:
                if cs == 'ABSENT':
                    tabs.suffix.pop(s, None)
                else:
                    tabs.suffix[s] = (cs, rp)
                if cr == 'ABSENT':
                    tabs.residual.pop(s, None)
                else:
                    tabs.residual[s] = (cr, rp)
                sc = score_on(sub)
                if sc < best[0]:
                    best = (sc, (cs, cr))
            if best[1] is None:
                # restore
                if orig_sfx is None:
                    tabs.suffix.pop(s, None)
                else:
                    tabs.suffix[s] = orig_sfx
                if orig_res is None:
                    tabs.residual.pop(s, None)
                else:
                    tabs.residual[s] = orig_res
            else:
                cs, cr = best[1]
                if cs == 'ABSENT':
                    tabs.suffix.pop(s, None)
                else:
                    tabs.suffix[s] = (cs, rp)
                if cr == 'ABSENT':
                    tabs.residual.pop(s, None)
                else:
                    tabs.residual[s] = (cr, rp)
                cur = cur - base_sub + best[0]
                improved = True
        print(f"sweep {sweep}: mismatches {cur}", file=sys.stderr)
        if not improved:
            break
    json.dump({'suffix': {k: list(v) for k, v in tabs.suffix.items()},
               'residual': {k: list(v) for k, v in tabs.residual.items()}},
              open('/tmp/ca_fit.json', 'w'), ensure_ascii=False, indent=0)
    print("final mismatches:", cur)

if __name__ == '__main__':
    main()
