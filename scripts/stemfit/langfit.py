#!/usr/bin/env python3
"""Generic multi-stage snowball table fitter.

Model: pipeline of N stages; each stage = one among (longest match, no
fallthrough) applied once, in order. Every entry lives in one stage
with one region condition; a second membership can be added in the
duplication pass. Fit by coordinate descent against a PG oracle.
"""
import json, sys
import pg_stem

class Lang:
    def __init__(self, code, vowels, clean=None, nstages=3, min_r1=0, use_pv_floor=False):
        self.code = code
        self.vowels = vowels
        self.clean = clean or {}
        self.nstages = nstages
        self.min_r1 = min_r1
        self.use_pv_floor = use_pv_floor

    def is_v(self, c):
        return c in self.vowels

    def is_v_cb(self, c):
        """Vowel test for the consonant-before (CB) condition — some
        languages use a narrower grouping here (hy: ը counts as a
        consonant for non-v tests but as a vowel for regions)."""
        return c in getattr(self, 'cb_vowels', self.vowels)

    def region_after(self, w, start):
        i = start
        while i < len(w) and not self.is_v(w[i]): i += 1
        while i < len(w) and self.is_v(w[i]): i += 1
        return i + 1 if i < len(w) else len(w)

    def pv(self, w):
        i = 0
        while i < len(w) and not self.is_v(w[i]):
            i += 1
        return i + 1 if i < len(w) else len(w)

    def limits(self, w):
        start = 1 if (getattr(self, 'r1_shift_a', False) and
                      len(w) > 6 and w[:1] == 'a') else 0
        p1 = self.region_after(w, start)
        if self.min_r1:
            p1 = max(p1, self.min_r1)
        p2 = self.region_after(w, p1)
        floor = self.pv(w) if self.use_pv_floor else 0
        return {'NONE': floor, 'R1': max(p1, floor), 'R2': max(p2, floor)}

CONDS = ['R1', 'R2', 'NONE', 'VB', 'CB', 'VBR2']

class Model:
    """entries: {suffix: [(stage, cond, repl), ...]}"""
    def __init__(self, lang, entries):
        self.lang = lang
        self.entries = {s: list(v) for s, v in entries.items()}
        self._build()

    def _build(self):
        self.stages = [dict() for _ in range(self.lang.nstages)]
        for s, mems in self.entries.items():
            for stage, cond, repl in mems:
                self.stages[stage][s] = (cond, repl)

    def stem(self, word):
        w = word
        lims = self.lang.limits(w)
        floor = lims['NONE']
        repeats = getattr(self.lang, 'repeat_stages', set())
        for ti, table in enumerate(self.stages):
            midfix = getattr(self.lang, 'mid_fix', None)
            again = True
            while again:
                again = False
                if midfix and ti >= 1:
                    w = midfix(w)
                as_filter = (getattr(self.lang, 'cond_as_filter', False)
                    or ti in getattr(self.lang, 'filter_stages', ()))
                best = None
                for s in table:
                    if not w.endswith(s):
                        continue
                    start = len(w) - len(s)
                    if start < floor:
                        continue
                    if as_filter:
                        cond = table[s][0]
                        if cond == 'VB':
                            if start < 1 or not self.lang.is_v(w[start - 1]):
                                continue
                        elif cond == 'CB':
                            if start < 1 or \
                                    self.lang.is_v_cb(w[start - 1]):
                                continue
                        elif cond == 'VBR2':
                            if not ((start >= 1 and self.lang.is_v(w[start - 1]))
                                    or start >= lims['R2']):
                                continue
                        elif start < lims[cond]:
                            continue
                    if best is None or len(s) > len(best):
                        best = s
                if best is None:
                    break
                cond, repl = table[best]
                start = len(w) - len(best)
                if cond == 'VB':
                    ok = start >= lims['NONE'] and start >= 1 and \
                        self.lang.is_v(w[start - 1])
                elif cond == 'CB':
                    ok = as_filter or (start >= 1
                        and not self.lang.is_v_cb(w[start - 1]))
                elif cond == 'VBR2':
                    ok = as_filter or (start >= 1 and
                        self.lang.is_v(w[start - 1])) or start >= lims['R2']
                else:
                    ok = as_filter or start >= lims[cond]
                if ok:
                    w = w[:start] + repl
                    if ti in repeats and not repl:
                        again = True
        post = getattr(self.lang, 'post', None)
        if post:
            w = post(w)
        for a, b in self.lang.clean.items():
            w = w.replace(a, b)
        return w


def fit(lang, entries_init, oracle, sweeps=5, verbose=True, seed=0):
    model = Model(lang, entries_init)
    words = list(oracle.items())

    def affected(s):
        k = len(s) + 10
        return [(w, e) for w, e in words if s in w[-k:]]

    def score_on(sub):
        return sum(1 for w, e in sub if model.stem(w) != e)

    cur = score_on(words)
    if verbose:
        print(f"initial mismatches: {cur}/{len(words)}", file=sys.stderr)
    import random as _rnd
    rng = _rnd.Random(seed)
    all_sfx = sorted(model.entries)
    for sweep in range(sweeps):
        improved = False
        order = list(all_sfx)
        rng.shuffle(order)
        frozen = getattr(lang, 'frozen', set())
        for s in order:
            if s in frozen:
                continue
            sub = affected(s)
            orig = model.entries[s]
            repl = orig[0][2] if orig else ''
            base = score_on(sub)
            best = (base, orig)
            options = [[]]
            stage_conds = getattr(lang, 'stage_conds', None)
            for st in range(lang.nstages):
                if stage_conds:
                    sc = stage_conds[st]
                    cs = sc if isinstance(sc, list) else [sc]
                else:
                    cs = CONDS
                for c in cs:
                    options.append([(st, c, repl)])
            for opt in options:
                model.entries[s] = opt
                model._build()
                sc = score_on(sub)
                if sc < best[0]:
                    best = (sc, opt)
            model.entries[s] = best[1]
            model._build()
            if best[0] < base:
                cur += best[0] - base
                improved = True
        if verbose:
            print(f"sweep {sweep}: mismatches {cur}", file=sys.stderr)
        if not improved:
            break
    # duplication pass: allow a second membership
    for s in all_sfx:
        if s in getattr(lang, 'frozen', set()):
            continue
        sub = affected(s)
        base = score_on(sub)
        if base == 0:
            continue
        orig = list(model.entries[s])
        repl = orig[0][2] if orig else ''
        best = (base, orig)
        stage_conds = getattr(lang, 'stage_conds', None)
        for st in range(lang.nstages):
            if any(m[0] == st for m in orig):
                continue
            if stage_conds:
                sc = stage_conds[st]
                cs = sc if isinstance(sc, list) else [sc]
            else:
                cs = CONDS
            for c in cs:
                model.entries[s] = orig + [(st, c, repl)]
                model._build()
                sc = score_on(sub)
                if sc < best[0]:
                    best = (sc, list(model.entries[s]))
        model.entries[s] = best[1]
        model._build()
        cur += best[0] - base
    final = score_on(words)
    if verbose:
        print(f"after duplication: {final}", file=sys.stderr)
    return model, final


def diffs(model, oracle, limit=40):
    out = []
    for w, e in oracle.items():
        g = model.stem(w)
        if g != e:
            out.append((w, g, e))
            if len(out) >= limit:
                break
    return out
