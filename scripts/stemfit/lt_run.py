#!/usr/bin/env python3
"""Fit + validate the Lithuanian stemmer tables."""
import sys, json, random
import pg_stem, langfit

VOWELS = "aeiyouąęėįųū"

CAND = sorted(set("""
as is us ys ias is ia a e ė i y o u ų ą ę į ū
o os es ės io io ius iaus aus
ui iui ams iams ems ims ums
ą ią į ės ę us ius
e yje oje ėje uje ije iuje
uose iuose ose ėse yse ise ese
ai iai ys iai ai ės os
ų ių ei iei
am iam ame iame
u iu umi iumi mi imi
ais iais omis ėmis imis umis
ti ty tis tys čiai
ote ese
na ja ji jo ju
ti ki k me te si s
au ai ei o ė jo jau ei
u i y av ov
usi ęs dama
ančio ančios antis anti
enas enos
inti inęs
yti
ausias iausias iausia ausia
esnis esnė
okas oka
uti ate ato
imas imai imą imus ime imu
ybė ybės ybę
tojas tojo toją
elis elė ukas ukė
iškas iška
ingas inga
inis inė
""".split()))

BASES = ["klonkonz", "klonz", "krz", "nam", "tav", "brinkol"]

STEMS = ["nam", "vyr", "knyg", "mokykl", "vaik", "graž", "didel",
         "ei", "ein", "buv", "kalb", "miest", "darb", "žmog", "šal",
         "met", "dien", "rank", "galv", "šird", "medž", "laik",
         "vand", "ugn", "žem", "dang", "saul", "mėnul"]

def gen_probes(seed=1, n_random=2500):
    rng = random.Random(seed)
    cons = "bcčdfghjklmnprsštvzž"
    probes = set()
    for b in BASES + STEMS:
        for s in CAND:
            probes.add(b + s)
        for _ in range(10):
            probes.add(b + rng.choice(CAND) + rng.choice(CAND))
    def rand_word():
        w = ""
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.8: w += rng.choice(cons)
            w += rng.choice(VOWELS)
            if rng.random() < 0.5: w += rng.choice(cons)
        return w
    for _ in range(n_random):
        w = rand_word()
        probes.add(w)
        probes.add(w + rng.choice(CAND))
    return sorted(probes)

def main():
    lang = langfit.Lang('lt', VOWELS, nstages=3)
    probes = gen_probes()
    oracle = pg_stem.pg_stem('lt', probes)
    print(f"{len(oracle)} oracle words", file=sys.stderr)
    import os
    entries = {s: [(0, 'R1', '')] for s in CAND}
    if os.path.exists('/tmp/lt_model.json'):
        prev = json.load(open('/tmp/lt_model.json'))
        for s in entries:
            if s in prev:
                entries[s] = [tuple(m) for m in prev[s]]
    best = None
    e0 = entries
    for sd in (3, 11):
        e2 = {s: list(v) for s, v in e0.items()}
        m, f = langfit.fit(lang, e2, oracle, sweeps=6, seed=sd, verbose=False)
        print("seed", sd, "->", f, file=sys.stderr)
        if best is None or f < best[1]:
            best = (m, f)
        e0 = {s: list(v) for s, v in best[0].entries.items()}
    model, final = best
    print("final:", final)
    for d in langfit.diffs(model, oracle, 40):
        print(d)
    json.dump(model.entries, open('/tmp/lt_model.json', 'w'),
              ensure_ascii=False, indent=0)

if __name__ == '__main__':
    main()
